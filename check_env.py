"""Environment smoke test (reference: decomp/nerfvq_nfr3/check_env.py):
verifies the metric stack on dummy arrays and reports the JAX backend."""

import numpy as np


def main():
    from vqnerf_release_tpu.eval import metrics
    rs = np.random.RandomState(0)
    a = (rs.rand(64, 64, 3) * 255).astype(np.uint8)
    b = (rs.rand(64, 64, 3) * 255).astype(np.uint8)
    print("psnr:", metrics.psnr(a, b))
    print("ssim:", metrics.ssim(a, b))
    print("lpips:", metrics.lpips(a, b))

    import jax
    devs = jax.devices()
    print("jax devices:", devs)
    print("accelerator available:",
          any(d.platform != "cpu" for d in devs))

    # native ray sampler (10x host sampling; built via
    # `make -C native/fastloader`)
    from vqnerf_release_tpu.data import native
    print("native sampler built:", native.native_available())

    # EXR codec (pure-python; no system codec ships in this image)
    import tempfile

    from vqnerf_release_tpu.data.exr import read_exr, write_exr
    with tempfile.NamedTemporaryFile(suffix=".exr") as f:
        env = rs.rand(4, 8, 3).astype(np.float32)
        write_exr(f.name, env, dtype=np.float32)
        assert np.array_equal(read_exr(f.name), env)
    print("exr codec: ok")

    # pretrained-weight importers (need tf / torch present)
    for mod, dep in (("tf_import", "tensorflow"), ("torch_import",
                                                   "torch")):
        try:
            __import__(dep)
            __import__(f"vqnerf_release_tpu.interop.{mod}")
            print(f"interop {mod}: ok")
        except ImportError as e:
            print(f"interop {mod}: unavailable ({e})")


if __name__ == "__main__":
    main()
