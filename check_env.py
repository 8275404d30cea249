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


if __name__ == "__main__":
    main()
