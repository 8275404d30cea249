"""Round-trip tests for the reference-NeuS (torch .pth) importer, plus a
cross-framework check that torch's nn.utils.weight_norm semantics map
exactly onto our transposed weight-norm dense."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from vqnerf_release_tpu.interop.torch_import import import_neus  # noqa: E402
from vqnerf_release_tpu.models.neus import NeuSConfig, init_neus  # noqa: E402
from vqnerf_release_tpu.ops import nn as vnn  # noqa: E402

CFG = NeuSConfig(n_samples=8, n_importance=8, up_sample_steps=2,
                 n_outside=4)


def _rand_state_dicts(expected, rs):
    """Build the reference's checkpoint dict with random tensors shaped
    from our init tree (torch layouts: weights [out, in])."""
    def wn_sd(layers):
        sd = {}
        for l, p in enumerate(layers):
            d_in, d_out = np.shape(p["v"])
            sd[f"lin{l}.weight_v"] = torch.from_numpy(
                rs.rand(d_out, d_in).astype(np.float32))
            sd[f"lin{l}.weight_g"] = torch.from_numpy(
                rs.rand(d_out, 1).astype(np.float32))
            sd[f"lin{l}.bias"] = torch.from_numpy(
                rs.rand(d_out).astype(np.float32))
        return sd

    def dense_sd(name, p):
        d_in, d_out = np.shape(p["w"])
        return {
            f"{name}.weight": torch.from_numpy(
                rs.rand(d_out, d_in).astype(np.float32)),
            f"{name}.bias": torch.from_numpy(
                rs.rand(d_out).astype(np.float32)),
        }

    nerf = {}
    for i, p in enumerate(expected["bg"]["pts"]):
        nerf.update(dense_sd(f"pts_linears.{i}", p))
    nerf.update(dense_sd("views_linears.0", expected["bg"]["views"][0]))
    for name, key in (("feature_linear", "feature"),
                      ("alpha_linear", "alpha"), ("rgb_linear", "rgb")):
        nerf.update(dense_sd(name, expected["bg"][key]))

    return {
        "sdf_network_fine": wn_sd(expected["sdf"]),
        "color_network_fine": wn_sd(expected["color"]),
        "variance_network_fine": {
            "variance": torch.tensor(0.4321)},
        "nerf": nerf,
        "optimizer": {"state": {}, "param_groups": []},
        "iter_step": 300000,
    }


def test_import_neus_roundtrip(tmp_path):
    rs = np.random.RandomState(0)
    expected = init_neus(0, CFG)
    ckpt = _rand_state_dicts(expected, rs)
    path = tmp_path / "checkpoints"
    path.mkdir()
    torch.save(ckpt, path / "ckpt_300000.pth")

    # accepts the experiment dir and resolves the newest .pth
    params, iter_step = import_neus(str(tmp_path), CFG)
    assert iter_step == 300000
    for l in range(len(expected["sdf"])):
        np.testing.assert_array_equal(
            np.asarray(params["sdf"][l]["v"]),
            ckpt["sdf_network_fine"][f"lin{l}.weight_v"].numpy().T)
        np.testing.assert_array_equal(
            np.asarray(params["sdf"][l]["g"]),
            ckpt["sdf_network_fine"][f"lin{l}.weight_g"].numpy().ravel())
    np.testing.assert_allclose(float(params["variance"]["variance"]),
                               0.4321, rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(params["bg"]["pts"][0]["w"]),
        ckpt["nerf"]["pts_linears.0.weight"].numpy().T)

    # imported params drive the real renderer
    from vqnerf_release_tpu.models.neus import neus_render
    n = 4
    out = neus_render(
        params, CFG,
        jnp.asarray(np.tile([[0, 0, 2.0]], (n, 1)), jnp.float32),
        jnp.asarray(np.tile([[0, 0, -1.0]], (n, 1)), jnp.float32),
        jnp.full((n, 1), 0.5), jnp.full((n, 1), 3.5), radius=1.0)
    assert np.isfinite(np.asarray(out["color_fine"])).all()


def test_weight_norm_semantics_match_torch():
    """torch nn.utils.weight_norm forward == our wn_dense_apply on the
    mapped (transposed) parameters."""
    torch.manual_seed(0)
    lin = torch.nn.utils.weight_norm(torch.nn.Linear(7, 5))
    x = torch.randn(11, 7)
    with torch.no_grad():
        want = lin(x).numpy()
        p = {
            "v": jnp.asarray(lin.weight_v.numpy().T),
            "g": jnp.asarray(lin.weight_g.numpy().ravel()),
            "b": jnp.asarray(lin.bias.numpy()),
        }
    got = np.asarray(vnn.wn_dense_apply(p, jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_import_neus_wrong_width_raises(tmp_path):
    rs = np.random.RandomState(1)
    expected = init_neus(0, CFG)
    ckpt = _rand_state_dicts(expected, rs)
    torch.save(ckpt, tmp_path / "ckpt_000001.pth")
    from dataclasses import replace
    from vqnerf_release_tpu.models.fields import SDFConfig
    bad = replace(CFG, sdf=SDFConfig(d_hidden=128, d_out=129))
    with pytest.raises(ValueError, match="shape"):
        import_neus(str(tmp_path / "ckpt_000001.pth"), bad)
