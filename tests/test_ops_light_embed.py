import numpy as np

from vqnerf_release_tpu.ops import embed, light


def test_gen_light_xyz_shapes_and_areas():
    xyz, areas = light.gen_light_xyz(16, 32)
    assert xyz.shape == (16, 32, 3)
    assert areas.shape == (16, 32)
    # All points on the sphere of radius 1e2
    np.testing.assert_allclose(
        np.linalg.norm(xyz, axis=-1), 1e2, rtol=1e-10)
    # Solid angles sum to 4*pi (the normalization in the reference)
    np.testing.assert_allclose(areas.sum(), 4 * np.pi, rtol=1e-10)
    assert (areas > 0).all()


def test_gen_light_xyz_pole_exclusion_and_orientation():
    xyz, _ = light.gen_light_xyz(16, 32)
    lat_step = np.pi / 18
    # First row latitude = pi/2 - step => z = r sin(lat)
    np.testing.assert_allclose(
        xyz[0, :, 2], 1e2 * np.sin(np.pi / 2 - lat_step), rtol=1e-10)
    np.testing.assert_allclose(
        xyz[-1, :, 2], 1e2 * np.sin(-np.pi / 2 + lat_step), rtol=1e-10)
    # First column longitude = pi - lng_step
    lng_step = 2 * np.pi / 34
    lat0 = np.pi / 2 - lat_step
    np.testing.assert_allclose(
        xyz[0, 0, 0], 1e2 * np.cos(lat0) * np.cos(np.pi - lng_step),
        rtol=1e-9)


def test_sph2cart_single_point():
    out = light.sph2cart(np.array([1.0, np.pi / 2, 0.0]))
    np.testing.assert_allclose(out, [0.0, 0.0, 1.0], atol=1e-12)
    out = light.sph2cart(np.array([2.0, 0.0, np.pi / 2]))
    np.testing.assert_allclose(out, [0.0, 2.0, 0.0], atol=1e-12)


def test_olat_envmaps():
    maps = light.olat_envmaps(16, olat_inten=200.0, ambient_inten=0.0)
    assert set(maps) == {"0004-0000", "0004-0008", "0004-0016", "0004-0024"}
    m = maps["0004-0008"]
    assert m.shape == (16, 32, 3)
    assert m[4, 8, 0] == 200.0
    assert m.sum() == 600.0


def test_posenc_layout():
    # Layout: [x, sin(2^0 x), cos(2^0 x), ..., sin(2^{n-1} x), cos(2^{n-1} x)]
    x = np.random.RandomState(1).randn(4, 3).astype(np.float32)
    n_freqs = 10
    out = np.asarray(embed.posenc(x, n_freqs))
    assert out.shape == (4, embed.posenc_dim(3, n_freqs))
    np.testing.assert_allclose(out[:, :3], x)
    for k in range(n_freqs):
        np.testing.assert_allclose(
            out[:, 3 + 6 * k : 6 + 6 * k], np.sin(x * 2.0**k), atol=1e-6)
        np.testing.assert_allclose(
            out[:, 6 + 6 * k : 9 + 6 * k], np.cos(x * 2.0**k), atol=1e-6)
