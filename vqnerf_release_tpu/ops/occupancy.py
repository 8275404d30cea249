"""Occupancy-grid-guided ray sampling for NeuS training.

The reference places the initial n_samples uniformly in [near, far]
(geo/NeuS-ours2/models/renderer.py:311-316) and spends four SDF
up-sample rounds concentrating them at the surface. Because the SDF
moves slowly during training, a coarse occupancy grid re-evaluated every
few hundred steps places the INITIAL samples in the band where the
surface can possibly be, so the same quality needs fewer samples and
fewer up-sample rounds — the algorithmic throughput lever r1 left on the
table (the per-FLOP cost was already closed as compute-bound).

Certification logic mirrors gen_geo's fast-vis pass: with an
Eikonal-trained (~unit-gradient) SDF, the surface cannot cross a cell
whose center |SDF| exceeds half the cell diagonal; `margin_factor`
(default 3) adds slack for learned-SDF gradient error. A `floor` keeps a
uniform sampling component everywhere, so regions the grid missed (the
surface moved since the last rebuild) still receive samples and the
up-sample rounds can recover them.

TPU notes: the grid build is one jitted chunked sweep (res^3 = 262k SDF
evals at res 64 — amortized over occ_update_freq steps it is noise); the
per-step sampler is pure gather + inverse-CDF on the VPU, no MLP evals.
"""

import jax
import jax.numpy as jnp
import numpy as np

from .sampling import sample_pdf

__all__ = ["build_occ_grid", "interior_fraction", "ray_bin_occupancy",
           "ray_occupied_span", "sample_z_occ"]

# Flat-sweep peak temp is res^3 x 256 floats; chunk into z-slabs from
# here up (17 GB at 256^3 would not fit HBM).
_CHUNKED_BUILD_RES = 256


def build_occ_grid(sdf_params, sdf_cfg, radius, res=64, margin_factor=3.0):
    """Occupancy over the [-radius, radius]^3 cube: [res, res, res]
    float32 in {0, 1}, cell occupied iff |SDF(center)| < margin.

    One flat forward sweep (res^3 x 8x256 MLP, forward-only — peak temp
    ~res^3 x 256 floats, 268 MB at res 64, 2.1 GB at 128): a
    lax.map-chunked variant measured 3x SLOWER to compile on the tunnel
    TPU (377 s vs 122 s) with identical steady-state, so chunking was
    removed below res 256. The compile is once per process and
    amortizes over occ_update_freq-step rebuilds. At res >= 256 the
    flat sweep's peak temp (17 GB) exceeds HBM, so the sweep chunks
    into res z-slabs via lax.map there (identical values).
    """
    from ..models import fields

    centers_1d = (np.arange(res, dtype=np.float32) + 0.5) / res * 2 - 1
    x, y, z = np.meshgrid(centers_1d, centers_1d, centers_1d,
                          indexing="ij")
    pts = jnp.asarray(
        np.stack([x, y, z], axis=-1).reshape(-1, 3) * radius)
    cell_diag = 2.0 * radius / res * np.sqrt(3.0)
    margin = margin_factor * cell_diag / 2.0

    if res >= _CHUNKED_BUILD_RES:
        slabs = pts.reshape(res, res * res, 3)
        sdf = jax.lax.map(
            lambda p: fields.sdf_only(sdf_params, p, sdf_cfg),
            slabs).reshape(-1)
    else:
        sdf = fields.sdf_only(sdf_params, pts, sdf_cfg)  # [res^3]
    return (jnp.abs(sdf) < margin).astype(jnp.float32).reshape(
        res, res, res)


def interior_fraction(sdf_params, sdf_cfg, radius, res=128,
                      margin_factor=3.0):
    """Deep-interior share of the scene's occupied volume:
    interior / (band + interior) over the same cell grid/margin as
    build_occ_grid, where band = |SDF| < margin (the occ band) and
    interior = SDF <= -margin (cells provably deeper inside the surface
    than the band half-width).

    This is the auto-carve-tier statistic (r5, VERDICT r4 #3): fat
    compact bodies carry a large deep interior (analytic sphere 0.44 at
    res 128 / radius 1.65) that benefits from the roomier importance
    budget of the 24+16 carve tier (+1.2 dB on the sphere production
    cell, BASELINE.md r4), while thin/multi-body geometry has next to
    none (torus 0.00, plate 0.03, blobs 0.15) and only pays the
    throughput cost. Pure function of (SDF, grid geometry) — consumes
    no RNG, so a non-switching run is bit-identical to carve_auto off."""
    from ..models import fields

    centers_1d = (np.arange(res, dtype=np.float32) + 0.5) / res * 2 - 1
    x, y, z = np.meshgrid(centers_1d, centers_1d, centers_1d,
                          indexing="ij")
    pts = jnp.asarray(
        np.stack([x, y, z], axis=-1).reshape(-1, 3) * radius)
    cell_diag = 2.0 * radius / res * np.sqrt(3.0)
    margin = margin_factor * cell_diag / 2.0
    if res >= _CHUNKED_BUILD_RES:
        slabs = pts.reshape(res, res * res, 3)
        sdf = jax.lax.map(
            lambda p: fields.sdf_only(sdf_params, p, sdf_cfg),
            slabs).reshape(-1)
    else:
        sdf = fields.sdf_only(sdf_params, pts, sdf_cfg)
    band = jnp.sum(jnp.abs(sdf) < margin)
    interior = jnp.sum(sdf <= -margin)
    return interior / jnp.maximum(band + interior, 1)


def ray_bin_occupancy(rays_o, rays_d, near, far, grid, radius, n_bins,
                      samples_per_bin=1):
    """Occupancy of n_bins uniform bins of [near, far] per ray: [R, B].

    Each bin reads the MAX over `samples_per_bin` equispaced points
    inside it (default 1 = the midpoint). A single midpoint can alias:
    an occupied cell crossed between two midpoints is missed, so callers
    that need a conservative certificate must choose
    n_bins * samples_per_bin >= span / cell_size (see ray_occupied_span).
    Sample points outside the cube read 0 (no surface outside the
    inside-sphere mask anyway)."""
    res = grid.shape[0]
    s = samples_per_bin
    t = (jnp.arange(n_bins * s, dtype=jnp.float32) + 0.5) / (n_bins * s)
    z = near + (far - near) * t[None, :]  # [R, B*S]
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
    idx_f = (pts / radius + 1.0) * 0.5 * res
    idx = jnp.clip(jnp.floor(idx_f).astype(jnp.int32), 0, res - 1)
    vals = grid[idx[..., 0], idx[..., 1], idx[..., 2]]  # [R, B*S]
    inside = jnp.all((idx_f >= 0) & (idx_f < res), axis=-1)
    vals = vals * inside.astype(vals.dtype)
    if s == 1:
        return vals
    return jnp.max(vals.reshape(vals.shape[0], n_bins, s), axis=-1)


def ray_occupied_span(rays_o, rays_d, near, far, grid, radius,
                      n_bins=32, pad_bins=1, samples_per_bin=4):
    """Tighten each ray's [near, far] to the span of grid-occupied bins.

    With an Eikonal-trained SDF and a conservatively-margined grid
    (build_occ_grid, margin_factor >= 2 so occupancy is a band dilated
    ~1 cell around the surface), a surface can only exist inside
    occupied cells — so restricting the occlusion render to the occupied
    span (padded by pad_bins on each side) cannot clip out an occluder,
    while packing the render's fixed sample count into a far smaller
    interval. This is what makes a REDUCED occlusion sampler safe for
    lvis: 16+16 samples over a tightened span are denser than 64+64
    over the full sphere-exit span (the failure mode that disqualified
    sample reduction alone — thin occluders stepped over — needs empty
    space to hide in, and the tightened span has none).

    Conservativeness requires the sampling step along the ray to not
    exceed the grid cell size, else an occupied cell can slip between
    sample points: choose n_bins * samples_per_bin >= res * span /
    (2 * radius). The defaults (32 bins x 4 = 128 points) cover the
    worst-case full-chord span (2 * radius) at res <= 128; the dilated
    occupancy band (>= 2.6 cells thick at margin_factor 3) adds further
    slack.

    Returns (near', far', any_occupied[R, 1]); rays with no occupied
    bins keep their input span and carry any=0 (caller zeroes their
    occlusion — they are provably free, the same certificate as
    fast-vis).
    """
    occ = ray_bin_occupancy(rays_o, rays_d, near, far, grid, radius,
                            n_bins, samples_per_bin=samples_per_bin)
    idx = jnp.arange(n_bins, dtype=jnp.float32)
    big = jnp.float32(n_bins)
    first = jnp.min(jnp.where(occ > 0, idx, big), axis=-1,
                    keepdims=True)  # [R, 1]
    last = jnp.max(jnp.where(occ > 0, idx, -1.0), axis=-1,
                   keepdims=True)
    any_occ = (last >= 0).astype(jnp.float32)
    lo = jnp.clip(first - pad_bins, 0.0, n_bins) / n_bins
    hi = jnp.clip(last + 1 + pad_bins, 0.0, n_bins) / n_bins
    span = far - near
    near2 = jnp.where(any_occ > 0, near + lo * span, near)
    far2 = jnp.where(any_occ > 0, near + hi * span, far)
    return near2, far2, any_occ


def sample_z_occ(rays_o, rays_d, near, far, grid, radius, n_samples,
                 key=None, floor=0.05, n_bins=64):
    """Draw n_samples sorted z-values per ray from the piecewise-constant
    PDF proportional to occupancy + floor over n_bins uniform bins.
    key=None -> deterministic CDF midpoints (still sorted)."""
    occ = ray_bin_occupancy(rays_o, rays_d, near, far, grid, radius,
                            n_bins)
    # all-empty rays degrade to uniform via the floor
    w = occ * (1.0 - floor) + floor
    edges_t = jnp.arange(n_bins + 1, dtype=jnp.float32) / n_bins
    edges = near + (far - near) * edges_t[None, :]  # [R, B+1]
    edges = jnp.broadcast_to(edges, (rays_o.shape[0], n_bins + 1))
    z = sample_pdf(edges, w, n_samples, key=key, eps_w=0.0)
    if key is not None:
        z = jnp.sort(z, axis=-1)  # random u is unordered
    return jax.lax.stop_gradient(z)
