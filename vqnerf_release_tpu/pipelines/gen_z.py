"""Per-view material/latent export from a trained nfr_unit.

Parity target: decomp/nerfvq_nfr3/nerfactor/gen_z.py:51-106 +
nfr_unit.gen_z (models/nfr_unit.py:145-177): for each view dump
albedo/spec/rough maps (and optionally the latent z) for clustering
ablations. Outputs land in <outroot>/<view>/{albedo,spec,rough}.npy/png
(+ z_bias.npy with gen_z=True).
"""

import os
from os.path import join

import jax.numpy as jnp
import numpy as np

from ..data import io as vio
from ..models import decomp_common as dc

__all__ = ["export_materials"]


def export_materials(nfr_params, cfg: dc.DecompConfig, views, outroot,
                     gen_z=False):
    out = []
    for view in views:
        mask = (view.alpha[:, 0] > 0)
        xyz = jnp.asarray(view.xyz)
        z = dc.apply_encoder(nfr_params, xyz, cfg)
        basecolor = cfg.albedo_slope * dc.apply_head(
            nfr_params["diff_out"], z) + cfg.albedo_bias
        ks = dc.apply_head(nfr_params["spec_out"], z)
        rough = dc.apply_head(nfr_params["rough_out"], z)
        spec = np.asarray(ks * basecolor)
        albedo = np.asarray((1 - ks) * basecolor)
        rough = np.asarray(rough)
        z = np.asarray(z)
        m = mask[:, None].astype(np.float32)

        vdir = join(outroot, view.id)
        os.makedirs(vdir, exist_ok=True)
        h, w = view.h, view.w
        for name, arr, ch in (("albedo", albedo * m, 3),
                              ("spec", spec * m, 3),
                              ("rough", rough * m, 1)):
            img = arr.reshape(h, w, ch)
            np.save(join(vdir, name + ".npy"), img)
            vio.write_img(img if ch == 3 else img[..., 0],
                          join(vdir, name + ".png"))
        if gen_z:
            np.save(join(vdir, "z_bias.npy"),
                    (z * m).reshape(h, w, -1))
        out.append(vdir)
    return out
