"""Mean-shift clustering segmentation baseline.

Parity target: decomp/nerfvq_nfr3/meanshift.py:107-138 — cluster per-pixel
(albedo, spec, rough) features of the validation views with sklearn
MeanShift and emit label maps colored with the embed palette, as an
ablation against the VQ segmentation.
"""

import os
from os.path import join

import numpy as np
from sklearn.cluster import MeanShift

from ..utils.vis import vis_embed_map

__all__ = ["meanshift_segmentation"]


def meanshift_segmentation(mat_dirs, out_dirs, bandwidth=0.2,
                           alpha_thres=0.0, max_pixels=20000, seed=0):
    """mat_dirs: per-view dirs holding albedo/spec/rough .npy (gen_z
    export). Fits one MeanShift over subsampled fg features of all views,
    then labels each view and writes labels.png."""
    feats, metas = [], []
    for d in mat_dirs:
        albedo = np.load(join(d, "albedo.npy"))
        spec = np.load(join(d, "spec.npy"))
        rough = np.load(join(d, "rough.npy"))
        h, w = albedo.shape[:2]
        f = np.concatenate(
            [albedo.reshape(-1, 3), spec.reshape(-1, 3),
             rough.reshape(-1, 1)], axis=-1)
        fg = np.abs(f).sum(-1) > alpha_thres
        metas.append((h, w, f, fg))
        feats.append(f[fg])
    allf = np.concatenate(feats, axis=0)
    rs = np.random.RandomState(seed)
    if allf.shape[0] > max_pixels:
        allf = allf[rs.choice(allf.shape[0], max_pixels, replace=False)]
    ms = MeanShift(bandwidth=bandwidth, bin_seeding=True)
    ms.fit(allf)

    outs = []
    for (h, w, f, fg), out_dir in zip(metas, out_dirs):
        os.makedirs(out_dir, exist_ok=True)
        labels = np.zeros(f.shape[0], np.int32)
        if fg.any():
            labels[fg] = ms.predict(f[fg]) + 1
        label_map = labels.reshape(h, w)
        vis_embed_map(label_map, join(out_dir, "labels.png"))
        np.save(join(out_dir, "labels.npy"), label_map)
        outs.append(out_dir)
    return ms.cluster_centers_.shape[0], outs
