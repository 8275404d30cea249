"""Segmentation evaluation: purity + micro/macro F1/precision/recall of
predicted embed maps against GT label maps over the 8 validation views.

Parity target: decomp/nerfvq_nfr3/cluster_eval.py:
  * color->id decoding with the GT palette (sel_colors: 127-based) and the
    prediction palette (embed_c: 128-based), id 0 = unmatched
  * labels compacted (resort), contingency-matrix majority matching
    (correspond), purity = sum(colmax)/sum
  * pixels restricted to alpha > 0.8 of the scene rgba
"""

import json
import os
from os.path import join

import numpy as np
from sklearn.metrics import f1_score, precision_score, recall_score
from sklearn.metrics.cluster import contingency_matrix

from ..data import io as vio

__all__ = ["SEL_COLORS", "EMBED_C", "img_embed", "purity", "resort",
           "correspond", "eval_scene_segmentation"]

_BASE = [
    (1, 0, 0), (0, 1, 0), (0, 0, 1), (1, 1, 0), (1, 0, 1), (0, 1, 1)]


def _palette(half):
    cols = []
    for r, g, b in _BASE:
        cols.append(np.array([255 * r, 255 * g, 255 * b]))
    for r, g, b in _BASE:
        cols.append(np.array([half * r, half * g, half * b]))
    for r, g, b in _BASE:
        cols.append(np.array(
            [255 if r else half, 255 if g else half, 255 if b else half]))
    cols += [np.array([255, half, 0]), np.array([255, 0, half]),
             np.array([0, 255, half])]
    return cols


SEL_COLORS = _palette(127)  # GT label palette (cluster_eval.py:21-27)
EMBED_C = _palette(128)  # prediction palette (cluster_eval.py:29-35)


def img_embed(arr, colors):
    """[N, 3] colors -> [N] ids (1-based; 0 = no palette match)."""
    out = np.zeros(arr.shape[0], np.int64)
    for i, c in enumerate(colors):
        out[np.all(arr == c, axis=-1)] = i + 1
    return out


def purity(coo):
    coo = np.asarray(coo)
    return float(np.sum(np.max(coo, axis=0)) / np.sum(coo))


def resort(arr):
    labels = sorted(set(arr.tolist()))
    out = np.zeros_like(arr)
    for i, l in enumerate(labels):
        out[arr == l] = i
    return out


def correspond(gt, pd, replace=True):
    gt, pd = resort(gt), resort(pd)
    coo = np.asarray(contingency_matrix(gt, pd))
    label_map = np.argmax(coo, axis=0)
    if replace:
        replaced = np.zeros_like(pd)
        for i in range(int(np.max(pd)) + 1):
            replaced[pd == i] = label_map[i]
    else:
        replaced = pd
    return coo, label_map, gt, replaced


def eval_scene_segmentation(rgba_scene, gt_scene, pd_scene, n_vals=8,
                            alpha_thres=0.8):
    """Returns the metric dict of cluster_eval.process_scene."""
    gt_px, pd_px = [], []
    for i in range(n_vals):
        rgba_path = join(rgba_scene, "val_%03d" % i, "rgba.png")
        if not os.path.exists(rgba_path):
            continue
        mask = vio.load_img_f32(rgba_path)[..., -1]
        gt_img = np.asarray(
            vio.read_rgba16(join(gt_scene, "val_%03d" % i, "idx.png"),
                            longint=False))[..., :3]
        pd_img = np.asarray(
            vio.read_rgba16(join(pd_scene, "batch%09d" % i,
                                 "embed_map.png"), longint=False))[..., :3]
        alpha = mask > alpha_thres
        gt_px.append(gt_img[alpha])
        pd_px.append(pd_img[alpha])
    gt = img_embed(np.concatenate(gt_px), SEL_COLORS)
    pd = img_embed(np.concatenate(pd_px), EMBED_C)
    coo, _, gt, pd = correspond(gt, pd)
    return {
        "purity": purity(coo),
        "f1-micro": float(f1_score(gt, pd, average="micro")),
        "f1-macro": float(f1_score(gt, pd, average="macro")),
        "p-macro": float(precision_score(
            gt, pd, average="macro", zero_division=0)),
        "r-macro": float(recall_score(
            gt, pd, average="macro", zero_division=0)),
    }
