"""JSON score dumps -> CSV tables (eval_vis/vis.py + cluster_vis.py)."""

import json

import numpy as np
import pandas as pd

__all__ = ["metric_json_to_csv", "cluster_json_to_csv"]


def metric_json_to_csv(json_path, csv_path):
    """Per-scene x per-buffer mean PSNR/SSIM/LPIPS table."""
    with open(json_path) as f:
        scores = json.load(f)
    rows = []
    for scene, bufs in scores.items():
        if scene.startswith("_"):  # metadata keys (_lpips_impl)
            continue
        row = {"scene": scene}
        for buf, ms in bufs.items():
            for m, vals in ms.items():
                if vals:
                    row[f"{buf}_{m}"] = float(np.mean(vals))
        rows.append(row)
    df = pd.DataFrame(rows)
    df.to_csv(csv_path, index=False)
    return df


def cluster_json_to_csv(json_path, csv_path):
    """Per-method segmentation score table (cluster_vis.py)."""
    with open(json_path) as f:
        scores = json.load(f)
    rows = []
    for method, ms in scores.items():
        row = {"method": method}
        for k, vals in ms.items():
            row[k] = float(np.mean(vals))
        rows.append(row)
    df = pd.DataFrame(rows)
    df.to_csv(csv_path, index=False)
    return df
