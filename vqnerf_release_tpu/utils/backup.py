"""Per-run source backup (nerf_runner.py:197-208 file_backup): copy the
framework sources into <exp_dir>/recording so every experiment records the
exact code that produced it."""

import os
import shutil

__all__ = ["file_backup"]


def file_backup(exp_dir, src_root=None):
    if src_root is None:
        src_root = os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))
    rec = os.path.join(exp_dir, "recording")
    os.makedirs(rec, exist_ok=True)
    for root, dirs, files in os.walk(src_root):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        rel = os.path.relpath(root, src_root)
        for f in files:
            if f.endswith(".py"):
                dst_dir = os.path.join(rec, rel)
                os.makedirs(dst_dir, exist_ok=True)
                shutil.copy2(os.path.join(root, f),
                             os.path.join(dst_dir, f))
    return rec
