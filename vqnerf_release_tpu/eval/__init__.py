"""Evaluation layer: image quality metrics (PSNR/SSIM/LPIPS), the
metric_eval and cluster_eval drivers, and CSV exporters."""
