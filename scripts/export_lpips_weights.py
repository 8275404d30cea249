"""Convert torch-format LPIPS(alex) weights to the npz layout consumed by
vqnerf_release_tpu.eval.lpips_net.

Usage (on a machine that has the `lpips` pip package or its checkpoint):
    python scripts/export_lpips_weights.py \
        --alexnet /path/to/alexnet-owt.pth \
        --lpips   /path/to/lpips_alex_v0.1.pth \
        --out     lpips_alex.npz
then set VQNERF_LPIPS_WEIGHTS=lpips_alex.npz for metric evaluation.

The npz keys: conv{1..5}/kernel [kh,kw,cin,cout], conv{1..5}/bias,
lin{0..4}/kernel [1,1,cin,1]. Torch conv weights [cout,cin,kh,kw] are
transposed to HWIO.
"""

import argparse

import numpy as np

# torchvision alexnet.features conv layer indices
ALEX_CONV_IDX = [0, 3, 6, 8, 10]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--alexnet", required=True,
                    help="torchvision alexnet state_dict (.pth)")
    ap.add_argument("--lpips", required=True,
                    help="lpips linear-head state_dict (.pth)")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import torch

    alex = torch.load(args.alexnet, map_location="cpu")
    if hasattr(alex, "state_dict"):
        alex = alex.state_dict()
    lin = torch.load(args.lpips, map_location="cpu")
    if hasattr(lin, "state_dict"):
        lin = lin.state_dict()

    out = {}
    for li, idx in enumerate(ALEX_CONV_IDX, start=1):
        w = alex[f"features.{idx}.weight"].numpy()  # [cout,cin,kh,kw]
        b = alex[f"features.{idx}.bias"].numpy()
        out[f"conv{li}/kernel"] = np.transpose(w, (2, 3, 1, 0))
        out[f"conv{li}/bias"] = b
    for i in range(5):
        # lpips checkpoints name heads lin0..lin4 with .model.1.weight
        for key in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if key in lin:
                w = lin[key].numpy()  # [1, cin, 1, 1]
                out[f"lin{i}/kernel"] = np.transpose(w, (2, 3, 1, 0))
                break
        else:
            raise KeyError(f"linear head {i} not found in lpips ckpt")
    np.savez(args.out, **out)
    print("wrote", args.out, "with", len(out), "arrays")


if __name__ == "__main__":
    main()
