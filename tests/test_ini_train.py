"""CLI-compat: INI-driven training (the reference's trainvali entry)."""

import json
import os
from os.path import join

import numpy as np

from tests.test_data_layer import _make_synth_scene


def test_ini_train_nfr_unit(tmp_path):
    from vqnerf_release_tpu.cli import main
    data_root, surf_root = _make_synth_scene(str(tmp_path), light_h=2)
    outroot = str(tmp_path / "out" / "scene_nfr_unit")

    ini = tmp_path / "nfr_unit.ini"
    ini.write_text(f"""[DEFAULT]
model = nfr_unit
data_type = nerf
data_root = {data_root}
data_nerf_root = {surf_root}
outroot = {outroot}
xname = lr{{lr}}
imh = 16
light_h = 2
white_bg = True
mlp_width = 8
conv_width = 16
num_embed = 4
num_drop = 2
thres_str = 0.1;0.2
n_rays_per_step = 32
epochs = 2
lr = 5e-4
random_seed = 1
""")
    main(["ini-train", "--config", str(ini)])
    outdir = join(outroot, "lr5e-4")
    assert os.path.isdir(join(outdir, "checkpoints", "ckpt-2"))
    assert os.path.exists(join(outdir, "vis_vali", "np_light.npy"))

    # override string changes hyperparameters (trainvali.py:67-75)
    outroot2 = str(tmp_path / "out2" / "scene_nfr_unit")
    main(["ini-train", "--config", str(ini),
          "--config-override",
          f"epochs=1,outroot={outroot2}"])
    assert os.path.isdir(join(outroot2, "lr5e-4", "checkpoints",
                              "ckpt-1"))
