import os

import numpy as np
import pytest

from vqnerf_release_tpu import config as vcfg


def test_parse_sampler_spec():
    # the one grammar shared by tail_sampler / --vis-sampler /
    # --geo-sampler / sweep+rescore cells
    assert vcfg.parse_sampler_spec("64+64r4") == dict(
        n_samples=64, n_importance=64, up_sample_steps=4)
    assert vcfg.parse_sampler_spec(" 24+8r2 ") == dict(
        n_samples=24, n_importance=8, up_sample_steps=2)
    for bad in ("64x64r4", "64+64", "r4", "", "64+64r4x", "6 4+64r4"):
        with pytest.raises(ValueError, match="vis_sampler"):
            vcfg.parse_sampler_spec(bad, what="vis_sampler")


def test_scene_families():
    assert vcfg.scene_family("lego_3072") == "nerf"
    assert vcfg.scene_family("chair0_3072") == "mat"
    assert vcfg.scene_family("dtu_scan24") == "dtu"
    assert vcfg.scene_family("colmap_bottle") == "ours"
    assert vcfg.scene_family("rabbit_-1") == "hw"
    assert len(vcfg.SCENE_FAMILY) == 18  # 5+3+3+3+4 scenes


def test_decomp_presets():
    cfg, light = vcfg.decomp_config_for_scene("lego_3072")
    assert cfg.data_type == "nerf" and cfg.imh == 512
    assert cfg.num_embed == 15 and cfg.num_drop == 12
    assert light == 0.5
    assert len(cfg.train_thres()) == 15
    cfg, light = vcfg.decomp_config_for_scene("dtu_scan69")
    assert cfg.data_type == "dtu" and cfg.num_embed == 8
    assert light == 0.7 and not cfg.white_bg
    assert len(cfg.val_thres_list()) == 8
    cfg, light = vcfg.decomp_config_for_scene("rabbit_-1")
    assert cfg.data_type == "hw" and cfg.imh == 420


def test_geo_presets():
    cfg, tcfg, meta = vcfg.neus_configs_for_scene("lego_3072")
    assert tcfg.end_iter == 300_000 and tcfg.batch_size == 2560
    assert tcfg.use_white_bkgd and meta["near"] == 2.0
    # r5 default sampler: two-phase schedule — occ 24+8 r2/128^3 carve,
    # dense occ-placed 64+32 r2 tail for the final 25% (BASELINE.md r5
    # production-budget guardrail: beats the parity-tail schedule on
    # every scene and the ref sampler's best seed on plate/torus)
    assert cfg.n_samples == 24 and cfg.n_importance == 8
    assert tcfg.occ_res == 128
    assert tcfg.tail_frac == 0.25 and tcfg.tail_sampler == "64+32r2"
    assert tcfg.tail_occ is True
    cfg, tcfg, meta = vcfg.neus_configs_for_scene("dtu_scan24")
    assert tcfg.end_iter == 100_000 and tcfg.lr_end_iter == 300_000
    assert tcfg.batch_size == 512 and meta["new_h"] == 512
    # reference-exact sampling stays one override away
    cfg, tcfg, _ = vcfg.neus_configs_for_scene(
        "lego_3072", n_samples=64, n_importance=64, up_sample_steps=4,
        occ_res=0, tail_frac=0.0, tail_sampler="")
    assert cfg.n_samples == 64 and tcfg.occ_res == 0
    assert tcfg.tail_frac == 0.0


def test_output_layout():
    assert vcfg.surf_dir("/o", "lego_3072") == "/o/nerf_surf/lego_3072"
    assert vcfg.train_outdir("/o", "lego_3072", "vq_nfr") == \
        "/o/train/lego_3072_vq_nfr/lr5e-4"


def test_ini_interop(tmp_path):
    # Read the actual reference INI and check field mapping
    ref_ini = "/root/reference/decomp/nerfvq_nfr3/nerfactor/config/vq_nfr.ini"
    if not os.path.exists(ref_ini):
        pytest.skip("reference not mounted")
    cfg, raw = vcfg.decomp_config_from_ini(
        ref_ini, override_str="num_embed=8,num_drop=7,"
        "thres_str=0.1;0.2;0.3;0.4;0.5;0.6;0.7")
    assert cfg.num_embed == 8 and cfg.num_drop == 7
    assert cfg.z_dim == 256  # conv_width
    assert cfg.mlp_width == 128
    assert cfg.commitment_cost == 0.1
    assert cfg.combine_weight == 0.2
    assert cfg.lr == 5e-4 and cfg.lr_decay_steps == 500_000
    assert cfg.chr_alpha == 60 and cfg.best_thres == 0.002
    assert len(cfg.train_thres()) == 8


def test_cli_parsing(tmp_path):
    from vqnerf_release_tpu.cli import main
    with pytest.raises(SystemExit):
        main([])  # missing subcommand
    # empty/missing dataset fails fast with an actionable message
    # (previously trained an empty epoch and died on non-finite loss)
    with pytest.raises(SystemExit, match="no train views"):
        main(["decomp-train", "lego_3072", "--data-root",
              str(tmp_path / "none"), "--phase", "vq_nfr"])


def test_cli_reselect_main_end_to_end(tmp_path):
    """`reselect-main` finds the latest vali epoch under the scene's vq
    outdir and moves the main_<k> marker."""
    import json

    from vqnerf_release_tpu import config as vcfg
    from vqnerf_release_tpu.cli import main

    vq_out = vcfg.train_outdir(str(tmp_path), "lego_3072", "vq_nfr")
    ep = os.path.join(vq_out, "vis_vali", "epoch000000030")
    # production lego: num_embed=15, num_drop=12 -> 13 dropout scores
    os.makedirs(os.path.join(ep, "main_3"))
    for k in range(4, 16):
        os.makedirs(os.path.join(ep, str(k)))
    scores = [1.0] + [0.5] * 12  # elbow at i=1 -> k = 15 - 12 + 1 = 4
    with open(os.path.join(ep, "vq_test_loss.json"), "w") as f:
        json.dump({"chromaticity": scores, "vqrgb": scores}, f)

    main(["reselect-main", "lego_3072", "--output-root", str(tmp_path)])
    assert os.path.isdir(os.path.join(ep, "main_4"))
    assert os.path.isdir(os.path.join(ep, "3"))
    assert not os.path.isdir(os.path.join(ep, "main_3"))


def test_cli_gen_z_dispatch(tmp_path, monkeypatch):
    from vqnerf_release_tpu import cli
    from vqnerf_release_tpu.pipelines import gen_z as gz

    calls = {}
    monkeypatch.setattr(cli, "_load_phase_params",
                        lambda outdir, cfg, phase: {"fake": True})

    class _FakeDs:
        files = []

        def __init__(self, *a, **k):
            pass

        def load_view(self, f):
            raise AssertionError("no views in fixture")

    import vqnerf_release_tpu.data.shape_dataset as sd
    monkeypatch.setattr(sd, "ShapeDataset", _FakeDs)
    monkeypatch.setattr(
        gz, "export_materials",
        lambda params, cfg, views, outroot, gen_z=False: calls.update(
            outroot=outroot, gen_z=gen_z, n=len(views)) or [])
    cli.main(["gen-z", "lego_3072", "--data-root", str(tmp_path),
              "--output-root", str(tmp_path), "--gen-z",
              "--outdir", str(tmp_path / "out")])
    assert calls == {"outroot": str(tmp_path / "out"), "gen_z": True,
                     "n": 0}
