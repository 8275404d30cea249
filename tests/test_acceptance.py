"""scripts/acceptance.py — the one-command parity acceptance run
(r1 VERDICT item 8) driven end-to-end on smoke artifacts."""

import importlib.util
import json
import os
from os.path import join

import cv2
import numpy as np
import pytest

from vqnerf_release_tpu import config as vcfg

H = W = 16
SCENE = "lego_3072"  # nerf family


def _acceptance():
    spec = importlib.util.spec_from_file_location(
        "acceptance", join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts", "acceptance.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_png(path, img, gray=False):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    arr = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    if not gray and arr.ndim == 3 and arr.shape[-1] >= 3:
        arr = arr[..., [2, 1, 0] + ([3] if arr.shape[-1] == 4 else [])]
    cv2.imwrite(path, arr)


@pytest.fixture()
def smoke_artifacts(tmp_path):
    """A pred tree in our test-driver layout + a GT tree + a reference
    scores JSON — predictions equal GT so PSNR is high."""
    rs = np.random.RandomState(0)
    out_root = str(tmp_path / "output")
    gt_root = str(tmp_path / "gt")
    envs = ("city", "studio")

    rgb = rs.rand(H, W, 3)
    gdir = join(gt_root, SCENE, "val_000")
    _write_png(join(gdir, "rgba.png"),
               np.dstack([rgb, np.ones((H, W))]))
    for name in ("albedo", "metal", "rough"):
        _write_png(join(gdir, f"{name}.png"), rs.rand(H, W, 3))
    for env in envs:
        _write_png(join(gdir, f"rgba_{env}.png"),
                   np.dstack([rgb, np.ones((H, W))]))

    pred_root = join(vcfg.train_outdir(out_root, SCENE, "ref_nfr"),
                     "vis_test", "latest")
    b = "batch000000000"
    for sub in ("pd_test", "pd_relit"):
        d = join(pred_root, sub, b)
        _write_png(join(d, "pred_rgb.png"), rgb)
        _write_png(join(d, "pred_basecolor.png"), rs.rand(H, W, 3))
        _write_png(join(d, "pred_albedo.png"), rs.rand(H, W, 3))
        _write_png(join(d, "pred_spec.png"), rs.rand(H, W, 3))
        _write_png(join(d, "pred_rough.png"), rs.rand(H, W, 3))
        _write_png(join(d, "pred_alpha.png"), np.ones((H, W)), gray=True)
        for env in envs:
            _write_png(join(d, f"pred_rgb_probes_{env}.png"), rgb)

    env_dir = str(tmp_path / "envs")
    os.makedirs(env_dir)
    cv2.imwrite(join(env_dir, "city.hdr"),
                np.random.rand(2, 4, 3).astype(np.float32))
    return out_root, gt_root, env_dir


def _run(acc, out_root, gt_root, env_dir, extra):
    acc.main([SCENE, "--data-root", "/nonexistent",
              "--output-root", out_root, "--gt-root", gt_root,
              "--test-envmap-dir", env_dir, "--skip-test"] + extra)


def test_acceptance_eval_and_report(smoke_artifacts, capsys):
    out_root, gt_root, env_dir = smoke_artifacts
    acc = _acceptance()
    _run(acc, out_root, gt_root, env_dir, [])
    report = json.load(open(join(out_root, f"acceptance_{SCENE}.json")))
    assert report["steps"] == ["metric-eval"]
    scores = json.load(open(report["scores_json"]))
    # pred == GT for rgb/relit -> very high PSNR there
    assert np.mean(scores[SCENE]["rgb"]["psnr"]) > 40
    assert np.mean(scores[SCENE]["env"]["psnr"]) > 40
    assert "lpips_impl" in report


def test_acceptance_auto_discovery(smoke_artifacts, tmp_path):
    """--auto (VERDICT r4 #7): inputs discovered from the conventional
    root layout; explicit flags win; missing pieces still error."""
    out_root, gt_root, env_dir = smoke_artifacts
    acc = _acceptance()

    root = str(tmp_path / "conv_root")
    j = os.path.join
    os.makedirs(j(root, "data", SCENE))
    os.makedirs(j(root, "data", "test_envs"))
    os.makedirs(j(root, "gt", SCENE))
    os.makedirs(j(root, "surf", "nerf_surf", SCENE))
    os.makedirs(j(root, "ref_train", f"{SCENE}_vq_nfr"))
    os.makedirs(j(root, "labels", SCENE))
    json.dump({}, open(j(root, "ref_scores.json"), "w"))

    found = acc.discover(root, SCENE, "nerf")
    assert found == {
        "data_root": j(root, "data", SCENE),
        "test_envmap_dir": j(root, "data", "test_envs"),
        "gt_root": j(root, "gt"),
        "surf_root": j(root, "surf"),
        "ref_ckpt": j(root, "ref_train"),
        "ref_scores": j(root, "ref_scores.json"),
        "label_root": j(root, "labels"),
    }
    # per-scene scores file wins over the generic one
    json.dump({}, open(j(root, f"ref_scores_{SCENE}.json"), "w"))
    assert acc.discover(root, SCENE, "nerf")["ref_scores"] == \
        j(root, f"ref_scores_{SCENE}.json")
    # gt/ absent -> falls back to data/
    os.rename(j(root, "gt"), j(root, "gt_hidden"))
    assert acc.discover(root, SCENE, "nerf")["gt_root"] == j(root, "data")
    os.rename(j(root, "gt_hidden"), j(root, "gt"))

    # dry-run the --auto path end-to-end on the smoke artifacts with a
    # minimal root (data + envs only — no ref ckpts/labels, so no
    # import/cluster steps fire): discovery fills data-root/envs;
    # explicit flags (gt-root, output-root) override/supplement
    root2 = str(tmp_path / "conv_root2")
    os.makedirs(j(root2, "data", SCENE))
    os.makedirs(j(root2, "data", "test_envs"))
    acc.main([SCENE, "--auto", root2,
              "--output-root", out_root, "--gt-root", gt_root,
              "--skip-test"])
    report = json.load(open(join(out_root, f"acceptance_{SCENE}.json")))
    assert report["steps"] == ["metric-eval"]

    # a bare --auto without the env var errors out
    os.environ.pop("VQNERF_ACCEPTANCE_ROOT", None)
    with pytest.raises(SystemExit):
        acc.main([SCENE, "--auto", "--skip-test"])
    # missing inputs (no --auto, no flags) error out with the hint
    with pytest.raises(SystemExit):
        acc.main([SCENE, "--skip-test"])


def test_acceptance_compare_pass_and_fail(smoke_artifacts, tmp_path):
    out_root, gt_root, env_dir = smoke_artifacts
    acc = _acceptance()

    # reference scores slightly WORSE than ours -> PASS
    _run(acc, out_root, gt_root, env_dir, [])
    ours = json.load(open(
        join(out_root, f"acceptance_{SCENE}_scores.json")))
    ref_pass = {SCENE: {
        b: {"psnr": [np.mean(m["psnr"]) - 0.05]}
        for b, m in ours[SCENE].items() if isinstance(m, dict)}}
    ref_path = str(tmp_path / "ref_pass.json")
    json.dump(ref_pass, open(ref_path, "w"))
    _run(acc, out_root, gt_root, env_dir, ["--ref-scores", ref_path])
    report = json.load(open(join(out_root, f"acceptance_{SCENE}.json")))
    assert report["pass"] is True
    assert all(r["verdict"] == "PASS" for r in report["comparison"])

    # reference scores far better on one (finite-PSNR) buffer -> FAIL,
    # exit code 1 (kd is random vs GT so ours is finite; rgb is exact ->
    # infinite PSNR and can never fail)
    ref_fail = json.loads(json.dumps(ref_pass))
    ref_fail[SCENE]["kd"]["psnr"] = [
        float(np.mean(ours[SCENE]["kd"]["psnr"])) + 10.0]
    json.dump(ref_fail, open(ref_path, "w"))
    with pytest.raises(SystemExit):
        _run(acc, out_root, gt_root, env_dir, ["--ref-scores", ref_path])
    report = json.load(open(join(out_root, f"acceptance_{SCENE}.json")))
    assert report["pass"] is False
    verdicts = {r["buffer"]: r["verdict"] for r in report["comparison"]}
    assert verdicts["kd"] == "FAIL"
