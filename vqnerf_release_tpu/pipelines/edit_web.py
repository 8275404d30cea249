"""Browser frontend for the material-editing server.

Counterpart of the reference's PyQt5 client (decomp/nerfvq_nfr3/ui4.py:
click a pixel to auto-select its material segment, pick a target material
or BRDF values, choose illumination, submit, poll for results). PyQt5 is
not in this image, and a web page is the natural remote-TPU equivalent of
ui4.py's SCP push/pull anyway: this module serves a single-page UI over
stdlib http.server and speaks the SAME status-file protocol as
``edit_server_loop`` (pipelines/edit.py), so the compute server is
untouched.

Layout expectations:
  * ``views_dir``: a test-driver output pass (e.g. pd_vq) with
    ``batch%09d/`` dirs holding ``pred_rgb.png``/``embed_map.png`` and the
    raw ``pred_embed.npy`` id map (written by utils/vis.py).
  * ``root``: the protocol root shared with the edit server
    (status/, edited/, pd_edited/).
"""

import base64
import io as _io
import json
import os
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from os.path import isdir, isfile, join

import numpy as np

from .edit_client import MATERIAL_DB, auto_select_mask, submit_edit

__all__ = ["EditSession", "make_handler", "serve_edit_ui"]

_PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>VQ-NeRF material editing</title>
<style>
 body{font-family:sans-serif;margin:1em;background:#181818;color:#ddd}
 img{image-rendering:pixelated;border:1px solid #444;max-width:45vw}
 .row{display:flex;gap:1em;flex-wrap:wrap}
 select,button,input{font-size:1em;margin:.2em}
 #status{font-weight:bold}
 canvas{border:1px solid #444;cursor:crosshair;max-width:45vw}
</style></head><body>
<h2>VQ-NeRF material editing</h2>
<div class="row">
 <div>
  <div>view <select id="view"></select>
       overlay <input type="checkbox" id="overlay" checked></div>
  <canvas id="cv"></canvas>
 </div>
 <div>
  <div>segmentation</div><img id="embed">
 </div>
</div>
<div>
 material <select id="mat"></select>
 illumination <select id="env"></select>
 <button id="submit">apply edit</button>
 <button id="clear">clear selection</button>
 <span id="status">idle</span>
</div>
<div class="row" id="results"></div>
<script>
let S={views:[],sel:null};
const $=id=>document.getElementById(id);
async function j(url,body){const r=await fetch(url,body?{method:'POST',
 body:JSON.stringify(body)}:{});return r.json();}
async function init(){
 const info=await j('/api/views');S.views=info.views;
 $('view').innerHTML=info.views.map(v=>`<option>${v}</option>`).join('');
 $('mat').innerHTML=info.materials.map(m=>`<option>${m}</option>`).join('');
 $('env').innerHTML=info.envs.map(e=>`<option>${e}</option>`).join('');
 $('view').onchange=draw;$('overlay').onchange=draw;draw();poll();
}
function draw(){
 const v=$('view').value,cv=$('cv'),ctx=cv.getContext('2d');
 const img=new Image();
 img.onload=()=>{cv.width=img.width;cv.height=img.height;
  ctx.drawImage(img,0,0);
  if(S.sel&&S.sel.view==v&&$('overlay').checked){
   const ov=new Image();ov.onload=()=>{ctx.globalAlpha=.45;
    ctx.drawImage(ov,0,0);ctx.globalAlpha=1;};
   ov.src='data:image/png;base64,'+S.sel.mask_png;}}
 img.src=`/view/${v}/pred_rgb.png?${Date.now()}`;
 $('embed').src=`/view/${v}/embed_map.png`;
}
$('cv').onclick=async e=>{
 const cv=$('cv'),r=cv.getBoundingClientRect();
 const x=Math.floor((e.clientX-r.left)*cv.width/r.width);
 const y=Math.floor((e.clientY-r.top)*cv.height/r.height);
 $('status').textContent='selecting...';
 S.sel=await j('/api/select',{view:+$('view').value,x:x,y:y});
 S.sel.view=$('view').value;
 $('status').textContent=S.sel.error||
  `segment ${S.sel.embed_id} (${S.sel.count} px)`;
 draw();
};
$('clear').onclick=()=>{S.sel=null;$('status').textContent='idle';draw();};
$('submit').onclick=async()=>{
 if(!S.sel){$('status').textContent='click the render first';return;}
 $('status').textContent='submitting...';
 const r=await j('/api/submit',{material:$('mat').value,
                                env:$('env').value});
 $('status').textContent=r.error||'uploaded — waiting for server';
};
async function poll(){
 for(;;){
  const st=await j('/api/status');
  if(st.status)$('status').textContent=st.status;
  if(st.status=='finished'){
   $('results').innerHTML=st.results.map(u=>`<img src="${u}?${Date.now()}"
    style="max-width:30vw">`).join('');}
  await new Promise(res=>setTimeout(res,1500));
 }
}
init();
</script></body></html>
"""

_BATCH_RE = re.compile(r"batch(\d{9})$")
_SAFE_IMG = re.compile(r"^[\w.-]+\.png$")


class EditSession:
    """Server-side state: the view list and the current selection."""

    def __init__(self, root, views_dir, envs=("original",)):
        self.root = root
        self.views_dir = views_dir
        self.envs = list(envs)
        self.lock = threading.Lock()
        self.masks = None  # list of [H, W] bool, one per view
        self.batches = sorted(
            d for d in os.listdir(views_dir)
            if _BATCH_RE.search(d) and isdir(join(views_dir, d)))
        if not self.batches:
            raise FileNotFoundError(f"no batch%09d dirs under {views_dir}")

    def _embed(self, i):
        p = join(self.views_dir, self.batches[i], "pred_embed.npy")
        if not isfile(p):
            raise FileNotFoundError(
                f"{p} missing — rerun the pd_vq pass (vis_view now saves "
                "the raw id map next to embed_map.png)")
        return np.load(p)

    def select(self, view, x, y):
        """Click (x, y) on ``view``: select that embed id across ALL views
        (ui4.py auto_select semantics). Returns a preview for ``view``."""
        emb = self._embed(view)
        h, w = emb.shape[:2]
        if not (0 <= y < h and 0 <= x < w):
            raise ValueError(f"click ({x},{y}) outside {w}x{h}")
        embed_id = int(emb[y, x])
        masks = [auto_select_mask(self._embed(i), embed_id)
                 for i in range(len(self.batches))]
        with self.lock:
            self.masks = masks
        return {
            "embed_id": embed_id,
            "count": int(masks[view].sum()),
            "mask_png": _mask_png_b64(masks[view]),
        }

    def submit(self, material, env):
        with self.lock:
            masks = self.masks
        if masks is None:
            raise ValueError("no selection — click the render first")
        if isinstance(material, str) and material not in MATERIAL_DB:
            raise ValueError(f"unknown material {material!r}")
        submit_edit(self.root, material, masks, env=env)

    def status(self):
        path = join(self.root, "status", "status.json")
        out = {"status": "idle"}
        if isfile(path):
            with open(path) as f:
                out = json.load(f)
        if out.get("status") == "finished":
            res_root = join(self.root, "pd_edited")
            results = []
            if isdir(res_root):
                for d in sorted(os.listdir(res_root)):
                    m = _BATCH_RE.search(d)
                    if m and isfile(join(res_root, d, "pred_rgb.png")):
                        results.append(
                            f"/result/{int(m.group(1))}/pred_rgb.png")
            out["results"] = results
        return out


def _mask_png_b64(mask):
    """bool [H, W] -> base64 PNG (magenta where selected, transparent
    elsewhere) for the canvas overlay."""
    h, w = mask.shape
    rgba = np.zeros((h, w, 4), np.uint8)
    rgba[mask] = (255, 0, 255, 255)
    try:
        import cv2
        ok, buf = cv2.imencode(".png", rgba[..., [2, 1, 0, 3]])
        assert ok
        data = buf.tobytes()
    except ImportError:  # minimal fallback via PIL if cv2 is absent
        from PIL import Image
        bio = _io.BytesIO()
        Image.fromarray(rgba).save(bio, format="PNG")
        data = bio.getvalue()
    return base64.b64encode(data).decode("ascii")


def make_handler(session: EditSession):
    def _file_response(handler, path, ctype="image/png"):
        if not isfile(path):
            handler.send_error(404)
            return
        with open(path, "rb") as f:
            data = f.read()
        handler.send_response(200)
        handler.send_header("Content-Type", ctype)
        handler.send_header("Content-Length", str(len(data)))
        handler.end_headers()
        handler.wfile.write(data)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, obj, code=200):
            data = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            path = self.path.split("?")[0]
            if path == "/":
                data = _PAGE.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)
            elif path == "/api/views":
                self._json({
                    "views": list(range(len(session.batches))),
                    "materials": list(MATERIAL_DB),
                    "envs": session.envs,
                })
            elif path == "/api/status":
                self._json(session.status())
            else:
                m = re.fullmatch(r"/(view|result)/(\d+)/([\w.-]+)", path)
                if not m or not _SAFE_IMG.fullmatch(m.group(3)):
                    self.send_error(404)
                    return
                i = int(m.group(2))
                if i >= len(session.batches):
                    self.send_error(404)
                    return
                base = (join(session.views_dir, session.batches[i])
                        if m.group(1) == "view"
                        else join(session.root, "pd_edited",
                                  "batch%09d" % i))
                _file_response(self, join(base, m.group(3)))

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            try:
                body = json.loads(self.rfile.read(n) or b"{}")
                if self.path == "/api/select":
                    self._json(session.select(
                        int(body["view"]), int(body["x"]), int(body["y"])))
                elif self.path == "/api/submit":
                    session.submit(body.get("material", "keep"),
                                   body.get("env", "original"))
                    self._json({"ok": True})
                else:
                    self.send_error(404)
            except Exception as e:  # surface errors to the page
                self._json({"error": f"{type(e).__name__}: {e}"}, code=400)

    return Handler


def serve_edit_ui(root, views_dir, port=8008, envs=("original",),
                  serve_forever=True, host="127.0.0.1"):
    """Start the web UI. With serve_forever=False, returns the bound
    ThreadingHTTPServer (caller drives it — used by tests).

    Binds loopback by default: POST /api/submit drives server-side file
    writes and TPU compute, so remote exposure must be deliberate
    (pass host="0.0.0.0" / cli --host)."""
    session = EditSession(root, views_dir, envs=envs)
    httpd = ThreadingHTTPServer((host, port), make_handler(session))
    print(f"edit UI: http://localhost:{httpd.server_address[1]}/ "
          f"({len(session.batches)} views; protocol root {root})")
    if serve_forever:
        httpd.serve_forever()
    return httpd
