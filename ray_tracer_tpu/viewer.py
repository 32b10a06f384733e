"""Live progressive-render viewer: the ImGui control panel, TPU-style.

The reference drives an SDL window with an ImGui panel (render stats, tracer
params, camera, environment — ``src/vk_engine.cpp:1492-1621``) and WASD/mouse
camera motion that pauses progressive accumulation
(``vk_engine.cpp:1817-1904``).  This is the headless-friendly equivalent: a
stdlib HTTP server around a :class:`ProgressiveRenderer` — a background
thread accumulates frames; the browser polls the PNG and posts camera /
parameter changes, which reset accumulation exactly like the reference's
camera moves.

    python -m ray_tracer_tpu.cli view --preset cornell --port 8787
"""

from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from .api import ProgressiveRenderer
from .config import RenderConfig
from .integrator import film
from .scene.types import Camera, CompiledScene

_PAGE = """<!doctype html>
<html><head><title>ray_tracer_tpu</title><style>
body{background:#111;color:#ddd;font-family:monospace;display:flex;gap:20px;padding:16px}
img{image-rendering:pixelated;border:1px solid #444}
label{display:block;margin:6px 0 2px}input{width:90px;background:#222;color:#ddd;border:1px solid #555}
button{margin-top:10px;background:#333;color:#eee;border:1px solid #666;padding:4px 12px}
#stats{margin-top:14px;color:#8c8}
</style></head><body>
<div><img id="view" width="512" height="512"/></div>
<div>
  <b>camera</b>
  <label>pos x/y/z</label>
  <input id="px" step="0.1" type="number"/><input id="py" step="0.1" type="number"/><input id="pz" step="0.1" type="number"/>
  <label>pitch / yaw / roll (deg)</label>
  <input id="ax" step="1" type="number"/><input id="ay" step="1" type="number"/><input id="az" step="1" type="number"/>
  <label>fov</label><input id="fov" step="1" type="number"/>
  <button onclick="apply()">apply (resets accumulation)</button>
  <div id="stats"></div>
  <div style="margin-top:10px;color:#888">WASD+QE move, arrows rotate</div>
</div>
<script>
async function refresh(){
  const img=document.getElementById('view');
  img.src='/image.png?t='+Date.now();
  const s=await (await fetch('/stats')).json();
  document.getElementById('stats').innerText=
    `frame ${s.frame}  spp ${s.total_samples}  ${s.frame_ms.toFixed(0)} ms/frame`;
  if(!window._init){
    for(const [k,v] of Object.entries(s.camera)) {
      const el=document.getElementById(k); if(el) el.value=v.toFixed(2);
    }
    window._init=true;
  }
}
function apply(){
  const q=['px','py','pz','ax','ay','az','fov'].map(k=>k+'='+document.getElementById(k).value).join('&');
  fetch('/set?'+q); window._init=false;
}
document.addEventListener('keydown',e=>{
  const d={w:'pz',s:'pz',a:'px',d:'px',q:'py',e:'py'}[e.key];
  const r={ArrowUp:'ax',ArrowDown:'ax',ArrowLeft:'ay',ArrowRight:'ay'}[e.key];
  if(d){const el=document.getElementById(d);
    el.value=(parseFloat(el.value)+( 'wdq'.includes(e.key)?0.2:-0.2)).toFixed(2);apply();}
  if(r){const el=document.getElementById(r);
    el.value=(parseFloat(el.value)+((e.key=='ArrowUp'||e.key=='ArrowLeft')?-5:5)).toFixed(2);apply();}
});
setInterval(refresh, 800); refresh();
</script></body></html>"""


class ViewerState:
    def __init__(self, scene: CompiledScene, cfg: RenderConfig):
        self.lock = threading.Lock()
        self.renderer = ProgressiveRenderer(scene, cfg)
        self.frame_ms = 0.0
        self.running = True

    def loop(self):
        while self.running:
            with self.lock:
                t0 = time.perf_counter()
                self.renderer.step()
                self.frame_ms = (time.perf_counter() - t0) * 1e3

    def png_bytes(self) -> bytes:
        from PIL import Image

        with self.lock:
            arr = film.to_uint8_srgb(self.renderer.accum)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, "PNG")
        return buf.getvalue()

    def stats(self) -> dict:
        cam = self.renderer.camera
        return {
            "frame": self.renderer.frame,
            "total_samples": self.renderer.total_samples,
            "frame_ms": self.frame_ms,
            "camera": {
                "px": cam.position[0], "py": cam.position[1], "pz": cam.position[2],
                "ax": cam.angles_deg[0], "ay": cam.angles_deg[1], "az": cam.angles_deg[2],
                "fov": cam.fov,
            },
        }

    def set_camera(self, q: dict):
        cam = self.renderer.camera
        g = lambda k, d: float(q.get(k, [d])[0])
        new = Camera(
            position=(g("px", cam.position[0]), g("py", cam.position[1]),
                      g("pz", cam.position[2])),
            angles_deg=(g("ax", cam.angles_deg[0]), g("ay", cam.angles_deg[1]),
                        g("az", cam.angles_deg[2])),
            fov=g("fov", cam.fov),
            near_plane=cam.near_plane,
        )
        with self.lock:
            self.renderer.move_camera(new)


def serve(
    scene: CompiledScene,
    cfg: RenderConfig,
    port: int = 8787,
    host: str = "127.0.0.1",
) -> None:
    """Serve the live viewer. Binds loopback-only by default — the /set
    endpoint mutates camera state, so exposing it beyond the machine must
    be an explicit choice (``host="0.0.0.0"`` / ``--host``)."""
    state = ViewerState(scene, cfg)
    thread = threading.Thread(target=state.loop, daemon=True)
    thread.start()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, ctype, body):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/":
                self._send(200, "text/html", _PAGE.encode())
            elif url.path == "/image.png":
                self._send(200, "image/png", state.png_bytes())
            elif url.path == "/stats":
                self._send(200, "application/json", json.dumps(state.stats()).encode())
            elif url.path == "/set":
                state.set_camera(parse_qs(url.query))
                self._send(200, "application/json", b"{}")
            else:
                self._send(404, "text/plain", b"not found")

    server = ThreadingHTTPServer((host, port), Handler)
    print(f"viewer at http://localhost:{port}/  (ctrl-c to stop)")
    try:
        server.serve_forever()
    finally:
        state.running = False
