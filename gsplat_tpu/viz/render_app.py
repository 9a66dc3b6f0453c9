"""HTTP render server + browser client — reference visual_res_app/render_app.py
(Flask) re-implemented on the stdlib http.server (no flask in this image).

GET /api/generate-image?type=<key> maps WASD-style keys to camera moves and
returns a PNG of the re-rendered view, matching the reference's API
(render_app.py:24-160); `/` serves a minimal JS client (the reference ships
visual_res_app/3d高斯可视化.html).
"""
from __future__ import annotations

import io
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

_CLIENT_HTML = """<!doctype html><html><head><meta charset="utf-8">
<title>gsplat_tpu viewer</title></head>
<body style="background:#111;color:#eee;font-family:monospace">
<h3>gsplat_tpu live viewer</h3>
<p>keys: w/s forward/back &nbsp; a/d left/right &nbsp; q/e up/down &nbsp;
i/k pitch &nbsp; j/l yaw &nbsp; m cycle mode</p>
<img id="v" width="80%%"/>
<script>
const img = document.getElementById('v');
function refresh(key) {
  img.src = '/api/generate-image?type=' + (key||'none') + '&t=' + Date.now();
}
document.addEventListener('keydown', e => refresh(e.key));
refresh();
</script></body></html>"""


class RenderServer:
    """Holds the model + camera state and serves rendered frames."""

    KEY_ACTIONS = {
        "w": ("translate", dict(dz=1)), "s": ("translate", dict(dz=-1)),
        "a": ("translate", dict(dx=-1)), "d": ("translate", dict(dx=1)),
        "q": ("translate", dict(dy=-1)), "e": ("translate", dict(dy=1)),
        "j": ("rotate", ("y", -5)), "l": ("rotate", ("y", 5)),
        "i": ("rotate", ("x", -5)), "k": ("rotate", ("x", 5)),
        "u": ("rotate", ("z", -5)), "o": ("rotate", ("z", 5)),
    }
    MODES = ["rgb", "depth", "segment"]

    def __init__(self, gaussians, template_cam, backend="auto", step=0.15):
        from gsplat_tpu.core.cameras import get_projection_matrix

        self.gaussians = gaussians
        self.cam = template_cam
        self.backend = backend
        self.step = step
        self.world_view = np.array(template_cam.world_view_transform)
        self.proj = getattr(template_cam, "projection_matrix", None)
        if self.proj is None:
            self.proj = get_projection_matrix(
                0.01, 100.0, template_cam.FoVx, template_cam.FoVy).T
        self.mode = "rgb"
        self.lock = threading.Lock()

    def handle_key(self, key: str):
        from gsplat_tpu.viz import camera_trajectory as traj

        if key == "m":
            self.mode = self.MODES[
                (self.MODES.index(self.mode) + 1) % len(self.MODES)]
            return
        action = self.KEY_ACTIONS.get(key)
        if action is None:
            return
        kind, arg = action
        if kind == "translate":
            self.world_view = traj.translate(
                self.world_view, step=self.step,
                **{k: v for k, v in arg.items()})
        else:
            self.world_view = traj.rotate(self.world_view, arg[0], arg[1])

    def render_png(self) -> bytes:
        from PIL import Image

        from gsplat_tpu.core.cameras import MiniCam
        from gsplat_tpu.renderer import render
        from gsplat_tpu.scripts.visualize import frame_for_mode

        cam = MiniCam(self.cam.image_width, self.cam.image_height,
                      self.cam.FoVy, self.cam.FoVx, 0.01, 100.0,
                      self.world_view.astype(np.float32),
                      (self.world_view @ self.proj).astype(np.float32))
        out = render(cam, self.gaussians, backend=self.backend)
        frame = frame_for_mode(out, self.mode, self.gaussians.num_class)
        buf = io.BytesIO()
        Image.fromarray((np.clip(frame, 0, 1) * 255).astype(np.uint8)).save(
            buf, "PNG")
        return buf.getvalue()

    def make_handler(server_self):
        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                parsed = urlparse(self.path)
                if parsed.path == "/":
                    body = _CLIENT_HTML.encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.end_headers()
                    self.wfile.write(body)
                elif parsed.path == "/api/generate-image":
                    q = parse_qs(parsed.query)
                    key = (q.get("type") or ["none"])[0]
                    with server_self.lock:
                        server_self.handle_key(key)
                        png = server_self.render_png()
                    self.send_response(200)
                    self.send_header("Content-Type", "image/png")
                    self.end_headers()
                    self.wfile.write(png)
                else:
                    self.send_response(404)
                    self.end_headers()

        return Handler

    def serve(self, host="127.0.0.1", port=5000):
        httpd = ThreadingHTTPServer((host, port), self.make_handler())
        print(f"render server on http://{host}:{port}")
        httpd.serve_forever()


def main(argv=None):
    import sys
    from argparse import ArgumentParser

    from gsplat_tpu.config import ModelParams, PipelineParams, get_combined_args

    parser = ArgumentParser()
    model = ModelParams(parser, sentinel=True)
    PipelineParams(parser)
    parser.add_argument("--iteration", default=-1, type=int)
    parser.add_argument("--port", default=5000, type=int)
    parser.add_argument("--backend", default="auto", type=str)
    if argv is not None:
        sys.argv = ["render_app.py"] + list(argv)
    args = get_combined_args(parser)

    from gsplat_tpu.data.scene import Scene
    from gsplat_tpu.models.gaussians import GaussianModel

    dataset = model.extract(args)
    gaussians = GaussianModel(dataset.sh_degree,
                              num_class=getattr(dataset, "num_class", 2))
    scene = Scene(dataset, gaussians, load_iteration=args.iteration,
                  shuffle=False, low_memory=True)
    cams = scene.getTrainCameras() or scene.getTestCameras()
    RenderServer(gaussians, cams[0], backend=args.backend).serve(
        port=args.port)


if __name__ == "__main__":
    main()
