"""Pose-estimation HTTP service — the serving-deployment face of the pose
stack (companion to examples/web_demo's classifier app; the reference has no
serving example for DeeperCut at all).

Stdlib-only (http.server). The PoseEstimator is created once; every request
reuses the per-bucket compiled programs, so steady-state latency is the
2-3 ms device time plus decode (docs/performance.md) rather than a compile.

Usage:
  python examples/pose/serve.py --model-bin ResNet-152.caffemodel \
      [--scales 0.8,1.0,1.2] [--port 5001]
  curl -s -F image=@person.jpg http://localhost:5001/estimate

Response: {"ok": true, "pose": [[x..],[y..],[conf..],[off_y..],[off_x..]],
           "joints": [{"name": ..., "x": ..., "y": ..., "confidence": ...}]}
(the 5x14 layout is the reference's, estimate_pose.py:60-67).
"""

import argparse
import io
import json
import os
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "web_demo"))

JOINT_NAMES = [
    "r_ankle", "r_knee", "r_hip", "l_hip", "l_knee", "l_ankle",
    "r_wrist", "r_elbow", "r_shoulder", "l_shoulder", "l_elbow", "l_wrist",
    "chin", "top_head",
]

INDEX_HTML = """<!doctype html>
<title>deepcut_tpu pose service</title>
<h1>Pose estimation</h1>
<form action="/estimate" method="post" enctype="multipart/form-data">
  <input type="file" name="image">
  <input type="submit" value="Estimate">
</form>
"""


class PoseApp:
    def __init__(self, model_def: str = "", model_bin: str = "",
                 scales=(1.0,), estimator=None, int8: bool = False):
        if estimator is None:
            from deepcut_tpu.pose.estimate import get_estimator

            estimator = get_estimator(model_def, model_bin)
        self.est = estimator
        self.scales = tuple(scales)
        self.int8 = int8  # calibrated lazily on the first request's image

    def estimate_bytes(self, raw: bytes):
        from PIL import Image

        img = np.asarray(Image.open(io.BytesIO(raw)).convert("RGB"),
                         np.uint8)[:, :, ::-1]  # BGR like the reference CLI
        if self.int8 and not self.est.is_int8:
            self.est.quantize_int8(img, scale=self.scales[0])
        raw_pose = self.est.estimate_pose(img, scales=self.scales)
        if raw_pose is None:  # no scale cleared the min-confidence bar
            raise ValueError("no pose found at the requested scales")
        pose = np.asarray(raw_pose, np.float64)
        joints = [{"name": JOINT_NAMES[j] if j < len(JOINT_NAMES) else str(j),
                   "x": round(float(pose[0, j]), 2),
                   "y": round(float(pose[1, j]), 2),
                   "confidence": round(float(pose[2, j]), 4)}
                  for j in range(pose.shape[1])]
        return {"pose": [[round(float(v), 4) for v in row] for row in pose],
                "joints": joints}


def make_handler(app: PoseApp):
    from app import _parse_multipart_image  # examples/web_demo's parser

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):
            pass

        def _send(self, code, body: bytes, ctype="text/html"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            self._send(200, INDEX_HTML.encode())

        def do_POST(self):
            if self.path != "/estimate":
                self._send(404, b"not found")
                return
            body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
            try:
                raw = _parse_multipart_image(self.headers, body)
                result = app.estimate_bytes(raw)
                result["ok"] = True
                self._send(200, json.dumps(result).encode(), "application/json")
            except Exception as e:  # report, don't crash the server
                self._send(400, json.dumps({"ok": False,
                                            "error": str(e)}).encode(),
                           "application/json")
    return Handler


def serve(app: PoseApp, port: int = 5001, background: bool = False):
    httpd = ThreadingHTTPServer(("127.0.0.1", port), make_handler(app))
    if background:
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        return httpd
    print(f"pose service on http://127.0.0.1:{httpd.server_address[1]}/")
    httpd.serve_forever()


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-def", default="")
    ap.add_argument("--model-bin", default="",
                    help=".caffemodel weights (random init if omitted)")
    ap.add_argument("--scales", default="1.0")
    ap.add_argument("--port", type=int, default=5001)
    ap.add_argument("--int8", action="store_true",
                    help="int8 serving (calibrates on the first request)")
    args = ap.parse_args(argv)
    scales = tuple(float(s) for s in args.scales.split(","))
    serve(PoseApp(args.model_def, args.model_bin, scales, int8=args.int8),
          args.port)


if __name__ == "__main__":
    main()
