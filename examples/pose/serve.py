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
import queue
import sys
import threading
import time
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


class _Batcher:
    """Dynamic micro-batching: concurrent /estimate requests are collected
    within a latency window (first request opens the window) and run as ONE
    device program through `PoseEstimator.estimate_pose_many`, which groups
    mixed sizes by canvas bucket. Per-image results are identical to the
    unbatched path; throughput rides the estimator's chunked batch peak
    instead of paying one dispatch per request. The reference has no
    serving story at all — this is the TPU deployment shape."""

    def __init__(self, est, scale: float, window_ms: float = 4.0,
                 max_batch: int = 8):
        self.est = est
        self.scale = float(scale)
        self.window_s = window_ms / 1e3
        self.max_batch = int(max_batch)
        self.q: "queue.Queue" = queue.Queue()
        self.batches_run = 0
        self.images_run = 0
        threading.Thread(target=self._run, daemon=True).start()

    def submit(self, img: np.ndarray) -> np.ndarray:
        done = threading.Event()
        slot: dict = {}
        self.q.put((img, done, slot))
        done.wait()
        if "error" in slot:
            raise slot["error"]
        return slot["pose"]

    def _run(self):
        while True:
            batch = [self.q.get()]
            deadline = time.monotonic() + self.window_s
            while len(batch) < self.max_batch:
                left = deadline - time.monotonic()
                if left <= 0:
                    break
                try:
                    batch.append(self.q.get(timeout=left))
                except queue.Empty:
                    break
            try:
                poses = self.est.estimate_pose_many(
                    [b[0] for b in batch], self.scale)
                self.batches_run += 1
                self.images_run += len(batch)
                for (img, done, slot), pose in zip(batch, poses):
                    slot["pose"] = pose
                    done.set()
            except Exception as e:  # pragma: no cover - surfaced per request
                for _, done, slot in batch:
                    slot["error"] = e
                    done.set()


class PoseApp:
    def __init__(self, model_def: str = "", model_bin: str = "",
                 scales=(1.0,), estimator=None, int8: bool = False,
                 batch_window_ms: float = 0.0, max_batch: int = 8):
        if estimator is None:
            from deepcut_tpu.pose.estimate import get_estimator

            estimator = get_estimator(model_def, model_bin)
        self.est = estimator
        self.scales = tuple(scales)
        self.int8 = int8  # calibrated lazily on the first request's image
        self._calib_lock = threading.Lock()
        self.batcher = None
        if batch_window_ms > 0:
            if len(self.scales) != 1:
                raise ValueError(
                    "--batch-window needs a single --scales value (requests "
                    "in one batch share the scale)")
            self.batcher = _Batcher(estimator, self.scales[0],
                                    window_ms=batch_window_ms,
                                    max_batch=max_batch)

    def estimate_bytes(self, raw: bytes):
        from PIL import Image

        img = np.asarray(Image.open(io.BytesIO(raw)).convert("RGB"),
                         np.uint8)[:, :, ::-1]  # BGR like the reference CLI
        if self.int8 and not self.est.is_int8:
            with self._calib_lock:
                if not self.est.is_int8:
                    self.est.quantize_int8(img, scale=self.scales[0])
        if self.batcher is not None:
            pose = self.batcher.submit(img)
            raw_pose = None if float(np.min(pose[2])) == 0.0 else pose
        else:
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
    ap.add_argument("--batch-window", type=float, default=0.0,
                    help="dynamic batching: collect concurrent requests for "
                         "this many ms and run them as one device batch "
                         "(single --scales value only; 0 = off)")
    ap.add_argument("--max-batch", type=int, default=8,
                    help="max requests per dynamic batch")
    args = ap.parse_args(argv)
    scales = tuple(float(s) for s in args.scales.split(","))
    serve(PoseApp(args.model_def, args.model_bin, scales, int8=args.int8,
                  batch_window_ms=args.batch_window,
                  max_batch=args.max_batch),
          args.port)


if __name__ == "__main__":
    main()
