"""examples/web_demo round-trip: start the stdlib HTTP classifier app
in-process, POST a multipart image upload, check the JSON top-5 response."""

import importlib.util
import io as _io
import json
import urllib.request

import numpy as np


DEPLOY = """
name: "tinyweb"
input: "data"
input_dim: 1 input_dim: 3 input_dim: 16 input_dim: 16
layer { name: "conv1" type: "Convolution" bottom: "data" top: "conv1"
  convolution_param { num_output: 4 kernel_size: 3 stride: 2
    weight_filler { type: "gaussian" std: 0.2 } } }
layer { name: "fc" type: "InnerProduct" bottom: "conv1" top: "fc"
  inner_product_param { num_output: 6
    weight_filler { type: "gaussian" std: 0.2 } } }
layer { name: "prob" type: "Softmax" bottom: "fc" top: "prob" }
"""


def test_web_demo_roundtrip(tmp_path):
    from PIL import Image

    from deepcut_tpu.core.graph import Net
    from deepcut_tpu.proto import text_format
    from deepcut_tpu.proto.caffemodel import save_caffemodel

    deploy = tmp_path / "deploy.prototxt"
    deploy.write_text(DEPLOY)
    net = Net(text_format.parse(DEPLOY), phase="TEST", compute_dtype=None)
    net._ensure_params({"data": (1, 16, 16, 3)})
    weights = str(tmp_path / "w.caffemodel")
    save_caffemodel(weights, {n: {k: np.asarray(v) for k, v in e.items()}
                              for n, e in net.params.items()})

    spec = importlib.util.spec_from_file_location(
        "ex_webdemo", "/root/repo/examples/web_demo/app.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    labels = [f"thing_{i}" for i in range(6)]
    app = mod.ClassifierApp(str(deploy), weights, labels=labels)
    httpd = mod.serve(app, port=0, background=True)  # port 0: OS-assigned
    try:
        port = httpd.server_address[1]
        # index page
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/") as r:
            assert b"Classification demo" in r.read()
        # multipart upload
        buf = _io.BytesIO()
        Image.fromarray(np.random.RandomState(0).randint(
            0, 255, (20, 20, 3), np.uint8)).save(buf, format="PNG")
        boundary = "xyzboundary"
        body = (f"--{boundary}\r\n"
                f'Content-Disposition: form-data; name="image"; '
                f'filename="t.png"\r\n'
                f"Content-Type: image/png\r\n\r\n").encode() + buf.getvalue() \
            + f"\r\n--{boundary}--\r\n".encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/classify_upload", data=body,
            headers={"Content-Type":
                     f"multipart/form-data; boundary={boundary}"})
        with urllib.request.urlopen(req) as r:
            resp = json.loads(r.read())
        assert resp["ok"], resp
        assert len(resp["top5"]) == 5
        assert resp["top5"][0]["label"].startswith("thing_")
        probs = [t["prob"] for t in resp["top5"]]
        assert probs == sorted(probs, reverse=True)
    finally:
        httpd.shutdown()


def test_pose_serve_roundtrip():
    """examples/pose/serve.py: in-process pose service with a tiny estimator,
    multipart upload -> 5xJ pose JSON with named joints."""
    import jax
    from PIL import Image

    from deepcut_tpu.models.resnet import DeeperCutConfig, init_params
    from deepcut_tpu.pose.estimate import PoseEstimator

    cfg = DeeperCutConfig(depths=(1, 1, 1, 1), stage_widths=(4, 4, 8, 8),
                          num_joints=3)
    est = PoseEstimator(init_params(jax.random.PRNGKey(0), cfg), cfg,
                        bucket_step=64, max_size=256)

    spec = importlib.util.spec_from_file_location(
        "ex_pose_serve", "/root/repo/examples/pose/serve.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    app = mod.PoseApp(estimator=est)
    httpd = mod.serve(app, port=0, background=True)
    try:
        port = httpd.server_address[1]
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/") as r:
            assert b"Pose estimation" in r.read()
        buf = _io.BytesIO()
        Image.fromarray(np.random.RandomState(1).randint(
            0, 255, (48, 64, 3), np.uint8)).save(buf, format="PNG")
        boundary = "poseboundary"
        body = (f"--{boundary}\r\n"
                f'Content-Disposition: form-data; name="image"; '
                f'filename="p.png"\r\n'
                f"Content-Type: image/png\r\n\r\n").encode() + buf.getvalue() \
            + f"\r\n--{boundary}--\r\n".encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/estimate", data=body,
            headers={"Content-Type":
                     f"multipart/form-data; boundary={boundary}"})
        with urllib.request.urlopen(req) as r:
            resp = json.loads(r.read())
        assert resp["ok"], resp
        assert len(resp["pose"]) == 5 and len(resp["pose"][0]) == 3
        assert len(resp["joints"]) == 3
        assert {"name", "x", "y", "confidence"} <= set(resp["joints"][0])
    finally:
        httpd.shutdown()


def test_pose_serve_int8_lazy_calibration():
    """PoseApp(int8=True) calibrates the estimator on the first request and
    serves quantized afterwards."""
    import jax
    from PIL import Image

    from deepcut_tpu.models.resnet import DeeperCutConfig, init_params
    from deepcut_tpu.pose.estimate import PoseEstimator

    cfg = DeeperCutConfig(depths=(1, 1, 1, 1), stage_widths=(4, 4, 8, 8),
                          num_joints=3, compute_dtype=np.float32)
    est = PoseEstimator(init_params(jax.random.PRNGKey(0), cfg), cfg,
                        folded=False, bucket_step=64, max_size=256)

    spec = importlib.util.spec_from_file_location(
        "ex_pose_serve_i8", "/root/repo/examples/pose/serve.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    app = mod.PoseApp(estimator=est, int8=True)
    buf = _io.BytesIO()
    Image.fromarray(np.random.RandomState(2).randint(
        0, 255, (48, 64, 3), np.uint8)).save(buf, format="PNG")
    assert not est._int8
    out = app.estimate_bytes(buf.getvalue())
    assert est._int8, "first request must calibrate"
    assert len(out["pose"]) == 5
    out2 = app.estimate_bytes(buf.getvalue())  # steady-state int8
    np.testing.assert_allclose(out["pose"], out2["pose"])


def test_pose_serve_dynamic_batching():
    """--batch-window mode: concurrent mixed-size requests are grouped into
    device batches (batches_run < images_run) and every response equals the
    unbatched single-image answer."""
    import concurrent.futures
    import jax
    from PIL import Image

    from deepcut_tpu.models.resnet import DeeperCutConfig, init_params
    from deepcut_tpu.pose.estimate import PoseEstimator

    cfg = DeeperCutConfig(depths=(1, 1, 1, 1), stage_widths=(4, 4, 8, 8),
                          num_joints=3)
    est = PoseEstimator(init_params(jax.random.PRNGKey(0), cfg), cfg,
                        bucket_step=64, max_size=256)

    spec = importlib.util.spec_from_file_location(
        "ex_pose_serve_batch", "/root/repo/examples/pose/serve.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    app = mod.PoseApp(estimator=est, batch_window_ms=300.0, max_batch=8)
    httpd = mod.serve(app, port=0, background=True)
    rng = np.random.RandomState(3)
    frames = [rng.randint(0, 255, (h, w, 3), np.uint8)
              for h, w in [(48, 64), (40, 56), (48, 64), (100, 90), (44, 60)]]
    # warm the compiled programs so the timed window isn't dominated by
    # first-compile skew (each size/bucket compiles once)
    est.estimate_pose_many(frames)

    def post(img):
        buf = _io.BytesIO()
        Image.fromarray(img[:, :, ::-1]).save(buf, format="PNG")
        boundary = "poseb"
        body = (f"--{boundary}\r\n"
                f'Content-Disposition: form-data; name="image"; '
                f'filename="p.png"\r\n'
                f"Content-Type: image/png\r\n\r\n").encode() + buf.getvalue() \
            + f"\r\n--{boundary}--\r\n".encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{httpd.server_address[1]}/estimate", data=body,
            headers={"Content-Type":
                     f"multipart/form-data; boundary={boundary}"})
        with urllib.request.urlopen(req) as r:
            return json.loads(r.read())
    try:
        with concurrent.futures.ThreadPoolExecutor(5) as pool:
            resps = list(pool.map(post, frames))
        assert all(r["ok"] for r in resps), resps
        assert app.batcher.images_run == 5
        assert app.batcher.batches_run < 5  # actually batched
        for img, resp in zip(frames, resps):
            single = est.estimate_pose(img, scales=[1.0])
            np.testing.assert_allclose(
                np.asarray(resp["pose"], np.float64),
                np.round(np.asarray(single, np.float64), 4),
                atol=2e-4)
    finally:
        httpd.shutdown()
