"""Detector + examples/detection.py: window cropping with context padding,
batch classification, windows-file parsing (reference: python/caffe/
detector.py + detection.ipynb)."""

import importlib.util

import numpy as np


DEPLOY = """
name: "tinydet"
input: "data"
input_dim: 1 input_dim: 3 input_dim: 12 input_dim: 12
layer { name: "conv1" type: "Convolution" bottom: "data" top: "conv1"
  convolution_param { num_output: 6 kernel_size: 3 stride: 2
    weight_filler { type: "gaussian" std: 0.2 } } }
layer { name: "relu1" type: "ReLU" bottom: "conv1" top: "conv1" }
layer { name: "fc" type: "InnerProduct" bottom: "conv1" top: "fc"
  inner_product_param { num_output: 3
    weight_filler { type: "gaussian" std: 0.2 } } }
layer { name: "prob" type: "Softmax" bottom: "fc" top: "prob" }
"""


def _make_model(tmp_path):
    from deepcut_tpu.core.graph import Net
    from deepcut_tpu.proto import text_format
    from deepcut_tpu.proto.caffemodel import save_caffemodel

    deploy = tmp_path / "deploy.prototxt"
    deploy.write_text(DEPLOY)
    net = Net(text_format.parse(DEPLOY), phase="TEST", compute_dtype=None)
    net._ensure_params({"data": (1, 12, 12, 3)})
    host = {n: {k: np.asarray(v) for k, v in e.items()}
            for n, e in net.params.items()}
    weights = str(tmp_path / "tiny.caffemodel")
    save_caffemodel(weights, host)
    return str(deploy), weights


def test_detector_windows(tmp_path):
    from PIL import Image

    from deepcut_tpu.detector import Detector

    deploy, weights = _make_model(tmp_path)
    rng = np.random.RandomState(0)
    img_path = str(tmp_path / "scene.png")
    Image.fromarray(rng.randint(0, 255, (48, 64, 3), np.uint8)).save(img_path)

    det = Detector(deploy, weights, raw_scale=255.0, channel_swap=(2, 1, 0),
                   context_pad=2)
    windows = np.array([[0, 0, 23, 23], [10, 20, 40, 50], [5, 5, 30, 60]])
    out = det.detect_windows([(img_path, windows)])
    assert len(out) == 3
    for d, w in zip(out, windows):
        assert d["prediction"].shape == (3,)
        np.testing.assert_allclose(d["prediction"].sum(), 1.0, rtol=1e-4)
        assert np.array_equal(d["window"], w)

    # context_pad enlarges the crop around the window center
    im = np.zeros((48, 64, 3), np.float32)
    crop_plain = Detector.crop(det, im, [10, 20, 20, 30])
    assert crop_plain.shape[0] > 11  # padded beyond the 11px window


def test_detection_script(tmp_path, capsys):
    from PIL import Image

    deploy, weights = _make_model(tmp_path)
    rng = np.random.RandomState(1)
    img_path = str(tmp_path / "scene.png")
    Image.fromarray(rng.randint(0, 255, (40, 40, 3), np.uint8)).save(img_path)
    wfile = tmp_path / "windows.txt"
    wfile.write_text(f"{img_path}\n0 0 19 19\n5 5 30 30\n")

    spec = importlib.util.spec_from_file_location(
        "ex_detection", "/root/repo/examples/detection.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    blocks = mod.read_windows_file(str(wfile))
    assert len(blocks) == 1 and blocks[0][1].shape == (2, 4)

    out_npz = str(tmp_path / "det.npz")
    assert mod.main([deploy, weights, str(wfile), "--out", out_npz,
                     "--context-pad", "4"]) == 0
    printed = capsys.readouterr().out
    assert "-> class" in printed
    saved = np.load(out_npz)
    assert saved["predictions"].shape == (2, 3)
