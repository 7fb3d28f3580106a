"""examples/classification.py smoke (00-classification / cpp_classification
analog): deploy prototxt + .caffemodel + image file -> top-5 printout, with
oversampling and mean/label handling."""

import importlib.util

import numpy as np


DEPLOY = """
name: "tinyclf"
input: "data"
input_dim: 1 input_dim: 3 input_dim: 16 input_dim: 16
layer { name: "conv1" type: "Convolution" bottom: "data" top: "conv1"
  convolution_param { num_output: 8 kernel_size: 3 pad: 1 stride: 2
    weight_filler { type: "gaussian" std: 0.2 } } }
layer { name: "relu1" type: "ReLU" bottom: "conv1" top: "conv1" }
layer { name: "fc" type: "InnerProduct" bottom: "conv1" top: "fc"
  inner_product_param { num_output: 5
    weight_filler { type: "gaussian" std: 0.2 } } }
layer { name: "prob" type: "Softmax" bottom: "fc" top: "prob" }
"""


def test_classification_script(tmp_path, capsys):
    from PIL import Image

    from deepcut_tpu.core.graph import Net
    from deepcut_tpu.proto import text_format
    from deepcut_tpu.proto.caffemodel import save_caffemodel
    from deepcut_tpu.io import array_to_blobproto_bytes

    deploy = tmp_path / "deploy.prototxt"
    deploy.write_text(DEPLOY)

    net = Net(text_format.parse(DEPLOY), phase="TEST", compute_dtype=None)
    net._ensure_params({"data": (1, 16, 16, 3)})
    host = {n: {k: np.asarray(v) for k, v in e.items()}
            for n, e in net.params.items()}
    weights = str(tmp_path / "tiny.caffemodel")
    save_caffemodel(weights, host)

    rng = np.random.RandomState(0)
    img_path = str(tmp_path / "img.png")
    Image.fromarray(rng.randint(0, 255, (24, 20, 3), np.uint8)).save(img_path)
    mean_path = str(tmp_path / "mean.binaryproto")
    with open(mean_path, "wb") as f:
        f.write(array_to_blobproto_bytes(
            np.full((1, 3, 16, 16), 120.0, np.float32)))
    labels_path = str(tmp_path / "labels.txt")
    with open(labels_path, "w") as f:
        f.write("\n".join(f"class_{i}" for i in range(5)) + "\n")

    spec = importlib.util.spec_from_file_location(
        "ex_classification", "/root/repo/examples/classification.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    # oversampled (10-crop) and center-crop paths both run
    assert mod.main([str(deploy), weights, img_path,
                     "--mean", mean_path, "--labels", labels_path]) == 0
    out = capsys.readouterr().out
    assert "class_" in out and img_path in out
    assert mod.main([str(deploy), weights, img_path, "--no-oversample"]) == 0
