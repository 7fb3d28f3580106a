"""Model-zoo parity: every deploy prototxt the reference ships must build
and forward through the graph engine — AlexNet, CaffeNet, GoogLeNet (142
layers, '/' names, inception concats), R-CNN ILSVRC13, flickr-style, the
siamese MNIST net, DeeperCut ResNet-152. This is the breadth statement the
per-op oracles can't make."""

import os

import numpy as np
import pytest

from deepcut_tpu.core.graph import Net
from deepcut_tpu.proto import text_format

ZOO = [
    ("bvlc_alexnet", "/root/reference/models/bvlc_alexnet/deploy.prototxt",
     (1, 3, 227, 227), "prob", 1000),
    ("bvlc_caffenet", "/root/reference/models/bvlc_reference_caffenet/deploy.prototxt",
     (1, 3, 227, 227), "prob", 1000),
    ("bvlc_googlenet", "/root/reference/models/bvlc_googlenet/deploy.prototxt",
     (1, 3, 224, 224), "prob", 1000),
    ("rcnn_ilsvrc13", "/root/reference/models/bvlc_reference_rcnn_ilsvrc13/deploy.prototxt",
     (1, 3, 227, 227), "fc-rcnn", 200),
    ("flickr_style", "/root/reference/models/finetune_flickr_style/deploy.prototxt",
     (1, 3, 227, 227), "prob", 20),
    ("mnist_siamese", "/root/reference/examples/siamese/mnist_siamese.prototxt",
     (1, 1, 28, 28), "feat", 2),
]


@pytest.mark.parametrize("name,path,shape,out_blob,out_ch",
                         ZOO, ids=[z[0] for z in ZOO])
def test_zoo_deploy_builds_and_forwards(name, path, shape, out_blob, out_ch):
    if not os.path.exists(path):
        pytest.skip("reference not mounted")
    net = Net(path, phase="TEST", compute_dtype=None)
    x = np.random.RandomState(0).randn(*shape).astype(np.float32) * 10
    out = net.forward(data=x)
    val = out[out_blob]
    assert val.shape[0] == shape[0]
    assert val.reshape(shape[0], -1).shape[1] == out_ch, val.shape
    assert np.isfinite(val).all()
    if out_blob == "prob":
        np.testing.assert_allclose(val.reshape(shape[0], -1).sum(-1), 1.0,
                                   rtol=1e-3)


def test_googlenet_slash_names_checkpoint_roundtrip(tmp_path):
    """GoogLeNet's 'inception_3a/1x1'-style layer names must survive the
    checkpoint flatten/unflatten (the round-1 '/'-separator bug class)."""
    path = "/root/reference/models/bvlc_googlenet/deploy.prototxt"
    if not os.path.exists(path):
        pytest.skip("reference not mounted")
    from deepcut_tpu.solver.solver import save_checkpoint, load_checkpoint

    net = Net(path, phase="TEST", compute_dtype=None)
    assert any("/" in k for k in net.params)
    ckpt = str(tmp_path / "goog.npz")
    save_checkpoint(ckpt, net.params, {"iter": np.int32(0)})
    params2, _ = load_checkpoint(ckpt)
    assert set(params2) == set(net.params)
    w = "inception_3a/1x1"
    np.testing.assert_array_equal(np.asarray(params2[w]["w"]),
                                  np.asarray(net.params[w]["w"]))
