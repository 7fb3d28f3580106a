"""Legacy caffemodel containers (V0/V1 upgrade path) + dataset tools +
classifier front end."""

import numpy as np
import pytest

from deepcut_tpu.proto import wire
from deepcut_tpu.proto.caffemodel import decode_netparameter


def _blob_enc(arr):
    b = wire.Encoder()
    sh = wire.Encoder()
    sh.packed_int64s(1, arr.shape)
    b.message(7, sh)
    b.packed_floats(5, arr.reshape(-1))
    return b


def _legacy_blob_enc(arr):
    """Legacy num/channels/height/width 4-D header instead of BlobShape."""
    b = wire.Encoder()
    n, c, h, w = arr.shape
    b.varint(1, n).varint(2, c).varint(3, h).varint(4, w)
    b.packed_floats(5, arr.reshape(-1))
    return b


def test_v1_layers_decoded():
    """V1 container: NetParameter.layers (field 2), name=4, enum type=5,
    blobs=6 — the upgrade_proto.cpp path for pre-2015 caffemodels."""
    rng = np.random.RandomState(0)
    w = rng.randn(4, 3, 3, 3).astype(np.float32)
    bias = rng.randn(4).astype(np.float32)
    layer = wire.Encoder()
    layer.string(4, "conv_legacy")
    layer.varint(5, 4)  # V1 enum CONVOLUTION
    layer.message(6, _legacy_blob_enc(w))
    layer.message(6, _blob_enc(bias.reshape(4)))
    net = wire.Encoder()
    net.string(1, "legacy_net")
    net.message(2, layer)
    out = decode_netparameter(net.tobytes())
    assert list(out) == ["conv_legacy"]
    blobs = out["conv_legacy"]
    assert blobs[0].shape == (4, 3, 3, 3)
    np.testing.assert_array_equal(blobs[0].data, w)
    np.testing.assert_array_equal(blobs[1].data, bias)


def test_v0_nested_layer_decoded():
    """V0 container: V1LayerParameter.layer (field 1) holding V0 with
    name=1, type=2 (string), blobs=50."""
    rng = np.random.RandomState(1)
    w = rng.randn(2, 2, 3, 3).astype(np.float32)
    v0 = wire.Encoder()
    v0.string(1, "conv_v0")
    v0.string(2, "conv")
    v0.message(50, _legacy_blob_enc(w))
    v1 = wire.Encoder()
    v1.message(1, v0)
    net = wire.Encoder()
    net.message(2, v1)
    out = decode_netparameter(net.tobytes())
    assert list(out) == ["conv_v0"]
    np.testing.assert_array_equal(out["conv_v0"][0].data, w)


def test_double_data_blob():
    arr = np.random.RandomState(2).randn(3, 2).astype(np.float64)
    b = wire.Encoder()
    sh = wire.Encoder()
    sh.packed_int64s(1, arr.shape)
    b.message(7, sh)
    b.bytes_(8, arr.astype("<f8").tobytes())  # double_data, packed
    layer = wire.Encoder()
    layer.string(1, "dl")
    layer.string(2, "InnerProduct")
    layer.message(7, b)
    net = wire.Encoder()
    net.message(100, layer)
    out = decode_netparameter(net.tobytes())
    np.testing.assert_allclose(out["dl"][0].data, arr.astype(np.float32))


def test_convert_imageset_and_mean(tmp_path):
    from PIL import Image
    from deepcut_tpu.tools.datasets import main

    rng = np.random.RandomState(0)
    paths = []
    for i in range(4):
        arr = rng.randint(0, 255, (10, 12, 3), np.uint8)
        p = tmp_path / f"im{i}.png"
        Image.fromarray(arr).save(p)
        paths.append((str(p), i % 2))
    listfile = tmp_path / "list.txt"
    listfile.write_text("\n".join(f"{p} {l}" for p, l in paths))
    db = str(tmp_path / "db")
    assert main(["convert_imageset", str(listfile), db]) == 0
    meanfile = str(tmp_path / "mean.binaryproto")
    assert main(["compute_image_mean", db, meanfile]) == 0
    from deepcut_tpu.io import blobproto_bytes_to_array
    with open(meanfile, "rb") as f:
        mean = blobproto_bytes_to_array(f.read())
    assert mean.shape == (1, 3, 10, 12)
    # the db round-trips through the Data layer
    from deepcut_tpu.data.lmdb_store import LMDBReader
    from deepcut_tpu.data.datum import Datum
    items = list(LMDBReader(db).items())
    assert len(items) == 4
    d = Datum.decode(items[0][1])
    assert d.to_array().shape == (3, 10, 12)


def test_classifier_predict(tmp_path):
    from deepcut_tpu.classifier import Classifier

    proto = tmp_path / "cls.prototxt"
    proto.write_text("""
        name: "cls"
        input: "data"
        input_dim: 2 input_dim: 3 input_dim: 8 input_dim: 8
        layer { name: "conv" type: "Convolution" bottom: "data" top: "conv"
          convolution_param { num_output: 5 kernel_size: 8
            weight_filler { type: "gaussian" std: 0.1 } } }
        layer { name: "prob" type: "Softmax" bottom: "conv" top: "prob" }
        """)
    clf = Classifier(str(proto), image_dims=(10, 10), raw_scale=255.0)
    ims = [np.random.RandomState(i).rand(12, 12, 3).astype(np.float32)
           for i in range(3)]
    preds = clf.predict(ims, oversample=True)
    assert preds.shape == (3, 5)
    np.testing.assert_allclose(preds.sum(axis=1), 1.0, rtol=1e-4)
    preds2 = clf.predict(ims, oversample=False)
    assert preds2.shape == (3, 5)


# -- V0 *text* prototxt upgrade (upgrade_proto.cpp UpgradeV0Net; fixture
# modeled on src/caffe/test/test_upgrade_proto.cpp's V0 CaffeNet) ------------

V0_TEXT_NET = """
name: "v0-caffenet-ish"
input: "data"
input_dim: 2 input_dim: 3 input_dim: 14 input_dim: 14
layers {
  layer {
    name: "conv1" type: "conv" num_output: 4 kernelsize: 3 stride: 1
    group: 1 biasterm: true
    weight_filler { type: "gaussian" std: 0.1 }
    blobs_lr: 1. blobs_lr: 2. weight_decay: 1. weight_decay: 0.
  }
  bottom: "data" top: "conv1"
}
layers {
  layer { name: "relu1" type: "relu" }
  bottom: "conv1" top: "conv1"
}
layers {
  layer { name: "pad2" type: "padding" pad: 1 }
  bottom: "conv1" top: "pad2"
}
layers {
  layer { name: "conv2" type: "conv" num_output: 4 kernelsize: 3
          weight_filler { type: "gaussian" std: 0.1 } }
  bottom: "pad2" top: "conv2"
}
layers {
  layer { name: "pool1" type: "pool" pool: MAX kernelsize: 2 stride: 2 }
  bottom: "conv2" top: "pool1"
}
layers {
  layer { name: "drop" type: "dropout" dropout_ratio: 0.5 }
  bottom: "pool1" top: "pool1"
}
layers {
  layer { name: "ip" type: "innerproduct" num_output: 5
          weight_filler { type: "gaussian" std: 0.1 }
          blobs_lr: 1. blobs_lr: 2. }
  bottom: "pool1" top: "ip"
}
layers {
  layer { name: "loss" type: "softmax_loss" }
  bottom: "ip" bottom: "label" top: "loss"
}
input: "label"
input_dim: 2 input_dim: 1 input_dim: 1 input_dim: 1
"""


def test_v0_text_net_upgrades_and_runs():
    from deepcut_tpu.proto import text_format
    from deepcut_tpu.proto.upgrade import upgrade_net, is_v0_net
    from deepcut_tpu.core.graph import Net

    proto = text_format.parse(V0_TEXT_NET)
    assert is_v0_net(proto)
    up = upgrade_net(proto)
    layers = up.get_list("layer")
    types = [l.get_str("type") for l in layers]
    # padding layer folded away, types modernised
    assert types == ["Convolution", "ReLU", "Convolution", "Pooling",
                     "Dropout", "InnerProduct", "SoftmaxWithLoss"]
    conv2 = layers[2]
    assert conv2.get_list("bottom") == ["conv1"]  # rewired past the padding
    assert conv2.get("convolution_param").get_int("pad") == 1
    # blobs_lr/weight_decay became ParamSpecs
    conv1 = layers[0]
    ps = conv1.get_list("param")
    assert ps[0].get_float("lr_mult") == 1.0 and ps[1].get_float("lr_mult") == 2.0
    assert ps[0].get_float("decay_mult") == 1.0 and ps[1].get_float("decay_mult") == 0.0

    # and the Net loads the V0 text directly (upgrade runs inside __init__)
    net = Net(text_format.parse(V0_TEXT_NET), phase="TEST", compute_dtype=None)
    rng = np.random.RandomState(0)
    out = net.forward(data=rng.randn(2, 3, 14, 14).astype(np.float32),
                      label=np.zeros(2, np.float32))
    # conv1 k3 s0p -> 12; conv2 k3 p1 -> 12; pool k2 s2 -> 6
    assert out["pool1"].shape == (2, 4, 6, 6)
    assert np.isfinite(out["loss"])


def test_upgrade_solver_proto_cli(tmp_path):
    from deepcut_tpu.tools import cli
    from deepcut_tpu.proto import text_format

    src = tmp_path / "old_solver.prototxt"
    src.write_text("base_lr: 0.01\nsolver_type: NESTEROV\nmax_iter: 100\n")
    dst = tmp_path / "new_solver.prototxt"
    assert cli.main(["upgrade_solver_proto", str(src), str(dst)]) == 0
    up = text_format.parse_file(str(dst))
    assert up.get_str("type") == "Nesterov"
    assert not up.has("solver_type")
    # numeric legacy enum form too
    src.write_text("base_lr: 0.01\nsolver_type: 4\n")
    assert cli.main(["upgrade_solver_proto", str(src), str(dst)]) == 0
    assert text_format.parse_file(str(dst)).get_str("type") == "AdaDelta"


def test_upgrade_net_proto_binary_cli(tmp_path):
    """V0-container binary caffemodel -> V2 binary via the CLI verb
    (tools/upgrade_net_proto_binary.cpp analog)."""
    from collections import OrderedDict
    from deepcut_tpu.proto.caffemodel import (
        encode_netparameter, decode_netparameter)
    from deepcut_tpu.tools import cli

    rng = np.random.RandomState(0)
    layers = OrderedDict()
    layers["conv"] = [rng.randn(4, 3, 3, 3).astype(np.float32),
                      rng.randn(4).astype(np.float32)]
    layers["ip"] = [rng.randn(5, 36).astype(np.float32)]
    src = tmp_path / "old.caffemodel"
    src.write_bytes(encode_netparameter(layers, container="v0"))
    dst = tmp_path / "new.caffemodel"
    assert cli.main(["upgrade_net_proto_binary", str(src), str(dst)]) == 0
    out = decode_netparameter(dst.read_bytes())
    assert list(out) == ["conv", "ip"]
    np.testing.assert_array_equal(out["conv"][0].data.reshape(4, 3, 3, 3),
                                  layers["conv"][0])


def test_graph_solver_hdf5_snapshot_format(tmp_path):
    """solver `snapshot_format: HDF5` writes .caffemodel.h5 (Net::ToHDF5
    layout) and the solverstate names it as learned_net."""
    import jax.numpy as jnp
    from deepcut_tpu.proto import text_format
    from deepcut_tpu.core.graph import Net
    from deepcut_tpu.solver.solver import SolverParams, GraphSolver
    from deepcut_tpu.proto.caffemodel import load_hdf5_weights, decode_solverstate

    PROTO = """
    input: "data"
    input_shape { dim: 2 dim: 4 }
    input: "label"
    input_shape { dim: 2 }
    layer { name: "ip" type: "InnerProduct" bottom: "data" top: "ip"
            inner_product_param { num_output: 2
              weight_filler { type: "gaussian" std: 0.2 } } }
    layer { name: "loss" type: "SoftmaxWithLoss" bottom: "ip" bottom: "label" top: "loss" }
    """
    sp = SolverParams.from_prototxt(f"""
        base_lr: 0.1
        lr_policy: "fixed"
        display: 0
        max_iter: 2
        snapshot: 0
        snapshot_prefix: "{tmp_path}/h5s"
        snapshot_format: HDF5
    """)
    net = Net(text_format.parse(PROTO), phase="TRAIN", compute_dtype=None)
    s = GraphSolver(sp, net, handle_signals=False, log=lambda *_: None)
    x = np.random.RandomState(0).randn(2, 4).astype(np.float32)
    y = np.array([0, 1], np.int32)
    s._next_inputs = lambda: {"data": jnp.asarray(x), "label": jnp.asarray(y)}
    s.solve()
    s.snapshot()
    h5 = f"{tmp_path}/h5s_iter_2.caffemodel.h5"
    blobs = load_hdf5_weights(h5)
    np.testing.assert_allclose(blobs["ip"][0].data,
                               np.asarray(net.params["ip"]["w"]), rtol=1e-6)
    _, learned, _, _ = decode_solverstate(
        open(f"{tmp_path}/h5s_iter_2.solverstate", "rb").read())
    assert learned.endswith(".caffemodel.h5")


def test_resize_and_crop_tree(tmp_path):
    """tools/extra/resize_and_crop_images.py analog: shortest side lands on
    --side, center square crop with the reference's floor-division geometry,
    relative paths preserved."""
    from PIL import Image
    from deepcut_tpu.tools.datasets import main, square_crop_geometry

    rng = np.random.RandomState(1)
    src = tmp_path / "in"
    (src / "n01").mkdir(parents=True)
    (src / "n02").mkdir()
    shapes = [(30, 17), (13, 40), (8, 8)]
    rels = ["n01/a.jpg", "n01/b.png", "n02/c.jpg"]
    for rel, (h, w) in zip(rels, shapes):
        Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8)).save(src / rel)
    out = tmp_path / "out"
    assert main(["resize_and_crop", str(src), str(out), "--side", "8",
                 "--workers", "2"]) == 0
    for rel in rels:
        im = Image.open(out / rel)
        assert im.size == (8, 8), rel
    # geometry matches the reference's integer math (py2 floor division):
    # 30x17 @ side 8 -> scaled (8*30//17, 8) = (14, 8), offset ((14-8)//2, 0)
    assert square_crop_geometry(30, 17, 8) == ((14, 8), (3, 0))
    assert square_crop_geometry(13, 40, 8) == ((8, 24), (0, 8))
    # listfile mode processes only the named subset
    lst = tmp_path / "subset.txt"
    lst.write_text("n02/c.jpg\n")
    out2 = tmp_path / "out2"
    assert main(["resize_and_crop", str(src), str(out2), "--side", "8",
                 "--listfile", str(lst)]) == 0
    assert (out2 / "n02/c.jpg").exists() and not (out2 / "n01").exists()
