"""Front-end surfaces: net_spec authoring, pycaffe-compat facade, io utils."""

import numpy as np
import pytest

from deepcut_tpu.net_spec import NetSpec, layers as L
from deepcut_tpu.proto import text_format
import deepcut_tpu.compat as caffe
from deepcut_tpu import io as dio


def _tiny_prototxt() -> str:
    return """
    name: "tiny"
    input: "data"
    input_dim: 1 input_dim: 3 input_dim: 16 input_dim: 16
    layer {
      name: "conv1" type: "Convolution" bottom: "data" top: "conv1"
      convolution_param {
        num_output: 4 kernel_size: 3 pad: 1
        weight_filler { type: "gaussian" std: 0.1 }
      }
    }
    layer { name: "relu1" type: "ReLU" bottom: "conv1" top: "conv1" }
    layer {
      name: "pool1" type: "Pooling" bottom: "conv1" top: "pool1"
      pooling_param { kernel_size: 2 stride: 2 pool: MAX }
    }
    layer { name: "prob" type: "Sigmoid" bottom: "pool1" top: "prob" }
    """


def test_net_spec_roundtrip(tmp_path):
    n = NetSpec()
    n.data = L.Input(input_param=dict(shape=dict(dim=[1, 3, 8, 8])))
    n.conv1 = L.Convolution(n.data, num_output=4, kernel_size=3, pad=1,
                            weight_filler=dict(type="gaussian", std=0.1))
    n.relu1 = L.ReLU(n.conv1, in_place=True)
    n.pool1 = L.Pooling(n.relu1, kernel_size=2, stride=2, pool="MAX")
    text = n.to_proto_text()
    node = text_format.parse(text)
    layers_ = node.get_list("layer")
    types = [l.get_str("type") for l in layers_]
    assert types == ["Input", "Convolution", "ReLU", "Pooling"]
    relu = layers_[2]
    assert relu.get_list("bottom") == relu.get_list("top")  # in-place
    conv = layers_[1]
    assert conv.get("convolution_param").get_int("num_output") == 4
    net = n.to_net(compute_dtype=None)
    out = net.forward(data=np.random.RandomState(0).randn(1, 3, 8, 8).astype(np.float32))
    assert out["pool1"].shape == (1, 4, 4, 4)


def test_compat_net_forward(tmp_path):
    path = tmp_path / "tiny.prototxt"
    path.write_text(_tiny_prototxt())
    net = caffe.Net(str(path), caffe.TEST)
    assert net.inputs == ["data"]
    assert net.outputs == ["prob"]
    x = np.random.RandomState(1).randn(1, 3, 16, 16).astype(np.float32)
    net.blobs["data"].data[...] = x
    out = net.forward()
    assert out["prob"].shape == (1, 4, 8, 8)
    assert np.all(out["prob"] >= 0) and np.all(out["prob"] <= 1)
    # kwargs style
    out2 = net.forward(data=x)
    np.testing.assert_array_equal(out["prob"], out2["prob"])
    # params view exposes conv weights in Caffe-free layout
    assert "conv1" in net.params
    assert net.params["conv1"][0].data.shape == (3, 3, 3, 4)  # HWIO


def test_compat_save_and_copy_from(tmp_path):
    path = tmp_path / "tiny.prototxt"
    path.write_text(_tiny_prototxt())
    net = caffe.Net(str(path), caffe.TEST)
    x = np.random.RandomState(1).randn(1, 3, 16, 16).astype(np.float32)
    a = net.forward(data=x)["prob"]
    model_path = str(tmp_path / "tiny.caffemodel")
    net.save(model_path)
    net2 = caffe.Net(str(path), model_path, caffe.TEST)
    b = net2.forward(data=x)["prob"]
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_transformer_roundtrip():
    t = dio.Transformer({"data": (1, 3, 4, 4)})
    t.set_transpose("data", (2, 0, 1))
    t.set_channel_swap("data", (2, 1, 0))
    t.set_raw_scale("data", 255.0)
    t.set_mean("data", np.array([104.0, 117.0, 123.0]))
    img = np.random.RandomState(0).rand(4, 4, 3).astype(np.float32)
    pre = t.preprocess("data", img)
    assert pre.shape == (3, 4, 4)
    back = t.deprocess("data", pre)
    np.testing.assert_allclose(back, img, rtol=1e-5, atol=1e-5)


def test_blobproto_roundtrip():
    arr = np.random.RandomState(0).randn(2, 3, 4).astype(np.float32)
    buf = dio.array_to_blobproto_bytes(arr)
    back = dio.blobproto_bytes_to_array(buf)
    np.testing.assert_array_equal(arr, back)


def test_oversample():
    ims = [np.random.RandomState(0).rand(10, 10, 3).astype(np.float32)]
    crops = dio.oversample(ims, (8, 8))
    assert crops.shape == (10, 8, 8, 3)
    np.testing.assert_array_equal(crops[5], crops[0][:, ::-1, :])


PARTIAL_PROTO = """
name: "partial"
input: "data"
input_shape { dim: 2 dim: 4 }
layer { name: "a" type: "Power" bottom: "data" top: "a"
        power_param { scale: 2.0 } }
layer { name: "b" type: "Power" bottom: "a" top: "b"
        power_param { shift: 1.0 } }
layer { name: "c" type: "Power" bottom: "b" top: "c"
        power_param { scale: 10.0 } }
"""


def test_compat_forward_start_end(tmp_path):
    """Partial execution semantics of pycaffe _Net_forward (pycaffe.py:62-107):
    forward(end=) stops there; forward(start=) resumes from staged blobs."""
    proto_path = tmp_path / "partial.prototxt"
    proto_path.write_text(PARTIAL_PROTO)
    net = caffe.Net(str(proto_path), caffe.TEST)
    x = np.arange(8, dtype=np.float32).reshape(2, 4)
    net.blobs["data"].data[...] = x

    out = net.forward(end="b")
    np.testing.assert_allclose(out["b"], 2 * x + 1)
    assert "c" not in out  # later layers did not run

    # edit the intermediate and resume from layer "c" — net surgery style
    net.blobs["b"].data[...] = np.ones((2, 4), np.float32)
    out = net.forward(start="c")
    np.testing.assert_allclose(out["c"], 10.0 * np.ones((2, 4)))

    # full forward still works and overwrites staged edits
    out = net.forward()
    np.testing.assert_allclose(net.blobs["c"].data, (2 * x + 1) * 10)


def test_graph_forward_start_end_validation():
    from deepcut_tpu.core.graph import Net

    net = Net(text_format.parse(PARTIAL_PROTO), compute_dtype=None)
    with pytest.raises(ValueError):
        net.plan_slice("c", "a")
    x = np.ones((2, 4), np.float32)
    net.forward(data=x)
    outs = net.forward(start="b", end="b")
    np.testing.assert_allclose(outs["b"], 2 * x + 1)


FILTER_PROTO = """
name: "filternet"
input: "data"
input_shape { dim: 4 dim: 3 }
input: "sel"
input_shape { dim: 4 }
layer { name: "filt" type: "Filter" bottom: "data" bottom: "sel" top: "filt" }
layer {
  name: "ip" type: "InnerProduct" bottom: "filt" top: "ip"
  inner_product_param { num_output: 2 bias_term: false
    weight_filler { type: "gaussian" std: 0.5 } }
}
"""


def test_filter_consumer_contract():
    """Filter under XLA static shapes: kept items compact to the FRONT and
    dropped rows are zeroed (documented deviation from filter_layer.cpp's
    shrinking batch). A downstream consumer therefore sees zero rows — this
    test pins that contract so consumers can rely on it."""
    from deepcut_tpu.core.graph import Net

    net = Net(text_format.parse(FILTER_PROTO), compute_dtype=None)
    rng = np.random.RandomState(0)
    x = rng.randn(4, 3).astype(np.float32) + 5.0
    sel = np.array([0.0, 1.0, 0.0, 1.0], np.float32)
    out = net.forward(data=x, sel=sel)
    # kept rows (1, 3) first and in order, dropped rows zero
    np.testing.assert_allclose(out["filt"][:2], x[[1, 3]], rtol=1e-6)
    np.testing.assert_allclose(out["filt"][2:], 0.0)
    # the consumer computes real values on kept rows, exact zeros on dropped
    assert np.abs(out["ip"][:2]).min() > 0
    np.testing.assert_allclose(out["ip"][2:], 0.0)


def test_compat_layers_view(tmp_path):
    """pycaffe net.layers / net._layer_names parity (_caffe.cpp Layer)."""
    proto_path = tmp_path / "n.prototxt"
    proto_path.write_text("""
    input: "data"
    input_shape { dim: 1 dim: 4 }
    layer { name: "ip" type: "InnerProduct" bottom: "data" top: "ip"
            inner_product_param { num_output: 3
              weight_filler { type: "gaussian" std: 0.1 } } }
    layer { name: "relu" type: "ReLU" bottom: "ip" top: "ip" }
    """)
    net = caffe.Net(str(proto_path), caffe.TEST)
    assert net._layer_names == ["ip", "relu"]
    assert [l.type for l in net.layers] == ["InnerProduct", "ReLU"]
    assert net.layers[0].blobs[0].data.shape == (3, 4)
    assert net.layers[1].blobs == []


def test_compat_backward(tmp_path):
    """pycaffe net.backward() returns input-blob gradients."""
    proto_path = tmp_path / "b.prototxt"
    proto_path.write_text("""
    input: "data"
    input_shape { dim: 2 dim: 4 }
    input: "label"
    input_shape { dim: 2 }
    layer { name: "ip" type: "InnerProduct" bottom: "data" top: "ip"
            inner_product_param { num_output: 3
              weight_filler { type: "gaussian" std: 0.3 } } }
    layer { name: "loss" type: "SoftmaxWithLoss" bottom: "ip" bottom: "label" top: "loss" }
    """)
    net = caffe.Net(str(proto_path), caffe.TRAIN)
    rng = np.random.RandomState(0)
    net.blobs["data"].data[...] = rng.randn(2, 4)
    net.blobs["label"].data[...] = np.array([0.0, 2.0])
    grads = net.backward()
    assert grads["data"].shape == (2, 4)
    assert np.abs(grads["data"]).sum() > 0


def test_transformer_preprocess_order_hand_math():
    """Pycaffe operation ORDER (io.py preprocess): transpose -> channel_swap
    -> raw_scale -> mean subtract -> input_scale. Pinned against independent
    hand math (a roundtrip with deprocess would pass even with both sides
    wrong in the same way)."""
    from deepcut_tpu.io import Transformer

    t = Transformer({"data": (1, 3, 4, 4)})
    t.set_transpose("data", (2, 0, 1))
    t.set_channel_swap("data", (2, 1, 0))
    t.set_raw_scale("data", 255.0)
    mean = np.array([10.0, 20.0, 30.0], np.float32)[:, None, None]
    t.set_mean("data", mean[:, 0, 0])
    t.set_input_scale("data", 0.5)
    x = np.random.RandomState(0).rand(4, 4, 3).astype(np.float32)
    got = t.preprocess("data", x)
    expected = (x.transpose(2, 0, 1)[[2, 1, 0]] * 255.0 - mean) * 0.5
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_wire_format_golden_bytes():
    """Hand-written protobuf wire bytes (not produced by our own encoder):
    catches symmetric encode/decode bugs that pure roundtrip tests mask.
    Datum fields per caffe.proto: channels=1, height=2, width=3, data=4,
    label=5, float_data=6(packed), encoded=7; BlobProto: num..width=1..4,
    data=5 (packed float)."""
    import struct
    from deepcut_tpu.data.datum import Datum
    from deepcut_tpu.io import blobproto_bytes_to_array

    golden_datum = bytes([
        0x08, 0x01,              # channels = 1
        0x10, 0x02,              # height = 2
        0x18, 0x03,              # width = 3
        0x22, 0x06, 1, 2, 3, 4, 5, 6,   # data = 6 raw bytes
        0x28, 0x07,              # label = 7
    ])
    d = Datum.decode(golden_datum)
    assert (d.channels, d.height, d.width, d.label) == (1, 2, 3, 7)
    assert d.data == bytes([1, 2, 3, 4, 5, 6])
    np.testing.assert_allclose(d.to_array(),
                               np.arange(1, 7, dtype=np.float32).reshape(1, 2, 3))
    # our encoder must emit exactly these bytes (ascending field order)
    assert Datum(1, 2, 3, data=bytes([1, 2, 3, 4, 5, 6]), label=7).encode() \
        == golden_datum

    # float_data + encoded flags
    floats = struct.pack("<2f", 1.5, -2.0)
    golden_f = bytes([0x08, 0x02, 0x10, 0x01, 0x18, 0x01,
                      0x32, len(floats)]) + floats + bytes([0x38, 0x01])
    df = Datum.decode(golden_f)
    assert df.float_data == [1.5, -2.0] and df.encoded

    # BlobProto with legacy num/channels dims and packed float data
    data = struct.pack("<2f", 0.25, 4.0)
    golden_blob = bytes([0x08, 0x01, 0x10, 0x02, 0x18, 0x01, 0x20, 0x01,
                         0x2A, len(data)]) + data
    arr = blobproto_bytes_to_array(golden_blob)
    np.testing.assert_allclose(arr.reshape(-1), [0.25, 4.0])
    assert arr.shape == (1, 2, 1, 1)
