"""Interchange layer: prototxt text-format parser + caffemodel wire codec.

The reference ResNet-152.prototxt (mounted read-only) is used as a parse
fixture; binary round-trips use synthetic models encoded by our own writer
(the same self-oracle pattern as the reference's test_upgrade_proto.cpp).
"""

import os
from collections import OrderedDict

import numpy as np
import pytest

from deepcut_tpu.proto import text_format
from deepcut_tpu.proto.caffemodel import (
    decode_netparameter, encode_netparameter, blobs_to_params,
)

REF_PROTOTXT = "/root/reference/models/deepercut/ResNet-152.prototxt"


def test_parse_scalars_and_messages():
    node = text_format.parse(
        """
        name: "test" # trailing comment
        input: "data"
        input_dim: 1 input_dim: 3
        layer {
          name: 'conv1'
          type: "Convolution"
          convolution_param { num_output: 64 stride: 2 bias_term: false }
        }
        layer { name: "relu1" type: "ReLU" }
        """
    )
    assert node.get_str("name") == "test"
    assert node.get_list("input_dim") == [1, 3]
    layers = node.get_list("layer")
    assert len(layers) == 2
    cp = layers[0].get("convolution_param")
    assert cp.get_int("num_output") == 64
    assert cp.get_bool("bias_term") is False
    assert layers[1].get_str("type") == "ReLU"


def test_parse_enum_and_inline_comment():
    node = text_format.parse("pool: MAX\nstride: 1 #2\nk: 1.5e-2")
    assert node.get_str("pool") == "MAX"
    assert node.get_int("stride") == 1
    assert abs(node.get_float("k") - 0.015) < 1e-9


def test_roundtrip_dump():
    src = 'name: "x"\nlayer {\n  name: "c"\n  type: "Convolution"\n}'
    node = text_format.parse(src)
    again = text_format.parse(text_format.dump(node))
    assert again.get_str("name") == "x"
    assert again.get_list("layer")[0].get_str("type") == "Convolution"


@pytest.mark.skipif(not os.path.exists(REF_PROTOTXT), reason="reference not mounted")
def test_parse_reference_resnet152_prototxt():
    net = text_format.parse_file(REF_PROTOTXT)
    assert net.get_str("name") == "ResNet-152"
    assert net.get_list("input_dim") == [1, 3, 688, 688]
    layers = net.get_list("layer")
    assert len(layers) == 680
    by_name = {l.get_str("name"): l for l in layers}
    # The fork's crucial deviation: res5 stride removed, dilation 2.
    r5 = by_name["res5a_branch2b"].get("convolution_param")
    assert r5.get_int("stride") == 1
    assert r5.get_int("dilation") == 2
    assert r5.get_int("pad") == 2
    assert by_name["prob"].get_str("type") == "Sigmoid"
    crop = by_name["crop1"]
    assert crop.get_list("bottom") == ["res5c_up_pose", "res3d_pose"]


def test_caffemodel_binary_roundtrip():
    rng = np.random.RandomState(0)
    layers = OrderedDict()
    layers["conv1"] = [rng.randn(8, 3, 7, 7).astype(np.float32),
                       rng.randn(8).astype(np.float32)]
    layers["bn_conv1"] = [rng.randn(8).astype(np.float32),
                          np.abs(rng.randn(8)).astype(np.float32),
                          np.array([0.999], np.float32)]
    layers["scale_conv1"] = [rng.randn(8).astype(np.float32),
                             rng.randn(8).astype(np.float32)]
    layers["fc"] = [rng.randn(10, 64).astype(np.float32),
                    rng.randn(10).astype(np.float32)]
    buf = encode_netparameter(layers)
    decoded = decode_netparameter(buf)
    assert list(decoded) == list(layers)
    for name in layers:
        for ours, theirs in zip(layers[name], decoded[name]):
            np.testing.assert_array_equal(ours, theirs.data)
            assert theirs.shape == ours.shape


def test_blobs_to_params_layout():
    rng = np.random.RandomState(1)
    layers = OrderedDict()
    layers["conv1"] = [rng.randn(8, 3, 3, 3).astype(np.float32)]
    layers["res5c_up_pose"] = [rng.randn(16, 4, 3, 3).astype(np.float32),
                               rng.randn(4).astype(np.float32)]
    layers["bn_conv1"] = [rng.randn(8).astype(np.float32),
                          np.abs(rng.randn(8)).astype(np.float32),
                          np.array([1.0], np.float32)]
    layers["scale_conv1"] = [rng.randn(8).astype(np.float32),
                             rng.randn(8).astype(np.float32)]
    buf = encode_netparameter(layers)
    params = blobs_to_params(decode_netparameter(buf), deconv_names=["res5c_up_pose"])
    assert params["conv1"]["w"].shape == (3, 3, 3, 8)        # HWIO
    assert params["res5c_up_pose"]["w"].shape == (3, 3, 16, 4)  # (kh,kw,Cin,Cout)
    assert params["res5c_up_pose"]["b"].shape == (4,)
    assert set(params["bn_conv1"]) == {"mean", "var", "scale_factor"}
    assert set(params["scale_conv1"]) == {"gamma", "beta"}
    # Channel mixing must be preserved: conv1 caffe [o,i,kh,kw] == hwio [kh,kw,i,o]
    np.testing.assert_array_equal(
        params["conv1"]["w"][1, 2, 0, 5], layers["conv1"][0][5, 0, 1, 2]
    )
