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


@pytest.mark.skipif(not os.path.exists(REF_PROTOTXT), reason="reference not mounted")
def test_full_resnet152_caffemodel_roundtrip(tmp_path):
    """De-risk the converter the way a real pretrained file would: encode ALL
    680 layers' blobs of a synthetic ResNet-152 (Net::ToProto layouts), load
    through Net(prototxt, weights=...), and require the graph forward to
    match the native forward with the same weights
    (reference: net.cpp:805-846 CopyTrainedLayersFrom)."""
    import jax
    import jax.numpy as jnp
    from deepcut_tpu.core.graph import Net
    from deepcut_tpu.models.resnet import deepercut_config, init_params, forward
    from deepcut_tpu.proto.caffemodel import save_caffemodel, load_caffemodel

    cfg = deepercut_config(152, compute_dtype=jnp.float32)
    params = init_params(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "r152.caffemodel")
    save_caffemodel(path, jax.tree_util.tree_map(np.asarray, params))

    net = Net(REF_PROTOTXT, weights=path, compute_dtype=None)
    # 161 convs (155 trunk + 6 head) + 155 BN + 155 Scale = 471 param layers
    assert len(net.params) == 471
    x = np.random.RandomState(0).randn(1, 3, 64, 64).astype(np.float32) * 10
    out_graph = net.forward(data=x)
    out_native = forward(params, jnp.asarray(x.transpose(0, 2, 3, 1)), cfg)
    # random-init activations reach ~1e8 after 50 residual blocks; the graph
    # engine and the native path group f32 summations differently (fused
    # heads vs per-layer), so allow summation-order noise (~3e-4 relative).
    for blob in ("loc_pred", "next_pred"):
        g = out_graph[blob].transpose(0, 2, 3, 1)
        n = np.asarray(out_native[blob])
        np.testing.assert_allclose(g, n, rtol=2e-3, atol=1e-3)


@pytest.mark.skipif(not os.path.exists(REF_PROTOTXT), reason="reference not mounted")
def test_full_resnet152_legacy_containers_decode_identically(tmp_path):
    """The same full-size model encoded in V1 and V0 containers must decode
    blob-for-blob identically to the V2 form (UpgradeNetAsNeeded,
    upgrade_proto.cpp:19-67; legacy 4-D blob shapes)."""
    import jax
    import jax.numpy as jnp
    from deepcut_tpu.models.resnet import deepercut_config, init_params
    from deepcut_tpu.proto.caffemodel import (
        save_caffemodel, load_caffemodel, blobs_to_params)

    cfg = deepercut_config(152, compute_dtype=jnp.float32)
    params = jax.tree_util.tree_map(
        np.asarray, init_params(jax.random.PRNGKey(1), cfg))
    paths = {}
    for container in ("v2", "v1", "v0"):
        paths[container] = str(tmp_path / f"r152.{container}.caffemodel")
        save_caffemodel(paths[container], params, container=container)
    deconvs = [n for n in params if n.startswith("res5c_up_")]
    ref = blobs_to_params(load_caffemodel(paths["v2"]), deconv_names=deconvs)
    for container in ("v1", "v0"):
        got = blobs_to_params(load_caffemodel(paths[container]),
                              deconv_names=deconvs)
        assert list(got) == list(ref)
        for name in ref:
            assert set(got[name]) == set(ref[name]), name
            for key in ref[name]:
                np.testing.assert_array_equal(got[name][key], ref[name][key])


def test_prototxt_roundtrip_fuzz():
    """Property fuzz: random nested messages survive dump -> parse exactly
    (field order, repeats, nesting, strings with escapes, enum-likes,
    scientific floats). Guards the interchange layer against quoting/
    coercion regressions a fixed fixture would miss."""
    import random

    from deepcut_tpu.proto.text_format import PbNode, parse, dump

    rng = random.Random(7)

    def rand_scalar():
        kind = rng.randrange(6)
        if kind == 0:
            return rng.randint(-10**9, 10**9)
        if kind == 1:
            return round(rng.uniform(-1e4, 1e4), 6)
        if kind == 2:
            return float(f"{rng.uniform(-9, 9):.4f}e{rng.randint(-12, 12)}")
        if kind == 3:
            return rng.choice([True, False])
        if kind == 4:
            return rng.choice(["MAX", "TRAIN", "LMDB", "xavier"])  # enum-like
        return rng.choice(['a b "q" c', "path/with spaces.png", "x\\y",
                           "", "newline\nin string"])

    def rand_node(depth):
        n = PbNode()
        for _ in range(rng.randint(1, 6)):
            key = rng.choice(["alpha", "beta", "dim", "name", "layer",
                              "weight_filler", "value"])
            for _ in range(rng.randint(1, 3)):  # repeated fields
                if depth < 3 and rng.random() < 0.3:
                    n.add(key, rand_node(depth + 1))
                else:
                    n.add(key, rand_scalar())
        return n

    def assert_same(a, b, path=""):
        assert set(a.fields) == set(b.fields), (path, a.fields, b.fields)
        for k in a.fields:
            va, vb = a.fields[k], b.fields[k]
            assert len(va) == len(vb), (path, k)
            for i, (x, y) in enumerate(zip(va, vb)):
                if isinstance(x, PbNode):
                    assert_same(x, y, f"{path}.{k}[{i}]")
                elif isinstance(x, float):
                    assert y == pytest.approx(x, rel=1e-6), (path, k, x, y)
                elif isinstance(x, str):
                    assert y == x, (path, k, repr(x), repr(y))
                else:
                    assert y == x and type(y) is type(x), (path, k, x, y)

    for trial in range(60):
        node = rand_node(0)
        assert_same(node, parse(dump(node)), f"trial{trial}")


def test_wire_codec_roundtrip_fuzz():
    """Property fuzz over the protobuf wire primitives: random mixes of
    varints, length-delimited bytes, and packed floats decode back exactly
    (including multi-byte varint boundaries and empty payloads)."""
    from deepcut_tpu.proto import wire

    rng = np.random.RandomState(11)
    for _ in range(40):
        enc = wire.Encoder()
        expect = {}
        for field in rng.permutation(np.arange(1, 12))[: rng.randint(2, 8)]:
            field = int(field)
            kind = rng.randint(3)
            if kind == 0:
                v = int(rng.randint(0, 2) * (2 ** int(rng.randint(0, 62))))
                enc.varint(field, v)
                expect[field] = ("varint", v)
            elif kind == 1:
                v = rng.bytes(int(rng.randint(0, 300)))
                enc.bytes_(field, v)
                expect[field] = ("bytes", v)
            else:
                v = rng.randn(int(rng.randint(0, 50))).astype(np.float32)
                enc.packed_floats(field, v)
                expect[field] = ("floats", v)
        fields = wire.decode(enc.tobytes())
        for field, (kind, v) in expect.items():
            assert field in fields, (field, kind)
            if kind == "varint":
                assert fields[field][0][1] == v
            elif kind == "bytes":
                assert fields[field][0][1] == v
            else:
                np.testing.assert_array_equal(wire.read_floats(fields[field]), v)
