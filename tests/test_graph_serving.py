"""Graph-engine serving transforms: prune() and fuse_siblings().

The native model earned its serving speed with an explicit head subset and
ONE fused lane-filling head conv (models/resnet.make_forward(heads=...),
models/quantize.forward_int8 fused skip conv). These tests pin the generic
prototxt path's version of the same lowering: prune drops non-contributing
layers, fuse_siblings merges sibling convs/deconvs into one channel-
concatenated layer, and both are exact (same math, different schedule).
Reference analog: engine dispatch picking the fast kernel for the same
graph (/root/reference/src/caffe/layer_factory.cpp:42-67).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from deepcut_tpu.core.graph import Net
from deepcut_tpu.proto import text_format


# A miniature of the DeeperCut head pattern: shared trunk blob feeding three
# sibling convs (mixed bias) + a sibling-group of two deconvs, with eltwise
# consumers downstream — and a loss branch prune() should drop.
HEADS_PROTO = """
input: "data"
input_shape { dim: 2 dim: 8 dim: 12 dim: 12 }
layer { name: "trunk" type: "Convolution" bottom: "data" top: "t"
        convolution_param { num_output: 16 kernel_size: 3 pad: 1
          weight_filler { type: "gaussian" std: 0.2 } } }
layer { name: "relu" type: "ReLU" bottom: "t" top: "t" }
layer { name: "head_a" type: "Convolution" bottom: "t" top: "ha"
        convolution_param { num_output: 4 kernel_size: 1
          weight_filler { type: "gaussian" std: 0.3 } } }
layer { name: "head_b" type: "Convolution" bottom: "t" top: "hb"
        convolution_param { num_output: 6 kernel_size: 1 bias_term: false
          weight_filler { type: "gaussian" std: 0.3 } } }
layer { name: "head_c" type: "Convolution" bottom: "t" top: "hc"
        convolution_param { num_output: 2 kernel_size: 1
          weight_filler { type: "gaussian" std: 0.3 } } }
layer { name: "up_a" type: "Deconvolution" bottom: "t" top: "ua"
        convolution_param { num_output: 4 kernel_size: 4 stride: 2 pad: 1
          weight_filler { type: "gaussian" std: 0.2 } } }
layer { name: "up_b" type: "Deconvolution" bottom: "t" top: "ub"
        convolution_param { num_output: 6 kernel_size: 4 stride: 2 pad: 1
          weight_filler { type: "gaussian" std: 0.2 } } }
layer { name: "sig_a" type: "Sigmoid" bottom: "ha" top: "pa" }
layer { name: "sig_b" type: "Sigmoid" bottom: "hb" top: "pb" }
layer { name: "sig_c" type: "Sigmoid" bottom: "hc" top: "pc" }
"""


def _build(proto=HEADS_PROTO, seed=0):
    net = Net(text_format.parse(proto), phase="TEST", compute_dtype=None)
    rng = np.random.RandomState(seed)
    x = (rng.randn(2, 8, 12, 12) * 1.5).astype(np.float32)
    return net, x


def test_fuse_siblings_exact_and_counts():
    """3 sibling 1x1 convs -> 1, 2 sibling deconvs -> 1; every output
    bitwise-equal shape/math-wise (channel concat + slice is exact)."""
    net, x = _build()
    ref = net.forward(data=x)
    n = net.fuse_siblings()
    assert n == 2  # conv group {head_a,head_b,head_c}, deconv group {up_a,up_b}
    types = [s.type for _, s in net._plan]
    assert types.count("Convolution") == 2  # trunk + fused heads
    assert types.count("Deconvolution") == 1
    # absorbed members' params are gone; survivor holds the concat
    assert "head_b" not in net.params and "head_c" not in net.params
    assert net.params["head_a"]["w"].shape[-1] == 12
    assert net.params["head_a"]["b"].shape == (12,)  # head_b zero-padded bias
    assert "up_b" not in net.params
    out = net.forward(data=x)
    for k in ref:
        np.testing.assert_allclose(out[k], ref[k], rtol=1e-5, atol=1e-5,
                                    err_msg=k)


def test_fuse_siblings_blocked_by_inplace_rewrite():
    """If the shared bottom is rewritten in place BETWEEN two siblings, they
    read different values — fusion must refuse that group."""
    proto = """
    input: "data"
    input_shape { dim: 1 dim: 4 dim: 6 dim: 6 }
    layer { name: "a" type: "Convolution" bottom: "data" top: "ya"
            convolution_param { num_output: 3 kernel_size: 1
              weight_filler { type: "gaussian" std: 0.3 } } }
    layer { name: "mut" type: "ReLU" bottom: "data" top: "data" }
    layer { name: "b" type: "Convolution" bottom: "data" top: "yb"
            convolution_param { num_output: 3 kernel_size: 1
              weight_filler { type: "gaussian" std: 0.3 } } }
    """
    net, _ = _build(proto)
    x = np.random.RandomState(3).randn(1, 4, 6, 6).astype(np.float32)
    ref = net.forward(data=x)
    assert net.fuse_siblings() == 0
    out = net.forward(data=x)
    np.testing.assert_allclose(out["yb"], ref["yb"], rtol=1e-6, atol=1e-6)


def test_prune_to_subset():
    """prune(["pa","pb"]) drops head_c/sig_c/up_* and keeps outputs exact —
    the graph version of make_forward(heads=("pose","locref"))."""
    net, x = _build()
    ref = net.forward(data=x)
    removed = net.prune(["pa", "pb"])
    assert removed == 4  # head_c, sig_c, up_a, up_b
    names = {s.name for _, s in net._plan}
    assert "head_c" not in names and "up_a" not in names
    assert {"trunk", "relu", "head_a", "head_b", "sig_a", "sig_b"} <= names
    out = net.forward(data=x)
    np.testing.assert_allclose(out["pa"], ref["pa"], rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(out["pb"], ref["pb"], rtol=1e-6, atol=1e-6)
    with pytest.raises(KeyError):
        net.prune(["no_such_blob"])


def test_prune_keeps_inplace_chain():
    """An in-place chain (conv -> ReLU in place) survives pruning through
    the shared blob name (every producer of a needed blob is kept)."""
    net, x = _build()
    net.prune(["t"])
    assert [s.name for _, s in net._plan] == ["trunk", "relu"]


def test_prune_fuse_quantize_serving_pipeline():
    """The full generic-graph int8 serving pipeline: prune -> fuse ->
    quantize (one act_scale for the fused group; narrow stem stays float)
    -> make_forward. Outputs stay within int8 tolerance of float."""
    net, x = _build()
    ref = net.forward(data=x)
    net.prune(["pa", "pb"])
    assert net.fuse_siblings() == 1  # {head_a, head_b}; deconvs were pruned
    n = net.quantize_int8(data=x)
    # trunk reads 8-channel input -> quantized; fused head reads 16 -> quantized
    assert n == 2
    assert set(net.params["head_a"]) == {"w_q", "w_scale", "b", "act_scale"}
    assert net.params["head_a"]["w_q"].shape[-1] == 10
    fwd = net.make_forward(["pa", "pb"])
    outs = fwd(net.params, {"data": jnp.asarray(x.transpose(0, 2, 3, 1))})
    for k in ("pa", "pb"):
        got = np.asarray(outs[k]).transpose(0, 3, 1, 2)
        # sigmoids of int8-conv logits: absolute tolerance on [0,1] outputs
        assert np.abs(got - ref[k]).max() < 0.04, k


def test_quantize_stem_rule_default():
    """Default min_in_channels=8 leaves the 3-channel stem conv float (the
    measured bf16-stem rule) while quantizing the wide interior."""
    proto = """
    input: "data"
    input_shape { dim: 1 dim: 3 dim: 10 dim: 10 }
    layer { name: "conv1" type: "Convolution" bottom: "data" top: "c1"
            convolution_param { num_output: 8 kernel_size: 3 pad: 1
              weight_filler { type: "gaussian" std: 0.3 } } }
    layer { name: "conv2" type: "Convolution" bottom: "c1" top: "c2"
            convolution_param { num_output: 4 kernel_size: 1
              weight_filler { type: "gaussian" std: 0.3 } } }
    """
    net, _ = _build(proto)
    x = np.random.RandomState(1).randn(1, 3, 10, 10).astype(np.float32)
    assert net.quantize_int8(data=x) == 1
    assert "w" in net.params["conv1"]  # stem stays float
    assert "w_q" in net.params["conv2"]


def test_graph_quantize_percentile_calibration():
    """Net.quantize_int8(percentile=...) clips calibration outliers: the
    recorded activation scale drops below absmax when the calibration batch
    carries one hot value, and the quantized forward still runs."""
    net, x = _build()
    x_hot = x.copy()
    x_hot[0, 0, 0, 0] = 1e4
    net.quantize_int8(data=x_hot)
    s_abs = float(net.params["trunk"]["act_scale"])
    net2, _ = _build()
    net2.quantize_int8(percentile=99.0, data=x_hot)
    s_pct = float(net2.params["trunk"]["act_scale"])
    assert s_pct < s_abs / 10, (s_pct, s_abs)
    out = net2.forward(data=x)
    assert np.isfinite(out["pa"]).all()


def test_fuse_siblings_respects_shared_weights():
    """Weight-shared convs alias another layer's blobs; fusing either side
    would corrupt the owner — both must be left alone."""
    proto = """
    input: "data"
    input_shape { dim: 1 dim: 4 dim: 6 dim: 6 }
    layer { name: "a" type: "Convolution" bottom: "data" top: "ya"
            param { name: "sw" }
            convolution_param { num_output: 3 kernel_size: 1
              weight_filler { type: "gaussian" std: 0.3 } } }
    layer { name: "b" type: "Convolution" bottom: "data" top: "yb"
            param { name: "sw" }
            convolution_param { num_output: 3 kernel_size: 1
              weight_filler { type: "gaussian" std: 0.3 } } }
    """
    net, _ = _build(proto)
    x = np.random.RandomState(2).randn(1, 4, 6, 6).astype(np.float32)
    ref = net.forward(data=x)
    assert net.fuse_siblings() == 0
    out = net.forward(data=x)
    np.testing.assert_allclose(out["ya"], ref["ya"], rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(out["yb"], ref["yb"], rtol=1e-6, atol=1e-6)
