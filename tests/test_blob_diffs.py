"""Intermediate-blob diffs (pycaffe _Net_backward diffs=[...] contract,
python/caffe/pycaffe.py:107-140) and the host-path Filter batch shrink
(src/caffe/layers/filter_layer.cpp semantics)."""

import numpy as np
import pytest


DIFF_NET = """
name: "diffnet"
input: "data"
input_shape { dim: 2 dim: 3 }
input: "target"
input_shape { dim: 2 dim: 3 }
layer { name: "ip1" type: "InnerProduct" bottom: "data" top: "ip1"
  inner_product_param { num_output: 4
    weight_filler { type: "gaussian" std: 0.5 }
    bias_filler { type: "gaussian" std: 0.2 } } }
layer { name: "relu1" type: "ReLU" bottom: "ip1" top: "ip1" }
layer { name: "ip2" type: "InnerProduct" bottom: "ip1" top: "ip2"
  inner_product_param { num_output: 3
    weight_filler { type: "gaussian" std: 0.5 } } }
layer { name: "loss" type: "EuclideanLoss" bottom: "ip2" bottom: "target"
  top: "loss" }
"""


def _build_diff_net():
    from deepcut_tpu.core.graph import Net
    from deepcut_tpu.proto import text_format

    return Net(text_format.parse(DIFF_NET), phase="TRAIN", compute_dtype=None)


def test_backward_intermediate_diffs_finite_difference():
    """d(loss)/d(ip1) from backward(diffs=...) matches central finite
    differences computed through the public partial-forward API."""
    net = _build_diff_net()
    rng = np.random.RandomState(0)
    data = rng.randn(2, 3).astype(np.float32)
    target = rng.randn(2, 3).astype(np.float32)

    grads = net.backward(diffs=["ip1", "ip2"], data=data, target=target)
    assert set(grads) >= {"data", "target", "ip1", "ip2"}
    assert grads["ip1"].shape == (2, 4)
    assert grads["ip2"].shape == (2, 3)

    # FD oracle for ip1: the PRE-relu activation (in-place chain => diff at
    # the original producer's output, like Caffe's shared-blob diff_)
    net.forward(end="ip1", data=data)
    ip1_val = net.blobs["ip1"].copy()

    def loss_from_ip1(v):
        out = net.forward(start="relu1", ip1=v, target=target)
        return float(out["loss"].reshape(()))

    eps = 1e-3
    for idx in [(0, 0), (0, 3), (1, 1), (1, 2)]:
        up = ip1_val.copy(); up[idx] += eps
        dn = ip1_val.copy(); dn[idx] -= eps
        fd = (loss_from_ip1(up) - loss_from_ip1(dn)) / (2 * eps)
        np.testing.assert_allclose(grads["ip1"][idx], fd, rtol=2e-2, atol=2e-4)

    # ip2 diff must equal the EuclideanLoss analytic gradient (pred-target)/N
    net.forward(data=data, target=target)
    analytic = (net.blobs["ip2"] - target) / data.shape[0]
    np.testing.assert_allclose(grads["ip2"], analytic, rtol=1e-5, atol=1e-6)


def test_backward_diffs_unknown_blob_raises():
    net = _build_diff_net()
    rng = np.random.RandomState(1)
    with pytest.raises(KeyError):
        net.backward(diffs=["nosuchblob"],
                     data=rng.randn(2, 3).astype(np.float32),
                     target=rng.randn(2, 3).astype(np.float32))


def test_compat_backward_populates_intermediate_blob_diff():
    import deepcut_tpu.compat as caffe

    net = caffe.Net.__new__(caffe.Net)
    net._net = _build_diff_net()
    from collections import OrderedDict
    net.blobs = OrderedDict()
    for nm, sh in net._net.input_shapes.items():
        net.blobs[nm] = caffe.Blob(np.zeros(sh, np.float32))
    net._params_dirty = False

    rng = np.random.RandomState(2)
    net.blobs["data"].data[...] = rng.randn(2, 3)
    net.blobs["target"].data[...] = rng.randn(2, 3)
    net.forward()
    out = net.backward(diffs=["ip1"])
    assert "ip1" in out
    np.testing.assert_array_equal(net.blobs["ip1"].diff, out["ip1"])
    assert np.abs(net.blobs["ip1"].diff).sum() > 0


def test_backward_injected_cotangents_replace_loss_seed():
    """cotangents= replaces the forward-loss seed (Net::Backward runs from
    whatever diff_ the tops hold): injecting ones at the loss blob equals
    the default backward; scaling the injected diff scales the gradients."""
    net = _build_diff_net()
    rng = np.random.RandomState(4)
    data = rng.randn(2, 3).astype(np.float32)
    target = rng.randn(2, 3).astype(np.float32)

    base = net.backward(data=data, target=target)
    ones = net.backward(cotangents={"loss": np.float32(1.0)},
                        data=data, target=target)
    np.testing.assert_allclose(ones["data"], base["data"], rtol=1e-6)
    twos = net.backward(cotangents={"loss": np.float32(2.0)},
                        data=data, target=target)
    np.testing.assert_allclose(twos["data"], 2.0 * base["data"], rtol=1e-6)


def test_backward_cotangent_at_intermediate_blob_fd():
    """Injecting a cotangent at a mid-graph blob differentiates
    sum(<blob, cot>) — checked against central finite differences of that
    objective through the public forward."""
    net = _build_diff_net()
    rng = np.random.RandomState(5)
    data = rng.randn(2, 3).astype(np.float32)
    target = rng.randn(2, 3).astype(np.float32)
    cot = rng.randn(2, 3).astype(np.float32)

    grads = net.backward(cotangents={"ip2": cot}, data=data, target=target)

    def objective(x):
        net.forward(data=x, target=target)
        return float(np.vdot(np.asarray(net.blobs["ip2"]), cot))

    eps = 1e-3
    for idx in [(0, 0), (0, 2), (1, 1)]:
        up = data.copy(); up[idx] += eps
        dn = data.copy(); dn[idx] -= eps
        fd = (objective(up) - objective(dn)) / (2 * eps)
        np.testing.assert_allclose(grads["data"][idx], fd, rtol=2e-2,
                                   atol=2e-4)


def test_compat_backward_kwargs_are_top_diffs():
    """pycaffe parity: backward(**kwargs) kwargs are INJECTED TOP DIFFS
    (pycaffe.py:118-119), keyed by the net's outputs — not input data."""
    import deepcut_tpu.compat as caffe

    net = caffe.Net.__new__(caffe.Net)
    net._net = _build_diff_net()
    from collections import OrderedDict
    net.blobs = OrderedDict()
    for nm, sh in net._net.input_shapes.items():
        net.blobs[nm] = caffe.Blob(np.zeros(sh, np.float32))
    net._params_dirty = False

    rng = np.random.RandomState(6)
    net.blobs["data"].data[...] = rng.randn(2, 3)
    net.blobs["target"].data[...] = rng.randn(2, 3)
    net.forward()
    assert net.outputs == ["loss"]

    base = net.backward()
    injected = net.backward(loss=np.float32(3.0))
    np.testing.assert_allclose(injected["data"], 3.0 * base["data"],
                               rtol=1e-5)
    # keys must match the net outputs exactly (reference raises)
    with pytest.raises(Exception, match="Top diff"):
        net.backward(data=np.zeros((2, 3), np.float32))


def test_forward_backward_all_intermediate_diffs():
    import deepcut_tpu.compat as caffe

    net = caffe.Net.__new__(caffe.Net)
    net._net = _build_diff_net()
    from collections import OrderedDict
    net.blobs = OrderedDict()
    for nm, sh in net._net.input_shapes.items():
        net.blobs[nm] = caffe.Blob(np.zeros(sh, np.float32))
    net._params_dirty = False

    rng = np.random.RandomState(3)
    fwd, bwd = net.forward_backward_all(
        diffs=["ip1"],
        data=rng.randn(4, 3).astype(np.float32),
        target=rng.randn(4, 3).astype(np.float32))
    assert bwd["ip1"].shape == (4, 4)
    assert bwd["data"].shape == (4, 3)


# ---- host-path Filter shrink ----------------------------------------------

FILTER_NET = """
name: "filternet"
input: "data"
input_shape { dim: 4 dim: 3 }
input: "sel"
input_shape { dim: 4 dim: 1 }
layer { name: "filt" type: "Filter" bottom: "data" bottom: "sel" top: "fdata" }
layer { name: "ip" type: "InnerProduct" bottom: "fdata" top: "out"
  inner_product_param { num_output: 2
    weight_filler { type: "gaussian" std: 0.5 }
    bias_filler { type: "constant" value: 0.1 } } }
"""


def test_filter_host_path_truly_shrinks_batch():
    """Net.forward() (all-blobs host path) shrinks the batch like
    filter_layer.cpp, and a downstream consumer computes ONLY on kept
    items — no zero-filled rows."""
    from deepcut_tpu.core.graph import Net
    from deepcut_tpu.proto import text_format

    net = Net(text_format.parse(FILTER_NET), phase="TEST", compute_dtype=None)
    rng = np.random.RandomState(0)
    data = rng.randn(4, 3).astype(np.float32)
    sel = np.array([[1.0], [0.0], [1.0], [0.0]], np.float32)

    out = net.forward(data=data, sel=sel)
    assert out["fdata"].shape == (2, 3)
    np.testing.assert_array_equal(out["fdata"], data[[0, 2]])
    assert out["out"].shape == (2, 2)

    # downstream values equal running the consumer on only the kept rows
    w = np.asarray(net.params["ip"]["w"], np.float32)
    b = np.asarray(net.params["ip"]["b"], np.float32)
    w2 = w if w.shape[0] == 3 else w.T  # (in, out) oracle view
    np.testing.assert_allclose(out["out"], data[[0, 2]] @ w2 + b,
                               rtol=1e-5, atol=1e-6)

    # all selected / none selected edge cases
    out_all = net.forward(data=data, sel=np.ones((4, 1), np.float32))
    assert out_all["fdata"].shape == (4, 3)
    out_none = net.forward(data=data, sel=np.zeros((4, 1), np.float32))
    assert out_none["fdata"].shape == (0, 3)


def test_filter_jit_path_keeps_static_shapes():
    """make_forward (the serving path) keeps the documented static-shape
    deviation: full batch, kept items first, dropped rows zeroed."""
    import jax.numpy as jnp

    from deepcut_tpu.core.graph import Net
    from deepcut_tpu.proto import text_format

    net = Net(text_format.parse(FILTER_NET), phase="TEST", compute_dtype=None)
    fwd = net.make_forward(["fdata"])
    rng = np.random.RandomState(1)
    data = rng.randn(4, 3).astype(np.float32)
    sel = np.array([[0.0], [1.0], [0.0], [1.0]], np.float32)
    out = np.asarray(fwd(net.params, {"data": jnp.asarray(data),
                                      "sel": jnp.asarray(sel)})["fdata"])
    assert out.shape == (4, 3)
    np.testing.assert_array_equal(out[:2], data[[1, 3]])
    np.testing.assert_array_equal(out[2:], 0)


def test_backward_diffs_nonfloat_input_returns_zeros():
    """Requesting the diff of a non-floating input (integer labels) returns
    a zeros array like pycaffe's untouched diff_ buffer — not a silent
    omission (unknown names still raise)."""
    from deepcut_tpu.core.graph import Net
    from deepcut_tpu.proto import text_format

    net = Net(text_format.parse("""
    input: "data"  input_shape { dim: 3 dim: 4 }
    input: "label" input_shape { dim: 3 }
    layer { name: "ip" type: "InnerProduct" bottom: "data" top: "ip"
      inner_product_param { num_output: 2
        weight_filler { type: "gaussian" std: 0.3 } } }
    layer { name: "loss" type: "SoftmaxWithLoss" bottom: "ip" bottom: "label"
      top: "loss" }
    """), phase="TRAIN", compute_dtype=None)
    rng = np.random.RandomState(0)
    grads = net.backward(diffs=["label", "ip"],
                         data=rng.randn(3, 4).astype(np.float32),
                         label=np.array([0, 1, 0], np.int32))
    assert "label" in grads
    np.testing.assert_array_equal(grads["label"], np.zeros(3, np.float32))
    assert np.abs(grads["ip"]).sum() > 0


def test_compat_backward_warns_on_filter_shape_divergence():
    """After a host forward truly shrinks a Filter net's batch, backward's
    static-shape gradients cannot populate the shrunk blob — a warning
    fires instead of a silent Blob.diff reset."""
    import warnings

    import deepcut_tpu.compat as caffe
    from collections import OrderedDict
    from deepcut_tpu.core.graph import Net
    from deepcut_tpu.proto import text_format

    proto = """
    input: "data" input_shape { dim: 4 dim: 3 }
    input: "target" input_shape { dim: 4 dim: 3 }
    input: "sel"  input_shape { dim: 4 dim: 1 }
    layer { name: "filt" type: "Filter" bottom: "data" bottom: "target"
      bottom: "sel" top: "fdata" top: "ftarget" }
    layer { name: "loss" type: "EuclideanLoss" bottom: "fdata"
      bottom: "ftarget" top: "loss" }
    """
    net = caffe.Net.__new__(caffe.Net)
    net._net = Net(text_format.parse(proto), phase="TRAIN", compute_dtype=None)
    net.blobs = OrderedDict()
    for nm, sh in net._net.input_shapes.items():
        net.blobs[nm] = caffe.Blob(np.zeros(sh, np.float32))
    net._params_dirty = False

    rng = np.random.RandomState(1)
    net.blobs["data"].data[...] = rng.randn(4, 3)
    net.blobs["sel"].data[...] = np.array([[1], [0], [1], [1]], np.float32)
    net.blobs["target"].data[...] = rng.randn(4, 3)
    net.forward()
    assert net.blobs["fdata"].data.shape == (3, 3)  # truly shrunk
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        net.backward(diffs=["fdata"])
    assert any("fdata" in str(w.message) for w in caught), \
        [str(w.message) for w in caught]
    assert np.all(net.blobs["fdata"].diff == 0)


# ---- partial backward (pycaffe backward(start=, end=)) ---------------------


def test_backward_partial_end_matches_full():
    """backward(end=...) runs the chain only down to `end` (inclusive);
    the diff at the slice boundary equals the full backward's."""
    net = _build_diff_net()
    rng = np.random.RandomState(7)
    data = rng.randn(2, 3).astype(np.float32)
    target = rng.randn(2, 3).astype(np.float32)

    full = net.backward(diffs=["ip1"], data=data, target=target)
    net.forward(data=data, target=target)  # stage blobs for slice seeding
    part = net.backward(end="relu1", data=data, target=target)
    # slice input 'ip1' (the pre-relu activation, shared in-place blob):
    # its grad is the same dL/d(ip1) Caffe leaves in the shared diff_
    np.testing.assert_allclose(part["ip1"], full["ip1"], rtol=1e-6)


def test_backward_partial_start_chain_rule():
    """backward(start=...) seeds the chain at the start layer's tops; with
    the true dL/d(top) as seed it reproduces the full backward (chain
    rule)."""
    net = _build_diff_net()
    rng = np.random.RandomState(8)
    data = rng.randn(2, 3).astype(np.float32)
    target = rng.randn(2, 3).astype(np.float32)

    full = net.backward(data=data, target=target)
    mid = net.backward(diffs=["ip2"], data=data, target=target)["ip2"]
    part = net.backward(start="ip2", cotangents={"ip2": mid},
                        data=data, target=target)
    np.testing.assert_allclose(part["data"], full["data"], rtol=1e-5,
                               atol=1e-7)
    # seeds are REQUIRED with start (no hidden diff memory in the
    # functional core)
    with pytest.raises(ValueError, match="seed diffs"):
        net.backward(start="ip2", data=data, target=target)


def test_compat_backward_start_end():
    """compat parity: start seeds from STAGED Blob.diff of the start
    layer's tops; end returns the end layer's tops among the diffs
    (pycaffe.py outputs = set([end] + diffs))."""
    import deepcut_tpu.compat as caffe
    from collections import OrderedDict

    net = caffe.Net.__new__(caffe.Net)
    net._net = _build_diff_net()
    net.blobs = OrderedDict()
    for nm, sh in net._net.input_shapes.items():
        net.blobs[nm] = caffe.Blob(np.zeros(sh, np.float32))
    net._params_dirty = False

    rng = np.random.RandomState(9)
    net.blobs["data"].data[...] = rng.randn(2, 3)
    net.blobs["target"].data[...] = rng.randn(2, 3)
    net.forward()

    full = net.backward()
    # end='ip1' (layer): its top 'ip1' is returned and populated
    out_end = net.backward(end="ip1")
    assert "ip1" in out_end
    np.testing.assert_array_equal(net.blobs["ip1"].diff, out_end["ip1"])

    # start='ip2': stage dL/d(ip2) (from a full backward) then the partial
    # chain reproduces the full data gradient
    mid = net.backward(diffs=["ip2"])["ip2"]
    net.blobs["ip2"].diff[...] = mid
    part = net.backward(start="ip2")
    np.testing.assert_allclose(part["data"], full["data"], rtol=1e-5,
                               atol=1e-7)
    # without a staged diff the call is loud
    net.blobs["ip2"]._diff = None
    with pytest.raises(ValueError, match="no staged diff"):
        net.backward(start="ip2")
