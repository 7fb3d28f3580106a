"""MATLAB binding: gateway command set (matlab/+caffe/private/caffe_.cpp
analog) driven at the dispatch level, mirroring the reference's
matlab/+caffe/+test/{test_net,test_solver,test_io}.m scenarios.

The C MEX marshalling layer is exercised separately in
tests/test_matlab_mex.py by compiling matlab/+caffe/private/caffe_.cpp
against the in-repo mex API stub and calling mexFunction through ctypes.
"""

import numpy as np
import pytest

from deepcut_tpu import matlab_gateway as gw


# The reference matlab test fixture (test_net.m simple_net_file), with the
# legacy 4-field DummyData dims it exercises.
NET_FIXTURE = """
name: "testnet" force_backward: true
layer {{ type: "DummyData" name: "data" top: "data" top: "label"
  dummy_data_param {{ num: 5 channels: 2 height: 3 width: 4
    num: 5 channels: 1 height: 1 width: 1
    data_filler {{ type: "gaussian" std: 1 }}
    data_filler {{ type: "constant" }} }} }}
layer {{ type: "Convolution" name: "conv" bottom: "data" top: "conv"
  convolution_param {{ num_output: 11 kernel_size: 2 pad: 3
    weight_filler {{ type: "gaussian" std: 1 }}
    bias_filler {{ type: "constant" value: 2 }} }}
  param {{ decay_mult: 1 }} param {{ decay_mult: 0 }} }}
layer {{ type: "InnerProduct" name: "ip" bottom: "conv" top: "ip"
  inner_product_param {{ num_output: {num_output}
    weight_filler {{ type: "gaussian" std: 2.5 }}
    bias_filler {{ type: "constant" value: -3 }} }} }}
layer {{ type: "SoftmaxWithLoss" name: "loss" bottom: "ip" bottom: "label"
  top: "loss" }}
"""


def _single(arr):
    """numpy caffe-order array -> wire single encoding (MATLAB dims)."""
    a = np.ascontiguousarray(arr, np.float32)
    return {"dims": list(reversed(a.shape)) or [1], "data": a.tobytes()}


def _arr(item):
    """wire single -> numpy caffe-order array."""
    assert item["t"] == "single"
    dims = tuple(int(d) for d in item["dims"])
    return np.frombuffer(bytes(item["data"]), "<f4").reshape(dims[::-1])


def _fields(item):
    assert item["t"] == "struct"
    return dict(item["fields"])


@pytest.fixture
def net_file(tmp_path):
    p = tmp_path / "testnet.prototxt"
    p.write_text(NET_FIXTURE.format(num_output=13))
    return str(p)


@pytest.fixture
def net_ctx(net_file):
    (h,) = gw.dispatch("get_net", [net_file, "train"])
    (attr,) = gw.dispatch("net_get_attr", [h])
    return h, _fields(attr)


def _blob_handle(attr, name):
    names = attr["blob_names"]["v"]
    return attr["hBlob_blobs"]["v"][names.index(name)]


def _layer_handle(attr, name):
    names = attr["layer_names"]["v"]
    return attr["hLayer_layers"]["v"][names.index(name)]


def test_net_attr_names_and_indices(net_ctx):
    _, attr = net_ctx
    assert attr["layer_names"]["v"] == ["data", "conv", "ip", "loss"]
    assert attr["blob_names"]["v"] == ["data", "label", "conv", "ip", "loss"]
    # the fixture has no deploy inputs; 'loss' is the only output (0-based)
    assert attr["input_blob_indices"]["v"] == []
    assert attr["output_blob_indices"]["v"] == [4.0]


def test_blob_set_get_data_diff_and_reshape(net_ctx):
    """Mirror of test_net.m::test_blob."""
    h, attr = net_ctx
    data_h = _blob_handle(attr, "data")
    (shape,) = gw.dispatch("blob_get_shape", [data_h])
    assert shape["v"] == [4.0, 3.0, 2.0, 5.0]  # MATLAB order (W H C N)

    tens = np.full((5, 2, 3, 4), 10.0, np.float32)
    gw.dispatch("blob_set_data", [data_h, _single(tens)])
    (got,) = gw.dispatch("blob_get_data", [data_h])
    np.testing.assert_array_equal(_arr(got), tens)

    gw.dispatch("blob_set_diff", [data_h, _single(-2.0 * np.ones_like(tens))])
    (gd,) = gw.dispatch("blob_get_diff", [data_h])
    np.testing.assert_array_equal(_arr(gd), -2.0)

    # reshape to the matlab test's [6 5 4 3 2 1] and back
    gw.dispatch("blob_reshape", [data_h, [6.0, 5.0, 4.0, 3.0, 2.0, 1.0]])
    (s2,) = gw.dispatch("blob_get_shape", [data_h])
    assert s2["v"] == [6.0, 5.0, 4.0, 3.0, 2.0, 1.0]
    gw.dispatch("blob_reshape", [data_h, shape["v"]])
    gw.dispatch("net_reshape", [h])


def test_layer_params_and_type(net_ctx):
    """Mirror of test_net.m::test_layer: conv weight shape [2 2 2 11] in
    MATLAB order, bias shape [11], layer type string."""
    _, attr = net_ctx
    conv_h = _layer_handle(attr, "conv")
    (lattr,) = gw.dispatch("layer_get_attr", [conv_h])
    blobs = _fields(lattr)["hBlob_blobs"]["v"]
    assert len(blobs) == 2
    (wsh,) = gw.dispatch("blob_get_shape", [blobs[0]])
    assert wsh["v"] == [2.0, 2.0, 2.0, 11.0]
    (bsh,) = gw.dispatch("blob_get_shape", [blobs[1]])
    assert bsh["v"] == [11.0]
    (typ,) = gw.dispatch("layer_get_type", [conv_h])
    assert typ["v"] == "Convolution"


def test_forward_backward_prefilled(net_ctx):
    """Mirror of test_net.m::test_forward_backward, plus staged-label
    persistence (the matlab fixture's whole reason for a constant filler)."""
    h, attr = net_ctx
    label_h = _blob_handle(attr, "label")
    labels = np.random.RandomState(0).randint(0, 13, (5, 1, 1, 1))
    gw.dispatch("blob_set_data", [label_h, _single(labels)])
    gw.dispatch("net_forward", [h])
    (lv,) = gw.dispatch("blob_get_data", [label_h])
    np.testing.assert_array_equal(_arr(lv), labels)  # fill-once persisted
    (loss,) = gw.dispatch("blob_get_data", [_blob_handle(attr, "loss")])
    assert np.isfinite(_arr(loss)).all()
    gw.dispatch("net_backward", [h])
    (dd,) = gw.dispatch("blob_get_diff", [_blob_handle(attr, "data")])
    assert np.abs(_arr(dd)).sum() > 0  # force_backward reached the input


def test_injected_output_diff_scales_gradients(net_ctx):
    """matcaffe Net.backward(output_diff): staging diffs on every output
    before net_backward injects them as cotangents."""
    h, attr = net_ctx
    gw.dispatch("net_forward", [h])
    loss_h = _blob_handle(attr, "loss")
    data_h = _blob_handle(attr, "data")
    gw.dispatch("blob_set_diff", [loss_h, _single(np.float32(1.0))])
    gw.dispatch("net_backward", [h])
    g1 = _arr(gw.dispatch("blob_get_diff", [data_h])[0]).copy()
    gw.dispatch("blob_set_diff", [loss_h, _single(np.float32(2.0))])
    gw.dispatch("net_backward", [h])
    g2 = _arr(gw.dispatch("blob_get_diff", [data_h])[0])
    np.testing.assert_allclose(g2, 2.0 * g1, rtol=1e-5)


def test_save_and_copy_from(net_file, tmp_path):
    """Mirror of test_net.m::test_save_and_read: save weights, build a
    second net, copy_from, compare every param blob."""
    (h1,) = gw.dispatch("get_net", [net_file, "train"])
    (a1,) = gw.dispatch("net_get_attr", [h1])
    wfile = str(tmp_path / "w.caffemodel")
    gw.dispatch("net_save", [h1, wfile])

    (h2,) = gw.dispatch("get_net", [net_file, "train"])
    gw.dispatch("net_copy_from", [h2, wfile])
    (a2,) = gw.dispatch("net_get_attr", [h2])

    for lname in ("conv", "ip"):
        b1 = _fields(gw.dispatch("layer_get_attr",
                                 [_layer_handle(_fields(a1), lname)])[0])
        b2 = _fields(gw.dispatch("layer_get_attr",
                                 [_layer_handle(_fields(a2), lname)])[0])
        for hb1, hb2 in zip(b1["hBlob_blobs"]["v"], b2["hBlob_blobs"]["v"]):
            w1 = _arr(gw.dispatch("blob_get_data", [hb1])[0])
            w2 = _arr(gw.dispatch("blob_get_data", [hb2])[0])
            np.testing.assert_allclose(w1, w2, rtol=1e-6)


def test_param_set_data_writes_through(net_ctx):
    h, attr = net_ctx
    conv_h = _layer_handle(attr, "conv")
    (lattr,) = gw.dispatch("layer_get_attr", [conv_h])
    w_h = _fields(lattr)["hBlob_blobs"]["v"][0]
    new_w = np.random.RandomState(1).randn(11, 2, 2, 2).astype(np.float32)
    gw.dispatch("blob_set_data", [w_h, _single(new_w)])
    got = _arr(gw.dispatch("blob_get_data", [w_h])[0])
    np.testing.assert_array_equal(got, new_w)


def test_solver_step_solve_iter(net_file, tmp_path):
    """Mirror of test_solver.m: iter 0 -> step(30) -> 30 -> solve -> 100,
    with staged labels on both train and test nets."""
    sfile = tmp_path / "solver.prototxt"
    sfile.write_text(f"""
        net: "{net_file}"
        test_iter: 10 test_interval: 10 base_lr: 0.01 momentum: 0.9
        weight_decay: 0.0005 lr_policy: "inv" gamma: 0.0001 power: 0.75
        display: 0 max_iter: 100 snapshot_after_train: false
    """)
    (hs,) = gw.dispatch("get_solver", [str(sfile)])
    (attr,) = gw.dispatch("solver_get_attr", [hs])
    f = _fields(attr)
    hnet = f["hNet_net"]["v"][0]
    htest = f["hNet_test_nets"]["v"]
    assert len(htest) == 1

    labels = np.random.RandomState(2).randint(0, 13, (5, 1, 1, 1))
    for hn in [hnet] + htest:
        (nattr,) = gw.dispatch("net_get_attr", [hn])
        gw.dispatch("blob_set_data",
                    [_blob_handle(_fields(nattr), "label"), _single(labels)])

    (it0,) = gw.dispatch("solver_get_iter", [hs])
    assert it0["v"] == 0.0
    gw.dispatch("solver_step", [hs, 30.0])
    (it1,) = gw.dispatch("solver_get_iter", [hs])
    assert it1["v"] == 30.0
    gw.dispatch("solver_solve", [hs])
    (it2,) = gw.dispatch("solver_get_iter", [hs])
    assert it2["v"] == 100.0


def test_read_write_mean_roundtrip(tmp_path):
    """Mirror of test_io.m::test_read_write_mean."""
    mean = (255 * np.random.RandomState(3).rand(3, 30, 20)).astype(np.float32)
    mfile = str(tmp_path / "mean.binaryproto")
    gw.dispatch("write_mean", [_single(mean), mfile])
    (got,) = gw.dispatch("read_mean", [mfile])
    assert got["dims"] == [20, 30, 3]  # W x H x C, trailing num squeezed
    np.testing.assert_allclose(_arr(got).reshape(mean.shape), mean)


def test_reset_invalidates_handles(net_file):
    (h,) = gw.dispatch("get_net", [net_file, "train"])
    (k1,) = gw.dispatch("get_init_key", [])
    (msg,) = gw.dispatch("reset", [])
    assert msg["t"] == "print" and "stand-alone nets" in msg["v"]
    (k2,) = gw.dispatch("get_init_key", [])
    assert k1["v"] != k2["v"]
    with pytest.raises(ValueError, match="init_key"):
        gw.dispatch("net_forward", [h])


def test_version_and_unknown_command_and_bad_phase(net_file):
    (v,) = gw.dispatch("version", [])
    assert "caffe 1.0.0-rc3" in v["v"]
    with pytest.raises(ValueError, match="Unknown command"):
        gw.dispatch("no_such_cmd", [])
    with pytest.raises(ValueError, match="Unknown phase"):
        gw.dispatch("get_net", [net_file, "deploy"])
    gw.dispatch("set_mode_cpu", [])
    gw.dispatch("set_device", [0.0])
