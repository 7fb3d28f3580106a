"""pycaffe Solver facade + the remaining _caffe.cpp/pycaffe.py Net surface:
get_solver/SGDSolver classes, solver.net live view, top/bottom_names,
blob_loss_weights, share_with, set_input_arrays, forward_backward_all."""

import numpy as np
import pytest

import deepcut_tpu.compat as caffe


NET = """
name: "t"
layer { name: "data" type: "DummyData" top: "data" top: "label"
  dummy_data_param {
    shape { dim: 4 dim: 6 } shape { dim: 4 }
    data_filler { type: "gaussian" std: 1.0 }
    data_filler { type: "constant" value: 1 } } }
layer { name: "ip" type: "InnerProduct" bottom: "data" top: "ip"
  inner_product_param { num_output: 3 weight_filler { type: "xavier" } } }
layer { name: "loss" type: "SoftmaxWithLoss" bottom: "ip" bottom: "label"
  top: "loss" }
"""


@pytest.fixture
def solver_file(tmp_path):
    net = tmp_path / "net.prototxt"
    net.write_text(NET)
    sol = tmp_path / "solver.prototxt"
    sol.write_text(f"""
        net: "{net}"
        base_lr: 0.1
        lr_policy: "fixed"
        display: 0
        max_iter: 50
        snapshot: 0
        snapshot_prefix: "{tmp_path}/s"
    """)
    return str(sol)


def test_get_solver_step_and_live_net(solver_file):
    solver = caffe.get_solver(solver_file)
    assert solver.iter == 0
    w0 = solver.net.params["ip"][0].data.copy()
    solver.step(10)
    assert solver.iter == 10
    w1 = solver.net.params["ip"][0].data
    assert not np.allclose(w0, w1), "solver.net is not a live view"
    solver.solve()
    assert solver.iter == 50
    # snapshot/restore round-trip through the facade
    path = solver.snapshot()
    solver2 = caffe.get_solver(solver_file)
    solver2.restore(path)
    assert solver2.iter == 50
    np.testing.assert_allclose(solver2.net.params["ip"][0].data,
                               solver.net.params["ip"][0].data)


def test_typed_solver_classes(solver_file):
    assert caffe.SGDSolver(solver_file)._solver.params_cfg.config.solver_type == "SGD"
    assert caffe.AdamSolver(solver_file)._solver.params_cfg.config.solver_type == "Adam"
    assert caffe.NesterovSolver(solver_file)._solver.params_cfg.config.solver_type == "Nesterov"
    assert caffe.RMSPropSolver(solver_file)._solver.params_cfg.config.solver_type == "RMSProp"
    adam = caffe.AdamSolver(solver_file)
    adam.step(3)
    assert adam.iter == 3


DEPLOY = """
name: "d"
input: "data"
input_shape { dim: 2 dim: 5 }
layer { name: "ip" type: "InnerProduct" bottom: "data" top: "ip"
  inner_product_param { num_output: 3 weight_filler { type: "gaussian" std: 0.4 } } }
layer { name: "loss" type: "EuclideanLoss" bottom: "ip" bottom: "tgt"
  top: "loss" loss_weight: 2.0 }
input: "tgt"
input_shape { dim: 2 dim: 3 }
"""


def test_net_names_and_loss_weights(tmp_path):
    p = tmp_path / "d.prototxt"
    p.write_text(DEPLOY)
    net = caffe.Net(str(p), caffe.TEST)
    assert net.top_names["ip"] == ["ip"]
    assert net.bottom_names["loss"] == ["ip", "tgt"]
    lw = net.blob_loss_weights
    assert lw["loss"] == 2.0 and lw["ip"] == 0.0 and lw["data"] == 0.0


def test_share_with_and_forward_backward_all(tmp_path):
    p = tmp_path / "d.prototxt"
    p.write_text(DEPLOY)
    a = caffe.Net(str(p), caffe.TEST)
    b = caffe.Net(str(p), caffe.TEST)
    x = np.random.RandomState(0).randn(2, 5).astype(np.float32)
    t = np.random.RandomState(1).randn(2, 3).astype(np.float32)
    # fillers are deterministically seeded -> perturb b to differ first
    b._net.params["ip"]["w"] = b._net.params["ip"]["w"] * 2.0
    assert not np.allclose(a.forward(blobs=["ip"], data=x, tgt=t)["ip"],
                           b.forward(blobs=["ip"], data=x, tgt=t)["ip"])
    b.share_with(a)
    np.testing.assert_allclose(a.forward(blobs=["ip"], data=x, tgt=t)["ip"],
                               b.forward(blobs=["ip"], data=x, tgt=t)["ip"])

    # batched forward+backward: gradients arrive per input blob
    X = np.random.RandomState(2).randn(6, 5).astype(np.float32)
    T = np.random.RandomState(3).randn(6, 3).astype(np.float32)
    outs, diffs = a.forward_backward_all(blobs=["ip"], data=X, tgt=T)
    assert outs["ip"].shape == (6, 3)
    assert diffs["data"].shape == (6, 5)
    # chain check on one batch: d(2*loss)/d data is nonzero
    assert np.abs(diffs["data"]).max() > 0


MEMNET = """
name: "m"
layer { name: "data" type: "MemoryData" top: "data" top: "label"
  memory_data_param { batch_size: 2 channels: 1 height: 4 width: 4 } }
layer { name: "ip" type: "InnerProduct" bottom: "data" top: "ip"
  inner_product_param { num_output: 2 weight_filler { type: "gaussian" std: 0.3 } } }
"""


def test_set_input_arrays(tmp_path):
    p = tmp_path / "m.prototxt"
    p.write_text(MEMNET)
    net = caffe.Net(str(p), caffe.TEST)
    data = np.random.RandomState(0).randn(2, 1, 4, 4).astype(np.float32)
    labels = np.zeros(2, np.float32)
    net.set_input_arrays(data, labels)
    out = net.forward()
    assert out["ip"].shape == (2, 2)


def test_params_write_through(tmp_path):
    """pycaffe net-surgery idiom: net.params[l][i].data[...] = w (and
    in-place ops / fill) must reach the live graph parameters."""
    p = tmp_path / "n.prototxt"
    p.write_text("""
    input: "data" input_shape { dim: 1 dim: 3 }
    layer { name: "ip" type: "InnerProduct" bottom: "data" top: "ip"
      inner_product_param { num_output: 2 bias_term: false
        weight_filler { type: "constant" value: 1.0 } } }
    """)
    net = caffe.Net(str(p), caffe.TEST)
    x = np.ones((1, 3), np.float32)
    assert net.forward(data=x)["ip"].tolist() == [[3.0, 3.0]]
    net.params["ip"][0].data[...] = 2.0                 # full setitem
    assert net.forward(data=x)["ip"].tolist() == [[6.0, 6.0]]
    w = net.params["ip"][0]
    w.data *= 0.5                                        # in-place ufunc
    assert net.forward(data=x)["ip"].tolist() == [[3.0, 3.0]]
    w.data.fill(3.0)                                     # fill
    assert net.forward(data=x)["ip"].tolist() == [[9.0, 9.0]]
    w.data[0, :] = 0.0                                   # partial setitem
    assert net.forward(data=x)["ip"].tolist() == [[0.0, 9.0]]


def test_blob_diff_after_backward(tmp_path):
    """pycaffe blob.diff: zeros before backward, input gradients after."""
    p = tmp_path / "d.prototxt"
    p.write_text(DEPLOY)
    net = caffe.Net(str(p), caffe.TEST)
    x = np.random.RandomState(0).randn(2, 5).astype(np.float32)
    t = np.random.RandomState(1).randn(2, 3).astype(np.float32)
    net.forward(data=x, tgt=t)
    assert np.all(net.blobs["data"].diff == 0)
    grads = net.backward()  # inputs come from the staged blobs (pycaffe)
    np.testing.assert_allclose(net.blobs["data"].diff, grads["data"])
    assert np.abs(net.blobs["data"].diff).max() > 0
    # param blobs expose .diff too (zeros: no persistent grads under jit)
    assert np.all(net.params["ip"][0].diff == 0)


def test_dummy_data_constant_top_fill_once(tmp_path):
    """dummy_data_layer.cpp fills CONSTANT tops in LayerSetUp only — a
    staged set_data value persists through later forwards (the reference
    matlab/pycaffe test pattern), while random-filler tops keep refilling."""
    p = tmp_path / "dd.prototxt"
    p.write_text("""
    layer { name: "data" type: "DummyData" top: "data" top: "label"
      dummy_data_param { shape { dim: 4 dim: 6 } shape { dim: 4 }
        data_filler { type: "gaussian" std: 1.0 }
        data_filler { type: "constant" value: 7 } } }
    layer { name: "ip" type: "InnerProduct" bottom: "data" top: "ip"
      inner_product_param { num_output: 3 weight_filler { type: "xavier" } } }
    layer { name: "loss" type: "SoftmaxWithLoss" bottom: "ip" bottom: "label"
      top: "loss" }
    """)
    net = caffe.Net(str(p), caffe.TRAIN)
    net.forward()
    np.testing.assert_array_equal(net.blobs["label"].data, 7.0)
    d0 = net.blobs["data"].data.copy()
    # stage a new label; it must survive the next forward
    net.blobs["label"].data[...] = np.array([0, 1, 2, 1], np.float32)
    net.forward()
    np.testing.assert_array_equal(net.blobs["label"].data,
                                  [0.0, 1.0, 2.0, 1.0])
    # the gaussian data top refilled (fresh draw each forward)
    assert not np.allclose(net.blobs["data"].data, d0)


def test_solver_extra_inputs_reach_the_train_step(tmp_path):
    """GraphSolver.extra_inputs: staged fill-once blob values flow into
    every training iteration's batch (matcaffe set label -> solver.step)."""
    from deepcut_tpu.solver.solver import GraphSolver, SolverParams

    netf = tmp_path / "n.prototxt"
    netf.write_text("""
    layer { name: "data" type: "DummyData" top: "data" top: "label"
      dummy_data_param { shape { dim: 4 dim: 6 } shape { dim: 4 }
        data_filler { type: "constant" value: 0.5 }
        data_filler { type: "constant" value: 0 } } }
    layer { name: "ip" type: "InnerProduct" bottom: "data" top: "ip"
      inner_product_param { num_output: 3
        weight_filler { type: "xavier" } } }
    layer { name: "loss" type: "SoftmaxWithLoss" bottom: "ip" bottom: "label"
      top: "loss" }
    """)
    sp = SolverParams.from_prototxt(f"""
        net: "{netf}"
        base_lr: 0.0
        lr_policy: "fixed"
        display: 0
        max_iter: 5
        snapshot: 0
        snapshot_prefix: "{tmp_path}/s"
    """)

    def loss_with_label(label):
        s = GraphSolver(sp, str(netf), handle_signals=False,
                        log=lambda *_: None)
        s.extra_inputs = {"label": np.asarray(label, np.float32)}
        s.step(1)
        return s.smoothed_loss

    # identical deterministically-seeded nets, lr=0: any loss difference
    # comes from the staged label reaching the jitted step
    l_a = loss_with_label([0, 0, 0, 0])
    l_aa = loss_with_label([0, 0, 0, 0])
    l_b = loss_with_label([2, 2, 2, 2])
    assert l_a == l_aa
    assert l_a != l_b, "staged label never reached the train step"


def test_dummy_data_legacy_four_field_dims():
    """dummy_data_param's legacy num/channels/height/width form (the
    reference matlab/pycaffe test fixtures use it)."""
    from deepcut_tpu.core.graph import Net
    from deepcut_tpu.proto import text_format

    proto = """
    layer { name: "data" type: "DummyData" top: "data" top: "label"
      dummy_data_param { num: 5 channels: 2 height: 3 width: 4
        num: 5 channels: 1 height: 1 width: 1
        data_filler { type: "gaussian" std: 1 }
        data_filler { type: "constant" } } }
    """
    net = Net(text_format.parse(proto), phase="TRAIN", compute_dtype=None)
    net._ensure_params({})
    out = net.forward()
    assert out["data"].shape == (5, 2, 3, 4)
    assert out["label"].shape == (5, 1, 1, 1)
    np.testing.assert_array_equal(out["label"], 0.0)
    assert np.abs(out["data"]).sum() > 0  # gaussian actually drew
