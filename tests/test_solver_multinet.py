"""Solver parity tail: multi-test-net machinery + observability fields.

Reference scenarios: Solver::InitTrainNet / InitTestNets / Test / TestAll
(/root/reference/src/caffe/solver.cpp:67-191, 293-409) and the schema fields
net_param/train_net_param/test_net_param, test_state, test_initialization,
test_compute_loss, snapshot_after_train, snapshot_diff, debug_info
(/root/reference/src/caffe/proto/caffe.proto:98-230), modeled on the field
coverage of test_gradient_based_solver.cpp / test_net.cpp.
"""

import glob

import numpy as np
import pytest

from deepcut_tpu.core.graph import Net
from deepcut_tpu.data.datum import Datum
from deepcut_tpu.data.lmdb_store import LMDBWriter
from deepcut_tpu.proto import text_format
from deepcut_tpu.solver.solver import GraphSolver, SolverParams


@pytest.fixture()
def db(tmp_path):
    path = str(tmp_path / "db")
    with LMDBWriter(path) as w:
        for i in range(16):
            arr = np.zeros((1, 4, 4), np.uint8)
            cls = i % 2
            arr[0, :, : 2 + 2 * cls] = 200
            w.put(f"{i:08d}".encode(), Datum.from_array(arr, cls).encode())
    return path


def _net_text(db, mark=None):
    """Tiny trainable net; `mark` adds a constant DummyData top so test-net
    instances built from different sources are distinguishable."""
    text = f"""
name: "multinet"
layer {{ name: "data" type: "Data" top: "data" top: "label"
        include {{ phase: TRAIN }}
        transform_param {{ scale: 0.005 }}
        data_param {{ source: "{db}" batch_size: 8 }} }}
layer {{ name: "data" type: "Data" top: "data" top: "label"
        include {{ phase: TEST }}
        transform_param {{ scale: 0.005 }}
        data_param {{ source: "{db}" batch_size: 8 }} }}
layer {{ name: "ip" type: "InnerProduct" bottom: "data" top: "ip"
        inner_product_param {{ num_output: 2
          weight_filler {{ type: "gaussian" std: 0.1 }} }} }}
layer {{ name: "loss" type: "SoftmaxWithLoss" bottom: "ip" bottom: "label"
        top: "loss" }}
layer {{ name: "accuracy" type: "Accuracy" bottom: "ip" bottom: "label"
        top: "accuracy" include {{ phase: TEST }} }}
"""
    if mark is not None:
        text += f"""
layer {{ name: "mark" type: "DummyData" top: "mark"
        include {{ phase: TEST }}
        dummy_data_param {{
          data_filler {{ type: "constant" value: {mark} }}
          shape {{ dim: 1 }} }} }}
"""
    return text


def _staged_net_text(db):
    """Generic net whose TEST instances are told apart by NetState stages."""
    return _net_text(db) + """
layer { name: "markA" type: "DummyData" top: "mark"
        include { phase: TEST stage: "A" }
        dummy_data_param {
          data_filler { type: "constant" value: 1 }
          shape { dim: 1 } } }
layer { name: "markB" type: "DummyData" top: "mark"
        include { phase: TEST stage: "B" }
        dummy_data_param {
          data_filler { type: "constant" value: 2 }
          shape { dim: 1 } } }
"""


def _solver_text(extra):
    return f"""
base_lr: 0.1
momentum: 0.9
lr_policy: "fixed"
display: 0
max_iter: 4
snapshot: 0
{extra}
"""


def test_multiple_test_nets_from_generic_net_with_test_state(tmp_path, db):
    """Solver::InitTestNets (solver.cpp:104-191): N instances of the generic
    `net` for N test_iter entries, each with its own test_state stages and
    per-net test_iter; TestAll (326-334) evaluates them in order."""
    net_path = tmp_path / "net.prototxt"
    net_path.write_text(_staged_net_text(db))
    sp = SolverParams.from_prototxt(_solver_text(f"""
net: "{net_path}"
test_interval: 2
test_iter: 2
test_iter: 3
test_state {{ stage: "A" }}
test_state {{ stage: "B" }}
"""))
    logs = []
    solver = GraphSolver(sp, handle_signals=False, log=logs.append)
    nets = solver._init_test_nets()
    assert len(nets) == 2
    assert [iters for _, iters in nets] == [2, 3]
    # per-net test_iter honored: count forwards
    counts = [0, 0]
    for i, (tnet, _) in enumerate(nets):
        orig = tnet.forward

        def wrapped(*a, _i=i, _orig=orig, **kw):
            counts[_i] += 1
            return _orig(*a, **kw)

        tnet.forward = wrapped
    results = solver.test_all()
    assert counts == [2, 3]
    # stage filtering: instance 0 sees markA (=1), instance 1 markB (=2)
    assert results[0]["mark"] == pytest.approx(1.0)
    assert results[1]["mark"] == pytest.approx(2.0)
    assert any("Testing net (#0)" in l for l in logs)
    assert any("Testing net (#1)" in l for l in logs)


def test_test_net_param_and_file_ordering(tmp_path, db):
    """Instance order mirrors the reference: inline test_net_param first,
    then test_net files, then generic-net instances for the remaining
    test_iter entries (solver.cpp:124-143)."""
    generic = tmp_path / "net.prototxt"
    generic.write_text(_staged_net_text(db))
    file_net = tmp_path / "file_net.prototxt"
    file_net.write_text(_net_text(db, mark=20))
    inline = _net_text(db, mark=10)
    sp = SolverParams.from_prototxt(_solver_text(f"""
net: "{generic}"
test_interval: 2
test_iter: 1
test_iter: 1
test_iter: 1
test_net_param {{ {inline} }}
test_net: "{file_net}"
"""))
    solver = GraphSolver(sp, handle_signals=False, log=lambda s: None)
    results = solver.test_all()
    assert len(results) == 3
    assert results[0]["mark"] == pytest.approx(10.0)  # inline test_net_param
    assert results[1]["mark"] == pytest.approx(20.0)  # test_net file
    assert "mark" not in results[2]  # generic net, no stage -> no mark layer
    assert "accuracy" in results[2]


def test_inline_net_param_trains(tmp_path, db):
    """net_param embeds the whole NetParameter in the solver prototxt
    (caffe.proto:105-109; Solver::InitTrainNet solver.cpp:75-92)."""
    sp = SolverParams.from_prototxt(_solver_text(f"""
net_param {{ {_net_text(db)} }}
test_interval: 2
test_iter: 1
"""))
    solver = GraphSolver(sp, handle_signals=False, log=lambda s: None)
    solver.solve()
    assert solver.iter == 4
    assert np.isfinite(solver.smoothed_loss)


def test_train_net_param_with_train_state_stages(tmp_path, db):
    """train_net_param + train_state stage filtering (solver.cpp:95-110):
    the TRAIN net is built with train_state's stages merged in."""
    staged = _net_text(db) + """
layer { name: "extra" type: "Power" bottom: "ip" top: "extra"
        include { phase: TRAIN stage: "S" } }
"""
    sp = SolverParams.from_prototxt(_solver_text(f"""
train_net_param {{ {staged} }}
train_state {{ stage: "S" }}
"""))
    solver = GraphSolver(sp, handle_signals=False, log=lambda s: None)
    names = [s.name for _, s in solver.net._plan]
    assert "extra" in names
    # without the stage the layer is filtered out
    sp2 = SolverParams.from_prototxt(_solver_text(f"""
train_net_param {{ {staged} }}
"""))
    solver2 = GraphSolver(sp2, handle_signals=False, log=lambda s: None)
    assert "extra" not in [s.name for _, s in solver2.net._plan]


def test_net_proto_own_state_merges(tmp_path, db):
    """NetParameter.state supplies the net's own default stages
    (Net::FilterNet's NetState base, net.cpp:286-314)."""
    text = 'state { stage: "A" }\n' + _staged_net_text(db)
    net = Net(text_format.parse(text), phase="TEST", compute_dtype=None)
    names = [s.name for _, s in net._plan]
    assert "markA" in names and "markB" not in names


def test_exactly_one_train_net_source(tmp_path, db):
    net_path = tmp_path / "net.prototxt"
    net_path.write_text(_net_text(db))
    sp = SolverParams.from_prototxt(_solver_text(f"""
net: "{net_path}"
train_net: "{net_path}"
"""))
    with pytest.raises(ValueError, match="more than one"):
        GraphSolver(sp, handle_signals=False, log=lambda s: None)
    with pytest.raises(ValueError, match="must specify a train net"):
        GraphSolver(SolverParams.from_prototxt(_solver_text("")),
                    handle_signals=False, log=lambda s: None)


def test_test_iter_count_mismatch_rejected(tmp_path, db):
    net_path = tmp_path / "net.prototxt"
    net_path.write_text(_net_text(db))
    sp = SolverParams.from_prototxt(_solver_text(f"""
train_net: "{net_path}"
test_net: "{net_path}"
test_net: "{net_path}"
test_interval: 2
test_iter: 1
"""))
    solver = GraphSolver(sp, handle_signals=False, log=lambda s: None)
    with pytest.raises(ValueError, match="test_iter"):
        solver._init_test_nets()


def test_test_initialization_false_skips_iter0(tmp_path, db):
    net_path = tmp_path / "net.prototxt"
    net_path.write_text(_net_text(db))
    base = f"""
net: "{net_path}"
test_interval: 2
test_iter: 1
"""
    runs = {}
    for flag in (True, False):
        sp = SolverParams.from_prototxt(_solver_text(
            base + f"test_initialization: {'true' if flag else 'false'}"))
        logs = []
        solver = GraphSolver(sp, handle_signals=False, log=logs.append)
        solver.step(2)  # covers iterations 0 and 1
        runs[flag] = sum("Testing net" in l for l in logs)
    assert runs[True] == 1 and runs[False] == 0


def test_test_compute_loss(tmp_path, db):
    """test_compute_loss averages the weighted test loss across test_iter
    passes (Solver::Test, solver.cpp:361-366, 393-398)."""
    net_path = tmp_path / "net.prototxt"
    net_path.write_text(_net_text(db))
    sp = SolverParams.from_prototxt(_solver_text(f"""
net: "{net_path}"
test_interval: 2
test_iter: 2
test_compute_loss: true
"""))
    logs = []
    solver = GraphSolver(sp, handle_signals=False, log=logs.append)
    avgs = solver.test()
    loss_lines = [l for l in logs if l.startswith("Test loss:")]
    assert len(loss_lines) == 1
    assert float(loss_lines[0].split(":")[1]) == pytest.approx(
        avgs["loss"], rel=1e-5)


def test_snapshot_after_train_false(tmp_path, db):
    net_path = tmp_path / "net.prototxt"
    net_path.write_text(_net_text(db))
    base = f"""
train_net: "{net_path}"
snapshot_prefix: "{tmp_path}/snap"
"""
    sp = SolverParams.from_prototxt(_solver_text(
        base + "snapshot_after_train: false"))
    GraphSolver(sp, handle_signals=False, log=lambda s: None).solve()
    assert not glob.glob(str(tmp_path / "snap*"))
    sp2 = SolverParams.from_prototxt(_solver_text(base))
    GraphSolver(sp2, handle_signals=False, log=lambda s: None).solve()
    assert glob.glob(str(tmp_path / "snap_iter_4.caffemodel"))


def test_snapshot_diff_caffemodel(tmp_path, db):
    """snapshot_diff writes each param's last update (what the reference's
    Blob.diff holds after ApplyUpdate) into BlobProto field 6
    (solver.cpp:452-459, caffe.proto:196-198). Verified as P_prev - P_now
    across two interval snapshots."""
    from deepcut_tpu.proto.caffemodel import load_caffemodel

    net_path = tmp_path / "net.prototxt"
    net_path.write_text(_net_text(db))
    sp = SolverParams.from_prototxt(_solver_text(f"""
train_net: "{net_path}"
snapshot_prefix: "{tmp_path}/sd"
""").replace("snapshot: 0", "snapshot: 1").replace("max_iter: 4",
                                                   "max_iter: 2")
        + "snapshot_diff: true")
    GraphSolver(sp, handle_signals=False, log=lambda s: None).solve()
    m1 = load_caffemodel(str(tmp_path / "sd_iter_1.caffemodel"))
    m2 = load_caffemodel(str(tmp_path / "sd_iter_2.caffemodel"))
    checked = 0
    for name, blobs2 in m2.items():
        for b1, b2 in zip(m1[name], blobs2):
            assert b2.diff is not None
            np.testing.assert_allclose(b2.diff, b1.data - b2.data,
                                       rtol=1e-5, atol=1e-6)
            checked += 1
    assert checked >= 2  # ip weight + bias


def test_snapshot_diff_hdf5_roundtrip(tmp_path, db):
    from deepcut_tpu.proto.caffemodel import load_hdf5_weights

    net_path = tmp_path / "net.prototxt"
    net_path.write_text(_net_text(db))
    sp = SolverParams.from_prototxt(_solver_text(f"""
train_net: "{net_path}"
snapshot_prefix: "{tmp_path}/sh"
snapshot_format: HDF5
snapshot_diff: true
""").replace("max_iter: 4", "max_iter: 1"))
    GraphSolver(sp, handle_signals=False, log=lambda s: None).solve()
    loaded = load_hdf5_weights(str(tmp_path / "sh_iter_1.caffemodel.h5"))
    assert any(b.diff is not None for blobs in loaded.values() for b in blobs)


def test_blobproto_diff_wire_roundtrip():
    """BlobProto field 6 (diff) round-trips through the wire codec."""
    from collections import OrderedDict

    from deepcut_tpu.proto.caffemodel import (decode_netparameter,
                                              encode_netparameter)

    w = np.arange(12, dtype=np.float32).reshape(3, 4)
    d = np.linspace(-1, 1, 12, dtype=np.float32).reshape(3, 4)
    for container in ("v2", "v1", "v0"):
        buf = encode_netparameter(OrderedDict(ip=[w]), container=container,
                                  layer_diffs={"ip": [d]})
        out = decode_netparameter(buf)
        blob = out["ip"][0]
        np.testing.assert_array_equal(
            np.asarray(blob.data, np.float32).reshape(-1), w.reshape(-1))
        np.testing.assert_array_equal(
            np.asarray(blob.diff, np.float32).reshape(-1), d.reshape(-1))


def test_debug_info_stream(tmp_path, db):
    """debug_info && display emits the per-blob / per-param L1-mean stream
    on displayed iterations (solver.cpp:218-219, net.cpp:647-735)."""
    net_path = tmp_path / "net.prototxt"
    net_path.write_text(_net_text(db))
    sp = SolverParams.from_prototxt(_solver_text(f"""
train_net: "{net_path}"
debug_info: true
""").replace("display: 0", "display: 2"))
    logs = []
    GraphSolver(sp, handle_signals=False, log=logs.append).solve()
    fwd = [l for l in logs if "[Forward] Blob" in l]
    bwd = [l for l in logs if "[Backward] Param" in l]
    assert fwd and bwd
    # stream appears once per displayed iteration (iters 0 and 2)
    assert sum("Blob loss" in l for l in fwd) == 2
