"""Tooling: PCKh harness, draw, parse_log, CLI plumbing."""

import numpy as np
import pytest

from deepcut_tpu.pose.evaluate import pckh, head_size_from_box, format_report
from deepcut_tpu.tools.draw import net_to_dot
from deepcut_tpu.tools.parse_log import parse_log, write_csv
from deepcut_tpu.proto import text_format


def test_pckh_exact():
    # 2 samples, 3 joints; head size 10 -> radius 5 at t=0.5
    gt = np.zeros((2, 3, 2), np.float32)
    pred = np.zeros((2, 3, 2), np.float32)
    pred[0, 0] = [3, 4]     # dist 5  -> hit (<=)
    pred[0, 1] = [6, 0]     # dist 6  -> miss
    pred[1, 2] = [0, 5.01]  # dist 5.01 -> miss
    gt[1, 1] = np.nan       # unannotated -> excluded
    r = pckh(pred, gt, np.array([10.0, 10.0]))
    np.testing.assert_allclose(r.per_joint, [1.0, 0.0, 0.5])
    assert r.counts.tolist() == [2, 1, 2]
    np.testing.assert_allclose(r.mean, 3 / 5)
    assert head_size_from_box(0, 0, 30, 40) == pytest.approx(30.0)
    assert "MEAN" in format_report(r)


def test_draw_dot():
    net = text_format.parse(
        'name: "t"\ninput: "data"\ninput_dim: 1 input_dim: 3 input_dim: 8 input_dim: 8\n'
        'layer { name: "c" type: "Convolution" bottom: "data" top: "c" '
        'convolution_param { num_output: 4 kernel_size: 3 } }\n'
        'layer { name: "r" type: "ReLU" bottom: "c" top: "c" }\n'
        'layer { name: "p" type: "Pooling" bottom: "c" top: "p" '
        'pooling_param { kernel_size: 2 stride: 2 } }'
    )
    dot = net_to_dot(net)
    assert 'digraph "t"' in dot
    assert '"blob_data" -> "c"' in dot
    assert '"c" -> "r"' in dot
    assert '"r" -> "p"' in dot  # in-place ReLU becomes the producer of "c"


def test_parse_log(tmp_path):
    log = tmp_path / "train.log"
    log.write_text(
        "Solving with SGD, max_iter = 100\n"
        "Iteration 20, loss = 1.5000 (part_loss = 1.2000, locref_loss = 0.3000), lr = 0.005\n"
        "Iteration 40, loss = 1.2000 (part_loss = 1.0000, locref_loss = 0.2000), lr = 0.005\n"
        "garbage line\n"
    )
    rows = parse_log(str(log))
    assert len(rows) == 2
    assert rows[0]["NumIters"] == 20
    assert rows[0]["loss"] == 1.5
    assert rows[1]["part_loss"] == 1.0
    assert rows[0]["LearningRate"] == 0.005
    out = tmp_path / "out.csv"
    write_csv(rows, str(out))
    assert "NumIters" in out.read_text()


def test_cli_parsing():
    from deepcut_tpu.tools.cli import main
    with pytest.raises(SystemExit):
        main([])  # no verb


def test_net_surgery_example_runs():
    """examples/net_surgery.py (reference net_surgery.ipynb analog) must run
    end-to-end: filter edit + fully-convolutional cast with exact parity."""
    import subprocess, sys
    proc = subprocess.run(
        [sys.executable, "examples/net_surgery.py"],
        capture_output=True, text=True, cwd="/root/repo", timeout=600)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "surgery exact" in proc.stdout


def test_cli_train_finetune_weights(tmp_path):
    """`caffe train -weights x.caffemodel` must finetune the generic graph
    path (tools/caffe.cpp:154-225 CopyTrainedLayersFrom semantics)."""
    import numpy as np
    import sys
    from deepcut_tpu.data.lmdb_store import LMDBWriter
    from deepcut_tpu.data.datum import Datum
    from deepcut_tpu.proto.caffemodel import save_caffemodel, load_caffemodel

    db = str(tmp_path / "db")
    rng = np.random.RandomState(0)
    with LMDBWriter(db) as w:
        for i in range(8):
            w.put(f"{i:08d}".encode(),
                  Datum.from_array(rng.randint(0, 255, (1, 4, 4), np.uint8),
                                   i % 2).encode())
    net_path = tmp_path / "net.prototxt"
    net_path.write_text(f"""
layer {{ name: "data" type: "Data" top: "data" top: "label"
        data_param {{ source: "{db}" batch_size: 4 }} }}
layer {{ name: "ip" type: "InnerProduct" bottom: "data" top: "ip"
        inner_product_param {{ num_output: 2
          weight_filler {{ type: "constant" value: 0 }} }} }}
layer {{ name: "loss" type: "SoftmaxWithLoss" bottom: "ip" bottom: "label" top: "loss" }}
""")
    # pretrained weights: a distinctive nonzero matrix
    w0 = np.full((2, 16), 0.625, np.float32)
    weights_path = str(tmp_path / "pre.caffemodel")
    save_caffemodel(weights_path, {"ip": {"w": w0, "b": np.zeros(2, np.float32)}})
    solver_path = tmp_path / "solver.prototxt"
    solver_path.write_text(f"""
net: "{net_path}"
base_lr: 0.0
lr_policy: "fixed"
display: 0
max_iter: 1
snapshot: 1
snapshot_prefix: "{tmp_path}/ft"
""")
    from deepcut_tpu.tools import cli
    assert cli.main(["train", "-solver", str(solver_path),
                     "-weights", weights_path]) == 0
    out = load_caffemodel(str(tmp_path / "ft_iter_1.caffemodel"))
    # lr 0: weights must be exactly the finetune source, not the zero filler
    np.testing.assert_allclose(out["ip"][0].data, w0)


def test_deprecated_tool_verbs(tmp_path, capsys):
    """The reference's deprecated single-purpose tools (tools/train_net.cpp,
    test_net.cpp, finetune_net.cpp, net_speed_benchmark.cpp) exist as verbs
    that warn and delegate to the modern ones."""
    from deepcut_tpu.tools import cli

    model = tmp_path / "m.prototxt"
    model.write_text("""
    name: "t"
    input: "data"
    input_dim: 1 input_dim: 3 input_dim: 8 input_dim: 8
    layer { name: "c" type: "Convolution" bottom: "data" top: "c"
      convolution_param { num_output: 2 kernel_size: 3
        weight_filler { type: "gaussian" std: 0.1 } } }
    """)
    assert cli.main(["net_speed_benchmark", str(model), "2"]) == 0
    assert cli.main(["test_net", str(model), "", "1"]) == 0
    err = capsys.readouterr().err
    assert "net_speed_benchmark is deprecated" in err
    assert "test_net is deprecated" in err


def test_cli_train_mesh_flag(tmp_path):
    """`train -mesh N` (the reference's `-gpu 0,1,..` analog) builds a
    data-parallel mesh for the generic graph path and trains; the snapshot
    must match a single-device run of the same schedule (DP trajectory
    equivalence at the CLI surface)."""
    import numpy as np
    from deepcut_tpu.data.lmdb_store import LMDBWriter
    from deepcut_tpu.data.datum import Datum
    from deepcut_tpu.proto.caffemodel import load_caffemodel
    from deepcut_tpu.tools import cli
    import jax

    if len(jax.devices()) < 2:
        import pytest
        pytest.skip("needs >= 2 devices")

    db = str(tmp_path / "db")
    rng = np.random.RandomState(0)
    with LMDBWriter(db) as w:
        for i in range(8):
            w.put(f"{i:08d}".encode(),
                  Datum.from_array(rng.randint(0, 255, (1, 4, 4), np.uint8),
                                   i % 2).encode())
    net_path = tmp_path / "net.prototxt"
    net_path.write_text(f"""
layer {{ name: "data" type: "Data" top: "data" top: "label"
        data_param {{ source: "{db}" batch_size: 4 }} }}
layer {{ name: "ip" type: "InnerProduct" bottom: "data" top: "ip"
        inner_product_param {{ num_output: 2
          weight_filler {{ type: "gaussian" std: 0.1 }} }} }}
layer {{ name: "loss" type: "SoftmaxWithLoss" bottom: "ip" bottom: "label" top: "loss" }}
""")

    def run(tag, extra):
        solver_path = tmp_path / f"solver_{tag}.prototxt"
        solver_path.write_text(f"""
net: "{net_path}"
base_lr: 0.1
momentum: 0.9
lr_policy: "fixed"
display: 0
max_iter: 3
random_seed: 1
snapshot: 3
snapshot_prefix: "{tmp_path}/{tag}"
""")
        assert cli.main(["train", "-solver", str(solver_path)] + extra) == 0
        return load_caffemodel(str(tmp_path / f"{tag}_iter_3.caffemodel"))

    single = run("single", [])
    mesh = run("mesh", ["-mesh", "2"])
    np.testing.assert_allclose(mesh["ip"][0].data, single["ip"][0].data,
                               rtol=1e-5, atol=1e-6)


def test_cli_train_finetune_weights_comma_list(tmp_path):
    """`caffe train -weights a.caffemodel,b.caffemodel` loads EACH file of
    the comma-separated list in order (tools/caffe.cpp CopyLayers:123-135
    boost::split on ',')."""
    import numpy as np
    from deepcut_tpu.data.lmdb_store import LMDBWriter
    from deepcut_tpu.data.datum import Datum
    from deepcut_tpu.proto.caffemodel import save_caffemodel, load_caffemodel

    db = str(tmp_path / "db")
    rng = np.random.RandomState(0)
    with LMDBWriter(db) as w:
        for i in range(8):
            w.put(f"{i:08d}".encode(),
                  Datum.from_array(rng.randint(0, 255, (1, 4, 4), np.uint8),
                                   i % 2).encode())
    net_path = tmp_path / "net.prototxt"
    net_path.write_text(f"""
layer {{ name: "data" type: "Data" top: "data" top: "label"
        data_param {{ source: "{db}" batch_size: 4 }} }}
layer {{ name: "ip1" type: "InnerProduct" bottom: "data" top: "ip1"
        inner_product_param {{ num_output: 3
          weight_filler {{ type: "constant" value: 0 }} }} }}
layer {{ name: "ip2" type: "InnerProduct" bottom: "ip1" top: "ip2"
        inner_product_param {{ num_output: 2
          weight_filler {{ type: "constant" value: 0 }} }} }}
layer {{ name: "loss" type: "SoftmaxWithLoss" bottom: "ip2" bottom: "label" top: "loss" }}
""")
    w1 = np.full((3, 16), 0.25, np.float32)
    w2 = np.full((2, 3), -0.5, np.float32)
    p1, p2 = str(tmp_path / "a.caffemodel"), str(tmp_path / "b.caffemodel")
    save_caffemodel(p1, {"ip1": {"w": w1, "b": np.zeros(3, np.float32)}})
    save_caffemodel(p2, {"ip2": {"w": w2, "b": np.zeros(2, np.float32)}})
    solver_path = tmp_path / "solver.prototxt"
    solver_path.write_text(f"""
net: "{net_path}"
base_lr: 0.0
lr_policy: "fixed"
display: 0
max_iter: 1
snapshot: 1
snapshot_prefix: "{tmp_path}/ft"
""")
    from deepcut_tpu.tools import cli
    assert cli.main(["train", "-solver", str(solver_path),
                     "-weights", f"{p1},{p2}"]) == 0
    out = load_caffemodel(str(tmp_path / "ft_iter_1.caffemodel"))
    np.testing.assert_allclose(out["ip1"][0].data, w1)
    np.testing.assert_allclose(out["ip2"][0].data, w2)
