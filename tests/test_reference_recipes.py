"""The reference's OWN example recipes, trained as-is (only dataset paths
swapped to generated fixtures): lenet_train_test, cifar10_quick_train_test
(mean_file + TEST-phase Accuracy), and the mnist autoencoder (sparse
gaussian filler, SigmoidCrossEntropyLoss + EuclideanLoss heads, Flatten).
What examples/*.prototxt is to Caffe users, these tests are to the graph
engine."""

import importlib.util
import os

import numpy as np
import pytest

from deepcut_tpu.proto import text_format
from deepcut_tpu.core.graph import Net
from deepcut_tpu.solver.solver import SolverParams, GraphSolver

REF_EX = "/root/reference/examples"


def _mnist_mod():
    spec = importlib.util.spec_from_file_location(
        "mnist_make_dataset", "/root/repo/examples/mnist/make_dataset.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _make_mnist_lmdb(path, n=120):
    from deepcut_tpu.data.lmdb_store import LMDBWriter
    from deepcut_tpu.data.datum import Datum

    mod = _mnist_mod()
    rng = np.random.RandomState(0)
    with LMDBWriter(path) as w:
        for i in range(n):
            cls = i % 10
            img = (mod.render_digit(cls, rng) * 255).astype(np.uint8)[None]
            w.put(f"{i:08d}".encode(), Datum.from_array(img, cls).encode())


def _solver(tmp_path, net_path, max_iter, base_lr=0.02, test_interval=0,
            extra=""):
    return SolverParams.from_prototxt(f"""
        net: "{net_path}"
        base_lr: {base_lr}
        momentum: 0.9
        weight_decay: 0.0005
        lr_policy: "fixed"
        display: 0
        max_iter: {max_iter}
        test_interval: {test_interval}
        test_iter: {3 if test_interval else 0}
        snapshot: 0
        snapshot_prefix: "{tmp_path}/s"
        {extra}
    """)


@pytest.mark.skipif(not os.path.exists(REF_EX), reason="reference not mounted")
def test_reference_lenet_train_test(tmp_path):
    db = str(tmp_path / "mnist_lmdb")
    _make_mnist_lmdb(db)
    text = open(f"{REF_EX}/mnist/lenet_train_test.prototxt").read()
    text = text.replace("examples/mnist/mnist_train_lmdb", db)
    text = text.replace("examples/mnist/mnist_test_lmdb", db)
    net_path = tmp_path / "lenet.prototxt"
    net_path.write_text(text)

    logs = []
    solver = GraphSolver(_solver(tmp_path, net_path, 80, test_interval=40),
                         str(net_path), handle_signals=False, log=logs.append)
    solver.solve()
    final = solver.test()
    assert final["accuracy"] > 0.8, final


@pytest.mark.skipif(not os.path.exists(REF_EX), reason="reference not mounted")
def test_reference_cifar10_quick_train_test(tmp_path):
    from deepcut_tpu.data.lmdb_store import LMDBWriter
    from deepcut_tpu.data.datum import Datum
    from deepcut_tpu.tools.datasets import main as dataset_main

    spec = importlib.util.spec_from_file_location(
        "cifar10_make_dataset", "/root/repo/examples/cifar10/make_dataset.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    rng = np.random.RandomState(0)
    db = str(tmp_path / "cifar_lmdb")
    with LMDBWriter(db) as w:
        for i in range(200):
            cls = i % 10
            w.put(f"{i:08d}".encode(),
                  Datum.from_array(mod.render(cls, rng), cls).encode())
    mean_path = str(tmp_path / "mean.binaryproto")
    assert dataset_main(["compute_image_mean", db, mean_path]) == 0

    text = open(f"{REF_EX}/cifar10/cifar10_quick_train_test.prototxt").read()
    text = text.replace("examples/cifar10/cifar10_train_lmdb", db)
    text = text.replace("examples/cifar10/cifar10_test_lmdb", db)
    text = text.replace("examples/cifar10/mean.binaryproto", mean_path)
    net_path = tmp_path / "cifar.prototxt"
    net_path.write_text(text)

    solver = GraphSolver(_solver(tmp_path, net_path, 250, base_lr=0.004,
                                 test_interval=125,
                                 extra="weight_decay: 0.004"),
                         str(net_path), handle_signals=False,
                         log=lambda *_: None)
    solver.solve()
    final = solver.test()
    assert final["accuracy"] > 0.4, final  # synthetic shapes, short schedule


@pytest.mark.skipif(not os.path.exists(REF_EX), reason="reference not mounted")
def test_reference_mnist_autoencoder_trains(tmp_path):
    db = str(tmp_path / "mnist_lmdb")
    _make_mnist_lmdb(db, n=60)
    text = open(f"{REF_EX}/mnist/mnist_autoencoder.prototxt").read()
    text = text.replace("examples/mnist/mnist_train_lmdb", db)
    text = text.replace("examples/mnist/mnist_test_lmdb", db)
    net_path = tmp_path / "ae.prototxt"
    net_path.write_text(text)

    net = Net(str(net_path), phase="TRAIN", compute_dtype=None)
    sp = _solver(tmp_path, net_path, 40, base_lr=0.0005)
    solver = GraphSolver(sp, net, handle_signals=False, log=lambda *_: None)
    step = solver._step_fn
    params, state = net.params, solver.state
    losses = []
    for _ in range(40):
        params, state, loss = step(params, state, solver._next_inputs())
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-8:]) < np.mean(losses[:8]), losses[::8]
