"""End-to-end `caffe train` parity: LMDB dataset -> LeNet prototxt ->
GraphSolver -> accuracy. The full reference workflow, no pose involved."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/examples/mnist")


def test_lenet_training_end_to_end(tmp_path, monkeypatch):
    from make_dataset import make_lmdb
    from deepcut_tpu.proto import text_format
    from deepcut_tpu.core.graph import Net
    from deepcut_tpu.solver.solver import SolverParams, GraphSolver

    db = str(tmp_path / "train_lmdb")
    make_lmdb(db, 200, seed=0)

    with open("/root/repo/examples/mnist/lenet_train.prototxt") as f:
        proto_text = f.read().replace("examples/mnist/train_lmdb", db)
    net = Net(text_format.parse(proto_text), phase="TRAIN", compute_dtype=None)

    sp = SolverParams.from_prototxt(
        f"""
        base_lr: 0.02
        momentum: 0.9
        weight_decay: 0.0005
        lr_policy: "inv" gamma: 0.0001 power: 0.75
        display: 0
        max_iter: 60
        snapshot: 0
        snapshot_prefix: "{tmp_path}/lenet"
        type: "SGD"
        """
    )
    solver = GraphSolver(sp, net, handle_signals=False, log=lambda *_: None)
    solver.solve()
    assert solver.iter == 60

    # accuracy on fresh synthetic digits through the softmax scores
    from make_dataset import render_digit
    import jax.numpy as jnp
    rng = np.random.RandomState(99)
    imgs, labels = [], []
    for i in range(80):
        cls = i % 10
        imgs.append(render_digit(cls, rng)[None].astype(np.float32) / 256.0)
        labels.append(cls)
    x = np.stack(imgs)
    outs = net.forward(data=x, label=np.zeros(len(labels), np.float32))
    pred = np.argmax(outs["ip2"].reshape(len(labels), -1), axis=1)
    acc = float(np.mean(pred == np.asarray(labels)))
    assert acc > 0.7, f"accuracy too low: {acc}"
