"""End-to-end cifar10_quick recipe over the LevelDB backend: synthetic
LevelDB dataset -> reference-style prototxt (backend: LEVELDB) ->
GraphSolver -> accuracy. Mirrors Caffe's examples/cifar10 (which used
LevelDB) the way test_example_mnist mirrors examples/mnist."""

import importlib.util

import numpy as np


def _load_make_dataset():
    # unique module name: examples/mnist has its own make_dataset.py
    spec = importlib.util.spec_from_file_location(
        "cifar10_make_dataset", "/root/repo/examples/cifar10/make_dataset.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_cifar10_quick_end_to_end(tmp_path):
    make_dataset = _load_make_dataset()
    from deepcut_tpu.proto import text_format
    from deepcut_tpu.core.graph import Net
    from deepcut_tpu.solver.solver import SolverParams, GraphSolver

    db = str(tmp_path / "train_leveldb")
    make_dataset.main(240, db)

    with open("/root/repo/examples/cifar10/cifar10_quick_train.prototxt") as f:
        proto_text = f.read().replace("examples/cifar10/train_leveldb", db)
    net = Net(text_format.parse(proto_text), phase="TRAIN", compute_dtype=None)

    sp = SolverParams.from_prototxt(
        f"""
        base_lr: 0.004
        momentum: 0.9
        weight_decay: 0.004
        lr_policy: "fixed"
        display: 0
        max_iter: 300
        snapshot: 0
        snapshot_prefix: "{tmp_path}/cifar"
        type: "SGD"
        """
    )
    solver = GraphSolver(sp, net, handle_signals=False, log=lambda *_: None)
    solver.solve()
    assert solver.iter == 300

    rng = np.random.RandomState(7)
    imgs, labels = [], []
    for i in range(60):
        cls = i % 10
        imgs.append(make_dataset.render(cls, rng).astype(np.float32) / 256.0)
        labels.append(cls)
    x = np.stack(imgs)
    outs = net.forward(data=x, label=np.zeros(len(labels), np.float32))
    pred = np.argmax(outs["ip2"].reshape(len(labels), -1), axis=1)
    acc = float(np.mean(pred == np.asarray(labels)))
    assert acc > 0.45, f"accuracy too low: {acc}"
