"""The reference's siamese MNIST recipe, end-to-end, from its OWN prototxt
(examples/siamese/mnist_siamese_train_test.prototxt): paired 2-channel
datums in a **LevelDB**, Slice into twin branches with shared-name params,
ContrastiveLoss. Exercises in one shot: the LevelDB backend, Slice, named
weight sharing under training (both branches' gradients must accumulate
into the owner), and ContrastiveLoss backward."""

import importlib.util
import os

import numpy as np
import pytest

REF = "/root/reference/examples/siamese/mnist_siamese_train_test.prototxt"


def _render(cls, rng):
    spec = importlib.util.spec_from_file_location(
        "mnist_make_dataset", "/root/repo/examples/mnist/make_dataset.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.render_digit(cls, rng)


@pytest.mark.skipif(not os.path.exists(REF), reason="reference not mounted")
def test_siamese_training_from_reference_prototxt(tmp_path):
    from deepcut_tpu.data.leveldb_store import LevelDBWriter
    from deepcut_tpu.data.datum import Datum
    from deepcut_tpu.proto import text_format
    from deepcut_tpu.core.graph import Net
    from deepcut_tpu.solver.solver import SolverParams, GraphSolver

    # paired dataset, reference layout (convert_mnist_siamese_data.cpp):
    # datum = 2-channel stacked pair, label 1 = same class
    spec = importlib.util.spec_from_file_location(
        "mnist_make_dataset", "/root/repo/examples/mnist/make_dataset.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    rng = np.random.RandomState(0)
    db = str(tmp_path / "siamese_leveldb")
    with LevelDBWriter(db) as w:
        for i in range(120):
            c1 = rng.randint(0, 10)
            same = i % 2 == 0
            c2 = c1 if same else (c1 + rng.randint(1, 10)) % 10
            pair = np.stack([mod.render_digit(c1, rng),
                             mod.render_digit(c2, rng)])  # (2, 28, 28)
            pair = (pair * 255).astype(np.uint8)
            w.put(f"{i:08d}".encode(),
                  Datum.from_array(pair, int(same)).encode())

    text = open(REF).read()
    text = text.replace("examples/siamese/mnist_siamese_train_leveldb", db)
    text = text.replace("examples/siamese/mnist_siamese_test_leveldb", db)
    net = Net(text_format.parse(text), phase="TRAIN", compute_dtype=None)

    net_file = tmp_path / "siamese.prototxt"
    net_file.write_text(text)
    sp = SolverParams.from_prototxt(f"""
        net: "{net_file}"
        base_lr: 0.01
        momentum: 0.9
        weight_decay: 0.0
        lr_policy: "fixed"
        display: 0
        max_iter: 60
        test_interval: 100000
        test_initialization: false
        test_iter: 2
        snapshot: 0
        snapshot_prefix: "{tmp_path}/siam"
    """)
    losses = []
    solver = GraphSolver(sp, net, handle_signals=False,
                         log=lambda *_: None)
    # twin branches alias the owners: conv1_p/conv2_p/ip1_p/ip2_p hold no arrays
    for name in ("conv1_p", "conv2_p", "ip1_p", "ip2_p"):
        assert net.params.get(name) == {}, name
        assert name in net._aliases
    step = solver._step_fn
    params, state = net.params, solver.state
    for _ in range(60):
        params, state, loss = step(params, state, solver._next_inputs())
        losses.append(float(loss))
    first = np.mean(losses[:10])
    last = np.mean(losses[-10:])
    assert last < first * 0.8, (first, last)

    # Solver::Test over the TEST-phase twin net (shared-weight aliases must
    # carry over to the cached test net)
    net.params = params
    solver.state = state
    results = solver.test()
    assert "loss" in results and np.isfinite(results["loss"])

    # the trained embedding separates same/different pairs on fresh data
    net.params = params
    rng2 = np.random.RandomState(99)
    feats = []
    for c in (3, 3, 7):
        img = (mod.render_digit(c, rng2) * 255).astype(np.float32) / 256.0
        out = net.forward(pair_data=np.stack(
            [np.stack([img, img])]), sim=np.zeros(1, np.float32))
        feats.append(out["feat"].reshape(-1))
    d_same = np.linalg.norm(feats[0] - feats[1])
    d_diff = np.linalg.norm(feats[0] - feats[2])
    assert d_same < d_diff, (d_same, d_diff)
