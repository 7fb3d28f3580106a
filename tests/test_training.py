"""End-to-end training loop: loss decreases, snapshot/restore equivalence.

Mirrors the reference's test_gradient_based_solver.cpp headline checks,
especially snapshot/restore: training k iters, snapshotting, restoring, and
continuing must produce the same params as training straight through.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepcut_tpu.data.window_file import ImageRecord, Person
from deepcut_tpu.data.pipeline import PoseDataSource, Prefetcher
from deepcut_tpu.pose.targets import TargetConfig
from deepcut_tpu.models.resnet import DeeperCutConfig, init_params
from deepcut_tpu.solver.solver import SolverParams, PoseSolver, save_checkpoint, load_checkpoint
from deepcut_tpu.solver.update_rules import SolverConfig

TINY_MODEL = DeeperCutConfig(
    depths=(1, 1, 1, 1), stage_widths=(4, 4, 8, 8), num_joints=14,
    pairwise=False, compute_dtype=jnp.float32,
)


def _records(n=4):
    rng = np.random.RandomState(0)
    recs = []
    for i in range(n):
        k = rng.randint(6, 14)
        classes = (rng.permutation(14)[:k] + 1).astype(np.int32)
        xy = np.stack([rng.uniform(10, 150, k), rng.uniform(10, 110, k)], 1).astype(np.float32)
        recs.append(ImageRecord(f"img{i}", 3, 120, 160, [Person(classes, xy)]))
    return recs


def _source(seed=0):
    cfg = TargetConfig(num_classes=14, no_bg_class=True, soft_labels=True,
                       location_refinement=True, fg_threshold=17.0)
    rng = np.random.RandomState(99)
    fake_images = {}

    def loader(path):
        if path not in fake_images:
            fake_images[path] = rng.randint(0, 255, (120, 160, 3), np.uint8)
        return fake_images[path]

    return PoseDataSource(_records(), cfg, seed=seed, image_loader=loader,
                          bucket_step=32)


def _solver_params(max_iter=6, snapshot_prefix="/tmp/dc_test"):
    return SolverParams(
        config=SolverConfig(solver_type="SGD", base_lr=0.001, momentum=0.9,
                            weight_decay=0.0001, lr_policy="fixed",
                            clip_gradients=1.0),
        max_iter=max_iter, display=0, snapshot=0, snapshot_prefix=snapshot_prefix,
    )


def test_loss_decreases():
    src = _source()
    batches = [src.next_batch(1) for _ in range(3)]
    i = [0]

    def batch_source():
        b = batches[i[0] % 3]
        i[0] += 1
        return b

    solver = PoseSolver(_solver_params(), TINY_MODEL, batch_source,
                        handle_signals=False, log=lambda *_: None)
    losses = []
    for _ in range(6):
        before = solver.iter
        solver.step(1)
        assert solver.iter == before + 1
    # re-evaluate first batch loss before/after is implicit: run more steps
    from deepcut_tpu.models.train import loss_fn
    l0 = float(loss_fn(init_params(jax.random.PRNGKey(0), TINY_MODEL),
                       {k: jnp.asarray(v) for k, v in batches[0].items()}, TINY_MODEL)[0])
    l1 = float(loss_fn(solver.net_params,
                       {k: jnp.asarray(v) for k, v in batches[0].items()}, TINY_MODEL)[0])
    assert np.isfinite(l1)
    assert l1 < l0, (l0, l1)


def test_snapshot_restore_equivalence(tmp_path):
    def run(n_iters, restore_at=None):
        src = _source(seed=3)
        batches = [src.next_batch(1) for _ in range(10)]
        i = [0]

        def batch_source():
            b = batches[i[0] % 10]
            i[0] += 1
            return b

        sp = _solver_params(snapshot_prefix=str(tmp_path / "snap"))
        solver = PoseSolver(sp, TINY_MODEL, batch_source,
                            handle_signals=False, log=lambda *_: None)
        ckpt = None
        for it in range(n_iters):
            solver.step(1)
            if restore_at is not None and it + 1 == restore_at:
                ckpt = solver.snapshot()
        return solver, ckpt, batch_source

    straight, _, _ = run(5)

    # train 3, snapshot, new solver restores and continues with same batches
    solver_a, ckpt, _ = run(3, restore_at=3)
    src = _source(seed=3)
    batches = [src.next_batch(1) for _ in range(10)]
    i = [3]

    def batch_source_resumed():
        b = batches[i[0] % 10]
        i[0] += 1
        return b

    sp = _solver_params(snapshot_prefix=str(tmp_path / "snap2"))
    resumed = PoseSolver(sp, TINY_MODEL, batch_source_resumed,
                         handle_signals=False, log=lambda *_: None)
    resumed.restore(ckpt)
    assert resumed.iter == 3
    resumed.step(2)

    flat_s = jax.tree_util.tree_leaves(straight.net_params)
    flat_r = jax.tree_util.tree_leaves(resumed.net_params)
    for a, b in zip(flat_s, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


def test_checkpoint_roundtrip(tmp_path):
    params = {"layer": {"w": jnp.ones((2, 3)), "b": jnp.zeros((3,))}}
    state = {"iter": jnp.asarray(7, jnp.int32),
             "history": {"layer": {"w": jnp.full((2, 3), 0.5), "b": jnp.zeros((3,))}}}
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, params, state)
    p2, s2 = load_checkpoint(path)
    assert int(s2["iter"]) == 7
    np.testing.assert_array_equal(np.asarray(p2["layer"]["w"]), np.ones((2, 3)))
    np.testing.assert_array_equal(np.asarray(s2["history"]["layer"]["w"]), 0.5 * np.ones((2, 3)))


def test_prefetcher():
    calls = [0]

    def make():
        calls[0] += 1
        return {"x": np.full((2, 2), calls[0], np.float32)}

    pf = Prefetcher(make, depth=3)
    a = pf.get()
    b = pf.get()
    assert a["x"][0, 0] != b["x"][0, 0]
    pf.stop()


def test_solver_prototxt_parsing():
    sp = SolverParams.from_prototxt(
        """
        net: "train.prototxt"
        base_lr: 0.005
        lr_policy: "multistep"
        stepvalue: 220000 stepvalue: 320000
        multistep_lr: 0.005 multistep_lr: 0.002 multistep_lr: 0.001
        momentum: 0.9
        weight_decay: 0.0001
        max_iter: 420000
        snapshot: 60000
        snapshot_prefix: "snap/pose"
        display: 20
        iter_size: 1
        type: "SGD"
        """
    )
    assert sp.config.base_lr == 0.005
    assert sp.config.stepvalue == (220000, 320000)
    assert sp.config.stagelr == (0.005, 0.002, 0.001)
    assert sp.max_iter == 420000
    assert sp.net == "train.prototxt" and sp.train_net == ""
    assert sp.resolve_train_net()[0] == "train.prototxt"
    from deepcut_tpu.solver.update_rules import learning_rate
    assert float(learning_rate(sp.config, 300000)) == pytest.approx(0.002)


def test_graph_solver_test_interval(tmp_path):
    """Solver::Test parity (solver.cpp:335-409): at test_interval the TEST-
    phase net (shared `net` file, phase filtering) runs test_iter forwards
    with the LIVE params and logs averaged outputs (incl. Accuracy)."""
    import numpy as np
    from deepcut_tpu.data.lmdb_store import LMDBWriter
    from deepcut_tpu.data.datum import Datum
    from deepcut_tpu.solver.solver import SolverParams, GraphSolver

    db = str(tmp_path / "db")
    rng = np.random.RandomState(0)
    with LMDBWriter(db) as w:
        for i in range(24):
            arr = np.zeros((1, 6, 6), np.uint8)
            cls = i % 2
            arr[0, :, :3 + 3 * cls] = 200  # trivially separable classes
            w.put(f"{i:08d}".encode(), Datum.from_array(arr, cls).encode())
    net_path = tmp_path / "net.prototxt"
    net_path.write_text(f"""
name: "testable"
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
""")
    sp = SolverParams.from_prototxt(f"""
        net: "{net_path}"
        base_lr: 0.3
        momentum: 0.9
        lr_policy: "fixed"
        display: 0
        max_iter: 40
        test_interval: 20
        test_iter: 3
        snapshot: 0
        snapshot_prefix: "{tmp_path}/t"
    """)
    logs = []
    solver = GraphSolver(sp, str(net_path), handle_signals=False,
                         log=logs.append)
    solver.solve()
    final = solver.test()
    assert "accuracy" in final and "loss" in final  # both phases emit loss
    assert final["accuracy"] > 0.9, final
    assert any("Testing net" in l for l in logs)
    assert any("Test net output #" in l and "accuracy" in l for l in logs)


def test_graph_solver_solverstate_restore_equivalence(tmp_path):
    """Snapshot/restore through the reference-format .solverstate +
    .caffemodel pair must continue the exact trajectory (the reference's
    test_gradient_based_solver.cpp snapshot-equivalence pattern)."""
    import glob
    import numpy as np
    import jax.numpy as jnp
    from deepcut_tpu.proto import text_format
    from deepcut_tpu.core.graph import Net
    from deepcut_tpu.solver.solver import SolverParams, GraphSolver

    PROTO = """
    input: "data"
    input_shape { dim: 6 dim: 5 }
    input: "label"
    input_shape { dim: 6 }
    layer { name: "ip" type: "InnerProduct" bottom: "data" top: "ip"
            inner_product_param { num_output: 3
              weight_filler { type: "gaussian" std: 0.2 } } }
    layer { name: "loss" type: "SoftmaxWithLoss" bottom: "ip" bottom: "label" top: "loss" }
    """
    rng = np.random.RandomState(0)
    x = rng.randn(6, 5).astype(np.float32)
    y = rng.randint(0, 3, (6,)).astype(np.int32)

    def make(max_iter):
        sp = SolverParams.from_prototxt(f"""
            base_lr: 0.2
            momentum: 0.9
            lr_policy: "fixed"
            display: 0
            max_iter: {max_iter}
            snapshot: 0
            snapshot_prefix: "{tmp_path}/ss"
        """)
        net = Net(text_format.parse(PROTO), phase="TRAIN", compute_dtype=None)
        s = GraphSolver(sp, net, handle_signals=False, log=lambda *_: None)
        s._next_inputs = lambda: {"data": jnp.asarray(x), "label": jnp.asarray(y)}
        return s

    ref = make(6)
    ref.solve()

    a = make(3)
    a.solve()
    a.snapshot()
    state_path = f"{tmp_path}/ss_iter_3.solverstate"
    assert glob.glob(state_path)

    b = make(6)
    b.restore(state_path)
    assert b.iter == 3
    b.solve()
    for name in ref.net.params:
        for k in ref.net.params[name]:
            np.testing.assert_allclose(
                np.asarray(b.net.params[name][k]),
                np.asarray(ref.net.params[name][k]), rtol=1e-5, atol=1e-6)


def test_graph_solver_iter_size_equivalence():
    """test_gradient_based_solver.cpp's iter_size check: batch 2 with
    iter_size 2 must follow the same trajectory as batch 4 with iter_size 1
    when normalising losses don't depend on batch size (EuclideanLoss sums /
    N, so use momentum-only SGD with matching effective lr scaling... we use
    SoftmaxWithLoss whose VALID normaliser makes iter_size=2 average the two
    half-batch means — matching Caffe's accumulate-then-divide exactly)."""
    import numpy as np
    import jax.numpy as jnp
    from deepcut_tpu.proto import text_format
    from deepcut_tpu.core.graph import Net
    from deepcut_tpu.solver.solver import SolverParams, GraphSolver

    PROTO = """
    input: "data"
    input_shape { dim: %d dim: 5 }
    input: "label"
    input_shape { dim: %d }
    layer { name: "ip" type: "InnerProduct" bottom: "data" top: "ip"
            inner_product_param { num_output: 3
              weight_filler { type: "gaussian" std: 0.2 } } }
    layer { name: "loss" type: "SoftmaxWithLoss" bottom: "ip" bottom: "label" top: "loss" }
    """
    rng = np.random.RandomState(0)
    x = rng.randn(4, 5).astype(np.float32)
    y = rng.randint(0, 3, (4,)).astype(np.int32)

    def run(batch, iter_size):
        sp = SolverParams.from_prototxt(f"""
            base_lr: 0.2
            momentum: 0.9
            lr_policy: "fixed"
            iter_size: {iter_size}
            display: 0
            max_iter: 4
            snapshot: 0
            snapshot_prefix: "/tmp/is"
        """)
        net = Net(text_format.parse(PROTO % (batch, batch)), phase="TRAIN",
                  compute_dtype=None)
        s = GraphSolver(sp, net, handle_signals=False, log=lambda *_: None)
        if iter_size == 1:
            s._next_inputs = lambda: {"data": jnp.asarray(x), "label": jnp.asarray(y)}
        else:
            s._next_inputs = lambda: {
                "data": jnp.asarray(np.stack([x[:2], x[2:]])),
                "label": jnp.asarray(np.stack([y[:2], y[2:]])),
            }
        s.solve()
        return net.params

    p_full = run(4, 1)
    p_accum = run(2, 2)
    # VALID-normalised softmax loss: full-batch grad = mean over 4; accum =
    # (mean over first 2 + mean over last 2) / 2 — identical for equal halves
    for name in p_full:
        for k in p_full[name]:
            np.testing.assert_allclose(np.asarray(p_accum[name][k]),
                                       np.asarray(p_full[name][k]),
                                       rtol=1e-5, atol=1e-6)


def test_eval_fn_hook_runs_on_test_interval():
    """PoseSolver eval_fn: the Solver::Step TestAll gate applied to the pose
    stack — called BEFORE the update on test_interval boundaries (including
    iteration 0), receiving the live params and iter; returned strings are
    logged."""
    src = _source()
    batches = [src.next_batch(1) for _ in range(3)]
    i = [0]

    def batch_source():
        b = batches[i[0] % 3]
        i[0] += 1
        return b

    calls = []
    lines = []

    def eval_fn(params, it):
        # live params arrive: they must differ from init once trained
        calls.append((it, jax.tree_util.tree_reduce(
            lambda a, b: a + float(jnp.sum(jnp.abs(b))), params, 0.0)))
        return f"PCKh@0.5 = {0.5 + 0.1 * len(calls):.2f}"

    import dataclasses
    sp = dataclasses.replace(_solver_params(max_iter=5), test_interval=2)
    solver = PoseSolver(sp, TINY_MODEL, batch_source, eval_fn=eval_fn,
                        handle_signals=False, log=lines.append)
    solver.step(5)
    assert [it for it, _ in calls] == [0, 2, 4]
    # params evolve between calls (the hook sees the LIVE weights)
    sums = [s for _, s in calls]
    assert sums[0] != sums[1] != sums[2]
    assert any("Test net output: PCKh@0.5 = 0.60" in ln for ln in lines)
    assert any("Iteration 2, Testing net" in ln for ln in lines)


def test_signal_effects_configurable():
    """SignalHandler maps SIGINT/SIGHUP to stop/snapshot/none like
    tools/caffe.cpp GetRequestedAction (which rejects anything else)."""
    import os
    import signal

    from deepcut_tpu.solver.solver import SignalHandler

    prev_int = signal.getsignal(signal.SIGINT)
    prev_hup = signal.getsignal(signal.SIGHUP)
    try:
        h = SignalHandler(sigint_effect="snapshot", sighup_effect="none")
        os.kill(os.getpid(), signal.SIGINT)
        assert h.snapshot_requested and not h.stop_requested
        os.kill(os.getpid(), signal.SIGHUP)  # none: both flags unchanged
        assert h.snapshot_requested and not h.stop_requested

        h2 = SignalHandler(sigint_effect="none", sighup_effect="stop")
        os.kill(os.getpid(), signal.SIGINT)
        assert not h2.stop_requested and not h2.snapshot_requested
        os.kill(os.getpid(), signal.SIGHUP)
        assert h2.stop_requested
    finally:
        signal.signal(signal.SIGINT, prev_int)
        signal.signal(signal.SIGHUP, prev_hup)

    with pytest.raises(ValueError, match="Invalid signal effect"):
        SignalHandler(enable=False, sigint_effect="pause")
