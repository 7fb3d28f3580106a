"""Orbax checkpoint backend (solver/orbax_ckpt.py): the TPU-native
snapshot/restore path (SURVEY.md §5 checkpoint/resume — async sharded
checkpoints alongside the reference-interchange .npz/.caffemodel/.solverstate
formats, reference: src/caffe/solver.cpp:411-481).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepcut_tpu.solver import orbax_ckpt
from deepcut_tpu.solver.solver import SolverParams, PoseSolver
from deepcut_tpu.solver.update_rules import SolverConfig

from tests.test_training import TINY_MODEL, _source, _solver_params


def _tree_pair():
    params = {"conv1": {"w": jnp.arange(24, dtype=jnp.float32).reshape(2, 3, 4),
                        "b": jnp.full((4,), 0.5, jnp.float32)},
              "fc": {"w": jnp.ones((4, 2), jnp.bfloat16)}}
    state = {"iter": jnp.asarray(7, jnp.int32),
             "history": {"conv1": {"w": jnp.zeros((2, 3, 4)),
                                   "b": jnp.zeros((4,))},
                         "fc": {"w": jnp.zeros((4, 2), jnp.bfloat16)}}}
    return params, state


def _assert_tree_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        assert np.asarray(x).dtype == np.asarray(y).dtype
        np.testing.assert_array_equal(np.asarray(x, np.float32),
                                      np.asarray(y, np.float32))


def test_roundtrip_with_template(tmp_path):
    params, state = _tree_pair()
    path = str(tmp_path / "ck.orbax")
    orbax_ckpt.save(path, params, state, wait=True)
    p2, s2 = orbax_ckpt.restore(path, like=(params, state))
    _assert_tree_equal(params, p2)
    _assert_tree_equal(state, s2)
    assert int(s2["iter"]) == 7


def test_roundtrip_without_template(tmp_path):
    params, state = _tree_pair()
    path = str(tmp_path / "ck.orbax")
    orbax_ckpt.save(path, params, state, wait=True)
    p2, s2 = orbax_ckpt.restore(path)
    _assert_tree_equal(params, p2)


def test_async_save_then_restore(tmp_path):
    """restore() joins the in-flight background write before reading."""
    params, state = _tree_pair()
    path = str(tmp_path / "ck_async.orbax")
    orbax_ckpt.save(path, params, state, use_async=True, wait=False)
    p2, _ = orbax_ckpt.restore(path, like=(params, state))
    _assert_tree_equal(params, p2)


def test_overwrite_same_iter(tmp_path):
    """Re-snapshotting the same iteration replaces the directory (the
    reference overwrites same-name snapshot files)."""
    params, state = _tree_pair()
    path = str(tmp_path / "ck.orbax")
    orbax_ckpt.save(path, params, state, wait=True)
    params2 = jax.tree_util.tree_map(lambda x: x + 1, params)
    orbax_ckpt.save(path, params2, state, wait=True)
    p2, _ = orbax_ckpt.restore(path, like=(params, state))
    _assert_tree_equal(params2, p2)


def test_restore_onto_mesh(tmp_path):
    """Leaves restore REPLICATED directly onto a (data, spatial) mesh and
    are immediately usable by a jitted step on that mesh."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual platform")
    params, state = _tree_pair()
    path = str(tmp_path / "ck.orbax")
    orbax_ckpt.save(path, params, state, wait=True)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("data", "spatial"))
    p2, s2 = orbax_ckpt.restore(path, like=(params, state), mesh=mesh)
    sh = p2["conv1"]["w"].sharding
    assert isinstance(sh, NamedSharding) and sh.mesh.shape == {"data": 4, "spatial": 2}
    assert sh.spec == P()
    _assert_tree_equal(params, p2)

    @jax.jit
    def bump(t):
        return jax.tree_util.tree_map(lambda x: x * 2, t)

    doubled = bump(p2)
    np.testing.assert_array_equal(np.asarray(doubled["conv1"]["b"]), 1.0)


def test_solver_orbax_snapshot_restore_equivalence(tmp_path):
    """PoseSolver with snapshot_format ORBAX: train 3 + snapshot + restore +
    train 2 == train 5 straight (the reference's snapshot-equivalence
    pattern, test_gradient_based_solver.cpp)."""
    def make(prefix, seed=3):
        src = _source(seed=seed)
        batches = [src.next_batch(1) for _ in range(10)]
        i = [0]

        def batch_source():
            b = batches[i[0] % 10]
            i[0] += 1
            return b

        sp = _solver_params(snapshot_prefix=str(tmp_path / prefix))
        sp.snapshot_format = "ORBAX"
        return PoseSolver(sp, TINY_MODEL, batch_source,
                          handle_signals=False, log=lambda *_: None), i

    straight, _ = make("s")
    straight.step(5)

    half, _ = make("h")
    half.step(3)
    ckpt = half.snapshot(export_caffemodel=False)
    assert ckpt.endswith(".orbax") and orbax_ckpt.is_orbax_checkpoint(ckpt)

    resumed, idx = make("r")
    resumed.restore(ckpt)
    assert resumed.iter == 3
    idx[0] = 3  # replay from the 4th batch like the straight run saw
    resumed.step(2)

    for a, b in zip(jax.tree_util.tree_leaves(straight.net_params),
                    jax.tree_util.tree_leaves(resumed.net_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_graph_solver_prototxt_orbax_roundtrip(tmp_path):
    """`snapshot_format: ORBAX` parsed from a solver PROTOTXT drives the
    GraphSolver snapshot to an orbax directory, and restore(dir) continues
    the exact trajectory (same equivalence pattern as the .solverstate
    test in test_training.py)."""
    from deepcut_tpu.proto import text_format
    from deepcut_tpu.core.graph import Net
    from deepcut_tpu.solver.solver import GraphSolver

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
            snapshot_prefix: "{tmp_path}/gs"
            snapshot_format: ORBAX
        """)
        assert sp.snapshot_format == "ORBAX"
        net = Net(text_format.parse(PROTO), phase="TRAIN", compute_dtype=None)
        s = GraphSolver(sp, net, handle_signals=False, log=lambda *_: None)
        s._next_inputs = lambda: {"data": jnp.asarray(x),
                                  "label": jnp.asarray(y)}
        return s

    ref = make(5)
    ref.solve()

    a = make(3)
    a.solve()
    ckpt = a.snapshot(export_caffemodel=False)
    assert ckpt.endswith(".orbax") and orbax_ckpt.is_orbax_checkpoint(ckpt)

    b = make(5)
    b.restore(ckpt)
    assert b.iter == 3
    b.solve()
    for name in ref.net.params:
        for k in ref.net.params[name]:
            np.testing.assert_allclose(
                np.asarray(b.net.params[name][k]),
                np.asarray(ref.net.params[name][k]), rtol=1e-6, atol=1e-7)
