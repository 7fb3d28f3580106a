"""Mesh parallelism: the full sharded train step on an 8-virtual-device CPU
mesh, via scrubbed-env subprocess (see conftest). Covers what the reference
never tested (SURVEY §4: P2PSync had zero multi-GPU tests)."""

import pytest


def test_dryrun_multichip_8(run_in_cpu_mesh):
    out = run_in_cpu_mesh(
        "import __graft_entry__ as g; g.dryrun_multichip(8)", n_devices=8)
    assert "dryrun_multichip ok: 8 devices" in out


def test_dp_matches_single_device(run_in_cpu_mesh):
    """Data-parallel gradients over the mesh must equal single-device
    gradients on the same global batch (the P2PSync correctness contract:
    tree-reduced grads == sum of per-GPU grads / N)."""
    code = """
import numpy as np, jax, jax.numpy as jnp
from deepcut_tpu.models.resnet import DeeperCutConfig, init_params
from deepcut_tpu.models.train import loss_fn
from deepcut_tpu.parallel.mesh import make_mesh, shard_batch
cfg = DeeperCutConfig(depths=(1,1,1,1), stage_widths=(4,4,8,8), num_joints=4,
                      pairwise=False, compute_dtype=jnp.float32)
params = init_params(jax.random.PRNGKey(0), cfg)
n, h, w = 4, 32, 32
key = jax.random.PRNGKey(1)
batch = {
  'image': jax.random.normal(key, (n, h, w, 3)),
  'part_score_targets': jnp.zeros((n, 4, 4, 4)).at[:, 1, 1, :].set(1.0),
  'part_score_weights': jnp.ones((n, 4, 4, 4)),
  'locref_targets': jnp.zeros((n, 4, 4, 8)),
  'locref_weights': jnp.ones((n, 4, 4, 8)),
}
grad_fn = jax.grad(lambda p, b: loss_fn(p, b, cfg)[0])
g_single = grad_fn(params, batch)
mesh = make_mesh(4, spatial=1)
with mesh:
    sharded = shard_batch(mesh, batch)
    g_mesh = jax.jit(grad_fn)(params, sharded)
flat_a = jax.tree_util.tree_leaves(g_single)
flat_b = jax.tree_util.tree_leaves(g_mesh)
for a, b in zip(flat_a, flat_b):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-5, atol=1e-6)
print('DP-GRADS-MATCH')
"""
    out = run_in_cpu_mesh(code, n_devices=4)
    assert "DP-GRADS-MATCH" in out


def test_spatial_sharding_matches(run_in_cpu_mesh):
    """Spatially sharded forward (H over 'spatial') == unsharded forward —
    XLA's halo exchange must be transparent."""
    code = """
import numpy as np, jax, jax.numpy as jnp
from deepcut_tpu.models.resnet import DeeperCutConfig, init_params, forward
from deepcut_tpu.parallel.mesh import make_mesh, batch_sharding
cfg = DeeperCutConfig(depths=(1,1,1,1), stage_widths=(4,4,8,8), num_joints=4,
                      pairwise=False, compute_dtype=jnp.float32)
params = init_params(jax.random.PRNGKey(0), cfg)
x = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 48, 3))
ref = forward(params, x, cfg)['fc_pose']
mesh = make_mesh(8, spatial=4)
with mesh:
    xs = jax.device_put(x, batch_sharding(mesh))
    got = jax.jit(lambda p, a: forward(p, a, cfg)['fc_pose'])(params, xs)
np.testing.assert_allclose(np.asarray(ref), np.asarray(got), rtol=2e-5, atol=2e-5)
print('SPATIAL-MATCH')
"""
    out = run_in_cpu_mesh(code, n_devices=8)
    assert "SPATIAL-MATCH" in out


def test_mesh_sharded_estimator_matches(run_in_cpu_mesh):
    """PoseEstimator with a spatial mesh: HD full-frame sharded scoremaps
    equal the single-device computation (BASELINE config 5 mechanism)."""
    code = """
import numpy as np, jax, jax.numpy as jnp
from deepcut_tpu.models.resnet import DeeperCutConfig, init_params
from deepcut_tpu.pose.estimate import PoseEstimator
from deepcut_tpu.parallel.mesh import make_mesh
cfg = DeeperCutConfig(depths=(1,1,1,1), stage_widths=(4,4,8,8), num_joints=3,
                      compute_dtype=jnp.float32)
params = init_params(jax.random.PRNGKey(0), cfg)
# canvas height divisible by spatial*stride (192 % 32 == 0): sharded == plain
img = np.random.RandomState(0).randint(0, 255, (192, 240, 3), np.uint8)
plain = PoseEstimator(params, cfg, folded=False)
mesh = make_mesh(4, spatial=4)
with mesh:
    sharded = PoseEstimator(params, cfg, folded=False, mesh=mesh)
    sm_s, loc_s = sharded.scoremaps(img)
    # non-divisible height: zero-row padding may perturb only the bottom
    # receptive-field band (documented contract)
    img2 = np.random.RandomState(1).randint(0, 255, (200, 240, 3), np.uint8)
    sm2_s, _ = sharded.scoremaps(img2)
sm_p, loc_p = plain.scoremaps(img)
np.testing.assert_allclose(sm_s, sm_p, rtol=2e-4, atol=2e-5)
np.testing.assert_allclose(loc_s, loc_p, rtol=2e-4, atol=2e-4)
sm2_p, _ = plain.scoremaps(img2)
np.testing.assert_allclose(sm2_s[:14], sm2_p[:14], rtol=2e-4, atol=2e-5)
# mesh raises the tiling threshold: a 4x taller frame stays un-tiled
mh, mw = sharded._max_dims()
assert mh == 4 * sharded.max_size and mw == sharded.max_size
print('MESH-ESTIMATOR-MATCH')
"""
    out = run_in_cpu_mesh(code, n_devices=4)
    assert "MESH-ESTIMATOR-MATCH" in out


def test_graph_solver_mesh_dp_matches_single_device(run_in_cpu_mesh):
    """GraphSolver with a 4-device 'data' mesh must follow the exact same
    trajectory as single-device training (gradient all-reduce == full-batch
    gradient) — the generic-prototxt analog of P2PSync (parallel.cpp)."""
    run_in_cpu_mesh("""
import numpy as np
import jax, jax.numpy as jnp
from deepcut_tpu.proto import text_format
from deepcut_tpu.core.graph import Net
from deepcut_tpu.solver.solver import SolverParams, GraphSolver
from deepcut_tpu.parallel.mesh import make_mesh

PROTO = '''
input: "data"
input_shape { dim: 8 dim: 12 }
input: "label"
input_shape { dim: 8 }
layer { name: "ip1" type: "InnerProduct" bottom: "data" top: "ip1"
        inner_product_param { num_output: 16 weight_filler { type: "xavier" } } }
layer { name: "relu1" type: "ReLU" bottom: "ip1" top: "ip1" }
layer { name: "ip2" type: "InnerProduct" bottom: "ip1" top: "ip2"
        inner_product_param { num_output: 4 weight_filler { type: "xavier" } } }
layer { name: "loss" type: "SoftmaxWithLoss" bottom: "ip2" bottom: "label" top: "loss" }
'''
SOLVER = '''
base_lr: 0.1
momentum: 0.9
weight_decay: 0.0005
lr_policy: "fixed"
display: 0
max_iter: 5
snapshot: 0
snapshot_prefix: "/tmp/dp"
'''
rng = np.random.RandomState(0)
x = rng.randn(8, 12).astype(np.float32)
y = rng.randint(0, 4, (8,)).astype(np.int32)

def train(mesh):
    net = Net(text_format.parse(PROTO), phase="TRAIN", compute_dtype=None)
    sp = SolverParams.from_prototxt(SOLVER)
    s = GraphSolver(sp, net, mesh=mesh, handle_signals=False, log=lambda *_: None)
    s._next_inputs = lambda: {"data": jnp.asarray(x), "label": jnp.asarray(y)}
    s.solve()
    return net.params

p1 = train(None)
p2 = train(make_mesh(4, spatial=1))
for name in p1:
    for k in p1[name]:
        np.testing.assert_allclose(np.asarray(p1[name][k]), np.asarray(p2[name][k]),
                                   rtol=1e-5, atol=1e-6)
print("graph mesh DP == single device")
""")


def test_pose_solver_mesh_dp_matches_single_device(run_in_cpu_mesh):
    """PoseSolver(mesh=...) must shard the batch and follow the single-device
    trajectory exactly (it previously accepted mesh and silently ignored it)."""
    run_in_cpu_mesh("""
import numpy as np
import jax, jax.numpy as jnp
from deepcut_tpu.models.resnet import DeeperCutConfig
from deepcut_tpu.solver.solver import SolverParams, PoseSolver
from deepcut_tpu.parallel.mesh import make_mesh

cfg = DeeperCutConfig(depths=(1, 1, 1, 1), stage_widths=(8, 8, 16, 16),
                      num_joints=3, compute_dtype=jnp.float32)
rng = np.random.RandomState(0)
n, h, w = 4, 32, 32
hh, ww, J = h // 8, w // 8, cfg.num_joints
batch = {
    "image": rng.randn(n, h, w, 3).astype(np.float32) * 0.3,
    "part_score_targets": np.zeros((n, hh, ww, J), np.float32),
    "part_score_weights": np.ones((n, hh, ww, J), np.float32),
    "locref_targets": np.zeros((n, hh, ww, 2 * J), np.float32),
    "locref_weights": np.ones((n, hh, ww, 2 * J), np.float32),
    "pairwise_targets": np.zeros((n, hh, ww, cfg.pairwise_channels), np.float32),
    "pairwise_weights": np.ones((n, hh, ww, cfg.pairwise_channels), np.float32),
}
batch["part_score_targets"][:, 1, 1, :] = 1.0

SOLVER = '''
base_lr: 0.02
momentum: 0.9
lr_policy: "fixed"
display: 0
max_iter: 3
snapshot: 0
snapshot_prefix: "/tmp/pdp"
random_seed: 0
'''

def run(mesh):
    sp = SolverParams.from_prototxt(SOLVER)
    s = PoseSolver(sp, cfg, lambda: batch, mesh=mesh,
                   handle_signals=False, log=lambda *_: None)
    s.solve()
    return s.net_params

p1 = run(None)
p2 = run(make_mesh(4, spatial=1))
for name in p1:
    for k in p1[name]:
        np.testing.assert_allclose(np.asarray(p1[name][k]), np.asarray(p2[name][k]),
                                   rtol=1e-5, atol=1e-6)
print("pose solver mesh DP == single device")
""")


def test_graph_solver_mesh_with_iter_size(run_in_cpu_mesh):
    """mesh DP combined with iter_size accumulation: the batch dim (axis 1
    behind the iter_size axis) must be the sharded one; trajectory equals
    the unsharded, un-accumulated full-batch run."""
    run_in_cpu_mesh("""
import numpy as np
import jax, jax.numpy as jnp
from deepcut_tpu.proto import text_format
from deepcut_tpu.core.graph import Net
from deepcut_tpu.solver.solver import SolverParams, GraphSolver
from deepcut_tpu.parallel.mesh import make_mesh

PROTO = '''
input: "data"
input_shape { dim: %d dim: 5 }
input: "label"
input_shape { dim: %d }
layer { name: "ip" type: "InnerProduct" bottom: "data" top: "ip"
        inner_product_param { num_output: 3 weight_filler { type: "xavier" } } }
layer { name: "loss" type: "SoftmaxWithLoss" bottom: "ip" bottom: "label" top: "loss" }
'''
rng = np.random.RandomState(0)
x = rng.randn(8, 5).astype(np.float32)
y = rng.randint(0, 3, (8,)).astype(np.int32)

def run(batch, iter_size, mesh):
    sp = SolverParams.from_prototxt(f'''
        base_lr: 0.2
        momentum: 0.9
        lr_policy: "fixed"
        iter_size: {iter_size}
        display: 0
        max_iter: 3
        snapshot: 0
        snapshot_prefix: "/tmp/mis"
    ''')
    net = Net(text_format.parse(PROTO % (batch, batch)), phase="TRAIN",
              compute_dtype=None)
    s = GraphSolver(sp, net, mesh=mesh, handle_signals=False, log=lambda *_: None)
    if iter_size == 1:
        s._next_inputs = lambda: {"data": jnp.asarray(x), "label": jnp.asarray(y)}
    else:
        s._next_inputs = lambda: {
            "data": jnp.asarray(np.stack([x[:4], x[4:]])),
            "label": jnp.asarray(np.stack([y[:4], y[4:]])),
        }
    s.solve()
    return net.params

p_ref = run(8, 1, None)
p_mis = run(4, 2, make_mesh(4, spatial=1))
for name in p_ref:
    for k in p_ref[name]:
        np.testing.assert_allclose(np.asarray(p_mis[name][k]),
                                   np.asarray(p_ref[name][k]),
                                   rtol=1e-5, atol=1e-6)
print("mesh + iter_size == full batch")
""")


def test_2d_mesh_train_step_matches_single_device(run_in_cpu_mesh):
    """A (data=4, spatial=2) mesh (the dryrun's shape) through the full
    train step — image rows genuinely SHARDED over 'spatial' via the
    shard_map path (parallel/spatial.py: explicit halo exchange + psum,
    bypassing the GSPMD weight-grad bug the canary below watches). A
    3-step trajectory (params AND momentum state) must equal
    single-device."""
    code = """
import numpy as np, jax, jax.numpy as jnp
from deepcut_tpu.models.resnet import DeeperCutConfig, init_params
from deepcut_tpu.parallel.mesh import make_mesh
from deepcut_tpu.parallel.train_step import make_train_step
from deepcut_tpu.solver.update_rules import SolverConfig, init_state
cfg = DeeperCutConfig(depths=(1,1,1,1), stage_widths=(4,4,8,8), num_joints=4,
                      pairwise=False, compute_dtype=jnp.float32)
scfg = SolverConfig(solver_type='SGD', base_lr=0.05, momentum=0.9,
                    weight_decay=0.0)
params = init_params(jax.random.PRNGKey(0), cfg)
n, h, w = 4, 64, 32   # H = 16 * spatial * 2: the spatial shape contract
gh, gw = h // 8, w // 8
key = jax.random.PRNGKey(1)
def make_batch(k):
    kk = jax.random.PRNGKey(k)
    return {
      'image': jax.random.normal(kk, (n, h, w, 3)),
      'part_score_targets': jnp.zeros((n, gh, gw, 4)).at[:, 1, 1, :].set(1.0),
      'part_score_weights': jnp.ones((n, gh, gw, 4)),
      'locref_targets': 0.1 * jax.random.normal(kk, (n, gh, gw, 8)),
      'locref_weights': jnp.ones((n, gh, gw, 8)),
    }
state1 = init_state(scfg, params)
step1 = make_train_step(cfg, scfg, None, donate=False)
p1, s1 = params, state1
for k in range(3):
    p1, s1, m1 = step1(p1, s1, make_batch(k))
mesh = make_mesh(8, spatial=2)   # (data=4, spatial=2), the dryrun shape
with mesh:
    step2 = make_train_step(cfg, scfg, mesh, donate=False)
    p2, s2 = params, init_state(scfg, params)
    for k in range(3):
        p2, s2, m2 = step2(p2, s2, make_batch(k))
for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-6)
for a, b in zip(jax.tree_util.tree_leaves(s1), jax.tree_util.tree_leaves(s2)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-6)
assert abs(float(m1['total_loss']) - float(m2['total_loss'])) < 1e-4 * max(1.0, abs(float(m1['total_loss'])))
print('2D-MESH-SPATIAL-TRAIN-MATCH')
"""
    out = run_in_cpu_mesh(code, n_devices=8)
    assert "2D-MESH-SPATIAL-TRAIN-MATCH" in out


def test_spatial_train_step_shape_contract(run_in_cpu_mesh):
    """The shard_map path validates its shape contract with clear errors:
    H not divisible by 16*n_spatial, or too small for the res5 halo."""
    code = """
import jax, jax.numpy as jnp
from deepcut_tpu.models.resnet import DeeperCutConfig, init_params
from deepcut_tpu.parallel.mesh import make_mesh
from deepcut_tpu.parallel.train_step import make_train_step
from deepcut_tpu.solver.update_rules import SolverConfig, init_state
cfg = DeeperCutConfig(depths=(1,1,1,1), stage_widths=(4,4,8,8), num_joints=4,
                      pairwise=False, compute_dtype=jnp.float32)
scfg = SolverConfig(solver_type='SGD', base_lr=0.05)
params = init_params(jax.random.PRNGKey(0), cfg)
state = init_state(scfg, params)
mesh = make_mesh(8, spatial=2)
def batch(h):
    gh = -(-h // 8)
    return {'image': jnp.zeros((4, h, 32, 3)),
            'part_score_targets': jnp.zeros((4, gh, 4, 4)),
            'part_score_weights': jnp.ones((4, gh, 4, 4))}
with mesh:
    step = make_train_step(cfg, scfg, mesh, donate=False)
    for h, frag in ((40, 'divisible'), (32, 'too small')):
        try:
            step(params, state, batch(h))
            raise AssertionError(f'H={h} should have been rejected')
        except ValueError as e:
            assert frag in str(e), (h, str(e))
print('SPATIAL-SHAPE-CONTRACT-OK')
"""
    out = run_in_cpu_mesh(code, n_devices=8)
    assert "SPATIAL-SHAPE-CONTRACT-OK" in out


def test_spatial_sharded_conv_weight_grad_guard(run_in_cpu_mesh):
    """Canary for the upstream XLA SPMD bug that forced spatial TRAINING
    onto the shard_map halo-exchange path (parallel/spatial.py): with an
    activation REPLICATED over one mesh axis and spatially sharded over
    another, the GSPMD conv WEIGHT gradient comes back multiplied by the
    replicated axis size whenever halo exchange is involved (3x3 pad 1;
    1x1 is exact; forward values are exact). jax 0.9 CPU reproduces a clean
    4.0x ratio. If this starts XPASSing, the upstream fix landed — the
    annotation-only GSPMD path becomes viable again and could replace the
    hand-rolled halos."""
    code = """
import numpy as np, jax, jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P, Mesh
devs = np.array(jax.devices())
x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 16, 3))
w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, 4)) * 0.1
def f(w, x):
    y = jax.lax.conv_general_dilated(x, w, (1,1), [(1,1),(1,1)],
                                     dimension_numbers=("NHWC","HWIO","NHWC"))
    return jnp.sum(y ** 2)
g0 = np.asarray(jax.jit(jax.grad(f))(w, x))
mesh = Mesh(devs.reshape(4, 2), ("data", "spatial"))
bsh = NamedSharding(mesh, P(None, "spatial"))
with mesh:
    g = np.asarray(jax.jit(jax.grad(f), in_shardings=(
        NamedSharding(mesh, P()), bsh))(w, jax.device_put(x, bsh)))
ratio = float(np.mean(g / g0))
if abs(ratio - 1.0) < 1e-3:
    print('UPSTREAM-FIXED')   # spatial train sharding can come back
else:
    assert abs(ratio - 4.0) < 1e-2, ratio  # the known inflation factor
    print('BUG-PRESENT ratio=%.3f' % ratio)
"""
    out = run_in_cpu_mesh(code, n_devices=8)
    if "UPSTREAM-FIXED" in out:
        pytest.fail(
            "the upstream XLA spatial conv-weight-grad fix landed: "
            "re-enable spatial batch sharding in parallel/train_step.py "
            "(and drop this canary)")
    assert "BUG-PRESENT" in out


def test_pose_solver_spatial_mesh_matches_single_device(run_in_cpu_mesh):
    """PoseSolver with a (data=4, spatial=2) mesh — the CLI
    `train -mesh 8 -spatial 2` path — must follow the single-device
    trajectory (params after 2 steps)."""
    code = """
import numpy as np, jax, jax.numpy as jnp
from deepcut_tpu.models.resnet import DeeperCutConfig, init_params
from deepcut_tpu.parallel.mesh import make_mesh
from deepcut_tpu.solver.solver import PoseSolver, SolverParams
cfg = DeeperCutConfig(depths=(1,1,1,1), stage_widths=(4,4,8,8), num_joints=4,
                      pairwise=False, compute_dtype=jnp.float32)
n, h, w = 4, 64, 32
gh, gw = h // 8, w // 8
state = {'k': 0}
def batch_source():
    kk = jax.random.PRNGKey(state['k']); state['k'] += 1
    return {
      'image': np.asarray(jax.random.normal(kk, (n, h, w, 3))),
      'part_score_targets': np.zeros((n, gh, gw, 4), np.float32),
      'part_score_weights': np.ones((n, gh, gw, 4), np.float32),
      'locref_targets': np.zeros((n, gh, gw, 8), np.float32),
      'locref_weights': np.ones((n, gh, gw, 8), np.float32),
    }
sp = SolverParams.from_prototxt('''
    base_lr: 0.05 momentum: 0.9 lr_policy: "fixed" display: 0 max_iter: 10
    snapshot: 0 snapshot_prefix: "/tmp/ps" random_seed: 3
''')
init = init_params(jax.random.PRNGKey(3), cfg)
s1 = PoseSolver(sp, cfg, batch_source, net_params=jax.tree_util.tree_map(jnp.copy, init),
                handle_signals=False, log=lambda *_: None)
s1.step(2)
state['k'] = 0
mesh = make_mesh(8, spatial=2)
with mesh:
    s2 = PoseSolver(sp, cfg, batch_source, net_params=jax.tree_util.tree_map(jnp.copy, init),
                    mesh=mesh, handle_signals=False, log=lambda *_: None)
    s2.step(2)
for a, b in zip(jax.tree_util.tree_leaves(s1.net_params),
                jax.tree_util.tree_leaves(s2.net_params)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
print('POSE-SOLVER-SPATIAL-MATCH')
"""
    out = run_in_cpu_mesh(code, n_devices=8)
    assert "POSE-SOLVER-SPATIAL-MATCH" in out


def test_spatial4_train_step_matches_single_device(run_in_cpu_mesh):
    """(data=2, spatial=4): four-shard halo chains (2-row locals at res4/5,
    boundary shards on both ends) must still reproduce the single-device
    trajectory."""
    code = """
import numpy as np, jax, jax.numpy as jnp
from deepcut_tpu.models.resnet import DeeperCutConfig, init_params
from deepcut_tpu.parallel.mesh import make_mesh
from deepcut_tpu.parallel.train_step import make_train_step
from deepcut_tpu.solver.update_rules import SolverConfig, init_state
cfg = DeeperCutConfig(depths=(1,1,1,1), stage_widths=(4,4,8,8), num_joints=4,
                      pairwise=False, compute_dtype=jnp.float32)
scfg = SolverConfig(solver_type='SGD', base_lr=0.05, momentum=0.9,
                    weight_decay=0.0)
params = init_params(jax.random.PRNGKey(0), cfg)
n, h, w = 2, 128, 32   # H = 32 * spatial: minimum of the shape contract
gh, gw = h // 8, w // 8
kk = jax.random.PRNGKey(5)
batch = {
  'image': jax.random.normal(kk, (n, h, w, 3)),
  'part_score_targets': jnp.zeros((n, gh, gw, 4)).at[:, 2, 1, :].set(1.0),
  'part_score_weights': jnp.ones((n, gh, gw, 4)),
  'locref_targets': 0.1 * jax.random.normal(kk, (n, gh, gw, 8)),
  'locref_weights': jnp.ones((n, gh, gw, 8)),
}
state = init_state(scfg, params)
p1, s1, m1 = make_train_step(cfg, scfg, None, donate=False)(params, state, batch)
mesh = make_mesh(8, spatial=4)
with mesh:
    p2, s2, m2 = make_train_step(cfg, scfg, mesh, donate=False)(params, state, batch)
for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-6)
assert abs(float(m1['total_loss']) - float(m2['total_loss'])) < 1e-4 * max(1.0, abs(float(m1['total_loss'])))
print('SPATIAL4-TRAIN-MATCH')
"""
    out = run_in_cpu_mesh(code, n_devices=8)
    assert "SPATIAL4-TRAIN-MATCH" in out


def test_pose_solver_spatial_mesh_iter_size_matches_single_device(run_in_cpu_mesh):
    """iter_size host accumulation composed with the spatial shard_map
    gradient path: PoseSolver(iter_size=2) on a (data=2, spatial=2) mesh
    follows the single-device iter_size=2 trajectory."""
    code = """
import numpy as np, jax, jax.numpy as jnp
from deepcut_tpu.models.resnet import DeeperCutConfig, init_params
from deepcut_tpu.parallel.mesh import make_mesh
from deepcut_tpu.solver.solver import PoseSolver, SolverParams
cfg = DeeperCutConfig(depths=(1,1,1,1), stage_widths=(4,4,8,8), num_joints=4,
                      pairwise=False, compute_dtype=jnp.float32)
n, h, w = 2, 64, 32
gh, gw = h // 8, w // 8
state = {'k': 0}
def batch_source():
    kk = jax.random.PRNGKey(state['k']); state['k'] += 1
    return {
      'image': np.asarray(jax.random.normal(kk, (n, h, w, 3))),
      'part_score_targets': np.zeros((n, gh, gw, 4), np.float32),
      'part_score_weights': np.ones((n, gh, gw, 4), np.float32),
      'locref_targets': np.zeros((n, gh, gw, 8), np.float32),
      'locref_weights': np.ones((n, gh, gw, 8), np.float32),
    }
sp = SolverParams.from_prototxt('''
    base_lr: 0.05 momentum: 0.9 lr_policy: "fixed" iter_size: 2 display: 0
    max_iter: 10 snapshot: 0 snapshot_prefix: "/tmp/psi" random_seed: 7
''')
init = init_params(jax.random.PRNGKey(7), cfg)
s1 = PoseSolver(sp, cfg, batch_source, net_params=jax.tree_util.tree_map(jnp.copy, init),
                handle_signals=False, log=lambda *_: None)
s1.step(2)
state['k'] = 0
mesh = make_mesh(4, spatial=2)   # (data=2, spatial=2)
with mesh:
    s2 = PoseSolver(sp, cfg, batch_source, net_params=jax.tree_util.tree_map(jnp.copy, init),
                    mesh=mesh, handle_signals=False, log=lambda *_: None)
    s2.step(2)
for a, b in zip(jax.tree_util.tree_leaves(s1.net_params),
                jax.tree_util.tree_leaves(s2.net_params)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
print('POSE-SOLVER-SPATIAL-ITERSIZE-MATCH')
"""
    out = run_in_cpu_mesh(code, n_devices=4)
    assert "POSE-SOLVER-SPATIAL-ITERSIZE-MATCH" in out


def test_graph_spatial_train_step_matches_single_device(run_in_cpu_mesh):
    """GENERIC prototxt under a 2-D mesh: the graph-engine plan splitter
    shards the conv/pool prefix over 'spatial' (halo exchange), gathers at
    the InnerProduct boundary, and psums the loss normalisers — 3-step
    trajectory equals single-device."""
    code = """
import numpy as np, jax, jax.numpy as jnp
from deepcut_tpu.core.graph import Net
from deepcut_tpu.proto import text_format
from deepcut_tpu.parallel.mesh import make_mesh
from deepcut_tpu.parallel.graph_spatial import split_plan
from deepcut_tpu.solver.update_rules import SolverConfig, init_state

PROTO = '''
input: "data"  input_shape { dim: 4 dim: 3 dim: 32 dim: 32 }
input: "label" input_shape { dim: 4 }
layer { name: "conv1" type: "Convolution" bottom: "data" top: "conv1"
  convolution_param { num_output: 8 kernel_size: 3 pad: 1
    weight_filler { type: "xavier" } bias_filler { type: "constant" } } }
layer { name: "relu1" type: "ReLU" bottom: "conv1" top: "conv1" }
layer { name: "pool1" type: "Pooling" bottom: "conv1" top: "pool1"
  pooling_param { pool: MAX kernel_size: 2 stride: 2 } }
layer { name: "conv2" type: "Convolution" bottom: "pool1" top: "conv2"
  convolution_param { num_output: 16 kernel_size: 3 pad: 1
    weight_filler { type: "xavier" } bias_filler { type: "constant" } } }
layer { name: "relu2" type: "ReLU" bottom: "conv2" top: "conv2" }
layer { name: "ip" type: "InnerProduct" bottom: "conv2" top: "ip"
  inner_product_param { num_output: 10 weight_filler { type: "xavier" } } }
layer { name: "loss" type: "SoftmaxWithLoss" bottom: "ip" bottom: "label"
  top: "loss" }
'''
scfg = SolverConfig(solver_type='SGD', base_lr=0.05, momentum=0.9,
                    weight_decay=0.0005)
rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(4, 32, 32, 3).astype(np.float32))  # NHWC
y = jnp.asarray(rng.randint(0, 10, (4,)).astype(np.int32))
def run(mesh):
    net = Net(text_format.parse(PROTO), phase='TRAIN', compute_dtype=None)
    step = net.make_train_step(scfg, mesh=mesh)
    p, s = net.params, init_state(scfg, net.params)
    for _ in range(3):
        p, s, loss = step(p, s, {'data': x, 'label': y})
    return p, float(loss), net
p1, l1, _ = run(None)
mesh = make_mesh(8, spatial=2)
with mesh:
    p2, l2, net2 = run(mesh)
# the splitter genuinely sharded the conv/pool prefix (5 layers), with the
# boundary at the InnerProduct
shapes = {'data': (4, 32, 32, 3), 'label': (4,)}
import jax as _j
abstract = { 'data': _j.ShapeDtypeStruct((4,32,32,3), jnp.float32),
             'label': _j.ShapeDtypeStruct((4,), jnp.int32) }
blobs = _j.eval_shape(lambda p, i: net2._execute(p, i), net2.params, abstract)
bs = dict(shapes); bs.update({k: tuple(v.shape) for k, v in blobs.items()})
boundary, infos, s_in, gather = split_plan(net2, bs, 2)
assert boundary == 5, boundary
assert s_in == {'data'}, s_in
assert gather == ['conv2'], gather
for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-6)
assert abs(l1 - l2) < 1e-4 * max(1.0, abs(l1))
print('GRAPH-SPATIAL-TRAIN-MATCH')
"""
    out = run_in_cpu_mesh(code, n_devices=8)
    assert "GRAPH-SPATIAL-TRAIN-MATCH" in out


def test_graph_spatial_deepercut_style_prototxt(run_in_cpu_mesh):
    """A reference-style prototxt (strided conv1 + frozen BN/Scale + ceil
    pool + residual Eltwise block + fork losses SoftmaxWithLossVec/SmoothL1)
    trains spatially sharded through the graph engine, trajectory-equal to
    single-device; the boundary lands at the first loss layer."""
    code = """
import numpy as np, jax, jax.numpy as jnp
from deepcut_tpu.core.graph import Net
from deepcut_tpu.proto import text_format
from deepcut_tpu.parallel.mesh import make_mesh
from deepcut_tpu.solver.update_rules import SolverConfig, init_state

PROTO = '''
input: "data"   input_shape { dim: 4 dim: 3 dim: 64 dim: 32 }
input: "targets" input_shape { dim: 4 dim: 5 dim: 16 dim: 8 }
input: "loc_t"  input_shape { dim: 4 dim: 10 dim: 16 dim: 8 }
input: "loc_w"  input_shape { dim: 4 dim: 10 dim: 16 dim: 8 }
layer { name: "conv1" type: "Convolution" bottom: "data" top: "conv1"
  convolution_param { num_output: 8 kernel_size: 7 stride: 2 pad: 3
    weight_filler { type: "gaussian" std: 0.1 } } }
layer { name: "bn1" type: "BatchNorm" bottom: "conv1" top: "conv1"
  batch_norm_param { use_global_stats: true } }
layer { name: "sc1" type: "Scale" bottom: "conv1" top: "conv1"
  scale_param { bias_term: true } }
layer { name: "relu1" type: "ReLU" bottom: "conv1" top: "conv1" }
layer { name: "pool1" type: "Pooling" bottom: "conv1" top: "pool1"
  pooling_param { pool: MAX kernel_size: 3 stride: 2 } }
layer { name: "br1" type: "Convolution" bottom: "pool1" top: "br1"
  convolution_param { num_output: 16 kernel_size: 1
    weight_filler { type: "gaussian" std: 0.1 } } }
layer { name: "br2a" type: "Convolution" bottom: "pool1" top: "br2a"
  convolution_param { num_output: 8 kernel_size: 1
    weight_filler { type: "gaussian" std: 0.1 } } }
layer { name: "r2a" type: "ReLU" bottom: "br2a" top: "br2a" }
layer { name: "br2b" type: "Convolution" bottom: "br2a" top: "br2b"
  convolution_param { num_output: 8 kernel_size: 3 pad: 2 dilation: 2
    weight_filler { type: "gaussian" std: 0.1 } } }
layer { name: "r2b" type: "ReLU" bottom: "br2b" top: "br2b" }
layer { name: "br2c" type: "Convolution" bottom: "br2b" top: "br2c"
  convolution_param { num_output: 16 kernel_size: 1
    weight_filler { type: "gaussian" std: 0.1 } } }
layer { name: "res" type: "Eltwise" bottom: "br1" bottom: "br2c" top: "res" }
layer { name: "relur" type: "ReLU" bottom: "res" top: "res" }
layer { name: "score" type: "Convolution" bottom: "res" top: "score"
  convolution_param { num_output: 5 kernel_size: 1
    weight_filler { type: "gaussian" std: 0.1 } } }
layer { name: "locref" type: "Convolution" bottom: "res" top: "locref"
  convolution_param { num_output: 10 kernel_size: 1
    weight_filler { type: "gaussian" std: 0.1 } } }
layer { name: "loss_parts" type: "SoftmaxWithLossVec"
  bottom: "score" bottom: "targets" top: "loss_parts"
  softmax_with_loss_vec_param { cross_entropy: true } }
layer { name: "loss_loc" type: "SmoothL1Loss"
  bottom: "locref" bottom: "loc_t" bottom: "loc_w" top: "loss_loc" }
'''
scfg = SolverConfig(solver_type='SGD', base_lr=0.02, momentum=0.9,
                    weight_decay=0.0)
rng = np.random.RandomState(3)
inputs = {
  'data': jnp.asarray(rng.randn(4, 64, 32, 3).astype(np.float32)),   # NHWC
  'targets': jnp.asarray((rng.rand(4, 16, 8, 5) > 0.9).astype(np.float32)),
  'loc_t': jnp.asarray(0.2 * rng.randn(4, 16, 8, 10).astype(np.float32)),
  'loc_w': jnp.asarray((rng.rand(4, 16, 8, 10) > 0.5).astype(np.float32)),
}
def run(mesh):
    net = Net(text_format.parse(PROTO), phase='TRAIN', compute_dtype=None)
    step = net.make_train_step(scfg, mesh=mesh)
    p, s = net.params, init_state(scfg, net.params)
    for _ in range(3):
        p, s, loss = step(p, s, dict(inputs))
    return p, float(loss)
p1, l1 = run(None)
mesh = make_mesh(8, spatial=2)
with mesh:
    p2, l2 = run(mesh)
for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-4, atol=1e-6)
assert abs(l1 - l2) < 1e-4 * max(1.0, abs(l1))
print('GRAPH-SPATIAL-DEEPERCUT-MATCH')
"""
    out = run_in_cpu_mesh(code, n_devices=8)
    assert "GRAPH-SPATIAL-DEEPERCUT-MATCH" in out


def test_graph_spatial_mesh_iter_size_matches_single_device(run_in_cpu_mesh):
    """iter_size accumulation INSIDE the spatial shard_map step (scan over
    the leading micro-batch axis, grads summed before the single psum +
    update): trajectory equals the single-device iter_size run."""
    code = """
import numpy as np, jax, jax.numpy as jnp
from deepcut_tpu.proto import text_format
from deepcut_tpu.core.graph import Net
from deepcut_tpu.parallel.mesh import make_mesh
from deepcut_tpu.solver.update_rules import SolverConfig, init_state

PROTO = '''
input: "data"  input_shape { dim: 4 dim: 3 dim: 32 dim: 32 }
input: "label" input_shape { dim: 4 }
layer { name: "c1" type: "Convolution" bottom: "data" top: "c1"
  convolution_param { num_output: 8 kernel_size: 3 pad: 1
    weight_filler { type: "xavier" } } }
layer { name: "r1" type: "ReLU" bottom: "c1" top: "c1" }
layer { name: "p1" type: "Pooling" bottom: "c1" top: "p1"
  pooling_param { pool: MAX kernel_size: 2 stride: 2 } }
layer { name: "ip" type: "InnerProduct" bottom: "p1" top: "ip"
  inner_product_param { num_output: 5 weight_filler { type: "xavier" } } }
layer { name: "loss" type: "SoftmaxWithLoss" bottom: "ip" bottom: "label"
  top: "loss" }
'''
scfg = SolverConfig(solver_type='SGD', base_lr=0.1, momentum=0.9,
                    weight_decay=0.0, iter_size=2)
rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(2, 4, 32, 32, 3).astype(np.float32) * 0.3)
y = jnp.asarray(rng.randint(0, 5, (2, 4)).astype(np.int32))
net = Net(text_format.parse(PROTO), phase='TRAIN', compute_dtype=None)
p0 = jax.tree_util.tree_map(jnp.copy, net.params)

def run(mesh):
    step = net.make_train_step(scfg, mesh=mesh)
    params = jax.tree_util.tree_map(jnp.copy, p0)
    state = init_state(scfg, params)
    for _ in range(2):
        params, state, loss = step(params, state, {'data': x, 'label': y})
    return params, float(loss)

p1, l1 = run(None)
mesh = make_mesh(4, spatial=2)
with mesh:
    p2, l2 = run(mesh)
for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-6)
assert abs(l1 - l2) < 1e-5 * max(1.0, abs(l1))
print('GRAPH-SPATIAL-ITERSIZE-MATCH')
"""
    out = run_in_cpu_mesh(code, n_devices=4)
    assert "GRAPH-SPATIAL-ITERSIZE-MATCH" in out


def test_graph_spatial_mesh_train_batchnorm_matches_single_device(run_in_cpu_mesh):
    """Train-mode BatchNorm under the 2-D mesh: prefix BN (4-D, row-sharded
    — moments psum over BOTH axes) and suffix BN (2-D, after the gather —
    moments psum over 'data') must reproduce the single-device trajectory,
    including the moving-average stat blobs."""
    code = """
import numpy as np, jax, jax.numpy as jnp
from deepcut_tpu.proto import text_format
from deepcut_tpu.core.graph import Net
from deepcut_tpu.parallel.mesh import make_mesh
from deepcut_tpu.solver.update_rules import SolverConfig, init_state

PROTO = '''
input: "data"  input_shape { dim: 4 dim: 3 dim: 32 dim: 32 }
input: "label" input_shape { dim: 4 }
layer { name: "c1" type: "Convolution" bottom: "data" top: "c1"
  convolution_param { num_output: 8 kernel_size: 3 pad: 1
    weight_filler { type: "xavier" } } }
layer { name: "bn1" type: "BatchNorm" bottom: "c1" top: "c1"
  batch_norm_param { moving_average_fraction: 0.9 } }
layer { name: "sc1" type: "Scale" bottom: "c1" top: "c1"
  scale_param { bias_term: true } }
layer { name: "r1" type: "ReLU" bottom: "c1" top: "c1" }
layer { name: "p1" type: "Pooling" bottom: "c1" top: "p1"
  pooling_param { pool: MAX kernel_size: 2 stride: 2 } }
layer { name: "ip" type: "InnerProduct" bottom: "p1" top: "ip"
  inner_product_param { num_output: 6 weight_filler { type: "xavier" } } }
layer { name: "bn2" type: "BatchNorm" bottom: "ip" top: "ip" }
layer { name: "ip2" type: "InnerProduct" bottom: "ip" top: "ip2"
  inner_product_param { num_output: 5 weight_filler { type: "xavier" } } }
layer { name: "loss" type: "SoftmaxWithLoss" bottom: "ip2" bottom: "label"
  top: "loss" }
'''
scfg = SolverConfig(solver_type='SGD', base_lr=0.1, momentum=0.9,
                    weight_decay=0.0)
rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(4, 32, 32, 3).astype(np.float32) * 0.3)
y = jnp.asarray(rng.randint(0, 5, (4,)).astype(np.int32))
net = Net(text_format.parse(PROTO), phase='TRAIN', compute_dtype=None)
p0 = jax.tree_util.tree_map(jnp.copy, net.params)
assert any('bn' in n for n in p0), sorted(p0)

def run(mesh):
    step = net.make_train_step(scfg, mesh=mesh)
    params = jax.tree_util.tree_map(jnp.copy, p0)
    state = init_state(scfg, params)
    for _ in range(2):
        params, state, loss = step(params, state, {'data': x, 'label': y})
    return params, float(loss)

p1, l1 = run(None)
mesh = make_mesh(4, spatial=2)
with mesh:
    p2, l2 = run(mesh)
# boundary sanity: bn1 must actually be in the sharded prefix
from deepcut_tpu.parallel.graph_spatial import split_plan
shapes = {'data': (4, 32, 32, 3), 'label': (4,)}
abstract = {k: jax.ShapeDtypeStruct(v, jnp.float32) for k, v in shapes.items()}
blobs = jax.eval_shape(lambda p, i: net._execute(p, i), p0, abstract)
shapes.update({k: tuple(v.shape) for k, v in blobs.items()})
boundary, _, _, _ = split_plan(net, shapes, 2)
names = [s.name for _, s in net._plan]
assert names.index('bn1') < boundary <= names.index('bn2'), (names, boundary)
for name in sorted(p1):
    for k in p1[name]:
        np.testing.assert_allclose(
            np.asarray(p2[name][k]), np.asarray(p1[name][k]),
            rtol=1e-4, atol=1e-6, err_msg=f'{name}/{k}')  # f32
            # reduction-order noise feeds back through rsqrt into the
            # running stats; observed max 2e-5 relative after 2 steps
assert abs(l1 - l2) < 1e-5 * max(1.0, abs(l1))
print('GRAPH-SPATIAL-BN-MATCH')
"""
    out = run_in_cpu_mesh(code, n_devices=4)
    assert "GRAPH-SPATIAL-BN-MATCH" in out


def test_graph_spatial_mesh_stochastic_layers_match_single_device(run_in_cpu_mesh):
    """Dropout + STOCHASTIC pooling under the 2-D mesh: the first rng layer
    forces the gather boundary, and the suffix draws its random tensors at
    the GLOBAL batch size, slicing local rows (ops/shard_rng.py) with the
    per-layer key folds offset to global plan indices — mask sequences and
    hence trajectories equal the single-device run exactly."""
    code = """
import numpy as np, jax, jax.numpy as jnp
from deepcut_tpu.proto import text_format
from deepcut_tpu.core.graph import Net
from deepcut_tpu.parallel.mesh import make_mesh
from deepcut_tpu.solver.update_rules import SolverConfig, init_state

PROTO = '''
input: "data"  input_shape { dim: 4 dim: 3 dim: 32 dim: 32 }
input: "label" input_shape { dim: 4 }
layer { name: "c1" type: "Convolution" bottom: "data" top: "c1"
  convolution_param { num_output: 8 kernel_size: 3 pad: 1
    weight_filler { type: "xavier" } } }
layer { name: "r1" type: "ReLU" bottom: "c1" top: "c1" }
layer { name: "ps" type: "Pooling" bottom: "c1" top: "ps"
  pooling_param { pool: STOCHASTIC kernel_size: 2 stride: 2 } }
layer { name: "ip" type: "InnerProduct" bottom: "ps" top: "ip"
  inner_product_param { num_output: 16 weight_filler { type: "xavier" } } }
layer { name: "drop" type: "Dropout" bottom: "ip" top: "ip"
  dropout_param { dropout_ratio: 0.4 } }
layer { name: "ip2" type: "InnerProduct" bottom: "ip" top: "ip2"
  inner_product_param { num_output: 5 weight_filler { type: "xavier" } } }
layer { name: "loss" type: "SoftmaxWithLoss" bottom: "ip2" bottom: "label"
  top: "loss" }
'''
scfg = SolverConfig(solver_type='SGD', base_lr=0.1, momentum=0.9,
                    weight_decay=0.0)
rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(4, 32, 32, 3).astype(np.float32) * 0.3)
y = jnp.asarray(rng.randint(0, 5, (4,)).astype(np.int32))
net = Net(text_format.parse(PROTO), phase='TRAIN', compute_dtype=None)
p0 = jax.tree_util.tree_map(jnp.copy, net.params)

def run(mesh):
    step = net.make_train_step(scfg, mesh=mesh)
    params = jax.tree_util.tree_map(jnp.copy, p0)
    state = init_state(scfg, params)
    for _ in range(2):
        params, state, loss = step(params, state, {'data': x, 'label': y})
    return params, float(loss)

p1, l1 = run(None)
mesh = make_mesh(4, spatial=2)
with mesh:
    p2, l2 = run(mesh)
# sanity: the stochastic pool must be the boundary (prefix = c1, r1)
from deepcut_tpu.parallel.graph_spatial import split_plan
shapes = {'data': (4, 32, 32, 3), 'label': (4,)}
abstract = {k: jax.ShapeDtypeStruct(v, jnp.float32) for k, v in shapes.items()}
blobs = jax.eval_shape(lambda p, i: net._execute(p, i), p0, abstract)
shapes.update({k: tuple(v.shape) for k, v in blobs.items()})
boundary, _, _, _ = split_plan(net, shapes, 2)
names = [s.name for _, s in net._plan]
assert boundary == names.index('ps'), (names, boundary)
for name in sorted(p1):
    for k in p1[name]:
        np.testing.assert_allclose(
            np.asarray(p2[name][k]), np.asarray(p1[name][k]),
            rtol=1e-5, atol=1e-6, err_msg=f'{name}/{k}')
assert abs(l1 - l2) < 1e-5 * max(1.0, abs(l1))
print('GRAPH-SPATIAL-RNG-MATCH')
"""
    out = run_in_cpu_mesh(code, n_devices=4)
    assert "GRAPH-SPATIAL-RNG-MATCH" in out


def test_mesh_estimator_int8_matches_unsharded(run_in_cpu_mesh):
    """int8 serving under a spatial mesh: calibration runs unsharded on a
    representative frame; the quantized forward then shards rows like the
    fp path (forward-only, exact halos) — scoremaps equal the meshless
    int8 estimator."""
    code = """
import numpy as np, jax, jax.numpy as jnp
from deepcut_tpu.models.resnet import DeeperCutConfig, init_params
from deepcut_tpu.pose.estimate import PoseEstimator
from deepcut_tpu.parallel.mesh import make_mesh
cfg = DeeperCutConfig(depths=(1,1,1,1), stage_widths=(4,4,8,8), num_joints=3,
                      compute_dtype=jnp.float32)
params = init_params(jax.random.PRNGKey(0), cfg)
for head in ('res5c_up_pose', 'res3d_pose', 'res5c_up_locref', 'res3d_locref'):
    params[head]['w'] = params[head]['w'] * 30.0
calib = np.random.RandomState(2).randint(0, 255, (96, 120, 3), np.uint8)
img = np.random.RandomState(0).randint(0, 255, (192, 240, 3), np.uint8)
plain = PoseEstimator({k: dict(v) for k, v in params.items()}, cfg, folded=False)
plain.quantize_int8(calib)
mesh = make_mesh(4, spatial=4)
with mesh:
    sharded = PoseEstimator({k: dict(v) for k, v in params.items()}, cfg,
                            folded=False, mesh=mesh)
    sharded.quantize_int8(calib)
    assert sharded.is_int8
    sm_s, loc_s = sharded.scoremaps(img)
sm_p, loc_p = plain.scoremaps(img)
np.testing.assert_allclose(sm_s, sm_p, rtol=2e-4, atol=2e-4)
np.testing.assert_allclose(loc_s, loc_p, rtol=2e-4, atol=2e-3)
print('MESH-INT8-MATCH')
"""
    out = run_in_cpu_mesh(code, n_devices=4)
    assert "MESH-INT8-MATCH" in out


def test_graph_spatial_mesh_mean_loss_matches_single_device(run_in_cpu_mesh):
    """Per-sample-MEAN losses (Hinge here) under the 2-D mesh: the generic
    pmean wrapper (graph_spatial._wrap_mean_loss) must reproduce the
    single-device trajectory exactly."""
    code = """
import numpy as np, jax, jax.numpy as jnp
from deepcut_tpu.proto import text_format
from deepcut_tpu.core.graph import Net
from deepcut_tpu.parallel.mesh import make_mesh
from deepcut_tpu.solver.update_rules import SolverConfig, init_state

PROTO = '''
input: "data"  input_shape { dim: 4 dim: 3 dim: 32 dim: 32 }
input: "label" input_shape { dim: 4 }
layer { name: "c1" type: "Convolution" bottom: "data" top: "c1"
  convolution_param { num_output: 8 kernel_size: 3 pad: 1
    weight_filler { type: "xavier" } } }
layer { name: "r1" type: "ReLU" bottom: "c1" top: "c1" }
layer { name: "p1" type: "Pooling" bottom: "c1" top: "p1"
  pooling_param { pool: MAX kernel_size: 2 stride: 2 } }
layer { name: "ip" type: "InnerProduct" bottom: "p1" top: "ip"
  inner_product_param { num_output: 5 weight_filler { type: "xavier" } } }
layer { name: "loss" type: "HingeLoss" bottom: "ip" bottom: "label"
  top: "loss" }
'''
scfg = SolverConfig(solver_type='SGD', base_lr=0.1, momentum=0.9,
                    weight_decay=0.0)
rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(4, 32, 32, 3).astype(np.float32) * 0.3)
y = jnp.asarray(rng.randint(0, 5, (4,)).astype(np.int32))
net = Net(text_format.parse(PROTO), phase='TRAIN', compute_dtype=None)
p0 = jax.tree_util.tree_map(jnp.copy, net.params)

def run(mesh):
    step = net.make_train_step(scfg, mesh=mesh)
    params = jax.tree_util.tree_map(jnp.copy, p0)
    state = init_state(scfg, params)
    for _ in range(2):
        params, state, loss = step(params, state, {'data': x, 'label': y})
    return params, float(loss)

p1, l1 = run(None)
mesh = make_mesh(4, spatial=2)
with mesh:
    p2, l2 = run(mesh)
for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-6)
assert abs(l1 - l2) < 1e-5 * max(1.0, abs(l1))
print('GRAPH-SPATIAL-MEANLOSS-MATCH')
"""
    out = run_in_cpu_mesh(code, n_devices=4)
    assert "GRAPH-SPATIAL-MEANLOSS-MATCH" in out
