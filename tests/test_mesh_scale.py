"""Mesh arithmetic past 8 devices (VERDICT round-3 #6).

docs/scaling.md reasons to v5e-256, but rounds 1-3 only ever built 8-device
virtual meshes — multi-shard halo chains at spatial>4 and data>4 gather
arithmetic were extrapolated. These tests build 16- and 32-device virtual
CPU platforms (`run_in_cpu_mesh(n_devices=...)`) and require the spatial
shard_map train step (native model AND generic-prototxt plan splitter) to
stay trajectory-equal to single-device there, plus the driver's own dryrun
at 16.

Reference analog: the multi-GPU scaling claims in
/root/reference/docs/multigpu.md (P2PSync pairs, "best used with 2, 4 or 8
GPUs") — this framework's mesh must out-validate that envelope.

Slow by nature (each case compiles a shard_map program for 16/32 virtual
devices); they ride the normal suite because the per-test cost (~1-2 min)
is in line with the other mesh tests.
"""

import pytest


NATIVE_TRAJECTORY_CODE = """
import numpy as np, jax, jax.numpy as jnp
from deepcut_tpu.models.resnet import DeeperCutConfig, init_params
from deepcut_tpu.parallel.mesh import make_mesh
from deepcut_tpu.parallel.train_step import make_train_step
from deepcut_tpu.solver.update_rules import SolverConfig, init_state

SPATIAL = %(spatial)d
DATA = %(data)d
STEPS = %(steps)d

cfg = DeeperCutConfig(depths=(1,1,1,1), stage_widths=(4,4,8,8), num_joints=4,
                      pairwise=False, compute_dtype=jnp.float32)
scfg = SolverConfig(solver_type='SGD', base_lr=0.05, momentum=0.9,
                    weight_decay=0.0)
params = init_params(jax.random.PRNGKey(0), cfg)
# shape contract: H %% (16*S) == 0 and H >= 32*S -> minimal legal H
n, h, w = DATA, 32 * SPATIAL, 32
gh, gw = h // 8, w // 8
def make_batch(k):
    kk = jax.random.PRNGKey(k)
    return {
      'image': jax.random.normal(kk, (n, h, w, 3)),
      'part_score_targets': jnp.zeros((n, gh, gw, 4)).at[:, 1, 1, :].set(1.0),
      'part_score_weights': jnp.ones((n, gh, gw, 4)),
      'locref_targets': 0.1 * jax.random.normal(kk, (n, gh, gw, 8)),
      'locref_weights': jnp.ones((n, gh, gw, 8)),
    }
step1 = make_train_step(cfg, scfg, None, donate=False)
p1, s1 = params, init_state(scfg, params)
for k in range(STEPS):
    p1, s1, m1 = step1(p1, s1, make_batch(k))
mesh = make_mesh(DATA * SPATIAL, spatial=SPATIAL)
with mesh:
    step2 = make_train_step(cfg, scfg, mesh, donate=False)
    p2, s2 = params, init_state(scfg, params)
    for k in range(STEPS):
        p2, s2, m2 = step2(p2, s2, make_batch(k))
for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-6)
for a, b in zip(jax.tree_util.tree_leaves(s1), jax.tree_util.tree_leaves(s2)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-6)
assert abs(float(m1['total_loss']) - float(m2['total_loss'])) \\
    < 1e-4 * max(1.0, abs(float(m1['total_loss'])))
print('MESH-SCALE-NATIVE-MATCH d=%%d s=%%d' %% (DATA, SPATIAL))
"""


def test_16dev_spatial4_train_matches_single_device(run_in_cpu_mesh):
    """(data=4, spatial=4) on a 16-device virtual platform: 4-shard halo
    chains through every trunk stage, 3-step trajectory == single-device."""
    out = run_in_cpu_mesh(
        NATIVE_TRAJECTORY_CODE % {"spatial": 4, "data": 4, "steps": 3},
        n_devices=16)
    assert "MESH-SCALE-NATIVE-MATCH d=4 s=4" in out


def test_32dev_spatial8_train_matches_single_device(run_in_cpu_mesh):
    """(data=4, spatial=8) on a 32-device virtual platform — the deepest
    halo chain the shape contract admits (res5's 2-row halo on 4-row local
    shards), 2 steps to bound CPU cost."""
    out = run_in_cpu_mesh(
        NATIVE_TRAJECTORY_CODE % {"spatial": 8, "data": 4, "steps": 2},
        n_devices=32)
    assert "MESH-SCALE-NATIVE-MATCH d=4 s=8" in out


def test_32dev_data32_train_matches_single_device(run_in_cpu_mesh):
    """Pure DP at data=32 (scaling.md Recipe 2's shape, scaled down): the
    gradient all-reduce over 32 shards keeps the exact single-device
    trajectory (one sample per shard — the reference's batch-1-per-GPU
    regime, multigpu.md)."""
    out = run_in_cpu_mesh(
        NATIVE_TRAJECTORY_CODE % {"spatial": 1, "data": 32, "steps": 2},
        n_devices=32)
    assert "MESH-SCALE-NATIVE-MATCH d=32 s=1" in out


def test_16dev_graph_spatial_matches_single_device(run_in_cpu_mesh):
    """GENERIC prototxt through the plan splitter on (data=4, spatial=4):
    halo-sharded conv/pool prefix at 4 spatial shards, gather at the
    InnerProduct boundary, 3-step trajectory == single-device."""
    code = """
import numpy as np, jax, jax.numpy as jnp
from deepcut_tpu.core.graph import Net
from deepcut_tpu.proto import text_format
from deepcut_tpu.parallel.mesh import make_mesh
from deepcut_tpu.solver.update_rules import SolverConfig, init_state

PROTO = '''
input: "data"  input_shape { dim: 4 dim: 3 dim: 64 dim: 32 }
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
x = jnp.asarray(rng.randn(4, 64, 32, 3).astype(np.float32))  # NHWC, H=64
y = jnp.asarray(rng.randint(0, 10, (4,)).astype(np.int32))
def run(mesh):
    net = Net(text_format.parse(PROTO), phase='TRAIN', compute_dtype=None)
    step = net.make_train_step(scfg, mesh=mesh)
    p, s = net.params, init_state(scfg, net.params)
    for _ in range(3):
        p, s, loss = step(p, s, {'data': x, 'label': y})
    return p, float(loss)
p1, l1 = run(None)
mesh = make_mesh(16, spatial=4)
with mesh:
    p2, l2 = run(mesh)
for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-6)
assert abs(l1 - l2) < 1e-4 * max(1.0, abs(l1))
print('MESH-SCALE-GRAPH-MATCH d=4 s=4')
"""
    out = run_in_cpu_mesh(code, n_devices=16)
    assert "MESH-SCALE-GRAPH-MATCH d=4 s=4" in out


def test_dryrun_multichip_16(run_in_cpu_mesh):
    """The driver's own dryrun entry at 16 devices: full (data=8,
    spatial=2) training step with on-device target rasterization."""
    out = run_in_cpu_mesh(
        "import __graft_entry__ as g; g.dryrun_multichip(16)", n_devices=16)
    assert "dryrun_multichip ok: 16 devices" in out
