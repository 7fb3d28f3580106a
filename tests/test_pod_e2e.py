"""The composed pod-shaped proof (round-4 VERDICT #5).

Round 3 proved each flagship piece pairwise: PCKh learning single-device,
spatial training trajectory-equal, device targets ULP-equal, orbax restore
equivalent. This test composes the FULL production stack in one run — the
tiny flagship config training ON a (data=4, spatial=2) shard_map mesh with
on-device target rasterization and uint8 canvases, orbax-snapshotted
mid-run, restored mesh-placed into a fresh solver, finished on both paths —
and asserts held-out PCKh >= 0.9 AND bit-equal restore trajectories.
Reference: the whole SURVEY §3.2 stack (train.py -> pose_data_layer ->
solver.cpp -> multi-GPU P2PSync), which the reference never composes in a
test either.

~5-10 min on the 1-core CI host (one test, marked at the bottom of the
file's runtime budget); the driver's dryrun stays fast and separate.
"""

import numpy as np

POD_CODE = r"""
import colorsys
import os

import numpy as np
import jax
import jax.numpy as jnp
from PIL import Image

from deepcut_tpu.data.window_file import ImageRecord, Person, write_window_file
from deepcut_tpu.data.pipeline import PoseDataSource
from deepcut_tpu.models.resnet import DeeperCutConfig
from deepcut_tpu.pose.estimate import PoseEstimator
from deepcut_tpu.pose.evaluate import evaluate_estimator
from deepcut_tpu.pose.targets import TargetConfig
from deepcut_tpu.solver.solver import SolverParams, PoseSolver
from jax.sharding import Mesh

TMP = os.environ["POD_TMP"]
J, H, W = 6, 64, 64
COLORS = [tuple(int(255 * c) for c in colorsys.hsv_to_rgb(j / J, 1, 1))[::-1]
          for j in range(J)]

def render(xy, rng):
    img = np.full((H, W, 3), 127, np.int16)
    img += rng.randint(-20, 20, (H, W, 3))
    img = img.clip(0, 255).astype(np.uint8)
    yy, xx = np.mgrid[0:H, 0:W]
    for j in range(J):
        mask = (xx - xy[j, 0]) ** 2 + (yy - xy[j, 1]) ** 2 <= 16
        for c in range(3):
            img[:, :, c][mask] = COLORS[j][c]
    return img

def make(n, seed):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        xy = np.stack([rng.uniform(6, W - 6, J),
                       rng.uniform(6, H - 6, J)], 1).astype(np.float32)
        out.append((render(xy, rng), xy))
    return out

recs = []
for i, (img, xy) in enumerate(make(120, 0)):
    p = os.path.join(TMP, f"t{i}.png")
    Image.fromarray(img[:, :, ::-1]).save(p)
    recs.append(ImageRecord(p, 3, H, W,
                            [Person(np.arange(1, J + 1, dtype=np.int32), xy)]))
index = os.path.join(TMP, "index.txt")
write_window_file(index, recs)

# 64px fixtures: min_image_size below the 100px default gate, and
# fg_threshold scaled to the 128² flagship proof's RELATIVE footprint
# (17px at 128² -> 8.5px at 64²; the default 17 would make every joint's
# positive disc cover ~27% of the image and blur the 8x8 score grid)
tcfg = TargetConfig(num_classes=J, soft_labels=False, no_bg_class=True,
                    location_refinement=True, scale=1.0,
                    min_image_size=32, fg_threshold=8.5)
cfg = DeeperCutConfig(depths=(1, 1, 1, 1), stage_widths=(8, 8, 16, 16),
                      num_joints=J, pairwise=False,
                      compute_dtype=jnp.float32)

devs = np.array(jax.devices()[:8]).reshape(4, 2)
mesh = Mesh(devs, ("data", "spatial"))

def make_source():
    # the production CLI layout: uint8 canvases + compact annotations,
    # rasterized on device inside the sharded train step
    return PoseDataSource(index, tcfg, bucket_step=32, cycle=True, seed=1,
                          uint8_images=True, device_targets=True)

def make_solver(source):
    sp = SolverParams.from_prototxt(f'''
        base_lr: 0.004  momentum: 0.9  lr_policy: "fixed"
        clip_gradients: 10.0  display: 0  max_iter: 640  snapshot: 0
        snapshot_format: ORBAX
        snapshot_prefix: "{TMP}/pod"
    ''')
    return PoseSolver(sp, cfg, lambda: source.next_batch(4), mesh=mesh,
                      handle_signals=False, log=lambda *_: None,
                      target_cfg=tcfg)

# round 5: the BN-statistics freeze (models/train.bn_frozen_mults — the
# prototxt's lr_mult-0 parity semantics) changed the trajectory; this seed
# reached PCKh 0.875 at 480 iters where the pre-freeze run cleared 0.9.
# The budget extends to 640 — the gate itself stays at 0.9.
MID, END = 320, 640

src_a = make_source()
solver_a = make_solver(src_a)
# head_size matches the single-device flagship proof's RELATIVE threshold
# (25px at 128² -> 1.56 strides); 16px at 64² is 1 stride — slightly
# stricter, still decode-resolvable via locref
held_out = [{"image": img, "gt_xy": xy, "head_size": 16.0}
            for img, xy in make(8, 99)]
r0 = evaluate_estimator(
    PoseEstimator(solver_a.net_params, cfg, folded=False, bucket_step=32),
    held_out)

solver_a.step(MID)
ckpt = solver_a.snapshot(export_caffemodel=False)
from deepcut_tpu.solver import orbax_ckpt
orbax_ckpt.wait_until_finished()
solver_a.step(END - MID)

# restore leg: fresh solver, mesh-placed orbax restore, identical batch
# stream from MID (same seed source fast-forwarded MID batches)
src_b = make_source()
for _ in range(MID):
    src_b.next_batch(4)
solver_b = make_solver(src_b)
solver_b.restore(ckpt)
assert solver_b.iter == MID, solver_b.iter
leaf = jax.tree_util.tree_leaves(solver_b.net_params)[0]
assert isinstance(leaf.sharding, jax.sharding.NamedSharding)
assert dict(leaf.sharding.mesh.shape) == {"data": 4, "spatial": 2}
solver_b.step(END - MID)

# 1) restore-equivalence: the two legs saw identical batches from MID on,
# ran the same jitted programs on the same backend -> bit-equal params
mismatch = []
flat_a = jax.tree_util.tree_leaves_with_path(solver_a.net_params)
flat_b = jax.tree_util.tree_leaves(solver_b.net_params)
for (path, a), b in zip(flat_a, flat_b):
    if not np.array_equal(np.asarray(a), np.asarray(b)):
        mismatch.append(jax.tree_util.keystr(path))
assert not mismatch, f"restore trajectory diverged: {mismatch[:8]}"

# 2) the composed stack LEARNS: held-out PCKh@0.5 >= 0.9
r1 = evaluate_estimator(
    PoseEstimator(solver_a.net_params, cfg, folded=False, bucket_step=32),
    held_out)
assert r1.mean >= 0.9, f"PCKh after pod training: {r1.mean} (init {r0.mean})"
assert r1.mean > r0.mean + 0.5, (r0.mean, r1.mean)
print(f"POD_OK pckh_init={r0.mean:.3f} pckh_final={r1.mean:.3f}")
"""


def test_pod_shaped_train_snapshot_restore_pckh(run_in_cpu_mesh, tmp_path):
    """Spatial mesh x device targets x orbax mid-run restore x PCKh — the
    full production composition in one subprocess run."""
    import os

    os.environ["POD_TMP"] = str(tmp_path)
    try:
        out = run_in_cpu_mesh(POD_CODE, n_devices=8, timeout=3000)
    finally:
        del os.environ["POD_TMP"]
    assert "POD_OK" in out, out
    pckh = float(out.split("pckh_final=")[1].split()[0])
    assert pckh >= 0.9
