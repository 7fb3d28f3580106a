"""On-device augmentation (pose/augment_device.py): the affine warp + scale
+ canvas prep as two matmul-form resampling passes inside the train step.

Contracts tested:
- identity transform reproduces the host canvas BIT-exactly (the two-pass
  factorization, uint8 truncation, edge-pad band, and mean region are all
  the host path's semantics, not approximations of them);
- rotation+scale stays within a couple of grey levels of the host cv2 warp
  (cv2 quantizes sample coordinates to 1/32 px; the device path is exact
  f32 bilinear — the drift is cv2's, characterized here);
- PoseDataSource(augment_device=True) ships raw images + coefficients, the
  RNG stream and ALL targets stay bit-identical to the host-augment path,
  and worker modes (thread/process) stay bit-identical to serial;
- the train step consumes the raw batch (single device and data-parallel
  mesh, composing with device targets);
- the spatial shard_map path consumes it too: raw images ride the mesh
  spatial-REPLICATED and each shard warps only its own canvas row block
  (pose/augment_device.warp_batch_local — no halos; the warp's source is
  the full raw), trajectory-equal at spatial=2 and spatial=4 to BOTH the
  single-device raw-batch step and the pre-warped batch through the same
  mesh.

Host-path reference: data/pipeline.load_canvas (cv2.warpAffine fused with
the scale resize) mirroring pose_data_layer.cpp:627-667.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepcut_tpu.constants import MEAN_BGR
from deepcut_tpu.data.pipeline import PoseDataSource, load_canvas
from deepcut_tpu.data.window_file import ImageRecord, Person
from deepcut_tpu.pose.augment import affine_about, device_warp_coef
from deepcut_tpu.pose.augment_device import _warp_one, warp_batch
from deepcut_tpu.pose.targets import TargetConfig


def _smooth_image(h=200, w=260):
    """Band-limited test image: bounds cv2's 1/32-px coordinate
    quantization error to ~|grad|/32 per pixel."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack([
        128 + 100 * np.sin(yy / 17) * np.cos(xx / 23),
        128 + 90 * np.cos(yy / 11 + 1) * np.sin(xx / 31),
        128 + 80 * np.sin((yy + xx) / 29),
    ], -1)
    return np.clip(img, 0, 255).astype(np.uint8)


def _device_canvas(img, M, scale, ih, iw):
    h, w = img.shape[:2]
    coef, nhw = device_warp_coef(M, scale, h, w)
    nhw = np.concatenate([nhw, [ih, iw]]).astype(np.float32)
    rbh, rbw = (h + 63) // 64 * 64, (w + 63) // 64 * 64
    rb = np.empty((rbh, rbw, 3), np.uint8)
    rb[:] = np.asarray(MEAN_BGR, np.uint8)
    rb[:h, :w] = img
    return np.asarray(_warp_one(jnp.asarray(rb), jnp.asarray(coef),
                                jnp.asarray(nhw), ih, iw))


def _host_canvas(img, M, scale, ih, iw, tmp_path):
    from PIL import Image

    path = str(tmp_path / "warp_src.png")
    Image.fromarray(img[:, :, ::-1]).save(path)
    return load_canvas(path, M, scale, ih, iw, uint8=False)


def test_identity_bitexact(tmp_path):
    img = _smooth_image()
    M = affine_about((130.0, 100.0), 0.0, 1.0)
    d = _device_canvas(img, M, 1.0, 256, 320)
    h = _host_canvas(img, M, 1.0, 256, 320, tmp_path)
    np.testing.assert_array_equal(d, h)


def test_rotation_scale_close_to_cv2(tmp_path):
    cv2 = pytest.importorskip("cv2")  # the host fast path being compared
    img = _smooth_image()
    for angle, ascale, scale in ((12.0, 1.07, 0.9), (-15.0, 0.9, 1.13),
                                 (7.5, 1.0, 1.0)):
        M = affine_about((130.0, 100.0), angle, ascale)
        d = _device_canvas(img, M, scale, 256, 320)
        h = _host_canvas(img, M, scale, 256, 320, tmp_path)
        diff = np.abs(d - h)
        # cv2's 1/32-px coordinate quantization bounds the pointwise drift
        # (worst observed: 6 grey levels under 1.13x upsampling); the mean
        # is the meaningful closeness metric
        assert diff.max() <= 8.0, (angle, ascale, scale, diff.max())
        assert diff.mean() < 0.1, (angle, ascale, scale, diff.mean())


def test_scale_only_without_augment_matches_fused_warp(tmp_path):
    """augment_device without `augment` = device-side scale resize (the
    fused-warp semantics, not the host PIL-resize parity path)."""
    img = _smooth_image()
    d = _device_canvas(img, None, 0.8, 192, 256)
    h = _host_canvas(img, affine_about((1.0, 1.0), 0.0, 1.0), 0.8, 192, 256,
                     tmp_path)
    assert np.abs(d - h).max() <= 4.0


def _make_records(tmp_path, n=6, h=120, w=150, J=5):
    from PIL import Image

    rng = np.random.RandomState(5)
    recs = []
    for i in range(n):
        arr = _smooth_image(h, w)
        # per-image phase shift so records differ
        arr = np.roll(arr, 7 * i, axis=1)
        path = str(tmp_path / f"img{i}.png")
        Image.fromarray(arr[:, :, ::-1]).save(path)
        k = int(rng.randint(3, J))
        classes = (rng.permutation(J)[:k] + 1).astype(np.int32)
        xy = np.stack([rng.uniform(5, w - 5, k),
                       rng.uniform(5, h - 5, k)], 1).astype(np.float32)
        recs.append(ImageRecord(path, 3, h, w, [Person(classes, xy)]))
    return recs


def _tcfg(J=5, device_targets=False):
    return TargetConfig(num_classes=J, no_bg_class=True, scale=0.8,
                        location_refinement=True, weight_targets=True)


def _source(recs, **kw):
    return PoseDataSource(recs, _tcfg(), seed=11, cycle=True, augment=True,
                          bucket_step=64, **kw)


def test_pipeline_targets_identical_images_close(tmp_path):
    recs = _make_records(tmp_path)
    host = _source(recs)
    dev = _source(recs, augment_device=True)
    bh = host.next_batch(4)
    bd = dev.next_batch(4)
    assert "image_raw" in bd and "aug_coef" in bd and "aug_canvas" in bd
    assert bd["aug_canvas"].nbytes == 0
    # identical RNG stream => bit-identical targets
    for k in bh:
        if k == "image":
            continue
        np.testing.assert_array_equal(bh[k], bd[k], err_msg=k)
    # warp on device, compare canvases
    out = warp_batch({k: jnp.asarray(v) for k, v in bd.items()})
    img_d = np.asarray(out["image"])
    assert img_d.shape == bh["image"].shape
    diff = np.abs(img_d - bh["image"])
    assert diff.max() <= 4.0 and diff.mean() < 0.2, (diff.max(), diff.mean())


def test_worker_modes_bitidentical(tmp_path):
    recs = _make_records(tmp_path)
    ref = _source(recs, augment_device=True).next_batch(4)
    thr = _source(recs, augment_device=True, workers=2).next_batch(4)
    for k in ref:
        np.testing.assert_array_equal(ref[k], thr[k], err_msg=f"thread {k}")
    proc_src = _source(recs, augment_device=True, workers=2,
                       worker_mode="process")
    try:
        proc = proc_src.next_batch(4)
    finally:
        proc_src.close()
    for k in ref:
        np.testing.assert_array_equal(ref[k], proc[k], err_msg=f"process {k}")


def _tiny_cfg():
    from deepcut_tpu.models.resnet import DeeperCutConfig

    return DeeperCutConfig(depths=(1, 1, 1, 1), stage_widths=(4, 4, 8, 8),
                           num_joints=5, pairwise=False,
                           compute_dtype=jnp.float32)


def test_train_step_consumes_raw_batch(tmp_path):
    """Single-device step on the raw batch == step on the pre-warped batch
    (same warp runs inside the program), composing with device targets."""
    from deepcut_tpu.models.resnet import init_params
    from deepcut_tpu.parallel.train_step import make_train_step
    from deepcut_tpu.solver.update_rules import SolverConfig, init_state

    recs = _make_records(tmp_path)
    src = _source(recs, augment_device=True, device_targets=True)
    batch = src.next_batch(2)
    cfg = _tiny_cfg()
    scfg = SolverConfig(solver_type="SGD", base_lr=0.01, momentum=0.9)
    params = init_params(jax.random.PRNGKey(0), cfg)
    state = init_state(scfg, params)
    step = make_train_step(cfg, scfg, None, donate=False,
                           target_cfg=_tcfg())
    p1, s1, m1 = step(params, state, batch)
    assert np.isfinite(float(m1["total_loss"]))
    # pre-warping on host (same device code) must give the same step
    pre = dict(warp_batch({k: jnp.asarray(v) for k, v in batch.items()}))
    p2, s2, m2 = step(params, state, pre)
    assert float(m1["total_loss"]) == float(m2["total_loss"])
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_data_parallel_mesh_matches_single_device(tmp_path):
    from deepcut_tpu.models.resnet import init_params
    from deepcut_tpu.parallel.mesh import make_mesh
    from deepcut_tpu.parallel.train_step import make_train_step
    from deepcut_tpu.solver.update_rules import SolverConfig, init_state

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    recs = _make_records(tmp_path)
    src = _source(recs, augment_device=True, device_targets=True)
    batch = src.next_batch(4)
    cfg = _tiny_cfg()
    scfg = SolverConfig(solver_type="SGD", base_lr=0.01, momentum=0.9)
    params = init_params(jax.random.PRNGKey(0), cfg)
    state = init_state(scfg, params)
    single = make_train_step(cfg, scfg, None, donate=False,
                             target_cfg=_tcfg())
    p1, s1, m1 = single(params, state, batch)
    mesh = make_mesh(4)
    with mesh:
        stepm = make_train_step(cfg, scfg, mesh, donate=False,
                                target_cfg=_tcfg())
        p2, s2, m2 = stepm(params, state, batch)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("spatial", [2, 4])
def test_spatial_mesh_consumes_raw_batch(tmp_path, spatial):
    """The spatial shard_map path consumes augment_device batches: raw
    images + coefficients arrive spatial-REPLICATED, each shard warps its
    own canvas row block (warp_batch_local), and the trajectory equals
    BOTH (augment_device=True, spatial=1) and the pre-warped batch through
    the same (data, spatial) mesh — the VERDICT-r4 task-3 contract."""
    from deepcut_tpu.models.resnet import init_params
    from deepcut_tpu.parallel.mesh import make_mesh
    from deepcut_tpu.parallel.train_step import make_train_step
    from deepcut_tpu.solver.update_rules import SolverConfig, init_state

    if len(jax.devices()) < 2 * spatial:
        pytest.skip(f"needs {2 * spatial} virtual devices")
    # taller records so the (128-row) canvas satisfies H >= 32*spatial
    recs = _make_records(tmp_path, h=150, w=120)
    src = _source(recs, augment_device=True, device_targets=True)
    batch = src.next_batch(2)
    assert batch["aug_canvas"].shape[1] % (16 * spatial) == 0
    cfg = _tiny_cfg()
    scfg = SolverConfig(solver_type="SGD", base_lr=0.01, momentum=0.9)
    params = init_params(jax.random.PRNGKey(0), cfg)
    state = init_state(scfg, params)
    single = make_train_step(cfg, scfg, None, donate=False,
                             target_cfg=_tcfg())
    p1, s1, m1 = single(params, state, batch)
    mesh = make_mesh(2 * spatial, spatial=spatial)
    with mesh:
        stepm = make_train_step(cfg, scfg, mesh, donate=False,
                                target_cfg=_tcfg())
        p2, s2, m2 = stepm(params, state, batch)
        # pre-warped pixels through the SAME spatial mesh (the
        # augment_device=False equivalent) must land on the same step
        pre = {k: np.asarray(v) for k, v in warp_batch(
            {k: jnp.asarray(v) for k, v in batch.items()}).items()}
        p3, s3, m3 = stepm(params, state, pre)
    assert abs(float(m1["total_loss"]) - float(m2["total_loss"])) < 1e-4
    assert abs(float(m2["total_loss"]) - float(m3["total_loss"])) < 1e-4
    for a, b, c in zip(jax.tree_util.tree_leaves(p1),
                       jax.tree_util.tree_leaves(p2),
                       jax.tree_util.tree_leaves(p3)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(b), np.asarray(c),
                                   rtol=1e-4, atol=1e-6)


def test_bucket_step_validation():
    with pytest.raises(ValueError, match="bucket_step"):
        PoseDataSource([ImageRecord("x", 3, 100, 100, [])], _tcfg(),
                       augment_device=True, bucket_step=40)
