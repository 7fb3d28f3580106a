"""Pose estimation pipeline: bucketing, decode plumbing, and the HD tiling
path (tiled scoremaps must equal the untiled full-frame computation — the
seam-trim arithmetic from estimate_pose.py:146-221)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepcut_tpu.models.resnet import DeeperCutConfig, init_params
from deepcut_tpu.pose.estimate import PoseEstimator, canvas_size, _num_tiles

TINY = DeeperCutConfig(depths=(1, 1, 1, 1), stage_widths=(4, 4, 8, 8),
                       num_joints=3, compute_dtype=jnp.float32)


def _estimator(max_size=2000):
    params = init_params(jax.random.PRNGKey(0), TINY)
    # scale head weights up so scoremaps have structure
    for head in ("res5c_up_pose", "res3d_pose", "res5c_up_locref", "res3d_locref"):
        params[head]["w"] = params[head]["w"] * 30.0
    return PoseEstimator(params, TINY, folded=False, max_size=max_size)


def test_estimate_pose_shape_and_cache():
    est = _estimator()
    img = np.random.RandomState(0).randint(0, 255, (100, 140, 3), np.uint8)
    pose = est.estimate_pose(img)
    assert pose.shape == (5, 3)
    pose2 = est.estimate_pose(img, scales=[1.0])
    np.testing.assert_allclose(pose, pose2, rtol=1e-5)
    assert len(est._fwd_cache) >= 1


def test_num_tiles_reference_formula():
    assert _num_tiles(700, 700, 224) == 1
    assert _num_tiles(701, 700, 224) == 2
    assert _num_tiles(951, 700, 224) == 2   # (700-224)*2 = 952 > 951
    assert _num_tiles(952, 700, 224) == 3   # not strictly greater -> 3


def test_tiled_equals_untiled():
    est_full = _estimator(max_size=4000)
    est_tiled = _estimator(max_size=512)
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (330, 620, 3), np.uint8)
    sm_full, loc_full = est_full.scoremaps(img)
    sm_tile, loc_tile = est_tiled.scoremaps(img)
    assert sm_full.shape == sm_tile.shape
    # tiny model's receptive field << the 224px trim margin -> exact interior
    np.testing.assert_allclose(sm_tile, sm_full, rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(loc_tile, loc_full, rtol=5e-4, atol=5e-4)


def test_multiscale_picks_best():
    est = _estimator()
    img = np.random.RandomState(2).randint(0, 255, (96, 96, 3), np.uint8)
    pose = est.estimate_pose(img, scales=[0.75, 1.0])
    assert pose is not None and pose.shape == (5, 3)


def test_multiscale_averaging():
    est = _estimator()
    img = np.random.RandomState(3).randint(0, 255, (96, 128, 3), np.uint8)
    pose = est.estimate_pose_avg(img, scales=[0.75, 1.0, 1.25])
    assert pose.shape == (5, 3)
    # averaging at a single scale == plain decode of that scale's maps
    pose1 = est.estimate_pose_avg(img, scales=[1.0])
    sm, loc = est.scoremaps(img, 1.0)
    from deepcut_tpu.pose.decode import decode_pose
    import jax.numpy as jnp
    ref = np.asarray(decode_pose(jnp.asarray(sm), jnp.asarray(loc)))
    np.testing.assert_allclose(pose1, ref, rtol=1e-4, atol=1e-4)


def test_preprocess_resize_close_to_pil():
    """scale != 1 resize parity vs the reference's PIL-backed imresize
    (estimate_pose.py:92 scipy.misc.imresize): per-pixel within 1 uint8 ulp,
    mean deviation < 0.1 (two-pass rounding emulation)."""
    from PIL import Image
    import jax.numpy as jnp
    from deepcut_tpu.pose.estimate import preprocess_on_device, PAD_SIZE, MEAN_BGR

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (96, 72, 3), np.uint8)
    scale = 0.8
    padded = np.pad(img, ((0, PAD_SIZE), (0, PAD_SIZE), (0, 0)), mode="edge")
    ph, pw = padded.shape[:2]
    # scipy imresize truncates the target size ((size*scale).astype(int)) —
    # same arithmetic the estimator's internal paths now use
    oh, ow = int(ph * scale), int(pw * scale)
    ref = np.asarray(Image.fromarray(padded).resize((ow, oh), Image.BILINEAR),
                     np.float32) - np.asarray(MEAN_BGR, np.float32)
    canvas = np.asarray(preprocess_on_device(jnp.asarray(img), oh, ow, oh, ow))[0]
    diff = np.abs(canvas - ref)
    assert diff.max() <= 1.0 + 1e-5, diff.max()
    assert diff.mean() < 0.1, diff.mean()


def test_estimate_pose_batch_matches_single():
    """Batched serving API: per-frame results equal the single-image path."""
    import jax
    from deepcut_tpu.models.resnet import DeeperCutConfig, init_params
    from deepcut_tpu.pose.estimate import PoseEstimator

    cfg = DeeperCutConfig(depths=(1, 1, 1, 1), stage_widths=(4, 4, 8, 8),
                          num_joints=3, compute_dtype=jnp.float32)
    est = PoseEstimator(init_params(jax.random.PRNGKey(0), cfg), cfg,
                        folded=False)
    est.cfg = cfg
    rng = np.random.RandomState(0)
    frames = [(rng.rand(60, 44, 3) * 255).astype(np.uint8) for _ in range(3)]
    batch = est.estimate_pose_batch(frames)
    assert batch.shape == (3, 5, 3)
    for i, f in enumerate(frames):
        single = est._estimate_single_scale(f, 1.0)
        np.testing.assert_allclose(batch[i], single, rtol=1e-4, atol=1e-4)


def test_tile_plan_partitions_grid_exactly():
    """_tile_plan: stride-aligned origins, exact partition of the global
    cell grid, >=RF context for kept cells (the reference's 252-px step has
    misaligned origins and an extra row per seam — corrected here)."""
    from deepcut_tpu.pose.estimate import _tile_plan, RF
    from deepcut_tpu.pose.decode import STRIDE

    stride = int(STRIDE)
    for length, max_size in [(1064, 700), (2048, 700), (720, 700),
                             (3000, 700), (620 + 64, 500), (701, 700)]:
        plan = _tile_plan(length, max_size)
        grid = -(-length // stride)
        covered = []
        for (s, e, a, b) in plan:
            assert s % stride == 0, "tile origin must sit on the cell grid"
            assert e - s <= max_size
            covered.extend(range(s // stride + a, s // stride + b))
            # kept cells have RF context inside the tile except at borders
            if s > 0:
                assert a * stride >= int(RF)
            if e < length:
                assert (e - s) - (b * stride) >= int(RF) - stride
        assert covered == list(range(grid)), (length, max_size, plan)


def test_tiled_equals_untiled_misaligned_max_size():
    """max_size=500 gives the reference step 52 px (NOT stride-aligned, the
    production-700 failure mode); the corrected plan must still reproduce
    the full-frame grid exactly."""
    est_full = _estimator(max_size=4000)
    est_tiled = _estimator(max_size=500)
    rng = np.random.RandomState(4)
    img = rng.randint(0, 255, (330, 620, 3), np.uint8)
    sm_full, loc_full = est_full.scoremaps(img)
    sm_tile, loc_tile = est_tiled.scoremaps(img)
    assert sm_full.shape == sm_tile.shape
    np.testing.assert_allclose(sm_tile, sm_full, rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(loc_tile, loc_full, rtol=5e-4, atol=5e-4)


def test_multiscale_averaging_matches_host_oracle_at_scale_ne_1():
    """The fused on-device resample+average path (estimate_pose_avg) must
    equal a HOST-numpy pipeline at scale != 1: per-scale host scoremaps,
    independently-written triangle-filter resample to the scale-1 grid,
    host averaging (locref divided by its scale), single decode."""
    from deepcut_tpu.pose.decode import decode_pose
    from deepcut_tpu.pose.estimate import STRIDE, canvas_size

    def np_resample_axis(m, out_size, axis):
        # independent PIL-style triangle filter (support widened by the
        # in/out ratio on downscale, weights normalised)
        in_size = m.shape[axis]
        scale = in_size / out_size
        fscale = max(scale, 1.0)
        slabs = []
        for i in range(out_size):
            center = (i + 0.5) * scale - 0.5
            lo = int(np.floor(center - fscale))
            hi = int(np.ceil(center + fscale))
            xs = np.arange(max(lo, 0), min(hi + 1, in_size))
            w = np.clip(1.0 - np.abs((xs - center) / fscale), 0.0, None)
            w = w / w.sum()
            slabs.append(np.tensordot(np.take(m, xs, axis=axis), w,
                                      axes=([axis], [0])))
        return np.stack(slabs, axis=axis)

    est = _estimator()
    img = np.random.RandomState(7).randint(0, 255, (90, 120, 3), np.uint8)
    scales = [0.6, 1.0, 1.4]
    h, w = img.shape[:2]
    gh = canvas_size(h, 1.0) // int(STRIDE)
    gw = canvas_size(w, 1.0) // int(STRIDE)

    acc_sm = np.zeros((gh, gw, 3), np.float64)
    acc_loc = np.zeros((gh, gw, 6), np.float64)
    for s in scales:
        sm, loc = est.scoremaps(img, s)  # host numpy, per-scale grid
        assert (s == 1.0) == (sm.shape[:2] == (gh, gw))
        sm_r = np_resample_axis(np_resample_axis(sm, gw, 1), gh, 0)
        loc_r = np_resample_axis(np_resample_axis(loc, gw, 1), gh, 0)
        acc_sm += sm_r
        acc_loc += loc_r / s
    ref = np.asarray(decode_pose(jnp.asarray(acc_sm / len(scales), jnp.float32),
                                 jnp.asarray(acc_loc / len(scales), jnp.float32)))

    got = est.estimate_pose_avg(img, scales)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)


def test_estimator_int8_serving_mode():
    """PoseEstimator.quantize_int8: all pipelines rebuild on the int8
    forward; poses stay close to the fp path on the same image."""
    est = _estimator()
    rng = np.random.RandomState(11)
    img = rng.randint(0, 255, (100, 120, 3), np.uint8)
    pose_fp = est.estimate_pose(img)
    sm_fp, _ = est.scoremaps(img)

    est.quantize_int8(img)
    assert est._int8 and "q" in est.params
    pose_q = est.estimate_pose(img)
    assert pose_q.shape == pose_fp.shape
    # positions stay within a few percent (the fixture's 30x-scaled heads
    # blow locref offsets into the thousands, so compare relatively)
    rel = np.abs(pose_q[:2] - pose_fp[:2]) / (np.abs(pose_fp[:2]) + 1.0)
    assert (rel < 0.10).all(), (pose_fp[:2], pose_q[:2])
    sm_q, loc_q = est.scoremaps(img)
    assert sm_q.shape == sm_fp.shape
    # the fixture's 30x heads SATURATE the sigmoid; quantization noise can
    # flip a handful of near-zero logits 0<->1, so bound the flip fraction
    assert np.mean(np.abs(sm_q - sm_fp) > 0.25) < 0.05
    batch = est.estimate_pose_batch([img, img])
    assert batch.shape == (2, 5, 3)
    np.testing.assert_allclose(batch[0], batch[1], rtol=1e-5)



def test_estimate_pose_many_mixed_sizes_matches_single():
    """Mixed-size batched serving (estimate_pose_many): images of different
    sizes — two sharing a bucket, one in its own, plus group padding — come
    back in order, each equal to the single-image path."""
    import jax
    from deepcut_tpu.models.resnet import DeeperCutConfig, init_params
    from deepcut_tpu.pose.estimate import PoseEstimator

    cfg = DeeperCutConfig(depths=(1, 1, 1, 1), stage_widths=(4, 4, 8, 8),
                          num_joints=3, compute_dtype=jnp.float32)
    est = PoseEstimator(init_params(jax.random.PRNGKey(0), cfg), cfg,
                        folded=False)
    est.cfg = cfg
    rng = np.random.RandomState(1)
    sizes = [(60, 44), (56, 40), (100, 90), (60, 44), (58, 42)]
    frames = [(rng.rand(h, w, 3) * 255).astype(np.uint8) for h, w in sizes]
    many = est.estimate_pose_many(frames)
    assert many.shape == (5, 5, 3)
    for i, f in enumerate(frames):
        single = est._estimate_single_scale(f, 1.0)
        np.testing.assert_allclose(many[i], single, rtol=1e-4, atol=1e-4,
                                   err_msg=f"frame {i} {sizes[i]}")
