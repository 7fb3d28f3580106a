"""Target rasterizer: vectorized implementation vs the naive reference oracle.

The oracle (`rasterize_reference`) mirrors the C++ control flow of
pose_data_layer.cpp:676-855 cell by cell; the vectorized version must agree
exactly on every output map across configurations.
"""

import numpy as np
import pytest

from deepcut_tpu.data.window_file import ImageRecord, Person, JointStats, default_stats
from deepcut_tpu.pose.targets import (
    TargetConfig, rasterize, rasterize_reference, grid_geometry, accepts,
)


def _record(rng, num_people=1, height=160, width=200, with_skip=False):
    people = []
    for _ in range(num_people):
        k = rng.randint(5, 15)
        classes = rng.permutation(14)[:k] + 1
        if with_skip:
            classes = np.concatenate([classes, [15]])
        xy = np.stack([
            rng.uniform(0, width, len(classes)),
            rng.uniform(0, height, len(classes)),
        ], axis=1).astype(np.float32)
        people.append(Person(classes.astype(np.int32), xy))
    return ImageRecord("x.png", 3, height, width, people)


CONFIGS = [
    TargetConfig(soft_labels=False, location_refinement=True),
    TargetConfig(soft_labels=True, gauss_blob_sigma=10.0, location_refinement=True),
    TargetConfig(soft_labels=False, multi_label=True, no_bg_class=True,
                 location_refinement=True, regress_to_other=True),
    TargetConfig(soft_labels=False, weight_targets=True, fg_fraction=0.25,
                 location_refinement=True),
    TargetConfig(soft_labels=False, fg_fraction=0.25, bg_threshold=17.0,
                 location_refinement=True),
    TargetConfig(soft_labels=True, no_bg_class=True, location_refinement=True,
                 regress_to_other=True, scale=0.6),
]


@pytest.mark.parametrize("cfg_idx", range(len(CONFIGS)))
@pytest.mark.parametrize("num_people,with_skip", [(1, False), (3, False), (2, True)])
def test_vectorized_matches_reference(cfg_idx, num_people, with_skip):
    cfg = CONFIGS[cfg_idx]
    rng = np.random.RandomState(42 + cfg_idx)
    rec = _record(rng, num_people=num_people, with_skip=with_skip)
    ref = rasterize_reference(rec, cfg, rng=np.random.RandomState(7), scale=cfg.scale)
    vec = rasterize(rec, cfg, rng=np.random.RandomState(7), scale=cfg.scale)
    assert set(ref) == set(vec)
    for key in ref:
        np.testing.assert_allclose(
            vec[key], ref[key], rtol=1e-5, atol=1e-5,
            err_msg=f"mismatch in {key} (config {cfg_idx})",
        )


def test_geometry_and_rejection():
    sh, sw, ih, iw = grid_geometry(512, 274, 1.0)
    assert (sh, sw, ih, iw) == (64, 35, 512, 280)
    cfg = TargetConfig()
    assert accepts(cfg, 512, 274, 1.0)
    assert not accepts(cfg, 1200, 900, 1.0)   # > 700^2 budget
    assert not accepts(cfg, 90, 500, 1.0)     # < 100 px

def test_positive_cell_semantics():
    """A joint at (100, 100) must light up the surrounding cells within the
    17px threshold, with locref offsets = (joint - cell_center)/sqrt(53)."""
    cfg = TargetConfig(location_refinement=True)
    rec = ImageRecord("x.png", 3, 160, 160,
                      [Person(np.array([3], np.int32),
                              np.array([[100.0, 100.0]], np.float32))])
    out = rasterize(rec, cfg, rng=np.random.RandomState(0), scale=1.0)
    labels = out["part_score_targets"]
    # cell (12, 12): center (100, 100) -> dist 0 -> positive class 3
    assert labels[12, 12, 3] == 1.0
    assert labels[12, 12, 0] == 0.0  # bg channel
    # cell centers 3 strides away (24px) -> not positive, labels stay ignore
    # unless selected as sampled negative; cell (12,12) offsets are 0
    np.testing.assert_allclose(out["locref_targets"][12, 12, 4:6], [0.0, 0.0])
    assert out["locref_weights"][12, 12, 4] == 1.0
    # neighbour cell (12, 11): center (92, 100), offset = (8, 0)/sqrt(53)
    np.testing.assert_allclose(
        out["locref_targets"][12, 11, 4:6],
        [8.0 / np.sqrt(53.0), 0.0], rtol=1e-6,
    )


def test_empty_record_background_parity():
    """Zero-joint records: the reference's cell loop writes the background
    one-hot everywhere when fg_fraction is unset; rasterize/rasterize_native
    must agree with rasterize_reference instead of returning all-IGNORE."""
    from deepcut_tpu.pose.targets import rasterize_native, IGNORE_VALUE

    rec = ImageRecord("x.png", 3, 96, 128, [])
    for cfg in (TargetConfig(soft_labels=False, location_refinement=True),
                TargetConfig(soft_labels=False, fg_fraction=0.25,
                             location_refinement=True),
                TargetConfig(soft_labels=False, weight_targets=True,
                             fg_fraction=0.25, location_refinement=True)):
        ref = rasterize_reference(rec, cfg, rng=np.random.RandomState(3),
                                  scale=1.0)
        vec = rasterize(rec, cfg, rng=np.random.RandomState(3), scale=1.0)
        nat = rasterize_native(rec, cfg, rng=np.random.RandomState(3),
                               scale=1.0)
        for k in ref:
            np.testing.assert_array_equal(vec[k], ref[k], err_msg=k)
            np.testing.assert_array_equal(nat[k], ref[k], err_msg=k)
    # fg_fraction=None: every in-image cell is supervised background
    cfg = TargetConfig(soft_labels=False, location_refinement=True)
    out = rasterize(rec, cfg, rng=np.random.RandomState(0), scale=1.0)
    lab = out["part_score_targets"]
    th, tw = -(-96 // 8), -(-128 // 8)
    assert (lab[:th, :tw, 0] == 1.0).all()
    assert (lab[:th, :tw, 1:] == 0.0).all()


def test_mixed_empty_batch_rpn_segmentation():
    """Batches mixing zero-person and annotated records must emit the full
    top set (rpn/segm blobs are part of the layer contract) in either
    order."""
    from deepcut_tpu.data.pipeline import PoseDataSource

    cfg = TargetConfig(soft_labels=False, location_refinement=True,
                       rpn=True, segmentation=True)
    rng = np.random.RandomState(5)
    rec_full = _record(rng)
    rec_empty = ImageRecord("y.png", 3, 160, 200, [])

    def loader(path):
        return np.zeros((160, 200, 3), np.uint8)

    for order in ([rec_empty, rec_full], [rec_full, rec_empty]):
        src = PoseDataSource(order, cfg, seed=1, image_loader=loader,
                             bucket_step=32)
        batch = src.next_batch(8)  # 8 draws: both record kinds appear w.h.p.
        assert "rpn_cls_targets" in batch and "segm_cls_targets" in batch
        assert batch["rpn_cls_targets"].shape[0] == 8
        assert batch["segm_cls_targets"].shape[0] == 8
        # both kinds really were drawn: only annotated records can put a 1
        # in a JOINT channel of the part scoremaps (empty records are pure
        # background one-hot); RPN positives depend on the contour centroid
        # so they are not a reliable discriminator
        has_joint = np.array([(batch["part_score_targets"][i][..., 1:] == 1).any()
                              for i in range(8)])
        assert has_joint.any() and not has_joint.all()


def test_pose_data_source_rejection_loop_fails_loudly(tmp_path):
    """A dataset whose every record falls outside the accepted size range
    (e.g. all images < min_image_size) must raise, not spin forever in the
    silent re-draw loop (pose_data_layer.cpp rejection semantics)."""
    import pytest
    from deepcut_tpu.data.pipeline import PoseDataSource
    from deepcut_tpu.data.window_file import ImageRecord, Person

    rec = ImageRecord("missing.png", 3, 64, 64,  # 64 < min_image_size=100
                      [Person(np.array([1], np.int32),
                              np.array([[10.0, 10.0]], np.float32))])
    src = PoseDataSource([rec], TargetConfig(num_classes=5))
    with pytest.raises(RuntimeError, match="rejected"):
        src.next_sample()


def test_pose_data_source_workers_bitwise_equal(tmp_path):
    """workers>0 parallelizes only the RNG-free decode/warp/canvas phase
    (data/pipeline.py), so batches must be BIT-identical to the serial
    path — with and without augmentation, over real on-disk JPEGs."""
    from PIL import Image
    from deepcut_tpu.data.pipeline import PoseDataSource

    rng = np.random.RandomState(11)
    recs = []
    for i in range(4):
        h, w = int(rng.randint(140, 200)), int(rng.randint(160, 240))
        arr = rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
        path = str(tmp_path / f"img{i}.jpg")
        Image.fromarray(arr).save(path, quality=90)
        r = _record(rng, height=h, width=w)
        recs.append(ImageRecord(path, 3, h, w, r.people))

    cfg = TargetConfig(soft_labels=False, location_refinement=True)
    for augment in (False, True):
        srcs = [PoseDataSource(recs, cfg, seed=3, bucket_step=32,
                               augment=augment, workers=wk)
                for wk in (0, 4)]
        for _ in range(3):
            a = srcs[0].next_batch(4)
            b = srcs[1].next_batch(4)
            assert sorted(a) == sorted(b)
            for k in a:
                np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_pose_data_source_uint8_images_equivalent(tmp_path):
    """uint8_images=True emits mean-FILLED uint8 canvases whose device-side
    subtraction (models/resnet.prepare_input) equals the float path
    bit-exactly — including the bucket-padding region; and a train step fed
    either batch produces identical params."""
    import jax
    import jax.numpy as jnp
    from PIL import Image
    from deepcut_tpu.data.pipeline import PoseDataSource, MEAN_BGR
    from deepcut_tpu.models.resnet import prepare_input

    rng = np.random.RandomState(21)
    recs = []
    for i in range(3):
        h, w = int(rng.randint(120, 170)), int(rng.randint(130, 190))
        arr = rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
        path = str(tmp_path / f"u{i}.png")
        Image.fromarray(arr).save(path)
        r = _record(rng, height=h, width=w)
        recs.append(ImageRecord(path, 3, h, w, r.people))

    cfg = TargetConfig(soft_labels=False, location_refinement=True,
                       no_bg_class=True)
    sf = PoseDataSource(recs, cfg, seed=9, bucket_step=32)
    su = PoseDataSource(recs, cfg, seed=9, bucket_step=32, uint8_images=True)
    bf = sf.next_batch(3)
    bu = su.next_batch(3)
    assert bu["image"].dtype == np.uint8
    np.testing.assert_array_equal(
        np.asarray(prepare_input(jnp.asarray(bu["image"]))), bf["image"])
    for k in bf:
        if k != "image":
            np.testing.assert_array_equal(bf[k], bu[k], err_msg=k)

    # one train step: identical params either way
    from deepcut_tpu.models.resnet import DeeperCutConfig, init_params
    from deepcut_tpu.parallel.train_step import make_train_step
    from deepcut_tpu.solver.update_rules import SolverConfig, init_state

    mcfg = DeeperCutConfig(depths=(1, 1, 1, 1), stage_widths=(4, 4, 8, 8),
                           num_joints=14, pairwise=False,
                           compute_dtype=jnp.float32)
    scfg = SolverConfig(solver_type="SGD", base_lr=0.05, momentum=0.9)
    params = init_params(jax.random.PRNGKey(0), mcfg)
    step = make_train_step(mcfg, scfg, None, donate=False)
    outs = []
    for batch in (bf, bu):
        b = {k: jnp.asarray(v) for k, v in batch.items()}
        p2, _, m = step(params, init_state(scfg, params), b)
        outs.append((p2, float(m["total_loss"])))
    assert outs[0][1] == outs[1][1]
    for a, b in zip(jax.tree_util.tree_leaves(outs[0][0]),
                    jax.tree_util.tree_leaves(outs[1][0])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_warp_image_matches_pointwise_oracle():
    """The scipy-lowered affine warp (pose/augment.warp_image) must equal an
    independently written per-pixel bilinear gather with mean-fill outside
    the source — the reference's border extrapolation toward the mean
    (transform_image.cpp:9-107) — including the blended border band.

    Tolerance: cv2's bilinear quantizes sample coordinates to 1/32 px via
    its interpolation tables, so values may differ from exact float
    bilinear by up to ~2 grey levels at sharp edges; the mean must stay
    well under one grey level. (The scipy fallback is exact to 2e-3 —
    asserted separately below.)"""
    from deepcut_tpu.pose.augment import affine_about, warp_image

    rng = np.random.RandomState(5)
    img = rng.randint(0, 255, (37, 53, 3)).astype(np.uint8)
    fill = (104.0, 117.0, 123.0)
    for angle, scale, center in [(12.5, 1.1, (20.0, 15.0)),
                                 (-30.0, 0.8, (0.0, 0.0)),
                                 (0.0, 1.35, (26.5, 18.5))]:
        M = affine_about(center, angle, scale)
        got = warp_image(img, M, img.shape[:2], fill=fill)

        Minv = np.linalg.inv(np.vstack([M, [0.0, 0.0, 1.0]]))
        H, W = img.shape[:2]
        fillv = np.asarray(fill, np.float64)
        want = np.empty((H, W, 3), np.float64)
        for oy in range(H):
            for ox in range(W):
                sx = Minv[0, 0] * ox + Minv[0, 1] * oy + Minv[0, 2]
                sy = Minv[1, 0] * ox + Minv[1, 1] * oy + Minv[1, 2]
                x0, y0 = int(np.floor(sx)), int(np.floor(sy))
                fx, fy = sx - x0, sy - y0
                acc = np.zeros(3, np.float64)
                for dy, wy in ((0, 1 - fy), (1, fy)):
                    for dx, wx in ((0, 1 - fx), (1, fx)):
                        yy, xx = y0 + dy, x0 + dx
                        v = (img[yy, xx].astype(np.float64)
                             if 0 <= yy < H and 0 <= xx < W else fillv)
                        acc += wy * wx * v
                want[oy, ox] = acc
        import deepcut_tpu.pose.augment as aug
        if aug._cv2 is not None:
            # 1/32-px coordinate quantization on 255-level noise bounds the
            # pointwise error near ~8 grey levels; the mean is the signal
            assert np.max(np.abs(got - want)) < 8.0
            assert np.mean(np.abs(got - want)) < 0.5
            # the scipy fallback keeps exact float coefficients
            cv2_save, aug._cv2 = aug._cv2, None
            try:
                got_scipy = warp_image(img, M, img.shape[:2], fill=fill)
            finally:
                aug._cv2 = cv2_save
            np.testing.assert_allclose(got_scipy, want, atol=2e-3)
        else:
            np.testing.assert_allclose(got, want, atol=2e-3)


def test_prepare_canvas_uint8_rejects_bad_inputs():
    """The uint8 canvas contract (device-side subtract of an integer mean)
    must fail loudly on float images or non-integer means instead of
    silently wrapping into the uint8 buffer."""
    from deepcut_tpu.data.pipeline import prepare_canvas

    img_f = np.random.RandomState(0).rand(40, 50, 3).astype(np.float32)
    with pytest.raises(TypeError, match="uint8"):
        prepare_canvas(img_f, 1.0, 64, 64, uint8=True)
    img_u = (img_f * 255).astype(np.uint8)
    with pytest.raises(ValueError, match="integer mean"):
        prepare_canvas(img_u, 1.0, 64, 64, mean=(104.5, 117.0, 123.0),
                       uint8=True)
    out = prepare_canvas(img_u, 1.0, 64, 64, uint8=True)
    assert out.dtype == np.uint8
