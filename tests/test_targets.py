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
