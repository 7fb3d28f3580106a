"""RPN + sticks-segmentation target builders: geometric invariants."""

import numpy as np

from deepcut_tpu.data.window_file import Person
from deepcut_tpu.pose.aux_targets import (
    rpn_targets, sticks_segmentation, rect_iou, contour_centroid,
    points_in_polygon, convex_hull, ANCHORS, NUM_SEGM_CLASSES, IGNORE_VALUE,
)


def test_rect_iou():
    assert rect_iou((0, 0, 10, 10), (0, 0, 10, 10)) == 1.0
    assert rect_iou((0, 0, 10, 10), (5, 0, 10, 10)) == 50.0 / 150.0
    assert rect_iou((0, 0, 0.05, 0.05), (10, 10, 0.05, 0.05)) == -1.0


def test_contour_centroid_square():
    sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], np.float32)
    np.testing.assert_allclose(contour_centroid(sq), [5, 5], atol=1e-5)


def test_point_in_polygon():
    poly = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], np.float32)
    pts = np.array([[5, 5], [10, 5], [11, 5], [-0.1, 0]], np.float32)
    got = points_in_polygon(pts, poly)
    assert list(got) == [True, True, False, False]


def test_convex_hull_contains_inputs():
    rng = np.random.RandomState(0)
    pts = rng.rand(20, 2) * 10
    hull = convex_hull(pts)
    assert points_in_polygon(pts, hull, eps=1e-4).all()


def _person():
    """Joints laid out around a rough body outline (angular order), so the
    joint polygon is simple — like real MPII annotations. Degenerate
    (self-intersecting) orders put the contour centroid far outside, which
    faithfully mirrors cv::moments but makes no positives."""
    classes = np.arange(1, 15, dtype=np.int32)
    rng = np.random.RandomState(1)
    angles = np.sort(rng.uniform(0, 2 * np.pi, 14))
    radius = rng.uniform(40, 90, 14)
    cx, cy = 130.0, 180.0
    xy = np.stack([cx + radius * np.cos(angles),
                   cy + radius * np.sin(angles)], 1).astype(np.float32)
    return Person(classes, xy)


def test_rpn_targets_shapes_and_semantics():
    p = _person()
    cls, reg, reg_w = rpn_targets(p, 40, 30, 40, 30, rng=np.random.RandomState(0))
    assert cls.shape == (40, 30, 5)
    assert reg.shape == (40, 30, 20)
    pos_cells = np.argwhere((cls == 1.0).any(axis=2))
    assert len(pos_cells) > 0
    # positives only near the center of mass (<=17px)
    cm = contour_centroid(p.xy)
    for j, i in pos_cells:
        center = np.array([i * 8 + 4, j * 8 + 4], np.float32)
        assert np.linalg.norm(center - cm) <= 17.0 + 1e-4
    # exactly one positive anchor per positive cell; its 4 reg weights set
    j, i = pos_cells[0]
    k = int(np.argmax(cls[j, i] == 1.0))
    assert (cls[j, i] == 1.0).sum() == 1
    assert reg_w[j, i, 4 * k:4 * k + 4].sum() == 4
    # reg targets reconstruct the box center
    ratio, w_a = ANCHORS[k]
    h_a = w_a * ratio
    x_a, y_a = i * 8 + 4, j * 8 + 4
    # the box is cv::boundingRect's INTEGER rect (rpn_targets.cpp:81):
    # floored origin, width = floor(max) - floor(min) + 1, exclusive br
    bx = np.floor(p.xy[:, 0].min()); by = np.floor(p.xy[:, 1].min())
    bw = np.floor(p.xy[:, 0].max()) - bx + 1
    bh = np.floor(p.xy[:, 1].max()) - by + 1
    np.testing.assert_allclose(reg[j, i, 4 * k] * w_a + x_a, bx + bw / 2, rtol=1e-4)
    np.testing.assert_allclose(np.exp(reg[j, i, 4 * k + 2]) * w_a, bw, rtol=1e-4)
    np.testing.assert_allclose(np.exp(reg[j, i, 4 * k + 3]) * h_a, bh, rtol=1e-4)
    # negatives sampled: ~3x positives cells set to all-zeros
    neg_cells = ((cls == 0.0).all(axis=2)).sum()
    assert neg_cells > 0


def test_sticks_segmentation():
    p = _person()
    lab = sticks_segmentation(p, 40, 30, rng=np.random.RandomState(0))
    assert lab.shape == (40, 30, NUM_SEGM_CLASSES)
    # every class with both joints present has some positives
    assert (lab == 1.0).any()
    # values restricted to {0, 1, IGNORE}
    vals = set(np.unique(lab))
    assert vals <= {0.0, 1.0, IGNORE_VALUE}
    # cross-class negation runs BEFORE the torso rasterization
    # (segment_parts.cpp:252 then :259-317): at STICK-positive cells no
    # channel stays IGNORE; at torso-ONLY cells the stick channels DO stay
    # IGNORE (the reference never revisits them after the hull pass).
    stick_pos = (lab[:, :, :-1] == 1.0).any(axis=2)
    others_ign = (lab == IGNORE_VALUE) & stick_pos[:, :, None]
    assert not others_ign.any()
    torso_only = (lab[:, :, -1] == 1.0) & ~stick_pos
    assert torso_only.any()
    assert (lab[:, :, :-1][torso_only] == IGNORE_VALUE).any()


def test_sticks_missing_joints():
    p = Person(np.array([1, 2], np.int32),
               np.array([[50, 50], [80, 80]], np.float32))
    lab = sticks_segmentation(p, 20, 20, rng=np.random.RandomState(0))
    assert (lab[:, :, 0] == 1.0).any()       # stick (1,2) present
    assert (lab[:, :, 8] != 1.0).all()       # head stick missing
    assert (lab[:, :, 9] != 1.0).all()       # torso missing
