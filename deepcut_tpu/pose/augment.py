"""Rotation + scale augmentation (reference: src/caffe/pose/transform_image.cpp).

The reference utility (dormant there — no callers) warps the image about the
joint bounding-box centre with smooth border extrapolation toward the mean
pixel, returning the cropped image and the composite 2x3 affine transform so
joint coordinates can be mapped. Offered here as an optional augmentation
hook for PoseDataSource.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np

from deepcut_tpu.data.window_file import ImageRecord, Person


def affine_about(center: Tuple[float, float], angle_deg: float, scale: float) -> np.ndarray:
    """2x3 matrix rotating by angle about center with isotropic scale
    (cv2.getRotationMatrix2D semantics)."""
    a = math.radians(angle_deg)
    alpha = scale * math.cos(a)
    beta = scale * math.sin(a)
    cx, cy = center
    return np.array([
        [alpha, beta, (1 - alpha) * cx - beta * cy],
        [-beta, alpha, beta * cx + (1 - alpha) * cy],
    ], np.float64)


def apply_affine_points(M: np.ndarray, xy: np.ndarray) -> np.ndarray:
    return xy @ M[:, :2].T + M[:, 2]


def warp_image(image: np.ndarray, M: np.ndarray, out_hw: Tuple[int, int],
               fill: Tuple[float, float, float] = (104.0, 117.0, 123.0)) -> np.ndarray:
    """Inverse-mapped bilinear warp with mean-pixel fill (the reference's
    border extrapolation toward the mean)."""
    h, w = out_hw
    Minv = np.linalg.inv(np.vstack([M, [0, 0, 1]]))[:2]
    ys, xs = np.mgrid[0:h, 0:w]
    pts = np.stack([xs.ravel(), ys.ravel()], axis=1).astype(np.float64)
    src = apply_affine_points(Minv, pts)
    x0 = np.floor(src[:, 0]).astype(int)
    y0 = np.floor(src[:, 1]).astype(int)
    fx = (src[:, 0] - x0)[:, None]
    fy = (src[:, 1] - y0)[:, None]
    H, W = image.shape[:2]
    fillv = np.asarray(fill, np.float32)

    def sample(yy, xx):
        inside = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
        vals = np.where(inside[:, None],
                        image[np.clip(yy, 0, H - 1), np.clip(xx, 0, W - 1)].astype(np.float32),
                        fillv)
        return vals

    v00 = sample(y0, x0)
    v01 = sample(y0, x0 + 1)
    v10 = sample(y0 + 1, x0)
    v11 = sample(y0 + 1, x0 + 1)
    out = (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
           + v10 * (1 - fx) * fy + v11 * fx * fy)
    return out.reshape(h, w, -1).astype(np.float32)


def augment_record(
    record: ImageRecord,
    image: np.ndarray,
    rng: np.random.RandomState,
    *,
    max_rotation_deg: float = 15.0,
    scale_range: Tuple[float, float] = (0.85, 1.15),
) -> Tuple[np.ndarray, ImageRecord]:
    """Random rotation+scale about the first person's joint-bbox centre;
    returns (warped image, record with transformed joints)."""
    if not record.people:
        return image, record
    all_xy = np.concatenate([p.xy for p in record.people])
    center = ((all_xy[:, 0].min() + all_xy[:, 0].max()) / 2.0,
              (all_xy[:, 1].min() + all_xy[:, 1].max()) / 2.0)
    angle = rng.uniform(-max_rotation_deg, max_rotation_deg)
    scale = rng.uniform(*scale_range)
    M = affine_about(center, angle, scale)
    warped = warp_image(image, M, image.shape[:2]).astype(np.uint8)
    people = [Person(p.classes.copy(),
                     apply_affine_points(M, p.xy).astype(np.float32))
              for p in record.people]
    new_rec = ImageRecord(record.path, record.channels, record.height,
                          record.width, people, record.multi)
    return warped, new_rec
