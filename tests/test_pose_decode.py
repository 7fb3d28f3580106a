"""Keypoint decode vs a numpy transcription of _pose_from_mats
(python/pose/estimate_pose.py:131-143)."""

import numpy as np
import jax.numpy as jnp

from deepcut_tpu.pose.decode import decode_pose, STRIDE, LOCREF_SCALE


def _reference_decode(scoremat, offmat, scale):
    """Literal numpy port of the reference decode (offmat: (h, w, J, 2))."""
    pose = []
    for j in range(scoremat.shape[2]):
        maxloc = np.unravel_index(np.argmax(scoremat[:, :, j]), scoremat.shape[:2])
        offset = offmat[maxloc][j][::-1]          # -> (y_off, x_off)
        pos_f8 = (np.array(maxloc, float) * STRIDE + 0.5 * STRIDE
                  + offset * LOCREF_SCALE)
        # NOTE: the reference hstacks `offset` (the REVERSED (y, x) pair)
        # without a second [::-1] — rows 3-4 are (offset_y, offset_x)
        pose.append(np.hstack((pos_f8[::-1] / scale,
                               [scoremat[maxloc][j]],
                               offset * LOCREF_SCALE / scale)))
    return np.array(pose).T


def test_decode_matches_reference():
    rng = np.random.RandomState(0)
    h, w, J = 12, 9, 14
    sm = rng.rand(h, w, J).astype(np.float32)
    loc = rng.randn(h, w, 2 * J).astype(np.float32) * 0.1
    for scale in (1.0, 0.5, 1.3):
        got = np.asarray(decode_pose(jnp.asarray(sm), jnp.asarray(loc), scale=scale))
        ref = _reference_decode(sm, loc.reshape(h, w, J, 2), scale)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_decode_known_peak():
    h, w, J = 10, 10, 2
    sm = np.zeros((h, w, J), np.float32)
    sm[3, 7, 0] = 0.9
    sm[5, 2, 1] = 0.8
    loc = np.zeros((h, w, 2 * J), np.float32)
    loc[3, 7, 0] = 0.5   # x-offset joint 0
    loc[3, 7, 1] = -0.25  # y-offset joint 0
    pose = np.asarray(decode_pose(jnp.asarray(sm), jnp.asarray(loc)))
    np.testing.assert_allclose(pose[0, 0], 7 * 8 + 4 + 0.5 * LOCREF_SCALE, rtol=1e-6)
    np.testing.assert_allclose(pose[1, 0], 3 * 8 + 4 - 0.25 * LOCREF_SCALE, rtol=1e-6)
    np.testing.assert_allclose(pose[2], [0.9, 0.8], rtol=1e-6)
    np.testing.assert_allclose(pose[0, 1], 2 * 8 + 4)


def test_decode_masked_bucket_padding():
    h, w, J = 8, 8, 1
    sm = np.zeros((h, w, J), np.float32)
    sm[2, 2, 0] = 0.5
    sm[7, 7, 0] = 0.9   # in the padded region -> must be masked out
    loc = np.zeros((h, w, 2 * J), np.float32)
    pose = np.asarray(decode_pose(jnp.asarray(sm), jnp.asarray(loc),
                                  valid_hw=(jnp.int32(6), jnp.int32(6))))
    np.testing.assert_allclose(pose[0, 0], 2 * 8 + 4)
    np.testing.assert_allclose(pose[2, 0], 0.5)
