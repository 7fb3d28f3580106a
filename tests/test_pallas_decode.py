"""Pallas fused argmax decode vs the XLA reference decode (exact agreement).

Runs the kernel in interpret mode on CPU; on a real TPU platform the
compiled kernel path is exercised too.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepcut_tpu.pose.decode import decode_pose
from deepcut_tpu.ops.pallas_decode import decode_pose_pallas, joint_argmax

INTERPRET = jax.default_backend() != "tpu"


@pytest.mark.parametrize("h,w,J", [(12, 9, 14), (87, 87, 14), (250, 188, 14)])
def test_pallas_argmax_matches_numpy(h, w, J):
    rng = np.random.RandomState(h + w)
    sm = rng.randn(h, w, J).astype(np.float32)
    maxv, idx = joint_argmax(jnp.asarray(sm), interpret=INTERPRET)
    flat = sm.reshape(-1, J)
    np.testing.assert_allclose(np.asarray(maxv), flat.max(axis=0), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(idx), flat.argmax(axis=0))


def test_pallas_argmax_tie_breaks_first():
    sm = np.zeros((16, 16, 2), np.float32)
    sm[3, 3, 0] = 5.0
    sm[10, 10, 0] = 5.0   # tie: earlier (row-major) position must win
    sm[12, 1, 1] = 2.0
    maxv, idx = joint_argmax(jnp.asarray(sm), interpret=INTERPRET)
    assert int(idx[0]) == 3 * 16 + 3
    assert int(idx[1]) == 12 * 16 + 1


def test_pallas_decode_matches_reference():
    rng = np.random.RandomState(0)
    h, w, J = 40, 56, 14
    sm = rng.rand(h, w, J).astype(np.float32)
    loc = rng.randn(h, w, 2 * J).astype(np.float32) * 0.1
    ref = np.asarray(decode_pose(jnp.asarray(sm), jnp.asarray(loc), scale=1.3))
    got = np.asarray(decode_pose_pallas(jnp.asarray(sm), jnp.asarray(loc),
                                        scale=1.3, interpret=INTERPRET))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
