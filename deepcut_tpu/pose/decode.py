"""On-device keypoint decode: argmax + location-refinement offsets.

Reference does this host-side in numpy (_pose_from_mats,
python/pose/estimate_pose.py:131-143); here it is a jitted device function
fused with the forward pass, so only the 5x14 pose leaves the chip.

Semantics (exact): per joint j, maxloc = argmax of scoremap[:, :, j];
position = maxloc*8 + 4 + offset*sqrt(53); channels of loc_pred pair as
(2j = x-offset, 2j+1 = y-offset); returned pose row layout is
[x, y, confidence, offset_y, offset_x] (the reference's order — it
reuses the reversed pair, estimate_pose.py:137-142) with x/y/offsets
divided by the
pyramid scale.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

STRIDE = 8.0
LOCREF_SCALE = 7.2801098892805181  # sqrt(53), estimate_pose.py:27


def decode_pose(
    scoremaps: jax.Array,
    locref: jax.Array,
    *,
    scale: float = 1.0,
    valid_hw: Optional[Tuple[jax.Array, jax.Array]] = None,
) -> jax.Array:
    """(h, w, J) scoremaps + (h, w, 2J) locref -> (5, J) pose.

    valid_hw: optional (vh, vw) masking for bucket-padded inputs — cells at
    row >= vh or col >= vw are excluded from the argmax.
    """
    h, w, J = scoremaps.shape
    sm = scoremaps.astype(jnp.float32)
    if valid_hw is not None:
        vh, vw = valid_hw
        rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        mask = (rows < vh) & (cols < vw)
        sm = jnp.where(mask[:, :, None], sm, -jnp.inf)
    flat = sm.reshape(h * w, J)
    idx = jnp.argmax(flat, axis=0)                      # (J,)
    conf = jnp.max(flat, axis=0)
    row = (idx // w).astype(jnp.float32)
    col = (idx % w).astype(jnp.float32)
    off = locref.astype(jnp.float32).reshape(h * w, J, 2)
    off_j = off[idx, jnp.arange(J)]                     # (J, 2): [x_off, y_off]
    x = (col * STRIDE + 0.5 * STRIDE + off_j[:, 0] * LOCREF_SCALE) / scale
    y = (row * STRIDE + 0.5 * STRIDE + off_j[:, 1] * LOCREF_SCALE) / scale
    # rows 3-4 are (offset_y, offset_x) — the reference emits the REVERSED
    # offset pair it used for the (row, col) position math without undoing
    # the reversal (estimate_pose.py:137-142: `offset = ...[::-1]` then
    # `hstack((..., offset * _LOCREF_SCALE_MUL / scale))`)
    return jnp.stack([x, y, conf,
                      off_j[:, 1] * LOCREF_SCALE / scale,
                      off_j[:, 0] * LOCREF_SCALE / scale], axis=0)


def decode_pose_batch(scoremaps: jax.Array, locref: jax.Array, *, scale: float = 1.0) -> jax.Array:
    """(N, h, w, J) + (N, h, w, 2J) -> (N, 5, J)."""
    return jax.vmap(lambda s, l: decode_pose(s, l, scale=scale))(scoremaps, locref)
