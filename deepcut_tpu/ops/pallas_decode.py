"""Pallas TPU kernel: fused per-joint argmax reduction over scoremaps.

Used by the HD multi-person decode path: one pass over the (J, H*W) logit
matrix in VMEM tiles, producing per-joint (max, argmax) without
materialising intermediates in HBM. The tiny offset gather that follows
stays in XLA.

Note on scope: the conv path deliberately has NO custom kernels — measured
XLA conv efficiency on the MXU (~57% on the dominant 3x3/512 shapes) leaves
too little headroom to justify hand-written convolutions. Reductions with
index bookkeeping like this one are where a fused kernel pays.

Layout: positions ride the 128-lane dimension ((J, P) with P = H*W), so the
VPU reduces across lanes; J sits on sublanes.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_P = 2048  # positions per grid step (lane-dim tile)


def _argmax_kernel(sm_ref, max_ref, idx_ref):
    step = pl.program_id(0)
    tile = sm_ref[...]  # (J, TILE_P) VMEM block
    jdim, tp = tile.shape
    tmax = jnp.max(tile, axis=1)                       # (J,)
    targ = jnp.argmax(tile, axis=1) + step * tp        # (J,) global flat idx

    @pl.when(step == 0)
    def _():
        max_ref[...] = tmax[:, None]
        idx_ref[...] = targ[:, None].astype(jnp.int32)

    @pl.when(step > 0)
    def _():
        better = tmax[:, None] > max_ref[...]
        idx_ref[...] = jnp.where(better, targ[:, None].astype(jnp.int32), idx_ref[...])
        max_ref[...] = jnp.maximum(tmax[:, None], max_ref[...])


@functools.partial(jax.jit, static_argnames=("interpret",))
def joint_argmax(scores: jax.Array, *, interpret: bool = False) -> Tuple[jax.Array, jax.Array]:
    """scores: (h, w, J) -> (max (J,), flat argmax (J,)) over h*w.

    Ties resolve to the earliest position (row-major), matching
    np.argmax/np.unravel_index semantics in the reference decode.
    """
    h, w, J = scores.shape
    P = h * w
    smT = scores.astype(jnp.float32).reshape(P, J).T       # (J, P)
    pad = (-P) % TILE_P
    if pad:
        smT = jnp.pad(smT, ((0, 0), (0, pad)), constant_values=-jnp.inf)
    n_tiles = smT.shape[1] // TILE_P
    maxv, idx = pl.pallas_call(
        _argmax_kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((J, TILE_P), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((J, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((J, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((J, 1), jnp.float32),
            jax.ShapeDtypeStruct((J, 1), jnp.int32),
        ),
        interpret=interpret,
    )(smT)
    return maxv[:, 0], idx[:, 0]


def decode_pose_pallas(scoremaps: jax.Array, locref: jax.Array, *,
                       scale: float = 1.0, stride: float = 8.0,
                       locref_mul: float = 7.2801098892805181,
                       interpret: bool = False) -> jax.Array:
    """Drop-in for pose.decode.decode_pose using the fused pallas argmax."""
    h, w, J = scoremaps.shape
    conf, idx = joint_argmax(scoremaps, interpret=interpret)
    row = (idx // w).astype(jnp.float32)
    col = (idx % w).astype(jnp.float32)
    off = locref.astype(jnp.float32).reshape(h * w, J, 2)
    off_j = off[idx, jnp.arange(J)]
    x = (col * stride + 0.5 * stride + off_j[:, 0] * locref_mul) / scale
    y = (row * stride + 0.5 * stride + off_j[:, 1] * locref_mul) / scale
    # rows 3-4 in the reference's (offset_y, offset_x) order — see
    # pose/decode.py
    return jnp.stack([x, y, conf, off_j[:, 1] * locref_mul / scale,
                      off_j[:, 0] * locref_mul / scale], axis=0)
