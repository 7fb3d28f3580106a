"""Eltwise / blob-shape ops: SUM/PROD/MAX fusion, Crop, Concat, Slice, Tile...

Eltwise (src/caffe/layers/eltwise_layer.cpp): default op SUM with per-input
coefficients; DeeperCut uses it for residual adds and head fusion.

Crop (src/caffe/layers/crop_layer.cpp, CropParameter caffe.proto:610-615):
crops bottom[0] to bottom[1]'s shape from `axis` (default 2 == H in NCHW)
onward, at integer offsets (default 0). DeeperCut's heads rely on the default:
top-left crop of the (2H+1)-sized deconv output to the skip branch's 2H.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def eltwise_sum(inputs: Sequence[jax.Array], coeffs: Optional[Sequence[float]] = None) -> jax.Array:
    if coeffs is None:
        out = inputs[0]
        for t in inputs[1:]:
            out = out + t
        return out
    if len(coeffs) != len(inputs):
        # eltwise_layer.cpp:18-20 CHECKs coeff count == bottom count (or 0);
        # silently zipping would drop inputs
        raise ValueError(
            f"Eltwise SUM: {len(coeffs)} coeffs for {len(inputs)} bottoms "
            "(must match or be omitted)")
    out = None
    for t, c in zip(inputs, coeffs):
        term = t if c == 1.0 else t * jnp.asarray(c, t.dtype)
        out = term if out is None else out + term
    return out


def eltwise_prod(inputs: Sequence[jax.Array]) -> jax.Array:
    out = inputs[0]
    for t in inputs[1:]:
        out = out * t
    return out


def eltwise_max(inputs: Sequence[jax.Array]) -> jax.Array:
    out = inputs[0]
    for t in inputs[1:]:
        out = jnp.maximum(out, t)
    return out


def crop_like(
    x: jax.Array,
    ref_shape: Sequence[int],
    *,
    axis: int = 1,
    offsets: Sequence[int] = (),
) -> jax.Array:
    """Crop `x` (NHWC) to `ref_shape` (NHWC) from `axis` onward.

    `axis` follows NHWC numbering here; the graph layer translates Caffe's
    NCHW axis (default 2 = H) to NHWC (1 = H). Offsets default to 0 (top-left),
    matching DeeperCut's head alignment.
    """
    ndim = x.ndim
    starts = [0] * ndim
    sizes = list(x.shape)
    for i in range(axis, ndim):
        off_idx = i - axis
        off = offsets[off_idx] if off_idx < len(offsets) else (offsets[0] if len(offsets) == 1 else 0)
        starts[i] = off
        sizes[i] = int(ref_shape[i])
    slices = tuple(slice(s, s + z) for s, z in zip(starts, sizes))
    return x[slices]


def concat(inputs: Sequence[jax.Array], *, axis: int) -> jax.Array:
    return jnp.concatenate(list(inputs), axis=axis)


def slice_op(x: jax.Array, *, axis: int, slice_points: Sequence[int], num_outputs: int):
    """Caffe Slice layer: split along axis at slice_points (or evenly)."""
    size = x.shape[axis]
    if slice_points:
        points = [0] + list(slice_points) + [size]
    else:
        if size % num_outputs:
            # Caffe rejects uneven even-splits (slice_layer.cpp
            # CHECK_EQ(size % num, 0)); silently emitting an oversized
            # last slice would mis-shape downstream layers
            raise ValueError(
                f"Slice: axis size {size} not divisible by {num_outputs} tops"
                " (set slice_point for uneven splits)")
        step = size // num_outputs
        points = [i * step for i in range(num_outputs)] + [size]
    outs = []
    for a, b in zip(points[:-1], points[1:]):
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(a, b)
        outs.append(x[tuple(idx)])
    return outs


def tile_op(x: jax.Array, *, axis: int, tiles: int) -> jax.Array:
    reps = [1] * x.ndim
    reps[axis] = tiles
    return jnp.tile(x, reps)


def flatten_op(x: jax.Array, *, axis: int = 1, end_axis: int = -1) -> jax.Array:
    nd = x.ndim
    if end_axis < 0:
        end_axis += nd
    shape = list(x.shape[:axis]) + [-1] + list(x.shape[end_axis + 1:])
    return x.reshape(shape)


def split_op(x: jax.Array, num: int):
    """Caffe Split layer: identity fan-out (gradients sum automatically in JAX)."""
    return [x] * num


def batch_reindex(x: jax.Array, indices: jax.Array) -> jax.Array:
    """BatchReindex layer: gather along the batch dimension."""
    return jnp.take(x, indices.astype(jnp.int32), axis=0)


def reduction_op(x: jax.Array, *, op: str = "SUM", axis: int = 0, coeff: float = 1.0) -> jax.Array:
    """Reduction layer: reduce trailing axes from `axis` onward to a vector."""
    nd = x.ndim
    if axis < 0:
        axis += nd
    axes = tuple(range(axis, nd))
    xf = x.astype(jnp.float32)
    if op == "SUM":
        y = jnp.sum(xf, axis=axes)
    elif op == "ASUM":
        y = jnp.sum(jnp.abs(xf), axis=axes)
    elif op == "SUMSQ":
        y = jnp.sum(jnp.square(xf), axis=axes)
    elif op == "MEAN":
        y = jnp.mean(xf, axis=axes)
    else:
        raise ValueError(f"unknown reduction {op}")
    return (y * coeff).astype(x.dtype)
