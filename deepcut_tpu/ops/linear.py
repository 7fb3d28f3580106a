"""Dense ops: InnerProduct, Embed, ArgMax, Softmax — MXU-shaped matmuls.

InnerProduct (src/caffe/layers/inner_product_layer.cpp): flattens from `axis`
onward and multiplies by a (N_out, K) weight (optionally pre-transposed).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def inner_product(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    *,
    axis: int = 1,
    transpose: bool = False,
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """y = flatten(x) @ W^T (+ b). w: (N_out, K) Caffe layout, or (K, N_out)
    when transpose=True (matching InnerProductParameter.transpose)."""
    lead = x.shape[:axis]
    k = 1
    for d in x.shape[axis:]:
        k *= d
    xf = x.reshape((-1, k))
    out_dtype = x.dtype
    if compute_dtype is not None:
        xf = xf.astype(compute_dtype)
        w = w.astype(compute_dtype)
    wm = w if transpose else w.T
    y = jnp.dot(xf, wm, preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y.reshape(lead + (y.shape[-1],)).astype(out_dtype)


def embed(
    ids: jax.Array, table: jax.Array, b: Optional[jax.Array] = None
) -> jax.Array:
    """Embed layer: one-hot lookup (embed_layer.cpp). table: (V, D)."""
    y = jnp.take(table, ids.astype(jnp.int32), axis=0)
    if b is not None:
        y = y + b
    return y


def softmax_op(x: jax.Array, *, axis: int) -> jax.Array:
    return jax.nn.softmax(x.astype(jnp.float32), axis=axis).astype(x.dtype)


def argmax_op(x: jax.Array, *, axis: Optional[int] = None, top_k: int = 1, out_max_val: bool = False):
    """ArgMax layer (argmax_layer.cpp). With axis: argmax along it; without:
    argmax over flattened trailing dims per batch item."""
    if axis is None:
        n = x.shape[0]
        flat = x.reshape(n, -1)
        idx = jnp.argsort(-flat, axis=1)[:, :top_k].astype(jnp.float32)
        if out_max_val:
            vals = -jnp.sort(-flat, axis=1)[:, :top_k]
            return jnp.stack([idx, vals], axis=1)
        return idx[:, None, :]
    # with axis the output KEEPS the axis, resized to top_k
    # (argmax_layer.cpp:38-41: shape[axis] = top_k)
    xm = jnp.moveaxis(x, axis, -1)
    order = jnp.argsort(-xm, axis=-1)[..., :top_k]
    if out_max_val:
        vals = jnp.take_along_axis(xm, order, axis=-1)
        return jnp.moveaxis(vals, -1, axis)
    return jnp.moveaxis(order.astype(jnp.float32), -1, axis)
