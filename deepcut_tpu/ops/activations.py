"""Elementwise activation / math ops matching Caffe layer semantics.

These are thin: XLA fuses them into neighbouring convs, so unlike the
reference (one CUDA kernel launch per layer) they cost no extra HBM traffic.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def relu(x: jax.Array, *, negative_slope: float = 0.0) -> jax.Array:
    """ReLU with optional leak (relu_layer.cpp).

    The where-form (not jnp.maximum) so the GRADIENT at exactly 0 is 0,
    Caffe's strict `bottom_data > 0` backward gate (relu_layer.cpp:31-43;
    jnp.maximum splits the tie and passes 0.5). Measure-zero for fresh
    activations, but load-bearing when a partial backward re-runs an
    in-place ReLU on already-rectified values (pycaffe backward(end=...)),
    where every rectified entry sits exactly at 0."""
    if negative_slope == 0.0:
        return jnp.where(x > 0, x, jnp.zeros((), x.dtype))
    return jnp.where(x > 0, x, x * jnp.asarray(negative_slope, x.dtype))


def sigmoid(x: jax.Array) -> jax.Array:
    return jax.nn.sigmoid(x)


def tanh(x: jax.Array) -> jax.Array:
    return jnp.tanh(x)


def elu(x: jax.Array, *, alpha: float = 1.0) -> jax.Array:
    return jnp.where(x > 0, x, alpha * (jnp.exp(jnp.minimum(x, 0)) - 1))


def prelu(x: jax.Array, slopes: jax.Array, *, channel_shared: bool = False) -> jax.Array:
    """PReLU (prelu_layer.cpp): learned per-channel (or shared) slope. NHWC."""
    a = slopes.reshape(()) if channel_shared else slopes
    return jnp.where(x > 0, x, x * a.astype(x.dtype))


def bnll(x: jax.Array) -> jax.Array:
    """BNLL (bnll_layer.cpp): log(1 + exp(x)), overflow-safe as in reference."""
    return jnp.where(x > 0, x + jnp.log1p(jnp.exp(-x)), jnp.log1p(jnp.exp(x)))


def exp_op(x: jax.Array, *, base: float = -1.0, scale: float = 1.0, shift: float = 0.0) -> jax.Array:
    """Exp layer: y = base^(shift + scale*x); base=-1 means e (exp_layer.cpp)."""
    z = shift + scale * x.astype(jnp.float32)
    y = jnp.exp(z) if base == -1.0 else jnp.power(base, z)
    return y.astype(x.dtype)


def log_op(x: jax.Array, *, base: float = -1.0, scale: float = 1.0, shift: float = 0.0) -> jax.Array:
    """Log layer: y = log_base(shift + scale*x) (log_layer.cpp)."""
    z = shift + scale * x.astype(jnp.float32)
    y = jnp.log(z)
    if base != -1.0:
        y = y / jnp.log(base)
    return y.astype(x.dtype)


def power_op(x: jax.Array, *, power: float = 1.0, scale: float = 1.0, shift: float = 0.0) -> jax.Array:
    """Power layer: y = (shift + scale*x)^power (power_layer.cpp)."""
    z = shift + scale * x.astype(jnp.float32)
    y = z if power == 1.0 else jnp.power(z, power)
    return y.astype(x.dtype)


def threshold(x: jax.Array, *, t: float = 0.0) -> jax.Array:
    """Threshold layer: y = 1[x > t] (threshold_layer.cpp)."""
    return (x > t).astype(x.dtype)


def absval(x: jax.Array) -> jax.Array:
    return jnp.abs(x)


def dropout(
    x: jax.Array,
    rng: Optional[jax.Array],
    *,
    ratio: float = 0.5,
    deterministic: bool = False,
) -> jax.Array:
    """Dropout with Caffe's inverted scaling (dropout_layer.cpp): at train time
    kept units are scaled by 1/(1-ratio); at test time identity."""
    if deterministic or rng is None or ratio == 0.0:
        return x
    from deepcut_tpu.ops.shard_rng import draw_batched
    keep = draw_batched(
        lambda shape: jax.random.bernoulli(rng, 1.0 - ratio, shape), x.shape)
    return jnp.where(keep, x / (1.0 - ratio), 0).astype(x.dtype)
