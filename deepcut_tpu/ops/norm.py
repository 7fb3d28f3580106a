"""Normalisation ops: BatchNorm (Caffe 3-blob flavour), Scale, LRN, MVN.

Caffe's BatchNorm layer (src/caffe/layers/batch_norm_layer.cpp) has NO learned
gamma/beta — those live in a separate Scale layer. It carries three non-learned
blobs: running mean, running variance, and a moving-average *scale factor*;
the stored statistics are unscaled sums, divided by blobs[2] at use time.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


def batch_norm_inference(
    x: jax.Array,
    mean: jax.Array,
    var: jax.Array,
    scale_factor: Optional[jax.Array] = None,
    *,
    eps: float = 1e-5,
) -> jax.Array:
    """Caffe BatchNorm with use_global_stats (batch_norm_layer.cpp:9-37).

    mean/var are the raw stored blobs; if `scale_factor` (blobs[2], shape (1,)
    or scalar) is given they are divided by it first (0 -> treated as 1).
    x: (N, H, W, C); mean/var: (C,).
    """
    if scale_factor is not None:
        s = jnp.asarray(scale_factor).reshape(())
        inv = jnp.where(s == 0, 0.0, 1.0 / jnp.where(s == 0, 1.0, s))
        mean = mean * inv
        var = var * inv
    inv_std = jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    out = (x.astype(jnp.float32) - mean.astype(jnp.float32)) * inv_std
    return out.astype(x.dtype)


def bn_scale_affine(
    x: jax.Array,
    mean: jax.Array,
    var: jax.Array,
    scale_factor: Optional[jax.Array],
    gamma: jax.Array,
    beta: Optional[jax.Array] = None,
    *,
    eps: float = 1e-5,
) -> jax.Array:
    """Inference BatchNorm + Scale collapsed into ONE per-channel affine:

        y = (x - mean/s) * rsqrt(var/s + eps) * gamma + beta
          = x * g + b,   g = gamma * rsqrt(var/s + eps),  b = beta - mean/s * g

    Exactly the math of batch_norm_inference followed by scale, but the
    per-channel coefficients are folded in f32 at trace time (C elements,
    free) and the per-ELEMENT work is a single fused multiply-add in x's
    dtype instead of two full-tensor f32 passes — A/B'd at -7..8% on the
    mixed-precision train step (v5e, res2-3 and stem). Used by the unfolded
    model forward; the graph engine keeps the two separate layers the
    prototxt declares."""
    if scale_factor is not None:
        s = jnp.asarray(scale_factor).reshape(())
        inv = jnp.where(s == 0, 0.0, 1.0 / jnp.where(s == 0, 1.0, s))
        mean = mean * inv
        var = var * inv
    g = gamma.astype(jnp.float32) * jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    b = -mean.astype(jnp.float32) * g
    if beta is not None:
        b = b + beta.astype(jnp.float32)
    return x * g.astype(x.dtype) + b.astype(x.dtype)


class BNStats(NamedTuple):
    mean: jax.Array
    var: jax.Array
    scale_factor: jax.Array


# Mesh axes over which batch_norm_train reduces its batch statistics —
# set via `sharded_bn_stats` inside jax.shard_map regions so a batch that
# is sharded over 'data' (and rows over 'spatial') still normalises with
# the GLOBAL batch moments, matching the single-device trajectory. Same
# trace-time context pattern as ops.losses.sharded_losses.
_BN_PSUM_AXES: Tuple = ()


class sharded_bn_stats:
    """Context manager: `with sharded_bn_stats(("data",)): ...` makes every
    batch_norm_train traced inside compute global-batch statistics via
    lax.psum over the named mesh axes (shard_map only)."""

    def __init__(self, axes):
        self.axes = tuple(axes)

    def __enter__(self):
        global _BN_PSUM_AXES
        self._prev, _BN_PSUM_AXES = _BN_PSUM_AXES, self.axes
        return self

    def __exit__(self, *exc):
        global _BN_PSUM_AXES
        _BN_PSUM_AXES = self._prev


_BN_SHARDED_CACHE: dict = {}


def _bn_normalise_sharded(psum_axes: Tuple, eps: float):
    """(xf f32) -> y, normalising with psum'ed global-batch moments.

    custom_vjp: the psums live in the forward, and the backward implements
    the distributed BatchNorm gradient directly —
        dx = inv * (g - mean(g) - c * inv^2 * mean(g*c))
    with the two means psum'ed over the same axes (raw psum transposes to
    psum under shard_map and would inflate gradients by the axis size —
    the ops/losses.py normaliser trap)."""
    key = (psum_axes, eps)
    if key in _BN_SHARDED_CACHE:
        return _BN_SHARDED_CACHE[key]

    def moments(z):
        red = tuple(range(z.ndim - 1))
        local_m = 1.0
        for a in red:
            local_m *= z.shape[a]
        cnt = local_m * jax.lax.psum(jnp.ones((), jnp.float32), psum_axes)
        mu = jax.lax.psum(jnp.sum(z, axis=red), psum_axes) / cnt
        c = z - mu
        var = jax.lax.psum(jnp.sum(c * c, axis=red), psum_axes) / cnt
        return mu, var, cnt

    @jax.custom_vjp
    def fn(xf):
        return _fwd(xf)[0]

    def _fwd(xf):
        mu, var, cnt = moments(xf)
        inv = jax.lax.rsqrt(var + eps)
        c = xf - mu
        return c * inv, (c, inv, cnt)

    def _bwd(res, gy):
        c, inv, cnt = res
        red = tuple(range(gy.ndim - 1))
        s1 = jax.lax.psum(jnp.sum(gy, axis=red), psum_axes) / cnt
        s2 = jax.lax.psum(jnp.sum(gy * c, axis=red), psum_axes) / cnt
        return (inv * (gy - s1 - c * (inv * inv) * s2),)

    fn.defvjp(_fwd, _bwd)
    _BN_SHARDED_CACHE[key] = (fn, moments)
    return _BN_SHARDED_CACHE[key]


def batch_norm_train(
    x: jax.Array,
    stats: BNStats,
    *,
    eps: float = 1e-5,
    momentum: float = 0.999,
) -> Tuple[jax.Array, BNStats]:
    """Training-mode BatchNorm with Caffe's moving-average bookkeeping.

    Caffe updates: blobs[2] = blobs[2]*momentum + 1; blobs[0] = momentum*blobs[0]
    + batch_mean; blobs[1] = momentum*blobs[1] + m/(m-1) * batch_var (biased ->
    unbiased correction with m = N*H*W). Normalisation uses the *batch* stats.
    Functional here: returns (y, new_stats) instead of mutating blobs.

    Inside a `sharded_bn_stats` context the moments psum over the named
    mesh axes (global-batch semantics under shard_map).
    """
    xf = x.astype(jnp.float32)
    if _BN_PSUM_AXES:
        fn, moments = _bn_normalise_sharded(_BN_PSUM_AXES, eps)
        y = fn(xf)
        mu, var, cnt = moments(jax.lax.stop_gradient(xf))
        bias_corr = cnt / jnp.maximum(cnt - 1.0, 1.0)
        new_stats = BNStats(
            mean=momentum * stats.mean + mu,
            var=momentum * stats.var + bias_corr * var,
            scale_factor=momentum * stats.scale_factor + 1.0,
        )
        return y.astype(x.dtype), new_stats
    axes = tuple(range(x.ndim - 1))
    batch_mean = jnp.mean(xf, axis=axes)
    centered = xf - batch_mean
    batch_var = jnp.mean(jnp.square(centered), axis=axes)
    m = 1
    for a in axes:
        m *= x.shape[a]
    bias_corr = m / max(m - 1, 1)
    new_stats = BNStats(
        mean=momentum * stats.mean + batch_mean,
        var=momentum * stats.var + bias_corr * batch_var,
        scale_factor=momentum * stats.scale_factor + 1.0,
    )
    y = centered * jax.lax.rsqrt(batch_var + eps)
    return y.astype(x.dtype), new_stats


def scale(
    x: jax.Array, gamma: jax.Array, beta: Optional[jax.Array] = None
) -> jax.Array:
    """Caffe Scale layer: per-channel y = x * gamma (+ beta). x: NHWC."""
    y = x * gamma.astype(x.dtype)
    if beta is not None:
        y = y + beta.astype(x.dtype)
    return y


def lrn(
    x: jax.Array,
    *,
    local_size: int = 5,
    alpha: float = 1.0,
    beta: float = 0.75,
    k: float = 1.0,
    across_channels: bool = True,
) -> jax.Array:
    """Local Response Normalisation (src/caffe/layers/lrn_layer.cpp).

    ACROSS_CHANNELS: denom = (k + alpha/n * sum_{c window} x^2)^beta.
    WITHIN_CHANNEL: spatial window instead, with SAME-style padding.
    """
    xf = x.astype(jnp.float32)
    sq = jnp.square(xf)
    pad = local_size // 2
    if across_channels:
        sq_pad = jnp.pad(sq, ((0, 0), (0, 0), (0, 0), (pad, pad)))
        windows = jax.lax.reduce_window(
            sq_pad, 0.0, jax.lax.add,
            window_dimensions=(1, 1, 1, local_size),
            window_strides=(1, 1, 1, 1), padding="VALID",
        )
        denom = jnp.power(k + (alpha / local_size) * windows, beta)
    else:
        windows = jax.lax.reduce_window(
            sq, 0.0, jax.lax.add,
            window_dimensions=(1, local_size, local_size, 1),
            window_strides=(1, 1, 1, 1),
            padding=((0, 0), (pad, pad), (pad, pad), (0, 0)),
        )
        denom = jnp.power(k + (alpha / (local_size * local_size)) * windows, beta)
    return (xf / denom).astype(x.dtype)


def mvn(
    x: jax.Array, *, normalize_variance: bool = True, across_channels: bool = False,
    eps: float = 1e-9,
) -> jax.Array:
    """Mean-Variance Normalisation (src/caffe/layers/mvn_layer.cpp). x: NHWC."""
    axes = (1, 2, 3) if across_channels else (1, 2)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axes, keepdims=True)
    centered = xf - mean
    if normalize_variance:
        std = jnp.sqrt(jnp.mean(jnp.square(centered), axis=axes, keepdims=True))
        centered = centered / (std + eps)
    return centered.astype(x.dtype)
