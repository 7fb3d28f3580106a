"""Pooling with Caffe-exact (ceil-mode) geometry.

Reference semantics (src/caffe/layers/pooling_layer.cpp):
- output size: ``ceil((H + 2*pad - k) / stride) + 1``, then if pad > 0 and the
  last window would start beyond ``H + pad``, shrink by one. This CEIL mode is
  the classic bit-fidelity trap vs. floor-mode frameworks: e.g. the DeeperCut
  stem pool1 (k=3, s=2) maps 344 -> 172, not 171.
- MAX pooling ignores padding (pad cells can never win): implemented by
  padding with -inf before `lax.reduce_window`.
- AVE pooling divides by the window area clipped to the *padded* extent
  (``hend = min(hstart + k, H + pad)``) while summing only real pixels —
  padded zeros inside that extent count in the denominator.

Layout NHWC.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def pool_output_size(size: int, kernel: int, stride: int, pad: int) -> int:
    out = -(-(size + 2 * pad - kernel) // stride) + 1  # ceil division
    if pad > 0 and (out - 1) * stride >= size + pad:
        out -= 1
    return out


def _pair(v) -> Tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return (int(v[0]), int(v[-1]))
    return (int(v), int(v))


def _geometry(h, w, kernel, stride, pad):
    kh, kw = _pair(kernel)
    sh, sw = _pair(stride)
    ph, pw = _pair(pad)
    oh = pool_output_size(h, kh, sh, ph)
    ow = pool_output_size(w, kw, sw, pw)
    # Total padded extent each window may touch; ceil mode can read one
    # stride past H + 2*pad, so pad the bottom/right to full coverage.
    pad_h = (ph, max((oh - 1) * sh + kh - h - ph, 0))
    pad_w = (pw, max((ow - 1) * sw + kw - w - pw, 0))
    return (kh, kw), (sh, sw), (ph, pw), pad_h, pad_w, (oh, ow)


def max_pool2d(x: jax.Array, *, kernel, stride=1, pad=0) -> jax.Array:
    """MAX pooling, Caffe ceil-mode. x: (N, H, W, C)."""
    (kh, kw), (sh, sw), _, pad_h, pad_w, _ = _geometry(
        x.shape[1], x.shape[2], kernel, stride, pad
    )
    # -inf (not finfo.min) so XLA recognises this as reduce-window-max, which
    # has a select-and-scatter transpose rule for autodiff.
    neg = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return lax.reduce_window(
        x,
        neg,
        lax.max,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, sh, sw, 1),
        padding=((0, 0), pad_h, pad_w, (0, 0)),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def max_pool2d_eqgrad(x: jax.Array, kernel, stride=1, pad=0) -> jax.Array:
    """MAX pooling with an EQUALITY-MASK backward (the fast_semantics pool).

    Forward is bit-identical to max_pool2d. Backward routes each output
    cotangent to every input that EQUALS the window max, as static strided
    slice-compare-adds — k*k elementwise passes instead of XLA's
    select-and-scatter, which serializes badly on TPU (measured ~0.13
    ms/img of the mixed batch-8 DeeperCut train step,
    docs/performance.md).

    Semantic delta vs Caffe (pooling_layer.cpp backward: bottom_diff at the
    stored argmax — the FIRST max in scan order — gets the whole cotangent):
    ties each receive the FULL cotangent, so a window of tied maxima
    multiplies gradient mass by the tie count. Post-ReLU zeros tie often;
    that is exactly why this is an opt-in (DeeperCutConfig(fast_semantics))
    and not the default. Accumulation across overlapping windows is
    unchanged (Caffe += too)."""
    return max_pool2d(x, kernel=kernel, stride=stride, pad=pad)


def _eqgrad_fwd(x, kernel, stride, pad):
    y = max_pool2d(x, kernel=kernel, stride=stride, pad=pad)
    return y, (x, y)


def _eqgrad_bwd(kernel, stride, pad, res, g):
    x, y = res
    h, w = int(x.shape[1]), int(x.shape[2])
    (kh, kw), (sh, sw), _, pad_h, pad_w, (oh, ow) = _geometry(
        h, w, kernel, stride, pad)
    neg = (-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
           else jnp.iinfo(x.dtype).min)
    xp = jnp.pad(x, ((0, 0), pad_h, pad_w, (0, 0)), constant_values=neg)
    canvas = jnp.zeros(xp.shape, g.dtype)
    for dh in range(kh):
        for dw in range(kw):
            hs = slice(dh, dh + (oh - 1) * sh + 1, sh)
            ws = slice(dw, dw + (ow - 1) * sw + 1, sw)
            contrib = g * (xp[:, hs, ws, :] == y)
            canvas = canvas.at[:, hs, ws, :].add(contrib)
    gx = canvas[:, pad_h[0]:pad_h[0] + h, pad_w[0]:pad_w[0] + w, :]
    return (gx.astype(x.dtype),)


max_pool2d_eqgrad.defvjp(_eqgrad_fwd, _eqgrad_bwd)


def avg_pool2d(x: jax.Array, *, kernel, stride=1, pad=0) -> jax.Array:
    """AVE pooling, Caffe semantics (padded-extent denominator). x: NHWC."""
    h, w = int(x.shape[1]), int(x.shape[2])
    (kh, kw), (sh, sw), (ph, pw), pad_h, pad_w, (oh, ow) = _geometry(
        h, w, kernel, stride, pad
    )
    sums = lax.reduce_window(
        x.astype(jnp.float32),
        0.0,
        lax.add,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, sh, sw, 1),
        padding=((0, 0), pad_h, pad_w, (0, 0)),
    )
    # Per-position divisor: window clipped to the Caffe padded extent [0, H+pad).
    hstart = jnp.arange(oh) * sh - ph
    wstart = jnp.arange(ow) * sw - pw
    hlen = jnp.minimum(hstart + kh, h + ph) - hstart
    wlen = jnp.minimum(wstart + kw, w + pw) - wstart
    divisor = (hlen[:, None] * wlen[None, :]).astype(jnp.float32)
    return (sums / divisor[None, :, :, None]).astype(x.dtype)


def stochastic_pool2d(
    x: jax.Array, rng: Optional[jax.Array] = None, *, kernel, stride=1,
    train: bool = False,
) -> jax.Array:
    """STOCHASTIC pooling (pooling_layer.cu): train = sample a window element
    with probability proportional to its (non-negative) activation; test =
    activation-weighted average (sum(a^2)/sum(a)).

    Caffe forbids padding for STOCHASTIC but still uses CEIL-mode output
    sizing (pooling_layer.cpp): zero-pad bottom/right so partial edge
    windows exist — zeros add nothing to the sums and are never sampled."""
    h, w = int(x.shape[1]), int(x.shape[2])
    (kh, kw), (sh, sw), _, pad_h, pad_w, _ = _geometry(h, w, kernel, stride, 0)
    if pad_h[1] or pad_w[1]:
        x = jnp.pad(x, ((0, 0), (0, pad_h[1]), (0, pad_w[1]), (0, 0)))
    xf = x.astype(jnp.float32)
    dims = (1, kh, kw, 1)
    strides = (1, sh, sw, 1)
    sums = lax.reduce_window(xf, 0.0, lax.add, dims, strides, "VALID")
    if not train or rng is None:
        sq = lax.reduce_window(xf * xf, 0.0, lax.add, dims, strides, "VALID")
        return jnp.where(sums > 0, sq / jnp.where(sums == 0, 1.0, sums), 0.0).astype(x.dtype)
    # train: inverse-CDF sampling via a threshold r*sum and a masked max —
    # pick the first element whose prefix sum exceeds the threshold.
    n, h, w, c = x.shape
    oh = (h - kh) // sh + 1
    ow = (w - kw) // sw + 1
    from deepcut_tpu.ops.shard_rng import draw_batched
    r = draw_batched(lambda shape: jax.random.uniform(rng, shape),
                     (n, oh, ow, c))
    thresh = r * sums
    out = jnp.zeros((n, oh, ow, c), jnp.float32)
    cum = jnp.zeros((n, oh, ow, c), jnp.float32)
    picked = jnp.zeros((n, oh, ow, c), bool)
    for dy in range(kh):
        for dx in range(kw):
            v = xf[:, dy:dy + oh * sh:sh, dx:dx + ow * sw:sw, :]
            cum = cum + v
            take = (~picked) & (cum >= thresh)
            out = jnp.where(take, v, out)
            picked = picked | take
    return out.astype(x.dtype)


def global_avg_pool2d(x: jax.Array) -> jax.Array:
    """Global average pooling (Caffe global_pooling: true)."""
    return jnp.mean(x, axis=(1, 2), keepdims=True)


def global_max_pool2d(x: jax.Array) -> jax.Array:
    return jnp.max(x, axis=(1, 2), keepdims=True)
