"""Convolution / transposed convolution with Caffe-exact geometry.

Reference semantics (for parity, NOT implementation):
- conv output size: ``(H + 2*pad - (dilation*(k-1)+1)) // stride + 1``
  (reference: src/caffe/util/im2col.cpp:25-28, base_conv_layer.cpp:95-107).
- deconv output size: ``stride*(H-1) + dilation*(k-1)+1 - 2*pad``
  (reference: deconv_layer.cpp — deconv forward == conv backward-data).
- groups supported on both.

The reference lowers conv to im2col+GEMM (base_conv_layer.cpp:257-281). Here
we hand the convolution directly to XLA's `conv_general_dilated`, which tiles
it onto the MXU; there is no materialised im2col buffer. Layout is NHWC with
HWIO kernels so channels ride the 128-wide lane dimension.

All ops take an optional ``compute_dtype`` (default bfloat16) — inputs/weights
are cast for the MXU while accumulation stays float32 via
``preferred_element_type``; outputs are returned in float32 unless the input
was lower precision already.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

DIMS_NHWC = ("NHWC", "HWIO", "NHWC")


def conv_output_size(size: int, kernel: int, stride: int, pad: int, dilation: int = 1) -> int:
    """Caffe conv spatial output size (floor semantics)."""
    k_eff = dilation * (kernel - 1) + 1
    return (size + 2 * pad - k_eff) // stride + 1


def deconv_output_size(size: int, kernel: int, stride: int, pad: int, dilation: int = 1) -> int:
    """Caffe deconv spatial output size."""
    k_eff = dilation * (kernel - 1) + 1
    return stride * (size - 1) + k_eff - 2 * pad


def _pair(v) -> Tuple[int, int]:
    if isinstance(v, (tuple, list)):
        if len(v) == 1:
            return (int(v[0]), int(v[0]))
        return (int(v[0]), int(v[1]))
    return (int(v), int(v))


def _cast_pair(x: jax.Array, w: jax.Array, compute_dtype):
    if compute_dtype is None:
        return x, w
    return x.astype(compute_dtype), w.astype(compute_dtype)


def conv2d(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    *,
    stride=1,
    pad=0,
    dilation=1,
    groups: int = 1,
    compute_dtype=jnp.bfloat16,
    accum_dtype=jnp.float32,
) -> jax.Array:
    """2-D convolution, Caffe geometry, NHWC/HWIO.

    Args:
      x: (N, H, W, Cin)
      w: (kh, kw, Cin // groups, Cout)
      b: (Cout,) or None
    """
    sh, sw = _pair(stride)
    ph, pw = _pair(pad)
    dh, dw = _pair(dilation)
    out_dtype = x.dtype
    xc, wc = _cast_pair(x, w, compute_dtype)
    y = lax.conv_general_dilated(
        xc,
        wc,
        window_strides=(sh, sw),
        padding=((ph, ph), (pw, pw)),
        rhs_dilation=(dh, dw),
        dimension_numbers=DIMS_NHWC,
        feature_group_count=groups,
        preferred_element_type=accum_dtype,
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y.astype(out_dtype)


def conv2d_s2d(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    *,
    stride=2,
    pad=3,
    dilation=1,
    groups: int = 1,
    compute_dtype=jnp.bfloat16,
    accum_dtype=jnp.float32,
) -> jax.Array:
    """Strided conv via SPACE-TO-DEPTH: the fast_semantics conv1 lowering.

    conv(x, w, stride=f) == conv(s2d(x, f), rearrange(w), stride=1): the 2x2
    pixel blocks fold into channels, turning DeeperCut's 7x7/s2 Cin=3 stem
    (MXU lanes 97% idle, and a bandwidth-bound Cin=3 WEIGHT grad in the
    backward) into a dense 4x4 Cin=12 stride-1 conv — measured ~0.17 ms/img
    off the mixed batch-8 train step (docs/performance.md).

    The SUMS are the same products reassociated, so results match conv2d to
    accumulation-order rounding (exact in f32 accumulation on CPU oracle
    tests); the semantic note that keeps this opt-in is the layout change —
    XLA schedules a different kernel, so bf16 tie-breaking/rounding in
    downstream comparisons can differ from the reference lowering.

    Geometry: stride must be uniform; dilation/groups must be 1 (the stem's
    shape — loud error otherwise).
    """
    sh, sw = _pair(stride)
    ph, pw = _pair(pad)
    if sh != sw or _pair(dilation) != (1, 1) or groups != 1:
        raise ValueError("conv2d_s2d supports uniform stride, dilation=1, "
                         f"groups=1 (got stride={stride}, dilation={dilation}, "
                         f"groups={groups})")
    f = sh
    kh, kw, cin, cout = w.shape
    n, h, wd, _ = x.shape
    oh = (h + 2 * ph - kh) // f + 1
    ow = (wd + 2 * pw - kw) // f + 1
    KH = -(-kh // f) * f
    KW = -(-kw // f) * f
    # zero-pad the kernel to a multiple of f (zero taps contribute nothing),
    # then fold its f-strided phases into channels: (KH,KW,cin,cout) ->
    # (KH/f, KW/f, f*f*cin, cout), phase order (dh, dw, cin)
    wp = jnp.pad(w, ((0, KH - kh), (0, KW - kw), (0, 0), (0, 0)))
    wr = wp.reshape(KH // f, f, KW // f, f, cin, cout) \
           .transpose(0, 2, 1, 3, 4, 5).reshape(KH // f, KW // f,
                                                f * f * cin, cout)
    # Padded extent: enough rows for the last output ((oh-1)*f + KH), but
    # never less than the real input + left pad — (oh-1)*f+KH < h+ph is
    # possible for floor-division geometries (e.g. k=4 s=4 h=11: oh=2,
    # need=8 < 11) and a negative jnp.pad would crash. The extra rows only
    # produce output rows beyond oh, discarded by the final slice. Both
    # candidates are multiples of f after the ceil, so the reshape stays
    # exact.
    need_h = max((oh - 1) * f + KH, -(-(h + ph) // f) * f)
    need_w = max((ow - 1) * f + KW, -(-(wd + pw) // f) * f)
    xp = jnp.pad(x, ((0, 0), (ph, need_h - h - ph),
                     (pw, need_w - wd - pw), (0, 0)))
    xs = xp.reshape(n, need_h // f, f, need_w // f, f, cin) \
           .transpose(0, 1, 3, 2, 4, 5).reshape(n, need_h // f,
                                                need_w // f, f * f * cin)
    y = conv2d(xs, wr, b, stride=1, pad=0, compute_dtype=compute_dtype,
               accum_dtype=accum_dtype)
    return y[:, :oh, :ow, :]


def deconv2d(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    *,
    stride=1,
    pad=0,
    dilation=1,
    groups: int = 1,
    compute_dtype=jnp.bfloat16,
    accum_dtype=jnp.float32,
) -> jax.Array:
    """Transposed 2-D convolution (Caffe "Deconvolution" forward).

    Equals the data-gradient of `conv2d`: insert (stride-1) zeros between
    input pixels (lhs_dilation), then run a stride-1 convolution with the
    spatially flipped kernel and padding ``k_eff - 1 - pad``.

    Args:
      x: (N, H, W, Cin)
      w: (kh, kw, Cin, Cout // groups) — the native deconv layout: I = deconv
         input channels, O = deconv output channels (matches Caffe's
         (Cin, Cout/g, kh, kw) after transpose).
      b: (Cout,) or None
    """
    sh, sw = _pair(stride)
    ph, pw = _pair(pad)
    dh, dw = _pair(dilation)
    kh, kw = int(w.shape[0]), int(w.shape[1])
    kh_eff = dh * (kh - 1) + 1
    kw_eff = dw * (kw - 1) + 1
    out_dtype = x.dtype
    xc, wc = _cast_pair(x, w, compute_dtype)
    # The transposed conv scatters x[i,h,w]*w[ky,kx,i,o] to out[o, h*s-p+ky*d, ...].
    # As a stride-1 conv over the zero-dilated input this needs only a spatial
    # flip of the kernel — the (i, o) mixing is already in conv orientation.
    if groups == 1:
        wt = jnp.flip(wc, axis=(0, 1))
    else:
        # w: (kh, kw, Cin, Cout//g) with Cin = g*cin_g. Grouped conv wants
        # (kh, kw, cin_g, g*cout_g) with output block o//cout_g reading its
        # own input group.
        cin = int(x.shape[-1])
        cout_g = int(w.shape[3])
        wt = wc.reshape(kh, kw, groups, cin // groups, cout_g)
        wt = jnp.flip(wt, axis=(0, 1))
        wt = wt.transpose(0, 1, 3, 2, 4).reshape(kh, kw, cin // groups, groups * cout_g)
    y = lax.conv_general_dilated(
        xc,
        wt,
        window_strides=(1, 1),
        padding=((kh_eff - 1 - ph, kh_eff - 1 - ph), (kw_eff - 1 - pw, kw_eff - 1 - pw)),
        lhs_dilation=(sh, sw),
        rhs_dilation=(dh, dw),
        dimension_numbers=DIMS_NHWC,
        feature_group_count=groups,
        preferred_element_type=accum_dtype,
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y.astype(out_dtype)


def bilinear_filler(kh: int, kw: int, cin: int, cout: int, dtype=jnp.float32) -> jax.Array:
    """Bilinear upsampling kernel (reference: include/caffe/filler.hpp:219-290).

    Returns a deconv weight (kh, kw, cin, cout) wiring channel i -> i with a
    bilinear interpolation stencil — the standard init for upsampling heads.
    """
    fh = (kh + 1) // 2
    fw = (kw + 1) // 2
    ch = (2 * fh - 1 - fh % 2) / (2.0 * fh)
    cw = (2 * fw - 1 - fw % 2) / (2.0 * fw)
    ih = jnp.arange(kh, dtype=dtype)
    iw = jnp.arange(kw, dtype=dtype)
    fy = 1 - jnp.abs(ih / fh - ch)
    fx = 1 - jnp.abs(iw / fw - cw)
    k2d = fy[:, None] * fx[None, :]
    w = jnp.zeros((kh, kw, cin, cout), dtype=dtype)
    n = min(cin, cout)
    idx = jnp.arange(n)
    return w.at[:, :, idx, idx].set(k2d[:, :, None])
