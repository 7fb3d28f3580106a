"""Caffe layer-type registry for the graph engine.

For each Caffe layer type this module provides:
- ``build(spec, phase, compute_dtype)`` -> ``fn(params_entry, bottoms)`` — a
  pure function implementing the layer's forward on NHWC tensors;
- ``param_spec(spec, bottom_shapes)`` -> ordered ``(key, shape, filler)``
  describing the layer's learnable/state arrays (used by Net's init pass,
  which replaces Layer::SetUp + the Filler calls of the reference).

Axis conventions: the reference is NCHW; 4-D tensors here are NHWC. Axis
arguments from prototxt configs are translated with ``_nchw_to_nhwc_axis``.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deepcut_tpu.proto.text_format import PbNode
from deepcut_tpu.core import fillers
from deepcut_tpu.ops import conv as conv_ops
from deepcut_tpu.ops import pool as pool_ops
from deepcut_tpu.ops import norm as norm_ops
from deepcut_tpu.ops import activations as act_ops
from deepcut_tpu.ops import eltwise as elt_ops
from deepcut_tpu.ops import linear as lin_ops
from deepcut_tpu.ops import losses as loss_ops

_AXIS_MAP_4D = {0: 0, 1: 3, 2: 1, 3: 2}  # NCHW axis -> NHWC axis


def _nchw_to_nhwc_axis(axis: int, ndim: int) -> int:
    if axis < 0:
        axis += ndim
    if ndim == 4:
        return _AXIS_MAP_4D[axis]
    return axis


def _to_nchw(x: jax.Array) -> jax.Array:
    return jnp.transpose(x, (0, 3, 1, 2)) if x.ndim == 4 else x


def _from_nchw_shape(x: jax.Array) -> jax.Array:
    return jnp.transpose(x, (0, 2, 3, 1)) if x.ndim == 4 else x


# -- config extraction ------------------------------------------------------


def conv_geometry(cp: PbNode) -> Dict[str, Any]:
    ks = [int(v) for v in cp.get_list("kernel_size")]
    kh = cp.get_int("kernel_h") or (ks[0] if ks else 0)
    kw = cp.get_int("kernel_w") or (ks[1] if len(ks) > 1 else (ks[0] if ks else 0))
    pads = [int(v) for v in cp.get_list("pad")]
    ph = cp.get_int("pad_h") if cp.has("pad_h") else (pads[0] if pads else 0)
    pw = cp.get_int("pad_w") if cp.has("pad_w") else (pads[1] if len(pads) > 1 else (pads[0] if pads else 0))
    strides = [int(v) for v in cp.get_list("stride")]
    sh = cp.get_int("stride_h") if cp.has("stride_h") else (strides[0] if strides else 1)
    sw = cp.get_int("stride_w") if cp.has("stride_w") else (strides[1] if len(strides) > 1 else (strides[0] if strides else 1))
    dil = [int(v) for v in cp.get_list("dilation")]
    dh = dil[0] if dil else 1
    dw = dil[1] if len(dil) > 1 else dh
    return dict(
        num_output=cp.get_int("num_output", 0),
        kernel=(kh, kw), stride=(sh, sw), pad=(ph, pw), dilation=(dh, dw),
        groups=cp.get_int("group", 1),
        bias=cp.get_bool("bias_term", True),
    )


# -- builders ---------------------------------------------------------------

Builder = Callable[["LayerSpec", str, Any], Optional[Callable]]
_BUILDERS: Dict[str, Callable] = {}
_PARAM_SPECS: Dict[str, Callable] = {}


def register(name: str, param_spec: Optional[Callable] = None):
    def deco(fn):
        _BUILDERS[name] = fn
        if param_spec is not None:
            _PARAM_SPECS[name] = param_spec
        return fn
    return deco


def build(spec, phase: str, compute_dtype) -> Optional[Callable]:
    builder = _BUILDERS.get(spec.type)
    if builder is None:
        raise NotImplementedError(
            f"layer type {spec.type!r} (layer {spec.name!r}) is not implemented"
        )
    return builder(spec, phase, compute_dtype)


def param_spec(spec, bottom_shapes: List[Tuple[int, ...]]):
    fn = _PARAM_SPECS.get(spec.type)
    return fn(spec, bottom_shapes) if fn else []


def output_channels(spec, cin: Optional[int]) -> Optional[int]:
    if spec.type in ("Convolution", "Deconvolution"):
        return conv_geometry(spec.param("convolution_param"))["num_output"]
    return cin


# Convolution ---------------------------------------------------------------


def _conv_param_spec(spec, bottom_shapes):
    g = conv_geometry(spec.param("convolution_param"))
    cin = bottom_shapes[0][-1]
    kh, kw = g["kernel"]
    out = [("w", (kh, kw, cin // g["groups"], g["num_output"]),
            spec.param("convolution_param").get("weight_filler", PbNode()))]
    if g["bias"]:
        out.append(("b", (g["num_output"],),
                    spec.param("convolution_param").get("bias_filler", PbNode())))
    return out


@register("Convolution", _conv_param_spec)
def _conv(spec, phase, compute_dtype):
    g = conv_geometry(spec.param("convolution_param"))

    def fn(p, bottoms):
        return conv_ops.conv2d(
            bottoms[0], p["w"], p.get("b"), stride=g["stride"], pad=g["pad"],
            dilation=g["dilation"], groups=g["groups"], compute_dtype=compute_dtype,
        )
    return fn


def _deconv_param_spec(spec, bottom_shapes):
    g = conv_geometry(spec.param("convolution_param"))
    cin = bottom_shapes[0][-1]
    kh, kw = g["kernel"]
    out = [("w", (kh, kw, cin, g["num_output"] // g["groups"]),
            spec.param("convolution_param").get("weight_filler", PbNode()))]
    if g["bias"]:
        out.append(("b", (g["num_output"],),
                    spec.param("convolution_param").get("bias_filler", PbNode())))
    return out


@register("Deconvolution", _deconv_param_spec)
def _deconv(spec, phase, compute_dtype):
    g = conv_geometry(spec.param("convolution_param"))

    def fn(p, bottoms):
        return conv_ops.deconv2d(
            bottoms[0], p["w"], p.get("b"), stride=g["stride"], pad=g["pad"],
            dilation=g["dilation"], groups=g["groups"], compute_dtype=compute_dtype,
        )
    return fn


# Normalisation -------------------------------------------------------------


def _bn_param_spec(spec, bottom_shapes):
    # Caffe zero-fills all three BN blobs; we init (mean 0, var 1, sf 1) so
    # an untrained net is an identity-normalisation at inference instead of
    # dividing by sqrt(eps). The initial contribution decays by momentum^t
    # during training.
    c = bottom_shapes[0][-1]
    zero, one = PbNode(), PbNode()
    one.add("type", "constant"); one.add("value", 1.0)
    return [("mean", (c,), zero), ("var", (c,), one), ("scale_factor", (1,), one)]


@register("BatchNorm", _bn_param_spec)
def _batchnorm(spec, phase, compute_dtype):
    bp = spec.param("batch_norm_param")
    eps = bp.get_float("eps", 1e-5)
    momentum = bp.get_float("moving_average_fraction", 0.999)
    use_global = bp.get_bool("use_global_stats", phase == "TEST")

    def fn(p, bottoms):
        return norm_ops.batch_norm_inference(
            bottoms[0], p["mean"], p["var"], p.get("scale_factor"), eps=eps
        )
    if phase == "TRAIN" and not use_global:
        # Batch-stats mode: the executor special-cases this (it must emit
        # the moving-average updates alongside the activation).
        fn.bn_train = True
        fn.bn_eps = eps
        fn.bn_momentum = momentum
    return fn


def _scale_param_spec(spec, bottom_shapes):
    sp = spec.param("scale_param")
    c = bottom_shapes[0][-1]
    out = []
    if len(bottom_shapes) < 2:
        # with 2 bottoms the scale COMES FROM bottom[1] and no gamma blob
        # exists (scale_layer.cpp:15-43 creates blobs_[0] only for
        # bottom.size()==1) — declaring one would mis-assign .caffemodel
        # blobs positionally and decay an unused parameter
        one = PbNode(); one.add("type", "constant"); one.add("value", 1.0)
        out.append(("gamma", (c,), sp.get("filler", one)))
        bias_shape = (c,)
    else:
        # the bias blob is shaped LIKE THE SCALE, i.e. like bottom[1]
        # (scale_layer.cpp:44-60 reuses the scale's shape for the bias)
        bias_shape = tuple(bottom_shapes[1])
    if sp.get_bool("bias_term", False):
        out.append(("beta", bias_shape, sp.get("bias_filler", PbNode())))
    return out


@register("Scale", _scale_param_spec)
def _scale(spec, phase, compute_dtype):
    def fn(p, bottoms):
        if len(bottoms) == 2:  # second bottom provides the scale
            y = bottoms[0] * bottoms[1]
            if p and "beta" in p:  # bias_term still learns a bias blob
                y = y + p["beta"].astype(y.dtype)
            return y
        return norm_ops.scale(bottoms[0], p["gamma"], p.get("beta"))
    return fn


def _bias_param_spec(spec, bottom_shapes):
    return [("beta", (bottom_shapes[0][-1],), spec.param("bias_param").get("filler", PbNode()))]


@register("Bias", _bias_param_spec)
def _bias(spec, phase, compute_dtype):
    def fn(p, bottoms):
        if len(bottoms) == 2:
            return bottoms[0] + bottoms[1]
        return bottoms[0] + p["beta"].astype(bottoms[0].dtype)
    return fn


@register("LRN")
def _lrn(spec, phase, compute_dtype):
    lp = spec.param("lrn_param")
    cfg = dict(
        local_size=lp.get_int("local_size", 5),
        alpha=lp.get_float("alpha", 1.0),
        beta=lp.get_float("beta", 0.75),
        k=lp.get_float("k", 1.0),
        across_channels=lp.get_str("norm_region", "ACROSS_CHANNELS") == "ACROSS_CHANNELS",
    )
    return lambda p, b: norm_ops.lrn(b[0], **cfg)


@register("MVN")
def _mvn(spec, phase, compute_dtype):
    mp = spec.param("mvn_param")
    cfg = dict(
        normalize_variance=mp.get_bool("normalize_variance", True),
        across_channels=mp.get_bool("across_channels", False),
        eps=mp.get_float("eps", 1e-9),
    )
    return lambda p, b: norm_ops.mvn(b[0], **cfg)


# Activations ---------------------------------------------------------------


@register("ReLU")
def _relu(spec, phase, compute_dtype):
    slope = spec.param("relu_param").get_float("negative_slope", 0.0)
    return lambda p, b: act_ops.relu(b[0], negative_slope=slope)


@register("Sigmoid")
def _sigmoid(spec, phase, compute_dtype):
    return lambda p, b: act_ops.sigmoid(b[0])


@register("TanH")
def _tanh(spec, phase, compute_dtype):
    return lambda p, b: act_ops.tanh(b[0])


@register("ELU")
def _elu(spec, phase, compute_dtype):
    alpha = spec.param("elu_param").get_float("alpha", 1.0)
    return lambda p, b: act_ops.elu(b[0], alpha=alpha)


def _prelu_param_spec(spec, bottom_shapes):
    pp = spec.param("prelu_param")
    shared = pp.get_bool("channel_shared", False)
    quarter = PbNode(); quarter.add("type", "constant"); quarter.add("value", 0.25)
    shape = (1,) if shared else (bottom_shapes[0][-1],)
    return [("slopes", shape, pp.get("filler", quarter))]


@register("PReLU", _prelu_param_spec)
def _prelu(spec, phase, compute_dtype):
    shared = spec.param("prelu_param").get_bool("channel_shared", False)
    return lambda p, b: act_ops.prelu(b[0], p["slopes"], channel_shared=shared)


@register("BNLL")
def _bnll(spec, phase, compute_dtype):
    return lambda p, b: act_ops.bnll(b[0])


@register("AbsVal")
def _absval(spec, phase, compute_dtype):
    return lambda p, b: act_ops.absval(b[0])


@register("Power")
def _power(spec, phase, compute_dtype):
    pp = spec.param("power_param")
    cfg = dict(power=pp.get_float("power", 1.0), scale=pp.get_float("scale", 1.0),
               shift=pp.get_float("shift", 0.0))
    return lambda p, b: act_ops.power_op(b[0], **cfg)


@register("Exp")
def _exp(spec, phase, compute_dtype):
    ep = spec.param("exp_param")
    cfg = dict(base=ep.get_float("base", -1.0), scale=ep.get_float("scale", 1.0),
               shift=ep.get_float("shift", 0.0))
    return lambda p, b: act_ops.exp_op(b[0], **cfg)


@register("Log")
def _log(spec, phase, compute_dtype):
    lp = spec.param("log_param")
    cfg = dict(base=lp.get_float("base", -1.0), scale=lp.get_float("scale", 1.0),
               shift=lp.get_float("shift", 0.0))
    return lambda p, b: act_ops.log_op(b[0], **cfg)


@register("Threshold")
def _threshold(spec, phase, compute_dtype):
    t = spec.param("threshold_param").get_float("threshold", 0.0)
    return lambda p, b: act_ops.threshold(b[0], t=t)


@register("Dropout")
def _dropout(spec, phase, compute_dtype):
    # TEST phase: identity (inverted-dropout scaling happens at train time).
    if phase == "TEST":
        return lambda p, b: b[0]
    ratio = spec.param("dropout_param").get_float("dropout_ratio", 0.5)

    # TRAIN: real Bernoulli masking with Caffe's inverted 1/(1-ratio) scaling
    # (dropout_layer.cpp). The executor supplies a per-layer, per-step key
    # via the needs_rng contract; with no key (e.g. net.forward outside a
    # train step) the layer stays deterministic.
    def fn(p, b, rng=None):
        return act_ops.dropout(b[0], rng, ratio=ratio, deterministic=rng is None)
    fn.needs_rng = True
    return fn


# Pooling -------------------------------------------------------------------


@register("Pooling")
def _pooling(spec, phase, compute_dtype):
    pp = spec.param("pooling_param")
    method = pp.get_str("pool", "MAX")
    if pp.get_bool("global_pooling", False):
        if method == "MAX":
            return lambda p, b: pool_ops.global_max_pool2d(b[0])
        return lambda p, b: pool_ops.global_avg_pool2d(b[0])
    ks = pp.get_int("kernel_size", 0)
    kh = pp.get_int("kernel_h") or ks
    kw = pp.get_int("kernel_w") or ks
    sh = pp.get_int("stride_h") or pp.get_int("stride", 1)
    sw = pp.get_int("stride_w") or pp.get_int("stride", 1)
    ph = pp.get_int("pad_h") if pp.has("pad_h") else pp.get_int("pad", 0)
    pw = pp.get_int("pad_w") if pp.has("pad_w") else pp.get_int("pad", 0)
    if method == "MAX":
        return lambda p, b: pool_ops.max_pool2d(b[0], kernel=(kh, kw), stride=(sh, sw), pad=(ph, pw))
    if method == "STOCHASTIC":
        # TRAIN: sample a window element proportional to its activation
        # (pooling_layer.cu PoolingParameter_PoolMethod_STOCHASTIC); TEST (or
        # no key supplied): activation-weighted average.
        def fn(p, b, rng=None):
            return pool_ops.stochastic_pool2d(
                b[0], rng, kernel=(kh, kw), stride=(sh, sw),
                train=(phase == "TRAIN" and rng is not None))
        fn.needs_rng = phase == "TRAIN"
        return fn
    return lambda p, b: pool_ops.avg_pool2d(b[0], kernel=(kh, kw), stride=(sh, sw), pad=(ph, pw))


# Shape / fusion ------------------------------------------------------------


@register("Eltwise")
def _eltwise(spec, phase, compute_dtype):
    ep = spec.param("eltwise_param")
    op = ep.get_str("operation", "SUM")
    coeffs = [float(c) for c in ep.get_list("coeff")] or None
    if op == "SUM":
        return lambda p, b: elt_ops.eltwise_sum(b, coeffs)
    if op == "PROD":
        return lambda p, b: elt_ops.eltwise_prod(b)
    return lambda p, b: elt_ops.eltwise_max(b)


@register("Crop")
def _crop(spec, phase, compute_dtype):
    cp = spec.param("crop_param")
    axis = cp.get_int("axis", 2)
    offsets = [int(o) for o in cp.get_list("offset")]

    def fn(p, bottoms):
        x, ref = bottoms[0], bottoms[1]
        nd = x.ndim
        a0 = axis + nd if axis < 0 else axis
        slices = [slice(None)] * nd
        for i in range(a0, nd):
            off_idx = i - a0
            off = offsets[off_idx] if off_idx < len(offsets) else (
                offsets[0] if len(offsets) == 1 else 0)
            tgt = _nchw_to_nhwc_axis(i, nd) if nd == 4 else i
            size = ref.shape[tgt]
            slices[tgt] = slice(off, off + size)
        return x[tuple(slices)]
    return fn


@register("Concat")
def _concat(spec, phase, compute_dtype):
    cp = spec.param("concat_param")
    axis = cp.get_int("concat_dim", None)
    if axis is None:
        axis = cp.get_int("axis", 1)

    def fn(p, bottoms):
        return elt_ops.concat(bottoms, axis=_nchw_to_nhwc_axis(axis, bottoms[0].ndim))
    return fn


@register("Slice")
def _slice(spec, phase, compute_dtype):
    sp = spec.param("slice_param")
    axis = sp.get_int("slice_dim", None)
    if axis is None:
        axis = sp.get_int("axis", 1)
    points = [int(v) for v in sp.get_list("slice_point")]
    n_top = len(spec.tops)

    def fn(p, bottoms):
        a = _nchw_to_nhwc_axis(axis, bottoms[0].ndim)
        return elt_ops.slice_op(bottoms[0], axis=a, slice_points=points, num_outputs=n_top)
    return fn


@register("Split")
def _split(spec, phase, compute_dtype):
    n = len(spec.tops)
    return lambda p, b: [b[0]] * n


@register("Flatten")
def _flatten(spec, phase, compute_dtype):
    fp = spec.param("flatten_param")
    axis = fp.get_int("axis", 1)
    end_axis = fp.get_int("end_axis", -1)

    def fn(p, bottoms):
        return elt_ops.flatten_op(_to_nchw(bottoms[0]), axis=axis, end_axis=end_axis)
    return fn


@register("Reshape")
def _reshape(spec, phase, compute_dtype):
    rp = spec.param("reshape_param")
    dims = [int(d) for d in rp.get("shape", PbNode()).get_list("dim")]
    axis = rp.get_int("axis", 0)
    num_axes = rp.get_int("num_axes", -1)

    def fn(p, bottoms):
        x = _to_nchw(bottoms[0])
        old = list(x.shape)
        end = len(old) if num_axes == -1 else axis + num_axes
        mid = []
        for i, d in enumerate(dims):
            if d == 0:
                mid.append(old[axis + i])
            else:
                mid.append(d)
        new_shape = old[:axis] + mid + old[end:]
        y = x.reshape([d if d != -1 else -1 for d in new_shape])
        return _from_nchw_shape(y) if y.ndim == 4 else y
    return fn


@register("Tile")
def _tile(spec, phase, compute_dtype):
    tp = spec.param("tile_param")
    axis = tp.get_int("axis", 1)
    tiles = tp.get_int("tiles", 1)

    def fn(p, bottoms):
        return elt_ops.tile_op(bottoms[0], axis=_nchw_to_nhwc_axis(axis, bottoms[0].ndim), tiles=tiles)
    return fn


@register("BatchReindex")
def _batch_reindex(spec, phase, compute_dtype):
    return lambda p, b: elt_ops.batch_reindex(b[0], b[1])


@register("Reduction")
def _reduction(spec, phase, compute_dtype):
    rp = spec.param("reduction_param")
    cfg = dict(op=rp.get_str("operation", "SUM"), axis=rp.get_int("axis", 0),
               coeff=rp.get_float("coeff", 1.0))

    def fn(p, bottoms):
        return elt_ops.reduction_op(_to_nchw(bottoms[0]), **cfg)
    return fn


@register("Im2col")
def _im2col(spec, phase, compute_dtype):
    g = conv_geometry(spec.param("convolution_param"))

    def fn(p, bottoms):
        x = bottoms[0]
        kh, kw = g["kernel"]
        patches = jax.lax.conv_general_dilated_patches(
            _to_nchw(x).astype(jnp.float32), (kh, kw), g["stride"],
            [(g["pad"][0], g["pad"][0]), (g["pad"][1], g["pad"][1])],
            rhs_dilation=g["dilation"],
        )
        return _from_nchw_shape(patches)
    return fn


@register("Filter")
def _filter(spec, phase, compute_dtype):
    """Filter layer (filter_layer.cpp): last bottom is a (N,1,...) selector;
    forward keeps items with non-zero selector. Under XLA's static shapes the
    batch is compacted with a stable sort instead of a dynamic gather, and
    the (traced) count of kept items cannot shrink the array — callers get
    the full batch with kept items first plus a 'filter_count' style mask
    convention is impossible here, so we zero out dropped items instead.

    The all-blobs host path (Net.forward without jit) runs the attached
    `host_dynamic` variant, which TRULY shrinks the batch like
    filter_layer.cpp — downstream layers in that path see only the kept
    items, so e.g. a consumer's batch mean matches the reference exactly.
    BACKWARD always uses the static zero-fill semantics (autodiff traces),
    so after a host forward a filtered blob's data and its gradient can
    have different batch sizes — compat.Net.backward warns and leaves
    Blob.diff at zeros for such blobs.
    """
    n_tops = len(spec.tops)

    def fn(p, bottoms):
        selector = bottoms[-1].reshape(bottoms[-1].shape[0], -1)[:, 0]
        keep = selector != 0
        order = jnp.argsort(~keep, stable=True)  # kept items first
        outs = []
        for b in bottoms[:-1]:
            reordered = jnp.take(b, order, axis=0)
            mask = jnp.take(keep, order).reshape((-1,) + (1,) * (b.ndim - 1))
            outs.append(jnp.where(mask, reordered, 0))
        return outs if n_tops > 1 else outs[0]

    def host_dynamic(p, bottoms):
        # eager-only (dynamic output shape): exact filter_layer.cpp shrink
        selector = np.asarray(bottoms[-1]).reshape(bottoms[-1].shape[0], -1)[:, 0]
        kept = np.nonzero(selector != 0)[0]
        outs = [jnp.take(b, jnp.asarray(kept), axis=0) for b in bottoms[:-1]]
        return outs if n_tops > 1 else outs[0]
    fn.host_dynamic = host_dynamic
    return fn


@register("SPP")
def _spp(spec, phase, compute_dtype):
    """Spatial pyramid pooling (spp_layer.cpp): pyramid of pooling levels,
    each flattened and concatenated to (N, C*sum(4^l))."""
    sp = spec.param("spp_param")
    levels = sp.get_int("pyramid_height", 3)
    method = sp.get_str("pool", "MAX")

    def fn(p, bottoms):
        x = bottoms[0]
        n, h, w, c = x.shape
        feats = []
        for l in range(levels):
            bins = 2 ** l
            # Caffe's bin geometry (spp_layer.cpp GetPoolingParam:17-42):
            # kernel = ceil(dim/bins), STRIDE = kernel, pad = (remainder+1)/2
            # — a floor stride would make bins overlap on non-divisible dims
            kh, kw = -(-h // bins), -(-w // bins)
            ph = (kh * bins - h + 1) // 2
            pw = (kw * bins - w + 1) // 2
            if method == "MAX":
                y = pool_ops.max_pool2d(x, kernel=(kh, kw), stride=(kh, kw),
                                        pad=(ph, pw))
            else:
                y = pool_ops.avg_pool2d(x, kernel=(kh, kw), stride=(kh, kw),
                                        pad=(ph, pw))
            y = y[:, :bins, :bins, :]
            feats.append(jnp.transpose(y, (0, 3, 1, 2)).reshape(n, -1))
        return jnp.concatenate(feats, axis=1)
    return fn


# Dense ---------------------------------------------------------------------


def _ip_param_spec(spec, bottom_shapes):
    ip = spec.param("inner_product_param")
    axis = ip.get_int("axis", 1)
    n = ip.get_int("num_output", 0)
    shape = bottom_shapes[0]
    if len(shape) == 4:  # NHWC -> NCHW count
        shape = (shape[0], shape[3], shape[1], shape[2])
    k = 1
    for d in shape[axis:]:
        k *= d
    out = [("w", (k, n) if ip.get_bool("transpose", False) else (n, k),
            ip.get("weight_filler", PbNode()))]
    if ip.get_bool("bias_term", True):
        out.append(("b", (n,), ip.get("bias_filler", PbNode())))
    return out


@register("InnerProduct", _ip_param_spec)
def _inner_product(spec, phase, compute_dtype):
    ip = spec.param("inner_product_param")
    axis = ip.get_int("axis", 1)
    transpose = ip.get_bool("transpose", False)

    def fn(p, bottoms):
        x = _to_nchw(bottoms[0])
        return lin_ops.inner_product(x, p["w"], p.get("b"), axis=axis,
                                     transpose=transpose, compute_dtype=compute_dtype)
    return fn


def _embed_param_spec(spec, bottom_shapes):
    ep = spec.param("embed_param")
    out = [("w", (ep.get_int("input_dim", 0), ep.get_int("num_output", 0)),
            ep.get("weight_filler", PbNode()))]
    if ep.get_bool("bias_term", True):
        out.append(("b", (ep.get_int("num_output", 0),), ep.get("bias_filler", PbNode())))
    return out


@register("Embed", _embed_param_spec)
def _embed(spec, phase, compute_dtype):
    return lambda p, b: lin_ops.embed(b[0], p["w"], p.get("b"))


@register("Softmax")
def _softmax(spec, phase, compute_dtype):
    axis = spec.param("softmax_param").get_int("axis", 1)

    def fn(p, bottoms):
        return lin_ops.softmax_op(bottoms[0], axis=_nchw_to_nhwc_axis(axis, bottoms[0].ndim))
    return fn


@register("ArgMax")
def _argmax(spec, phase, compute_dtype):
    ap = spec.param("argmax_param")
    axis = ap.get_int("axis", None)
    cfg = dict(top_k=ap.get_int("top_k", 1), out_max_val=ap.get_bool("out_max_val", False))

    def fn(p, bottoms):
        a = None if axis is None else _nchw_to_nhwc_axis(axis, bottoms[0].ndim)
        return lin_ops.argmax_op(bottoms[0], axis=a, **cfg)
    return fn


# Losses --------------------------------------------------------------------


def _label_squeeze(t: jax.Array) -> jax.Array:
    """Label blobs arrive as (N,H,W,1) after the NHWC boundary transpose."""
    if t.ndim == 4 and t.shape[-1] == 1:
        return t[..., 0]
    return t


@register("SoftmaxWithLoss")
def _softmax_with_loss(spec, phase, compute_dtype):
    lp = spec.param("loss_param")
    ignore = lp.get_int("ignore_label") if lp.has("ignore_label") else None
    normalization = lp.get_str("normalization", "VALID")
    if lp.has("normalize") and not lp.get_bool("normalize"):
        normalization = "BATCH_SIZE"

    def fn(p, bottoms):
        scores, lab = bottoms[0], _label_squeeze(bottoms[1])
        outer = 1
        for d in scores.shape[:-1]:
            outer *= d
        if lab.size == outer and lab.shape != scores.shape[:-1]:
            # Caffe accepts (N,1,1,1)-style label blobs (outer/inner count
            # semantics, softmax_loss_layer.cpp Reshape)
            lab = lab.reshape(scores.shape[:-1])
        loss = loss_ops.softmax_with_loss(
            scores, lab, ignore_label=ignore, normalization=normalization)
        if len(spec.tops) > 1:
            # optional second top = the softmax probabilities
            # (softmax_loss_layer.cpp:22-26 shares prob_ through top[1])
            return [loss, jax.nn.softmax(bottoms[0], axis=-1)]
        return loss
    return fn


@register("SoftmaxWithLossVec")
def _softmax_with_loss_vec(spec, phase, compute_dtype):
    vp = spec.param("softmax_with_loss_vec_param")
    lp = spec.param("loss_param")
    cross_entropy = vp.get_bool("cross_entropy", False)
    no_softmax = vp.get_bool("no_softmax", False)
    normalize = lp.get_bool("normalize", True)

    def fn(p, bottoms):
        w = bottoms[2] if len(bottoms) > 2 else None
        # dispatch at TRACE time (not build time) so the sharded_losses
        # context can swap in the psum'ed-normaliser variant under a
        # spatial mesh (parallel/graph_spatial.py)
        loss = loss_ops.softmax_loss_vec(
            bottoms[0], bottoms[1], w, cross_entropy=cross_entropy,
            no_softmax=no_softmax, normalize=normalize)
        if len(spec.tops) > 1:
            # top[1] shares prob_ (softmax_loss_vec_layer.cpp:149-151):
            # sigmoid in CE mode, passthrough with no_softmax, else softmax
            x = bottoms[0]
            prob = (jax.nn.sigmoid(x) if cross_entropy
                    else x if no_softmax else jax.nn.softmax(x, axis=-1))
            return [loss, prob]
        return loss
    return fn


@register("SmoothL1Loss")
def _smooth_l1_loss(spec, phase, compute_dtype):
    def fn(p, bottoms):
        w = bottoms[2] if len(bottoms) > 2 else None
        return loss_ops.smooth_l1_loss(bottoms[0], bottoms[1], w)
    return fn


@register("SigmoidCrossEntropyLoss")
def _sigmoid_ce_loss(spec, phase, compute_dtype):
    return lambda p, b: loss_ops.sigmoid_cross_entropy_loss(b[0], b[1])


@register("EuclideanLoss")
def _euclidean_loss(spec, phase, compute_dtype):
    return lambda p, b: loss_ops.euclidean_loss(b[0], b[1])


@register("HingeLoss")
def _hinge_loss(spec, phase, compute_dtype):
    norm = spec.param("hinge_loss_param").get_str("norm", "L1")
    return lambda p, b: loss_ops.hinge_loss(b[0], _label_squeeze(b[1]), norm=norm)


@register("ContrastiveLoss")
def _contrastive_loss(spec, phase, compute_dtype):
    cp = spec.param("contrastive_loss_param")
    cfg = dict(margin=cp.get_float("margin", 1.0),
               legacy_version=cp.get_bool("legacy_version", False))
    return lambda p, b: loss_ops.contrastive_loss(b[0], b[1], b[2], **cfg)


@register("InfogainLoss")
def _infogain_loss(spec, phase, compute_dtype):
    # 2-bottom form: H comes from infogain_loss_param.source, a BlobProto
    # file read once at setup (infogain_loss_layer.cpp LayerSetUp);
    # 3-bottom form: H is the third bottom.
    H_static = None
    src = spec.param("infogain_loss_param").get_str("source", "")
    if src:
        from deepcut_tpu.io import blobproto_bytes_to_array
        with open(src, "rb") as f:
            H_static = jnp.squeeze(jnp.asarray(
                blobproto_bytes_to_array(f.read()), jnp.float32))

    def fn(p, bottoms):
        if len(bottoms) > 2:
            H = bottoms[2]
        elif H_static is not None:
            H = H_static
        else:
            raise ValueError(
                "InfogainLoss needs a third bottom or "
                "infogain_loss_param.source (infogain_loss_layer.cpp)")
        return loss_ops.infogain_loss(bottoms[0], _label_squeeze(bottoms[1]), H)
    return fn


@register("MultinomialLogisticLoss")
def _mll(spec, phase, compute_dtype):
    return lambda p, b: loss_ops.multinomial_logistic_loss(b[0], _label_squeeze(b[1]))


@register("Accuracy")
def _accuracy(spec, phase, compute_dtype):
    ap = spec.param("accuracy_param")
    lp = spec.param("loss_param")
    # ignore_label lives in AccuracyParameter (accuracy_layer.cpp:16-19);
    # loss_param kept as a lenient fallback for hand-written configs
    ignore = (ap.get_int("ignore_label") if ap.has("ignore_label")
              else lp.get_int("ignore_label") if lp.has("ignore_label") else None)
    axis = ap.get_int("axis", 1)
    cfg = dict(top_k=ap.get_int("top_k", 1), ignore_label=ignore,
               per_class=len(spec.tops) > 1)

    def fn(p, b):
        # prototxt `axis:` is in NCHW terms; 4-d blobs arrive NHWC here
        # (boundary transpose), so map the Caffe axis to its NHWC position
        nd = b[0].ndim
        pos = _AXIS_MAP_4D[axis % 4] if nd == 4 else axis % nd
        scores = jnp.moveaxis(b[0], pos, -1)
        labels = _label_squeeze(b[1]).reshape(scores.shape[:-1])
        out = loss_ops.accuracy(scores, labels, **cfg)
        return list(out) if cfg["per_class"] else out
    return fn


# Python layers -------------------------------------------------------------

_PYTHON_REGISTRY: Dict[str, Any] = {}


def register_python_layer(name: str, cls_or_fn) -> None:
    """Register a user layer class (or plain function) under `layer:` name,
    bypassing module import — the WITH_PYTHON_LAYER analog for code that
    isn't importable by path."""
    _PYTHON_REGISTRY[name] = cls_or_fn


def _python_param_spec(spec, bottom_shapes):
    inst = _python_instance(spec)
    if hasattr(inst, "param_spec"):
        return [(k, tuple(s), f if f is not None else PbNode())
                for k, s, f in inst.param_spec(bottom_shapes)]
    return []


# keyed by id(spec) with a strong reference to the spec itself — without it,
# a garbage-collected spec's id can be reused by a NEW spec and hand the new
# layer a stale instance of a different class.
_PYTHON_INSTANCES: Dict[int, Tuple[Any, Any]] = {}


def _python_instance(spec):
    """One layer instance per LayerSpec (setup runs once, like LayerSetUp)."""
    key = id(spec)
    if key in _PYTHON_INSTANCES:
        return _PYTHON_INSTANCES[key][1]
    pp = spec.param("python_param")
    module = pp.get_str("module", "")
    layer = pp.get_str("layer", "")
    obj = _PYTHON_REGISTRY.get(layer)
    if obj is None:
        import importlib

        if not module:
            raise ValueError(
                f"Python layer {spec.name!r}: layer {layer!r} is neither "
                "registered via register_python_layer nor qualified with "
                "python_param.module")
        obj = getattr(importlib.import_module(module), layer)
    inst = obj() if isinstance(obj, type) else obj
    try:
        inst.param_str = pp.get_str("param_str", "")
    except AttributeError:
        pass
    if hasattr(inst, "setup"):
        inst.setup(pp.get_str("param_str", ""))
    _PYTHON_INSTANCES[key] = (spec, inst)
    return inst


@register("Python", _python_param_spec)
def _python_layer(spec, phase, compute_dtype):
    """User-defined layer (reference: python/caffe/_caffe.cpp:272-291 +
    layer_factory WITH_PYTHON_LAYER; tests modeled on
    python/caffe/test/test_python_layer.py).

    TPU-native contract (the graph is jit-traced, so blob-mutation APIs are
    replaced by pure functions):
      - ``forward(self, *bottoms) -> array | tuple`` — jnp-traceable;
      - optional ``setup(self, param_str)`` — runs once at build;
      - optional ``backward(self, grad_top, *bottoms) -> grad_bottoms`` —
        installed as a jax.custom_vjp (otherwise autodiff differentiates
        forward directly — usually what you want). For layers with
        learnable blobs, backward may take a ``params`` kwarg and return
        the param-gradient dict as a trailing tuple element; without it,
        params receive ZERO gradients under the custom rule;
      - optional ``param_spec(self, bottom_shapes) -> [(key, shape,
        filler_node|None)]`` to declare learnable blobs, passed to forward
        as a ``params`` keyword argument.
    A plain function registered via register_python_layer works too.
    """
    import inspect

    inst = _python_instance(spec)
    try:
        inst.phase = phase
    except AttributeError:
        pass
    fwd = inst.forward if hasattr(inst, "forward") else inst
    wants_params = "params" in inspect.signature(fwd).parameters

    if hasattr(inst, "backward") and callable(inst.backward):
        # custom backward: the VJP covers (params, *bottoms) so it also
        # applies to layers with learnable blobs. backward may accept a
        # `params` kwarg, and may return param grads as a trailing dict
        # (otherwise params get zero gradients under the custom rule).
        bwd_wants_params = "params" in inspect.signature(inst.backward).parameters

        def _run(p, bottoms):
            return fwd(*bottoms, params=p) if wants_params else fwd(*bottoms)

        @jax.custom_vjp
        def call(p, *bottoms):
            return _run(p, bottoms)

        def call_fwd(p, *bottoms):
            return _run(p, bottoms), (p, bottoms)

        def call_bwd(res, g):
            p, bottoms = res
            grads = (inst.backward(g, *bottoms, params=p) if bwd_wants_params
                     else inst.backward(g, *bottoms))
            param_grads = None
            if isinstance(grads, tuple) and grads and isinstance(grads[-1], dict):
                param_grads = grads[-1]
                grads = grads[:-1]
            if not isinstance(grads, (tuple, list)):
                grads = (grads,)
            if param_grads is None:
                param_grads = jax.tree_util.tree_map(jnp.zeros_like, p)
            return (param_grads, *grads)

        call.defvjp(call_fwd, call_bwd)

        def fn(p, bottoms):
            return call(p or {}, *bottoms)
    else:
        def fn(p, bottoms):
            if wants_params:
                return fwd(*bottoms, params=p)
            return fwd(*bottoms)
    return fn


# Data-ish ------------------------------------------------------------------


@register("DummyData")
def _dummy_data(spec, phase, compute_dtype):
    dp = spec.param("dummy_data_param")
    shapes = []
    for sh in dp.get_list("shape"):
        shapes.append(tuple(int(d) for d in sh.get_list("dim")))
    if not shapes:
        # legacy 4-field form (dummy_data_layer.cpp: repeated num/channels/
        # height/width, 1-or-per-top each)
        legacy = [dp.get_list(k) for k in ("num", "channels", "height", "width")]
        count = max((len(v) for v in legacy), default=0)
        for i in range(count):
            shapes.append(tuple(
                int(v[min(i, len(v) - 1)]) if v else 1 for v in legacy))
    n_top = len(spec.tops)
    while len(shapes) < n_top:
        shapes.append(shapes[-1] if shapes else (1,))
    fills = dp.get_list("data_filler")

    ftypes = [f.get_str("type", "constant") for f in fills] or ["constant"]
    any_random = any(t not in ("constant",) for t in ftypes)

    def fn(p, bottoms, rng=None):
        outs = []
        for i in range(n_top):
            shape = shapes[i]
            if len(shape) == 4:
                shape = (shape[0], shape[2], shape[3], shape[1])
            filler = fills[min(i, len(fills) - 1)] if fills else PbNode()
            ftype = filler.get_str("type", "constant")
            if ftype == "constant" or rng is None:
                # non-constant fillers degrade to zeros without a key (plain
                # net.forward outside a train step)
                val = (filler.get_float("value", 0.0)
                       if ftype == "constant" else 0.0)
                outs.append(jnp.full(shape, val, jnp.float32))
            else:
                # dummy_data_layer.cpp refills NON-constant fillers every
                # forward; the executor's per-layer per-step key drives it
                sub = jax.random.fold_in(rng, i)
                if ftype == "gaussian":
                    outs.append(filler.get_float("mean", 0.0) +
                                filler.get_float("std", 1.0) *
                                jax.random.normal(sub, shape, jnp.float32))
                elif ftype == "uniform":
                    lo = filler.get_float("min", 0.0)
                    hi = filler.get_float("max", 1.0)
                    outs.append(jax.random.uniform(
                        sub, shape, jnp.float32, lo, hi))
                else:
                    outs.append(fillers.fill(filler, sub, shape))
        return outs
    fn.needs_rng = any_random
    # dummy_data_layer.cpp fills CONSTANT tops once in LayerSetUp and leaves
    # them alone in Forward — so an externally staged value (pycaffe/matcaffe
    # `blobs('label').set_data(...)` before training) persists. The executor
    # honours this by not overwriting a sticky top that arrived as an input.
    fn.sticky_tops = frozenset(
        i for i in range(n_top)
        if (fills[min(i, len(fills) - 1)].get_str("type", "constant")
            if fills else "constant") == "constant")
    return fn
