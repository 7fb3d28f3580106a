"""int8 serving mode: post-training quantization of the folded model.

Honest delta-timed on v5e (round 2 — round 1's "int8 loses" used a broken
timing harness and is retracted): **1.68-1.70 ms/img vs bf16's 2.16 at
688/batch 4, a 24% end-to-end win**, plus 4x smaller weights (58 MB vs
233 MB). bf16 stays the default because it is the reference-parity numerics;
int8 is the throughput/memory mode (prob within ~0.1 abs of bf16). Scheme:

- weights: per-output-channel absmax symmetric int8 (one-time);
- activations: per-conv-input static scales from a calibration pass
  (dynamic absmax would re-read every activation from HBM; static scales
  let XLA fuse quantize into the previous op's epilogue);
- conv accumulates int32, dequantizes to f32 epilogue (scale*acc + bias),
  ReLU, requantize for the next conv. Residual adds stay f32.

The reference has no quantized path at all — this is a beyond-parity
serving feature. Expect small scoremap deviations (validated by test
against the bf16 path on random weights).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deepcut_tpu.models.resnet import DeeperCutConfig, _block_names, _skip_block
from deepcut_tpu.ops.pool import max_pool2d
from deepcut_tpu.ops.activations import relu, sigmoid
from deepcut_tpu.ops.eltwise import crop_like
from deepcut_tpu.ops.conv import conv2d, deconv2d


def quantize_weights(folded_params: Dict, *, quantize_deconv: bool = False) -> Dict:
    """Folded (w, b) params -> {w_q int8, w_scale (Cout,), b} per conv.
    Deconv heads stay bf16 by default (tiny cost, shape-sensitive); pass
    quantize_deconv=True to also emit int8 deconv weights (w layout
    (kh,kw,Cin,Cout) — per-output-channel absmax over axes 0,1,2, same as
    conv) for forward_int8(int8_deconv=True). conv1 always stays bf16: a
    3-channel int8 conv wastes the MXU's lane packing and the 688-squared
    input quantize pass costs more than int8 saves (round-3 ladder A/B:
    bf16 stem is the faster AND more accurate choice)."""
    out: Dict[str, Dict[str, jax.Array]] = {}
    for name, entry in folded_params.items():
        if ((name.startswith("res5c_up_") and not quantize_deconv)
                or name == "conv1"
                or "w" not in entry or entry["w"].ndim != 4):
            out[name] = dict(entry)
            continue
        w = entry["w"].astype(jnp.float32)
        s = jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0
        s = jnp.where(s == 0, 1.0, s)
        out[name] = {
            "w_q": jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8),
            "w_scale": s,
            "b": entry.get("b", jnp.zeros((w.shape[-1],), jnp.float32)),
        }
        if name.startswith("res5c_up_"):
            out[name]["w"] = entry["w"]  # keep the float weights too so the
            # same qparams dict still serves int8_deconv=False programs
    return out


def _conv_i8(x_q, w_q, *, stride=1, pad=0, dilation=1):
    return jax.lax.conv_general_dilated(
        x_q, w_q, window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)), rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def _deconv_i8(x_q, w_q, *, stride=2):
    """int8 transposed conv with an int32 accumulator. Same lowering as
    ops.conv.deconv2d (zero-dilated stride-1 conv over the flipped kernel)
    but returning the raw int32 accumulator — deconv2d casts its output back
    to the input dtype, which would wrap int8."""
    kh, kw = int(w_q.shape[0]), int(w_q.shape[1])
    return jax.lax.conv_general_dilated(
        x_q, jnp.flip(w_q, axis=(0, 1)), window_strides=(1, 1),
        padding=((kh - 1, kh - 1), (kw - 1, kw - 1)),
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def forward_int8(
    qparams: Dict,
    act_scales: Dict[str, jax.Array],
    x: jax.Array,
    cfg: DeeperCutConfig = DeeperCutConfig(),
    *,
    int8_residual: bool = False,
    int8_deconv: bool = False,
    heads: Optional[Sequence[str]] = None,
) -> Dict[str, jax.Array]:
    """Quantized inference forward. x: (N,H,W,3) float (mean-subtracted).

    int8_residual=True additionally keeps the RESIDUAL STREAM int8-resident:
    each block boundary is quantized once (static per-boundary scale from
    calibration, key "res{block}#out") and consumed as int8 by the next
    block's convs and by the identity shortcut — the inter-block activation
    tensors cost 1 byte/elem of HBM instead of 4.

    heads: optional subset of ("pose", "locref", "next") — the serving path
    passes ("pose", "locref") so single-person decode never computes the
    364-channel pairwise head (1.343 -> 1.328 ms/img @688 b4; all-heads
    1.539 vs the old per-head 1.589)."""

    cdt = cfg.compute_dtype  # bf16 inter-conv tensors: halves stream traffic
    # vs the f32 intermediates of round 1 (A/B: 1.72 -> ~1.45 ms/img @688 b4)

    def quant(xf, s):
        # multiply by the (scalar, hoisted) reciprocal instead of a
        # per-element divide: ~4% end-to-end (A/B'd on v5e)
        return jnp.clip(jnp.round(xf.astype(jnp.float32) * (1.0 / s)),
                        -127, 127).astype(jnp.int8)

    def qconv(xf, name, *, stride=1, pad=0, dilation=1, act=True):
        p = qparams[name]
        s_x = act_scales[name]
        acc = _conv_i8(quant(xf, s_x), p["w_q"], stride=stride, pad=pad,
                       dilation=dilation)
        y = acc.astype(jnp.float32) * (s_x * p["w_scale"]) + p["b"]
        return (relu(y) if act else y).astype(cdt)

    def qconv_pre(x_q, s_x, name, *, stride=1, pad=0, dilation=1, act=True):
        """Conv on an already-quantized input at scale s_x."""
        p = qparams[name]
        acc = _conv_i8(x_q, p["w_q"], stride=stride, pad=pad, dilation=dilation)
        y = acc.astype(jnp.float32) * (s_x * p["w_scale"]) + p["b"]
        return (relu(y) if act else y).astype(cdt)

    # bf16 stem: conv1 stays unquantized (see quantize_weights docstring)
    p1 = qparams["conv1"]
    y = relu(conv2d(x.astype(cdt), p1["w"], p1.get("b"), stride=2, pad=3,
                    compute_dtype=cdt)).astype(cdt)
    y = max_pool2d(y, kernel=3, stride=2)
    skip_name = _skip_block(cfg)
    skip = None
    if not int8_residual:
        for stage in range(4):
            s = cfg.stage_strides[stage]
            d = cfg.stage_dilations[stage]
            for bi, block in enumerate(_block_names(cfg, stage)):
                bs = s if bi == 0 else 1
                if bi == 0:
                    shortcut = qconv(y, f"res{block}_branch1", stride=bs, act=False)
                else:
                    shortcut = y
                z = qconv(y, f"res{block}_branch2a", stride=bs)
                z = qconv(z, f"res{block}_branch2b", pad=d, dilation=d)
                z = qconv(z, f"res{block}_branch2c", act=False)
                y = relu(shortcut + z)
                if block == skip_name:
                    skip = y
        res5c = y
    else:
        y_q, s_y = None, None  # int8 stream (post first quantization)
        for stage in range(4):
            s = cfg.stage_strides[stage]
            d = cfg.stage_dilations[stage]
            for bi, block in enumerate(_block_names(cfg, stage)):
                bs = s if bi == 0 else 1
                if y_q is None:  # stem output: quantize once
                    s_y = act_scales[f"res{block}_branch2a"]
                    y_q = quant(y, s_y)
                if bi == 0:
                    shortcut = qconv_pre(y_q, s_y, f"res{block}_branch1",
                                         stride=bs, act=False)
                else:
                    shortcut = y_q.astype(jnp.float32) * s_y
                z = qconv_pre(y_q, s_y, f"res{block}_branch2a", stride=bs)
                z = qconv(z, f"res{block}_branch2b", pad=d, dilation=d)
                z = qconv(z, f"res{block}_branch2c", act=False)
                yf = relu(shortcut + z)
                s_y = act_scales[f"res{block}#out"]
                y_q = quant(yf, s_y)
                if block == skip_name:
                    skip = y_q.astype(jnp.float32) * s_y
        res5c = y_q.astype(jnp.float32) * s_y

    outs: Dict[str, jax.Array] = {}

    # FUSED heads over the enabled subset (round-3 re-A/B: round 2's
    # "fusion is slower" verdict was confounded by XLA dead-code-eliminating
    # the unused heads in the per-head variant; with the output set held
    # fixed, fusion wins at every subset size — 1.343 vs 1.372 ms/img for
    # pose+locref, 1.52 vs 1.59 for all three).
    enabled = [("pose", cfg.num_joints)]
    if cfg.location_refinement:
        enabled.append(("locref", cfg.locref_channels))
    if cfg.pairwise:
        enabled.append(("next", cfg.pairwise_channels))
    if heads is not None:
        enabled = [(n, c) for n, c in enabled if n in heads]
        if not any(n == "pose" for n, _ in enabled):
            raise ValueError("forward_int8: the 'pose' head is mandatory")
    names = [n for n, _ in enabled]
    if int8_deconv:
        # int8 transposed conv: quantize res5c once (scale "res5c_up"), run
        # the zero-dilated stride-1 conv in int8 with int32 accumulation,
        # dequantize in the epilogue (per-output-channel w_scales and biases
        # concatenate exactly like the skip conv's).
        s_up = act_scales["res5c_up"]
        wq_up = jnp.concatenate([qparams[f"res5c_up_{n}"]["w_q"] for n in names],
                                axis=3)
        ws_up = jnp.concatenate([qparams[f"res5c_up_{n}"]["w_scale"] for n in names])
        bup = jnp.concatenate([qparams[f"res5c_up_{n}"]["b"] for n in names])
        acc_up = _deconv_i8(quant(res5c, s_up), wq_up, stride=2)
        up = (acc_up.astype(jnp.float32) * (s_up * ws_up) + bup).astype(cdt)
    else:
        wup = jnp.concatenate([qparams[f"res5c_up_{n}"]["w"] for n in names],
                              axis=3).astype(cfg.compute_dtype)
        bup = jnp.concatenate([qparams[f"res5c_up_{n}"]["b"] for n in names])
        up = deconv2d(res5c.astype(cfg.compute_dtype), wup, bup, stride=2,
                      compute_dtype=cfg.compute_dtype)
    # fused int8 skip conv: ONE quantize of `skip` (the heads share the
    # input, so calibration gives them identical activation scales; the
    # per-output-channel w_scales concatenate exactly)
    s_sk = act_scales[f"res3d_{names[0]}"]
    wq = jnp.concatenate([qparams[f"res3d_{n}"]["w_q"] for n in names], axis=3)
    ws = jnp.concatenate([qparams[f"res3d_{n}"]["w_scale"] for n in names])
    bsk = jnp.concatenate([qparams[f"res3d_{n}"]["b"] for n in names])
    acc = _conv_i8(quant(skip, s_sk), wq)
    sk = acc.astype(jnp.float32) * (s_sk * ws) + bsk
    fused = crop_like(up.astype(jnp.float32), sk.shape, axis=1) + sk

    off = 0
    for n, c in enabled:
        val = fused[..., off:off + c]
        off += c
        if n == "pose":
            outs["fc_pose"] = val
            outs["prob"] = sigmoid(val)
        elif n == "locref":
            outs["loc_pred"] = val
        else:
            outs["next_pred"] = val
    return outs


def calibrate_act_scales(
    folded_params: Dict,
    cfg: DeeperCutConfig,
    sample: jax.Array,
    *,
    percentile: float = 100.0,
) -> Dict[str, jax.Array]:
    """One forward over a calibration batch, recording each conv input's
    absmax (or a subsampled percentile) -> static activation scales."""
    from deepcut_tpu.ops.conv import conv2d

    scales: Dict[str, jax.Array] = {}

    def record(name, xf):
        a = jnp.abs(xf.astype(jnp.float32)).reshape(-1)
        if percentile >= 100.0:
            v = jnp.max(a)
        else:
            # percentile on a subsample: full sorts of 10^7-element
            # activations would dominate calibration time
            step = max(a.shape[0] // 65536, 1)
            v = jnp.percentile(a[::step], percentile)
        scales[name] = jnp.maximum(v / 127.0, 1e-8)

    def cbr(xf, name, *, stride=1, pad=0, dilation=1, act=True):
        record(name, xf)
        p = folded_params[name]
        y = conv2d(xf, p["w"], p.get("b"), stride=stride, pad=pad,
                   dilation=dilation, compute_dtype=None)
        return relu(y) if act else y

    y = cbr(sample.astype(jnp.float32), "conv1", stride=2, pad=3)
    y = max_pool2d(y, kernel=3, stride=2)
    skip_name = _skip_block(cfg)
    skip = None
    for stage in range(4):
        s = cfg.stage_strides[stage]
        d = cfg.stage_dilations[stage]
        for bi, block in enumerate(_block_names(cfg, stage)):
            bs = s if bi == 0 else 1
            shortcut = cbr(y, f"res{block}_branch1", stride=bs, act=False) if bi == 0 else y
            z = cbr(y, f"res{block}_branch2a", stride=bs)
            z = cbr(z, f"res{block}_branch2b", pad=d, dilation=d)
            z = cbr(z, f"res{block}_branch2c", act=False)
            y = relu(shortcut + z)
            record(f"res{block}#out", y)  # int8-resident stream boundary
            if block == skip_name:
                skip = y
    record("res5c_up", y)  # deconv input, used when int8_deconv=True
    for headname in ("pose",) + (("locref",) if cfg.location_refinement else ()) \
            + (("next",) if cfg.pairwise else ()):
        record(f"res3d_{headname}", skip)
    return {k: jnp.asarray(v) for k, v in scales.items()}


def prepare_int8(params: Dict, cfg: DeeperCutConfig, sample: jax.Array,
                 *, quantize_deconv: bool = False,
                 percentile: float = 100.0):
    """(folded fp params) -> (qparams, act_scales) ready for forward_int8.

    percentile < 100 clips activation outliers during calibration (e.g.
    99.9): the few clipped values saturate at ±127 while every other
    activation gains quantization resolution — the standard robustness
    lever against a calibration batch with one hot pixel. A/B on the pose
    stack in docs/performance.md (absmax wins on clean batches; percentile
    is insurance, not a default)."""
    from deepcut_tpu.models.resnet import fold_bn

    folded = fold_bn(params, cfg) if any(k.startswith("bn") for k in params) else params
    scales = calibrate_act_scales(folded, cfg, sample, percentile=percentile)
    return quantize_weights(folded, quantize_deconv=quantize_deconv), scales
