"""DeeperCut part-detector models: dilated fully-convolutional ResNets.

Native TPU-first reimplementation of the reference's 680-layer prototxt
(models/deepercut/ResNet-152.prototxt): conv1 7x7/2 -> BN/Scale/ReLU ->
maxpool 3x3/2 (ceil) -> res2 (3 blocks) -> res3 (8) /2 -> res4 (36) /2 ->
res5 (3, stride removed, 3x3 convs dilation 2) -> three deconv heads off
res5c fused with 1x1 skip convs off res3b7 via top-left crop + sum:
part scoremaps (J ch, sigmoid "prob"), location refinement (2J ch,
"loc_pred"), pairwise regression (J*(J-1)*2 ch, "next_pred"). Output stride 8.

Differences from the reference engine (by design, not omission):
- parameters are a pytree keyed by the *same Caffe layer names* as the
  prototxt, so `.caffemodel` conversion is a 1:1 rename;
- compute is NHWC bfloat16 with float32 accumulation (MXU-native) instead of
  NCHW float32 im2col+GEMM;
- inference uses BN/Scale folded into conv weights (`fold_bn`) — what the
  reference pays per-layer kernel launches for, XLA gets as a single fused
  conv epilogue;
- the whole forward is one jit-compiled function; there is no per-layer
  dispatch loop.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deepcut_tpu.ops.conv import conv2d, conv2d_s2d, deconv2d
from deepcut_tpu.ops.norm import batch_norm_inference, bn_scale_affine, scale as scale_op
from deepcut_tpu.ops.pool import max_pool2d, max_pool2d_eqgrad
from deepcut_tpu.ops.activations import relu, sigmoid
from deepcut_tpu.ops.eltwise import crop_like

Params = Dict[str, Dict[str, jax.Array]]

# BGR training mean (pose_data_layer.cpp:627-667). Integer-valued, so
# device-side subtraction of a uint8 input is bit-identical to the host
# float path — see constants.py for why there is exactly one definition.
from deepcut_tpu.constants import MEAN_BGR


def prepare_input(x: jax.Array) -> jax.Array:
    """Accept either a mean-subtracted float image batch (the classic
    contract) or a raw uint8 BGR canvas: uint8 inputs are converted and
    mean-subtracted ON DEVICE. This quarters the host->device transfer and
    removes the input pipeline's full-canvas float pass (its hottest line) —
    the TPU-idiomatic layout for a production input pipeline."""
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) - jnp.asarray(MEAN_BGR, jnp.float32)
    return x


@dataclasses.dataclass(frozen=True)
class DeeperCutConfig:
    """Model family config. Defaults = the reference ResNet-152 part detector."""

    depths: Tuple[int, ...] = (3, 8, 36, 3)
    stage_widths: Tuple[int, ...] = (64, 128, 256, 512)
    # Per-stage (stride, dilation). DeeperCut removes res5's stride and
    # dilates its 3x3 convs by 2 (prototxt line ~6767 "stride: 1 #2").
    stage_strides: Tuple[int, ...] = (1, 2, 2, 1)
    stage_dilations: Tuple[int, ...] = (1, 1, 1, 2)
    num_joints: int = 14
    location_refinement: bool = True
    pairwise: bool = True
    # "letters" (res3b, res3c...) for ResNet-50, "numbered" (res3b1...) for 101/152.
    naming: str = "numbered"
    bn_eps: float = 1e-5
    compute_dtype: Any = jnp.bfloat16
    # Rematerialise residual blocks under autodiff (jax.checkpoint):
    # activations are recomputed in the backward pass instead of stored,
    # trading ~33% extra forward FLOPs for O(depth) -> O(1) per-stage
    # activation memory — lifts the max trainable batch at 688px.
    # True/False = all/no stages; a 4-tuple of bools selects per stage
    # (res2..res5) — the early high-resolution stages hold most of the
    # activation bytes, so e.g. (True, True, False, False) buys most of the
    # memory for a fraction of the recompute.
    remat: Any = False
    # Mixed-precision training: the UNfolded (training) forward computes
    # convs in compute_dtype (bf16) with f32 accumulation while parameters,
    # BN statistics, losses, and updates stay f32 — the MXU runs at its
    # native rate instead of the multi-pass f32 decomposition. The reference
    # trains pure f32; leave False for bit-faithful trajectories.
    mixed_train: bool = False
    # Opt-in training levers that trade exact reference semantics for
    # measured step time (the cuDNN-vs-Caffe engine precedent: same op,
    # different numerics, user-selectable). Bundles (a) the equality-mask
    # pool backward (ops/pool.max_pool2d_eqgrad — tied maxima each get the
    # full cotangent instead of Caffe's first-max-wins) and (b) the
    # space-to-depth conv1 lowering (ops/conv.conv2d_s2d — same sums
    # reassociated; different XLA kernel/rounding). Trajectory deltas are
    # characterized in tests/test_fast_semantics.py; A/B numbers in
    # docs/performance.md. Applies to the UNfolded (training) forward on
    # the single-device/data-parallel paths; the spatial shard_map path
    # rejects it loudly.
    fast_semantics: bool = False

    @property
    def stride(self) -> int:
        return 8

    @property
    def locref_channels(self) -> int:
        return 2 * self.num_joints

    @property
    def pairwise_channels(self) -> int:
        return self.num_joints * (self.num_joints - 1) * 2


RESNET_DEPTHS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


def deepercut_config(resnet_depth: int = 152, **kw) -> DeeperCutConfig:
    naming = "letters" if resnet_depth == 50 else "numbered"
    return DeeperCutConfig(depths=RESNET_DEPTHS[resnet_depth], naming=naming, **kw)


def _block_names(cfg: DeeperCutConfig, stage: int) -> List[str]:
    """Caffe/MSRA block names for stage index (0-based; stage label = idx+2)."""
    n = cfg.depths[stage]
    label = stage + 2
    if cfg.naming == "letters" or n <= 3:
        return [f"{label}{chr(ord('a') + i)}" for i in range(n)]
    return [f"{label}a"] + [f"{label}b{i}" for i in range(1, n)]


def _skip_block(cfg: DeeperCutConfig) -> Optional[str]:
    """The stride-8 skip tap: last block of stage 3 (res3b7 in ResNet-152).

    None for truncated configs whose stage 3 is empty (profiling prefixes) —
    run_trunk then returns no skip tap and compute_heads fails loudly.
    """
    names = _block_names(cfg, 1)
    return names[-1] if names else None


# --------------------------------------------------------------------------
# Parameter initialisation (fillers: include/caffe/filler.hpp semantics)
# --------------------------------------------------------------------------


def _msra(rng, kh, kw, cin, cout, dtype=jnp.float32):
    fan_in = kh * kw * cin
    std = math.sqrt(2.0 / fan_in)
    return std * jax.random.normal(rng, (kh, kw, cin, cout), dtype)


def init_params(rng: jax.Array, cfg: DeeperCutConfig = DeeperCutConfig()) -> Params:
    """Random init mirroring the reference's filler choices (MSRA conv,
    zero-bias, BN identity stats). Returns Caffe-named param pytree."""
    params: Params = {}
    keys = iter(jax.random.split(rng, 4096))

    def add_conv(name, kh, kw, cin, cout, bias=False):
        params[name] = {"w": _msra(next(keys), kh, kw, cin, cout)}
        if bias:
            params[name]["b"] = jnp.zeros((cout,), jnp.float32)

    def add_bn_scale(suffix, c):
        params[f"bn{suffix}"] = {
            "mean": jnp.zeros((c,), jnp.float32),
            "var": jnp.ones((c,), jnp.float32),
            "scale_factor": jnp.ones((1,), jnp.float32),
        }
        params[f"scale{suffix}"] = {
            "gamma": jnp.ones((c,), jnp.float32),
            "beta": jnp.zeros((c,), jnp.float32),
        }

    add_conv("conv1", 7, 7, 3, 64)
    add_bn_scale("_conv1", 64)

    cin = 64
    for stage in range(4):
        width = cfg.stage_widths[stage]
        cout = 4 * width
        for bi, block in enumerate(_block_names(cfg, stage)):
            if bi == 0:
                add_conv(f"res{block}_branch1", 1, 1, cin, cout)
                add_bn_scale(f"{block}_branch1", cout)
            add_conv(f"res{block}_branch2a", 1, 1, cin if bi == 0 else cout, width)
            add_bn_scale(f"{block}_branch2a", width)
            add_conv(f"res{block}_branch2b", 3, 3, width, width)
            add_bn_scale(f"{block}_branch2b", width)
            add_conv(f"res{block}_branch2c", 1, 1, width, cout)
            add_bn_scale(f"{block}_branch2c", cout)
        cin = cout

    skip_c = 4 * cfg.stage_widths[1]  # stride-8 tap channels (512)
    top_c = 4 * cfg.stage_widths[3]   # res5 output channels (2048)
    heads = [("pose", cfg.num_joints)]
    if cfg.location_refinement:
        heads.append(("locref", cfg.locref_channels))
    if cfg.pairwise:
        heads.append(("next", cfg.pairwise_channels))
    for head, ch in heads:
        # Heads use gaussian std 0.01 like the reference's finetune prototxts
        # (new layers on top of a pretrained trunk). Deconv weight layout
        # (kh, kw, Cin, Cout): see ops/conv.py deconv2d.
        params[f"res5c_up_{head}"] = {
            "w": 0.01 * jax.random.normal(next(keys), (3, 3, top_c, ch), jnp.float32),
            "b": jnp.zeros((ch,), jnp.float32),
        }
        params[f"res3d_{head}"] = {
            "w": 0.01 * jax.random.normal(next(keys), (1, 1, skip_c, ch), jnp.float32),
            "b": jnp.zeros((ch,), jnp.float32),
        }
    return params


# --------------------------------------------------------------------------
# BN/Scale folding — the inference fast path
# --------------------------------------------------------------------------


def cast_params(params: Params, dtype=jnp.bfloat16) -> Params:
    """Pre-cast conv weights to the compute dtype once at load, halving the
    per-step HBM weight traffic (f32 params would otherwise be read at 4
    bytes/elem and cast every forward). Biases stay f32 (epilogue adds run
    in the f32 accumulator)."""
    out: Params = {}
    for name, p in params.items():
        q = dict(p)
        if "w" in q:
            q["w"] = jnp.asarray(q["w"], dtype)
        out[name] = q
    return out


def fold_bn(params: Params, cfg: DeeperCutConfig = DeeperCutConfig()) -> Params:
    """Fold each conv's trailing BatchNorm+Scale into (w, b).

    y = gamma * (conv(x, w) - mean/s) * rsqrt(var/s + eps) + beta
      = conv(x, w * g) + (beta - mean/s * g),   g = gamma * rsqrt(var/s + eps)
    """
    folded: Params = {}
    for name, p in params.items():
        if name.startswith("bn") or name.startswith("scale"):
            continue
        bn_key = "_conv1" if name == "conv1" else name[len("res"):] if name.startswith("res") and f"bn{name[len('res'):]}" in params else None
        if bn_key is None or f"bn{bn_key}" not in params:
            folded[name] = dict(p)
            continue
        bn = params[f"bn{bn_key}"]
        sc = params[f"scale{bn_key}"]
        s = bn.get("scale_factor", jnp.ones((1,), jnp.float32)).reshape(())
        inv = jnp.where(s == 0, 0.0, 1.0 / jnp.where(s == 0, 1.0, s))
        mean = bn["mean"] * inv
        var = bn["var"] * inv
        g = sc["gamma"] * jax.lax.rsqrt(var + cfg.bn_eps)
        folded[name] = {
            "w": p["w"] * g[None, None, None, :],
            "b": p.get("b", 0.0) + sc["beta"] - mean * g,
        }
    return folded


# --------------------------------------------------------------------------
# Forward
# --------------------------------------------------------------------------


def forward(
    params: Params,
    x: jax.Array,
    cfg: DeeperCutConfig = DeeperCutConfig(),
    *,
    folded: bool = False,
    heads: Optional[Sequence[str]] = None,
) -> Dict[str, jax.Array]:
    """Run the part detector. x: (N, H, W, 3), mean-subtracted BGR, H,W % 8 == 0
    preferred (matches reference canvas padding, estimate_pose.py:85-103).

    Returns dict with 'prob' (N,h,w,J), 'fc_pose' (pre-sigmoid), and when
    enabled 'loc_pred' (N,h,w,2J), 'next_pred'; h = H/8 + 1 off-by-ceil grid
    identical to the reference.
    """
    cdt = cfg.compute_dtype if (folded or cfg.mixed_train) else None
    # preferred_element_type=f32 with bf16 operands breaks the conv transpose
    # rule under autodiff; mixed TRAINING therefore lets the output round to
    # bf16 (the MXU still accumulates f32 internally) — standard mixed
    # precision. Folded inference keeps the explicit f32 accumulate.
    acc = None if (cfg.mixed_train and not folded) else jnp.float32
    x = prepare_input(x)
    fast = cfg.fast_semantics and not folded  # training lever; serving
    res5c, skip = run_trunk(                  # keeps the reference lowering
        params, x, cfg,
        conv_fn=functools.partial(conv2d, compute_dtype=cdt, accum_dtype=acc),
        pool_fn=((lambda y: max_pool2d_eqgrad(y, 3, 2, 0)) if fast
                 else (lambda y: max_pool2d(y, kernel=3, stride=2))),
        conv1_fn=(functools.partial(conv2d_s2d, compute_dtype=cdt,
                                    accum_dtype=acc) if fast else None),
        folded=folded,
    )
    return compute_heads(params, res5c, skip, cfg, compute_dtype=cdt,
                         accum_dtype=acc, heads=heads)


def run_trunk(
    params: Params,
    x: jax.Array,
    cfg: DeeperCutConfig,
    *,
    conv_fn,
    pool_fn,
    conv1_fn=None,
    folded: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """The dilated-ResNet trunk (conv1 .. res5c), generic over the conv/pool
    implementations: the single-device forward passes ops/conv.conv2d, the
    spatially-sharded training path (parallel/spatial.py) passes
    halo-exchange variants. Returns (res5c, skip_tap).

    conv_fn(x, w, b, *, stride, pad, dilation) must honour Caffe conv
    geometry; pool_fn(y) is the stem 3x3/2 ceil-mode maxpool; conv1_fn
    optionally overrides the stem conv only (the fast_semantics s2d path).
    """
    def cbr(x, name, *, stride=1, pad=0, dilation=1, act=True):
        p = params[name]
        fn = conv1_fn if (name == "conv1" and conv1_fn is not None) else conv_fn
        y = fn(x, p["w"], p.get("b"), stride=stride, pad=pad,
               dilation=dilation)
        if not folded:
            bn_key = "_conv1" if name == "conv1" else name[len("res"):]
            bn = params[f"bn{bn_key}"]
            sc = params[f"scale{bn_key}"]
            # BN statistics are FROZEN constants under autodiff: the
            # reference pins all three BatchNorm blobs at lr_mult 0 and
            # trains with use_global_stats (ResNet-152.prototxt:30-34), so
            # mean/var/scale_factor never receive gradients — and stopping
            # them here lets XLA prune the 155 per-channel full-tensor
            # reductions their cotangents would otherwise cost in split
            # grad/update programs (PoseSolver). Scale's gamma/beta stay
            # trainable (no param override in the prototxt).
            sg = jax.lax.stop_gradient
            sf = bn.get("scale_factor")
            # BN + Scale as one per-channel fused multiply-add (see
            # ops/norm.bn_scale_affine) — same math, one tensor pass
            y = bn_scale_affine(y, sg(bn["mean"]), sg(bn["var"]),
                                None if sf is None else sg(sf), sc["gamma"],
                                sc["beta"], eps=cfg.bn_eps)
        return relu(y) if act else y

    x = (x.astype(cfg.compute_dtype) if (folded or cfg.mixed_train)
         else x.astype(jnp.float32))
    y = cbr(x, "conv1", stride=2, pad=3)
    y = pool_fn(y)

    taps: Dict[str, jax.Array] = {}
    skip_name = _skip_block(cfg)
    for stage in range(4):
        s = cfg.stage_strides[stage]
        d = cfg.stage_dilations[stage]
        stage_remat = (bool(cfg.remat[stage])
                       if isinstance(cfg.remat, (tuple, list))
                       else bool(cfg.remat))
        for bi, block in enumerate(_block_names(cfg, stage)):
            bs = s if bi == 0 else 1

            def one_block(y, *, block=block, bi=bi, bs=bs, d=d):
                if bi == 0:
                    shortcut = cbr(y, f"res{block}_branch1", stride=bs, act=False)
                else:
                    shortcut = y
                z = cbr(y, f"res{block}_branch2a", stride=bs)
                z = cbr(z, f"res{block}_branch2b", pad=d, dilation=d)
                z = cbr(z, f"res{block}_branch2c", act=False)
                return relu(shortcut + z)
            y = jax.checkpoint(one_block)(y) if stage_remat else one_block(y)
            if block == skip_name:
                taps["skip"] = y
    # skip tap is None for truncated configs (e.g. profiling prefixes with
    # stage depths zeroed); compute_heads fails loudly on None
    return y, taps.get("skip")


def compute_heads(
    params: Params,
    res5c: jax.Array,
    skip: jax.Array,
    cfg: DeeperCutConfig,
    *,
    compute_dtype=None,
    accum_dtype=jnp.float32,
    heads: Optional[Sequence[str]] = None,
) -> Dict[str, jax.Array]:
    """Deconv + skip-conv prediction heads over the trunk taps (shared by
    the single-device forward and the spatially-sharded training path,
    parallel/spatial.py — the heads run on the gathered full grid there).

    The enabled heads run as ONE deconv + ONE skip conv over concatenated
    output channels (14+28+364 = 406 for all three), then slice.
    Mathematically identical to per-head convs (channel concat commutes
    with conv), but a 14-channel deconv leaves 89% of the MXU's 128 lanes
    idle — fused, the heads cost one well-filled pass instead of three
    starved ones.

    heads: optional subset of ("pose", "locref", "next") to compute — the
    serving path passes ("pose", "locref") so the single-person decode
    never pays the 364-channel pairwise head (fusion would otherwise defeat
    XLA's dead-code elimination of unused heads; A/B'd on v5e).
    """
    cdt, acc = compute_dtype, accum_dtype
    outs: Dict[str, jax.Array] = {}
    head_list = [("pose", cfg.num_joints)]
    if cfg.location_refinement:
        head_list.append(("locref", cfg.locref_channels))
    if cfg.pairwise:
        head_list.append(("next", cfg.pairwise_channels))
    if heads is not None:
        head_list = [(n, ch) for n, ch in head_list if n in heads]
        if not any(n == "pose" for n, _ in head_list):
            raise ValueError("compute_heads: the 'pose' head is mandatory")
    wup = jnp.concatenate([params[f"res5c_up_{n}"]["w"] for n, _ in head_list], axis=3)
    bup = jnp.concatenate([params[f"res5c_up_{n}"]["b"] for n, _ in head_list])
    wsk = jnp.concatenate([params[f"res3d_{n}"]["w"] for n, _ in head_list], axis=3)
    bsk = jnp.concatenate([params[f"res3d_{n}"]["b"] for n, _ in head_list])
    up = deconv2d(res5c, wup, bup, stride=2, compute_dtype=cdt, accum_dtype=acc)
    sk = conv2d(skip, wsk, bsk, compute_dtype=cdt, accum_dtype=acc)
    fused = crop_like(up, sk.shape, axis=1) + sk

    off = 0
    per_head: Dict[str, jax.Array] = {}
    for n, ch in head_list:
        per_head[n] = fused[..., off:off + ch]
        off += ch
    # heads always emit f32: losses (custom_vjp, f32 cotangents) and decode
    # run in f32 regardless of the trunk's compute dtype
    outs["fc_pose"] = per_head["pose"].astype(jnp.float32)
    outs["prob"] = sigmoid(outs["fc_pose"])
    if "locref" in per_head:
        outs["loc_pred"] = per_head["locref"].astype(jnp.float32)
    if "next" in per_head:
        outs["next_pred"] = per_head["next"].astype(jnp.float32)
    return outs


def make_forward(cfg: DeeperCutConfig = DeeperCutConfig(), *, folded: bool = True,
                 heads: Optional[Sequence[str]] = None):
    """Return a jittable forward fn (params, x) -> outputs.

    heads: optional head subset (see compute_heads) — serving entry points
    that only decode pose+locref pass ("pose", "locref")."""

    def fn(params, x):
        return forward(params, x, cfg, folded=folded, heads=heads)

    return fn
