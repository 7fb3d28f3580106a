"""Batch-1 serving latency ladder (VERDICT r4 #2): attack the 2.43 vs 2.10
ms/img batch-1/batch-4 gap on the single-image path — the reference's primary
UX (/root/reference/python/pose/estimate_pose.py:37 takes ONE image;
pose_demo.py:75-137 serves it). Variants, all measured with the delta harness
(see bench.py's timing note) in INTERLEAVED sessions so rig drift hits every
variant equally:

  fwd            raw bf16 forward, pre-staged bf16 canvas (bench.py baseline)
  fwd+decode     forward + fused on-device argmax/offset decode, one program
  full           uint8 688x688 frame in -> pad/mean/canvas -> forward ->
                 decode, ONE program (the demo/_full_pipeline default)
  full_donate    same program with the uint8 frame donated (aliasing A/B)
  int8           int8 forward at batch 1 (unit scales)
  pack2          one batch-2 program vs TWO sequential batch-1 programs:
                 the multi-scale packing question — per-POSE cost when two
                 scales share a canvas bucket (best case for packing; at
                 unequal scales add the zero-padding FLOP waste on top)

Run ON THE REAL TPU: python benchmarks/batch1_ladder.py
"""

import json
import statistics
import sys
import time

import jax
import jax.numpy as jnp

SIZE = 688
SESSIONS = 5
N1, N2 = 10, 50


def _timed(step, *args):
    def run(n):
        t0 = time.perf_counter()
        acc = None
        for _ in range(n):
            acc = step(*args)
        _ = float(acc)
        return (time.perf_counter() - t0) * 1000.0
    return run


def main():
    from deepcut_tpu.models.resnet import (
        deepercut_config, init_params, fold_bn, cast_params, make_forward)
    from deepcut_tpu.models.quantize import quantize_weights, forward_int8
    from deepcut_tpu.pose.decode import decode_pose
    from deepcut_tpu.pose.estimate import preprocess_on_device

    cfg = deepercut_config(152)
    params = cast_params(fold_bn(init_params(jax.random.PRNGKey(0), cfg), cfg))
    fwd = make_forward(cfg, folded=True, heads=("pose", "locref"))

    x1 = jnp.zeros((1, SIZE, SIZE, 3), jnp.bfloat16)
    x2 = jnp.zeros((2, SIZE, SIZE, 3), jnp.bfloat16)
    # 688x688 uint8 frame: canvas_size(688 + 64 pad cropped, 1.0) = 688
    frame = jnp.zeros((SIZE, SIZE, 3), jnp.uint8)

    @jax.jit
    def s_fwd(p, x):
        o = fwd(p, x)
        return jnp.sum(o["prob"]) + jnp.sum(o["loc_pred"])

    @jax.jit
    def s_fwd_decode(p, x):
        o = fwd(p, x)
        return jnp.sum(decode_pose(o["prob"][0], o["loc_pred"][0]))

    def full_fn(p, img_u8):
        canvas = preprocess_on_device.__wrapped__(
            img_u8, SIZE + 64, SIZE + 64, SIZE, SIZE)
        o = fwd(p, canvas.astype(cfg.compute_dtype))
        return jnp.sum(decode_pose(o["prob"][0], o["loc_pred"][0]))

    s_full = jax.jit(full_fn)
    s_full_donate = jax.jit(full_fn, donate_argnums=(1,))

    @jax.jit
    def s_pack2(p, x):
        o = fwd(p, x)
        return jnp.sum(jax.vmap(
            lambda sm, loc: decode_pose(sm, loc))(o["prob"], o["loc_pred"]))

    qparams = quantize_weights(fold_bn(init_params(jax.random.PRNGKey(0), cfg), cfg))
    uscales = {n: 1.0 for n, e in qparams.items() if "w_q" in e}
    xf1 = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)

    @jax.jit
    def s_int8(qp, x):
        o = forward_int8(qp, uscales, x, cfg, heads=("pose", "locref"))
        return jnp.sum(o["prob"]) + jnp.sum(o["loc_pred"])

    variants = [
        ("fwd", s_fwd, (params, x1), 1),
        ("fwd+decode", s_fwd_decode, (params, x1), 1),
        ("full", s_full, (params, frame), 1),
        ("full_donate", None, None, 1),  # special: re-feeds the donated frame
        ("int8", s_int8, (qparams, xf1), 1),
        ("pack2", s_pack2, (params, x2), 2),
    ]

    # donation consumes the input: hold a host copy and re-upload per call,
    # which is what a real serving loop does anyway (fresh frame each request)
    import numpy as np
    frame_np = np.zeros((SIZE, SIZE, 3), np.uint8)

    def s_full_donate_call(p, _):
        return s_full_donate(p, jnp.asarray(frame_np))

    # compile everything first
    for name, step, args, _bs in variants:
        if name == "full_donate":
            _ = float(s_full_donate_call(params, None))
        else:
            _ = float(step(*args))
        print(f"# compiled {name}", file=sys.stderr)

    # interleaved sessions
    raw = {name: [] for name, *_ in variants}
    for sess in range(SESSIONS):
        for name, step, args, bs in variants:
            if name == "full_donate":
                run = _timed(s_full_donate_call, params, None)
            else:
                run = _timed(step, *args)
            t1, t2 = run(N1), run(N2)
            raw[name].append((t2 - t1) / (N2 - N1) / bs)
        print(f"# session {sess}: " + " ".join(
            f"{n}={raw[n][-1]:.3f}" for n, *_ in variants), file=sys.stderr)

    out = {}
    for name, *_ in variants:
        med = statistics.median(raw[name])
        lo, hi = min(raw[name]), max(raw[name])
        out[name] = {"ms_per_img": round(med, 3),
                     "spread_pct": round(100.0 * (hi - lo) / med, 1)}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
