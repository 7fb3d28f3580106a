"""Headline benchmark: DeeperCut ResNet-152 inference throughput at 688px.

Measures images/sec of the BN-folded bf16 single-scale forward (the
reference's north-star path: pose_demo.py -> estimate_pose -> 680-layer
forward) on the available accelerator, sweeping batch size.

Timing methodology (important on relay-attached TPUs): dispatch through the
axon relay is fully asynchronous and `block_until_ready` can acknowledge
before execution completes, so naive loops under-measure by orders of
magnitude. Each step therefore reduces its outputs to ONE scalar on device,
and the loop is timed by the difference between an N1-iteration and an
N2-iteration run, each ended by a scalar fetch that forces completion (TPU
programs execute in dispatch order, so the last step's completion implies
all are done). The fetch constant cancels in the subtraction.

Reporting (round-4): each configuration is measured in SESSIONS independent
delta sessions and the headline `value` is the MEDIAN across them, with the
per-session numbers and spread emitted as JSON fields. Earlier rounds took
the min-of-repeats, which quoted a best-case ~9% above what an independent
run (the driver's BENCH_r03.json) reproduced; the median is the number a
fresh process should land within a few percent of. The int8 and batch-sweep
diagnostics ride the same JSON line instead of stderr comments.

`vs_baseline` is reported against an estimated Caffe-CPU throughput of
0.1 images/sec for this model/resolution. Derivation: the reference
publishes no DeeperCut numbers (BASELINE.md); dilated ResNet-152 at 688x688
is ~285 GFLOP/image ALL heads (per-stage count: conv1 2.2 + res2 12.6 +
res3 34.4 + res4 149.8 + res5 55.3 + heads 30.8), and a multicore CPU
running Caffe's im2col+OpenBLAS sustains ~20-30 GFLOP/s => ~0.1 img/s.
vs_baseline is a PRODUCT-path ratio: both sides deliver prob+loc_pred, but
Caffe's static graph must execute all 285 GFLOP to do so while this
framework's explicit head subset executes ~257 (the 27.6-GFLOP pairwise
head is skipped by construction) — the asymmetry is a real serving
advantage, not a measurement artifact; TFLOP/s prints use the 257 figure
so utilisation stays honest. The driver target is 50x Caffe-CPU,
i.e. vs_baseline >= 50.

Prints one JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
"batch": B, "sessions_img_per_sec": [...], "spread_pct": S, "sweep": {...},
"int8": {...}}
"""

import json
import statistics
import sys
import time

import jax
import jax.numpy as jnp

CAFFE_CPU_IPS_EST = 0.1  # images/sec, see module docstring
# FLOPs actually executed on the pose-serving path (heads=("pose","locref")):
# the all-heads model is ~285 GFLOP/img; the unrequested 364-channel pairwise
# head (~27.6 G) is explicitly excluded, so TFLOP/s prints stay honest.
GFLOP_PER_IMAGE = 257.4

SESSIONS = 5  # independent delta sessions per configuration


def _measure_sessions(run, n1, n2, sessions=SESSIONS):
    """Per-step ms: one value per independent delta session."""
    out = []
    for _ in range(sessions):
        t_n1 = run(n1)
        t_n2 = run(n2)
        out.append((t_n2 - t_n1) / (n2 - n1))
    return out


def _summarize(per_step_ms, bs):
    ips = sorted(bs * 1000.0 / s for s in per_step_ms)
    med = statistics.median(ips)
    spread_pct = 100.0 * (ips[-1] - ips[0]) / med if med else 0.0
    return {
        "img_per_sec": round(med, 2),
        "ms_per_img": round(1000.0 / med, 3) if med else None,
        "sessions_img_per_sec": [round(v, 2) for v in ips],
        "spread_pct": round(spread_pct, 1),
    }


def bench_forward(batch_sizes=(1, 4), size=688, n1=10, n2=50):
    from deepcut_tpu.models.resnet import (
        deepercut_config, init_params, fold_bn, cast_params, make_forward)

    cfg = deepercut_config(152)
    params = cast_params(fold_bn(init_params(jax.random.PRNGKey(0), cfg), cfg))
    # the pose-serving path: prob + loc_pred are what estimate_pose decodes;
    # the heads subset makes the exclusion of the 364-channel pairwise head
    # EXPLICIT (sum-based dead-code elimination could not remove it from the
    # fused head conv, and relying on DCE made earlier per-head numbers
    # non-comparable — see docs/performance.md round-3 note)
    fwd = make_forward(cfg, folded=True, heads=("pose", "locref"))

    @jax.jit
    def step(params, x):
        outs = fwd(params, x)
        # scalar reduce keeps the D2H fetch tiny and forces full execution
        return jnp.sum(outs["prob"]) + jnp.sum(outs["loc_pred"])

    sweep = {}
    for bs in batch_sizes:
        try:
            x = jnp.zeros((bs, size, size, 3), jnp.bfloat16)
            _ = float(step(params, x))  # compile + warm fetch path

            def run(n):
                t0 = time.perf_counter()
                acc = None
                for _ in range(n):
                    acc = step(params, x)
                _ = float(acc)  # force completion of the whole chain
                return (time.perf_counter() - t0) * 1000.0

            summ = _summarize(_measure_sessions(run, n1, n2), bs)
            summ["tflops"] = round(GFLOP_PER_IMAGE * summ["img_per_sec"] / 1000.0, 1)
            sweep[str(bs)] = summ
            print(f"# batch={bs}: {summ['img_per_sec']:.2f} img/s median "
                  f"({summ['ms_per_img']:.2f} ms/img, ~{summ['tflops']:.0f} "
                  f"TFLOP/s, spread {summ['spread_pct']}% over "
                  f"{len(summ['sessions_img_per_sec'])} sessions)",
                  file=sys.stderr)
        except Exception as e:  # OOM at large batch: keep best so far
            print(f"# batch={bs} failed: {type(e).__name__}", file=sys.stderr)
            break
    return sweep


def bench_int8(bs=4, size=688, n1=5, n2=45):
    """Secondary diagnostic: int8 serving throughput. Uses unit activation
    scales (throughput is scale-independent) to skip the ~2-minute
    calibration pass; real deployments calibrate via prepare_int8."""
    from deepcut_tpu.models.resnet import (
        deepercut_config, init_params, fold_bn)
    from deepcut_tpu.models.quantize import quantize_weights, forward_int8

    cfg = deepercut_config(152)
    qparams = quantize_weights(fold_bn(init_params(jax.random.PRNGKey(0), cfg), cfg))
    scales = {n: 1.0 for n, e in qparams.items() if "w_q" in e}

    @jax.jit
    def step(qp, x):
        outs = forward_int8(qp, scales, x, cfg, heads=("pose", "locref"))
        return jnp.sum(outs["prob"]) + jnp.sum(outs["loc_pred"])

    x = jnp.zeros((bs, size, size, 3), jnp.float32)
    _ = float(step(qparams, x))

    def run(n):
        t0 = time.perf_counter()
        acc = None
        for _ in range(n):
            acc = step(qparams, x)
        _ = float(acc)
        return (time.perf_counter() - t0) * 1000.0

    summ = _summarize(_measure_sessions(run, n1, n2), bs)
    summ["batch"] = bs
    print(f"# int8 batch={bs}: {summ['img_per_sec']:.2f} img/s median "
          f"({summ['ms_per_img']:.2f} ms/img, spread {summ['spread_pct']}%; "
          f"unit act-scales — calibrated scales measure the same since the "
          f"reciprocal-multiply quantize)", file=sys.stderr)
    return summ


def main():
    sweep = bench_forward()
    best_bs, best = max(sweep.items(), key=lambda kv: kv[1]["img_per_sec"],
                        default=(None, None))
    int8 = None
    try:
        int8 = bench_int8()
    except Exception as e:  # diagnostics only — never fail the headline
        print(f"# int8 bench skipped: {type(e).__name__}", file=sys.stderr)
    result = {
        "metric": "deepercut_resnet152_688px_images_per_sec",
        "value": round(best["img_per_sec"], 3) if best else 0.0,
        "unit": "images/sec",
        "vs_baseline": round((best["img_per_sec"] if best else 0.0)
                             / CAFFE_CPU_IPS_EST, 1),
        "batch": int(best_bs) if best_bs else None,
        "sessions_img_per_sec": best["sessions_img_per_sec"] if best else [],
        "spread_pct": best["spread_pct"] if best else None,
        "sweep": sweep,
    }
    if int8 is not None:
        result["int8"] = int8
    print(json.dumps(result))


if __name__ == "__main__":
    main()
