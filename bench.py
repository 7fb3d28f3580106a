"""Headline benchmark: DeeperCut ResNet-152 inference throughput at 688px.

Measures images/sec of the BN-folded bf16 single-scale forward (the
reference's north-star path: pose_demo.py -> estimate_pose -> 680-layer
forward) on the available accelerator, sweeping batch size.

`vs_baseline` is reported against an estimated Caffe-CPU throughput of
0.1 images/sec for this model/resolution. Derivation: the reference publishes
no DeeperCut numbers (BASELINE.md); dilated ResNet-152 at 688x688 is ~190
GFLOPs/image (ResNet-152@224 is 11.3 GFLOPs, scaled by (688/224)^2 with res5
undecimated and the three heads), and a multicore CPU running Caffe's
im2col+OpenBLAS sustains ~20 GFLOP/s => ~0.1 img/s. The driver target is
50x Caffe-CPU, i.e. vs_baseline >= 50.

Prints one JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

CAFFE_CPU_IPS_EST = 0.1  # images/sec, see module docstring


def bench_forward(batch_sizes=(1, 4), size=688, iters=20, warmup=3):
    # batch 32 reaches ~384 img/s (vs ~380 at batch 4) but costs minutes of
    # extra compile; the default sweep keeps the driver run fast.
    from deepcut_tpu.models.resnet import (
        deepercut_config, init_params, fold_bn, cast_params, make_forward)

    cfg = deepercut_config(152)
    params = cast_params(fold_bn(init_params(jax.random.PRNGKey(0), cfg), cfg))
    fn = jax.jit(make_forward(cfg, folded=True))
    best = 0.0
    best_bs = None
    for bs in batch_sizes:
        try:
            x = jnp.zeros((bs, size, size, 3), jnp.bfloat16)
            for _ in range(warmup):
                out = fn(params, x)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(params, x)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            ips = bs * iters / dt
            print(f"# batch={bs}: {ips:.2f} img/s ({1000*dt/(iters*bs):.2f} ms/img)",
                  file=sys.stderr)
            if ips > best:
                best, best_bs = ips, bs
        except Exception as e:  # OOM at large batch: keep best so far
            print(f"# batch={bs} failed: {type(e).__name__}", file=sys.stderr)
            break
    return best, best_bs


def main():
    ips, bs = bench_forward()
    print(json.dumps({
        "metric": "deepercut_resnet152_688px_images_per_sec",
        "value": round(ips, 3),
        "unit": "images/sec",
        "vs_baseline": round(ips / CAFFE_CPU_IPS_EST, 1),
    }))


if __name__ == "__main__":
    main()
