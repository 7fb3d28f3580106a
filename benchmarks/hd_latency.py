"""HD-frame serving latency: host tiling (the reference's architecture,
estimate_pose.py:146-221 — ~700-px tiles overlapping by the 224-px receptive
field) vs ONE fused XLA program over the full canvas, on one v5e chip.

The reference MUST tile frames past _MAX_SIZE=700: a 12 GB K40 can't hold the
activations, and Caffe reshapes per tile anyway. The TPU build doesn't —
16 GB HBM holds a 1080p-class bf16 forward outright, so the question is what
tiling COSTS when you keep it. The overlap arithmetic says a lot: tile step =
max_size − 2·RF = 252 px, so every axis recomputes ~700/252 ≈ 2.8× its
pixels, ~7.7× for both axes at sizes ≫ 700 (partially amortized by edge
tiles). This script measures it:

  one_prog       delta-timed (compute): full-canvas forward, prob+loc_pred
  tile704        delta-timed (compute): one 704×704 tile program — the
                 dominant tile; × n_tiles ≈ the tiled path's compute floor
                 (edge tiles are smaller, so the product is a mild OVERbound)
  wall_tiled     wall-clock PoseEstimator(max_size=700).estimate_pose —
                 includes per-tile scoremap fetches + host seam assembly
                 (relay-inflated on this rig: large D2H at 10-40 MB/s)
  wall_one       wall-clock PoseEstimator(max_size=2048).estimate_pose —
                 the fused uint8→pose program, 280-byte fetch

Frames: 704×1280 (HD long side) and 1088×1920 (1080p-class, the round-5 e2e
contract sizes — tests/test_hd_multiperson.py). Run ON THE REAL TPU:
python benchmarks/hd_latency.py
"""

import json
import statistics
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

SESSIONS = 3
N1, N2 = 3, 10   # HD programs are 10-100 ms; keep loops ~1 s
FRAMES = [(704, 1280), (1088, 1920)]


def _delta(step, *args):
    def run(n):
        t0 = time.perf_counter()
        acc = None
        for _ in range(n):
            acc = step(*args)
        _ = float(acc)
        return (time.perf_counter() - t0) * 1000.0
    med = []
    for _ in range(SESSIONS):
        t1, t2 = run(N1), run(N2)
        med.append((t2 - t1) / (N2 - N1))
    return statistics.median(med), 100.0 * (max(med) - min(med)) / max(
        statistics.median(med), 1e-9)


def main():
    from deepcut_tpu.models.resnet import (
        deepercut_config, init_params, fold_bn, cast_params, make_forward)
    from deepcut_tpu.pose.estimate import (
        PoseEstimator, _tile_plan, canvas_size)

    cfg = deepercut_config(152)
    raw_params = init_params(jax.random.PRNGKey(0), cfg)
    params = cast_params(fold_bn(raw_params, cfg))
    fwd = make_forward(cfg, folded=True, heads=("pose", "locref"))

    def scalar_prog():
        @jax.jit
        def f(p, x):
            o = fwd(p, x)
            return jnp.sum(o["prob"]) + jnp.sum(o["loc_pred"])
        return f

    out = {}

    # -- compute floors (delta harness) ---------------------------------
    tile = scalar_prog()
    xt = jnp.zeros((1, 704, 704, 3), jnp.bfloat16)
    _ = float(tile(params, xt))
    print("# compiled tile704", file=sys.stderr)
    t_tile, sp_tile = _delta(tile, params, xt)
    out["tile704_ms"] = {"ms": round(t_tile, 2), "spread_pct": round(sp_tile, 1)}

    for h, w in FRAMES:
        key = f"{h}x{w}"
        ch, cw = canvas_size(h, 1.0), canvas_size(w, 1.0)
        ny = len(_tile_plan(ch, 700))
        nx = len(_tile_plan(cw, 700))
        one = scalar_prog()
        x = jnp.zeros((1, ch, cw, 3), jnp.bfloat16)
        _ = float(one(params, x))
        print(f"# compiled one_prog {ch}x{cw}", file=sys.stderr)
        t_one, sp_one = _delta(one, params, x)
        out[key] = {
            "canvas": [ch, cw],
            "n_tiles": ny * nx,
            "one_prog_ms": round(t_one, 2),
            "one_prog_spread_pct": round(sp_one, 1),
            "tiled_compute_floor_ms": round(ny * nx * t_tile, 2),
            "compute_ratio": round(ny * nx * t_tile / t_one, 2),
        }
        print(f"# {key}: one_prog={t_one:.2f} ms, tiled floor="
              f"{ny * nx} x {t_tile:.2f} = {ny * nx * t_tile:.2f} ms",
              file=sys.stderr)

    # -- wall clock through the public API -------------------------------
    # (relay caveat: the tiled path fetches full scoremaps per tile at the
    # rig's 10-40 MB/s; the fused path fetches a 280-byte pose)
    est_tiled = PoseEstimator(raw_params, max_size=700)
    est_one = PoseEstimator(raw_params, max_size=2048)
    for h, w in FRAMES:
        key = f"{h}x{w}"
        rng = np.random.RandomState(0)
        img = rng.randint(0, 256, (h, w, 3), np.uint8)
        for name, est in (("wall_tiled", est_tiled), ("wall_one", est_one)):
            _ = est.estimate_pose(img)   # compile + warm
            ts = []
            for _i in range(3):
                t0 = time.perf_counter()
                _ = est.estimate_pose(img)
                ts.append((time.perf_counter() - t0) * 1000.0)
            out[key][name + "_ms"] = round(statistics.median(ts), 1)
            print(f"# {key} {name}: {out[key][name + '_ms']} ms",
                  file=sys.stderr)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
