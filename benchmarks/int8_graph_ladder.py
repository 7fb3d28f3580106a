"""Graph-engine int8 residue attribution (VERDICT r4 #6): the round-4
four-variant table (docs/performance.md) measured the prototxt int8 serving
path at 1.421 ms/img vs native 1.352 (ratio 1.053). This ladder locates the
0.07 ms/img: per-stage PREFIX programs, native vs graph, interleaved in one
process so rig drift hits both paths equally.

Prefixes (cumulative): stem(pool1) / res2c / res3b7 / res4b35 / res5c /
full (prob + loc_pred). Native prefixes re-run forward_int8's exact loop
truncated at the boundary; graph prefixes are `make_forward([blob])` on the
round-4 serving pipeline (fold_bn -> prune -> fuse_siblings -> quantize_int8
-> cast_weights) over the reference's own prototxt
(/root/reference/models/deepercut/ResNet-152.prototxt) — everything after the
requested blob is dead-code-eliminated, so each program is a true prefix.

Unit/garbage activation scales everywhere: the quantize is a
reciprocal-multiply, so scale VALUES don't change time (bench.py int8 note).

Run ON THE REAL TPU: python benchmarks/int8_graph_ladder.py
(12 programs x 10-60 s remote compile; budget ~25 min.)
"""

import json
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REF_PROTOTXT = "/root/reference/models/deepercut/ResNet-152.prototxt"
BATCH = 4
SIZE = 688
SESSIONS = 5
N1, N2 = 5, 25

# prefix name -> (native stage count, graph blob)
PREFIXES = [
    ("stem", 0, "pool1"),
    ("res2", 1, "res2c"),
    ("res3", 2, "res3b7"),
    ("res4", 3, "res4b35"),
    ("res5", 4, "res5c"),
]


def _timed(step, *args):
    def run(n):
        t0 = time.perf_counter()
        acc = None
        for _ in range(n):
            acc = step(*args)
        _ = float(acc)
        return (time.perf_counter() - t0) * 1000.0
    return run


def build_native(cfg, qparams):
    """Native int8 prefix programs mirroring models/quantize.forward_int8's
    trunk loop (bf16 stem + per-conv quantize/dequant), truncated per stage,
    plus the full pose+locref program."""
    from deepcut_tpu.models.quantize import _conv_i8, forward_int8
    from deepcut_tpu.models.resnet import _block_names
    from deepcut_tpu.ops.conv import conv2d
    from deepcut_tpu.ops.pool import max_pool2d
    from deepcut_tpu.ops.activations import relu

    cdt = cfg.compute_dtype
    uscales = {n: 1.0 for n, e in qparams.items() if "w_q" in e}

    def qconv(xf, name, *, stride=1, pad=0, dilation=1, act=True):
        p = qparams[name]
        xq = jnp.clip(jnp.round(xf.astype(jnp.float32)), -127, 127).astype(jnp.int8)
        acc = _conv_i8(xq, p["w_q"], stride=stride, pad=pad, dilation=dilation)
        y = acc.astype(jnp.float32) * p["w_scale"] + p["b"]
        return (relu(y) if act else y).astype(cdt)

    def prefix(n_stages):
        def fn(qp, x):
            p1 = qp["conv1"]
            y = relu(conv2d(x.astype(cdt), p1["w"], p1.get("b"), stride=2,
                            pad=3, compute_dtype=cdt)).astype(cdt)
            y = max_pool2d(y, kernel=3, stride=2)
            for stage in range(n_stages):
                s = cfg.stage_strides[stage]
                d = cfg.stage_dilations[stage]
                for bi, block in enumerate(_block_names(cfg, stage)):
                    bs = s if bi == 0 else 1
                    if bi == 0:
                        sc = qconv(y, f"res{block}_branch1", stride=bs, act=False)
                    else:
                        sc = y
                    z = qconv(y, f"res{block}_branch2a", stride=bs)
                    z = qconv(z, f"res{block}_branch2b", pad=d, dilation=d)
                    z = qconv(z, f"res{block}_branch2c", act=False)
                    y = relu(sc + z)
            return jnp.sum(y.astype(jnp.float32))
        return jax.jit(fn)

    progs = {name: prefix(n) for name, n, _blob in PREFIXES}

    @jax.jit
    def full(qp, x):
        o = forward_int8(qp, uscales, x, cfg, heads=("pose", "locref"))
        return jnp.sum(o["prob"]) + jnp.sum(o["loc_pred"])
    progs["full"] = full
    return progs


def build_graph():
    """Round-4 graph int8 serving pipeline on the reference prototxt, with
    per-prefix programs via make_forward([blob])."""
    from deepcut_tpu.core.graph import Net

    net = Net(REF_PROTOTXT)
    calib = {"data": np.random.RandomState(0)
             .uniform(-30, 30, (1, 3, SIZE, SIZE)).astype(np.float32)}
    net.fold_bn()
    net.prune(["prob", "loc_pred"])
    net.fuse_siblings()
    nq = net.quantize_int8(**calib)
    net.cast_weights()
    print(f"# graph: {nq} convs quantized", file=sys.stderr)

    progs = {}
    for name, _n, blob in PREFIXES:
        g = net.make_forward([blob])

        def step(p, x, g=g, blob=blob):
            return jnp.sum(g.__wrapped__(p, {"data": x})[blob])
        progs[name] = jax.jit(step)
    g = net.make_forward(["prob", "loc_pred"])

    def step_full(p, x, g=g):
        o = g.__wrapped__(p, {"data": x})
        return jnp.sum(o["prob"]) + jnp.sum(o["loc_pred"])
    progs["full"] = jax.jit(step_full)
    return net, progs


def main():
    from deepcut_tpu.models.resnet import (
        deepercut_config, init_params, fold_bn)
    from deepcut_tpu.models.quantize import quantize_weights

    cfg = deepercut_config(152)
    qparams = quantize_weights(
        fold_bn(init_params(jax.random.PRNGKey(0), cfg), cfg))
    native = build_native(cfg, qparams)
    net, graph = build_graph()

    x = jnp.zeros((BATCH, SIZE, SIZE, 3), jnp.float32)

    names = [p[0] for p in PREFIXES] + ["full"]
    for nm in names:  # compile all programs first
        _ = float(native[nm](qparams, x))
        _ = float(graph[nm](net.params, x))
        print(f"# compiled {nm}", file=sys.stderr)

    raw = {("native", nm): [] for nm in names}
    raw.update({("graph", nm): [] for nm in names})
    for sess in range(SESSIONS):
        for nm in names:
            for tag, progs, p in (("native", native, qparams),
                                  ("graph", graph, net.params)):
                run = _timed(progs[nm], p, x)
                t1, t2 = run(N1), run(N2)
                raw[(tag, nm)].append((t2 - t1) / (N2 - N1) / BATCH)
        print(f"# session {sess} done", file=sys.stderr)

    rows = []
    prev = {"native": 0.0, "graph": 0.0}
    for nm in names:
        row = {"prefix": nm}
        for tag in ("native", "graph"):
            med = statistics.median(raw[(tag, nm)])
            row[f"{tag}_cum"] = round(med, 3)
            row[f"{tag}_stage"] = round(med - prev[tag], 3)
            prev[tag] = med
        row["stage_delta_ms"] = round(row["graph_stage"] - row["native_stage"], 3)
        rows.append(row)
    print(json.dumps({"rows": rows, "batch": BATCH, "size": SIZE}, indent=1))


if __name__ == "__main__":
    main()
