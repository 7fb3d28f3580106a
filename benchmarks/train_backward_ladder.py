"""Per-stage BACKWARD delta ladder for the mixed-precision train step
(VERDICT r4 #1): decompose the batch-8 688px step into forward / dL-dx /
dL-dw per trunk stage, plus the heads+losses+update remainder, with the
same prefix-delta rigor as the serving ladder in docs/performance.md.

Method (same delta harness as bench.py — see the timing note there):
for each trunk prefix k in {stem, res2, res3, res4, res5} build three
jitted programs on the SAME truncated config:

  F_k  = forward to the prefix output, scalar-reduced        -> fwd work
  DX_k = grad of F_k wrt the INPUT image                     -> fwd + dL/dx
  DW_k = grad of F_k wrt the prefix params                   -> fwd + dL/dx + dL/dw

(dL/dw needs the dL/dx chain as input at every stage, so DW - DX isolates
the weight-gradient convolutions; DX - F isolates the data-gradient chain.)
Per-stage times are prefix differences; the full production train step
(make_train_step: heads, three losses, Caffe SGD update, donation) minus
the res5 DW prefix attributes the head/loss/update tail. All programs run
mixed precision (bf16 convs, f32 params/update) at batch 8, 688x688 —
the production training shape. Reference hot loop this decomposes:
/root/reference/src/caffe/solver.cpp:193-275 (ForwardBackward + update).

Run ON THE REAL TPU: python benchmarks/train_backward_ladder.py
(~15-20 programs x 10-60 s remote compile; budget ~30 min.)
"""

import json
import statistics
import sys
import time

import jax
import jax.numpy as jnp

BATCH = 8
SIZE = 688
SESSIONS = 3
N1, N2 = 4, 12

# stage prefixes: name -> depths tuple (152 = (3, 8, 36, 3))
PREFIXES = [
    ("stem", (0, 0, 0, 0)),
    ("res2", (3, 0, 0, 0)),
    ("res3", (3, 8, 0, 0)),
    ("res4", (3, 8, 36, 0)),
    ("res5", (3, 8, 36, 3)),
]


def _measure(run, n1=N1, n2=N2, sessions=SESSIONS):
    vals = []
    for _ in range(sessions):
        t1 = run(n1)
        t2 = run(n2)
        vals.append((t2 - t1) / (n2 - n1))
    return statistics.median(vals)


def _timed_loop(step, *args):
    """Delta-session loop: scalar-fetch ended, per-step ms."""
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
        deepercut_config, init_params, run_trunk, prepare_input)
    from deepcut_tpu.ops.conv import conv2d
    from deepcut_tpu.ops.pool import max_pool2d
    import dataclasses
    import functools

    x = jnp.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (BATCH, SIZE, SIZE, 3))
        * 30.0, jnp.float32)

    results = {}
    prev = {"F": 0.0, "DX": 0.0, "DW": 0.0}
    rows = []
    for name, depths in PREFIXES:
        cfg = dataclasses.replace(deepercut_config(152, mixed_train=True),
                                  depths=depths)
        params = init_params(jax.random.PRNGKey(0), cfg)
        # drop the head params: prefix programs never touch them, and a
        # grad over the full dict would materialize zero cotangents
        params = {k: v for k, v in params.items()
                  if not (k.startswith("res5c_up_") or k.startswith("res3d_"))}
        cdt = cfg.compute_dtype
        conv_fn = functools.partial(conv2d, compute_dtype=cdt, accum_dtype=None)
        pool_fn = lambda y: max_pool2d(y, kernel=3, stride=2)

        def prefix_out(p, xin, cfg=cfg, conv_fn=conv_fn, pool_fn=pool_fn):
            y, _skip = run_trunk(p, prepare_input(xin), cfg,
                                 conv_fn=conv_fn, pool_fn=pool_fn,
                                 folded=False)
            return jnp.sum(y.astype(jnp.float32))

        F = jax.jit(prefix_out)
        DX = jax.jit(lambda p, xin, f=prefix_out:
                     jnp.sum(jax.grad(f, argnums=1)(p, xin)))
        DW = jax.jit(lambda p, xin, f=prefix_out:
                     sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(
                         jax.grad(f, argnums=0)(p, xin))))

        cur = {}
        for tag, prog in (("F", F), ("DX", DX), ("DW", DW)):
            _ = float(prog(params, x))  # compile
            cur[tag] = _measure(_timed_loop(prog, params, x))
            print(f"# {name} {tag}: {cur[tag]:.2f} ms/step "
                  f"({cur[tag]/BATCH:.3f} ms/img)", file=sys.stderr)
        fwd = (cur["F"] - prev["F"]) / BATCH
        dx = (cur["DX"] - prev["DX"]) / BATCH - fwd
        dw = (cur["DW"] - prev["DW"]) / BATCH - fwd - dx
        rows.append({"stage": name, "fwd_ms_img": round(fwd, 3),
                     "dx_ms_img": round(dx, 3), "dw_ms_img": round(dw, 3),
                     "cum_F": round(cur["F"] / BATCH, 3),
                     "cum_DX": round(cur["DX"] / BATCH, 3),
                     "cum_DW": round(cur["DW"] / BATCH, 3)})
        prev = cur

    # the full production step: heads + 3 losses + Caffe SGD + donation
    from deepcut_tpu.parallel.train_step import make_train_step
    from deepcut_tpu.solver.update_rules import SolverConfig, init_state

    cfg = deepercut_config(152, mixed_train=True)
    params = init_params(jax.random.PRNGKey(0), cfg)
    scfg = SolverConfig(solver_type="SGD", base_lr=1e-4, momentum=0.9,
                        weight_decay=0.0)
    state = init_state(scfg, params)
    gh = gw = SIZE // 8
    J = cfg.num_joints
    batch = {
        "image": x,
        "part_score_targets": jnp.zeros((BATCH, gh, gw, J)).at[:, 3, 3, :].set(1.0),
        "part_score_weights": jnp.ones((BATCH, gh, gw, J)),
        "locref_targets": jnp.zeros((BATCH, gh, gw, 2 * J)),
        "locref_weights": jnp.ones((BATCH, gh, gw, 2 * J)),
        "pairwise_targets": jnp.zeros((BATCH, gh, gw, cfg.pairwise_channels)),
        "pairwise_weights": jnp.ones((BATCH, gh, gw, cfg.pairwise_channels)),
    }
    step = make_train_step(cfg, scfg, None, donate=False)

    def full(params, state, batch):
        p2, s2, m = step(params, state, batch)
        return m["total_loss"]

    _ = float(full(params, state, batch))
    t_full = _measure(_timed_loop(full, params, state, batch)) / BATCH
    print(f"# full step: {t_full:.3f} ms/img", file=sys.stderr)

    tail = t_full - prev["DW"] / BATCH
    out = {"rows": rows, "full_ms_img": round(t_full, 3),
           "heads_losses_update_ms_img": round(tail, 3),
           "batch": BATCH, "size": SIZE}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
