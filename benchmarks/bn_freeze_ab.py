"""A/B: frozen vs gradient-updated BN statistics in the native train step
(round 5). The round-5 parity fix pins BN mean/var/scale_factor like the
reference prototxt does (ResNet-152.prototxt:30-34: lr_mult 0 x3 +
use_global_stats) — `run_trunk` stop_gradients the stats and the native
update paths zero their lr/decay mults (models/train.bn_frozen_mults).
Besides correctness, freezing lets XLA prune 155 per-channel full-tensor
cotangent reductions from the backward pass. This script measures that
delta IN ONE PROCESS (interleaved sessions, same rig state): the OLD
behavior is reconstructed by tracing a second step with stop_gradient
patched to identity and the mults patched to all-ones.

Run ON THE REAL TPU: python benchmarks/bn_freeze_ab.py
"""

import json
import statistics
import sys
import time

import jax
import jax.numpy as jnp

BATCH = 8
SIZE = 688
SESSIONS = 5
N1, N2 = 4, 12


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
    from deepcut_tpu.models.resnet import deepercut_config, init_params
    from deepcut_tpu.parallel import train_step as ts_mod
    from deepcut_tpu.solver.update_rules import SolverConfig, init_state

    cfg = deepercut_config(152, mixed_train=True)
    params = init_params(jax.random.PRNGKey(0), cfg)
    scfg = SolverConfig(solver_type="SGD", base_lr=1e-4, momentum=0.9,
                        weight_decay=0.0005)
    state = init_state(scfg, params)
    gh = gw = SIZE // 8
    J = cfg.num_joints
    x = jnp.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (BATCH, SIZE, SIZE, 3))
        * 30.0, jnp.float32)
    batch = {
        "image": x,
        "part_score_targets": jnp.zeros((BATCH, gh, gw, J)).at[:, 3, 3, :].set(1.0),
        "part_score_weights": jnp.ones((BATCH, gh, gw, J)),
        "locref_targets": jnp.zeros((BATCH, gh, gw, 2 * J)),
        "locref_weights": jnp.ones((BATCH, gh, gw, 2 * J)),
        "pairwise_targets": jnp.zeros((BATCH, gh, gw, cfg.pairwise_channels)),
        "pairwise_weights": jnp.ones((BATCH, gh, gw, cfg.pairwise_channels)),
    }

    def scalar_step(step):
        def fn(p, s, b):
            p2, s2, m = step(p, s, b)
            return m["total_loss"]
        return fn

    # NEW (shipped): frozen stats
    step_new = scalar_step(ts_mod.make_train_step(cfg, scfg, None, donate=False))
    _ = float(step_new(params, state, batch))
    print("# compiled frozen", file=sys.stderr)

    # OLD (pre-round-5): stats receive gradients and SGD updates. Patch
    # stop_gradient to identity and the frozen mults to all-ones, trace/
    # compile while patched, then restore.
    sg_orig = jax.lax.stop_gradient
    bfm_orig = ts_mod.bn_frozen_mults
    try:
        jax.lax.stop_gradient = lambda v: v
        ts_mod.bn_frozen_mults = lambda p: {
            n: {k: 1.0 for k in e} for n, e in p.items()}
        step_old = scalar_step(ts_mod.make_train_step(cfg, scfg, None,
                                                      donate=False))
        _ = float(step_old(params, state, batch))  # compile under the patch
    finally:
        jax.lax.stop_gradient = sg_orig
        ts_mod.bn_frozen_mults = bfm_orig
    print("# compiled unfrozen", file=sys.stderr)

    raw = {"frozen": [], "unfrozen": []}
    for sess in range(SESSIONS):
        for name, step in (("frozen", step_new), ("unfrozen", step_old)):
            run = _timed(step, params, state, batch)
            t1, t2 = run(N1), run(N2)
            raw[name].append((t2 - t1) / (N2 - N1) / BATCH)
        print(f"# session {sess}: frozen={raw['frozen'][-1]:.3f} "
              f"unfrozen={raw['unfrozen'][-1]:.3f}", file=sys.stderr)

    out = {}
    for name, vals in raw.items():
        out[name] = {"ms_per_img": round(statistics.median(vals), 3),
                     "spread_pct": round(
                         100.0 * (max(vals) - min(vals))
                         / statistics.median(vals), 1)}
    out["saving_ms_img"] = round(
        out["unfrozen"]["ms_per_img"] - out["frozen"]["ms_per_img"], 3)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
