"""Solver update rules + LR policies, Caffe-exact.

Reference: src/caffe/solvers/{sgd,nesterov,adagrad,rmsprop,adadelta,adam}_solver.cpp.
Unlike optax (grad transform -> update subtracted by caller), Caffe's rules
fold the learning rate INTO the history (e.g. SGD momentum:
``h = m*h + lr*g; w -= h``), which changes trajectories when lr varies.
These functions replicate that exactly, as pure pytree transforms.

LR policies: GetLearningRate (sgd_solver.cpp:26-67) + the fork's added
``multistep_lr`` explicit schedule (proto field `stagelr`/`stepvalue`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Pytree = Any


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    solver_type: str = "SGD"  # SGD | Nesterov | AdaGrad | RMSProp | AdaDelta | Adam
    base_lr: float = 0.01
    lr_policy: str = "fixed"  # fixed|step|exp|inv|multistep|poly|sigmoid|multistep_lr
    gamma: float = 0.1
    power: float = 1.0
    stepsize: int = 100000
    stepvalue: Tuple[int, ...] = ()
    stagelr: Tuple[float, ...] = ()  # fork: explicit per-stage lrs
    max_iter: int = 1000000
    momentum: float = 0.9
    momentum2: float = 0.999  # Adam beta2
    rms_decay: float = 0.99
    delta: float = 1e-8
    weight_decay: float = 0.0005
    regularization_type: str = "L2"
    clip_gradients: float = -1.0
    iter_size: int = 1


def learning_rate(cfg: SolverConfig, it) -> jax.Array:
    """Scalar lr for iteration `it` (traced or static int)."""
    it = jnp.asarray(it, jnp.float32)
    p = cfg.lr_policy
    if p == "fixed":
        return jnp.float32(cfg.base_lr)
    if p == "step":
        return cfg.base_lr * jnp.power(cfg.gamma, jnp.floor(it / cfg.stepsize))
    if p == "exp":
        return cfg.base_lr * jnp.power(cfg.gamma, it)
    if p == "inv":
        return cfg.base_lr * jnp.power(1.0 + cfg.gamma * it, -cfg.power)
    if p in ("multistep", "multistep_lr"):
        stage = jnp.sum(it >= jnp.asarray(cfg.stepvalue, jnp.float32)) if cfg.stepvalue else jnp.int32(0)
        if cfg.stagelr:
            # fork addition (caffe.proto field multistep_lr=41, consumed in
            # sgd_solver.cpp:49-50): explicit lr per stage incl. stage 0.
            lrs = jnp.asarray(cfg.stagelr, jnp.float32)
            return lrs[jnp.minimum(stage, len(cfg.stagelr) - 1)]
        return cfg.base_lr * jnp.power(cfg.gamma, stage.astype(jnp.float32))
    if p == "poly":
        return cfg.base_lr * jnp.power(1.0 - it / cfg.max_iter, cfg.power)
    if p == "sigmoid":
        return cfg.base_lr / (1.0 + jnp.exp(-cfg.gamma * (it - cfg.stepsize)))
    raise ValueError(f"unknown lr_policy {cfg.lr_policy!r}")


def _tree_l2_norm(tree: Pytree) -> jax.Array:
    sq = jax.tree_util.tree_reduce(
        lambda acc, g: acc + jnp.sum(jnp.square(g.astype(jnp.float32))), tree, 0.0
    )
    return jnp.sqrt(sq)


def preprocess_grads(
    cfg: SolverConfig,
    params: Pytree,
    grads: Pytree,
    decay_mults: Optional[Pytree] = None,
) -> Pytree:
    """Clip (global L2), normalise by iter_size, and add regularisation —
    the ClipGradients/Normalize/Regularize trio (sgd_solver.cpp:69-120)."""
    if cfg.clip_gradients > 0:
        norm = _tree_l2_norm(grads)
        scale = jnp.where(norm > cfg.clip_gradients, cfg.clip_gradients / norm, 1.0)
        grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
    if cfg.iter_size > 1:
        grads = jax.tree_util.tree_map(lambda g: g / cfg.iter_size, grads)
    if cfg.weight_decay > 0:
        if decay_mults is None:
            decay_mults = jax.tree_util.tree_map(lambda _: 1.0, params)
        if cfg.regularization_type == "L2":
            grads = jax.tree_util.tree_map(
                lambda g, w, dm: g + cfg.weight_decay * dm * w, grads, params, decay_mults
            )
        else:
            grads = jax.tree_util.tree_map(
                lambda g, w, dm: g + cfg.weight_decay * dm * jnp.sign(w),
                grads, params, decay_mults,
            )
    return grads


def init_state(cfg: SolverConfig, params: Pytree) -> Dict[str, Any]:
    zeros = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
    state: Dict[str, Any] = {"iter": jnp.zeros((), jnp.int32)}
    t = cfg.solver_type
    if t in ("SGD", "Nesterov", "AdaGrad", "RMSProp"):
        state["history"] = zeros()
    elif t == "AdaDelta":
        state["history"] = zeros()
        state["update_sq"] = zeros()
    elif t == "Adam":
        state["m"] = zeros()
        state["v"] = zeros()
    else:
        raise ValueError(f"unknown solver type {t!r}")
    return state


def apply_update(
    cfg: SolverConfig,
    params: Pytree,
    grads: Pytree,
    state: Dict[str, Any],
    lr_mults: Optional[Pytree] = None,
) -> Tuple[Pytree, Dict[str, Any]]:
    """One parameter update. `grads` should already be preprocessed.

    Matches ComputeUpdateValue of each reference solver; returns
    (new_params, new_state). lr_mults: per-leaf ParamSpec lr multipliers.
    """
    it = state["iter"]
    rate = learning_rate(cfg, it)
    if lr_mults is None:
        lr_mults = jax.tree_util.tree_map(lambda _: 1.0, params)
    lr_of = lambda m: rate * m
    t = cfg.solver_type
    new_state = dict(state)
    new_state["iter"] = it + 1

    if t == "SGD":
        def upd(w, g, h, m):
            h2 = cfg.momentum * h + lr_of(m) * g
            return w - h2, h2
        out = jax.tree_util.tree_map(upd, params, grads, state["history"], lr_mults)
        params2 = jax.tree_util.tree_map(lambda o: o[0], out, is_leaf=lambda x: isinstance(x, tuple))
        hist2 = jax.tree_util.tree_map(lambda o: o[1], out, is_leaf=lambda x: isinstance(x, tuple))
        new_state["history"] = hist2
        return params2, new_state

    if t == "Nesterov":
        def upd(w, g, h, m):
            h2 = cfg.momentum * h + lr_of(m) * g
            step = (1.0 + cfg.momentum) * h2 - cfg.momentum * h
            return w - step, h2
        out = jax.tree_util.tree_map(upd, params, grads, state["history"], lr_mults)
        params2 = jax.tree_util.tree_map(lambda o: o[0], out, is_leaf=lambda x: isinstance(x, tuple))
        new_state["history"] = jax.tree_util.tree_map(lambda o: o[1], out, is_leaf=lambda x: isinstance(x, tuple))
        return params2, new_state

    if t == "AdaGrad":
        def upd(w, g, h, m):
            h2 = h + g * g
            return w - lr_of(m) * g / (jnp.sqrt(h2) + cfg.delta), h2
        out = jax.tree_util.tree_map(upd, params, grads, state["history"], lr_mults)
        params2 = jax.tree_util.tree_map(lambda o: o[0], out, is_leaf=lambda x: isinstance(x, tuple))
        new_state["history"] = jax.tree_util.tree_map(lambda o: o[1], out, is_leaf=lambda x: isinstance(x, tuple))
        return params2, new_state

    if t == "RMSProp":
        def upd(w, g, h, m):
            h2 = cfg.rms_decay * h + (1.0 - cfg.rms_decay) * g * g
            return w - lr_of(m) * g / (jnp.sqrt(h2) + cfg.delta), h2
        out = jax.tree_util.tree_map(upd, params, grads, state["history"], lr_mults)
        params2 = jax.tree_util.tree_map(lambda o: o[0], out, is_leaf=lambda x: isinstance(x, tuple))
        new_state["history"] = jax.tree_util.tree_map(lambda o: o[1], out, is_leaf=lambda x: isinstance(x, tuple))
        return params2, new_state

    if t == "AdaDelta":
        def upd(w, g, h, u, m):
            h2 = cfg.momentum * h + (1.0 - cfg.momentum) * g * g
            step = g * jnp.sqrt((u + cfg.delta) / (h2 + cfg.delta))
            u2 = cfg.momentum * u + (1.0 - cfg.momentum) * step * step
            return w - lr_of(m) * step, h2, u2
        out = jax.tree_util.tree_map(upd, params, grads, state["history"],
                                     state["update_sq"], lr_mults)
        params2 = jax.tree_util.tree_map(lambda o: o[0], out, is_leaf=lambda x: isinstance(x, tuple))
        new_state["history"] = jax.tree_util.tree_map(lambda o: o[1], out, is_leaf=lambda x: isinstance(x, tuple))
        new_state["update_sq"] = jax.tree_util.tree_map(lambda o: o[2], out, is_leaf=lambda x: isinstance(x, tuple))
        return params2, new_state

    if t == "Adam":
        b1, b2 = cfg.momentum, cfg.momentum2
        tstep = (it + 1).astype(jnp.float32)
        corr = jnp.sqrt(1.0 - jnp.power(b2, tstep)) / (1.0 - jnp.power(b1, tstep))

        def upd(w, g, mm, vv, lm):
            m2 = b1 * mm + (1.0 - b1) * g
            v2 = b2 * vv + (1.0 - b2) * g * g
            return w - lr_of(lm) * corr * m2 / (jnp.sqrt(v2) + cfg.delta), m2, v2
        out = jax.tree_util.tree_map(upd, params, grads, state["m"], state["v"], lr_mults)
        params2 = jax.tree_util.tree_map(lambda o: o[0], out, is_leaf=lambda x: isinstance(x, tuple))
        new_state["m"] = jax.tree_util.tree_map(lambda o: o[1], out, is_leaf=lambda x: isinstance(x, tuple))
        new_state["v"] = jax.tree_util.tree_map(lambda o: o[2], out, is_leaf=lambda x: isinstance(x, tuple))
        return params2, new_state

    raise ValueError(f"unknown solver type {t!r}")


def step(
    cfg: SolverConfig,
    params: Pytree,
    grads: Pytree,
    state: Dict[str, Any],
    *,
    lr_mults: Optional[Pytree] = None,
    decay_mults: Optional[Pytree] = None,
) -> Tuple[Pytree, Dict[str, Any]]:
    """Full ApplyUpdate: clip -> normalise -> regularise -> rule update."""
    grads = preprocess_grads(cfg, params, grads, decay_mults)
    return apply_update(cfg, params, grads, state, lr_mults)
