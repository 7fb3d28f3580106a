"""Solver update rules vs hand-stepped Caffe math + LR policy values.

Mirrors the reference's test_gradient_based_solver.cpp approach: run the
update rule, cross-check against an independently coded reference update.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepcut_tpu.solver.update_rules import (
    SolverConfig, learning_rate, init_state, apply_update, step, preprocess_grads,
)


def _setup(solver_type, **kw):
    cfg = SolverConfig(solver_type=solver_type, base_lr=0.1, weight_decay=0.0, **kw)
    params = {"a": jnp.asarray([1.0, -2.0, 3.0]), "b": jnp.asarray([[0.5, -0.5]])}
    grads = {"a": jnp.asarray([0.1, 0.2, -0.3]), "b": jnp.asarray([[1.0, -2.0]])}
    return cfg, params, grads


def test_sgd_momentum_two_steps():
    cfg, params, grads = _setup("SGD", momentum=0.9)
    state = init_state(cfg, params)
    p1, s1 = apply_update(cfg, params, grads, state)
    p2, s2 = apply_update(cfg, p1, grads, s1)
    # h1 = lr*g ; w1 = w - h1 ; h2 = m*h1 + lr*g ; w2 = w1 - h2
    g = np.asarray(grads["a"])
    w = np.asarray(params["a"])
    h1 = 0.1 * g
    w1 = w - h1
    h2 = 0.9 * h1 + 0.1 * g
    np.testing.assert_allclose(np.asarray(p1["a"]), w1, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p2["a"]), w1 - h2, rtol=1e-6)


def test_nesterov():
    cfg, params, grads = _setup("Nesterov", momentum=0.9)
    state = init_state(cfg, params)
    p1, _ = apply_update(cfg, params, grads, state)
    g = np.asarray(grads["a"])
    h = 0.1 * g
    upd = 1.9 * h  # (1+m)*h_new - m*h_old with h_old = 0
    np.testing.assert_allclose(np.asarray(p1["a"]), np.asarray(params["a"]) - upd, rtol=1e-6)


def test_adagrad():
    cfg, params, grads = _setup("AdaGrad", delta=1e-8)
    state = init_state(cfg, params)
    p1, _ = apply_update(cfg, params, grads, state)
    g = np.asarray(grads["a"])
    expected = np.asarray(params["a"]) - 0.1 * g / (np.sqrt(g * g) + 1e-8)
    np.testing.assert_allclose(np.asarray(p1["a"]), expected, rtol=1e-5)


def test_rmsprop():
    cfg, params, grads = _setup("RMSProp", rms_decay=0.95, delta=1e-8)
    state = init_state(cfg, params)
    p1, _ = apply_update(cfg, params, grads, state)
    g = np.asarray(grads["a"])
    h = 0.05 * g * g
    expected = np.asarray(params["a"]) - 0.1 * g / (np.sqrt(h) + 1e-8)
    np.testing.assert_allclose(np.asarray(p1["a"]), expected, rtol=1e-5)


def test_adam_bias_correction():
    cfg, params, grads = _setup("Adam", momentum=0.9, momentum2=0.999, delta=1e-8)
    state = init_state(cfg, params)
    p1, _ = apply_update(cfg, params, grads, state)
    g = np.asarray(grads["a"])
    m = 0.1 * g
    v = 0.001 * g * g
    corr = np.sqrt(1 - 0.999) / (1 - 0.9)
    expected = np.asarray(params["a"]) - 0.1 * corr * m / (np.sqrt(v) + 1e-8)
    np.testing.assert_allclose(np.asarray(p1["a"]), expected, rtol=1e-5)


def test_adadelta():
    cfg, params, grads = _setup("AdaDelta", momentum=0.95, delta=1e-6)
    state = init_state(cfg, params)
    p1, _ = apply_update(cfg, params, grads, state)
    g = np.asarray(grads["a"])
    h = 0.05 * g * g
    stp = g * np.sqrt(1e-6 / (h + 1e-6))
    np.testing.assert_allclose(np.asarray(p1["a"]), np.asarray(params["a"]) - 0.1 * stp, rtol=1e-5)


def test_lr_policies():
    assert float(learning_rate(SolverConfig(base_lr=0.1, lr_policy="fixed"), 50)) == pytest.approx(0.1)
    assert float(learning_rate(SolverConfig(base_lr=0.1, lr_policy="step", gamma=0.5, stepsize=10), 25)) == pytest.approx(0.1 * 0.25)
    assert float(learning_rate(SolverConfig(base_lr=0.1, lr_policy="inv", gamma=0.0001, power=0.75), 0)) == pytest.approx(0.1)
    assert float(learning_rate(SolverConfig(base_lr=0.1, lr_policy="multistep", gamma=0.1, stepvalue=(10, 20)), 15)) == pytest.approx(0.01)
    assert float(learning_rate(SolverConfig(base_lr=0.1, lr_policy="poly", power=2.0, max_iter=100), 50)) == pytest.approx(0.1 * 0.25)
    # fork's multistep_lr list: rate = multistep_lr[stage] (incl. stage 0)
    cfg = SolverConfig(base_lr=0.005, lr_policy="multistep",
                       stepvalue=(10000, 20000), stagelr=(0.005, 0.002, 0.001))
    assert float(learning_rate(cfg, 5000)) == pytest.approx(0.005)
    assert float(learning_rate(cfg, 15000)) == pytest.approx(0.002)
    assert float(learning_rate(cfg, 30000)) == pytest.approx(0.001)


def test_clip_and_regularize():
    cfg = SolverConfig(clip_gradients=1.0, weight_decay=0.1, iter_size=2)
    params = {"a": jnp.asarray([2.0])}
    grads = {"a": jnp.asarray([6.0])}
    out = preprocess_grads(cfg, params, grads)
    # clip: norm 6 -> x1/6 => 1.0; iter_size: /2 => 0.5; decay: +0.1*2 = 0.7
    np.testing.assert_allclose(np.asarray(out["a"]), [0.7], rtol=1e-6)


def test_l1_regularization():
    cfg = SolverConfig(weight_decay=0.1, regularization_type="L1")
    params = {"a": jnp.asarray([2.0, -3.0])}
    grads = {"a": jnp.asarray([0.0, 0.0])}
    out = preprocess_grads(cfg, params, grads)
    np.testing.assert_allclose(np.asarray(out["a"]), [0.1, -0.1], rtol=1e-6)


def test_lr_mults():
    cfg = SolverConfig(solver_type="SGD", base_lr=0.1, momentum=0.0, weight_decay=0.0)
    params = {"a": jnp.asarray([1.0]), "b": jnp.asarray([1.0])}
    grads = {"a": jnp.asarray([1.0]), "b": jnp.asarray([1.0])}
    state = init_state(cfg, params)
    p1, _ = apply_update(cfg, params, grads, state, lr_mults={"a": 0.0, "b": 2.0})
    np.testing.assert_allclose(np.asarray(p1["a"]), [1.0])       # frozen
    np.testing.assert_allclose(np.asarray(p1["b"]), [0.8])       # 2x lr


def test_adaptive_rules_three_step_trajectories():
    """3-step numpy replications of the Caffe solver math (adagrad_solver.cpp,
    rmsprop_solver.cpp, adam_solver.cpp, adadelta_solver.cpp) with varying
    gradients — single-step-from-zero oracles cannot catch state-carry or
    time-index (bias-correction) bugs."""
    rng = np.random.RandomState(0)
    gs = [rng.randn(4).astype(np.float32) for _ in range(3)]
    w0 = rng.randn(4).astype(np.float32)
    lr, delta = 0.1, 1e-7

    def run(solver_type, **kw):
        cfg = SolverConfig(solver_type=solver_type, base_lr=lr,
                           weight_decay=0.0, delta=delta, **kw)
        params = {"a": jnp.asarray(w0)}
        state = init_state(cfg, params)
        for g in gs:
            params, state = apply_update(cfg, params, {"a": jnp.asarray(g)},
                                         state)
        return np.asarray(params["a"])

    # AdaGrad: hist += g^2; w -= lr * g / (sqrt(hist) + delta)
    w, hist = w0.copy(), np.zeros(4)
    for g in gs:
        hist = hist + g * g
        w = w - lr * g / (np.sqrt(hist) + delta)
    np.testing.assert_allclose(run("AdaGrad"), w, rtol=1e-4)  # f32 vs f64 oracle

    # RMSProp: hist = d*hist + (1-d)*g^2
    d = 0.95
    w, hist = w0.copy(), np.zeros(4)
    for g in gs:
        hist = d * hist + (1 - d) * g * g
        w = w - lr * g / (np.sqrt(hist) + delta)
    np.testing.assert_allclose(run("RMSProp", rms_decay=d), w, rtol=1e-4)

    # Adam: per-step bias correction sqrt(1-b2^t)/(1-b1^t), t = 1,2,3
    b1, b2 = 0.9, 0.999
    w, m, v = w0.copy(), np.zeros(4), np.zeros(4)
    for t, g in enumerate(gs, start=1):
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        corr = np.sqrt(1 - b2 ** t) / (1 - b1 ** t)
        w = w - lr * corr * m / (np.sqrt(v) + delta)
    np.testing.assert_allclose(run("Adam", momentum=b1, momentum2=b2),
                               w, rtol=1e-4)

    # AdaDelta: two decaying accumulators (grad^2 and step^2)
    mom = 0.95
    w, h, h2 = w0.copy(), np.zeros(4), np.zeros(4)
    for g in gs:
        h = mom * h + (1 - mom) * g * g
        stp = g * np.sqrt((h2 + delta) / (h + delta))
        h2 = mom * h2 + (1 - mom) * stp * stp
        w = w - lr * stp
    np.testing.assert_allclose(run("AdaDelta", momentum=mom), w, rtol=1e-4)
