"""Loss semantics: forward values and the fork's idiosyncratic gradients.

Oracles: independent numpy math for forwards; torch autograd for standard
losses; hand-derived expressions for the fork's asymmetric backward
normalisers (smooth_L1_loss_layer.cu:86, softmax_loss_vec_layer.cpp:225-230).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from deepcut_tpu.ops import losses as L

RNG = np.random.RandomState(0)


def test_smooth_l1_forward_matches_definition():
    p = RNG.randn(2, 4, 4, 6).astype(np.float32) * 2
    t = RNG.randn(2, 4, 4, 6).astype(np.float32)
    w = (RNG.rand(2, 4, 4, 6) > 0.5).astype(np.float32)
    d = w * (p - t)
    f = np.where(np.abs(d) < 1, 0.5 * d * d, np.abs(d) - 0.5)
    expected = f.sum() / w.sum()
    got = float(L.smooth_l1_loss(jnp.asarray(p), jnp.asarray(t), jnp.asarray(w)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_smooth_l1_backward_clamps_at_100():
    # 10 active weights -> forward normalizer 10, backward normalizer 100.
    p = np.zeros((1, 2, 5, 2), np.float32)
    p[0, 0, :, 0] = 3.0   # |d| >= 1 -> f' = sign = 1
    t = np.zeros_like(p)
    w = np.zeros_like(p)
    w[0, 0, :, 0] = 1.0   # 5 weights... use 10
    w[0, 1, :, 0] = 1.0
    g = jax.grad(lambda x: L.smooth_l1_loss(x, jnp.asarray(t), jnp.asarray(w)))(jnp.asarray(p))
    g = np.asarray(g)
    # grad = f'(w*(p-t)) / max(sum w, 100) = 1/100 at active cells
    np.testing.assert_allclose(g[0, 0, :, 0], 0.01, rtol=1e-6)
    np.testing.assert_allclose(g[0, 0, :, 1], 0.0)


def test_smooth_l1_backward_no_weight_refactor():
    """The reference does NOT multiply the gradient by w again — check we
    reproduce that (soft weight 0.5, |d| small)."""
    p = np.full((1, 1, 1, 1), 0.5, np.float32)
    t = np.zeros_like(p)
    w = np.full_like(p, 0.5)
    g = float(jax.grad(
        lambda x: L.smooth_l1_loss(x, jnp.asarray(t), jnp.asarray(w))
    )(jnp.asarray(p))[0, 0, 0, 0])
    # d = w*(p-t) = 0.25; f'(d) = 0.25; normalizer max(0.5, 100) = 100
    np.testing.assert_allclose(g, 0.25 / 100.0, rtol=1e-6)


def test_softmax_loss_vec_cross_entropy_forward():
    x = RNG.randn(1, 3, 3, 4).astype(np.float32)
    t = (RNG.rand(1, 3, 3, 4) > 0.5).astype(np.float32)
    t[0, 0, 0, :] = 1000.0  # fully ignored cell
    fn = L.make_softmax_loss_vec(cross_entropy=True)
    got = float(fn(jnp.asarray(x), jnp.asarray(t)))
    # numpy oracle
    live = t != 1000.0
    ce = np.maximum(x, 0) - x * t + np.log1p(np.exp(-np.abs(x)))
    loss_sum = ce[live].sum()
    count = np.any(live, axis=-1).sum()  # 8 live cells
    # forward normaliser clamps at 100 (softmax_loss_vec_layer.cpp:143-147)
    np.testing.assert_allclose(got, loss_sum / max(count, 100), rtol=1e-5)


def test_softmax_loss_vec_backward_is_prob_minus_label_over_clamped():
    x = RNG.randn(1, 2, 2, 3).astype(np.float32)
    t = (RNG.rand(1, 2, 2, 3) > 0.5).astype(np.float32)
    fn = L.make_softmax_loss_vec(cross_entropy=True)
    g = np.asarray(jax.grad(lambda a: fn(a, jnp.asarray(t)))(jnp.asarray(x)))
    prob = 1 / (1 + np.exp(-x))
    expected = (prob - t) / 100.0  # count=4 -> clamped to 100
    np.testing.assert_allclose(g, expected, rtol=1e-5, atol=1e-6)


def test_softmax_loss_vec_softmax_mode():
    x = RNG.randn(1, 2, 2, 5).astype(np.float32)
    t = np.zeros((1, 2, 2, 5), np.float32)
    lab = RNG.randint(0, 5, (1, 2, 2))
    for j in range(2):
        for i in range(2):
            t[0, j, i, lab[0, j, i]] = 1.0
    fn = L.make_softmax_loss_vec(cross_entropy=False)
    got = float(fn(jnp.asarray(x), jnp.asarray(t)))
    e = np.exp(x - x.max(-1, keepdims=True))
    prob = e / e.sum(-1, keepdims=True)
    picked = np.take_along_axis(prob, lab[..., None], axis=-1)
    # count=4 live cells -> forward normaliser max(4, 100) = 100
    np.testing.assert_allclose(got, -np.log(picked).sum() / 100, rtol=1e-5)


def test_softmax_with_loss_matches_torch():
    x = RNG.randn(8, 10).astype(np.float32)
    lab = RNG.randint(0, 10, (8,))
    got = float(L.softmax_with_loss(jnp.asarray(x), jnp.asarray(lab)))
    ref = torch.nn.functional.cross_entropy(
        torch.from_numpy(x), torch.from_numpy(lab), reduction="mean"
    ).item()
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_softmax_with_loss_ignore_label():
    x = RNG.randn(6, 4).astype(np.float32)
    lab = np.array([0, 1, 2, 3, 255, 255])
    got = float(L.softmax_with_loss(jnp.asarray(x), jnp.asarray(lab), ignore_label=255))
    ref = torch.nn.functional.cross_entropy(
        torch.from_numpy(x), torch.from_numpy(lab), ignore_index=255
    ).item()
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_sigmoid_ce_matches_torch():
    x = RNG.randn(4, 6).astype(np.float32)
    t = (RNG.rand(4, 6) > 0.5).astype(np.float32)
    got = float(L.sigmoid_cross_entropy_loss(jnp.asarray(x), jnp.asarray(t)))
    ref = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.from_numpy(x), torch.from_numpy(t), reduction="sum"
    ).item() / 4
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_euclidean_loss():
    a = RNG.randn(3, 5).astype(np.float32)
    b = RNG.randn(3, 5).astype(np.float32)
    got = float(L.euclidean_loss(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, 0.5 * ((a - b) ** 2).sum() / 3, rtol=1e-5)


def test_accuracy_topk():
    x = np.array([[1.0, 2.0, 3.0], [5.0, 1.0, 0.0]], np.float32)
    lab = np.array([2, 1])
    assert float(L.accuracy(jnp.asarray(x), jnp.asarray(lab))) == 0.5
    assert float(L.accuracy(jnp.asarray(x), jnp.asarray(lab), top_k=2)) == 1.0


def test_accuracy_per_class_ignore_and_axis():
    """test_accuracy_layer.cpp TestForwardPerClass / WithIgnoreLabel, plus the
    axis param: class axis moved from 1, ignore_label read from
    accuracy_param (accuracy_layer.cpp:16-19,96-103)."""
    rng = np.random.RandomState(3)
    n, c, h, w = 4, 5, 2, 3
    scores = rng.randn(n, c, h, w).astype(np.float32)
    labels = rng.randint(0, c, size=(n, h, w)).astype(np.float32)
    labels[0, 0, 0] = 2.0
    ignore = 2

    # numpy oracle (reference loop semantics)
    total_correct = total_count = 0
    per_correct = np.zeros(c)
    per_count = np.zeros(c)
    for i in range(n):
        for y in range(h):
            for x in range(w):
                lab = int(labels[i, y, x])
                if lab == ignore:
                    continue
                pred = int(np.argmax(scores[i, :, y, x]))
                per_count[lab] += 1
                hit = pred == lab
                per_correct[lab] += hit
                total_correct += hit
                total_count += 1
    ref_total = total_correct / total_count
    ref_pc = np.where(per_count == 0, 0.0,
                      per_correct / np.maximum(per_count, 1))

    from deepcut_tpu.core.graph import Net
    proto = f"""
name: "acc"
input: "scores" input_shape {{ dim: {n} dim: {c} dim: {h} dim: {w} }}
input: "label" input_shape {{ dim: {n} dim: 1 dim: {h} dim: {w} }}
layer {{ name: "acc" type: "Accuracy" bottom: "scores" bottom: "label"
  top: "acc" top: "acc_per_class"
  accuracy_param {{ ignore_label: {ignore} axis: 1 }} }}
"""
    from deepcut_tpu.proto import text_format
    net = Net(text_format.parse(proto), phase="TEST", compute_dtype=None)
    out = net.forward(scores=scores, label=labels[:, None])
    np.testing.assert_allclose(float(out["acc"]), ref_total, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["acc_per_class"]), ref_pc,
                               rtol=1e-6)


def test_softmax_loss_vec_weighted_backward_skips_ignore_zeroing():
    """Fork-exact weighted backward: the reference's has_weights_ branch
    shadows BOTH ignore-zeroing arms (softmax_loss_vec_layer.cpp:171-226),
    so diff = (prob - label) * w even where label == 1000, normalised by
    max(sum(w[:, 0]), 100)."""
    x = RNG.randn(1, 2, 2, 3).astype(np.float32)
    t = (RNG.rand(1, 2, 2, 3) > 0.5).astype(np.float32)
    t[0, 0, 0, :] = 1000.0  # ignore-labeled cell
    w = RNG.rand(1, 2, 2, 3).astype(np.float32)
    fn = L.make_softmax_loss_vec(cross_entropy=True)
    g = np.asarray(jax.grad(
        lambda a: fn(a, jnp.asarray(t), jnp.asarray(w)))(jnp.asarray(x)))
    prob = 1 / (1 + np.exp(-x))
    expected = (prob - t) * w / max(w[..., 0].sum(), 100.0)
    np.testing.assert_allclose(g, expected, rtol=1e-4, atol=1e-6)
