"""Filler semantics vs the reference's test_filler.cpp: value bounds,
statistical moments, unit-ball normalisation, bilinear kernel values,
xavier/msra variance-norm scales (include/caffe/filler.hpp)."""

import math

import jax
import numpy as np

from deepcut_tpu.core import fillers
from deepcut_tpu.proto.text_format import PbNode


def _node(**kw):
    n = PbNode()
    for k, v in kw.items():
        n.add(k, v)
    return n


def _fill(shape, **kw):
    return np.asarray(fillers.fill(_node(**kw), jax.random.PRNGKey(0), shape))


def test_constant_filler():
    w = _fill((2, 3), type="constant", value=2.5)
    np.testing.assert_allclose(w, 2.5)
    np.testing.assert_allclose(_fill((4,), type="constant"), 0.0)  # default 0


def test_uniform_filler_bounds():
    w = _fill((1000,), type="uniform", min=1.0, max=2.0)
    assert w.min() >= 1.0 and w.max() <= 2.0
    assert w.std() > 0.2  # actually spread, not constant


def test_gaussian_filler_moments():
    w = _fill((20000,), type="gaussian", mean=10.0, std=0.1)
    assert abs(w.mean() - 10.0) < 0.01
    assert abs(w.std() - 0.1) < 0.01


def test_xavier_scale_fan_in():
    # filler.hpp:156-176: uniform in [-sqrt(3/fan_in), +sqrt(3/fan_in)],
    # fan_in = count / num = k*k*Cin for (kh,kw,Cin,Cout) HWIO weights
    shape = (3, 3, 8, 16)
    w = _fill(shape, type="xavier")
    scale = math.sqrt(3.0 / (3 * 3 * 8))
    assert w.min() >= -scale and w.max() <= scale
    assert w.max() > 0.8 * scale  # fills the range


def test_msra_std_fan_in():
    shape = (3, 3, 16, 32)
    w = _fill(shape, type="msra")
    std = math.sqrt(2.0 / (3 * 3 * 16))
    assert abs(w.std() - std) / std < 0.1


def test_positive_unitball_groups():
    w = _fill((5, 40), type="positive_unitball")
    assert (w >= 0).all()
    np.testing.assert_allclose(w.sum(axis=1), 1.0, rtol=1e-5)


def test_bilinear_filler_values():
    # filler.hpp:241-290: f = ceil(k/2), c = (2f - 1 - f%2) / 2f,
    # w[y,x] = (1-|x/f - c|)(1-|y/f - c|) — the deconv upsampling kernel
    w = _fill((4, 4, 1, 1), type="bilinear")
    f = 2.0
    c = (2 * f - 1 - (2 % 2)) / (2 * f)
    ref = np.zeros((4, 4), np.float32)
    for y in range(4):
        for x in range(4):
            ref[y, x] = (1 - abs(x / f - c)) * (1 - abs(y / f - c))
    np.testing.assert_allclose(w[:, :, 0, 0], ref, rtol=1e-5)


def test_sparse_gaussian_zero_fraction():
    w = _fill((3, 3, 8, 64), type="gaussian", std=0.1, sparse=8)
    # bernoulli keep-prob = sparse / num_outputs = 8/64
    frac = (w != 0).mean()
    assert 0.06 < frac < 0.20, frac
