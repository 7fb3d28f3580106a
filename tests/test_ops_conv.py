"""Conv/deconv/pool ops vs. an independent torch-CPU oracle.

torch's Conv2d/ConvTranspose2d/MaxPool2d(ceil_mode=True) implement the same
geometry as Caffe (src/caffe/util/im2col.cpp:25-28, pooling_layer.cpp), so
they serve as the golden reference the way `caffe_conv` (a naive loop conv,
test_convolution_layer.cpp:22-92) does in the reference test suite.
"""

import numpy as np
import pytest
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from deepcut_tpu.ops import (
    conv2d, deconv2d, max_pool2d, avg_pool2d,
    conv_output_size, deconv_output_size, pool_output_size,
)

RNG = np.random.RandomState(0)


def _rand(*shape):
    return RNG.randn(*shape).astype(np.float32)


CONV_CASES = [
    # (H, W, Cin, Cout, k, stride, pad, dilation, groups)
    (16, 16, 8, 16, 3, 1, 1, 1, 1),
    (17, 13, 4, 6, 3, 2, 1, 1, 1),
    (15, 15, 8, 8, 3, 1, 2, 2, 1),   # dilated, the res5 pattern
    (21, 21, 3, 64, 7, 2, 3, 1, 1),  # the conv1 stem pattern
    (10, 10, 8, 8, 1, 1, 0, 1, 1),   # 1x1
    (12, 12, 8, 12, 3, 1, 1, 1, 4),  # grouped
    (14, 14, 6, 6, 5, 3, 0, 1, 1),   # stride>k edge
]


@pytest.mark.parametrize("h,w,cin,cout,k,s,p,d,g", CONV_CASES)
def test_conv2d_matches_torch(h, w, cin, cout, k, s, p, d, g):
    x = _rand(2, h, w, cin)
    wts = _rand(k, k, cin // g, cout)
    b = _rand(cout)
    got = np.asarray(
        conv2d(jnp.asarray(x), jnp.asarray(wts), jnp.asarray(b),
               stride=s, pad=p, dilation=d, groups=g, compute_dtype=None)
    )
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    wt = torch.from_numpy(wts.transpose(3, 2, 0, 1))  # OIHW
    ref = F.conv2d(xt, wt, torch.from_numpy(b), stride=s, padding=p,
                   dilation=d, groups=g).numpy().transpose(0, 2, 3, 1)
    assert got.shape == ref.shape
    assert got.shape[1] == conv_output_size(h, k, s, p, d)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


DECONV_CASES = [
    # (H, W, Cin, Cout, k, stride, pad, dilation, groups)
    (11, 11, 8, 4, 3, 2, 0, 1, 1),   # the DeeperCut upsampling head pattern
    (9, 7, 6, 6, 4, 2, 1, 1, 1),
    (8, 8, 4, 8, 3, 1, 1, 1, 1),
    (8, 8, 4, 4, 3, 2, 0, 2, 1),     # dilated deconv
    (10, 10, 8, 8, 3, 2, 0, 1, 4),   # grouped deconv
]


@pytest.mark.parametrize("h,w,cin,cout,k,s,p,d,g", DECONV_CASES)
def test_deconv2d_matches_torch(h, w, cin, cout, k, s, p, d, g):
    x = _rand(2, h, w, cin)
    wts = _rand(k, k, cin, cout // g)
    b = _rand(cout)
    got = np.asarray(
        deconv2d(jnp.asarray(x), jnp.asarray(wts), jnp.asarray(b),
                 stride=s, pad=p, dilation=d, groups=g, compute_dtype=None)
    )
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    wt = torch.from_numpy(wts.transpose(2, 3, 0, 1))  # (Cin, Cout/g, kh, kw)
    ref = F.conv_transpose2d(xt, wt, torch.from_numpy(b), stride=s, padding=p,
                             dilation=d, groups=g).numpy().transpose(0, 2, 3, 1)
    assert got.shape == ref.shape
    assert got.shape[1] == deconv_output_size(h, k, s, p, d)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


POOL_CASES = [
    # (H, W, k, s, p) — 344 is the DeeperCut stem: ceil mode gives 172 not 171
    (344, 344, 3, 2, 0),
    (15, 17, 3, 2, 0),
    (16, 16, 2, 2, 0),
    (13, 13, 3, 2, 1),
    (10, 10, 5, 3, 2),
]


@pytest.mark.parametrize("h,w,k,s,p", POOL_CASES)
def test_max_pool_ceil_mode_matches_torch(h, w, k, s, p):
    x = _rand(2, h, w, 6)
    got = np.asarray(max_pool2d(jnp.asarray(x), kernel=k, stride=s, pad=p))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    ref = F.max_pool2d(xt, k, stride=s, padding=p, ceil_mode=True)
    ref = ref.numpy().transpose(0, 2, 3, 1)
    assert got.shape == ref.shape
    assert got.shape[1] == pool_output_size(h, k, s, p)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_stem_pool_has_ceil_size():
    # The classic fidelity trap: floor-mode frameworks produce 171.
    assert pool_output_size(344, 3, 2, 0) == 172


@pytest.mark.parametrize("h,w,k,s,p", [(16, 16, 3, 2, 0), (13, 13, 3, 2, 1)])
def test_avg_pool_matches_torch(h, w, k, s, p):
    x = _rand(2, h, w, 6)
    got = np.asarray(avg_pool2d(jnp.asarray(x), kernel=k, stride=s, pad=p))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    # Caffe's padded-extent denominator == torch count_include_pad=True.
    ref = F.avg_pool2d(xt, k, stride=s, padding=p, ceil_mode=True,
                       count_include_pad=True)
    ref = ref.numpy().transpose(0, 2, 3, 1)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
