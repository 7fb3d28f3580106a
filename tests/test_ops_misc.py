"""Numeric oracles for the long tail of the op library — every layer type
the reference registers (SURVEY §2.2) exercised through the graph engine
against numpy/torch references. The heavily-used ops have dedicated files;
this sweep pins the rest."""

import numpy as np
import pytest
import torch

from deepcut_tpu.core.graph import Net
from deepcut_tpu.proto import text_format

RNG = np.random.RandomState(0)


def run_layer(layer_text: str, shapes, **inputs):
    decls = []
    for nm, sh in shapes.items():
        dims = " ".join(f"dim: {d}" for d in sh)
        decls.append(f'input: "{nm}"\ninput_shape {{ {dims} }}')
    proto = "\n".join(decls) + "\n" + layer_text
    net = Net(text_format.parse(proto), phase="TEST", compute_dtype=None)
    return net, net.forward(**inputs)


def test_reduction_ops():
    x = RNG.randn(3, 4, 5).astype(np.float32)
    for op, oracle in [("SUM", x.reshape(3, -1).sum(1)),
                       ("ASUM", np.abs(x).reshape(3, -1).sum(1)),
                       ("SUMSQ", (x ** 2).reshape(3, -1).sum(1)),
                       ("MEAN", x.reshape(3, -1).mean(1))]:
        _, out = run_layer(f"""
        layer {{ name: "r" type: "Reduction" bottom: "x" top: "r"
                 reduction_param {{ operation: {op} axis: 1 coeff: 2.0 }} }}
        """, {"x": (3, 4, 5)}, x=x)
        np.testing.assert_allclose(out["r"], 2.0 * oracle, rtol=1e-5)


def test_batch_reindex():
    x = RNG.randn(4, 3).astype(np.float32)
    idx = np.array([2, 0, 0, 3, 1], np.float32)
    _, out = run_layer("""
    layer { name: "b" type: "BatchReindex" bottom: "x" bottom: "i" top: "b" }
    """, {"x": (4, 3), "i": (5,)}, x=x, i=idx)
    np.testing.assert_allclose(out["b"], x[idx.astype(int)], rtol=1e-6)


def test_embed():
    ids = np.array([1, 4, 2], np.float32)
    net, out = run_layer("""
    layer { name: "e" type: "Embed" bottom: "i" top: "e"
            embed_param { input_dim: 6 num_output: 3 bias_term: true
              weight_filler { type: "gaussian" std: 1.0 } } }
    """, {"i": (3,)}, i=ids)
    W = np.asarray(net.params["e"]["w"])
    b = np.asarray(net.params["e"]["b"])
    np.testing.assert_allclose(out["e"], W[ids.astype(int)] + b, rtol=1e-5)


def test_tile():
    x = RNG.randn(2, 3, 2, 2).astype(np.float32)
    _, out = run_layer("""
    layer { name: "t" type: "Tile" bottom: "x" top: "t"
            tile_param { axis: 1 tiles: 3 } }
    """, {"x": (2, 3, 2, 2)}, x=x)
    np.testing.assert_allclose(out["t"], np.tile(x, (1, 3, 1, 1)), rtol=1e-6)


def test_threshold_and_bnll():
    x = RNG.randn(2, 5).astype(np.float32)
    _, out = run_layer("""
    layer { name: "t" type: "Threshold" bottom: "x" top: "t"
            threshold_param { threshold: 0.2 } }
    layer { name: "b" type: "BNLL" bottom: "x" top: "b" }
    """, {"x": (2, 5)}, x=x)
    np.testing.assert_allclose(out["t"], (x > 0.2).astype(np.float32))
    np.testing.assert_allclose(out["b"], np.log1p(np.exp(-np.abs(x))) + np.maximum(x, 0),
                               rtol=1e-5)


def test_mvn():
    x = RNG.randn(2, 3, 4, 4).astype(np.float32) * 3 + 1
    _, out = run_layer("""
    layer { name: "m" type: "MVN" bottom: "x" top: "m"
            mvn_param { normalize_variance: true across_channels: false } }
    """, {"x": (2, 3, 4, 4)}, x=x)
    # per (n, c): zero mean, unit variance (mvn_layer.cpp)
    m = out["m"].reshape(2, 3, -1)
    np.testing.assert_allclose(m.mean(-1), 0.0, atol=1e-5)
    np.testing.assert_allclose(m.std(-1), 1.0, atol=1e-2)


def test_lrn_matches_torch():
    x = RNG.rand(2, 7, 5, 5).astype(np.float32)
    _, out = run_layer("""
    layer { name: "l" type: "LRN" bottom: "x" top: "l"
            lrn_param { local_size: 5 alpha: 0.9 beta: 0.75 k: 1.5 } }
    """, {"x": (2, 7, 5, 5)}, x=x)
    ref = torch.nn.functional.local_response_norm(
        torch.from_numpy(x), size=5, alpha=0.9, beta=0.75, k=1.5).numpy()
    np.testing.assert_allclose(out["l"], ref, rtol=1e-4, atol=1e-5)


def test_exp_layer():
    x = RNG.randn(2, 4).astype(np.float32)
    _, out = run_layer("""
    layer { name: "e" type: "Exp" bottom: "x" top: "e"
            exp_param { base: 2.0 scale: 0.5 shift: 1.0 } }
    """, {"x": (2, 4)}, x=x)
    np.testing.assert_allclose(out["e"], np.power(2.0, 0.5 * x + 1.0), rtol=1e-5)


def test_argmax_layer():
    x = RNG.randn(3, 6).astype(np.float32)
    _, out = run_layer("""
    layer { name: "a" type: "ArgMax" bottom: "x" top: "a"
            argmax_param { top_k: 2 } }
    """, {"x": (3, 6)}, x=x)
    # DESCENDING score order is part of the contract (argmax_layer.cpp
    # partial_sort by greater): position 0 must be the best class
    order = np.argsort(-x, axis=1)[:, :2]
    np.testing.assert_allclose(out["a"].reshape(3, 2),
                               order.astype(np.float32))


def test_concat_slice_flatten_reshape():
    a = RNG.randn(2, 3, 4, 4).astype(np.float32)
    b = RNG.randn(2, 2, 4, 4).astype(np.float32)
    _, out = run_layer("""
    layer { name: "c" type: "Concat" bottom: "a" bottom: "b" top: "c"
            concat_param { axis: 1 } }
    layer { name: "s" type: "Slice" bottom: "c" top: "s1" top: "s2"
            slice_param { axis: 1 slice_point: 3 } }
    layer { name: "f" type: "Flatten" bottom: "c" top: "f" }
    layer { name: "r" type: "Reshape" bottom: "c" top: "r"
            reshape_param { shape { dim: 0 dim: -1 dim: 4 } } }
    """, {"a": (2, 3, 4, 4), "b": (2, 2, 4, 4)}, a=a, b=b)
    cat = np.concatenate([a, b], axis=1)
    np.testing.assert_allclose(out["c"], cat, rtol=1e-6)
    np.testing.assert_allclose(out["s1"], cat[:, :3], rtol=1e-6)
    np.testing.assert_allclose(out["s2"], cat[:, 3:], rtol=1e-6)
    np.testing.assert_allclose(out["f"], cat.reshape(2, -1), rtol=1e-6)
    np.testing.assert_allclose(out["r"], cat.reshape(2, -1, 4), rtol=1e-6)


def test_spp_layer():
    x = RNG.randn(2, 3, 8, 8).astype(np.float32)
    _, out = run_layer("""
    layer { name: "s" type: "SPP" bottom: "x" top: "s"
            spp_param { pyramid_height: 2 pool: MAX } }
    """, {"x": (2, 3, 8, 8)}, x=x)
    assert out["s"].shape == (2, 3 * (1 + 4))
    # level 0 = global max per channel
    np.testing.assert_allclose(out["s"][:, :3], x.max(axis=(2, 3)), rtol=1e-5)
    # level 1 (divisible dims): 2x2 quadrant maxima, channel-major layout
    quads = np.stack([x[:, :, :4, :4].max((2, 3)), x[:, :, :4, 4:].max((2, 3)),
                      x[:, :, 4:, :4].max((2, 3)), x[:, :, 4:, 4:].max((2, 3))],
                     axis=2)  # (N, C, 4 bins)
    np.testing.assert_allclose(out["s"][:, 3:].reshape(2, 3, 4), quads,
                               rtol=1e-5)


def test_spp_non_divisible_bin_geometry():
    """spp_layer.cpp GetPoolingParam: kernel = ceil(dim/bins), stride =
    kernel, pad = (kernel*bins - dim + 1)/2 — for a 7x7 input at level 1
    the two bins cover rows [0..2] and [3..6] (1-px symmetric pad), NOT the
    overlapping windows a floor-stride would give."""
    x = RNG.randn(1, 2, 7, 7).astype(np.float32)
    _, out = run_layer("""
    layer { name: "s" type: "SPP" bottom: "x" top: "s"
            spp_param { pyramid_height: 2 pool: MAX } }
    """, {"x": (1, 2, 7, 7)}, x=x)
    # kernel 4, stride 4, pad 1: window r starts at 4r-1 over the padded grid
    seg = [(0, 3), (3, 7)]  # clipped [start, stop) per bin on the raw input
    bins = np.stack([
        x[:, :, a0:a1, b0:b1].max((2, 3))
        for a0, a1 in seg for b0, b1 in seg], axis=2)  # (1, 2, 4)
    np.testing.assert_allclose(out["s"][:, 2:].reshape(1, 2, 4), bins,
                               rtol=1e-5)


def test_hinge_loss_oracle():
    x = RNG.randn(4, 5).astype(np.float32)
    y = RNG.randint(0, 5, (4,)).astype(np.float32)
    for norm in ("L1", "L2"):
        _, out = run_layer(f"""
        layer {{ name: "h" type: "HingeLoss" bottom: "x" bottom: "y" top: "h"
                 hinge_loss_param {{ norm: {norm} }} }}
        """, {"x": (4, 5), "y": (4,)}, x=x, y=y)
        sign = np.ones_like(x)
        sign[np.arange(4), y.astype(int)] = -1
        margins = np.maximum(0, 1 + sign * x)
        ref = (margins ** 2).sum() / 4 if norm == "L2" else margins.sum() / 4
        np.testing.assert_allclose(out["h"], ref, rtol=1e-5)


def test_contrastive_loss_oracle():
    a = RNG.randn(4, 3).astype(np.float32)
    b = RNG.randn(4, 3).astype(np.float32)
    y = np.array([1, 0, 1, 0], np.float32)
    _, out = run_layer("""
    layer { name: "c" type: "ContrastiveLoss" bottom: "a" bottom: "b" bottom: "y"
            top: "c" contrastive_loss_param { margin: 1.0 } }
    """, {"a": (4, 3), "b": (4, 3), "y": (4,)}, a=a, b=b, y=y)
    d2 = ((a - b) ** 2).sum(1)
    neg = np.maximum(1.0 - np.sqrt(d2 + 1e-12), 0) ** 2
    ref = (y * d2 + (1 - y) * neg).sum() / (2 * 4)
    np.testing.assert_allclose(out["c"], ref, rtol=1e-4)


def test_infogain_and_mll_oracles(tmp_path):
    """MLL and InfogainLoss vs hand math (infogain_loss_layer.cpp:47-68):
    bottom[0] is PROBABILITIES (a preceding Softmax), H rows indexed by
    label; H = 2*eye must give exactly 2x the MLL value."""
    x = RNG.randn(3, 4).astype(np.float32)
    y = np.array([0, 2, 1], np.float32)
    net, out = run_layer("""
    layer { name: "sm" type: "Softmax" bottom: "x" top: "p" }
    layer { name: "m" type: "MultinomialLogisticLoss" bottom: "p" bottom: "y" top: "m" }
    """, {"x": (3, 4), "y": (3,)}, x=x, y=y)
    e = np.exp(x - x.max(1, keepdims=True))
    p = e / e.sum(1, keepdims=True)
    mll = -np.log(p[np.arange(3), y.astype(int)]).sum() / 3
    np.testing.assert_allclose(out["m"], mll, rtol=1e-5)

    # InfogainLoss, H loaded from a BlobProto source file
    from deepcut_tpu.io import array_to_blobproto_bytes
    Hfile = tmp_path / "H.binaryproto"
    Hfile.write_bytes(array_to_blobproto_bytes(
        (2.0 * np.eye(4, dtype=np.float32))[None, None]))
    _, out2 = run_layer(f"""
    layer {{ name: "sm" type: "Softmax" bottom: "x" top: "p" }}
    layer {{ name: "ig" type: "InfogainLoss" bottom: "p" bottom: "y" top: "ig"
            infogain_loss_param {{ source: "{Hfile}" }} }}
    """, {"x": (3, 4), "y": (3,)}, x=x, y=y)
    np.testing.assert_allclose(out2["ig"], 2.0 * mll, rtol=1e-5)

    # 3-bottom form with a general (non-diagonal) H: full hand oracle
    Hg = RNG.rand(4, 4).astype(np.float32)
    _, out3 = run_layer("""
    layer { name: "sm" type: "Softmax" bottom: "x" top: "p" }
    layer { name: "ig" type: "InfogainLoss" bottom: "p" bottom: "y" bottom: "H" top: "ig" }
    """, {"x": (3, 4), "y": (3,), "H": (4, 4)}, x=x, y=y, H=Hg)
    ref = -(Hg[y.astype(int)] * np.log(p)).sum() / 3
    np.testing.assert_allclose(out3["ig"], ref, rtol=1e-4)


def test_im2col_layer():
    x = RNG.randn(1, 2, 5, 5).astype(np.float32)
    _, out = run_layer("""
    layer { name: "i" type: "Im2col" bottom: "x" top: "i"
            convolution_param { kernel_size: 3 stride: 1 pad: 0 } }
    """, {"x": (1, 2, 5, 5)}, x=x)
    ref = torch.nn.functional.unfold(torch.from_numpy(x), 3).numpy()
    got = out["i"].reshape(1, 18, 9)
    # EXACT layout parity: torch.unfold emits Caffe's channel-major im2col
    # order (im2col.cpp:18-55), and conv_general_dilated_patches matches it
    # element-for-element — a sorted comparison would accept any scrambling
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_bn_scale_affine_matches_separate_ops():
    """bn_scale_affine == batch_norm_inference + scale (one fused pass vs
    two; used by the unfolded model forward)."""
    import jax.numpy as jnp
    from deepcut_tpu.ops.norm import (batch_norm_inference, bn_scale_affine,
                                      scale)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 5, 7, 6).astype(np.float32))
    mean = jnp.asarray(rng.randn(6).astype(np.float32))
    var = jnp.asarray((1 + rng.rand(6)).astype(np.float32))
    sf = jnp.asarray([2.5], jnp.float32)
    gamma = jnp.asarray(rng.randn(6).astype(np.float32))
    beta = jnp.asarray(rng.randn(6).astype(np.float32))

    ref = scale(batch_norm_inference(x, mean, var, sf, eps=1e-5), gamma, beta)
    got = bn_scale_affine(x, mean, var, sf, gamma, beta, eps=1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    # zero scale_factor treated as 1 (batch_norm_layer.cpp guard)
    ref0 = scale(batch_norm_inference(x, mean, var, jnp.zeros(1)), gamma, beta)
    got0 = bn_scale_affine(x, mean, var, jnp.zeros(1), gamma, beta)
    np.testing.assert_allclose(np.asarray(got0), np.asarray(ref0),
                               rtol=2e-5, atol=2e-5)
