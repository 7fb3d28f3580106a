"""Finite-difference gradient checking — the analog of the reference's
GradientChecker (include/caffe/test/test_gradient_check_util.hpp:19-73),
which is the main correctness tool of virtually every reference layer test.

Here jax.grad supplies the analytic gradient through the SAME jitted graph
the product serves, and central differences supply the oracle. Inputs are
generated with a margin away from kinks (ReLU zero, |d|=1 of SmoothL1,
pooling ties) instead of the reference's kink-window skipping.

The custom_vjp losses (ops/losses.py) are the critical cases: their
backward is hand-written to match Caffe's (max(count,100) normalizers),
so autodiff does NOT guarantee forward/backward consistency there — only a
numerical check does.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepcut_tpu.core.graph import Net
from deepcut_tpu.proto import text_format


def _to_dev(arr):
    a = jnp.asarray(arr)
    return jnp.transpose(a, (0, 2, 3, 1)) if a.ndim == 4 else a


def _fd(f, x, eps):
    """Central-difference gradient of scalar f at numpy array x."""
    x = np.array(x, np.float32)
    g = np.zeros(x.size, np.float64)
    flat = x.reshape(-1)
    for i in range(flat.size):
        orig = flat[i]
        flat[i] = orig + eps
        fp = f(x)
        flat[i] = orig - eps
        fm = f(x)
        flat[i] = orig
        g[i] = (fp - fm) / (2.0 * eps)
    return g.reshape(x.shape).astype(np.float32)


def check_grads(proto: str, inputs_nchw: dict, *, check_inputs=None,
                check_params=True, outputs=None, eps=1e-2, rtol=2e-2,
                atol=2e-3, seed=0):
    """Build a net, compare jax.grad to finite differences for the selected
    input blobs and every parameter blob, on a scalar projection of the
    requested outputs (loss outputs project with cotangent 1)."""
    net = Net(text_format.parse(proto), phase="TRAIN", compute_dtype=None)
    dev_inputs = {k: _to_dev(np.asarray(v, np.float32))
                  for k, v in inputs_nchw.items()}
    net._ensure_params({k: tuple(v.shape) for k, v in dev_inputs.items()})
    fwd = net.make_forward(outputs)
    out0 = fwd(net.params, dev_inputs)
    rng = np.random.RandomState(seed)
    cots = {k: (jnp.asarray(rng.randn(*v.shape).astype(np.float32)) / v.size
                if v.ndim else jnp.float32(1.0))
            for k, v in out0.items()}

    def scalar(params, dins):
        outs = fwd(params, dins)
        return sum(jnp.vdot(cots[k], o.astype(jnp.float32))
                   for k, o in outs.items())

    scalar_j = jax.jit(scalar)
    g_params, g_inputs = jax.jit(jax.grad(scalar, argnums=(0, 1)))(
        net.params, dev_inputs)

    names = check_inputs if check_inputs is not None else list(dev_inputs)
    for name in names:
        def f(x, name=name):
            d = dict(dev_inputs)
            d[name] = _to_dev(x)
            return float(scalar_j(net.params, d))
        fd = _to_dev(_fd(f, inputs_nchw[name], eps))
        np.testing.assert_allclose(
            np.asarray(g_inputs[name]), np.asarray(fd),
            rtol=rtol, atol=atol, err_msg=f"input grad mismatch: {name}")

    if check_params:
        for lname, entry in net.params.items():
            for k, v in entry.items():
                def f(x, lname=lname, k=k):
                    p = {n: dict(e) for n, e in net.params.items()}
                    p[lname][k] = jnp.asarray(x)
                    return float(scalar_j(p, dev_inputs))
                fd = _fd(f, np.asarray(v), eps)
                np.testing.assert_allclose(
                    np.asarray(g_params[lname][k]), fd, rtol=rtol, atol=atol,
                    err_msg=f"param grad mismatch: {lname}/{k}")
    return net


def _x(shape, seed=0, margin=0.0, scale=1.0):
    """Random input with |x| >= margin (kink avoidance)."""
    rng = np.random.RandomState(seed)
    x = rng.randn(*shape).astype(np.float32) * scale
    if margin:
        x = np.where(np.abs(x) < margin, np.sign(x) * margin + x, x)
    return x


INPUT_4D = """
input: "data"
input_dim: 2 input_dim: 4 input_dim: 6 input_dim: 6
"""


def test_conv_dilated_grouped():
    proto = INPUT_4D + """
    layer { name: "conv" type: "Convolution" bottom: "data" top: "out"
      convolution_param { num_output: 4 kernel_size: 3 pad: 2 dilation: 2
        group: 2 stride: 1
        weight_filler { type: "gaussian" std: 0.3 }
        bias_filler { type: "gaussian" std: 0.1 } } }
    """
    check_grads(proto, {"data": _x((2, 4, 6, 6))})


def test_deconv():
    proto = INPUT_4D + """
    layer { name: "up" type: "Deconvolution" bottom: "data" top: "out"
      convolution_param { num_output: 2 kernel_size: 4 stride: 2 pad: 1
        group: 2 weight_filler { type: "gaussian" std: 0.3 } } }
    """
    check_grads(proto, {"data": _x((2, 4, 6, 6))})


def test_pooling_max_and_ave():
    # distinct values keep the max-pool argmax away from ties under +-eps
    rng = np.random.RandomState(3)
    base = rng.permutation(2 * 4 * 6 * 6).astype(np.float32)
    x = (base / base.size * 10).reshape(2, 4, 6, 6)
    proto = INPUT_4D + """
    layer { name: "p1" type: "Pooling" bottom: "data" top: "p1"
      pooling_param { pool: MAX kernel_size: 3 stride: 2 } }
    layer { name: "p2" type: "Pooling" bottom: "data" top: "p2"
      pooling_param { pool: AVE kernel_size: 2 stride: 2 } }
    """
    check_grads(proto, {"data": x})


def test_inner_product_prelu():
    proto = INPUT_4D + """
    layer { name: "ip" type: "InnerProduct" bottom: "data" top: "ip"
      inner_product_param { num_output: 5
        weight_filler { type: "gaussian" std: 0.3 }
        bias_filler { type: "gaussian" std: 0.1 } } }
    layer { name: "act" type: "PReLU" bottom: "ip" top: "out"
      prelu_param { filler { value: 0.3 } } }
    """
    check_grads(proto, {"data": _x((2, 4, 6, 6), margin=0.1)})


def test_scale_bias_learned():
    proto = INPUT_4D + """
    layer { name: "sc" type: "Scale" bottom: "data" top: "out"
      scale_param { bias_term: true
        filler { type: "gaussian" std: 0.3 } } }
    """
    check_grads(proto, {"data": _x((2, 4, 6, 6))})


def test_lrn_mvn():
    proto = INPUT_4D + """
    layer { name: "lrn" type: "LRN" bottom: "data" top: "l"
      lrn_param { local_size: 3 alpha: 0.001 beta: 0.75 } }
    layer { name: "mvn" type: "MVN" bottom: "data" top: "m"
      mvn_param { normalize_variance: true } }
    """
    check_grads(proto, {"data": _x((2, 4, 6, 6))})


def test_activation_stack():
    # sigmoid -> tanh -> elu -> bnll chained; smooth everywhere
    proto = INPUT_4D + """
    layer { name: "a" type: "Sigmoid" bottom: "data" top: "a" }
    layer { name: "b" type: "TanH" bottom: "a" top: "b" }
    layer { name: "c" type: "ELU" bottom: "b" top: "c" elu_param { alpha: 0.7 } }
    layer { name: "d" type: "BNLL" bottom: "c" top: "d" }
    layer { name: "e" type: "Power" bottom: "d" top: "e"
      power_param { power: 2 scale: 0.5 shift: 1 } }
    """
    check_grads(proto, {"data": _x((2, 4, 6, 6))})


def test_eltwise_all_modes():
    # MAX needs tie-free inputs: disjoint ranges per bottom
    a = _x((2, 4, 6, 6), seed=1)
    b = _x((2, 4, 6, 6), seed=2) + 0.05
    mask = np.abs(a - b) < 0.05
    b = np.where(mask, b + 0.1, b)
    proto = """
    input: "a" input_dim: 2 input_dim: 4 input_dim: 6 input_dim: 6
    input: "b" input_dim: 2 input_dim: 4 input_dim: 6 input_dim: 6
    layer { name: "s" type: "Eltwise" bottom: "a" bottom: "b" top: "s"
      eltwise_param { operation: SUM coeff: 2.0 coeff: -0.5 } }
    layer { name: "p" type: "Eltwise" bottom: "a" bottom: "b" top: "p"
      eltwise_param { operation: PROD } }
    layer { name: "m" type: "Eltwise" bottom: "a" bottom: "b" top: "m"
      eltwise_param { operation: MAX } }
    """
    check_grads(proto, {"a": a, "b": b})


def test_crop_concat_softmax():
    proto = """
    input: "a" input_dim: 2 input_dim: 4 input_dim: 6 input_dim: 6
    input: "b" input_dim: 2 input_dim: 4 input_dim: 4 input_dim: 4
    layer { name: "cr" type: "Crop" bottom: "a" bottom: "b" top: "cr" }
    layer { name: "cat" type: "Concat" bottom: "cr" bottom: "b" top: "cat" }
    layer { name: "sm" type: "Softmax" bottom: "cat" top: "out" }
    """
    check_grads(proto, {"a": _x((2, 4, 6, 6)), "b": _x((2, 4, 4, 4), seed=5)})


def test_spp_reduction_tile():
    rng = np.random.RandomState(7)
    base = rng.permutation(2 * 4 * 6 * 6).astype(np.float32)
    x = (base / base.size * 4).reshape(2, 4, 6, 6)
    proto = INPUT_4D + """
    layer { name: "spp" type: "SPP" bottom: "data" top: "spp"
      spp_param { pyramid_height: 2 pool: MAX } }
    layer { name: "red" type: "Reduction" bottom: "data" top: "red"
      reduction_param { operation: MEAN axis: 1 coeff: 2.0 } }
    layer { name: "tile" type: "Tile" bottom: "data" top: "tile"
      tile_param { axis: 1 tiles: 2 } }
    """
    check_grads(proto, {"data": x})


# ---- custom_vjp losses: the cases autodiff cannot vouch for -------------

def test_euclidean_loss_grad():
    proto = """
    input: "pred" input_shape { dim: 4 dim: 3 }
    input: "label" input_shape { dim: 4 dim: 3 }
    layer { name: "l" type: "EuclideanLoss" bottom: "pred" bottom: "label"
            top: "loss" }
    """
    check_grads(proto, {"pred": _x((4, 3)), "label": _x((4, 3), seed=9)},
                check_params=False)


def test_smooth_l1_grads():
    # margin keeps |pred-label| away from the |d|=1 curvature kink
    pred = _x((1, 4, 5, 5), seed=1)
    label = pred + np.where(_x((1, 4, 5, 5), seed=2) > 0, 1.6, 0.4)
    proto2 = """
    input: "pred" input_dim: 1 input_dim: 4 input_dim: 5 input_dim: 5
    input: "label" input_dim: 1 input_dim: 4 input_dim: 5 input_dim: 5
    layer { name: "l" type: "SmoothL1Loss" bottom: "pred" bottom: "label"
            top: "loss" }
    """
    # unweighted 2-bottom form is forward/backward consistent -> FD applies
    check_grads(proto2, {"pred": pred, "label": label},
                check_inputs=["pred"], check_params=False)


def test_smooth_l1_weighted_backward_is_fork_exact():
    """The 3-bottom (weighted) SmoothL1 backward INTENTIONALLY diverges from
    the true derivative of its forward (Fast R-CNN heritage: backward does
    not re-apply the weight factor and clamps the normalizer at 100 while
    the forward divides by the unclamped weight sum —
    smooth_L1_loss_layer.cu:47-55,86). FD therefore cannot match; the parity
    requirement is the fork's formula itself: dpred = f'(w*d) / max(sum w, 100)."""
    from deepcut_tpu.ops import losses as L

    pred = jnp.asarray(_x((1, 5, 5, 4), seed=1))
    label = pred + jnp.asarray(
        np.where(_x((1, 5, 5, 4), seed=2) > 0, 1.6, 0.4))
    w = jnp.asarray(np.abs(_x((1, 5, 5, 4), seed=3)) + 0.2)
    g = jax.grad(lambda p: L.smooth_l1_loss(p, label, w))(pred)
    d = np.asarray(w) * (np.asarray(pred) - np.asarray(label))
    fprime = np.where(np.abs(d) < 1.0, d, np.sign(d))
    expect = fprime / max(float(np.sum(np.asarray(w))), 100.0)
    np.testing.assert_allclose(np.asarray(g), expect, rtol=1e-5, atol=1e-7)
    # and it must NOT equal the true derivative of the forward
    assert not np.allclose(
        np.asarray(g),
        fprime * np.asarray(w) / float(np.sum(np.abs(np.asarray(w)))),
        rtol=1e-2)


def test_softmax_loss_vec_grads():
    # dense scoremap labels; both the clamped-count normalizer directions
    scores = _x((1, 3, 6, 6), seed=4)
    labels = (np.abs(_x((1, 3, 6, 6), seed=5)) > 0.8).astype(np.float32)
    # cross-entropy (sigmoid) mode
    proto_ce = """
    input: "scores" input_dim: 1 input_dim: 3 input_dim: 6 input_dim: 6
    input: "labels" input_dim: 1 input_dim: 3 input_dim: 6 input_dim: 6
    layer { name: "l" type: "SoftmaxWithLossVec" bottom: "scores"
            bottom: "labels" top: "loss"
            softmax_with_loss_vec_param { cross_entropy: true } }
    """
    check_grads(proto_ce, {"scores": scores, "labels": labels},
                check_inputs=["scores"], check_params=False)


def test_softmax_loss_vec_softmax_mode_backward_is_fork_exact():
    """Softmax (argmax-label) mode: the reference's backward is
    `prob - label` against a `-log(prob[argmax(label)])` forward
    (softmax_loss_vec_layer.cpp:154-233) — the dense label vector acts as
    the target distribution in the gradient even though the forward only
    reads its argmax. FD cannot match that by construction; assert the fork
    formula directly."""
    from deepcut_tpu.ops import losses as L

    scores = jnp.asarray(_x((1, 6, 6, 3), seed=4))
    labels_np = (np.abs(_x((1, 6, 6, 3), seed=5)) > 0.8).astype(np.float32)
    labels = jnp.asarray(labels_np)
    fn = L.make_softmax_loss_vec(cross_entropy=False)
    g = jax.grad(lambda s: fn(s, labels))(scores)
    prob = np.asarray(jax.nn.softmax(scores, axis=-1))
    count = labels_np.shape[1] * labels_np.shape[2]  # all positions live
    expect = (prob - labels_np) / max(count, 100)
    np.testing.assert_allclose(np.asarray(g), expect, rtol=1e-5, atol=1e-7)


def test_sigmoid_ce_hinge_mll():
    scores = _x((4, 5), seed=6)
    targets = (np.abs(_x((4, 5), seed=7)) > 0.7).astype(np.float32)
    proto = """
    input: "scores" input_shape { dim: 4 dim: 5 }
    input: "targets" input_shape { dim: 4 dim: 5 }
    layer { name: "l" type: "SigmoidCrossEntropyLoss" bottom: "scores"
            bottom: "targets" top: "loss" }
    """
    check_grads(proto, {"scores": scores, "targets": targets},
                check_inputs=["scores"], check_params=False)

    # hinge L2 (smooth); labels are integers -> only score grads
    labels = np.array([0, 2, 1, 4], np.float32)
    proto_h = """
    input: "scores" input_shape { dim: 4 dim: 5 }
    input: "label" input_shape { dim: 4 }
    layer { name: "l" type: "HingeLoss" bottom: "scores" bottom: "label"
            top: "loss" hinge_loss_param { norm: L2 } }
    """
    check_grads(proto_h, {"scores": _x((4, 5), seed=8, margin=0.15),
                          "label": labels},
                check_inputs=["scores"], check_params=False)

    # multinomial logistic on strictly-positive probabilities
    probs = np.abs(_x((4, 5), seed=9)) + 0.3
    probs = probs / probs.sum(axis=1, keepdims=True)
    proto_m = """
    input: "probs" input_shape { dim: 4 dim: 5 }
    input: "label" input_shape { dim: 4 }
    layer { name: "l" type: "MultinomialLogisticLoss" bottom: "probs"
            bottom: "label" top: "loss" }
    """
    check_grads(proto_m, {"probs": probs, "label": labels},
                check_inputs=["probs"], check_params=False, eps=1e-3,
                rtol=3e-2)


def test_contrastive_loss_grad():
    a = _x((6, 4), seed=10)
    b = _x((6, 4), seed=11)
    # margin avoidance: keep dissimilar-pair distances away from the margin
    sim = np.array([1, 0, 1, 0, 1, 0], np.float32)
    proto = """
    input: "a" input_shape { dim: 6 dim: 4 }
    input: "b" input_shape { dim: 6 dim: 4 }
    input: "sim" input_shape { dim: 6 }
    layer { name: "l" type: "ContrastiveLoss" bottom: "a" bottom: "b"
            bottom: "sim" top: "loss"
            contrastive_loss_param { margin: 5.0 } }
    """
    check_grads(proto, {"a": a, "b": b, "sim": sim},
                check_inputs=["a", "b"], check_params=False)
