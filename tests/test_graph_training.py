"""Graph-engine training features: named weight sharing, loss aggregation,
jitted train step with lr_mult handling, net.backward."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepcut_tpu.core.graph import Net
from deepcut_tpu.proto import text_format
from deepcut_tpu.solver.update_rules import SolverConfig


SHARED_PROTO = """
name: "siamese-ish"
input: "a"
input_shape { dim: 4 dim: 8 }
input: "b"
input_shape { dim: 4 dim: 8 }
layer {
  name: "ip_a" type: "InnerProduct" bottom: "a" top: "fa"
  param { name: "shared_w" lr_mult: 1 }
  param { name: "shared_b" lr_mult: 2 }
  inner_product_param { num_output: 6 weight_filler { type: "gaussian" std: 0.2 } }
}
layer {
  name: "ip_b" type: "InnerProduct" bottom: "b" top: "fb"
  param { name: "shared_w" }
  param { name: "shared_b" }
  inner_product_param { num_output: 6 weight_filler { type: "gaussian" std: 0.2 } }
}
"""


def test_shared_weights_forward():
    net = Net(text_format.parse(SHARED_PROTO), compute_dtype=None)
    # ip_b has no own arrays; it aliases ip_a's
    assert net.params["ip_b"] == {}
    x = np.random.RandomState(0).randn(4, 8).astype(np.float32)
    outs = net.forward(a=x, b=x)
    np.testing.assert_allclose(outs["fa"], outs["fb"], rtol=1e-6)


TRAIN_PROTO = """
name: "trainable"
input: "data"
input_shape { dim: 8 dim: 12 }
input: "label"
input_shape { dim: 8 }
layer {
  name: "ip1" type: "InnerProduct" bottom: "data" top: "ip1"
  inner_product_param { num_output: 16 weight_filler { type: "xavier" } }
}
layer { name: "relu1" type: "ReLU" bottom: "ip1" top: "ip1" }
layer {
  name: "ip2" type: "InnerProduct" bottom: "ip1" top: "ip2"
  param { lr_mult: 1 } param { lr_mult: 2 }
  inner_product_param { num_output: 4 weight_filler { type: "xavier" } }
}
layer { name: "loss" type: "SoftmaxWithLoss" bottom: "ip2" bottom: "label" top: "loss" }
"""


def _train_inputs(seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(8, 12).astype(np.float32)
    y = rng.randint(0, 4, (8,)).astype(np.int32)
    return {"data": jnp.asarray(x), "label": jnp.asarray(y)}


def test_graph_train_step_reduces_loss():
    from deepcut_tpu.solver.update_rules import init_state

    net = Net(text_format.parse(TRAIN_PROTO), phase="TRAIN", compute_dtype=None)
    cfg = SolverConfig(solver_type="SGD", base_lr=0.1, momentum=0.9, weight_decay=0.0)
    step = net.make_train_step(cfg)
    params = net.params
    state = init_state(cfg, params)
    inputs = _train_inputs()
    losses = []
    for _ in range(30):
        params, state, loss = step(params, state, inputs)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, losses[::10]


def test_lr_mult_zero_freezes():
    from deepcut_tpu.solver.update_rules import init_state

    proto = TRAIN_PROTO.replace("param { lr_mult: 1 } param { lr_mult: 2 }",
                                "param { lr_mult: 0 } param { lr_mult: 0 }")
    net = Net(text_format.parse(proto), phase="TRAIN", compute_dtype=None)
    cfg = SolverConfig(solver_type="SGD", base_lr=0.1, momentum=0.0, weight_decay=0.0)
    step = net.make_train_step(cfg)
    from deepcut_tpu.solver.update_rules import init_state as istate
    params = net.params
    state = istate(cfg, params)
    before = np.asarray(params["ip2"]["w"]).copy()
    params, state, _ = step(params, state, _train_inputs())
    np.testing.assert_array_equal(np.asarray(params["ip2"]["w"]), before)
    assert not np.array_equal(np.asarray(params["ip1"]["w"]),
                              np.asarray(net.params["ip1"]["w"]))


BN_PROTO = """
name: "bn-train"
input: "data"
input_shape { dim: 8 dim: 3 dim: 6 dim: 6 }
input: "label"
input_shape { dim: 8 }
layer {
  name: "conv" type: "Convolution" bottom: "data" top: "conv"
  convolution_param { num_output: 4 kernel_size: 3 pad: 1
    weight_filler { type: "xavier" } }
}
layer { name: "bn" type: "BatchNorm" bottom: "conv" top: "conv"
        batch_norm_param { use_global_stats: false } }
layer { name: "sc" type: "Scale" bottom: "conv" top: "conv"
        scale_param { bias_term: true } }
layer { name: "relu" type: "ReLU" bottom: "conv" top: "conv" }
layer { name: "ip" type: "InnerProduct" bottom: "conv" top: "ip"
        inner_product_param { num_output: 3 weight_filler { type: "xavier" } } }
layer { name: "loss" type: "SoftmaxWithLoss" bottom: "ip" bottom: "label" top: "loss" }
"""


def test_bn_training_updates_moving_stats():
    from deepcut_tpu.solver.update_rules import init_state

    net = Net(text_format.parse(BN_PROTO), phase="TRAIN", compute_dtype=None)
    cfg = SolverConfig(solver_type="SGD", base_lr=0.05, momentum=0.9,
                       weight_decay=0.0)
    step = net.make_train_step(cfg)
    params = net.params
    state = init_state(cfg, params)
    rng = np.random.RandomState(0)
    inputs = {"data": jnp.asarray(rng.randn(8, 6, 6, 3).astype(np.float32) * 2 + 1),
              "label": jnp.asarray(rng.randint(0, 3, (8,)))}
    assert float(jnp.sum(jnp.abs(params["bn"]["mean"]))) == 0.0
    losses = []
    for _ in range(15):
        params, state, loss = step(params, state, inputs)
        losses.append(float(loss))
    # moving averages accumulated (Caffe: blobs[2] = m*sf + 1)
    assert float(jnp.sum(jnp.abs(params["bn"]["mean"]))) > 0
    sf = float(params["bn"]["scale_factor"][0])
    # our stats init is (mean 0, var 1, sf 1) — identity at inference —
    # unlike Caffe's all-zero blobs; sf therefore carries the initial 1:
    expect_sf = 0.999 ** 15 + sum(0.999 ** i for i in range(15))
    np.testing.assert_allclose(sf, expect_sf, rtol=1e-4)
    assert losses[-1] < losses[0]
    # TEST-phase net with the trained stats runs global-stats normalisation
    net_test = Net(text_format.parse(BN_PROTO.replace(
        "use_global_stats: false", "use_global_stats: true")),
        phase="TEST", compute_dtype=None)
    net_test.params = params
    out = net_test.forward(data=np.asarray(inputs["data"]).transpose(0, 3, 1, 2),
                           label=np.zeros(8, np.float32))
    assert np.isfinite(out["ip"]).all()


def test_net_backward_input_grads():
    net = Net(text_format.parse(TRAIN_PROTO), phase="TRAIN", compute_dtype=None)
    rng = np.random.RandomState(1)
    grads = net.backward(data=rng.randn(8, 12).astype(np.float32),
                         label=rng.randint(0, 4, (8,)).astype(np.int32))
    assert grads["data"].shape == (8, 12)
    assert np.abs(grads["data"]).sum() > 0


DROPOUT_PROTO = """
name: "dropnet"
input: "data"
input_shape { dim: 8 dim: 12 }
input: "label"
input_shape { dim: 8 }
layer {
  name: "ip1" type: "InnerProduct" bottom: "data" top: "ip1"
  inner_product_param { num_output: 16 weight_filler { type: "xavier" } }
}
layer { name: "relu1" type: "ReLU" bottom: "ip1" top: "ip1" }
layer { name: "drop" type: "Dropout" bottom: "ip1" top: "dp"
        dropout_param { dropout_ratio: 0.4 } }
layer {
  name: "ip2" type: "InnerProduct" bottom: "dp" top: "ip2"
  inner_product_param { num_output: 4 weight_filler { type: "xavier" } }
}
layer { name: "loss" type: "SoftmaxWithLoss" bottom: "ip2" bottom: "label" top: "loss" }
"""


def test_dropout_train_is_real_and_inverted_scaled():
    """TRAIN-phase Dropout must zero ~ratio units and scale survivors by
    1/(1-ratio) (reference dropout_layer.cpp), with a fresh mask per call."""
    net = Net(text_format.parse(DROPOUT_PROTO), phase="TRAIN", compute_dtype=None)
    rng = np.random.RandomState(0)
    x = rng.randn(8, 12).astype(np.float32)
    y = rng.randint(0, 4, (8,)).astype(np.int32)
    out1 = net.forward(data=x, label=y)
    out2 = net.forward(data=x, label=y)
    pre, dp1, dp2 = out1["ip1"], out1["dp"], out2["dp"]
    # fresh mask per forward call
    assert not np.array_equal(dp1, dp2)
    # every element is either dropped (0) or scaled by 1/(1-0.4)
    scaled = pre / 0.6
    is_zero = np.isclose(dp1, 0.0, atol=1e-7)
    is_scaled = np.isclose(dp1, scaled, rtol=1e-5, atol=1e-6)
    assert np.all(is_zero | is_scaled)
    # with ratio 0.4 over 128 units, both outcomes must actually occur
    # (pre has zeros from ReLU, so count only clearly-positive units)
    live = pre > 1e-3
    assert is_zero[live].any() and is_scaled[live].any()
    # TEST phase: identity
    net_t = Net(text_format.parse(DROPOUT_PROTO), phase="TEST", compute_dtype=None)
    net_t.params = net.params
    out_t = net_t.forward(data=x, label=y)
    np.testing.assert_allclose(out_t["dp"], out_t["ip1"], rtol=1e-6)


def test_dropout_train_step_runs_and_learns():
    from deepcut_tpu.solver.update_rules import init_state

    net = Net(text_format.parse(DROPOUT_PROTO), phase="TRAIN", compute_dtype=None)
    cfg = SolverConfig(solver_type="SGD", base_lr=0.1, momentum=0.9, weight_decay=0.0)
    step = net.make_train_step(cfg)
    params, state = net.params, init_state(cfg, net.params)
    inputs = _train_inputs()
    losses = []
    for _ in range(40):
        params, state, loss = step(params, state, inputs)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, losses[::10]


STOCH_POOL_PROTO = """
name: "stochpool"
input: "data"
input_shape { dim: 2 dim: 3 dim: 8 dim: 8 }
layer { name: "pool" type: "Pooling" bottom: "data" top: "pool"
        pooling_param { pool: STOCHASTIC kernel_size: 2 stride: 2 } }
"""


def test_stochastic_pool_train_samples_window_elements():
    """TRAIN stochastic pooling picks an element OF the window (pooling_layer.cu),
    not the test-time weighted average."""
    net = Net(text_format.parse(STOCH_POOL_PROTO), phase="TRAIN", compute_dtype=None)
    rng = np.random.RandomState(3)
    x = np.abs(rng.randn(2, 3, 8, 8)).astype(np.float32) + 0.1
    out = net.forward(data=x)["pool"]
    # every output must be one of the 4 elements of its window
    windows = x.reshape(2, 3, 4, 2, 4, 2).transpose(0, 1, 2, 4, 3, 5).reshape(2, 3, 4, 4, 4)
    member = np.isclose(out[..., None], windows, rtol=1e-5).any(-1)
    assert member.all()
    # and two calls draw different samples
    out2 = net.forward(data=x)["pool"]
    assert not np.array_equal(out, out2)


def test_decay_mult_zero_disables_weight_decay():
    """prototxt `param { decay_mult: 0 }` must exempt a blob from L2 decay
    (reference Regularize, sgd_solver.cpp:69-83)."""
    from deepcut_tpu.solver.update_rules import init_state

    proto_dm0 = TRAIN_PROTO.replace(
        "param { lr_mult: 1 } param { lr_mult: 2 }",
        "param { lr_mult: 1 decay_mult: 0 } param { lr_mult: 2 decay_mult: 0 }")
    cfg_decay = SolverConfig(solver_type="SGD", base_lr=0.1, momentum=0.0,
                             weight_decay=0.7)
    cfg_nodecay = SolverConfig(solver_type="SGD", base_lr=0.1, momentum=0.0,
                               weight_decay=0.0)
    inputs = _train_inputs()

    net_a = Net(text_format.parse(proto_dm0), phase="TRAIN", compute_dtype=None)
    step_a = net_a.make_train_step(cfg_decay)
    pa, _, _ = step_a(net_a.params, init_state(cfg_decay, net_a.params), inputs)

    net_b = Net(text_format.parse(proto_dm0), phase="TRAIN", compute_dtype=None)
    net_b.params = net_a.params
    step_b = net_b.make_train_step(cfg_nodecay)
    pb, _, _ = step_b(net_b.params, init_state(cfg_nodecay, net_b.params), inputs)

    # ip2 blobs (decay_mult 0): decay on vs off must agree exactly
    np.testing.assert_allclose(np.asarray(pa["ip2"]["w"]),
                               np.asarray(pb["ip2"]["w"]), rtol=1e-6)
    # ip1 blobs (default decay_mult 1): decay must have changed the update
    assert not np.allclose(np.asarray(pa["ip1"]["w"]), np.asarray(pb["ip1"]["w"]))


def test_graph_fold_bn_inference_equivalence():
    """Net.fold_bn folds conv->BN->Scale chains; outputs must match the
    unfolded net (the graph analog of models/resnet.fold_bn)."""
    proto = """
    input: "data"
    input_shape { dim: 2 dim: 3 dim: 10 dim: 10 }
    layer { name: "conv" type: "Convolution" bottom: "data" top: "c"
            convolution_param { num_output: 6 kernel_size: 3 pad: 1
              weight_filler { type: "gaussian" std: 0.3 } } }
    layer { name: "bn" type: "BatchNorm" bottom: "c" top: "c" }
    layer { name: "sc" type: "Scale" bottom: "c" top: "c"
            scale_param { bias_term: true } }
    layer { name: "relu" type: "ReLU" bottom: "c" top: "c" }
    layer { name: "conv2" type: "Convolution" bottom: "c" top: "d"
            convolution_param { num_output: 4 kernel_size: 1 bias_term: true
              weight_filler { type: "gaussian" std: 0.3 } } }
    layer { name: "bn2" type: "BatchNorm" bottom: "d" top: "d" }
    """
    rng = np.random.RandomState(0)
    net = Net(text_format.parse(proto), phase="TEST", compute_dtype=None)
    # perturb BN/Scale away from identity so folding is exercised
    net.params["bn"] = {"mean": jnp.asarray(rng.randn(6).astype(np.float32) * 0.2),
                        "var": jnp.asarray(1.0 + rng.rand(6).astype(np.float32)),
                        "scale_factor": jnp.asarray([0.998], jnp.float32)}
    net.params["sc"] = {"gamma": jnp.asarray(1 + 0.3 * rng.randn(6).astype(np.float32)),
                        "beta": jnp.asarray(0.1 * rng.randn(6).astype(np.float32))}
    net.params["bn2"] = {"mean": jnp.asarray(rng.randn(4).astype(np.float32) * 0.2),
                         "var": jnp.asarray(1.0 + rng.rand(4).astype(np.float32)),
                         "scale_factor": jnp.asarray([1.0], jnp.float32)}
    x = rng.randn(2, 3, 10, 10).astype(np.float32)
    ref = net.forward(data=x)
    n = net.fold_bn()
    assert n == 2
    assert "bn" not in net.params and "sc" not in net.params
    assert [s.type for _, s in net._plan] == ["Convolution", "ReLU", "Convolution"]
    out = net.forward(data=x)
    np.testing.assert_allclose(out["d"], ref["d"], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(out["c"], ref["c"], rtol=2e-5, atol=2e-5)


def test_graph_make_forward_serving_path():
    """fold_bn + cast_weights + make_forward: the pruned serving entry must
    match forward()'s outputs and return only the requested blobs."""
    proto = """
    input: "data"
    input_shape { dim: 2 dim: 3 dim: 8 dim: 8 }
    layer { name: "conv" type: "Convolution" bottom: "data" top: "c"
            convolution_param { num_output: 4 kernel_size: 3 pad: 1
              weight_filler { type: "gaussian" std: 0.3 } } }
    layer { name: "bn" type: "BatchNorm" bottom: "c" top: "c" }
    layer { name: "sc" type: "Scale" bottom: "c" top: "c"
            scale_param { bias_term: true } }
    layer { name: "relu" type: "ReLU" bottom: "c" top: "c" }
    layer { name: "prob" type: "Sigmoid" bottom: "c" top: "p" }
    """
    rng = np.random.RandomState(1)
    net = Net(text_format.parse(proto), phase="TEST", compute_dtype=None)
    net.params["bn"] = {"mean": jnp.asarray(rng.randn(4).astype(np.float32) * 0.3),
                        "var": jnp.asarray(1.0 + rng.rand(4).astype(np.float32)),
                        "scale_factor": jnp.asarray([1.0], jnp.float32)}
    x = rng.randn(2, 3, 8, 8).astype(np.float32)
    ref = net.forward(data=x)
    net.fold_bn()
    net.cast_weights(jnp.float32)
    fwd = net.make_forward()
    outs = fwd(net.params, {"data": jnp.asarray(x.transpose(0, 2, 3, 1))})
    assert set(outs) == {"p"}
    np.testing.assert_allclose(
        np.asarray(outs["p"]).transpose(0, 3, 1, 2), ref["p"], rtol=2e-5, atol=2e-5)


def test_graph_quantize_int8_serving():
    """Net.quantize_int8: post-training int8 for any prototxt — outputs stay
    close to float, conv params become w_q/w_scale/act_scale, non-conv and
    grouped layers stay float."""
    proto = """
    input: "data"
    input_shape { dim: 2 dim: 3 dim: 12 dim: 12 }
    layer { name: "conv" type: "Convolution" bottom: "data" top: "c"
            convolution_param { num_output: 8 kernel_size: 3 pad: 1
              weight_filler { type: "gaussian" std: 0.3 } } }
    layer { name: "bn" type: "BatchNorm" bottom: "c" top: "c" }
    layer { name: "sc" type: "Scale" bottom: "c" top: "c"
            scale_param { bias_term: true } }
    layer { name: "relu" type: "ReLU" bottom: "c" top: "c" }
    layer { name: "conv2" type: "Convolution" bottom: "c" top: "d"
            convolution_param { num_output: 4 kernel_size: 1 bias_term: true
              weight_filler { type: "gaussian" std: 0.3 } } }
    layer { name: "gconv" type: "Convolution" bottom: "d" top: "e"
            convolution_param { num_output: 4 kernel_size: 1 group: 2
              weight_filler { type: "gaussian" std: 0.3 } } }
    """
    rng = np.random.RandomState(0)
    net = Net(text_format.parse(proto), phase="TEST", compute_dtype=None)
    x = (rng.randn(2, 3, 12, 12) * 2).astype(np.float32)
    ref = net.forward(data=x)
    net.fold_bn()
    # min_in_channels=0 quantizes even the 3-channel stem conv; the default
    # (8) keeps it float — the bf16-stem rule, covered in test_graph_serving
    n = net.quantize_int8(min_in_channels=0, data=x)
    assert n == 2  # conv + conv2; gconv is grouped -> stays float
    assert set(net.params["conv"]) == {"w_q", "w_scale", "b", "act_scale"}
    assert net.params["conv"]["w_q"].dtype == jnp.int8
    assert "w" in net.params["gconv"]
    out = net.forward(data=x)
    # int8 absmax quantization on a 2-conv stack: a few percent of range
    scale_c = np.abs(ref["c"]).max()
    scale_e = np.abs(ref["e"]).max()
    assert np.abs(out["c"] - ref["c"]).max() < 0.05 * scale_c
    assert np.abs(out["e"] - ref["e"]).max() < 0.10 * scale_e


PDOWN_PROTO = """
name: "pdown"
input: "data"
input_shape { dim: 4 dim: 8 }
input: "target"
input_shape { dim: 4 dim: 6 }
layer { name: "ip_a" type: "InnerProduct" bottom: "data" top: "fa"
  inner_product_param { num_output: 6 weight_filler { type: "xavier" } } }
layer { name: "ip_b" type: "InnerProduct" bottom: "data" top: "fb"
  inner_product_param { num_output: 6 weight_filler { type: "xavier" } } }
layer { name: "sum" type: "Eltwise" bottom: "fa" bottom: "fb" top: "s"
  propagate_down: true propagate_down: false }
layer { name: "loss" type: "EuclideanLoss" bottom: "s" bottom: "target" top: "loss" }
"""


def test_propagate_down_blocks_branch_gradients():
    """`propagate_down: false` on a bottom must stop backprop into that
    branch (reference: LayerParameter.propagate_down, net.cpp backward
    scheduling) while leaving the forward and the other branch intact."""
    import jax

    net = Net(text_format.parse(PDOWN_PROTO), phase="TRAIN", compute_dtype=None)
    rng = np.random.RandomState(0)
    inputs = {"data": jnp.asarray(rng.randn(4, 8), jnp.float32),
              "target": jnp.asarray(rng.randn(4, 6), jnp.float32)}

    def loss_fn(params):
        return net.total_loss(net._execute(params, inputs))

    g = jax.grad(loss_fn)(net.params)
    ga = float(np.abs(np.asarray(g["ip_a"]["w"])).sum())
    gb = float(np.abs(np.asarray(g["ip_b"]["w"])).sum())
    assert ga > 0
    assert gb == 0.0  # branch b is gradient-isolated


def test_maxpool_dropout_interplay():
    """test_maxpool_dropout_layers.cpp TestForward: ones through maxpool stay
    ones; in-place TRAIN dropout bounds the sum by count*scale and TEST
    dropout is identity."""
    proto = """
    name: "mpd"
    input: "data" input_shape { dim: 2 dim: 2 dim: 7 dim: 7 }
    layer { name: "p" type: "Pooling" bottom: "data" top: "p"
      pooling_param { kernel_size: 3 stride: 2 } }
    layer { name: "d" type: "Dropout" bottom: "p" top: "p"
      dropout_param { dropout_ratio: 0.5 } }
    """
    ones = np.ones((2, 2, 7, 7), np.float32)
    test_net = Net(text_format.parse(proto), phase="TEST", compute_dtype=None)
    out = np.asarray(test_net.forward(data=ones)["p"])
    assert out.size == 2 * 2 * 3 * 3
    np.testing.assert_allclose(out, 1.0)  # maxpool of ones; TEST dropout = id

    train_net = Net(text_format.parse(proto), phase="TRAIN", compute_dtype=None)
    blobs = train_net._execute(train_net.params,
                               {"data": jnp.asarray(ones)},
                               rng=jax.random.PRNGKey(3))
    got = np.asarray(blobs["p"])
    scale = 1.0 / (1.0 - 0.5)
    vals = set(np.unique(got).tolist())
    assert vals <= {0.0, scale}  # inverted scaling: kept units * 1/(1-r)
    assert 0.0 < got.sum() <= got.size * scale


def test_shared_weight_gradients_sum_over_declaring_layers():
    """test_net.cpp TestSharedWeightsUpdate: layers sharing a named param
    accumulate BOTH layers' gradients into the single owner array."""
    net = Net(text_format.parse(SHARED_PROTO + """
layer { name: "sum" type: "Eltwise" bottom: "fa" bottom: "fb" top: "s" }
layer { name: "loss" type: "Reduction" bottom: "s" top: "loss" loss_weight: 1.0 }
"""), phase="TRAIN", compute_dtype=None)
    rng = np.random.RandomState(0)
    a = rng.randn(4, 8).astype(np.float32)
    b = rng.randn(4, 8).astype(np.float32)
    inputs = {"a": jnp.asarray(a), "b": jnp.asarray(b)}
    g = jax.grad(lambda p: net.total_loss(net._execute(p, inputs)))(net.params)
    # d/dW sum(a@W.T + b@W.T) = column-sums of (a + b), at the OWNER entry
    expected = np.tile((a + b).sum(axis=0), (6, 1))
    np.testing.assert_allclose(np.asarray(g["ip_a"]["w"]), expected, rtol=1e-5)
    # the single owner array holds the summed gradient; the aliasing layer
    # has no parameter entry of its own (resolved via net._aliases)
    assert "ip_b" in net._aliases and "w" in net._aliases["ip_b"]
    assert net._aliases["ip_b"]["w"] == ("ip_a", "w")
