"""Opt-in real-TPU hardware pass: `DEEPCUT_TPU_REAL=1 python -m pytest -m tpu`.

The main suite runs on a virtual CPU platform (numerics are
platform-agnostic; remote TPU compiles are ~10-60 s/shape). These few tests
catch TPU-only regressions — compile failures, Pallas lowering, bf16/int8
numerics — on a small, fixed shape set. Run once per round; results noted in
docs/performance.md.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu


def test_dilated_conv_matches_oracle_on_tpu():
    """The DeeperCut-critical conv geometry (3x3 d2 p2) vs a float64-free
    numpy oracle, compiled for the MXU."""
    from deepcut_tpu.ops.conv import conv2d

    rng = np.random.RandomState(0)
    x = rng.randn(1, 12, 12, 4).astype(np.float32)
    w = rng.randn(3, 3, 4, 6).astype(np.float32)
    got = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w), None,
                            stride=(1, 1), pad=(2, 2), dilation=(2, 2),
                            compute_dtype=None))
    # numpy oracle: explicit dilated correlation
    xp = np.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
    ref = np.zeros_like(got)
    for i in range(12):
        for j in range(12):
            for kh in range(3):
                for kw in range(3):
                    ref[0, i, j] += xp[0, i + 2 * kh, j + 2 * kw] @ w[kh, kw]
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_pallas_joint_argmax_compiled():
    """The Pallas kernel lowered for real TPU (the CPU suite only covers
    interpret mode) must agree with the XLA reduction."""
    from deepcut_tpu.ops.pallas_decode import joint_argmax

    rng = np.random.RandomState(1)
    sm = rng.randn(86, 86, 14).astype(np.float32)
    maxv, idx = joint_argmax(jnp.asarray(sm), interpret=False)
    flat = sm.reshape(-1, 14)
    np.testing.assert_allclose(np.asarray(maxv), flat.max(axis=0), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(idx), flat.argmax(axis=0))


def test_pallas_decode_matches_xla_decode():
    from deepcut_tpu.ops.pallas_decode import decode_pose_pallas
    from deepcut_tpu.pose.decode import decode_pose

    rng = np.random.RandomState(2)
    sm = rng.rand(43, 43, 14).astype(np.float32)
    loc = rng.randn(43, 43, 28).astype(np.float32)
    a = np.asarray(decode_pose_pallas(jnp.asarray(sm), jnp.asarray(loc),
                                      scale=1.0, interpret=False))
    b = np.asarray(decode_pose(jnp.asarray(sm), jnp.asarray(loc), scale=1.0))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_flagship_bf16_forward_688():
    """One full DeeperCut ResNet-152 bf16 forward at the benchmark shape:
    compiles, runs, finite outputs, prob in [0,1]."""
    import __graft_entry__ as g

    fn, (params, x) = g.entry()
    out = jax.jit(fn)(params, x)
    jax.block_until_ready(out)
    prob = np.asarray(out["prob"], np.float32)
    assert prob.shape == (1, 86, 86, 14)
    assert np.isfinite(prob).all() and prob.min() >= 0 and prob.max() <= 1
    assert np.isfinite(np.asarray(out["loc_pred"], np.float32)).all()


def test_int8_path_close_to_fp_on_tpu():
    from deepcut_tpu.models.resnet import DeeperCutConfig, init_params, fold_bn, forward
    from deepcut_tpu.models.quantize import prepare_int8, forward_int8

    cfg = DeeperCutConfig(depths=(1, 1, 1, 1), stage_widths=(8, 8, 16, 16),
                          num_joints=3, compute_dtype=jnp.bfloat16)
    params = fold_bn(init_params(jax.random.PRNGKey(0), cfg), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3)) * 20
    qparams, act_scales = prepare_int8(params, cfg, x)
    fp = np.asarray(forward(params, x, cfg, folded=True)["prob"], np.float32)
    q = np.asarray(forward_int8(qparams, act_scales, x, cfg)["prob"], np.float32)
    # random msra weights + absmax calibration give a loose bound; with the
    # bf16 inter-conv stream a stray cell can deviate ~0.16 on `prob`
    # (trained weights quantize far tighter)
    np.testing.assert_allclose(q, fp, atol=0.2)
    assert np.abs(q - fp).mean() < 0.02


def test_graph_engine_small_net_on_tpu():
    """The prototxt DAG executor end-to-end on hardware (bf16 default)."""
    from deepcut_tpu.core.graph import Net
    from deepcut_tpu.proto import text_format

    proto = text_format.parse("""
        input: "data"
        input_shape { dim: 1 dim: 3 dim: 16 dim: 16 }
        layer { name: "c" type: "Convolution" bottom: "data" top: "c"
                convolution_param { num_output: 8 kernel_size: 3 pad: 1
                  weight_filler { type: "msra" } } }
        layer { name: "r" type: "ReLU" bottom: "c" top: "c" }
        layer { name: "p" type: "Pooling" bottom: "c" top: "p"
                pooling_param { kernel_size: 2 stride: 2 } }
        layer { name: "s" type: "Sigmoid" bottom: "p" top: "s" }
        """)
    net = Net(proto)
    out = net.forward(data=np.random.RandomState(0).randn(1, 3, 16, 16)
                      .astype(np.float32))
    assert out["s"].shape == (1, 8, 8, 8)
    s = out["s"].astype(np.float32)
    assert np.isfinite(s).all() and s.min() >= 0 and s.max() <= 1


def test_train_step_on_tpu_reduces_loss():
    """Autodiff + Caffe-SGD through the jitted graph ON HARDWARE (the CPU
    suite covers numerics; this catches TPU-only backward/update compile
    regressions). Tiny shapes keep the remote compile quick."""
    from deepcut_tpu.core.graph import Net
    from deepcut_tpu.proto import text_format
    from deepcut_tpu.solver.update_rules import SolverConfig

    proto = text_format.parse("""
        input: "data" input_shape { dim: 8 dim: 6 }
        input: "label" input_shape { dim: 8 }
        layer { name: "ip" type: "InnerProduct" bottom: "data" top: "ip"
          inner_product_param { num_output: 4
            weight_filler { type: "xavier" } } }
        layer { name: "loss" type: "SoftmaxWithLoss" bottom: "ip"
          bottom: "label" top: "loss" }
        """)
    from deepcut_tpu.solver.update_rules import init_state

    net = Net(proto, phase="TRAIN", compute_dtype=None)
    cfg = SolverConfig(solver_type="SGD", base_lr=0.2, momentum=0.9,
                       weight_decay=0.0)
    step = net.make_train_step(cfg)
    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.randn(8, 6), jnp.float32)
    label = jnp.asarray(rng.randint(0, 4, (8,)), jnp.float32)
    params, state = net.params, init_state(cfg, net.params)
    losses = []
    for _ in range(12):
        params, state, loss = step(params, state,
                                   {"data": data, "label": label})
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, losses


def test_pose_estimator_end_to_end_on_tpu():
    """PoseEstimator smoke on hardware: uint8 frame -> canvas preprocess ->
    forward -> fused decode, small bucket so the compile stays fast."""
    from deepcut_tpu.pose.estimate import PoseEstimator
    from deepcut_tpu.models.resnet import DeeperCutConfig, init_params, fold_bn

    cfg = DeeperCutConfig(depths=(1, 1, 1, 1), stage_widths=(8, 8, 16, 16),
                          num_joints=4)
    params = init_params(jax.random.PRNGKey(0), cfg)
    est = PoseEstimator(params, cfg, bucket_step=64, max_size=256)
    img = (np.random.RandomState(0).rand(96, 128, 3) * 255).astype(np.uint8)
    pose = est.estimate_pose(img, scales=(1.0,))
    assert pose.shape == (5, 4)
    assert np.isfinite(np.asarray(pose)).all()
