"""DeeperCut model: shape contracts + BN-folding numerical equivalence.

Uses a tiny config (1 block/stage) so the CPU test stays fast; the geometry
(stride-8 grid, crop alignment, head channel counts) is depth-independent.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepcut_tpu.models.resnet import (
    DeeperCutConfig, deepercut_config, init_params, fold_bn, forward,
)

TINY = DeeperCutConfig(
    depths=(1, 1, 1, 1), stage_widths=(4, 4, 8, 8), num_joints=3,
    compute_dtype=jnp.float32,
)


def _rand_params(cfg, seed=0):
    params = init_params(jax.random.PRNGKey(seed), cfg)
    # Perturb BN/Scale away from identity so folding is actually exercised.
    k = jax.random.PRNGKey(seed + 1)
    out = {}
    for name, p in params.items():
        q = dict(p)
        if name.startswith("bn"):
            k, k1, k2 = jax.random.split(k, 3)
            q["mean"] = 0.1 * jax.random.normal(k1, p["mean"].shape)
            q["var"] = 1.0 + 0.5 * jax.random.uniform(k2, p["var"].shape)
            q["scale_factor"] = jnp.full((1,), 0.999)
        if name.startswith("scale"):
            k, k1, k2 = jax.random.split(k, 3)
            q["gamma"] = 1.0 + 0.2 * jax.random.normal(k1, p["gamma"].shape)
            q["beta"] = 0.1 * jax.random.normal(k2, p["beta"].shape)
        out[name] = q
    return out


def test_output_shapes_stride8():
    cfg = TINY
    params = _rand_params(cfg)
    x = jnp.zeros((1, 64, 64, 3))
    outs = forward(params, x, cfg)
    # 64 -> conv1 32 -> pool 16 -> res3 8 -> res4 4 -> deconv 9 -> crop to 8.
    assert outs["prob"].shape == (1, 8, 8, 3)
    assert outs["loc_pred"].shape == (1, 8, 8, 6)
    assert outs["next_pred"].shape == (1, 8, 8, 12)
    assert np.all(np.asarray(outs["prob"]) >= 0)
    assert np.all(np.asarray(outs["prob"]) <= 1)


def test_nonmultiple_of_8_grid():
    cfg = TINY
    params = _rand_params(cfg)
    outs = forward(params, jnp.zeros((1, 72, 48, 3)), cfg)
    assert outs["prob"].shape == (1, 9, 6, 3)


def test_fold_bn_equivalence():
    cfg = TINY
    params = _rand_params(cfg)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 40, 40, 3))
    ref = forward(params, x, cfg, folded=False)
    fast = forward(fold_bn(params, cfg), x, cfg, folded=True)
    np.testing.assert_allclose(
        np.asarray(ref["fc_pose"]), np.asarray(fast["fc_pose"]), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(ref["loc_pred"]), np.asarray(fast["loc_pred"]), rtol=2e-4, atol=2e-4
    )


def test_resnet152_param_names_match_prototxt():
    """Param pytree must use the exact Caffe layer names from the reference
    prototxt (models/deepercut/ResNet-152.prototxt) for 1:1 weight import."""
    cfg = deepercut_config(152)
    params = init_params(jax.random.PRNGKey(0), cfg)
    for name in [
        "conv1", "bn_conv1", "scale_conv1",
        "res2a_branch1", "bn2a_branch1", "scale2a_branch1",
        "res2c_branch2c", "res3b7_branch2b", "res4b35_branch2c",
        "res5a_branch1", "res5c_branch2b", "bn5c_branch2c", "scale5c_branch2c",
        "res5c_up_pose", "res3d_pose", "res5c_up_locref", "res3d_locref",
        "res5c_up_next", "res3d_next",
    ]:
        assert name in params, name
    # ResNet-152 block count: (3 + 8 + 36 + 3) blocks x 3 convs + 4 branch1 + conv1
    convs = [n for n in params if n.startswith("res") and "branch" in n]
    assert len(convs) == (3 + 8 + 36 + 3) * 3 + 4
    assert params["res5c_up_next"]["w"].shape == (3, 3, 2048, 364)
    assert params["res3d_locref"]["w"].shape == (1, 1, 512, 28)


def test_grad_flows():
    cfg = TINY
    params = _rand_params(cfg)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 32, 32, 3))

    def loss(p):
        return jnp.sum(forward(p, x, cfg)["fc_pose"] ** 2)

    g = jax.grad(loss)(params)
    gnorm = jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(jnp.abs(b)), g, 0.0
    )
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0


def test_remat_forward_and_grads_equal():
    """cfg.remat=True (jax.checkpoint per residual block) must not change
    forward values or gradients — only the memory/FLOPs trade."""
    import dataclasses

    cfg = TINY
    cfg_r = dataclasses.replace(cfg, remat=True)
    params = _rand_params(cfg)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 32, 32, 3))
    a = forward(params, x, cfg)
    b = forward(params, x, cfg_r)
    np.testing.assert_allclose(np.asarray(a["fc_pose"]), np.asarray(b["fc_pose"]),
                               rtol=1e-6, atol=1e-6)

    def loss(p, c):
        return jnp.sum(forward(p, x, c)["fc_pose"] ** 2)

    ga = jax.grad(lambda p: loss(p, cfg))(params)
    gb = jax.grad(lambda p: loss(p, cfg_r))(params)
    for name in ga:
        for k in ga[name]:
            np.testing.assert_allclose(np.asarray(ga[name][k]),
                                       np.asarray(gb[name][k]),
                                       rtol=1e-5, atol=1e-6)


def test_mixed_train_grads_close_to_f32():
    """mixed_train=True (bf16 conv compute, f32 params/losses) must produce
    gradients within bf16 tolerance of the f32 path, and the heads/losses
    must stay f32."""
    import dataclasses

    cfg = TINY
    cfg_m = dataclasses.replace(cfg, compute_dtype=jnp.bfloat16, mixed_train=True)
    params = _rand_params(cfg)
    x = jax.random.normal(jax.random.PRNGKey(9), (2, 32, 32, 3)) * 0.5

    def loss(p, c):
        outs = forward(p, x, c, folded=False)
        assert outs["fc_pose"].dtype == jnp.float32
        return jnp.mean(outs["fc_pose"] ** 2)

    gf = jax.grad(lambda p: loss(p, cfg))(params)
    gm = jax.grad(lambda p: loss(p, cfg_m))(params)
    # bf16-appropriate tolerances; note the CPU backend rounds every conv
    # output to bf16 with no f32 internal accumulation, so this OVERSTATES
    # the deviation vs real TPU MXU behavior. conv1 (earliest layer, longest
    # backward chain) accumulates the most rounding.
    for name, tol in (("conv1", 0.2), ("res2a_branch2b", 0.05),
                      ("res5c_up_pose", 0.05)):
        a, b = np.asarray(gf[name]["w"]), np.asarray(gm[name]["w"])
        scale = np.abs(a).max() + 1e-12
        assert np.abs(a - b).max() < tol * scale, (name, np.abs(a - b).max() / scale)


def test_truncated_prefix_configs_run():
    """Profiling prefix configs (stage depths zeroed) must run through
    run_trunk without a skip tap: _skip_block is None when stage 3 is empty
    (benchmarks/train_backward_ladder.py builds stem/res2-only prefixes).
    Regression: round-5 IndexError in _skip_block for depths=(0,0,0,0)."""
    import dataclasses
    import functools

    from deepcut_tpu.models.resnet import prepare_input, run_trunk
    from deepcut_tpu.ops.conv import conv2d
    from deepcut_tpu.ops.pool import max_pool2d

    x = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 3)) * 30.0
    for depths, want_skip in (((0, 0, 0, 0), False), ((1, 0, 0, 0), False),
                              ((1, 1, 0, 0), True), ((1, 1, 1, 1), True)):
        cfg = dataclasses.replace(TINY, depths=depths)
        params = {k: v for k, v in init_params(jax.random.PRNGKey(0), cfg).items()
                  if not (k.startswith("res5c_up_") or k.startswith("res3d_"))}
        conv_fn = functools.partial(conv2d, compute_dtype=cfg.compute_dtype)
        y, skip = run_trunk(params, prepare_input(x), cfg, conv_fn=conv_fn,
                            pool_fn=lambda t: max_pool2d(t, kernel=3, stride=2),
                            folded=False)
        assert y.ndim == 4
        assert (skip is not None) == want_skip, depths
