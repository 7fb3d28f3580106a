"""int8 serving path: numerical closeness to the bf16/f32 reference forward."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepcut_tpu.models.resnet import DeeperCutConfig, init_params, fold_bn, forward
from deepcut_tpu.models.quantize import prepare_int8, forward_int8

TINY = DeeperCutConfig(depths=(1, 1, 1, 1), stage_widths=(8, 8, 16, 16),
                       num_joints=4, pairwise=False, compute_dtype=jnp.float32)


def test_int8_forward_close_to_fp():
    params = init_params(jax.random.PRNGKey(0), TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3)) * 40.0
    qparams, scales = prepare_int8(params, TINY, x)
    ref = forward(fold_bn(params, TINY), x, TINY, folded=True)
    got = forward_int8(qparams, scales, x, TINY)
    assert got["prob"].shape == ref["prob"].shape
    a = np.asarray(ref["fc_pose"], np.float32).reshape(-1)
    b = np.asarray(got["fc_pose"], np.float32).reshape(-1)
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.99, corr
    rel = np.abs(a - b).mean() / (np.abs(a).mean() + 1e-6)
    assert rel < 0.1, rel


def test_weight_quantization_roundtrip():
    from deepcut_tpu.models.quantize import quantize_weights

    params = fold_bn(init_params(jax.random.PRNGKey(0), TINY), TINY)
    q = quantize_weights(params)
    entry = q["res2a_branch2a"]
    assert entry["w_q"].dtype == jnp.int8
    w_back = entry["w_q"].astype(jnp.float32) * entry["w_scale"]
    w_orig = np.asarray(params["res2a_branch2a"]["w"])
    rel = np.abs(w_back - w_orig).max() / (np.abs(w_orig).max() + 1e-9)
    # half a quantization step = 0.5/127 ≈ 0.0039: tight enough to fail if
    # quantize ever truncates instead of rounds (full-step error ≈ 0.0079)
    assert rel <= 0.5 / 127 + 1e-6, rel
    # deconv heads stay float
    assert "w" in q["res5c_up_pose"]


def test_int8_resident_stream_close_to_fp():
    """int8_residual=True (block boundaries quantized once, 1-byte stream)
    must stay within the same error envelope as the f32-activation int8
    path; measured 1.50 vs 1.72 ms/img @688 batch4 on v5e."""
    cfg = DeeperCutConfig(depths=(1, 1, 1, 1), stage_widths=(8, 8, 16, 16),
                          num_joints=3, compute_dtype=jnp.float32)
    params = fold_bn(init_params(jax.random.PRNGKey(0), cfg), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3)) * 20
    qp, sc = prepare_int8(params, cfg, x)
    fp = np.asarray(forward(params, x, cfg, folded=True)["prob"])
    q_plain = np.asarray(forward_int8(qp, sc, x, cfg)["prob"])
    q_res = np.asarray(forward_int8(qp, sc, x, cfg, int8_residual=True)["prob"])
    e_plain = np.abs(q_plain - fp).max()
    e_res = np.abs(q_res - fp).max()
    assert e_res < max(2.5 * e_plain, 0.15), (e_res, e_plain)
