"""End-to-end pose `caffe train` path: window file on disk -> prototxt
PoseData layer config -> PoseDataSource -> PoseSolver, plus HDF5 weight
interchange. Uses a tiny model (the CLI's ResNet depth knob covers the real
one; the wiring is identical)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepcut_tpu.data.window_file import ImageRecord, Person, write_window_file
from deepcut_tpu.proto import text_format
from deepcut_tpu.models.resnet import DeeperCutConfig
from deepcut_tpu.solver.solver import SolverParams, PoseSolver
from deepcut_tpu.data.pipeline import PoseDataSource, Prefetcher

TINY = DeeperCutConfig(depths=(1, 1, 1, 1), stage_widths=(4, 4, 8, 8),
                       num_joints=14, pairwise=False, compute_dtype=jnp.float32)


def _make_dataset(tmp_path, n=3):
    rng = np.random.RandomState(0)
    recs = []
    from PIL import Image
    for i in range(n):
        h, w = 120, 140
        img = rng.randint(0, 255, (h, w, 3), np.uint8)
        path = str(tmp_path / f"im{i}.png")
        Image.fromarray(img).save(path)
        k = rng.randint(8, 14)
        classes = (rng.permutation(14)[:k] + 1).astype(np.int32)
        xy = np.stack([rng.uniform(10, w - 10, k),
                       rng.uniform(10, h - 10, k)], 1).astype(np.float32)
        recs.append(ImageRecord(path, 3, h, w, [Person(classes, xy)]))
    index = str(tmp_path / "train_index.txt")
    write_window_file(index, recs)
    return index


def test_pose_train_from_prototxt_config(tmp_path):
    from deepcut_tpu.tools.cli import _target_config_from_layer
    from deepcut_tpu.core.graph import LayerSpec

    index = _make_dataset(tmp_path)
    with open("/root/repo/examples/pose/pose_train.prototxt") as f:
        proto = text_format.parse(
            f.read().replace("examples/pose/train_index.txt", index))
    data_layer = next(l for l in proto.get_list("layer")
                      if l.get_str("type") == "PoseData")
    tcfg, pp = _target_config_from_layer(data_layer)
    assert tcfg.soft_labels and tcfg.no_bg_class and tcfg.weight_targets
    assert tcfg.scale == pytest.approx(0.8452830189)
    assert tcfg.scale_jitter_lo == pytest.approx(0.85)

    source = PoseDataSource(pp.get_str("source"), tcfg,
                            cycle=pp.get_bool("cycle_training_data", False),
                            bucket_step=32)
    sp = SolverParams(
        config=SolverParams.from_prototxt(
            open("/root/repo/examples/pose/pose_solver.prototxt").read()).config,
        max_iter=3, display=0, snapshot=0,
        snapshot_prefix=str(tmp_path / "snap"))
    # tame the real schedule for a 3-iter smoke (keep the multistep policy)
    import dataclasses
    sp = dataclasses.replace(
        sp, config=dataclasses.replace(sp.config, base_lr=1e-4, clip_gradients=1.0))
    prefetch = Prefetcher(lambda: source.next_batch(1), depth=2)
    try:
        solver = PoseSolver(sp, TINY, prefetch.get, handle_signals=False,
                            log=lambda *_: None)
        solver.step(3)
        assert solver.iter == 3
        loss = solver._loss_window[-1]
        assert np.isfinite(loss) and loss > 0
    finally:
        prefetch.stop()


def test_hdf5_weight_interchange(tmp_path):
    from deepcut_tpu.models.resnet import init_params
    from deepcut_tpu.proto.caffemodel import (
        save_hdf5_weights, load_caffemodel, blobs_to_params,
    )

    params = jax.tree_util.tree_map(np.asarray,
                                    init_params(jax.random.PRNGKey(0), TINY))
    path = str(tmp_path / "weights.h5")
    save_hdf5_weights(path, params)
    blobs = load_caffemodel(path)  # extension dispatch
    deconvs = [n for n in blobs if n.startswith("res5c_up_")]
    back = blobs_to_params(blobs, deconv_names=deconvs)
    for name in ("conv1", "res3a_branch2b", "res5c_up_pose", "bn_conv1", "scale_conv1"):
        for key, val in params[name].items():
            np.testing.assert_allclose(back[name][key], np.asarray(val), rtol=1e-6,
                                       err_msg=f"{name}/{key}")


def test_pose_solver_mixed_precision_trains(tmp_path):
    """PoseSolver with mixed_train=True (bf16 conv compute) converges on the
    synthetic pose task like the f32 path."""
    import dataclasses
    import jax.numpy as jnp
    from deepcut_tpu.models.resnet import DeeperCutConfig
    from deepcut_tpu.solver.solver import SolverParams, PoseSolver

    cfg = DeeperCutConfig(depths=(1, 1, 1, 1), stage_widths=(8, 8, 16, 16),
                          num_joints=3, compute_dtype=jnp.bfloat16,
                          mixed_train=True)
    rng = np.random.RandomState(0)
    n, h, w = 2, 32, 32
    hh, ww, J = h // 8, w // 8, cfg.num_joints
    batch = {
        "image": rng.randn(n, h, w, 3).astype(np.float32) * 0.3,
        "part_score_targets": np.zeros((n, hh, ww, J), np.float32),
        "part_score_weights": np.ones((n, hh, ww, J), np.float32),
        "locref_targets": np.zeros((n, hh, ww, 2 * J), np.float32),
        "locref_weights": np.ones((n, hh, ww, 2 * J), np.float32),
        "pairwise_targets": np.zeros((n, hh, ww, cfg.pairwise_channels), np.float32),
        "pairwise_weights": np.ones((n, hh, ww, cfg.pairwise_channels), np.float32),
    }
    batch["part_score_targets"][:, 1, 1, :] = 1.0
    sp = SolverParams.from_prototxt(f"""
        base_lr: 0.02
        momentum: 0.9
        lr_policy: "fixed"
        display: 0
        max_iter: 25
        snapshot: 0
        snapshot_prefix: "{tmp_path}/mp"
    """)
    losses = []
    solver = PoseSolver(sp, cfg, lambda: batch, handle_signals=False,
                        log=lambda *_: None)
    import jax
    for _ in range(25):
        b = {k: jnp.asarray(v) for k, v in batch.items()}
        (loss, _), g = solver._grad_fn(solver.net_params, b)
        g = jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), g)
        solver.net_params, solver.state = solver._update_fn(
            solver.net_params, g, solver.state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.9, losses[::5]
