"""Sharded train/eval step factories.

One jitted function = the whole reference hot loop (Net::ForwardBackward +
P2PSync reduce + SGDSolver::ApplyUpdate, solver.cpp:193-275): forward, loss,
backward, cross-device gradient reduction (implicit in sharding), and the
Caffe-exact update rule — all fused by XLA over the mesh.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deepcut_tpu.models.resnet import DeeperCutConfig
from deepcut_tpu.models.train import bn_frozen_mults, loss_fn
from deepcut_tpu.solver import update_rules
from deepcut_tpu.parallel.mesh import batch_sharding, replicated


def make_train_step(
    model_cfg: DeeperCutConfig,
    solver_cfg: update_rules.SolverConfig,
    mesh: Optional[Mesh] = None,
    *,
    donate: bool = True,
    target_cfg=None,
    target_stats=None,
):
    """Returns jitted (params, state, batch) -> (params, state, metrics).

    With a mesh: params and optimizer state replicated, batch sharded over
    'data'; when the mesh also has a 'spatial' axis of size > 1, image rows
    are sharded over it and the step runs under jax.shard_map with explicit
    halo exchanges + psum reductions (parallel/spatial.py — bypassing the
    jax-0.9 GSPMD conv-weight-grad bug the canary in tests/test_parallel.py
    watches). Either way the trajectory equals single-device (tested).

    target_cfg (pose.targets.TargetConfig): enables ON-DEVICE target
    rasterization — batches carry compact ``anno_*`` annotation arrays
    (PoseDataSource(device_targets=True)) and the dense target maps are
    built inside this step's XLA program (pose/targets_device.py), instead
    of crossing the host->device boundary (~25 MB/sample for the pairwise
    configuration).
    """
    if getattr(solver_cfg, "iter_size", 1) > 1:
        # update_rules.step divides grads by iter_size (preprocess_grads) on
        # the assumption that the caller ACCUMULATED iter_size micro-batches;
        # this factory takes exactly one batch per call, so iter_size > 1
        # would silently shrink every update by 1/iter_size.
        raise ValueError(
            "parallel.make_train_step takes one batch per call and does not "
            "accumulate; use PoseSolver (host accumulation) or "
            "core.graph.Net.make_train_step (leading iter_size axis + scan) "
            "for iter_size > 1")

    rast = None
    if target_cfg is not None:
        from deepcut_tpu.pose.targets_device import make_batch_rasterizer
        rast = make_batch_rasterizer(target_cfg, target_stats)
    from deepcut_tpu.pose.augment_device import warp_batch

    def train_step(params, state, batch):
        # device-side augmentation (PoseDataSource(augment_device=True)):
        # warp raw uint8 images into the float canvas inside this XLA
        # program; no-op for batches that already carry `image`
        batch = warp_batch(batch)
        if rast is not None:
            batch = rast(batch)  # no-op for dense-target batches
        (total, metrics), grads = jax.value_and_grad(
            lambda p: loss_fn(p, batch, model_cfg), has_aux=True
        )(params)
        # BN statistics are frozen (lr_mult/decay_mult 0, matching the
        # prototxt's param overrides — see models/train.bn_frozen_mults)
        mults = bn_frozen_mults(params)
        params2, state2 = update_rules.step(solver_cfg, params, grads, state,
                                            lr_mults=mults, decay_mults=mults)
        metrics = dict(metrics)
        metrics["lr"] = update_rules.learning_rate(solver_cfg, state["iter"])
        return params2, state2, metrics

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0, 1) if donate else ())

    from deepcut_tpu.parallel.spatial import spatial_axis_size
    if spatial_axis_size(mesh) > 1:
        # 2-D mesh: image rows shard over 'spatial' via the shard_map path
        # with framework-owned halo exchange + psum (parallel/spatial.py).
        # The GSPMD partitioner is NOT used for the sharded train step: jax
        # 0.9 returns conv weight grads scaled by the replicated-axis size
        # under halo exchange (minimal repro:
        # tests/test_parallel.py::test_spatial_sharded_conv_weight_grad_guard,
        # which still canaries the upstream fix).
        from deepcut_tpu.parallel.spatial import make_spatial_train_step
        return make_spatial_train_step(model_cfg, solver_cfg, mesh,
                                       donate=donate, target_cfg=target_cfg,
                                       target_stats=target_stats)

    rep = replicated(mesh)
    bsh = NamedSharding(mesh, P("data"))

    def in_shardings(params, state, batch):
        return (
            jax.tree_util.tree_map(lambda _: rep, params),
            jax.tree_util.tree_map(lambda _: rep, state),
            {k: bsh for k in batch},
        )

    # cache the PjitFunction per (param-structure, batch-key) signature —
    # rebuilding jax.jit + the ~500-leaf sharding pytrees every step costs
    # milliseconds of host time in the training hot loop
    _cache: Dict = {}

    def jitted(params, state, batch):
        key = (jax.tree_util.tree_structure(params),
               jax.tree_util.tree_structure(state),
               tuple(sorted(batch)))
        if key not in _cache:
            shardings = in_shardings(params, state, batch)
            _cache[key] = jax.jit(
                train_step,
                in_shardings=shardings,
                out_shardings=(shardings[0], shardings[1], None),
                donate_argnums=(0, 1) if donate else (),
            )
        return _cache[key](params, state, batch)

    return jitted


def make_eval_step(model_cfg: DeeperCutConfig, mesh: Optional[Mesh] = None, *, folded: bool = True):
    """Sharded inference step: (params, images NHWC) -> outputs dict."""
    from deepcut_tpu.models.resnet import forward

    def eval_step(params, images):
        return forward(params, images, model_cfg, folded=folded)

    if mesh is None:
        return jax.jit(eval_step)
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    # cache the PjitFunction per param structure: a fresh jax.jit wrapper
    # per call would discard the trace/compile cache every eval step (same
    # fix as the train step above)
    _cache: Dict = {}

    def jitted(params, images):
        key = jax.tree_util.tree_structure(params)
        if key not in _cache:
            _cache[key] = jax.jit(
                eval_step,
                in_shardings=(jax.tree_util.tree_map(lambda _: rep, params),
                              bsh),
            )
        return _cache[key](params, images)

    return jitted
