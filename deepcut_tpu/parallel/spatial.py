"""Spatially-sharded DeeperCut TRAINING via jax.shard_map.

Why this exists: jax 0.9's GSPMD partitioner returns conv WEIGHT gradients
scaled by the replicated-axis size whenever halo exchange is involved
(found, guarded, and canaried in round 2 —
tests/test_parallel.py::test_spatial_sharded_conv_weight_grad_guard). This
module bypasses the partitioner entirely: the framework owns the halo
exchanges and gradient reductions explicitly, the TPU-native analog of the
reduction P2PSync hand-built when its compiler couldn't
(reference: src/caffe/parallel.cpp:286-380).

Design (validated against the single-device step in
tests/test_parallel.py::test_2d_mesh_SPATIAL_train_step_matches_single_device):

- the trunk (conv1 .. res5c) runs with image rows sharded over the
  'spatial' mesh axis; every spatial conv/pool fetches its halo rows from
  neighbours with `lax.ppermute` before a purely LOCAL convolution. Under
  autodiff ppermute transposes to the reverse ppermute, so halo-row
  cotangents flow back to their producing shard automatically.
- at the trunk taps (res5c, H/16 rows; skip, H/8 rows) the activations are
  `all_gather`ed over 'spatial' and the deconv heads + losses run on the
  full grid, replicated within each data row. Heads are <1% of trunk
  FLOPs; the memory-heavy early stages stay sharded.
- the losses use the psum'ed-normaliser custom_vjp variants
  (ops/losses.py make_*_loss(psum_axes=('data',))): error sums and
  normalisers reduce over the 'data' axis, so the loss VALUE equals the
  single-device loss exactly (fork max(.,100) clamps included).
- per-device weight-gradient contributions are `psum`med over BOTH mesh
  axes and divided by the spatial axis size: the all_gather transpose
  (reduce-scatter of replicated cotangents) and the replicated head
  compute each inflate by exactly n_spatial, uniformly across all
  parameters — the division restores the true gradient. With the raw
  psums kept OUT of the differentiated region (custom_vjp) there is no
  psum-transposes-to-psum inflation anywhere else.

Shape contract: global image H divisible by 16 * n_spatial (every stage's
row count then splits evenly: H/2, H/4, H/8, H/16) and H >= 32 * n_spatial
(the res5 dilated 3x3 needs a 2-row halo). The pose pipeline's canvas
bucketing already rounds sizes; training canvases just use a
16*n_spatial-aligned bucket.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from deepcut_tpu.models.resnet import (
    DeeperCutConfig, compute_heads, prepare_input, run_trunk)
from deepcut_tpu.ops.conv import conv2d
from deepcut_tpu.ops import losses as loss_ops
from deepcut_tpu.pose.augment_device import warp_batch_local
from deepcut_tpu.solver import update_rules


def halo_exchange(x: jax.Array, top: int, bottom: int, axis: str,
                  *, bottom_fill: Optional[float] = None) -> jax.Array:
    """Concatenate neighbour rows onto a row-sharded (N, Hl, W, C) block.

    top rows come from the previous shard (the first shard receives zeros —
    ppermute's missing-source semantics — which IS the conv zero padding);
    bottom rows from the next shard (last shard: zeros, or `bottom_fill`
    for ops whose virtual padding is not 0, e.g. -inf for ceil-mode
    maxpool)."""
    n = lax.axis_size(axis)
    parts = []
    if top > 0:
        parts.append(lax.ppermute(x[:, -top:], axis,
                                  [(i, i + 1) for i in range(n - 1)]))
    parts.append(x)
    if bottom > 0:
        b = lax.ppermute(x[:, :bottom], axis,
                         [(i + 1, i) for i in range(n - 1)])
        if bottom_fill is not None:
            b = jnp.where(lax.axis_index(axis) == n - 1,
                          jnp.full_like(b, bottom_fill), b)
        parts.append(b)
    if len(parts) == 1:
        return x
    return jnp.concatenate(parts, axis=1)


def spatial_conv2d(x, w, b=None, *, stride=1, pad=0, dilation=1,
                   groups: int = 1, axis: str = "spatial",
                   compute_dtype=None, accum_dtype=jnp.float32):
    """conv2d with the H dim sharded over `axis`: halo rows (top=pad_h,
    bottom=k_eff-pad_h-stride_h) are exchanged, then the conv runs locally
    with H padding 0 (the halos ARE the padding) and normal W padding.
    Requires the local row count divisible by the stride and >= the halo
    depth. stride/pad/dilation accept (h, w) pairs like ops/conv.conv2d."""
    def _pair(v):
        return (int(v[0]), int(v[-1])) if isinstance(v, (tuple, list)) else (int(v), int(v))
    sh, sw = _pair(stride)
    ph, pw = _pair(pad)
    dh, dw = _pair(dilation)
    kh = int(w.shape[0])
    k_eff = dh * (kh - 1) + 1
    bottom = k_eff - ph - sh
    if ph > 0 or bottom > 0:
        x = halo_exchange(x, ph, max(bottom, 0), axis)
    return conv2d(x, w, b, stride=(sh, sw), pad=(0, pw), dilation=(dh, dw),
                  groups=groups, compute_dtype=compute_dtype,
                  accum_dtype=accum_dtype)


def spatial_max_pool(x, *, kernel=3, stride=2, axis: str = "spatial"):
    """Ceil-mode unpadded MAX pool with H sharded: the bottom halo is
    kernel_h - stride_h rows, -inf on the last shard (Caffe's clipped edge
    window). The W axis reuses ops/pool's ceil-mode arithmetic so Caffe's
    sizing quirks live in exactly one place. kernel/stride accept (h, w)
    pairs."""
    from deepcut_tpu.ops.pool import pool_output_size

    def _pair(v):
        return (int(v[0]), int(v[-1])) if isinstance(v, (tuple, list)) else (int(v), int(v))
    kh, kw = _pair(kernel)
    sh, sw = _pair(stride)
    if kh > sh:
        x = halo_exchange(x, 0, kh - sh, axis, bottom_fill=-jnp.inf)
    w = int(x.shape[2])
    ow = pool_output_size(w, kw, sw, 0)
    pad_w = max((ow - 1) * sw + kw - w, 0)
    neg = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return lax.reduce_window(
        x, neg, lax.max,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, sh, sw, 1),
        padding=((0, 0), (0, 0), (0, pad_w), (0, 0)))


def _check_no_fast_semantics(cfg) -> None:
    """Loud capability guard shared by every spatial entry point."""
    if getattr(cfg, "fast_semantics", False):
        raise ValueError(
            "fast_semantics is a single-device/data-parallel training lever; "
            "its s2d conv1 and eq-mask pool are not implemented for the "
            "spatial halo-exchange path — drop the flag or spatial=1")


def _canvas_hw(batch) -> Tuple[int, int]:
    """Global canvas (H, W): from the image for host-warped batches, from
    the zero-byte aug_canvas shape token for augment_device batches (the
    canvas only materializes inside the device warp)."""
    key = "aug_canvas" if "aug_canvas" in batch else "image"
    return int(batch[key].shape[1]), int(batch[key].shape[2])


def _batch_size(batch) -> int:
    key = "image_raw" if "image_raw" in batch else "image"
    return int(batch[key].shape[0])


def _batch_spec(batch, img, dp):
    """shard_map in_specs for a training batch: canvas rows (real or the
    shape token) shard over ('data','spatial'); everything else — targets,
    annotations, raw images + warp coefficients — shards over 'data' only.
    Raw images stay spatial-REPLICATED so each shard can warp its own
    canvas row block from the full source (pose/augment_device.
    warp_batch_local — no halos, warp cost divides by the axis size)."""
    return {k: (img if k in ("image", "aug_canvas") else dp) for k in batch}


def spatial_forward(params, x_local, cfg: DeeperCutConfig,
                    *, axis: str = "spatial") -> Dict[str, jax.Array]:
    """The training forward under shard_map: row-sharded trunk, gathered
    full-grid heads. Semantically equal to models.resnet.forward(...,
    folded=False) — same run_trunk/compute_heads code, halo conv ops."""
    _check_no_fast_semantics(cfg)
    cdt = cfg.compute_dtype if cfg.mixed_train else None
    acc = None if cfg.mixed_train else jnp.float32
    x_local = prepare_input(x_local)  # uint8 canvases: -mean on device
    res5c, skip = run_trunk(
        params, x_local, cfg,
        conv_fn=functools.partial(spatial_conv2d, axis=axis,
                                  compute_dtype=cdt, accum_dtype=acc),
        pool_fn=lambda y: spatial_max_pool(y, kernel=3, stride=2, axis=axis),
        folded=False,
    )
    res5c = lax.all_gather(res5c, axis, axis=1, tiled=True)
    skip = lax.all_gather(skip, axis, axis=1, tiled=True)
    return compute_heads(params, res5c, skip, cfg, compute_dtype=cdt,
                         accum_dtype=acc)


def sharded_pose_loss(outputs, batch, cfg: DeeperCutConfig,
                      *, psum_axes=("data",)):
    """models.train.pose_loss with globally-psum'ed normalisers (the
    shard_map twin; see that docstring for the loss wiring)."""
    ce = loss_ops.make_softmax_loss_vec(cross_entropy=True,
                                        psum_axes=psum_axes)
    sl1 = loss_ops.make_smooth_l1_loss(psum_axes=psum_axes)
    losses = {}
    losses["part_loss"] = ce(outputs["fc_pose"], batch["part_score_targets"],
                             batch.get("part_score_weights"))
    total = losses["part_loss"]
    if cfg.location_refinement and "locref_targets" in batch:
        losses["locref_loss"] = sl1(outputs["loc_pred"],
                                    batch["locref_targets"],
                                    batch.get("locref_weights"))
        total = total + losses["locref_loss"]
    if cfg.pairwise and "pairwise_targets" in batch:
        losses["pairwise_loss"] = sl1(outputs["next_pred"],
                                      batch["pairwise_targets"],
                                      batch.get("pairwise_weights"))
        total = total + losses["pairwise_loss"]
    losses["total_loss"] = total
    return total, losses


def check_spatial_shapes(h: int, n: int, mesh: Mesh) -> None:
    """Host-side validation of the shape contract (clear errors beat XLA
    shape mismatches three collectives deep)."""
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    nsp = sizes.get("spatial", 1)
    nd = sizes.get("data", 1)
    if n % nd:
        raise ValueError(f"spatial train step: batch {n} not divisible by "
                         f"data axis {nd}")
    if h % (16 * nsp):
        raise ValueError(
            f"spatial train step: image H={h} must be divisible by "
            f"16*n_spatial={16 * nsp} so every trunk stage splits evenly "
            "(pad the canvas to the next multiple)")
    if h < 32 * nsp:
        raise ValueError(
            f"spatial train step: image H={h} too small for spatial={nsp} "
            f"(res5's dilated 3x3 needs a 2-row halo; H >= {32 * nsp})")


def spatial_axis_size(mesh: Mesh) -> int:
    """Size of the mesh's 'spatial' axis (1 when absent)."""
    return dict(zip(mesh.axis_names, mesh.devices.shape)).get("spatial", 1)


def _target_rasterizer(target_cfg, target_stats, batch):
    """Device rasterizer for the spatial paths: targets are data-sharded
    only (every spatial shard holds full-grid maps), so the grid is the
    GLOBAL canvas's stride-8 grid, passed explicitly — inside shard_map the
    local image shard is 1/nsp of it."""
    if target_cfg is None:
        return None
    from deepcut_tpu.pose.targets_device import make_batch_rasterizer
    gh, gw = (d // 8 for d in _canvas_hw(batch))
    return make_batch_rasterizer(target_cfg, target_stats, grid=(gh, gw))


def make_spatial_value_and_grad(model_cfg: DeeperCutConfig, mesh: Mesh,
                                target_cfg=None, target_stats=None):
    """Cached-jitted ((loss, metrics), grads) over the 2-D mesh — the
    gradient half of the spatial step, shared by PoseSolver (which applies
    updates separately so host-side iter_size accumulation keeps working)
    and usable standalone. make_spatial_train_step fuses grad+update into
    one shard_map program instead (donation + fusion for the hot loop).
    target_cfg: on-device rasterization of compact `anno_*` batches
    (pose/targets_device.py)."""
    _check_no_fast_semantics(model_cfg)
    nsp = spatial_axis_size(mesh)

    def make_local_vg(rast):
        def local_vg(params, batch):
            batch = warp_batch_local(batch)  # no-op without image_raw
            if rast is not None:
                batch = rast(batch)

            def local_loss(p):
                outs = spatial_forward(p, batch["image"], model_cfg)
                return sharded_pose_loss(outs, batch, model_cfg,
                                         psum_axes=("data",))
            (loss, metrics), g = jax.value_and_grad(
                local_loss, has_aux=True)(params)
            g = jax.tree_util.tree_map(
                lambda a: lax.psum(a, ("data", "spatial")) / nsp, g)
            return (loss, metrics), g
        return local_vg

    rep, img, dp = P(), P("data", "spatial"), P("data")
    _cache: Dict = {}

    def vg(params, batch):
        check_spatial_shapes(_canvas_hw(batch)[0], _batch_size(batch), mesh)
        key = (jax.tree_util.tree_structure(params), tuple(sorted(batch)),
               _canvas_hw(batch) if target_cfg is not None else None)
        if key not in _cache:
            pspec = jax.tree_util.tree_map(lambda _: rep, params)
            bspec = _batch_spec(batch, img, dp)
            local_vg = make_local_vg(
                _target_rasterizer(target_cfg, target_stats, batch))
            _cache[key] = jax.jit(jax.shard_map(
                local_vg, mesh=mesh, in_specs=(pspec, bspec),
                out_specs=((rep, rep), pspec), check_vma=False))
        return _cache[key](params, batch)

    return vg


def make_spatial_train_step(
    model_cfg: DeeperCutConfig,
    solver_cfg: update_rules.SolverConfig,
    mesh: Mesh,
    *,
    donate: bool = True,
    target_cfg=None,
    target_stats=None,
):
    """(params, state, batch) -> (params, state, metrics) over a 2-D
    ('data', 'spatial') mesh: batch over 'data', image rows over 'spatial',
    params/opt-state replicated — trajectory-equal to the single-device
    make_train_step (tested). target_cfg: on-device target rasterization
    of compact `anno_*` batches (pose/targets_device.py)."""
    nsp = spatial_axis_size(mesh)

    def make_step(rast):
        def step(params, state, batch):
            batch = warp_batch_local(batch)  # no-op without image_raw
            if rast is not None:
                batch = rast(batch)

            def local_loss(p):
                outs = spatial_forward(p, batch["image"], model_cfg)
                return sharded_pose_loss(outs, batch, model_cfg,
                                         psum_axes=("data",))
            (total, metrics), grads = jax.value_and_grad(
                local_loss, has_aux=True)(params)
            # psum over both axes counts every data row n_spatial times (the
            # gather transpose + replicated heads, see module docstring) —
            # divide once, uniformly.
            grads = jax.tree_util.tree_map(
                lambda g: lax.psum(g, ("data", "spatial")) / nsp, grads)
            # BN statistics are frozen (lr_mult/decay_mult 0 — see
            # models/train.bn_frozen_mults)
            from deepcut_tpu.models.train import bn_frozen_mults
            mults = bn_frozen_mults(params)
            params2, state2 = update_rules.step(solver_cfg, params, grads,
                                                state, lr_mults=mults,
                                                decay_mults=mults)
            metrics = dict(metrics)
            metrics["lr"] = update_rules.learning_rate(solver_cfg, state["iter"])
            return params2, state2, metrics
        return step

    rep = P()
    img = P("data", "spatial")
    dp = P("data")

    _cache: Dict = {}

    def jitted(params, state, batch):
        check_spatial_shapes(_canvas_hw(batch)[0], _batch_size(batch), mesh)
        key = (jax.tree_util.tree_structure(params),
               jax.tree_util.tree_structure(state), tuple(sorted(batch)),
               _canvas_hw(batch) if target_cfg is not None else None)
        if key not in _cache:
            pspec = jax.tree_util.tree_map(lambda _: rep, params)
            sspec = jax.tree_util.tree_map(lambda _: rep, state)
            bspec = _batch_spec(batch, img, dp)
            step = make_step(
                _target_rasterizer(target_cfg, target_stats, batch))
            sharded = jax.shard_map(
                step, mesh=mesh, in_specs=(pspec, sspec, bspec),
                out_specs=(pspec, sspec, rep), check_vma=False)
            _cache[key] = jax.jit(
                sharded, donate_argnums=(0, 1) if donate else ())
        return _cache[key](params, state, batch)

    return jitted
