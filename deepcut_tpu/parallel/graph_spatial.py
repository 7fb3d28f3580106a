"""Spatially-sharded TRAINING for ANY prototxt graph (jax.shard_map).

The native-model spatial step (parallel/spatial.py) hard-codes the
DeeperCut trunk; this module generalises the same design to the graph
engine's layer plans, so `core.graph.Net.make_train_step(mesh=2-D mesh)`
can train the reference's own prototxt files with image rows sharded:

1. **Plan split.** A walker classifies each layer: spatially SHARDABLE
   (convolutions and unpadded MAX pools whose geometry tiles the row axis
   exactly, plus pointwise/per-channel layers incl. train-mode BatchNorm,
   whose batch moments psum over both axes) run on local row shards with
   explicit `ppermute` halo exchange; the first layer that cannot shard
   (InnerProduct, Deconvolution, softmax over channels is fine but Flatten
   isn't, padded/AVE pooling, rng layers, any geometry that does not tile)
   becomes the GATHER BOUNDARY — every live sharded blob is `all_gather`ed
   over 'spatial' and the suffix runs replicated within each data row
   (suffix train-BN psums its moments over 'data'). Worst case the
   boundary is layer 0 and the step degenerates to correct data-parallel
   training.
2. **Losses.** The suffix traces inside `ops.losses.sharded_losses(
   ("data",))`, so loss sums and normalisers psum over the data axis from
   INSIDE custom_vjp (single-device semantics; no psum-transpose gradient
   inflation). Loss layers without a psum'ed variant are rejected loudly.
3. **Gradients.** Per-device contributions psum over BOTH axes and divide
   by n_spatial — the gather transpose and the replicated suffix each
   duplicate every data row's contribution exactly n_spatial times
   (derivation in parallel/spatial.py's module docstring).

Shardability conditions per layer (global row count H per blob, n = axis
size): H_in % n == 0, H_out % n == 0, the output rows tile the input
(H_out * stride_h == H_in, the alignment that makes each shard's output
block read a stride-aligned input block plus bounded halos), and the halo
depth fits in one neighbour shard (top = pad_h <= H_in/n, bottom =
k_eff - pad_h - stride_h <= H_in/n).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Set, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from deepcut_tpu.ops import losses as loss_ops
from deepcut_tpu.ops import norm as norm_ops
from deepcut_tpu.parallel.spatial import (
    halo_exchange, spatial_axis_size, spatial_conv2d, spatial_max_pool)

# layers that act per-element / per-channel: safe on row shards as-is
_POINTWISE = {
    "ReLU", "PReLU", "ELU", "Sigmoid", "TanH", "BNLL", "AbsVal", "Power",
    "Exp", "Log", "Threshold", "Scale", "Bias", "BatchNorm", "Eltwise",
}
# losses with psum'ed sharded variants (ops/losses.sharded_losses)
_SHARDED_LOSSES = {
    "SoftmaxWithLoss", "SoftmaxWithLossVec", "SmoothL1Loss",
    "SigmoidCrossEntropyLoss", "EuclideanLoss",
}
# losses that are plain PER-SAMPLE MEANS (normaliser = batch size, no
# valid-count/ignore-label coupling): the generic pmean wrapper below is
# exact for these. Losses outside both sets still raise loudly.
_MEAN_LOSSES = {
    "HingeLoss", "ContrastiveLoss", "MultinomialLogisticLoss", "InfogainLoss",
}


def _wrap_mean_loss(fn, ndata: int):
    """Exact data-sharded variant of a per-sample-MEAN loss layer: forward
    = pmean of the local mean-losses (equal per-shard counts by sharding),
    backward = the local vjp scaled by 1/ndata — the psum lives outside the
    differentiated region (the losses.sharded_losses transpose trap).
    Loss-layer params (there are none in practice) are closed over, not
    differentiated."""
    def scalar(entry, bs):
        out = fn(entry, bs)
        return out[0] if isinstance(out, (list, tuple)) else out

    def wrapped(entry, bottoms):
        @jax.custom_vjp
        def call(bs):
            return lax.psum(scalar(entry, bs), "data") / ndata

        def fwd(bs):
            return lax.psum(scalar(entry, bs), "data") / ndata, bs

        def bwd(bs, g):
            _, vjp_fn = jax.vjp(lambda b: scalar(entry, b), bs)
            return (vjp_fn(g / ndata)[0],)

        call.defvjp(fwd, bwd)
        return [call(list(bottoms))]
    return wrapped


def _pair(node, base: str, default: int) -> Tuple[int, int]:
    """Caffe's kernel_size/_h/_w, stride/_h/_w, pad/_h/_w conventions."""
    if node.has(f"{base}_h") or node.has(f"{base}_w"):
        return (node.get_int(f"{base}_h", default),
                node.get_int(f"{base}_w", default))
    vals = [int(v) for v in node.get_list(base)] or [default]
    return (vals[0], vals[-1])


def _conv_spatial_info(spec, h_in: int, h_out: int, nsp: int):
    """(geometry kwargs) when this Convolution tiles the row axis, else None."""
    cp = spec.param("convolution_param")
    kh, kw = _pair(cp, "kernel_size", 1)
    sh, sw = _pair(cp, "stride", 1)
    ph, pw = _pair(cp, "pad", 0)
    dil = cp.get_int("dilation", 1)
    k_eff = dil * (kh - 1) + 1
    local = h_in // nsp
    if (h_in % nsp or h_out % nsp or h_out * sh != h_in
            or ph > local or max(k_eff - ph - sh, 0) > local):
        return None
    return dict(stride=(sh, sw), pad=(ph, pw), dilation=dil,
                groups=cp.get_int("group", 1))


def _pool_spatial_info(spec, h_in: int, h_out: int, nsp: int):
    pp = spec.param("pooling_param")
    if pp.get_str("pool", "MAX") != "MAX" or pp.get_bool("global_pooling", False):
        return None
    kh, kw = _pair(pp, "kernel_size", 0)
    sh, sw = _pair(pp, "stride", 1)
    ph, pw = _pair(pp, "pad", 0)
    local = h_in // nsp
    if (ph or pw or h_in % nsp or h_out % nsp or h_out * sh != h_in
            or kh < sh or max(kh - sh, 0) > local):
        return None
    return dict(kernel=(kh, kw), stride=(sh, sw))


def split_plan(net, blob_shapes: Dict[str, Tuple[int, ...]], nsp: int):
    """Walk the plan; return (boundary_index, per-layer spatial infos,
    sharded_inputs, gather_blobs).

    blob_shapes: global NHWC shapes for every blob (inputs + all tops).
    sharded_inputs: net inputs that enter row-sharded.
    gather_blobs: sharded blobs that must be all_gathered at the boundary
    (consumed at/after it)."""
    plan = net._plan
    sharded: Set[str] = set()
    infos: List[Optional[dict]] = []
    boundary = 0

    def h_of(name):
        sh = blob_shapes.get(name)
        return sh[1] if sh is not None and len(sh) == 4 else None

    for idx, (fn, spec) in enumerate(plan):
        typ = spec.type
        info: Optional[dict] = None
        ok = False
        if not getattr(fn, "needs_rng", False):
            hs_in = [h_of(b) for b in spec.bottoms]
            hs_out = [h_of(t) for t in spec.tops]
            all_4d = all(h is not None for h in hs_in + hs_out) and hs_in
            if typ == "Convolution" and all_4d:
                info = _conv_spatial_info(spec, hs_in[0], hs_out[0], nsp)
                ok = info is not None
            elif typ == "Pooling" and all_4d:
                info = _pool_spatial_info(spec, hs_in[0], hs_out[0], nsp)
                ok = info is not None
            elif typ in _POINTWISE and all_4d:
                # same-H bottoms (Eltwise) and H-preserving outputs only;
                # Concat is excluded (axis bookkeeping) — boundary instead
                ok = (len(set(hs_in + hs_out)) == 1
                      and all(h % nsp == 0 for h in hs_in))
        # every 4-D bottom the layer consumes must be sharded or shardable
        if ok:
            for b in spec.bottoms:
                h = h_of(b)
                if h is None:
                    ok = False  # non-4D bottom in a "shardable" layer
                    break
                if b not in sharded and b not in net.input_names:
                    ok = False  # produced replicated earlier (can't happen
                    break       # before the boundary, but be safe)
        if not ok:
            boundary = idx
            break
        infos.append(info)
        sharded.update(b for b in spec.bottoms if b in net.input_names)
        sharded.update(spec.tops)
    else:
        boundary = len(plan)

    sharded_inputs = {b for b in sharded if b in net.input_names}
    # blobs needing a gather: sharded and consumed at/after the boundary
    # (or a net output)
    consumed_later: Set[str] = set()
    for _, spec in plan[boundary:]:
        consumed_later.update(spec.bottoms)
    consumed_later.update(net.output_names())
    gather_blobs = sorted(sharded & consumed_later)

    # the suffix must only contain supported loss types and no state that a
    # replicated-per-data-row trace cannot reproduce
    for fn, spec in plan[boundary:]:
        is_loss = spec.type.endswith("Loss") or spec.type == "SoftmaxWithLossVec"
        if is_loss and spec.type not in _SHARDED_LOSSES \
                and spec.type not in _MEAN_LOSSES:
            raise NotImplementedError(
                f"spatial graph training: loss layer '{spec.name}' of type "
                f"{spec.type} has no psum'ed sharded variant; supported: "
                f"{sorted(_SHARDED_LOSSES | _MEAN_LOSSES)}")
        # stochastic layers (needs_rng) are fine here: the boundary walker
        # keeps them out of the sharded prefix, and the suffix draws their
        # random tensors at the GLOBAL batch size and slices the local rows
        # (ops/shard_rng.py) — masks equal the single-device sequence.
    return boundary, infos, sharded_inputs, gather_blobs


def make_graph_spatial_train_step(net, solver_cfg, mesh: Mesh, *,
                                  lr_mults=None, decay_mults=None,
                                  iter_size: int = 1):
    """(params, state, inputs) -> (params, state, loss) over a 2-D
    ('data', 'spatial') mesh for a graph-engine Net — trajectory-equal to
    the single-device step. Built lazily per input-shape signature (the
    split depends on the blob shapes). With iter_size > 1 the inputs carry
    a leading micro-batch axis (GraphSolver's stacking convention) and the
    local step scans over it, summing gradients before the single psum +
    update — the same accumulate-then-divide semantics as the single-device
    scan (core/graph.py) and Solver::Step (solver.cpp:218-226)."""
    from deepcut_tpu.solver import update_rules

    nsp = spatial_axis_size(mesh)
    cdt = net.compute_dtype
    iter_size = max(int(iter_size), 1)
    _cache: Dict[Any, Any] = {}

    def build(params, state, dev_inputs):
        micro = dev_inputs
        if iter_size > 1:  # strip the leading micro-batch axis for planning
            micro = {nm: jax.ShapeDtypeStruct(v.shape[1:], v.dtype)
                     for nm, v in dev_inputs.items()}
        shapes = {nm: tuple(v.shape) for nm, v in micro.items()}
        abstract = {nm: jax.ShapeDtypeStruct(v.shape, v.dtype)
                    for nm, v in micro.items()}
        all_blobs = jax.eval_shape(
            lambda p, i: net._execute(p, i), params, abstract)
        blob_shapes = dict(shapes)
        blob_shapes.update({nm: tuple(v.shape) for nm, v in all_blobs.items()})
        boundary, infos, sharded_inputs, gather_blobs = split_plan(
            net, blob_shapes, nsp)
        plan = net._plan

        ndata = int(mesh.shape["data"])
        # per-sample-MEAN losses get the generic pmean wrapper; the rest of
        # the suffix runs the layer fns as built
        suffix_plan = [
            ((_wrap_mean_loss(fn, ndata) if spec.type in _MEAN_LOSSES else fn),
             spec)
            for fn, spec in plan[boundary:]]

        def local_step(params, state, all_inputs):
            # per-step key, identical to the single-device step (fresh masks
            # every iteration, snapshot/restore-stable); replicated state
            # makes it equal on every shard
            base_key = (jax.random.fold_in(net._rng, state["iter"])
                        if net._rng is not None else None)

            def local_loss(p, inputs, step_key):
                blobs = dict(inputs)
                bn_updates: Dict[str, Dict[str, jax.Array]] = {}
                # sharded prefix: halo convs/pools, pointwise as-built,
                # train-BN with moments psum'ed over BOTH axes (rows are
                # spatial shards of the global batch)
                for (fn, spec), info in zip(plan[:boundary], infos):
                    bottoms = [blobs[b] for b in spec.bottoms]
                    # propagate_down: false (same semantics as _execute)
                    pdown = [v if isinstance(v, bool)
                             else bool(v) if isinstance(v, (int, float))
                             else str(v).lower() == "true"
                             for v in spec.node.get_list("propagate_down")]
                    if pdown and not all(pdown):
                        bottoms = [jax.lax.stop_gradient(b)
                                   if i < len(pdown) and not pdown[i] else b
                                   for i, b in enumerate(bottoms)]
                    entry = net._entry(p, spec.name)
                    if spec.type == "Convolution":
                        outs = [spatial_conv2d(
                            bottoms[0], entry["w"], entry.get("b"),
                            compute_dtype=cdt, **info)]
                    elif spec.type == "Pooling":
                        outs = [spatial_max_pool(bottoms[0], **info)]
                    elif getattr(fn, "bn_train", False):
                        with norm_ops.sharded_bn_stats(("data", "spatial")):
                            y, new_stats = norm_ops.batch_norm_train(
                                bottoms[0],
                                norm_ops.BNStats(
                                    entry["mean"], entry["var"],
                                    entry["scale_factor"].reshape(())),
                                eps=fn.bn_eps, momentum=fn.bn_momentum)
                        bn_updates[spec.name] = {
                            "mean": new_stats.mean, "var": new_stats.var,
                            "scale_factor": new_stats.scale_factor.reshape((1,)),
                        }
                        outs = [y]
                    else:
                        outs = fn(entry, bottoms)
                    if not isinstance(outs, (list, tuple)):
                        outs = [outs]
                    for top, val in zip(spec.tops, outs):
                        blobs[top] = val
                for b in gather_blobs:
                    blobs[b] = lax.all_gather(blobs[b], "spatial", axis=1,
                                              tiled=True)
                # replicated suffix with psum'ed loss normalisers,
                # data-psum'ed BN moments, and global-batch stochastic
                # draws; reuse the engine's executor (propagate_down,
                # in-place semantics, BN bookkeeping, per-layer rng folds
                # offset to the layer's global plan index)
                from deepcut_tpu.ops.shard_rng import sharded_rng_batch
                with loss_ops.sharded_losses(("data",)), \
                        norm_ops.sharded_bn_stats(("data",)), \
                        sharded_rng_batch(("data",), (ndata,)):
                    blobs = net._execute(p, blobs, plan=suffix_plan,
                                         collect_updates=bn_updates,
                                         rng=step_key, rng_offset=boundary)
                    return net.total_loss(blobs), bn_updates

            if iter_size == 1:
                (loss, bn_updates), grads = jax.value_and_grad(
                    lambda p: local_loss(p, all_inputs, base_key),
                    has_aux=True)(params)
            else:
                def vg(inp, key):
                    return jax.value_and_grad(
                        lambda p: local_loss(p, inp, key), has_aux=True)(params)
                first = jax.tree_util.tree_map(lambda a: a[0], all_inputs)
                (loss0, upd0), g0 = vg(first, base_key)

                def body(carry, xs):
                    inp, micro = xs
                    gsum, lsum, _ = carry
                    key = (jax.random.fold_in(base_key, micro)
                           if base_key is not None else None)
                    (l, upd), g = vg(inp, key)
                    return (jax.tree_util.tree_map(jnp.add, gsum, g),
                            lsum + l, upd), None
                rest = jax.tree_util.tree_map(lambda a: a[1:], all_inputs)
                (grads, loss_sum, bn_updates), _ = lax.scan(
                    body, (g0, loss0, upd0),
                    (rest, jnp.arange(1, iter_size)))
                # grads stay SUMMED — update_rules.step divides by iter_size
                # (preprocess_grads), identical to the single-device scan;
                # BN moving averages take the last micro-batch's stats,
                # like the single-device scan and the reference
                loss = loss_sum / iter_size
            grads = jax.tree_util.tree_map(
                lambda g: lax.psum(g, ("data", "spatial")) / nsp, grads)
            params2, state2 = update_rules.step(
                solver_cfg, params, grads, state, lr_mults=lr_mults,
                decay_mults=decay_mults)
            # BN moving averages overwrite whatever the solver did to the
            # stat blobs (core/graph.py step semantics); values are psum'ed
            # so they are identical on every shard
            for name, upd in bn_updates.items():
                merged = dict(params2[name])
                merged.update(jax.lax.stop_gradient(upd))
                params2[name] = merged
            return params2, state2, loss

        rep = P()
        pspec = jax.tree_util.tree_map(lambda _: rep, params)
        sspec = jax.tree_util.tree_map(lambda _: rep, state)

        def in_spec(nm, v):
            if iter_size > 1:  # batch dim sits behind the micro-batch axis
                if nm in sharded_inputs:
                    return P(None, "data", "spatial")
                return P(None, "data") if getattr(v, "ndim", 0) >= 2 else P(None)
            if nm in sharded_inputs:
                return P("data", "spatial")
            return P("data") if getattr(v, "ndim", 0) >= 1 else rep

        ispec = {nm: in_spec(nm, v) for nm, v in dev_inputs.items()}
        sharded = jax.shard_map(
            local_step, mesh=mesh, in_specs=(pspec, sspec, ispec),
            out_specs=(pspec, sspec, rep), check_vma=False)
        return jax.jit(sharded)

    def step(params, state, inputs):
        key = (tuple(sorted((nm, tuple(v.shape)) for nm, v in inputs.items())),
               jax.tree_util.tree_structure(params),
               jax.tree_util.tree_structure(state))
        if key not in _cache:
            _cache[key] = build(params, state, inputs)
        return _cache[key](params, state, inputs)

    return step
