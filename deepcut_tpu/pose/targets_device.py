"""On-device target rasterization: compact annotations -> dense target maps.

The reference's PoseDataLayer (pose_data_layer.cpp:676-855) builds dense
stride-8 target maps on the host and ships them to the accelerator. For the
DeeperCut pairwise configuration that is ~25 MB per 688px sample as float32
(the 364-channel pairwise targets + weights alone are 21.5 MB); at TPU step
rates the host->device transfer, not the compute, bounds training. The
TPU-native layout ships the annotation itself — O(people x joints) entries,
a few KB — and rasterizes the dense maps ON DEVICE, inside the same XLA
program as the forward/backward, where they are consumed and immediately
fused into the losses.

Semantics are identical to pose.targets.rasterize (asserted bit-equal /
allclose on the CPU backend in tests/test_targets_device.py). The one
stochastic ingredient — fg_fraction negative SAMPLING (the reference's
RNG-driven loop, pose_data_layer.cpp:828-855) — is still drawn on the host
in reference order and shipped as a (grid_h, grid_w) bitmask, so RNG
trajectories stay bit-identical to the host rasterizer path.

Host side:  ``compact_sample(record, cfg, stats, rng, scale, limits)``
Device side: ``make_batch_rasterizer(cfg, stats)`` -> callable mapping a
batch dict holding ``anno_*`` arrays to the dense target dict, jit-safe.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Sequence

import numpy as np

from deepcut_tpu.data.window_file import ImageRecord, JointStats, default_stats
from deepcut_tpu.pose import targets as T

FLT_MAX = float(np.finfo(np.float32).max)

#: batch keys produced by compact_sample (all small; shipped each step)
ANNO_KEYS = ("anno_cls", "anno_xy", "anno_person", "anno_joint_index",
             "anno_scale", "anno_dims", "anno_neg_mask")


@dataclasses.dataclass(frozen=True)
class CompactLimits:
    """Static padding sizes for the annotation arrays (per data source)."""

    max_entries: int  # M: total (person, joint) entries incl. skip markers
    max_people: int   # P


def record_limits(records: Sequence[ImageRecord]) -> CompactLimits:
    m = p = 1
    for rec in records:
        m = max(m, sum(len(pe.classes) for pe in rec.people))
        p = max(p, len(rec.people))
    return CompactLimits(max_entries=m, max_people=p)


def _entry_arrays(record: ImageRecord, cfg: T.TargetConfig):
    """Flatten (person, joint) entries in reference iteration order."""
    J = cfg.num_classes
    cls_l: List[int] = []
    xy_l: List[np.ndarray] = []
    person_l: List[int] = []
    joint_index = np.full((max(len(record.people), 1), J), -1, np.int32)
    for pidx, p in enumerate(record.people):
        for k in range(len(p.classes)):
            cls_l.append(int(p.classes[k]))
            xy_l.append(np.asarray(p.xy[k], np.float32))
            person_l.append(pidx)
            if 1 <= p.classes[k] <= J:
                joint_index[pidx, p.classes[k] - 1] = len(cls_l) - 1
    cls_arr = np.asarray(cls_l, np.int32)
    if cls_arr.size:
        bad = (cls_arr < 1) | ((cls_arr > J) & (cls_arr != cfg.skip_class))
        if bad.any():
            raise ValueError(
                f"joint classes {sorted(set(cls_arr[bad].tolist()))} out of "
                f"range for num_classes={J} (skip_class={cfg.skip_class})")
    xy_arr = (np.stack(xy_l).astype(np.float32) if cls_l
              else np.zeros((0, 2), np.float32))
    return cls_arr, xy_arr, np.asarray(person_l, np.int32), joint_index


def _host_sampling_state(cls_arr, xy_arr, cfg: T.TargetConfig, scale, th, tw):
    """(sample_mask, min_distance, num_positives) over the (th, tw) grid —
    the inputs the reference's negative-sampling loop reads. Mirrors the
    fg/skip math of targets.rasterize exactly (pose_data_layer.cpp:676-745)."""
    SKIP = cfg.skip_class
    gy, gx = np.meshgrid(np.arange(th), np.arange(tw), indexing="ij")
    pt = np.stack([gx * T.STRIDE + T.HALF_STRIDE,
                   gy * T.STRIDE + T.HALF_STRIDE],
                  axis=-1).astype(np.float32) / scale
    if not len(cls_arr):
        empty = np.zeros((th, tw), bool)
        return empty, np.full((th, tw), FLT_MAX, np.float32), 0
    diff = xy_arr[None, None, :, :] - pt[:, :, None, :]
    dist = np.sqrt(np.sum(diff * diff, axis=-1)).astype(np.float32)
    min_dist = dist.min(axis=2)
    if cfg.soft_labels:
        flat_arg = np.argmin(dist, axis=2)
        closest_joint = cls_arr[flat_arg]
        scores = np.zeros((th, tw, SKIP + 1), np.float32)
        for c in range(1, SKIP + 1):
            m = cls_arr == c
            if m.any():
                d_c = dist[:, :, m].min(axis=2)
                scores[:, :, c] = np.exp(-d_c ** 2 / (2 * cfg.gauss_blob_sigma ** 2))
        closest_score = np.take_along_axis(
            scores, closest_joint[..., None], axis=2)[..., 0]
        is_fg = (1.0 - closest_score) <= 1 - T.FG_SCORE_THRESH
        if (cls_arr == SKIP).any():
            skip_sample = scores[:, :, SKIP] > T.FG_SCORE_THRESH
        else:
            skip_sample = np.zeros((th, tw), bool)
    else:
        is_fg = min_dist <= cfg.fg_threshold
        if (cls_arr == SKIP).any():
            m = cls_arr == SKIP
            skip_sample = (dist[:, :, m].min(axis=2) <= cfg.fg_threshold)
        else:
            skip_sample = np.zeros((th, tw), bool)
    return (is_fg | skip_sample), min_dist, int(np.sum(is_fg))


def _draw_negative_mask(cfg: T.TargetConfig, sample_mask, min_distance,
                        num_positives, th, tw, rng) -> np.ndarray:
    """Reference negative-sampling loop (pose_data_layer.cpp:828-855),
    emitting the sampled-cell mask instead of writing labels. Draw order is
    identical to targets._fill_negatives_vec so RNG trajectories match."""
    neg = np.zeros_like(sample_mask)
    mask = sample_mask.copy()
    max_neg = int(num_positives * (1.0 - cfg.fg_fraction) / cfg.fg_fraction)
    num_neg = 0
    for _ in range(max_neg * 10):
        j = int(rng.randint(0, th))
        i = int(rng.randint(0, tw))
        if mask[j, i]:
            continue
        if cfg.bg_threshold is not None and min_distance[j, i] <= cfg.bg_threshold:
            continue
        neg[j, i] = True
        mask[j, i] = True
        num_neg += 1
        if num_neg == max_neg:
            break
    return neg


def compact_sample(
    record: ImageRecord,
    cfg: T.TargetConfig,
    stats: Optional[JointStats] = None,
    rng: Optional[np.random.RandomState] = None,
    scale: Optional[float] = None,
    limits: Optional[CompactLimits] = None,
) -> Dict[str, np.ndarray]:
    """Host half of the device-rasterizer pipeline: the compact annotation
    arrays plus whatever targets stay host-built (RPN / segmentation — both
    small). Consumes `rng` in exactly the order targets.rasterize does, so a
    PoseDataSource in device-target mode replays the host mode's stream."""
    if stats is None:
        stats = default_stats(cfg.num_classes)
    if rng is None:
        rng = np.random.RandomState(0)
    if scale is None:
        scale = T.sample_scale(cfg, rng)
    sh, sw, ih, iw = T.grid_geometry(record.height, record.width, scale)
    th = math.ceil(round(record.height * scale) / T.STRIDE)
    tw = math.ceil(round(record.width * scale) / T.STRIDE)
    cls_arr, xy_arr, person_arr, joint_index = _entry_arrays(record, cfg)
    lim = limits or CompactLimits(max(len(cls_arr), 1),
                                  max(len(record.people), 1))
    if len(cls_arr) > lim.max_entries or joint_index.shape[0] > lim.max_people:
        raise ValueError(
            f"record exceeds CompactLimits: {len(cls_arr)} entries / "
            f"{joint_index.shape[0]} people vs {lim}")

    neg_mask = np.zeros((sh, sw), np.uint8)
    if cfg.fg_fraction is not None and not cfg.weight_targets:
        sample_mask, min_dist, npos = _host_sampling_state(
            cls_arr, xy_arr, cfg, scale, th, tw)
        neg_mask[:th, :tw] = _draw_negative_mask(
            cfg, sample_mask, min_dist, npos, th, tw, rng)

    M, P = lim.max_entries, lim.max_people
    cls_pad = np.zeros((M,), np.int32)
    cls_pad[: len(cls_arr)] = cls_arr
    xy_pad = np.zeros((M, 2), np.float32)
    xy_pad[: len(cls_arr)] = xy_arr
    person_pad = np.zeros((M,), np.int32)
    person_pad[: len(cls_arr)] = person_arr
    ji_pad = np.full((P, cfg.num_classes), -1, np.int32)
    ji_pad[: joint_index.shape[0]] = joint_index

    out: Dict[str, np.ndarray] = {
        "anno_cls": cls_pad,
        "anno_xy": xy_pad,
        "anno_person": person_pad,
        "anno_joint_index": ji_pad,
        "anno_scale": np.float32(scale),
        "anno_dims": np.array([th, tw, sh, sw], np.int32),
        "anno_neg_mask": neg_mask,
        "scale": np.float32(scale),
        "input_size": np.array([ih, iw], np.int32),
    }
    T._add_aux_targets(out, record, cfg, rng, scale, sh, sw, th, tw, ih, iw)
    return out


# --------------------------------------------------------------------------
# Device half: jnp rasterizer (vectorized over classes/edges, vmapped over
# the batch). Mirrors targets.rasterize statement for statement.
# --------------------------------------------------------------------------


def _rasterize_one(anno, cfg: T.TargetConfig, stats: JointStats,
                   grid_h: int, grid_w: int):
    import jax
    import jax.numpy as jnp

    J = cfg.num_classes
    SKIP = cfg.skip_class
    first = 1 if cfg.no_bg_class else 0
    E = len(stats.edges)

    cls = anno["anno_cls"]            # (M,) int32, 0 = padding
    xy = anno["anno_xy"]              # (M, 2) f32
    person = anno["anno_person"]      # (M,) int32
    jidx = anno["anno_joint_index"]   # (P, J) int32, -1 = absent
    scale = anno["anno_scale"]        # () f32
    th, tw, sh, sw = (anno["anno_dims"][i] for i in range(4))

    gy, gx = jnp.meshgrid(jnp.arange(grid_h), jnp.arange(grid_w), indexing="ij")
    in_grid = (gy < th) & (gx < tw)
    in_sample = (gy < sh) & (gx < sw)
    pt = jnp.stack([gx * T.STRIDE + T.HALF_STRIDE,
                    gy * T.STRIDE + T.HALF_STRIDE],
                   axis=-1).astype(jnp.float32) / scale            # (H,W,2)

    valid_e = cls >= 1                                             # (M,)
    diff_all = xy[None, None, :, :] - pt[:, :, None, :]            # (H,W,M,2)
    dist_all = jnp.sqrt(jnp.sum(diff_all * diff_all, axis=-1))
    dist_m = jnp.where(valid_e[None, None, :], dist_all, FLT_MAX)
    flat_arg = jnp.argmin(dist_m, axis=2)                          # ties->first
    min_dist = jnp.take_along_axis(dist_m, flat_arg[..., None], axis=2)[..., 0]
    closest_joint = cls[flat_arg]                                  # (H,W)

    # per class: distance/index of the closest instance of that class.
    # Absent classes keep dist FLT_MAX / arg 0, matching the host defaults.
    class_dist_l, class_arg_l, score_l = [], [], []
    for c in range(SKIP + 1):
        if c == 0:
            z = jnp.zeros((grid_h, grid_w))
            class_dist_l.append(jnp.full((grid_h, grid_w), FLT_MAX))
            class_arg_l.append(jnp.zeros((grid_h, grid_w), jnp.int32))
            score_l.append(z)
            continue
        d_c = jnp.where((cls == c)[None, None, :], dist_m, FLT_MAX)
        a_c = jnp.argmin(d_c, axis=2)
        cd = jnp.take_along_axis(d_c, a_c[..., None], axis=2)[..., 0]
        class_dist_l.append(cd)
        class_arg_l.append(a_c.astype(jnp.int32))
        if cfg.soft_labels:
            score_l.append(jnp.exp(-cd * cd / (2 * cfg.gauss_blob_sigma ** 2)))
        else:
            score_l.append((cd <= cfg.fg_threshold).astype(jnp.float32))
    class_dist = jnp.stack(class_dist_l, axis=-1)                  # (H,W,C')
    class_arg = jnp.stack(class_arg_l, axis=-1)
    scores = jnp.stack(score_l, axis=-1)

    skip_sample = scores[:, :, SKIP] > T.FG_SCORE_THRESH
    closest_score = jnp.take_along_axis(
        scores, closest_joint[..., None], axis=2)[..., 0]
    scores = scores.at[:, :, 0].set(1.0 - closest_score)

    if cfg.soft_labels:
        is_fg = scores[:, :, 0] <= 1 - T.FG_SCORE_THRESH
    else:
        is_fg = min_dist <= cfg.fg_threshold
    is_fg = is_fg & in_grid
    skip_sample = skip_sample & in_grid
    sample_mask = is_fg | skip_sample
    num_positives = jnp.sum(is_fg)

    write = ~skip_sample & in_grid
    if cfg.fg_fraction is not None:
        write = write & is_fg
    if not cfg.soft_labels and not cfg.multi_label:
        curr = jnp.where(is_fg, closest_joint, 0)
        scores_out = jax.nn.one_hot(curr, SKIP + 1, dtype=jnp.float32)
    else:
        scores_out = scores

    labels = jnp.full((grid_h, grid_w, cfg.label_channels),
                      T.IGNORE_VALUE, jnp.float32)
    labels = jnp.where(write[..., None], scores_out[..., first:J + 1], labels)
    weights = jnp.ones((grid_h, grid_w, cfg.label_channels), jnp.float32)

    gate_scores = scores_out  # post-overwrite gating (pose_data_layer quirk)
    out: Dict[str, "jax.Array"] = {}

    if cfg.location_refinement:
        args_j = class_arg[..., 1:J + 1]                           # (H,W,J)
        active = (write & is_fg)[..., None] \
            & (gate_scores[..., 1:J + 1] >= T.FG_SCORE_THRESH) \
            & (class_dist[..., 1:J + 1] < FLT_MAX)
        d = jnp.take_along_axis(diff_all, args_j[..., None], axis=2) * scale
        loc = jnp.where(active[..., None], d / T.LOCREF_STD, 0.0)  # (H,W,J,2)
        out["locref_targets"] = loc.reshape(grid_h, grid_w, 2 * J)
        lw = jnp.where(active, 1.0, 0.0)
        out["locref_weights"] = jnp.repeat(lw, 2, axis=-1)

    if cfg.regress_to_other:
        cls_e = jnp.asarray(stats.edges[:, 0], jnp.int32)          # (E,)
        nxt_e = jnp.asarray(stats.edges[:, 1], jnp.int32)
        means = jnp.asarray(stats.means, jnp.float32)              # (E,2)
        stds = jnp.asarray(stats.std_devs, jnp.float32)
        gate_e = jnp.take(gate_scores, cls_e, axis=-1)             # (H,W,E)
        cdist_e = jnp.take(class_dist, cls_e, axis=-1)
        arg_e = jnp.take(class_arg, cls_e, axis=-1)                # (H,W,E)
        pidx_e = person[arg_e]                                     # (H,W,E)
        nj = jidx[pidx_e, nxt_e[None, None, :] - 1]                # (H,W,E)
        active = (write & is_fg)[..., None] \
            & (gate_e >= T.FG_SCORE_THRESH) & (cdist_e < FLT_MAX) & (nj >= 0)
        nxt_xy = xy[jnp.clip(nj, 0, None)]                         # (H,W,E,2)
        d = (nxt_xy - pt[:, :, None, :]) * scale
        t = jnp.where(active[..., None], (d - means) / stds, 0.0)
        out["pairwise_targets"] = t.reshape(grid_h, grid_w, 2 * E)
        pw = jnp.where(active, 1.0, 0.0)
        out["pairwise_weights"] = jnp.repeat(pw, 2, axis=-1)

    # negatives (targets._fill_negatives_vec)
    onehot0 = jnp.zeros((SKIP + 1,), jnp.float32).at[0].set(1.0)[first:J + 1]
    if cfg.weight_targets:
        total = (sh * sw).astype(jnp.float32)
        neg = jnp.maximum(total - num_positives.astype(jnp.float32), 1.0)
        w = ((1 - (cfg.fg_fraction or 0.25)) / (cfg.fg_fraction or 0.25)
             * num_positives.astype(jnp.float32) / neg)
        bg = in_sample & ~sample_mask
        labels = jnp.where(bg[..., None], onehot0, labels)
        weights = jnp.where(bg[..., None], w, weights)
    elif cfg.fg_fraction is not None:
        neg = anno["anno_neg_mask"].astype(bool)
        labels = jnp.where(neg[..., None], onehot0, labels)

    # padding beyond the sample's own (sh, sw): ignore-labels, zero weights
    # (identical to PoseDataSource.next_batch's host-side bucket padding)
    labels = jnp.where(in_sample[..., None], labels, T.IGNORE_VALUE)
    weights = jnp.where(in_sample[..., None], weights, 0.0)
    out["part_score_targets"] = labels
    out["part_score_weights"] = weights
    return out


def make_batch_rasterizer(cfg: T.TargetConfig,
                          stats: Optional[JointStats] = None,
                          grid: Optional[tuple] = None):
    """Returns `apply(batch) -> batch` replacing the ``anno_*`` arrays with
    dense target maps rasterized on device. jit-safe; a no-op for batches
    that already carry dense targets. The stride-8 grid shape is derived
    from the image canvas (bucketed, so static under jit); pass `grid`
    explicitly when the visible image is a spatial SHARD of the canvas
    (parallel/spatial.py) — targets are data-sharded only, so every spatial
    shard rasterizes the full grid."""
    import jax

    stats = stats or default_stats(cfg.num_classes)

    def apply(batch):
        if "anno_cls" not in batch:
            return batch
        if grid is not None:
            gh, gw = grid
        else:
            img = batch["image"]
            gh, gw = img.shape[1] // T.STRIDE, img.shape[2] // T.STRIDE
        annos = {k: v for k, v in batch.items() if k.startswith("anno_")}
        targets = jax.vmap(
            lambda a: _rasterize_one(a, cfg, stats, gh, gw))(annos)
        rest = {k: v for k, v in batch.items() if not k.startswith("anno_")}
        return {**rest, **targets}

    return apply
