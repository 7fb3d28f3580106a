"""Training objective for the DeeperCut part detector.

Combines the fork's three losses exactly as the training prototxt wires them
(SURVEY §2.3; reference layers: SoftmaxWithLossVec with cross_entropy on the
part scoremaps, SmoothL1Loss on location-refinement and pairwise targets,
each with elementwise weight maps from PoseDataLayer).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from deepcut_tpu.models.resnet import DeeperCutConfig, forward
from deepcut_tpu.ops import losses as loss_ops


def pose_loss(
    outputs: Dict[str, jax.Array],
    batch: Dict[str, jax.Array],
    cfg: DeeperCutConfig,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """batch keys (all NHWC, stride-8 grid):
      part_score_targets (N,h,w,J), part_score_weights (N,h,w,J),
      locref_targets (N,h,w,2J), locref_weights,
      pairwise_targets (N,h,w,2J(J-1)), pairwise_weights  [optional]
    """
    ce = loss_ops.make_softmax_loss_vec(cross_entropy=True)
    losses = {}
    losses["part_loss"] = ce(
        outputs["fc_pose"], batch["part_score_targets"],
        batch.get("part_score_weights"),
    )
    total = losses["part_loss"]
    if cfg.location_refinement and "locref_targets" in batch:
        losses["locref_loss"] = loss_ops.smooth_l1_loss(
            outputs["loc_pred"], batch["locref_targets"], batch.get("locref_weights")
        )
        total = total + losses["locref_loss"]
    if cfg.pairwise and "pairwise_targets" in batch:
        losses["pairwise_loss"] = loss_ops.smooth_l1_loss(
            outputs["next_pred"], batch["pairwise_targets"], batch.get("pairwise_weights")
        )
        total = total + losses["pairwise_loss"]
    losses["total_loss"] = total
    return total, losses


def loss_fn(params, batch, cfg: DeeperCutConfig):
    outputs = forward(params, batch["image"], cfg, folded=False)
    return pose_loss(outputs, batch, cfg)


def bn_frozen_mults(params) -> Dict[str, Dict[str, float]]:
    """Per-leaf lr/decay multipliers freezing the BatchNorm statistics.

    The reference model pins all three BatchNorm blobs (mean/var/
    scale_factor) at lr_mult 0 and runs use_global_stats
    (ResNet-152.prototxt:30-34) — the stats are constants during
    fine-tuning, immune to both the gradient step and weight decay
    (sgd_solver.cpp Regularize/ComputeUpdateValue both scale by the local
    rate). Scale layers' gamma/beta keep the default multiplier 1. The
    native update paths (parallel.make_train_step, PoseSolver,
    parallel/spatial.py) apply this by default; pass explicit
    lr_mults/decay_mults to override.
    """
    return {name: {k: (0.0 if name.startswith("bn") else 1.0) for k in entry}
            for name, entry in params.items()}
