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
