"""ON-DEVICE image augmentation: the affine warp + scale + canvas prep as
two matmul-form resampling passes inside the train step's XLA program.

Why: the host input pipeline's only irreducible costs are JPEG decode and
the affine warp (docs/performance.md "Input pipeline"). On a host with few
cores (this rig has ONE), the warp cannot be parallelized away — but it CAN
be deleted: ship the decoded uint8 image and 6 affine coefficients, and let
the device do the warp where a 600x800 resample is ~1 ms of mostly-MXU work
instead of ~10 ms of host numpy/cv2. Reference analog: the GPU-side
Transform path the reference reserves for simple mean/crop
(data_transformer.cpp) — generalized here to the full rotation+scale+canvas
pipeline of pose_data_layer.cpp:627-667.

Design (TPU-first; no gathers): the inverse map factors into two passes
that each resample along ONE axis (pose/augment.device_warp_coef). Each
pass is a weighted contraction with bilinear triangle weights built
on-the-fly from an iota — XLA fuses the weight construction into the
contraction, blocks of 16 canvas rows bound the weight working set, and
the whole thing rides `lax.map`/einsum with f32 accumulation. A gather
formulation would serialize on TPU (measured ~10 ms/frame for gather
resize; docs/performance.md "What buys the speed" #5).

Semantics vs the host path (data/pipeline.load_canvas with cv2):
- the two-pass shear factorization is itself an approximation at nonzero
  rotation: pass 1 samples raw rows at a per-column coordinate that tilts
  by up to |b| ~ tan(max_rotation) across the bilinear footprint, a
  sheared-tent kernel (Catmull-Smith), exact single-pass bilinear only
  when b == 0 (rotation 0). cv2 additionally quantizes sample coords to
  1/32 px. The joint drift of both effects is bounded by
  tests/test_augment_device.py::test_rotation_scale_close_to_cv2
  (max <= 8 grey levels, mean < 0.1 on band-limited images);
- the host's uint8 truncation of the warped image before the canvas paste
  is reproduced exactly (floor), as are the mean-fill border, the 64-px
  edge-replication band, and the mean region beyond it — at rotation=0,
  scale=1 the device canvas equals the host canvas bit-for-bit (tested);
- joint coordinates are transformed on the HOST (exact, cheap), so targets
  and the RNG stream are IDENTICAL to the host-augment path; only image
  pixels carry the (characterized) filter drift.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from deepcut_tpu.constants import MEAN_BGR

# must match data/pipeline.PAD_BORDER (pose_data_layer.cpp:637)
PAD_BORDER = 64

# canvas rows per weight block: bounds the per-step weight working set to
# (batch, 16, raw_w, raw_h) f32 (~40 MB/sample-block at 600x800 raws)
_ROW_BLOCK = 16


def _warp_one(raw: jax.Array, coef: jax.Array, nhw: jax.Array,
              ih: int, iw: int, y0=0.0) -> jax.Array:
    """One sample: (RH, RW, 3) uint8 mean-padded raw -> (ih, iw, 3) f32
    mean-subtracted canvas. coef = [a b c d e f] (device_warp_coef);
    nhw = [nh nw input_h input_w]: the warped-image size before the
    edge-pad/crop, and the per-sample canvas size the host path would have
    produced (the bucket beyond it is zero-filled, like _collate).

    y0: first GLOBAL canvas row this call produces (traced scalar allowed).
    The shard_map spatial path passes shard_index * local_ih so each shard
    computes only its own row block — bit-equal to the corresponding rows
    of the y0=0 full canvas as long as y0 % _ROW_BLOCK == 0 (the einsum row
    blocks then tile identically)."""
    rh, rw = raw.shape[0], raw.shape[1]
    a, b, c, d, e, f = (coef[i] for i in range(6))
    nh, nw, sh, sw = nhw[0], nhw[1], nhw[2], nhw[3]
    mean = jnp.asarray(MEAN_BGR, jnp.float32)
    # mean-padded raw => 0 outside the real image after the subtract, so
    # border taps blend toward the mean exactly like cv2 BORDER_CONSTANT
    rawf = raw.astype(jnp.float32) - mean
    x = jnp.arange(iw, dtype=jnp.float32)
    y = jnp.asarray(y0, jnp.float32) + jnp.arange(ih, dtype=jnp.float32)
    # the 64-px edge-replication band (np.pad mode="edge" in the host
    # path) == clamping the canvas coordinate before the affine map
    x_eff = jnp.minimum(x, nw - 1.0)
    y_eff = jnp.minimum(y, nh - 1.0)
    r_idx = jnp.arange(rh, dtype=jnp.float32)  # raw rows (pass-1 taps)
    q_idx = jnp.arange(rw, dtype=jnp.float32)  # raw cols (pass-2 taps)
    xs_raw = jnp.arange(rw, dtype=jnp.float32)

    def block(ye):
        # pass 1 (vertical): img1[y, x'] = raw(a*y_eff + b*x' + c, x')
        p1 = a * ye[:, None] + b * xs_raw[None, :] + c        # (YB, RW)
        wv = jnp.maximum(0.0, 1.0 - jnp.abs(p1[:, :, None] - r_idx))
        img1 = jnp.einsum("yxr,rxc->yxc", wv, rawf,
                          preferred_element_type=jnp.float32)  # (YB, RW, 3)
        # pass 2 (horizontal): out[y, x] = img1(y, d*x_eff + e*y_eff + f)
        p2 = d * x_eff[None, :] + e * ye[:, None] + f         # (YB, iw)
        wu = jnp.maximum(0.0, 1.0 - jnp.abs(p2[:, :, None] - q_idx))
        return jnp.einsum("yxq,yqc->yxc", wu, img1,
                          preferred_element_type=jnp.float32)  # (YB, iw, 3)

    if ih % _ROW_BLOCK:
        raise ValueError(f"canvas height {ih} not a multiple of "
                         f"{_ROW_BLOCK} (bucket_step must be)")
    out = jax.lax.map(block, y_eff.reshape(ih // _ROW_BLOCK, _ROW_BLOCK))
    out = out.reshape(ih, iw, 3)
    # host path truncates the warped float image to uint8 before the paste
    # (load_canvas: warp -> astype(uint8)); reproduce it exactly
    out = jnp.clip(jnp.floor(out + mean), 0.0, 255.0) - mean
    # the host canvas is (input_h, input_w) — the edge-pad band is cropped
    # there (prepare_canvas ch/cw) and _collate zero-pads the bucket beyond
    # it; beyond the band itself the canvas is mean-filled (== 0 here)
    band = ((y[:, None] < jnp.minimum(nh + PAD_BORDER, sh))
            & (x[None, :] < jnp.minimum(nw + PAD_BORDER, sw)))
    return jnp.where(band[:, :, None], out, 0.0)


def warp_batch(batch):
    """Replace a raw-image augmented batch's `image_raw`/`aug_*` entries
    with the warped float32 canvas under key `image`. No-op for batches
    without `image_raw` (host-warped or inference batches) — safe to apply
    unconditionally inside any train step, mirroring the device-target
    rasterizer pattern (pose/targets_device.make_batch_rasterizer)."""
    if "image_raw" not in batch:
        return batch
    batch = dict(batch)
    raw = batch.pop("image_raw")      # (B, RH, RW, 3) uint8, mean-padded
    coef = batch.pop("aug_coef")      # (B, 6) f32
    nhw = batch.pop("aug_nhw")        # (B, 4) f32
    token = batch.pop("aug_canvas")   # (B, ih, iw, 0) uint8 — zero bytes;
    ih, iw = int(token.shape[1]), int(token.shape[2])  # shape IS the payload
    batch["image"] = jax.vmap(
        lambda r, cf, nn: _warp_one(r, cf, nn, ih, iw))(raw, coef, nhw)
    return batch


def warp_batch_local(batch, axis: str = "spatial"):
    """warp_batch's shard_map twin for the spatial training path
    (parallel/spatial.py): raw images + coefficients arrive REPLICATED over
    `axis` while the canvas token arrives row-sharded, and each shard warps
    only its own canvas row block (global rows [idx*lh, (idx+1)*lh)).

    No halos are needed — the warp's source is the replicated raw image, so
    row-block outputs are independent; the per-shard rows are bit-equal to
    the corresponding rows of the full-canvas warp_batch (the einsum row
    blocks tile identically because the shape contract guarantees
    local_ih % _ROW_BLOCK == 0), and the warp cost divides by the axis size
    instead of being paid per shard. No-op without `image_raw`."""
    if "image_raw" not in batch:
        return batch
    batch = dict(batch)
    raw = batch.pop("image_raw")      # (Bl, RH, RW, 3) — spatial-replicated
    coef = batch.pop("aug_coef")      # (Bl, 6)
    nhw = batch.pop("aug_nhw")        # (Bl, 4)
    token = batch.pop("aug_canvas")   # (Bl, ih_local, iw, 0) — row-sharded
    ih, iw = int(token.shape[1]), int(token.shape[2])
    y0 = (lax.axis_index(axis) * ih).astype(jnp.float32)
    batch["image"] = jax.vmap(
        lambda r, cf, nn: _warp_one(r, cf, nn, ih, iw, y0=y0))(raw, coef, nhw)
    return batch
