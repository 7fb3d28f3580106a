"""Full-image pose estimation pipeline (drop-in for python/pose/estimate_pose.py).

The reference flow per scale (estimate_pose.py:81-128): pad 64px bottom/right
edge-replicate, bilinear-resize by the scale factor, subtract BGR mean
[104,117,123], paste into a stride-aligned zero canvas, run the CNN (tiled
when > 700px, 224px receptive-field overlap), then argmax+offset decode on
host; the best scale by max-min-joint-confidence wins.

TPU-native redesign:
- preprocessing (pad/resize/mean/canvas) runs on device inside the jit;
- decode is fused on device (pose/decode.py) so only a 5x14 array returns;
- static-shape bucketing: canvas sizes are rounded up to a bucket grid so a
  handful of compiled programs cover arbitrary image sizes, with the argmax
  masked to the true canvas (replaces Caffe's per-image Blob::Reshape);
- the tiling fallback for huge inputs keeps the reference's
  receptive-field-overlap idea (rf=224, cut_off=rf/stride) but with
  stride-aligned tile origins and an exact partition of the global cell
  grid — the reference's 252-px tile step drifts 4 px off the stride-8 grid
  and grows the map by one row/column per seam (see _tile_plan).
"""

from __future__ import annotations

import functools
import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deepcut_tpu.models.resnet import (
    DeeperCutConfig, cast_params, deepercut_config, fold_bn, forward)
from deepcut_tpu.pose.decode import decode_pose, STRIDE, LOCREF_SCALE

from deepcut_tpu.constants import MEAN_BGR  # estimate_pose.py:25
PAD_SIZE = 64                     # estimate_pose.py:89
MAX_SIZE = 700                    # _MAX_SIZE, estimate_pose.py:29
RF = 224                          # receptive field, estimate_pose.py:162


def canvas_size(dim: int, scale: float) -> int:
    """ceil(dim*scale/8)*8 (estimate_pose.py:85-88)."""
    return int(math.ceil(dim * scale / STRIDE) * STRIDE)


def _bucket(v: int, step: int = 64) -> int:
    return int(math.ceil(v / step) * step)


@functools.lru_cache(maxsize=128)
def _bilinear_matrix(in_size: int, out_size: int) -> np.ndarray:
    """PIL-style bilinear resampling matrix (out, in): triangle filter with
    support widened by in/out on downscale (antialiasing), weights
    normalised — matches scipy.misc.imresize's PIL backend closely.

    Resize-as-matmul puts the interpolation on the MXU; the gather-based
    jax.image.resize costs ~10ms for a VGA frame on TPU, this ~0.1ms."""
    scale = in_size / out_size
    fscale = max(scale, 1.0)
    A = np.zeros((out_size, in_size), np.float32)
    support = fscale  # triangle filter radius 1 scaled
    for i in range(out_size):
        center = (i + 0.5) * scale - 0.5
        lo = int(math.floor(center - support))
        hi = int(math.ceil(center + support))
        xs = np.arange(max(lo, 0), min(hi + 1, in_size))
        w = 1.0 - np.abs((xs - center) / fscale)
        w = np.clip(w, 0.0, None)
        s = w.sum()
        if s > 0:
            A[i, xs] = w / s
        else:
            A[i, np.clip(int(round(center)), 0, in_size - 1)] = 1.0
    return A


@functools.partial(jax.jit, static_argnames=("out_h", "out_w", "canvas_h", "canvas_w"))
def preprocess_on_device(image_u8: jax.Array, out_h: int, out_w: int,
                         canvas_h: int, canvas_w: int) -> jax.Array:
    """uint8 BGR HxWx3 -> float canvas (1, canvas_h, canvas_w, 3).

    Edge-replicate 64px pad (bottom/right), bilinear resize to (out_h, out_w)
    via interpolation-matrix matmuls, mean subtraction, top-left paste into a
    zero canvas (crop on overflow). At scale 1 the resize is skipped exactly,
    matching the reference's identity imresize.
    """
    img = image_u8.astype(jnp.float32)
    img = jnp.pad(img, ((0, PAD_SIZE), (0, PAD_SIZE), (0, 0)), mode="edge")
    ph, pw = int(img.shape[0]), int(img.shape[1])
    if (out_h, out_w) != (ph, pw):
        Ah = jnp.asarray(_bilinear_matrix(ph, out_h))
        Aw = jnp.asarray(_bilinear_matrix(pw, out_w))
        # The reference resizes via PIL on uint8 (scipy.misc.imresize): PIL
        # runs a horizontal pass, rounds to uint8, then a vertical pass.
        # Emulating the INTERMEDIATE rounding too cuts the mean deviation
        # 2-4x vs rounding once at the end (measured vs Pillow). PIL's
        # fixed-point accumulate rounds HALF-UP (Resample.c adds
        # 1<<(PRECISION_BITS-1) before the shift), so use floor(x+0.5), not
        # jnp.round's half-to-even — exact-.5 ties occur whenever the
        # in/out ratio has a small denominator.
        img = jnp.einsum("ow,hwc->hoc", Aw, img)
        img = jnp.clip(jnp.floor(img + 0.5), 0.0, 255.0)
        img = jnp.einsum("oh,hwc->owc", Ah, img)
        img = jnp.clip(jnp.floor(img + 0.5), 0.0, 255.0)
    img = img - jnp.asarray(MEAN_BGR, jnp.float32)
    ch = min(canvas_h, out_h)
    cw = min(canvas_w, out_w)
    canvas = jnp.zeros((canvas_h, canvas_w, 3), jnp.float32)
    canvas = canvas.at[:ch, :cw].set(img[:ch, :cw])
    return canvas[None]


class PoseEstimator:
    """Compiled DeeperCut pose estimator with per-bucket program cache."""

    def __init__(
        self,
        params: Dict,
        cfg: Optional[DeeperCutConfig] = None,
        *,
        folded: bool = True,
        bucket_step: int = 64,
        max_size: int = MAX_SIZE,
        mesh=None,
    ):
        """mesh: optional jax.sharding.Mesh with a 'spatial' axis — HD frames
        are then computed full-frame with image rows sharded across chips
        (XLA halo-exchanges conv borders over ICI), replacing the host-side
        tiling loop (BASELINE config 5)."""
        self.cfg = cfg or deepercut_config(152)
        if folded:
            if _has_bn(params):
                params = fold_bn(params, self.cfg)
            # pre-cast weights to the compute dtype: f32 weights would be
            # re-read at 4 B/elem and cast inside EVERY forward (cast_params
            # docstring) — this is half the serving weight HBM traffic
            params = cast_params(params, self.cfg.compute_dtype)
        self.params = params
        self.folded = folded
        self.bucket_step = bucket_step
        self.max_size = max_size
        self.mesh = mesh
        self._int8 = False
        self._int8_deconv = False
        self._fwd_cache: Dict = {}

    @property
    def is_int8(self) -> bool:
        """True once quantize_int8 has switched serving to the int8 path."""
        return self._int8

    def quantize_int8(self, calibration_image: np.ndarray,
                      scale: float = 1.0, *, int8_deconv: bool = False,
                      percentile: float = 100.0) -> None:
        """Switch serving to the int8 path (models/quantize.py): weights get
        per-channel symmetric int8, activation scales are calibrated on the
        given image's preprocessed canvas (one FP forward), and every
        compiled pipeline is rebuilt on forward_int8 — ~1.33 vs 1.93 ms/img
        @688 batch 4 on v5e, `prob` within ~0.1 abs of the bf16 path.

        int8_deconv=True additionally quantizes the transposed-conv head
        weights (throughput-neutral on v5e — round-3 A/B; 4x smaller head
        weights, slightly looser numerics).

        percentile < 100 (e.g. 99.9) clips calibration outliers: the few
        clipped activations saturate while the rest gain resolution —
        insurance against a calibration image with one hot region
        (prepare_int8 docstring; drift A/B in docs/performance.md).

        Call once after construction with a REPRESENTATIVE image; garbage
        calibration (e.g. a zero canvas) yields degenerate scales. A second
        call is a no-op (the float params are gone after the first)."""
        from deepcut_tpu.models.quantize import prepare_int8

        if self._int8:
            return
        # With a spatial mesh the quantized forward shards like the fp one
        # (XLA inserts the conv halo exchanges; forward-only is exact) —
        # only CALIBRATION runs unsharded, so the calibration image must
        # fit a single device (pass a representative <=max_size frame and
        # serve HD afterwards).
        h, w = calibration_image.shape[:2]
        ch, cw = canvas_size(h, scale), canvas_size(w, scale)
        bh, bw = _bucket(ch, self.bucket_step), _bucket(cw, self.bucket_step)
        out_h = int((h + PAD_SIZE) * scale)
        out_w = int((w + PAD_SIZE) * scale)
        canvas = preprocess_on_device(jnp.asarray(calibration_image),
                                      out_h, out_w, bh, bw)
        # calibration runs the FP forward at f32 (folded weights may be bf16)
        fp = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float32)
            if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a,
            self.params)
        qparams, act_scales = prepare_int8(fp, self.cfg, canvas,
                                           quantize_deconv=int8_deconv,
                                           percentile=percentile)
        self.params = {"q": qparams, "s": act_scales}
        self._int8 = True
        self._int8_deconv = int8_deconv
        self._fwd_cache.clear()

    def _net_forward(self):
        """The CNN forward the compiled pipelines trace (bound per closure
        build, so quantize_int8's cache clear rebuilds on the int8 path)."""
        cfg, folded = self.cfg, self.folded
        if self._int8:
            from deepcut_tpu.models.quantize import forward_int8

            use_dq = self._int8_deconv

            def fwd(params, x):
                return forward_int8(params["q"], params["s"],
                                    x.astype(jnp.float32), cfg,
                                    int8_deconv=use_dq,
                                    heads=("pose", "locref"))
            return fwd

        def fwd(params, x):
            return forward(params, x, cfg, folded=folded,
                           heads=("pose", "locref"))
        return fwd

    # -- compiled pieces ---------------------------------------------------
    def _full_pipeline(self, in_h: int, in_w: int, out_h: int, out_w: int,
                       canvas_h: int, canvas_w: int):
        """ONE jit: uint8 image -> pad/resize/mean/canvas -> CNN -> decoded
        pose. Nothing but the 5xJ pose leaves the device."""
        key = ("full", in_h, in_w, out_h, out_w, canvas_h, canvas_w)
        if key not in self._fwd_cache:
            cfg, folded = self.cfg, self.folded
            net_fwd = self._net_forward()

            @jax.jit
            def fn(params, image_u8, valid_h, valid_w, scale):
                canvas = preprocess_on_device.__wrapped__(
                    image_u8, out_h, out_w, canvas_h, canvas_w)
                x = canvas.astype(cfg.compute_dtype if folded else jnp.float32)
                outs = net_fwd(params, x)
                vh = (valid_h + jnp.int32(STRIDE) - 1) // jnp.int32(STRIDE)
                vw = (valid_w + jnp.int32(STRIDE) - 1) // jnp.int32(STRIDE)
                pose = decode_pose(outs["prob"][0], outs["loc_pred"][0],
                                   scale=1.0, valid_hw=(vh, vw))
                pose = pose.at[0].divide(scale).at[1].divide(scale)
                pose = pose.at[3].divide(scale).at[4].divide(scale)
                return pose
            self._fwd_cache[key] = fn
        return self._fwd_cache[key]

    def _forward_decode(self, canvas_h: int, canvas_w: int):
        key = ("fd", canvas_h, canvas_w)
        if key not in self._fwd_cache:
            cfg, folded = self.cfg, self.folded
            net_fwd = self._net_forward()

            @jax.jit
            def fn(params, canvas, valid_h, valid_w, scale):
                outs = net_fwd(params, canvas.astype(
                    cfg.compute_dtype if folded else jnp.float32))
                sm = outs["prob"][0]
                loc = outs["loc_pred"][0]
                vh = (valid_h + jnp.int32(STRIDE) - 1) // jnp.int32(STRIDE)
                vw = (valid_w + jnp.int32(STRIDE) - 1) // jnp.int32(STRIDE)
                pose = decode_pose(sm, loc, scale=1.0, valid_hw=(vh, vw))
                # rescale to original image coordinates
                pose = pose.at[0].divide(scale).at[1].divide(scale)
                pose = pose.at[3].divide(scale).at[4].divide(scale)
                return pose, sm, loc
            self._fwd_cache[key] = fn
        return self._fwd_cache[key]

    def _forward_maps(self, h: int, w: int):
        key = ("fm", h, w)
        if key not in self._fwd_cache:
            cfg, folded = self.cfg, self.folded
            net_fwd = self._net_forward()

            def raw(params, canvas):
                x = canvas.astype(cfg.compute_dtype if folded else jnp.float32)
                outs = net_fwd(params, x)
                return outs["prob"], outs["loc_pred"]

            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                rep = NamedSharding(self.mesh, P())
                row_sharded = NamedSharding(self.mesh, P(None, "spatial", None, None))
                # out shardings left to XLA: the stride-8 grid is generally
                # not divisible by the spatial axis.
                fn = jax.jit(
                    raw,
                    in_shardings=(jax.tree_util.tree_map(lambda _: rep, self.params),
                                  row_sharded),
                )
            else:
                fn = jax.jit(raw)
            self._fwd_cache[key] = fn
        return self._fwd_cache[key]

    # -- public API --------------------------------------------------------
    def estimate_pose(self, image: np.ndarray, scales: Optional[Sequence[float]] = None) -> np.ndarray:
        """image: HxWx3 BGR uint8 (or float). Returns the reference's 5x14
        pose [x, y, conf, off_y, off_x] (reference row order), best scale by
        min-confidence."""
        if scales is None:
            scales = [1.0]
        best_pose, best_conf = None, 0.0
        for s in scales:
            pose = self._estimate_single_scale(image, s)
            minconf = float(np.min(pose[2]))
            if minconf > best_conf:
                best_conf, best_pose = minconf, pose
        # best_pose is None when every scale's min joint confidence is
        # exactly 0 (reference semantics: estimate_pose.py:80,122 —
        # highest_confidence starts at 0.); callers distinguish
        # no-detection from a pose (the HTTP service errors, the PCKh
        # harness scores it as all-miss).
        return best_pose

    # Frames per CNN chunk inside the batched jit. Throughput at 688px PEAKS
    # at 4 and then decays monotonically (batch 8 = 2.14, 16 = 2.26 ms/img:
    # the working set of 688-squared activations outgrows what fits close to
    # the cores). Chunking the batch by 4 INSIDE one jitted program keeps
    # the per-chunk working set at the sweet spot while amortising dispatch:
    # batch 8 -> 1.91, batch 16 -> 1.91 ms/img — measured flat at the
    # batch-4 peak (docs/performance.md round-3 sweep).
    BATCH_CHUNK = 4

    def estimate_pose_batch(self, images: Sequence[np.ndarray],
                            scale: float = 1.0) -> np.ndarray:
        """Batched inference for same-size frames (video serving): chunked
        CNN forwards + fused on-device decode in ONE jitted program;
        returns (N, 5, J). Per-image time stays at the batch-4 peak
        (~1.9 ms/img @688) for any batch size. All frames must share H x W."""
        h, w = images[0].shape[:2]
        for im in images:
            assert im.shape[:2] == (h, w), "estimate_pose_batch needs equal sizes"
        ch, cw = canvas_size(h, scale), canvas_size(w, scale)
        bh, bw = _bucket(ch, self.bucket_step), _bucket(cw, self.bucket_step)
        # scipy.misc.imresize with a float scale TRUNCATES the target size
        # ((np.array(im.size) * scale).astype(int)) — round() would disagree
        # with the reference's resample grid whenever frac >= 0.5
        out_h = int((h + PAD_SIZE) * scale)
        out_w = int((w + PAD_SIZE) * scale)
        canvases = jnp.concatenate(
            [preprocess_on_device(jnp.asarray(im), out_h, out_w, bh, bw)
             for im in images], axis=0)
        key = ("batch", len(images), bh, bw)
        if key not in self._fwd_cache:
            cfg, folded = self.cfg, self.folded
            chunk = self.BATCH_CHUNK
            net_fwd = self._net_forward()

            @jax.jit
            def fn(params, canvases, valid_h, valid_w, s):
                vh = (valid_h + jnp.int32(STRIDE) - 1) // jnp.int32(STRIDE)
                vw = (valid_w + jnp.int32(STRIDE) - 1) // jnp.int32(STRIDE)

                def one(sm, loc):
                    pose = decode_pose(sm, loc, scale=1.0, valid_hw=(vh, vw))
                    pose = pose.at[0].divide(s).at[1].divide(s)
                    return pose.at[3].divide(s).at[4].divide(s)

                x = canvases.astype(cfg.compute_dtype if folded else jnp.float32)
                poses = []
                for i in range(0, x.shape[0], chunk):
                    outs = net_fwd(params, x[i:i + chunk])
                    poses.append(jax.vmap(one)(outs["prob"], outs["loc_pred"]))
                return jnp.concatenate(poses, axis=0)
            self._fwd_cache[key] = fn
        poses = self._fwd_cache[key](self.params, canvases, jnp.int32(ch),
                                     jnp.int32(cw), jnp.float32(scale))
        return np.asarray(poses)

    @staticmethod
    def _pad_batch(n: int) -> int:
        """Padded group size for the mixed-size batch program: 1/2/4, then
        multiples of BATCH_CHUNK — bounds the compile set per bucket to
        O(max_batch / 4) programs instead of one per request-group size."""
        if n <= 4:
            return 1 if n <= 1 else (2 if n == 2 else 4)
        c = PoseEstimator.BATCH_CHUNK
        return ((n + c - 1) // c) * c

    def estimate_pose_many(self, images: Sequence[np.ndarray],
                           scale: float = 1.0) -> np.ndarray:
        """Mixed-size batched serving: images are grouped by canvas BUCKET,
        each group runs the chunked batched program once with PER-IMAGE
        valid extents (decode masks each image's own grid), groups are
        padded to a bounded size ladder to cap compiles, and oversized
        frames fall back to the tiled single path. Returns (N, 5, J) in
        input order; per-image results equal estimate_pose(image, [scale]).

        This is the workhorse of the dynamic-batching HTTP mode
        (examples/pose/serve.py --batch-window): concurrent requests of
        arbitrary sizes share device programs whenever their buckets agree.
        """
        J = self.cfg.num_joints
        out = np.zeros((len(images), 5, J), np.float32)
        groups: Dict[Tuple[int, int], list] = {}
        max_h, max_w = self._max_dims()
        for idx, im in enumerate(images):
            h, w = im.shape[:2]
            ch, cw = canvas_size(h, scale), canvas_size(w, scale)
            if ch > max_h or cw > max_w:  # HD: host-tiled single path
                out[idx] = self._estimate_single_scale(im, scale)
                continue
            bh, bw = _bucket(ch, self.bucket_step), _bucket(cw, self.bucket_step)
            groups.setdefault((bh, bw), []).append((idx, im, ch, cw))
        for (bh, bw), items in groups.items():
            n_pad = self._pad_batch(len(items))
            canvases, vhs, vws = [], [], []
            for _, im, ch, cw in items:
                h, w = im.shape[:2]
                out_h = int((h + PAD_SIZE) * scale)
                out_w = int((w + PAD_SIZE) * scale)
                canvases.append(preprocess_on_device(
                    jnp.asarray(im), out_h, out_w, bh, bw))
                vhs.append(ch)
                vws.append(cw)
            while len(canvases) < n_pad:  # pad the group with a repeat
                canvases.append(canvases[-1])
                vhs.append(vhs[-1])
                vws.append(vws[-1])
            key = ("many", n_pad, bh, bw)
            if key not in self._fwd_cache:
                cfg, folded = self.cfg, self.folded
                chunk = self.BATCH_CHUNK
                net_fwd = self._net_forward()

                @jax.jit
                def fn(params, canvases, vhs, vws, s):
                    def one(sm, loc, vh, vw):
                        gh = (vh + jnp.int32(STRIDE) - 1) // jnp.int32(STRIDE)
                        gw = (vw + jnp.int32(STRIDE) - 1) // jnp.int32(STRIDE)
                        pose = decode_pose(sm, loc, scale=1.0,
                                           valid_hw=(gh, gw))
                        pose = pose.at[0].divide(s).at[1].divide(s)
                        return pose.at[3].divide(s).at[4].divide(s)

                    x = canvases.astype(
                        cfg.compute_dtype if folded else jnp.float32)
                    poses = []
                    for i in range(0, x.shape[0], chunk):
                        outs = net_fwd(params, x[i:i + chunk])
                        poses.append(jax.vmap(one)(
                            outs["prob"], outs["loc_pred"],
                            vhs[i:i + chunk], vws[i:i + chunk]))
                    return jnp.concatenate(poses, axis=0)
                self._fwd_cache[key] = fn
            poses = np.asarray(self._fwd_cache[key](
                self.params, jnp.concatenate(canvases, axis=0),
                jnp.asarray(vhs, jnp.int32), jnp.asarray(vws, jnp.int32),
                jnp.float32(scale)))
            for slot, (idx, *_rest) in enumerate(items):
                out[idx] = poses[slot]
        return out

    def estimate_pose_avg(self, image: np.ndarray,
                          scales: Sequence[float]) -> np.ndarray:
        """Multi-scale pyramid with SCOREMAP AVERAGING: each scale's maps are
        resampled to the scale-1 grid and averaged before a single decode
        (the DeeperCut TF-style fusion; the reference CLI instead keeps the
        best single scale — see estimate_pose).

        Everything stays on device: per-scale maps are resampled by
        interpolation-matrix matmuls and accumulated as device arrays; only
        the final 5xJ pose crosses to the host (the host-numpy resample of
        round 1 cost two full-map D2H fetches per scale)."""
        h, w = image.shape[:2]
        gh = canvas_size(h, 1.0) // int(STRIDE)
        gw = canvas_size(w, 1.0) // int(STRIDE)
        acc_sm = acc_loc = None
        for s in scales:
            sm, loc = self._scoremaps_dev(image, s)
            Ah = jnp.asarray(_bilinear_matrix(int(sm.shape[0]), gh))
            Aw = jnp.asarray(_bilinear_matrix(int(sm.shape[1]), gw))

            def resample(m):
                m = jnp.einsum("ow,hwc->hoc", Aw, m)
                return jnp.einsum("oh,hwc->owc", Ah, m)
            acc_sm = resample(sm) if acc_sm is None else acc_sm + resample(sm)
            lr = resample(loc) / s
            acc_loc = lr if acc_loc is None else acc_loc + lr
        n = float(len(scales))
        return np.asarray(decode_pose(acc_sm / n, acc_loc / n))

    def _max_dims(self):
        nsp = 1
        if self.mesh is not None:
            nsp = dict(zip(self.mesh.axis_names, self.mesh.devices.shape)).get("spatial", 1)
        return self.max_size * nsp, self.max_size

    def _estimate_single_scale(self, image: np.ndarray, scale: float) -> np.ndarray:
        h, w = image.shape[:2]
        ch, cw = canvas_size(h, scale), canvas_size(w, scale)
        max_h, max_w = self._max_dims()
        if ch > max_h or cw > max_w:
            sm, loc = self._scoremaps_tiled(image, scale)
            pose = decode_pose(jnp.asarray(sm), jnp.asarray(loc), scale=scale)
            return np.asarray(pose)
        bh, bw = _bucket(ch, self.bucket_step), _bucket(cw, self.bucket_step)
        # scipy.misc.imresize with a float scale TRUNCATES the target size
        # ((np.array(im.size) * scale).astype(int)) — round() would disagree
        # with the reference's resample grid whenever frac >= 0.5
        out_h = int((h + PAD_SIZE) * scale)
        out_w = int((w + PAD_SIZE) * scale)
        fn = self._full_pipeline(h, w, out_h, out_w, bh, bw)
        pose = fn(self.params, jnp.asarray(image), jnp.int32(ch), jnp.int32(cw),
                  jnp.float32(scale))
        return np.asarray(pose)

    def scoremaps(self, image: np.ndarray, scale: float = 1.0, *,
                  exact: bool = False) -> Tuple[np.ndarray, np.ndarray]:
        """Full scoremaps + locref for an image (host numpy). HD frames run
        spatially sharded over the mesh when one is configured, else
        host-tiled. exact=True forces the bit-exact path (host tiling with
        the reference's seam arithmetic) when mesh sharding would need
        boundary padding — see _scoremaps_dev."""
        sm, loc = self._scoremaps_dev(image, scale, exact=exact)
        return np.asarray(sm, np.float32), np.asarray(loc, np.float32)

    def _scoremaps_dev(self, image: np.ndarray, scale: float = 1.0, *,
                       exact: bool = False) -> Tuple[jax.Array, jax.Array]:
        """Device-resident scoremaps (no D2H fetch)."""
        h, w = image.shape[:2]
        ch, cw = canvas_size(h, scale), canvas_size(w, scale)
        max_h, max_w = self._max_dims()
        if ch > max_h or cw > max_w:
            sm, loc = self._scoremaps_tiled(image, scale)
            return jnp.asarray(sm), jnp.asarray(loc)
        # scipy.misc.imresize with a float scale TRUNCATES the target size
        # ((np.array(im.size) * scale).astype(int)) — round() would disagree
        # with the reference's resample grid whenever frac >= 0.5
        out_h = int((h + PAD_SIZE) * scale)
        out_w = int((w + PAD_SIZE) * scale)
        pad_h = ch
        if self.mesh is not None:
            # canvas rows must divide evenly across the 'spatial' axis. When
            # they already do (e.g. 688 with any power-of-two axis) the
            # sharded result is exact; otherwise the zero-row padding can
            # perturb scoremap rows within the receptive field of the bottom
            # edge (ceil-mode pooling pads -inf, zeros differ) — same class
            # of boundary effect the reference's tiling seam-trim accepts.
            # Callers needing exactness pass exact=True: non-dividing frames
            # then take the host-tiled path instead.
            nsp = self._max_dims()[0] // self.max_size
            step = int(STRIDE) * max(nsp, 1)
            pad_h = -(-ch // step) * step
            if pad_h != ch and exact:
                sm, loc = self._scoremaps_tiled(image, scale)
                return jnp.asarray(sm), jnp.asarray(loc)
        canvas = preprocess_on_device(jnp.asarray(image), out_h, out_w, ch, cw)
        if pad_h != ch:
            canvas = jnp.pad(canvas, ((0, 0), (0, pad_h - ch), (0, 0), (0, 0)))
        sm, loc = self._forward_maps(pad_h, cw)(self.params, canvas)
        gh = ch // int(STRIDE)
        return sm[0][:gh], loc[0][:gh]

    # -- tiling (estimate_pose.py:146-221, STRIDE-ALIGNED correction) -----
    def _scoremaps_tiled(self, image: np.ndarray, scale: float) -> Tuple[np.ndarray, np.ndarray]:
        """Host-tiled HD scoremaps. The reference steps tiles by
        max_size - 2*RF = 252 px, which is not a multiple of the stride-8
        grid: every tile after the first computes cells offset 4 px from the
        global grid, and the seam-trimmed concatenation carries one extra
        row/column per seam (e.g. 134 vs 133 columns at canvas 1064). We
        keep the reference's receptive-field-overlap idea but round the tile
        step DOWN to a stride multiple and trim tiles to an exact partition
        of the global cell grid, so the tiled result lands on the same grid
        as (and, outside tile-boundary effects, equals) the full-frame
        computation — tested in tests/test_estimate.py."""
        h, w = image.shape[:2]
        ch, cw = canvas_size(h, scale), canvas_size(w, scale)
        # scipy.misc.imresize with a float scale TRUNCATES the target size
        # ((np.array(im.size) * scale).astype(int)) — round() would disagree
        # with the reference's resample grid whenever frac >= 0.5
        out_h = int((h + PAD_SIZE) * scale)
        out_w = int((w + PAD_SIZE) * scale)
        canvas = np.asarray(
            preprocess_on_device(jnp.asarray(image), out_h, out_w, ch, cw)[0]
        )
        plan_y = _tile_plan(ch, self.max_size)
        plan_x = _tile_plan(cw, self.max_size)
        rows_sm, rows_loc = [], []
        for (sy, ey, ay, by) in plan_y:
            row_sm, row_loc = [], []
            for (sx, ex, ax, bx) in plan_x:
                tile = canvas[sy:ey, sx:ex]
                th = int(math.ceil(tile.shape[0] / STRIDE) * STRIDE)
                tw = int(math.ceil(tile.shape[1] / STRIDE) * STRIDE)
                buf = np.zeros((th, tw, 3), np.float32)
                buf[:tile.shape[0], :tile.shape[1]] = tile
                sm, loc = self._forward_maps(th, tw)(self.params, jnp.asarray(buf)[None])
                sm = np.asarray(sm[0], np.float32)[ay:by, ax:bx]
                loc = np.asarray(loc[0], np.float32)[ay:by, ax:bx]
                row_sm.append(sm)
                row_loc.append(loc)
            rows_sm.append(np.concatenate(row_sm, axis=1))
            rows_loc.append(np.concatenate(row_loc, axis=1))
        return np.concatenate(rows_sm, axis=0), np.concatenate(rows_loc, axis=0)


def _has_bn(params: Dict) -> bool:
    return any(k.startswith("bn") for k in params)


def _num_tiles(length: int, max_size: int, rf: int) -> int:
    """The reference's tile-count formula (estimate_pose.py:146-156).
    Retained as a parity oracle (tests pin it); the tiled path itself uses
    `_tile_plan`, whose stride-aligned step can need one more tile."""
    if length <= max_size:
        return 1
    k = 0
    while True:
        new_size = (max_size - rf) * 2 + (max_size - 2 * rf) * k
        if new_size > length:
            break
        k += 1
    return 2 + k


def _tile_plan(length: int, max_size: int) -> List[Tuple[int, int, int, int]]:
    """Stride-aligned tiling plan: list of (start_px, end_px, keep_from_cell,
    keep_to_cell) — keep ranges are tile-local and partition the global
    ceil(length/STRIDE) cell grid exactly. Tile origins are multiples of
    STRIDE (unlike the reference's 252-px step), and every kept cell has at
    least RF pixels of context inside its tile except at the frame borders
    (where the full-frame computation has none either — same contract as
    estimate_pose.py's seam trim)."""
    stride, rf = int(STRIDE), int(RF)
    grid = -(-length // stride)
    if length <= max_size:
        return [(0, length, 0, grid)]
    cut = rf // stride
    step = ((max_size - 2 * rf) // stride) * stride
    n = -(-(length - max_size) // step) + 1
    plan = []
    for i in range(n):
        s = i * step
        e = min(s + max_size, length)
        o = s // stride
        a = 0 if i == 0 else o + cut
        b = grid if i == n - 1 else (i + 1) * step // stride + cut
        plan.append((s, e, a - o, b - o))
    return plan


_MODEL_CACHE: Dict = {}


def get_estimator(model_def: str = "", model_bin: str = "") -> "PoseEstimator":
    """Cached PoseEstimator for (model_def, model_bin) — the module-global
    model cache of the reference (estimate_pose.py:69-75)."""
    key = (model_def, model_bin)
    if key not in _MODEL_CACHE:
        if model_bin:
            from deepcut_tpu.proto.caffemodel import load_deepercut_params
            params = {k: {kk: jnp.asarray(vv) for kk, vv in v.items()}
                      for k, v in load_deepercut_params(model_bin).items()}
        else:
            from deepcut_tpu.models.resnet import init_params
            params = init_params(jax.random.PRNGKey(0), deepercut_config(152))
        _MODEL_CACHE[key] = PoseEstimator(params)
    return _MODEL_CACHE[key]


def estimate_pose(image: np.ndarray, model_def: str = "", model_bin: str = "",
                  scales: Optional[Sequence[float]] = None) -> np.ndarray:
    """Reference-compatible convenience wrapper (estimate_pose.py:37).

    model_bin may be a .caffemodel path; the model is cached module-globally
    like the reference's _MODEL."""
    return get_estimator(model_def, model_bin).estimate_pose(image, scales)
