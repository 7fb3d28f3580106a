"""R-CNN-style windowed detector (reference: python/caffe/detector.py).

Crops windows (optionally with context padding), warps to the net input
size, and classifies each window batch-wise.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import deepcut_tpu.compat as caffe
from deepcut_tpu import io as dio


class Detector(caffe.Net):
    def __init__(self, model_file: str, pretrained_file: Optional[str] = None,
                 mean: Optional[np.ndarray] = None,
                 input_scale: Optional[float] = None,
                 raw_scale: Optional[float] = None,
                 channel_swap: Optional[Sequence[int]] = None,
                 context_pad: int = 0):
        super().__init__(model_file, pretrained_file, caffe.TEST)
        in_ = self.inputs[0]
        self.transformer = dio.Transformer({in_: self.blobs[in_].shape})
        self.transformer.set_transpose(in_, (2, 0, 1))
        if mean is not None:
            self.transformer.set_mean(in_, mean)
        if input_scale is not None:
            self.transformer.set_input_scale(in_, input_scale)
        if raw_scale is not None:
            self.transformer.set_raw_scale(in_, raw_scale)
        if channel_swap is not None:
            self.transformer.set_channel_swap(in_, channel_swap)
        self.context_pad = context_pad
        # input-space mean canvas for context padding (reference
        # detector.py _configure_crop: the transformer mean deprocessed back
        # to the image domain — inverse channel swap, inverse raw_scale)
        dims = self.blobs[in_].shape[2:]
        channels = self.blobs[in_].shape[1]
        self.crop_dims = (int(dims[0]), int(dims[1]), int(channels))
        if mean is None:
            cm = np.zeros((1, 1, channels), np.float32)
        else:
            m = np.asarray(mean, np.float32)
            if m.ndim == 3:
                # full spatial mean (C,H,W) -> HWC canvas, like the
                # reference's _configure_crop transpose (detector.py:196-218)
                cm = m.transpose(1, 2, 0).copy()
            else:
                cm = m.reshape(1, 1, -1).copy()
            if channel_swap is not None:
                inv = [list(channel_swap).index(i) for i in range(channels)]
                cm = cm[:, :, inv]
            if raw_scale is not None:
                cm = cm / raw_scale
        self.crop_mean = cm

    def detect_windows(self, images_windows: Sequence[Tuple[str, np.ndarray]]) -> List[Dict]:
        window_inputs = []
        for image_fname, windows in images_windows:
            image = dio.load_image(image_fname)
            for window in windows:
                window_inputs.append(self.crop(image, window))
        in_ = self.inputs[0]
        dims = self.blobs[in_].shape[2:]
        data = np.stack([
            self.transformer.preprocess(in_, dio.resize_image(wi, dims))
            for wi in window_inputs])
        out = self.forward_all(**{in_: data})[self.outputs[0]]
        predictions = out.reshape(len(window_inputs), -1)
        detections = []
        ix = 0
        for image_fname, windows in images_windows:
            for window in windows:
                detections.append({
                    "window": window,
                    "prediction": predictions[ix],
                    "filename": image_fname,
                })
                ix += 1
        return detections

    def crop(self, im: np.ndarray, window) -> np.ndarray:
        """Crop a window (ymin, xmin, ymax, xmax) — reference
        detector.py:125-178 semantics: plain crops are EXCLUSIVE slices;
        with context_pad the box is scaled about its center, the clipped
        image content resized, and embedded at its true offset into a
        mean-filled crop_dims canvas (so out-of-image context is mean,
        not stretched pixels)."""
        window = np.asarray(window)
        crop = im[int(window[0]):int(window[2]), int(window[1]):int(window[3])]
        if not self.context_pad:
            return crop

        box = window.astype(np.float64).copy()
        crop_h0, crop_w0 = self.crop_dims[0], self.crop_dims[1]
        crop_size = crop_w0  # reference assumes square net input
        scale = crop_size / (1.0 * crop_size - self.context_pad * 2)
        half_h = (box[2] - box[0] + 1) / 2.0
        half_w = (box[3] - box[1] + 1) / 2.0
        center = (box[0] + half_h, box[1] + half_w)
        scaled_dims = scale * np.array((-half_h, -half_w, half_h, half_w))
        box = np.round(np.tile(center, 2) + scaled_dims)
        full_h = box[2] - box[0] + 1
        full_w = box[3] - box[1] + 1
        scale_h = crop_size / full_h
        scale_w = crop_size / full_w
        pad_y = int(round(max(0.0, -box[0]) * scale_h))
        pad_x = int(round(max(0.0, -box[1]) * scale_w))

        im_h, im_w = im.shape[:2]
        box = np.clip(box, 0.0, [im_h, im_w, im_h, im_w])
        clip_h = box[2] - box[0] + 1
        clip_w = box[3] - box[1] + 1
        assert clip_h > 0 and clip_w > 0
        crop_h = int(round(clip_h * scale_h))
        crop_w = int(round(clip_w * scale_w))
        crop_h = min(crop_h, crop_size - pad_y)
        crop_w = min(crop_w, crop_size - pad_x)

        context_crop = im[int(box[0]):int(box[2]), int(box[1]):int(box[3])]
        context_crop = dio.resize_image(
            np.asarray(context_crop, np.float32), (crop_h, crop_w))
        out = np.ones(self.crop_dims, np.float32) * self.crop_mean
        out[pad_y:pad_y + crop_h, pad_x:pad_x + crop_w] = context_crop
        return out
