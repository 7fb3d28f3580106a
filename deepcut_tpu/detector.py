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
        """Crop a window (ymin, xmin, ymax, xmax) with optional context pad."""
        window = np.asarray(window, int)
        if self.context_pad:
            in_ = self.inputs[0]
            crop_size = self.blobs[in_].shape[2]
            scale = crop_size / (crop_size - 2.0 * self.context_pad)
            half_h = (window[2] - window[0] + 1) / 2.0
            half_w = (window[3] - window[1] + 1) / 2.0
            center = (window[0] + half_h, window[1] + half_w)
            scaled = np.array((center[0] - half_h * scale,
                               center[1] - half_w * scale,
                               center[0] + half_h * scale,
                               center[1] + half_w * scale), int)
            window = np.clip(scaled, 0, [im.shape[0] - 1, im.shape[1] - 1,
                                         im.shape[0] - 1, im.shape[1] - 1])
        return im[window[0]:window[2] + 1, window[1]:window[3] + 1]
