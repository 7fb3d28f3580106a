"""Native runtime components (C++ via ctypes).

`librasterizer` accelerates the target-rasterization hot path of the input
pipeline — the role pose_data_layer.cpp's C++ plays in the reference. The
Python/numpy implementation remains the semantic oracle and the fallback
when the shared library hasn't been built.

Build once per machine:  python -m deepcut_tpu.runtime.build
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

LIB_DIR = os.path.dirname(os.path.abspath(__file__))
LIB_PATH = os.path.join(LIB_DIR, "librasterizer.so")


def load_library() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(LIB_PATH)
    except OSError:
        return None
    import numpy as np
    from numpy.ctypeslib import ndpointer

    f32 = ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32 = ndpointer(np.int32, flags="C_CONTIGUOUS")
    i64 = ndpointer(np.int64, flags="C_CONTIGUOUS")
    u8 = ndpointer(np.uint8, flags="C_CONTIGUOUS")
    c = ctypes.c_int
    cf = ctypes.c_float
    lib.dc_rasterize.restype = ctypes.c_int
    lib.dc_rasterize.argtypes = [
        i32, f32, i32, c,          # entries
        i64, c, c, c,              # joint_index, num_people, J, skip_class
        c, c, c, c,                # th, tw, sh, sw
        cf, cf, c, cf,             # scale, fg_threshold, soft, sigma
        c, c, c,                   # multi_label, no_bg, use_fg_fraction
        c, c,                      # locref, allreg
        i32, f32, f32, c,          # edges, means, stds, E
        f32, f32, f32, f32, f32,   # labels, loc_t, loc_w, next_t, next_w
        u8, f32,                   # sample_mask, min_distance
    ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return load_library() is not None
