"""Build the native runtime library: python -m deepcut_tpu.runtime.build"""

from __future__ import annotations

import os
import subprocess
import sys

SRC = ["rasterizer.cpp"]


def build(verbose: bool = True) -> str:
    here = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join(here, "librasterizer.so")
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-o", out] + [os.path.join(here, s) for s in SRC]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    path = build()
    print(f"built {path}")
    import deepcut_tpu.runtime as rt
    sys.exit(0 if rt.available() else 1)
