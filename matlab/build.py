"""Build the matcaffe MEX gateway.

Two targets:

* Inside MATLAB (real deployment), from this directory::

      mex +caffe/private/caffe_.cpp $(python3-config --includes) \\
          $(python3-config --ldflags --embed)

  then ``addpath('matlab')`` and use the +caffe package. The MEX binary
  embeds CPython and needs ``deepcut_tpu`` importable (set PYTHONPATH
  before launching MATLAB).

* Test rig (no MATLAB): ``python matlab/build.py`` compiles caffe_.cpp
  against the mex_stub implementation into ``caffe_test.so``, which
  tests/test_matlab_mex.py drives through ctypes using the very same
  mx* API calls MATLAB would make.
"""

from __future__ import annotations

import os
import subprocess
import sysconfig


def build_test_so(verbose: bool = True) -> str:
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "+caffe", "private", "caffe_.cpp")
    stub_dir = os.path.join(here, "mex_stub")
    stub = os.path.join(stub_dir, "mex_stub.cpp")
    out = os.path.join(here, "+caffe", "private", "caffe_test.so")
    py_inc = sysconfig.get_path("include")
    libdir = sysconfig.get_config_var("LIBDIR") or ""
    pylib = f"python{sysconfig.get_python_version()}"
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
           f"-I{stub_dir}", f"-I{py_inc}", "-o", out, src, stub,
           f"-L{libdir}", f"-l{pylib}"]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    print(f"built {build_test_so()}")
