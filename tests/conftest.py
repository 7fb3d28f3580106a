"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's device/dtype-matrix strategy
(include/caffe/test/test_caffe_main.hpp): there, CPU mode is the oracle for
GPU; here, jax-CPU is the oracle platform and the same code compiles for TPU
unchanged. Multi-chip sharding tests use the 8 virtual CPU devices.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_default_matmul_precision", "highest")
