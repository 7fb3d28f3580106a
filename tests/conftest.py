"""Test configuration.

Mirrors the reference's device-matrix strategy
(include/caffe/test/test_caffe_main.hpp): the same op/graph code must agree
with independent oracles on every platform. Under the driver, this suite runs
on whatever JAX platform is live (the TPU chip when attached via the axon
plugin, CPU otherwise) — the numerics tests use float32 compute paths so
tolerances hold on both.

Multi-device (mesh/sharding) tests cannot assume >1 local accelerator; they
launch subprocesses with a scrubbed environment (`cpu_subprocess_env`) that
forces an 8-device virtual CPU platform.
"""

import os
import subprocess
import sys

import pytest

import jax

jax.config.update("jax_default_matmul_precision", "highest")


def cpu_subprocess_env(n_devices: int = 8):
    """Env for a subprocess with n virtual CPU devices (no TPU plugin)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_devices}"
    return env


@pytest.fixture
def run_in_cpu_mesh():
    """Run a python snippet in an 8-virtual-device CPU subprocess."""

    def runner(code: str, n_devices: int = 8, timeout: int = 600):
        proc = subprocess.run(
            [sys.executable, "-c", code],
            env=cpu_subprocess_env(n_devices),
            capture_output=True, text=True, timeout=timeout,
            cwd="/root/repo",
        )
        if proc.returncode != 0:
            raise AssertionError(
                f"subprocess failed:\nstdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-4000:]}"
            )
        return proc.stdout
    return runner
