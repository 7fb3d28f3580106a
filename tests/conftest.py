"""Test configuration.

Mirrors the reference's device-matrix strategy
(include/caffe/test/test_caffe_main.hpp): the op/graph code must agree with
independent oracles; the same code compiles for TPU unchanged.

Platform policy: the suite runs on a virtual 8-device CPU platform. On this
rig the TPU is attached through the axon plugin with remote compilation
(~10-60 s per jitted shape); the suite compiles hundreds of shapes, which
would take an hour on-TPU for zero extra signal — the numerics are
platform-agnostic and real-TPU behaviour is covered by bench.py,
__graft_entry__, and the dedicated pallas/TPU checks. If the interpreter was
started with the axon platform forced (sitecustomize imports jax before any
test code can choose), conftest re-execs pytest once with a scrubbed
environment.

Multi-device (mesh/sharding) tests launch subprocesses with the same
scrubbed env (`cpu_subprocess_env`).
"""

import os
import subprocess
import sys

_MARK = "DEEPCUT_TPU_TESTS_REEXECED"

import pytest


def _needs_reexec() -> bool:
    # DEEPCUT_TPU_REAL=1 keeps the live (TPU) platform: used for the opt-in
    # `-m tpu` hardware pass (`DEEPCUT_TPU_REAL=1 pytest -m tpu`).
    return (os.environ.get(_MARK) != "1"
            and os.environ.get("DEEPCUT_TPU_REAL") != "1"
            and os.environ.get("JAX_PLATFORMS", "") != "cpu")


def pytest_collection_modifyitems(config, items):
    import jax

    if jax.default_backend() == "cpu":
        skip = pytest.mark.skip(
            reason="needs real TPU hardware (DEEPCUT_TPU_REAL=1 pytest -m tpu)")
        for item in items:
            if "tpu" in item.keywords:
                item.add_marker(skip)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: opt-in tests that must run on real TPU hardware")
    if _needs_reexec():
        # Suspend pytest's fd capture so the re-exec'd run owns the real
        # stdout/stderr (otherwise its output lands in this process's
        # about-to-vanish capture tempfiles).
        capman = config.pluginmanager.getplugin("capturemanager")
        if capman is not None:
            capman.stop_global_capturing()
        env = dict(os.environ)
        env[_MARK] = "1"
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + " --xla_force_host_platform_device_count=8").strip()
        env["PYTHONPATH"] = "/root/repo"  # drop the axon sitecustomize dir
        sys.stdout.flush()
        sys.stderr.flush()
        os.execve(sys.executable,
                  [sys.executable, "-m", "pytest"] + sys.argv[1:], env)

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
