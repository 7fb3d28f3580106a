"""Device-mesh parallelism: the TPU-native replacement for P2PSync.

The reference's entire distributed layer (src/caffe/parallel.cpp: per-GPU
solver threads, flat gradient buffers, a hand-built CUDA-P2P tree reduction)
collapses here into sharding declarations over a `jax.sharding.Mesh`:

- data parallelism  = batch dim sharded over the 'data' axis; XLA emits the
  gradient all-reduce over ICI (what DevicePair::compute hand-planned).
- spatial parallelism (the CNN analog of sequence parallelism) = H dim
  sharded over the 'spatial' axis. Inference: XLA inserts conv halo
  exchanges from the sharding annotations alone. TRAINING: the shard_map
  path with framework-owned halo exchange + psum (parallel/spatial.py),
  because jax 0.9's partitioner mis-scales conv weight grads under halo
  exchange (canaried in tests/test_parallel.py).
- parameters/optimizer state are replicated (same model as the reference,
  where every GPU holds a full copy: parallel.cpp:77-115).

Multi-host would extend the same mesh over DCN via jax.distributed — no
framework code changes.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    *,
    data: Optional[int] = None,
    spatial: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ('data', 'spatial') mesh over the available devices."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise RuntimeError(
                f"make_mesh: {n_devices} devices requested but only {len(devs)} "
                f"visible on platform {devs[0].platform if devs else '??'}. "
                "For a virtual multi-device run set JAX_PLATFORMS=cpu and "
                f"XLA_FLAGS=--xla_force_host_platform_device_count={n_devices} "
                "before importing jax (see tests/conftest.py)."
            )
        devs = devs[:n_devices]
    n = len(devs)
    if data is None:
        assert n % spatial == 0, f"{n} devices not divisible by spatial={spatial}"
        data = n // spatial
    grid = np.asarray(devs).reshape(data, spatial)
    return Mesh(grid, axis_names=("data", "spatial"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC batch: N over 'data', H over 'spatial'.

    INFERENCE-scoped (GSPMD annotation path). Training over a 2-D mesh goes
    through make_train_step, which dispatches to the shard_map
    halo-exchange step and shards its own inputs — do not pre-shard train
    batches with this helper (conv weight grads under GSPMD spatial
    sharding hit an upstream XLA bug; see parallel/spatial.py)."""
    return NamedSharding(mesh, P("data", "spatial", None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    sh = batch_sharding(mesh)
    return {
        k: jax.device_put(v, sh if getattr(v, "ndim", 0) == 4 else replicated(mesh))
        for k, v in batch.items()
    }
