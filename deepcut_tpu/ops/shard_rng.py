"""Batch-sharded stochastic draws for shard_map regions.

Caffe's stochastic layers (Dropout, STOCHASTIC pooling) draw one random
tensor per step whose leading dim is the batch. Under jax.shard_map the
batch is sharded over mesh axes, and a per-shard draw from the same key
would produce a DIFFERENT mask sequence than the single-device trace —
the reason the spatial train paths used to reject stochastic layers.

`sharded_rng_batch((axis,), (size,))` makes `draw_batched` generate the
tensor at the GLOBAL batch size (counter-based Threefry: identical values
to the single-device draw) and dynamic-slice the local rows by
lax.axis_index — masks match the single-device sequence bit-exactly, so
trajectories stay equal. Memory cost: the full-batch random tensor is
materialised per shard for the draw (the activation itself stays local).

Same trace-time context pattern as ops.losses.sharded_losses and
ops.norm.sharded_bn_stats.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

_CTX: Tuple[Tuple[str, ...], Tuple[int, ...]] = ((), ())


class sharded_rng_batch:
    """Context: batch dims of stochastic draws are sharded over these mesh
    axes (with the given static sizes) inside the enclosing shard_map."""

    def __init__(self, axes: Sequence[str], sizes: Sequence[int]):
        if len(axes) != len(sizes):
            raise ValueError("axes and sizes must pair up")
        self.value = (tuple(axes), tuple(int(s) for s in sizes))

    def __enter__(self):
        global _CTX
        self._prev, _CTX = _CTX, self.value
        return self

    def __exit__(self, *exc):
        global _CTX
        _CTX = self._prev


def draw_batched(sample: Callable[[Tuple[int, ...]], "object"],
                 shape: Tuple[int, ...]):
    """sample(shape) -> array, with the leading (batch) dim drawn at the
    global size and sliced to this shard's rows when inside a
    `sharded_rng_batch` context; a plain sample(shape) otherwise."""
    axes, sizes = _CTX
    if not axes:
        return sample(tuple(shape))
    import jax
    from jax import lax

    n_local = int(shape[0])
    total = 1
    idx = 0
    for a, s in zip(axes, sizes):
        total *= s
        idx = idx * s + lax.axis_index(a)
    full = sample((n_local * total,) + tuple(shape[1:]))
    return lax.dynamic_slice_in_dim(full, idx * n_local, n_local, axis=0)
