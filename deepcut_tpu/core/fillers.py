"""Weight fillers (reference: include/caffe/filler.hpp:19-290).

Each filler maps (FillerParameter node, rng, shape) -> array. Fan-in/fan-out
for xavier/msra follow Caffe's definition on OIHW blobs; our shapes are HWIO,
so fan_in = kh*kw*I, fan_out = kh*kw*O.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from deepcut_tpu.proto.text_format import PbNode


def _fans(shape: Tuple[int, ...]) -> Tuple[int, int]:
    if len(shape) == 4:  # HWIO
        rf = shape[0] * shape[1]
        return rf * shape[2], rf * shape[3]
    if len(shape) == 2:  # (N_out, K) Caffe IP layout
        return shape[1], shape[0]
    n = 1
    for s in shape:
        n *= s
    return n, n


def fill(node: PbNode, rng: jax.Array, shape: Tuple[int, ...]) -> jax.Array:
    ftype = node.get_str("type", "constant")
    if ftype == "constant":
        return jnp.full(shape, node.get_float("value", 0.0), jnp.float32)
    if ftype == "uniform":
        lo = node.get_float("min", 0.0)
        hi = node.get_float("max", 1.0)
        return jax.random.uniform(rng, shape, jnp.float32, lo, hi)
    if ftype == "gaussian":
        std = node.get_float("std", 1.0)
        mean = node.get_float("mean", 0.0)
        w = mean + std * jax.random.normal(rng, shape, jnp.float32)
        sparse = node.get_int("sparse", -1)
        if sparse > 0 and len(shape) >= 1:
            # Caffe: bernoulli mask with probability sparse / num_outputs,
            # num_outputs = blob->shape(0) in CAFFE layout (filler.hpp:82-83)
            # = Cout, which is the LAST axis of our HWIO conv weights.
            num_outputs = shape[3] if len(shape) == 4 else shape[0]
            prob = min(1.0, float(sparse) / max(num_outputs, 1))
            mask = jax.random.bernoulli(jax.random.fold_in(rng, 1), prob, shape)
            w = w * mask
        return w
    if ftype == "xavier":
        fan_in, fan_out = _fans(shape)
        norm = node.get_str("variance_norm", "FAN_IN")
        n = {"FAN_IN": fan_in, "FAN_OUT": fan_out,
             "AVERAGE": (fan_in + fan_out) / 2.0}[norm]
        scale = math.sqrt(3.0 / n)
        return jax.random.uniform(rng, shape, jnp.float32, -scale, scale)
    if ftype == "msra":
        fan_in, fan_out = _fans(shape)
        norm = node.get_str("variance_norm", "FAN_IN")
        n = {"FAN_IN": fan_in, "FAN_OUT": fan_out,
             "AVERAGE": (fan_in + fan_out) / 2.0}[norm]
        return math.sqrt(2.0 / n) * jax.random.normal(rng, shape, jnp.float32)
    if ftype == "positive_unitball":
        # Caffe normalises per blob->num() = Cout (filler.hpp:111-121),
        # which is the LAST axis of 4-D HWIO conv weights here (same
        # mapping as the sparse-gaussian branch above)
        w = jax.random.uniform(rng, shape, jnp.float32)
        if len(shape) == 4:
            flat = w.reshape(-1, shape[3])
            flat = flat / jnp.sum(flat, axis=0, keepdims=True)
        else:
            flat = w.reshape(shape[0] if len(shape) else 1, -1)
            flat = flat / jnp.sum(flat, axis=1, keepdims=True)
        return flat.reshape(shape)
    if ftype == "bilinear":
        from deepcut_tpu.ops.conv import bilinear_filler
        assert len(shape) == 4, "bilinear filler needs a 4-D kernel"
        return bilinear_filler(shape[0], shape[1], shape[2], shape[3])
    raise ValueError(f"unknown filler type {ftype!r}")
