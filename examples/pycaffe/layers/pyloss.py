"""Python loss layer — the deepcut_tpu analog of the reference's
examples/pycaffe/layers/pyloss.py (EuclideanLossLayer written in Python).

The deepcut_tpu PythonLayer contract (core/layers.py `Python` type, see
tests/test_python_layer.py): a class with `forward(*bottoms)`, optional
`setup(param_str)`, optional `backward` (otherwise JAX autodiff applies —
which is why, unlike the reference, a hand-written backward is optional).
Bodies must be jax-traceable (jnp ops, no Python control flow on values).

Register it, then use `type: "Python"` in the prototxt:

    from deepcut_tpu.core import layers as L
    from examples.pycaffe.layers.pyloss import EuclideanLossLayer
    L.register_python_layer("EuclideanLossLayer", EuclideanLossLayer)

    layer {
      name: "loss" type: "Python" bottom: "pred" bottom: "label" top: "loss"
      python_param { module: "pyloss" layer: "EuclideanLossLayer" }
      loss_weight: 1
    }
"""

import jax.numpy as jnp


class EuclideanLossLayer:
    """loss = sum((pred - label)^2) / (2 N) — same math as the reference's
    pyloss.py; the backward pass comes from autodiff instead of the
    hand-written `self.diff / bottom[0].num` the reference needs."""

    def forward(self, pred, label):
        diff = pred - label
        return jnp.sum(diff * diff) / (2.0 * pred.shape[0])
