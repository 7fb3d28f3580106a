"""PythonLayer extension point (reference: python/caffe/test/
test_python_layer.py SimpleLayer — top = 10 * bottom, backward 10 * diff —
and the phase/param_str scenarios; _caffe.cpp:272-291)."""

import os
import sys
import textwrap

import numpy as np
import jax.numpy as jnp

from deepcut_tpu.core.graph import Net
from deepcut_tpu.core import layers as L
from deepcut_tpu.proto import text_format


class SimpleLayer:
    """top = 10 * bottom with an explicit backward, as in the reference."""

    def forward(self, x):
        return 10.0 * x

    def backward(self, g, x):
        return 10.0 * g


class PhaseLayer:
    """Outputs 0 in TRAIN, 1 in TEST (reference PhaseLayer scenario)."""

    def forward(self, x):
        return jnp.full_like(x, 1.0 if self.phase == "TEST" else 0.0)


class ParamStrLayer:
    def setup(self, param_str):
        self.scale = float(param_str)

    def forward(self, x):
        return self.scale * x


SIMPLE_PROTO = """
name: "pythonnet"
input: "data"
input_shape { dim: 2 dim: 3 }
layer { name: "one" type: "Python" bottom: "data" top: "one"
        python_param { layer: "SimpleLayer" } }
layer { name: "two" type: "Python" bottom: "one" top: "two"
        python_param { layer: "SimpleLayer" } }
layer { name: "loss" type: "EuclideanLoss" bottom: "two" bottom: "data" top: "loss" }
"""


def test_python_layer_forward_and_backward():
    L.register_python_layer("SimpleLayer", SimpleLayer)
    net = Net(text_format.parse(SIMPLE_PROTO), phase="TRAIN", compute_dtype=None)
    x = np.random.RandomState(0).randn(2, 3).astype(np.float32)
    out = net.forward(data=x)
    np.testing.assert_allclose(out["two"], 100.0 * x, rtol=1e-6)
    # backward flows through the custom vjp: d loss/d data via the chain
    grads = net.backward(data=x)
    # loss = 0.5*sum((100x - x)^2)/N; d/dx through "two" path = 100*(99x)/N,
    # plus the direct (label) bottom path -(99x)/N
    expect = (100.0 * 99.0 * x - 99.0 * x) / x.shape[0]
    np.testing.assert_allclose(grads["data"], expect, rtol=1e-4)


def test_python_layer_phase():
    L.register_python_layer("PhaseLayer", PhaseLayer)
    proto = """
    input: "data"
    input_shape { dim: 1 dim: 2 }
    layer { name: "p" type: "Python" bottom: "data" top: "p"
            python_param { layer: "PhaseLayer" } }
    """
    for phase, want in (("TRAIN", 0.0), ("TEST", 1.0)):
        net = Net(text_format.parse(proto), phase=phase, compute_dtype=None)
        out = net.forward(data=np.ones((1, 2), np.float32))
        np.testing.assert_allclose(out["p"], want)


def test_python_layer_param_str():
    L.register_python_layer("ParamStrLayer", ParamStrLayer)
    proto = """
    input: "data"
    input_shape { dim: 1 dim: 4 }
    layer { name: "s" type: "Python" bottom: "data" top: "s"
            python_param { layer: "ParamStrLayer" param_str: "2.5" } }
    """
    net = Net(text_format.parse(proto), phase="TEST", compute_dtype=None)
    x = np.arange(4, dtype=np.float32).reshape(1, 4)
    np.testing.assert_allclose(net.forward(data=x)["s"], 2.5 * x)


def test_python_layer_module_import(tmp_path):
    """python_param.module resolution via import path, like the reference's
    `module: 'test_python_layer'`."""
    mod = tmp_path / "user_layers_xyz.py"
    mod.write_text(textwrap.dedent("""
        import jax.numpy as jnp

        class Doubler:
            def forward(self, x):
                return 2.0 * x
    """))
    sys.path.insert(0, str(tmp_path))
    try:
        proto = """
        input: "data"
        input_shape { dim: 1 dim: 3 }
        layer { name: "d" type: "Python" bottom: "data" top: "d"
                python_param { module: "user_layers_xyz" layer: "Doubler" } }
        """
        net = Net(text_format.parse(proto), phase="TEST", compute_dtype=None)
        x = np.ones((1, 3), np.float32)
        np.testing.assert_allclose(net.forward(data=x)["d"], 2.0 * x)
    finally:
        sys.path.remove(str(tmp_path))


def test_python_layer_with_params_trains():
    """A Python layer can declare learnable blobs via param_spec."""

    class LearnableScale:
        def param_spec(self, bottom_shapes):
            return [("alpha", (1,), None)]

        def forward(self, x, params=None):
            return params["alpha"] * x

    L.register_python_layer("LearnableScale", LearnableScale)
    proto = """
    input: "data"
    input_shape { dim: 4 dim: 2 }
    input: "target"
    input_shape { dim: 4 dim: 2 }
    layer { name: "ls" type: "Python" bottom: "data" top: "ls"
            python_param { layer: "LearnableScale" } }
    layer { name: "loss" type: "EuclideanLoss" bottom: "ls" bottom: "target" top: "loss" }
    """
    from deepcut_tpu.solver.update_rules import SolverConfig, init_state

    net = Net(text_format.parse(proto), phase="TRAIN", compute_dtype=None)
    assert "alpha" in net.params["ls"]
    cfg = SolverConfig(solver_type="SGD", base_lr=0.2, momentum=0.0, weight_decay=0.0)
    step = net.make_train_step(cfg)
    params, state = net.params, init_state(cfg, net.params)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 2).astype(np.float32))
    inputs = {"data": x, "target": 3.0 * x}
    for _ in range(60):
        params, state, loss = step(params, state, inputs)
    np.testing.assert_allclose(float(params["ls"]["alpha"][0]), 3.0, atol=0.05)
