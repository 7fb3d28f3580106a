"""examples/pycaffe smoke: net_spec-authored CaffeNet structure, and the
Python EuclideanLossLayer (pyloss.py) training through autodiff."""

import importlib.util

import numpy as np


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_caffenet_netspec_structure():
    from deepcut_tpu.proto import text_format

    mod = _load("ex_caffenet", "/root/repo/examples/pycaffe/caffenet.py")
    n = mod.caffenet("some_lmdb", batch_size=4, num_classes=8, include_acc=True)
    node = text_format.parse(n.to_proto_text())
    layers_ = node.get_list("layer")
    types = [l.get_str("type") for l in layers_]
    # the canonical CaffeNet layer sequence, as the reference's caffenet.py
    assert types[0] == "Data" and types[-2:] == ["SoftmaxWithLoss", "Accuracy"]
    assert types.count("Convolution") == 5
    assert types.count("LRN") == 2 and types.count("Dropout") == 2
    conv2 = [l for l in layers_ if l.get_str("name") == "conv2"][0]
    assert conv2.get("convolution_param").get_int("group") == 2
    data = layers_[0]
    assert data.get("data_param").get_str("source") == "some_lmdb"
    assert data.get("transform_param").get_int("crop_size") == 227


def test_pyloss_layer_trains():
    import jax.numpy as jnp

    from deepcut_tpu.core import layers as L
    from deepcut_tpu.core.graph import Net
    from deepcut_tpu.proto import text_format

    pyloss = _load("ex_pyloss", "/root/repo/examples/pycaffe/layers/pyloss.py")
    L.register_python_layer("EuclideanLossLayer", pyloss.EuclideanLossLayer)

    proto = """
    name: "pyloss_net"
    input: "data"  input_shape { dim: 8 dim: 4 }
    input: "label" input_shape { dim: 8 dim: 1 }
    layer { name: "fc" type: "InnerProduct" bottom: "data" top: "pred"
            inner_product_param { num_output: 1
              weight_filler { type: "gaussian" std: 0.5 } } }
    layer { name: "loss" type: "Python" bottom: "pred" bottom: "label"
            top: "loss" loss_weight: 1
            python_param { module: "pyloss" layer: "EuclideanLossLayer" } }
    """
    from deepcut_tpu.solver.update_rules import SolverConfig, init_state

    net = Net(text_format.parse(proto), phase="TRAIN", compute_dtype=None)
    rng = np.random.RandomState(0)
    x = rng.randn(8, 4).astype(np.float32)
    w_true = rng.randn(4, 1).astype(np.float32)
    y = x @ w_true

    cfg = SolverConfig(solver_type="SGD", base_lr=0.05, momentum=0.9,
                       weight_decay=0.0)
    step = net.make_train_step(cfg)
    params, state = net.params, init_state(cfg, net.params)
    inputs = {"data": jnp.asarray(x), "label": jnp.asarray(y)}
    losses = []
    for _ in range(60):
        params, state, loss = step(params, state, inputs)
        losses.append(float(loss))
    net.params = params
    # the python loss must match the reference formula and actually train
    pred = net.forward(data=x, label=y)["pred"]
    expect = float(np.sum((pred - y) ** 2) / (2 * 8))
    assert abs(losses[-1] - expect) < 1e-3 * max(1.0, expect)
    assert losses[-1] < 0.05 * losses[0], losses[:3] + losses[-3:]
