"""deepcut_tpu — a TPU-native (JAX/XLA/Pallas) reimplementation of the
Caffe-based DeeperCut framework (reference: eldar/deepcut-cnn).

The package is organised as:

- ``deepcut_tpu.ops``      — the op library (Caffe layer semantics, XLA-native)
- ``deepcut_tpu.core``     — graph engine: prototxt DAG -> jitted function
- ``deepcut_tpu.proto``    — prototxt / caffemodel interchange codecs
- ``deepcut_tpu.models``   — native model builders (DeeperCut ResNet-152, ...)
- ``deepcut_tpu.pose``     — pose estimation pipeline (preprocess/forward/decode)
- ``deepcut_tpu.solver``   — training loop, update rules, LR policies
- ``deepcut_tpu.data``     — host input pipeline (window files, LMDB, prefetch)
- ``deepcut_tpu.parallel`` — device-mesh parallelism (DP + spatial sharding)
- ``deepcut_tpu.tools``    — CLI (train/test/time/device_query) and utilities

Unlike the reference (a static C++ layer graph mutating Blobs in place), the
compute core here is purely functional: parameters live in pytrees, a model is
a jit-compiled function, and parallelism is expressed as shardings over a
``jax.sharding.Mesh`` rather than hand-written peer-to-peer transfers.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy Net re-export (PEP 562): importing the package must stay jax-free
    # so data-pipeline worker PROCESSES (data/worker.py) can import the
    # decode/warp/canvas code without initializing a jax client — the TPU
    # relay admits only one client at a time.
    if name == "Net":
        from deepcut_tpu.core.graph import Net

        return Net
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
