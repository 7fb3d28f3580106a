"""Process-parallel decode/warp/canvas workers for the pose input pipeline.

The thread pool in `PoseDataSource(workers=N)` only helps while PIL/cv2 hold
the GIL released; the numpy canvas work and ~9 ms/img JPEG decode leave
augmented batch-8 training host-bound (docs/performance.md "Input pipeline").
This module fans the RNG-free heavy phase (`pipeline.load_canvas`) out to
worker PROCESSES instead — the reference analog is the prefetch pipeline
that kept its GPU fed (multi_base_data_layer.cpp:52-80), scaled past one
core.

Bit-identity contract: workers execute the SAME `load_canvas` pure function
the serial path runs, and every RNG draw stays on the calling thread in
sample order (pipeline._draw_spec) — so batches are bit-identical to
`workers=0` (tested in tests/test_data_workers.py).

jax-free by construction: this module and everything `load_canvas` pulls in
(pipeline -> pose.targets/augment -> window_file/constants) import only
numpy/PIL/cv2. That is load-bearing on the TPU rig: the relay admits ONE
jax client at a time, so a worker that imported jax would silently deadlock
the training process. Spawned workers scrub PALLAS_AXON_POOL_IPS so the
axon sitecustomize doesn't pull jax in either, and `_init` asserts the
invariant.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Callable, List, Optional, Sequence, Tuple

import numpy as np

# set by _init in each worker process
_LOADER: Optional[Callable[[str], np.ndarray]] = None

# environment keys that would make a freshly spawned interpreter attach to
# the TPU relay via sitecustomize; scrubbed for the pool's lifetime
_SCRUB_ENV = ("PALLAS_AXON_POOL_IPS",)


def _init(loader_bytes: bytes) -> None:
    import sys

    if any(m == "jax" or m.startswith("jax.") for m in sys.modules):
        raise RuntimeError(
            "deepcut_tpu data worker imported jax — this deadlocks the "
            "single-client TPU relay; keep the pipeline import chain jax-free")
    global _LOADER
    _LOADER = pickle.loads(loader_bytes) if loader_bytes else None


def _task(args: Tuple[str, Any, float, int, int, bool]) -> np.ndarray:
    path, M, scale, ih, iw, uint8 = args
    from deepcut_tpu.data.pipeline import load_canvas

    return load_canvas(path, M, scale, ih, iw, uint8=uint8, loader=_LOADER)


def _decode_task(path: str) -> np.ndarray:
    """Decode only (PoseDataSource(augment_device=True): warp/scale/canvas
    happen on device, so the worker's whole job is JPEG decode)."""
    from deepcut_tpu.data.pipeline import load_image_bgr

    return (_LOADER or load_image_bgr)(path)


class CanvasPool:
    """Spawn-based process pool running `pipeline.load_canvas`.

    `loader`: optional custom image loader. It is pickled ONCE at pool
    creation and installed in every worker; pass None for the default
    path-based BGR loader. Unpicklable loaders (closures over open handles,
    lambdas) raise here — use worker_mode='thread' or workers=0 for those.
    """

    def __init__(self, workers: int,
                 loader: Optional[Callable[[str], np.ndarray]] = None):
        import multiprocessing as mp

        if loader is not None:
            try:
                loader_bytes = pickle.dumps(loader)
            except Exception as e:
                raise ValueError(
                    "worker_mode='process' requires a picklable image_loader "
                    f"(got {loader!r}: {e}); use worker_mode='thread' for "
                    "in-memory/closure loaders") from e
        else:
            loader_bytes = b""
        ctx = mp.get_context("spawn")  # never fork a live jax/TPU client
        saved = {k: os.environ.pop(k) for k in _SCRUB_ENV if k in os.environ}
        try:
            self._pool = ctx.Pool(int(workers), initializer=_init,
                                  initargs=(loader_bytes,))
        finally:
            os.environ.update(saved)

    def map(self, tasks, decode: bool = False) -> List[np.ndarray]:
        """decode=False: canvas tasks (path, M, scale, ih, iw, uint8);
        decode=True: bare paths, workers return raw decoded images."""
        return self._pool.map(_decode_task if decode else _task,
                              tasks, chunksize=1)

    def map_async(self, tasks, decode: bool = False):
        """Overlap handle: schedule now, `.get()` later (lets the producer
        thread draw the NEXT batch's RNG phase while workers decode)."""
        return self._pool.map_async(_decode_task if decode else _task,
                                    tasks, chunksize=1)

    def close(self) -> None:
        self._pool.terminate()
        self._pool.join()
