"""Process-parallel input pipeline (data/worker.py).

The reference kept its device fed with a prefetch pipeline
(multi_base_data_layer.cpp:52-80); worker PROCESSES are the TPU-side analog
for the GIL-bound residue the thread pool can't touch. The contract under
test: batches are BIT-IDENTICAL to workers=0 (every RNG draw stays serial on
the calling thread), workers never import jax (single-client TPU relay),
and the pipelined `batches()` stream equals the `next_batch()` sequence.
"""

import numpy as np
import pytest

from deepcut_tpu.data.pipeline import PoseDataSource
from deepcut_tpu.data.window_file import ImageRecord, Person
from deepcut_tpu.pose.targets import TargetConfig


def _make_dataset(tmp_path, n=4, seed=7, fmt="jpg"):
    from PIL import Image

    rng = np.random.RandomState(seed)
    recs = []
    for i in range(n):
        h, w = int(rng.randint(140, 200)), int(rng.randint(160, 240))
        arr = rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
        path = str(tmp_path / f"img{i}.{fmt}")
        Image.fromarray(arr).save(path, **({"quality": 90} if fmt == "jpg" else {}))
        k = int(rng.randint(5, 14))
        classes = (rng.permutation(14)[:k] + 1).astype(np.int32)
        xy = np.stack([rng.uniform(0, w, k), rng.uniform(0, h, k)],
                      axis=1).astype(np.float32)
        recs.append(ImageRecord(path, 3, h, w, [Person(classes, xy)]))
    return recs


@pytest.mark.parametrize("augment", [False, True])
@pytest.mark.parametrize("uint8_images", [False, True])
def test_process_workers_bitwise_equal(tmp_path, augment, uint8_images):
    """worker_mode='process' parallelizes only the RNG-free heavy phase, so
    batches are BIT-identical to the serial path — the same contract the
    thread pool holds (pipeline.load_canvas is shared by construction)."""
    recs = _make_dataset(tmp_path)
    cfg = TargetConfig(soft_labels=False, location_refinement=True)
    serial = PoseDataSource(recs, cfg, seed=3, bucket_step=32,
                            augment=augment, uint8_images=uint8_images)
    proc = PoseDataSource(recs, cfg, seed=3, bucket_step=32, augment=augment,
                          uint8_images=uint8_images,
                          workers=2, worker_mode="process")
    try:
        for _ in range(3):
            a = serial.next_batch(4)
            b = proc.next_batch(4)
            assert sorted(a) == sorted(b)
            for k in a:
                np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    finally:
        proc.close()


def test_process_workers_pipelined_batches_equal(tmp_path):
    """The software-pipelined `batches()` stream draws RNG in the same order
    as repeated next_batch() calls, so the streams are identical — including
    with device_targets (the production CLI configuration)."""
    recs = _make_dataset(tmp_path, seed=9)
    cfg = TargetConfig(soft_labels=False, location_refinement=True)
    ref = PoseDataSource(recs, cfg, seed=5, bucket_step=32, augment=True,
                         uint8_images=True, device_targets=True)
    piped = PoseDataSource(recs, cfg, seed=5, bucket_step=32, augment=True,
                           uint8_images=True, device_targets=True,
                           workers=2, worker_mode="process")
    try:
        it = piped.batches(3)
        for _ in range(4):
            a = ref.next_batch(3)
            b = next(it)
            assert sorted(a) == sorted(b)
            for k in a:
                np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    finally:
        piped.close()


def test_process_workers_custom_picklable_loader(tmp_path):
    """A picklable top-level custom loader runs inside the workers."""
    recs = _make_dataset(tmp_path, fmt="png")
    cfg = TargetConfig(soft_labels=False)
    serial = PoseDataSource(recs, cfg, seed=1, image_loader=_inverted_loader)
    proc = PoseDataSource(recs, cfg, seed=1, image_loader=_inverted_loader,
                          workers=2, worker_mode="process")
    try:
        a = serial.next_batch(2)
        b = proc.next_batch(2)
        np.testing.assert_array_equal(a["image"], b["image"])
    finally:
        proc.close()


def _inverted_loader(path):
    from deepcut_tpu.data.pipeline import load_image_bgr

    return 255 - load_image_bgr(path)


def test_process_workers_unpicklable_loader_rejected(tmp_path):
    recs = _make_dataset(tmp_path, n=1)
    handle = open(recs[0].path, "rb")  # closures over handles can't cross
    try:
        src = PoseDataSource(recs, TargetConfig(), seed=1,
                             image_loader=lambda p: (handle, np.zeros((160, 200, 3), np.uint8))[1],
                             workers=2, worker_mode="process")
        with pytest.raises(ValueError, match="picklable"):
            src.next_batch(2)
    finally:
        handle.close()


def test_bad_worker_mode_rejected(tmp_path):
    recs = _make_dataset(tmp_path, n=1)
    with pytest.raises(ValueError, match="worker_mode"):
        PoseDataSource(recs, TargetConfig(), workers=2, worker_mode="gpu")


@pytest.mark.parametrize("fmt", ["jpg", "png"])
def test_cv2_decode_bit_identical_to_pil(tmp_path, fmt):
    """load_image_bgr decodes with cv2 (libjpeg-turbo SIMD, ~1.4x faster per
    core) with a PIL fallback; both wrap the same libjpeg IDCT, so the
    decode is BIT-identical — the trajectory-preservation contract of the
    round-4 loader switch."""
    from PIL import Image

    from deepcut_tpu.data.pipeline import load_image_bgr

    rng = np.random.RandomState(11)
    arr = rng.randint(0, 255, (180, 220, 3), np.uint8)
    path = str(tmp_path / f"img.{fmt}")
    Image.fromarray(arr).save(path, **({"quality": 90} if fmt == "jpg" else {}))

    got = load_image_bgr(path)
    with Image.open(path) as im:
        pil = np.asarray(im.convert("RGB"))[:, :, ::-1]
    np.testing.assert_array_equal(got, pil)
    if fmt == "png":  # lossless: decode must equal the source exactly
        np.testing.assert_array_equal(got, arr[:, :, ::-1])


def test_workers_stay_jax_free():
    """The whole heavy-phase import chain must not import jax (the relay
    admits one client; a jax-importing worker deadlocks training). Checked
    in a scrubbed fresh interpreter, same as a spawned worker sees."""
    import os
    import subprocess
    import sys

    env = {k: v for k, v in os.environ.items()
           if k != "PALLAS_AXON_POOL_IPS"}
    code = (
        "import sys\n"
        "import deepcut_tpu.data.worker, deepcut_tpu.data.pipeline\n"
        "import deepcut_tpu.pose.augment, deepcut_tpu.pose.targets\n"
        "bad = [m for m in sys.modules if m == 'jax' or m.startswith('jax.')]\n"
        "assert not bad, bad\n"
        "print('clean')\n"
    )
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    assert "clean" in out.stdout
