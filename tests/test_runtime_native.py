"""Native C++ rasterizer vs the numpy implementation (exact agreement).

Builds the shared library on demand (g++ is in the image); skips if the
toolchain is unavailable.
"""

import numpy as np
import pytest

from deepcut_tpu.data.window_file import ImageRecord, Person
from deepcut_tpu.pose.targets import TargetConfig, rasterize, rasterize_native


@pytest.fixture(scope="module", autouse=True)
def built_lib():
    import deepcut_tpu.runtime as rt

    if not rt.available():
        try:
            from deepcut_tpu.runtime.build import build
            build(verbose=False)
            rt._TRIED = False  # re-probe
        except Exception as e:
            pytest.skip(f"native toolchain unavailable: {e}")
    if not rt.available():
        pytest.skip("librasterizer.so not loadable")


def _record(rng, num_people=2, with_skip=True):
    people = []
    for _ in range(num_people):
        k = rng.randint(5, 15)
        classes = rng.permutation(14)[:k] + 1
        if with_skip:
            classes = np.concatenate([classes, [15]])
        xy = np.stack([rng.uniform(0, 200, len(classes)),
                       rng.uniform(0, 160, len(classes))], 1).astype(np.float32)
        people.append(Person(classes.astype(np.int32), xy))
    return ImageRecord("x.png", 3, 160, 200, people)


CONFIGS = [
    TargetConfig(location_refinement=True),
    TargetConfig(soft_labels=True, location_refinement=True, regress_to_other=True),
    TargetConfig(no_bg_class=True, multi_label=True, location_refinement=True,
                 regress_to_other=True, scale=0.75),
    TargetConfig(weight_targets=True, fg_fraction=0.25, location_refinement=True),
    TargetConfig(fg_fraction=0.25, bg_threshold=17.0, location_refinement=True),
]


@pytest.mark.parametrize("idx", range(len(CONFIGS)))
def test_native_matches_numpy(idx):
    cfg = CONFIGS[idx]
    rec = _record(np.random.RandomState(10 + idx))
    a = rasterize(rec, cfg, rng=np.random.RandomState(5), scale=cfg.scale)
    b = rasterize_native(rec, cfg, rng=np.random.RandomState(5), scale=cfg.scale)
    assert set(a) == set(b)
    for key in a:
        np.testing.assert_allclose(b[key], a[key], rtol=1e-5, atol=1e-5,
                                   err_msg=f"{key} (config {idx})")


def test_native_speedup():
    import time
    cfg = TargetConfig(soft_labels=True, location_refinement=True,
                       regress_to_other=True)
    rec = _record(np.random.RandomState(0), num_people=4)
    t0 = time.perf_counter()
    for _ in range(3):
        rasterize(rec, cfg, rng=np.random.RandomState(1), scale=1.0)
    t_np = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3):
        rasterize_native(rec, cfg, rng=np.random.RandomState(1), scale=1.0)
    t_cc = time.perf_counter() - t0
    print(f"numpy {t_np*333:.1f} ms/sample, native {t_cc*333:.1f} ms/sample")
    # informational; native must at least not be pathologically slower
    assert t_cc < t_np * 5
