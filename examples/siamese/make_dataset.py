"""Create a paired-digit LevelDB for the siamese example.

Reference analog: examples/siamese/convert_mnist_siamese_data.cpp — each
record is ONE datum with two stacked single-channel images (channels=2) and
label 1 when both digits are the same class, 0 otherwise. Uses the synthetic
glyph renderer from the mnist example (no network egress for real MNIST).

Usage: python examples/siamese/make_dataset.py [n_pairs] [out_db]
"""

import importlib.util
import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))


def _render_digit():
    spec = importlib.util.spec_from_file_location(
        "mnist_make_dataset", os.path.join(_HERE, "..", "mnist", "make_dataset.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.render_digit


def make_pair_db(out_db: str, n_pairs: int = 600, seed: int = 0) -> None:
    from deepcut_tpu.data.datum import Datum
    from deepcut_tpu.data.leveldb_store import LevelDBWriter

    render = _render_digit()
    rng = np.random.RandomState(seed)
    with LevelDBWriter(out_db) as w:
        for i in range(n_pairs):
            c1 = rng.randint(0, 10)
            same = i % 2 == 0  # balanced positives/negatives
            c2 = c1 if same else (c1 + rng.randint(1, 10)) % 10
            pair = np.stack([render(c1, rng), render(c2, rng)])  # (2, 28, 28)
            pair = (pair * 255).astype(np.uint8)
            w.put(f"{i:08d}".encode(), Datum.from_array(pair, int(same)).encode())
    print(f"wrote {n_pairs} pairs to {out_db}")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        _HERE, "siamese_train_leveldb")
    make_pair_db(out, n)
