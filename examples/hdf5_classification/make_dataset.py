"""Synthetic 2-class / 4-feature dataset for the HDF5 classification example.

The reference's `examples/hdf5_classification` (and the 02-brewing-logreg
notebook) uses sklearn.make_classification; without network access we draw
an equivalent mixture: 2 informative dimensions as a 4-cluster XOR-style
gaussian mixture (not linearly separable — that's the point of the example:
logistic regression tops out, the 2-layer net does much better) plus 2 pure
noise dimensions.

Writes train.h5/test.h5 with datasets `data` (N,4) and `label` (N,) float32,
and the one-filename-per-line list files HDF5Data expects
(hdf5_data_layer.cpp: source is a text file of .h5 paths).

Usage: python examples/hdf5_classification/make_dataset.py [n] [out_dir]
"""

import os
import sys

import numpy as np


def make_xy(n: int, rng: np.random.RandomState):
    # 4 gaussian clusters at (+-1.5, +-1.5); label = XOR of corner signs.
    corners = np.array([[1.5, 1.5], [-1.5, -1.5], [1.5, -1.5], [-1.5, 1.5]])
    labels = np.array([0, 0, 1, 1])
    which = rng.randint(0, 4, size=n)
    informative = corners[which] + rng.randn(n, 2) * 0.8
    noise = rng.randn(n, 2) * 1.0
    x = np.concatenate([informative, noise], axis=1).astype(np.float32)
    y = labels[which].astype(np.float32)
    return x, y


def write_h5(path: str, x: np.ndarray, y: np.ndarray) -> None:
    import h5py

    with h5py.File(path, "w") as f:
        f.create_dataset("data", data=x)
        f.create_dataset("label", data=y)


def main(n: int = 1000, out_dir: str = "examples/hdf5_classification/data"):
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(0)
    for split, count in (("train", n), ("test", max(n // 4, 1))):
        x, y = make_xy(count, rng)
        h5 = os.path.join(out_dir, f"{split}.h5")
        write_h5(h5, x, y)
        with open(os.path.join(out_dir, f"{split}.txt"), "w") as f:
            f.write(os.path.abspath(h5) + "\n")
    print(f"wrote {n} train / {max(n // 4, 1)} test samples to {out_dir}")
    return out_dir


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    out = sys.argv[2] if len(sys.argv) > 2 else "examples/hdf5_classification/data"
    main(n, out)
