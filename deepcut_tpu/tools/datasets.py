"""Dataset tools: convert_imageset / compute_image_mean analogs.

Reference: tools/convert_imageset.cpp (images + label list -> LMDB of Datums)
and tools/compute_image_mean.cpp (LMDB -> mean BlobProto).

Usage:
  python -m deepcut_tpu.tools.datasets convert_imageset LISTFILE DB_PATH
         [--root ROOT] [--resize H W] [--encoded] [--shuffle]
  python -m deepcut_tpu.tools.datasets compute_image_mean DB_PATH OUT.binaryproto
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional

import numpy as np


def convert_imageset(args) -> int:
    from deepcut_tpu.data.datum import Datum
    from deepcut_tpu.data.pipeline import load_image_bgr
    from PIL import Image

    # -backend flag of tools/convert_imageset.cpp: lmdb (default) | leveldb
    if getattr(args, "backend", "lmdb").lower() == "leveldb":
        from deepcut_tpu.data.leveldb_store import LevelDBWriter as Writer
    else:
        from deepcut_tpu.data.lmdb_store import LMDBWriter as Writer

    with open(args.listfile) as f:
        # split on the LAST whitespace (convert_imageset.cpp line parsing):
        # image paths may contain spaces
        lines = [l.strip().rsplit(None, 1) for l in f if l.strip()]
    if args.shuffle:
        np.random.RandomState(0).shuffle(lines)
    count = 0
    with Writer(args.db_path) as w:
        for path, label in lines:
            full = args.root + path
            if args.encoded and not args.resize:
                datum = Datum.from_image_file(full, int(label), encoded=True)
            else:
                img = load_image_bgr(full)
                if args.resize:
                    h, wdt = args.resize
                    img = np.asarray(Image.fromarray(img[:, :, ::-1]).resize(
                        (wdt, h), Image.BILINEAR))[:, :, ::-1]
                if args.encoded:
                    # --encoded --resize: RE-encode after resizing, like the
                    # reference (otherwise raw pixels triple the DB size)
                    import io as _io
                    buf = _io.BytesIO()
                    Image.fromarray(img[:, :, ::-1]).save(buf, format="PNG")
                    h2, w2 = img.shape[:2]
                    datum = Datum(3, h2, w2, data=buf.getvalue(),
                                  label=int(label), encoded=True)
                else:
                    datum = Datum.from_array(
                        np.ascontiguousarray(img.transpose(2, 0, 1)), int(label))
            w.put(f"{count:08d}_{path}".encode(), datum.encode())
            count += 1
    print(f"Processed {count} files into {args.db_path}")
    return 0


def compute_image_mean(args) -> int:
    import os

    from deepcut_tpu.data.datum import Datum
    from deepcut_tpu.io import array_to_blobproto_bytes

    # auto-detect backend the way db.cpp would be told: a LevelDB dir has a
    # CURRENT file, an LMDB dir a data.mdb.
    if os.path.exists(os.path.join(args.db_path, "CURRENT")):
        from deepcut_tpu.data.leveldb_store import LevelDBReader as Reader
    else:
        from deepcut_tpu.data.lmdb_store import LMDBReader as Reader
    reader = Reader(args.db_path)
    total: Optional[np.ndarray] = None
    n = 0
    for _, raw in reader.items():
        arr = Datum.decode(raw).to_array()
        total = arr if total is None else total + arr
        n += 1
    if total is None:
        print("empty db", file=sys.stderr)
        return 1
    mean = (total / n)[None]  # (1, C, H, W)
    with open(args.out, "wb") as f:
        f.write(array_to_blobproto_bytes(mean))
    print(f"Wrote mean of {n} images to {args.out}; "
          f"channel means: {mean.mean(axis=(0, 2, 3))}")
    return 0


def main(argv: Optional[List[str]] = None) -> int:
    parser = argparse.ArgumentParser(prog="deepcut_tpu.tools.datasets")
    sub = parser.add_subparsers(dest="verb", required=True)

    p = sub.add_parser("convert_imageset")
    p.add_argument("listfile")
    p.add_argument("db_path")
    p.add_argument("--root", default="")
    p.add_argument("--resize", type=int, nargs=2, default=None)
    p.add_argument("--encoded", action="store_true")
    p.add_argument("--shuffle", action="store_true")
    p.add_argument("--backend", default="lmdb", choices=["lmdb", "leveldb"])
    p.set_defaults(fn=convert_imageset)

    p = sub.add_parser("compute_image_mean")
    p.add_argument("db_path")
    p.add_argument("out")
    p.set_defaults(fn=compute_image_mean)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
