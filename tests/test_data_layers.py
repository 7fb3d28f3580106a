"""Data pipeline formats: LMDB store, Datum codec, DataTransformer, and the
graph-integrated data layers (Data/MemoryData/HDF5Data/HDF5Output)."""

import os

import numpy as np
import pytest

from deepcut_tpu.data.lmdb_store import LMDBReader, LMDBWriter
from deepcut_tpu.data.datum import Datum
from deepcut_tpu.data.transformer import DataTransformer
from deepcut_tpu.proto import text_format
from deepcut_tpu.core.graph import Net


def test_lmdb_roundtrip_small(tmp_path):
    path = str(tmp_path / "db")
    with LMDBWriter(path) as w:
        for i in range(10):
            w.put(f"{i:08d}".encode(), f"value-{i}".encode() * (i + 1))
    r = LMDBReader(path)
    items = list(r.items())
    assert len(items) == 10 == len(r)
    assert items[0][0] == b"00000000"
    assert items[3][1] == b"value-3" * 4
    assert r.get(b"00000007") == b"value-7" * 8


def test_lmdb_roundtrip_large_values_and_many_keys(tmp_path):
    # forces multi-level branch pages and overflow pages
    path = str(tmp_path / "db")
    rng = np.random.RandomState(0)
    blobs = {}
    with LMDBWriter(path) as w:
        for i in range(500):
            val = rng.bytes(rng.randint(10, 300))
            blobs[f"k{i:06d}".encode()] = val
            w.put(f"k{i:06d}".encode(), val)
        big = rng.bytes(20000)  # > page size -> overflow
        blobs[b"zz_big"] = big
        w.put(b"zz_big", big)
    r = LMDBReader(path)
    items = dict(r.items())
    assert len(items) == 501
    assert items == blobs


def test_datum_roundtrip():
    arr = np.random.RandomState(0).randint(0, 255, (3, 8, 6), np.uint8)
    d = Datum.from_array(arr, label=7)
    d2 = Datum.decode(d.encode())
    assert d2.label == 7
    np.testing.assert_array_equal(d2.to_array(), arr.astype(np.float32))
    # float datum
    farr = np.random.RandomState(1).randn(2, 4, 4).astype(np.float32)
    d3 = Datum.decode(Datum.from_array(farr, label=1).encode())
    np.testing.assert_allclose(d3.to_array(), farr, rtol=1e-6)


def test_transformer_crop_mirror_mean():
    node = text_format.parse("crop_size: 4\nmean_value: 10\nscale: 0.5")
    t = DataTransformer(node, phase="TEST")
    x = np.arange(3 * 6 * 6, dtype=np.float32).reshape(3, 6, 6)
    out = t(x)
    assert out.shape == (3, 4, 4)
    np.testing.assert_allclose(out, (x[:, 1:5, 1:5] - 10) * 0.5)


def _lmdb_mnist_like(tmp_path, n=8):
    path = str(tmp_path / "train_db")
    rng = np.random.RandomState(0)
    with LMDBWriter(path) as w:
        for i in range(n):
            arr = rng.randint(0, 255, (1, 8, 8), np.uint8)
            w.put(f"{i:08d}".encode(), Datum.from_array(arr, label=i % 3).encode())
    return path


def test_graph_lmdb_data_layer(tmp_path):
    db = _lmdb_mnist_like(tmp_path)
    proto = text_format.parse(f"""
        name: "lenet-ish"
        layer {{
          name: "data" type: "Data" top: "data" top: "label"
          data_param {{ source: "{db}" batch_size: 4 }}
          transform_param {{ scale: 0.00390625 }}
        }}
        layer {{
          name: "ip" type: "InnerProduct" bottom: "data" top: "ip"
          inner_product_param {{ num_output: 3
            weight_filler {{ type: "gaussian" std: 0.1 }} }}
        }}
        layer {{ name: "loss" type: "SoftmaxWithLoss" bottom: "ip" bottom: "label" top: "loss" }}
        """)
    net = Net(proto, phase="TRAIN", compute_dtype=None)
    out1 = net.forward()
    assert out1["loss"].shape == ()
    assert np.isfinite(out1["loss"])
    out2 = net.forward()  # advances the cursor
    assert out2["data"].shape == (4, 1, 8, 8)
    assert not np.array_equal(out1["data"], out2["data"])
    assert out1["data"].max() <= 1.0  # scale applied


def test_graph_memory_data_layer():
    proto = text_format.parse("""
        layer {
          name: "data" type: "MemoryData" top: "data" top: "label"
          memory_data_param { batch_size: 2 channels: 3 height: 4 width: 4 }
        }
        layer { name: "pool" type: "Pooling" bottom: "data" top: "pool"
                pooling_param { kernel_size: 4 stride: 4 pool: AVE } }
        """)
    net = Net(proto, phase="TEST", compute_dtype=None)
    data = np.random.RandomState(0).rand(6, 3, 4, 4).astype(np.float32)
    labels = np.arange(6, dtype=np.float32)
    net.set_input_arrays(data, labels)
    out = net.forward()
    assert out["pool"].shape == (2, 3, 1, 1)
    np.testing.assert_allclose(out["label"], [0, 1])
    out = net.forward()
    np.testing.assert_allclose(out["label"], [2, 3])


def test_graph_hdf5_layers(tmp_path):
    import h5py

    h5path = str(tmp_path / "d.h5")
    with h5py.File(h5path, "w") as f:
        f["data"] = np.random.RandomState(0).rand(5, 2, 4, 4).astype(np.float32)
        f["label"] = np.arange(5, dtype=np.float32)
    listing = tmp_path / "list.txt"
    listing.write_text(h5path + "\n")
    outfile = str(tmp_path / "out.h5")
    proto = text_format.parse(f"""
        layer {{
          name: "data" type: "HDF5Data" top: "data" top: "label"
          hdf5_data_param {{ source: "{listing}" batch_size: 2 }}
        }}
        layer {{ name: "abs" type: "AbsVal" bottom: "data" top: "abs" }}
        layer {{ name: "sink" type: "HDF5Output" bottom: "abs" bottom: "label"
                 hdf5_output_param {{ file_name: "{outfile}" }} }}
        """)
    net = Net(proto, phase="TEST", compute_dtype=None)
    net.forward()
    net.forward()
    net.hdf5_sinks[0].save()
    with h5py.File(outfile, "r") as f:
        assert f["data"].shape == (4, 2, 4, 4)
        np.testing.assert_allclose(f["label"][:], [0, 1, 2, 3])


# -- LevelDB backend (reference: db_leveldb.cpp; test_data_layer.cpp runs the
# same layer tests over both backends) ---------------------------------------


def test_leveldb_roundtrip_log_mode(tmp_path):
    from deepcut_tpu.data.leveldb_store import LevelDBReader, LevelDBWriter

    path = str(tmp_path / "ldb")
    with LevelDBWriter(path) as w:
        for i in range(10):
            w.put(f"{i:08d}".encode(), f"value-{i}".encode() * (i + 1))
    r = LevelDBReader(path)
    items = list(r.items())
    assert len(items) == 10 == len(r)
    assert items[0][0] == b"00000000"
    assert items[3][1] == b"value-3" * 4
    assert r.get(b"00000007") == b"value-7" * 8
    assert r.get(b"nope") is None


def test_leveldb_roundtrip_table_mode_large(tmp_path):
    from deepcut_tpu.data.leveldb_store import LevelDBReader, LevelDBWriter

    path = str(tmp_path / "ldb")
    rng = np.random.RandomState(0)
    blobs = {}
    with LevelDBWriter(path, mode="table") as w:
        for i in range(300):
            val = rng.bytes(int(rng.randint(10, 400)))
            blobs[f"k{i:06d}".encode()] = val
            w.put(f"k{i:06d}".encode(), val)
        big = rng.bytes(90000)  # record > one 32KiB log block / many blocks
        blobs[b"zz_big"] = big
        w.put(b"zz_big", big)
    assert dict(LevelDBReader(path).items()) == blobs


def test_leveldb_log_mode_large_record_fragmentation(tmp_path):
    from deepcut_tpu.data.leveldb_store import LevelDBReader, LevelDBWriter

    path = str(tmp_path / "ldb")
    big = np.random.RandomState(1).bytes(100000)  # FIRST/MIDDLE/LAST spans
    with LevelDBWriter(path) as w:
        w.put(b"big", big)
        w.put(b"small", b"x")
    r = LevelDBReader(path)
    assert r.get(b"big") == big
    assert r.get(b"small") == b"x"


def test_leveldb_crc_detects_corruption(tmp_path):
    from deepcut_tpu.data.leveldb_store import LevelDBReader, LevelDBWriter

    path = str(tmp_path / "ldb")
    with LevelDBWriter(path) as w:
        w.put(b"k", b"v" * 100)
    logf = os.path.join(path, "000003.log")
    buf = bytearray(open(logf, "rb").read())
    buf[40] ^= 0xFF  # flip a payload byte
    open(logf, "wb").write(bytes(buf))
    with pytest.raises(ValueError, match="crc"):
        LevelDBReader(path)


def test_graph_leveldb_data_layer(tmp_path):
    from deepcut_tpu.data.leveldb_store import LevelDBWriter

    path = str(tmp_path / "train_ldb")
    rng = np.random.RandomState(0)
    with LevelDBWriter(path) as w:
        for i in range(8):
            arr = rng.randint(0, 255, (1, 8, 8), np.uint8)
            w.put(f"{i:08d}".encode(), Datum.from_array(arr, label=i % 3).encode())
    proto = text_format.parse(f"""
        name: "lenet-ish"
        layer {{
          name: "data" type: "Data" top: "data" top: "label"
          data_param {{ source: "{path}" batch_size: 4 backend: LEVELDB }}
          transform_param {{ scale: 0.00390625 }}
        }}
        layer {{
          name: "ip" type: "InnerProduct" bottom: "data" top: "ip"
          inner_product_param {{ num_output: 3
            weight_filler {{ type: "gaussian" std: 0.1 }} }}
        }}
        layer {{ name: "loss" type: "SoftmaxWithLoss" bottom: "ip" bottom: "label" top: "loss" }}
        """)
    net = Net(proto, phase="TRAIN", compute_dtype=None)
    out1 = net.forward()
    assert np.isfinite(out1["loss"])
    out2 = net.forward()
    assert out2["data"].shape == (4, 1, 8, 8)
    assert not np.array_equal(out1["data"], out2["data"])


def test_leveldb_deletion_and_overwrite_semantics(tmp_path):
    """Later sequence numbers shadow earlier ones; deletions hide values —
    the view a real leveldb iterator presents after mixed writes."""
    from deepcut_tpu.data import leveldb_store as ldb

    path = str(tmp_path / "db")
    os.makedirs(path)
    log = ldb.LogWriter()
    log.add_record(ldb.encode_batch(1, [(ldb.TYPE_VALUE, b"a", b"old")]))
    log.add_record(ldb.encode_batch(2, [
        (ldb.TYPE_VALUE, b"a", b"new"),
        (ldb.TYPE_VALUE, b"b", b"gone"),
    ]))
    log.add_record(ldb.encode_batch(4, [(ldb.TYPE_DELETION, b"b", b"")]))
    with open(os.path.join(path, "000003.log"), "wb") as f:
        f.write(log.data())
    mlog = ldb.LogWriter()
    mlog.add_record(ldb.encode_version_edit(log_number=3, next_file=4, last_seq=4))
    with open(os.path.join(path, "MANIFEST-000002"), "wb") as f:
        f.write(mlog.data())
    with open(os.path.join(path, "CURRENT"), "w") as f:
        f.write("MANIFEST-000002\n")
    r = ldb.LevelDBReader(path)
    assert dict(r.items()) == {b"a": b"new"}


def test_prefetched_source_preserves_order():
    """Graph data layers run behind a 3-deep prefetch thread (reference
    PREFETCH_COUNT=3); FIFO order must equal the synchronous cursor."""
    from deepcut_tpu.data.layers import PrefetchedSource, DataLayerSource

    class Counter(DataLayerSource):
        tops = ["data"]

        def __init__(self):
            self.i = 0

        def next_batch(self):
            self.i += 1
            return [np.full((1,), self.i, np.float32)]

    src = PrefetchedSource(Counter())
    got = [int(src.next_batch()[0][0]) for _ in range(10)]
    assert got == list(range(1, 11))
    src.stop()


def test_net_debug_info():
    from deepcut_tpu.core.graph import Net

    proto = text_format.parse("""
        input: "data"
        input_shape { dim: 1 dim: 2 }
        layer { name: "ip" type: "InnerProduct" bottom: "data" top: "ip"
                inner_product_param { num_output: 3
                  weight_filler { type: "gaussian" std: 0.5 } } }
        """)
    net = Net(proto, compute_dtype=None)
    info = net.debug_info(data=np.ones((1, 2), np.float32))
    assert "ip" in info and info["ip"] >= 0
    assert "param:ip/w" in info and info["param:ip/w"] > 0


def test_image_data_epoch_reshuffle_and_rand_skip(tmp_path):
    # the reference reshuffles the line list at each epoch wrap
    # (image_data_layer.cpp:154-155) and starts at a random offset when
    # rand_skip is set (:57-59)
    from PIL import Image
    from deepcut_tpu.data.layers import ImageDataSource
    from deepcut_tpu.core.graph import LayerSpec

    paths = []
    for i in range(6):
        p = tmp_path / f"im{i}.png"
        Image.fromarray(np.full((4, 4, 3), i * 10, np.uint8)).save(p)
        paths.append(str(p))
    src_file = tmp_path / "list.txt"
    src_file.write_text("".join(f"{p} {i}\n" for i, p in enumerate(paths)))

    node = text_format.parse(f"""
      name: "d" layer {{ name: "data" type: "ImageData" top: "data" top: "label"
        image_data_param {{ source: "{src_file}" batch_size: 6 shuffle: true }} }}
    """).get_list("layer")[0]
    spec = LayerSpec(node)
    src = ImageDataSource(spec, "TRAIN")
    _, l1 = src.next_batch()
    _, l2 = src.next_batch()
    # each epoch is a permutation of all labels...
    assert sorted(l1.tolist()) == sorted(l2.tolist()) == list(range(6))
    # ...and the second epoch's order differs (reshuffled, seed-deterministic)
    assert l1.tolist() != l2.tolist()

    node2 = text_format.parse(f"""
      name: "d" layer {{ name: "data" type: "ImageData" top: "data" top: "label"
        image_data_param {{ source: "{src_file}" batch_size: 2 rand_skip: 5 }} }}
    """).get_list("layer")[0]
    src2 = ImageDataSource(LayerSpec(node2), "TRAIN")
    assert 0 < src2.pos < 6  # skipped into the list (seed 0 draws nonzero)


def test_hdf5_data_epoch_reshuffle(tmp_path):
    import h5py
    from deepcut_tpu.data.layers import HDF5DataSource
    from deepcut_tpu.core.graph import LayerSpec

    h5 = tmp_path / "d.h5"
    with h5py.File(h5, "w") as f:
        f["data"] = np.arange(8, dtype=np.float32).reshape(8, 1)
        f["label"] = np.arange(8, dtype=np.float32)
    lst = tmp_path / "files.txt"
    lst.write_text(str(h5) + "\n")
    node = text_format.parse(f"""
      name: "d" layer {{ name: "data" type: "HDF5Data" top: "data" top: "label"
        hdf5_data_param {{ source: "{lst}" batch_size: 8 shuffle: true }} }}
    """).get_list("layer")[0]
    src = HDF5DataSource(LayerSpec(node), "TRAIN")
    _, l1 = src.next_batch()
    _, l2 = src.next_batch()
    assert sorted(l1.tolist()) == sorted(l2.tolist()) == list(range(8))
    assert l1.tolist() != l2.tolist()  # re-permuted at the wrap


def test_window_data_context_pad_clip_geometry(tmp_path):
    """WindowData context-pad semantics (window_data_layer.cpp:307-397): the
    expanded window is clipped to the image, the clipped region is warped by
    the UNCLIPPED region's scale factors, and the result is pasted at the
    scaled pad offset into a canvas whose padding stays at the mean (zeros
    after subtraction)."""
    from PIL import Image
    from deepcut_tpu.data.layers import WindowDataSource
    from deepcut_tpu.core.graph import LayerSpec

    img = (np.arange(40 * 60 * 3).reshape(40, 60, 3) % 251).astype(np.uint8)
    p = tmp_path / "img.png"
    Image.fromarray(img[:, :, ::-1]).save(p)  # stored RGB; loader flips to BGR

    # one fg window hugging the top-left corner: the context expansion
    # must clip at x=0/y=0
    src = tmp_path / "windows.txt"
    src.write_text(f"""# 0
{p}
3 40 60
1
7 0.9 2 2 21 21
""")
    cs, ctx = 32, 4
    node = text_format.parse(f"""
      name: "w" layer {{ name: "wd" type: "WindowData" top: "data" top: "label"
        window_data_param {{ source: "{src}" batch_size: 2 context_pad: {ctx}
                             fg_threshold: 0.5 bg_threshold: 0.5
                             fg_fraction: 1.0 }}
        transform_param {{ crop_size: {cs} }} }}
    """).get_list("layer")[0]
    ws = WindowDataSource(LayerSpec(node), "TRAIN")
    data, labels = ws.next_batch()
    assert data.shape == (2, 3, cs, cs) and list(labels) == [7.0, 7.0]

    # reference arithmetic oracle for the pad offsets
    x1, y1, x2, y2 = 2, 2, 21, 21
    scale = cs / float(cs - 2 * ctx)
    half = (x2 - x1 + 1) / 2.0
    cx = x1 + half
    ex1 = int(round(cx - half * scale)); ex2 = int(round(cx + half * scale))
    uw = ex2 - ex1 + 1
    px1 = max(0, -ex1)
    sx = cs / float(uw)
    pad = int(round(px1 * sx))
    assert pad > 0  # the window does clip at the corner
    sample = data[0]  # CHW float
    # padding stays exactly 0 (mean pixels), content region is non-trivial
    assert np.all(sample[:, :pad, :] == 0.0)
    assert np.all(sample[:, :, :pad] == 0.0)
    assert np.abs(sample[:, pad + 1:, pad + 1:]).sum() > 0


def test_window_data_bg_fraction_and_square(tmp_path):
    from PIL import Image
    from deepcut_tpu.data.layers import WindowDataSource
    from deepcut_tpu.core.graph import LayerSpec

    img = np.full((30, 50, 3), 128, np.uint8)
    p = tmp_path / "img.png"
    Image.fromarray(img).save(p)
    src = tmp_path / "windows.txt"
    src.write_text(f"""# 0
{p}
3 30 50
2
3 0.8 10 10 29 19
5 0.1 0 0 9 9
""")
    node = text_format.parse(f"""
      name: "w" layer {{ name: "wd" type: "WindowData" top: "data" top: "label"
        window_data_param {{ source: "{src}" batch_size: 4 fg_fraction: 0.5
                             fg_threshold: 0.5 bg_threshold: 0.5
                             crop_mode: "square" }}
        transform_param {{ crop_size: 24 }} }}
    """).get_list("layer")[0]
    ws = WindowDataSource(LayerSpec(node), "TRAIN")
    data, labels = ws.next_batch()
    # bg quota first (label 0), then fg (label 3) — cpp:265-276 order
    assert list(labels) == [0.0, 0.0, 3.0, 3.0]
    assert data.shape == (4, 3, 24, 24)
