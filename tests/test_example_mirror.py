"""Round-3 example-mirror additions, executed end-to-end: the siamese
recipe dir (own prototxts, not the reference's), the pascal-finetune
WindowData recipe, and the net_surgery prototxt pair's fully-convolutional
transplant."""

import importlib.util
import os

import numpy as np

EX = "/root/repo/examples"


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_siamese_recipe_dir_trains(tmp_path):
    """examples/siamese/: make_dataset -> own train_test prototxt ->
    GraphSolver steps -> deploy branch loads the snapshot by shared param
    names and embeds to (N, 2)."""
    from deepcut_tpu.solver.solver import GraphSolver, SolverParams
    import deepcut_tpu.compat as caffe

    mk = _load(f"{EX}/siamese/make_dataset.py", "siamese_mk")
    db = str(tmp_path / "pairs_leveldb")
    mk.make_pair_db(db, n_pairs=96)

    text = open(f"{EX}/siamese/mnist_siamese_train_test.prototxt").read()
    text = text.replace("examples/siamese/siamese_train_leveldb", db)
    text = text.replace("batch_size: 32", "batch_size: 8")
    net_path = tmp_path / "train_test.prototxt"
    net_path.write_text(text)
    sp = SolverParams.from_prototxt(f"""
        net: "{net_path}"
        base_lr: 0.01  momentum: 0.9  lr_policy: "fixed"
        display: 0  max_iter: 20  snapshot: 0
        snapshot_prefix: "{tmp_path}/siam"
    """)
    solver = GraphSolver(sp, str(net_path), handle_signals=False,
                         log=lambda *_: None)
    solver.step(8)
    assert np.isfinite(solver.smoothed_loss)

    # both branches must reference the SAME arrays (named-param tying)
    p = solver.net.params
    a = solver.net._entry(p, "conv1")["w"]
    b = solver.net._entry(p, "conv1_p")["w"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # deploy branch: weights arrive via the shared param names
    w_path = str(tmp_path / "siam.caffemodel")
    caffe.Net._from_graph(solver.net).save(w_path)
    deploy = caffe.Net(f"{EX}/siamese/mnist_siamese.prototxt", w_path,
                       caffe.TEST)
    feats = deploy.forward(
        data=np.random.RandomState(0).rand(64, 1, 28, 28).astype(np.float32))
    assert feats["feat"].shape == (64, 2)
    got = np.asarray(deploy._net.params["conv1"]["w"])
    np.testing.assert_allclose(got, np.asarray(a), rtol=1e-6)


def test_pascal_finetune_recipe_trains(tmp_path):
    """examples/finetune_pascal_detection/: synthetic window file ->
    the recipe prototxt (paths + batch size swapped) -> 2 solver steps."""
    from deepcut_tpu.solver.solver import GraphSolver, SolverParams

    mk = _load(f"{EX}/finetune_pascal_detection/make_windows.py", "pascal_mk")
    wf = mk.make_window_file(str(tmp_path / "fix"), n_images=3)

    text = open(f"{EX}/finetune_pascal_detection/"
                "pascal_finetune_trainval_test.prototxt").read()
    text = text.replace(
        "examples/finetune_pascal_detection/window_file_trainval.txt", wf)
    text = text.replace(
        "examples/finetune_pascal_detection/window_file_test.txt", wf)
    text = text.replace("data/ilsvrc12/imagenet_mean.binaryproto",
                        str(tmp_path / "fix" / "imagenet_mean.binaryproto"))
    # shrink for CPU test: tiny batch, small crop so conv geometry still works
    text = text.replace("batch_size: 128", "batch_size: 4")
    text = text.replace("crop_size: 227", "crop_size: 67")
    text = text.replace("num_output: 4096", "num_output: 32")
    net_path = tmp_path / "pascal.prototxt"
    net_path.write_text(text)

    sp = SolverParams.from_prototxt(f"""
        net: "{net_path}"
        base_lr: 0.0005  momentum: 0.9  lr_policy: "fixed"
        display: 0  max_iter: 4  snapshot: 0
        snapshot_prefix: "{tmp_path}/pascal"
    """)
    solver = GraphSolver(sp, str(net_path), handle_signals=False,
                         log=lambda *_: None)
    solver.step(2)
    assert np.isfinite(solver.smoothed_loss)
    # the finetune head exists with 21 outputs and boosted lr_mult
    w = np.asarray(solver.net.params["fc8_pascal"]["w"])
    assert 21 in w.shape
    assert solver.net._lr_mults["fc8_pascal"]["w"] == 10.0


def test_net_surgery_prototxt_pair_transplant():
    """examples/net_surgery/: IP head == transplanted conv head at the
    training size; the cast net emits a score MAP on larger input."""
    import deepcut_tpu.compat as caffe

    src = caffe.Net(f"{EX}/net_surgery/conv.prototxt", caffe.TEST,
                    compute_dtype=None)
    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".caffemodel") as f:
        src.save(f.name)
        dst = caffe.Net(f"{EX}/net_surgery/full_conv.prototxt", f.name,
                        caffe.TEST, compute_dtype=None)

    ip_w = src.params["ip"][0].data
    ip_b = src.params["ip"][1].data
    conv_w = dst.params["score"][0].data
    kh, kw, cin, cout = conv_w.shape
    dst.params["score"][0].data[...] = (
        ip_w.reshape(cout, cin, kh, kw).transpose(2, 3, 1, 0))
    dst.params["score"][1].data[...] = ip_b

    x = np.random.RandomState(0).randn(1, 3, 33, 33).astype(np.float32)
    y_ip = src.forward(data=x)["ip"]
    y_conv = dst.forward(data=x)["score"]
    np.testing.assert_allclose(y_ip.reshape(-1), y_conv.reshape(-1),
                               rtol=1e-4, atol=1e-4)

    big = np.random.RandomState(1).randn(1, 3, 96, 96).astype(np.float32)
    smap = dst.forward(data=big)["score"]
    assert smap.shape[0] == 1 and smap.shape[1] == 4
    assert smap.shape[2] > 1 and smap.shape[3] > 1
