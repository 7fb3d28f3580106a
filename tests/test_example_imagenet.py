"""The examples/imagenet CaffeNet recipe end-to-end (scaled down for CI):
synthetic images -> convert_imageset -> compute_image_mean -> CaffeNet train
with crop/mirror/mean-file transforms -> snapshot/resume -> finetune with a
renamed head from the exported .caffemodel (examples/finetune)."""

import importlib.util
import os

import numpy as np
import pytest


def _load_make_dataset():
    spec = importlib.util.spec_from_file_location(
        "imagenet_make_dataset", "/root/repo/examples/imagenet/make_dataset.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _shrink(text: str, data_dir: str) -> str:
    """Point the example prototxt at tmp data and shrink it for CI: small
    batch, small crop (every layer adapts — fully convolutional trunk +
    shape-inferred fc6)."""
    text = text.replace("examples/imagenet/data", data_dir)
    text = text.replace("examples/finetune/data", data_dir)
    text = text.replace("batch_size: 16", "batch_size: 4")
    text = text.replace("batch_size: 8", "batch_size: 4")
    text = text.replace("crop_size: 227", "crop_size: 99")
    text = text.replace("input_dim: 227", "input_dim: 99")  # deploy net
    text = text.replace("num_output: 4096", "num_output: 256")
    return text


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("imagenet_data"))
    _load_make_dataset().main(48, d)
    return d


def _make_solver(tmp_path, data_dir, net_name, solver_name, max_iter):
    from deepcut_tpu.solver.solver import SolverParams, GraphSolver

    src_dir = ("/root/repo/examples/imagenet"
               if net_name.startswith("caffenet") else
               "/root/repo/examples/finetune")
    with open(f"{src_dir}/{net_name}") as f:
        net_file = str(tmp_path / net_name)
        with open(net_file, "w") as g:
            g.write(_shrink(f.read(), data_dir))
    with open(f"{src_dir}/{solver_name}") as f:
        text = f.read().replace(
            f"examples/imagenet/{net_name}", net_file).replace(
            f"examples/finetune/{net_name}", net_file)
        text = text.replace("examples/imagenet/data", str(tmp_path)).replace(
            "examples/finetune/data", str(tmp_path))
        text = text.replace("max_iter: 2000", f"max_iter: {max_iter}")
        text = text.replace("max_iter: 1000", f"max_iter: {max_iter}")
        text = text.replace("test_iter: 12", "test_iter: 4")
        text = text.replace("test_iter: 8", "test_iter: 4")
        # disable in-run testing the way real Caffe allows it: interval 0
        # with test nets is rejected (CHECK_GT, solver.cpp:141), so push
        # the interval past max_iter and skip the iter-0 pass
        text = text.replace(
            "test_interval: 500",
            "test_interval: 100000\ntest_initialization: false")
        text = text.replace("snapshot: 1000", "snapshot: 0")
        text = text.replace("display: 100", "display: 0")
    sp = SolverParams.from_prototxt(text)
    return GraphSolver(sp, net_file, handle_signals=False, log=lambda *_: None)


def test_caffenet_train_snapshot_finetune(data_dir, tmp_path):
    from deepcut_tpu.proto.caffemodel import load_caffemodel

    # --- base training (examples/imagenet) ---
    solver = _make_solver(tmp_path, data_dir, "caffenet_train_val.prototxt",
                          "caffenet_solver.prototxt", max_iter=12)
    solver.solve()
    assert solver.iter == 12
    metrics = solver.test()
    assert np.isfinite(metrics["loss"]) and "accuracy" in metrics

    model_path = solver.snapshot(export_caffemodel=True)
    caffemodel = model_path.replace(".npz", ".caffemodel")
    assert os.path.exists(caffemodel)
    blobs = load_caffemodel(caffemodel)
    assert "conv1" in blobs and "fc8" in blobs

    # --- resume (resume_training.sh analog) ---
    resumed = _make_solver(tmp_path, data_dir, "caffenet_train_val.prototxt",
                           "caffenet_solver.prototxt", max_iter=14)
    resumed.restore(model_path)
    assert resumed.iter == 12
    resumed.solve()
    assert resumed.iter == 14

    # --- finetune with renamed head (examples/finetune) ---
    # the target task has 4 classes (fc8_target num_output: 4); labels must
    # stay in range — out-of-range labels now poison the loss to NaN by
    # design (softmax_with_loss range guard) instead of silently clamping
    d4 = str(tmp_path / "ft_data")
    _load_make_dataset().main(16, d4, n_classes=4)
    ft = _make_solver(tmp_path, d4, "finetune_train_val.prototxt",
                      "finetune_solver.prototxt", max_iter=2)
    before = np.asarray(ft.net.params["conv1"]["w"]).copy()
    ft.net.load_weights(caffemodel)
    after = np.asarray(ft.net.params["conv1"]["w"])
    assert not np.allclose(before, after), "trunk weights were not copied"
    # the renamed head must NOT be copied: fresh 4-class shape
    # (InnerProduct keeps Caffe's (num_output, in) weight layout)
    assert ft.net.params["fc8_target"]["w"].shape[0] == 4
    ft.solve()
    assert ft.iter == 2
    assert np.isfinite(ft.smoothed_loss), "finetune loss went non-finite"

    # --- deploy net + Classifier (00-classification notebook flow) ---
    from deepcut_tpu.classifier import Classifier

    with open("/root/repo/examples/imagenet/caffenet_deploy.prototxt") as f:
        deploy_file = str(tmp_path / "caffenet_deploy.prototxt")
        with open(deploy_file, "w") as g:
            g.write(_shrink(f.read(), data_dir))
    clf = Classifier(deploy_file, caffemodel, raw_scale=255.0,
                     channel_swap=(2, 1, 0))
    img = np.random.RandomState(0).rand(128, 128, 3).astype(np.float32)
    probs = clf.predict([img], oversample=True)
    assert probs.shape == (1, 8)
    np.testing.assert_allclose(probs.sum(), 1.0, rtol=1e-3)
