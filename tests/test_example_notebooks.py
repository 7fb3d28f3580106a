"""The example notebooks are valid nbformat-4 JSON, their code cells are
syntactically valid Python, and the solver API they rely on
(GraphSolver.step / .smoothed_loss) behaves as shown."""

import glob
import json

import numpy as np


def test_notebooks_valid():
    paths = sorted(glob.glob("/root/repo/examples/*.ipynb")
                   + glob.glob("/root/repo/examples/*/*.ipynb"))
    assert len(paths) >= 7, paths  # 00-03 + detection + net_surgery + siamese
    for path in paths:
        with open(path) as f:
            nb = json.load(f)
        assert nb["nbformat"] == 4
        kinds = {c["cell_type"] for c in nb["cells"]}
        assert kinds == {"markdown", "code"}, (path, kinds)
        for cell in nb["cells"]:
            src = "".join(cell["source"])
            if cell["cell_type"] == "code":
                compile(src, path, "exec")  # syntax check


def test_smoothed_loss_api(tmp_path):
    from deepcut_tpu.solver.solver import SolverParams, GraphSolver

    proto = tmp_path / "net.prototxt"
    proto.write_text("""
    name: "t"
    layer { name: "data" type: "DummyData" top: "data" top: "label"
      dummy_data_param {
        shape { dim: 4 dim: 6 } shape { dim: 4 }
        data_filler { type: "gaussian" std: 1.0 }
        data_filler { type: "constant" value: 1 } } }
    layer { name: "ip" type: "InnerProduct" bottom: "data" top: "ip"
      inner_product_param { num_output: 3
        weight_filler { type: "xavier" } } }
    layer { name: "loss" type: "SoftmaxWithLoss" bottom: "ip" bottom: "label"
      top: "loss" }
    """)
    sp = SolverParams.from_prototxt(f"""
        net: "{proto}"
        base_lr: 0.1
        lr_policy: "fixed"
        display: 0
        average_loss: 5
        max_iter: 100
        snapshot: 0
        snapshot_prefix: "{tmp_path}/t"
    """)
    solver = GraphSolver(sp, str(proto), handle_signals=False,
                         log=lambda *_: None)
    assert np.isnan(solver.smoothed_loss)
    solver.step(3)
    first = solver.smoothed_loss
    assert np.isfinite(first)
    solver.step(20)
    assert solver.smoothed_loss < first  # converging on fixed dummy labels


def _exec_notebook(path, timeout_note=""):
    """Execute a notebook's code cells in-process (matplotlib Agg)."""
    import matplotlib
    matplotlib.use("Agg")
    import os
    with open(path) as f:
        nb = json.load(f)
    src = "\n\n".join("".join(c["source"]) for c in nb["cells"]
                      if c["cell_type"] == "code")
    cwd = os.getcwd()
    os.chdir("/root/repo")
    try:
        exec(compile(src, path, "exec"), {"__name__": "__nb__"})
    finally:
        os.chdir(cwd)


def test_detection_notebook_executes():
    _exec_notebook("/root/repo/examples/detection.ipynb")


def test_net_surgery_notebook_executes():
    _exec_notebook("/root/repo/examples/net_surgery.ipynb")


def test_siamese_notebook_executes():
    """Trains 500 iters on the paired-LevelDB fixture (~1 min CPU) and
    embeds digits through the deploy branch."""
    _exec_notebook("/root/repo/examples/siamese/mnist_siamese.ipynb")
