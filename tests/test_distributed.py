"""Multi-host smoke: 2-process jax.distributed over CPU (gloo collectives).

The reference is single-node only (P2PSync, parallel.cpp); the TPU build
scales out with jax.distributed + the same mesh declarations. This test
launches two real OS processes, initialises the coordination service, builds
a global 4-device ('data','spatial') mesh spanning both, and runs ONE full
DeeperCut train step with cross-process gradient reduction.
"""

import socket
import subprocess
import sys
import textwrap

from conftest import cpu_subprocess_env

WORKER = textwrap.dedent("""
    import os, sys
    pid = int(sys.argv[1]); port = sys.argv[2]
    import jax
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    from deepcut_tpu.parallel import distributed
    distributed.initialize(f"localhost:{port}", 2, pid)
    assert jax.local_device_count() == 2 and jax.device_count() == 4

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from deepcut_tpu.models.resnet import DeeperCutConfig, init_params
    from deepcut_tpu.solver.update_rules import SolverConfig, init_state
    from deepcut_tpu.parallel.train_step import make_train_step

    mesh = distributed.global_mesh(spatial=1)
    cfg = DeeperCutConfig(depths=(1, 1, 1, 1), stage_widths=(8, 8, 16, 16),
                          num_joints=3, compute_dtype=jnp.float32)
    params = init_params(jax.random.PRNGKey(0), cfg)
    scfg = SolverConfig(solver_type="SGD", base_lr=0.01, momentum=0.9)
    state = init_state(scfg, params)
    n, h, w = 4, 32, 32
    hh, ww, J = h // 8, w // 8, cfg.num_joints

    def make_shard(name, shape):
        sh = NamedSharding(mesh, P("data"))
        return jax.make_array_from_callback(
            shape, sh, lambda idx: jax.random.normal(
                jax.random.PRNGKey(hash(name) % 2**31), shape)[idx] * 0.1)

    batch = {
        "image": make_shard("image", (n, h, w, 3)),
        "part_score_targets": make_shard("pst", (n, hh, ww, J)),
        "part_score_weights": make_shard("psw", (n, hh, ww, J)),
        "locref_targets": make_shard("lt", (n, hh, ww, 2 * J)),
        "locref_weights": make_shard("lw", (n, hh, ww, 2 * J)),
        "pairwise_targets": make_shard("pt", (n, hh, ww, cfg.pairwise_channels)),
        "pairwise_weights": make_shard("pw", (n, hh, ww, cfg.pairwise_channels)),
    }
    with mesh:
        step = make_train_step(cfg, scfg, mesh, donate=False)
        params2, state2, metrics = step(params, state, batch)
        jax.block_until_ready(params2)
    loss = float(metrics["total_loss"])
    assert loss == loss, "nan loss"
    print(f"DIST_OK proc={pid} loss={loss:.6f}", flush=True)

    # ---- leg 2: SPATIAL training with the 'spatial' axis CROSSING the
    # process boundary — the shard_map halo ppermutes ride the gloo
    # transport (multi-host analog of the ICI path)
    mesh2 = distributed.global_mesh(spatial=2)   # (data=2, spatial=2)
    n2, h2 = 2, 64
    hh2 = h2 // 8

    def shard2(name, shape, spec):
        sh = NamedSharding(mesh2, spec)
        return jax.make_array_from_callback(
            shape, sh, lambda idx: jax.random.normal(
                jax.random.PRNGKey(hash(name) % 2**31), shape)[idx] * 0.1)

    batch2 = {
        "image": shard2("image2", (n2, h2, w, 3), P("data", "spatial")),
        "part_score_targets": shard2("pst2", (n2, hh2, ww, J), P("data")),
        "part_score_weights": shard2("psw2", (n2, hh2, ww, J), P("data")),
        "locref_targets": shard2("lt2", (n2, hh2, ww, 2 * J), P("data")),
        "locref_weights": shard2("lw2", (n2, hh2, ww, 2 * J), P("data")),
        "pairwise_targets": shard2("pt2", (n2, hh2, ww, cfg.pairwise_channels), P("data")),
        "pairwise_weights": shard2("pw2", (n2, hh2, ww, cfg.pairwise_channels), P("data")),
    }
    with mesh2:
        step2 = make_train_step(cfg, scfg, mesh2, donate=False)
        p3, s3, m3 = step2(params, state, batch2)
        jax.block_until_ready(p3)
    loss2 = float(m3["total_loss"])
    assert loss2 == loss2, "nan spatial loss"
    print(f"SPATIAL_DIST_OK proc={pid} loss2={loss2:.6f}", flush=True)

    # ---- leg 3: orbax checkpoint written COOPERATIVELY by both processes
    # (the multi-host story of solver/orbax_ckpt.py: one logical checkpoint,
    # synchronized via the same coordination service the mesh runs on),
    # restored on both and verified equal to the post-step params.
    import numpy as np
    from deepcut_tpu.solver import orbax_ckpt
    ck = os.path.join(sys.argv[3], "dist.orbax")
    orbax_ckpt.save(ck, params2, state2, use_async=False)
    pr, sr = orbax_ckpt.restore(ck, like=(params2, state2), mesh=mesh)
    for a, b in zip(jax.tree_util.tree_leaves(params2),
                    jax.tree_util.tree_leaves(pr)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(sr["iter"]) == int(state2["iter"])
    print(f"ORBAX_DIST_OK proc={pid}", flush=True)
""")


def test_two_process_distributed_train_step(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = cpu_subprocess_env(n_devices=2)
    ckdir = tmp_path / "ck"
    ckdir.mkdir()
    procs = [
        subprocess.Popen([sys.executable, str(script), str(pid), str(port),
                          str(ckdir)],
                         env=env, cwd="/root/repo",
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{out}\n{err[-3000:]}"
        assert "DIST_OK" in out
        assert "SPATIAL_DIST_OK" in out
        assert "ORBAX_DIST_OK" in out
    # both processes computed the same globally-reduced losses (DP leg and
    # the cross-process spatial shard_map leg)
    losses = {o.split("loss=")[1].split()[0] for _, o, _ in outs}
    assert len(losses) == 1, losses
    losses2 = {o.split("loss2=")[1].split()[0] for _, o, _ in outs}
    assert len(losses2) == 1, losses2
