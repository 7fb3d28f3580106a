"""On-device target rasterizer vs the host rasterizer.

pose/targets_device.py must reproduce pose.targets.rasterize exactly: the
compact-annotation + device-rasterize path is the production training input
layout (the dense maps never cross the host->device boundary), so every
configuration's maps are checked against the host implementation, including
the bucket-padding region and the RNG-driven negative-sampling mask.
"""

import numpy as np
import pytest

from deepcut_tpu.data.window_file import ImageRecord, Person, default_stats
from deepcut_tpu.pose.targets import TargetConfig, grid_geometry, rasterize
from deepcut_tpu.pose import targets_device as TD


def _record(rng, num_people=1, height=160, width=200, with_skip=False):
    people = []
    for _ in range(num_people):
        k = rng.randint(5, 15)
        classes = rng.permutation(14)[:k] + 1
        if with_skip:
            classes = np.concatenate([classes, [15]])
        xy = np.stack([
            rng.uniform(0, width, len(classes)),
            rng.uniform(0, height, len(classes)),
        ], axis=1).astype(np.float32)
        people.append(Person(classes.astype(np.int32), xy))
    return ImageRecord("x.png", 3, height, width, people)


CONFIGS = [
    TargetConfig(soft_labels=False, location_refinement=True),
    TargetConfig(soft_labels=True, gauss_blob_sigma=10.0, location_refinement=True),
    TargetConfig(soft_labels=False, multi_label=True, no_bg_class=True,
                 location_refinement=True, regress_to_other=True),
    TargetConfig(soft_labels=False, weight_targets=True, fg_fraction=0.25,
                 location_refinement=True, regress_to_other=True),
    TargetConfig(soft_labels=False, fg_fraction=0.25, bg_threshold=17.0,
                 location_refinement=True),
    TargetConfig(soft_labels=True, no_bg_class=True, location_refinement=True,
                 regress_to_other=True, scale=0.6),
]

DENSE_KEYS = ("part_score_targets", "part_score_weights",
              "locref_targets", "locref_weights",
              "pairwise_targets", "pairwise_weights")


def _assert_maps_match(dev, host, ctx=""):
    """Labels and weight maps must match exactly; regression targets are
    allowed f32 ULP-level drift (XLA lowers the /sqrt(53) and /scale
    divisions to reciprocal multiplies — observed max 1 ULP at scale=1,
    ~6e-5 relative under scale jitter)."""
    assert set(dev) == set(host)
    for k in host:
        if k.endswith(("_targets",)) and not k.startswith("part_score"):
            np.testing.assert_allclose(dev[k], host[k], rtol=1e-4, atol=1e-5,
                                       err_msg=f"{k} {ctx}")
        else:
            np.testing.assert_allclose(dev[k], host[k], rtol=1e-6, atol=1e-6,
                                       err_msg=f"{k} {ctx}")


def _device_maps(rec, cfg, seed, scale, grid=None, pad=(0, 0)):
    """Run compact_sample + the device rasterizer for one record."""
    import jax

    rng = np.random.RandomState(seed)
    anno = TD.compact_sample(rec, cfg, rng=rng, scale=scale)
    sh, sw, _, _ = grid_geometry(rec.height, rec.width, scale)
    gh, gw = (sh + pad[0], sw + pad[1]) if grid is None else grid
    batch = {}
    for k in TD.ANNO_KEYS:
        v = anno[k]
        if k == "anno_neg_mask":
            b = np.zeros((gh, gw), np.uint8)
            b[: v.shape[0], : v.shape[1]] = v
            v = b
        batch[k] = np.asarray(v)[None]
    batch["image"] = np.zeros((1, gh * 8, gw * 8, 3), np.uint8)
    apply = TD.make_batch_rasterizer(cfg)
    out = jax.jit(apply)(batch)
    return {k: np.asarray(v[0]) for k, v in out.items() if k in DENSE_KEYS}


def _host_maps_padded(rec, cfg, seed, scale, pad=(0, 0)):
    """Host rasterize + the next_batch bucket-padding rules."""
    from deepcut_tpu.pose.targets import IGNORE_VALUE

    maps = rasterize(rec, cfg, rng=np.random.RandomState(seed), scale=scale)
    sh, sw = maps["part_score_targets"].shape[:2]
    gh, gw = sh + pad[0], sw + pad[1]
    out = {}
    for k in DENSE_KEYS:
        if k not in maps:
            continue
        a = maps[k]
        fill = IGNORE_VALUE if k == "part_score_targets" else 0.0
        b = np.full((gh, gw) + a.shape[2:], fill, np.float32)
        b[:sh, :sw] = a
        out[k] = b
    return out


@pytest.mark.parametrize("cfg_idx", range(len(CONFIGS)))
@pytest.mark.parametrize("num_people,with_skip", [(1, False), (3, True)])
def test_device_matches_host(cfg_idx, num_people, with_skip):
    cfg = CONFIGS[cfg_idx]
    rng = np.random.RandomState(100 + cfg_idx)
    rec = _record(rng, num_people=num_people, with_skip=with_skip)
    dev = _device_maps(rec, cfg, seed=7, scale=cfg.scale)
    host = _host_maps_padded(rec, cfg, seed=7, scale=cfg.scale)
    _assert_maps_match(dev, host, f"(config {cfg_idx})")


def test_device_matches_host_hard_ulp():
    """Hard labels at scale 1: labels/weights bit-identical on the CPU
    backend; regression targets within 1 f32 ULP (the reciprocal-multiply
    division rewrite is the only deviation)."""
    cfg = TargetConfig(location_refinement=True, regress_to_other=True)
    rec = _record(np.random.RandomState(3), num_people=2, with_skip=True)
    dev = _device_maps(rec, cfg, seed=7, scale=1.0)
    host = _host_maps_padded(rec, cfg, seed=7, scale=1.0)
    for k in ("part_score_targets", "part_score_weights",
              "locref_weights", "pairwise_weights", "pairwise_targets"):
        assert np.array_equal(dev[k], host[k]), k
    d = np.abs(dev["locref_targets"] - host["locref_targets"])
    assert d.max() <= 3e-7, d.max()


def test_device_padding_region():
    """Bucket padding beyond the sample grid: labels ignore, weights zero,
    regression zero — identical to PoseDataSource.next_batch's host pads."""
    cfg = TargetConfig(location_refinement=True, regress_to_other=True,
                       weight_targets=True, fg_fraction=0.25)
    rec = _record(np.random.RandomState(5))
    dev = _device_maps(rec, cfg, seed=7, scale=1.0, pad=(3, 5))
    host = _host_maps_padded(rec, cfg, seed=7, scale=1.0, pad=(3, 5))
    _assert_maps_match(dev, host)


def test_device_empty_record_modes():
    """Zero-person records across negative-handling modes (the
    _fill_background_empty semantics must fall out of the device math)."""
    rec = ImageRecord("e.png", 3, 96, 128, [])
    for cfg in [TargetConfig(),
                TargetConfig(weight_targets=True, fg_fraction=0.25),
                TargetConfig(fg_fraction=0.25),
                TargetConfig(soft_labels=True),
                TargetConfig(no_bg_class=True, multi_label=True)]:
        dev = _device_maps(rec, cfg, seed=1, scale=1.0)
        host = _host_maps_padded(rec, cfg, seed=1, scale=1.0)
        _assert_maps_match(dev, host, str(cfg))


def test_negative_sampling_mask_parity():
    """fg_fraction sampling: the shipped host-drawn mask reproduces the host
    rasterizer's sampled negatives AND consumes the RNG stream identically
    (the draw after rasterization must match)."""
    cfg = TargetConfig(fg_fraction=0.25, bg_threshold=17.0)
    rec = _record(np.random.RandomState(11), num_people=2)
    r1, r2 = np.random.RandomState(7), np.random.RandomState(7)
    host = rasterize(rec, cfg, rng=r1, scale=1.0)
    TD.compact_sample(rec, cfg, rng=r2, scale=1.0)
    assert r1.randint(1 << 30) == r2.randint(1 << 30)
    dev = _device_maps(rec, cfg, seed=7, scale=1.0)
    np.testing.assert_allclose(dev["part_score_targets"],
                               host["part_score_targets"], rtol=1e-6, atol=1e-6)


def test_pose_data_source_device_mode_batches():
    """PoseDataSource(device_targets=True): same seed as the dense mode,
    the device-rasterized batch equals the host-rasterized batch exactly
    (maps, images, and RNG trajectory)."""
    import jax

    rng = np.random.RandomState(0)
    recs = []
    for i in range(4):
        r = _record(rng, num_people=1 + i % 2, height=120 + 8 * i,
                    width=160 - 8 * i)
        recs.append(r)
    cfg = TargetConfig(location_refinement=True, regress_to_other=True,
                       weight_targets=True, fg_fraction=0.25,
                       scale_jitter_lo=0.85, scale_jitter_up=1.15,
                       rpn=True, segmentation=True)  # aux targets stay
                       # host-built and pass through the device mode

    def loader(path):
        h = int(path.split("_")[1])
        w = int(path.split("_")[2])
        return (np.arange(h * w * 3).reshape(h, w, 3) % 251).astype(np.uint8)

    recs = [ImageRecord(f"img_{r.height}_{r.width}_", 3, r.height, r.width,
                        r.people) for r in recs]
    from deepcut_tpu.data.pipeline import PoseDataSource
    kw = dict(cfg=cfg, seed=4, image_loader=loader, uint8_images=True)
    src_host = PoseDataSource(recs, **kw)
    src_dev = PoseDataSource(recs, device_targets=True, **kw)
    for _ in range(3):
        bh = src_host.next_batch(2)
        bd = src_dev.next_batch(2)
        np.testing.assert_array_equal(bd["image"], bh["image"])
        rast = TD.make_batch_rasterizer(cfg)
        dense = {k: np.asarray(v) for k, v in jax.jit(rast)(bd).items()}
        _assert_maps_match({k: dense[k] for k in bh if k != "image"},
                           {k: bh[k] for k in bh if k != "image"})


def test_pose_solver_device_target_trajectory():
    """PoseSolver trained from compact annotations (on-device rasterization)
    follows the host-rasterized trajectory: same seeds, same batches, losses
    and parameters agree to f32 tolerance over several steps (targets differ
    only at ULP level — the division-rewrite note above)."""
    import jax
    import jax.numpy as jnp
    from deepcut_tpu.data.pipeline import PoseDataSource
    from deepcut_tpu.models.resnet import DeeperCutConfig
    from deepcut_tpu.solver.solver import PoseSolver, SolverParams
    from deepcut_tpu.solver.update_rules import SolverConfig

    tcfg = TargetConfig(num_classes=14, no_bg_class=True,
                        location_refinement=True, regress_to_other=True,
                        weight_targets=True, fg_fraction=0.25)
    model = DeeperCutConfig(depths=(1, 1, 1, 1), stage_widths=(4, 4, 8, 8),
                            num_joints=14, pairwise=True,
                            compute_dtype=jnp.float32)
    rng = np.random.RandomState(0)
    recs = []
    for i in range(3):
        k = rng.randint(6, 14)
        classes = (rng.permutation(14)[:k] + 1).astype(np.int32)
        xy = np.stack([rng.uniform(10, 150, k),
                       rng.uniform(10, 110, k)], 1).astype(np.float32)
        recs.append(ImageRecord(f"img{i}", 3, 120, 160, [Person(classes, xy)]))
    imgs = {f"img{i}": np.random.RandomState(50 + i).randint(
        0, 255, (120, 160, 3), np.uint8) for i in range(3)}

    def loader(path):
        return imgs[path]

    def solver_params():
        return SolverParams(
            config=SolverConfig(solver_type="SGD", base_lr=0.001,
                                momentum=0.9, weight_decay=0.0001,
                                lr_policy="fixed"),
            max_iter=4, display=0, snapshot=0, snapshot_prefix="/tmp/dc_devt")

    losses = {}
    params = {}
    for mode in ("host", "device"):
        src = PoseDataSource(recs, tcfg, seed=5, image_loader=loader,
                             bucket_step=32, uint8_images=True,
                             device_targets=(mode == "device"))
        solver = PoseSolver(
            solver_params(), model, lambda s=src: s.next_batch(2),
            handle_signals=False, log=lambda *_: None,
            target_cfg=tcfg if mode == "device" else None)
        ls = []
        for _ in range(4):
            solver.step(1)
            ls.append(solver.smoothed_loss)
        losses[mode] = ls
        params[mode] = solver.net_params
    np.testing.assert_allclose(losses["device"], losses["host"],
                               rtol=1e-5, atol=1e-6)
    for (k, a), (_, b) in zip(sorted(params["host"].items()),
                              sorted(params["device"].items())):
        for (kk, va), (_, vb) in zip(sorted(a.items()), sorted(b.items())):
            np.testing.assert_allclose(np.asarray(va), np.asarray(vb),
                                       rtol=1e-4, atol=1e-6,
                                       err_msg=f"{k}/{kk}")


def test_device_targets_on_mesh_matches_host_single_device(run_in_cpu_mesh):
    """Compact-annotation batches on a mesh: one step with on-device target
    rasterization on (data=8) AND on (data=4, spatial=2) must match the
    single-device step fed the HOST-rasterized dense batch for the same
    samples (annos shard over 'data'; each spatial shard rasterizes the
    full grid)."""
    code = """
import numpy as np, jax, jax.numpy as jnp
from deepcut_tpu.data.pipeline import PoseDataSource
from deepcut_tpu.data.window_file import ImageRecord, Person
from deepcut_tpu.models.resnet import DeeperCutConfig, init_params
from deepcut_tpu.parallel.mesh import make_mesh
from deepcut_tpu.parallel.train_step import make_train_step
from deepcut_tpu.pose.targets import TargetConfig
from deepcut_tpu.solver.update_rules import SolverConfig, init_state

tcfg = TargetConfig(num_classes=14, no_bg_class=True,
                    location_refinement=True, regress_to_other=True,
                    weight_targets=True, fg_fraction=0.25)
cfg = DeeperCutConfig(depths=(1,1,1,1), stage_widths=(4,4,8,8),
                      num_joints=14, pairwise=True, compute_dtype=jnp.float32)
scfg = SolverConfig(solver_type='SGD', base_lr=0.02, momentum=0.9,
                    weight_decay=0.0)
rng = np.random.RandomState(0)
recs = []
for i in range(3):
    k = rng.randint(6, 14)
    classes = (rng.permutation(14)[:k] + 1).astype(np.int32)
    xy = np.stack([rng.uniform(10, 150, k), rng.uniform(10, 110, k)], 1).astype(np.float32)
    recs.append(ImageRecord(f'img{i}', 3, 120, 160, [Person(classes, xy)]))
imgs = {f'img{i}': np.random.RandomState(50+i).randint(0, 255, (120, 160, 3), np.uint8)
        for i in range(3)}
loader = lambda p: imgs[p]
kw = dict(cfg=tcfg, seed=5, image_loader=loader, bucket_step=32, uint8_images=True)
b_host = PoseDataSource(recs, **kw).next_batch(8)
b_dev = PoseDataSource(recs, device_targets=True, **kw).next_batch(8)
params = init_params(jax.random.PRNGKey(1), cfg)
state = init_state(scfg, params)

p1, s1, m1 = make_train_step(cfg, scfg, None, donate=False)(params, state, b_host)
results = {}
for name, (nmesh, nsp) in {'dp': (8, 1), 'sp': (8, 2)}.items():
    mesh = make_mesh(nmesh, spatial=nsp)
    with mesh:
        step = make_train_step(cfg, scfg, mesh, donate=False, target_cfg=tcfg)
        p2, s2, m2 = step(params, state, b_dev)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
    assert abs(float(m1['total_loss']) - float(m2['total_loss'])) <= 1e-4 * max(1.0, abs(float(m1['total_loss'])))
print('DEVICE-TARGET-MESH-MATCH')
"""
    out = run_in_cpu_mesh(code, n_devices=8)
    assert "DEVICE-TARGET-MESH-MATCH" in out
