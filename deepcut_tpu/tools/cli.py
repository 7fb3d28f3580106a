"""Command-line front end: train / test / time / device_query.

Mirrors tools/caffe.cpp's brew verbs and flags (-solver, -model, -weights,
-snapshot, -iterations, -gpu). Differences by design:

- `-gpu all` style device selection becomes mesh configuration: the train
  step shards the batch over every visible device (JAX owns placement);
- `time` reports both the honest fused-graph step time (what you actually
  pay on TPU) and an optional per-layer breakdown executed unfused
  (`-per_layer`), since XLA fusion makes per-layer wall-clock a fiction.

Usage: python -m deepcut_tpu.tools.cli <verb> [flags]
"""

from __future__ import annotations

import argparse
import os
import sys
import time as _time
from typing import Dict, List, Optional

import numpy as np


def device_query(args) -> int:
    import jax

    for d in jax.devices():
        print(f"Device id:   {d.id}")
        print(f"  platform:  {d.platform}")
        print(f"  kind:      {d.device_kind}")
        try:
            stats = d.memory_stats()
            if stats:
                total = stats.get("bytes_limit", 0) / 2**30
                used = stats.get("bytes_in_use", 0) / 2**30
                print(f"  memory:    {used:.2f} / {total:.2f} GiB in use")
        except Exception:
            pass
    return 0


def _target_config_from_layer(node) -> "TargetConfig":
    from deepcut_tpu.pose.targets import TargetConfig

    pp = node.get("pose_data_param")
    if pp is None:
        raise ValueError("train net has no PoseData layer")
    kw = dict(
        num_classes=pp.get_int("num_classes", 14),
        scale=pp.get_float("scale", 1.0),
        fg_threshold=pp.get_float("fg_threshold", 17.0),
        soft_labels=pp.get_bool("soft_labels", False),
        gauss_blob_sigma=pp.get_float("gauss_blob_sigma", 10.0),
        multi_label=pp.get_bool("multi_label", False),
        no_bg_class=pp.get_bool("no_bg_class", False),
        location_refinement=pp.get_bool("location_refinement", False),
        regress_to_other=pp.get_bool("regress_to_other", False),
        weight_targets=pp.get_bool("weight_targets", False),
        max_input_size=pp.get_int("max_input_size", 700),
    )
    if pp.has("scale_jitter_lo") and pp.has("scale_jitter_up"):
        kw["scale_jitter_lo"] = pp.get_float("scale_jitter_lo")
        kw["scale_jitter_up"] = pp.get_float("scale_jitter_up")
    if pp.has("fg_fraction"):
        kw["fg_fraction"] = pp.get_float("fg_fraction")
    if pp.has("bg_threshold"):
        kw["bg_threshold"] = pp.get_float("bg_threshold")
    return TargetConfig(**kw), pp


def train(args) -> int:
    import jax.numpy as jnp
    from deepcut_tpu.proto import text_format
    from deepcut_tpu.solver.solver import SolverParams, PoseSolver
    from deepcut_tpu.data.pipeline import PoseDataSource, Prefetcher
    from deepcut_tpu.data.window_file import parse_stats_file
    from deepcut_tpu.models.resnet import deepercut_config

    sp = SolverParams.from_prototxt(args.solver)
    try:
        model_def, _stages, _level = sp.resolve_train_net()
    except ValueError as e:
        print(str(e), file=sys.stderr)
        return 1
    # inline net_param/train_net_param definitions arrive as parsed nodes
    # (Solver::InitTrainNet, solver.cpp:75-92)
    net_proto = (model_def if not isinstance(model_def, str)
                 else text_format.parse_file(model_def))
    data_layer = None
    for layer in net_proto.get_list("layer"):
        if layer.get_str("type") == "PoseData":
            data_layer = layer
            break
    mesh = None
    if getattr(args, "mesh", 0):
        # training over N chips (the `-gpu 0,1,...` analog): batch over the
        # 'data' axis; -spatial S additionally shards image ROWS over a
        # spatial axis. The pose trainer uses the native shard_map path
        # (parallel/spatial.py, canvas H % (16*S) == 0); the generic graph
        # trainer uses the plan splitter (parallel/graph_spatial.py), which
        # shards every geometry-compatible conv/pool prefix and falls back
        # to data-parallel from the first incompatible layer.
        from deepcut_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(args.mesh, spatial=max(getattr(args, "spatial", 1), 1))
    if data_layer is None:
        # Generic graph training (LeNet/CaffeNet-style recipes).
        from deepcut_tpu.solver.solver import GraphSolver
        solver = GraphSolver(sp, mesh=mesh,
                             sigint_effect=args.sigint_effect,
                             sighup_effect=args.sighup_effect)
        if args.weights:
            # finetune: copy matching layers by name, from each file of a
            # comma-separated list in order (caffe.cpp CopyLayers:123-135
            # boost::split on ',')
            for w in args.weights.split(","):
                solver.net.load_weights(w)
        if args.snapshot:
            solver.restore(args.snapshot)
        solver.solve()
        return 0
    tcfg, pp = _target_config_from_layer(data_layer)
    stats = None
    if pp.get_str("joint_pairs_stats"):
        stats = parse_stats_file(pp.get_str("joint_pairs_stats"))
    # with -spatial S the shard_map train step needs canvas H divisible by
    # 16*S and >= 32*S (parallel/spatial.py shape contract) — bucketing to
    # 32*S satisfies both; the default 64 already covers S <= 2
    spatial = max(getattr(args, "spatial", 1), 1)
    source = PoseDataSource(
        pp.get_str("source"), tcfg, stats,
        root_folder=pp.get_str("root_folder", ""),
        cycle=pp.get_bool("cycle_training_data", False),
        bucket_step=max(64, 32 * spatial),
        # random_seed < 0 = unseeded (the reference seeds from entropy
        # unless random_seed >= 0, solver.cpp:53-54); clamping the sentinel
        # to 0 would make every unseeded run identical
        seed=(sp.random_seed if sp.random_seed >= 0
              else int.from_bytes(os.urandom(4), "little")),
        # parallel decode/warp/canvas; batches are bit-identical to the
        # serial path (the RNG phase stays ordered — data/pipeline.py)
        workers=max(getattr(args, "data_workers", 4), 0),
        # uint8 canvases with device-side mean subtraction: bit-identical
        # trajectories (integer mean), 4x less host->device traffic
        uint8_images=True,
        # ship compact annotations and rasterize the dense target maps ON
        # DEVICE inside the train step (pose/targets_device.py) — ~18x less
        # host->device traffic for the pairwise configuration; targets match
        # the host rasterizer to f32 ULP (-host_targets restores the
        # reference layout)
        device_targets=not getattr(args, "host_targets", False),
        # -augment_device: host ships decoded uint8 images + affine
        # coefficients; warp/scale/canvas run inside the train step's XLA
        # program (pose/augment_device.py) — decode-only host cost, pixels
        # within a couple of grey levels of the cv2 path, targets identical
        augment_device=(bool(getattr(args, "augment_device", False))
                        and spatial <= 1),
    )
    model_cfg = deepercut_config(
        args.resnet,
        num_joints=tcfg.num_classes,
        location_refinement=tcfg.location_refinement,
        pairwise=tcfg.regress_to_other,
        mixed_train=bool(getattr(args, "mixed_precision", False)),
        remat=bool(getattr(args, "remat", False)),
    )
    # prototxt `pose_data_param.batch_size` is the Caffe-native knob; the
    # CLI flag overrides it when given explicitly (default None)
    batch_size = (args.batch_size if args.batch_size
                  else pp.get_int("batch_size", 1))
    prefetch = Prefetcher(lambda: source.next_batch(batch_size), depth=3)
    net_params = None
    if args.weights:
        from deepcut_tpu.proto.caffemodel import load_deepercut_params
        import jax
        net_params = {k: {kk: jnp.asarray(vv) for kk, vv in v.items()}
                      for k, v in load_deepercut_params(args.weights).items()}
        from deepcut_tpu.models.resnet import init_params
        import jax.random as jr
        base = init_params(jr.PRNGKey(0), model_cfg)
        base.update({k: v for k, v in net_params.items() if k in base})
        net_params = base
    solver = PoseSolver(
        sp, model_cfg, prefetch.get, net_params=net_params, mesh=mesh,
        target_cfg=None if getattr(args, "host_targets", False) else tcfg,
        target_stats=None if getattr(args, "host_targets", False) else stats,
        sigint_effect=args.sigint_effect, sighup_effect=args.sighup_effect)
    if args.snapshot:
        solver.restore(args.snapshot)
    try:
        solver.solve()
    finally:
        prefetch.stop()
        source.close()  # decode thread pool
    return 0


def test(args) -> int:
    import jax.numpy as jnp
    from deepcut_tpu.core.graph import Net

    net = Net(args.model, weights=args.weights or None, phase="TEST",
              compute_dtype=None if args.fp32 else jnp.bfloat16)
    shapes = net.input_shapes
    if not shapes and not net.data_sources:
        print("model has no declared inputs or data layers", file=sys.stderr)
        return 1
    rng = np.random.RandomState(0)
    sums: Dict[str, float] = {}
    for i in range(args.iterations):
        if net.data_sources:
            outs = net.forward()  # data layers advance themselves
        else:
            inputs = {nm: rng.randn(*sh).astype(np.float32)
                      for nm, sh in shapes.items()}
            outs = net.forward(**inputs)
        for nm in net.output_names():
            val = outs[nm]
            sums[nm] = sums.get(nm, 0.0) + float(np.mean(val))
    # reference prints per-output averages over the run (tools/caffe.cpp:229-298)
    for nm, s in sums.items():
        print(f"{nm} = {s / args.iterations:.6f}")
    return 0


def time_cmd(args) -> int:
    import jax
    import jax.numpy as jnp
    from deepcut_tpu.core.graph import Net

    net = Net(args.model, phase="TEST",
              compute_dtype=None if args.fp32 else jnp.bfloat16)
    shapes = net.input_shapes
    inputs = {nm: np.zeros(sh, np.float32) for nm, sh in shapes.items()}
    net._pull_data_layers(inputs)  # data-layer nets: time one staged batch
    print(f"Timing {net.name}: {len(net._plan)} layers, "
          f"{args.iterations} iterations")
    # Fused whole-graph timing via the serving path (only terminal blobs
    # computed) and the delta method — on relay-attached TPUs, dispatch is
    # async and block_until_ready is not a sync barrier (docs/performance.md).
    dev_inputs = {}
    for nm, arr in inputs.items():
        a = jnp.asarray(arr)
        dev_inputs[nm] = jnp.transpose(a, (0, 2, 3, 1)) if a.ndim == 4 else a
    net._ensure_params({nm: tuple(v.shape) for nm, v in dev_inputs.items()})
    if getattr(args, "fold_bn", False):
        print(f"folded {net.fold_bn()} BN chains; weights cast to "
              f"{'f32' if args.fp32 else 'bf16'}")
        net.cast_weights(jnp.float32 if args.fp32 else jnp.bfloat16)
    fwd = net.make_forward()
    step = jax.jit(lambda p, i: sum(
        jnp.sum(v.astype(jnp.float32)) for v in fwd(p, i).values()))
    _ = float(step(net.params, dev_inputs))  # compile + warm fetch
    if args.trace:
        with jax.profiler.trace(args.trace):
            for _ in range(max(args.iterations, 3)):
                acc = step(net.params, dev_inputs)
            _ = float(acc)
        print(f"profiler trace written to {args.trace} (view with xprof/tensorboard)")

    def _run(n):
        t0 = _time.perf_counter()
        for _ in range(n):
            acc = step(net.params, dev_inputs)
        _ = float(acc)
        return (_time.perf_counter() - t0) * 1000

    n1 = max(args.iterations // 5, 1)
    n2 = n1 + args.iterations
    t1 = min(_run(n1) for _ in range(2))
    t2 = min(_run(n2) for _ in range(2))
    dt = (t2 - t1) / args.iterations / 1000
    if dt <= 0:
        # tiny graphs / few iterations sit below the relay-noise floor of the
        # delta harness; report the resolution limit rather than noise
        print("Average fused forward: < 0.1 ms (below timing resolution; "
              "raise -iterations for a stable delta)")
    else:
        print(f"Average fused forward: {dt * 1000:.3f} ms")

    if args.per_layer:
        # Unfused per-layer timing (diagnostic; overheads included).
        print("NOTE: per-layer numbers time DISPATCH of lone jitted ops "
              "(~0.5-1 ms/iter overhead on relay-attached TPUs; "
              "block_until_ready is not a completion barrier there) — use "
              "them to rank layers, not as absolute times; the fused "
              "forward above is the honest whole-program measurement.")
        dev_inputs = {}
        for nm, arr in inputs.items():
            a = jnp.asarray(arr)
            if a.ndim == 4:
                a = jnp.transpose(a, (0, 2, 3, 1))
            dev_inputs[nm] = a
        blobs = dict(dev_inputs)
        rows: List = []
        for fn, spec in net._plan:
            bottoms = [blobs[b] for b in spec.bottoms]
            jfn = jax.jit(lambda p, bs, fn=fn: fn(p, bs))
            # _entry resolves shared-weight (named-param) aliases — a raw
            # params.get would miss blobs owned by the aliased layer
            entry = net._entry(net.params, spec.name)
            outs = jfn(entry, bottoms)  # compile
            jax.block_until_ready(outs)
            t0 = _time.perf_counter()
            for _ in range(args.iterations):
                outs = jfn(entry, bottoms)
            jax.block_until_ready(outs)
            per = (_time.perf_counter() - t0) / args.iterations * 1000
            rows.append((spec.name, spec.type, per))
            if not isinstance(outs, (list, tuple)):
                outs = [outs]
            for top, val in zip(spec.tops, outs):
                blobs[top] = val
        rows.sort(key=lambda r: -r[2])
        print(f"{'layer':40s} {'type':20s} {'ms':>8s}")
        for name, typ, ms in rows[: args.top]:
            print(f"{name:40s} {typ:20s} {ms:8.3f}")
        print(f"Sum of unfused layers: {sum(r[2] for r in rows):.2f} ms "
              f"(fusion speedup vs sum: {sum(r[2] for r in rows) / (dt * 1000):.1f}x)")
    return 0


def extract_features(args) -> int:
    """tools/extract_features.cpp analog: run the net, dump named blobs to
    an HDF5 file (datasets named after the blobs)."""
    import h5py
    import jax.numpy as jnp
    from deepcut_tpu.core.graph import Net

    net = Net(args.model, weights=args.weights or None, phase="TEST",
              compute_dtype=None if args.fp32 else jnp.bfloat16)
    blob_names = args.blobs.split(",")
    collected: Dict[str, List[np.ndarray]] = {b: [] for b in blob_names}
    rng = np.random.RandomState(0)
    for _ in range(args.iterations):
        if net.data_sources:
            outs = net.forward()
        else:
            inputs = {nm: rng.randn(*sh).astype(np.float32)
                      for nm, sh in net.input_shapes.items()}
            outs = net.forward(**inputs)
        for b in blob_names:
            collected[b].append(outs[b])
    with h5py.File(args.out, "w") as f:
        for b, chunks in collected.items():
            f.create_dataset(b.replace("/", "_"), data=np.concatenate(chunks))
    print(f"wrote {args.out}")
    return 0


def upgrade_net_proto(args) -> int:
    """upgrade_net_proto_text analog: V0 nested / V1 enum-typed `layers`
    definitions -> normalised V2 prototxt (upgrade_proto.cpp:19-67)."""
    from deepcut_tpu.proto.text_format import parse_file, dump
    from deepcut_tpu.proto.upgrade import upgrade_net
    from deepcut_tpu.core.graph import _V1_TYPE_NAMES

    net = upgrade_net(parse_file(args.input))
    for layer in net.get_list("layer"):
        t = layer.get_str("type", "")
        if t in _V1_TYPE_NAMES:
            layer.fields["type"] = [_V1_TYPE_NAMES[t]]
    with open(args.output, "w") as f:
        f.write(dump(net) + "\n")
    print(f"wrote {args.output}")
    return 0


def upgrade_net_proto_binary(args) -> int:
    """upgrade_net_proto_binary analog: legacy binary NetParameter
    (V0 nested / V1 layers containers) -> modern V2 binary."""
    from collections import OrderedDict
    from deepcut_tpu.proto.caffemodel import load_caffemodel, encode_netparameter

    blobs = load_caffemodel(args.input)  # decodes V0/V1/V2 transparently
    layers = OrderedDict((name, [b.data for b in bs]) for name, bs in blobs.items())
    with open(args.output, "wb") as f:
        f.write(encode_netparameter(layers))
    print(f"wrote {args.output} ({len(layers)} layers)")
    return 0


def upgrade_solver_proto(args) -> int:
    """upgrade_solver_proto_text analog (tools/upgrade_solver_proto_text.cpp):
    legacy `solver_type: ENUM` -> `type: "Name"`."""
    from deepcut_tpu.proto.text_format import parse_file, dump
    from deepcut_tpu.proto.upgrade import upgrade_solver

    with open(args.output, "w") as f:
        f.write(dump(upgrade_solver(parse_file(args.input))) + "\n")
    print(f"wrote {args.output}")
    return 0


def main(argv: Optional[List[str]] = None) -> int:
    parser = argparse.ArgumentParser(prog="deepcut_tpu", description=__doc__)
    sub = parser.add_subparsers(dest="verb", required=True)

    p = sub.add_parser("device_query", help="show available accelerators")
    p.set_defaults(fn=device_query)

    p = sub.add_parser("train", help="train a model from a solver prototxt")
    p.add_argument("-solver", required=True)
    p.add_argument("-snapshot", default="", help="resume from .npz snapshot")
    p.add_argument("-weights", default="", help="finetune from .caffemodel")
    p.add_argument("-batch_size", type=int, default=None,
                   help="override pose_data_param.batch_size (default: "
                        "use the prototxt's, else 1)")
    p.add_argument("-resnet", type=int, default=152, choices=(50, 101, 152))
    p.add_argument("-mesh", type=int, default=0,
                   help="data-parallel over N devices (the -gpu 0,1,.. analog)")
    p.add_argument("-spatial", type=int, default=1,
                   help="with -mesh: shard image rows over a spatial axis of "
                        "this size for pose training (N = data*spatial)")
    p.add_argument("-data_workers", type=int, default=4,
                   help="decode threads in the input pipeline (0 = serial; "
                        "batches are identical either way)")
    p.add_argument("-sigint_effect", default="stop",
                   choices=["stop", "snapshot", "none"],
                   help="action on SIGINT (caffe.cpp -sigint_effect)")
    p.add_argument("-sighup_effect", default="snapshot",
                   choices=["stop", "snapshot", "none"],
                   help="action on SIGHUP (caffe.cpp -sighup_effect)")
    p.add_argument("-mixed_precision", action="store_true",
                   help="bf16 conv compute, f32 params/losses (1.6x step speed)")
    p.add_argument("-remat", action="store_true",
                   help="jax.checkpoint per block (bigger batches/resolutions)")
    p.add_argument("-augment_device", action="store_true",
                   help="warp/scale/canvas images ON DEVICE inside the train "
                        "step (host does JPEG decode only); targets and RNG "
                        "stream identical to the host path, pixels within a "
                        "couple of grey levels (cv2 quantization); ignored "
                        "with -spatial > 1 (unsupported there)")
    p.add_argument("-host_targets", action="store_true",
                   help="rasterize target maps on the HOST and ship them "
                        "dense (the reference layout) instead of the default "
                        "on-device rasterization from compact annotations; "
                        "targets differ only at f32-ULP level")
    p.set_defaults(fn=train)

    p = sub.add_parser("test", help="score a model")
    p.add_argument("-model", required=True)
    p.add_argument("-weights", default="")
    p.add_argument("-iterations", type=int, default=50)
    p.add_argument("-fp32", action="store_true")
    p.set_defaults(fn=test)

    p = sub.add_parser("time", help="benchmark model execution")
    p.add_argument("-model", required=True)
    p.add_argument("-iterations", type=int, default=10)
    p.add_argument("-per_layer", action="store_true")
    p.add_argument("-top", type=int, default=30)
    p.add_argument("-fp32", action="store_true")
    p.add_argument("-trace", default="", help="write a jax profiler trace here")
    p.add_argument("-fold_bn", action="store_true",
                   help="fold BN/Scale into convs + cast weights (serving)")
    p.set_defaults(fn=time_cmd)

    p = sub.add_parser("extract_features", help="dump named blobs to HDF5")
    p.add_argument("-model", required=True)
    p.add_argument("-weights", default="")
    p.add_argument("-blobs", required=True, help="comma-separated blob names")
    p.add_argument("-out", required=True)
    p.add_argument("-iterations", type=int, default=10)
    p.add_argument("-fp32", action="store_true")
    p.set_defaults(fn=extract_features)

    p = sub.add_parser("upgrade_net_proto", help="legacy prototxt -> V2")
    p.add_argument("input")
    p.add_argument("output")
    p.set_defaults(fn=upgrade_net_proto)

    p = sub.add_parser("upgrade_net_proto_binary",
                       help="legacy binary NetParameter -> V2 binary")
    p.add_argument("input")
    p.add_argument("output")
    p.set_defaults(fn=upgrade_net_proto_binary)

    p = sub.add_parser("upgrade_solver_proto",
                       help="legacy solver_type enum -> type string")
    p.add_argument("input")
    p.add_argument("output")
    p.set_defaults(fn=upgrade_solver_proto)

    # Deprecated single-purpose tools (reference: tools/train_net.cpp,
    # test_net.cpp, finetune_net.cpp, net_speed_benchmark.cpp — all
    # LOG(FATAL) "Deprecated. Use caffe <verb> ..."). We print the same
    # warning but delegate instead of aborting.
    def _deprecated(name, new_form, remap):
        def fn(args):
            print(f"{name} is deprecated. Use: deepcut_tpu {new_form}",
                  file=sys.stderr)
            return main(remap(args))
        return fn

    p = sub.add_parser("train_net", help="deprecated: use train")
    p.add_argument("solver")
    p.add_argument("snapshot", nargs="?", default="")
    p.set_defaults(fn=_deprecated(
        "train_net", "train -solver ... [-snapshot ...]",
        lambda a: ["train", "-solver", a.solver] +
                  (["-snapshot", a.snapshot] if a.snapshot else [])))

    p = sub.add_parser("finetune_net", help="deprecated: use train -weights")
    p.add_argument("solver")
    p.add_argument("weights")
    p.set_defaults(fn=_deprecated(
        "finetune_net", "train -solver ... -weights ...",
        lambda a: ["train", "-solver", a.solver, "-weights", a.weights]))

    p = sub.add_parser("test_net", help="deprecated: use test")
    p.add_argument("model")
    p.add_argument("weights", nargs="?", default="")
    p.add_argument("iterations", nargs="?", type=int, default=50)

    def _remap_test_net(a):
        # `test_net model.prototxt 20`: the bare count lands in the weights
        # slot — treat an all-digits second arg as the iteration count
        weights, iters = a.weights, a.iterations
        if weights.isdigit():
            weights, iters = "", int(weights)
        return (["test", "-model", a.model, "-iterations", str(iters)] +
                (["-weights", weights] if weights else []))

    p.set_defaults(fn=_deprecated(
        "test_net", "test -model ... -weights ... -iterations N",
        _remap_test_net))

    p = sub.add_parser("net_speed_benchmark", help="deprecated: use time")
    p.add_argument("model")
    p.add_argument("iterations", nargs="?", type=int, default=10)
    p.set_defaults(fn=_deprecated(
        "net_speed_benchmark", "time -model ... -iterations N",
        lambda a: ["time", "-model", a.model, "-iterations",
                   str(a.iterations)]))

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
