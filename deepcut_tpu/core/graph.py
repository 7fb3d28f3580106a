"""Graph engine: a parsed prototxt DAG compiled into one jitted XLA function.

The reference's Net (src/caffe/net.cpp:40-284) builds a static topology of
C++ layer objects and loops over them per forward call. Here the prototxt is
interpreted ONCE into an execution plan (a list of pure-function steps); at
call time the plan is traced through jit, so the whole 680-layer DeeperCut
graph becomes a single fused XLA program. Consequences:

- Split-layer insertion (src/caffe/util/insert_splits.cpp) is unnecessary:
  functional fan-out is free and gradients of shared blobs sum automatically.
- Shape inference runs during tracing; per-shape compiled variants are cached
  (Caffe's per-image Blob::Reshape becomes a jit-cache keyed on input shape).
- Phase/stage/level filtering (net.cpp:286-380) happens at plan-build time.

Blob layout: the public API speaks Caffe NCHW; internally all 4-D tensors are
NHWC so channels ride the TPU lane dimension. Transposition happens only at
the graph boundary.
"""

from __future__ import annotations

import functools
from collections import OrderedDict
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from deepcut_tpu.proto import text_format
from deepcut_tpu.proto.text_format import PbNode
from deepcut_tpu.core import layers as L
from deepcut_tpu.core import fillers


def _to_nhwc_shape(shape: Sequence[int]) -> Tuple[int, ...]:
    shape = tuple(int(s) for s in shape)
    if len(shape) == 4:
        return (shape[0], shape[2], shape[3], shape[1])
    return shape


# --------------------------------------------------------------------------
# Plan construction
# --------------------------------------------------------------------------


# V1 LayerType enum names -> V2 type strings (reference: upgrade_proto.cpp
# UpgradeV1LayerType) so legacy `layers { type: CONVOLUTION }` prototxts load.
_V1_TYPE_NAMES = {
    "ABSVAL": "AbsVal", "ACCURACY": "Accuracy", "ARGMAX": "ArgMax",
    "BNLL": "BNLL", "CONCAT": "Concat", "CONTRASTIVE_LOSS": "ContrastiveLoss",
    "CONVOLUTION": "Convolution", "DECONVOLUTION": "Deconvolution",
    "DATA": "Data", "DROPOUT": "Dropout", "DUMMY_DATA": "DummyData",
    "EUCLIDEAN_LOSS": "EuclideanLoss", "ELTWISE": "Eltwise", "EXP": "Exp",
    "FLATTEN": "Flatten", "HDF5_DATA": "HDF5Data", "HDF5_OUTPUT": "HDF5Output",
    "HINGE_LOSS": "HingeLoss", "IM2COL": "Im2col", "IMAGE_DATA": "ImageData",
    "INFOGAIN_LOSS": "InfogainLoss", "INNER_PRODUCT": "InnerProduct",
    "LRN": "LRN", "MEMORY_DATA": "MemoryData",
    "MULTINOMIAL_LOGISTIC_LOSS": "MultinomialLogisticLoss", "MVN": "MVN",
    "POOLING": "Pooling", "POWER": "Power", "RELU": "ReLU",
    "SIGMOID": "Sigmoid", "SIGMOID_CROSS_ENTROPY_LOSS": "SigmoidCrossEntropyLoss",
    "SILENCE": "Silence", "SOFTMAX": "Softmax", "SOFTMAX_LOSS": "SoftmaxWithLoss",
    "SPLIT": "Split", "SLICE": "Slice", "TANH": "TanH",
    "WINDOW_DATA": "WindowData", "THRESHOLD": "Threshold",
}


class LayerSpec:
    """Static description of one layer: type, wiring, config node."""

    __slots__ = ("name", "type", "bottoms", "tops", "node", "phase", "param_specs")

    def __init__(self, node: PbNode):
        self.node = node
        self.name = node.get_str("name", "")
        self.type = node.get_str("type", "")
        self.type = _V1_TYPE_NAMES.get(self.type, self.type)
        self.bottoms = [str(b) for b in node.get_list("bottom")]
        self.tops = [str(t) for t in node.get_list("top")]
        # ParamSpec entries: shared name / lr_mult / decay_mult
        # (reference: Net::AppendParam, net.cpp:469-562)
        self.param_specs = []
        for p in node.get_list("param"):
            if isinstance(p, PbNode):
                self.param_specs.append({
                    "name": p.get_str("name", ""),
                    "lr_mult": p.get_float("lr_mult", 1.0),
                    "decay_mult": p.get_float("decay_mult", 1.0),
                })
        self.phase = None
        for rule in node.get_list("include"):
            if rule.has("phase"):
                self.phase = rule.get_str("phase")

    def param(self, key: str) -> PbNode:
        return self.node.get(key, PbNode())


def _rule_matches(rule: PbNode, phase: str, stages: Sequence[str], level: int) -> bool:
    if rule.has("phase") and rule.get_str("phase") != phase:
        return False
    if rule.has("min_level") and level < rule.get_int("min_level"):
        return False
    if rule.has("max_level") and level > rule.get_int("max_level"):
        return False
    for st in rule.get_list("stage"):
        if st not in stages:
            return False
    for st in rule.get_list("not_stage"):
        if st in stages:
            return False
    return True


def filter_layers(
    specs: List[LayerSpec], phase: str, stages: Sequence[str] = (), level: int = 0
) -> List[LayerSpec]:
    """NetStateRule filtering (reference: Net::FilterNet, net.cpp:286-314)."""
    out = []
    for spec in specs:
        includes = spec.node.get_list("include")
        excludes = spec.node.get_list("exclude")
        keep = not includes  # no include rule -> in, unless excluded
        for rule in excludes:
            if _rule_matches(rule, phase, stages, level):
                keep = False
        for rule in includes:
            if _rule_matches(rule, phase, stages, level):
                keep = True
        if keep:
            out.append(spec)
    return out


def _slice_couts(y: jax.Array, couts: Sequence[int]) -> List[jax.Array]:
    """Split a fused sibling group's concatenated output back into per-top
    tensors. The ONE definition of the fused-output contract (fused_couts
    order == tops order, channel-last) — used by both fuse_siblings and
    quantize_int8 so the two can't drift."""
    outs, o = [], 0
    for c in couts:
        outs.append(jax.lax.slice_in_dim(y, o, o + c, axis=-1))
        o += c
    return outs


class Net:
    """Prototxt-defined network, executed as a jitted functional graph.

    Usage (mirrors pycaffe, python/caffe/pycaffe.py):

        net = Net("ResNet-152.prototxt", weights="ResNet-152.caffemodel")
        outs = net.forward(data=np_nchw_image)      # dict of NCHW outputs
        prob = net.blobs["prob"]                     # last forward's blobs
    """

    def __init__(
        self,
        model_def: Union[str, PbNode],
        weights: Union[str, Dict[str, Dict[str, np.ndarray]], None] = None,
        phase: str = "TEST",
        *,
        stages: Sequence[str] = (),
        level: Optional[int] = None,
        compute_dtype: Any = jnp.bfloat16,
        rng: Optional[jax.Array] = None,
    ):
        if isinstance(model_def, str):
            self.proto = text_format.parse_file(model_def)
        else:
            self.proto = model_def
        # Legacy V0 `layers { layer { … } }` / V1 `layers` definitions are
        # upgraded before planning (UpgradeNetAsNeeded, upgrade_proto.cpp:19).
        from deepcut_tpu.proto.upgrade import upgrade_net

        self.proto = upgrade_net(self.proto)
        self.name = self.proto.get_str("name", "")
        self.phase = phase
        self.compute_dtype = compute_dtype

        all_specs = [LayerSpec(n) for n in self.proto.get_list("layer")]
        if not all_specs:  # legacy "layers" field
            all_specs = [LayerSpec(n) for n in self.proto.get_list("layers")]
        # NetParameter.state (caffe.proto NetState) supplies the net's own
        # default stage/level; explicit constructor args take precedence,
        # mirroring FilterNet's "NetState state(param.state())" base with
        # the caller-set overrides merged on top (net.cpp:286-314, and the
        # solver's NetState merge chain, solver.cpp:100-110).
        own_state = self.proto.get("state")
        if own_state is not None:
            stages = tuple(stages) + tuple(
                str(s) for s in own_state.get_list("stage") if s not in stages)
            # level=None means "caller unset" — only then does the net
            # proto's own state.level apply. An EXPLICIT caller level
            # (including 0) always wins: MergeFrom overwrites with any set
            # scalar (solver.cpp:100-110), so `train_state { level: 0 }`
            # must override a nonzero net-proto level.
            if level is None and own_state.has("level"):
                level = own_state.get_int("level")
        self.layer_specs = filter_layers(all_specs, phase, stages,
                                         0 if level is None else level)

        # net-level inputs (deploy-style): input/input_shape/input_dim.
        self.input_names: List[str] = [str(s) for s in self.proto.get_list("input")]
        self.input_shapes: Dict[str, Tuple[int, ...]] = {}
        dims = [int(d) for d in self.proto.get_list("input_dim")]
        shapes = self.proto.get_list("input_shape")
        for i, nm in enumerate(self.input_names):
            if shapes:
                self.input_shapes[nm] = tuple(int(d) for d in shapes[i].get_list("dim"))
            elif dims:
                self.input_shapes[nm] = tuple(dims[4 * i: 4 * i + 4])
        for spec in self.layer_specs:
            if spec.type == "Input":
                ip = spec.param("input_param")
                in_shapes = ip.get_list("shape")
                for i, top in enumerate(spec.tops):
                    self.input_names.append(top)
                    if in_shapes:
                        self.input_shapes[top] = tuple(
                            int(d) for d in in_shapes[min(i, len(in_shapes) - 1)].get_list("dim")
                        )

        # Execution plan: (fn, name, bottoms, tops) per non-input layer.
        # Data layers become host-side batch producers; HDF5Output a sink.
        from deepcut_tpu.data.layers import (
            DATA_SOURCES, HDF5OutputSink, PrefetchedSource, PREFETCHED_TYPES)

        self._plan: List[Tuple[Callable, LayerSpec]] = []
        self.data_sources: Dict[str, Any] = {}
        self.hdf5_sinks: List[Any] = []
        self._peeked: Dict[str, List[np.ndarray]] = {}
        self._silenced: set = set()
        for spec in self.layer_specs:
            if spec.type == "Silence":
                # Silence CONSUMES its bottoms (silence_layer emits no tops);
                # they must not surface as net outputs or keep their
                # producing subgraph alive through make_forward's default
                # output set
                self._silenced.update(spec.bottoms)
                continue
            if spec.type == "Input":
                continue
            if spec.type in DATA_SOURCES:
                src = DATA_SOURCES[spec.type](spec, phase)
                if spec.type in PREFETCHED_TYPES:
                    src = PrefetchedSource(src)
                self.data_sources[spec.name] = src
                continue
            if spec.type == "HDF5Output":
                self.hdf5_sinks.append(HDF5OutputSink(spec))
                continue
            fn = L.build(spec, phase=phase, compute_dtype=compute_dtype)
            if fn is not None:
                self._plan.append((fn, spec))

        self.params: Dict[str, Any] = {}
        self._rng = rng if rng is not None else jax.random.PRNGKey(0)
        # weight payloads queued until params materialise (data-layer nets
        # defer shape inference to the first forward); applied IN ORDER by
        # _ensure_params so later copy_from calls win like the reference's
        self._pending_weights: List[Any] = []
        if weights is not None:
            self._pending_weights.append(weights)
        if self.input_shapes:
            self._ensure_params(
                {nm: _to_nhwc_shape(sh) for nm, sh in self.input_shapes.items()}
            )

        self.blobs: "OrderedDict[str, np.ndarray]" = OrderedDict()
        self._jitted: Dict[Any, Callable] = {}
        # Stochastic layers (Dropout, STOCHASTIC pooling) draw a fresh key
        # per forward; deterministic nets never pay the rng plumbing.
        self._needs_rng = any(getattr(fn, "needs_rng", False) for fn, _ in self._plan)
        self._forward_calls = 0

    # -- weights ----------------------------------------------------------
    def layer_types(self) -> Dict[str, str]:
        return {s.name: s.type for s in self.layer_specs}

    def load_weights(self, weights) -> None:
        if not getattr(self, "_params_ready", False):
            # Params not materialised yet (data-layer net before its first
            # forward): applying by name now would either load partially or
            # be thrown away when _ensure_params rebuilds self.params from
            # fillers — queue instead; _ensure_params replays the queue.
            self._pending_weights.append(weights)
            return
        from deepcut_tpu.proto.caffemodel import load_caffemodel, blobs_to_params

        if isinstance(weights, str):
            blobs = load_caffemodel(weights)
            deconvs = [s.name for s in self.layer_specs if s.type == "Deconvolution"]
            # layers whose single blob is a BIAS (not a gamma/weight): Bias
            # layers, and 2-bottom Scale (scale comes from bottom[1],
            # blobs_[0] is the bias — scale_layer.cpp:15-60)
            biases = [s.name for s in self.layer_specs
                      if s.type == "Bias"
                      or (s.type == "Scale" and len(s.bottoms) == 2)]
            converted = blobs_to_params(blobs, deconv_names=deconvs,
                                        bias_names=biases)
        else:
            converted = weights
        # Match by name (reference: Net::CopyTrainedLayersFrom semantics) on
        # top of existing params so missing layers keep their init. Shapes
        # are CHECKED like the reference (net.cpp:805-846 CHECKs blob
        # shapes): silently loading a mismatched blob would crash later with
        # a cryptic XLA error — or worse, "succeed".
        for name, entry in converted.items():
            if name in self.params:
                if isinstance(entry, dict):
                    cur = self.params[name]
                    for k, v in entry.items():
                        have = cur.get(k)
                        if have is not None and tuple(np.shape(v)) != tuple(have.shape):
                            raise ValueError(
                                f"load_weights: layer '{name}' blob '{k}' shape "
                                f"{tuple(np.shape(v))} != net's {tuple(have.shape)} "
                                "(rename the layer to re-initialise it, the "
                                "reference finetune idiom)")
                    self.params[name] = {k: jnp.asarray(v)
                                         for k, v in entry.items()}
                else:
                    self.params[name] = entry

    def _ensure_params(self, input_shapes_nhwc: Dict[str, Tuple[int, ...]]) -> None:
        """Materialise parameters via a shape-propagation pass.

        Replaces the reference's Layer::SetUp + Filler calls (net.cpp:40-284):
        the plan is traced once under jax.eval_shape with zero params created
        on the fly; the recorded (key, shape, filler) specs are then realised
        with the prototxt fillers, and any pending .caffemodel weights are
        copied over by name (Net::CopyTrainedLayersFrom semantics).
        """
        if getattr(self, "_params_ready", False):
            return
        self._params_ready = True
        collected: "OrderedDict[str, List]" = OrderedDict()

        def shape_pass(inputs):
            blobs = dict(inputs)
            for fn, spec in self._plan:
                bottoms = [blobs[b] for b in spec.bottoms]
                pspec = L.param_spec(spec, [tuple(b.shape) for b in bottoms])
                if pspec:
                    collected[spec.name] = pspec
                pentry = {k: jnp.zeros(s, jnp.float32) for k, s, _ in pspec} or None
                outs = fn(pentry, bottoms)
                if not isinstance(outs, (list, tuple)):
                    outs = [outs]
                for top, val in zip(spec.tops, outs):
                    blobs[top] = val
            return jnp.zeros(())

        structs = {
            nm: jax.ShapeDtypeStruct(sh, jnp.float32)
            for nm, sh in input_shapes_nhwc.items()
        }
        jax.eval_shape(shape_pass, structs)

        # Named-param weight sharing (Net::AppendParam, net.cpp:469-562):
        # the first layer declaring `param { name: "x" }` owns the array,
        # later declarations alias it. Also collect lr/decay multipliers.
        specs_by_name = {s.name: s for _, s in self._plan}
        owners: Dict[str, Tuple[str, str]] = {}
        self._aliases: Dict[str, Dict[str, Tuple[str, str]]] = {}
        self._lr_mults: Dict[str, Dict[str, float]] = {}
        self._decay_mults: Dict[str, Dict[str, float]] = {}
        rng = self._rng
        params: Dict[str, Dict[str, jax.Array]] = {}
        for name, pspec in collected.items():
            entry = {}
            spec = specs_by_name.get(name)
            pdecls = spec.param_specs if spec else []
            for i, (key, shape, filler) in enumerate(pspec):
                decl = pdecls[i] if i < len(pdecls) else {}
                shared = decl.get("name", "")
                if spec is not None and spec.type == "BatchNorm":
                    # batch_norm_layer.cpp:29-37 HARD-forces lr_mult=0 on
                    # mean/var/scale_factor regardless of the prototxt (the
                    # stats move only via the moving-average update; SGD on
                    # them would corrupt frozen use_global_stats nets)
                    lr_mult, decay_mult = 0.0, 0.0
                else:
                    lr_mult = decl.get("lr_mult", 1.0)
                    decay_mult = decl.get("decay_mult", 1.0)
                self._lr_mults.setdefault(name, {})[key] = lr_mult
                self._decay_mults.setdefault(name, {})[key] = decay_mult
                if shared and shared in owners:
                    self._aliases.setdefault(name, {})[key] = owners[shared]
                    continue
                rng, sub = jax.random.split(rng)
                entry[key] = fillers.fill(filler, sub, shape)
                if shared:
                    owners[shared] = (name, key)
            params[name] = entry
        self.params = params
        pending, self._pending_weights = self._pending_weights, []
        for w in pending:
            self.load_weights(w)  # _params_ready is set: applies by name

    def fold_bn(self) -> int:
        """Fold inference-mode BatchNorm (+ Scale) layers into the preceding
        Convolution/Deconvolution (the serving transform models/resnet.py's
        fold_bn applies to the native model; reference users pay BN+Scale as
        separate kernels every forward — batch_norm_layer.cpp,
        scale_layer.cpp). Returns the number of folded BN layers.

        Pattern folded: conv -> in-place BatchNorm(use_global) -> optional
        in-place Scale. y = conv(x, w*g) + ((b - mean)*g + beta),
        g = gamma * rsqrt(var/sf + eps). The BN/Scale param entries are
        removed so an exported .caffemodel cannot double-apply them; fold
        only nets you don't intend to re-save with BN blobs.
        """
        if not self.params:
            raise RuntimeError("fold_bn: materialise params first (run forward "
                               "once or declare input shapes)")
        plan = self._plan
        new_plan: List[Tuple[Callable, LayerSpec]] = []
        folded = 0
        i = 0
        # layers whose blobs OTHER layers alias: folding into the owner would
        # silently rescale every aliasing layer too (net.cpp ShareWeights)
        shared_owners = {ol for amap in getattr(self, "_aliases", {}).values()
                         for (ol, _ok) in amap.values()}
        while i < len(plan):
            fn, spec = plan[i]
            top = spec.tops[0] if spec.tops else None
            bn_item = sc_item = None
            if (spec.type in ("Convolution", "Deconvolution") and top is not None
                    and spec.name not in shared_owners):
                j = i + 1
                if j < len(plan):
                    f2, s2 = plan[j]
                    if (s2.type == "BatchNorm" and not getattr(f2, "bn_train", False)
                            and s2.bottoms == [top] and s2.tops == [top]
                            and self.params.get(s2.name)
                            # weight-shared convs alias another layer's blobs;
                            # folding would corrupt the owner — leave unfolded
                            and "w" in self.params.get(spec.name, {})):
                        bn_item = (f2, s2)
                        j += 1
                        if j < len(plan):
                            f3, s3 = plan[j]
                            if (s3.type == "Scale" and s3.bottoms == [top]
                                    and s3.tops == [top]
                                    and "gamma" in self.params.get(s3.name, {})):
                                sc_item = (f3, s3)
            if bn_item is not None:
                bn_spec = bn_item[1]
                bn = self.params[bn_spec.name]
                eps = bn_spec.param("batch_norm_param").get_float("eps", 1e-5)
                sf = jnp.asarray(bn.get("scale_factor", jnp.ones((1,)))).reshape(())
                inv = jnp.where(sf == 0, 0.0, 1.0 / jnp.where(sf == 0, 1.0, sf))
                mean = jnp.asarray(bn["mean"]) * inv
                var = jnp.asarray(bn["var"]) * inv
                if sc_item is not None:
                    sc = self.params[sc_item[1].name]
                    gamma = jnp.asarray(sc["gamma"])
                    beta = jnp.asarray(sc.get("beta", jnp.zeros_like(gamma)))
                else:
                    gamma, beta = 1.0, 0.0
                g = gamma * jax.lax.rsqrt(var + eps)
                conv_p = self.params[spec.name]
                b0 = jnp.asarray(conv_p.get("b", jnp.zeros(g.shape, jnp.float32)))
                self.params[spec.name] = {
                    "w": jnp.asarray(conv_p["w"]) * g,  # Cout is last in both layouts
                    "b": (b0 - mean) * g + beta,
                }
                del self.params[bn_spec.name]
                if sc_item is not None:
                    del self.params[sc_item[1].name]
                new_plan.append((fn, spec))
                folded += 1
                i += 2 + (1 if sc_item is not None else 0)
                continue
            new_plan.append((fn, spec))
            i += 1
        self._plan = new_plan
        self._jitted.clear()
        return folded

    def cast_weights(self, dtype=jnp.bfloat16) -> None:
        """Pre-cast matrix/conv weights (ndim >= 2) to the compute dtype so
        each step reads them from HBM at 2 bytes instead of casting f32 per
        forward. 1-D blobs (biases, BN stats) stay f32 — they ride the f32
        epilogue. Serving transform; pair with fold_bn()."""
        if (self.compute_dtype is None and dtype is not None
                and jnp.dtype(dtype) != jnp.dtype(jnp.float32)):
            # the layer fns were built without input casting: bf16 weights
            # against f32 activations would crash inside lax.conv with a
            # dtype mismatch three layers deep — fail with the fix instead
            raise ValueError(
                "cast_weights: this net was built with compute_dtype=None "
                "(f32 layer math); construct the serving net with "
                f"compute_dtype={jnp.dtype(dtype).name} (the default) "
                "before casting weights")
        def cast(v):
            a = jnp.asarray(v)
            if a.ndim >= 2 and jnp.issubdtype(a.dtype, jnp.floating):
                return a.astype(dtype)  # int8 w_q etc. stay as-is
            return a
        self.params = {name: {k: cast(v) for k, v in entry.items()}
                       for name, entry in self.params.items()}
        self._jitted.clear()

    def prune(self, outputs: Sequence[str]) -> int:
        """Serving transform: drop every layer that does not (transitively)
        feed one of `outputs`. The plan-level analog of the native path's
        explicit head subset (models/resnet.make_forward(heads=...)): after
        pruning, downstream transforms (fuse_siblings, quantize_int8) only
        see — and only pay for — the requested computation, instead of
        relying on XLA's DCE inside make_forward. Reference analog: a Caffe
        user editing the prototxt to delete unused heads by hand.

        Serving only: pruned layers' side effects (BN moving-average
        updates, losses) are gone, and a later snapshot() writes only the
        surviving layers' params. Returns the number of layers removed.
        """
        needed = set(outputs)
        missing = needed - {t for _, s in self._plan for t in s.tops} \
            - set(self.input_shapes)
        if missing:
            raise KeyError(f"prune: unknown output blob(s) {sorted(missing)}")
        kept: List[Tuple[Callable, LayerSpec]] = []
        # reverse sweep keeps every producer of a needed blob — including
        # each stage of an in-place chain (bottom == top), whose earlier
        # writers are reached through the shared blob name
        for fn, spec in reversed(self._plan):
            if any(t in needed for t in spec.tops):
                needed.update(spec.bottoms)
                kept.append((fn, spec))
        removed = len(self._plan) - len(kept)
        kept.reverse()
        self._plan = kept
        # Drop pruned layers' param entries so a later snapshot() really
        # does write only the surviving computation — EXCEPT owners of
        # weight-shared params a kept layer aliases into.
        kept_names = {spec.name for _, spec in kept}
        alias_owners = {owner for lname, amap
                        in getattr(self, "_aliases", {}).items()
                        if lname in kept_names
                        for owner, _k in amap.values()}
        self.params = {n: e for n, e in self.params.items()
                       if n in kept_names or n in alias_owners}
        self._jitted.clear()
        return removed

    def fuse_siblings(self) -> int:
        """Serving transform: merge sibling Convolution/Deconvolution layers
        — same single bottom blob, identical kernel/stride/pad/dilation,
        groups=1, own (unshared, unquantized) weights — into ONE layer with
        concatenated output channels, slicing per original top afterwards.

        This is the graph-engine version of the native fused-heads lowering
        (models/resnet.py round-2 win): DeeperCut's three head deconvs
        (14/28/364 channels, each leaving >=89% of the MXU's 128 lanes
        idle) become one lane-filling deconv, and the three res3 skip convs
        one conv — mathematically identical (the big conv computes the same
        per-channel dot products; the slice is free). Under quantize_int8
        the fused skip conv also quantizes its shared input ONCE instead of
        once per head (the models/quantize.py fused-skip design).

        Order: fold_bn() -> [prune(outputs)] -> fuse_siblings() ->
        [quantize_int8()] -> cast_weights() -> make_forward(outputs).
        Serving only — like fold_bn, the absorbed layers' param entries are
        removed, so don't re-save the net afterwards. Returns the number of
        fused groups.
        """
        import copy as _copy

        if not self.params:
            raise RuntimeError("fuse_siblings: materialise params first (run "
                               "forward once or declare input shapes)")
        plan = self._plan
        shared_owners = {ol for amap in getattr(self, "_aliases", {}).values()
                         for (ol, _ok) in amap.values()}
        aliased = set(getattr(self, "_aliases", {}))
        groups: "OrderedDict[tuple, List[int]]" = OrderedDict()
        for i, (fn, spec) in enumerate(plan):
            if spec.type not in ("Convolution", "Deconvolution"):
                continue
            if len(spec.bottoms) != 1 or len(spec.tops) != 1:
                continue
            if spec.tops[0] == spec.bottoms[0]:
                continue
            if spec.name in shared_owners or spec.name in aliased:
                continue
            if "w" not in self.params.get(spec.name, {}):
                continue
            g = L.conv_geometry(spec.param("convolution_param"))
            if g["groups"] != 1:
                continue
            key = (spec.type, spec.bottoms[0], g["kernel"], g["stride"],
                   g["pad"], g["dilation"])
            groups.setdefault(key, []).append(i)

        fused = 0
        drop: set = set()
        replace: Dict[int, Tuple[Callable, LayerSpec]] = {}
        for key, idxs in groups.items():
            if len(idxs) < 2:
                continue
            bottom = key[1]
            lo, hi = idxs[0], idxs[-1]
            # the members all read `bottom` at their own plan position; the
            # fused layer reads it once at position `lo` — illegal if an
            # intervening layer rewrites the blob in place
            if any(bottom in plan[k][1].tops
                   for k in range(lo + 1, hi) if k not in idxs):
                continue
            members = [plan[k] for k in idxs]
            ws = [jnp.asarray(self.params[s.name]["w"]) for _, s in members]
            couts = [int(w.shape[-1]) for w in ws]
            has_bias = any("b" in self.params[s.name] for _, s in members)
            entry: Dict[str, jax.Array] = {"w": jnp.concatenate(ws, axis=-1)}
            if has_bias:
                entry["b"] = jnp.concatenate(
                    [jnp.asarray(self.params[s.name].get(
                        "b", np.zeros(c, np.float32)))
                     for (_, s), c in zip(members, couts)])
            base_fn = members[0][0]  # geometry-identical across the group

            def make_fused(base_fn, couts):
                def ffn(p, bottoms):
                    return _slice_couts(base_fn(p, bottoms), couts)
                ffn.fused_couts = list(couts)
                return ffn

            fspec = _copy.copy(members[0][1])
            fspec.tops = [s.tops[0] for _, s in members]
            self.params[members[0][1].name] = entry
            for _, s in members[1:]:
                self.params.pop(s.name, None)
            replace[lo] = (make_fused(base_fn, couts), fspec)
            drop.update(idxs[1:])
            fused += 1

        if fused:
            self._plan = [replace.get(i, item) for i, item in enumerate(plan)
                          if i not in drop]
            self._jitted.clear()
        return fused

    def quantize_int8(self, *, min_in_channels: int = 8,
                      percentile: float = 100.0,
                      **calibration_inputs) -> int:
        """Post-training int8 quantization of the Convolution layers (the
        graph-engine version of models/quantize.py; the reference has no
        quantized path at all). Run fold_bn() first for best results.

        calibration_inputs: one representative batch, NCHW numpy like
        forward(). One eager pass records each conv input's absmax -> static
        activation scales (static so XLA fuses the quantize into the
        producer's epilogue); weights get per-output-channel symmetric int8.
        Grouped convolutions and parameter-less/shared convs stay float, and
        so do convs with < `min_in_channels` input channels (default 8 —
        the bf16-stem rule from models/quantize.quantize_weights: a
        3-channel int8 conv wastes MXU lane packing and the full-resolution
        input quantize pass costs more than int8 saves, measured in
        docs/performance.md; pass min_in_channels=0 to quantize everything).
        Returns the number of quantized layers.

        percentile < 100 (e.g. 99.9) records a subsampled percentile of
        each conv input's |activation| instead of the absmax: outliers in
        the calibration batch saturate at ±127 while every other value
        gains quantization resolution (models/quantize.prepare_int8).
        """
        from deepcut_tpu.models.quantize import _conv_i8

        host_inputs = dict(calibration_inputs)
        self._pull_data_layers(host_inputs)  # data-layer nets calibrate on a batch
        dev_inputs = {}
        for nm, arr in host_inputs.items():
            a = jnp.asarray(arr)
            dev_inputs[nm] = jnp.transpose(a, (0, 2, 3, 1)) if a.ndim == 4 else a
        if not self.params:
            self._ensure_params({nm: tuple(v.shape) for nm, v in dev_inputs.items()})

        # layers whose 'w' other layers alias: quantizing the OWNER would
        # delete the float 'w' the aliases resolve (net.cpp ShareWeights)
        shared_owners = {ol for amap in getattr(self, "_aliases", {}).values()
                         for (ol, _ok) in amap.values()}

        # 1. eager calibration pass, recording conv input absmax
        blobs: Dict[str, jax.Array] = dict(dev_inputs)
        act_scales: Dict[str, float] = {}
        for fn, spec in self._plan:
            bottoms = [blobs[b] for b in spec.bottoms]
            geom = (L.conv_geometry(spec.param("convolution_param"))
                    if spec.type == "Convolution" else None)
            if (geom is not None
                    and spec.name not in shared_owners
                    and "w" in self.params.get(spec.name, {})
                    and geom["groups"] == 1
                    # bf16-stem rule: narrow-input convs stay float
                    and bottoms[0].shape[-1] >= min_in_channels
                    # _conv_i8 takes square geometry; rectangular stays float
                    and geom["stride"][0] == geom["stride"][1]
                    and geom["pad"][0] == geom["pad"][1]
                    and geom["dilation"][0] == geom["dilation"][1]):
                a = jnp.abs(bottoms[0].astype(jnp.float32)).reshape(-1)
                if percentile >= 100.0:
                    amax = float(jnp.max(a))
                else:
                    # subsampled percentile: full sorts of multi-megapixel
                    # activations would dominate calibration time
                    step = max(a.shape[0] // 65536, 1)
                    amax = float(jnp.percentile(a[::step], percentile))
                act_scales[spec.name] = max(amax / 127.0, 1e-8)
            entry = self._entry(self.params, spec.name)
            outs = (fn(entry, bottoms, rng=None)
                    if getattr(fn, "needs_rng", False) else fn(entry, bottoms))
            if not isinstance(outs, (list, tuple)):
                outs = [outs]
            for top_name, val in zip(spec.tops, outs):
                blobs[top_name] = val

        # 2. swap quantized layers into the plan
        new_plan: List[Tuple[Callable, LayerSpec]] = []
        for fn, spec in self._plan:
            if spec.name not in act_scales:
                new_plan.append((fn, spec))
                continue
            g = L.conv_geometry(spec.param("convolution_param"))
            p = self.params[spec.name]
            w = np.asarray(p["w"], np.float32)
            s_w = np.abs(w).max(axis=(0, 1, 2)) / 127.0
            s_w[s_w == 0] = 1.0
            self.params[spec.name] = {
                "w_q": jnp.asarray(np.clip(np.round(w / s_w), -127, 127)
                                   .astype(np.int8)),
                "w_scale": jnp.asarray(s_w, jnp.float32),
                "b": jnp.asarray(np.asarray(p["b"], np.float32) if "b" in p
                                 else np.zeros(w.shape[-1], np.float32)),
                "act_scale": jnp.asarray(act_scales[spec.name], jnp.float32),
            }

            couts = getattr(fn, "fused_couts", None)

            def qfn(p, bottoms, g=g, couts=couts):
                x = bottoms[0]
                xq = jnp.clip(jnp.round(x.astype(jnp.float32)
                                        * (1.0 / p["act_scale"])),
                              -127, 127).astype(jnp.int8)
                acc = _conv_i8(xq, p["w_q"], stride=g["stride"][0],
                               pad=g["pad"][0], dilation=g["dilation"][0])
                y = acc.astype(jnp.float32) * (p["act_scale"] * p["w_scale"]) + p["b"]
                y = y.astype(x.dtype)
                if couts is None:
                    return y
                # fuse_siblings ran before quantization: keep its per-top
                # channel slicing (ONE int8 conv + ONE input quantize for
                # the whole sibling group)
                return _slice_couts(y, couts)
            new_plan.append((qfn, spec))
        self._plan = new_plan
        self._jitted.clear()
        return len(act_scales)

    def make_forward(self, outputs: Optional[Sequence[str]] = None):
        """Jitted serving forward: (params, {name: NHWC device arrays}) ->
        {output: f32 device array}. Only `outputs` (default: the net's
        terminal blobs) are returned, so XLA dead-code-eliminates every
        intermediate — unlike `forward()`, whose pycaffe contract
        materialises all ~N blobs to HBM. On the 680-layer DeeperCut
        prototxt this is the difference between 7.1 and ~2.1 ms/img
        (docs/performance.md).

        Image inputs are cast to compute_dtype at the graph boundary, so
        the whole inter-layer activation STREAM rides bf16 (each layer fn
        returns its input's dtype; an f32 input would otherwise make every
        344²-size intermediate an f32 HBM round-trip — measured +0.5
        ms/img on the 152, concentrated in the stem). This matches the
        native serving path (models/resnet.run_trunk casts once at entry);
        outputs are cast back to f32 to keep the external contract.
        `forward()` keeps f32 blobs everywhere — its pycaffe contract
        exposes every intermediate to user numpy code.

        Typical serving setup:
            net = Net(prototxt, weights=...)   # TEST phase
            net.fold_bn(); net.prune(["prob"]); net.fuse_siblings()
            net.cast_weights()
            fwd = net.make_forward(["prob"])
        """
        outs = list(outputs) if outputs else self.output_names()
        cdt = self.compute_dtype

        def fn(params, inputs):
            if cdt is not None:
                inputs = {
                    k: (v.astype(cdt)
                        if (getattr(v, "ndim", 0) == 4
                            and jnp.issubdtype(v.dtype, jnp.floating))
                        else v)
                    for k, v in inputs.items()}
            blobs = self._execute(params, inputs)
            return {k: (blobs[k].astype(jnp.float32)
                        if jnp.issubdtype(blobs[k].dtype, jnp.floating)
                        else blobs[k]) for k in outs}
        return jax.jit(fn)

    # -- execution --------------------------------------------------------
    def _entry(self, params, name: str):
        """Layer's param entry with shared-name aliases resolved."""
        entry = params.get(name)
        aliases = getattr(self, "_aliases", {}).get(name)
        if not aliases:
            return entry
        merged = dict(entry or {})
        for key, (ol, ok) in aliases.items():
            merged[key] = params[ol][ok]
        return merged

    def _execute(
        self,
        params,
        inputs: Dict[str, jax.Array],
        collect_updates: Optional[Dict[str, Dict[str, jax.Array]]] = None,
        rng: Optional[jax.Array] = None,
        plan: Optional[List[Tuple[Callable, "LayerSpec"]]] = None,
        taps: Optional[Dict[str, jax.Array]] = None,
        dynamic: bool = False,
        rng_offset: int = 0,
    ) -> Dict[str, jax.Array]:
        """Run the plan over a blobs dict.

        taps: {blob: zero array} added to the blob at its FIRST production —
        differentiating w.r.t. a tap yields d(loss)/d(blob), i.e. the
        reference's intermediate blob->diff() (pycaffe.py _Net_backward).
        First production matches Caffe's in-place chains: after a full
        backward an in-place blob's diff_ holds the cotangent at the
        ORIGINAL producer's output (each in-place backward overwrites it).

        dynamic: eager host path — layers exposing a `host_dynamic` variant
        (Filter) run it, with true dynamic output shapes.

        rng_offset: index of plan[0] within the FULL layer plan — keeps the
        per-layer rng fold (seed, global layer index) identical when a plan
        SLICE is executed (the spatial suffix, parallel/graph_spatial.py).
        """
        from deepcut_tpu.ops.norm import batch_norm_train, BNStats

        blobs: Dict[str, jax.Array] = dict(inputs)
        tapped: set = set()
        for idx, (fn, spec) in enumerate(self._plan if plan is None else plan):
            bottoms = [blobs[b] for b in spec.bottoms]
            # `propagate_down: false` blocks backprop into that bottom
            # (net.cpp:144-159 -> Layer::set_param_propagate_down analog for
            # bottoms; used to freeze branches). stop_gradient is the exact
            # functional equivalent: forward unchanged, cotangent zeroed.
            # proto text accepts both `true/false` and numeric `1/0` forms
            pdown = [v if isinstance(v, bool)
                     else bool(v) if isinstance(v, (int, float))
                     else str(v).lower() == "true"
                     for v in spec.node.get_list("propagate_down")]
            if pdown and not all(pdown):
                bottoms = [jax.lax.stop_gradient(b) if i < len(pdown) and not pdown[i]
                           else b for i, b in enumerate(bottoms)]
            entry = self._entry(params, spec.name)
            if dynamic and getattr(fn, "host_dynamic", None) is not None:
                outs = fn.host_dynamic(entry, bottoms)
            elif getattr(fn, "needs_rng", False):
                # Per-layer, per-step key (replaces Caffe's stateful
                # caffe_rng_bernoulli draws in dropout_layer.cpp): fold the
                # layer's plan index into the step key so every stochastic
                # layer sees an independent stream.
                key = (jax.random.fold_in(rng, idx + rng_offset)
                       if rng is not None else None)
                outs = fn(entry, bottoms, rng=key)
            elif getattr(fn, "bn_train", False):
                # Caffe BN training: normalise with batch stats, accumulate
                # moving averages (batch_norm_layer.cpp TRAIN path).
                y, new_stats = batch_norm_train(
                    bottoms[0],
                    BNStats(entry["mean"], entry["var"],
                            entry["scale_factor"].reshape(())),
                    eps=fn.bn_eps, momentum=fn.bn_momentum,
                )
                if collect_updates is not None:
                    collect_updates[spec.name] = {
                        "mean": new_stats.mean,
                        "var": new_stats.var,
                        "scale_factor": new_stats.scale_factor.reshape((1,)),
                    }
                outs = [y]
            else:
                outs = fn(entry, bottoms)
            if not isinstance(outs, (list, tuple)):
                outs = [outs]
            sticky = getattr(fn, "sticky_tops", ())
            for i_top, (top, val) in enumerate(zip(spec.tops, outs)):
                if i_top in sticky and top in inputs:
                    # fill-once top (constant DummyData): a staged input
                    # wins over the layer's refill (dummy_data_layer.cpp
                    # fills constants in LayerSetUp only)
                    continue
                if taps is not None and top in taps and top not in tapped:
                    val = val + taps[top].astype(val.dtype)
                    tapped.add(top)
                blobs[top] = val
        return blobs

    # -- training through the graph ----------------------------------------
    def total_loss(self, blobs: Dict[str, jax.Array]) -> jax.Array:
        """Weighted sum of loss-layer outputs (loss_weight, default 1 for
        loss-typed layers — reference Layer::loss() semantics)."""
        total = None
        for _, spec in self._plan:
            weights = [float(v) for v in spec.node.get_list("loss_weight")]
            is_loss = spec.type.endswith("Loss") or spec.type == "SoftmaxWithLossVec"
            for i, top in enumerate(spec.tops):
                # unspecified weights: 1 for TOP 0 of a loss layer only
                # (LossLayer adds a single loss_weight; extra tops like the
                # shared prob_ carry 0 — layer.hpp:414-428)
                w = weights[i] if i < len(weights) else (
                    1.0 if is_loss and i == 0 else 0.0)
                if w:
                    term = blobs[top].astype(jnp.float32).sum() * w
                    total = term if total is None else total + term
        if total is None:
            raise ValueError("net has no loss layers")
        return total

    def blob_loss_weights(self) -> Dict[str, float]:
        """Per-top loss weights with the LossLayer default (weight 1 on top 0
        of loss-typed layers, 0 elsewhere) — Net::blob_loss_weights() as used
        by Solver::Test's per-output "(* w = x loss)" annotations and
        test_compute_loss accumulation (solver.cpp:361-366, 393-406)."""
        out: Dict[str, float] = {}
        for _, spec in self._plan:
            weights = [float(v) for v in spec.node.get_list("loss_weight")]
            is_loss = spec.type.endswith("Loss") or spec.type == "SoftmaxWithLossVec"
            for i, top in enumerate(spec.tops):
                w = weights[i] if i < len(weights) else (
                    1.0 if is_loss and i == 0 else 0.0)
                out[top] = w
        return out

    def host_total_loss(self, blobs: Dict[str, np.ndarray]) -> float:
        """total_loss over a host blob dict (a forward() result) — the
        iter_loss a reference Net::Forward(&loss) hands the solver."""
        total = 0.0
        for top, w in self.blob_loss_weights().items():
            if w and top in blobs:
                total += w * float(np.sum(np.asarray(blobs[top], np.float32)))
        return total

    def make_train_step(self, solver_cfg, *, lr_mults: bool = True, mesh=None):
        """Jitted (params, state, inputs) -> (params, state, loss): forward,
        backward, and the Caffe update rule over this graph.

        mesh: optional jax.sharding.Mesh with a 'data' axis — inputs are
        batch-sharded across it and XLA all-reduces the gradients over ICI
        (the `caffe train -gpu 0,1,...` P2PSync analog, parallel.cpp:382-431,
        for ANY prototxt model). Params/optimizer state stay replicated, like
        the reference's per-GPU full copies."""
        from deepcut_tpu.solver import update_rules

        mults = None
        if lr_mults and getattr(self, "_lr_mults", None):
            mults = {
                name: {k: self._lr_mults.get(name, {}).get(k, 1.0) for k in entry}
                for name, entry in self.params.items()
            }
        # ParamSpec decay_mult (prototxt `param { decay_mult: 0 }` on biases
        # and BN blobs) scales weight decay per blob, matching the
        # reference's Regularize step (sgd_solver.cpp:69-83, net.cpp:469-562).
        dmults = None
        if lr_mults and getattr(self, "_decay_mults", None):
            dmults = {
                name: {k: self._decay_mults.get(name, {}).get(k, 1.0) for k in entry}
                for name, entry in self.params.items()
            }
        base_rng = self._rng
        iter_size = max(int(getattr(solver_cfg, "iter_size", 1)), 1)

        def one_grad(params, inputs, step_rng):
            def loss_fn(p):
                updates: Dict[str, Dict[str, jax.Array]] = {}
                blobs = self._execute(p, inputs, collect_updates=updates,
                                      rng=step_rng)
                return self.total_loss(blobs), updates
            return jax.value_and_grad(loss_fn, has_aux=True)(params)

        def step(params, state, inputs):
            # Fresh dropout/stochastic-pool masks every iteration,
            # deterministic given (seed, iter) — survives snapshot/restore.
            base = jax.random.fold_in(base_rng, state["iter"])
            if iter_size == 1:
                (loss, bn_updates), grads = one_grad(params, inputs, base)
            else:
                # iter_size gradient accumulation (Solver::Step,
                # solver.cpp:218-226): inputs carry a leading iter_size dim;
                # grads SUM over micro-batches, the update rule divides by
                # iter_size (preprocess_grads). BN moving averages take the
                # last micro-batch's stats, like the reference's per-forward
                # updates.
                first = jax.tree_util.tree_map(lambda a: a[0], inputs)
                (loss0, upd0), g0 = one_grad(params, first, base)

                def body(carry, xs):
                    gsum, losssum, _ = carry
                    inp, micro = xs
                    (loss, upd), g = one_grad(
                        params, inp, jax.random.fold_in(base, micro))
                    gsum = jax.tree_util.tree_map(jnp.add, gsum, g)
                    return (gsum, losssum + loss, upd), None
                rest = jax.tree_util.tree_map(lambda a: a[1:], inputs)
                (grads, loss_sum, bn_updates), _ = jax.lax.scan(
                    body, (g0, loss0, upd0),
                    (rest, jnp.arange(1, iter_size)))
                loss = loss_sum / iter_size
            params2, state2 = update_rules.step(
                solver_cfg, params, grads, state, lr_mults=mults,
                decay_mults=dmults)
            # BN moving averages overwrite whatever the solver did to the
            # stat blobs (they are not learned; Caffe freezes them via
            # lr_mult 0 and updates them in Forward).
            for name, upd in bn_updates.items():
                merged = dict(params2[name])
                merged.update(jax.lax.stop_gradient(upd))
                params2[name] = merged
            return params2, state2, loss
        if mesh is None:
            return jax.jit(step)
        from deepcut_tpu.parallel.spatial import spatial_axis_size

        if spatial_axis_size(mesh) > 1:
            # 2-D mesh: image rows shard over 'spatial' via the generic
            # plan splitter (parallel/graph_spatial.py): sharded halo
            # prefix -> all_gather -> replicated suffix with psum'ed loss
            # normalisers. Trajectory-equal to single-device (tested).
            from deepcut_tpu.parallel.graph_spatial import (
                make_graph_spatial_train_step)
            return make_graph_spatial_train_step(
                self, solver_cfg, mesh, lr_mults=mults, decay_mults=dmults,
                iter_size=iter_size)
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        # pytree-prefix shardings: replicate params/state, shard the batch
        # dim over 'data' — with iter_size accumulation the batch dim sits
        # BEHIND the leading iter_size axis.
        if iter_size == 1:
            batch_sh = NamedSharding(mesh, P("data"))
        else:
            batch_sh = NamedSharding(mesh, P(None, "data"))
        return jax.jit(step, in_shardings=(repl, repl, batch_sh),
                       out_shardings=(repl, repl, repl))

    def backward(self, diffs: Optional[Sequence[str]] = None,
                 cotangents: Optional[Dict[str, Any]] = None,
                 start: Optional[str] = None, end: Optional[str] = None,
                 **inputs) -> Dict[str, np.ndarray]:
        """Gradients of the total loss w.r.t. the net inputs (pycaffe
        net.backward analog; param grads come from make_train_step).

        diffs: additional blob names whose d(loss)/d(blob) to return — the
        reference hands back ANY blob's diff_ (python/caffe/pycaffe.py
        _Net_backward, _caffe.cpp Blob bindings). Implemented by adding a
        zero 'tap' at each requested blob's first production and
        differentiating w.r.t. the taps alongside the inputs.

        cotangents: injected top diffs, {blob name: d(objective)/d(blob)}
        in NCHW. When given they REPLACE the forward-loss seeds — the
        differentiated objective becomes sum_nm <blobs[nm], cotangents[nm]>
        instead of the net's total loss. This is the reference's "top diffs
        are taken from forward loss ... kwargs: keys are output blob names
        and values are diff ndarrays" contract (pycaffe.py _Net_backward;
        Net::Backward runs the chain rule from whatever diff_ the top blobs
        hold).

        start/end: partial backward by layer name, pycaffe's
        `backward(start=, end=)` (pycaffe.py:111-140 / Net::BackwardFromTo,
        net.cpp:634-645): the chain runs from layer `start` (default: the
        last layer) down through layer `end` inclusive (default: the
        first). As a forward-order slice that is plan_slice(end, start);
        bottoms the slice consumes but does not produce are seeded from the
        previous forward's blobs, mirroring the reference's persistent Blob
        memory. With `start` given, the objective must be seeded by
        `cotangents` at the start layer's tops — the reference reads
        whatever diff_ those blobs hold; a functional core has no hidden
        diff memory, so the caller passes the seeds explicitly (compat.Net
        collects them from the staged Blob.diff views)."""
        plan = None
        plan_offset = 0
        if start is not None or end is not None:
            plan = self.plan_slice(end, start)
            if end is not None:
                names = [spec.name for _, spec in self._plan]
                plan_offset = names.index(end)
            if start is not None and cotangents is None:
                raise ValueError(
                    f"backward(start={start!r}) needs seed diffs for the "
                    "start layer's tops: pass cotangents={top: d_objective/"
                    "d_top} (the reference reads the tops' diff_ buffers; "
                    "stage them via compat Blob.diff)")
            produced = set(inputs)
            for _, spec in plan:
                for b in spec.bottoms:
                    if b not in produced and b in self.blobs:
                        inputs.setdefault(b, self.blobs[b])
                produced.update(spec.tops)
        if end is None:
            self._pull_data_layers(inputs)
        dev_inputs = {}
        for nm, arr in inputs.items():
            a = jnp.asarray(arr)
            if a.ndim == 4:
                a = jnp.transpose(a, (0, 2, 3, 1))
            dev_inputs[nm] = a
        if not self.params:
            self._ensure_params({nm: tuple(v.shape) for nm, v in dev_inputs.items()})

        diffable = {nm: v for nm, v in dev_inputs.items()
                    if jnp.issubdtype(v.dtype, jnp.floating)}
        rest = {nm: v for nm, v in dev_inputs.items() if nm not in diffable}

        tap_names = [d for d in (diffs or []) if d not in dev_inputs]
        taps = {}
        if tap_names:
            shapes = jax.eval_shape(
                lambda d: self._execute(self.params, {**d, **rest}, plan=plan,
                                        rng_offset=plan_offset), diffable)
            missing = [nm for nm in tap_names if nm not in shapes]
            if missing:
                raise KeyError(f"backward(diffs=...): unknown blobs {missing}")
            taps = {nm: jnp.zeros(shapes[nm].shape, shapes[nm].dtype)
                    for nm in tap_names}

        cot = None
        if cotangents is not None:
            cot = {}
            for nm, arr in cotangents.items():
                a = jnp.asarray(arr, jnp.float32)
                if a.ndim == 4:
                    a = jnp.transpose(a, (0, 2, 3, 1))
                cot[nm] = a

        def loss_of(d, t):
            blobs = self._execute(self.params, {**d, **rest}, taps=t or None,
                                  plan=plan, rng_offset=plan_offset)
            if cot is not None:
                missing = [nm for nm in cot if nm not in blobs]
                if missing:
                    raise KeyError(
                        f"backward(cotangents=...): unknown blobs {missing}")
                return sum(jnp.vdot(blobs[nm].astype(jnp.float32), c)
                           for nm, c in cot.items())
            return self.total_loss(blobs)
        in_grads, tap_grads = jax.grad(loss_of, argnums=(0, 1))(diffable, taps)
        out = {}
        for nm, g in {**in_grads, **tap_grads}.items():
            arr = np.asarray(g, np.float32)
            if arr.ndim == 4:
                arr = arr.transpose(0, 3, 1, 2)
            out[nm] = arr
        for nm in (diffs or []):
            if nm in rest and nm not in out:
                # requested diff of a NON-floating input (integer labels
                # etc.): pycaffe hands back that blob's diff_ buffer, which
                # is all zeros — mirror that instead of silently omitting
                # the key (a typo'd name still raises above)
                arr = np.zeros(np.shape(rest[nm]), np.float32)
                if arr.ndim == 4:
                    arr = arr.transpose(0, 3, 1, 2)
                out[nm] = arr
        return out

    def set_input_arrays(self, data: np.ndarray, labels: np.ndarray) -> None:
        """Feed a MemoryData layer (pycaffe Net.set_input_arrays)."""
        for src in self.data_sources.values():
            if hasattr(src, "set_arrays"):
                src.set_arrays(data, labels)
                return
        raise RuntimeError("net has no MemoryData layer")

    def _pull_data_layers(self, inputs: Dict[str, Any]) -> None:
        """Fill inputs from data-layer sources for tops not supplied."""
        for name, src in self.data_sources.items():
            if all(t in inputs for t in src.tops):
                continue
            if name in self._peeked:
                batch = self._peeked.pop(name)
            else:
                batch = src.next_batch()
            for top, arr in zip(src.tops, batch):
                inputs.setdefault(top, arr)

    def plan_slice(self, start: Optional[str], end: Optional[str]):
        """Plan segment from layer `start` through layer `end` inclusive
        (Net::ForwardFromTo semantics, net.cpp:564-581)."""
        names = [spec.name for _, spec in self._plan]
        i0 = names.index(start) if start is not None else 0
        i1 = names.index(end) + 1 if end is not None else len(names)
        if i1 <= i0:
            raise ValueError(f"end layer {end!r} precedes start layer {start!r}")
        return self._plan[i0:i1]

    def forward(self, start: Optional[str] = None, end: Optional[str] = None,
                **inputs) -> Dict[str, np.ndarray]:
        """Run the net. Inputs/outputs are NCHW numpy (pycaffe convention).
        Data-layer tops not passed explicitly are pulled from their sources
        (so bare `net.forward()` advances data layers, like the reference).

        start/end: partial execution by layer name (pycaffe.py:62-107);
        bottoms the slice needs but that aren't passed explicitly are seeded
        from the previous forward's blobs, mirroring how the reference
        re-reads persistent Blob contents."""
        plan = None
        plan_offset = 0
        if start is not None or end is not None:
            plan = self.plan_slice(start, end)
            if start is not None:
                plan_offset = [s.name for _, s in self._plan].index(start)
            produced = set(inputs)
            for _, spec in plan:
                for b in spec.bottoms:
                    if b not in produced and b in self.blobs:
                        inputs.setdefault(b, self.blobs[b])
                produced.update(spec.tops)
        if start is None:
            self._pull_data_layers(inputs)
        dev_inputs = {}
        for nm, arr in inputs.items():
            a = jnp.asarray(arr)
            if a.ndim == 4:
                a = jnp.transpose(a, (0, 2, 3, 1))
            dev_inputs[nm] = a
        if not self.params:
            self._ensure_params({nm: tuple(v.shape) for nm, v in dev_inputs.items()})
        rng = None
        if self._needs_rng:
            rng = jax.random.fold_in(self._rng, self._forward_calls)
            self._forward_calls += 1
        run_plan = plan if plan is not None else self._plan
        if any(getattr(fn, "host_dynamic", None) is not None
               for fn, _ in run_plan):
            # Filter layers shrink the batch for real on this all-blobs host
            # path (filter_layer.cpp semantics) — dynamic output shapes, so
            # the plan runs eagerly instead of through jit.
            out = self._execute(self.params, dev_inputs, rng=rng, plan=plan,
                                dynamic=True, rng_offset=plan_offset)
        else:
            key = (start, end) + tuple(
                sorted((nm, v.shape, str(v.dtype)) for nm, v in dev_inputs.items()))
            if key not in self._jitted:
                self._jitted[key] = jax.jit(
                    lambda p, i, r: self._execute(p, i, rng=r, plan=plan,
                                                  rng_offset=plan_offset))
            out = self._jitted[key](self.params, dev_inputs, rng)
        result: "OrderedDict[str, np.ndarray]" = OrderedDict()
        for nm, v in out.items():
            arr = np.asarray(v)
            if arr.ndim == 4:
                arr = arr.transpose(0, 3, 1, 2)
            result[nm] = arr
        if plan is None:
            self.blobs = result
        else:  # partial run: merge, keeping untouched blobs for later slices
            self.blobs.update(result)
        for sink in self.hdf5_sinks:
            sink.append([result[b] for b in sink.bottoms if b in result])
        return result

    def debug_info(self, **inputs) -> Dict[str, float]:
        """Per-blob mean-abs activation after a forward — the `debug_info:
        true` stream of the reference (Net::ForwardDebugInfo, net.cpp:647-735)
        as a returned dict instead of glog lines. Params are included as
        'param:<layer>/<key>' entries."""
        outs = self.forward(**inputs)
        info: Dict[str, float] = {
            nm: float(np.mean(np.abs(np.asarray(v, np.float32))))
            for nm, v in outs.items()
        }
        for lname, entry in self.params.items():
            for k, v in entry.items():
                arr = np.asarray(v, np.float32)
                info[f"param:{lname}/{k}"] = float(np.mean(np.abs(arr)))
        return info

    def sticky_top_names(self) -> set:
        """Tops with fill-once semantics (constant DummyData): a value
        supplied as a forward/train-step input persists instead of being
        overwritten by the layer (dummy_data_layer.cpp LayerSetUp fill)."""
        out = set()
        for fn, spec in self._plan:
            for i in getattr(fn, "sticky_tops", ()):
                if i < len(spec.tops):
                    out.add(spec.tops[i])
        return out

    def deconv_names(self) -> List[str]:
        """Deconvolution layer names — needed by the .caffemodel/.h5 writers
        (deconv weights use Caffe's (Cin,Cout/g,kh,kw) blob order, the
        transpose of conv's (Cout,Cin/g,kh,kw))."""
        return [s.name for _, s in self._plan if s.type == "Deconvolution"]

    def output_names(self) -> List[str]:
        """Blobs left 'available' after wiring, i.e. produced and not
        consumed by a LATER layer (net.cpp:267-274 with AppendTop/Bottom
        semantics: an in-place top is removed as a bottom and re-added as a
        top, so a net ENDING in an in-place layer still reports that blob)."""
        available: List[str] = []
        for _, spec in self._plan:
            for b in spec.bottoms:
                if b in available:
                    available.remove(b)
            for t in spec.tops:
                if t not in available:
                    available.append(t)
        # blobs consumed by Silence layers are not outputs (AppendBottom
        # marks them used; silence_layer has no tops)
        return [a for a in available
                if a not in getattr(self, "_silenced", ())]
