"""pycaffe-compatible API facade: ``import deepcut_tpu.compat as caffe``.

Gives reference users the familiar surface (python/caffe/pycaffe.py,
python/caffe/_caffe.cpp): `caffe.Net(prototxt, weights, caffe.TEST)`,
`net.blobs['data'].data[...] = x`, `net.forward()`, `net.params`,
`caffe.set_mode_gpu()` etc.

Semantics notes (functional core underneath):
- Blob `.data` is a host numpy staging buffer. Writing into an INPUT blob
  stages the next forward's input; writing into a PARAM blob
  (`net.params['conv1'][0].data[...] = w`, in-place ops, `.fill()`) writes
  THROUGH to the live device parameters immediately (the net-surgery
  contract). Outputs appear in blobs after `forward()` — the reference's
  zero-copy mutable views become copy-on-read / write-through, which is the
  closest possible contract when compute runs jitted on an accelerator.
- `set_mode_cpu/gpu/set_device` are accepted no-ops: device placement
  belongs to JAX (the reference's Caffe::set_mode global, common.cpp:13-20,
  has no analog in a functional runtime).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any, Dict, List, Optional

import numpy as np

TRAIN = "TRAIN"
TEST = "TEST"


def set_mode_cpu() -> None:  # noqa: D103 - reference-compat no-op
    pass


def set_mode_gpu() -> None:  # noqa: D103
    pass


def set_device(device_id: int = 0) -> None:  # noqa: D103
    pass


def set_random_seed(seed: int) -> None:
    np.random.seed(seed)


def layer_type_list() -> List[str]:
    from deepcut_tpu.core import layers as L
    return sorted(L._BUILDERS)


class _ParamArray(np.ndarray):
    """Host view of a device parameter with WRITE-THROUGH semantics: the
    pycaffe net-surgery idiom `net.params['conv1'][0].data[...] = w` pushes
    the mutation to the live graph parameters (the reference's zero-copy
    mutable view contract, _caffe.cpp NdarrayCallPolicies, approximated the
    only way possible when parameters live on an accelerator).

    Mutations through `[...]=`, `.fill()`, and in-place ufuncs (`*=`, `+=`)
    write through — including on DERIVED views (`data[0][:] = w`,
    `data[1:, 2] *= 0`): views inherit the hook via __array_finalize__ and
    the hook always pushes the root array, whose memory the views share.
    Raw-memory writers that bypass ndarray protocols (`np.copyto(data, w)`,
    `data.flat[:] = v`) do NOT trigger the push; rebinding `.data` itself
    also does not (same as pycaffe, where `data` is a read-only property)."""

    _on_write = None
    _wt_root = None

    def __array_finalize__(self, obj):
        # propagate the write-through hook to slices/views so chained
        # net-surgery indexing still reaches the device
        if obj is not None and self._on_write is None:
            self._on_write = getattr(obj, "_on_write", None)
            self._wt_root = getattr(obj, "_wt_root", None)

    def _push(self):
        # fire only when this array actually aliases the tracked root —
        # __array_finalize__ also runs for COPIES and ufunc results, and
        # mutating those must not re-upload the (unchanged) parameter
        # through the relay
        root = self._wt_root
        if self._on_write is not None and (
                root is None or np.may_share_memory(self, root)):
            self._on_write(self)

    def __setitem__(self, idx, value):
        super().__setitem__(idx, value)
        self._push()

    def fill(self, value):
        super().fill(value)
        self._push()

    def __array_ufunc__(self, ufunc, method, *inputs, **kwargs):
        outs = kwargs.get("out")
        conv = tuple(i.view(np.ndarray) if isinstance(i, _ParamArray) else i
                     for i in inputs)
        if outs:
            kwargs["out"] = tuple(
                o.view(np.ndarray) if isinstance(o, _ParamArray) else o
                for o in outs)
        result = getattr(ufunc, method)(*conv, **kwargs)
        if outs and any(o is self for o in outs):
            self._push()
            return self  # keep the tracked view bound (e.g. `blob.data *= 2`)
        return result


class Blob:
    """pycaffe-style blob view: mutable `.data`, `.shape`, `reshape`."""

    def __init__(self, data: np.ndarray):
        arr = np.ascontiguousarray(data)
        if not arr.flags.writeable:  # jax outputs arrive read-only
            arr = arr.copy()
        self.data = arr
        self._diff: Optional[np.ndarray] = None

    @property
    def diff(self) -> np.ndarray:
        """pycaffe blob.diff: zeros until a backward pass fills it — input
        blobs always, intermediate blobs when requested via
        Net.backward(diffs=[...]) (zero-tap cotangents; see Net.backward)."""
        cur = getattr(self, "_diff", None)  # views skip __init__
        if cur is None or cur.shape != self.data.shape:
            self._diff = np.zeros_like(self.data)
        elif not cur.flags.writeable:
            # backward populates _diff straight from device outputs, which
            # arrive read-only; the reference's diff_ is always writable
            # (staging idiom: net.blobs[b].diff[...] = g)
            self._diff = cur.copy()
        return self._diff

    @property
    def shape(self):
        return self.data.shape

    @property
    def num(self):
        return self.data.shape[0]

    @property
    def channels(self):
        return self.data.shape[1] if self.data.ndim > 1 else 1

    @property
    def height(self):
        return self.data.shape[2] if self.data.ndim > 2 else 1

    @property
    def width(self):
        return self.data.shape[3] if self.data.ndim > 3 else 1

    def reshape(self, *shape):
        self.data = np.zeros(shape, np.float32)

    def count(self):
        return int(self.data.size)


class Net:
    """Drop-in for caffe.Net backed by the jitted graph engine."""

    def __init__(self, model_def: str, *args, **kwargs):
        import jax.numpy as jnp
        from deepcut_tpu.core.graph import Net as GraphNet

        weights = kwargs.pop("weights", None)
        phase = kwargs.pop("phase", TEST)
        rest = [a for a in args]
        for a in rest:
            if a in (TRAIN, TEST):
                phase = a
            elif isinstance(a, str):
                weights = a
        self._net = GraphNet(model_def, weights=weights, phase=phase,
                             compute_dtype=kwargs.pop("compute_dtype", None))
        self.blobs: "OrderedDict[str, Blob]" = OrderedDict()
        for nm, sh in self._net.input_shapes.items():
            self.blobs[nm] = Blob(np.zeros(sh, np.float32))
        self._params_dirty = False

    @classmethod
    def _from_graph(cls, graph_net) -> "Net":
        """Wrap an existing core.graph.Net (shared, not copied) — used by the
        Solver facade so `solver.net` views the live training params."""
        obj = cls.__new__(cls)
        obj._net = graph_net
        obj.blobs = OrderedDict()
        for nm, sh in graph_net.input_shapes.items():
            obj.blobs[nm] = Blob(np.zeros(sh, np.float32))
        obj._params_dirty = False
        return obj

    # -- pycaffe surface ---------------------------------------------------
    @property
    def params(self) -> "OrderedDict[str, List[Blob]]":
        import jax.numpy as jnp

        def make_view(name, key, arr):
            view = np.array(arr, np.float32).view(_ParamArray)
            dtype = self._net.params[name][key].dtype

            # push the ROOT array: a write may come from a derived view
            # (data[0][:] = w) that shares the root's memory but covers only
            # a slice of the parameter
            def push(_a, name=name, key=key, dtype=dtype, root=view):
                self._net.params[name][key] = jnp.asarray(
                    np.asarray(root), dtype=dtype)
            view._on_write = push
            view._wt_root = view
            blob = Blob.__new__(Blob)
            blob.data = view
            return blob

        out: "OrderedDict[str, List[Blob]]" = OrderedDict()
        for name, entry in self._net.params.items():
            blobs = []
            order = ["w", "b", "mean", "var", "scale_factor", "gamma", "beta", "slopes"]
            for key in order:
                if key in entry:
                    blobs.append(make_view(name, key, np.asarray(entry[key])))
            if blobs:
                out[name] = blobs
        return out

    @property
    def inputs(self) -> List[str]:
        return list(self._net.input_names)

    @property
    def outputs(self) -> List[str]:
        return self._net.output_names()

    def forward(self, blobs=None, start=None, end=None, **kwargs) -> Dict[str, np.ndarray]:
        """Full or partial (start/end layer names) forward, matching
        pycaffe's _Net_forward (pycaffe.py:62-107)."""
        for nm, val in kwargs.items():
            self.blobs.setdefault(nm, Blob(np.asarray(val, np.float32)))
            self.blobs[nm].data = np.asarray(val, np.float32)
        if start is not None or end is not None:
            slice_specs = [s for _, s in self._net.plan_slice(start, end)]
            needed = {b for s in slice_specs for b in s.bottoms}
            inputs = {nm: self.blobs[nm].data for nm in needed
                      if nm in self.blobs}
            outs = self._net.forward(start=start, end=end, **inputs)
            wanted = set(slice_specs[-1].tops) if end is not None else set(self.outputs)
        else:
            inputs = {nm: self.blobs[nm].data for nm in self._net.input_names
                      if nm in self.blobs}
            # fill-once blobs (constant DummyData tops): staged/current
            # values persist across forwards like the reference's Blob
            # memory (dummy_data_layer.cpp fills constants in setup only)
            for nm in self._net.sticky_top_names():
                if nm in self.blobs:
                    inputs[nm] = self.blobs[nm].data
            outs = self._net.forward(**inputs)
            wanted = set(self.outputs)
        for nm, val in outs.items():
            self.blobs[nm] = Blob(val)
        wanted |= set(blobs or [])
        return {nm: self.blobs[nm].data for nm in wanted if nm in self.blobs}

    def backward(self, diffs=None, start=None, end=None,
                 **kwargs) -> Dict[str, np.ndarray]:
        """pycaffe _Net_backward analog: gradients of the total loss w.r.t.
        the input blobs, plus any blobs named in `diffs` (the reference
        returns ANY blob's diff_, pycaffe.py:107-140 — here computed via
        zero-tap cotangents in the functional core; see core.graph.Net
        .backward). Parameter gradients live in Net.make_train_step.

        kwargs are INJECTED TOP DIFFS, exactly as in the reference
        (pycaffe.py:118-119 "Keys are output blob names and values are diff
        ndarrays. If None, top diffs are taken from forward loss"): when
        given, the keys must be the net's outputs and the returned
        gradients are of sum(<output, injected diff>) instead of the total
        loss. Input DATA comes from the staged input blobs (stage it via
        forward(...) or blobs[...].data[...] = x).

        start/end: partial backward by layer name (pycaffe.py:111-140) —
        from layer `start` (default: last) down through `end` (inclusive,
        default: first). With `start` given the chain is seeded from the
        STAGED diffs of the start layer's tops (`net.blobs[top].diff[...] =
        g` first) — the staged-Blob analog of the reference reading
        whatever diff_ those blobs hold. With `end` given, the end layer's
        tops are included in the returned diffs (the reference returns the
        blob named like the layer)."""
        import warnings

        inputs = {nm: self.blobs[nm].data for nm in self._net.input_names
                  if nm in self.blobs}
        for nm in self._net.sticky_top_names():  # fill-once blobs persist
            if nm in self.blobs:
                inputs[nm] = self.blobs[nm].data
        cot = None
        if kwargs:
            # validated against the net outputs even when `start` makes
            # them unused — exactly the reference's check-then-write order
            # (pycaffe.py:143-151; with a mid-net start the written output
            # diffs never enter the chain)
            if set(kwargs) != set(self.outputs):
                raise Exception(
                    "Top diff arguments do not match net outputs.")
            if start is None:
                cot = {nm: np.asarray(v, np.float32)
                       for nm, v in kwargs.items()}
        if start is not None:
            specs = {s.name: s for s in self._net.layer_specs}
            if start not in specs:
                raise KeyError(f"unknown start layer {start!r}")
            cot = {}
            for top in specs[start].tops:
                blob = self.blobs.get(top)
                if blob is None or blob._diff is None:
                    raise ValueError(
                        f"backward(start={start!r}): no staged diff for top "
                        f"blob {top!r}; set net.blobs[{top!r}].diff[...] "
                        "first (the reference reads that buffer)")
                cot[top] = np.asarray(blob.diff, np.float32)
        if end is not None:
            specs = {s.name: s for s in self._net.layer_specs}
            if end not in specs:
                raise KeyError(f"unknown end layer {end!r}")
            diffs = list(diffs or [])
            for top in specs[end].tops:  # the reference's set([end]+diffs)
                if top not in diffs:
                    diffs.append(top)
        grads = self._net.backward(diffs=diffs, cotangents=cot,
                                   start=start, end=end, **inputs)
        for nm, g in grads.items():  # populate blob.diff, pycaffe-style
            if nm in self.blobs:
                g = np.asarray(g)
                if g.shape != tuple(self.blobs[nm].data.shape):
                    # Filter nets: the host forward TRULY shrinks the batch
                    # while gradients come from the static zero-fill jit
                    # semantics, so the shapes legitimately diverge — be
                    # loud instead of letting Blob.diff silently reset
                    warnings.warn(
                        f"backward: gradient for blob '{nm}' has shape "
                        f"{g.shape} but the blob holds "
                        f"{tuple(self.blobs[nm].data.shape)} (dynamic-Filter "
                        "forward vs static backward semantics); Blob.diff "
                        "stays zeros for this blob", stacklevel=2)
                    continue
                self.blobs[nm]._diff = g
        return grads

    def forward_all(self, blobs=None, **kwargs) -> Dict[str, np.ndarray]:
        """Batched forward over the leading axis (pycaffe.py:170-201)."""
        num = next(iter(kwargs.values())).shape[0]
        batch = self.blobs[self.inputs[0]].data.shape[0] if self.inputs else 1
        collected: Dict[str, List[np.ndarray]] = {}
        for i in range(0, num, batch):
            chunk = {k: v[i:i + batch] for k, v in kwargs.items()}
            outs = self.forward(blobs=blobs, **chunk)
            for nm, val in outs.items():
                collected.setdefault(nm, []).append(np.asarray(val))
        return {nm: np.concatenate(vals) for nm, vals in collected.items()}

    def copy_from(self, weights_path: str) -> None:
        self._net.load_weights(weights_path)

    def save(self, path: str) -> None:
        """Write weights; extension dispatch like Net::Snapshot — `.h5` /
        `.hdf5` uses the Caffe HDF5 layout (net.cpp:948-980), else binary
        NetParameter."""
        import jax
        from deepcut_tpu.proto.caffemodel import save_caffemodel, save_hdf5_weights
        host = jax.tree_util.tree_map(np.asarray, self._net.params)
        dn = self._net.deconv_names()
        if path.endswith((".h5", ".hdf5")):
            save_hdf5_weights(path, host, deconv_names=dn)
        else:
            save_caffemodel(path, host, net_name=self._net.name,
                            deconv_names=dn)

    def reshape(self) -> None:  # shape inference is automatic under jit
        pass

    @property
    def layer_dict(self):
        return OrderedDict((s.name, s) for _, s in self._net._plan)

    @property
    def _layer_names(self) -> List[str]:
        """pycaffe's net._layer_names (aligned with net.layers)."""
        return [s.name for _, s in self._net._plan]

    @property
    def layers(self):
        """pycaffe's net.layers: per-layer view with .type and .blobs
        (python/caffe/_caffe.cpp Layer bindings)."""

        class _LayerView:
            __slots__ = ("type", "blobs")

            def __init__(self, typ, blobs):
                self.type = typ
                self.blobs = blobs

        params = self.params
        return [_LayerView(s.type, params.get(s.name, []))
                for _, s in self._net._plan]

    @property
    def top_names(self) -> "OrderedDict[str, List[str]]":
        """pycaffe's net.top_names: layer name -> top blob names."""
        return OrderedDict((s.name, list(s.tops)) for _, s in self._net._plan)

    @property
    def bottom_names(self) -> "OrderedDict[str, List[str]]":
        """pycaffe's net.bottom_names: layer name -> bottom blob names."""
        return OrderedDict((s.name, list(s.bottoms))
                           for _, s in self._net._plan)

    @property
    def blob_loss_weights(self) -> "OrderedDict[str, float]":
        """pycaffe's net.blob_loss_weights: loss weight per blob
        (net.cpp: loss layers default 1, others 0, `loss_weight:` overrides)."""
        out: "OrderedDict[str, float]" = OrderedDict()
        for nm in self._net.input_names:
            out[nm] = 0.0
        for _, s in self._net._plan:
            declared = [float(v) for v in s.node.get_list("loss_weight")]
            for i, top in enumerate(s.tops):
                if i < len(declared):
                    out[top] = declared[i]
                else:
                    out[top] = 1.0 if (s.type.endswith("Loss") and i == 0) else 0.0
        return out

    def set_input_arrays(self, data: np.ndarray, labels: np.ndarray) -> None:
        """Feed the MemoryData layer (pycaffe _Net_set_input_arrays)."""
        self._net.set_input_arrays(data, labels)

    def _materialize_params(self) -> None:
        """Force parameter materialization for data-layer nets (the graph
        engine inits lazily; GraphSolver does this same peek at startup)."""
        if self._net.params:
            return
        inputs: Dict[str, Any] = {}
        self._net._pull_data_layers(inputs)
        shapes = {}
        peeked = {}
        for name, src in self._net.data_sources.items():
            peeked[name] = [inputs[t] for t in src.tops]
        for nm, arr in inputs.items():
            a = np.asarray(arr)
            shapes[nm] = (a.shape[0], a.shape[2], a.shape[3], a.shape[1]) \
                if a.ndim == 4 else a.shape
        self._net._peeked = peeked  # first forward reuses the peeked batch
        self._net._ensure_params(shapes)

    def share_with(self, other: "Net") -> None:
        """Share parameters with another net, by layer name
        (Net::ShareTrainedLayersWith, net.cpp:782-803): matching layers
        reference the SAME arrays afterwards (jax arrays are immutable, so
        sharing is aliasing the param entries)."""
        self._materialize_params()
        other._materialize_params()
        src = other._net.params
        for name in list(self._net.params):
            if name in src:
                self._net.params[name] = src[name]

    def forward_backward_all(self, blobs=None, diffs=None, **kwargs):
        """pycaffe _Net_forward_backward_all: batched forward + backward;
        returns ({blob: outputs}, {blob: gradients}) — input-blob gradients
        plus any blobs named in `diffs` (pycaffe.py:170-233)."""
        # chunk size BEFORE forward_all mutates the input staging blobs
        # (a trailing remainder chunk would otherwise shrink it)
        batch = self.blobs[self.inputs[0]].data.shape[0] if self.inputs else 1
        fwd_out = self.forward_all(blobs=blobs, **kwargs)
        num = next(iter(kwargs.values())).shape[0]
        grads: Dict[str, List[np.ndarray]] = {}
        for i in range(0, num, batch):
            chunk = {k: np.asarray(v[i:i + batch], np.float32)
                     for k, v in kwargs.items()}
            g = self._net.backward(diffs=diffs, **chunk)
            for nm, val in g.items():
                grads.setdefault(nm, []).append(np.asarray(val))
        bwd_out = {nm: np.concatenate(vals) for nm, vals in grads.items()}
        return fwd_out, bwd_out


class Solver:
    """pycaffe Solver facade (`caffe.get_solver` / `caffe.SGDSolver`):
    `.net` (live compat view), `.test_nets`, `.step(n)`, `.solve()`,
    `.iter`, `.snapshot()`, `.restore(state)` — backed by GraphSolver.

    PoseData recipes need the target-config plumbing of the CLI; construct
    `deepcut_tpu.solver.solver.PoseSolver` directly for those.
    """

    def __init__(self, path: str, solver_type: Optional[str] = None):
        import dataclasses

        from deepcut_tpu.solver.solver import GraphSolver, SolverParams

        sp = SolverParams.from_prototxt(path)
        if solver_type is not None:
            sp.config = dataclasses.replace(sp.config, solver_type=solver_type)
        self._solver = GraphSolver(sp, handle_signals=False)
        self.net = Net._from_graph(self._solver.net)
        self._test_net_views: Optional[List[Net]] = None

    @property
    def test_nets(self) -> List[Net]:
        # cache the wrappers (pycaffe's solver.test_nets[i] is a stable
        # object whose blob state persists across accesses), but still
        # re-share params each access: the backing nets alias the live
        # training params (Solver::Test's ShareTrainedLayersWith)
        nets = self._solver._init_test_nets()
        for tnet, _ in nets:
            self._solver._share_trained_layers(tnet)
        if self._test_net_views is None:
            self._test_net_views = [Net._from_graph(t) for t, _ in nets]
        return self._test_net_views

    @property
    def smoothed_loss(self) -> float:
        """Average loss over the last `average_loss` iterations (the
        UpdateSmoothedLoss window the backing GraphSolver maintains)."""
        return self._solver.smoothed_loss

    @property
    def iter(self) -> int:
        return self._solver.iter

    def step(self, iters: int) -> None:
        self._solver.step(iters)

    def solve(self) -> None:
        self._solver.solve()

    def snapshot(self) -> str:
        return self._solver.snapshot()

    def restore(self, state_path: str) -> None:
        self._solver.restore(state_path)


def get_solver(path: str) -> Solver:
    """pycaffe caffe.get_solver: dispatch on the prototxt's `type:` field
    (SolverRegistry analog)."""
    return Solver(path)


class SGDSolver(Solver):
    def __init__(self, path: str):
        super().__init__(path, solver_type="SGD")


class NesterovSolver(Solver):
    def __init__(self, path: str):
        super().__init__(path, solver_type="Nesterov")


class AdaGradSolver(Solver):
    def __init__(self, path: str):
        super().__init__(path, solver_type="AdaGrad")


class RMSPropSolver(Solver):
    def __init__(self, path: str):
        super().__init__(path, solver_type="RMSProp")


class AdaDeltaSolver(Solver):
    def __init__(self, path: str):
        super().__init__(path, solver_type="AdaDelta")


class AdamSolver(Solver):
    def __init__(self, path: str):
        super().__init__(path, solver_type="Adam")
