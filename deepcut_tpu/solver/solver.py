"""Training loop: the reference Solver (src/caffe/solver.cpp) made functional.

`SolverParams` parses the same solver.prototxt files (SolverParameter schema);
`PoseSolver` runs the DeeperCut training loop: prefetched batches, iter_size
gradient accumulation, smoothed-loss display, periodic snapshot, SIGINT ->
stop / SIGHUP -> snapshot (reference: util/signal_handler.cpp +
solver.cpp:260-273), and resume from snapshot.

Snapshots are dual-format, mirroring the reference's model/state split
(solver.cpp:411-481): a `.npz` with params + solver history + iter (the
SolverState analog) and optionally a reference-readable `.caffemodel`.
"""

from __future__ import annotations

import dataclasses
import os
import signal as _signal
import time
from collections import deque
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from deepcut_tpu.proto import text_format
from deepcut_tpu.proto.text_format import PbNode
from deepcut_tpu.solver import update_rules
from deepcut_tpu.solver.update_rules import SolverConfig


@dataclasses.dataclass
class SolverParams:
    """Loop-level knobs from SolverParameter + the update-rule SolverConfig."""

    config: SolverConfig
    max_iter: int = 100000
    display: int = 20
    average_loss: int = 1
    snapshot: int = 0
    snapshot_prefix: str = "snapshot"
    snapshot_format: str = "BINARYPROTO"  # or HDF5 (caffe.proto:199)
    test_interval: int = 0
    test_iter: int = 0  # first test_iter (single-test-net convenience)
    random_seed: int = -1
    train_net: str = ""
    test_net: str = ""  # first test_net file (single-test-net convenience)
    net: str = ""
    # Full train/test net specification (caffe.proto:104-133): inline
    # NetParameter nodes, per-net test_iter, and NetState stage/level
    # overrides. Evaluation order of test nets follows the reference:
    # (1) test_net_param, (2) test_net, (3) net_param/net instances
    # (Solver::InitTestNets, solver.cpp:104-191).
    test_iters: tuple = ()
    test_net_files: tuple = ()
    test_net_params: tuple = ()  # inline NetParameter PbNodes
    net_param: Optional[PbNode] = None
    train_net_param: Optional[PbNode] = None
    train_state: Optional[PbNode] = None  # NetState
    test_states: tuple = ()  # NetState per test-net instance
    test_initialization: bool = True  # caffe.proto:147-149
    test_compute_loss: bool = False  # caffe.proto:145
    snapshot_after_train: bool = True  # caffe.proto:228-229
    snapshot_diff: bool = False  # caffe.proto:196-198
    debug_info: bool = False  # caffe.proto:224-226
    has_snapshot_prefix: bool = False

    @staticmethod
    def from_prototxt(path_or_text: str) -> "SolverParams":
        if "\n" not in path_or_text and os.path.exists(path_or_text):
            node = text_format.parse_file(path_or_text)
        else:
            node = text_format.parse(path_or_text)
        return SolverParams.from_node(node)

    @staticmethod
    def from_node(node: PbNode) -> "SolverParams":
        # Legacy solver_type enum (upgrade_proto.cpp semantics).
        legacy = {0: "SGD", 1: "Nesterov", 2: "AdaGrad", 3: "RMSProp",
                  4: "AdaDelta", 5: "Adam"}
        stype = node.get_str("type", None)
        if stype is None:
            st = node.get("solver_type", 0)
            stype = legacy.get(int(st) if not isinstance(st, str) else
                               {"SGD": 0, "NESTEROV": 1, "ADAGRAD": 2,
                                "RMSPROP": 3, "ADADELTA": 4, "ADAM": 5}.get(st, 0), "SGD")
        cfg = SolverConfig(
            solver_type=stype,
            base_lr=node.get_float("base_lr", 0.01),
            lr_policy=node.get_str("lr_policy", "fixed"),
            gamma=node.get_float("gamma", 0.1),
            power=node.get_float("power", 1.0),
            stepsize=node.get_int("stepsize", 100000),
            stepvalue=tuple(int(v) for v in node.get_list("stepvalue")),
            stagelr=tuple(float(v) for v in node.get_list("multistep_lr")),
            max_iter=node.get_int("max_iter", 100000),
            momentum=node.get_float("momentum", 0.9),
            momentum2=node.get_float("momentum2", 0.999),
            rms_decay=node.get_float("rms_decay", 0.99),
            delta=node.get_float("delta", 1e-8),
            weight_decay=node.get_float("weight_decay", 0.0005),
            regularization_type=node.get_str("regularization_type", "L2"),
            clip_gradients=node.get_float("clip_gradients", -1.0),
            iter_size=node.get_int("iter_size", 1),
        )
        return SolverParams(
            config=cfg,
            max_iter=node.get_int("max_iter", 100000),
            display=node.get_int("display", 20),
            average_loss=node.get_int("average_loss", 1),
            snapshot=node.get_int("snapshot", 0),
            snapshot_prefix=node.get_str("snapshot_prefix", "snapshot"),
            snapshot_format=node.get_str("snapshot_format", "BINARYPROTO"),
            test_interval=node.get_int("test_interval", 0),
            test_iter=int(node.get_list("test_iter")[0]) if node.get_list("test_iter") else 0,
            random_seed=node.get_int("random_seed", -1),
            train_net=node.get_str("train_net", ""),
            test_net=(str(node.get_list("test_net")[0])
                      if node.get_list("test_net") else ""),
            net=node.get_str("net", ""),
            test_iters=tuple(int(v) for v in node.get_list("test_iter")),
            test_net_files=tuple(str(v) for v in node.get_list("test_net")),
            test_net_params=tuple(node.get_list("test_net_param")),
            net_param=node.get("net_param"),
            train_net_param=node.get("train_net_param"),
            train_state=node.get("train_state"),
            test_states=tuple(node.get_list("test_state")),
            test_initialization=node.get_bool("test_initialization", True),
            test_compute_loss=node.get_bool("test_compute_loss", False),
            snapshot_after_train=node.get_bool("snapshot_after_train", True),
            snapshot_diff=node.get_bool("snapshot_diff", False),
            debug_info=node.get_bool("debug_info", False),
            has_snapshot_prefix=node.has("snapshot_prefix"),
        )

    def resolve_train_net(self):
        """-> (model_def, stages, level) for the TRAIN net, honoring the
        exactly-one-of {net, net_param, train_net, train_net_param} contract
        and the NetState merge chain phase<net.state<train_state
        (Solver::InitTrainNet, solver.cpp:67-110). model_def is a file path
        or an inline NetParameter PbNode."""
        sources = [s for s in (self.net or None, self.net_param,
                               self.train_net or None,
                               self.train_net_param) if s is not None]
        if len(sources) > 1:
            raise ValueError(
                "SolverParameter must not contain more than one of net, "
                "net_param, train_net, train_net_param")
        if not sources:
            raise ValueError(
                "SolverParameter must specify a train net using one of: "
                "net, net_param, train_net, train_net_param")
        # precedence mirrors InitTrainNet's CopyFrom order: train_net_param,
        # train_net, then net_param, then net (later wins in the reference;
        # with the exactly-one check only one exists anyway)
        model_def = (self.train_net_param or self.net_param
                     or self.train_net or self.net)
        stages, level = _state_overrides(self.train_state)
        return model_def, stages, level

    def test_net_sources(self):
        """Ordered test-net instances as (model_def, test_iter, stages,
        level) tuples — Solver::InitTestNets (solver.cpp:104-191): inline
        test_net_param first, then test_net files, then instances of the
        generic net/net_param for any remaining test_iter entries; test_state
        must be unspecified or given once per instance."""
        has_generic = bool(self.net) or self.net_param is not None
        num_named = len(self.test_net_params) + len(self.test_net_files)
        iters = list(self.test_iters)
        if has_generic:
            if len(iters) < num_named:
                raise ValueError(
                    "test_iter must be specified for each test network")
        elif len(iters) != num_named:
            raise ValueError(
                "test_iter must be specified for each test network")
        num_instances = num_named + (len(iters) - num_named if has_generic else 0)
        if self.test_states and len(self.test_states) != num_instances:
            raise ValueError(
                "test_state must be unspecified or specified once per "
                "test net")
        if num_instances and self.test_interval <= 0:
            raise ValueError("test_interval must be > 0 with test nets")
        defs: List[Any] = list(self.test_net_params) + list(self.test_net_files)
        generic = self.net_param if self.net_param is not None else self.net
        defs += [generic] * (num_instances - num_named)
        out = []
        for i, d in enumerate(defs):
            st = self.test_states[i] if self.test_states else None
            stages, level = _state_overrides(st)
            out.append((d, iters[i], stages, level))
        return out


def _state_overrides(state_node: Optional[PbNode]):
    """(stages, level) from a NetState PbNode; Net's constructor merges them
    over the net proto's own `state` (solver.cpp NetState MergeFrom).
    level is None when the solver prototxt leaves it unset — MergeFrom
    overwrites with any SET scalar, so an explicit `level: 0` must override
    a nonzero net-proto state.level rather than read as "unset"."""
    if state_node is None:
        return (), None
    return (tuple(str(s) for s in state_node.get_list("stage")),
            state_node.get_int("level", 0) if state_node.has("level") else None)


# -- checkpoint helpers -----------------------------------------------------


def _esc(key: str) -> str:
    # Caffe layer names routinely contain '/' (GoogLeNet "inception_3a/1x1");
    # percent-escape so the '/' path separator below stays unambiguous.
    return key.replace("%", "%25").replace("/", "%2F")


def _unesc(key: str) -> str:
    return key.replace("%2F", "/").replace("%25", "%")


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{_esc(k)}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Any:
    root: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = [_unesc(p) for p in key.split("/")]
        d = root
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = jnp.asarray(val)
    return root


def save_checkpoint(path: str, params: Any, state: Any) -> None:
    # snapshot prefixes routinely point into not-yet-existing directories
    # (reference users mkdir by habit; failing here after hours of training
    # would lose the run)
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    flat = {}
    flat.update({f"params/{k}": v for k, v in _flatten(params).items()})
    flat.update({f"state/{k}": v for k, v in _flatten(state).items()})
    np.savez(path, **flat)


def load_checkpoint(path: str):
    data = np.load(path, allow_pickle=False)
    params_flat = {k[len("params/"):]: data[k] for k in data.files if k.startswith("params/")}
    state_flat = {k[len("state/"):]: data[k] for k in data.files if k.startswith("state/")}
    return _unflatten(params_flat), _unflatten(state_flat)


# -- signal handling (reference: util/signal_handler.cpp) -------------------


class SignalHandler:
    """Polled signal->action flags, like the reference's
    util/signal_handler.cpp. Defaults SIGINT -> STOP, SIGHUP -> SNAPSHOT;
    both effects are configurable to stop/snapshot/none (the CLI's
    -sigint_effect / -sighup_effect flags, caffe.cpp:44-48 +
    GetRequestedAction:139-151, which LOG(FATAL)s on anything else)."""

    EFFECTS = ("stop", "snapshot", "none")

    def __init__(self, enable: bool = True, sigint_effect: str = "stop",
                 sighup_effect: str = "snapshot"):
        for eff in (sigint_effect, sighup_effect):
            if eff not in self.EFFECTS:
                raise ValueError(
                    f'Invalid signal effect "{eff}" was specified')
        self.stop_requested = False
        self.snapshot_requested = False
        self._sigint_effect = sigint_effect
        self._sighup_effect = sighup_effect
        if enable:
            try:
                _signal.signal(_signal.SIGINT, self._on_sigint)
                _signal.signal(_signal.SIGHUP, self._on_sighup)
            except ValueError:
                pass  # not the main thread

    def _apply(self, effect: str):
        if effect == "stop":
            self.stop_requested = True
        elif effect == "snapshot":
            self.snapshot_requested = True

    def _on_sigint(self, *_):
        self._apply(self._sigint_effect)

    def _on_sighup(self, *_):
        self._apply(self._sighup_effect)


class GraphSolver:
    """Generic solver over a prototxt-defined net with data layers — the
    `caffe train` path for non-pose models (LeNet/CaffeNet-style recipes).
    """

    def __init__(self, params: SolverParams, net=None, *, mesh=None,
                 handle_signals: bool = True, log: Callable[[str], None] = print,
                 sigint_effect: str = "stop", sighup_effect: str = "snapshot"):
        """mesh: optional ('data', ...) Mesh — data-parallel training of any
        prototxt model (the reference CLI's `-gpu 0,1,...`); the per-step
        batch (from the data layers) is split across the 'data' axis, so
        batch_size plays the reference's total-batch role here rather than
        the per-device one (docs/multigpu.md:9-11 semantics differ).

        net=None resolves the train net from the solver params, including
        inline net_param/train_net_param definitions and train_state
        stage/level overrides (Solver::InitTrainNet, solver.cpp:67-110)."""
        from deepcut_tpu.core.graph import Net

        self.params_cfg = params
        if net is None:
            model_def, stages, level = params.resolve_train_net()
            self.net = Net(model_def, phase="TRAIN", stages=stages,
                           level=level, compute_dtype=None)
        elif isinstance(net, Net):
            self.net = net
        else:
            self.net = Net(net, phase="TRAIN", compute_dtype=None)
        self.mesh = mesh
        self.log = log
        self.signals = SignalHandler(handle_signals, sigint_effect,
                                     sighup_effect)
        self._loss_window = deque(maxlen=max(params.average_loss, 1))
        # materialise params (pull one batch for shapes if needed)
        if not self.net.params:
            inputs = {}
            self.net._pull_data_layers(inputs)
            shapes = {}
            for nm, arr in inputs.items():
                a = np.asarray(arr)
                sh = (a.shape[0], a.shape[2], a.shape[3], a.shape[1]) if a.ndim == 4 else a.shape
                shapes[nm] = sh
            self.net._peeked = {}
            for name, src in self.net.data_sources.items():
                self.net._peeked[name] = [inputs[t] for t in src.tops]
            self.net._ensure_params(shapes)
        self._step_fn = self.net.make_train_step(params.config, mesh=mesh)
        self.state = update_rules.init_state(params.config, self.net.params)
        self._test_nets = None
        self._last_host_inputs: Dict[str, Any] = {}
        # last update values (old params − new params): exactly what the
        # reference's Blob.diff holds at snapshot time, since ApplyUpdate
        # writes the final lr/momentum-scaled step into diff and Update does
        # data -= diff (sgd_solver.cpp:106-120, blob.cpp Update)
        self._last_diff: Optional[Dict[str, Any]] = None
        # device-side (old − new) used by snapshot_diff; jitted so the
        # per-iteration record stays an async device computation
        self._diff_fn = jax.jit(lambda old, new: jax.tree_util.tree_map(
            lambda o, n: o.astype(jnp.float32) - n.astype(jnp.float32),
            old, new))
        # Staged overrides merged into every step's batch (NCHW host
        # arrays). Used by the binding facades to persist values written
        # into fill-once blobs (constant DummyData tops) across training
        # iterations, like the reference's persistent Blob memory.
        # extra_test_inputs plays the same role for the TEST-phase net.
        self.extra_inputs: Dict[str, Any] = {}
        self.extra_test_inputs: Dict[str, Any] = {}

    def _init_test_nets(self):
        """Build every test-net instance (Solver::InitTestNets,
        solver.cpp:104-191): inline test_net_param nodes, then test_net
        files, then generic net/net_param instances for remaining test_iter
        entries — each a TEST-phase Net with its test_state stage/level
        merged over the net proto's own state."""
        if self._test_nets is not None:
            return self._test_nets
        from deepcut_tpu.core.graph import Net

        p = self.params_cfg
        if not (p.test_net_files or p.test_net_params or p.test_iters):
            # single-test-net convenience fields (programmatic SolverParams)
            source = p.test_net or p.net
            if source and p.test_iter > 0:
                self._test_nets = [(Net(source, phase="TEST",
                                        compute_dtype=None), p.test_iter)]
            else:
                self._test_nets = []
            return self._test_nets
        self._test_nets = []
        for model_def, iters, stages, level in p.test_net_sources():
            tnet = Net(model_def, phase="TEST", stages=stages, level=level,
                       compute_dtype=None)
            self._test_nets.append((tnet, iters))
        return self._test_nets

    def _share_trained_layers(self, tnet):
        """Point a test net at the live train params
        (Net::ShareTrainedLayersWith, net.cpp: Test calls it per pass)."""
        tnet.params = self.net.params
        # share the train net's named-param alias table too (layer names
        # match across phases) — without it a shared-weight TEST net (e.g.
        # siamese twins) would look up empty param entries
        tnet._aliases = getattr(self.net, "_aliases", {})
        tnet._lr_mults = getattr(self.net, "_lr_mults", {})
        tnet._decay_mults = getattr(self.net, "_decay_mults", {})
        tnet._params_ready = True

    def test(self, test_net_id: int = 0) -> Dict[str, float]:
        """Run test net #test_net_id for its test_iter forwards, averaging
        each output blob ELEMENT across iterations and logging them the way
        Solver::Test does (solver.cpp:335-409), including the optional
        averaged test loss (`test_compute_loss: true`)."""
        nets = self._init_test_nets()
        if not nets:
            return {}
        tnet, iters = nets[test_net_id]
        self._share_trained_layers(tnet)
        loss_weights = tnet.blob_loss_weights()
        sums: Dict[str, np.ndarray] = {}
        loss = 0.0
        for _ in range(iters):
            outs = tnet.forward(**self.extra_test_inputs)
            if self.params_cfg.test_compute_loss:
                loss += tnet.host_total_loss(outs)
            for nm in tnet.output_names():
                v = np.asarray(outs[nm], np.float64)
                sums[nm] = sums.get(nm, 0.0) + v
        if self.params_cfg.test_compute_loss:
            self.log(f"Test loss: {loss / iters:.6g}")
        avgs: Dict[str, float] = {}
        idx = 0
        for nm, s in sums.items():
            mean = s / iters
            w = loss_weights.get(nm, 0.0)
            for v in np.ravel(mean):
                suffix = f" (* {w:g} = {w * v:.6g} loss)" if w else ""
                self.log(f"    Test net output #{idx}: {nm} = {v:.6g}{suffix}")
                idx += 1
            avgs[nm] = float(np.mean(mean))
        return avgs

    def test_all(self) -> List[Dict[str, float]]:
        """Evaluate every test net in order (Solver::TestAll,
        solver.cpp:326-334)."""
        results = []
        for i in range(len(self._init_test_nets())):
            self.log(f"Iteration {self.iter}, Testing net (#{i})")
            results.append(self.test(i))
        return results

    @property
    def iter(self) -> int:
        return int(self.state["iter"])

    @property
    def smoothed_loss(self) -> float:
        """Average loss over the last `average_loss` iterations
        (Solver::UpdateSmoothedLoss, solver.cpp:483-495)."""
        if not self._loss_window:
            return float("nan")
        return sum(self._loss_window) / len(self._loss_window)

    def _next_inputs(self):
        import jax.numpy as jnp

        def pull_one(stash: bool = False):
            inputs: Dict[str, Any] = dict(self.extra_inputs)
            self.net._pull_data_layers(inputs)
            if stash:
                # keep the host NCHW batch for the debug_info forward so the
                # debug stream reflects THIS iteration's data without
                # consuming an extra batch (net.cpp:647-735 prints during
                # the training forward itself)
                self._last_host_inputs = {k: np.asarray(v)
                                          for k, v in inputs.items()}
            dev = {}
            for nm, arr in inputs.items():
                a = jnp.asarray(arr)
                if a.ndim == 4:
                    a = jnp.transpose(a, (0, 2, 3, 1))
                dev[nm] = a
            return dev

        k = max(self.params_cfg.config.iter_size, 1)
        stash = bool(self.params_cfg.debug_info)
        if k == 1:
            return pull_one(stash)
        # iter_size accumulation: stack k successive data-layer batches on a
        # new leading axis; the train step scans over it summing gradients.
        batches = [pull_one(stash and i == 0) for i in range(k)]
        return {nm: jnp.stack([b[nm] for b in batches]) for nm in batches[0]}

    def step(self, iters: int) -> None:
        cfg = self.params_cfg
        params = self.net.params
        for _ in range(iters):
            if self.signals.stop_requested:
                self.log(f"Optimization stopped by signal at iter {self.iter}.")
                break
            if self.signals.snapshot_requested:  # SIGHUP (solver.cpp:262-273)
                self.net.params = params
                self.snapshot()
                self.signals.snapshot_requested = False
            if (cfg.test_interval and self.iter % cfg.test_interval == 0
                    and (self.iter > 0 or cfg.test_initialization)):
                # test_initialization (default true) controls the iter-0
                # pass (Solver::Step gate, solver.cpp:205-208)
                self.net.params = params
                self.test_all()
            # display gates on the PRE-update iteration (Solver::Step logs
            # "Iteration 0, loss" before the first update and the window
            # includes the current iteration's loss, solver.cpp:228-250)
            it_pre = self.iter
            display_now = cfg.display and it_pre % cfg.display == 0
            inputs = self._next_inputs()
            if display_now and cfg.debug_info:
                # per-blob/param L1-mean stream on displayed iterations
                # (net_->set_debug_info(display && debug_info),
                # solver.cpp:218-219; Net::*DebugInfo net.cpp:647-735) —
                # replayed on this iteration's own batch via a host forward
                self.net.params = params
                info = self.net.debug_info(**self._last_host_inputs)
                for nm, v in info.items():
                    if nm.startswith("param:"):
                        self.log(f"    [Backward] Param {nm[6:]}, "
                                 f"data: {v:.6g}")
                    else:
                        self.log(f"    [Forward] Blob {nm}, data: {v:.6g}")
            params_pre = params if cfg.snapshot_diff else None
            params, self.state, loss = self._step_fn(params, self.state,
                                                     inputs)
            if cfg.snapshot_diff:
                # device-side subtract, kept as (async) device arrays: the
                # per-iteration cost is one jitted elementwise pass; the
                # D2H fetch of the full tree happens only inside snapshot()
                # (two whole-tree host pulls per STEP would make training
                # D2H-bound through the relay)
                self._last_diff = self._diff_fn(params_pre, params)
            self._loss_window.append(float(loss))
            if display_now:
                lr = float(update_rules.learning_rate(cfg.config, it_pre))
                self.log(f"Iteration {it_pre}, loss = {self.smoothed_loss:.5f}, "
                         f"lr = {lr:.6g}")
            it = self.iter
            if cfg.snapshot and it % cfg.snapshot == 0:
                self.net.params = params
                self.snapshot()
        self.net.params = params

    def solve(self) -> None:
        """Solver::Solve (solver.cpp:277-324): run to max_iter, final
        snapshot unless `snapshot_after_train: false` or the interval just
        produced one, then a final display forward and test pass when the
        final iteration lands on their intervals. (Deviation: the final
        snapshot additionally requires a snapshot interval or an explicit
        snapshot_prefix in the prototxt, so programmatic SolverParams
        without snapshot settings don't litter the cwd.)"""
        cfg = self.params_cfg
        self.step(cfg.max_iter - self.iter)
        if (cfg.snapshot_after_train
                and (cfg.snapshot or cfg.has_snapshot_prefix)
                and (not cfg.snapshot or self.iter % cfg.snapshot != 0)):
            self.snapshot()
        if self.signals.stop_requested:
            self.log("Optimization stopped early.")
            return
        if (cfg.display and self.iter % cfg.display == 0
                and self.net.data_sources):
            # final forward-only display pass (Net::ForwardPrefilled in
            # Solver::Solve, solver.cpp:310-318); only for self-feeding nets
            # — input-declared nets have no data to prefill from
            outs = self.net.forward(**self.extra_inputs)
            self._loss_window.append(self.net.host_total_loss(outs))
            self.log(f"Iteration {self.iter}, loss = {self.smoothed_loss:.5f}")
        if cfg.test_interval and self.iter % cfg.test_interval == 0:
            self.test_all()
        self.log("Optimization Done.")

    _STATE_KEYS = ("history", "update_sq", "m", "v")

    def _state_blobs(self) -> List[np.ndarray]:
        blobs: List[np.ndarray] = []
        for k in self._STATE_KEYS:
            if k in self.state:
                blobs.extend(np.asarray(x) for x in
                             jax.tree_util.tree_leaves(self.state[k]))
        return blobs

    def snapshot(self, export_caffemodel: bool = True) -> str:
        """Dual-format snapshot, mirroring the reference's model/state split
        (solver.cpp:411-469): native .npz plus reference-readable
        .caffemodel + .solverstate binaryprotos. `snapshot_format: ORBAX`
        swaps the native artifact for an async orbax directory (the
        TPU-native backend — see solver/orbax_ckpt.py); the interchange
        exports are unchanged."""
        if self.params_cfg.snapshot_format.upper() == "ORBAX":
            from deepcut_tpu.solver import orbax_ckpt

            path = f"{self.params_cfg.snapshot_prefix}_iter_{self.iter}.orbax"
            orbax_ckpt.save(path, self.net.params, self.state)
        else:
            path = f"{self.params_cfg.snapshot_prefix}_iter_{self.iter}.npz"
            save_checkpoint(path, self.net.params, self.state)
        self.log(f"Snapshotting to {path}")
        if export_caffemodel:
            from deepcut_tpu.proto.caffemodel import (
                save_caffemodel, save_hdf5_weights, encode_solverstate)
            prefix = f"{self.params_cfg.snapshot_prefix}_iter_{self.iter}"
            host_params = jax.tree_util.tree_map(np.asarray, self.net.params)
            dn = self.net.deconv_names()
            diffs = (jax.tree_util.tree_map(
                         lambda a: np.asarray(a, np.float32), self._last_diff)
                     if self.params_cfg.snapshot_diff
                     and self._last_diff is not None else None)
            if self.params_cfg.snapshot_format.upper() == "HDF5":
                model_path = f"{prefix}.caffemodel.h5"
                save_hdf5_weights(model_path, host_params, deconv_names=dn,
                                  diffs=diffs)
            else:
                model_path = f"{prefix}.caffemodel"
                save_caffemodel(model_path, host_params, deconv_names=dn,
                                diffs=diffs)
            with open(f"{prefix}.solverstate", "wb") as f:
                f.write(encode_solverstate(
                    self.iter, self._state_blobs(), learned_net=model_path))
        return path

    def restore(self, path: str) -> None:
        """Resume training. Dispatches on extension like Solver::Restore
        (solver.cpp:471-481): `.solverstate` binaryproto (history blobs in
        canonical pytree order + the learned_net caffemodel), an orbax
        checkpoint directory, or native .npz."""
        from deepcut_tpu.solver import orbax_ckpt

        if orbax_ckpt.is_orbax_checkpoint(path):
            self.net.params, self.state = orbax_ckpt.restore(
                path, like=(self.net.params, self.state), mesh=self.mesh)
        elif path.endswith(".solverstate"):
            import os
            from deepcut_tpu.proto.caffemodel import decode_solverstate

            it, learned, blobs, _ = decode_solverstate(open(path, "rb").read())
            idx = 0
            for k in self._STATE_KEYS:
                if k in self.state:
                    leaves, treedef = jax.tree_util.tree_flatten(self.state[k])
                    new = [jnp.asarray(b.data.reshape(np.asarray(l).shape))
                           for b, l in zip(blobs[idx:idx + len(leaves)], leaves)]
                    self.state[k] = jax.tree_util.tree_unflatten(treedef, new)
                    idx += len(leaves)
            self.state["iter"] = jnp.asarray(it, jnp.int32)
            if learned and os.path.exists(learned):
                self.net.load_weights(learned)
        else:
            self.net.params, self.state = load_checkpoint(path)
        self.log(f"Restored from {path} at iter {self.iter}")


class PoseSolver:
    """DeeperCut training driver (native model path).

    batch_source: callable returning the next batch dict (host numpy).
    """

    def __init__(
        self,
        params: SolverParams,
        model_cfg,
        batch_source: Callable[[], Dict[str, np.ndarray]],
        *,
        net_params: Optional[Any] = None,
        mesh=None,
        lr_mults: Optional[Any] = None,
        handle_signals: bool = True,
        log: Callable[[str], None] = print,
        target_cfg=None,
        target_stats=None,
        eval_fn: Optional[Callable[[Any, int], Optional[str]]] = None,
        sigint_effect: str = "stop",
        sighup_effect: str = "snapshot",
    ):
        """target_cfg (pose.targets.TargetConfig): enables ON-DEVICE target
        rasterization — the batch_source ships compact `anno_*` annotation
        arrays (PoseDataSource(device_targets=True)) and the dense maps are
        built inside the jitted gradient step (pose/targets_device.py).

        eval_fn: validation hook called as ``eval_fn(net_params, iter)`` on
        `test_interval` boundaries, BEFORE that iteration's update — the
        reference's Solver::Step TestAll gate (solver.cpp:206-217) applied
        to the pose stack, where "test" means scoring the detector (e.g.
        pose.evaluate.evaluate_estimator PCKh over a held-out window file;
        tests/test_pose_training_e2e.py shows the wiring) rather than
        averaging loss blobs. A returned string is logged."""
        from deepcut_tpu.models.resnet import init_params
        from deepcut_tpu.models.train import loss_fn

        self.params_cfg = params
        self.model_cfg = model_cfg
        self.batch_source = batch_source
        self.mesh = mesh
        self.log = log
        seed = params.random_seed if params.random_seed >= 0 else 0
        self.net_params = net_params if net_params is not None else init_params(
            jax.random.PRNGKey(seed), model_cfg)
        self.state = update_rules.init_state(params.config, self.net_params)
        self.signals = SignalHandler(handle_signals, sigint_effect,
                                     sighup_effect)
        self._loss_window = deque(maxlen=max(params.average_loss, 1))
        self.eval_fn = eval_fn
        scfg = params.config
        from deepcut_tpu.pose.augment_device import warp_batch
        if target_cfg is not None:
            from deepcut_tpu.pose.targets_device import make_batch_rasterizer
            _rast = make_batch_rasterizer(target_cfg, target_stats)
            vg = jax.value_and_grad(
                lambda p, b: loss_fn(p, _rast(warp_batch(b)), model_cfg),
                has_aux=True)
        else:
            vg = jax.value_and_grad(
                lambda p, b: loss_fn(p, warp_batch(b), model_cfg),
                has_aux=True)
        # default: BN statistics frozen, like the prototxt's lr_mult-0
        # param overrides (models/train.bn_frozen_mults); explicit lr_mults
        # override the default wholesale
        if lr_mults is None:
            from deepcut_tpu.models.train import bn_frozen_mults
            lr_mults = bn_frozen_mults(self.net_params)
            decay_mults = lr_mults
        else:
            decay_mults = None
        upd = lambda p, g, s: update_rules.step(scfg, p, g, s,
                                                lr_mults=lr_mults,
                                                decay_mults=decay_mults)
        nsp = 1
        if mesh is not None:
            from deepcut_tpu.parallel.spatial import spatial_axis_size
            nsp = spatial_axis_size(mesh)
        if mesh is None:
            self._grad_fn = jax.jit(vg)
            self._update_fn = jax.jit(upd)
        elif nsp > 1:
            # 2-D mesh: batch over 'data', image ROWS over 'spatial' via the
            # shard_map halo-exchange path — the gradient machinery lives in
            # parallel/spatial.py (make_spatial_value_and_grad); the update
            # stays a separate replicated jit so iter_size host accumulation
            # keeps working.
            from jax.sharding import NamedSharding, PartitionSpec as P
            from deepcut_tpu.parallel.spatial import make_spatial_value_and_grad

            self._grad_fn = make_spatial_value_and_grad(
                model_cfg, mesh, target_cfg=target_cfg,
                target_stats=target_stats)
            repl = NamedSharding(mesh, P())
            self._update_fn = jax.jit(upd, in_shardings=(repl, repl, repl),
                                      out_shardings=(repl, repl))
        else:
            # data-parallel: batch sharded over the 'data' axis, params and
            # optimizer state replicated; XLA all-reduces the gradients over
            # ICI (P2PSync analog, parallel.cpp:382-431).
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(mesh, P())
            bsh = NamedSharding(mesh, P("data"))
            self._grad_fn = jax.jit(vg, in_shardings=(repl, bsh))
            self._update_fn = jax.jit(upd, in_shardings=(repl, repl, repl),
                                      out_shardings=(repl, repl))

    @property
    def iter(self) -> int:
        return int(self.state["iter"])

    @property
    def smoothed_loss(self) -> float:
        """Average loss over the last `average_loss` iterations
        (Solver::UpdateSmoothedLoss, solver.cpp:483-495)."""
        if not self._loss_window:
            return float("nan")
        return sum(self._loss_window) / len(self._loss_window)

    def step(self, iters: int) -> None:
        """Reference Solver::Step (solver.cpp:193-275): iter_size
        accumulation, smoothed-loss display, snapshot on interval/signal."""
        cfg = self.params_cfg
        for _ in range(iters):
            if self.signals.stop_requested:
                self.log(f"Optimization stopped by signal at iter {self.iter}.")
                break
            if self.signals.snapshot_requested:
                self.snapshot()
                self.signals.snapshot_requested = False
            if (self.eval_fn is not None and cfg.test_interval
                    and self.iter % cfg.test_interval == 0
                    and (self.iter > 0 or cfg.test_initialization)):
                # Solver::Step's TestAll gate (same convention as
                # GraphSolver.step above): validation runs BEFORE this
                # iteration's update, including at iteration 0
                self.log(f"Iteration {self.iter}, Testing net")
                msg = self.eval_fn(self.net_params, self.iter)
                if msg:
                    self.log(f"    Test net output: {msg}")
            grads = None
            total = 0.0
            metrics = {}
            for _ in range(cfg.config.iter_size):
                batch = {k: jnp.asarray(v) for k, v in self.batch_source().items()}
                (loss, metrics), g = self._grad_fn(self.net_params, batch)
                grads = g if grads is None else jax.tree_util.tree_map(
                    lambda a, b: a + b, grads, g)
                total += float(loss)
            # display gates on the PRE-update iteration like Solver::Step
            # (logs iteration 0; the smoothed window includes this
            # iteration's loss, solver.cpp:228-250)
            it_pre = self.iter
            self.net_params, self.state = self._update_fn(self.net_params, grads, self.state)
            self._loss_window.append(total / cfg.config.iter_size)
            if cfg.display and it_pre % cfg.display == 0:
                lr = float(update_rules.learning_rate(cfg.config, it_pre))
                parts = ", ".join(
                    f"{k} = {float(v):.4f}" for k, v in sorted(metrics.items()))
                self.log(f"Iteration {it_pre}, loss = {self.smoothed_loss:.5f} "
                         f"({parts}), lr = {lr:.6g}")
            it = self.iter
            if cfg.snapshot and it % cfg.snapshot == 0:
                self.snapshot()

    def solve(self) -> None:
        self.log(f"Solving with {self.params_cfg.config.solver_type}, "
                 f"max_iter = {self.params_cfg.max_iter}")
        t0 = time.time()
        self.step(self.params_cfg.max_iter - self.iter)
        self.log(f"Optimization done in {time.time() - t0:.1f}s.")
        cfg = self.params_cfg
        # final snapshot unless disabled or the interval just produced one
        # (Solver::Solve + snapshot_after_train, solver.cpp:293-300); like
        # GraphSolver.solve it additionally requires snapshot settings in
        # the prototxt so programmatic runs don't litter the cwd
        if (cfg.snapshot_after_train
                and (cfg.snapshot or cfg.has_snapshot_prefix)
                and (not cfg.snapshot or self.iter % cfg.snapshot != 0)):
            self.snapshot()

    # -- snapshot/restore (reference: solver.cpp:411-481) ------------------
    def snapshot(self, export_caffemodel: bool = True) -> str:
        """Writes BOTH artifacts by default, like GraphSolver: the .npz
        (params + solver state, for -snapshot resume) and the
        reference-format .caffemodel the inference loaders (pose demo,
        serve, estimate_pose) consume — the documented train->infer
        workflow needs the latter. `snapshot_format: ORBAX` swaps the .npz
        for an async orbax directory (solver/orbax_ckpt.py)."""
        if self.params_cfg.snapshot_format.upper() == "ORBAX":
            from deepcut_tpu.solver import orbax_ckpt

            path = f"{self.params_cfg.snapshot_prefix}_iter_{self.iter}.orbax"
            orbax_ckpt.save(path, self.net_params, self.state)
        else:
            path = f"{self.params_cfg.snapshot_prefix}_iter_{self.iter}.npz"
            save_checkpoint(path, self.net_params, self.state)
        self.log(f"Snapshotting to {path}")
        if export_caffemodel:
            from deepcut_tpu.proto.caffemodel import save_caffemodel
            cm = f"{self.params_cfg.snapshot_prefix}_iter_{self.iter}.caffemodel"
            save_caffemodel(cm, jax.tree_util.tree_map(np.asarray, self.net_params))
            self.log(f"Snapshotting model weights to {cm}")
        return path

    def restore(self, path: str) -> None:
        from deepcut_tpu.solver import orbax_ckpt

        if orbax_ckpt.is_orbax_checkpoint(path):
            self.net_params, self.state = orbax_ckpt.restore(
                path, like=(self.net_params, self.state), mesh=self.mesh)
        else:
            self.net_params, self.state = load_checkpoint(path)
        self.log(f"Restored from {path} at iter {self.iter}")
