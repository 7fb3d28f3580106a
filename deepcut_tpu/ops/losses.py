"""Loss ops with Caffe-exact forward AND backward semantics.

The fork's losses have idiosyncratic normalisers (both forward and backward
clamp the count at 100: softmax_loss_vec_layer.cpp:143-147,225-230,
smooth_L1_loss_layer.cu:47-55,86) and, for SmoothL1, a backward that does NOT
re-apply the weight factor (Fast R-CNN heritage, where weights are 0/1
masks). We replicate both exactly via custom_vjp so training matches the
reference step-for-step.

All losses here take NHWC tensors (channel last); channel-indexed semantics
from the reference (NCHW channel axis 1) map to axis -1.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

IGNORE_VALUE = 1000.0  # softmax_loss_vec_layer.cpp:12

# -- sharded-normaliser context ---------------------------------------------
# Under jax.shard_map every device sees only its batch shard, so loss
# normalisers (counts, weight sums, batch sizes) must be lax.psum'ed to keep
# single-device semantics. Loss entry points below consult this context at
# TRACE time and dispatch to psum'ed custom_vjp variants (the psums must live
# inside custom_vjp: a raw psum on the differentiation path transposes to
# another psum and inflates gradients by the axis size). The graph engine's
# spatial train step wraps its loss-region trace in `sharded_losses(axes)`.
_SHARDED_AXES: Tuple = ()


class sharded_losses:
    """Context manager: `with sharded_losses(("data",)): ...` makes every
    loss entry point in this module reduce its sums/normalisers over the
    given mesh axes (shard_map only)."""

    def __init__(self, axes):
        self.axes = tuple(axes)

    def __enter__(self):
        global _SHARDED_AXES
        self._prev, _SHARDED_AXES = _SHARDED_AXES, self.axes
        return self

    def __exit__(self, *exc):
        global _SHARDED_AXES
        _SHARDED_AXES = self._prev
        return False


def _smooth_l1(d: jax.Array) -> jax.Array:
    ad = jnp.abs(d)
    return jnp.where(ad < 1.0, 0.5 * d * d, ad - 0.5)


def _smooth_l1_grad(d: jax.Array) -> jax.Array:
    return jnp.where(jnp.abs(d) < 1.0, d, jnp.sign(d))


@jax.custom_vjp
def _smooth_l1_plain(pred, target, weights=None):
    return _smooth_l1_fwd(pred, target, weights)[0]


def smooth_l1_loss(pred: jax.Array, target: jax.Array, weights: Optional[jax.Array] = None) -> jax.Array:
    """Huber loss, fork semantics (smooth_L1_loss_layer.cu).

    forward: d = w*(pred-target); loss = sum f(d) / sum(|w|)  (0 if sum w == 0)
    backward: dpred = f'(d) / max(sum w, 100)   — note: no extra w factor.

    Dispatches to the psum'ed variant inside a `sharded_losses` context.
    """
    return make_smooth_l1_loss(_SHARDED_AXES)(pred, target, weights)


def _smooth_l1_fwd(pred, target, weights):
    d = pred - target
    if weights is not None:
        d = d * weights
        wsum = jnp.sum(jnp.abs(weights))
    else:
        wsum = jnp.asarray(float(pred.size), jnp.float32)
    err = jnp.sum(_smooth_l1(d))
    loss = jnp.where(wsum != 0, err / jnp.where(wsum == 0, 1.0, wsum), 0.0)
    return loss, (d, wsum)


def _smooth_l1_bwd(res, g):
    d, wsum = res
    norm = jnp.maximum(wsum, 100.0)
    grad = g * _smooth_l1_grad(d) / norm
    return grad, -grad, None


_smooth_l1_plain.defvjp(_smooth_l1_fwd, _smooth_l1_bwd)
_SL1_CACHE: dict = {}


def make_smooth_l1_loss(psum_axes: Tuple = ()):
    """smooth_l1_loss with normalisers reduced over `psum_axes` mesh axes —
    for use INSIDE jax.shard_map (parallel/spatial.py): the error sum and
    |weights| sum are lax.psum'ed so every device sees the GLOBAL
    normaliser, making the sharded loss/gradients bit-equal in semantics to
    the single-device fork loss (max(sum w, 100) backward clamp included).
    The psums live inside the custom_vjp fwd, so they are never
    differentiated through (raw psum transposes to psum under shard_map and
    would inflate gradients by the axis size)."""
    psum_axes = tuple(psum_axes)
    if not psum_axes:
        return _smooth_l1_plain
    if psum_axes in _SL1_CACHE:
        return _SL1_CACHE[psum_axes]

    @jax.custom_vjp
    def fn(pred, target, weights=None):
        return fwd(pred, target, weights)[0]

    def fwd(pred, target, weights):
        d = pred - target
        if weights is not None:
            d = d * weights
            wsum = jax.lax.psum(jnp.sum(jnp.abs(weights)), psum_axes)
        else:
            wsum = jax.lax.psum(
                jnp.asarray(float(pred.size), jnp.float32), psum_axes)
        err = jax.lax.psum(jnp.sum(_smooth_l1(d)), psum_axes)
        loss = jnp.where(wsum != 0, err / jnp.where(wsum == 0, 1.0, wsum), 0.0)
        return loss, (d, wsum)

    fn.defvjp(fwd, _smooth_l1_bwd)  # bwd is local math over global wsum
    _SL1_CACHE[psum_axes] = fn
    return fn


def _sigmoid_ce_elem(x: jax.Array, t: jax.Array) -> jax.Array:
    """Per-element sigmoid cross-entropy, the overflow-safe Caffe form:
    -(x*(t - (x>=0)) - log(1 + exp(x - 2x*(x>=0))))."""
    pos = (x >= 0).astype(x.dtype)
    return -(x * (t - pos) - jnp.log1p(jnp.exp(x - 2.0 * x * pos)))


_SLV_CACHE: dict = {}


def softmax_loss_vec(
    scores: jax.Array,
    labels: jax.Array,
    weights: Optional[jax.Array] = None,
    *,
    cross_entropy: bool = True,
    no_softmax: bool = False,
    normalize: bool = True,
) -> jax.Array:
    """The fork's SoftmaxWithLossVec (dense score-map labels), NHWC.

    cross_entropy=True: per-channel sigmoid CE; elements with label ==
    IGNORE_VALUE are skipped; `count` = positions with >=1 live channel.
    cross_entropy=False: softmax over channels, target class = argmax of the
    label vector; position ignored when label channel 0 == IGNORE_VALUE.
    Forward normaliser: max(count, 100) if normalize else N
    (softmax_loss_vec_layer.cpp:143-147);
    backward normaliser: max(weight_sum or count, 100).

    Dispatches to a per-config custom_vjp wrapper (make_softmax_loss_vec):
    custom_vjp cannot close over keyword-static args directly. Inside a
    `sharded_losses` context the psum'ed variant is selected.
    """
    key = (cross_entropy, no_softmax, normalize, _SHARDED_AXES)
    if key not in _SLV_CACHE:
        _SLV_CACHE[key] = make_softmax_loss_vec(
            cross_entropy=cross_entropy, no_softmax=no_softmax,
            normalize=normalize, psum_axes=_SHARDED_AXES)
    return _SLV_CACHE[key](scores, labels, weights)


def _slv_fwd(scores, labels, weights, *, cross_entropy, no_softmax, normalize,
             psum_axes=()):
    x = scores.astype(jnp.float32)
    t = labels.astype(jnp.float32)
    n = jnp.asarray(float(x.shape[0]), jnp.float32)
    if cross_entropy:
        live = t != IGNORE_VALUE
        w = weights if weights is not None else jnp.ones_like(x)
        elem = _sigmoid_ce_elem(x, jnp.where(live, t, 0.0)) * w
        loss_sum = jnp.sum(jnp.where(live, elem, 0.0))
        count = jnp.sum(jnp.any(live, axis=-1)).astype(jnp.float32)
        prob = jax.nn.sigmoid(x)
    else:
        if no_softmax:
            prob = x
        else:
            prob = jax.nn.softmax(x, axis=-1)
        label_value = jnp.argmax(t, axis=-1)
        picked = jnp.take_along_axis(prob, label_value[..., None], axis=-1)[..., 0]
        live_pos = t[..., 0] != IGNORE_VALUE
        tiny = jnp.float32(1.175494e-38)  # FLT_MIN, matching the reference clamp
        loss_sum = -jnp.sum(jnp.where(live_pos, jnp.log(jnp.maximum(picked, tiny)), 0.0))
        count = jnp.sum(live_pos).astype(jnp.float32)
        live = jnp.broadcast_to(live_pos[..., None], x.shape)
    # backward normaliser numerator: channel-0 weight sum when weighted
    # (softmax_loss_vec_layer.cpp:185-189), else the live count
    bwd_norm = jnp.sum(weights[..., 0]) if weights is not None else count
    if psum_axes:
        # sharded variant (jax.shard_map): global sums so every device
        # normalises like the single-device loss; inside custom_vjp so the
        # psums are never differentiated through (see make_smooth_l1_loss)
        loss_sum = jax.lax.psum(loss_sum, psum_axes)
        count = jax.lax.psum(count, psum_axes)
        bwd_norm = jax.lax.psum(bwd_norm, psum_axes)
        n = jax.lax.psum(n, psum_axes)
    denom = jnp.maximum(count, 100.0) if normalize else n
    loss = loss_sum / denom
    res = (prob, t, weights, live, bwd_norm, n)
    return loss, res


def _slv_bwd(cross_entropy, no_softmax, normalize, res, g):
    prob, t, weights, live, bwd_norm, n = res
    if weights is not None:
        # the reference's weighted backward skips the ignore-zeroing
        # branches ENTIRELY (softmax_loss_vec_layer.cpp:171-176: the
        # has_weights_ arm shadows both zeroing arms), so diff =
        # (prob - label) * w even where label == IGNORE_VALUE — replicated
        # exactly (in the fork's configs weight maps carry no 1000-labels,
        # so this is latent there, but the contract is step-for-step parity)
        diff = (prob - t) * weights
    else:
        diff = prob - jnp.where(live, t, prob)  # zero where ignored
    denom = jnp.maximum(bwd_norm, 100.0) if normalize else n
    return (g * diff / denom, None, None)


# custom_vjp over keyword-static args: wrap per-config.
def make_softmax_loss_vec(*, cross_entropy=True, no_softmax=False,
                          normalize=True, psum_axes: Tuple = ()):
    """psum_axes: mesh axes to reduce the sums/normalisers over — the
    shard_map variant for spatially/data-sharded training (see
    make_smooth_l1_loss)."""
    @jax.custom_vjp
    def fn(scores, labels, weights=None):
        return _slv_fwd(scores, labels, weights, cross_entropy=cross_entropy,
                        no_softmax=no_softmax, normalize=normalize,
                        psum_axes=psum_axes)[0]

    def fwd(scores, labels, weights=None):
        return _slv_fwd(scores, labels, weights, cross_entropy=cross_entropy,
                        no_softmax=no_softmax, normalize=normalize,
                        psum_axes=psum_axes)

    def bwd(res, g):
        return _slv_bwd(cross_entropy, no_softmax, normalize, res, g)

    fn.defvjp(fwd, bwd)
    return fn


# -- upstream Caffe losses --------------------------------------------------


_SWL_CACHE: dict = {}


def make_softmax_with_loss(psum_axes: Tuple, *, ignore_label=None,
                           normalization: str = "VALID"):
    """Sharded (psum'ed normaliser) SoftmaxWithLoss as a custom_vjp — the
    shard_map twin of softmax_with_loss (see make_smooth_l1_loss for why the
    psums must live inside custom_vjp)."""
    psum_axes = tuple(psum_axes)
    key = (psum_axes, ignore_label, normalization)
    if key in _SWL_CACHE:
        return _SWL_CACHE[key]

    def fwd(scores, labels):
        x = scores.astype(jnp.float32)
        prob = jax.nn.softmax(x, axis=-1)
        logp = jax.nn.log_softmax(x, axis=-1)
        lab = labels.astype(jnp.int32)
        picked = jnp.take_along_axis(logp, lab[..., None], axis=-1)[..., 0]
        live = (lab != ignore_label) if ignore_label is not None \
            else jnp.ones(lab.shape, bool)
        bad = jnp.any(live & ((lab < 0) | (lab >= x.shape[-1])))
        picked = jnp.where(bad, jnp.float32(jnp.nan), picked)
        loss_sum = -jnp.sum(jnp.where(live, picked, 0.0))
        valid = jnp.sum(live).astype(jnp.float32)
        outer = jnp.asarray(float(scores.shape[0]), jnp.float32)
        full = jnp.asarray(float(lab.size), jnp.float32)
        if psum_axes:
            loss_sum = jax.lax.psum(loss_sum, psum_axes)
            valid = jax.lax.psum(valid, psum_axes)
            outer = jax.lax.psum(outer, psum_axes)
            full = jax.lax.psum(full, psum_axes)
        if normalization == "VALID":
            denom = jnp.maximum(valid, 1.0)
        elif normalization == "BATCH_SIZE":
            denom = outer
        elif normalization == "FULL":
            denom = full
        else:
            denom = jnp.float32(1.0)
        return loss_sum / denom, (prob, lab, live, denom)

    def bwd(res, g):
        prob, lab, live, denom = res
        onehot = jax.nn.one_hot(lab, prob.shape[-1], dtype=jnp.float32)
        diff = (prob - onehot) * live[..., None].astype(jnp.float32)
        return (g * diff / denom, None)

    @jax.custom_vjp
    def fn(scores, labels):
        return fwd(scores, labels)[0]
    fn.defvjp(fwd, bwd)
    _SWL_CACHE[key] = fn
    return fn


def softmax_with_loss(
    scores: jax.Array,
    labels: jax.Array,
    *,
    ignore_label: Optional[int] = None,
    normalization: str = "VALID",
) -> jax.Array:
    """SoftmaxWithLoss (softmax_loss_layer.cpp): integer labels over axis -1.

    scores: (..., C); labels: (...) int. normalization: VALID (count of
    non-ignored), BATCH_SIZE, FULL, NONE. Inside a `sharded_losses` context
    the psum'ed custom_vjp variant is used.
    """
    if _SHARDED_AXES:
        return make_softmax_with_loss(_SHARDED_AXES, ignore_label=ignore_label,
                                      normalization=normalization)(scores, labels)
    x = scores.astype(jnp.float32)
    logp = jax.nn.log_softmax(x, axis=-1)
    lab = labels.astype(jnp.int32)
    picked = jnp.take_along_axis(logp, lab[..., None], axis=-1)[..., 0]
    live = (lab != ignore_label) if ignore_label is not None \
        else jnp.ones(lab.shape, bool)
    # Caffe CHECKs 0 <= label < C (softmax_loss_layer.cpp DCHECK_GE/LT);
    # take_along_axis CLAMPS instead, which would silently train every
    # out-of-range label toward class C-1 — poison the loss to NaN so the
    # config error is visible (jit cannot raise on traced values)
    bad = jnp.any(live & ((lab < 0) | (lab >= x.shape[-1])))
    picked = jnp.where(bad, jnp.float32(jnp.nan), picked)
    if ignore_label is not None:
        loss_sum = -jnp.sum(jnp.where(live, picked, 0.0))
        valid = jnp.sum(live)
    else:
        loss_sum = -jnp.sum(picked)
        valid = jnp.asarray(lab.size)
    outer = scores.shape[0]
    inner = lab.size // max(outer, 1)
    if normalization == "VALID":
        denom = jnp.maximum(valid.astype(jnp.float32), 1.0)
    elif normalization == "BATCH_SIZE":
        denom = jnp.float32(outer)
    elif normalization == "FULL":
        denom = jnp.float32(outer * inner)
    else:
        denom = jnp.float32(1.0)
    return loss_sum / denom


def _make_sum_over_n_loss(psum_axes, elem_fn, grad_fn, half=False):
    """Shared factory for the sum(elem)/N-normalised losses (sigmoid CE,
    euclidean) with psum'ed N under sharding."""
    psum_axes = tuple(psum_axes)

    def fwd(a, b):
        af = a.astype(jnp.float32)
        bf = b.astype(jnp.float32)
        s = jnp.sum(elem_fn(af, bf))
        n = jnp.asarray(float(a.shape[0]), jnp.float32)
        if psum_axes:
            s = jax.lax.psum(s, psum_axes)
            n = jax.lax.psum(n, psum_axes)
        scale = 0.5 if half else 1.0
        return scale * s / n, (af, bf, n)

    def bwd(res, g):
        af, bf, n = res
        d = grad_fn(af, bf) / n
        return g * d, -g * d if grad_fn is _euclid_grad else None

    @jax.custom_vjp
    def fn(a, b):
        return fwd(a, b)[0]
    fn.defvjp(fwd, bwd)
    return fn


def _euclid_grad(a, b):
    return a - b


_SCE_CACHE: dict = {}
_EUC_CACHE: dict = {}


def sigmoid_cross_entropy_loss(scores: jax.Array, targets: jax.Array) -> jax.Array:
    """SigmoidCrossEntropyLoss (sigmoid_cross_entropy_loss_layer.cpp):
    sum over all elements / batch size. Inside a `sharded_losses` context
    the batch size is psum'ed (shard_map)."""
    if _SHARDED_AXES:
        key = _SHARDED_AXES
        if key not in _SCE_CACHE:
            _SCE_CACHE[key] = _make_sum_over_n_loss(
                key, _sigmoid_ce_elem,
                lambda x, t: jax.nn.sigmoid(x) - t)
        return _SCE_CACHE[key](scores, targets)
    x = scores.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    return jnp.sum(_sigmoid_ce_elem(x, t)) / x.shape[0]


def euclidean_loss(a: jax.Array, b: jax.Array) -> jax.Array:
    """EuclideanLoss: 0.5 * sum((a-b)^2) / N. Inside a `sharded_losses`
    context N is psum'ed (shard_map)."""
    if _SHARDED_AXES:
        key = _SHARDED_AXES
        if key not in _EUC_CACHE:
            _EUC_CACHE[key] = _make_sum_over_n_loss(
                key, lambda x, t: (x - t) ** 2, _euclid_grad, half=True)
        return _EUC_CACHE[key](a, b)
    d = a.astype(jnp.float32) - b.astype(jnp.float32)
    return 0.5 * jnp.sum(d * d) / a.shape[0]


def hinge_loss(scores: jax.Array, labels: jax.Array, *, norm: str = "L1") -> jax.Array:
    """HingeLoss (hinge_loss_layer.cpp): one-vs-all margin on (N, C) scores."""
    x = scores.astype(jnp.float32).reshape(scores.shape[0], -1)
    n, c = x.shape
    lab = labels.astype(jnp.int32).reshape(-1)
    sign = jnp.where(jax.nn.one_hot(lab, c, dtype=jnp.float32) > 0, -1.0, 1.0)
    margins = jnp.maximum(0.0, 1.0 + sign * x)
    if norm == "L2":
        return jnp.sum(margins * margins) / n
    return jnp.sum(margins) / n


def contrastive_loss(
    a: jax.Array, b: jax.Array, y: jax.Array, *, margin: float = 1.0,
    legacy_version: bool = False,
) -> jax.Array:
    """ContrastiveLoss (contrastive_loss_layer.cpp). a,b: (N, D); y: (N,)."""
    d = a.astype(jnp.float32) - b.astype(jnp.float32)
    dist_sq = jnp.sum(d * d, axis=1)
    yf = y.astype(jnp.float32).reshape(-1)
    if legacy_version:
        neg = jnp.maximum(margin - dist_sq, 0.0)
    else:
        neg = jnp.square(jnp.maximum(margin - jnp.sqrt(dist_sq + 1e-12), 0.0))
    return jnp.sum(yf * dist_sq + (1 - yf) * neg) / (2.0 * a.shape[0])


def infogain_loss(prob: jax.Array, labels: jax.Array, H: jax.Array) -> jax.Array:
    """InfogainLoss: -sum_k H[label, k] log(prob_k) / N.

    bottom[0] is PROBABILITIES, not logits — the reference layer takes the
    output of a preceding Softmax and clamps at kLOG_THRESHOLD=1e-20
    (infogain_loss_layer.cpp:59-67, loss_layer.hpp:12); applying a softmax
    here would double-softmax the canonical Softmax->InfogainLoss net."""
    p = jnp.maximum(prob.astype(jnp.float32), jnp.float32(1e-20))
    rows = jnp.take(H.astype(jnp.float32), labels.astype(jnp.int32), axis=0)
    return -jnp.sum(rows * jnp.log(p)) / prob.shape[0]


def multinomial_logistic_loss(prob: jax.Array, labels: jax.Array) -> jax.Array:
    tiny = jnp.float32(1.175494e-38)
    picked = jnp.take_along_axis(prob.astype(jnp.float32),
                                 labels.astype(jnp.int32)[..., None], axis=-1)
    return -jnp.sum(jnp.log(jnp.maximum(picked, tiny))) / prob.shape[0]


def accuracy(scores: jax.Array, labels: jax.Array, *, top_k: int = 1,
             ignore_label: Optional[int] = None, per_class: bool = False):
    """Accuracy layer (accuracy_layer.cpp): top-k over axis -1 (the builder
    moves the class axis last for `axis:` support). With per_class=True also
    returns the per-class accuracy vector (the optional second top,
    accuracy_layer.cpp:96-103: correct_c / count_c, 0 where a class never
    appears among the live labels)."""
    lab = labels.astype(jnp.int32)
    topk = jax.lax.top_k(scores, top_k)[1]
    hit = jnp.any(topk == lab[..., None], axis=-1)
    live = (lab != ignore_label) if ignore_label is not None \
        else jnp.ones(lab.shape, bool)
    total = jnp.sum(jnp.where(live, hit, 0)) / jnp.maximum(jnp.sum(live), 1)
    if not per_class:
        return total
    c = scores.shape[-1]
    onehot = jax.nn.one_hot(lab.reshape(-1), c, dtype=jnp.float32)
    livef = live.reshape(-1, 1).astype(jnp.float32)
    counts = jnp.sum(onehot * livef, axis=0)
    correct = jnp.sum(onehot * livef * hit.reshape(-1, 1), axis=0)
    return total, jnp.where(counts == 0, 0.0, correct / jnp.maximum(counts, 1))
