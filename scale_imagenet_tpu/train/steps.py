"""Sharded train/eval step factories.

One jitted SPMD program per step: batch sharded over the 'data' mesh axis,
params sharded per the TTnet channel-group rules over 'model'.  Gradient
allreduce (the reference's DDP NCCL allreduce, main.py:181) is implicit:
params are replicated along 'data', so XLA inserts the psum.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..parallel.sharding import batch_sharding, replicate, \
    spatial_sharding, ttnet_param_shardings
from .losses import accuracy_topk, cross_entropy, masked_metric_sums


class TrainState(NamedTuple):
    params: Any
    model_state: Any     # BN running stats
    opt_state: Any
    step: jnp.ndarray


def make_input_pipeline(normalize=None, augment=False,
                        image_size: int = 224, dtype=jnp.float32):
    """The on-device input stage shared by every step factory: optional
    uint8 normalization (the shard pipeline: u8 -> f32/255 -> (x-m)/s,
    exact) and optional augmentation.  Returns ``prepare(images, key) ->
    (images, key)`` — ``key`` is split when augmentation consumes
    randomness so callers pass the remainder onward.

    ``augment``: False | True (random horizontal flip — the fast
    approximation for same-size shards) | "full" (RandomResizedCrop +
    flip + ColorJitter from PRE-CROP shards, e.g. 256^2 -> 224^2; the
    reference imgnet recipe, train/augment.py)."""
    if normalize is not None:
        _mean = jnp.asarray(normalize[0], jnp.float32)
        _std = jnp.asarray(normalize[1], jnp.float32)

    if augment == "full":
        from .augment import make_rrc_flip_jitter

        full_aug = make_rrc_flip_jitter(out_size=image_size,
                                        normalize=normalize, dtype=dtype)

        def prepare(images, key=None):
            key, akey = jax.random.split(key)
            return full_aug(images, akey), key

        return prepare

    def prepare(images, key=None):
        if normalize is not None:
            images = (images.astype(jnp.float32) / 255.0 - _mean) / _std
        if augment:
            key, fkey = jax.random.split(key)
            flip = jax.random.bernoulli(fkey, 0.5, (images.shape[0],))
            images = jnp.where(flip[:, None, None, None],
                               images[:, :, ::-1, :], images)
        return images, key

    return prepare


def _pixel_ball(eps: float, stats):
    """Map an L-inf ball of ``eps`` in PIXEL ([0, 1]) units through input
    normalization ``stats=(mean, std)``: per-channel eps/std with clip
    bounds ((0-mean)/std, (1-mean)/std).  ``stats=None`` = raw [0, 1]."""
    if stats is None:
        return eps, 0.0, 1.0
    mean = jnp.asarray(stats[0], jnp.float32)
    std = jnp.asarray(stats[1], jnp.float32)
    return eps / std, (0.0 - mean) / std, (1.0 - mean) / std


def make_eval_step(model, mesh: Mesh | None = None, key=None,
                   normalize=None, certify_eps: float = 0.0,
                   certify_stats=None, attack=None, spatial=False):
    """Returns ``eval_step(params, state, images, labels) -> metrics dict``.

    ``spatial``: shard the image HEIGHT over the mesh's 'model' axis in
    addition to batch-over-'data' (spatial partitioning) — GSPMD inserts
    the conv/pool halo exchanges, params stay replicated along 'model'.
    Numerically exact vs the unsharded step.

    ``certify_eps``: when > 0, the step also computes the per-image
    robustness certificate via the model's ``interval_logits`` hook (sound
    logit bounds under an L-inf eps-ball of ``certify_eps`` in PIXEL
    ([0, 1]) units) and returns a ``cert`` metric — the certified top-1 %
    (prediction correct AND provably stable).  ``certify_stats``: the
    ``(mean, std)`` the inputs were normalized with (shared by the attack
    ball); None means inputs are raw [0, 1].

    ``attack``: optional ``{"kind": "fgsm"|"pgd", "eps": pixel-units,
    "steps": int, "step_size": float|None}`` — adds an ``adv`` metric,
    the top-1 % under the white-box attack (robust/attack.py).  With both
    set, the step reports the full sandwich cert <= adv <= top1.

    ``key``: optional PRNG key for models whose eval forward is stochastic
    (noisy dead-zone Heaviside with T != 0, e.g. tt_certif) — the reference
    applies that noise at eval time too, drawing FRESH randomness per
    forward (torch's global RNG advances every batch).  We mirror that by
    folding a per-call counter into ``key``, so each batch sees a distinct
    noise pattern while the jitted program stays cached.

    ``normalize``: optional ``(mean, std)`` (per-channel, [0,1] scale) to
    apply on-device — the pre-decoded shard pipeline (data/shards.py)
    streams uint8 and normalizes inside the jitted step, which is exact
    (u8 -> f32 loses nothing) and quarters host->device traffic.
    """
    prepare = make_input_pipeline(normalize)

    if certify_eps > 0:
        if getattr(model, "interval_logits", None) is None:
            raise ValueError(
                f"{model.name} has no interval_logits hook — certified "
                "eval supports the AbstractTensor families (tt_certif, "
                "cifar10lownoise, model_general)")
        _ceps, _clo, _chi = _pixel_ball(certify_eps, certify_stats)
    if attack is not None:
        _aeps, _alo, _ahi = _pixel_ball(attack["eps"], certify_stats)
        _astep = None
        if attack.get("step_size"):
            _astep, _, _ = _pixel_ball(attack["step_size"], certify_stats)

    def step_fn(params, state, images, labels, step_key):
        images, _ = prepare(images)
        # serve at the params' precision (bf16 serving casts params only;
        # lax.conv requires matching dtypes).  First FLOATING leaf — the
        # LUT serving pytree leads with integer tables.
        pdt = next((a.dtype for a in jax.tree.leaves(params)
                    if jnp.issubdtype(a.dtype, jnp.floating)), None)
        if pdt is not None and images.dtype != pdt:
            images = images.astype(pdt)
        logits, _ = model.apply(params, state, images, training=False,
                                key=step_key)
        # labels < 0 mark pad rows in the (padded) final short batch —
        # metrics count valid rows only, so every val image is scored
        # without a second compiled program for the tail
        nll_sum, (c1, c5), n = masked_metric_sums(logits, labels)
        denom = jnp.maximum(n, 1.0)
        out = {"loss": nll_sum / denom, "top1": 100.0 * c1 / denom,
               "top5": 100.0 * c5 / denom, "n": n}
        if certify_eps > 0:
            from ..robust.interval import certified_mask

            iv = model.interval_logits(params, state, images, _ceps,
                                       _clo, _chi)
            preds = jnp.argmax(logits, axis=-1)
            cert = certified_mask(iv, preds)
            ok = (labels >= 0) & cert & (preds == labels)
            out["cert"] = 100.0 * jnp.sum(ok.astype(jnp.float32)) / denom
        if attack is not None:
            from ..robust.attack import fgsm_attack, pgd_attack

            if attack["kind"] == "fgsm":
                adv = fgsm_attack(model.apply, params, state, images,
                                  labels, _aeps, _alo, _ahi, key=step_key)
            else:
                adv = pgd_attack(model.apply, params, state, images,
                                 labels, _aeps,
                                 steps=attack.get("steps", 10),
                                 step_size=_astep,
                                 lo=_alo, hi=_ahi, key=step_key)
            adv_logits, _ = model.apply(params, state, adv,
                                        training=False, key=step_key)
            _, (a1, _a5), _ = masked_metric_sums(adv_logits, labels)
            out["adv"] = 100.0 * a1 / denom
        return out

    if mesh is None:
        if spatial:
            raise ValueError("spatial partitioning needs a mesh")
        jitted = jax.jit(step_fn)
    else:
        img_sharding = spatial_sharding(mesh) if spatial \
            else batch_sharding(mesh)
        jitted = jax.jit(
            step_fn,
            in_shardings=(None, None, img_sharding,
                          batch_sharding(mesh, ndim=1), None),
            out_shardings=replicate(mesh),
        )

    if key is None:
        def eval_step(params, state, images, labels):
            return jitted(params, state, images, labels, None)
    else:
        from itertools import count
        counter = count()

        def eval_step(params, state, images, labels):
            return jitted(params, state, images, labels,
                          jax.random.fold_in(key, next(counter)))

    eval_step._jitted = jitted
    return eval_step


def make_train_step(model, tx, mesh: Mesh | None = None,
                    amp: bool = False, normalize=None,
                    augment=False, accum: int = 1,
                    label_smooth: float = 0.0):
    """Returns ``train_step(ts: TrainState, images, labels, key)``.

    ``accum``: gradient accumulation — the step's batch executes as
    ``accum`` sequential microbatches under ``lax.scan`` (one resident
    activation set; the HBM lever for batches that don't fit), gradients
    and metrics averaged, ONE optimizer update.  BN semantics match
    sequential small batches: per-microbatch statistics, running stats
    threaded through the scan.

    The multi-device version runs under shard_map — NOT GSPMD: XLA's SPMD
    partitioner computes doubled weight gradients for grouped convolutions
    when the mesh has a second (model) axis (verified with a minimal
    repro: dense convs fine, grouped convs exactly n_model x).  shard_map
    states the data-parallel semantics explicitly: per-shard forward/
    backward on the local batch (per-process BN statistics — exactly the
    reference's DDP behavior), then ``pmean`` of gradients and metrics
    over 'data'; params replicated over both axes.

    ``amp``: bfloat16 mixed precision — forward/backward run with params,
    BN state and activations cast to bf16; gradients flow back to the f32
    master params through the cast (so the SGD/momentum update stays
    f32), the loss is computed on f32 logits, and the returned BN running
    stats are re-cast into the f32 carriers.  bf16 has ~3 decimal digits;
    the BN EMA is a contraction toward current batch stats, so stat drift
    stays bounded at bf16 rounding (~0.4%) rather than accumulating.

    ``normalize``: optional ``(mean, std)`` — uint8 batches (the shard
    pipeline) normalize on-device.  ``augment``: False | True (random
    flip) | "full" (RandomResizedCrop + flip + ColorJitter from pre-crop
    shards — the reference imgnet recipe, train/augment.py).
    """
    image_size = getattr(model.config, "image_size", 224)
    prepare = make_input_pipeline(
        normalize, augment, image_size=image_size,
        dtype=jnp.bfloat16 if amp else jnp.float32)

    def loss_fn(params, state, images, labels, key):
        images, key = prepare(images, key)
        if amp:
            from ..utils.misc import cast_floating

            fwd_p = cast_floating(params)
            fwd_s = cast_floating(state)
            images = images.astype(jnp.bfloat16)
        else:
            fwd_p, fwd_s = params, state
        logits, new_state = model.apply(fwd_p, fwd_s, images,
                                        training=True, key=key)
        if amp:
            logits = logits.astype(jnp.float32)
            new_state = jax.tree.map(lambda a, b: b.astype(a.dtype),
                                     state, new_state)
        loss = cross_entropy(logits, labels, smoothing=label_smooth)
        return loss, (new_state, logits)

    def grad_phase(params, model_state, images, labels, key):
        """Gradients + metrics at FIXED params; microbatched when
        accum > 1 (grads/metrics averaged, BN state threaded)."""
        if accum == 1:
            (loss, (new_state, logits)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, model_state, images,
                                       labels, key)
            top1, top5 = accuracy_topk(logits, labels, topk=(1, 5))
            return grads, new_state, loss, top1, top5

        mb = images.shape[0] // accum
        mb_im = images.reshape((accum, mb) + images.shape[1:])
        mb_lb = labels.reshape(accum, mb)

        def one(st, im, lb, i):
            k = None if key is None else jax.random.fold_in(key, i)
            (loss, (st, logits)), g = jax.value_and_grad(
                loss_fn, has_aux=True)(params, st, im, lb, k)
            t1, t5 = accuracy_topk(logits, lb, topk=(1, 5))
            return g, st, loss, t1, t5

        def body(carry, xs):
            g_acc, st, l_acc, t1_acc, t5_acc, i = carry
            im, lb = xs
            g, st, loss, t1, t5 = one(st, im, lb, i)
            g_acc = jax.tree.map(jnp.add, g_acc, g)
            return (g_acc, st, l_acc + loss, t1_acc + t1, t5_acc + t5,
                    i + 1), None

        # Seed the carry with microbatch 0's REAL outputs: the carry must
        # match the body outputs in both dtype (f64 parity tests ran the
        # old f32-zeros carry into a scan type error) and, under
        # shard_map, varying-axes — the first body evaluation produces
        # both by construction.
        g0, st0, l0, t10, t50 = one(model_state, mb_im[0], mb_lb[0],
                                    jnp.zeros((), jnp.int32))
        init = (g0, st0, l0, t10, t50, jnp.ones((), jnp.int32))
        (grads, new_state, loss, top1, top5, _), _ = jax.lax.scan(
            body, init, (mb_im[1:], mb_lb[1:]))
        inv = 1.0 / accum
        scale = lambda t: jax.tree.map(lambda a: a * inv, t)  # noqa: E731
        return scale(grads), new_state, loss * inv, top1 * inv, \
            top5 * inv

    def train_step(ts: TrainState, images, labels, key,
                   axis: str | None = None):
        if axis is not None:
            # independent per-shard randomness (flip masks, stochastic
            # activations) — the reference's DDP processes each own their
            # torch RNG; a replicated key would correlate augmentation
            # across the global batch
            key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        grads, new_state, loss, top1, top5 = grad_phase(
            ts.params, ts.model_state, images, labels, key)
        if axis is not None:
            grads = jax.lax.pmean(grads, axis)
            loss = jax.lax.pmean(loss, axis)
            top1 = jax.lax.pmean(top1, axis)
            top5 = jax.lax.pmean(top5, axis)
            # keep BN running stats identical on every shard (DDP keeps
            # per-process stats; averaging them is strictly safer)
            new_state = jax.lax.pmean(new_state, axis)
        updates, new_opt = tx.update(grads, ts.opt_state, ts.params)
        new_params = jax.tree.map(lambda p, u: p + u, ts.params, updates)
        metrics = {"loss": loss, "top1": top1, "top5": top5}
        return TrainState(new_params, new_state, new_opt, ts.step + 1), \
            metrics

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,))

    from functools import partial

    mapped = jax.shard_map(
        partial(train_step, axis="data"),
        mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(), TrainState(0, 0, 0, 0)),
                  P("data", None, None, None), P("data"), P()),
        out_specs=(jax.tree.map(lambda _: P(), TrainState(0, 0, 0, 0)),
                   P()),
    )
    return jax.jit(mapped, donate_argnums=(0,))


def make_robust_train_step(model, tx, eps: float, coeff: float,
                           mesh: Mesh | None = None, normalize=None,
                           augment: bool = False, input_bounds=None,
                           abstract_eps: float = 0.0,
                           abstract_coeff: float = 0.0,
                           bias_coeff: float = 0.0,
                           bias_thresh: float = 0.0):
    """Training step with the reference's robustness losses, composable:

    * ``eps/coeff`` — the multi-sample activation-stability loss
      (CE + coeff * rsloss, netbin.py:710-724).  The natural batch
      doubles as its own adversarial sample; plug in an attack upstream
      for adversarial training.
    * ``abstract_eps/abstract_coeff`` — the interval-arithmetic
      stabilization loss (compute_act_stabilizing_loss_abstract,
      netbin.py:726-738), propagating the eps-ball through the features
      by abstract interpretation.  Requires a model with an
      ``interval_loss`` hook (the cifar10lownoise robust family).
    * ``bias_coeff/bias_thresh`` — BiasRegularizer ("cardinality bound
      decay", netbin.py:786-864) over every ``stats_bn`` forward's
      effective (scale, bias), collected trace-time.

    ``normalize``/``augment``: see make_train_step (the shard pipeline).

    ``input_bounds``: (min, max) of the images as the model sees them.
    The reference's [0,1] default is for its bare-ToTensor datasets
    (netbin.py:713); NORMALIZED images span ~[-2.1, 2.6] and clamping
    them to [0,1] corrupts the eps-ball samples.  When ``normalize`` is
    given the per-channel bounds are derived automatically; callers
    feeding host-normalized data must pass theirs.
    """
    from ..robust.collect import multi_sample_forward
    from ..robust.regularizer import bias_regularizer_loss, \
        bn_internals_collector

    if abstract_coeff > 0 and model.interval_loss is None:
        raise ValueError(
            f"model {model.name} has no interval-arithmetic forward "
            "(the reference propagates AbstractTensor only through the "
            "cifar10lownoise family); drop --abstract_coeff")

    prepare = make_input_pipeline(
        normalize, augment,
        image_size=getattr(model.config, "image_size", 224))
    if normalize is not None:
        _m = jnp.asarray(normalize[0], jnp.float32)
        _s = jnp.asarray(normalize[1], jnp.float32)
        in_lo, in_hi = (0.0 - _m) / _s, (1.0 - _m) / _s
    elif input_bounds is not None:
        in_lo = jnp.asarray(input_bounds[0], jnp.float32)
        in_hi = jnp.asarray(input_bounds[1], jnp.float32)
    else:
        in_lo, in_hi = 0.0, 1.0

    def loss_fn(params, state, images, labels, key):
        images, key = prepare(images, key)
        with bn_internals_collector() as bn_c:
            if eps > 0:
                # BN state comes from the packed (3N) forward, exactly
                # like the reference (its training forward IS
                # forward_with_multi_sample) — no second natural forward
                logits, sloss, new_state = multi_sample_forward(
                    model, params, state, images, images, eps, key,
                    inputs_min=in_lo, inputs_max=in_hi, return_state=True)
            else:
                logits, new_state = model.apply(params, state, images,
                                                training=True, key=key)
                sloss = jnp.zeros(())
        loss = cross_entropy(logits, labels) + coeff * sloss
        if abstract_coeff > 0:
            aloss = model.interval_loss(params, state, images,
                                        abstract_eps, in_lo, in_hi)
            sloss = sloss + aloss   # reported together, like the
            loss = loss + abstract_coeff * aloss  # reference's .loss
        if bias_coeff > 0:
            if not bn_c.pairs:
                # trace-time: the forward never called stats_bn, so the
                # regularizer would silently contribute 0 forever — the
                # flag-honesty rule (no accepted flag may do nothing)
                raise ValueError(
                    f"model {model.name} has no BatchNormStatsCallbak-"
                    "style BN (stats_bn) in its forward; --bias_decay "
                    "regularizes those internals only (the reference's "
                    "BiasRegularizer target, netbin.py:786-864) — drop "
                    "the flag for this model")
            loss = loss + bias_regularizer_loss(bn_c.pairs, bias_coeff,
                                                bias_thresh)
        return loss, (new_state, logits, sloss)

    def train_step(ts: TrainState, images, labels, key,
                   axis: str | None = None):
        if axis is not None:
            # per-shard randomness — see make_train_step
            key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        (loss, (new_state, logits, sloss)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(ts.params, ts.model_state, images,
                                   labels, key)
        top1, top5 = accuracy_topk(logits, labels, topk=(1, 5))
        if axis is not None:
            grads = jax.lax.pmean(grads, axis)
            loss = jax.lax.pmean(loss, axis)
            sloss = jax.lax.pmean(sloss, axis)
            top1 = jax.lax.pmean(top1, axis)
            top5 = jax.lax.pmean(top5, axis)
            new_state = jax.lax.pmean(new_state, axis)
        updates, new_opt = tx.update(grads, ts.opt_state, ts.params)
        new_params = jax.tree.map(lambda p, u: p + u, ts.params, updates)
        metrics = {"loss": loss, "top1": top1, "top5": top5,
                   "stability_loss": sloss}
        return TrainState(new_params, new_state, new_opt, ts.step + 1), \
            metrics

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,))

    from functools import partial

    # shard_map, not GSPMD — see make_train_step's docstring (grouped-conv
    # gradient doubling under the SPMD partitioner)
    mapped = jax.shard_map(
        partial(train_step, axis="data"),
        mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(), TrainState(0, 0, 0, 0)),
                  P("data", None, None, None), P("data"), P()),
        out_specs=(jax.tree.map(lambda _: P(), TrainState(0, 0, 0, 0)),
                   P()),
    )
    return jax.jit(mapped, donate_argnums=(0,))
