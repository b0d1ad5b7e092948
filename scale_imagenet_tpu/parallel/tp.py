"""Channel-group tensor parallelism for TTnet via shard_map.

The defining property of TT blocks — grouped convolutions whose channel
groups are fully independent — makes them embarrassingly tensor-parallel:
shard every channel-indexed axis blockwise over the 'model' mesh axis and
the *entire block stack runs with zero model-axis communication*:

* stem: input replicated, conv weight output-sharded -> activations land
  channel-sharded;
* heads: depthwise/grouped convs are channel-local; group boundaries align
  with shard boundaries whenever (p / n_model) % 16 == 0 (all reference
  configs at n_model <= 4);
* concat + channel interleave: a device's local interleave of its local
  head slices IS the contiguous global slice [d*4L, (d+1)*4L) of the
  interleaved tensor, so the fused block's 16-channel groups stay local;
* flatten is channel-major, so the flattened features are blockwise
  sharded, and the classifier's first matmul is row-parallel: one
  ``psum`` over 'model' — the only model collective in the network —
  after which the head runs replicated.

GSPMD cannot express this (its partitioner rejects grouped-conv feature
sharding); shard_map states it directly.  NB: vma checking must stay ON —
with ``check_vma=False`` jax transposes the classifier ``psum`` to another
psum, silently scaling every gradient (caught by the f64 equivalence
test).  Data parallelism composes on the
'data' axis: gradients are ``pmean``'d over it, and training BN moments
are also pmean'd over 'data' (synchronized BN — the reference's DDP used
per-process stats; eval numerics are identical either way).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.ttnet_imagenet import TTnetImageNetConfig, \
    ttnet_imagenet_features
from ..train.losses import masked_metric_sums


def local_config(cfg: TTnetImageNetConfig, n_model: int) \
        -> TTnetImageNetConfig:
    """The per-shard config: p/n channels everywhere."""
    p = cfg.p
    if p % n_model:
        raise ValueError(f"p={p} not divisible by model axis {n_model}")
    p_local = p // n_model
    min_group = 16 if cfg.variant == "small" else 4
    if p_local % min_group:
        raise ValueError(
            f"local width {p_local} breaks the {min_group}-channel group "
            f"alignment; use a smaller model axis")
    return dataclasses.replace(cfg, nfilter=p_local, tfilter=1)


def tp_param_specs(params) -> dict:
    """PartitionSpecs for the channel-sharded parameter tree."""
    def spec(path, leaf):
        names = [getattr(p, "key", None) for p in path]
        if "classifier" in names:
            if "lin1" in names and leaf.ndim == 2:
                # trailing None omitted: shard_map normalizes it away on
                # outputs, and P('model', None) != P('model') as a jit
                # cache key -> would retrace when outputs feed back in
                return P("model")           # row-parallel first matmul
            return P()                       # head replicated
        if leaf.ndim == 4:                   # conv HWIO: shard outputs
            return P(None, None, None, "model")
        if leaf.ndim == 1:                   # BN vectors follow channels
            return P("model")
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params_tp(params, mesh: Mesh):
    specs = tp_param_specs(params)
    return jax.tree.map(
        lambda leaf, s: jax.device_put(leaf, NamedSharding(mesh, s)),
        params, specs)


def _tp_classifier(params, state, feats, training):
    """Row-parallel classifier: local partial matmul -> the one model
    collective -> replicated head.  Returns (logits, bn_state)."""
    partial_y = feats @ params["classifier"]["lin1"]["weight"]
    y = jax.lax.psum(partial_y, "model")
    # lin1 inits bias-free; BN folding (--fold_bn) adds one — it is
    # replicated over 'model', so it adds ONCE after the psum
    b = params["classifier"]["lin1"].get("bias")
    if b is not None:
        y = y + b
    from ..layers.norm import batch_norm
    from ..ops.poly import polynome_act

    y, bn_s = batch_norm(params["classifier"]["bn"],
                         state["classifier"]["bn"], y, training)
    y = polynome_act(y)
    logits = y @ params["classifier"]["lin2"]["weight"] \
        + params["classifier"]["lin2"]["bias"]
    return logits, bn_s


def _tp_masked_metrics(logits, labels):
    """Masked metric sums psum'd over 'data' (labels < 0 = pad rows)."""
    nll_sum, (c1, c5), n_local = masked_metric_sums(logits, labels)
    n = jax.lax.psum(n_local, "data")
    denom = jnp.maximum(n, 1.0)
    return {
        "loss": jax.lax.psum(nll_sum, "data") / denom,
        "top1": 100.0 * jax.lax.psum(c1, "data") / denom,
        "top5": 100.0 * jax.lax.psum(c5, "data") / denom,
        "n": n,
    }


def _forward_local(params, state, lcfg, x, training, key):
    """Per-shard forward: local feature stack + row-parallel classifier."""
    feats, new_state = ttnet_imagenet_features(params, state, lcfg, x,
                                               training=training, key=key)
    logits, bn_s = _tp_classifier(params, state, feats, training)
    new_state["classifier"] = {"bn": bn_s}
    return logits, new_state


def make_tp_eval_step(model, mesh: Mesh, normalize=None):
    """shard_map'd eval step; params must be sharded via shard_params_tp
    and batches sharded over 'data'.  ``normalize``: on-device uint8
    normalization for the shard pipeline (train.steps.make_input_pipeline)."""
    from ..train.steps import make_input_pipeline

    lcfg = local_config(model.config, mesh.shape["model"])
    prepare = make_input_pipeline(normalize)

    def step(params, state, images, labels):
        images, _ = prepare(images)
        logits, _ = _forward_local(params, state, lcfg, images,
                                   training=False, key=None)
        # logits replicated over 'model'; labels < 0 mark pad rows of the
        # padded final batch — sum the masked per-shard sums over 'data'
        # and divide once, so short-tail shards weight correctly
        return _tp_masked_metrics(logits, labels)

    # specs depend on the param tree structure, so the shard_map+jit is
    # built once on first call and cached — rebuilding it per call would
    # make every step a fresh closure and retrace/recompile each time
    jitted = None

    def eval_step(params, state, images, labels):
        nonlocal jitted
        if jitted is None:
            pspecs = (tp_param_specs(params), tp_param_specs(state))
            mapped = jax.shard_map(
                step, mesh=mesh,
                in_specs=(pspecs[0], pspecs[1],
                          P("data", None, None, None), P("data")),
                out_specs=P(),
            )
            jitted = jax.jit(mapped)
            eval_step._jitted = jitted   # exposed for cache-hit tests
        return jitted(params, state, images, labels)

    return eval_step


def lut_tp_specs(luts):
    """PartitionSpecs for a compiled-LUT pytree (list of MultiHeadLUT):
    every leaf shards on its channel-group axis — table ``(out, 2^n)``
    and packed ``(G, F, S, 128)`` on axis 0, index weights
    ``(kh, kw, ci, G)`` on the output-group axis — so each device holds
    exactly its channel slice's tables (the same slice its conv-TP
    params would produce)."""
    def spec(path, leaf):
        # BlockLUT flatten order: 0=table, 1=index_w, 2=packed
        slot = path[-1].key
        if slot == 1:
            return P(None, None, None, "model")
        return P("model")

    return jax.tree_util.tree_map_with_path(spec, luts)


def shard_luts_tp(luts, mesh: Mesh):
    specs = lut_tp_specs(luts)
    return jax.tree.map(
        lambda leaf, s: jax.device_put(leaf, NamedSharding(mesh, s)),
        luts, specs)


def _local_luts(luts, lcfg):
    """Rebuild the LUT pytree with the LOCAL (per-shard) static configs:
    inside shard_map the leaves are already the local channel slices, but
    the static cfg aux data still describes the global widths."""
    from ..compile.lut_eval import BlockLUT, MultiHeadLUT

    out = []
    for lut, bcfg in zip(luts, lcfg.block_configs()):
        heads = {i: BlockLUT(hcfg, lut.heads[i].table,
                             lut.heads[i].index_w, lut.heads[i].packed)
                 for i, hcfg in bcfg.head_cfgs().items()}
        convf = None
        if lut.convf is not None:
            convf = BlockLUT(bcfg.convf_cfg(), lut.convf.table,
                             lut.convf.index_w, lut.convf.packed)
        out.append(MultiHeadLUT(bcfg, heads, convf))
    return out


def make_tp_lut_eval_step(model, mesh: Mesh, normalize=None):
    """Channel-group tensor-parallel COMPILED-LUT serving (shard_map):
    each device gathers its channel slice's truth tables; the only model
    collective is the classifier's row-parallel psum — identical
    communication structure to conv TP, so compiled-network serving
    scales over the mesh exactly like the float model.

    ``params`` must be ``{"model": shard_params_tp(...), "luts":
    shard_luts_tp(...)}``."""
    from ..compile.lut_eval import lut_ttnet_features
    from ..train.steps import make_input_pipeline

    lcfg = local_config(model.config, mesh.shape["model"])
    prepare = make_input_pipeline(normalize)

    def step(params, state, images, labels):
        images, _ = prepare(images)
        luts_local = _local_luts(params["luts"], lcfg)
        feats = lut_ttnet_features(luts_local, params["model"], state,
                                   lcfg, images.astype(jnp.float32))
        logits, _ = _tp_classifier(params["model"], state, feats,
                                   training=False)
        return _tp_masked_metrics(logits, labels)

    jitted = None

    def eval_step(params, state, images, labels):
        nonlocal jitted
        if jitted is None:
            pspecs = {"model": tp_param_specs(params["model"]),
                      "luts": lut_tp_specs(params["luts"])}
            mapped = jax.shard_map(
                step, mesh=mesh,
                in_specs=(pspecs, tp_param_specs(state),
                          P("data", None, None, None), P("data")),
                out_specs=P(),
            )
            jitted = jax.jit(mapped)
            eval_step._jitted = jitted
        return jitted(params, state, images, labels)

    return eval_step


def make_tp_train_step(model, tx, mesh: Mesh, normalize=None,
                       augment=False, accum: int = 1):
    """Channel-group tensor-parallel TRAINING step (shard_map).

    Params stay channel-sharded over 'model' exactly as in TP eval — the
    optimizer update runs shard-locally on each device's parameter slice.
    Collectives: the classifier psum over 'model' (forward), its transpose
    (backward, inserted by AD), and a gradient/metric/BN-state pmean over
    'data'.  Channel-sharded gradients need no model-axis reduction (each
    shard's slice is touched only by its own compute); replicated
    classifier-head grads are identical across 'model' by construction.

    ``normalize``/``augment``: the on-device input stage, same contract
    as ``make_train_step`` (train/steps.py).  Augmentation randomness is
    folded by the 'data' axis index ONLY — per-data-shard independence
    (matching the dp step), but IDENTICAL across 'model' shards, which
    all see the same images and must crop/flip them identically.

    ``accum``: gradient accumulation, same semantics as the dp step —
    each data shard's local batch executes as ``accum`` sequential
    microbatches under ``lax.scan`` (one resident activation set),
    gradients/metrics averaged, ONE shard-local optimizer update.
    """
    from ..train.steps import TrainState, make_input_pipeline
    from ..train.losses import cross_entropy as _ce, accuracy_topk as _topk

    lcfg = local_config(model.config, mesh.shape["model"])
    prepare = make_input_pipeline(
        normalize, augment,
        image_size=getattr(model.config, "image_size", 224))

    def loss_fn(params, state, images, labels, key):
        images, key = prepare(images, key)
        logits, new_state = _forward_local(params, state, lcfg, images,
                                           training=True, key=key)
        return _ce(logits, labels), (new_state, logits)

    def grad_phase(params, model_state, images, labels, key):
        """Gradients + metrics at FIXED params; microbatched under scan
        when accum > 1 (mirrors train/steps.py::grad_phase)."""
        if accum == 1:
            (loss, (new_state, logits)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, model_state, images,
                                       labels, key)
            top1, top5 = _topk(logits, labels, topk=(1, 5))
            return grads, new_state, loss, top1, top5

        mb = images.shape[0] // accum
        mb_im = images.reshape((accum, mb) + images.shape[1:])
        mb_lb = labels.reshape(accum, mb)

        def one(st, im, lb, i):
            k = None if key is None else jax.random.fold_in(key, i)
            (loss, (st, logits)), g = jax.value_and_grad(
                loss_fn, has_aux=True)(params, st, im, lb, k)
            t1, t5 = _topk(logits, lb, topk=(1, 5))
            return g, st, loss, t1, t5

        def body(carry, xs):
            g_acc, st, l_acc, t1_acc, t5_acc, i = carry
            im, lb = xs
            g, st, loss, t1, t5 = one(st, im, lb, i)
            g_acc = jax.tree.map(jnp.add, g_acc, g)
            return (g_acc, st, l_acc + loss, t1_acc + t1, t5_acc + t5,
                    i + 1), None

        # Seed the carry with microbatch 0's REAL outputs: under
        # shard_map the carry must match the body outputs in both dtype
        # (f64 parity tests) and varying-axes (channel-shard grads vary
        # over 'model', replicated classifier grads must NOT) —
        # zeros_like + pcast cannot reproduce that mix; the first body
        # evaluation produces it by construction.
        g0, st0, l0, t10, t50 = one(model_state, mb_im[0], mb_lb[0],
                                    jnp.zeros((), jnp.int32))
        init = (g0, st0, l0, t10, t50, jnp.ones((), jnp.int32))
        (grads, new_state, loss, top1, top5, _), _ = jax.lax.scan(
            body, init, (mb_im[1:], mb_lb[1:]))
        inv = 1.0 / accum
        scale = lambda t: jax.tree.map(lambda a: a * inv, t)  # noqa: E731
        return scale(grads), new_state, loss * inv, top1 * inv, \
            top5 * inv

    def step(ts, images, labels, key):
        if key is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index("data"))
        grads, new_state, loss, top1, top5 = grad_phase(
            ts.params, ts.model_state, images, labels, key)
        grads = jax.lax.pmean(grads, "data")
        new_state = jax.lax.pmean(new_state, "data")
        loss = jax.lax.pmean(loss, "data")
        updates, new_opt = tx.update(grads, ts.opt_state, ts.params)
        new_params = jax.tree.map(lambda p, u: p + u, ts.params, updates)
        metrics = {"loss": loss,
                   "top1": jax.lax.pmean(top1, "data"),
                   "top5": jax.lax.pmean(top5, "data")}
        return TrainState(new_params, new_state, new_opt, ts.step + 1), \
            metrics

    # build shard_map+jit once on first call (specs need the tree
    # structure); caching the jitted callable is what makes step 2+ a
    # cache hit instead of a full retrace/recompile
    jitted = None

    def train_step(ts, images, labels, key):
        nonlocal jitted
        if jitted is None:
            pspecs = TrainState(
                params=tp_param_specs(ts.params),
                model_state=tp_param_specs(ts.model_state),
                opt_state=_opt_specs(ts.opt_state, ts.params),
                step=P(),
            )
            mapped = jax.shard_map(
                step, mesh=mesh,
                in_specs=(pspecs, P("data", None, None, None), P("data"),
                          P()),
                out_specs=(pspecs, P()),
            )
            jitted = jax.jit(mapped, donate_argnums=(0,))
            train_step._jitted = jitted  # exposed for cache-hit tests
        return jitted(ts, images, labels, key)

    return train_step


def shard_train_state_tp(ts, mesh: Mesh):
    """Place every TrainState leaf with the exact shardings the TP train
    step produces, so the FIRST call already has the steady-state jit
    signature (otherwise uncommitted host scalars like ``ts.step`` retrace
    the step once when the sharded outputs are fed back in).

    Leaves are COPIED, not aliased: a replicated device_put reuses the
    source buffer on its home device, and the TP train step DONATES its
    TrainState — an aliased placement would let that donation delete the
    caller's original arrays out from under later users."""
    from ..train.steps import TrainState

    specs = TrainState(
        params=tp_param_specs(ts.params),
        model_state=tp_param_specs(ts.model_state),
        opt_state=_opt_specs(ts.opt_state, ts.params),
        step=P(),
    )
    return jax.tree.map(
        lambda leaf, s: jax.device_put(jnp.array(leaf),
                                       NamedSharding(mesh, s)),
        ts, specs)


def _opt_specs(opt_state, params):
    """Optimizer-state specs: momentum buffers mirror the param tree specs;
    everything else replicated."""
    pspecs = tp_param_specs(params)

    # walk: any subtree structurally equal to params (e.g. optax's
    # momentum trace, the params-EMA keeper's {"ema": params} dict) gets
    # the param specs; everything else replicates
    def map_state(st):
        try:
            if jax.tree_util.tree_structure(st) == \
                    jax.tree_util.tree_structure(params):
                return pspecs
        except Exception:
            pass
        if hasattr(st, "_fields"):  # NamedTuple (optax states)
            return type(st)(*(map_state(getattr(st, f))
                              for f in st._fields))
        if isinstance(st, tuple):
            return tuple(map_state(s) for s in st)
        if isinstance(st, dict):
            return {k: map_state(v) for k, v in st.items()}
        return jax.tree.map(lambda _: P(), st)

    return map_state(opt_state)
