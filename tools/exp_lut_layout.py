"""Experiment: idx-conv NCHW-output fusion + coarse transposes for the
LUT serving path, vs the current NHWC adapter.  TPU-only, writes nothing;
numbers land in results/PERF.md by hand."""

import os

import jax
import jax.numpy as jnp

from scale_imagenet_tpu.models import get_model
from scale_imagenet_tpu.compile import compile_ttnet_lut, lut_ttnet_apply
from scale_imagenet_tpu.compile.lut_eval import (
    _use_pallas, constant_pad2d)
from scale_imagenet_tpu.pallas.lut_gather import lut_gather

import importlib.util as _ilu

_spec = _ilu.spec_from_file_location(
    "bench_serve", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "bench_serve.py"))
_bs = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_bs)
in_graph_ms = _bs.in_graph_ms_n  # the shared tunnel-timing recipe


def block_apply_nhwc(lut, x_bits):
    """Current path (lut_block_tt_apply pallas branch, NHWC adapter)."""
    cfg = lut.cfg
    if cfg.padding != 0:
        x_bits = constant_pad2d(x_bits, cfg.padding)
    idx = jax.lax.conv_general_dilated(
        x_bits, lut.index_w.astype(x_bits.dtype),
        window_strides=(cfg.stride, cfg.stride), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=cfg.groupsici,
        preferred_element_type=jnp.float32).astype(jnp.int32)
    b, h, w, g = idx.shape
    f = lut.packed.shape[1]
    e = b * h * w
    rows = -(-e // 128)
    tile_rows = min(512, -(-rows // 8) * 8)
    idx_ge = idx.reshape(-1, g).T
    out = lut_gather(lut.packed, idx_ge, tile_rows=tile_rows,
                     out_dtype=x_bits.dtype)
    return jnp.transpose(out.reshape(g * f, -1)).reshape(b, h, w, g * f)


def block_apply_nchw(lut, x_bits):
    """Candidate: conv emits NCHW (transpose fused into the conv), gather
    input/output relayouts are coarse (HW-chunk) copies."""
    cfg = lut.cfg
    if cfg.padding != 0:
        x_bits = constant_pad2d(x_bits, cfg.padding)
    idx = jax.lax.conv_general_dilated(
        x_bits, lut.index_w.astype(x_bits.dtype),
        window_strides=(cfg.stride, cfg.stride), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NCHW"),
        feature_group_count=cfg.groupsici,
        preferred_element_type=jnp.float32).astype(jnp.int32)
    b, g, h, w = idx.shape
    f = lut.packed.shape[1]
    e = b * h * w
    rows = -(-e // 128)
    tile_rows = min(512, -(-rows // 8) * 8)
    idx_ge = idx.reshape(b, g, h * w).swapaxes(0, 1).reshape(g, e)
    out = lut_gather(lut.packed, idx_ge, tile_rows=tile_rows,
                     out_dtype=x_bits.dtype)        # (G, F, E) b-major
    out = out.reshape(g * f, b, h * w).transpose(1, 2, 0)
    return out.reshape(b, h, w, g * f)


def stage_fns(lut):
    """Prefix pipelines of the NHWC adapter, for the transpose-tax
    decomposition (VERDICT r3 #4): time each prefix in-graph; successive
    deltas = idx conv | input (E,G)->(G,E) transpose | gather walk |
    output (G,F,E)->NHWC transpose."""
    cfg = lut.cfg

    def conv_idx(x_bits):
        xb = constant_pad2d(x_bits, cfg.padding) if cfg.padding else x_bits
        return jax.lax.conv_general_dilated(
            xb, lut.index_w.astype(xb.dtype),
            window_strides=(cfg.stride, cfg.stride), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=cfg.groupsici,
            preferred_element_type=jnp.float32).astype(jnp.int32)

    def p1(x_bits):                       # conv only
        return conv_idx(x_bits)

    def p2(x_bits):                       # + input transpose
        idx = conv_idx(x_bits)
        return idx.reshape(-1, idx.shape[-1]).T

    def _gather(idx_ge, e):
        rows = -(-e // 128)
        tile_rows = min(512, -(-rows // 8) * 8)
        return lut_gather(lut.packed, idx_ge, tile_rows=tile_rows,
                          out_dtype=jnp.bfloat16)

    def p3(x_bits):                       # + gather (stay (G,F,E))
        idx = conv_idx(x_bits)
        g = idx.shape[-1]
        idx_ge = idx.reshape(-1, g).T
        return _gather(idx_ge, idx_ge.shape[1])

    def p4(x_bits):                       # + output transpose (full)
        idx = conv_idx(x_bits)
        b, h, w, g = idx.shape
        idx_ge = idx.reshape(-1, g).T
        out = _gather(idx_ge, idx_ge.shape[1])
        f = lut.packed.shape[1]
        return jnp.transpose(out.reshape(g * f, -1)).reshape(b, h, w,
                                                             g * f)

    return [("conv", p1), ("+inT", p2), ("+gather", p3), ("+outT", p4)]


def collect_stage_inputs(luts, params, state, cfg, x,
                         bits_dtype=jnp.bfloat16):
    """REAL intermediate bits for every LUT stage by replaying the LUT
    forward: per block, (head_input, convf_input) — the r4 tax probe fed
    every stage block0's input, which has the wrong channel count for
    convf and the wrong spatial extent for later blocks."""
    from scale_imagenet_tpu.compile.lut_eval import _bits, _convf_float, \
        lut_block_tt_apply, lut_multihead_apply
    from scale_imagenet_tpu.layers.norm import batch_norm
    from scale_imagenet_tpu.models.multihead import channel_interleave, \
        reconcile_heads
    from scale_imagenet_tpu.ops.binarize import binarize01_act
    from scale_imagenet_tpu.pallas.stem import space_to_depth_stem

    @jax.jit
    def run(params, state, x):
        h = space_to_depth_stem(x, params["stem_conv"]["weight"])
        h, _ = batch_norm(params["stem_bn"], state["stem_bn"], h, False)
        h = _bits(binarize01_act(h), bits_dtype)
        stages = []
        for i, lut in enumerate(luts):
            outs = {j: lut_block_tt_apply(lut.heads[j], h)
                    for j in sorted(lut.heads)}
            cat = reconcile_heads(
                outs, lut.cfg, h,
                lambda pooled, slot: (pooled >= 0.5).astype(h.dtype))
            if lut.cfg.fuse:
                cat_i = channel_interleave(cat, lut.cfg.cpt)
                stages.append((h, cat_i))
                h = lut_multihead_apply(
                    lut, h,
                    convf_float=_convf_float(lut, params, state,
                                             f"block{i}"))
            else:
                stages.append((h, None))
                h = cat
        return stages

    return jax.block_until_ready(run(params, state, x))


def transpose_tax(luts, params, state, cfg, x):
    print("--- transpose-tax decomposition (deltas between prefixes) ---",
          flush=True)
    stages = collect_stage_inputs(luts, params, state, cfg, x)
    for bi, blk in enumerate(luts):
        head_in, convf_in = stages[bi]
        named = [(f"head{i}", blk.heads[i], head_in)
                 for i in sorted(blk.heads)]
        if blk.convf is not None and blk.convf.packed is not None \
                and blk.convf.packed.dtype == jnp.int32:
            named.append(("convf", blk.convf, convf_in))
        for hname, lut, bits in named:
            parts = []
            prev_ms = 0.0
            for nm, fn in stage_fns(lut):
                ms = in_graph_ms(fn, bits)
                parts.append(f"{nm} {ms - prev_ms:6.2f}")
                prev_ms = ms
            print(f"block{bi} {hname} in={tuple(bits.shape)}: "
                  + " | ".join(parts)
                  + f"  (total {prev_ms:.2f} ms)", flush=True)


def main():
    model = get_model("ttnet_imagenet_small", nfilter=8, tfilter=8,
                      layers=1)
    params, state = model.init(jax.random.PRNGKey(0))
    cache = "/tmp/luts_flagship.npz"
    if os.path.exists(cache):
        from scale_imagenet_tpu.compile import load_luts
        print("loading cached LUTs...", flush=True)
        luts = load_luts(cache, model.config)
    else:
        from scale_imagenet_tpu.compile import save_luts
        print("compiling LUTs...", flush=True)
        luts = compile_ttnet_lut(params, state, model.config)
        save_luts(cache, luts)
    luts = jax.device_put(luts)

    B = 256
    key = jax.random.PRNGKey(1)
    # block0 input: 56x56x64 bits
    bits = (jax.random.uniform(key, (B, 56, 56, 64)) < 0.5)

    import sys
    if "--tax" in sys.argv:
        x = jax.random.uniform(key, (B, 224, 224, 3), jnp.float32)
        transpose_tax(luts, jax.device_put(params), jax.device_put(state),
                      model.config, jax.device_put(x))
        return

    if "--stub" in sys.argv:
        # isolate the gather walk exactly: time the FULL pipeline with
        # the Pallas gather replaced by a zeros stub (same shapes/dtypes,
        # no row walk) — total minus stub = the walk's true share
        import importlib

        # the pallas package re-exports the lut_gather FUNCTION over the
        # submodule name — fetch the module itself
        LG = importlib.import_module(
            "scale_imagenet_tpu.pallas.lut_gather")

        real = LG.lut_gather_nhwc

        def stub(packed, idx_nhwg, *, tile_rows=512, interpret=False,
                 out_dtype=jnp.float32):
            b, h, w, g = idx_nhwg.shape
            f = packed.shape[1]
            # consume idx so the index convs stay in the graph (min with
            # 0 is 0 for the non-negative indices, but XLA cannot fold
            # it away like it would an int*0)
            z = jnp.minimum(idx_nhwg[..., :1], 0).astype(out_dtype)
            return jnp.broadcast_to(z, (b, h, w, g * f))

        x = jax.device_put(
            jax.random.uniform(key, (B, 224, 224, 3), jnp.float32))
        params_d = jax.device_put(params)
        state_d = jax.device_put(state)

        def full(p, s, xx):
            return lut_ttnet_apply(luts, p, s, model.config, xx)

        try:
            for name, fn_gather in (("real", real), ("stub", stub)):
                LG.lut_gather_nhwc = fn_gather
                ms = in_graph_ms(full, params_d, state_d, x)
                print(f"full model b{B} gather={name}: {ms:7.2f} ms",
                      flush=True)
        finally:
            # a mid-sweep exception (tunnel timeout) must not leave the
            # zeros stub patched in for anything that runs after
            LG.lut_gather_nhwc = real
        return

    for name, fn in (("nhwc", block_apply_nhwc), ("nchw", block_apply_nchw)):
        for dt in (jnp.float32, jnp.bfloat16):
            xb = bits.astype(dt)
            for head, lbl in ((luts[0].heads[1], "head1 k4 G64"),
                              (luts[0].heads[3], "head3 k1 G4"),
                              (luts[0].convf, None)):
                if lbl is None:
                    continue
                ms = in_graph_ms(lambda l, x: fn(l, x), head, xb)
                print(f"{name} {dt.__name__:8s} {lbl}: {ms:7.2f} ms",
                      flush=True)

    # full model: current apply for reference
    x = jax.random.uniform(key, (B, 224, 224, 3), jnp.float32)

    def full(p, s, xx):
        return lut_ttnet_apply(luts, p, s, model.config, xx)
    ms = in_graph_ms(full, params, state, x)
    print(f"full model b256 current: {ms:7.2f} ms = {B/ms*1e3:.0f} img/s",
          flush=True)
    # B=1 latency: bf16 vs f32 bits
    x1 = x[:1]

    def full_f32(p, s, xx):
        return lut_ttnet_apply(luts, p, s, model.config, xx,
                               bits_dtype=jnp.float32)
    for nm, fnn in (("bf16", full), ("f32", full_f32)):
        ms = in_graph_ms(fnn, params, state, x1)
        print(f"full model b1 {nm}: {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
