"""Fused pointwise TT-block Pallas kernel.

A pointwise Block_TT (k=1: the head-3 and fused heads of every multi-head
block) is, per pixel and per channel group g:

    y_g = act( A2( W2_g @ gelu( A1( W1_g @ x_g ) ) ) )

with W1_g (ci x m), W2_g (m x co), A* the folded eval-mode BN affines, act
in {heaviside, relu, identity}.  XLA cannot fuse the two convolutions, so
the t=8-amplified intermediate round-trips HBM — gigabytes per block at
batch 256, which dominates the measured block time.  This kernel keeps the
whole chain in VMEM: one x tile in, one binary tile out.

Grid: (groups, pixel tiles) — the group is a grid dimension because Mosaic
cannot split the lane axis in-kernel (reshape (T, G*ci) -> (T, G, ci) is
an unsupported shape cast); per instance the math is two small dense
matmuls on (tile, ci) blocks.  Inference path only (training BN needs
batch stats — the XLA path remains canonical there).

GELU: Mosaic has no erf/erfc lowering, so the kernel uses the shared
polynomial erf (ops/gelu.fast_erf — Chebyshev Horner, 7.4e-7 max err,
exp-free; one implementation for the XLA eval path and the kernels).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.gelu import fast_erf


def _gelu_exact(x):
    return 0.5 * x * (1.0 + fast_erf(x * 0.7071067811865476))


def _kernel(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
            out_ref, *, act: str):
    h = jnp.dot(x_ref[0], w1_ref[0], preferred_element_type=jnp.float32)
    h = h * s1_ref[0] + b1_ref[0]
    h = _gelu_exact(h)
    y = jnp.dot(h, w2_ref[0], preferred_element_type=jnp.float32)
    y = y * s2_ref[0] + b2_ref[0]
    if act == "heaviside":
        y = (y >= 0).astype(y.dtype)
    elif act == "relu":
        y = jnp.maximum(y, 0.0)
    out_ref[0] = y.astype(out_ref.dtype)   # compute f32, store x.dtype


def fused_pointwise_block(x, w1, s1, b1, w2, s2, b2, act: str = "heaviside",
                          tile: int | None = None,
                          interpret: bool = False) -> jnp.ndarray:
    """x: (N, G*ci); w1: (G, ci, m); s1/b1: (G, m); w2: (G, m, co);
    s2/b2: (G, co).  Returns (N, G*co).

    KEPT AS THE v1 REFERENCE VARIANT (group-as-grid-dim; needs two XLA
    transposes around the call) — the model fast path uses only the v2
    bundled block-diagonal kernel below.  Exercised by tests to pin the
    group-major math both kernels share."""
    n, cin = x.shape
    g, ci, m = w1.shape
    co = w2.shape[2]
    assert cin == g * ci, (cin, g, ci)

    if tile is None:
        # VMEM budget ~4 MB for the amplified intermediate (f32)
        budget = 4 * 1024 * 1024 // 4
        tile = max(min(2048, budget // m), 8)
        tile = max((tile // 8) * 8, 8)

    n_pad = -(-n // tile) * tile
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))

    # group-major layout: Mosaic can neither split the lane axis in-kernel
    # nor block it below 128, so the (cheap) channel-split transpose
    # happens in XLA and the kernel sees (G, N, ci) with lane dim == ci
    xg = jnp.transpose(x.reshape(n_pad, g, ci), (1, 0, 2))
    # affines as (G, 1, w): 2-D (G, w) blocks of sublane height 1 are not
    # blockable on TPU (sublane must be 8-divisible or the full dim)
    s1r, b1r = s1.reshape(g, 1, m), b1.reshape(g, 1, m)
    s2r, b2r = s2.reshape(g, 1, co), b2.reshape(g, 1, co)

    kernel = functools.partial(_kernel, act=act)
    out = pl.pallas_call(
        kernel,
        grid=(g, n_pad // tile),
        in_specs=[
            pl.BlockSpec((1, tile, ci), lambda gi, i: (gi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ci, m), lambda gi, i: (gi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m), lambda gi, i: (gi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m), lambda gi, i: (gi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, co), lambda gi, i: (gi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, co), lambda gi, i: (gi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, co), lambda gi, i: (gi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, co), lambda gi, i: (gi, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, n_pad, co), x.dtype),
        interpret=interpret,
    )(xg, w1, s1r, b1r, w2, s2r, b2r)
    out = jnp.transpose(out, (1, 0, 2)).reshape(n_pad, g * co)
    return out[:n]


def block_tt_pointwise_params(params, state, cfg, eps: float = 1e-5):
    """Repack a pointwise Block_TT's params into the kernel layout, folding
    the eval-mode BNs into affines.  Returns (w1, s1, b1, w2, s2, b2)."""
    g = cfg.groupsici
    cin = cfg.in_planes
    ci = cin // g
    m = cfg.t * cin // g
    co = cfg.out_planes // g

    # conv weights HWIO (1, 1, ci, G*m) -> (G, ci, m): output channels are
    # group-major in grouped convs
    w1 = params["conv1"]["weight"].reshape(ci, g, m)
    w1 = jnp.transpose(w1, (1, 0, 2))
    w2 = params["conv2"]["weight"].reshape(m, g, co)
    w2 = jnp.transpose(w2, (1, 0, 2))

    from ..layers.norm import bn_scale_bias

    def affine(bn_p, bn_s, width):
        scale, bias = bn_scale_bias(bn_p, bn_s, eps)
        return scale.reshape(g, width), bias.reshape(g, width)

    s1, b1 = affine(params["bn1"], state["bn1"], m)
    s2, b2 = affine(params["bn2"], state["bn2"], co)
    return w1, s1, b1, w2, s2, b2


def fused_block_tt_pointwise(params, state, cfg, x,
                             interpret: bool = False) -> jnp.ndarray:
    """Drop-in eval-mode replacement for a k=1 stride-1 ``block_tt``:
    x is NHWC, returns NHWC."""
    assert cfg.k == 1 and cfg.stride == 1 and cfg.padding == 0
    b, h, w, c = x.shape
    w1, s1, b1, w2, s2, b2 = block_tt_pointwise_params(params, state, cfg)
    act = "relu" if cfg.last else "heaviside"
    y = fused_pointwise_block(x.reshape(b * h * w, c), w1, s1, b1, w2, s2,
                              b2, act=act, interpret=interpret)
    return y.reshape(b, h, w, cfg.out_planes)


# ---------------------------------------------------------------------------
# v2: bundled block-diagonal kernel.
#
# The group-major kernel above needs two XLA transposes around the call,
# which cost more than the fusion saves end to end.  This variant bundles
# GB groups into one *dense* matmul with a block-diagonal weight: operands
# keep the natural (N, C) layout (no transposes), every lane block is
# 128-aligned, and the MXU runs dense 256x2048-ish shapes.  The zero
# off-diagonal FLOPs are free — the chain is HBM-bound, not MXU-bound.


def _bundle_size(ci: int, co: int, g: int) -> int:
    """Smallest divisor of g whose bundled lane dims are 128-aligned;
    falls back to the full group count (nb=1: lane dims are the full
    axis, which Mosaic also accepts).  Must DIVIDE g — e.g. g=12, ci=16
    has no 128-aligning power of two below g."""
    for gb in range(1, g + 1):
        if g % gb == 0 and (gb * ci) % 128 == 0 and (gb * co) % 128 == 0:
            return gb
    return g


def _block_diag(w: jnp.ndarray, gb: int) -> jnp.ndarray:
    """(G, a, b) -> (G/gb, gb*a, gb*b) block-diagonal bundles."""
    g, a, b = w.shape
    nb = g // gb
    out = jnp.zeros((nb, gb * a, gb * b), w.dtype)
    wb = w.reshape(nb, gb, a, b)
    for j in range(gb):
        out = out.at[:, j * a:(j + 1) * a, j * b:(j + 1) * b].set(wb[:, j])
    return out


def _kernel_v2(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
               out_ref, *, act: str):
    h = jnp.dot(x_ref[:], w1_ref[0], preferred_element_type=jnp.float32)
    h = h * s1_ref[0] + b1_ref[0]
    h = _gelu_exact(h)
    y = jnp.dot(h, w2_ref[0], preferred_element_type=jnp.float32)
    y = y * s2_ref[0] + b2_ref[0]
    if act == "heaviside":
        y = (y >= 0).astype(y.dtype)
    elif act == "relu":
        y = jnp.maximum(y, 0.0)
    out_ref[:] = y.astype(out_ref.dtype)   # compute f32, store x.dtype


def fused_pointwise_block_v2(x, w1, s1, b1, w2, s2, b2,
                             act: str = "heaviside",
                             tile: int | None = None,
                             interpret: bool = False) -> jnp.ndarray:
    """Same contract as fused_pointwise_block, bundled block-diagonal."""
    n, cin = x.shape
    g, ci, m = w1.shape
    co = w2.shape[2]
    gb = _bundle_size(ci, co, g)
    nb = g // gb

    w1b = _block_diag(w1, gb)                       # (nb, gb*ci, gb*m)
    w2b = _block_diag(w2, gb)                       # (nb, gb*m, gb*co)
    s1b = s1.reshape(nb, 1, gb * m)
    b1b = b1.reshape(nb, 1, gb * m)
    s2b = s2.reshape(nb, 1, gb * co)
    b2b = b2.reshape(nb, 1, gb * co)

    if tile is None:
        # VMEM (16 MB scoped): double-buffered x/out blocks, both weight
        # bundles, and ~5 live h-sized temporaries (the erf/GELU chain
        # materializes its elementwise intermediates at full vector width)
        weights = 2 * (w1b.size + w2b.size) // nb * 4
        budget = max(11 * 1024 * 1024 - weights, 2 * 1024 * 1024) // 4
        per_row = gb * (5 * m + 2 * ci + 2 * co)
        tile = max(min(1024, budget // per_row), 8)
        tile = max((tile // 8) * 8, 8)
    n_pad = -(-n // tile) * tile
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))

    kernel = functools.partial(_kernel_v2, act=act)
    out = pl.pallas_call(
        kernel,
        grid=(nb, n_pad // tile),
        in_specs=[
            pl.BlockSpec((tile, gb * ci), lambda bi, i: (i, bi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gb * ci, gb * m), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, gb * m), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, gb * m), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gb * m, gb * co), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, gb * co), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, gb * co), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, gb * co), lambda bi, i: (i, bi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, g * co), x.dtype),
        interpret=interpret,
    )(x, w1b, s1b, b1b, w2b, s2b, b2b)
    return out[:n]


def fused_block_tt_pointwise_v2(params, state, cfg, x,
                                interpret: bool = False) -> jnp.ndarray:
    assert cfg.k == 1 and cfg.stride == 1 and cfg.padding == 0
    b, h, w, c = x.shape
    w1, s1, b1, w2, s2, b2 = block_tt_pointwise_params(params, state, cfg)
    act = "relu" if cfg.last else "heaviside"
    y = fused_pointwise_block_v2(x.reshape(b * h * w, c), w1, s1, b1, w2,
                                 s2, b2, act=act, interpret=interpret)
    return y.reshape(b, h, w, cfg.out_planes)
