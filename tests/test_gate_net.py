"""Gate-level runtime: the compiled network executes as the boolean
circuit its gate counts meter, bit-identical to the float model.

The reference ships DNF/CNF artifacts with no evaluator
(TT_FHE_SMALL.py:322-431); this runtime (compile/gate_net.py +
native/ttlogic.cpp::ttlogic_eval_covers) executes them.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scale_imagenet_tpu.compile.gate_net import (
    compile_block_gates,
    compile_tt_fhe_gates,
    compile_ttnet_gates,
    gate_block_apply,
    gate_tt_fhe_apply,
    gate_ttnet_apply,
    total_gates,
)
from scale_imagenet_tpu.models import get_model
from scale_imagenet_tpu.models.block_tt import BlockTTConfig, block_tt, \
    init_block_tt
from scale_imagenet_tpu.native import (
    eval_covers,
    eval_packed_table,
    expand_cover,
    pack_table_bits,
)


def _nontrivial_state(state):
    return jax.tree.map(lambda a: a + 0.07, state)


def _planes_from_indices(idx, n):
    """Pattern indices -> (n, words) uint64 bit planes (plane p = bit p)."""
    P = len(idx)
    words = (P + 63) // 64
    planes = np.zeros((n, words), np.uint64)
    for p in range(n):
        bits = ((idx >> p) & 1).astype(np.uint8)
        pb = np.packbits(bits, bitorder="little")
        planes[p] = np.pad(pb, (0, words * 8 - len(pb))).view("<u8")
    return planes, words


def test_eval_covers_matches_table_lookup():
    """The bit-sliced circuit evaluation of a verified cover agrees with
    direct truth-table lookup on random functions — native and the pure-
    python fallback."""
    import scale_imagenet_tpu.native.ttlogic as tl

    rng = np.random.default_rng(0)
    for n in (3, 6, 9):
        col = (rng.random(1 << n) < 0.4).astype(np.uint8)
        packed = pack_table_bits(col)
        terms = np.asarray(expand_cover(packed, n),
                           np.uint32).reshape(-1, 2)
        idx = rng.integers(0, 1 << n, 777).astype(np.uint32)
        ref = eval_packed_table(packed, idx)
        planes, words = _planes_from_indices(idx, n)
        out = eval_covers(planes, [terms], n)
        got = np.unpackbits(out[0].view(np.uint8), bitorder="little",
                            count=len(idx))
        np.testing.assert_array_equal(got, ref)
        # pure-python fallback computes the same words
        lib, tl._lib = tl._lib, None
        try:
            out_py = eval_covers(planes, [terms], n)
        finally:
            tl._lib = lib
        np.testing.assert_array_equal(out_py, out)


def test_eval_covers_edge_cases():
    """Empty cover = constant false; all-don't-care cube = constant true."""
    n = 4
    idx = np.arange(16, dtype=np.uint32)
    planes, words = _planes_from_indices(idx, n)
    out = eval_covers(
        planes,
        [np.zeros((0, 2), np.uint32),
         np.asarray([(0, (1 << n) - 1)], np.uint32)], n)
    assert (out[0] == 0).all()
    got = np.unpackbits(out[1].view(np.uint8), bitorder="little", count=16)
    assert (got == 1).all()


def test_gate_block_exact_pointwise_and_strided():
    """Block circuits (DNF and CNF forms) are bit-identical to the float
    block, incl. padding + stride window walks."""
    for cfg, shape, key in (
        (BlockTTConfig(in_planes=16, out_planes=16, k=1, padding=0,
                       groupsici=4), (3, 7, 7, 16), 0),
        (BlockTTConfig(in_planes=8, out_planes=8, k=2, padding=1,
                       stride=2, groupsici=8), (2, 9, 9, 8), 2),
    ):
        params, state = init_block_tt(jax.random.PRNGKey(key), cfg)
        state = _nontrivial_state(state)
        bg = compile_block_gates(params, state, cfg)
        x = (jax.random.uniform(jax.random.PRNGKey(key + 1), shape) < 0.5
             ).astype(jnp.float32)
        ref, _ = block_tt(params, state, cfg, x)
        for form in ("dnf", "cnf"):
            got = gate_block_apply(bg, x, form=form)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
        assert bg.gates > 0


def test_gate_block_constant_filters():
    """Filters whose table is constant compile to constants (no cubes) and
    the runtime fills them."""
    cfg = BlockTTConfig(in_planes=8, out_planes=8, k=1, padding=0,
                        groupsici=4)
    params, state = init_block_tt(jax.random.PRNGKey(4), cfg)
    state = _nontrivial_state(state)
    # zero the BN scale of two filters and pin their bias: always-1 / always-0
    params["bn2"]["weight"] = params["bn2"]["weight"].at[0].set(0.0) \
                                                     .at[3].set(0.0)
    params["bn2"]["bias"] = params["bn2"]["bias"].at[0].set(5.0) \
                                                 .at[3].set(-5.0)
    bg = compile_block_gates(params, state, cfg)
    assert bg.constants[0] == 1.0 and bg.constants[3] == 0.0
    assert len(bg.covers[0]) == 0 and len(bg.covers[3]) == 0
    x = (jax.random.uniform(jax.random.PRNGKey(5), (2, 5, 5, 8)) < 0.5
         ).astype(jnp.float32)
    ref, _ = block_tt(params, state, cfg, x)
    got = gate_block_apply(bg, x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_gate_compile_guards():
    """last/ReLU blocks are float-valued — no gate form exists."""
    cfg = BlockTTConfig(in_planes=8, out_planes=8, k=1, padding=0,
                        groupsici=4, last=True)
    params, state = init_block_tt(jax.random.PRNGKey(6), cfg)
    with pytest.raises(ValueError, match="float-valued"):
        compile_block_gates(params, state, cfg)

    m = get_model("TT_FHE_small", nfilter=4, tfilter=4)  # T=0.03/0.1
    params, state = m.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="stochastic"):
        compile_tt_fhe_gates(params, state, m.config)


def test_full_model_gate_forward():
    """End-to-end: the xsmall TTnet runs as a gate circuit — float stem +
    classifier, boolean-circuit blocks — matching the float model's
    logits (blocks bit-exact; only float parts can differ in ulps)."""
    m = get_model("ttnet_imagenet_xsmall", nfilter=4, tfilter=4, layers=0)
    params, state = m.init(jax.random.PRNGKey(0))
    state = jax.tree.map(lambda a: a + 0.02 if a.ndim == 1 else a, state)
    gnets = compile_ttnet_gates(params, state, m.config)
    assert total_gates(gnets) > 0
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 224, 224, 3))
    ref, _ = m.apply(params, state, x)
    got = gate_ttnet_apply(gnets, params, state, m.config, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_fhe_model_gate_forward_dnf_and_cnf():
    """The FHE family — the family the circuits are FOR — serves from its
    gate form, in both the DNF and the CNF (AND-of-clauses) encodings."""
    m = get_model("TT_FHE_SMALL", nfilter=4, tfilter=4)
    params, state = m.init(jax.random.PRNGKey(0))
    state = jax.tree.map(lambda a: a + 0.02 if a.ndim == 1 else a, state)
    gnets = compile_tt_fhe_gates(params, state, m.config)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    ref, _ = m.apply(params, state, x)
    for form in ("dnf", "cnf"):
        got = gate_tt_fhe_apply(gnets, params, state, m.config, x,
                                form=form)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


def test_gate_bits_equal_lut_bits():
    """Gate-circuit block output == LUT block output, bit for bit (both
    are exact forms of the same truth table)."""
    from scale_imagenet_tpu.compile.lut_eval import compile_block_tt_lut, \
        lut_block_tt_apply

    cfg = BlockTTConfig(in_planes=16, out_planes=8, k=1, padding=0,
                        groupsici=8)
    params, state = init_block_tt(jax.random.PRNGKey(8), cfg)
    state = _nontrivial_state(state)
    bg = compile_block_gates(params, state, cfg)
    lut = compile_block_tt_lut(params, state, cfg)
    x = (jax.random.uniform(jax.random.PRNGKey(9), (4, 6, 6, 16)) < 0.5
         ).astype(jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(gate_block_apply(bg, x)),
        np.asarray(lut_block_tt_apply(lut, x)))


def test_vgg_stem_gate_forward():
    """The VGG16-stem ImageNet variant serves as a gate circuit (its
    single block has no fuse head), matching the float model."""
    from scale_imagenet_tpu.compile import gate_ttnet_vgg_stem_apply

    m = get_model("TT_vf_19lv3_imgnet_xsmall_VGG", num_classes=10)
    params, state = m.init(jax.random.PRNGKey(0))
    state = jax.tree.map(lambda a: a + 0.02 if a.ndim == 1 else a, state)
    gnets = compile_ttnet_gates(params, state, m.config)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 224, 224, 3))
    ref, _ = m.apply(params, state, x)
    got = gate_ttnet_vgg_stem_apply(gnets, params, state, m.config, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_fhe_alexnet_gate_forward():
    """The VGG-stem FHE variant serves as a gate circuit."""
    from scale_imagenet_tpu.compile import gate_tt_fhe_alexnet_apply

    m = get_model("TT_FHE_XSMALL_vAlexnet")
    params, state = m.init(jax.random.PRNGKey(0))
    state = jax.tree.map(lambda a: a + 0.02 if a.ndim == 1 else a, state)
    gnets = compile_ttnet_gates(params, state, m.config)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    ref, _ = m.apply(params, state, x)
    got = gate_tt_fhe_alexnet_apply(gnets, params, state, m.config, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------- device


def test_gate_device_block_bit_identical_to_host():
    """The on-device bit-sliced evaluator (compile/gate_device.py, round
    5) is bit-identical to the host circuit on pointwise and strided
    blocks, both forms, f32 and bf16 bits."""
    from scale_imagenet_tpu.compile.gate_device import \
        build_device_block, gate_block_apply_device

    for cfg, shape, key in (
        (BlockTTConfig(in_planes=16, out_planes=16, k=1, padding=0,
                       groupsici=4), (3, 7, 7, 16), 0),
        (BlockTTConfig(in_planes=8, out_planes=8, k=2, padding=1,
                       stride=2, groupsici=8), (2, 9, 9, 8), 2),
    ):
        params, state = init_block_tt(jax.random.PRNGKey(key), cfg)
        state = _nontrivial_state(state)
        bg = compile_block_gates(params, state, cfg)
        x = (jax.random.uniform(jax.random.PRNGKey(key + 1), shape) < 0.5
             ).astype(jnp.float32)
        for form in ("dnf", "cnf"):
            host = gate_block_apply(bg, x, form=form)
            dev = build_device_block(bg, form)
            for dt in (jnp.float32, jnp.bfloat16):
                got = jax.jit(gate_block_apply_device)(dev, x.astype(dt))
                assert got.dtype == dt
                np.testing.assert_array_equal(
                    np.asarray(got, np.float32), np.asarray(host))


def test_gate_device_constant_filters():
    """Constant filters bypass the device circuit exactly like the host
    path."""
    from scale_imagenet_tpu.compile.gate_device import \
        build_device_block, gate_block_apply_device

    cfg = BlockTTConfig(in_planes=8, out_planes=8, k=1, padding=0,
                        groupsici=4)
    params, state = init_block_tt(jax.random.PRNGKey(4), cfg)
    state = _nontrivial_state(state)
    params["bn2"]["weight"] = params["bn2"]["weight"].at[0].set(0.0) \
                                                     .at[3].set(0.0)
    params["bn2"]["bias"] = params["bn2"]["bias"].at[0].set(5.0) \
                                                 .at[3].set(-5.0)
    bg = compile_block_gates(params, state, cfg)
    x = (jax.random.uniform(jax.random.PRNGKey(5), (2, 5, 5, 8)) < 0.5
         ).astype(jnp.float32)
    host = gate_block_apply(bg, x)
    got = gate_block_apply_device(build_device_block(bg, "dnf"), x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(host))


def test_gate_device_full_models_and_size_guard():
    """Full-model device circuits (TTnet + FHE families) match the host
    runtime bit-for-bit on block outputs (logits to float tolerance);
    the size guard rejects circuits whose padded cube tensors exceed the
    budget."""
    import pytest

    from scale_imagenet_tpu.compile.gate_device import (
        build_device_gates, gate_tt_fhe_apply_device,
        gate_ttnet_apply_device)

    m = get_model("TT_FHE_SMALL", nfilter=4, tfilter=4)
    params, state = m.init(jax.random.PRNGKey(0))
    state = jax.tree.map(lambda a: a + 0.02 if a.ndim == 1 else a, state)
    gnets = compile_tt_fhe_gates(params, state, m.config)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    for form in ("dnf", "cnf"):
        host = gate_tt_fhe_apply(gnets, params, state, m.config, x,
                                 form=form)
        gdevs = build_device_gates(gnets, form)
        got = jax.jit(lambda p, s, xx, g=gdevs: gate_tt_fhe_apply_device(
            g, p, s, m.config, xx))(params, state, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(host),
                                   rtol=1e-5, atol=1e-5)

    with pytest.raises(ValueError, match="host evaluator"):
        build_device_gates(gnets, "dnf", max_cube_bytes=16)

    m2 = get_model("ttnet_imagenet_xsmall", nfilter=4, tfilter=4, layers=0)
    p2, s2 = m2.init(jax.random.PRNGKey(0))
    s2 = jax.tree.map(lambda a: a + 0.02 if a.ndim == 1 else a, s2)
    g2 = compile_ttnet_gates(p2, s2, m2.config)
    x2 = jax.random.uniform(jax.random.PRNGKey(1), (2, 224, 224, 3))
    host2 = gate_ttnet_apply(g2, p2, s2, m2.config, x2)
    gd2 = build_device_gates(g2)
    got2 = gate_ttnet_apply_device(gd2, p2, s2, m2.config, x2)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(host2),
                               rtol=1e-5, atol=1e-5)
