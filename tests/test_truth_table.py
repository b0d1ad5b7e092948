"""Truth-table compiler tests: table correctness (LUT == block forward),
logic minimization equivalence, artifact export."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scale_imagenet_tpu.compile import (
    block_truth_table,
    cnf_with_output_literal,
    count_gates,
    enumerate_patterns,
    extract_block_tables,
    minimize_truth_table,
)
from scale_imagenet_tpu.models.block_tt import BlockTTConfig, block_tt, \
    init_block_tt


@pytest.fixture(scope="module")
def small_block():
    # pointwise block: 8 channels, groups of 4 -> n = 4 bits
    cfg = BlockTTConfig(in_planes=8, out_planes=8, k=1, padding=0,
                        groupsici=2)
    params, state = init_block_tt(jax.random.PRNGKey(0), cfg)
    return cfg, params, state


def test_table_matches_forward(small_block):
    cfg, params, state = small_block
    table = block_truth_table(params, state, cfg)
    assert table.shape == (2**cfg.n_bits, cfg.out_planes)
    assert set(np.unique(table)).issubset({0.0, 1.0})

    # LUT reproduces the live block on random binary inputs
    rng = np.random.default_rng(0)
    x = rng.integers(0, 2, (16, 1, 1, 8)).astype(np.float32)
    y, _ = block_tt(params, state, cfg, jnp.asarray(x))
    y = np.asarray(y)[:, 0, 0, :]
    # filter f (in group g = f // (out/groups)) reads channels of group g;
    # pattern index from those bits, MSB-first channel-major
    ci = cfg.in_planes // cfg.groupsici
    out_per_group = cfg.out_planes // cfg.groupsici
    for b in range(16):
        for f in range(cfg.out_planes):
            g = f // out_per_group
            bits = x[b, 0, 0, g * ci:(g + 1) * ci].astype(int)
            idx = int("".join(map(str, bits)), 2)
            assert y[b, f] == table[idx, f], (b, f)


def test_enumerate_patterns_bit_order():
    cfg = BlockTTConfig(in_planes=4, out_planes=4, k=1, padding=0,
                        groupsici=1)
    pats = enumerate_patterns(cfg)   # n = 4 bits over 4 channels
    assert pats.shape == (16, 1, 1, 4)
    # row 1 = 0b0001 -> MSB-first: last channel set
    np.testing.assert_array_equal(pats[1, 0, 0], [0, 0, 0, 1])
    np.testing.assert_array_equal(pats[8, 0, 0], [1, 0, 0, 0])


def test_minimize_and_reconstruct():
    # f = x_0 XOR x_1 on 2 bits: minterms {01, 10} -> rows 1, 2
    expr = minimize_truth_table([1, 2], 2)
    import sympy

    x0, x1 = sympy.symbols("x_0 x_1")
    dnf = sympy.sympify(expr["dnf"].replace("~", "~"))
    for a in (0, 1):
        for b in (0, 1):
            want = (a != b)
            got = bool(dnf.subs({x0: a, x1: b}))
            assert got == want
    assert count_gates(expr["dnf"]) > 0


def test_cnf_with_output_literal_semantics():
    # y <-> (x_0 & x_1): DNF = x_0&x_1, CNF = x_0 & x_1 (as clauses)
    out = cnf_with_output_literal("x_0&x_1", "(x_0)&(x_1)")
    import sympy

    x0, x1, y = sympy.symbols("x_0 x_1 y")
    f = sympy.sympify(out)
    for a in (0, 1):
        for b in (0, 1):
            fx = bool(a and b)
            # the encoding must be satisfiable iff y == f(x)
            assert bool(f.subs({x0: a, x1: b, y: fx}))
            assert not bool(f.subs({x0: a, x1: b, y: not fx}))


def test_extract_block_artifacts(tmp_path, small_block):
    cfg, params, state = small_block
    res = extract_block_tables(params, state, cfg, out_dir=str(tmp_path),
                               block_id=0)
    assert len(res) == cfg.out_planes
    files = list(tmp_path.iterdir())
    assert files, "no artifacts written"
    # every non-constant filter has expressions at n=4
    for f, entry in res.items():
        if "constant" not in entry:
            assert entry["expressions"], f
