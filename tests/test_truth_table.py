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


def test_dimacs_output_literal_encoding():
    """The DIMACS export is a correct y <-> f(x) encoding: over ALL
    assignments of (x, y), the clause set is satisfied exactly when
    y equals the function value (brute force, random functions)."""
    import numpy as np

    from scale_imagenet_tpu.compile.logic import dimacs_from_minterms

    rng = np.random.default_rng(0)
    n = 5

    def parse(dim):
        clauses = []
        for line in dim.splitlines():
            if line.startswith(("c", "p")):
                continue
            lits = [int(t) for t in line.split()[:-1]]
            clauses.append(lits)
        return clauses

    def sat(clauses, assign):      # assign: var -> bool (1-indexed)
        return all(any(assign[abs(l)] == (l > 0) for l in c)
                   for c in clauses)

    for trial in range(4):
        bits = (rng.random(1 << n) < rng.uniform(0.1, 0.9))
        minterms = np.nonzero(bits)[0].tolist()
        clauses = parse(dimacs_from_minterms(minterms, n))
        for code in range(1 << n):
            xbits = [(code >> (n - 1 - i)) & 1 for i in range(n)]
            f = bool(bits[code])
            for y in (False, True):
                assign = {i + 1: bool(xbits[i]) for i in range(n)}
                assign[n + 1] = y
                assert sat(clauses, assign) == (y == f), (trial, code, y)

    # constants degenerate to unit clauses
    assert parse(dimacs_from_minterms(list(range(1 << n)), n)) == [[n + 1]]
    assert parse(dimacs_from_minterms([], n)) == [[-(n + 1)]]


def test_compile_artifacts_include_dimacs(tmp_path):
    """Both artifact writers (small-n expressions and large-n packed
    covers) emit solver-ready .cnf files."""
    import glob

    import jax

    from scale_imagenet_tpu.compile.truth_table import extract_block_tables
    from scale_imagenet_tpu.models.block_tt import BlockTTConfig, \
        init_block_tt

    cfg = BlockTTConfig(in_planes=8, out_planes=8, k=1, padding=0,
                        groupsici=4)   # n = 2
    params, state = init_block_tt(jax.random.PRNGKey(0), cfg)
    state = jax.tree.map(lambda a: a + 0.07, state)
    out = str(tmp_path / "tt")
    extract_block_tables(params, state, cfg, out_dir=out)
    small_n = glob.glob(out + "/dimacs_*.cnf")
    assert small_n, "small-n path wrote no DIMACS files"
    first = open(small_n[0]).read()
    assert "p cnf" in first and first.strip().endswith("0")

    # the large-n (packed covers) writer emits the same format
    import numpy as np

    from scale_imagenet_tpu.compile.truth_table import \
        _save_packed_artifacts
    from scale_imagenet_tpu.native import expand_cover, pack_table_bits

    col = np.asarray([0, 1, 1, 0, 1, 1, 0, 0], np.float32)   # n = 3
    bits = (col != 0).astype(np.uint8)
    ts = {1.0: {"terms": expand_cover(pack_table_bits(bits), 3),
                "cnf_terms": expand_cover(pack_table_bits(1 - bits), 3)}}
    _save_packed_artifacts(out, 9, 0, 7, col, ts)
    packed = glob.glob(out + "/dimacs_block9_filter_7_*.cnf")
    assert packed and "p cnf 4" in open(packed[0]).read()
