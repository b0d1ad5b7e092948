"""Verilog export of compiled gate circuits (compile/verilog.py).

The oracle is independent of the exporter's internals: the emitted
module TEXT is re-parsed (regex + Python's matching &/|/~ precedence)
and evaluated over every 2^n input pattern, then compared against the
block truth table — a genuine text -> semantics round trip.
"""

import json
import os
import re

import numpy as np
import jax
import pytest

from scale_imagenet_tpu.compile.gate_net import compile_block_gates, \
    compile_tt_fhe_gates, total_gates
from scale_imagenet_tpu.compile.truth_table import block_truth_table
from scale_imagenet_tpu.compile.verilog import block_gates_to_verilog, \
    export_model_verilog
from scale_imagenet_tpu.models import get_model
from scale_imagenet_tpu.models.block_tt import BlockTTConfig, init_block_tt


def _parse_module(text):
    """Module text -> dict filter_idx -> python-evaluable expression."""
    body = text.replace("\n", " ")
    assigns = re.findall(r"assign y\[(\d+)\] = (.*?);", body)
    out = {}
    for f, expr in assigns:
        expr = expr.replace("1'b0", "0").replace("1'b1", "1")
        expr = re.sub(r"~(x\[\d+\])", r"(1^\1)", expr)
        assert "~" not in expr, f"unhandled negation in {expr}"
        out[int(f)] = expr
    return out


def _eval_all_rows(exprs, n, F):
    """Evaluate every parsed filter expression on all 2^n patterns.
    x[b] is truth-table index bit b (the documented port semantics)."""
    table = np.zeros((1 << n, F), np.uint8)
    for idx in range(1 << n):
        x = [(idx >> b) & 1 for b in range(n)]
        for f, expr in exprs.items():
            table[idx, f] = eval(expr, {"__builtins__": {}}, {"x": x})
    return table


@pytest.mark.parametrize("form", ["dnf", "cnf"])
def test_module_text_reproduces_truth_table(form):
    """Exhaustive round trip: emitted Verilog == block truth table for
    every input pattern and filter (incl. a constant filter)."""
    cfg = BlockTTConfig(in_planes=8, out_planes=8, k=1, padding=0,
                        groupsici=4)
    params, state = init_block_tt(jax.random.PRNGKey(1), cfg)
    state = jax.tree.map(lambda a: a + 0.07, state)
    # pin one filter constant to cover the constant-assign path
    params["bn2"]["weight"] = params["bn2"]["weight"].at[0].set(0.0)
    params["bn2"]["bias"] = params["bn2"]["bias"].at[0].set(5.0)

    bg = compile_block_gates(params, state, cfg)
    text = block_gates_to_verilog(bg, "blk", form=form)
    assert text.startswith("// blk:") and "module blk (" in text

    want = np.asarray(block_truth_table(params, state, cfg),
                      np.uint8)                       # (2^n, F)
    exprs = _parse_module(text)
    got = _eval_all_rows(exprs, cfg.n_bits, cfg.out_planes)
    np.testing.assert_array_equal(got, want)


def test_module_text_strided_multigroup():
    """A k=2 stride-2 grouped block exports and round-trips too (the
    window-bit -> x[n-1-j] mapping is only documentation; the table
    semantics must hold regardless)."""
    cfg = BlockTTConfig(in_planes=8, out_planes=8, k=2, padding=1,
                        stride=2, groupsici=8)
    params, state = init_block_tt(jax.random.PRNGKey(2), cfg)
    state = jax.tree.map(lambda a: a + 0.07, state)
    bg = compile_block_gates(params, state, cfg)
    text = block_gates_to_verilog(bg, "blk_s2", form="dnf")
    want = np.asarray(block_truth_table(params, state, cfg), np.uint8)
    got = _eval_all_rows(_parse_module(text), cfg.n_bits, cfg.out_planes)
    np.testing.assert_array_equal(got, want)


def test_module_text_n9_depthwise():
    """A 3x3 depthwise block (n=9, the FHE-paper table size) exports
    and round-trips over all 512 patterns."""
    cfg = BlockTTConfig(in_planes=4, out_planes=4, k=3, padding=1,
                        groupsici=4)
    params, state = init_block_tt(jax.random.PRNGKey(3), cfg)
    state = jax.tree.map(lambda a: a + 0.07, state)
    bg = compile_block_gates(params, state, cfg)
    assert cfg.n_bits == 9
    text = block_gates_to_verilog(bg, "blk_dw", form="dnf")
    want = np.asarray(block_truth_table(params, state, cfg), np.uint8)
    got = _eval_all_rows(_parse_module(text), cfg.n_bits, cfg.out_planes)
    np.testing.assert_array_equal(got, want)


def test_export_model_verilog_manifest(tmp_path):
    """Whole-model export: one .v per compiled block (+ CNF twins),
    manifest gate count == the runtime's meter, float parts listed."""
    m = get_model("TT_FHE_SMALL", nfilter=4, tfilter=4)
    params, state = m.init(jax.random.PRNGKey(0))
    gnets = compile_tt_fhe_gates(params, state, m.config)
    out = str(tmp_path / "verilog")
    manifest = export_model_verilog(gnets, out, model_name=m.name,
                                    include_cnf=True)
    assert manifest["total_gates"] == total_gates(gnets)
    assert manifest["modules"], "no modules exported"
    for name, info in manifest["modules"].items():
        assert os.path.exists(os.path.join(out, info["file"]))
        assert os.path.exists(os.path.join(out, f"{name}_cnf.v"))
    with open(os.path.join(out, "manifest.json")) as f:
        assert json.load(f)["total_gates"] == manifest["total_gates"]


def test_table_cache_memoizes():
    """Under table_cache(), the second extraction of the same block
    returns the memoized table (no second 2^n enumeration) — what keeps
    --mode compile --verilog from doubling its dominant cost."""
    from scale_imagenet_tpu.compile.truth_table import block_truth_table, \
        table_cache

    cfg = BlockTTConfig(in_planes=8, out_planes=8, k=1, padding=0,
                        groupsici=4)
    params, state = init_block_tt(jax.random.PRNGKey(4), cfg)
    with table_cache():
        a = block_truth_table(params, state, cfg)
        b = block_truth_table(params, state, cfg)
    assert a is b
    # outside the scope: fresh arrays again
    c = block_truth_table(params, state, cfg)
    assert c is not a
    np.testing.assert_array_equal(a, c)


def test_cli_compile_verilog(tmp_path):
    """--mode compile --verilog end-to-end; --verilog elsewhere errors
    (flag honesty)."""
    from scale_imagenet_tpu.main import main

    out = str(tmp_path / "artifacts")
    summary = main(["--mode", "compile", "--model", "TT_FHE_SMALL",
                    "--nfilter", "4", "--tfilter", "4",
                    "--compile_out", out, "--verilog",
                    "--root_dir", str(tmp_path)])
    assert summary["verilog"]["modules"]
    vdir = os.path.join(out, "verilog")
    assert os.path.exists(os.path.join(vdir, "manifest.json"))
    # a sample module parses under the test grammar
    name, info = next(iter(summary["verilog"]["modules"].items()))
    with open(os.path.join(vdir, info["file"])) as f:
        assert _parse_module(f.read())

    with pytest.raises(ValueError, match="--verilog"):
        main(["--mode", "eval", "--verilog", "--nfilter", "4",
              "--tfilter", "4", "--layers", "0",
              "--root_dir", str(tmp_path)])
