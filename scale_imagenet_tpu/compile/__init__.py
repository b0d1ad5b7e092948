"""The truth-table compiler: turn trained TT blocks into exact Boolean
artifacts (tables, DNF/CNF, CNF-with-output-literal) — the mechanism behind
the reference's published "157M gates" (README.md:13-21, SURVEY §3.3)."""

from .truth_table import (
    block_truth_table,
    enumerate_patterns,
    extract_block_tables,
    compile_model_truth_tables,
)
from .logic import (
    cnf_with_output_literal,
    count_gates,
    dimacs_from_covers,
    dimacs_from_minterms,
    minimize_truth_table,
    save_filter_artifacts,
)
from .lut_eval import (
    compile_block_tt_lut,
    compile_multihead_lut,
    compile_tt_fhe_lut,
    compile_ttnet_lut,
    lut_block_tt_apply,
    lut_multihead_apply,
    lut_tt_fhe_alexnet_apply,
    lut_tt_fhe_apply,
    lut_ttnet_apply,
    lut_ttnet_vgg_stem_apply,
)
from .lut_store import load_luts, params_digest, save_luts
from .gate_net import (
    compile_block_gates,
    compile_multihead_gates,
    compile_tt_fhe_gates,
    compile_ttnet_gates,
    gate_block_apply,
    gate_multihead_apply,
    gate_tt_fhe_alexnet_apply,
    gate_tt_fhe_apply,
    gate_ttnet_apply,
    gate_ttnet_vgg_stem_apply,
    total_gates,
)
from .verilog import (
    block_gates_to_verilog,
    cnf_cover_to_expr,
    cover_to_expr,
    export_model_verilog,
)

__all__ = [
    "block_gates_to_verilog",
    "cnf_cover_to_expr",
    "cover_to_expr",
    "export_model_verilog",
    "compile_block_gates",
    "compile_multihead_gates",
    "compile_tt_fhe_gates",
    "compile_ttnet_gates",
    "gate_block_apply",
    "gate_multihead_apply",
    "gate_tt_fhe_alexnet_apply",
    "gate_tt_fhe_apply",
    "gate_ttnet_apply",
    "gate_ttnet_vgg_stem_apply",
    "total_gates",
    "compile_block_tt_lut",
    "compile_multihead_lut",
    "compile_tt_fhe_lut",
    "compile_ttnet_lut",
    "lut_block_tt_apply",
    "lut_multihead_apply",
    "lut_tt_fhe_alexnet_apply",
    "lut_tt_fhe_apply",
    "lut_ttnet_apply",
    "lut_ttnet_vgg_stem_apply",
    "load_luts",
    "params_digest",
    "save_luts",
    "block_truth_table",
    "enumerate_patterns",
    "extract_block_tables",
    "compile_model_truth_tables",
    "cnf_with_output_literal",
    "count_gates",
    "dimacs_from_covers",
    "dimacs_from_minterms",
    "minimize_truth_table",
    "save_filter_artifacts",
]
