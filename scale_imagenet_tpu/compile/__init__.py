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
    minimize_truth_table,
    save_filter_artifacts,
)

__all__ = [
    "block_truth_table",
    "enumerate_patterns",
    "extract_block_tables",
    "compile_model_truth_tables",
    "cnf_with_output_literal",
    "count_gates",
    "minimize_truth_table",
    "save_filter_artifacts",
]
