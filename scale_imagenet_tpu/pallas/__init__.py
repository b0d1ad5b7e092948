"""Performance layer: TPU-optimized implementations of the hot ops.

Each optimization here is a drop-in, numerics-preserving (up to float
summation order) replacement selected by config flags; the straightforward
XLA path remains the reference semantics.
"""

from .stem import space_to_depth_stem, fold_avgpool_into_stem_weight
from .lut_gather import lut_gather, lut_gather_nhwc, pack_bit_table, \
    pack_float_table

__all__ = ["space_to_depth_stem", "fold_avgpool_into_stem_weight",
           "lut_gather", "lut_gather_nhwc", "pack_bit_table",
           "pack_float_table"]
