"""Support utilities: metrics, data iterators, image-space transforms,
parameter accounting, profiling/tracing."""

from .misc import (
    AverageMetric,
    cast_floating,
    LimitedDatasetIter,
    ReplayDatasetIter,
    count_parameters,
    get_mean_and_std,
    get_sparsity_stat,
    rgb_to_hsv,
)
from .tracing import StepTimer, profile_trace, print_tree_shapes

__all__ = [
    "AverageMetric", "cast_floating", "LimitedDatasetIter", "ReplayDatasetIter",
    "count_parameters", "get_mean_and_std", "get_sparsity_stat", "rgb_to_hsv",
    "StepTimer", "profile_trace", "print_tree_shapes",
]
