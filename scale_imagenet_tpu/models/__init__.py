"""Model layer: the TTnet cell, multi-head blocks, and the model zoo.

Unlike the reference — which duplicates ``Block_TT`` and the multi-head
wrapper across 7+ files — there is exactly one parameterized implementation
here, and each reference model is a config in the registry.
"""

from .block_tt import BlockTTConfig, init_block_tt, block_tt, block_tt_out_size
from .multihead import MultiHeadConfig, init_multihead, multihead_block
from .registry import get_model, list_models, MODEL_REGISTRY

__all__ = [
    "BlockTTConfig", "init_block_tt", "block_tt", "block_tt_out_size",
    "MultiHeadConfig", "init_multihead", "multihead_block",
    "get_model", "list_models", "MODEL_REGISTRY",
]
