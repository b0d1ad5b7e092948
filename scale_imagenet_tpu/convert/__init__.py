"""Checkpoint bridge: PyTorch state dicts <-> JAX parameter pytrees, plus
offline model transforms (BN folding, fused quantization)."""

from .torch_import import (
    import_ttnet_imagenet,
    strip_module_prefix,
    conv_weight_to_hwio,
    linear_weight_to_io,
)
from .torch_export import (
    export_state_dict,
    export_ttnet_imagenet,
    save_torch_checkpoint,
)

__all__ = [
    "import_ttnet_imagenet",
    "strip_module_prefix",
    "conv_weight_to_hwio",
    "linear_weight_to_io",
    "export_state_dict",
    "export_ttnet_imagenet",
    "save_torch_checkpoint",
]
