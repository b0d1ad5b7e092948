"""Persistence for compiled LUT networks.

Truth-table compilation of the flagship takes minutes of device time
(2^16-pattern enumeration per head); serving wants to load the compiled
network, not recompile it.  One ``.npz`` holds every block's tables,
index weights and Pallas-packed layouts; configs are reconstructed from
the model config at load (they are derived state, not data).

Reference counterpart: the per-filter ``.npy``/``.csv`` artifact dump of
``get_TT_block_1filter`` (/root/reference/models/TT_FHE_SMALL.py:345-383)
— that remains available via ``--mode compile``; this is the runtime
serving format.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .lut_eval import BlockLUT, MultiHeadLUT


def save_luts(path: str, luts: list[MultiHeadLUT]) -> None:
    arrs = {}
    for i, ml in enumerate(luts):
        for h, bl in ml.heads.items():
            arrs[f"b{i}_h{h}_table"] = np.asarray(bl.table)
            if bl.packed is not None:
                arrs[f"b{i}_h{h}_packed"] = np.asarray(bl.packed)
        if ml.convf is not None:
            arrs[f"b{i}_convf_table"] = np.asarray(ml.convf.table)
            if ml.convf.packed is not None:
                arrs[f"b{i}_convf_packed"] = np.asarray(ml.convf.packed)
    np.savez_compressed(path, **arrs)


def load_luts(path: str, model_cfg) -> list[MultiHeadLUT]:
    """Rebuild the LUT pytree for ``model_cfg`` (any LUT-servable config
    exposing ``block_configs()`` — ttnet_imagenet incl. the VGG-stem
    variant, TT_FHE incl. vAlexnet) from a ``save_luts`` archive."""
    from .lut_eval import _index_weights

    data = np.load(path)
    luts = []
    for i, bcfg in enumerate(model_cfg.block_configs()):
        heads = {}
        for h, hcfg in bcfg.head_cfgs().items():
            packed = data.get(f"b{i}_h{h}_packed")
            heads[h] = BlockLUT(
                cfg=hcfg,
                table=jnp.asarray(data[f"b{i}_h{h}_table"]),
                index_w=_index_weights(hcfg),
                packed=None if packed is None else jnp.asarray(packed))
        convf = None
        if bcfg.fuse:
            ccfg = bcfg.convf_cfg()
            packed = data.get(f"b{i}_convf_packed")
            convf = BlockLUT(
                cfg=ccfg,
                table=jnp.asarray(data[f"b{i}_convf_table"]),
                index_w=_index_weights(ccfg),
                packed=None if packed is None else jnp.asarray(packed))
        luts.append(MultiHeadLUT(cfg=bcfg, heads=heads, convf=convf))
    return luts
