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

import hashlib
import os
import tempfile
import warnings

import numpy as np
import jax
import jax.numpy as jnp

from .lut_eval import BlockLUT, MultiHeadLUT

#: Bump whenever the LUT compiler or the Pallas packing layout changes in
#: a way that makes previously-saved archives non-equivalent.  Stored in
#: every archive next to the weights digest; a mismatch at load refuses
#: the archive (benchmarks must never silently serve tables packed by an
#: older compiler).
LUT_FORMAT_VERSION = 2


def params_digest(params, state=None) -> str:
    """SHA-256 over the (params, state) pytrees — leaf paths, dtypes,
    shapes and bytes.  Stored in LUT archives so a stale ``.npz`` compiled
    from DIFFERENT weights refuses to load: the compiled tables are
    bit-faithful to the weights they were enumerated from, and a silent
    shape-compatible mismatch would serve the wrong model with no error.
    """
    h = hashlib.sha256()
    for tree in (params, state):
        if tree is None:
            continue
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            a = np.asarray(leaf)
            h.update(jax.tree_util.keystr(path).encode())
            h.update(str(a.dtype).encode())
            h.update(str(a.shape).encode())
            h.update(np.ascontiguousarray(a).tobytes())
    return h.hexdigest()


def save_luts(path: str, luts: list[MultiHeadLUT],
              params=None, state=None) -> None:
    arrs = {"__format_version__": np.int64(LUT_FORMAT_VERSION)}
    if params is not None:
        arrs["__params_digest__"] = np.frombuffer(
            params_digest(params, state).encode(), dtype=np.uint8)
    for i, ml in enumerate(luts):
        for h, bl in ml.heads.items():
            arrs[f"b{i}_h{h}_table"] = np.asarray(bl.table)
            if bl.packed is not None:
                arrs[f"b{i}_h{h}_packed"] = np.asarray(bl.packed)
        if ml.convf is not None:
            arrs[f"b{i}_convf_table"] = np.asarray(ml.convf.table)
            if ml.convf.packed is not None:
                arrs[f"b{i}_convf_packed"] = np.asarray(ml.convf.packed)
    # Atomic: bench runs under hard subprocess timeouts; a kill mid-write
    # must not leave a truncated archive at the final path (the next run
    # would pay the full ~5 min recompile, get killed during the save,
    # and the cache would never materialize).
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(os.path.abspath(path))
                               or ".", suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez_compressed(f, **arrs)
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def load_luts(path: str, model_cfg, params=None, state=None
              ) -> list[MultiHeadLUT]:
    """Rebuild the LUT pytree for ``model_cfg`` (any LUT-servable config
    exposing ``block_configs()`` — ttnet_imagenet incl. the VGG-stem
    variant, TT_FHE incl. vAlexnet) from a ``save_luts`` archive.

    When ``params`` is given, the archive's stored weight digest is
    checked against ``params_digest(params, state)``; a mismatch raises
    ``ValueError`` (the archive was compiled from different weights —
    delete it or point ``--lut_path`` elsewhere to recompile).
    """
    from .lut_eval import _index_weights

    data = np.load(path)
    ver = data.get("__format_version__")
    ver = None if ver is None else int(ver)
    if ver != LUT_FORMAT_VERSION:
        raise ValueError(
            f"LUT archive {path} has format version {ver}, this compiler "
            f"writes {LUT_FORMAT_VERSION}; the packing layout may differ — "
            "delete the archive to recompile.")
    if params is not None:
        want = params_digest(params, state)
        stored = data.get("__params_digest__")
        if stored is None:
            warnings.warn(
                f"LUT archive {path} predates weight digests; cannot "
                "verify it matches the current weights", stacklevel=2)
        elif bytes(stored.tobytes()).decode() != want:
            raise ValueError(
                f"LUT archive {path} was compiled from DIFFERENT weights "
                f"(stored digest {bytes(stored.tobytes()).decode()[:12]}… "
                f"!= current {want[:12]}…). Compiled tables are "
                "bit-faithful to their source weights; delete the archive "
                "or pass a fresh --lut_path to recompile.")
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
