"""Checkpoint/resume.

Orbax-backed pytree checkpoints with the reference's ergonomics: ctor args
embedded next to the weights (the ModelHelper pattern,
model_utils/utils.py:26-83), last/best tracking, and interop with torch
``.pth`` files through ``scale_imagenet_tpu.convert``.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np


def _to_numpy_tree(tree):
    return jax.tree.map(np.asarray, tree)


# flat-npz path-keyed namespaces: which payload keys are stored by dotted
# path (loadable with no example pytree) and their archive tag
_PATHED_TAGS = {"params": "P", "state": "S"}


def _pathed_items(tree):
    """(dotted_name, leaf) pairs of a nested-dict pytree, in its canonical
    flatten order — the single definition save and both load paths share."""
    for kp, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        yield ".".join(str(getattr(e, "key", e)) for e in kp), leaf


def save_checkpoint(path: str, payload: dict, metadata: dict | None = None):
    """Save a dict of pytrees (params/state/opt_state/step...) + metadata.

    Multi-process runs write the flat-npz layout directly: the harness
    saves from the COORDINATOR only (the payload is host-extracted /
    replicated), but orbax's PyTreeCheckpointer in a jax.distributed
    environment runs an internal all-process sync barrier — a
    single-process call blocks ~5 min until the coordination service
    kills the barrier, poisoning the job's shutdown (observed as a
    DEADLINE_EXCEEDED shutdown barrier in the 2-process CLI e2e)."""
    os.makedirs(path, exist_ok=True)
    try:
        if jax.process_count() > 1:
            raise RuntimeError("multi-process: use the npz layout")
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.join(path, "tree"), _to_numpy_tree(payload),
                   force=True)
    except Exception:
        # flat-npz fallback (format 2): params/state — plain nested
        # dicts — are stored path-keyed ("P:a.b.c"), loadable with NO
        # example pytree (eval/serving); the rest (opt_state = optax
        # namedtuples, step, ...) is index-keyed and restores via `like`
        # (full-train-state resume).  Every leaf is stored exactly once.
        np_payload = _to_numpy_tree(payload)
        arrs = {"__fmt__": np.asarray(2, np.int32)}
        pathed = {k for k in _PATHED_TAGS
                  if isinstance(np_payload.get(k), dict)}
        for key in pathed:
            for name, leaf in _pathed_items(np_payload[key]):
                arrs[f"{_PATHED_TAGS[key]}:{name}"] = leaf
        rest = {k: v for k, v in np_payload.items() if k not in pathed}
        flat, treedef = jax.tree.flatten(rest)
        arrs.update({str(i): a for i, a in enumerate(flat)})
        np.savez(os.path.join(path, "tree.npz"), **arrs)
        with open(os.path.join(path, "treedef.json"), "w") as f:
            json.dump(str(treedef), f)
    if metadata is not None:
        with open(os.path.join(path, "metadata.json"), "w") as f:
            json.dump(metadata, f, default=str)


def load_checkpoint(path: str, like: Any | None = None):
    """Load a checkpoint saved by save_checkpoint.  ``like`` (an example
    pytree) restores exact structure/dtypes when provided.  Handles both
    the orbax layout and the flat-npz fallback save_checkpoint writes
    when orbax is unavailable (the fallback needs ``like`` — the flat
    leaves are reattached to its treedef)."""
    path = os.path.abspath(path)   # orbax rejects relative paths
    npz = os.path.join(path, "tree.npz")
    if os.path.exists(npz):
        data = np.load(npz)
        if like is None:
            # like-free load: the path-keyed params/state namespaces
            # (weights-only — enough for eval/serving; resume passes
            # `like` and gets the exact full train state)
            tag2key = {v: k for k, v in _PATHED_TAGS.items()}
            out = {k: {} for k in _PATHED_TAGS}
            for name in data.files:
                if ":" not in name:
                    continue
                tag, dotted = name.split(":", 1)
                dst = out[tag2key[tag]]
                *parents, leaf = dotted.split(".")
                for p in parents:
                    dst = dst.setdefault(p, {})
                dst[leaf] = data[name]
            if not out["params"]:
                raise ValueError(
                    f"{path} is a flat-npz checkpoint from before the "
                    "path-keyed layout; pass `like` (an example pytree) "
                    "to restore its structure")
            return out
        n_idx = len([n for n in data.files
                     if ":" not in n and n != "__fmt__"])
        flat = [data[str(i)] for i in range(n_idx)]
        if "__fmt__" not in data.files:
            # format 1: index keys cover the WHOLE payload
            return jax.tree.unflatten(jax.tree.structure(like), flat)
        # format 2: index keys cover the payload MINUS the path-keyed
        # params/state; rebuild those by walking like's own paths so the
        # restored structure (and any missing key) follows `like` exactly
        pathed = {k for k in _PATHED_TAGS
                  if isinstance(like.get(k), dict)
                  and any(n.startswith(_PATHED_TAGS[k] + ":")
                          for n in data.files)}
        rest_like = {k: v for k, v in like.items() if k not in pathed}
        out = dict(jax.tree.unflatten(jax.tree.structure(rest_like), flat))
        for key in pathed:
            leaves = [data[f"{_PATHED_TAGS[key]}:{name}"]
                      for name, _ in _pathed_items(like[key])]
            out[key] = jax.tree.unflatten(jax.tree.structure(like[key]),
                                          leaves)
        return out

    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    tree_path = os.path.join(path, "tree")
    if like is not None:
        return ckptr.restore(tree_path, item=_to_numpy_tree(like))
    return ckptr.restore(tree_path)


def _wrote(path: str, root: str) -> bool:
    """True if ``path`` is inside ``root`` (this run's own step dirs)."""
    path = os.path.realpath(path)
    root = os.path.realpath(root)
    return path == root or path.startswith(root + os.sep)


class CheckpointManager:
    """Timestamped run-dir checkpoints with last/best symlinked names
    (the reference keeps ckpt/<log_name>/<date>/, main.py:84-92).

    ``best_root``: where the 'best' link + best.json live.  The CLI
    passes the stable ``ckpt/<log_name>/`` parent so best tracking is
    continuous across resumed runs (each run's step dirs stay in its own
    timestamped leaf; without this, a resumed run's first epoch — any
    metric > -inf — would claim 'best' even when a prior run did
    better).  Defaults to ``root``."""

    def __init__(self, root: str, keep: int = 3, best_root: str | None = None):
        self.root = root
        self.best_root = best_root or root
        self.keep = keep
        os.makedirs(root, exist_ok=True)
        os.makedirs(self.best_root, exist_ok=True)
        self._saved: list[str] = []
        self.best_metric = -float("inf")
        best_json = os.path.join(self.best_root, "best.json")
        if os.path.exists(best_json):
            with open(best_json) as f:
                self.best_metric = float(json.load(f)["metric"])

    def save(self, step: int, payload: dict, metric: float | None = None,
             metadata: dict | None = None):
        path = os.path.join(self.root, f"step_{step:08d}")
        save_checkpoint(path, payload, metadata)
        self._saved.append(path)
        self._update_link("last", path)
        if metric is not None and metric > self.best_metric:
            self.best_metric = metric
            with open(os.path.join(self.best_root, "best.json"), "w") as f:
                json.dump({"metric": metric, "step": step}, f)
            self._update_link("best", path)
        while len(self._saved) > self.keep:
            old = self._saved.pop(0)
            if not self._is_linked(old):
                import shutil
                shutil.rmtree(old, ignore_errors=True)

    def _link_path(self, name: str) -> str:
        root = self.best_root if name == "best" else self.root
        return os.path.join(root, name)

    def _update_link(self, name: str, target: str):
        link = self._link_path(name)
        old = None
        if os.path.islink(link):
            old = os.path.normpath(
                os.path.join(os.path.dirname(link), os.readlink(link)))
            os.unlink(link)
        # relative link so the tree stays relocatable (same-dir targets
        # degrade to a bare basename, the pre-best_root behavior)
        os.symlink(os.path.relpath(target, os.path.dirname(link)), link)
        # reap a former link target that already aged out of the keep
        # window (it was skipped by the prune while protected) — without
        # this, every superseded 'best' directory leaks forever.  Only
        # ever reap step dirs THIS run wrote (a cross-run 'best' in
        # best_root may point into an older run's tree — not ours to
        # delete unless it aged out of our own keep window)
        target = os.path.normpath(target)
        if old and old != target and old not in self._saved \
                and _wrote(old, self.root) and not self._is_linked(old):
            import shutil
            shutil.rmtree(old, ignore_errors=True)

    def _is_linked(self, path: str) -> bool:
        for name in ("last", "best"):
            link = self._link_path(name)
            if os.path.islink(link) and \
                    os.path.realpath(link) == os.path.realpath(path):
                return True
        return False

    def latest(self) -> str | None:
        link = os.path.join(self.root, "last")
        return os.path.realpath(link) if os.path.exists(link) else None


def save_model(path: str, model, params, state):
    """Save weights WITH the model identity + config embedded — the
    ModelHelper.create_with_load pattern (model_utils/utils.py:26-83),
    where ctor args ride along in the checkpoint."""
    import dataclasses

    save_checkpoint(path, {"params": params, "state": state},
                    metadata={
                        "model_name": model.name,
                        "config": dataclasses.asdict(model.config),
                    })


def load_model(path: str):
    """Rebuild the model from the embedded identity and restore weights.
    Returns (model_def, params, state)."""
    with open(os.path.join(path, "metadata.json")) as f:
        meta = json.load(f)
    from ..models import get_model

    # JSON turns tuple config fields (e.g. `groups`) into lists — restore
    # them as tuples rather than dropping them (a dropped field silently
    # rebuilds the DEFAULT architecture); dicts stay excluded
    kwargs = {k: tuple(v) if isinstance(v, list) else v
              for k, v in meta["config"].items()
              if k != "name" and not isinstance(v, dict)}
    model = get_model(meta["model_name"], **kwargs)
    example = model.init(__import__("jax").random.PRNGKey(0))
    payload = load_checkpoint(path, like={"params": example[0],
                                          "state": example[1]})
    return model, payload["params"], payload["state"]
