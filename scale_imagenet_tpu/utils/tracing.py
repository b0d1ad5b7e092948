"""Tracing / profiling.

The reference has only wall-clock prints (main.py:254-272) and debug
forward hooks (PrintLayerSizes/PrintNorm, model_utils/utils.py:137-163).
TPU-native equivalents: a step timer with device sync, a jax.profiler
context for real traces, and a pytree shape printer replacing the hooks.
"""

from __future__ import annotations

import contextlib
import time

import jax


class StepTimer:
    """Wall-clock step timer that forces device completion (over remote
    backends ``block_until_ready`` may be unreliable; a tiny host read of
    the supplied array closes the region)."""

    def __init__(self):
        self.times: list[float] = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, sync_array=None) -> float:
        if sync_array is not None:
            jax.device_get(jax.tree.leaves(sync_array)[0].ravel()[0])
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def print_tree_shapes(tag: str, tree):
    """Debug hook replacing PrintLayerSizes: log every leaf's shape/dtype."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        print(f"[{tag}] {name}: {getattr(leaf, 'shape', ())} "
              f"{getattr(leaf, 'dtype', type(leaf).__name__)}")
