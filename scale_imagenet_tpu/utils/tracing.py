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


def tap_norm(tag: str, x, grad: bool = False):
    """Debug hook replacing PrintNorm (model_utils/utils.py:147-163):
    prints shape, value range and L2 norm of an intermediate — from
    INSIDE jit, via ``jax.debug.print`` (a torch forward hook has no
    functional analog; taps compose with jit/grad/shard_map instead).

    ``grad=True`` additionally taps the cotangent flowing back through
    this point (the backward-hook counterpart).  Returns ``x`` so the
    tap inserts into an expression: ``h = tap_norm("block0", h)``.
    """
    import jax.numpy as jnp

    def _tap(tag, v):
        # shape is static at trace time — bake it into the format string
        # (passing v.shape as an operand would print traced scalars)
        jax.debug.print(
            f"[{tag}] shape={v.shape} " + "min={mn:.4g} max={mx:.4g} "
            "norm={n:.4g}",
            mn=v.min(), mx=v.max(),
            n=jnp.sqrt((v.astype(jnp.float32) ** 2).sum()))
        return v

    x = _tap(tag, x)
    if grad:
        @jax.custom_vjp
        def _gtap(v):
            return v

        _gtap.defvjp(lambda v: (v, None),
                     lambda _, ct: (_tap(f"{tag}:grad", ct),))
        x = _gtap(x)
    return x
