"""Losses and metrics used by the harness."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                  smoothing: float = 0.0) -> jnp.ndarray:
    """Mean CE over the batch (torch nn.CrossEntropyLoss semantics,
    incl. its ``label_smoothing``: target = (1-s)·one_hot + s/C)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if smoothing > 0.0:
        uniform = -jnp.mean(logp, axis=-1)       # -sum(logp)/C
        nll = (1.0 - smoothing) * nll + smoothing * uniform
    return jnp.mean(nll)


def accuracy_topk(logits: jnp.ndarray, labels: jnp.ndarray,
                  topk=(1,)) -> list[jnp.ndarray]:
    """Top-k accuracy in percent (bar_show.py:110-124 semantics)."""
    maxk = max(topk)
    _, pred = jax.lax.top_k(logits, maxk)
    correct = pred == labels[:, None]
    return [100.0 * jnp.mean(jnp.any(correct[:, :k], axis=1).astype(
        jnp.float32)) for k in topk]


def sqr_hinge_loss(logits: jnp.ndarray, labels_pm1: jnp.ndarray):
    """Squared hinge (model_utils/utils.py ``sqr_hinge_loss``)."""
    return jnp.mean(jax.nn.relu(1.0 - logits * labels_pm1) ** 2)


def masked_metric_sums(logits: jnp.ndarray, labels: jnp.ndarray,
                       topk=(1, 5)):
    """Per-batch metric SUMS where ``labels < 0`` mark padded rows.

    The eval pipeline pads the final short batch up to the full batch size
    (static shapes keep one compiled program; the reference instead runs a
    second program on the tail, /root/reference/main.py:214-215 with
    ``drop_last=False``) and tags pad rows with label -1.  Returns
    ``(nll_sum, [correct_k_sum...], n_valid)`` so callers can divide
    locally (single program) or after a cross-shard psum (TP/DP shard_map).
    On a full batch this is exactly the unmasked sums.
    """
    mask = (labels >= 0).astype(jnp.float32)
    safe = jnp.maximum(labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[:, None], axis=-1)[:, 0]
    maxk = max(topk)
    _, pred = jax.lax.top_k(logits, maxk)
    correct = pred == safe[:, None]
    correct_sums = [jnp.sum(jnp.any(correct[:, :k], axis=1) * mask)
                    for k in topk]
    return jnp.sum(nll * mask), correct_sums, jnp.sum(mask)
