"""Evaluation loop (the reference's ``test()``, main.py:242-284)."""

from __future__ import annotations

import time

from ..train.metrics import AverageMeter


def evaluate(eval_step, params, state, loader, logger=None, epoch: int = 0,
             log_interval: int = 40, verbose: bool = True):
    """Run one evaluation epoch; returns (top1, top5, loss) averages."""
    batch_time = AverageMeter("Time", ":6.3f")
    losses = AverageMeter("Loss", ":.4e")
    top1 = AverageMeter("Acc@1", ":6.2f")
    top5 = AverageMeter("Acc@5", ":6.2f")

    end = time.time()
    for batch_idx, (images, labels) in enumerate(loader):
        metrics = eval_step(params, state, images, labels)
        n = int(metrics["n"])
        losses.update(float(metrics["loss"]), n)
        top1.update(float(metrics["top1"]), n)
        top5.update(float(metrics["top5"]), n)
        batch_time.update(time.time() - end)
        end = time.time()

        if verbose and batch_idx % log_interval == 0:
            print(f"eval [{batch_idx}] loss {losses.avg:.3f} "
                  f"acc1 {top1.avg:.3f}% acc5 {top5.avg:.3f}% "
                  f"({batch_time.avg * 1000:.0f} ms/batch)")
            if logger is not None:
                step = epoch * 10**6 + batch_idx
                logger.add_scalar("Loss/test", losses.avg, step)
                logger.add_scalar("Accuracy/test", top1.avg, step)

    if verbose:
        print(f"Acc.. {top1.avg} {top5.avg}")
    return top1.avg, top5.avg, losses.avg
