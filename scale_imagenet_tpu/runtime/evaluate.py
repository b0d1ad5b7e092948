"""Evaluation loop (the reference's ``test()``, main.py:242-284)."""

from __future__ import annotations

import time

from ..train.metrics import AverageMeter


def evaluate(eval_step, params, state, loader, logger=None, epoch: int = 0,
             log_interval: int = 40, verbose: bool = True):
    """Run one evaluation epoch; returns (top1, top5, loss) averages.

    Per-batch metrics stay ON DEVICE until a log point or the end of the
    epoch: ``float()`` on a fresh result is a host sync, and a sync per
    batch serializes the device with the host/tunnel round-trip (~37 ms
    here) — deferring it keeps the dispatch queue full, which is what
    lets prefetched batches overlap with compute.
    """
    batch_time = AverageMeter("Time", ":6.3f")
    losses = AverageMeter("Loss", ":.4e")
    top1 = AverageMeter("Acc@1", ":6.2f")
    top5 = AverageMeter("Acc@5", ":6.2f")
    # optional per-step extras: "cert" (certified top-1), "adv"
    # (adversarial top-1) — tracked when the step emits them
    extras = {k: AverageMeter(k, ":6.2f") for k in ("cert", "adv")}

    pending = []  # device-side metric dicts not yet folded into meters

    def drain():
        for m in pending:
            n = int(m["n"])
            losses.update(float(m["loss"]), n)
            top1.update(float(m["top1"]), n)
            top5.update(float(m["top5"]), n)
            for k, meter in extras.items():
                if k in m:
                    meter.update(float(m[k]), n)
        pending.clear()

    end = time.time()
    for batch_idx, (images, labels) in enumerate(loader):
        pending.append(eval_step(params, state, images, labels))
        batch_time.update(time.time() - end)
        end = time.time()

        if batch_idx % log_interval == 0:
            # drain unconditionally: this is the loop's backpressure point
            # — without it a silent eval accumulates every batch's device
            # buffers and dispatches the whole stream unpaced
            drain()
            if verbose:
                print(f"eval [{batch_idx}] loss {losses.avg:.3f} "
                      f"acc1 {top1.avg:.3f}% acc5 {top5.avg:.3f}% "
                      f"({batch_time.avg * 1000:.0f} ms/batch)")
            if logger is not None:
                step = epoch * 10**6 + batch_idx
                logger.add_scalar("Loss/test", losses.avg, step)
                logger.add_scalar("Accuracy/test", top1.avg, step)

    drain()
    extra_avgs = {k: m.avg for k, m in extras.items() if m.count}
    if verbose:
        print(f"Acc.. {top1.avg} {top5.avg}"
              + "".join(f" {k} {v}" for k, v in extra_avgs.items()))
    if extra_avgs:
        return top1.avg, top5.avg, losses.avg, extra_avgs
    return top1.avg, top5.avg, losses.avg
