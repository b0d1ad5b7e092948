"""Training/eval harness: losses, optimizer, sharded step functions, metrics.

Rebuilds the reference's (largely commented-out) training loop —
SGD(momentum=0.9, wd=1e-4) + MultiStepLR [30,60,90]x0.1 + cross-entropy
(main.py:194-199) — plus the robustness losses from the mixin API.
"""

from .losses import cross_entropy, accuracy_topk, sqr_hinge_loss
from .optim import make_optimizer, multistep_lr
from .steps import make_eval_step, make_robust_train_step, \
    make_train_step, TrainState
from .metrics import AverageMeter, MetricsLogger

__all__ = [
    "cross_entropy", "accuracy_topk", "sqr_hinge_loss",
    "make_optimizer", "multistep_lr",
    "make_eval_step", "make_train_step", "make_robust_train_step",
    "TrainState",
    "AverageMeter", "MetricsLogger",
]
