"""Long-horizon learning evidence (VERDICT r2 #3).

The heavyweight run lives in tools/train_convergence.py (real chip,
3,000 steps, f32 + amp); its artifact is asserted here.  A genuine
CPU overfit run is available under RUN_SLOW=1 (minutes, not suite-time).
"""

import json
import os

import numpy as np
import pytest

_RESULTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "results", "train_convergence.json")


def test_convergence_artifact():
    """The chip run must reach >=99% train top-1 in BOTH precisions, and
    the curve must actually climb (catches a stack that plateaus from
    STE/BN-EMA/AMP drift invisible to single-batch tests)."""
    if not os.path.exists(_RESULTS):
        pytest.skip("results/train_convergence.json not generated yet")
    with open(_RESULTS) as f:
        data = json.load(f)
    for mode in ("f32", "amp"):
        res = data[mode]
        assert res["final_train_top1"] >= 99.0, (mode, res)
        accs = [c["train_top1"] for c in res["curve"]]
        assert accs[0] < 60.0 < accs[-1], (mode, accs)  # genuine climb


@pytest.mark.skipif(not os.environ.get("RUN_SLOW"),
                    reason="minutes-long CPU overfit; set RUN_SLOW=1")
def test_cpu_overfit_small():
    """The train stack LEARNS over hundreds of steps (not just
    loss-decreases-once): overfit 64 images to high train accuracy."""
    import jax
    import jax.numpy as jnp
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import tools.train_convergence as tc

    tc.N_IMAGES, tc.SIZE, tc.BATCH = 64, 64, 32
    tc.STEPS, tc.EVAL_EVERY, tc.LR = 250, 50, 0.05
    from scale_imagenet_tpu.data.transforms import IMAGENET_MEAN, \
        IMAGENET_STD

    imgs, lbls = tc.make_dataset()
    res = tc.run(False, jax.device_put(imgs), jax.device_put(lbls),
                 jnp.asarray(IMAGENET_MEAN), jnp.asarray(IMAGENET_STD))
    assert res["final_train_top1"] >= 90.0, res
