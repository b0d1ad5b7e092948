"""On-device train augmentation (train/augment.py): RandomResizedCrop +
flip + ColorJitter parity with the host recipe (data/transforms.py:78-110,
itself matching /root/reference/utils/preprocess.py:93-103)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scale_imagenet_tpu.train.augment import (
    _bilinear_crop_resize,
    compose_jitter_coeffs,
    make_rrc_flip_jitter,
    sample_crop,
)


def test_bilinear_identity_crop():
    """A full-image crop at the native size is the identity."""
    img = jnp.asarray(np.random.default_rng(0).random((16, 16, 3)),
                      jnp.float32)
    out = _bilinear_crop_resize(img, 0.0, 0.0, 16.0, 16.0, 16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img),
                               rtol=1e-6, atol=1e-6)


def test_bilinear_matches_jax_image_resize():
    """Upscale of a sub-crop matches jax.image.resize(antialias=False):
    both use half-pixel-center bilinear."""
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.random((32, 32, 3)), jnp.float32)
    out = _bilinear_crop_resize(img, 4.0, 6.0, 20.0, 18.0, 24)
    ref = jax.image.resize(img[4:24, 6:24], (24, 24, 3), "bilinear",
                           antialias=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_crop_sampler_distribution_matches_host():
    """The device crop sampler draws from the same distribution as the
    host _random_resized_crop: compare mean area fraction and box
    validity over many draws."""
    import random as pyrandom

    from scale_imagenet_tpu.data.transforms import _random_resized_crop
    from PIL import Image

    keys = jax.random.split(jax.random.PRNGKey(0), 2000)
    tops, lefts, chs, cws = jax.vmap(
        lambda k: sample_crop(k, 256, 256))(keys)
    tops, lefts = np.asarray(tops), np.asarray(lefts)
    chs, cws = np.asarray(chs), np.asarray(cws)
    # all boxes in-bounds
    assert (tops >= 0).all() and (lefts >= 0).all()
    assert (tops + chs <= 256).all() and (lefts + cws <= 256).all()

    # host reference distribution (crop the same 256^2 geometry)
    host_rng = pyrandom.Random(0)
    host_areas = []
    img = Image.new("RGB", (256, 256))
    orig_crop = Image.Image.crop
    boxes = []

    def record_crop(self, box):
        boxes.append(box)
        return orig_crop(self, box)

    Image.Image.crop = record_crop
    try:
        for _ in range(2000):
            _random_resized_crop(img, 224, host_rng)
    finally:
        Image.Image.crop = orig_crop
    for (l, t, r, b) in boxes:
        host_areas.append((r - l) * (b - t) / 256.0 ** 2)
    dev_areas = chs * cws / 256.0 ** 2
    assert abs(dev_areas.mean() - np.mean(host_areas)) < 0.03, \
        (dev_areas.mean(), np.mean(host_areas))
    assert abs(np.log(cws / chs).mean() - 0.0) < 0.02  # aspect symmetric


@pytest.mark.parametrize("perm", range(6))
def test_jitter_coeffs_match_sequential(perm):
    """The fused (alpha, beta, gamma) map equals applying the three
    enhancers sequentially in that order (float semantics)."""
    rng = np.random.default_rng(perm)
    img = rng.random((8, 8, 3)).astype(np.float32)
    fb, fc, fs = 1.3, 0.7, 1.2
    gray_w = np.asarray([0.299, 0.587, 0.114], np.float32)

    def gray(x):
        return np.repeat((x * gray_w).sum(-1, keepdims=True), 3, axis=-1)

    def bri(x):
        return fb * x

    def con(x):
        return fc * x + (1 - fc) * gray(x).mean()

    def sat(x):
        return fs * x + (1 - fs) * gray(x)

    seq = [(bri, con, sat), (bri, sat, con), (con, bri, sat),
           (con, sat, bri), (sat, bri, con), (sat, con, bri)][perm]
    ref = seq[2](seq[1](seq[0](img)))

    a, b, g = compose_jitter_coeffs(jnp.float32(fb), jnp.float32(fc),
                                    jnp.float32(fs), jnp.int32(perm))
    got = float(a) * img + float(b) * gray(img)[..., :1] \
        + float(g) * gray(img).mean()
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_full_augment_pipeline():
    rng = np.random.default_rng(3)
    images = rng.integers(0, 255, (8, 256, 256, 3), dtype=np.uint8)
    aug = make_rrc_flip_jitter(
        out_size=224, normalize=(np.full(3, 0.5, np.float32),
                                 np.full(3, 0.25, np.float32)))
    out1 = jax.jit(aug)(images, jax.random.PRNGKey(0))
    assert out1.shape == (8, 224, 224, 3) and out1.dtype == jnp.float32
    assert np.isfinite(np.asarray(out1)).all()
    # deterministic per key, distinct across keys and across samples
    out2 = jax.jit(aug)(images, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    out3 = jax.jit(aug)(images, jax.random.PRNGKey(1))
    assert np.abs(np.asarray(out1) - np.asarray(out3)).max() > 0.01
    same = jax.jit(aug)(np.repeat(images[:1], 8, 0), jax.random.PRNGKey(0))
    per_sample = np.asarray(same).reshape(8, -1)
    assert not np.allclose(per_sample[0], per_sample[1])


def test_train_step_full_augment():
    """make_train_step(augment='full') trains from 256^2 uint8 batches."""
    from scale_imagenet_tpu.models import get_model
    from scale_imagenet_tpu.train import TrainState, make_optimizer, \
        make_train_step

    model = get_model("ttnet_imagenet_small", nfilter=4, tfilter=4,
                      layers=0)
    params, state = model.init(jax.random.PRNGKey(0))
    tx, _ = make_optimizer(0.05, weight_decay=0.0, milestones=(30,),
                           steps_per_epoch=1)
    step = make_train_step(
        model, tx, normalize=(np.full(3, 0.5, np.float32),
                              np.full(3, 0.25, np.float32)),
        augment="full")
    ts = TrainState(params, state, tx.init(params),
                    jnp.zeros((), jnp.int32))
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (4, 256, 256, 3), dtype=np.uint8)
    labels = rng.integers(0, 1000, (4,))
    ts, metrics = step(ts, jnp.asarray(images), jnp.asarray(labels),
                       jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(ts.step) == 1
