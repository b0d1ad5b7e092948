"""On-device training augmentation: RandomResizedCrop + HFlip + ColorJitter
inside the jitted train step.

The reference train recipe (``/root/reference/utils/preprocess.py:93-103``:
RandomResizedCrop(224) + RandomHorizontalFlip + ColorJitter(0.5, 0.5, 0.3))
lives host-side in ``data/transforms.py:78-110`` where it is bound to the
~280 img/s JPEG decode path.  This module runs the same recipe on-device
from pre-crop uint8 shards (e.g. 256x256, ``--write_shards`` with the train
split), so the 5.5k img/s shard pipeline can feed the full recipe.

Design notes (TPU-first):

* Crop geometry is sampled per-image with jnp scalar math (the
  torchvision 10-attempt loop is vectorized: 10 candidates, first valid
  wins, center-crop fallback), then applied as a separable bilinear
  gather — all shapes static, randomness via explicit PRNG keys.
* ColorJitter composes to ONE fused elementwise pass: brightness,
  saturation and contrast are each affine in (image, per-pixel gray,
  mean gray), so any application order collapses to scalar coefficients
  ``out = alpha * img + beta * gray + gamma * mean_gray`` computed by a
  6-way scalar switch over the random order — instead of 6 materialized
  image-sized branches.

Divergences from the PIL host path (documented, distribution-level
parity tested in tests/test_augment.py): the device resize is
non-antialiased bilinear (PIL antialiases when downscaling), PIL
quantizes to uint8 between jitter stages while the device path stays in
float and clips once, and the crop is taken from the stored pre-crop
(e.g. 256^2) view of the image rather than the full original.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_GRAY = jnp.asarray([0.299, 0.587, 0.114], jnp.float32)   # PIL "L"


def sample_crop(key: jax.Array, src_h: int, src_w: int,
                scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3)):
    """torchvision RandomResizedCrop.get_params for one image: returns
    (top, left, ch, cw) as f32 scalars.  10 vectorized attempts; first
    valid candidate wins, else the center-square fallback."""
    k_area, k_aspect, k_pos = jax.random.split(key, 3)
    area = float(src_h * src_w)
    ta = area * jax.random.uniform(k_area, (10,), minval=scale[0],
                                   maxval=scale[1])
    aspect = jnp.exp(jax.random.uniform(
        k_aspect, (10,), minval=math.log(ratio[0]),
        maxval=math.log(ratio[1])))
    cw = jnp.round(jnp.sqrt(ta * aspect))
    ch = jnp.round(jnp.sqrt(ta / aspect))
    valid = (cw > 0) & (cw <= src_w) & (ch > 0) & (ch <= src_h)
    i = jnp.argmax(valid)                     # first valid attempt
    s = float(min(src_h, src_w))
    any_valid = jnp.any(valid)
    cw = jnp.where(any_valid, cw[i], s)
    ch = jnp.where(any_valid, ch[i], s)
    u = jax.random.uniform(k_pos, (2,))
    # randint(0, w - cw) inclusive == floor(u * (w - cw + 1))
    top = jnp.where(any_valid,
                    jnp.floor(u[0] * (src_h - ch + 1)), (src_h - ch) // 2)
    left = jnp.where(any_valid,
                     jnp.floor(u[1] * (src_w - cw + 1)), (src_w - cw) // 2)
    return top, left, ch, cw


def _bilinear_crop_resize(img: jnp.ndarray, top, left, ch, cw,
                          out_size: int) -> jnp.ndarray:
    """Sample an (out, out) bilinear resize of img[top:top+ch,
    left:left+cw] — separable gathers, edge-clamped (PIL box semantics:
    output pixel center j maps to source ``left + (j+.5)*cw/out - .5``)."""
    r = (jnp.arange(out_size, dtype=jnp.float32) + 0.5)
    # edge handling: PIL crops FIRST, so samples clamp at the crop box
    # boundary (never bleed into pixels outside the box)
    y = jnp.clip(top + r * (ch / out_size) - 0.5, top, top + ch - 1)
    x = jnp.clip(left + r * (cw / out_size) - 0.5, left, left + cw - 1)
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    # blend weights follow the image dtype (bf16 under --amp); the crop
    # coordinate math above stays f32
    wy = (y - y0)[:, None, None].astype(img.dtype)
    wx = (x - x0)[None, :, None].astype(img.dtype)
    y1 = jnp.minimum(y0 + 1, top + ch - 1).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, left + cw - 1).astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)
    rows = img[y0] * (1.0 - wy) + img[y1] * wy          # (out, S_w, C)
    return rows[:, x0] * (1.0 - wx) + rows[:, x1] * wx  # (out, out, C)


def compose_jitter_coeffs(fb, fc, fs, perm):
    """Scalar (alpha, beta, gamma) of the fused jitter map
    ``out = alpha*img + beta*gray + gamma*mean_gray`` for enhancer
    factors (brightness fb, contrast fc, saturation fs) applied in order
    ``perm`` (index into the 6 permutations of (bri, con, sat)) —
    exactly the composition torchvision applies, collapsed to scalars:
    each enhancer is affine in (img, gray(img), mean(gray(img))) and
    gray/mean are linear and idempotent on their own outputs."""
    def bri(c):
        a, b, g = c
        return fb * a, fb * b, fb * g

    def sat(c):
        a, b, g = c
        return fs * a, fs * b + (1.0 - fs) * (a + b), g

    def con(c):
        a, b, g = c
        return fc * a, fc * b, fc * g + (1.0 - fc) * (a + b + g)

    orders = [(bri, con, sat), (bri, sat, con), (con, bri, sat),
              (con, sat, bri), (sat, bri, con), (sat, con, bri)]
    start = (jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.0))
    # unrolled (scalar math, 6 cheap triples) + one gather — lax.switch
    # trips shard_map's varying-axes checks inside the train step
    triples = jnp.stack([jnp.stack(o[2](o[1](o[0](start))))
                         for o in orders])          # (6, 3)
    sel = triples[perm]
    return sel[0], sel[1], sel[2]


def _jitter_coeffs(key: jax.Array, brightness: float, contrast: float,
                   saturation: float):
    kf, ko = jax.random.split(key)
    f = jax.random.uniform(kf, (3,))
    fb = 1.0 + brightness * (2.0 * f[0] - 1.0)   # U(1-b, 1+b)
    fc = 1.0 + contrast * (2.0 * f[1] - 1.0)
    fs = 1.0 + saturation * (2.0 * f[2] - 1.0)
    perm = jax.random.randint(ko, (), 0, 6)
    return compose_jitter_coeffs(fb, fc, fs, perm)


def make_rrc_flip_jitter(out_size: int = 224,
                         jitter=(0.5, 0.5, 0.3),
                         scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3),
                         normalize=None, dtype=jnp.float32):
    """Returns ``augment(images_u8 (B,S,S,C), key) -> (B,out,out,C)``
    applying RandomResizedCrop + HFlip + ColorJitter + Normalize on
    device — the reference imgnet train recipe.

    ``dtype``: pixel compute/output dtype.  bf16 under --amp halves the
    augment's HBM traffic; the amp step casts the augmented pixels to
    bf16 anyway, so running the sampling itself in bf16 only moves that
    rounding one stage earlier (stochastic augmentation — the crop
    geometry/jitter coefficients stay f32)."""
    mean = std = None
    if normalize is not None:
        mean = jnp.asarray(normalize[0], dtype)
        std = jnp.asarray(normalize[1], dtype)

    def one(img_u8, key):
        k_crop, k_flip, k_jit = jax.random.split(key, 3)
        img = img_u8.astype(dtype) / 255.0
        s_h, s_w = img.shape[0], img.shape[1]
        top, left, ch, cw = sample_crop(k_crop, s_h, s_w, scale, ratio)
        out = _bilinear_crop_resize(img, top, left, ch, cw, out_size)
        out = jnp.where(jax.random.bernoulli(k_flip), out[:, ::-1, :], out)
        a, b, g = _jitter_coeffs(k_jit, *jitter)
        a, b, g = (v.astype(dtype) for v in (a, b, g))
        gray = (out * _GRAY.astype(dtype)).sum(-1, keepdims=True)
        out = a * out + b * gray + g * jnp.mean(gray)
        out = jnp.clip(out, 0.0, 1.0)
        if mean is not None:
            out = (out - mean) / std
        return out

    def augment(images_u8: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        keys = jax.random.split(key, images_u8.shape[0])
        return jax.vmap(one)(images_u8, keys)

    return augment
