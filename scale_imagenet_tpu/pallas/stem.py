"""Space-to-depth stem.

The reference stem — AvgPool2d(2) then Conv(3->p, k7, s2, p3)
(TT_general_imagenet_v2_small.py:168-169) — is the canonical TPU
pathology: a conv with 3 input channels runs the MXU nearly empty and the
full-resolution pooling pass is pure HBM traffic (measured 54 ms of a
114 ms batch on v5e).

This module folds the average pool into the convolution (both linear:
equivalent to a 14x14 stride-4 conv whose weights are the 2x2-upsampled
kernel / 4) and then applies space-to-depth by 4, turning the op into a
4x4 stride-1 conv over 48 input channels — dense, aligned, MXU-friendly,
and exact up to float summation order.

    y = conv7_s2_p3(avgpool2(x))
      = conv14_s4_p6(x)                      w14[a,b] = w7[a//2,b//2]/4
      = conv4_s1_valid(S2D4(pad6(x)))        w_s2d from w14 zero-padded
                                             to 16x16 and re-blocked
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def fold_avgpool_into_stem_weight(w7: jnp.ndarray) -> jnp.ndarray:
    """HWIO (7,7,3,p) -> s2d conv weight (4,4,48,p)."""
    kh, kw, cin, cout = w7.shape
    assert (kh, kw) == (7, 7), "stem fold expects the 7x7 kernel"
    # 2x nearest upsample / 4  (the folded average pool)
    w14 = jnp.repeat(jnp.repeat(w7, 2, axis=0), 2, axis=1) / 4.0
    # zero-pad to 16x16 so the kernel spans exactly 4 s2d blocks
    w16 = jnp.pad(w14, ((0, 2), (0, 2), (0, 0), (0, 0)))
    # (16,16,C,O) -> (A,di,B,dj,C,O) -> (A,B,di,dj,C,O) -> (4,4,16*C,O)
    w = w16.reshape(4, 4, 4, 4, cin, cout)
    w = jnp.transpose(w, (0, 2, 1, 3, 4, 5))
    return w.reshape(4, 4, 16 * cin, cout)


def space_to_depth_stem(x: jnp.ndarray, w7: jnp.ndarray) -> jnp.ndarray:
    """Evaluate avgpool2+conv7s2p3 as one s2d conv.  x: (B, H, W, 3) with
    H, W divisible by 8 (224 in all reference configs)."""
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (6, 6), (6, 6), (0, 0)))
    hp, wp = h + 12, w + 12
    # pad to a multiple of 4 on the right/bottom (236 = 4*59 for 224)
    hp4, wp4 = -(-hp // 4) * 4, -(-wp // 4) * 4
    xp = jnp.pad(xp, ((0, 0), (0, hp4 - hp), (0, wp4 - wp), (0, 0)))
    xb = xp.reshape(b, hp4 // 4, 4, wp4 // 4, 4, c)
    xb = jnp.transpose(xb, (0, 1, 3, 2, 4, 5))
    xb = xb.reshape(b, hp4 // 4, wp4 // 4, 16 * c)

    ws = fold_avgpool_into_stem_weight(w7)
    return lax.conv_general_dilated(
        xb, ws, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
