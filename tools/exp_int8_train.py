"""Binary-input training experiment (VERDICT r4 #3): the k=4
amplification convs (flagship heads 1/2, conv1 of each Block_TT) consume
exact {0,1} activations and are HBM-bound (results/PERF.md) — measure
whether int8 bit storage / int8 MXU / f32-accumulated bf16 buy anything
on their forward and weight-gradient convs, before touching the train
step.

  nohup env PYTHONPATH=/root/repo:/root/.axon_site \
      python -u tools/exp_int8_train.py > /tmp/int8.log 2>&1 &

Shapes: block0 head1 of the flagship at B=128 (the train-step batch):
x (128,58,58,64) pre-padded bits -> conv1 k=4 s=2 G=64 -> (128,28,28,512).
"""

from __future__ import annotations

import importlib.util as _ilu
import os

import jax
import jax.numpy as jnp

B = 128
H = 58            # 56 + 2*padding(1), pre-padded
CIN, G, T = 64, 64, 8
COUT = CIN * T
K, S = 4, 2
HO = (H - K) // S + 1
ITERS = 30

_spec = _ilu.spec_from_file_location(
    "bench_serve", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "bench_serve.py"))
_bs = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_bs)


def in_graph_ms(fn, *args):
    return _bs.in_graph_ms_n(fn, *args, iters=ITERS)


def conv_fwd(x, w, out_dtype=None):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(S, S), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=G,
        preferred_element_type=out_dtype)


def conv_dw(x, dy):
    """Weight gradient of the grouped conv as a conv: for G groups with
    ci=1 this is the depthwise dW — batch dim becomes the contraction."""
    # dW[kh,kw,ci,o] = sum_b,ho,wo x[b, kh+S*ho, kw+S*wo, ci_g] * dy[b,ho,wo,o]
    # express via conv with x as lhs (feature = batch) per group: use
    # jax.vjp on the forward — measures exactly what the train step runs
    def f(w):
        return conv_fwd(x, w)
    w0 = jnp.zeros((K, K, CIN // G, COUT), x.dtype)
    _, vjp = jax.vjp(f, w0)
    return vjp(dy)[0]


def main():
    key = jax.random.PRNGKey(0)
    bits = (jax.random.uniform(key, (B, H, H, CIN)) < 0.5)
    w = jax.random.normal(jax.random.PRNGKey(1),
                          (K, K, CIN // G, COUT), jnp.float32) * 0.1
    dy = jax.random.normal(jax.random.PRNGKey(2), (B, HO, HO, COUT),
                           jnp.float32) * 0.01

    x_f32 = bits.astype(jnp.float32)
    x_bf16 = bits.astype(jnp.bfloat16)
    x_i8 = bits.astype(jnp.int8)
    w_bf = w.astype(jnp.bfloat16)
    dy_bf = dy.astype(jnp.bfloat16)
    w_i8 = jnp.where(w >= 0, 1, -1).astype(jnp.int8)

    print(f"conv1 k{K} s{S} G{G}: ({B},{H},{H},{CIN}) -> "
          f"({B},{HO},{HO},{COUT})", flush=True)

    # ---- forward flavors
    ms = in_graph_ms(lambda x, w: conv_fwd(x, w), x_f32, w)
    print(f"fwd f32                        : {ms:6.2f} ms", flush=True)
    ms = in_graph_ms(lambda x, w: conv_fwd(x, w), x_bf16, w_bf)
    print(f"fwd bf16 (amp today)           : {ms:6.2f} ms", flush=True)
    ms = in_graph_ms(lambda x, w: conv_fwd(x.astype(jnp.bfloat16), w),
                     x_i8, w_bf)
    print(f"fwd int8-stored -> bf16 cast   : {ms:6.2f} ms", flush=True)
    try:
        ms = in_graph_ms(lambda x, w: conv_fwd(x, w, jnp.int32),
                         x_i8, w_i8)
        print(f"fwd int8 x int8(+-1) -> s32    : {ms:6.2f} ms", flush=True)
    except Exception as e:
        print(f"fwd int8 MXU: UNSUPPORTED ({type(e).__name__}: "
              f"{str(e)[:120]})", flush=True)

    # ---- weight-gradient flavors (13% of backward per the r3 trace)
    ms = in_graph_ms(conv_dw, x_f32, dy)
    print(f"dW  f32                        : {ms:6.2f} ms", flush=True)
    ms = in_graph_ms(conv_dw, x_bf16, dy_bf)
    print(f"dW  bf16 (amp today)           : {ms:6.2f} ms", flush=True)
    ms = in_graph_ms(lambda x, dy: conv_dw(x.astype(jnp.bfloat16), dy),
                     x_i8, dy_bf)
    print(f"dW  int8-stored -> bf16 cast   : {ms:6.2f} ms", flush=True)

    # ---- full fwd+dW+dX step on this conv alone, bf16 vs int8-store
    def step_bf16(x, w, dy):
        def f(xx, ww):
            return conv_fwd(xx, ww)
        out, vjp = jax.vjp(f, x, w)
        dx, dw = vjp(dy)
        return out.sum() + dx.sum() + dw.sum()

    ms = in_graph_ms(step_bf16, x_bf16, w_bf, dy_bf)
    print(f"fwd+dX+dW bf16                 : {ms:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
