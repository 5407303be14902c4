"""3D-batched vs flattened-2D GEMM feeding a LayerNorm — emitter A/B.

The TPU HLO of the ViT-B forward shows every fc2/proj GEMM + next-LN-stats
fusion lowered with emitter=EmitAllBatchInSublanes, output window
[1,99,6] (M-tile of 99 rows!), because the dot is [8,792,K]x[K,768] with a
leading batch dim. This measures whether the SAME math as a 2D
[6336,K]x[K,768] dot (batch flattened into rows; bitcast-free, the arrays
are contiguous) picks the standard GEMM emitter and what that is worth.
Patterns measured, all ending in the next block's LN (the reduce that
forces the fusion), interleaved in one process:

    python scripts/profile.py flat_gemm [--k 3072]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ITERS = 600
REPS = 9
B, N, C = 8, 792, 768


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=3072)
    args = ap.parse_args()
    K = args.k

    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(K, C) * 0.02, jnp.bfloat16)
    bias = jnp.asarray(rng.randn(C) * 0.01, jnp.bfloat16)
    res = jnp.asarray(rng.randn(B, N, C) * 0.5, jnp.bfloat16)
    gamma = jnp.asarray(rng.rand(C), jnp.bfloat16)
    beta = jnp.asarray(rng.randn(C) * 0.01, jnp.bfloat16)
    x3 = jnp.asarray(rng.randn(B, N, K) * 0.1, jnp.bfloat16)

    def ln(y):
        m = jnp.mean(y.astype(jnp.float32), -1, keepdims=True)
        v = jnp.mean(jnp.square(y.astype(jnp.float32) - m), -1, keepdims=True)
        return (((y.astype(jnp.float32) - m) * jax.lax.rsqrt(v + 1e-6))
                .astype(y.dtype) * gamma + beta)

    def site3(x, r):
        # the model's exact pattern: 3D dot + bias + residual, then LN
        y = jax.lax.dot_general(x, w, (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        y = (y + bias).astype(jnp.bfloat16) + r
        return ln(y)

    def site2(x, r):
        xf = x.reshape(B * N, K)
        y = jax.lax.dot_general(xf, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        y = (y + bias).astype(jnp.bfloat16) + r.reshape(B * N, C)
        return ln(y).reshape(B, N, C)

    s = jnp.float32(1.0)
    float(s + 1)
    t0 = time.perf_counter()
    for _ in range(5):
        float(s + 1)
    rtt = (time.perf_counter() - t0) / 5

    def make_chain(f):
        @jax.jit
        def chain(x0):
            def body(c, _):
                o = f(c, res)
                # feed a K-sized carry back: take C cols, tile to K
                delta = jnp.concatenate([o] * (K // C), axis=-1)
                return c + (delta * 1e-12).astype(c.dtype), ()

            c, _ = jax.lax.scan(body, x0, None, length=ITERS)
            return jnp.sum(c[0, 0].astype(jnp.float32))

        return chain

    c3 = make_chain(site3)
    c2 = make_chain(site2)
    float(c3(x3))
    float(c2(x3))
    np.testing.assert_allclose(np.asarray(c3(x3)), np.asarray(c2(x3)),
                               rtol=1e-3)

    t3s, t2s = [], []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(c3(x3))
        t3s.append((time.perf_counter() - t0 - rtt) / ITERS)
        t0 = time.perf_counter()
        float(c2(x3))
        t2s.append((time.perf_counter() - t0 - rtt) / ITERS)

    gf = 2 * B * N * K * C / 1e9
    t3, t2 = min(t3s), min(t2s)
    print(f"3D batched dot+LN: {t3 * 1e6:8.1f} us  ({gf / t3 / 1e3:6.1f} TF/s)",
          flush=True)
    print(f"2D flat    dot+LN: {t2 * 1e6:8.1f} us  ({gf / t2 / 1e3:6.1f} TF/s)",
          flush=True)
    print(f"flat/batched ratio: {t2 / t3:.4f}", flush=True)


if __name__ == "__main__":
    main()
