"""Softmax-strategy variants inside the flash-attention forward kernel.

At ViT-B 392^2 (N=785 pad 896, H12 D64 bs8 bf16) the kernel runs ~330 us
while its two GEMMs alone are ~150 us — the fp32 softmax (max, sub, exp,
sum, div over [q, 896] scores) is the other half. Variants:

  A. jax.nn.softmax fp32 (current)
  B. no max subtraction (exp can overflow for |scores| > 88 — diagnostic)
  C. exp2-based: p = exp2(s*log2e - max*log2e)
  D. exp in bf16 after fp32 max-subtract
  E. skip the final divide; fold 1/sum into the PV output (columns scale)
"""
from __future__ import annotations

import functools
import time

import numpy as np

ITERS = 30


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from distill_any_depth_tpu.ops import flash_attention as fa

    b, n, h, d = 8, 785, 12, 64
    rng = np.random.RandomState(0)
    mk = lambda: jnp.asarray(rng.randn(b * h, n, d), jnp.bfloat16)  # noqa: E731
    q, k, v = mk(), mk(), mk()

    s = jnp.float32(1.0)
    float(s + 1)
    t0 = time.perf_counter()
    for _ in range(5):
        float(s + 1)
    rtt = (time.perf_counter() - t0) / 5

    def timed(fn, reps=3):
        @jax.jit
        def chain(qq, kk, vv):
            def body(c, _):
                out = fn(c, kk, vv)
                return (c + out * 1e-12).astype(c.dtype), ()

            c, _ = jax.lax.scan(body, qq, None, length=ITERS)
            return jnp.sum(c.astype(jnp.float32).ravel()[:1])

        float(chain(q, k, v))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chain(q, k, v))
            ts.append(max(time.perf_counter() - t0 - rtt, 1e-9) / ITERS)
        return float(np.median(ts))

    LOG2E = 1.4426950408889634

    def kernel(q_ref, k_ref, v_ref, o_ref, *, hp, n_real, scale, mode):
        for hh in range(hp):
            qq = q_ref[hh]
            kk = k_ref[hh]
            vv = v_ref[hh]
            s = jax.lax.dot_general(
                qq, kk, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            nk = s.shape[-1]
            if nk > n_real:
                col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = jnp.where(col < n_real, s, -jnp.inf)
            if mode == "A":
                p = jax.nn.softmax(s, axis=-1).astype(qq.dtype)
                o = jax.lax.dot_general(
                    p, vv, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            elif mode == "B":
                e = jnp.exp(s)
                p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(qq.dtype)
                o = jax.lax.dot_general(
                    p, vv, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            elif mode == "C":
                s2 = s * LOG2E
                m = jnp.max(s2, axis=-1, keepdims=True)
                e = jnp.exp2(s2 - m)
                p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(qq.dtype)
                o = jax.lax.dot_general(
                    p, vv, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            elif mode == "D":
                m = jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp((s - m).astype(jnp.bfloat16).astype(jnp.float32))
                p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(qq.dtype)
                o = jax.lax.dot_general(
                    p, vv, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            elif mode == "E":
                m = jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s - m)
                denom = jnp.sum(e, axis=-1, keepdims=True)
                o = jax.lax.dot_general(
                    e.astype(qq.dtype), vv,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                o = o / denom
            o_ref[hh] = o.astype(qq.dtype)

    def run(mode):
        def impl(qq, kk, vv):
            bh, nn_, dd = qq.shape
            scale = dd ** -0.5
            n_pad = fa._round_up(nn_, 128)
            hp, q_block = fa._pick_tiling(bh, n_pad, dd, qq.dtype.itemsize, False)
            nq_pad = fa._round_up(nn_, q_block)

            def pad(x, t):
                return x if x.shape[1] == t else jnp.pad(
                    x, ((0, 0), (0, t - x.shape[1]), (0, 0))
                )

            qp, kp, vp = pad(qq, nq_pad), pad(kk, n_pad), pad(vv, n_pad)
            out = pl.pallas_call(
                functools.partial(kernel, hp=hp, n_real=nn_, scale=scale,
                                  mode=mode),
                out_shape=jax.ShapeDtypeStruct((bh, nq_pad, dd), qq.dtype),
                grid=(bh // hp, nq_pad // q_block),
                in_specs=[
                    pl.BlockSpec((hp, q_block, dd), lambda bb, i: (bb, i, 0)),
                    pl.BlockSpec((hp, n_pad, dd), lambda bb, i: (bb, 0, 0)),
                    pl.BlockSpec((hp, n_pad, dd), lambda bb, i: (bb, 0, 0)),
                ],
                out_specs=pl.BlockSpec((hp, q_block, dd), lambda bb, i: (bb, i, 0)),
            )(qp, kp, vp)
            return out[:, :nn_]

        return impl

    flops = 2 * 2 * b * h * n * n * d
    ref = None
    for mode in "ABCDE":
        t = timed(run(mode))
        out = np.asarray(jax.jit(run(mode))(q, k, v), np.float32)
        if ref is None:
            ref = out
        err = np.abs(out - ref).max()
        print(f"mode {mode}: {t * 1e6:8.1f} us  ({flops / t / 1e12:5.1f} TF/s)  "
              f"maxdiff vs A {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
