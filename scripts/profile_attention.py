"""Micro-benchmark of the attention op at the ViT-B 392^2 operating point.

Compares (on the real chip, chained on-device like bench.py):
- the repo's Pallas kernel at its auto-picked tiling and a grid of
  (heads_per_program, q_block) overrides,
- the einsum reference path,
- jax.experimental.pallas.ops.tpu.flash_attention (stock kernel),
- the end-to-end Attention-module shape (with qkv GEMM + reshapes) to
  expose layout/transpose overhead around the kernel.
"""
from __future__ import annotations

import argparse
import time

import numpy as np

ITERS = 30


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=785)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--dim", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from distill_any_depth_tpu.ops import flash_attention as fa_mod
    from distill_any_depth_tpu.ops.attention import mha_reference

    b, n, h, d = args.batch, args.seq, args.heads, args.dim
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, n, h, d), jnp.bfloat16)
    k = jnp.asarray(rng.randn(b, n, h, d), jnp.bfloat16)
    v = jnp.asarray(rng.randn(b, n, h, d), jnp.bfloat16)

    s = jnp.float32(1.0)
    float(s + 1)
    t0 = time.perf_counter()
    for _ in range(5):
        float(s + 1)
    rtt = (time.perf_counter() - t0) / 5

    def timed(fn, *xs, reps=3):
        @jax.jit
        def chain(*xs):
            def body(c, _):
                out = fn(c, *xs[1:])
                return (c + out * 1e-12).astype(c.dtype), ()

            c, _ = jax.lax.scan(body, xs[0], None, length=ITERS)
            return jnp.sum(c.astype(jnp.float32).ravel()[:1])

        float(chain(*xs))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chain(*xs))
            ts.append(max(time.perf_counter() - t0 - rtt, 1e-9) / ITERS)
        return float(np.median(ts))

    results = {}

    results["einsum"] = timed(lambda qq, kk, vv: mha_reference(qq, kk, vv), q, k, v)
    results["flash_auto"] = timed(
        lambda qq, kk, vv: fa_mod.mha_flash(qq, kk, vv, None), q, k, v
    )

    # tiling grid on the repo kernel
    orig_pick = fa_mod._pick_tiling
    n_pad = fa_mod._round_up(n, 128)
    for hp in (1, 2, 4, 8, 12):
        if (b * h) % hp:
            continue
        for qb in (128, 256, 512, n_pad):
            if qb > n_pad:
                continue
            fa_mod._pick_tiling = lambda *a, _hp=hp, _qb=qb, **kw: (_hp, _qb)
            try:
                results[f"flash_hp{hp}_qb{qb}"] = timed(
                    lambda qq, kk, vv: fa_mod.mha_flash(qq, kk, vv, None), q, k, v
                )
            except Exception as e:  # noqa: BLE001
                results[f"flash_hp{hp}_qb{qb}"] = f"FAIL {type(e).__name__}"
    fa_mod._pick_tiling = orig_pick

    # stock JAX kernel, [B, H, N, D] layout
    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention as stock_fa,
        )

        qh = jnp.transpose(q, (0, 2, 1, 3))
        kh = jnp.transpose(k, (0, 2, 1, 3))
        vh = jnp.transpose(v, (0, 2, 1, 3))

        results["stock_bhnd"] = timed(
            lambda qq, kk, vv: stock_fa(qq, kk, vv, sm_scale=d**-0.5), qh, kh, vh
        )

        # stock kernel including the layout round-trip our module would need
        def stock_from_bnhd(qq, kk, vv):
            o = stock_fa(
                jnp.transpose(qq, (0, 2, 1, 3)),
                jnp.transpose(kk, (0, 2, 1, 3)),
                jnp.transpose(vv, (0, 2, 1, 3)),
                sm_scale=d**-0.5,
            )
            return jnp.transpose(o, (0, 2, 1, 3))

        results["stock_bnhd_roundtrip"] = timed(stock_from_bnhd, q, k, v)
    except Exception as e:  # noqa: BLE001
        results["stock"] = f"FAIL {type(e).__name__}: {e}"

    flops = 2 * 2 * b * h * n * n * d  # fwd qk + pv, real (unpadded) tokens
    for name, t in sorted(results.items(), key=lambda kv: (isinstance(kv[1], str), kv[1])):
        if isinstance(t, str):
            print(f"{name:24s}: {t}")
        else:
            print(f"{name:24s}: {t * 1e6:8.1f} us  ({flops / t / 1e12:6.1f} TF/s)")


if __name__ == "__main__":
    main()
