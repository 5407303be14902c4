"""Layout experiments around the attention kernel (ViT-B 392^2 bs8 bf16).

Times the full attention sublayer x -> qkv GEMM -> attention -> proj GEMM:

  (a) current module: slice q/k/v from [B,N,3,H,D] + 3 fold transposes,
      kernel, unfold transpose
  (b) ONE transpose [B,N,3HD] -> [3,BH,N,D]; kernel reads the 3 views via
      BlockSpec index maps (leading-axis select, no slice copies)
  (c) (b) + kernel writes straight into [B, N, H, D] (no unfold transpose)
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
    from distill_any_depth_tpu.ops.flash_attention import _attn_kernel

    b, n, h, d = 8, 785, 12, 64
    c = h * d
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, n, c), jnp.bfloat16)
    wqkv = jnp.asarray(rng.randn(c, 3 * c) * 0.02, jnp.bfloat16)
    wproj = jnp.asarray(rng.randn(c, c) * 0.02, jnp.bfloat16)

    s = jnp.float32(1.0)
    float(s + 1)
    t0 = time.perf_counter()
    for _ in range(5):
        float(s + 1)
    rtt = (time.perf_counter() - t0) / 5

    def timed(fn, reps=3):
        @jax.jit
        def chain(xx, w1, w2):
            def body(cc, _):
                out = fn(cc, w1, w2)
                return (cc + out * 1e-12).astype(cc.dtype), ()

            cc, _ = jax.lax.scan(body, xx, None, length=ITERS)
            return jnp.sum(cc.astype(jnp.float32).ravel()[:1])

        float(chain(x, wqkv, wproj))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chain(x, wqkv, wproj))
            ts.append(max(time.perf_counter() - t0 - rtt, 1e-9) / ITERS)
        return float(np.median(ts))

    scale = d ** -0.5
    n_pad = fa._round_up(n, 128)
    hp, q_block = fa._pick_tiling(b * h, n_pad, d, 2, False)
    nq_pad = fa._round_up(n, q_block)
    bh = b * h

    def variant_a(xx, w1, w2):
        qkv = (xx @ w1).reshape(b, n, 3, h, d)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        o = fa.mha_flash(q, k, v, None)
        return o.reshape(b, n, c) @ w2

    def qkv3_of(xx, w1):
        qkv = (xx @ w1).reshape(b, n, 3, h, d)
        return jnp.pad(
            qkv.transpose(2, 0, 3, 1, 4).reshape(3, bh, n, d),
            ((0, 0), (0, 0), (0, n_pad - n), (0, 0)),
        )

    def adapter_b(q_ref, k_ref, v_ref, o_ref):
        _attn_kernel(q_ref[0], k_ref[0], v_ref[0], o_ref,
                     hp=hp, n_real=n, scale=scale)

    def variant_b(xx, w1, w2):
        qkv3 = qkv3_of(xx, w1)
        out = pl.pallas_call(
            adapter_b,
            out_shape=jax.ShapeDtypeStruct((bh, nq_pad, d), xx.dtype),
            grid=(bh // hp, nq_pad // q_block),
            in_specs=[
                pl.BlockSpec((1, hp, q_block, d), lambda bb, i: (0, bb, i, 0)),
                pl.BlockSpec((1, hp, n_pad, d), lambda bb, i: (1, bb, 0, 0)),
                pl.BlockSpec((1, hp, n_pad, d), lambda bb, i: (2, bb, 0, 0)),
            ],
            out_specs=pl.BlockSpec((hp, q_block, d), lambda bb, i: (bb, i, 0)),
        )(qkv3, qkv3, qkv3)
        o = out[:, :n].reshape(b, h, n, d).transpose(0, 2, 1, 3)
        return o.reshape(b, n, c) @ w2

    hg = h // hp  # head-groups per batch image

    class _PhaseOut:
        """View adapter: o[h] = value  ->  o_ref[0, :, h, :] = value."""

        def __init__(self, ref):
            self.ref = ref

        def __setitem__(self, hh, val):
            self.ref[0, :, hh, :] = val

    def adapter_c(q_ref, k_ref, v_ref, o_ref):
        _attn_kernel(q_ref[0], k_ref[0], v_ref[0], _PhaseOut(o_ref),
                     hp=hp, n_real=n, scale=scale)

    def variant_c(xx, w1, w2):
        qkv3 = qkv3_of(xx, w1)
        out = pl.pallas_call(
            adapter_c,
            out_shape=jax.ShapeDtypeStruct((b, nq_pad, h, d), xx.dtype),
            grid=(bh // hp, nq_pad // q_block),
            in_specs=[
                pl.BlockSpec((1, hp, q_block, d), lambda bb, i: (0, bb, i, 0)),
                pl.BlockSpec((1, hp, n_pad, d), lambda bb, i: (1, bb, 0, 0)),
                pl.BlockSpec((1, hp, n_pad, d), lambda bb, i: (2, bb, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, q_block, hp, d), lambda bb, i: (bb // hg, i, bb % hg, 0)
            ),
        )(qkv3, qkv3, qkv3)
        return out[:, :n].reshape(b, n, c) @ w2

    def adapter_d(qkv_ref, o_ref):
        blk = qkv_ref[0]  # [qb or n_pad? loaded per spec]
        # blk: [q_block, 3, hp, d] for q spec; but we pass two operands:
        # handled below — this adapter unused.

    def variant_d(xx, w1, w2):
        """Kernel reads q/k/v straight from [B, N, 3, H, D] — zero XLA
        transposes; the per-head gather happens in VMEM."""
        qkv = (xx @ w1).reshape(b, n, 3, h, d)
        qkv = jnp.pad(qkv, ((0, 0), (0, n_pad - n), (0, 0), (0, 0), (0, 0)))

        def kern(q_ref, k_ref, v_ref, o_ref):
            for hh in range(hp):
                q_ = q_ref[0, :, 0, hh, :]
                k_ = k_ref[0, :, 0, hh, :]
                v_ = v_ref[0, :, 0, hh, :]
                s = jax.lax.dot_general(
                    q_, k_, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale
                col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = jnp.where(col < n, s, -jnp.inf)
                m = jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s - m).astype(q_.dtype)
                denom = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
                o = jax.lax.dot_general(
                    e, v_, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                o_ref[0, :, hh, :] = (o / denom).astype(o_ref.dtype)

        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((b, nq_pad, h, d), xx.dtype),
            grid=(b * h // hp, nq_pad // q_block),
            in_specs=[
                pl.BlockSpec((1, q_block, 1, hp, d),
                             lambda bb, i: (bb // hg, i, 0, bb % hg, 0)),
                pl.BlockSpec((1, n_pad, 1, hp, d),
                             lambda bb, i: (bb // hg, 0, 1, bb % hg, 0)),
                pl.BlockSpec((1, n_pad, 1, hp, d),
                             lambda bb, i: (bb // hg, 0, 2, bb % hg, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, q_block, hp, d), lambda bb, i: (bb // hg, i, bb % hg, 0)
            ),
        )(qkv, qkv, qkv)
        return out[:, :n].reshape(b, n, c) @ w2

    ta = timed(variant_a)
    print(f"(a) slices + transposes : {ta * 1e6:8.1f} us", flush=True)
    try:
        td = timed(variant_d)
        print(f"(d) direct bn3hd reads  : {td * 1e6:8.1f} us", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"(d) FAIL {type(e).__name__}: {str(e)[:160]}")
    rb = None
    try:
        tb = timed(variant_b)
        print(f"(b) one fold, view maps : {tb * 1e6:8.1f} us", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"(b) FAIL {type(e).__name__}: {str(e)[:120]}")
    try:
        tc = timed(variant_c)
        print(f"(c) b + direct out write: {tc * 1e6:8.1f} us", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"(c) FAIL {type(e).__name__}: {str(e)[:120]}")

    ra = np.asarray(jax.jit(variant_a)(x, wqkv, wproj), np.float32)
    try:
        rb = np.asarray(jax.jit(variant_b)(x, wqkv, wproj), np.float32)
        print("b maxdiff", np.abs(ra - rb).max())
    except Exception:  # noqa: BLE001
        pass
    try:
        rc = np.asarray(jax.jit(variant_c)(x, wqkv, wproj), np.float32)
        print("c maxdiff", np.abs(ra - rc).max())
    except Exception:  # noqa: BLE001
        pass


if __name__ == "__main__":
    main()
