"""Packed-attention kernel: cost of the n_valid key mask + exp precision.

VERDICT r4 #7 asks for one more measured attempt at the D=64 attention
floor (~269 us/block vs ~200 us). The per-head iota+where mask over the
[Bq, Nk] f32 scores is 2 full VPU passes x hd heads per grid step; this
measures two restructurings (full ViT-B-forward-shaped standalone calls,
B=8 H=12 N=792 n_valid=785 D=64, scan-chained):

  where   — current kernel (mask scores per head)
  kzero   — zero the 7 pad k/v ROWS once per grid step ([Nk,128] pass,
            shared by both heads) so pad scores are EXACTLY 0; correct
            denom by (nk-n_real)*exp(-m). Mathematically exact.
  expbf16 — exp on a bf16 argument (result was already quantized to bf16)
  kzero+expbf16

    python scripts/profile.py attn_mask
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ITERS = 400  # 40 iters x ~175 us = 7 ms drowned in ~25 ms tunnel-RTT noise
REPS = 5
B, H, N, NV, D = 8, 12, 792, 785, 64


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from distill_any_depth_tpu.ops import flash_attention as fa

    def kernel_v(q_ref, k_ref, v_ref, o_ref, *, hd, d, n_real, scale,
                 mask_mode, exp_bf16):
        q2 = q_ref[0]
        k2 = k_ref[0]
        v2 = v_ref[0]
        nk = k2.shape[0]
        pad = nk > n_real
        if pad and mask_mode == "kzero":
            row = jax.lax.broadcasted_iota(jnp.int32, k2.shape, 0)
            k2 = jnp.where(row < n_real, k2, 0)
            v2 = jnp.where(row < n_real, v2, 0)
        outs = []
        for hh in range(hd):
            sl = slice(hh * d, (hh + 1) * d)
            scores = jax.lax.dot_general(
                q2[:, sl], k2[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            if pad and mask_mode == "where":
                col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
                scores = jnp.where(col < n_real, scores, -jnp.inf)
            m = jnp.max(scores, axis=-1, keepdims=True)
            arg = scores - m
            if exp_bf16:
                e = jnp.exp(arg.astype(q2.dtype))
            else:
                e = jnp.exp(arg).astype(q2.dtype)
            denom = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
            if pad and mask_mode == "kzero":
                # pad columns carry scores==0.0 exactly -> each contributed
                # exp(-m); v pad rows are zero so PV is clean already
                denom = denom - (nk - n_real) * jnp.exp(-m)
            o = jax.lax.dot_general(
                e, v2[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            outs.append((o / denom).astype(q2.dtype))
        o_ref[0] = outs[0] if len(outs) == 1 else jnp.concatenate(outs, -1)

    def packed_fwd(qkv, mask_mode, exp_bf16, lanes=None):
        b, n, c3 = qkv.shape
        c = c3 // 3
        d = D
        lanes = lanes or fa._packed_lanes(b, c, 128)
        hd = lanes // d
        groups = c // lanes
        n_pad = fa._round_up(n, 8)
        kernel = functools.partial(
            kernel_v, hd=hd, d=d, n_real=NV, scale=d ** -0.5,
            mask_mode=mask_mode, exp_bf16=exp_bf16)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((b, n_pad, c), qkv.dtype),
            grid=(b, 1, groups),
            in_specs=[
                pl.BlockSpec((1, n_pad, lanes), lambda bi, i, g: (bi, 0, g)),
                pl.BlockSpec((1, n_pad, lanes),
                             lambda bi, i, g, _gr=groups: (bi, 0, _gr + g)),
                pl.BlockSpec((1, n_pad, lanes),
                             lambda bi, i, g, _gr=groups: (bi, 0, 2 * _gr + g)),
            ],
            out_specs=pl.BlockSpec((1, n_pad, lanes),
                                   lambda bi, i, g: (bi, i, g)),
        )(qkv, qkv, qkv)[:, :n]

    rng = np.random.RandomState(0)
    qkv = jnp.asarray(rng.randn(B, N, 3 * H * D) * 0.3, jnp.bfloat16)

    s = jnp.float32(1.0)
    float(s + 1)
    t0 = time.perf_counter()
    for _ in range(5):
        float(s + 1)
    rtt = (time.perf_counter() - t0) / 5

    ref = None

    def timed(fn, label, check=False):
        nonlocal ref

        @jax.jit
        def chain(x):
            def body(c, _):
                o = fn(c)
                return c + (jnp.mean(o) * 1e-12).astype(c.dtype), ()

            c, _ = jax.lax.scan(body, x, None, length=ITERS)
            return jnp.sum(c[0, 0].astype(jnp.float32))

        try:
            float(chain(qkv))
        except Exception as e:
            print(f"{label}: FAIL {str(e)[:100]}", flush=True)
            return
        if check:
            out = np.asarray(fn(qkv), np.float32)[:, :NV]
            if ref is None:
                ref = out
            else:
                d_ = np.abs(out - ref).max()
                print(f"  ({label} vs where: max abs diff {d_:.2e})", flush=True)
        ts = []
        for _ in range(REPS):
            t1 = time.perf_counter()
            float(chain(qkv))
            ts.append((time.perf_counter() - t1 - rtt) / ITERS)
        print(f"{label:16s}: {min(ts) * 1e6:8.1f} us", flush=True)

    timed(lambda x: packed_fwd(x, "where", False), "where (old)", True)
    timed(lambda x: packed_fwd(x, "kzero", False), "kzero", True)
    timed(lambda x: packed_fwd(x, "where", True), "expbf16", True)
    timed(lambda x: packed_fwd(x, "kzero", True), "kzero+expbf16", True)
    # wider head groups: same total kv DMA volume (b*2*n*C regardless of
    # lanes) but half/third the grid programs -> less per-program overhead
    timed(lambda x: packed_fwd(x, "kzero", False, lanes=256),
          "kzero lanes=256", True)
    timed(lambda x: packed_fwd(x, "kzero", False, lanes=384),
          "kzero lanes=384", True)
    timed(lambda x: fa._packed_fwd_impl(x, H, False, NV), "module impl", True)


if __name__ == "__main__":
    main()
