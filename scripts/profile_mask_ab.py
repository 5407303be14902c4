"""In-process interleaved A/B: where-mask vs kzero packed attention, at the
FULL MODEL level.

Cross-process bench runs through the tunnel wobble ~6-10% (627.6 vs 570.5
img/s for the same code), so a model-level claim about a ~5% kernel change
cannot rest on two separate runs. This compiles BOTH forwards in one
process (monkeypatching ops.flash_attention._packed_kernel before each
trace — pallas_call captures the kernel at trace time) and interleaves the
timed chains A,B,A,B,... so both variants sample the same chip phases.

    python scripts/profile.py mask_ab
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ITERS = 10
REPS = 15
BATCH = 8
SIZE = 392


def main() -> None:
    import jax
    import jax.numpy as jnp

    from distill_any_depth_tpu.models.factory import (
        create_model, init_params, resolve_fused_tail)
    from distill_any_depth_tpu.ops import flash_attention as fa

    kzero_kernel = fa._packed_kernel

    def where_kernel(q_ref, k_ref, v_ref, o_ref, *, hd, d, n_real, scale):
        # the pre-round-5 masking: iota+where on each head's f32 scores
        q2 = q_ref[0]
        k2 = k_ref[0]
        v2 = v_ref[0]
        outs = []
        for hh in range(hd):
            sl = slice(hh * d, (hh + 1) * d)
            scores = jax.lax.dot_general(
                q2[:, sl], k2[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            nk = scores.shape[-1]
            if nk > n_real:
                col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
                scores = jnp.where(col < n_real, scores, -jnp.inf)
            m = jnp.max(scores, axis=-1, keepdims=True)
            e = jnp.exp(scores - m).astype(q2.dtype)
            denom = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                e, v2[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            outs.append((o / denom).astype(q2.dtype))
        o_ref[0] = outs[0] if len(outs) == 1 else jnp.concatenate(outs, -1)

    model = create_model("depthanything-base", dtype=jnp.bfloat16,
                         fused_tail=resolve_fused_tail("auto"))
    params = init_params(model, 0, image_size=SIZE)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(BATCH, SIZE, SIZE, 3), jnp.bfloat16)

    def chain_fn(p, x0):
        def body(carry, _):
            depth, _ = model.apply({"params": p}, carry)
            return carry + (depth[..., None] * 1e-12).astype(carry.dtype), ()

        carry, _ = jax.lax.scan(body, x0, None, length=ITERS)
        return jnp.sum(carry[0, 0, 0].astype(jnp.float32))

    s = jnp.float32(1.0)
    float(s + 1)
    t0 = time.perf_counter()
    for _ in range(5):
        float(s + 1)
    rtt = (time.perf_counter() - t0) / 5

    fa._packed_kernel = where_kernel
    f_where = jax.jit(chain_fn)
    float(f_where(params, x))  # trace+compile with the where kernel
    fa._packed_kernel = kzero_kernel
    f_kzero = jax.jit(functools.partial(chain_fn))  # distinct callable
    float(f_kzero(params, x))

    tw, tk = [], []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(f_where(params, x))
        tw.append((time.perf_counter() - t0 - rtt) / ITERS)
        t0 = time.perf_counter()
        float(f_kzero(params, x))
        tk.append((time.perf_counter() - t0 - rtt) / ITERS)

    def stats(ts, label):
        ts = np.array(ts) * 1e3
        print(f"{label}: min {ts.min():6.2f} ms  median {np.median(ts):6.2f} "
              f"ms  ({BATCH / ts.min() * 1e3:6.1f} img/s at min)", flush=True)
        return ts.min()

    w = stats(tw, "where-mask forward")
    k = stats(tk, "kzero      forward")
    print(f"kzero/where min ratio: {k / w:.4f}", flush=True)


if __name__ == "__main__":
    main()
