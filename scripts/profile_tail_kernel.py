"""Sweep the fused DPT-tail kernel's tile size against the packed XLA tail.

The kernel's VMEM gate (ops/dpt_tail._vmem_estimate) double-counts f32
accumulators and their bf16 casts, so the static pick can be pessimistic.
This harness overrides the budget to force successively larger row tiles at
the ViT-B 392^2 head shape and measures the standalone tail time on the
real chip, plus the packed XLA tail as the baseline.

Self-bounded by --max_minutes (the axon chip wedges for ~20-40 min if a
client is killed mid-compile, so NEVER run this under `timeout`): the
sweep stops launching new compiles once the budget is spent but always
finishes the one in flight.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--budgets_mb", default="14,20,28,40",
                    help="comma list of VMEM budget overrides to sweep")
    ap.add_argument("--max_minutes", type=float, default=12.0)
    args = ap.parse_args()
    deadline = time.perf_counter() + args.max_minutes * 60

    import jax
    import jax.numpy as jnp

    import distill_any_depth_tpu.ops.dpt_tail as dt

    rng = np.random.RandomState(0)
    ht, wt, ci, cm, oh, ow = 112, 112, 128, 64, 392, 392
    t = jnp.asarray(rng.randn(8, ht, wt, ci) * 0.5, jnp.bfloat16)
    k1 = jnp.asarray(rng.randn(3, 3, ci, cm) * 0.05, jnp.bfloat16)
    b1 = jnp.asarray(rng.randn(cm) * 0.1, jnp.float32)
    k2 = jnp.asarray(rng.randn(3, 3, cm, 32) * 0.05, jnp.bfloat16)
    b2 = jnp.asarray(rng.randn(32) * 0.1, jnp.float32)
    kd = jnp.asarray(rng.randn(32, 1) * 0.2, jnp.float32)
    bd = jnp.asarray(rng.randn(1) * 0.1, jnp.float32)

    s = jnp.float32(1.0)
    float(s + 1)
    t0 = time.perf_counter()
    for _ in range(5):
        float(s + 1)
    rtt = (time.perf_counter() - t0) / 5
    print(f"rtt {rtt*1e3:.1f} ms", flush=True)

    def timed(f, label):
        tc = time.perf_counter()
        try:
            float(f(t).ravel()[0])
        except Exception as e:  # compile or VMEM failure is a data point
            print(f"{label}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            return
        comp = time.perf_counter() - tc
        ts = []
        for _ in range(5):
            tc = time.perf_counter()
            float(f(t).ravel()[0])
            ts.append(max(time.perf_counter() - tc - rtt, 1e-9))
        print(f"{label}: {np.median(ts)*1e3:.2f} ms (compile {comp:.0f}s)",
              flush=True)

    # baseline: the packed XLA tail (same math, tail_reference is the
    # spatial formulation — close enough for a standalone floor, and the
    # model-level number already exists in DESIGN.md)
    ref = jax.jit(lambda t: dt.tail_reference(
        t, (oh, ow), k1, b1, k2, b2, kd, bd, trailing_relu=True,
        dtype=jnp.bfloat16))
    timed(ref, "spatial XLA tail")

    seen = set()
    for mb in (int(x) for x in args.budgets_mb.split(",")):
        if time.perf_counter() > deadline:
            print("time budget spent; stopping sweep", flush=True)
            break
        dt._VMEM_BUDGET = mb << 20
        ty = dt._pick_tile(ht, wt, ci, oh, ow, cm, 32, 2)
        if ty in seen or not ty:
            print(f"budget {mb}MB -> ty={ty} (skipped)", flush=True)
            continue
        seen.add(ty)
        fk = jax.jit(lambda t: dt.fused_dpt_tail(
            t, (oh, ow), k1, b1, k2, b2, kd, bd, trailing_relu=True,
            interpret=False))
        timed(fk, f"fused ty={ty} (budget {mb}MB)")
        fk.clear_cache()


if __name__ == "__main__":
    main()
