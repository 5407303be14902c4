"""v2 fused-tail kernel: tile-size sweep on the flagship shape.

Probes which row tiles actually compile (Mosaic's VMEM ceiling is the real
gate; the analytic estimate is conservative) and times each, vs the v1
kernel and the measured in-context budget of the packed XLA tail (3.04 ms,
scripts/profile_tail_impls.py r5).

    python scripts/profile.py tail_v2 [--sizes 8,16,24,32,40,48,56]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ITERS = 20
REPS = 5


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="8,16,24,32,40,48,56")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from distill_any_depth_tpu.ops import dpt_tail as dt

    rng = np.random.RandomState(0)
    p = dict(
        k1=jnp.asarray(rng.randn(3, 3, 128, 64) * 0.05, jnp.bfloat16),
        b1=jnp.asarray(rng.randn(64) * 0.1, jnp.bfloat16),
        k2=jnp.asarray(rng.randn(3, 3, 64, 32) * 0.05, jnp.bfloat16),
        b2=jnp.asarray(rng.randn(32) * 0.1, jnp.bfloat16),
        kd=jnp.asarray(rng.randn(32, 1) * 0.2, jnp.bfloat16),
        bd=jnp.asarray(rng.randn(1) * 0.1, jnp.float32),
    )
    t = jnp.asarray(rng.randn(8, 112, 112, 128) * 0.5, jnp.bfloat16)

    s = jnp.float32(1.0)
    float(s + 1)
    t0 = time.perf_counter()
    for _ in range(5):
        float(s + 1)
    rtt = (time.perf_counter() - t0) / 5

    def timed(fn, label):
        @jax.jit
        def chain(tt):
            def body(c, _):
                d = fn(c)
                return c + (jnp.mean(d) * 1e-12).astype(c.dtype), ()

            c, _ = jax.lax.scan(body, tt, None, length=ITERS)
            return jnp.sum(c[0, 0, 0].astype(jnp.float32))

        try:
            float(chain(t))
        except Exception as e:
            print(f"{label}: COMPILE FAIL ({type(e).__name__}: {str(e)[:90]})",
                  flush=True)
            return
        ts = []
        for _ in range(REPS):
            t1 = time.perf_counter()
            float(chain(t))
            ts.append((time.perf_counter() - t1 - rtt) / ITERS)
        print(f"{label}: {min(ts) * 1e3:7.3f} ms", flush=True)

    for ty in [int(x) for x in args.sizes.split(",")]:
        timed(lambda tt, ty=ty: dt.fused_dpt_tail_v2(
            tt, (392, 392), trailing_relu=True, force_ty=ty, **p),
            f"v2 ty={ty:2d}")
    timed(lambda tt: dt.fused_dpt_tail(tt, (392, 392), trailing_relu=True, **p),
          "v1 kernel")
    timed(lambda tt: dt.tail_reference(tt, (392, 392), trailing_relu=True,
                                       dtype=jnp.bfloat16, **p),
          "spatial XLA")


if __name__ == "__main__":
    main()
