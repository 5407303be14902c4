"""Inference-throughput batch sweep at ViT-B 392^2 bf16.

Round-2 found bs8 the per-image optimum (438 img/s vs 393 at bs16 — head
HBM thrash). The packed-QKV attention and packed decoder tail changed the
working-set picture; re-measure before trusting the old optimum.
Methodology = bench.py (scan-chained forwards, value-fetch sync, RTT
subtracted).
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZE = 392
ITERS = 10


def main():
    import jax
    import jax.numpy as jnp

    from bench import _rtt as measure_rtt  # same sync methodology as bench.py
    from distill_any_depth_tpu.models.factory import create_model, init_params

    _rtt = measure_rtt()

    model = create_model("depthanything-base", dtype=jnp.bfloat16)
    params = init_params(model, 0, image_size=SIZE)

    for batch in (4, 8, 12, 16):
        @jax.jit
        def forward_chain(p, x):
            def body(carry, _):
                depth, _ = model.apply({"params": p}, carry)
                carry = carry + (depth[..., None] * 1e-12).astype(carry.dtype)
                return carry, ()

            carry, _ = jax.lax.scan(body, x, None, length=ITERS)
            return jnp.sum(carry[0, 0, 0].astype(jnp.float32))

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(batch, SIZE, SIZE, 3), jnp.bfloat16)
        float(forward_chain(params, x))  # compile + warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(forward_chain(params, x))
            ts.append(max(time.perf_counter() - t0 - _rtt, 1e-9) / ITERS)
        dt = float(np.median(ts))
        print(f"bs{batch:2d}: {dt * 1e3:7.2f} ms/batch  {batch / dt:7.1f} img/s",
              flush=True)


if __name__ == "__main__":
    main()
