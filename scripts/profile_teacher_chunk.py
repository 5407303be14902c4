"""Does chunking the bs16 teacher forward into 2x bs8 help?

Round-2 found the DPT head loses ~10% per-image throughput at bs16 vs bs8
(HBM working-set thrash in the full-res tail). The ViT-L teacher inside the
distill step pays bs16; lax.map over two bs8 chunks keeps the math identical
while halving the tail's live working set. Measure both (scan-chained).
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 3
SIZE = 392


def main():
    import jax
    import jax.numpy as jnp

    from bench import _rtt as measure_rtt  # same sync methodology as bench.py
    from distill_any_depth_tpu.models.factory import create_model, init_params

    _rtt = measure_rtt()

    teacher = create_model("depthanything-large", dtype=jnp.bfloat16)
    tp = init_params(teacher, 1, image_size=SIZE)
    rng = np.random.RandomState(0)

    def timed(fwd, x0, reps=3):
        @jax.jit
        def chain(pr, x0):
            def body(c, _):
                d = fwd(pr, c)
                return c + (d[..., None] * 1e-12).astype(c.dtype), ()

            c, _ = jax.lax.scan(body, x0, None, length=ITERS)
            return jnp.sum(c.astype(jnp.float32).ravel()[:1])

        t0 = time.perf_counter()
        float(chain(tp, x0))
        print(f"  (compiled in {time.perf_counter() - t0:.0f}s)", flush=True)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chain(tp, x0))
            ts.append(max(time.perf_counter() - t0 - _rtt, 1e-9) / ITERS)
        return float(np.median(ts))

    x16 = jnp.asarray(rng.rand(16, SIZE, SIZE, 3), jnp.float32)

    # Both variants drop the teacher's feature output (second tuple element)
    # that the real distill step also consumes. That is fine for timing: the
    # feature tap is a post-norm read of an encoder layer already computed
    # for the head, so discarding it does not let XLA skip any work.
    def plain(pr, c):
        d, f = teacher.apply({"params": pr}, c.astype(jnp.bfloat16))
        return d

    def chunked(pr, c):
        xs = c.reshape(2, 8, SIZE, SIZE, 3)
        ds = jax.lax.map(
            lambda xx: teacher.apply({"params": pr}, xx.astype(jnp.bfloat16))[0],
            xs,
        )
        return ds.reshape(16, *ds.shape[2:])

    print(f"teacher bs16 plain   : {timed(plain, x16) * 1e3:8.1f} ms", flush=True)
    print(f"teacher 2x bs8 chunks: {timed(chunked, x16) * 1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
