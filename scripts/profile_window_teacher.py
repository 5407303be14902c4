"""Measure the WINDOWED ViT-B teacher driven through the real distill step.

VERDICT r3 #3: parity for `depthanything-base-window` stopped at model
forwards; the composition PosConv + window bias + banded kernel +
interp_to_input inside the jitted train step had no measured TPU number.
Reference analog: ViT_DINO.py:875-1264 used as the `vitb` teacher via
dam.py:361-362.

Two measurements (scan-chained, RTT-subtracted, bench.py methodology):

  1. the windowed teacher forward alone at 518^2 (its design resolution:
     37x37 grid = window-bias regime) and at 392^2;
  2. the full distill step: windowed ViT-B teacher at 392^2 -> ViT-B
     student, bs16, default loss stack (matching bench.py's step but with
     the windowed teacher).
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 3
CHAIN = 3


def main():
    import jax
    import jax.numpy as jnp

    from bench import _rtt as measure_rtt  # same sync methodology as bench.py
    from distill_any_depth_tpu.configs import LossConfig, OptimizerConfig
    from distill_any_depth_tpu.models.factory import create_model, init_params
    from distill_any_depth_tpu.train.state import create_train_state
    from distill_any_depth_tpu.train.step import make_train_step

    rtt = measure_rtt()
    rng = np.random.RandomState(0)

    teacher = create_model("depthanything-base-window", dtype=jnp.bfloat16)

    # 1. forward alone
    for size, batch in ((518, 8), (392, 16)):
        tp = init_params(teacher, 1, image_size=size)
        x0 = jnp.asarray(rng.rand(batch, size, size, 3), jnp.bfloat16)

        @jax.jit
        def chain(pr, x0):
            def body(c, _):
                d, _f = teacher.apply({"params": pr}, c)
                return c + (d[..., None] * 1e-12).astype(c.dtype), ()

            c, _ = jax.lax.scan(body, x0, None, length=ITERS)
            return jnp.sum(c.astype(jnp.float32).ravel()[:1])

        t0 = time.perf_counter()
        float(chain(tp, x0))
        print(f"[fwd {size} bs{batch}] compiled in {time.perf_counter()-t0:.0f}s",
              flush=True)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(chain(tp, x0))
            ts.append(max(time.perf_counter() - t0 - rtt, 1e-9) / ITERS)
        dt = float(np.median(ts))
        print(f"[fwd {size} bs{batch}] {dt*1e3:.1f} ms/batch "
              f"({batch/dt:.1f} img/s)", flush=True)

    # 2. full distill step with the windowed teacher at 392^2 bs16
    size, batch = 392, 16
    student = create_model("depthanything-base", dtype=jnp.bfloat16)
    sp = init_params(student, 0, image_size=size)
    tp = init_params(teacher, 1, image_size=size)
    state, tx = create_train_state(
        sp, OptimizerConfig(lr=5e-6, warmup_steps=0, schedule="none",
                            total_steps=10_000))
    step = make_train_step(
        lambda p, x: student.apply({"params": p}, x.astype(jnp.bfloat16)),
        [lambda p, x: teacher.apply({"params": p}, x.astype(jnp.bfloat16))],
        tx, LossConfig(), seed=0, views_shared=True, teacher_chunk=8,
    )

    @jax.jit
    def train_chain(state, teacher_params, xs):
        def body(st, x):
            st, metrics = step(st, teacher_params, x, x)
            return st, metrics["total"]

        st, totals = jax.lax.scan(body, state, xs)
        return st, totals[-1]

    xs = jnp.asarray(rng.rand(CHAIN, batch, size, size, 3), jnp.float32)
    t0 = time.perf_counter()
    _, total = train_chain(state, (tp,), xs)
    assert np.isfinite(float(total)), float(total)
    print(f"[step] compiled in {time.perf_counter()-t0:.0f}s", flush=True)
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        _, total = train_chain(state, (tp,), xs)
        float(total)
        ts.append(max(time.perf_counter() - t0 - rtt, 1e-9) / CHAIN)
    dt = float(np.min(ts))
    print(f"[step] windowed-teacher distill step bs16 392^2: {dt*1e3:.1f} ms "
          f"({1/dt:.3f} steps/s), loss={float(total):.4f}", flush=True)


if __name__ == "__main__":
    main()
