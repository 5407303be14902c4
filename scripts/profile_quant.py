"""bf16 vs int8-W8A8 full-model forwards at the two hot operating points:

- ViT-L teacher, 392^2 batch 16 (the distill-step teacher forward)
- ViT-B student, 392^2 batch 8 (the inference bench point)
- ViT-L teacher, 518^2 batch 8 (the pseudo-label path)
"""
from __future__ import annotations

import argparse
import time

import numpy as np

ITERS = 10


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", default="teacher392,student392,teacher518")
    ap.add_argument("--quants", default="int8",
                    help="comma list of quant modes to compare vs bf16 "
                         "(int8 and/or int8_pallas)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from distill_any_depth_tpu.models.factory import create_model, init_params

    s = jnp.float32(1.0)
    float(s + 1)
    t0 = time.perf_counter()
    for _ in range(5):
        float(s + 1)
    rtt = (time.perf_counter() - t0) / 5

    def timed_chain(model, params, x, reps=3):
        @jax.jit
        def chain(pr, x0):
            def body(c, _):
                depth, _ = model.apply({"params": pr}, c)
                return c + (depth[..., None] * 1e-12).astype(c.dtype), ()

            c, _ = jax.lax.scan(body, x0, None, length=ITERS)
            return jnp.sum(c.astype(jnp.float32).ravel()[:1])

        float(chain(params, x))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chain(params, x))
            ts.append(max(time.perf_counter() - t0 - rtt, 1e-9) / ITERS)
        return float(np.median(ts))

    points = {
        "teacher392": ("depthanything-large", 16, 392),
        "student392": ("depthanything-base", 8, 392),
        "teacher518": ("depthanything-large", 8, 518),
    }
    rng = np.random.RandomState(0)
    for key in args.points.split(","):
        arch, b, size = points[key]
        mb = create_model(arch, dtype=jnp.bfloat16)
        params = init_params(mb, 0, image_size=size)
        x = jnp.asarray(rng.rand(b, size, size, 3), jnp.bfloat16)
        t_b = timed_chain(mb, params, x)
        line = f"{key} ({arch} bs{b} {size}px): bf16 {t_b*1e3:7.2f} ms ({b/t_b:6.1f} img/s)"
        for quant in args.quants.split(","):
            if quant in ("", "none"):
                continue
            mq = create_model(arch, dtype=jnp.bfloat16, quant=quant)
            t_q = timed_chain(mq, params, x)
            line += (
                f" | {quant} {t_q*1e3:7.2f} ms ({b/t_q:6.1f} img/s)"
                f" {t_b/t_q:.2f}x"
            )
        print(line, flush=True)


if __name__ == "__main__":
    main()
