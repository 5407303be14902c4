"""Does storing params in fp32 (cast to bf16 every forward) cost real time?

Times the full ViT-B 392^2 bs8 bf16 forward with (a) fp32-stored params (the
default init_params layout) and (b) the same params pre-cast to bf16 once on
the host. The delta is the per-forward cast + double-width param HBM reads.
"""
from __future__ import annotations

import time

import numpy as np

ITERS = 10


def main():
    import jax
    import jax.numpy as jnp

    from distill_any_depth_tpu.models.factory import create_model, init_params

    s = jnp.float32(1.0)
    float(s + 1)
    t0 = time.perf_counter()
    for _ in range(5):
        float(s + 1)
    rtt = (time.perf_counter() - t0) / 5

    model = create_model("depthanything-base", dtype=jnp.bfloat16)
    params = init_params(model, 0, image_size=392)
    params_bf16 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params
    )
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(8, 392, 392, 3), jnp.bfloat16)

    def timed(pr, reps=3):
        @jax.jit
        def chain(pr, x0):
            def body(c, _):
                depth, _ = model.apply({"params": pr}, c)
                return c + (depth[..., None] * 1e-12).astype(c.dtype), ()

            c, _ = jax.lax.scan(body, x0, None, length=ITERS)
            return jnp.sum(c.astype(jnp.float32).ravel()[:1])

        float(chain(pr, x))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chain(pr, x))
            ts.append(max(time.perf_counter() - t0 - rtt, 1e-9) / ITERS)
        return float(np.median(ts))

    ta = timed(params)
    tb = timed(params_bf16)
    print(f"fp32-stored params : {ta*1e3:7.2f} ms ({8/ta:6.1f} img/s)", flush=True)
    print(f"bf16-stored params : {tb*1e3:7.2f} ms ({8/tb:6.1f} img/s)", flush=True)
    print(f"speedup {ta/tb:.3f}x", flush=True)


if __name__ == "__main__":
    main()
