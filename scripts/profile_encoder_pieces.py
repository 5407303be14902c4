"""Fit encoder time = intercept + slope * n_blocks at ViT-B 392^2 bs8 bf16.

Times DinoViT with depth overridden to 1, 4, 8, 12 blocks (same weights
re-initialized per depth — throughput only). The slope is the true per-block
cost; the intercept is everything else (patch embed, pos-embed add, cls
concat, final norm, taps, scan feedback) — the gap profile_inference.py
can't attribute.
"""
from __future__ import annotations

import dataclasses
import time

import numpy as np

ITERS = 10


def main():
    import jax
    import jax.numpy as jnp

    from distill_any_depth_tpu.configs import MODELS
    from distill_any_depth_tpu.models.vit import DinoViT

    def rtt() -> float:
        s = jnp.float32(1.0)
        float(s + 1)
        t0 = time.perf_counter()
        for _ in range(5):
            float(s + 1)
        return (time.perf_counter() - t0) / 5

    _rtt = rtt()

    def timed(make_body, params_arg, x0, reps=3):
        @jax.jit
        def chain(pr, x0):
            def body(c, _):
                return make_body(pr, c), ()

            c, _ = jax.lax.scan(body, x0, None, length=ITERS)
            leaf = jax.tree_util.tree_leaves(c)[0]
            return jnp.sum(leaf.astype(jnp.float32).ravel()[:1])

        float(chain(params_arg, x0))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chain(params_arg, x0))
            ts.append(max(time.perf_counter() - t0 - _rtt, 1e-9) / ITERS)
        return float(np.median(ts))

    size, b = 392, 8
    cfg0 = MODELS["depthanything-base"].encoder
    p = cfg0.patch_size
    gh = gw = size // p
    x = jnp.asarray(np.random.RandomState(0).rand(b, size, size, 3), jnp.bfloat16)

    pts = []
    for depth in (1, 4, 8, 12):
        cfg = dataclasses.replace(
            cfg0, depth=depth,
            out_indices=tuple(min(i, depth - 1) for i in cfg0.out_indices),
        )
        enc = DinoViT(cfg, dtype=jnp.bfloat16)
        params = enc.init(jax.random.PRNGKey(0), x)["params"]

        def body(pr, c, enc=enc):
            taps, _ = enc.apply({"params": pr}, c)
            t = taps[3]
            fb = t[:, : gh * gw].reshape(b, gh, gw, -1)[..., :1]
            fb = jnp.repeat(jnp.repeat(fb, p, 1), p, 2)
            return c + (fb * 1e-12).astype(c.dtype)

        t = timed(body, params, x)
        pts.append((depth, t))
        print(f"depth {depth:2d}: {t * 1e3:7.2f} ms", flush=True)

    ds = np.array([d for d, _ in pts], float)
    ts = np.array([t for _, t in pts], float)
    slope, intercept = np.polyfit(ds, ts, 1)
    print(f"per-block : {slope * 1e3:6.3f} ms")
    print(f"intercept : {intercept * 1e3:6.3f} ms (embed+pos+norm+taps+feedback)")


if __name__ == "__main__":
    main()
