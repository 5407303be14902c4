"""Decompose ViT-B 392^2 inference time on the real TPU: encoder vs DPT head.

Uses the bench.py timing recipe (on-device lax.scan chains with a real data
dependency + single value fetch, minus the tunnel's scalar-fetch RTT).
Prints one JSON line per component. Used to target single-chip optimization
(VERDICT round 1: ~17% est. MFU; the head's low-channel convs are the
suspected bandwidth-bound tail).
"""
from __future__ import annotations

import json
import time

import numpy as np

BATCH = 8
SIZE = 392
ITERS = 10


def main() -> None:
    import jax
    import jax.numpy as jnp

    from distill_any_depth_tpu.configs import MODELS
    from distill_any_depth_tpu.models.factory import create_model, init_params
    from distill_any_depth_tpu.models.vit import DinoViT

    cfg = MODELS["depthanything-base"]
    model = create_model(cfg, dtype=jnp.bfloat16)
    params = init_params(model, 0, image_size=SIZE)
    enc = DinoViT(cfg.encoder, dtype=jnp.bfloat16)

    s = jnp.float32(1.0)
    float(s + 1)
    t0 = time.perf_counter()
    for _ in range(5):
        float(s + 1)
    rtt = (time.perf_counter() - t0) / 5
    print(json.dumps({"metric": "rtt_ms", "value": round(rtt * 1e3, 2)}), flush=True)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(BATCH, SIZE, SIZE, 3), jnp.bfloat16)

    def timed(name, chain_fn, *args):
        fn = jax.jit(chain_fn)
        float(fn(*args))  # compile + warm
        times = []
        for _ in range(3):
            t = time.perf_counter()
            float(fn(*args))
            times.append(max(time.perf_counter() - t - rtt, 1e-9) / ITERS)
        dt = float(np.median(times))
        print(json.dumps({"metric": name, "value": round(dt * 1e3, 3),
                          "unit": "ms/iter"}), flush=True)
        return dt

    def full_chain(p, x):
        def body(c, _):
            d, _f = model.apply({"params": p}, c)
            return c + (d[..., None] * 1e-12).astype(c.dtype), ()

        c, _ = jax.lax.scan(body, x, None, length=ITERS)
        return jnp.sum(c[0, 0, 0].astype(jnp.float32))

    def enc_chain(p, x):
        def body(c, _):
            taps, _cls = enc.apply({"params": p["pretrained"]}, c)
            return c + (taps[3][:, :1, :3].sum() * 1e-12).astype(c.dtype), ()

        c, _ = jax.lax.scan(body, x, None, length=ITERS)
        return jnp.sum(c[0, 0, 0].astype(jnp.float32))

    t_full = timed("full_ms", full_chain, params, x)
    t_enc = timed("encoder_ms", enc_chain, params, x)
    print(json.dumps({
        "metric": "head_ms_estimate",
        "value": round((t_full - t_enc) * 1e3, 3),
        "unit": "ms/iter",
        "note": "full minus encoder; head+resize+relu tail",
    }))


if __name__ == "__main__":
    main()
