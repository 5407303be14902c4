"""Benchmark: ViT-B student 392^2 depth inference throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the PyTorch reference (DepthAnythingV2 vitb, 392^2, fp32, eval mode,
batch 1) measured on this image's host CPU: 0.515 img/s (1941.8 ms/img,
1 vCPU, torch 2.x, 2026-08-16). The BASELINE.md target is >=5x that
(>=2.58 img/s); vs_baseline reports the measured multiple.
"""
from __future__ import annotations

import json
import time

import numpy as np

TORCH_CPU_BASELINE_IMG_S = 0.515
BATCH = 8
SIZE = 392
WARMUP = 3
ITERS = 10


def main() -> None:
    import jax
    import jax.numpy as jnp

    from distill_any_depth_tpu.models.factory import create_model, init_params

    model = create_model("depthanything-base", dtype=jnp.bfloat16)
    params = init_params(model, 0, image_size=SIZE)

    @jax.jit
    def forward(p, x):
        depth, feat = model.apply({"params": p}, x)
        return depth.astype(jnp.float32)

    # The TPU is reached through a network tunnel here, so per-iteration
    # host<->device sync would measure round-trip latency, not device
    # throughput (and block_until_ready has been observed returning early on
    # this remote backend). Chain ITERS forwards on-device with lax.scan
    # (each iteration's input depends on the previous output, so nothing can
    # be elided or overlapped), return a scalar, and force a value fetch.
    @jax.jit
    def forward_chain(p, x):
        def body(carry, _):
            depth, _ = model.apply({"params": p}, carry)
            # 1e-12-scaled feedback: a true data dependency XLA cannot fold
            # away (x*0 could be simplified), value change is negligible.
            carry = carry + (depth[..., None] * 1e-12).astype(carry.dtype)
            return carry, ()

        carry, _ = jax.lax.scan(body, x, None, length=ITERS)
        return jnp.sum(carry[0, 0, 0].astype(jnp.float32))

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(BATCH, SIZE, SIZE, 3), jnp.bfloat16)

    # warm up and validate a single forward (full host fetch)
    out = np.asarray(forward(params, x))
    assert out.shape == (BATCH, SIZE, SIZE) and np.isfinite(out).all()

    # measure the host<->device round-trip to subtract it from chain times
    s = jnp.float32(1.0)
    float(s + 1)
    t0 = time.perf_counter()
    for _ in range(5):
        float(s + 1)
    rtt = (time.perf_counter() - t0) / 5

    float(forward_chain(params, x))  # compile + warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(forward_chain(params, x))  # value fetch = real sync
        times.append(max(time.perf_counter() - t0 - rtt, 1e-9) / ITERS)
    dt = float(np.median(times))

    img_s = BATCH / dt
    print(
        json.dumps(
            {
                "metric": "vitb_392_inference_throughput",
                "value": round(img_s, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(img_s / TORCH_CPU_BASELINE_IMG_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
