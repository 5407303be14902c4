"""Benchmark: ViT-B 392^2 on one TPU chip — depth-inference throughput and
the full ViT-L -> ViT-B distillation train step.

Prints one JSON line per metric ({"metric", "value", "unit", "vs_baseline"});
the LAST line is the headline inference metric the driver parses.

Baselines, both measured on this image's host CPU (1 vCPU, torch 2.x,
2026-08-16):
- inference: PyTorch reference DepthAnythingV2 vitb, 392^2, fp32, eval,
  batch 1 -> 0.515 img/s (1941.8 ms/img). BASELINE.md target is >=5x.
- distill step: the reference batch-loop body (two student forwards, ViT-L
  teacher no_grad, 5-loss combine with HDN dr/3, clip, Adam) at bs16 392^2
  fp32 -> see TORCH_CPU_DISTILL_STEPS_S (scripts/measure_torch_train_baseline.py).
"""
from __future__ import annotations

import json
import time

import numpy as np

TORCH_CPU_BASELINE_IMG_S = 0.515
# measured 2026-08-16 via scripts/measure_torch_train_baseline.py:
# 1178.9 s/step (second step, after warmup), bs16 392^2 fp32, 1 thread
TORCH_CPU_DISTILL_STEPS_S = 1.0 / 1178.9
BATCH = 8
SIZE = 392
WARMUP = 3
ITERS = 10
TRAIN_BATCH = 16
TRAIN_CHAIN = 5
PSEUDO_BATCH = 8
PSEUDO_ITERS = 8


def _rtt() -> float:
    """Measure the host<->device scalar-fetch round trip (the tunnel adds
    ~25 ms; block_until_ready returns early on this backend, only a value
    fetch truly syncs)."""
    import jax.numpy as jnp

    s = jnp.float32(1.0)
    float(s + 1)
    t0 = time.perf_counter()
    for _ in range(5):
        float(s + 1)
    return (time.perf_counter() - t0) / 5


def bench_train(rtt: float, teacher_quant: str = "none") -> None:
    """Full distillation step: ViT-L teacher (bf16; lax.map-chunked 2x bs8,
    the TrainConfig.teacher_chunk default) -> ViT-B student (bf16 compute,
    fp32 params/optimizer), bs16 392^2, NYU shared-view path, default loss
    stack (hybrid norm + HDN dr/3). ``teacher_quant="int8"`` additionally
    runs the teacher forward as dynamic-W8A8 GEMMs (opt-in; the headline
    stays bf16 — docs/DESIGN.md int8 section)."""
    import jax
    import jax.numpy as jnp

    from distill_any_depth_tpu.configs import LossConfig, OptimizerConfig
    from distill_any_depth_tpu.models.factory import create_model, init_params
    from distill_any_depth_tpu.train.state import create_train_state
    from distill_any_depth_tpu.train.step import make_train_step

    student = create_model("depthanything-base", dtype=jnp.bfloat16)
    teacher = create_model("depthanything-large", dtype=jnp.bfloat16,
                           quant=teacher_quant)
    sp = init_params(student, 0, image_size=SIZE)
    tp = init_params(teacher, 1, image_size=SIZE)
    state, tx = create_train_state(
        sp, OptimizerConfig(lr=5e-6, warmup_steps=0, schedule="none",
                            total_steps=10_000)
    )
    step = make_train_step(
        lambda p, x: student.apply({"params": p}, x.astype(jnp.bfloat16)),
        [lambda p, x: teacher.apply({"params": p}, x.astype(jnp.bfloat16))],
        tx, LossConfig(), seed=0, views_shared=True, teacher_chunk=8,
    )

    @jax.jit
    def train_chain(state, teacher_params, xs):
        # Chain TRAIN_CHAIN steps on-device (state carries the dependency);
        # per-call dispatch through the tunnel would otherwise distort
        # sub-second step times. Each step consumes its OWN batch — with a
        # loop-invariant x, XLA hoists the entire (stop-gradient) teacher
        # forward out of the scan and the chain measures teacher/5 (caught
        # against a per-call trace, which ran ~1.5x the chain's per-step
        # time).
        def body(st, x):
            st, metrics = step(st, teacher_params, x, x)
            return st, metrics["total"]

        st, totals = jax.lax.scan(body, state, xs)
        return st, totals[-1]

    rng = np.random.RandomState(1)
    x = jnp.asarray(
        rng.rand(TRAIN_CHAIN, TRAIN_BATCH, SIZE, SIZE, 3), jnp.float32
    )

    new_state, total = train_chain(state, (tp,), x)  # compile + warm
    assert np.isfinite(float(total)), float(total)
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        _, total = train_chain(state, (tp,), x)
        float(total)  # value fetch = real sync
        times.append(max(time.perf_counter() - t0 - rtt, 1e-9) / TRAIN_CHAIN)
    dt = float(np.min(times))
    steps_s = 1.0 / dt
    suffix = "_int8_teacher" if teacher_quant == "int8" else ""
    print(
        json.dumps(
            {
                "metric": f"vitl_to_vitb_distill_step_bs16_392{suffix}",
                "value": round(steps_s, 3),
                "unit": "steps/sec/chip",
                "vs_baseline": (
                    round(steps_s / TORCH_CPU_DISTILL_STEPS_S, 2)
                    if TORCH_CPU_DISTILL_STEPS_S
                    else None
                ),
            }
        ),
        flush=True,
    )


def bench_pseudo_label(rtt: float) -> None:
    """ViT-L 518^2 bs8 batched inference — the pseudo-label generation path
    (cli/pseudo_label.py); regressions here were invisible to BENCH_r1-r3."""
    import jax
    import jax.numpy as jnp

    from distill_any_depth_tpu.models.factory import create_model, init_params

    model = create_model("depthanything-large", dtype=jnp.bfloat16)
    params = init_params(model, 2, image_size=518)

    @jax.jit
    def chain(p, x):
        def body(carry, _):
            depth, _ = model.apply({"params": p}, carry)
            carry = carry + (depth[..., None] * 1e-12).astype(carry.dtype)
            return carry, ()

        carry, _ = jax.lax.scan(body, x, None, length=PSEUDO_ITERS)
        return jnp.sum(carry[0, 0, 0].astype(jnp.float32))

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(PSEUDO_BATCH, 518, 518, 3), jnp.bfloat16)
    float(chain(params, x))  # compile + warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(params, x))
        times.append(max(time.perf_counter() - t0 - rtt, 1e-9) / PSEUDO_ITERS)
    dt = float(np.median(times))
    print(
        json.dumps(
            {
                "metric": "vitl_518_pseudo_label_throughput",
                "value": round(PSEUDO_BATCH / dt, 2),
                "unit": "images/sec/chip",
                "vs_baseline": None,
            }
        ),
        flush=True,
    )


def main() -> None:
    import argparse

    import jax
    import jax.numpy as jnp

    from distill_any_depth_tpu.models.factory import create_model, init_params

    ap = argparse.ArgumentParser()
    ap.add_argument("--teacher_quant", default="none", choices=["none", "int8"],
                    help="opt-in: ALSO bench the distill step with a "
                         "dynamic-W8A8 teacher (headline stays bf16)")
    args = ap.parse_args()

    rtt = _rtt()
    bench_train(rtt)
    if args.teacher_quant != "none":
        bench_train(rtt, teacher_quant=args.teacher_quant)
    bench_pseudo_label(rtt)

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
