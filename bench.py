"""Benchmark: ViT-B 392^2 on one TPU chip — depth-inference throughput, the
full ViT-L -> ViT-B distillation train step (bf16 AND int8 teacher), the
ViT-L 518^2 pseudo-label path, and an analytic-FLOPs MFU companion metric.

Prints one JSON line per metric ({"metric", "value", "unit", "vs_baseline",
"spread_pct"}); the LAST line is the headline inference metric the driver
parses. ``spread_pct`` is 100*(max-min)/min over the repeat chain times —
the dispersion of the measurement itself (VERDICT r4 asked for a judgeable
spread after 532-vs-549 run-to-run noise).

Baselines, all measured on this image's host CPU (1 vCPU, torch 2.x):
- inference: PyTorch reference DepthAnythingV2 vitb, 392^2, fp32, eval,
  batch 1 -> 0.515 img/s (1941.8 ms/img, 2026-08-16). BASELINE.md >=5x.
- distill step: the reference batch-loop body (two student forwards, ViT-L
  teacher no_grad, 5-loss combine with HDN dr/3, clip, Adam) at bs16 392^2
  fp32 -> 1178.9 s/step (scripts/measure_torch_train_baseline.py).
- pseudo-label: reference ViT-L (DAM) 518^2 batched no_grad inference
  -> see TORCH_CPU_PSEUDO_IMG_S (scripts/measure_torch_pseudo_baseline.py).
"""
from __future__ import annotations

import json
import time

import numpy as np

TORCH_CPU_BASELINE_IMG_S = 0.515
# measured 2026-08-16 via scripts/measure_torch_train_baseline.py:
# 1178.9 s/step (second step, after warmup), bs16 392^2 fp32, 1 thread
TORCH_CPU_DISTILL_STEPS_S = 1.0 / 1178.9
# measured 2026-08-20 via scripts/measure_torch_pseudo_baseline.py:
# ViT-L 518^2 batched no_grad inference, fp32, 1 vCPU, 30.82 s/batch2
TORCH_CPU_PSEUDO_IMG_S = 0.0649
# TPU v5e (v5 lite) peak dense bf16 matmul rate, per chip.
V5E_PEAK_BF16_FLOPS = 197e12

BATCH = 8
SIZE = 392
ITERS = 10
TRAIN_BATCH = 16
TRAIN_CHAIN = 5
TRAIN_REPEATS = 5
PSEUDO_BATCH = 8
PSEUDO_ITERS = 8
PSEUDO_REPEATS = 5
INFER_REPEATS = 12  # per window; the headline is min over TWO windows


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


def _measure(run_once, repeats: int, rtt: float, per: int) -> tuple[float, float]:
    """Time ``run_once`` (which must end in a true device sync) ``repeats``
    times; return (min per-unit seconds, spread_pct over the repeats).

    min is the noise-robust statistic here: the device time of a chained
    scan is fixed, and the only variance source (the tunnel) strictly adds
    time — so min-of-N converges on true device time while median still
    carries half the tail.
    """
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        run_once()
        times.append(max(time.perf_counter() - t0 - rtt, 1e-9) / per)
    lo, hi = float(np.min(times)), float(np.max(times))
    return lo, 100.0 * (hi - lo) / lo


def _measure_diff(run_short, run_long, repeats: int, per: int,
                  rtt: float) -> tuple[float, float]:
    """Differential timing: interleave chains doing ``per`` and ``2*per``
    units; (min long - min short) / per cancels the dispatch+fetch
    overhead exactly — immune to the tunnel RTT drifting after the one-time
    calibration. Falls back to rtt-subtracted long-chain timing if the
    difference degenerates (pathological congestion during the short set).
    Returns (per-unit seconds, spread_pct over the long-chain repeats)."""
    ts, tl = [], []
    for _ in range(repeats):
        t0 = time.perf_counter()
        run_short()
        ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        run_long()
        tl.append(time.perf_counter() - t0)
    lo = (float(np.min(tl)) - float(np.min(ts))) / per
    if lo <= 0:
        lo = max(float(np.min(tl)) - rtt, 1e-9) / (2 * per)
    spread = 100.0 * (float(np.max(tl)) - float(np.min(tl))) / float(np.min(tl))
    return lo, spread


def _guard(label: str, fn, attempts: int = 2):
    """Run one bench section, retrying once on transient failures (the
    remote-compile tunnel occasionally drops mid-body: 'response body
    closed before all bytes were read'). A dead section must cost its own
    metric line only — never the headline that follows it."""
    import sys

    for i in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — tunnel errors vary by type
            sys.stderr.write(
                f"bench: {label} attempt {i + 1}/{attempts} failed: "
                f"{type(e).__name__}: {str(e)[:200]}\n")
    return None


def _emit(metric: str, value: float, unit: str, vs_baseline, spread_pct: float | None) -> None:
    line = {"metric": metric, "value": value, "unit": unit,
            "vs_baseline": vs_baseline}
    if spread_pct is not None:
        line["spread_pct"] = round(spread_pct, 2)
    print(json.dumps(line), flush=True)


def _flops_of(compiled) -> float | None:
    """Total FLOPs from XLA cost analysis; None if the backend won't say."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca["flops"])
    except Exception:
        return None


def bench_train(rtt: float, teacher_quant: str = "none") -> None:
    """Full distillation step: ViT-L teacher (bf16; lax.map-chunked 2x bs8,
    the TrainConfig.teacher_chunk default) -> ViT-B student (bf16 compute,
    fp32 params/optimizer), bs16 392^2, NYU shared-view path, default loss
    stack (hybrid norm + HDN dr/3). ``teacher_quant="int8"`` runs the teacher
    forward as dynamic-W8A8 GEMMs (recorded alongside the bf16 headline —
    docs/DESIGN.md int8 section)."""
    import jax
    import jax.numpy as jnp

    from distill_any_depth_tpu.configs import LossConfig, OptimizerConfig
    from distill_any_depth_tpu.models.factory import create_model, init_params
    from distill_any_depth_tpu.train.state import create_train_state
    from distill_any_depth_tpu.train.step import make_train_step

    from distill_any_depth_tpu.models.factory import resolve_fused_tail

    student = create_model("depthanything-base", dtype=jnp.bfloat16)
    teacher = create_model("depthanything-large", dtype=jnp.bfloat16,
                           quant=teacher_quant,
                           fused_tail=resolve_fused_tail("auto"))
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

    _, total = train_chain(state, (tp,), x)  # compile + warm
    assert np.isfinite(float(total)), float(total)
    dt, spread = _measure(
        lambda: float(train_chain(state, (tp,), x)[1]),
        TRAIN_REPEATS, rtt, TRAIN_CHAIN,
    )
    steps_s = 1.0 / dt
    suffix = "_int8_teacher" if teacher_quant == "int8" else ""
    _emit(
        f"vitl_to_vitb_distill_step_bs16_392{suffix}",
        round(steps_s, 3), "steps/sec/chip",
        round(steps_s / TORCH_CPU_DISTILL_STEPS_S, 2), spread,
    )


def bench_pseudo_label(rtt: float) -> None:
    """ViT-L 518^2 bs8 batched inference — the pseudo-label generation path
    (cli/pseudo_label.py); regressions here were invisible to BENCH_r1-r3."""
    import jax
    import jax.numpy as jnp

    from distill_any_depth_tpu.models.factory import create_model, init_params

    from distill_any_depth_tpu.models.factory import resolve_fused_tail

    model = create_model("depthanything-large", dtype=jnp.bfloat16,
                         fused_tail=resolve_fused_tail("auto"))
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
    dt, spread = _measure(
        lambda: float(chain(params, x)), PSEUDO_REPEATS, rtt, PSEUDO_ITERS
    )
    img_s = PSEUDO_BATCH / dt
    _emit(
        "vitl_518_pseudo_label_throughput", round(img_s, 2),
        "images/sec/chip", round(img_s / TORCH_CPU_PSEUDO_IMG_S, 2), spread,
    )


def _enable_compile_cache() -> None:
    """Persistent XLA compile cache: the bench is compile-dominated (two
    train-step compiles run minutes each through the tunnel); a warm cache
    makes repeat runs measure the chip, not the compiler. Keyed on compiler
    version + flags, so safe across upgrades."""
    import os

    import jax

    cache = os.environ.get("DAD_BENCH_COMPILE_CACHE",
                           os.path.expanduser("~/.cache/dad_xla_bench_cache"))
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def main() -> None:
    import argparse

    import jax
    import jax.numpy as jnp

    from distill_any_depth_tpu.models.factory import create_model, init_params

    _enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip_int8", action="store_true",
                    help="skip the int8-teacher distill-step metric "
                         "(saves one large compile)")
    args = ap.parse_args()

    rtt = _rtt()

    from distill_any_depth_tpu.models.factory import resolve_fused_tail

    # The timed model runs the fused Pallas DPT-tail (inference default);
    # the packed-tail twin computes the analytic FLOPs (identical math —
    # XLA cost analysis cannot see inside a custom call).
    model = create_model("depthanything-base", dtype=jnp.bfloat16,
                         fused_tail=resolve_fused_tail("auto"))
    model_packed = create_model("depthanything-base", dtype=jnp.bfloat16)
    params = init_params(model_packed, 0, image_size=SIZE)

    @jax.jit
    def forward(p, x):
        depth, feat = model_packed.apply({"params": p}, x)
        return depth.astype(jnp.float32)

    # The TPU is reached through a network tunnel here, so per-iteration
    # host<->device sync would measure round-trip latency, not device
    # throughput (and block_until_ready has been observed returning early on
    # this remote backend). Chain ITERS forwards on-device with lax.scan
    # (each iteration's input depends on the previous output, so nothing can
    # be elided or overlapped), return a scalar, and force a value fetch.
    def _chain(length):
        @jax.jit
        def forward_chain(p, x):
            def body(carry, _):
                depth, _ = model.apply({"params": p}, carry)
                # 1e-12-scaled feedback: a true data dependency XLA cannot
                # fold away (x*0 could be simplified), value change is
                # negligible.
                carry = carry + (depth[..., None] * 1e-12).astype(carry.dtype)
                return carry, ()

            carry, _ = jax.lax.scan(body, x, None, length=length)
            return jnp.sum(carry[0, 0, 0].astype(jnp.float32))

        return forward_chain

    # Differential timing: the one-time RTT calibration goes stale when the
    # tunnel congests mid-bench (a fetch drifting 25 -> 60 ms on a ~135 ms
    # chain reads as a 25% slowdown — the 33%-spread capture). Chains of
    # length N and 2N pay IDENTICAL dispatch+fetch overhead, so
    # (min t_2N - min t_N) / N measures pure device time, whatever the
    # tunnel is doing.
    forward_chain = _chain(ITERS)
    forward_chain2 = _chain(2 * ITERS)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(BATCH, SIZE, SIZE, 3), jnp.bfloat16)

    # warm up and validate a single forward (full host fetch); retried —
    # a transient tunnel drop here must not cost the whole bench
    out = _guard("forward_warmup", lambda: np.asarray(forward(params, x)),
                 attempts=3)
    assert out is not None, "forward compile failed 3x; aborting bench"
    assert out.shape == (BATCH, SIZE, SIZE) and np.isfinite(out).all()

    _guard("chain_warmup", lambda: float(forward_chain(params, x)),
           attempts=3)  # compile + warm
    _guard("chain2_warmup", lambda: float(forward_chain2(params, x)),
           attempts=3)

    # The tunneled chip's delivered rate drifts ~6-10% on a minutes scale
    # (same binary measured 627.6 then 570.5 img/s in back-to-back bench
    # runs; an interleaved in-process A/B pinned the code as identical —
    # scripts/profile_mask_ab.py). One timing window samples one phase, so
    # the headline is measured in TWO windows separated by the multi-minute
    # train/pseudo benches, and min-of-both is the estimator of what the
    # hardware + this code can do.
    dt1, spread1 = _measure_diff(
        lambda: float(forward_chain(params, x)),
        lambda: float(forward_chain2(params, x)), INFER_REPEATS, ITERS, rtt
    )

    _guard("train_bf16", lambda: bench_train(rtt))
    if not args.skip_int8:
        _guard("train_int8", lambda: bench_train(rtt, teacher_quant="int8"))
    _guard("pseudo_label", lambda: bench_pseudo_label(rtt))

    w2 = _guard("forward_window2", lambda: _measure_diff(
        lambda: float(forward_chain(params, x)),
        lambda: float(forward_chain2(params, x)), INFER_REPEATS, ITERS, rtt
    ))
    dt2, spread2 = w2 if w2 is not None else (dt1, spread1)
    dt = min(dt1, dt2)
    # spread across BOTH windows: the honest dispersion of the recorded min
    hi = max(dt1 * (1 + spread1 / 100), dt2 * (1 + spread2 / 100))
    spread = 100.0 * (hi - dt) / dt

    # Analytic FLOPs from the compiled single forward (exact, tunnel-immune)
    # + the MFU it implies at the measured per-iter time. VERDICT r4 #2:
    # a variance-immune companion so a 4% headline wobble is attributable.
    flops = _flops_of(forward.lower(params, x).compile())
    if flops is not None:
        _emit("vitb_392_forward_gflops_per_batch8", round(flops / 1e9, 1),
              "GFLOP", None, None)
        _emit("vitb_392_forward_mfu", round(flops / dt / V5E_PEAK_BF16_FLOPS, 4),
              "fraction_of_v5e_bf16_peak", None, round(spread, 2))

    img_s = BATCH / dt
    _emit(
        "vitb_392_inference_throughput", round(img_s, 2), "images/sec/chip",
        round(img_s / TORCH_CPU_BASELINE_IMG_S, 2), spread,
    )


if __name__ == "__main__":
    main()
