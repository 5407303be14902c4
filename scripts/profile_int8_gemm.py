"""Is int8 x int8 -> int32 worth it on this chip?

v5e MXU peak: 394 TOPS int8 vs 197 TFLOP/s bf16. This times the ViT GEMM
shapes in bf16 vs int8 (including the dequant epilogue and the dynamic
per-row activation quant that a real W8A8 path must pay) to decide whether a
quantized-teacher mode can beat the bf16 teacher forward.
"""
from __future__ import annotations

import time

import numpy as np

ITERS = 30


def main():
    import jax
    import jax.numpy as jnp

    s = jnp.float32(1.0)
    float(s + 1)
    t0 = time.perf_counter()
    for _ in range(5):
        float(s + 1)
    rtt = (time.perf_counter() - t0) / 5

    def timed(fn, *xs, reps=3):
        @jax.jit
        def chain(*xs):
            def body(car, _):
                out = fn(car, *xs[1:])
                fb = jnp.sum(out.astype(jnp.float32)) * 1e-24
                return (car + fb.astype(car.dtype)).astype(car.dtype), ()

            car, _ = jax.lax.scan(body, xs[0], None, length=ITERS)
            return jnp.sum(car.astype(jnp.float32).ravel()[:1])

        float(chain(*xs))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chain(*xs))
            ts.append(max(time.perf_counter() - t0 - rtt, 1e-9) / ITERS)
        return float(np.median(ts))

    rng = np.random.RandomState(0)
    # ViT-L teacher shapes at bs16 392^2: M = 16*785 = 12560, C = 1024
    for m, kdim, n, tag in [
        (12560, 1024, 3072, "vitl_qkv"),
        (12560, 4096, 1024, "vitl_fc2"),
        (6280, 768, 3072, "vitb_fc1"),
    ]:
        xb = jnp.asarray(rng.randn(m, kdim), jnp.bfloat16)
        wb = jnp.asarray(rng.randn(kdim, n) * 0.02, jnp.bfloat16)
        t_bf16 = timed(lambda x, w: jnp.dot(x, w), xb, wb)

        xi = jnp.asarray(rng.randint(-127, 127, (m, kdim)), jnp.int8)
        wi = jnp.asarray(rng.randint(-127, 127, (kdim, n)), jnp.int8)
        t_int8 = timed(
            lambda x, w: jnp.dot(x, w, preferred_element_type=jnp.int32), xi, wi
        )

        # full W8A8: dynamic per-row activation quant + int8 dot + dequant
        col_scale = jnp.asarray(rng.rand(n) + 0.5, jnp.float32)

        def w8a8(x, w, cs):
            amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
            rs = amax / 127.0
            xq = jnp.round(x.astype(jnp.float32) / rs).astype(jnp.int8)
            acc = jnp.dot(xq, w, preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32) * rs * cs[None, :]).astype(jnp.bfloat16)

        t_w8a8 = timed(w8a8, xb, wi, col_scale)

        fl = 2 * m * kdim * n
        print(
            f"{tag}: bf16 {t_bf16*1e6:7.1f} us ({fl/t_bf16/1e12:6.1f} TF/s) | "
            f"int8 {t_int8*1e6:7.1f} us ({fl/t_int8/1e12:6.1f} TOP/s) | "
            f"w8a8+quant {t_w8a8*1e6:7.1f} us ({fl/t_w8a8/1e12:6.1f} TOP/s)"
        )


if __name__ == "__main__" and not __import__("os").environ.get("PALLAS"):
    main()


def bench_pallas():
    import jax
    import jax.numpy as jnp
    from distill_any_depth_tpu.ops.quant_matmul import w8a8_matmul

    import time as _t
    s = jnp.float32(1.0)
    float(s + 1)
    t0 = _t.perf_counter()
    for _ in range(5):
        float(s + 1)
    rtt = (_t.perf_counter() - t0) / 5

    def timed(fn, *xs, reps=3):
        @jax.jit
        def chain(*xs):
            def body(car, _):
                out = fn(car, *xs[1:])
                fb = jnp.sum(out.astype(jnp.float32)) * 1e-24
                return (car + fb.astype(car.dtype)).astype(car.dtype), ()

            car, _ = jax.lax.scan(body, xs[0], None, length=ITERS)
            return jnp.sum(car.astype(jnp.float32).ravel()[:1])

        float(chain(*xs))
        ts = []
        for _ in range(reps):
            t0 = _t.perf_counter()
            float(chain(*xs))
            ts.append(max(_t.perf_counter() - t0 - rtt, 1e-9) / ITERS)
        return float(np.median(ts))

    rng = np.random.RandomState(0)
    for m, kdim, n, tag in [
        (12560, 1024, 3072, "vitl_qkv"),
        (12560, 4096, 1024, "vitl_fc2"),
        (12560, 1024, 4096, "vitl_fc1"),
        (6280, 768, 3072, "vitb_fc1"),
        (6280, 3072, 768, "vitb_fc2"),
        (6280, 768, 768, "vitb_proj"),
    ]:
        xb = jnp.asarray(rng.randn(m, kdim), jnp.bfloat16)
        wb = jnp.asarray(rng.randn(kdim, n) * 0.02, jnp.bfloat16)
        bias = jnp.asarray(rng.randn(n), jnp.float32)
        t_bf16 = timed(lambda x, w: jnp.dot(x, w) + bias.astype(jnp.bfloat16), xb, wb)
        t_pl = timed(lambda x, w: w8a8_matmul(x, w, bias), xb, wb)
        fl = 2 * m * kdim * n
        print(
            f"{tag}: bf16 {t_bf16*1e6:7.1f} us ({fl/t_bf16/1e12:6.1f} TF/s) | "
            f"pallas w8a8 {t_pl*1e6:7.1f} us ({fl/t_pl/1e12:6.1f} TOP/s) | "
            f"{t_bf16/t_pl:.2f}x", flush=True,
        )


if __name__ == "__main__" and __import__("os").environ.get("PALLAS"):
    bench_pallas()
