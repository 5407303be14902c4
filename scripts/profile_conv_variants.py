"""Variants of the DPT tail convs on TPU (bs8 bf16).

conv3x3 stride-1 with few output channels starves the MXU (M=32 of 128
lanes). Exact rewrite: a 4x4/stride-2 conv whose output channels are the 4
output phases (kernel = the 3x3 kernel placed at 4 offsets), then
depth-to-space. 1.42x the FLOPs, but K=16*CI and M=4*CO are MXU-shaped.

(a) plain conv3x3            64->32 @392^2   and 128->64 @224^2
(b) kernel zero-padded to 128 out channels
(c) phase-packed stride-2 conv + d2s
"""
from __future__ import annotations

import time

import numpy as np

ITERS = 20


def phase_pack(k):
    """[3,3,CI,CO] -> [4,4,CI,4*CO]: K'[a:a+3, b:b+3, :, (2a+b)*CO:+CO] = K."""
    import jax.numpy as jnp

    phases = []
    for a in range(2):
        for b in range(2):
            phases.append(jnp.pad(k, ((a, 1 - a), (b, 1 - b), (0, 0), (0, 0))))
    return jnp.concatenate(phases, axis=-1)


def conv_packed(kp, xr, co):
    import jax
    import jax.numpy as jnp

    b, h, w, _ = xr.shape
    z = jax.lax.conv_general_dilated(
        xr, kp, (2, 2), ((1, 2), (1, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # [b, h/2, w/2, 4*co]
    z = z.reshape(b, h // 2, w // 2, 2, 2, co)
    z = z.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, co)
    return z


def main():
    import jax
    import jax.numpy as jnp

    def rtt() -> float:
        s = jnp.float32(1.0)
        float(s + 1)
        t0 = time.perf_counter()
        for _ in range(5):
            float(s + 1)
        return (time.perf_counter() - t0) / 5

    _rtt = rtt()

    def timed(fn, *args, reps=3):
        @jax.jit
        def chain(*a):
            x = a[-1]

            def body(c, _):
                y = fn(*a[:-1], c)
                fb = jnp.sum(y.astype(jnp.float32)) * 1e-12
                return c + fb.astype(c.dtype), ()

            c, _ = jax.lax.scan(body, x, None, length=ITERS)
            return jnp.sum(c.astype(jnp.float32).ravel()[:1])

        float(chain(*args))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chain(*args))
            ts.append(max(time.perf_counter() - t0 - _rtt, 1e-9) / ITERS)
        return float(np.median(ts))

    def conv(kr, xr):
        return jax.lax.conv_general_dilated(
            xr, kr, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    rng = np.random.RandomState(0)

    # correctness (fp32, small, odd + even sizes)
    for hw in (28, 56):
        xs = jnp.asarray(rng.rand(2, hw, hw, 64), jnp.float32)
        ks = jnp.asarray(rng.rand(3, 3, 64, 32) - 0.5, jnp.float32)
        ref = np.asarray(conv(ks, xs))
        got = np.asarray(conv_packed(phase_pack(ks), xs, 32))
        print(f"packed exactness @{hw}: max abs err {np.abs(ref - got).max():.2e}",
              flush=True)

    for (H, CI, CO) in ((392, 64, 32), (224, 128, 64)):
        B = 8
        dt = jnp.bfloat16
        x = jnp.asarray(rng.rand(B, H, H, CI), dt)
        k = jnp.asarray(rng.rand(3, 3, CI, CO) - 0.5, dt)
        ta = timed(conv, k, x)
        print(f"(a) conv3x3 {CI}->{CO} @{H}^2 : {ta * 1e3:7.3f} ms", flush=True)
        kpad = jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, 128 - CO)))
        tb = timed(lambda kk, xx: conv(kk, xx)[..., :CO], kpad, x)
        print(f"(b) pad->128 out        : {tb * 1e3:7.3f} ms", flush=True)
        kp = phase_pack(k)
        tc = timed(lambda kk, xx: conv_packed(kk, xx, CO), kp, x)
        print(f"(c) phase-packed s2+d2s : {tc * 1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
