"""Banded vs dense windowed attention on TPU (vitb_window operating points).

Shapes: the windowed ViT-B teacher (window 7, no prefix tokens) at 392, 518,
and 1036 px (grids 28/37/74 -> N = 784/1369/5476). The dense kernel masks
out-of-window pairs but still pays O(N^2) FLOPs; the banded kernel visits
only the ~q_rows+window kv rows each q tile can see.
"""
from __future__ import annotations

import time

import numpy as np

ITERS = 20


def main():
    import jax
    import jax.numpy as jnp

    from distill_any_depth_tpu.ops.flash_attention import mha_flash
    from distill_any_depth_tpu.ops.window import local_window_bias

    s = jnp.float32(1.0)
    float(s + 1)
    t0 = time.perf_counter()
    for _ in range(5):
        float(s + 1)
    rtt = (time.perf_counter() - t0) / 5

    def timed(fn, q, k, v, reps=3):
        @jax.jit
        def chain(qq, kk, vv):
            def body(c, _):
                out = fn(c, kk, vv)
                return (c + out * 1e-12).astype(c.dtype), ()

            c, _ = jax.lax.scan(body, qq, None, length=ITERS)
            return jnp.sum(c.astype(jnp.float32).ravel()[:1])

        float(chain(q, k, v))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chain(q, k, v))
            ts.append(max(time.perf_counter() - t0 - rtt, 1e-9) / ITERS)
        return float(np.median(ts))

    window = 7
    h, d = 12, 64
    for g, b in ((28, 8), (37, 8), (74, 2)):
        n = g * g
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(b, n, h, d), jnp.bfloat16)
        k = jnp.asarray(rng.randn(b, n, h, d), jnp.bfloat16)
        v = jnp.asarray(rng.randn(b, n, h, d), jnp.bfloat16)
        bias = local_window_bias(g, g, window, n_prefix=0)

        from distill_any_depth_tpu.ops import flash_attention as fa

        orig = fa._BANDED_MIN_SEQ
        fa._BANDED_MIN_SEQ = 0  # force the banded path for measurement
        try:
            t_band = timed(
                lambda qq, kk, vv: mha_flash(qq, kk, vv, bias,
                                             band=(g, window)),
                q, k, v,
            )
            r_band = np.asarray(
                jax.jit(lambda qq, kk, vv: mha_flash(
                    qq, kk, vv, bias, band=(g, window)))(q, k, v),
                np.float32,
            )
        finally:
            fa._BANDED_MIN_SEQ = orig
        try:
            t_dense = timed(lambda qq, kk, vv: mha_flash(qq, kk, vv, bias),
                            q, k, v)
            r_dense = np.asarray(
                jax.jit(lambda qq, kk, vv: mha_flash(qq, kk, vv, bias))(
                    q, k, v),
                np.float32,
            )
            err = np.abs(r_dense - r_band).max()
            print(
                f"grid {g}x{g} (N={n:5d}, bs{b}): dense {t_dense * 1e6:9.1f} us"
                f"  banded {t_band * 1e6:9.1f} us  ({t_dense / t_band:4.1f}x)"
                f"  maxdiff {err:.2e}",
                flush=True,
            )
        except Exception as e:
            print(
                f"grid {g}x{g} (N={n:5d}, bs{b}): dense FAIL"
                f" {type(e).__name__}  banded {t_band * 1e6:9.1f} us",
                flush=True,
            )

        # ---- backward: fwd+bwd of sum(attn^2), banded vs dense-mask ----
        # chained like the forward so the ~25 ms axon tunnel RTT amortizes
        def timed_grad(fn, reps=3):
            loss = lambda qq: jnp.sum(  # noqa: E731
                fn(qq, k, v).astype(jnp.float32) ** 2
            )

            @jax.jit
            def chain(qq):
                def body(c, _):
                    gq = jax.grad(loss)(c)
                    return (c + gq * 1e-12).astype(c.dtype), ()

                c, _ = jax.lax.scan(body, qq, None, length=ITERS)
                return jnp.sum(c.astype(jnp.float32).ravel()[:1])

            float(chain(q))
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                float(chain(q))
                ts.append(max(time.perf_counter() - t0 - rtt, 1e-9) / ITERS)
            return float(np.median(ts))

        fa._BANDED_MIN_SEQ = 0
        try:
            tg_band = timed_grad(
                lambda qq, kk, vv: mha_flash(qq, kk, vv, bias,
                                             band=(g, window))
            )
        finally:
            fa._BANDED_MIN_SEQ = orig
        try:
            tg_dense = timed_grad(
                lambda qq, kk, vv: mha_flash(qq, kk, vv, bias)
            )
            print(
                f"  fwd+bwd: dense {tg_dense * 1e3:8.2f} ms  banded "
                f"{tg_band * 1e3:8.2f} ms  ({tg_dense / tg_band:4.1f}x)",
                flush=True,
            )
        except Exception as e:
            # at the 74x74 grid the dense-mask backward cannot compile at
            # all: its full-row bias tile needs 27 MB of scoped VMEM
            print(
                f"  fwd+bwd: dense FAIL ({type(e).__name__})  banded "
                f"{tg_band * 1e3:8.2f} ms",
                flush=True,
            )


if __name__ == "__main__":
    main()
