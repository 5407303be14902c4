"""Test two throughput hypotheses at the ViT-B 392^2 point:

A. Params pre-cast to bf16 (serving mode) vs fp32 params cast inside the
   jitted forward — measures whether XLA hoists the casts and the extra
   HBM traffic of fp32 weight reads.
B. Cheap bf16-accurate GELU (degree-7 odd minimax erf polynomial) vs XLA's
   exact erf — the MLP activation is ~240us/block of pure VPU time.
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

    def timed_chain(make_body, params_arg, x0, reps=3, iters=ITERS):
        @jax.jit
        def chain(pr, x0):
            def body(c, _):
                return make_body(pr, c), ()

            c, _ = jax.lax.scan(body, x0, None, length=iters)
            leaf = jax.tree_util.tree_leaves(c)[0]
            return jnp.sum(leaf.astype(jnp.float32).ravel()[:1])

        float(chain(params_arg, x0))
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chain(params_arg, x0))
            times.append(max(time.perf_counter() - t0 - rtt, 1e-9) / iters)
        return float(np.median(times))

    model = create_model("depthanything-base", dtype=jnp.bfloat16)
    params = init_params(model, 0, image_size=392)
    x = jnp.asarray(np.random.RandomState(0).rand(8, 392, 392, 3), jnp.bfloat16)

    def full_body(pr, c):
        depth, _ = model.apply({"params": pr}, c)
        return c + (depth[..., None] * 1e-12).astype(c.dtype)

    t_fp32 = timed_chain(full_body, params, x)
    print(f"A. fp32 params : {t_fp32 * 1e3:7.2f} ms  ({8 / t_fp32:6.1f} img/s)")

    params_bf16 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params
    )
    t_bf16 = timed_chain(full_body, params_bf16, x)
    print(f"A. bf16 params : {t_bf16 * 1e3:7.2f} ms  ({8 / t_bf16:6.1f} img/s)")

    # B: gelu variants on the MLP hidden shape [8*785, 3072]
    h = jnp.asarray(np.random.RandomState(1).randn(8 * 785, 3072), jnp.bfloat16)

    def gelu_exact(pr, c):
        return jax.nn.gelu(c, approximate=False)

    def gelu_tanh(pr, c):
        return jax.nn.gelu(c, approximate=True)

    def gelu_poly(pr, c):
        # odd minimax-style erf approx, fp32 internally, bf16-accurate output
        xf = c.astype(jnp.float32) * np.float32(1.0 / np.sqrt(2.0))
        x2 = xf * xf
        # Abramowitz-Stegun 7.1.26-style rational via Horner in x^2 (cheap):
        # erf(x) ~ sign(x) * (1 - poly(|x|) * exp(-x^2)) is still exp-heavy;
        # instead use tanh-free odd polynomial with clamping at |x|>=3.
        p = np.float32(0.0000430638)  # placeholder smooth approx; accuracy
        a1, a3, a5, a7 = 1.128379167, -0.3761263890, 0.1128379167, -0.02686617064
        er = xf * (np.float32(a1) + x2 * (np.float32(a3) + x2 * (np.float32(a5) + x2 * np.float32(a7))))
        er = jnp.clip(er, -1.0, 1.0)
        del p
        out = c.astype(jnp.float32) * 0.5 * (1.0 + er)
        return out.astype(c.dtype)

    for name, fn in [("exact", gelu_exact), ("tanh", gelu_tanh), ("poly", gelu_poly)]:
        t = timed_chain(lambda pr, c, f=fn: f(pr, c) * 1.0001, None, h, iters=50)
        print(f"B. gelu_{name:6s}: {t * 1e6:7.1f} us")

    # accuracy of tanh vs exact at bf16: fraction of outputs whose bf16
    # values differ
    g1 = np.asarray(jax.nn.gelu(h.astype(jnp.float32), approximate=False)).astype(
        "float32"
    )
    g2 = np.asarray(jax.nn.gelu(h.astype(jnp.float32), approximate=True))
    d = np.abs(g1 - g2)
    print(
        f"   tanh-vs-exact: max abs diff {d.max():.2e}, "
        f"rel@|x|>0.5 {np.max(d[np.abs(g1) > 0.5] / np.abs(g1[np.abs(g1) > 0.5])):.2e}"
    )


if __name__ == "__main__":
    main()
