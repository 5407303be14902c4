"""Micro-benchmark of transformer-block pieces at the ViT-B 392^2 point.

Times (chained on-device): the pure GEMMs at the block's shapes, the MLP
(fc1+gelu+fc2), LayerNorm, and one full Block — to separate MXU-limited time
from bandwidth/VPU overhead and find the encoder's realistic roofline.
"""
from __future__ import annotations

import argparse
import time

import numpy as np

ITERS = 30


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=785)
    ap.add_argument("--embed", type=int, default=768)
    args = ap.parse_args()

    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from distill_any_depth_tpu.models.vit import Block, Mlp

    b, n, c = args.batch, args.seq, args.embed
    m = b * n
    rng = np.random.RandomState(0)

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
                lead = jax.tree_util.tree_leaves(out)[0]
                fb = jnp.sum(lead.astype(jnp.float32)) * 1e-24
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

    x2d = jnp.asarray(rng.randn(m, c), jnp.bfloat16)
    w_qkv = jnp.asarray(rng.randn(c, 3 * c) * 0.02, jnp.bfloat16)
    w_fc1 = jnp.asarray(rng.randn(c, 4 * c) * 0.02, jnp.bfloat16)
    w_fc2 = jnp.asarray(rng.randn(4 * c, c) * 0.02, jnp.bfloat16)

    results = {}

    def gemm(name, wshape, w):
        t = timed(lambda xx, ww: jnp.dot(xx, ww)[:, :c], x2d, w)
        fl = 2 * m * wshape[0] * wshape[1]
        results[name] = (t, fl)

    gemm("gemm_qkv_768x2304", (c, 3 * c), w_qkv)
    gemm("gemm_fc1_768x3072", (c, 4 * c), w_fc1)

    def fc2(xx, ww1, ww2):
        h = jnp.dot(xx, ww1)
        return jnp.dot(h, ww2)

    t = timed(fc2, x2d, w_fc1, w_fc2)
    results["gemm_fc1+fc2"] = (t, 2 * m * c * 4 * c * 2)

    mlp = Mlp(4 * c, c, dtype=jnp.bfloat16)
    x3d = jnp.asarray(rng.randn(b, n, c), jnp.bfloat16)
    pm = mlp.init(jax.random.PRNGKey(0), x3d)["params"]
    t = timed(lambda xx, pp: mlp.apply({"params": pp}, xx), x3d, pm)
    results["mlp_full(gelu)"] = (t, 2 * m * c * 4 * c * 2)

    ln = nn.LayerNorm(epsilon=1e-6, dtype=jnp.bfloat16)
    pl_ = ln.init(jax.random.PRNGKey(0), x3d)["params"]
    t = timed(lambda xx, pp: ln.apply({"params": pp}, xx), x3d, pl_)
    results["layernorm"] = (t, 0)

    blk = Block(num_heads=12, mlp_ratio=4.0, ffn="mlp", init_values=1.0,
                dtype=jnp.bfloat16)
    pb = blk.init(jax.random.PRNGKey(0), x3d)["params"]
    t = timed(lambda xx, pp: blk.apply({"params": pp}, xx), x3d, pb)
    # block flops: qkv + proj + mlp + attn
    fl = 2 * m * (c * 3 * c + c * c + 8 * c * c) + 2 * 2 * b * 12 * n * n * 64
    results["block_full"] = (t, fl)

    for name, (t, fl) in results.items():
        tf = f"({fl / t / 1e12:6.1f} TF/s)" if fl else ""
        print(f"{name:22s}: {t * 1e6:8.1f} us  {tf}")


if __name__ == "__main__":
    main()
