"""Where do the ~300 us of non-GEMM time per encoder block go?

A/B the full Block against surgically modified variants (no LayerScale, no
LayerNorm, no attention, no MLP) at the ViT-B 392^2 point to locate the
elementwise/bandwidth overhead before building any fused kernel.
"""
from __future__ import annotations

import time

import numpy as np

ITERS = 30


def main():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from distill_any_depth_tpu.models.vit import Attention, Mlp

    b, n, c = 8, 785, 768
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

    x = jnp.asarray(rng.randn(b, n, c), jnp.bfloat16)

    class Var(nn.Module):
        use_ln: bool = True
        use_ls: bool = True
        use_attn: bool = True
        use_mlp: bool = True

        @nn.compact
        def __call__(self, x):
            def ls(name, y):
                if not self.use_ls:
                    return y
                g = self.param(name, nn.initializers.constant(1.0), (c,), jnp.float32)
                return y * g.astype(jnp.bfloat16)

            def ln(name, y):
                if not self.use_ln:
                    return y
                return nn.LayerNorm(epsilon=1e-6, dtype=jnp.bfloat16, name=name)(y)

            if self.use_attn:
                y = ln("norm1", x)
                y = Attention(12, jnp.bfloat16, name="attn")(y)
                x = x + ls("ls1", y)
            if self.use_mlp:
                y = ln("norm2", x)
                y = Mlp(4 * c, c, jnp.bfloat16, name="mlp")(y)
                x = x + ls("ls2", y)
            return x

    variants = {
        "full": Var(),
        "no_layerscale": Var(use_ls=False),
        "no_layernorm": Var(use_ln=False),
        "attn_sublayer": Var(use_mlp=False),
        "mlp_sublayer": Var(use_attn=False),
        "no_ln_no_ls": Var(use_ln=False, use_ls=False),
    }
    for name, mod in variants.items():
        pm = mod.init(jax.random.PRNGKey(0), x)["params"]
        t = timed(lambda xx, pp, m=mod: m.apply({"params": pp}, xx), x, pm)
        print(f"{name:16s}: {t*1e6:8.1f} us", flush=True)


if __name__ == "__main__":
    main()
