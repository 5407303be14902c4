"""Time the distillation loss stack fwd+bwd alone (bs16 392^2, default
config: hybrid norm + HDN dr/3) on fixed tensors."""
from __future__ import annotations

import time

import numpy as np

ITERS = 5
BATCH = 16
SIZE = 392


def main():
    import jax
    import jax.numpy as jnp

    from distill_any_depth_tpu.configs import LossConfig
    from distill_any_depth_tpu.losses.distill import combined_distillation_loss
    from distill_any_depth_tpu.losses.feature import feature_distillation_loss

    s = jnp.float32(1.0)
    float(s + 1)
    t0 = time.perf_counter()
    for _ in range(5):
        float(s + 1)
    rtt = (time.perf_counter() - t0) / 5

    cfg = LossConfig()
    rng = np.random.RandomState(0)
    n_tok = (SIZE // 14) ** 2
    s_feat = jnp.asarray(rng.rand(BATCH, n_tok, 768), jnp.float32)
    t_feat = jnp.asarray(rng.rand(BATCH, n_tok, 1024), jnp.float32)
    t_depth = jnp.asarray(rng.rand(BATCH, SIZE, SIZE), jnp.float32)

    @jax.jit
    def chain(sd0, tf, td):
        def loss(sd):
            fl = feature_distillation_loss(s_feat, tf)
            total, _ = combined_distillation_loss(
                cfg, sd, sd, s_feat, td, feat_loss=fl
            )
            return total

        def body(c, _):
            g = jax.grad(loss)(c)
            return c + g * 1e-12, ()

        c, _ = jax.lax.scan(body, sd0, None, length=ITERS)
        return jnp.sum(c.ravel()[:1])

    float(chain(t_depth + 0.5, t_feat, t_depth))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(t_depth + 0.5, t_feat, t_depth))
        ts.append(max(time.perf_counter() - t0 - rtt, 1e-9) / ITERS)
    print(f"loss stack fwd+bwd : {np.median(ts) * 1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
