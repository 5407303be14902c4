"""Piece-level timing of the bench distillation step (bs16 392^2, ViT-L
teacher -> ViT-B student, NYU shared-view path).

Pieces (each scan-chained on device like bench.py):
  1. teacher ViT-L forward (bf16, no grad)
  2. student ViT-B forward only
  3. student forward + backward through a dummy mean loss
  4. loss stack fwd+bwd on fixed depth/feature tensors (no model)
  5. the full train step (= bench.py's number)
"""
from __future__ import annotations

import time

import numpy as np

ITERS = 3
BATCH = 16
SIZE = 392


def main():
    import jax
    import jax.numpy as jnp

    from distill_any_depth_tpu.configs import LossConfig, OptimizerConfig
    from distill_any_depth_tpu.losses.distill import combined_distillation_loss
    from distill_any_depth_tpu.losses.feature import feature_distillation_loss
    from distill_any_depth_tpu.models.factory import create_model, init_params
    from distill_any_depth_tpu.train.state import create_train_state
    from distill_any_depth_tpu.train.step import make_train_step

    def rtt() -> float:
        s = jnp.float32(1.0)
        float(s + 1)
        t0 = time.perf_counter()
        for _ in range(5):
            float(s + 1)
        return (time.perf_counter() - t0) / 5

    _rtt = rtt()

    def timed(make_carry_fn, carry0, args, reps=3):
        @jax.jit
        def chain(c0, *a):
            def body(c, _):
                return make_carry_fn(c, *a), ()

            c, _ = jax.lax.scan(body, c0, None, length=ITERS)
            leaf = jax.tree_util.tree_leaves(c)[0]
            return jnp.sum(leaf.astype(jnp.float32).ravel()[:1])

        float(chain(carry0, *args))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chain(carry0, *args))
            ts.append(max(time.perf_counter() - t0 - _rtt, 1e-9) / ITERS)
        return float(np.median(ts))

    student = create_model("depthanything-base", dtype=jnp.bfloat16)
    teacher = create_model("depthanything-large", dtype=jnp.bfloat16)
    sp = init_params(student, 0, image_size=SIZE)
    tp = init_params(teacher, 1, image_size=SIZE)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(BATCH, SIZE, SIZE, 3), jnp.float32)

    # 1. teacher forward
    def t_fwd(c, tpp):
        d, f = teacher.apply({"params": tpp}, c.astype(jnp.bfloat16))
        return c + (d[..., None] * 1e-12).astype(c.dtype)

    print(f"teacher ViT-L fwd  : {timed(t_fwd, x, (tp,)) * 1e3:8.1f} ms",
          flush=True)

    # 2. student forward
    def s_fwd(c, spp):
        d, f = student.apply({"params": spp}, c.astype(jnp.bfloat16))
        return c + (d[..., None] * 1e-12).astype(c.dtype)

    print(f"student ViT-B fwd  : {timed(s_fwd, x, (sp,)) * 1e3:8.1f} ms",
          flush=True)

    # 3. student fwd+bwd (dummy loss; params are the carry)
    def s_fwdbwd(c, xx):
        def loss(p):
            d, f = student.apply({"params": p}, xx.astype(jnp.bfloat16))
            return jnp.mean(d.astype(jnp.float32))

        g = jax.grad(loss)(c)
        return jax.tree_util.tree_map(lambda a, b: a + b * 1e-12, c, g)

    print(f"student fwd+bwd    : {timed(s_fwdbwd, sp, (x,)) * 1e3:8.1f} ms",
          flush=True)

    # 4. loss stack fwd+bwd on fixed tensors
    cfg = LossConfig()
    n_tok = (SIZE // 14) ** 2
    s_feat = jnp.asarray(rng.rand(BATCH, n_tok, 768), jnp.float32)
    t_feat = jnp.asarray(rng.rand(BATCH, n_tok, 1024), jnp.float32)
    t_depth = jnp.asarray(rng.rand(BATCH, SIZE, SIZE), jnp.float32)

    def loss_stack(c, tf, td):
        def loss(sd):
            fl = feature_distillation_loss(s_feat, tf)
            total, _ = combined_distillation_loss(
                cfg, sd, sd, s_feat, td, feat_loss=fl
            )
            return total

        g = jax.grad(loss)(c)
        return c + g * 1e-12

    print(f"loss stack fwd+bwd : {timed(loss_stack, t_depth + 0.5, (t_feat, t_depth)) * 1e3:8.1f} ms",
          flush=True)

    # 5. full step
    state, tx = create_train_state(
        sp, OptimizerConfig(lr=5e-6, warmup_steps=0, schedule="none",
                            total_steps=10_000)
    )
    step = make_train_step(
        lambda p, xx: student.apply({"params": p}, xx.astype(jnp.bfloat16)),
        [lambda p, xx: teacher.apply({"params": p}, xx.astype(jnp.bfloat16))],
        tx, LossConfig(), seed=0, views_shared=True,
    )

    def full(c, tpp, xx):
        c, m = step(c, (tpp,), xx, xx)
        return c

    print(f"full distill step  : {timed(full, state, (tp, x)) * 1e3:8.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
