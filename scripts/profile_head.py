"""Stage-level timing of the DPT head at ViT-B 392^2 bs8 bf16.

Times progressively longer prefixes of the head pipeline (same scan-chain
methodology as profile_inference.py) so each stage's cost is the delta
between consecutive rows. Also times the attention fold/unfold transposes
to size the [B,N,H,D] <-> [BH,N,D] relayout overhead in the encoder.
"""
from __future__ import annotations

import time

import numpy as np

ITERS = 10


def main():
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from distill_any_depth_tpu.models.dpt import (
        DPTHead, FeatureFusionBlock, PatchExpand, _conv3x3,
    )
    from distill_any_depth_tpu.ops.resize import resize_2d

    def rtt() -> float:
        s = jnp.float32(1.0)
        float(s + 1)
        t0 = time.perf_counter()
        for _ in range(5):
            float(s + 1)
        return (time.perf_counter() - t0) / 5

    _rtt = rtt()

    def timed(make_body, params_arg, x0, reps=3):
        @jax.jit
        def chain(pr, x0):
            def body(c, _):
                return make_body(pr, c), ()

            c, _ = jax.lax.scan(body, x0, None, length=ITERS)
            leaf = jax.tree_util.tree_leaves(c)[0]
            return jnp.sum(leaf.astype(jnp.float32).ravel()[:1])

        float(chain(params_arg, x0))
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chain(params_arg, x0))
            times.append(max(time.perf_counter() - t0 - _rtt, 1e-9) / ITERS)
        return float(np.median(times))

    b, gh, gw, c = 8, 28, 28, 768
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    taps = [jnp.asarray(rng.rand(b, gh * gw, c), dt) for _ in range(4)]

    class Prefix(nn.Module):
        """First `upto` stages of DPTHead (feature-pyramid build ->
        refinenets -> output convs)."""

        upto: int

        @nn.compact
        def __call__(self, ts):
            outs = []
            for i, t in enumerate(ts):
                x = t.reshape(b, gh, gw, c)
                x = nn.Dense(
                    [96, 192, 384, 768][i], dtype=dt, name=f"projects_{i}"
                )(x)
                if i == 0:
                    x = PatchExpand(4, 96, dt, name="resize_0")(x)
                elif i == 1:
                    x = PatchExpand(2, 192, dt, name="resize_1")(x)
                elif i == 3:
                    x = _conv3x3(768, stride=2, dtype=dt, name="resize_3")(x)
                outs.append(x)
            if self.upto == 0:
                return outs[0]
            rn = [
                _conv3x3(128, use_bias=False, dtype=dt, name=f"rn_{i}")(outs[i])
                for i in range(4)
            ]
            if self.upto == 1:
                return rn[0]
            path = FeatureFusionBlock(128, dt, name="refinenet4")(
                rn[3], size=rn[2].shape[1:3]
            )
            if self.upto == 2:
                return path
            path = FeatureFusionBlock(128, dt, name="refinenet3")(
                path, rn[2], size=rn[1].shape[1:3]
            )
            if self.upto == 3:
                return path
            path = FeatureFusionBlock(128, dt, name="refinenet2")(
                path, rn[1], size=rn[0].shape[1:3]
            )
            if self.upto == 4:
                return path
            path = FeatureFusionBlock(128, dt, name="refinenet1")(path, rn[0])
            if self.upto == 5:
                return path
            x = _conv3x3(64, dtype=dt, name="output_conv1")(path)
            if self.upto == 6:
                return x
            x = resize_2d(x, (gh * 14, gw * 14), "bilinear", align_corners=True)
            if self.upto == 7:
                return x
            x = _conv3x3(32, dtype=dt, name="output_conv2_0")(x)
            x = nn.relu(x)
            x = nn.Dense(1, dtype=dt, name="output_conv2_2")(x)
            return x

    names = [
        "pyramid(proj+expand)",
        "+scratch_rn convs",
        "+refinenet4 (28^2)",
        "+refinenet3 (56^2)",
        "+refinenet2 (112^2)",
        "+refinenet1 (224^2)",
        "+output_conv1",
        "+resize->392^2",
        "+output_conv2",
    ]
    prev = 0.0
    for upto, name in enumerate(names):
        mod = Prefix(upto)
        params = mod.init(jax.random.PRNGKey(0), taps)["params"]

        def body(pr, ts, mod=mod):
            y = mod.apply({"params": pr}, ts)
            fb = jnp.sum(y.astype(jnp.float32)) * 1e-12
            return [t + fb.astype(t.dtype) for t in ts]

        t = timed(body, params, taps)
        print(f"{name:24s}: {t * 1e3:7.2f} ms  (+{(t - prev) * 1e3:6.2f})",
              flush=True)
        prev = t

    # --- attention fold/unfold transpose cost (per block) ---
    h, n, d = 12, gh * gw + 1, 64
    qkv = jnp.asarray(rng.rand(b, n, 3, h, d), dt)

    def fold_body(pr, x):
        q, k, v = x[:, :, 0], x[:, :, 1], x[:, :, 2]
        f = lambda y: y.transpose(0, 2, 1, 3).reshape(b * h, n, d)  # noqa: E731
        q, k, v = f(q), f(k), f(v)
        o = (q + k + v).reshape(b, h, n, d).transpose(0, 2, 1, 3)
        return x + o[:, :, None].astype(x.dtype) * 1e-12

    t = timed(fold_body, jnp.zeros((1,), dt), qkv)
    print(f"{'fold/unfold transposes':24s}: {t * 1e3:7.2f} ms per block")


if __name__ == "__main__":
    main()
