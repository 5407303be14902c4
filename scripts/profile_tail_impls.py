"""In-context cost of each DPT-tail formulation on the full ViT-B forward.

Round-5 question: the packed tail's GEMMs are fast but XLA inserts layout
copies between them (scripts/mine_hlo_cycles.py shows the refinenet1->output
chain carrying ~45% of estimated cycles, mostly `copy` rows). Measure the
FULL forward (bs8/bs16 392^2 bf16) with:

  packed    — phase-packed GEMM tail (current default)
  spatial   — plain resize_2d + NHWC convs (fewer exotic layouts)
  fused     — the v1 Pallas kernel (ops/dpt_tail)
  truncated — model stops after refinenet1's out_conv (no tail at all):
              full(packed) - full(truncated) = the tail's true in-context
              budget any kernel must beat.

    python scripts/profile.py tail_impls
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ITERS = 10
REPS = 5
SIZE = 392


def main() -> None:
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from distill_any_depth_tpu.configs import model_config
    from distill_any_depth_tpu.models.dpt import (
        DPTHead, DepthModel, FeatureFusionBlock, FusedConv3x3, _conv3x3)
    from distill_any_depth_tpu.models.factory import init_params
    from distill_any_depth_tpu.models.vit import DinoViT

    s = jnp.float32(1.0)
    float(s + 1)
    t0 = time.perf_counter()
    for _ in range(5):
        float(s + 1)
    rtt = (time.perf_counter() - t0) / 5

    cfg = model_config("depthanything-base")

    class TruncatedHead(nn.Module):
        """DPTHead front: taps -> reassemble -> refinenets 4..1 (refinenet1
        with defer_resize: out_conv at 112^2, no upsample) — everything the
        tail variants share, nothing they differ on."""

        features: int
        out_channels: tuple
        dtype: object

        @nn.compact
        def __call__(self, taps, gh, gw):
            outs = []
            for i, t in enumerate(taps):
                b, n, c = t.shape
                x = t.reshape(b, gh, gw, c)
                x = nn.Dense(self.out_channels[i], dtype=self.dtype,
                             name=f"projects_{i}")(x)
                if i == 0:
                    from distill_any_depth_tpu.models.dpt import PatchExpand
                    x = PatchExpand(4, self.out_channels[0], self.dtype,
                                    name="resize_0")(x)
                elif i == 1:
                    from distill_any_depth_tpu.models.dpt import PatchExpand
                    x = PatchExpand(2, self.out_channels[1], self.dtype,
                                    name="resize_1")(x)
                elif i == 3:
                    x = _conv3x3(self.out_channels[3], stride=2,
                                 dtype=self.dtype, name="resize_3")(x)
                outs.append(x)
            rn = [
                _conv3x3(self.features, use_bias=False, dtype=self.dtype,
                         name=f"scratch_{i + 1}_rn")(outs[i])
                for i in range(4)
            ]
            path = FeatureFusionBlock(self.features, self.dtype,
                                      name="refinenet4")(rn[3], size=rn[2].shape[1:3])
            path = FeatureFusionBlock(self.features, self.dtype,
                                      name="refinenet3")(path, rn[2], size=rn[1].shape[1:3])
            path = FeatureFusionBlock(self.features, self.dtype,
                                      name="refinenet2")(path, rn[1], size=rn[0].shape[1:3])
            return FeatureFusionBlock(self.features, self.dtype,
                                      defer_resize=True,
                                      name="refinenet1")(path, rn[0])

    class TruncatedModel(nn.Module):
        dtype: object

        @nn.compact
        def __call__(self, x):
            p = cfg.encoder.patch_size
            gh, gw = x.shape[1] // p, x.shape[2] // p
            taps, _ = DinoViT(cfg.encoder, dtype=self.dtype,
                              name="pretrained")(x)
            return TruncatedHead(cfg.features, tuple(cfg.out_channels),
                                 self.dtype, name="depth_head")(taps, gh, gw)

    def timed(model, params, batch):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(batch, SIZE, SIZE, 3), jnp.bfloat16)

        @jax.jit
        def chain(p, x0):
            def body(c, _):
                out = model.apply({"params": p}, c)
                if isinstance(out, tuple):
                    out = out[0]
                c = c + (jnp.mean(out.astype(jnp.float32)) * 1e-12).astype(c.dtype)
                return c, ()

            c, _ = jax.lax.scan(body, x0, None, length=ITERS)
            return jnp.sum(c[0, 0, 0].astype(jnp.float32))

        float(chain(params, x))
        times = []
        for _ in range(REPS):
            t1 = time.perf_counter()
            float(chain(params, x))
            times.append(max(time.perf_counter() - t1 - rtt, 1e-9) / ITERS)
        return float(np.min(times)) * 1e3  # ms/iter

    results = {}
    for batch in (8, 16):
        for name, kw in (
            ("packed", dict(tail_impl="packed")),
            ("spatial", dict(tail_impl="spatial")),
            ("fused", dict(fused_tail=True)),
        ):
            model = DepthModel(cfg, dtype=jnp.bfloat16, **kw)
            params = init_params(model, 0, image_size=SIZE)
            ms = timed(model, params, batch)
            results[f"{name}_bs{batch}"] = ms
            print(f"bs{batch} {name:9s}: {ms:7.2f} ms/iter  "
                  f"({batch / ms * 1e3:6.1f} img/s)", flush=True)
        tmodel = TruncatedModel(dtype=jnp.bfloat16)
        tparams = jax.jit(tmodel.init)(
            jax.random.PRNGKey(0),
            jnp.zeros((1, SIZE, SIZE, 3), jnp.bfloat16))["params"]
        ms = timed(tmodel, tparams, batch)
        results[f"truncated_bs{batch}"] = ms
        print(f"bs{batch} truncated: {ms:7.2f} ms/iter   "
              f"tail budget vs packed: "
              f"{results[f'packed_bs{batch}'] - ms:5.2f} ms", flush=True)


if __name__ == "__main__":
    main()
