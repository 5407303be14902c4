"""Component-level timing of the ViT-B 392^2 inference path on one chip.

The TPU is reached through a network tunnel here, so single-dispatch timing
measures round-trip latency (~seconds), not device time. Every measurement
chains ITERS iterations on-device with lax.scan (true data dependency) and
divides, exactly like bench.py.

Times: full model, encoder alone, DPT head alone, and attention/MLP slices.
"""
from __future__ import annotations

import argparse
import time

import numpy as np

ITERS = 10


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=392)
    ap.add_argument("--model", default="depthanything-base")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from distill_any_depth_tpu.models.factory import create_model, init_params
    from distill_any_depth_tpu.models.dpt import DPTHead
    from distill_any_depth_tpu.models.vit import DinoViT

    def rtt() -> float:
        s = jnp.float32(1.0)
        float(s + 1)
        t0 = time.perf_counter()
        for _ in range(5):
            float(s + 1)
        return (time.perf_counter() - t0) / 5

    _rtt = rtt()

    def timed_chain(make_body, params_arg, x0, reps=3):
        """make_body(params, carry) -> new carry (same shape/dtype).

        Params are a traced jit argument (NOT a closure constant): the TPU is
        reached via a remote-compile transport with a hard payload limit, so
        ViT-sized weights must never be embedded in the HLO (HTTP 413).
        """

        @jax.jit
        def chain(pr, x0):
            def body(c, _):
                return make_body(pr, c), ()

            c, _ = jax.lax.scan(body, x0, None, length=ITERS)
            leaf = jax.tree_util.tree_leaves(c)[0]
            return jnp.sum(leaf.astype(jnp.float32).ravel()[:1])

        float(chain(params_arg, x0))  # compile + warm
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chain(params_arg, x0))
            times.append(max(time.perf_counter() - t0 - _rtt, 1e-9) / ITERS)
        return float(np.median(times))

    model = create_model(args.model, dtype=jnp.bfloat16)
    params = init_params(model, 0, image_size=args.size)
    cfg = model.cfg
    p = cfg.encoder.patch_size
    gh = gw = args.size // p
    b = args.batch
    x = jnp.asarray(np.random.RandomState(0).rand(b, args.size, args.size, 3), jnp.bfloat16)

    enc = DinoViT(cfg.encoder, dtype=jnp.bfloat16)
    head = DPTHead(
        features=cfg.features,
        out_channels=tuple(cfg.out_channels),
        head_out_channels=cfg.head_out_channels,
        use_clstoken=cfg.use_clstoken,
        trailing_relu=cfg.trailing_head_relu,
        patch_size=p,
        dtype=jnp.bfloat16,
    )

    # --- full model ---
    def full_body(pr, c):
        depth, _ = model.apply({"params": pr}, c)
        return c + (depth[..., None] * 1e-12).astype(c.dtype)

    t_full = timed_chain(full_body, params, x)

    # --- encoder only ---
    def enc_body(pr, c):
        taps, _ = enc.apply({"params": pr}, c)
        # Use the LAST tap: the first tap only depends on the first
        # out_indices[0]+1 blocks, so feeding it back lets XLA dead-code
        # eliminate most of the encoder.
        t = taps[3]  # [B, N, C]
        fb = t[:, : gh * gw].reshape(b, gh, gw, -1)[..., :1]
        fb = jnp.repeat(jnp.repeat(fb, p, 1), p, 2)
        return c + (fb * 1e-12).astype(c.dtype)

    t_enc = timed_chain(enc_body, params["pretrained"], x)

    # --- head only (taps as carry feedback) ---
    taps0, _ = jax.jit(lambda pr, y: enc.apply({"params": pr}, y))(
        params["pretrained"], x
    )
    taps0 = list(taps0)

    def head_body(pr, ts):
        d = head.apply({"params": pr}, ts, gh, gw)
        fb = d.reshape(b, -1)[:, : gh * gw, None] * 1e-12
        return [t + fb.astype(t.dtype) for t in ts]

    t_head = timed_chain(head_body, params["depth_head"], taps0)

    print(f"full   : {t_full * 1e3:8.2f} ms  ({b / t_full:7.1f} img/s)")
    print(f"encoder: {t_enc * 1e3:8.2f} ms  ({100 * t_enc / t_full:5.1f}% of full)")
    print(f"head   : {t_head * 1e3:8.2f} ms  ({100 * t_head / t_full:5.1f}% of full)")


if __name__ == "__main__":
    main()
