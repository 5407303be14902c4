"""HDN loss self-test (the demo.py equivalent).

Builds fixed random pred/gt/mask tensors and prints the three HDN variants
(dr/dp/ds), mirroring the reference's executable numerical reference
(demo.py:162-180) — the values here are the framework's pinned HDN
vectors, cross-checked against the PyTorch implementation in
tests/test_loss_parity.py.
"""
from __future__ import annotations

import numpy as np


def main(size: int = 384, batch: int = 2, seed: int = 0) -> dict:
    import jax.numpy as jnp

    from distill_any_depth_tpu.losses import (
        get_contexts_dp,
        get_contexts_dr,
        get_contexts_ds,
        hdn_loss,
    )

    rng = np.random.RandomState(seed)
    pred = jnp.asarray(rng.rand(batch, size, size).astype(np.float32))
    gt = jnp.asarray(rng.rand(batch, size, size).astype(np.float32))
    mask = jnp.asarray(rng.rand(batch, size, size) > 0.5)

    out = {}
    for name, ctx in (
        ("dr", get_contexts_dr(3, gt, mask)),
        ("dp", get_contexts_dp(3, gt, mask)),
        ("ds", get_contexts_ds(3, mask)),
    ):
        out[name] = float(hdn_loss(pred, gt, ctx))
        print(f"hdn_{name}: {out[name]:.6f}")
    return out


if __name__ == "__main__":
    main()
