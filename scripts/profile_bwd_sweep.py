"""Sweep (heads-per-program, q_block) for the dense attention backward
kernel at the ViT-B bs16 392^2 shape, plus a matmuls-only variant to
locate the VPU/softmax overhead. Informs the _flash_bwd_impl tiling
search (ops/flash_attention.py)."""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from distill_any_depth_tpu.ops.flash_attention import _bwd_kernel, _round_up

B, H, N, D = 16, 12, 785, 64
BH = B * H
ITERS = 20


def run(hp, q_block, kernel=_bwd_kernel, label=""):
    n_pad = _round_up(N, 128)
    nq_pad = _round_up(N, q_block)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    q, k, v, do = [
        jax.random.normal(kk, (BH, nq_pad if i % 2 == 0 else n_pad, D),
                          jnp.bfloat16)
        for i, kk in enumerate(ks)
    ]
    q, do = q[:, :nq_pad], do[:, :nq_pad]
    k, v = k[:, :n_pad], v[:, :n_pad]
    kern = functools.partial(kernel, hp=hp, nq=nq_pad // q_block,
                             n_real=N, scale=D ** -0.5)

    def f(q, k, v, do):
        return pl.pallas_call(
            kern,
            out_shape=(
                jax.ShapeDtypeStruct((BH, nq_pad, D), q.dtype),
                jax.ShapeDtypeStruct((BH, n_pad, D), k.dtype),
                jax.ShapeDtypeStruct((BH, n_pad, D), v.dtype),
            ),
            grid=(BH // hp, nq_pad // q_block),
            in_specs=[
                pl.BlockSpec((hp, q_block, D), lambda b, i: (b, i, 0)),
                pl.BlockSpec((hp, n_pad, D), lambda b, i: (b, 0, 0)),
                pl.BlockSpec((hp, n_pad, D), lambda b, i: (b, 0, 0)),
                pl.BlockSpec((hp, q_block, D), lambda b, i: (b, i, 0)),
            ],
            out_specs=(
                pl.BlockSpec((hp, q_block, D), lambda b, i: (b, i, 0)),
                pl.BlockSpec((hp, n_pad, D), lambda b, i: (b, 0, 0)),
                pl.BlockSpec((hp, n_pad, D), lambda b, i: (b, 0, 0)),
            ),
            scratch_shapes=[
                pltpu.VMEM((hp, n_pad, D), jnp.float32),
                pltpu.VMEM((hp, n_pad, D), jnp.float32),
            ],
        )(q, k, v, do)

    # scan-chain with a data dependency: async dispatch timing through the
    # axon tunnel reports ~0.03 ms for a 1 ms kernel (overlapped), so feed
    # dq back into q to force sequential device execution
    @jax.jit
    def chain(q, k, v, do):
        def body(c, _):
            dq, dk, dv = f(c, k, v, do)
            return (c + (dq * 1e-12).astype(c.dtype)), ()
        c, _ = jax.lax.scan(body, q, None, length=ITERS)
        return jnp.sum(c.astype(jnp.float32)[0, :1, :1])

    try:
        float(chain(q, k, v, do))
    except Exception as e:  # noqa: BLE001 - sweep: report and continue
        print(f"hp={hp} qb={q_block} {label}: FAIL {str(e)[:90]}")
        return
    t0 = time.perf_counter()
    float(chain(q, k, v, do))
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    programs = (BH // hp) * (nq_pad // q_block)
    print(f"hp={hp} qb={q_block:4d} programs={programs:4d} {label}: {dt:7.3f} ms")


def _mm_only_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                    dk_acc, dv_acc, *, hp, nq, n_real, scale):
    """5 matmuls, no softmax recompute: the MXU floor of the backward."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    for h in range(hp):
        q = q_ref[h]
        k = k_ref[h]
        v = v_ref[h]
        do = do_ref[h]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        p = (s * scale).astype(q.dtype)
        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(q.dtype)
        dq_ref[h] = jax.lax.dot_general(
            dp, k, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(q.dtype)
        dk_acc[h] += jax.lax.dot_general(
            dp, q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dv_acc[h] += jax.lax.dot_general(
            p, do, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(i == nq - 1)
    def _():
        dk_ref[...] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[...] = dv_acc[...].astype(dv_ref.dtype)


def main():
    print(f"shape: BH={BH} N={N} D={D} bf16;"
          " 5-matmul MXU floor ~0.5 ms full-rate / ~1.0 ms at D=64 rate")
    for hp, qb in [(1, 448), (1, 256), (2, 224), (2, 256), (4, 112),
                   (4, 128), (4, 224), (8, 32), (8, 64), (8, 128)]:
        run(hp, qb)
    print("-- matmuls only (no softmax/elementwise) --")
    for hp, qb in [(4, 112), (4, 128), (2, 224), (8, 64), (1, 448)]:
        run(hp, qb, kernel=_mm_only_kernel, label="mm-only")


if __name__ == "__main__":
    main()
