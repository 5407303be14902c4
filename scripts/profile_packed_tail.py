"""A/B the DPT tail: resize->FusedConv3x3 vs packed-resize->2x2 conv.

Variant A (shipped): resize_2d 224->392, FusedConv3x3(32, keep_phases)
(4x4/s2 phase-packed conv), relu, Dense(1), merge_phases.

Variant B (candidate): the resize emits the conv's *padded, space-to-depth*
layout directly — resize matrices carry the (1,2) conv padding as zero rows
and interleave even/odd output rows as a phase axis — so the 4x4/s2
phase-packed conv collapses to a 2x2/s1 VALID conv over a 256-channel
packed grid. Identical math (same 3x3 kernel params), no 392^2
intermediate, and the conv lowers to 4 aligned GEMMs.
"""
from __future__ import annotations

import time

import numpy as np

ITERS = 10
B, H64, HO = 8, 224, 392  # tail: [B,224,224,64] -> conv32 -> dense1


def main():
    import jax
    import jax.numpy as jnp

    from distill_any_depth_tpu.ops.resize import resize_2d, resize_matrix

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H64, H64, 64), jnp.bfloat16)
    k3 = jnp.asarray(rng.randn(3, 3, 64, 32) * 0.05, jnp.bfloat16)
    bias = jnp.asarray(rng.randn(32) * 0.1, jnp.bfloat16)
    wd = jnp.asarray(rng.randn(32, 1) * 0.1, jnp.bfloat16)

    def phase_kernel(k):
        # FusedConv3x3's 4x4/s2 phase-packed kernel [4,4,C,4*CO]
        return jnp.concatenate(
            [
                jnp.pad(k, ((a, 1 - a), (p, 1 - p), (0, 0), (0, 0)))
                for a in range(2)
                for p in range(2)
            ],
            axis=-1,
        )

    def variant_a(x):
        y = resize_2d(x, (HO, HO), "bilinear", align_corners=True)
        kp = phase_kernel(k3)
        b, h, w, _ = y.shape
        y = jax.lax.conv_general_dilated(
            y, kp, (2, 2), ((1, 2), (1, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = y.reshape(b, h // 2, w // 2, 2, 2, 32) + bias
        y = jnp.dot(jax.nn.relu(y), wd)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, 1)
        return y

    def packed_resize_matrix(in_size, out_size):
        # rows of the 224->392 align_corners=True matrix, shifted down by the
        # conv's leading pad (1) and zero-padded to 2*ceil((out+3)/2) rows,
        # then folded [blocks, 2, in]
        m = resize_matrix(in_size, out_size, "bilinear", align_corners=True)
        rows = out_size + 3  # pad (1,2)
        rows = rows + (rows % 2)
        mp = np.zeros((rows, in_size), np.float32)
        mp[1 : 1 + out_size] = m
        return mp.reshape(rows // 2, 2, in_size)

    def variant_b(x):
        mp = jnp.asarray(packed_resize_matrix(H64, HO), x.dtype)  # [198,2,224]
        # rows then cols, keeping phases as trailing minor-adjacent axes
        y = jnp.einsum("mbh,Bhwc->Bmbwc", mp, x)
        y = jnp.einsum("npw,Bmbwc->Bmnbpc", mp, y)
        blocks = mp.shape[0]
        y = y.reshape(B, blocks, blocks, 4 * 64)
        kp = phase_kernel(k3)  # [4,4,64,128]
        k2 = kp.reshape(2, 2, 2, 2, 64, 128).transpose(0, 2, 1, 3, 4, 5)
        k2 = k2.reshape(2, 2, 4 * 64, 128)
        y = jax.lax.conv_general_dilated(
            y, k2, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[:, : HO // 2, : HO // 2]
        y = y.reshape(B, HO // 2, HO // 2, 2, 2, 32) + bias
        y = jnp.dot(jax.nn.relu(y), wd)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(B, HO, HO, 1)
        return y

    # parity first (fp32 on CPU-precision-sensitive path is fine in bf16:
    # same kernel taps, different summation grouping only for the resize)
    ya = np.asarray(variant_a(x), np.float32)
    yb = np.asarray(variant_b(x), np.float32)
    err = np.max(np.abs(ya - yb)) / (np.abs(ya).max() + 1e-9)
    print(f"parity: max rel err {err:.2e}", flush=True)

    s = jnp.float32(1.0)
    float(s + 1)
    t0 = time.perf_counter()
    for _ in range(5):
        float(s + 1)
    rtt = (time.perf_counter() - t0) / 5

    def bench(fn, name):
        @jax.jit
        def chain(x0):
            def body(c, _):
                y = fn(c)
                # feed a scalar back so the chain has a data dependency
                return c + (y[:, :H64, :H64] * 1e-12).astype(c.dtype), ()

            c, _ = jax.lax.scan(body, x0, None, length=ITERS)
            return jnp.sum(c.astype(jnp.float32).ravel()[:1])

        float(chain(x))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(chain(x))
            ts.append(max(time.perf_counter() - t0 - rtt, 1e-9) / ITERS)
        t = float(np.median(ts))
        print(f"{name}: {t*1e3:7.2f} ms", flush=True)
        return t

    def variant_c(x):
        # as B, but the row pass lands its phase axis minor-adjacent to c so
        # every intermediate keeps a 128-wide (phase, c) trailing pair
        mp = jnp.asarray(packed_resize_matrix(H64, HO), x.dtype)  # [198,2,224]
        y = jnp.einsum("mbh,Bhwc->Bmwbc", mp, x)
        y = jnp.einsum("npw,Bmwbc->Bmnbpc", mp, y)
        blocks = mp.shape[0]
        y = y.reshape(B, blocks, blocks, 4 * 64)
        kp = phase_kernel(k3)
        k2 = kp.reshape(2, 2, 2, 2, 64, 128).transpose(0, 2, 1, 3, 4, 5)
        k2 = k2.reshape(2, 2, 4 * 64, 128)
        y = jax.lax.conv_general_dilated(
            y, k2, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[:, : HO // 2, : HO // 2]
        y = y.reshape(B, HO // 2, HO // 2, 2, 2, 32) + bias
        y = jnp.dot(jax.nn.relu(y), wd)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(B, HO, HO, 1)
        return y

    yc = np.asarray(variant_c(x), np.float32)
    err_c = np.max(np.abs(ya - yc)) / (np.abs(ya).max() + 1e-9)
    print(f"parity C: max rel err {err_c:.2e}", flush=True)

    ta = bench(variant_a, "A resize+fused4x4s2")
    tb = bench(variant_b, "B packed-resize+2x2")
    tc = bench(variant_c, "C B+phase-minor rows")
    print(f"speedup B {ta/tb:.2f}x  C {ta/tc:.2f}x", flush=True)


if __name__ == "__main__":
    main()
