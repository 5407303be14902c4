"""Teacher chunking under a dp mesh: compose or disable? (VERDICT r4 #5)

``chunked_apply`` is disabled when a mesh is present (train/step.py) on the
assumption that the per-device batch is already batch/dp and the lax.map
reshape would cross shard boundaries. This measures the three candidate
structures on a dp mesh so the policy is a number, not an assumption:

  plain         — one bs-B teacher forward, batch sharded over 'data'
  outer-chunk   — naive [B] -> [B/c, c] lax.map with the OUTER axis
                  inheriting the 'data' sharding (what chunked_apply would
                  do if blindly enabled): the scan serializes the shards
  composed      — [B] -> [B/c, c] with a sharding constraint pinning the
                  INNER axis to 'data', so each map step runs a c/dp
                  per-device chunk (per-device chunk = chunk/dp)

Run on the virtual CPU mesh (structure check: does outer-chunk serialize?)
and on the TPU chip at dp=1 (absolute numbers; there is one real chip):

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/profile_chunk_mesh.py --dp 2 --size 112 --arch \
        depthanything-small --batch 16 --chunk 8
    python scripts/profile_chunk_mesh.py --dp 1   # real chip

``--per-device`` measures the dp=2 PER-DEVICE workload on the one real
chip without needing two chips: under the composed structure each device
runs lax.map over B/(c) steps of a (c/dp)-image forward, weights
replicated. For B=16 c=8 dp=2 that is bs8 plain vs 2 x bs4 chunks.

    python scripts/profile_chunk_mesh.py --per-device --batch 8 --chunk 4
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dp", type=int, default=2)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--size", type=int, default=392)
    ap.add_argument("--arch", default="depthanything-large")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--no-fused-tail", action="store_true",
                    help="packed-tail teacher (the pre-round-5 regime the "
                         "95.8->86.3 ms chunk win was measured in)")
    ap.add_argument("--per-device", action="store_true",
                    help="single-chip dp=2 per-device view: plain bs-B vs "
                         "lax.map over B/chunk steps of chunk-image forwards")
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the axon plugin wins platform selection unless forced via config
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from distill_any_depth_tpu.models.factory import create_model, init_params
    from distill_any_depth_tpu.parallel.mesh import make_mesh

    B, c, S = args.batch, args.chunk, args.size
    from distill_any_depth_tpu.models.factory import resolve_fused_tail
    teacher = create_model(
        args.arch, dtype=jnp.bfloat16,
        fused_tail=resolve_fused_tail("off" if args.no_fused_tail else "auto"))
    tp = init_params(teacher, 1, image_size=S)
    rng = np.random.RandomState(0)

    def fwd(pr, xx):
        return teacher.apply({"params": pr}, xx.astype(jnp.bfloat16))[0]

    if args.per_device:
        _per_device(args, jnp, teacher, tp, fwd, rng)
        return

    mesh = make_mesh(dp=args.dp)
    data = NamedSharding(mesh, P("data"))
    tp = jax.device_put(tp, NamedSharding(mesh, P()))
    x = jax.device_put(
        jnp.asarray(rng.rand(B, S, S, 3), jnp.float32), data)

    def plain(pr, xx):
        return fwd(pr, xx)

    def outer_chunk(pr, xx):
        xs = xx.reshape(B // c, c, S, S, 3)
        ds = jax.lax.map(lambda a: fwd(pr, a), xs)
        return ds.reshape(B, *ds.shape[2:])

    def composed(pr, xx):
        xs = xx.reshape(B // c, c, S, S, 3)
        xs = jax.lax.with_sharding_constraint(
            xs, NamedSharding(mesh, P(None, "data")))
        ds = jax.lax.map(lambda a: fwd(pr, a), xs)
        return ds.reshape(B, *ds.shape[2:])

    try:
        from bench import _rtt as measure_rtt
        rtt = measure_rtt()
    except Exception:
        rtt = 0.0

    def timed(f, label):
        @jax.jit
        def chain(pr, x0):
            def body(carry, _):
                d = f(pr, carry)
                return carry + (d[..., None] * 1e-12).astype(carry.dtype), ()

            cr, _ = jax.lax.scan(body, x0, None, length=ITERS)
            return jnp.sum(cr.astype(jnp.float32).ravel()[:1])

        t0 = time.perf_counter()
        try:
            float(chain(tp, x))
        except Exception as e:
            print(f"{label:12s}: FAIL ({type(e).__name__}: {str(e)[:80]})",
                  flush=True)
            return
        print(f"  ({label} compiled in {time.perf_counter() - t0:.0f}s)",
              flush=True)
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(chain(tp, x))
            ts.append(max(time.perf_counter() - t0 - rtt, 1e-9) / ITERS)
        print(f"{label:12s}: {min(ts) * 1e3:8.1f} ms", flush=True)

    print(f"mesh dp={args.dp} {args.arch} bs{B} {S}^2 chunk={c}", flush=True)
    timed(plain, "plain")
    timed(outer_chunk, "outer-chunk")
    timed(composed, "composed")


def _per_device(args, jnp, teacher, tp, fwd, rng):
    import jax
    import time as _t

    B, c, S = args.batch, args.chunk, args.size
    x = jnp.asarray(rng.rand(B, S, S, 3), jnp.float32)
    try:
        from bench import _rtt as measure_rtt
        rtt = measure_rtt()
    except Exception:
        rtt = 0.0

    def plain(pr, xx):
        return fwd(pr, xx)

    def chunked(pr, xx):
        xs = xx.reshape(B // c, c, S, S, 3)
        ds = jax.lax.map(lambda a: fwd(pr, a), xs)
        return ds.reshape(B, *ds.shape[2:])

    def timed(f, label):
        @jax.jit
        def chain(pr, x0):
            def body(carry, _):
                d = f(pr, carry)
                return carry + (d[..., None] * 1e-12).astype(carry.dtype), ()

            cr, _ = jax.lax.scan(body, x0, None, length=ITERS)
            return jnp.sum(cr.astype(jnp.float32).ravel()[:1])

        float(chain(tp, x))
        ts = []
        for _ in range(args.reps):
            t0 = _t.perf_counter()
            float(chain(tp, x))
            ts.append(max(_t.perf_counter() - t0 - rtt, 1e-9) / ITERS)
        print(f"{label:28s}: {min(ts) * 1e3:8.1f} ms", flush=True)

    print(f"per-device view {args.arch} bs{B} {S}^2 chunk={c}", flush=True)
    timed(plain, f"plain bs{B}")
    timed(chunked, f"{B // c} x bs{c} chunks")


if __name__ == "__main__":
    main()
