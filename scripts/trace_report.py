"""Capture a jax.profiler trace of a model forward (or train step) on the
TPU and print the top ops by device time — the workflow behind every perf
decision in docs/DESIGN.md's round-2 table.

Parses the xplane protobuf locally with xprof (no TensorBoard needed):

    python scripts/trace_report.py --what forward --arch depthanything-base
    python scripts/trace_report.py --what loss    # distill loss fwd+bwd

Reading the output: `fusion`/`convolution` rows at high FLOP utilization
are healthy; big `copy`/`pad`/`slice`/`reshape` rows are layout churn worth
killing (the packed-QKV attention and packed DPT tail both came from
chasing such rows); a dominant named custom call (e.g. `attn`) is kernel
time.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _top_ops(trace_dir: str, iters: int, top: int) -> None:
    from xprof.convert import raw_to_tool_data as rtd

    files = glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb")
    data, _ = rtd.xspace_to_tool_data(files, "op_profile", {})
    d = json.loads(data)

    def walk(node, depth=0):
        m = node.get("metrics", {})
        yield node.get("name", ""), m.get("normalizedTimePs", 0), m.get(
            "flops", 0
        ), depth
        for ch in node.get("children", []):
            yield from walk(ch, depth + 1)

    prog = d["byProgram"]
    total = prog["metrics"]["normalizedTimePs"]
    rows = [(n, t, fl) for n, t, fl, dep in walk(prog) if dep == 3]
    rows.sort(key=lambda r: -r[1])
    print(
        f"total {total / 1e9 / iters:.2f} ms/iter, "
        f"device flops util {prog['metrics']['flops']:.3f}"
    )
    for n, t, fl in rows[:top]:
        flops = f" flops={fl:4.2f}" if fl else ""
        print(f"{t / total * 100:5.1f}%  {t / 1e9 / iters:8.3f} ms{flops}  {n[:78]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="forward",
                    choices=["forward", "loss", "train"])
    ap.add_argument("--arch", default="depthanything-base")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=392)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--teacher_chunk", type=int, default=8,
                    help="train: lax.map teacher chunk (bench.py default 8; "
                         "0 disables)")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    if args.what == "forward":
        from distill_any_depth_tpu.models.factory import create_model, init_params

        model = create_model(args.arch, dtype=jnp.bfloat16)
        params = init_params(model, 0, image_size=args.size)
        x = jnp.asarray(
            rng.rand(args.batch, args.size, args.size, 3), jnp.bfloat16
        )
        fn = jax.jit(lambda p, xx: model.apply({"params": p}, xx)[0])
        run = lambda: fn(params, x)  # noqa: E731
    elif args.what == "train":
        # the bench.py distillation step: ViT-L bf16 teacher -> ViT-B
        # student, bs16 default, shared-view, full loss stack
        from distill_any_depth_tpu.configs import LossConfig, OptimizerConfig
        from distill_any_depth_tpu.models.factory import create_model, init_params
        from distill_any_depth_tpu.train.state import create_train_state
        from distill_any_depth_tpu.train.step import make_train_step

        student = create_model("depthanything-base", dtype=jnp.bfloat16)
        teacher = create_model("depthanything-large", dtype=jnp.bfloat16)
        sp = init_params(student, 0, image_size=args.size)
        tp = init_params(teacher, 1, image_size=args.size)
        state, tx = create_train_state(
            sp, OptimizerConfig(lr=5e-6, warmup_steps=0, schedule="none",
                                total_steps=10_000)
        )
        step = make_train_step(
            lambda p, xx: student.apply({"params": p}, xx.astype(jnp.bfloat16)),
            [lambda p, xx: teacher.apply({"params": p}, xx.astype(jnp.bfloat16))],
            tx, LossConfig(), seed=0, views_shared=True,
            teacher_chunk=args.teacher_chunk,
        )
        holder = {"state": state}
        xs = jnp.asarray(rng.rand(args.batch, args.size, args.size, 3),
                         jnp.float32)

        def run():
            holder["state"], metrics = step(holder["state"], (tp,), xs, xs)
            return metrics["total"]
    else:
        from distill_any_depth_tpu.configs import LossConfig
        from distill_any_depth_tpu.losses.distill import combined_distillation_loss
        from distill_any_depth_tpu.losses.feature import feature_distillation_loss

        cfg = LossConfig()
        n_tok = (args.size // 14) ** 2
        s_feat = jnp.asarray(rng.rand(args.batch, n_tok, 768), jnp.float32)
        t_feat = jnp.asarray(rng.rand(args.batch, n_tok, 1024), jnp.float32)
        td = jnp.asarray(rng.rand(args.batch, args.size, args.size), jnp.float32)

        @jax.jit
        def g(sd):
            def loss(sd):
                fl = feature_distillation_loss(s_feat, t_feat)
                total, _ = combined_distillation_loss(
                    cfg, sd, sd, s_feat, td, feat_loss=fl
                )
                return total

            return jax.grad(loss)(sd)

        run = lambda: g(td + 0.5)  # noqa: E731

    r = run()
    jax.block_until_ready(r)
    float(jnp.sum(jax.tree_util.tree_leaves(r)[0].astype(jnp.float32)))

    trace_dir = tempfile.mkdtemp(prefix="dad_trace_")
    try:
        with jax.profiler.trace(trace_dir):
            for _ in range(args.iters):
                r = run()
            float(jnp.sum(jax.tree_util.tree_leaves(r)[0].astype(jnp.float32)))
        _top_ops(trace_dir, args.iters, args.top)
    finally:
        shutil.rmtree(trace_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
