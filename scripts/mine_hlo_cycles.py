"""Rank optimized-HLO instructions by backend-estimated cycles.

Compiles the ViT-B 392^2 bs8 forward (or the full distill step with
--what train), parses the optimized HLO's backend_config
"estimated_cycles" fields, and prints the top instructions plus an
aggregate by op family — the round-4/5 method for finding layout-copy
and low-utilization blocks without an xprof trace.

    python scripts/profile.py mine_cycles [--what forward|train] [--top 40]
"""
from __future__ import annotations

import argparse
import collections
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _family(line: str, name: str) -> str:
    """Coarse op family for aggregation."""
    if "custom-call" in line:
        return "custom-call (pallas)"
    m = re.search(r"= \S+ (\w+)\(", line)
    op = m.group(1) if m else "?"
    if op == "fusion":
        for kind in ("transpose", "copy", "convert", "reduce", "dot", "conv"):
            if kind in name:
                return f"fusion:{kind}"
        return "fusion:other"
    return op


def mine(hlo: str, top: int):
    rows = []
    for line in hlo.splitlines():
        m = re.search(r'"estimated_cycles":\s*"?(\d+)"?', line)
        if not m:
            continue
        cycles = int(m.group(1))
        nm = re.search(r"%?([\w.\-]+) =", line.strip())
        name = nm.group(1) if nm else "?"
        rows.append((cycles, name, _family(line, name)))
    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)
    print(f"total estimated cycles: {total:,} ({len(rows)} instrs)")
    agg = collections.Counter()
    for c, _, fam in rows:
        agg[fam] += c
    print("\nby family:")
    for fam, c in agg.most_common():
        print(f"  {fam:24s} {c:>14,}  {100 * c / total:5.1f}%")
    print(f"\ntop {top} instructions:")
    for c, name, fam in rows[:top]:
        print(f"  {c:>12,}  {100 * c / total:5.2f}%  [{fam}] {name}")
    return rows, total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="forward", choices=["forward", "train"])
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--dump", default=None, help="also write the HLO here")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from distill_any_depth_tpu.models.factory import create_model, init_params

    if args.what == "forward":
        model = create_model("depthanything-base", dtype=jnp.bfloat16)
        params = init_params(model, 0, image_size=392)
        x = jnp.asarray(np.random.RandomState(0).rand(8, 392, 392, 3), jnp.bfloat16)

        def forward(p, xx):
            d, _ = model.apply({"params": p}, xx)
            return d.astype(jnp.float32)

        compiled = jax.jit(forward).lower(params, x).compile()
    else:
        from distill_any_depth_tpu.configs import LossConfig, OptimizerConfig
        from distill_any_depth_tpu.train.state import create_train_state
        from distill_any_depth_tpu.train.step import make_train_step

        student = create_model("depthanything-base", dtype=jnp.bfloat16)
        teacher = create_model("depthanything-large", dtype=jnp.bfloat16)
        sp = init_params(student, 0, image_size=392)
        tp = init_params(teacher, 1, image_size=392)
        state, tx = create_train_state(
            sp, OptimizerConfig(lr=5e-6, warmup_steps=0, schedule="none",
                                total_steps=10_000))
        step = make_train_step(
            lambda p, xx: student.apply({"params": p}, xx.astype(jnp.bfloat16)),
            [lambda p, xx: teacher.apply({"params": p}, xx.astype(jnp.bfloat16))],
            tx, LossConfig(), seed=0, views_shared=True, teacher_chunk=8)
        x = jnp.asarray(np.random.RandomState(1).rand(16, 392, 392, 3), jnp.float32)
        compiled = step.lower(state, (tp,), x, x).compile()

    hlo = compiled.as_text()
    if args.dump:
        with open(args.dump, "w") as f:
            f.write(hlo)
    rows, total = mine(hlo, args.top)
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        print(json.dumps({"flops": ca.get("flops"),
                          "bytes accessed": ca.get("bytes accessed")}))
    except Exception:
        pass


if __name__ == "__main__":
    main()
