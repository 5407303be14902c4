"""One entry point for every profiling harness in this directory.

    python scripts/profile.py --list
    python scripts/profile.py <what> [args passed through to the harness]

Each harness stays its own module (its numbers back specific lines in
docs/DESIGN.md, so provenance matters more than file count); this dispatcher
is the maintained surface. `trace_report` (xprof top-ops) is included.
"""
from __future__ import annotations

import argparse
import importlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_HARNESSES = {
    "attention": ("profile_attention", "flash vs reference attention shapes"),
    "attn_layout": ("profile_attn_layout", "QKV packing / layout experiments"),
    "attn_mask": ("profile_attn_mask", "n_valid mask / exp precision variants"),
    "chunk_mesh": ("profile_chunk_mesh", "teacher chunking under a dp mesh"),
    "banded": ("profile_banded", "banded window kernel vs dense"),
    "batch_sweep": ("profile_batch_sweep", "inference img/s vs batch size"),
    "block": ("profile_block", "single transformer block pieces"),
    "block_overhead": ("profile_block_overhead", "block dispatch overheads"),
    "bwd_sweep": ("profile_bwd_sweep", "attention backward variants"),
    "conv_variants": ("profile_conv_variants", "DPT tail conv lowerings"),
    "encoder_pieces": ("profile_encoder_pieces", "encoder stage timings"),
    "flat_gemm": ("profile_flat_gemm", "3D batched vs 2D flat GEMM+LN emitter"),
    "head": ("profile_head", "DPT head stage timings"),
    "hypotheses": ("profile_hypotheses", "micro A/B experiments"),
    "inference": ("profile_inference", "full forward timings"),
    "int8_gemm": ("profile_int8_gemm", "raw int8 vs bf16 GEMM rates"),
    "loss_stack": ("profile_loss_stack", "distillation loss fwd+bwd"),
    "mask_ab": ("profile_mask_ab", "interleaved where vs kzero full-model A/B"),
    "mine_cycles": ("mine_hlo_cycles", "rank optimized-HLO estimated cycles"),
    "packed_tail": ("profile_packed_tail", "packed space-to-depth tail"),
    "param_dtype": ("profile_param_dtype", "fp32 vs bf16 param storage"),
    "quant": ("profile_quant", "W8A8 end-to-end forwards"),
    "softmax_variants": ("profile_softmax_variants", "softmax lowerings"),
    "teacher_chunk": ("profile_teacher_chunk", "chunked bs16 teacher"),
    "train_pieces": ("profile_train_pieces", "train step decomposition"),
    "window_teacher": ("profile_window_teacher",
                       "windowed ViT-B teacher fwd + distill step"),
    "trace": ("trace_report", "xprof top-ops for forward/loss/train"),
}


def main() -> None:
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    ap.add_argument("what", nargs="?", choices=sorted(_HARNESSES), metavar="what")
    ap.add_argument("--list", action="store_true", help="list harnesses")
    args, passthrough = ap.parse_known_args()

    if args.list or args.what is None:
        for k in sorted(_HARNESSES):
            print(f"{k:18s} {_HARNESSES[k][1]}")
        return

    mod_name, _ = _HARNESSES[args.what]
    mod = importlib.import_module(mod_name)
    sys.argv = [mod_name] + passthrough  # harnesses parse their own args
    mod.main()


if __name__ == "__main__":
    main()
