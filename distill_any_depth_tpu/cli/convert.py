"""Checkpoint conversion CLI (tools/convert_checkpoint.py equivalent):
remaps pretrained.* -> backbone.* so a DepthAnything-V2 checkpoint loads into
the teacher architecture."""
from __future__ import annotations

import argparse
import logging


def main(args=None) -> int:
    p = argparse.ArgumentParser(description="Convert checkpoint key namespace.")
    p.add_argument("input", help="input .safetensors")
    p.add_argument("output", help="output .safetensors")
    if args is None:
        args = p.parse_args()
    logging.basicConfig(level=logging.INFO)

    from distill_any_depth_tpu.utils.checkpoint import convert_checkpoint

    n = convert_checkpoint(args.input, args.output)
    logging.info("remapped %d keys -> %s", n, args.output)
    return n


if __name__ == "__main__":
    main()
