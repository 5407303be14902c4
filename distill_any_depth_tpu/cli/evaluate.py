"""NYU evaluation CLI — the fixed tools/evaluate.py.

Evaluates one or two checkpoints (distilled vs original) on nyu2_test with
mean-ratio alignment + the 8-metric set and writes a comparison report.
"""
from __future__ import annotations

import argparse
import logging


def argument_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Evaluate depth models on NYU test.")
    p.add_argument("--arch_name", default="depthanything-base")
    p.add_argument("--model_path", default=None, help="distilled checkpoint")
    p.add_argument("--original_model_path", default=None,
                   help="optional second checkpoint to compare against")
    p.add_argument("--dataset", default="nyu_csv",
                   help="'nyu_csv' (the nyu2_test.csv layout, default) or a "
                        "registered benchmark: nyu/kitti/eth3d/diode/scannet "
                        "(split-list layouts; data/registry.py — the working "
                        "version of the reference's dead dataset YAMLs)")
    p.add_argument("--filenames", default=None,
                   help="override the registry's split-list path")
    p.add_argument("--eval_resolution", default="default",
                   choices=["default", "native", "square"],
                   help="registry datasets only: 'native' evaluates at GT "
                        "resolution (keep-aspect image, prediction "
                        "upsampled — the geobench/Marigold protocol; the "
                        "default for every benchmark except NYU); 'square' "
                        "resizes both to image_size x image_size (NYU "
                        "reference parity)")
    p.add_argument("--mask_crop", default="default",
                   choices=["default", "eigen", "garg", "none"],
                   help="registry datasets only: override the valid-mask "
                        "crop policy (KITTI: eigen or garg)")
    p.add_argument("--data_dir", default="data/nyu")
    p.add_argument("--image_size", type=int, default=392)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--output", default="evaluation_report.txt")
    p.add_argument("--dtype", default="float32")
    p.add_argument("--raw_255", action="store_true",
                   help="feed raw 0-255 images (the reference loader's "
                        "silent-transform-failure behavior, tools/"
                        "data_loaders.py:141-150) instead of ImageNet-"
                        "normalized — for cross-framework parity runs")
    return p


def main(args=None) -> dict:
    import jax
    import jax.numpy as jnp

    from distill_any_depth_tpu.configs import model_config
    from distill_any_depth_tpu.data.nyu import NYUDataset, iterate_batches
    from distill_any_depth_tpu.eval.evaluate import evaluate_model, write_report
    from distill_any_depth_tpu.models.factory import create_model, init_params
    from distill_any_depth_tpu.utils.checkpoint import load_safetensors

    if args is None:
        args = argument_parser().parse_args()
    logging.basicConfig(level=logging.INFO)

    cfg = model_config(args.arch_name)
    model = create_model(cfg, dtype=jnp.dtype(args.dtype))
    if args.dataset == "nyu_csv":
        ds = NYUDataset("test", dataset_dir=args.data_dir,
                        image_size=args.image_size, raw_255=args.raw_255)
    else:
        from distill_any_depth_tpu.data.registry import FileListDataset

        native = {"default": None, "native": True, "square": False}[
            args.eval_resolution]
        crop = ("default" if args.mask_crop == "default"
                else None if args.mask_crop == "none" else args.mask_crop)
        ds = FileListDataset(args.dataset, args.data_dir,
                             image_size=args.image_size,
                             filenames=args.filenames,
                             native_resolution=native,
                             valid_mask_crop=crop)

    def load(path):
        if path is None:
            logging.warning("no checkpoint: random init")
            return init_params(model, 0, image_size=args.image_size)
        return jax.tree_util.tree_map(
            jnp.asarray, load_safetensors(path, cfg)
        )

    results = {}
    results["distilled"] = evaluate_model(
        model, load(args.model_path),
        iterate_batches(ds, args.batch_size, shuffle=False),
    )
    if args.original_model_path:
        results["original"] = evaluate_model(
            model, load(args.original_model_path),
            iterate_batches(ds, args.batch_size, shuffle=False),
        )
    write_report(args.output, results)
    for name, m in results.items():
        logging.info("%s: %s", name, {k: round(v, 4) for k, v in m.items()})
    return results


if __name__ == "__main__":
    main()
