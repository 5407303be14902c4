"""Batched teacher pseudo-label inference.

Config 2 of the capability set (BASELINE.md): run the ViT-L teacher at 518^2
over an image folder in batches, producing per-image pseudo-label depth maps
(float32 .npy plus optional 16-bit PNG) for downstream distillation —
the batched equivalent of the reference teacher forward
(tools/train_distillation.py:1420-1421, 1513-1514) as a standalone tool.
"""
from __future__ import annotations

import argparse
import logging
import os
from glob import glob

import numpy as np


def argument_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Batched teacher pseudo-label inference.")
    p.add_argument("--arch_name", default="depthanything-large")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--input", required=True, help="image folder")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--processing_res", type=int, default=518)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--quant", default="none", choices=["none", "int8", "int8_pallas"],
                   help="int8: dynamic-W8A8 encoder GEMMs via XLA (the fast one); "
                        "int8_pallas: fused-quant Pallas kernel — measured "
                        "SLOWER end-to-end (0.81x, kept as the documented "
                        "counter-example, docs/DESIGN.md)")
    p.add_argument("--fused_tail", default="auto", choices=["auto", "on", "off"],
                   help="fused Pallas DPT-head tail (ops/dpt_tail); "
                        "auto = on for TPU backends")
    p.add_argument("--save_png16", action="store_true",
                   help="also save normalized uint16 PNGs")
    return p


def main(args=None) -> list[str]:
    import cv2
    import jax
    import jax.numpy as jnp

    from distill_any_depth_tpu.configs import model_config
    from distill_any_depth_tpu.models.factory import (
        create_model,
        init_params,
        resolve_fused_tail,
    )
    from distill_any_depth_tpu.ops.preprocess import preprocess_on_device, snap_to_bucket
    from distill_any_depth_tpu.utils.checkpoint import load_safetensors

    if args is None:
        args = argument_parser().parse_args()
    logging.basicConfig(level=logging.INFO)

    cfg = model_config(args.arch_name)
    model = create_model(cfg, dtype=jnp.dtype(args.dtype), quant=args.quant,
                         fused_tail=resolve_fused_tail(
                             getattr(args, "fused_tail", "auto")))
    if args.checkpoint:
        params = jax.tree_util.tree_map(
            jnp.asarray, load_safetensors(args.checkpoint, cfg)
        )
    else:
        logging.warning("no checkpoint: random init (smoke-test mode)")
        params = init_params(model, 0, image_size=snap_to_bucket(args.processing_res))

    target = snap_to_bucket(args.processing_res)

    @jax.jit
    def forward(p, raw_uint8):
        x = preprocess_on_device(raw_uint8, target, dtype=model.dtype)
        depth, _ = model.apply({"params": p}, x)
        return depth.astype(jnp.float32)

    paths = sorted(
        p for p in glob(os.path.join(args.input, "*"))
        if p.lower().endswith((".jpg", ".jpeg", ".png"))
    )
    os.makedirs(args.output_dir, exist_ok=True)
    written = []

    bs = max(args.batch_size, 1)
    shard = None
    n_dev = jax.local_device_count()
    if bs > 1 and n_dev > 1:
        # shard each batch over every local chip (same scheme as cli/infer)
        from distill_any_depth_tpu.parallel.mesh import (
            batch_sharding,
            make_mesh,
            replicate,
        )

        bs = -(-bs // n_dev) * n_dev
        mesh = make_mesh(dp=n_dev, model=1, devices=jax.local_devices())
        params = replicate(mesh, params)
        shard = batch_sharding(mesh)
        logging.info("data-parallel pseudo-labeling over %d devices, batch %d",
                     n_dev, bs)
    # pad the final batch to keep one compiled program
    for start in range(0, len(paths), bs):
        chunk = paths[start : start + bs]
        raws = []
        for p in chunk:
            img = cv2.imread(p)
            if img is None:
                logging.warning("skipping unreadable %s", p)
                continue
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            # host-side square resize keeps batches stackable; the device
            # bucket resize is a no-op when sizes already match
            img = cv2.resize(img, (target, target), interpolation=cv2.INTER_CUBIC)
            raws.append(img)
        if not raws:
            continue
        n = len(raws)
        while len(raws) < bs:
            raws.append(np.zeros_like(raws[0]))
        batch = jnp.asarray(np.stack(raws), jnp.uint8)
        if shard is not None:
            batch = jax.device_put(batch, shard)
        depth = np.asarray(forward(params, batch))[:n]

        for p, d in zip(chunk, depth):
            stem = os.path.splitext(os.path.basename(p))[0]
            npy_path = os.path.join(args.output_dir, f"{stem}_depth.npy")
            np.save(npy_path, d)
            written.append(npy_path)
            if args.save_png16:
                span = max(float(d.max() - d.min()), 1e-8)
                png = ((d - d.min()) / span * 65535).astype(np.uint16)
                cv2.imwrite(os.path.join(args.output_dir, f"{stem}_depth.png"), png)
        logging.info("pseudo-labeled %d/%d", min(start + bs, len(paths)), len(paths))
    return written


if __name__ == "__main__":
    main()
