"""Single-image depth inference CLI.

The working equivalent of tools/testers/infer.py: glob images, preprocess,
batched jitted forward (bf16 by default on TPU), min-max normalize,
Spectral_r colorize, save JPEGs. Multi-process NCCL launching is replaced by
one process driving all local devices; images are sharded across chips rather
than duplicated per rank (the reference ran the identical glob on every rank,
infer.py:169,187-193).

Preprocessing runs ON DEVICE by default in fixed-resolution mode: the host
only decodes, raw uint8 ships to the chip, and the resize (MXU matrix
einsum) + /255 + ImageNet normalization run as XLA ops — unlike the
reference, whose host does a full cv2 INTER_CUBIC resize + normalize per
image (tools/testers/infer.py:125-127). ``--host_preprocess`` restores the
cv2 path (bit-parity with the reference's sizing); native-resolution mode
(``--processing_res 0``) always uses it because per-image lower_bound sizing
is a host decision.
"""
from __future__ import annotations

import argparse
import logging
import os
from glob import glob

import numpy as np


def argument_parser() -> argparse.ArgumentParser:
    from distill_any_depth_tpu.configs import MODELS

    p = argparse.ArgumentParser(description="Run single-image depth estimation.")
    p.add_argument("--arch_name", default="depthanything-large",
                   choices=sorted(MODELS))
    p.add_argument("--checkpoint", required=False, default=None,
                   help="safetensors checkpoint (reference layout); random init if omitted")
    p.add_argument("--input", default="data/input", help="image file or directory")
    p.add_argument("--output_dir", required=True)
    p.add_argument(
        "--processing_res", type=int, default=392,
        help="square processing resolution; 0 = keep each image's native "
        "resolution snapped to the multiple-of-14 grid (the reference CLI's "
        "intended default — its own 0-path computes a 0x0 resize, "
        "tools/testers/infer.py:38,172 + transform.get_size)",
    )
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    p.add_argument("--quant", default="none", choices=["none", "int8", "int8_pallas"],
                   help="int8: dynamic-W8A8 encoder GEMMs via XLA (the fast one); "
                        "int8_pallas: fused-quant Pallas kernel — measured "
                        "SLOWER end-to-end (0.81x, kept as the documented "
                        "counter-example, docs/DESIGN.md)")
    p.add_argument("--fused_tail", default="auto", choices=["auto", "on", "off"],
                   help="run the DPT-head tail as one Pallas kernel "
                        "(ops/dpt_tail; forward-only). auto = on for TPU "
                        "backends, off elsewhere")
    p.add_argument("--cmap", default="Spectral_r")
    p.add_argument(
        "--host_preprocess", action="store_true",
        help="resize + normalize on the host with cv2 (the reference's "
        "pipeline, tools/testers/infer.py:125-127) instead of the default "
        "device-side resize; implied by --processing_res 0",
    )
    p.add_argument("--save_npy", action="store_true",
                   help="also write the raw min-max-normalized disparity at "
                        "processing resolution as .npy (the reference saves "
                        "only the lossy colorized JPEG)")
    p.add_argument(
        "--batch_size", type=int, default=8,
        help="images per forward at a fixed --processing_res (native-res "
        "mode runs one image at a time; shapes differ). With more than one "
        "local device the batch is additionally sharded over a data-parallel "
        "jax.sharding.Mesh — one process drives all chips.",
    )
    return p


def main(args=None) -> list[str]:
    import cv2
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from distill_any_depth_tpu.configs import model_config
    from distill_any_depth_tpu.data.transforms import standard_transform
    from distill_any_depth_tpu.models.factory import (
        create_model,
        init_params,
        resolve_fused_tail,
    )
    from distill_any_depth_tpu.utils.checkpoint import load_safetensors
    from distill_any_depth_tpu.utils.image_util import (
        chw2hwc,
        colorize_depth_maps,
        normalize_disparity,
    )

    if args is None:
        args = argument_parser().parse_args()
    logging.basicConfig(level=logging.INFO)

    cfg = model_config(args.arch_name)
    model = create_model(cfg, dtype=jnp.dtype(args.dtype), quant=args.quant,
                         fused_tail=resolve_fused_tail(
                             getattr(args, "fused_tail", "auto")))
    if args.checkpoint:
        params = load_safetensors(args.checkpoint, cfg)
        params = jax.tree_util.tree_map(jnp.asarray, params)
    else:
        logging.warning("no checkpoint: using random init (smoke-test mode)")
        params = init_params(
            model, 0, image_size=args.processing_res if args.processing_res > 0 else 392
        )

    forward = jax.jit(lambda p, x: model.apply({"params": p}, x)[0])

    from distill_any_depth_tpu.data.transforms import (
        Compose,
        NormalizeImage,
        PrepareForNet,
        Resize,
    )

    fixed_transform = (
        standard_transform(args.processing_res, keep_aspect_ratio=False)
        if args.processing_res > 0
        else None
    )

    device_prep = None
    if fixed_transform is not None and not args.host_preprocess:
        from distill_any_depth_tpu.ops.preprocess import preprocess_on_device

        res = args.processing_res
        # one compiled program per distinct raw (H, W) — the host ships
        # decoded uint8 and the square bicubic resize runs on the MXU
        device_prep = jax.jit(
            lambda raw: preprocess_on_device(raw[None], res, dtype=model.dtype)[0]
        )

    def make_transform(h: int, w: int):
        if fixed_transform is not None:
            return fixed_transform
        # native resolution: target = the image's own size, run through the
        # same lower_bound/multiple-of-14 sizing contract (jit caches one
        # program per resulting shape)
        return Compose([
            Resize(
                w, h, resize_target=False, keep_aspect_ratio=False,
                ensure_multiple_of=14, resize_method="lower_bound",
            ),
            NormalizeImage(),
            PrepareForNet(),
        ])
    paths = (
        sorted(glob(os.path.join(args.input, "*")))
        if os.path.isdir(args.input)
        else [args.input]
    )
    # multi-process runs shard the work; the reference ran the identical
    # glob on every rank (tools/testers/infer.py:169)
    from distill_any_depth_tpu.parallel import launch

    if launch.process_count() > 1:
        paths = paths[launch.process_index() :: launch.process_count()]
    out_dir = os.path.join(args.output_dir, "image_logs")
    os.makedirs(out_dir, exist_ok=True)

    # Fixed-resolution batching + local-mesh data parallelism: one process,
    # one jitted program, batch axis sharded over every local chip (the
    # reference instead spawned one process per GPU and ran the same glob on
    # each, infer.py:169,187-193).
    batch = max(args.batch_size, 1) if fixed_transform is not None else 1
    shard = None
    if batch > 1:
        n_dev = jax.local_device_count()
        if n_dev > 1:
            from distill_any_depth_tpu.parallel.mesh import (
                batch_sharding,
                make_mesh,
                replicate,
            )

            batch = -(-batch // n_dev) * n_dev  # round up to a full mesh row
            mesh = make_mesh(dp=n_dev, model=1, devices=jax.local_devices())
            params = replicate(mesh, params)
            shard = batch_sharding(mesh)
            logging.info("data-parallel inference over %d devices, batch %d",
                         n_dev, batch)

    def save_one(i, path, pred, h, w):
        disp = normalize_disparity(pred)
        stem0 = os.path.splitext(os.path.basename(path))[0]
        if args.save_npy:
            np.save(os.path.join(out_dir, f"depth_{stem0}.npy"), disp)
        colored = colorize_depth_maps(disp[None], 0, 1, cmap=args.cmap)[0]
        colored = (chw2hwc(colored) * 255).astype(np.uint8)
        colored = cv2.resize(colored, (w, h), interpolation=cv2.INTER_LINEAR)
        # name by input stem: shard-local indices would collide across ranks
        stem = os.path.splitext(os.path.basename(path))[0]
        out_path = os.path.join(out_dir, f"depth_{stem}.jpg")
        Image.fromarray(colored).save(out_path)
        logging.info("%d %s -> %s", i, path, out_path)
        return out_path

    written = []
    pending: list[tuple[int, str, np.ndarray, int, int]] = []

    def flush():
        if not pending:
            return
        xp = jnp if device_prep is not None else np
        xs = xp.stack([p[2] for p in pending])
        if len(pending) < batch:  # pad the tail batch to the compiled shape
            pad = xp.repeat(xs[-1:], batch - len(pending), axis=0)
            xs = xp.concatenate([xs, pad])
        xj = jnp.asarray(xs, model.dtype)
        if shard is not None:
            xj = jax.device_put(xj, shard)
        preds = np.asarray(forward(params, xj), np.float32)
        for (i, path, _, h, w), pred in zip(pending, preds):
            written.append(save_one(i, path, pred, h, w))
        pending.clear()

    for i, path in enumerate(paths):
        raw = cv2.imread(path)
        if raw is None:
            logging.warning("skipping unreadable %s", path)
            continue
        rgb_u8 = cv2.cvtColor(raw, cv2.COLOR_BGR2RGB)
        h, w = rgb_u8.shape[:2]
        if device_prep is not None:
            x = device_prep(jnp.asarray(rgb_u8))  # host work ends at decode
        else:
            rgb = rgb_u8.astype(np.float32) / 255.0
            x = make_transform(h, w)({"image": rgb})["image"]
        pending.append((i, path, x, h, w))
        if len(pending) >= batch:
            flush()
    flush()
    return written


if __name__ == "__main__":
    main()
