"""Distillation training loop.

Host-side orchestration around the jitted step (train/step.py): epochs,
train/val split, per-interval logging, checkpointing (orbax resume state +
safetensors interop exports), best-model tracking, early stopping, and an
emergency checkpoint on any exception — feature-parity with the reference
loop (tools/train_distillation.py:1148-1696) minus its per-image degenerate
path, plus exact resume.
"""
from __future__ import annotations

import json
import logging
import os
import time
from typing import Any, Callable, Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from distill_any_depth_tpu.configs import TrainConfig
from distill_any_depth_tpu.data.nyu import NYUDataset, iterate_batches
from distill_any_depth_tpu.models.factory import (
    create_model,
    init_params,
    resolve_fused_tail,
)
from distill_any_depth_tpu.train.state import (
    TrainState,
    create_train_state,
    make_lr_schedule,
)
from distill_any_depth_tpu.train.step import make_eval_loss_fn, make_train_step
from distill_any_depth_tpu.utils import checkpoint as ckpt_io
from distill_any_depth_tpu.utils.profiling import StepTimer
from distill_any_depth_tpu.configs import model_config

logger = logging.getLogger("distill_any_depth_tpu.train")

__all__ = ["Trainer", "train_nyu", "train_images"]

# Below this input size the windowed ViT-B teacher is strictly slower than a
# plain teacher (dense window-bias regime; measured crossover between 392
# and 518 px — docs/DESIGN.md windowed-teacher table).
WINDOWED_TEACHER_MIN_SIZE = 518


class Trainer:
    """Builds models + jitted step from a TrainConfig and runs epochs."""

    def __init__(self, cfg: TrainConfig, mesh=None):
        self.cfg = cfg
        if mesh is None and (cfg.dp > 1 or cfg.tp > 1):
            from distill_any_depth_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(dp=cfg.dp, model=cfg.tp)
        self.mesh = mesh
        student_dtype = jnp.dtype(cfg.student_compute_dtype)
        teacher_dtype = jnp.dtype(cfg.teacher_dtype)

        self.student = create_model(
            cfg.student, dtype=student_dtype, attn_impl=cfg.attn_impl,
            remat=cfg.student_remat,
        )
        self.student_params = init_params(self.student, cfg.seed, cfg.image_size)

        self.teachers = []
        self.teacher_params = []
        for i, name in enumerate(cfg.teachers):
            tcfg = model_config(name)
            if (tcfg.encoder.window_size is not None
                    and cfg.image_size < WINDOWED_TEACHER_MIN_SIZE):
                # Measured crossover (v5e, docs/DESIGN.md round-5 table):
                # below ~518px the windowed ViT-B's dense window-bias
                # attention costs more than a PLAIN teacher — the full
                # distill step is 238.7 ms with the windowed teacher at
                # bs16 392^2 vs 205 ms with ViT-L. The windowed variant
                # exists for high resolution (>=518px: 45.3 vs 98.9
                # ms/batch8 teacher forward); don't let the slow config be
                # picked silently.
                logger.warning(
                    "teacher %s: windowed attention LOSES below %dpx "
                    "(image_size=%d): measured 238.7 ms/step vs 205 ms with "
                    "a plain ViT-L teacher at 392px. Use it at >=%dpx, or "
                    "prefer 'depthanything-large' here.",
                    name, WINDOWED_TEACHER_MIN_SIZE, cfg.image_size,
                    WINDOWED_TEACHER_MIN_SIZE,
                )
            model = create_model(tcfg, dtype=teacher_dtype, attn_impl=cfg.attn_impl,
                                 quant=cfg.teacher_quant,
                                 fused_tail=resolve_fused_tail(
                                     cfg.teacher_fused_tail))
            if i < len(cfg.teacher_checkpoints) and cfg.teacher_checkpoints[i]:
                params = ckpt_io.load_safetensors(cfg.teacher_checkpoints[i], tcfg)
                params = jax.tree_util.tree_map(jnp.asarray, params)
            else:
                logger.warning("teacher %s: no checkpoint given, random init", name)
                params = init_params(model, 100 + i, cfg.image_size)
            self.teachers.append(model)
            self.teacher_params.append(params)

        if self.mesh is not None:
            if cfg.tp > 1:
                # Megatron-style TP placement on student AND teachers; the
                # optimizer state created below inherits the layout
                # (zeros_like preserves sharding) and jit picks it up from
                # the committed arguments
                from distill_any_depth_tpu.parallel.tp import shard_params

                self.student_params = shard_params(self.mesh, self.student_params)
                self.teacher_params = [
                    shard_params(self.mesh, p) for p in self.teacher_params
                ]
            else:
                from distill_any_depth_tpu.parallel.mesh import replicate

                self.student_params = replicate(self.mesh, self.student_params)
                self.teacher_params = [
                    replicate(self.mesh, p) for p in self.teacher_params
                ]

        opt = cfg.optimizer
        if cfg.adapter_only:
            import optax

            from distill_any_depth_tpu.models.adapters import adapter_label_tree
            from distill_any_depth_tpu.train.state import make_optimizer

            labels = adapter_label_tree(self.student_params)
            if "adapter" not in jax.tree_util.tree_leaves(labels):
                raise ValueError(
                    "adapter_only=True but the student has no LoRA/SSF "
                    "params — set lora_rank/use_ssf on the encoder config"
                )
            self.tx = optax.multi_transform(
                {"adapter": make_optimizer(opt), "frozen": optax.set_to_zero()},
                labels,
            )
            opt_state = self.tx.init(self.student_params)
            self.state = TrainState(
                step=jnp.zeros((), jnp.int32),
                params=self.student_params,
                opt_state=opt_state,
            )
        else:
            self.state, self.tx = create_train_state(self.student_params, opt)
        self.lr_schedule = make_lr_schedule(opt)

        self._device_prep = None
        if cfg.device_preprocess:
            import functools

            from distill_any_depth_tpu.ops.preprocess import preprocess_on_device

            # uint8 native-res batches -> [B, image_size, image_size, 3]
            # float32; the resize is an MXU matmul, the host only decodes
            self._device_prep = jax.jit(
                functools.partial(preprocess_on_device, target=cfg.image_size)
            )

        self._student_apply = lambda p, x: self.student.apply({"params": p}, x)  # noqa: E731
        self._teacher_applies = [
            (lambda p, x, m=m, d=teacher_dtype: m.apply({"params": p}, x.astype(d)))
            for m in self.teachers
        ]
        # steps are built lazily on the first batch: whether the global and
        # local views share one array decides whether the second student
        # forward can be skipped (make_train_step views_shared)
        self.train_step = None
        self.eval_loss = None

    def _build_steps(self, views_shared: bool) -> None:
        self.train_step = make_train_step(
            self._student_apply, self._teacher_applies, self.tx, self.cfg.loss,
            seed=self.cfg.seed, mesh=self.mesh, views_shared=views_shared,
            teacher_chunk=self.cfg.teacher_chunk,
        )
        self.eval_loss = make_eval_loss_fn(
            self._student_apply, self._teacher_applies, self.cfg.loss,
            seed=self.cfg.seed + 1, views_shared=views_shared,
        )

    # ------------------------------------------------------------------ run

    def run(
        self,
        train_batches: Callable[[int], Iterable[dict]],
        val_batches: Callable[[], Iterable[dict]] | None = None,
        max_steps: int | None = None,
        profile_dir: str | None = None,
        profile_steps: int = 3,
        steps_per_epoch: int | None = None,
    ) -> dict:
        """Train. ``train_batches(epoch)`` yields dicts with 'image' (and
        optionally 'global_image'/'local_image'). Returns a history dict.

        ``steps_per_epoch`` makes resume DATA-EXACT: a resumed run fast-
        forwards to epoch ``step // steps_per_epoch`` and skips
        ``step % steps_per_epoch`` batches of that epoch, so it continues the
        exact data order instead of re-seeing early-epoch batches."""
        cfg = self.cfg
        os.makedirs(cfg.output_dir, exist_ok=True)
        tp = tuple(self.teacher_params)
        history = {"train_loss": [], "val_loss": [], "lr": []}
        best_val = float("inf")
        epochs_without_improvement = 0
        start = time.time()
        step = int(self.state.step)
        max_steps = max_steps or (cfg.num_iterations or None)
        timer = StepTimer()
        profiling = False
        if profile_dir:
            jax.profiler.start_trace(profile_dir)
            profiling = True
        profile_until = step + profile_steps

        start_epoch, skip_batches = 0, 0
        if step > 0:
            if steps_per_epoch:
                start_epoch = step // steps_per_epoch
                skip_batches = step % steps_per_epoch
                logger.info(
                    "resuming at step %d -> epoch %d, skipping %d batches",
                    step, start_epoch, skip_batches,
                )
            else:
                logger.warning(
                    "resuming at step %d without steps_per_epoch: optimizer "
                    "state is exact but the data order restarts at epoch 0",
                    step,
                )

        try:
            for epoch in range(start_epoch, cfg.num_epochs):
                epoch_loss, nbatches = None, 0
                batches = train_batches(epoch)
                if epoch == start_epoch and skip_batches:
                    import itertools as _it

                    batches = _it.islice(batches, skip_batches, None)
                for batch in batches:
                    if max_steps and step >= max_steps:
                        break
                    if self.train_step is None:
                        self._build_steps("global_image" not in batch)
                    g, l = _views(batch, self.mesh, self._device_prep)
                    self.state, metrics = self.train_step(self.state, tp, g, l)
                    step += 1
                    # keep the loss on-device: a float() here would sync the
                    # host every step and kill async dispatch pipelining
                    epoch_loss = (
                        metrics["total"]
                        if epoch_loss is None
                        else epoch_loss + metrics["total"]
                    )
                    nbatches += 1
                    timer.tick(g.shape[0])
                    if profiling and step >= profile_until:
                        jax.profiler.stop_trace()
                        profiling = False
                        logger.info("profiler trace written to %s", profile_dir)

                    if step % cfg.log_interval == 0 or step == 1:
                        lr_now = float(self.lr_schedule(step))
                        history["lr"].append(lr_now)
                        comp = {
                            k: round(float(v), 4)
                            for k, v in metrics.items()
                            if k != "teacher_idx"
                        }
                        logger.info(
                            "step %d | epoch %d | %s | lr %.2e | %.2f img/s | %.1fs",
                            step, epoch + 1, comp, lr_now,
                            timer.images_per_sec, time.time() - start,
                        )
                    if cfg.checkpoint_interval and step % cfg.checkpoint_interval == 0:
                        self._save_step_checkpoint(step)
                    if cfg.visualize_interval and step % cfg.visualize_interval == 0:
                        self._visualize(g, l, step)
                if max_steps and step >= max_steps:
                    if nbatches:
                        history["train_loss"].append(float(epoch_loss) / nbatches)
                    break

                if nbatches:
                    history["train_loss"].append(float(epoch_loss) / nbatches)

                if val_batches is not None:
                    val = self.validate(val_batches())
                    history["val_loss"].append(val["total"])
                    logger.info("epoch %d validation: %s", epoch + 1, val)
                    if val["total"] < best_val:
                        best_val = val["total"]
                        epochs_without_improvement = 0
                        ckpt_io.save_safetensors(
                            os.path.join(cfg.output_dir, "student_best.safetensors"),
                            self.state.params, cfg.student,
                        )
                    else:
                        epochs_without_improvement += 1
                        if cfg.early_stopping and epochs_without_improvement >= cfg.early_stopping:
                            logger.info("early stopping at epoch %d", epoch + 1)
                            break
        except Exception:
            ckpt_io.save_safetensors(
                os.path.join(cfg.output_dir, "student_emergency.safetensors"),
                self.state.params, cfg.student,
            )
            logger.exception("training failed; emergency checkpoint written")
            raise
        finally:
            if profiling:
                try:
                    jax.profiler.stop_trace()
                except Exception:
                    pass

        ckpt_io.save_safetensors(
            os.path.join(cfg.output_dir, "student_final.safetensors"),
            self.state.params, cfg.student,
        )
        ckpt_io.save_train_state(
            os.path.join(cfg.output_dir, "train_state"), self.state
        )
        with open(os.path.join(cfg.output_dir, "history.json"), "w") as f:
            json.dump(history, f)
        try:
            from distill_any_depth_tpu.utils.visualize import plot_history

            plot_history(history, cfg.output_dir)
        except Exception:  # plotting must never fail a run
            logger.exception("history plotting failed")
        return history

    def _visualize(self, global_image, local_image, step: int) -> None:
        try:
            from distill_any_depth_tpu.utils.visualize import (
                visualize_depth_predictions,
            )

            s_depth, _ = self.student.apply({"params": self.state.params}, local_image)
            t_depth, _ = self.teachers[0].apply(
                {"params": self.teacher_params[0]},
                local_image.astype(self.teachers[0].dtype),
            )
            visualize_depth_predictions(
                np.asarray(s_depth, np.float32),
                np.asarray(t_depth, np.float32),
                step,
                self.cfg.output_dir,
            )
        except Exception:
            logger.exception("visualization failed")

    def validate(self, batches: Iterable[dict]) -> dict:
        sums: dict[str, float] = {}
        n = 0
        for i, batch in enumerate(batches):
            if self.eval_loss is None:
                self._build_steps("global_image" not in batch)
            g, l = _views(batch, self.mesh, self._device_prep)
            comps = self.eval_loss(
                self.state.params, tuple(self.teacher_params), jnp.int32(i), g, l
            )
            for k, v in comps.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            n += 1
        if n == 0:
            # empty validation stream: surface it instead of a KeyError on
            # history["val_loss"] downstream
            return {"total": float("nan")}
        return {k: v / n for k, v in sums.items()}

    def _save_step_checkpoint(self, step: int) -> None:
        path = os.path.join(
            self.cfg.output_dir, f"student_checkpoint_{step}.safetensors"
        )
        ckpt_io.save_safetensors(path, self.state.params, self.cfg.student)
        # resumable full train state alongside the interop weights
        try:
            ckpt_io.save_train_state(
                os.path.join(self.cfg.output_dir, "train_state"), self.state
            )
        except Exception:
            logger.exception("periodic train_state save failed")
        logger.info("saved checkpoint %s", path)

    def resume(self, path: str) -> None:
        self.state = ckpt_io.restore_train_state(path, template=self.state)
        if not isinstance(self.state, TrainState):
            self.state = TrainState(*self.state)


def _views(batch: dict, mesh=None, prep=None):
    """Global/local views: NYU batches use the same image for both
    (reference :1493-1494); image-folder batches carry both. With a mesh the
    batch axis is sharded over ``data``. uint8 batches (device_preprocess)
    ship raw and run ``prep`` on device AFTER sharding — the host moves 4x
    less data and the resize runs sharded on the MXU."""
    if "global_image" in batch:
        g = jnp.asarray(batch["global_image"])
        l = jnp.asarray(batch["local_image"])
    else:
        g = l = jnp.asarray(batch["image"])
    if mesh is not None:
        from distill_any_depth_tpu.parallel.mesh import shard_batch

        g = shard_batch(mesh, g)
        l = g if l is g else shard_batch(mesh, l)
    if prep is not None and g.dtype == jnp.uint8:
        shared = l is g
        g = prep(g)
        l = g if shared else prep(l)
    return g, l


def train_nyu(
    cfg: TrainConfig,
    root_dir: str | None = None,
    resume: str | None = None,
    profile_dir: str | None = None,
) -> dict:
    """End-to-end NYU distillation run (reference train(), :1148).

    Prefers the native C++ prefetching loader; falls back to the Python
    loader when the native runtime is unavailable.
    """
    if cfg.use_native_loader and not cfg.device_preprocess:
        # Fall back to the Python loader only when native SETUP fails; once
        # training starts, failures must propagate (a blanket except here
        # would silently restart a long run from scratch on any error).
        native_run = None
        try:
            native_run = _prepare_nyu_native(cfg, root_dir)
        except Exception:
            logger.exception("native loader setup failed; using Python loader")
        if native_run is not None:
            return native_run(resume, profile_dir)
    elif cfg.use_native_loader:
        logger.info(
            "device_preprocess=True: using the Python loader (uint8 ships "
            "raw; the native loader's C++ resize is the host-side strategy)"
        )

    ds = NYUDataset(
        "train", dataset_dir=cfg.dataset_dir, image_size=cfg.image_size,
        root_dir=root_dir, device_preprocess=cfg.device_preprocess,
    )
    n_val = int(len(ds) * cfg.val_split)
    indices = list(range(len(ds)))
    rng = np.random.RandomState(cfg.seed)
    rng.shuffle(indices)
    val_idx, train_idx = indices[:n_val], indices[n_val:]

    # multi-host: shard the epoch like the native loader does (the seeded
    # shuffle is host-consistent, so round-robin shards are disjoint)
    from distill_any_depth_tpu.parallel import launch

    shard_kw = dict(
        shard_index=launch.process_index(), num_shards=launch.process_count()
    )

    trainer = Trainer(cfg)
    if resume:
        trainer.resume(resume)
    return trainer.run(
        steps_per_epoch=(len(train_idx) // launch.process_count()) // cfg.batch_size,
        train_batches=lambda epoch: iterate_batches(
            ds, cfg.batch_size, shuffle=True, seed=cfg.seed + epoch,
            indices=train_idx, **shard_kw,
        ),
        val_batches=(
            (lambda: iterate_batches(
                ds, cfg.batch_size, shuffle=False, indices=val_idx, **shard_kw
            ))
            # < batch_size val samples PER SHARD would yield ZERO batches
            # (the iterator drops remainders) and an empty validation pass
            if len(val_idx) // launch.process_count() >= cfg.batch_size
            else None
        ),
        max_steps=cfg.num_iterations or None,
        profile_dir=profile_dir,
    )


def train_images(cfg: TrainConfig, image_dir: str | None = None,
                 min_local_crop: int = 384, resume: str | None = None,
                 profile_dir: str | None = None) -> dict:
    """Paper-style distillation on an unlabeled image folder: global view +
    random local crop per image (the intended behavior of the reference's
    truncated non-NYU branch, train_distillation.py:1576-1582, with the
    ImageDataset of :88-169). Both views are static-shape so one compiled
    step serves the whole run."""
    from distill_any_depth_tpu.data.images import ImageFolderDataset

    ds = ImageFolderDataset(
        image_dir or cfg.dataset_dir,
        global_size=cfg.image_size,
        local_size=cfg.image_size,
        min_local_crop=min(min_local_crop, cfg.image_size),
        seed=cfg.seed,
    )
    n_val = int(len(ds) * cfg.val_split)
    indices = list(range(len(ds)))
    rng = np.random.RandomState(cfg.seed)
    rng.shuffle(indices)
    val_idx, train_idx = indices[:n_val], indices[n_val:]

    def batches(idx_list, shuffle_seed=None):
        order = list(idx_list)
        if shuffle_seed is not None:
            np.random.RandomState(shuffle_seed).shuffle(order)
        n = (len(order) // cfg.batch_size) * cfg.batch_size
        for start in range(0, n, cfg.batch_size):
            samples = [ds[i] for i in order[start : start + cfg.batch_size]]
            yield {
                "global_image": np.stack([s.global_image for s in samples]),
                "local_image": np.stack([s.local_image for s in samples]),
            }

    trainer = Trainer(cfg)
    if resume:
        trainer.resume(resume)
    return trainer.run(
        train_batches=lambda epoch: batches(train_idx, cfg.seed + epoch),
        val_batches=(lambda: batches(val_idx)) if n_val >= cfg.batch_size else None,
        max_steps=cfg.num_iterations or None,
        profile_dir=profile_dir,
        steps_per_epoch=len(train_idx) // cfg.batch_size,
    )


def _prepare_nyu_native(cfg: TrainConfig, root_dir: str | None):
    """Set up the native-loader training path. Everything that can fail in a
    recoverable way (toolchain, CSV, loader construction) happens HERE so
    the caller can fall back to the Python loader; the returned callable
    runs training and lets real failures propagate."""
    from distill_any_depth_tpu.data import native_loader

    if not native_loader.available():
        raise RuntimeError("native loader not buildable")

    root = os.path.abspath(root_dir or os.getcwd())
    csv_name = "nyu2_train.csv"
    candidates = [
        os.path.join(cfg.dataset_dir, csv_name),
        os.path.join("data", csv_name),
        csv_name,
    ]
    csv_path = next((p for p in candidates if os.path.exists(p)), None)
    if csv_path is None:
        raise FileNotFoundError(f"CSV not found in {candidates}")

    with open(csv_path) as f:
        rows = [ln.strip() for ln in f if ln.strip()]
    rng = np.random.RandomState(cfg.seed)
    rng.shuffle(rows)
    n_val = int(len(rows) * cfg.val_split)
    n_train = len(rows) - n_val
    os.makedirs(cfg.output_dir, exist_ok=True)
    train_csv = os.path.join(cfg.output_dir, "split_train.csv")
    val_csv = os.path.join(cfg.output_dir, "split_val.csv")
    with open(train_csv, "w") as f:
        f.write("\n".join(rows[n_val:]))
    with open(val_csv, "w") as f:
        f.write("\n".join(rows[:n_val]))

    from distill_any_depth_tpu.parallel import launch

    n_procs = launch.process_count()
    # Every host must agree on steps/epoch or the SPMD collectives deadlock;
    # round-robin shards differ by up to one row, so derive the count from
    # the GLOBAL row count, not the local shard length.
    steps_per_epoch = max((n_train // n_procs) // cfg.batch_size, 1)
    val_steps = (n_val // n_procs) // cfg.batch_size if n_val else 0

    train_loader = native_loader.NativeNYULoader(
        train_csv, root, image_size=cfg.image_size, batch_size=cfg.batch_size,
        shuffle=True, seed=cfg.seed,
        shard_index=launch.process_index(), num_shards=n_procs,
    )
    val_loader = (
        native_loader.NativeNYULoader(
            val_csv, root, image_size=cfg.image_size, batch_size=cfg.batch_size,
            shuffle=False, seed=cfg.seed,
            shard_index=launch.process_index(), num_shards=n_procs,
        )
        if val_steps
        else None
    )

    def make_val_batches():
        # epoch=0 replays the same deterministic validation order each pass
        yield from val_loader.batches(val_steps, epoch=0)

    logger.info(
        "native loader: %d train samples (%d steps/epoch), %d val steps",
        len(train_loader), steps_per_epoch, val_steps,
    )

    def run(resume: str | None, profile_dir: str | None) -> dict:
        trainer = Trainer(cfg)
        if resume:
            trainer.resume(resume)
        try:
            # epoch-seeded orders + deterministic in-order delivery make the
            # steps_per_epoch fast-forward DATA-EXACT, same as the Python
            # loader (the skipped batches are re-decoded, not re-trained)
            return trainer.run(
                train_batches=lambda epoch: train_loader.batches(
                    steps_per_epoch, epoch=epoch
                ),
                val_batches=make_val_batches if val_steps else None,
                max_steps=cfg.num_iterations or None,
                profile_dir=profile_dir,
                steps_per_epoch=steps_per_epoch,
            )
        finally:
            train_loader.close()
            if val_loader is not None:
                val_loader.close()

    return run
