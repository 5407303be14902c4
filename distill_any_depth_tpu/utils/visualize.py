"""Training visualization: depth-prediction panels and loss/LR curves.

Covers the reference's visualize_depth_predictions (3-panel pred/gt/error
figures, tools/train_distillation.py:1073-1146) and the loss/LR plot dumps
(:1657-1680), without the reference's latent NameError when HDN is off
(SURVEY.md §2.2).
"""
from __future__ import annotations

import os

import numpy as np

__all__ = ["visualize_depth_predictions", "plot_history"]


def _agg():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def visualize_depth_predictions(
    student_depth, teacher_depth, step: int, output_dir: str, max_samples: int = 2
) -> str:
    """Save side-by-side student/teacher/abs-error panels. Inputs [B, H, W]."""
    plt = _agg()
    s = np.asarray(student_depth, np.float32)
    t = np.asarray(teacher_depth, np.float32)
    n = min(max_samples, s.shape[0])
    fig, axes = plt.subplots(n, 3, figsize=(12, 4 * n), squeeze=False)
    for i in range(n):
        err = np.abs(s[i] - t[i])
        for j, (img, title, cmap) in enumerate(
            [(s[i], "student", "Spectral_r"), (t[i], "teacher", "Spectral_r"),
             (err, "abs error", "magma")]
        ):
            ax = axes[i][j]
            im = ax.imshow(img, cmap=cmap)
            ax.set_title(title)
            ax.axis("off")
            fig.colorbar(im, ax=ax, fraction=0.046)
    out_dir = os.path.join(output_dir, "visualizations")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"depth_step_{step}.png")
    fig.tight_layout()
    fig.savefig(path, dpi=80)
    plt.close(fig)
    return path


def plot_history(history: dict, output_dir: str) -> list[str]:
    """Loss and LR curves (train/val) to ``plots/``."""
    plt = _agg()
    out_dir = os.path.join(output_dir, "plots")
    os.makedirs(out_dir, exist_ok=True)
    written = []

    if history.get("train_loss"):
        fig, ax = plt.subplots(figsize=(8, 5))
        ax.plot(history["train_loss"], label="train")
        if history.get("val_loss"):
            ax.plot(history["val_loss"], label="val")
        ax.set_xlabel("epoch")
        ax.set_ylabel("loss")
        ax.legend()
        ax.grid(alpha=0.3)
        path = os.path.join(out_dir, "loss_curves.png")
        fig.savefig(path, dpi=80)
        plt.close(fig)
        written.append(path)

    if history.get("lr"):
        fig, ax = plt.subplots(figsize=(8, 5))
        ax.plot(history["lr"])
        ax.set_xlabel("step")
        ax.set_ylabel("learning rate")
        ax.grid(alpha=0.3)
        path = os.path.join(out_dir, "lr_schedule.png")
        fig.savefig(path, dpi=80)
        plt.close(fig)
        written.append(path)
    return written
