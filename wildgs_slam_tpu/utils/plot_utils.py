"""Visualization artifacts: keyframe diagnostic figures + GIFs.

Ports src/utils/plot_utils.py (create_gif_from_directory) and the mapper's
online diagnostic renders (mapper.py:1450-1553: GT/render/depth/uncertainty
grid per keyframe).
"""

from __future__ import annotations

import glob
import os

import numpy as np


def create_gif_from_directory(directory, output_path, duration=100,
                              online_plotting=False):
    """Assemble <directory>/*.png into a GIF (plot_utils.py:6-45)."""
    from PIL import Image

    files = sorted(glob.glob(os.path.join(directory, "*.png")))
    if not files:
        return None
    frames = [Image.open(f) for f in files]
    frames[0].save(output_path, save_all=True, append_images=frames[1:],
                   duration=duration, loop=0)
    return output_path


def save_keyframe_figure(path, gt_color, rendered_color, gt_depth,
                         rendered_depth, uncertainty=None, psnr=None):
    """2x2(+1) diagnostic grid per keyframe (mapper.py:1450-1553)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n_cols = 3 if uncertainty is not None else 2
    fig, axes = plt.subplots(2, n_cols, figsize=(4 * n_cols, 6))
    axes[0, 0].imshow(np.clip(np.asarray(gt_color), 0, 1))
    axes[0, 0].set_title("GT")
    axes[0, 1].imshow(np.clip(np.asarray(rendered_color), 0, 1))
    title = "render"
    if psnr is not None:
        title += f" (PSNR {psnr:.1f})"
    axes[0, 1].set_title(title)
    axes[1, 0].imshow(np.asarray(gt_depth), cmap="plasma")
    axes[1, 0].set_title("prior depth")
    axes[1, 1].imshow(np.asarray(rendered_depth), cmap="plasma")
    axes[1, 1].set_title("rendered depth")
    if uncertainty is not None:
        axes[0, 2].imshow(np.asarray(uncertainty), cmap="jet")
        axes[0, 2].set_title("uncertainty")
        axes[1, 2].axis("off")
    for ax in axes.ravel():
        ax.set_xticks([])
        ax.set_yticks([])
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fig.tight_layout()
    fig.savefig(path, dpi=100)
    plt.close(fig)


def psnr(a, b):
    mse = float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
    return -10.0 * np.log10(mse + 1e-12)
