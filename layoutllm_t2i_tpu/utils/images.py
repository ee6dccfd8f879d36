"""Image-grid saving for training previews (the reference ImageCaptionSaver,
trainer_combined_layout.py:37-67: a row-major grid PNG plus a captions txt)."""
from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np


def make_grid(images01: np.ndarray, ncols: int = 4, pad: int = 2) -> np.ndarray:
    """(N, H, W, 3) float [0,1] -> uint8 grid image."""
    imgs = (np.clip(np.asarray(images01), 0, 1) * 255).astype(np.uint8)
    n, h, w, c = imgs.shape
    ncols = min(ncols, n)
    nrows = (n + ncols - 1) // ncols
    grid = np.full(
        (nrows * (h + pad) - pad, ncols * (w + pad) - pad, c), 255, np.uint8
    )
    for i, im in enumerate(imgs):
        r, cidx = divmod(i, ncols)
        grid[r * (h + pad):r * (h + pad) + h,
             cidx * (w + pad):cidx * (w + pad) + w] = im
    return grid


def save_image_grid(images01: np.ndarray, path: str,
                    captions: Optional[Sequence[str]] = None,
                    ncols: int = 4) -> None:
    from PIL import Image

    Image.fromarray(make_grid(images01, ncols)).save(path)
    if captions is not None:
        with open(path.rsplit(".", 1)[0] + ".txt", "w") as f:
            f.write("\n".join(captions))
