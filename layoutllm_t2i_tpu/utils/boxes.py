"""Box drawing / conversion utilities (reference utils.py:37-46,
txt2img.py:329-353)."""
from __future__ import annotations

from typing import List, Sequence

import numpy as np


def draw_boxes_ltrb(image_uint8: np.ndarray, locations: Sequence[Sequence[float]],
                    phrases: Sequence[str]) -> "object":
    """image (H,W,3) uint8 + normalized ltrb boxes -> PIL image with blue
    boxes and red labels."""
    from PIL import Image, ImageDraw

    sample = Image.fromarray(image_uint8)
    draw = ImageDraw.Draw(sample)
    w, h = sample.size
    for (x0, y0, x1, y1), phrase in zip(locations, phrases):
        draw.rectangle([x0 * w, y0 * h, x1 * w, y1 * h], outline=(0, 0, 255), width=4)
        draw.text((x0 * w, y0 * h - 18), phrase, (255, 0, 0))
    return sample
