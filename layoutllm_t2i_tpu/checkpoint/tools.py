"""Checkpoint surgery tools.

Reference: GLIGEN/convert_ckpt.py:5-38 (grow the UNet first conv from 4 to
4+5 input channels for inpainting init — new channels zero so behavior is
unchanged until trained).
"""
from __future__ import annotations

import numpy as np


def grow_first_conv(unet_params: dict, additional_channels: int = 5) -> dict:
    """Zero-pad input channels of input_blocks.0.0 (HWIO kernel axis 2)."""
    first = unet_params["input_blocks"]["0"]["0"]
    w = np.asarray(first["weight"])
    kh, kw, cin, cout = w.shape
    grown = np.zeros((kh, kw, cin + additional_channels, cout), w.dtype)
    grown[:, :, :cin] = w
    out = dict(unet_params)
    out["input_blocks"] = dict(unet_params["input_blocks"])
    out["input_blocks"]["0"] = {"0": {"weight": grown, "bias": first["bias"]}}
    return out
