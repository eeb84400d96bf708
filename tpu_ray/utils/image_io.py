"""Framebuffer output: gamma/clamp to 8-bit and PNG writing.

TPU-native equivalent of the reference's framebuffer display path + screenshot
writer (SURVEY.md §2 #15, #20): the device-resident linear f32[H,W,3] image is
gathered to host once per frame, gamma-encoded, and written via PIL (no GL
window; CLI renders to files).
"""

from __future__ import annotations

import numpy as np


def tonemap_to_uint8(img, gamma: float = 2.2) -> np.ndarray:
    """Linear float RGB (H, W, 3) -> uint8 with clamp + gamma encode."""
    arr = np.asarray(img, np.float64)
    arr = np.clip(arr, 0.0, 1.0) ** (1.0 / gamma)
    return (arr * 255.0 + 0.5).astype(np.uint8)


def write_png(path: str, img, gamma: float = 2.2) -> None:
    from PIL import Image

    Image.fromarray(tonemap_to_uint8(img, gamma), mode="RGB").save(path)


def read_png(path: str, gamma: float = 2.2) -> np.ndarray:
    """PNG -> linear float32 RGB in [0, 1]."""
    from PIL import Image

    arr = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
    return arr ** gamma
