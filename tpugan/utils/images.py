"""Image grid assembly and PNG output (the reference's ``save_image``)."""

from __future__ import annotations

import os

import numpy as np


def to_uint8(images: np.ndarray) -> np.ndarray:
    """[-1, 1] float NHWC -> uint8, clipping out-of-range values."""
    x = np.asarray(images, np.float32)
    x = (x + 1.0) * 127.5
    return np.clip(np.rint(x), 0, 255).astype(np.uint8)


def make_grid(images: np.ndarray, nrow: int = 8, pad: int = 2,
              pad_value: int = 0) -> np.ndarray:
    """Tile (N, H, W, C) uint8 images into one (gh*H', gw*W', C) grid."""
    n, h, w, c = images.shape
    ncol = nrow
    nrows = -(-n // ncol)
    grid = np.full((nrows * (h + pad) + pad, ncol * (w + pad) + pad, c),
                   pad_value, np.uint8)
    for i in range(n):
        r, col = divmod(i, ncol)
        y0 = pad + r * (h + pad)
        x0 = pad + col * (w + pad)
        grid[y0:y0 + h, x0:x0 + w] = images[i]
    return grid


def _to_pil(array: np.ndarray):
    from PIL import Image

    arr = np.asarray(array)
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    return Image.fromarray(arr)


def save_png(path: str, array: np.ndarray) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    _to_pil(array).save(path)


def encode_png(array: np.ndarray) -> bytes:
    """PNG-encode a uint8 HWC array in memory (the serving path)."""
    import io

    buf = io.BytesIO()
    _to_pil(array).save(buf, format="PNG")
    return buf.getvalue()
