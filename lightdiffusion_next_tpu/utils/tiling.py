"""Tiled application of image-to-image networks with overlap feathering.

Counterpart of src/Utilities/util.py:385-637 (tiled_scale/_multidim,
get_tiled_scale_steps). The per-tile loop stays in host Python (like the
reference) while each tile runs the jitted network at a FIXED tile shape, so
XLA compiles exactly one program regardless of image size — the bucketing
discipline that replaces the reference's free-form tile tails.
"""

from __future__ import annotations

import math
from typing import Callable

import numpy as np


def get_tiled_scale_steps(
    width: int, height: int, tile_x: int, tile_y: int, overlap: int
) -> int:
    return math.ceil((height / (tile_y - overlap))) * math.ceil(
        (width / (tile_x - overlap))
    )


def _feather_mask(h: int, w: int, overlap: int) -> np.ndarray:
    """Linear ramp mask over `overlap` pixels on every edge (matches the
    reference's per-edge ramp in tiled_scale_multidim, util.py:430-460)."""
    mask = np.ones((h, w), dtype=np.float32)
    if overlap > 0:
        ramp = (np.arange(1, overlap + 1, dtype=np.float32)) / (overlap + 1)
        mask[:overlap, :] *= ramp[:, None]
        mask[-overlap:, :] *= ramp[::-1][:, None]
        mask[:, :overlap] *= ramp[None, :]
        mask[:, -overlap:] *= ramp[None, ::-1]
    return mask


def tiled_apply_2d(
    fn: Callable,
    x,
    tile: int = 64,
    overlap: int = 8,
    upscale: int = 1,
    out_channels: int = 3,
) -> np.ndarray:
    """Apply ``fn`` (NHWC->NHWC, scale factor ``upscale``) over overlapping
    tiles of ``x`` (NHWC) and blend with feathered averaging.

    Tiles at the image edge are shifted inward (not shrunk) so ``fn`` always
    sees the same static tile shape — one XLA compilation total.
    """
    x = np.asarray(x)
    b, h, w, c = x.shape
    tile = min(tile, h, w)
    stride = max(tile - overlap, 1)

    oh, ow = h * upscale, w * upscale
    out = np.zeros((b, oh, ow, out_channels), dtype=np.float32)
    weight = np.zeros((b, oh, ow, 1), dtype=np.float32)

    ys = list(range(0, max(h - tile, 0) + 1, stride))
    if ys[-1] != h - tile:
        ys.append(h - tile)
    xs = list(range(0, max(w - tile, 0) + 1, stride))
    if xs[-1] != w - tile:
        xs.append(w - tile)

    mask = _feather_mask(tile * upscale, tile * upscale, overlap * upscale)[
        None, :, :, None
    ]

    for y0 in ys:
        for x0 in xs:
            tile_in = x[:, y0 : y0 + tile, x0 : x0 + tile, :]
            tile_out = np.asarray(fn(tile_in), dtype=np.float32)
            yo, xo = y0 * upscale, x0 * upscale
            out[:, yo : yo + tile * upscale, xo : xo + tile * upscale, :] += (
                tile_out * mask
            )
            weight[:, yo : yo + tile * upscale, xo : xo + tile * upscale, :] += mask
    return out / np.maximum(weight, 1e-8)
