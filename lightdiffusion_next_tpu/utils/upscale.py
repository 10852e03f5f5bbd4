"""Latent upscaling: bislerp (spherical) + nearest/bilinear, NHWC.

Counterpart of src/Utilities/upscale.py:5-175 (bislerp/common_upscale/
LatentUpscale). bislerp slerps channel vectors along w then h, using the
same half-pixel coordinate generation as torch's bilinear interpolate.
"""

from __future__ import annotations

import numpy as np


def _bilinear_1d(arr: np.ndarray, length_new: int) -> np.ndarray:
    """torch F.interpolate(mode=bilinear, align_corners=False) of a 1-D
    sequence (exactly the coordinate trick in upscale.py:62-99)."""
    length_old = arr.shape[0]
    x = (np.arange(length_new, dtype=np.float64) + 0.5) * (
        length_old / length_new
    ) - 0.5
    x = np.clip(x, 0, length_old - 1)
    lo = np.floor(x).astype(np.int64)
    hi = np.minimum(lo + 1, length_old - 1)
    w = x - lo
    return arr[lo] * (1 - w) + arr[hi] * w


def _coords(length_old: int, length_new: int):
    ramp = np.arange(length_old, dtype=np.float32)
    c1f = _bilinear_1d(ramp, length_new)
    ratios = (c1f - np.floor(c1f)).astype(np.float32)
    coords_1 = c1f.astype(np.int64)
    ramp2 = ramp + 1
    ramp2[-1] -= 1
    coords_2 = _bilinear_1d(ramp2, length_new).astype(np.int64)
    return ratios, coords_1, coords_2


def _slerp(b1: np.ndarray, b2: np.ndarray, r: np.ndarray) -> np.ndarray:
    """Spherical lerp of channel vectors (upscale.py:17-59)."""
    b1_norm = np.linalg.norm(b1, axis=-1, keepdims=True)
    b2_norm = np.linalg.norm(b2, axis=-1, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        b1n = np.where(b1_norm == 0, 0.0, b1 / np.maximum(b1_norm, 1e-30))
        b2n = np.where(b2_norm == 0, 0.0, b2 / np.maximum(b2_norm, 1e-30))
        dot = np.sum(b1n * b2n, axis=-1)
        omega = np.arccos(np.clip(dot, -1.0, 1.0))
        so = np.sin(omega)
        res = (np.sin((1.0 - r[:, 0]) * omega) / so)[:, None] * b1n + (
            np.sin(r[:, 0] * omega) / so
        )[:, None] * b2n
    res = res * (b1_norm * (1.0 - r) + b2_norm * r)
    same = dot > 1 - 1e-5
    res[same] = b1[same]
    opp = dot < 1e-5 - 1
    res[opp] = (b1 * (1.0 - r) + b2 * r)[opp]
    return res


def bislerp(samples, width: int, height: int) -> np.ndarray:
    """NHWC spherical-bilinear resize."""
    x = np.asarray(samples, dtype=np.float32)
    n, h, w, c = x.shape

    ratios, c1, c2 = _coords(w, width)
    p1 = x[:, :, c1, :].reshape(-1, c)
    p2 = x[:, :, c2, :].reshape(-1, c)
    r = np.tile(ratios[None, None, :], (n, h, 1)).reshape(-1, 1)
    x = _slerp(p1, p2, r).reshape(n, h, width, c)

    ratios, c1, c2 = _coords(h, height)
    p1 = x[:, c1, :, :].reshape(-1, c)
    p2 = x[:, c2, :, :].reshape(-1, c)
    r = np.tile(ratios[None, :, None], (n, 1, width)).reshape(-1, 1)
    x = _slerp(p1, p2, r).reshape(n, height, width, c)
    return x


def common_upscale(samples, width: int, height: int, method: str = "bislerp"):
    """common_upscale parity (upscale.py:134-146; the reference always uses
    bislerp). 'nearest' and 'bilinear' provided for the hidiffusion helpers."""
    if method == "bislerp":
        return bislerp(samples, width, height)
    import jax.numpy as jnp

    from lightdiffusion_next_tpu.ops import nn

    x = jnp.asarray(samples, dtype=jnp.float32)
    if method == "nearest":
        n, h, w, c = x.shape
        ys = (np.arange(height) * h // height).astype(np.int64)
        xs = (np.arange(width) * w // width).astype(np.int64)
        return np.asarray(x[:, ys][:, :, xs])
    if method == "bilinear":
        return np.asarray(nn.interpolate_bilinear(x, (height, width)))
    raise ValueError(f"unknown upscale method {method!r}")


class LatentUpscale:
    """LatentUpscale node parity (upscale.py:149-175)."""

    def upscale(self, latent, width: int, height: int):
        if width == 0 and height == 0:
            return latent
        # reference clamps each dim to >= 64 (upscale.py:161-163) — a
        # single zero dim otherwise divides by zero in the resampler
        width = max(64, width)
        height = max(64, height)
        return bislerp(latent, width // 8, height // 8)
