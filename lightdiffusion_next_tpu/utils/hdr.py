"""AutoHDR post-processing (LAB-space luminance shaping).

Counterpart of src/AutoHDR/ahdr.py:23-127 (HDREffects.apply_hdr2). The
batch entry point is a jitted elementwise program (the float64 numpy
version cost 1.25 s per 1024px image on host — most of the pipeline's
non-sampler time); the numpy Lab helpers remain as the float64 oracle for
tests. The sRGB<->Lab conversion uses the standard D50 colorimetric
transform instead of PIL ImageCms profiles (numerically equivalent for
this use; PIL's LAB mode is 8-bit quantized, we stay float).

Note: the reference computes adjust_shadows/highlights_non_linear but its
merge function ignores them and recomputes masks from the base luminance
(ahdr.py:36-57) — we implement the effective math.
"""

from __future__ import annotations

import numpy as np


def _srgb_to_lab(rgb: np.ndarray) -> np.ndarray:
    """rgb float [0,1] HWC -> Lab (L in [0,100])."""
    r = np.where(rgb <= 0.04045, rgb / 12.92, ((rgb + 0.055) / 1.055) ** 2.4)
    m = np.array(
        [
            [0.4360747, 0.3850649, 0.1430804],
            [0.2225045, 0.7168786, 0.0606169],
            [0.0139322, 0.0971045, 0.7141733],
        ],
        dtype=np.float64,
    )  # sRGB -> XYZ (D50 adapted)
    xyz = r @ m.T
    white = np.array([0.9642957, 1.0, 0.8251046])
    xyz = xyz / white
    eps = 216 / 24389
    kappa = 24389 / 27
    f = np.where(xyz > eps, np.cbrt(xyz), (kappa * xyz + 16) / 116)
    L = 116 * f[..., 1] - 16
    a = 500 * (f[..., 0] - f[..., 1])
    b = 200 * (f[..., 1] - f[..., 2])
    return np.stack([L, a, b], axis=-1)


def _lab_to_srgb(lab: np.ndarray) -> np.ndarray:
    L, a, b = lab[..., 0], lab[..., 1], lab[..., 2]
    fy = (L + 16) / 116
    fx = fy + a / 500
    fz = fy - b / 200
    eps = 216 / 24389
    kappa = 24389 / 27

    def finv(f):
        f3 = f**3
        return np.where(f3 > eps, f3, (116 * f - 16) / kappa)

    xyz = np.stack([finv(fx), finv(fy), finv(fz)], axis=-1)
    white = np.array([0.9642957, 1.0, 0.8251046])
    xyz = xyz * white
    m_inv = np.array(
        [
            [3.1338561, -1.6168667, -0.4906146],
            [-0.9787684, 1.9161415, 0.0334540],
            [0.0719453, -0.2289914, 1.4052427],
        ],
        dtype=np.float64,
    )
    r = xyz @ m_inv.T
    r = np.clip(r, 0.0, 1.0)
    return np.where(r <= 0.0031308, r * 12.92, 1.055 * r ** (1 / 2.4) - 0.055)


def apply_hdr(
    image: np.ndarray,
    hdr_intensity: float = 0.75,
    shadow_intensity: float = 0.25,
    highlight_intensity: float = 0.5,
    gamma_intensity: float = 0.25,
    contrast: float = 0.1,
    enhance_color: float = 0.25,
) -> np.ndarray:
    """image: (H, W, 3) float [0,1] -> same. apply_hdr2 effective math."""
    lab = _srgb_to_lab(np.asarray(image, dtype=np.float64))
    base = lab[..., 0] * 255.0 / 100.0  # 0-255 luminance like PIL's L

    scaled_shadow = shadow_intensity**2 * hdr_intensity
    scaled_highlight = highlight_intensity**2 * hdr_intensity
    shadow_mask = np.clip((1 - base / 255) ** 2, 0, 1)
    highlight_mask = np.clip((base / 255) ** 2, 0, 1)
    adjusted_shadows = np.clip(base * (1 - shadow_mask * scaled_shadow), 0, 255)
    adjusted_highlights = np.clip(
        base + (255 - base) * highlight_mask * scaled_highlight, 0, 255
    )
    adjusted = np.clip(adjusted_shadows + adjusted_highlights - base, 0, 255)
    final_lum = np.clip(base * (1 - hdr_intensity) + adjusted * hdr_intensity, 0, 255)

    # gamma (apply_gamma_correction, ahdr.py:59-72)
    if gamma_intensity != 0:
        g = 1 / (1.1 - gamma_intensity)
        final_lum = 255 * ((final_lum / 255) ** g)

    lab_out = lab.copy()
    lab_out[..., 0] = final_lum * 100.0 / 255.0
    rgb = _lab_to_srgb(lab_out)

    # PIL ImageEnhance.Contrast(1+contrast): lerp from the mean-gray image
    l_gray = rgb @ np.array([0.299, 0.587, 0.114])
    mean = float(np.mean(l_gray))
    rgb = np.clip(mean + (rgb - mean) * (1 + contrast), 0, 1)

    # PIL ImageEnhance.Color(1 + 0.2*enhance_color): lerp from grayscale
    sat = 1 + enhance_color * 0.2
    gray = (rgb @ np.array([0.299, 0.587, 0.114]))[..., None]
    rgb = np.clip(gray + (rgb - gray) * sat, 0, 1)
    return rgb.astype(np.float32)


def _apply_hdr_jax(
    image,
    hdr_intensity: float,
    shadow_intensity: float,
    highlight_intensity: float,
    gamma_intensity: float,
    contrast: float,
    enhance_color: float,
):
    """apply_hdr math in jnp for one (H, W, 3) image (f32)."""
    import jax.numpy as jnp

    rgb_in = jnp.clip(image.astype(jnp.float32), 0.0, 1.0)
    # sRGB -> Lab (D50)
    r = jnp.where(
        rgb_in <= 0.04045, rgb_in / 12.92, ((rgb_in + 0.055) / 1.055) ** 2.4
    )
    m = jnp.asarray(
        [
            [0.4360747, 0.3850649, 0.1430804],
            [0.2225045, 0.7168786, 0.0606169],
            [0.0139322, 0.0971045, 0.7141733],
        ],
        dtype=jnp.float32,
    )
    # 3x3 color transforms must not drop to the TPU's default bf16
    # matmul precision (visible banding); force fp32 MXU passes
    xyz = jnp.dot(r, m.T, precision="highest") / jnp.asarray(
        [0.9642957, 1.0, 0.8251046], jnp.float32
    )
    eps = 216 / 24389
    kappa = 24389 / 27
    f = jnp.where(xyz > eps, jnp.cbrt(xyz), (kappa * xyz + 16) / 116)
    L = 116 * f[..., 1] - 16
    a = 500 * (f[..., 0] - f[..., 1])
    b = 200 * (f[..., 1] - f[..., 2])

    base = L * 255.0 / 100.0
    scaled_shadow = shadow_intensity**2 * hdr_intensity
    scaled_highlight = highlight_intensity**2 * hdr_intensity
    shadow_mask = jnp.clip((1 - base / 255) ** 2, 0, 1)
    highlight_mask = jnp.clip((base / 255) ** 2, 0, 1)
    adjusted_shadows = jnp.clip(base * (1 - shadow_mask * scaled_shadow), 0, 255)
    adjusted_highlights = jnp.clip(
        base + (255 - base) * highlight_mask * scaled_highlight, 0, 255
    )
    adjusted = jnp.clip(adjusted_shadows + adjusted_highlights - base, 0, 255)
    final_lum = jnp.clip(
        base * (1 - hdr_intensity) + adjusted * hdr_intensity, 0, 255
    )
    if gamma_intensity != 0:
        g = 1 / (1.1 - gamma_intensity)
        final_lum = 255 * ((final_lum / 255) ** g)

    # Lab -> sRGB
    L2 = final_lum * 100.0 / 255.0
    fy = (L2 + 16) / 116
    fx = fy + a / 500
    fz = fy - b / 200

    def finv(fv):
        f3 = fv**3
        return jnp.where(f3 > eps, f3, (116 * fv - 16) / kappa)

    xyz2 = jnp.stack([finv(fx), finv(fy), finv(fz)], axis=-1)
    xyz2 = xyz2 * jnp.asarray([0.9642957, 1.0, 0.8251046], jnp.float32)
    m_inv = jnp.asarray(
        [
            [3.1338561, -1.6168667, -0.4906146],
            [-0.9787684, 1.9161415, 0.0334540],
            [0.0719453, -0.2289914, 1.4052427],
        ],
        dtype=jnp.float32,
    )
    rgb = jnp.clip(jnp.dot(xyz2, m_inv.T, precision="highest"), 0.0, 1.0)
    rgb = jnp.where(
        rgb <= 0.0031308, rgb * 12.92, 1.055 * rgb ** (1 / 2.4) - 0.055
    )

    lum_w = jnp.asarray([0.299, 0.587, 0.114], jnp.float32)
    mean = jnp.mean(jnp.dot(rgb, lum_w, precision="highest"))
    rgb = jnp.clip(mean + (rgb - mean) * (1 + contrast), 0, 1)
    sat = 1 + enhance_color * 0.2
    gray = jnp.dot(rgb, lum_w, precision="highest")[..., None]
    return jnp.clip(gray + (rgb - gray) * sat, 0, 1)


_HDR_JIT_CACHE: dict = {}


def apply_hdr_batch(images: np.ndarray, **kwargs) -> np.ndarray:
    """(B,H,W,3) [0,1] -> same (HDREffects.apply_to_batch parity). One
    jitted program per settings tuple (cached — a fresh jax.jit wrapper
    per call would retrace every image); per-image statistics via vmap."""
    import functools

    import jax
    import jax.numpy as jnp

    defaults = dict(
        hdr_intensity=0.75,
        shadow_intensity=0.25,
        highlight_intensity=0.5,
        gamma_intensity=0.25,
        contrast=0.1,
        enhance_color=0.25,
    )
    defaults.update(kwargs)
    key = tuple(sorted(defaults.items()))
    if key not in _HDR_JIT_CACHE:
        _HDR_JIT_CACHE[key] = jax.jit(
            jax.vmap(functools.partial(_apply_hdr_jax, **defaults))
        )
    # jax arrays pass straight through (no host round trip); numpy uploads
    out = _HDR_JIT_CACHE[key](jnp.asarray(images, dtype=jnp.float32))
    return np.asarray(out, dtype=np.float32)
