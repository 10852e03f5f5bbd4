"""UltimateSDUpscale: model upscale + tiled img2img redraw + seam fixing.

Counterpart of src/UltimateSDUpscale/UltimateSDUpscale.py (USDUpscaler /
USDURedraw.linear_process :493-526 / USDUSeamsFix.half_tile_process
:557-650 / process_images :126-245) and image_util.crop_cond (:288).

TPU design: every tile is processed at ONE static (tile_h, tile_w) shape —
crop regions are expanded/clamped to the fixed size instead of resized
per-tile, so the denoiser compiles once for the whole grid (the reference
re-runs torch at whatever crop size falls out; under XLA that would be a
recompile per tile).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

from lightdiffusion_next_tpu.sampling import ksampler as ks


@dataclasses.dataclass
class USDUConfig:
    upscale_by: float = 2.0
    tile_width: int = 512
    tile_height: int = 512
    mask_blur: int = 8
    padding: int = 32
    seam_fix_mode: str = "half_tile"  # "none" | "half_tile"
    seam_fix_width: int = 64
    seam_fix_mask_blur: int = 8
    seam_fix_padding: int = 16
    force_uniform_tiles: bool = True


def _feather(mask: np.ndarray, blur: int) -> np.ndarray:
    """Box-blur feathering of a binary mask (stand-in for the reference's
    PIL GaussianBlur; same visual role)."""
    if blur <= 0:
        return mask
    k = 2 * blur + 1
    # separable two-pass mean filter ~ gaussian
    out = mask.astype(np.float32)
    for axis in (0, 1):
        kernel = np.ones(k, dtype=np.float32) / k
        out = np.apply_along_axis(
            lambda m: np.convolve(m, kernel, mode="same"), axis, out
        )
    return np.clip(out, 0.0, 1.0)


def _clamp_region(x0: int, y0: int, tw: int, th: int, W: int, H: int):
    x0 = max(0, min(x0, W - tw))
    y0 = max(0, min(y0, H - th))
    return x0, y0


class UltimateSDUpscale:
    """The USDU facade (UltimateSDUpscale.upscale, :900-1012)."""

    def __init__(self, model, vae, upscale_model=None, cfg: USDUConfig = USDUConfig()):
        self.model = model
        self.vae = vae
        self.upscale_model = upscale_model
        self.cfg = cfg

    # --- step 1: model upscale (USDUpscaler.upscale, :339-368) ---
    def model_upscale(self, image: np.ndarray) -> np.ndarray:
        target_h = int(image.shape[1] * self.cfg.upscale_by)
        target_w = int(image.shape[2] * self.cfg.upscale_by)
        if self.upscale_model is not None:
            up = self.upscale_model.upscale(image)
        else:
            up = image
        # resize to the exact requested factor (ESRGAN is x4; USDU rescales)
        if up.shape[1] != target_h or up.shape[2] != target_w:
            import jax.numpy as jnp

            from lightdiffusion_next_tpu.ops import nn

            up = np.asarray(
                nn.interpolate_bilinear(jnp.asarray(up), (target_h, target_w))
            )
        return np.clip(up, 0.0, 1.0)

    # --- step 2: per-tile img2img (process_images parity, :126-245) ---
    def _tile_dims(self, image: np.ndarray):
        """Tile size clamped to the image (the reference's crop regions are
        clamped the same way in process_images, UltimateSDUpscale.py:126)."""
        H, W = image.shape[1:3]
        return min(self.cfg.tile_height, H), min(self.cfg.tile_width, W)

    def _process_tile(
        self,
        image: np.ndarray,
        x0: int,
        y0: int,
        mask: np.ndarray,
        positive,
        negative,
        seed: int,
        steps: int,
        cfg_scale: float,
        sampler_name: str,
        scheduler: str,
        denoise: float,
    ) -> np.ndarray:
        import jax.numpy as jnp

        th, tw = self._tile_dims(image)
        H, W = image.shape[1:3]
        x0, y0 = _clamp_region(x0, y0, tw, th, W, H)
        crop = image[:, y0 : y0 + th, x0 : x0 + tw, :]

        latent = self.vae.encode(jnp.asarray(crop))
        result = ks.ksample(
            self.model,
            seed=seed,
            steps=steps,
            cfg_scale=cfg_scale,
            sampler_name=sampler_name,
            scheduler=scheduler,
            positive=positive,
            negative=negative,
            latent_image=latent,
            denoise=denoise,
        )
        decoded = np.asarray(self.vae.decode(result.latent))
        m = mask[None, :, :, None]
        out = image.copy()
        out[:, y0 : y0 + th, x0 : x0 + tw, :] = (
            decoded * m + crop * (1.0 - m)
        )
        return out

    def redraw(
        self, image: np.ndarray, positive, negative, seed, steps, cfg_scale,
        sampler_name, scheduler, denoise,
    ) -> np.ndarray:
        """Linear per-tile redraw (USDURedraw.linear_process, :493-526)."""
        H, W = image.shape[1:3]
        th, tw = self._tile_dims(image)
        rows = max(1, -(-H // th))
        cols = max(1, -(-W // tw))
        base_mask = _feather(np.ones((th, tw), dtype=np.float32), self.cfg.mask_blur)
        for yi in range(rows):
            for xi in range(cols):
                image = self._process_tile(
                    image, xi * tw, yi * th, base_mask, positive, negative,
                    seed, steps, cfg_scale, sampler_name, scheduler, denoise,
                )
        return image

    def seam_fix(
        self, image: np.ndarray, positive, negative, seed, steps, cfg_scale,
        sampler_name, scheduler, denoise,
    ) -> np.ndarray:
        """Half-tile offset pass with gradient band masks
        (USDUSeamsFix.half_tile_process, :557-650)."""
        if self.cfg.seam_fix_mode == "none":
            return image
        H, W = image.shape[1:3]
        th, tw = self._tile_dims(image)
        rows = max(1, -(-H // th))
        cols = max(1, -(-W // tw))

        # seam gradients: triangular band peaking at the tile center
        def tri(n):
            return np.concatenate(
                [
                    np.linspace(0, 1, n // 2, dtype=np.float32),
                    np.linspace(1, 0, n - n // 2, dtype=np.float32),
                ]
            )

        v_mask = _feather(
            np.tile(tri(tw)[None, :], (th, 1)), self.cfg.seam_fix_mask_blur
        )
        h_mask = _feather(
            np.tile(tri(th)[:, None], (1, tw)), self.cfg.seam_fix_mask_blur
        )

        # vertical seams (between columns): offset by half tile in x
        for yi in range(rows):
            for xi in range(cols - 1):
                image = self._process_tile(
                    image, xi * tw + tw // 2, yi * th, v_mask, positive,
                    negative, seed, steps, cfg_scale, sampler_name, scheduler,
                    denoise,
                )
        # horizontal seams: offset by half tile in y
        for yi in range(rows - 1):
            for xi in range(cols):
                image = self._process_tile(
                    image, xi * tw, yi * th + th // 2, h_mask, positive,
                    negative, seed, steps, cfg_scale, sampler_name, scheduler,
                    denoise,
                )
        return image

    def upscale(
        self,
        image: np.ndarray,  # (B, H, W, 3) float [0,1]
        positive,
        negative,
        seed: int = 0,
        steps: int = 8,
        cfg_scale: float = 6.0,
        sampler_name: str = "dpmpp_2m_cfgpp",
        scheduler: str = "karras",
        denoise: float = 0.3,
    ) -> np.ndarray:
        """Full USDU: upscale -> redraw -> seam fix (facade :900)."""
        image = self.model_upscale(np.asarray(image, dtype=np.float32))
        image = self.redraw(
            image, positive, negative, seed, steps, cfg_scale, sampler_name,
            scheduler, denoise,
        )
        image = self.seam_fix(
            image, positive, negative, seed, steps, cfg_scale, sampler_name,
            scheduler, denoise,
        )
        return image
