"""UltimateSDUpscale: model upscale + tiled img2img redraw + seam fixing.

Counterpart of src/UltimateSDUpscale/UltimateSDUpscale.py (USDUpscaler /
USDURedraw.linear_process :493-526 / USDUSeamsFix.half_tile_process
:557-650 / process_images :126-245) and image_util (get_crop_region :206,
expand_crop :248).

Behavioral notes vs the reference:
- Each redraw tile is denoised on a PADDED crop: the tile rectangle grown
  by ``padding`` then expanded to the model aspect/target size
  (ceil((tile+padding)/8)*8 per the reference's init_draw override,
  UltimateSDUpscale.py:842-843), so neighboring tiles overlap in context;
  only the blurred tile rectangle is composited back.
- The seam pass uses its own ``seam_fix_denoise`` and ``seam_fix_padding``
  (half_tile_process :612-650). Both redraw and seam model shapes are sized
  to the PADDED crop (tile + 2*pad snapped to 8) so tiles denoise exactly
  — no per-tile resize round-trip (the reference LANCZOS-resizes every
  tile because its model shape uses a 1-sided pad; deliberate improvement,
  see _model_tile).
- ``seam_fix_width`` and ``force_uniform_tiles`` are accepted for API
  parity but are DEAD IN THE REFERENCE TOO: Script.start always runs
  half-tile (seam_fix_width only matters to the unimplemented Band Pass
  mode, :528-541/:653-663) and force_uniform_tiles is stored but never
  read (:988). Same for redraw mode "Chess" (start always linear, :541).
- crop_cond (image_util.py:288-308) is an IDENTITY copy in the reference
  (the area-cropping machinery was stripped), so conditioning is passed
  through unchanged — that IS parity, not a gap.
- Mask feathering is a cumulative-sum box blur standing in for PIL
  GaussianBlur (declared delta; same visual role).

TPU design: every redraw tile is denoised at ONE static (model_h, model_w)
shape and every seam tile at (tile_h, tile_w) — edge crops are resized to
the static shape instead of re-tracing at arbitrary sizes, so the whole
grid reuses two compiled programs (the reference re-runs torch at whatever
crop size falls out; under XLA that would be a recompile per tile).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import numpy as np

from lightdiffusion_next_tpu.sampling import ksampler as ks
from lightdiffusion_next_tpu.sampling import samplers as samplers_mod


@dataclasses.dataclass
class USDUConfig:
    upscale_by: float = 2.0
    tile_width: int = 512
    tile_height: int = 512
    mask_blur: int = 8
    padding: int = 32
    seam_fix_mode: str = "half_tile"  # "none" | "half_tile"
    seam_fix_denoise: float = 0.2
    seam_fix_mask_blur: int = 16
    seam_fix_padding: int = 32
    # accepted for parity; dead in the reference too (module docstring)
    seam_fix_width: int = 64
    force_uniform_tiles: bool = True


def _box_blur_1d(arr: np.ndarray, radius: int, axis: int) -> np.ndarray:
    """Mean filter via cumulative sums with edge clamping (window 2r+1)."""
    if radius <= 0:
        return arr
    arr = np.moveaxis(arr, axis, 0)
    n = arr.shape[0]
    csum = np.cumsum(arr, axis=0, dtype=np.float64)
    csum = np.concatenate([np.zeros_like(csum[:1]), csum], axis=0)
    idx = np.arange(n)
    hi = np.minimum(idx + radius + 1, n)
    lo = np.maximum(idx - radius, 0)
    out = (csum[hi] - csum[lo]) / (hi - lo).reshape((-1,) + (1,) * (arr.ndim - 1))
    return np.moveaxis(out.astype(np.float32), 0, axis)


def _feather(mask: np.ndarray, blur: int) -> np.ndarray:
    """Separable box blur of a mask (GaussianBlur stand-in)."""
    if blur <= 0:
        return mask.astype(np.float32)
    out = _box_blur_1d(mask.astype(np.float32), blur, 0)
    out = _box_blur_1d(out, blur, 1)
    return np.clip(out, 0.0, 1.0)


def _feather_rect(mask: np.ndarray, blur: int, rect) -> np.ndarray:
    """Feather a mask that is zero outside ``rect`` by blurring only the
    rect±2·blur window (in place) — the full-frame blur is O(H·W·tiles)
    across a tiled pass for identical results."""
    if blur <= 0:
        return mask.astype(np.float32)
    x1, y1, x2, y2 = rect
    ry1, ry2 = max(y1 - 2 * blur, 0), min(y2 + 2 * blur, mask.shape[0])
    rx1, rx2 = max(x1 - 2 * blur, 0), min(x2 + 2 * blur, mask.shape[1])
    mask = mask.astype(np.float32)
    mask[ry1:ry2, rx1:rx2] = _feather(mask[ry1:ry2, rx1:rx2], blur)
    return mask


def expand_region(
    region: Tuple[int, int, int, int],
    W: int,
    H: int,
    target_w: int,
    target_h: int,
) -> Tuple[int, int, int, int]:
    """Grow a region to (target_w, target_h) inside the image, spilling the
    unplaceable half to the other side (expand_crop semantics,
    image_util.py:248-285)."""
    x1, y1, x2, y2 = region
    x2 = min(x2 + (target_w - (x2 - x1)) // 2, W)
    x1 = max(x1 - (target_w - (x2 - x1)), 0)
    x2 = min(x2 + (target_w - (x2 - x1)), W)
    y2 = min(y2 + (target_h - (y2 - y1)) // 2, H)
    y1 = max(y1 - (target_h - (y2 - y1)), 0)
    y2 = min(y2 + (target_h - (y2 - y1)), H)
    return x1, y1, x2, y2


def region_for_rect(
    rect: Tuple[int, int, int, int],
    W: int,
    H: int,
    pad: int,
    model_w: int,
    model_h: int,
) -> Tuple[int, int, int, int]:
    """Tile rectangle -> denoise crop region: pad (get_crop_region,
    image_util.py:206-226), match the model aspect, expand in-image
    (process_images, UltimateSDUpscale.py:143-165)."""
    x1 = max(rect[0] - pad, 0)
    y1 = max(rect[1] - pad, 0)
    x2 = min(rect[2] + pad, W)
    y2 = min(rect[3] + pad, H)
    cw, ch = x2 - x1, y2 - y1
    p_ratio = model_w / model_h
    if cw / max(ch, 1) > p_ratio:
        target_w, target_h = cw, round(cw / p_ratio)
    else:
        target_w, target_h = round(ch * p_ratio), ch
    # never smaller than the model shape. With _model_tile sized to the
    # 2-sided pad, interior crops equal the model shape exactly and edge
    # crops are grown to it by expand_region — the no-resize branch
    target_w = max(target_w, min(model_w, W))
    target_h = max(target_h, min(model_h, H))
    return expand_region((x1, y1, x2, y2), W, H, target_w, target_h)


class UltimateSDUpscale:
    """The USDU facade (UltimateSDUpscale.upscale, :900-1012)."""

    def __init__(
        self, model, vae, upscale_model=None, cfg: Optional[USDUConfig] = None
    ):
        self.model = model
        self.vae = vae
        self.upscale_model = upscale_model
        # no dataclass instance as a default argument — one shared default
        # would leak mutations across every instance in the process
        self.cfg = cfg if cfg is not None else USDUConfig()

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
            up = self._resize(up, target_h, target_w)
        return np.clip(up, 0.0, 1.0)

    @staticmethod
    def _resize(img: np.ndarray, h: int, w: int) -> np.ndarray:
        import jax.numpy as jnp

        from lightdiffusion_next_tpu.ops import nn

        return np.asarray(nn.interpolate_bilinear(jnp.asarray(img), (h, w)))

    def _model_tile(self, image: np.ndarray, pad: int) -> Tuple[int, int]:
        """Static denoise shape: ceil((tile + 2*padding)/8)*8, clamped to
        the image.

        Deliberately better than the reference's ceil((tile+padding)/8)*8
        (UltimateSDUpscale.py:842-843): get_crop_region pads BOTH sides, so
        every interior crop is tile+2*pad wide and the reference LANCZOS
        round-trips each one (576 -> 544 -> 576 at defaults), burning a
        resize pair per tile and blurring the redraw. Sized to the actual
        crop, interior tiles (and edge tiles on any image >= the model
        shape, which expand_region grows to exactly) hit the no-resize
        branch; only images smaller than the model shape still resize."""
        H, W = image.shape[1:3]
        mh = math.ceil((self.cfg.tile_height + 2 * pad) / 8) * 8
        mw = math.ceil((self.cfg.tile_width + 2 * pad) / 8) * 8
        return min(mh, H // 8 * 8 or H), min(mw, W // 8 * 8 or W)

    def _grid(self, image: np.ndarray) -> Tuple[int, int]:
        """rows/cols over the CONFIG tile size (USDUpscaler, :303-304)."""
        H, W = image.shape[1:3]
        return (
            max(1, math.ceil(H / self.cfg.tile_height)),
            max(1, math.ceil(W / self.cfg.tile_width)),
        )

    def _process_region(
        self,
        image: np.ndarray,
        mask_full: np.ndarray,  # (H, W) feathered composite mask
        rect: Tuple[int, int, int, int],  # mask bounding rect (x1,y1,x2,y2)
        model_hw: Tuple[int, int],
        pad: int,
        positive,
        negative,
        seed: int,
        steps: int,
        cfg_scale: float,
        sampler_name: str,
        scheduler: str,
        denoise: float,
        callback=None,
    ) -> np.ndarray:
        """One tile: padded crop -> (resize) -> encode -> ksample -> decode
        -> (resize back) -> masked composite (process_images parity)."""
        import jax.numpy as jnp

        H, W = image.shape[1:3]
        mh, mw = model_hw
        x1, y1, x2, y2 = region_for_rect(rect, W, H, pad, mw, mh)
        crop = image[:, y1:y2, x1:x2, :]
        resized = crop.shape[1:3] != (mh, mw)
        crop_in = self._resize(crop, mh, mw) if resized else crop

        latent = self.vae.encode(jnp.asarray(crop_in))
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
            callback=callback,
        )
        decoded = np.asarray(self.vae.decode(result.latent))
        if resized:
            decoded = self._resize(decoded, y2 - y1, x2 - x1)

        # composite IN PLACE: only [y1:y2, x1:x2] changes, and redraw/seam
        # own a working copy — a full-frame image.copy() per tile costs
        # O(tiles * H * W) churn on 2048px+ upscales
        m = mask_full[y1:y2, x1:x2][None, :, :, None]
        image[:, y1:y2, x1:x2, :] = decoded * m + crop * (1.0 - m)
        return image

    def redraw(
        self, image: np.ndarray, positive, negative, seed, steps, cfg_scale,
        sampler_name, scheduler, denoise, callback=None,
    ) -> np.ndarray:
        """Linear per-tile redraw (USDURedraw.linear_process, :493-526):
        each tile rectangle is masked, feathered, and denoised on its
        padded crop region. Works on a private copy; tiles composite into
        it in place."""
        image = np.array(image, dtype=np.float32)  # own the working buffer
        H, W = image.shape[1:3]
        rows, cols = self._grid(image)
        model_hw = self._model_tile(image, self.cfg.padding)
        for yi in range(rows):
            for xi in range(cols):
                rect = (
                    xi * self.cfg.tile_width,
                    yi * self.cfg.tile_height,
                    min((xi + 1) * self.cfg.tile_width, W),
                    min((yi + 1) * self.cfg.tile_height, H),
                )
                if rect[0] >= rect[2] or rect[1] >= rect[3]:
                    continue
                if samplers_mod.callback_requests_stop(callback):
                    return image
                mask = np.zeros((H, W), dtype=np.float32)
                mask[rect[1] : rect[3], rect[0] : rect[2]] = 1.0
                mask = _feather_rect(mask, self.cfg.mask_blur, rect)
                image = self._process_region(
                    image, mask, rect, model_hw, self.cfg.padding, positive,
                    negative, seed, steps, cfg_scale, sampler_name, scheduler,
                    denoise, callback,
                )
        return image

    def seam_fix(
        self, image: np.ndarray, positive, negative, seed, steps, cfg_scale,
        sampler_name, scheduler, callback=None,
    ) -> np.ndarray:
        """Half-tile offset pass with gradient band masks and its own
        denoise/padding (USDUSeamsFix.half_tile_process, :557-650)."""
        if self.cfg.seam_fix_mode == "none":
            return image
        image = np.array(image, dtype=np.float32)  # own the working buffer
        H, W = image.shape[1:3]
        rows, cols = self._grid(image)
        tw = min(self.cfg.tile_width, W)
        th = min(self.cfg.tile_height, H)
        # sized to the padded crop like redraw tiles (_model_tile): seam
        # bands then denoise without the reference's LANCZOS round-trip
        model_hw = self._model_tile(image, self.cfg.seam_fix_padding)
        denoise = self.cfg.seam_fix_denoise

        def tri(n: int) -> np.ndarray:
            return np.concatenate(
                [
                    np.linspace(0, 1, n // 2, dtype=np.float32),
                    np.linspace(1, 0, n - n // 2, dtype=np.float32),
                ]
            )

        def band_pass(rect, band: np.ndarray):
            x1, y1, x2, y2 = rect
            if x1 >= x2 or y1 >= y2:
                return image
            if samplers_mod.callback_requests_stop(callback):
                return image
            mask = np.zeros((H, W), dtype=np.float32)
            mask[y1:y2, x1:x2] = band[: y2 - y1, : x2 - x1]
            mask = _feather_rect(mask, self.cfg.seam_fix_mask_blur, rect)
            return self._process_region(
                image, mask, rect, model_hw, self.cfg.seam_fix_padding,
                positive, negative, seed, steps, cfg_scale, sampler_name,
                scheduler, denoise, callback,
            )

        # horizontal seams (between rows): band peaks along y
        h_band = np.tile(tri(th)[:, None], (1, tw))
        for yi in range(rows - 1):
            for xi in range(cols):
                x1 = xi * self.cfg.tile_width
                y1 = yi * self.cfg.tile_height + self.cfg.tile_height // 2
                image = band_pass(
                    (x1, y1, min(x1 + tw, W), min(y1 + th, H)), h_band
                )
        # vertical seams (between columns): band peaks along x
        v_band = np.tile(tri(tw)[None, :], (th, 1))
        for yi in range(rows):
            for xi in range(cols - 1):
                x1 = xi * self.cfg.tile_width + self.cfg.tile_width // 2
                y1 = yi * self.cfg.tile_height
                image = band_pass(
                    (x1, y1, min(x1 + tw, W), min(y1 + th, H)), v_band
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
        callback=None,
    ) -> np.ndarray:
        """Full USDU: upscale -> redraw -> seam fix (facade :900)."""
        image = self.model_upscale(np.asarray(image, dtype=np.float32))
        image = self.redraw(
            image, positive, negative, seed, steps, cfg_scale, sampler_name,
            scheduler, denoise, callback,
        )
        image = self.seam_fix(
            image, positive, negative, seed, steps, cfg_scale, sampler_name,
            scheduler, callback,
        )
        return image
