"""ADetailer: detection + masked re-diffusion of faces/bodies.

Counterpart of src/AutoDetailer/ (ADetailer.py enhance_detail :451 /
DetailerForEach.do_detail :640 / DetailerForEachTest :887,
bbox.py UltraBBoxDetector :20, SAM.py make_sam_mask :185, SEGS.py,
tensor_util crop/paste, mask_util).

Detector backends are pluggable: ultralytics YOLO and segment-anything are
optional CPU-side dependencies (detection is off the TPU hot path — exactly
as in the reference where they run as separate torch models). When absent, a
provided-mask or full-frame detector keeps the inpaint machinery usable and
testable.

The crop->encode->sample->decode->feathered-paste loop runs each segment at
a static bucket size so XLA compiles one program per bucket
(ADetailer.py:451-530's free-form crops would recompile per segment).
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Sequence, Tuple

import numpy as np

from lightdiffusion_next_tpu.sampling import ksampler as ks


@dataclasses.dataclass
class SEG:
    """One detected segment (SEGS.py parity): crop region + mask + score."""

    bbox: Tuple[int, int, int, int]  # x0, y0, x1, y1
    crop_region: Tuple[int, int, int, int]
    mask: np.ndarray  # (H, W) float in crop_region coords or full-image
    confidence: float
    label: str = ""


# ---------------------------------------------------------------------------
# Detectors
# ---------------------------------------------------------------------------


def _resize_mask(mask: np.ndarray, h: int, w: int) -> np.ndarray:
    if mask.shape == (h, w):
        return mask.astype(np.float32)
    import jax.numpy as jnp

    from lightdiffusion_next_tpu.ops import nn

    out = nn.interpolate_bilinear(
        jnp.asarray(mask, dtype=jnp.float32)[None, :, :, None], (h, w)
    )
    return np.asarray(out)[0, :, :, 0]


def _polygon_mask(polys, h: int, w: int) -> Optional[np.ndarray]:
    """Rasterize ultralytics polygon contours (original-image coords)."""
    from PIL import Image, ImageDraw

    img = Image.new("L", (w, h), 0)
    draw = ImageDraw.Draw(img)
    drew = False
    for poly in polys:
        pts = np.asarray(poly, dtype=np.float32).reshape(-1, 2)
        if len(pts) >= 3:
            draw.polygon([(float(x), float(y)) for x, y in pts], fill=1)
            drew = True
    if not drew:
        return None
    return np.asarray(img, dtype=np.float32)


def segs_from_yolo_result(result, h: int, w: int) -> List[SEG]:
    """Ultralytics result -> SEG list.

    Uses the model's SEGMENTATION masks when it provides them (the default
    person_yolov8m-seg IS a seg model), falling back to bbox rectangle
    fill. NOTE: this is deliberately BETTER than the reference, whose
    inference_bbox rectangle-fills even for seg models (AD_util.py:54-58;
    its UltraSegmDetector is an empty stub, bbox.py:103-115) — rectangle
    masks inpaint background around people/faces.

    Mask source preference: `masks.xy` polygon contours (ultralytics
    rescales these to ORIGINAL image coordinates) > `masks.data` but only
    when its aspect matches the image (raw `data` is in the letterboxed
    network-input space — stretching the padded mask over a non-square
    image would misalign it with the boxes) > bbox fill."""
    boxes = np.asarray(result.boxes.xyxy.cpu().numpy())
    confs = np.asarray(result.boxes.conf.cpu().numpy())
    seg_masks = None
    seg_polys = None
    masks = getattr(result, "masks", None)
    if masks is not None:
        try:
            seg_polys = list(masks.xy)
        except Exception:
            seg_polys = None
        try:
            seg_masks = np.asarray(masks.data.cpu().numpy())
        except Exception:
            seg_masks = None
    if seg_masks is not None and len(seg_masks):
        mh, mw = seg_masks.shape[-2:]
        if abs(mh / mw - h / w) > 0.02:  # letterboxed/stride-padded space
            seg_masks = None

    segs: List[SEG] = []
    for i, (box, conf) in enumerate(zip(boxes, confs)):
        x0, y0, x1, y1 = (int(v) for v in box)
        mask = None
        if seg_polys is not None and i < len(seg_polys):
            mask = _polygon_mask([seg_polys[i]], h, w)
        if mask is None and seg_masks is not None and i < len(seg_masks):
            m = _resize_mask(seg_masks[i], h, w)
            m = (m > 0.5).astype(np.float32)
            if m.any():
                mask = m
        if mask is None:  # bbox fill (inference_bbox parity)
            mask = np.zeros((h, w), dtype=np.float32)
            mask[y0:y1, x0:x1] = 1.0
        segs.append(SEG((x0, y0, x1, y1), (x0, y0, x1, y1), mask, float(conf)))
    return segs


class UltralyticsDetector:
    """YOLO detector (bbox.py:20-122 / AD_util.inference_bbox counterpart,
    with real segm-mask support — see segs_from_yolo_result). Requires the
    optional `ultralytics` package."""

    def __init__(self, model_path: str):
        try:
            from ultralytics import YOLO
        except ImportError as e:  # pragma: no cover
            raise RuntimeError(
                "ultralytics is not installed; use a provided-mask detector"
            ) from e
        self.model = YOLO(model_path)

    def detect(self, image: np.ndarray, threshold: float = 0.5) -> List[SEG]:
        from PIL import Image

        pil = Image.fromarray(
            np.clip(np.asarray(image[0]) * 255, 0, 255).astype(np.uint8)
        )
        pred = self.model(pil, conf=threshold)
        h, w = image.shape[1:3]
        return segs_from_yolo_result(pred[0], h, w)


class StaticMaskDetector:
    """Detector from user-provided masks (tests / manual inpaint)."""

    def __init__(self, masks: Sequence[np.ndarray], threshold_area: float = 0.0):
        self.masks = list(masks)

    def detect(self, image: np.ndarray, threshold: float = 0.5) -> List[SEG]:
        segs = []
        for m in self.masks:
            ys, xs = np.where(m > 0.5)
            if len(ys) == 0:
                continue
            bbox = (int(xs.min()), int(ys.min()), int(xs.max()) + 1, int(ys.max()) + 1)
            segs.append(SEG(bbox, bbox, m.astype(np.float32), 1.0))
        return segs


def dilate_masks(segs: List[SEG], dilation: int) -> List[SEG]:
    """Mask dilation (AD_util.dilate_masks parity) via maximum filter."""
    if dilation <= 0:
        return segs
    out = []
    for s in segs:
        m = s.mask
        k = dilation
        padded = np.pad(m, k, mode="constant")
        dil = np.zeros_like(m)
        for dy in range(-k, k + 1):
            for dx in range(-k, k + 1):
                if dy * dy + dx * dx > k * k:
                    continue
                dil = np.maximum(
                    dil, padded[k + dy : k + dy + m.shape[0], k + dx : k + dx + m.shape[1]]
                )
        out.append(dataclasses.replace(s, mask=dil))
    return out


def crop_region_with_factor(
    bbox: Tuple[int, int, int, int], crop_factor: float, hw: Tuple[int, int]
) -> Tuple[int, int, int, int]:
    """Expand bbox by crop_factor (make_crop_region parity, AD_util)."""
    x0, y0, x1, y1 = bbox
    bw, bh = x1 - x0, y1 - y0
    cx, cy = (x0 + x1) / 2, (y0 + y1) / 2
    nw, nh = bw * crop_factor, bh * crop_factor
    H, W = hw
    nx0 = int(max(0, cx - nw / 2))
    ny0 = int(max(0, cy - nh / 2))
    nx1 = int(min(W, cx + nw / 2))
    ny1 = int(min(H, cy + nh / 2))
    return nx0, ny0, nx1, ny1


def _bucket_size(w: int, h: int, guide: int, maxs: int) -> Tuple[int, int]:
    """Pick the static processing size: upscale so min side ~= guide, cap at
    maxs, snap to multiples of 64 (enhance_detail's guide_size/max_size
    semantics, ADetailer.py:451-530)."""
    scale = guide / max(min(w, h), 1)
    nw, nh = w * scale, h * scale
    if max(nw, nh) > maxs:
        scale = maxs / max(nw, nh)
        nw, nh = nw * scale, nh * scale
    snap = lambda v: max(64, int(math.ceil(v / 64)) * 64)
    return snap(nw), snap(nh)


@dataclasses.dataclass
class DetailerConfig:
    guide_size: int = 512
    max_size: int = 768
    seed: int = 0
    steps: int = 20
    cfg_scale: float = 7.5
    sampler_name: str = "dpmpp_2m_cfgpp"
    scheduler: str = "karras"
    denoise: float = 0.5
    feather: int = 5
    crop_factor: float = 2.0
    threshold: float = 0.5
    dilation: int = 10
    drop_size: int = 10


class Detailer:
    """DetailerForEach.do_detail parity (ADetailer.py:640-886)."""

    def __init__(self, model, clip, vae, cfg: Optional[DetailerConfig] = None):
        self.model = model
        self.clip = clip
        self.vae = vae
        # NB: no dataclass instance as a default argument — that one shared
        # instance would leak mutations across every Detailer in the process
        self.cfg = cfg if cfg is not None else DetailerConfig()

    def enhance_detail(
        self,
        image: np.ndarray,  # (1, H, W, 3)
        seg: SEG,
        positive,
        negative,
        callback=None,
    ) -> np.ndarray:
        import jax.numpy as jnp

        from lightdiffusion_next_tpu.ops import nn

        H, W = image.shape[1:3]
        x0, y0, x1, y1 = crop_region_with_factor(
            seg.bbox, self.cfg.crop_factor, (H, W)
        )
        crop = image[:, y0:y1, x0:x1, :]
        ch, cw = crop.shape[1:3]
        pw, ph = _bucket_size(cw, ch, self.cfg.guide_size, self.cfg.max_size)

        up = np.asarray(nn.interpolate_bilinear(jnp.asarray(crop), (ph, pw)))
        latent = self.vae.encode(jnp.asarray(up))

        # latent-space denoise mask from the segment mask (size follows the
        # VAE's actual downscale ratio)
        m = seg.mask[y0:y1, x0:x1]
        m_lat = np.asarray(
            nn.interpolate_bilinear(
                jnp.asarray(m[None, :, :, None]),
                (latent.shape[1], latent.shape[2]),
            )
        )
        result = ks.ksample(
            self.model,
            seed=self.cfg.seed,
            steps=self.cfg.steps,
            cfg_scale=self.cfg.cfg_scale,
            sampler_name=self.cfg.sampler_name,
            scheduler=self.cfg.scheduler,
            positive=positive,
            negative=negative,
            latent_image=latent,
            denoise=self.cfg.denoise,
            denoise_mask=jnp.asarray(m_lat),
            # The reference applies DifferentialDiffusion (threshold mask
            # hardening over the trajectory) whenever noise_mask_feather > 0
            # (ADetailer.py:729-733; feather defaults to 5).
            differential_diffusion=self.cfg.feather > 0,
            callback=callback,
        )
        decoded = np.asarray(self.vae.decode(result.latent))
        back = np.asarray(nn.interpolate_bilinear(jnp.asarray(decoded), (ch, cw)))

        # feathered paste (tensor_util paste parity)
        paste_mask = m.astype(np.float32)
        if self.cfg.feather > 0:
            from lightdiffusion_next_tpu.pipelines.upscaler import _feather

            paste_mask = _feather(paste_mask, self.cfg.feather)
        paste_mask = paste_mask[None, :, :, None]
        out = image.copy()
        out[:, y0:y1, x0:x1, :] = back * paste_mask + crop * (1 - paste_mask)
        return out

    def detail(
        self, image: np.ndarray, detector, positive, negative, sam=None,
        callback=None,
    ) -> Tuple[np.ndarray, List[SEG]]:
        """Detect + enhance PER BATCH IMAGE (DetailerForEachTest's batch
        loop, ADetailer.py:952-1019): each image gets its own detections —
        applying image 0's masks to the whole batch would re-diffuse
        non-face regions on images 1..B-1."""
        from lightdiffusion_next_tpu.sampling import samplers as samplers_mod

        out = np.asarray(image).copy()
        all_segs: List[SEG] = []
        for bi in range(out.shape[0]):
            frame = out[bi : bi + 1]
            segs = detector.detect(frame, self.cfg.threshold)
            segs = dilate_masks(segs, self.cfg.dilation)
            if sam is not None:
                # SAM refinement + bitwise AND (pipeline.py:375-511 flow)
                from lightdiffusion_next_tpu.pipelines.sam import (
                    make_sam_mask,
                    segs_bitwise_and_mask,
                )

                sam_mask = make_sam_mask(sam, segs, frame)
                segs = segs_bitwise_and_mask(segs, sam_mask)
            segs = [
                s
                for s in segs
                if (s.bbox[2] - s.bbox[0]) >= self.cfg.drop_size
                and (s.bbox[3] - s.bbox[1]) >= self.cfg.drop_size
            ]
            for seg in segs:
                if samplers_mod.callback_requests_stop(callback):
                    return out, all_segs
                frame = self.enhance_detail(
                    frame, seg, positive, negative, callback
                )
            out[bi] = frame[0]
            all_segs.extend(segs)
        return out, all_segs
