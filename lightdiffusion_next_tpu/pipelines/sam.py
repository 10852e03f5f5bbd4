"""SAM mask refinement for ADetailer.

Counterpart of src/AutoDetailer/SAM.py (SAMLoader :144, sam_predict :10,
make_sam_mask :185 with center-1 point hints) and SEGS.py
SegsBitwiseAndMask (:21-95). segment-anything is an optional CPU-side
dependency (it never touches the TPU — same division of labor as the
reference, which runs SAM as a separate torch model); without it the
detector's own masks pass through unchanged.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from lightdiffusion_next_tpu.pipelines.detailer import SEG


def center_of_bbox(bbox) -> tuple:
    """mask_util.center_of_bbox parity."""
    x0, y0, x1, y1 = bbox
    return ((x0 + x1) / 2, (y0 + y1) / 2)


class SAMWrapper:
    """SAMLoader + predictor (SAM.py:10-183). ``model_path`` is the ViT-B
    checkpoint; device stays CPU (SafeToGPU semantics are moot on TPU)."""

    def __init__(self, model_path: str, model_type: str = "vit_b"):
        try:
            from segment_anything import SamPredictor, sam_model_registry
        except ImportError as e:  # pragma: no cover
            raise RuntimeError("segment-anything is not installed") from e
        sam = sam_model_registry[model_type](checkpoint=model_path)
        self.predictor = SamPredictor(sam)
        self._image_key = None

    def set_image(self, image_u8: np.ndarray) -> None:
        """Run the ViT image encoder once per distinct image — it is the
        dominant SAM cost (seconds on CPU) and is identical for every
        segment of the same frame."""
        import hashlib

        key = (image_u8.shape, hashlib.md5(image_u8.tobytes()).hexdigest())
        if key != self._image_key:
            self.predictor.set_image(image_u8)
            self._image_key = key

    def predict(
        self,
        image_u8: np.ndarray,  # (H, W, 3) uint8
        points: Optional[Sequence] = None,
        labels: Optional[Sequence] = None,
        bbox: Optional[Sequence] = None,
        threshold: float = 0.93,
    ) -> Optional[np.ndarray]:
        """sam_predict parity (SAM.py:10-60): best mask above threshold."""
        self.set_image(image_u8)
        masks, scores, _ = self.predictor.predict(
            point_coords=np.asarray(points) if points else None,
            point_labels=np.asarray(labels) if labels else None,
            box=np.asarray(bbox) if bbox is not None else None,
        )
        best = None
        best_score = threshold
        for m, s in zip(masks, scores):
            if s >= best_score:
                best, best_score = m, s
        return best.astype(np.float32) if best is not None else None


def make_sam_mask(
    sam: Optional[SAMWrapper],
    segs: List[SEG],
    image: np.ndarray,  # (1, H, W, 3) float [0,1]
    detection_hint: str = "center-1",
    dilation: int = 0,
    threshold: float = 0.93,
) -> Optional[np.ndarray]:
    """make_sam_mask parity (SAM.py:185-262): one combined (H, W) mask from
    per-segment SAM predictions with center-point hints."""
    if sam is None or not segs:
        return None
    img_u8 = np.clip(image[0] * 255, 0, 255).astype(np.uint8)
    H, W = img_u8.shape[:2]
    total = np.zeros((H, W), dtype=np.float32)
    for seg in segs:
        points, labels = [], []
        if detection_hint == "center-1":
            points.append(center_of_bbox(seg.bbox))
            labels.append(1)
        mask = sam.predict(img_u8, points, labels, seg.bbox, threshold)
        if mask is None:
            continue
        if dilation > 0:
            from lightdiffusion_next_tpu.pipelines.detailer import dilate_masks

            seg_d = dilate_masks(
                [SEG(seg.bbox, seg.crop_region, mask, 1.0)], dilation
            )[0]
            mask = seg_d.mask
        total = np.maximum(total, mask)
    return total


def segs_bitwise_and_mask(segs: List[SEG], mask: Optional[np.ndarray]) -> List[SEG]:
    """SegsBitwiseAndMask parity (SEGS.py:21-95): AND each segment mask with
    the (SAM) mask."""
    if mask is None:
        return segs
    out = []
    for seg in segs:
        out.append(
            SEG(
                seg.bbox,
                seg.crop_region,
                np.minimum(seg.mask, mask.astype(np.float32)),
                seg.confidence,
                seg.label,
            )
        )
    return out
