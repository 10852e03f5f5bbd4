"""ADetailer mask extraction: YOLO segm masks are used when present
(non-rectangular), bbox rectangle fill otherwise (reference behavior:
AD_util.inference_bbox :29-67 rectangle-fills always; we improve on it)."""

import numpy as np

from lightdiffusion_next_tpu.pipelines.detailer import (
    SEG,
    dilate_masks,
    segs_from_yolo_result,
)


class _T:
    """torch-tensor stand-in with .cpu().numpy()."""

    def __init__(self, arr):
        self._arr = np.asarray(arr)

    def cpu(self):
        return self

    def numpy(self):
        return self._arr


class _Boxes:
    def __init__(self, xyxy, conf):
        self.xyxy = _T(xyxy)
        self.conf = _T(conf)


class _Masks:
    def __init__(self, data):
        self.data = _T(data)


class _Result:
    def __init__(self, xyxy, conf, masks=None):
        self.boxes = _Boxes(xyxy, conf)
        self.masks = masks


def test_segm_masks_produce_non_rectangular_mask():
    h = w = 64
    # a filled circle as the instance mask, at half model resolution
    yy, xx = np.mgrid[0:32, 0:32]
    circle = (((yy - 16) ** 2 + (xx - 16) ** 2) <= 10**2).astype(np.float32)
    res = _Result(
        xyxy=[[8.0, 8.0, 56.0, 56.0]],
        conf=[0.9],
        masks=_Masks(circle[None]),
    )
    (seg,) = segs_from_yolo_result(res, h, w)
    assert seg.bbox == (8, 8, 56, 56)
    mask = seg.mask
    assert mask.shape == (h, w)
    # non-rectangular: the bbox corners are NOT covered but the center is
    assert mask[32, 32] == 1.0
    assert mask[9, 9] == 0.0 and mask[54, 54] == 0.0
    # roughly circular area (pi*r^2 scaled 2x = ~1257), not bbox area (2304)
    area = mask.sum()
    assert 800 < area < 1800, area


def test_bbox_fallback_without_masks():
    (seg,) = segs_from_yolo_result(
        _Result(xyxy=[[4.0, 6.0, 20.0, 30.0]], conf=[0.7]), 64, 64
    )
    assert seg.mask[7, 5] == 1.0 and seg.mask[5, 5] == 0.0
    assert seg.mask.sum() == (20 - 4) * (30 - 6)
    assert seg.confidence == np.float32(0.7)


def test_empty_segm_mask_falls_back_to_bbox():
    res = _Result(
        xyxy=[[4.0, 4.0, 12.0, 12.0]],
        conf=[0.5],
        masks=_Masks(np.zeros((1, 64, 64), np.float32)),
    )
    (seg,) = segs_from_yolo_result(res, 64, 64)
    assert seg.mask.sum() == 64.0  # 8x8 bbox fill


def test_dilate_non_rectangular_mask_grows():
    m = np.zeros((32, 32), np.float32)
    m[16, 16] = 1.0
    (seg,) = dilate_masks([SEG((15, 15, 17, 17), (15, 15, 17, 17), m, 1.0)], 3)
    assert seg.mask.sum() > 1
    assert seg.mask[16, 19] == 1.0 and seg.mask[16, 20] == 0.0


class _MasksXY:
    """Seg result with polygon contours (ultralytics .xy: original-image
    coords) plus letterboxed-space raw data."""

    def __init__(self, xy, data):
        self.xy = xy
        self.data = _T(data)


def test_polygon_masks_preferred_and_in_image_coords():
    h, w = 48, 96  # non-square
    tri = np.asarray([[10.0, 10.0], [40.0, 10.0], [10.0, 40.0]])
    # letterboxed data (square network space) would misalign if used
    bad = np.ones((1, 64, 64), np.float32)
    res = _Result(
        xyxy=[[10.0, 10.0, 40.0, 40.0]],
        conf=[0.8],
        masks=_MasksXY([tri], bad),
    )
    (seg,) = segs_from_yolo_result(res, h, w)
    assert seg.mask.shape == (h, w)
    # triangle interior, not the bbox / full-frame fill
    assert seg.mask[12, 12] == 1.0
    assert seg.mask[38, 38] == 0.0  # opposite corner outside the triangle
    assert seg.mask[5, 80] == 0.0
    assert 300 < seg.mask.sum() < 600  # ~0.5 * 30 * 30


def test_letterboxed_data_rejected_without_polygons():
    """masks.data in a space whose aspect differs from the image must not
    be stretched over it; fall back to bbox fill."""
    h, w = 48, 96
    res = _Result(
        xyxy=[[8.0, 8.0, 24.0, 24.0]],
        conf=[0.6],
        masks=_Masks(np.ones((1, 64, 64), np.float32)),  # square space
    )
    (seg,) = segs_from_yolo_result(res, h, w)
    assert seg.mask.sum() == (24 - 8) * (24 - 8)  # bbox fill, not full frame


def test_detail_runs_per_batch_image(monkeypatch):
    """Batch>1: each image must get its OWN detections (the reference's
    DetailerForEachTest batch loop, ADetailer.py:952-1019) — applying
    image 0's masks batch-wide re-diffuses wrong regions."""
    from lightdiffusion_next_tpu.pipelines import detailer as det

    detected_frames = []

    class _Det:
        def detect(self, frame, threshold):
            detected_frames.append(np.asarray(frame).copy())
            # a mask only where this frame is bright
            m = (np.asarray(frame)[0, :, :, 0] > 0.5).astype(np.float32)
            if not m.any():
                return []
            ys, xs = np.where(m > 0)
            bbox = (int(xs.min()), int(ys.min()), int(xs.max()) + 1, int(ys.max()) + 1)
            return [det.SEG(bbox, bbox, m, 1.0)]

    enhanced = []

    def fake_enhance(self, image, seg, positive, negative, callback=None):
        enhanced.append((image.copy(), seg))
        out = image.copy()
        x0, y0, x1, y1 = seg.bbox
        out[:, y0:y1, x0:x1, :] = -1.0  # visible stamp
        return out

    monkeypatch.setattr(det.Detailer, "enhance_detail", fake_enhance)
    d = det.Detailer(None, None, None, det.DetailerConfig(drop_size=1, dilation=0))
    imgs = np.zeros((2, 32, 32, 3), np.float32)
    imgs[0, 4:10, 4:10] = 1.0   # bright square top-left on image 0
    imgs[1, 20:28, 20:28] = 1.0  # bright square bottom-right on image 1
    out, segs = d.detail(imgs, _Det(), None, None)
    assert len(detected_frames) == 2  # one detect per image
    assert len(segs) == 2
    # image 0 stamped at ITS region, image 1 at its own — not image 0's
    assert (out[0, 4:10, 4:10] == -1.0).all()
    assert (out[1, 20:28, 20:28] == -1.0).all()
    assert (out[1, 4:10, 4:10] == 0.0).all()
    assert (out[0, 20:28, 20:28] == 0.0).all()
