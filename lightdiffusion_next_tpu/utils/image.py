"""Image IO: PNG save with per-workflow folders and counters, conversions.

Counterpart of src/FileManaging/ImageSaver.py (SaveImage, counter logic) and
the NCHW<->NHWC helpers scattered through the reference. This framework is
NHWC end to end, so conversions only happen at the PIL boundary.
"""

from __future__ import annotations

import os
import re
from typing import List, Optional, Sequence

import numpy as np


def to_uint8(images: np.ndarray) -> np.ndarray:
    """float [0,1] NHWC -> uint8 NHWC."""
    return np.clip(np.asarray(images) * 255.0 + 0.5, 0, 255).astype(np.uint8)


def from_uint8(images: np.ndarray) -> np.ndarray:
    return np.asarray(images, dtype=np.float32) / 255.0


def load_image(path: str) -> np.ndarray:
    """PNG/JPEG -> (1, H, W, 3) float [0,1] (pipeline.py:136-139 parity)."""
    from PIL import Image

    img = Image.open(path).convert("RGB")
    return from_uint8(np.asarray(img))[None]


def get_save_image_path(
    filename_prefix: str, output_dir: str
) -> tuple:
    """Counter continuation across files (ImageSaver.get_save_image_path
    parity, ImageSaver.py:18-77): scans existing '<prefix>_NNNNN_.png'."""
    subfolder = os.path.dirname(os.path.normpath(filename_prefix))
    filename = os.path.basename(os.path.normpath(filename_prefix))
    full_output_folder = os.path.join(output_dir, subfolder)
    os.makedirs(full_output_folder, exist_ok=True)
    pattern = re.compile(
        r"^" + re.escape(filename) + r"_(\d+)_\.(png|jpg|jpeg|webp)$"
    )
    counter = 0
    for f in os.listdir(full_output_folder):
        m = pattern.match(f)
        if m:
            counter = max(counter, int(m.group(1)))
    return full_output_folder, filename, counter + 1


class SaveImage:
    """SaveImage node parity (ImageSaver.py:79-220)."""

    def __init__(self, output_dir: str = "./output"):
        self.output_dir = output_dir

    def save_images(
        self,
        images,
        filename_prefix: str = "LD",
        prompt: Optional[str] = None,
        extra_pnginfo: Optional[dict] = None,
    ) -> List[str]:
        from PIL import Image
        from PIL.PngImagePlugin import PngInfo

        arr = np.asarray(images, dtype=np.float32)
        if arr.ndim == 3:
            arr = arr[None]
        if arr.shape[-1] not in (1, 3, 4) and arr.shape[1] in (1, 3, 4):
            arr = np.transpose(arr, (0, 2, 3, 1))  # NCHW input tolerance
        folder, filename, counter = get_save_image_path(
            filename_prefix, self.output_dir
        )
        paths = []
        for img in to_uint8(arr):
            meta = PngInfo()
            if prompt is not None:
                meta.add_text("prompt", prompt)
            if extra_pnginfo:
                import json

                for k, v in extra_pnginfo.items():
                    meta.add_text(k, json.dumps(v))
            file = f"{filename}_{counter:05}_.png"
            path = os.path.join(folder, file)
            Image.fromarray(img.squeeze() if img.shape[-1] == 1 else img).save(
                path, pnginfo=meta, compress_level=4
            )
            paths.append(path)
            counter += 1
        return paths
