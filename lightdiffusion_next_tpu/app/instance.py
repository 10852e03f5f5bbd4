"""App state: progress tracking and preview image management.

Counterpart of src/user/app_instance.py:12-116 (AppInstance/ProgressTracker)
— the channel between the generation thread and the UI. Preview writes are
lock-guarded; the previewer consumes latents handed to it explicitly (the
reference's preview threads read live tensors unsynchronized, SURVEY §5
"race detection" — fixed here by passing a host copy).
"""

from __future__ import annotations

import dataclasses
import os
import threading
import time
from typing import List, Optional

import numpy as np


class ProgressTracker:
    """0..1 progress value (app_instance.py:100-112)."""

    def __init__(self):
        self._value = 0.0
        self._lock = threading.Lock()

    def set(self, value: float) -> None:
        with self._lock:
            self._value = float(value)

    def get(self) -> float:
        with self._lock:
            return self._value


class AppInstance:
    """Preview files + progress singleton (app_instance.py:12-98)."""

    def __init__(self, preview_dir: str = "./output/preview"):
        self.preview_dir = preview_dir
        self.preview_lock = threading.Lock()
        self.progress = ProgressTracker()
        self.previewer_enabled = True
        self.interrupt_flag = False  # set via request_interrupt()
        self._preview_paths: List[str] = []

    def request_interrupt(self) -> None:
        """Ask the running generation to stop after its current step (the
        reference checks app.interrupt_flag in every sampler loop but
        nothing ever sets it — samplers.py:120-125; here the WebUI button
        does, and the preview callback honors it)."""
        self.interrupt_flag = True

    def clear_interrupt(self) -> None:
        self.interrupt_flag = False

    def update_image(self, image: np.ndarray) -> Optional[str]:
        """Write a preview PNG (update_image parity, :26-46)."""
        if not self.previewer_enabled:
            return None
        from PIL import Image

        os.makedirs(self.preview_dir, exist_ok=True)
        path = os.path.join(self.preview_dir, f"preview_{int(time.time()*1e3)}.png")
        from lightdiffusion_next_tpu.utils.image import to_uint8

        arr = to_uint8(np.asarray(image))  # same rounding as saved images
        if arr.ndim == 4:
            arr = arr[0]
        with self.preview_lock:
            Image.fromarray(arr).save(path)
            self._preview_paths.append(path)
            # keep only the newest few
            while len(self._preview_paths) > 4:
                old = self._preview_paths.pop(0)
                try:
                    os.remove(old)
                except OSError:
                    pass
        return path

    def get_latest_previews(self, n: int = 1) -> List[str]:
        with self.preview_lock:
            return list(self._preview_paths[-n:])

    def clear_previews(self) -> None:
        with self.preview_lock:
            for p in self._preview_paths:
                try:
                    os.remove(p)
                except OSError:
                    pass
            self._preview_paths.clear()


app = AppInstance()


@dataclasses.dataclass
class PreviewHook:
    """Marker accepted by ``pipeline(progress_callback=...)``.

    The caller (WebUI / CLI --preview) cannot build the real sampler
    callback — the latent format, step count, and TAESD variant are
    per-stage details only the pipeline knows — so it passes this marker
    and the pipeline resolves it into ``make_preview_callback`` for every
    sampling stage (reference: app.py:312-464 preview polling fed by the
    taesd threads at samplers.py:160)."""

    instance: AppInstance
    every: int = 5


def make_preview_callback(
    instance: AppInstance,
    latent_format,
    taesd_params=None,
    every: int = 5,
    total_steps: int = 20,
):
    """Sampler callback: progress + TAESD (or linear-RGB) preview every N
    steps (the reference spawns taesd threads at samplers.py:160 etc.; here
    the decode is an async device dispatch + host write)."""

    def callback(info):
        i = info["i"]
        instance.progress.set((i + 1) / max(total_steps, 1))
        if instance.interrupt_flag:
            from lightdiffusion_next_tpu.sampling.samplers import (
                SampleInterrupted,
            )

            raise SampleInterrupted()
        # chunked-scan mode already fires at `every`-step granularity;
        # the modulo gate is for the eager per-step path
        chunked = bool(info.get("chunk"))
        if not instance.previewer_enabled or (not chunked and i % every != 0):
            return
        # a failed preview must never kill the generation (the reference's
        # preview threads die silently; we log instead)
        try:
            x = np.asarray(info["x"])
            if taesd_params is not None:
                from lightdiffusion_next_tpu.models import taesd

                img = taesd.decode_preview(taesd_params, x[:1])
            else:
                from lightdiffusion_next_tpu.utils.latent import (
                    latent_preview_rgb,
                )

                img = latent_preview_rgb(latent_format, x[:1])
            instance.update_image(img)
        except Exception:
            import logging

            logging.exception("preview decode failed")

    # sampler: run compiled `every`-step segments between callbacks instead
    # of eager per-step dispatch (samplers.sample chunked mode)
    callback.chunk = every
    # orchestrators (pipeline stages, USDU tiles, detailer segments) poll
    # this between units of work to honor an interrupt promptly
    callback.should_stop = lambda: instance.interrupt_flag
    return callback
