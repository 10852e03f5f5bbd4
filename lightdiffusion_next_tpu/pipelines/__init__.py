"""Pipelines: checkpoint loading, txt2img/img2img orchestration, upscaling,
detailing — the user-facing layer (reference L7/L8)."""
