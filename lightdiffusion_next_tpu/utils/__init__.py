"""Utilities: latent formats, state-dict IO, tiling, images, HDR, progress."""
