"""Flux pipeline plumbing: T5 tokenizer asset handling and the session
model cache (reference: FluxClip.py:593-644, ModelCache.py:34-62)."""

import os

import numpy as np
import pytest

from lightdiffusion_next_tpu.pipelines import loader
from lightdiffusion_next_tpu.pipelines import pipeline as pl


def test_flux_t5_tokenize_uses_vendored_asset():
    row = pl.flux_t5_tokenize("a photo of an astronaut riding a horse")
    assert len(row) == 256
    ids = [t for t, _w in row]
    # real sentencepiece ids, not whitespace hashes: "a" -> 3/9 prefix pieces
    assert ids[0] == 3 and ids[1] == 9
    # exactly one end token (1) before zero padding
    nonzero = [t for t in ids if t != 0]
    assert nonzero[-1] == 1 and nonzero.count(1) == 1


def test_flux_t5_tokenize_hard_errors_without_assets(monkeypatch, tmp_path):
    from lightdiffusion_next_tpu import config as cfg

    monkeypatch.setenv("LDT_ASSET_ROOT", str(tmp_path))
    monkeypatch.setattr(
        cfg, "repo_asset", lambda *parts: str(tmp_path / "missing.json")
    )
    monkeypatch.setattr(pl._config, "repo_asset", cfg.repo_asset)
    monkeypatch.delenv("LDT_ALLOW_DEGRADED_TOKENIZER", raising=False)
    with pytest.raises(RuntimeError, match="LDT_ALLOW_DEGRADED_TOKENIZER"):
        pl.flux_t5_tokenize("hello")
    monkeypatch.setenv("LDT_ALLOW_DEGRADED_TOKENIZER", "1")
    row = pl.flux_t5_tokenize("hello world")
    assert len(row) == 256  # degraded path still shaped correctly


def _fake_flux_world(monkeypatch, tmp_path):
    """Stub every disk/model constructor _get_flux_models touches; returns
    (paths, calls) with per-constructor call counters."""
    from lightdiffusion_next_tpu.models import vae as vae_mod
    from lightdiffusion_next_tpu.models.clip import t5 as t5_mod
    from lightdiffusion_next_tpu.models.clip import text_encoder as te
    from lightdiffusion_next_tpu.ops import ggml
    from lightdiffusion_next_tpu.utils import state_dict as sd_utils

    paths = {}
    for name in ("unet.gguf", "t5.gguf", "clip_l.safetensors", "ae.safetensors"):
        p = tmp_path / name
        p.write_bytes(b"stub")
        paths[name] = str(p)

    calls = {"unet": 0, "vae": 0, "t5": 0, "clip": 0, "disk": 0}

    class FakeModel:
        def with_options(self, **k):
            return self

    def fake_load_gguf(path, mesh=None, w8a8=None, scan_blocks=None,
                       spmd=False):
        calls["unet"] += 1
        calls["disk"] += 1
        calls["scan_blocks"] = scan_blocks
        calls["spmd"] = spmd
        return FakeModel()

    def fake_load_torch(path):
        calls["disk"] += 1
        return {}

    monkeypatch.setattr(loader, "load_diffusion_model_gguf", fake_load_gguf)
    monkeypatch.setattr(sd_utils, "load_torch_file", fake_load_torch)
    monkeypatch.setattr(sd_utils, "convs_to_hwio", lambda sd: sd)
    monkeypatch.setattr(
        vae_mod, "VAE",
        lambda sd, cfg=None: calls.__setitem__("vae", calls["vae"] + 1) or "VAE",
    )
    monkeypatch.setattr(
        vae_mod, "detect_vae_config", lambda sd: vae_mod.FLUX_AE
    )
    monkeypatch.setattr(t5_mod, "detect_config", lambda p: t5_mod.T5_XXL)
    monkeypatch.setattr(
        ggml, "gguf_clip_loader",
        lambda p: calls.__setitem__("disk", calls["disk"] + 1) or {},
    )
    monkeypatch.setattr(ggml, "to_device_quantized", lambda sd: sd)
    monkeypatch.setattr(
        t5_mod, "T5XXLModel",
        lambda params, cfg=None, compute_dtype=None, scan_blocks=False: (
            calls.__setitem__("t5", calls["t5"] + 1)
            or calls.__setitem__("t5_scan", scan_blocks)
            or "T5"
        ),
    )
    monkeypatch.setattr(
        te, "SDClipModel",
        lambda sd: calls.__setitem__("clip", calls["clip"] + 1) or "CLIP",
    )
    return paths, calls


def test_flux_models_cached_across_calls(monkeypatch, tmp_path):
    """Second _get_flux_models call must hit the ModelCache and load NOTHING
    from disk (the round-1 build re-read the 12B GGUF per image)."""
    paths, calls = _fake_flux_world(monkeypatch, tmp_path)

    cache = loader.get_model_cache()
    cache.clear()
    try:
        args = (
            paths["unet.gguf"], paths["t5.gguf"],
            paths["clip_l.safetensors"], paths["ae.safetensors"],
        )
        pl._get_flux_models(*args)
        disk_after_first = calls["disk"]
        assert disk_after_first > 0
        pl._get_flux_models(*args)
        assert calls["disk"] == disk_after_first, "second call hit the disk"
        assert calls["unet"] == 1 and calls["t5"] == 1 and calls["clip"] == 1
    finally:
        cache.clear()


def test_flux_scan_variant_keys_cache_and_reaches_loader(monkeypatch, tmp_path):
    """config.flux_scan must flow into the GGUF loader (scan_blocks=True)
    and key a DISTINCT ModelCache variant from the unrolled resident."""
    import dataclasses as _dc

    from lightdiffusion_next_tpu import config as _config

    paths, calls = _fake_flux_world(monkeypatch, tmp_path)
    cache = loader.get_model_cache()
    cache.clear()
    old = _config.get_config()
    try:
        args = (
            paths["unet.gguf"], paths["t5.gguf"],
            paths["clip_l.safetensors"], paths["ae.safetensors"],
        )
        pl._get_flux_models(*args)
        assert calls["scan_blocks"] is False
        assert calls["t5_scan"] is False
        _config.set_config(_dc.replace(old, flux_scan=True))
        pl._get_flux_models(*args)
        assert calls["scan_blocks"] is True
        assert calls["t5_scan"] is True, "flux_scan must re-layout T5 too"
        assert calls["unet"] == 2, "scan variant must not reuse the unrolled resident"
        assert calls["t5"] == 2, "T5 scan variant must not reuse the unrolled resident"
    finally:
        _config.set_config(old)
        cache.clear()


def test_flux_spmd_wrap_failure_falls_back_to_gspmd(
    monkeypatch, tmp_path, caplog
):
    """When the shard_map wrap is unavailable (to_spmd_model raises, e.g.
    num_heads not divisible by the model axis), _get_flux_models must keep
    serving on the GSPMD TP path with a warning instead of failing the
    generation (pipeline.py fallback)."""
    import logging

    from lightdiffusion_next_tpu.parallel import spmd as spmd_mod

    paths, calls = _fake_flux_world(monkeypatch, tmp_path)

    def broken_wrap(model, mesh, scan_blocks=False):
        raise ValueError("num_heads 24 not divisible by tp=16")

    monkeypatch.setattr(spmd_mod, "to_spmd_model", broken_wrap)

    class FakeMesh:
        shape = {"data": 1, "model": 16}

    cache = loader.get_model_cache()
    cache.clear()
    try:
        args = (
            paths["unet.gguf"], paths["t5.gguf"],
            paths["clip_l.safetensors"], paths["ae.safetensors"],
        )
        with caplog.at_level(logging.WARNING):
            model, *_ = pl._get_flux_models(*args, mesh=FakeMesh(), spmd=True)
        assert model is not None
        assert calls["unet"] == 1
        assert any("falling back" in r.message for r in caplog.records)
    finally:
        cache.clear()
