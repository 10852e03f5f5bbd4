"""Pipeline-level pure helpers: CLI parser, seed persistence, presets,
settings persistence, enhancer fallback, downloader paths."""

import json
import os

import numpy as np
import pytest

from lightdiffusion_next_tpu.app import cli
from lightdiffusion_next_tpu.sampling import samplers


def test_cli_parser_flags():
    p = cli.build_parser()
    args = p.parse_args(
        ["a cat", "512", "768", "2", "1", "--hires-fix", "--adetailer",
         "--prio-speed", "--multiscale-preset", "quality"]
    )
    assert args.prompt == "a cat"
    assert (args.width, args.height) == (512, 768)
    assert args.number == 2
    assert args.hires_fix and args.adetailer and args.prio_speed
    assert args.multiscale_preset == "quality"


def test_multiscale_presets():
    # reference preset table values (multiscale_presets.py:49-86)
    q = samplers.MultiScale.preset("quality")
    assert q.enabled and q.factor == 0.5 and q.intermittent
    assert q.fullres_start == 10 and q.fullres_end == 8
    p = samplers.MultiScale.preset("performance")
    assert p.factor == 0.25 and p.fullres_start == 5 and p.intermittent
    d = samplers.MultiScale.preset("disabled")
    assert not d.enabled
    with pytest.raises(KeyError):
        samplers.MultiScale.preset("nope")


def test_seed_persistence(tmp_path, monkeypatch):
    monkeypatch.setenv("LDT_ASSET_ROOT", str(tmp_path))
    from lightdiffusion_next_tpu.pipelines import pipeline as pl

    pl.save_last_seed(12345)
    assert pl.load_last_seed() == 12345
    assert (tmp_path / "last_seed.txt").exists()


def test_webui_settings_roundtrip(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from lightdiffusion_next_tpu.app import webui

    s = webui.load_settings()
    assert s["width"] == 512
    s["width"] = 768
    webui.save_settings(s)
    s2 = webui.load_settings()
    assert s2["width"] == 768
    # unknown keys are dropped
    with open(webui.SETTINGS_FILE, "w") as f:
        json.dump({"width": 640, "evil": 1}, f)
    s3 = webui.load_settings()
    assert s3["width"] == 640 and "evil" not in s3


def test_enhancer_fallback_on_no_server():
    from lightdiffusion_next_tpu.pipelines.enhancer import enhance_prompt

    out = enhance_prompt("a cat", host="http://127.0.0.1:1", timeout=0.2)
    assert out == "a cat"


def test_downloader_paths(monkeypatch, tmp_path):
    monkeypatch.setenv("LDT_ASSET_ROOT", str(tmp_path))
    from lightdiffusion_next_tpu.pipelines import downloader

    p = downloader.asset_path("checkpoints", "x.safetensors")
    assert str(tmp_path) in p and p.endswith("checkpoints/x.safetensors")


def test_progress_tracker_and_previews(tmp_path):
    from lightdiffusion_next_tpu.app.instance import AppInstance

    inst = AppInstance(preview_dir=str(tmp_path / "prev"))
    inst.progress.set(0.5)
    assert inst.progress.get() == 0.5
    img = np.random.default_rng(0).uniform(0, 1, (8, 8, 3)).astype(np.float32)
    path = inst.update_image(img)
    assert path and os.path.exists(path)
    assert inst.get_latest_previews() == [path]
    inst.clear_previews()
    assert not os.path.exists(path)


def test_preview_callback_writes(tmp_path):
    from lightdiffusion_next_tpu.app.instance import AppInstance, make_preview_callback
    from lightdiffusion_next_tpu.utils import latent as latent_mod

    inst = AppInstance(preview_dir=str(tmp_path / "prev"))
    cb = make_preview_callback(inst, latent_mod.SD15, every=1, total_steps=4)
    x = np.random.default_rng(0).standard_normal((1, 8, 8, 4)).astype(np.float32)
    cb({"i": 0, "x": x, "sigma": 1.0, "denoised": x})
    assert len(inst.get_latest_previews()) == 1
    assert inst.progress.get() == 0.25


def test_params_file_roundtrip(monkeypatch, tmp_path):
    """write/load parameter file (util.py:324-369 parity; the reference's
    writer drops newlines so its own loader chokes — ours round-trips)."""
    monkeypatch.setenv("LDT_ASSET_ROOT", str(tmp_path))
    from lightdiffusion_next_tpu.utils import params_io

    params_io.write_parameters_to_file("a (cute:1.2) cat", "blurry", 512, 768, 7)
    prompt, neg, w, h, cfg = params_io.load_parameters_from_file()
    assert (prompt, neg, w, h, cfg) == ("a (cute:1.2) cat", "blurry", 512, 768, 7)


def test_params_file_legacy_and_newlines(monkeypatch, tmp_path):
    """Loader tolerates the reference writer's mashed single-line files;
    writer flattens embedded newlines so round-trips stay parseable."""
    monkeypatch.setenv("LDT_ASSET_ROOT", str(tmp_path))
    from lightdiffusion_next_tpu.utils import params_io

    # legacy single-line file (reference writer drops newlines)
    with open(params_io._params_file(), "w") as f:
        f.write("prompt: a catneg: blurryw: 512\nh: 640\ncfg: 7\n")
    prompt, neg, w, h, cfg = params_io.load_parameters_from_file()
    assert (prompt, neg, w, h, cfg) == ("a cat", "blurry", 512, 640, 7)

    # multi-line prompt flattens rather than corrupting other keys
    params_io.write_parameters_to_file("line one\nw: 4", "n", 256, 256, 3)
    prompt, neg, w, h, cfg = params_io.load_parameters_from_file()
    assert prompt == "line one w: 4" and (w, h, cfg) == (256, 256, 3)


def test_flux_t5_tokenize_no_truncation(monkeypatch):
    """Long prompts keep their full T5 sequence (reference max_length is
    effectively unlimited, FluxClip.py:612); short prompts pad to 256."""
    from lightdiffusion_next_tpu.pipelines import pipeline as pl

    monkeypatch.setattr(pl, "_t5_encode_ids", lambda text: list(range(2, 402)))
    row = pl.flux_t5_tokenize("x")
    assert len(row) == 401  # 400 tokens + </s>, NOT clipped at 256
    assert row[-1] == (1, 1.0)
    monkeypatch.setattr(pl, "_t5_encode_ids", lambda text: [5, 6, 7])
    row = pl.flux_t5_tokenize("x")
    assert len(row) == 256 and row[3] == (1, 1.0) and row[4] == (0, 1.0)


def test_checkpoint_cache_keyed_by_embedding_directory(monkeypatch, tmp_path):
    from lightdiffusion_next_tpu.pipelines import loader as loader_mod

    ckpt = tmp_path / "m.safetensors"
    ckpt.write_bytes(b"x")
    calls = []
    monkeypatch.setattr(
        loader_mod, "load_checkpoint_guess_config",
        lambda path, embedding_directory=None: calls.append(embedding_directory)
        or ("M", "C", "V"),
    )
    loader_mod.get_model_cache().clear()
    ldr = loader_mod.CheckpointLoaderSimple()
    ldr.load_checkpoint(str(ckpt), embedding_directory="A")
    ldr.load_checkpoint(str(ckpt), embedding_directory="A")  # cache hit
    ldr.load_checkpoint(str(ckpt), embedding_directory="B")  # different set
    assert calls == ["A", "B"]
    loader_mod.get_model_cache().clear()


def test_model_cache_evicts_other_variants(tmp_path):
    """One resident DiT per unet path: loading a new variant (w8a8 / TP
    mode toggles) drops the other variants of the SAME file while leaving
    other paths untouched."""
    from lightdiffusion_next_tpu.pipelines.loader import ModelCache

    p1 = tmp_path / "a.gguf"
    p1.write_bytes(b"x")
    p2 = tmp_path / "b.safetensors"
    p2.write_bytes(b"y")
    cache = ModelCache()
    cache.put(str(p1), "plain")
    cache.put(str(p1), "spmd-model", variant="mesh(1, 8):spmd")
    cache.put(str(p2), "other")

    cache.evict_other_variants(str(p1), keep_variant=":w8a8")
    assert cache.get(str(p1)) is None
    assert cache.get(str(p1), variant="mesh(1, 8):spmd") is None
    assert cache.get(str(p2)) == "other"

    cache.put(str(p1), "w8a8-model", variant=":w8a8")
    cache.evict_other_variants(str(p1), keep_variant=":w8a8")
    assert cache.get(str(p1), variant=":w8a8") == "w8a8-model"
