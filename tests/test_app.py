"""App-layer wiring: preview/progress callbacks reach the sampler loop and
the WebUI generator injects the PreviewHook (reference: app.py:312-464 +
the taesd preview threads at samplers.py:160)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from lightdiffusion_next_tpu.app import instance as instance_mod
from lightdiffusion_next_tpu.models import base as base_mod
from lightdiffusion_next_tpu.models import unet as unet_mod
from lightdiffusion_next_tpu.models.clip import facade as clip_facade
from lightdiffusion_next_tpu.models.clip import text_encoder as te
from lightdiffusion_next_tpu.models.clip import tokenizer as tok
from lightdiffusion_next_tpu.sampling import ksampler as ks
from lightdiffusion_next_tpu.utils import latent as latent_mod

TINY_UNET = unet_mod.UNetConfig(
    model_channels=32, channel_mult=(1, 2), num_res_blocks=(1, 1),
    transformer_depth=(1, 1), context_dim=768, num_heads=4, dtype=jnp.float32,
)


def test_preview_hook_produces_previews_and_progress(tmp_path):
    """PreviewHook -> _resolve_callback -> ksample: preview PNGs appear and
    progress lands in (0, 1]."""
    from lightdiffusion_next_tpu.pipelines.pipeline import _resolve_callback

    model = base_mod.sd15_model(
        unet_mod.init_params(TINY_UNET, seed=0), cfg=TINY_UNET,
        dtype=jnp.float32,
    )
    clip_params = te.init_params(num_layers=2, width=768, heads=8, seed=2)
    clip = clip_facade.CLIP(
        tok.SD1Tokenizer(),
        te.SD1ClipModel(te.SDClipModel(clip_params, num_layers=2, heads=8)),
    )
    encode = clip_facade.CLIPTextEncode()
    positive = encode.encode(clip, "a cat")
    negative = encode.encode(clip, "")

    inst = instance_mod.AppInstance(preview_dir=str(tmp_path / "preview"))
    hook = instance_mod.PreviewHook(inst, every=1)
    steps = 3
    cb = _resolve_callback(hook, model.latent_format, steps, None)
    assert callable(cb)

    ks.ksample(
        model,
        seed=1,
        steps=steps,
        cfg_scale=7.0,
        sampler_name="euler",
        scheduler="normal",
        positive=positive,
        negative=negative,
        latent_image=latent_mod.empty_latent(64, 64, 1),
        callback=cb,
    )
    assert 0.0 < inst.progress.get() <= 1.0
    previews = inst.get_latest_previews(4)
    assert previews, "no preview files were written"
    for p in previews:
        assert os.path.exists(p) and p.endswith(".png")


def test_resolve_callback_passthrough_and_none():
    from lightdiffusion_next_tpu.pipelines.pipeline import _resolve_callback

    assert _resolve_callback(None, latent_mod.SD15, 20, None) is None
    raw = lambda info: None  # noqa: E731
    assert _resolve_callback(raw, latent_mod.SD15, 20, None) is raw


def test_webui_generator_injects_preview_hook(monkeypatch, tmp_path):
    monkeypatch.chdir(tmp_path)  # webui_settings.json lands here
    from lightdiffusion_next_tpu.app import webui
    from lightdiffusion_next_tpu.pipelines import pipeline as pipeline_mod

    captured = {}

    def fake_pipeline(output_dir=None, progress_callback=None, **kw):
        captured["cb"] = progress_callback
        return [os.path.join(str(tmp_path), "out.png")]

    monkeypatch.setattr(pipeline_mod, "pipeline", fake_pipeline)
    outputs = list(
        webui.generate_images_with_preview(
            output_dir=str(tmp_path), prompt="hello", w=64, h=64
        )
    )
    assert isinstance(captured["cb"], instance_mod.PreviewHook)
    paths, status = outputs[-1]
    assert status == "done" and paths


def test_interrupt_stops_sampling(tmp_path):
    """request_interrupt() actually stops the loop (the reference's
    interrupt_flag is checked but never set — samplers.py:120-125); the
    partial latent is returned and later steps never run."""
    from lightdiffusion_next_tpu.sampling import samplers

    inst = instance_mod.AppInstance(preview_dir=str(tmp_path / "p"))
    inst.previewer_enabled = False  # progress/interrupt only
    cb = instance_mod.make_preview_callback(
        inst, latent_mod.SD15, total_steps=6
    )
    calls = []

    def denoise(x, sigma):
        calls.append(1)
        return 0.3 * x, 0.2 * x

    sigmas = np.asarray([14.0, 8.0, 4.0, 2.0, 1.0, 0.5, 0.0], np.float32)
    x0 = jnp.zeros((1, 8, 8, 4), jnp.float32)

    def interrupting_cb(info):
        if info["i"] == 1:
            inst.request_interrupt()
        cb(info)

    out = samplers.sample(
        denoise, x0, sigmas, sampler="euler", callback=interrupting_cb
    )
    assert out.shape == x0.shape
    # steps 0 and 1 ran; the interrupt fired in step 1's callback
    assert len(calls) == 2
    assert inst.progress.get() == pytest.approx(2 / 6)
    inst.clear_interrupt()
    assert not inst.interrupt_flag


def test_history_delete_and_clear(tmp_path):
    """History management (reference app.py:212-304): delete one selected
    image, clear all, and refuse paths outside the output dir."""
    from lightdiffusion_next_tpu.app import webui

    out = tmp_path / "output"
    (out / "Classic").mkdir(parents=True)
    (out / "Flux").mkdir()
    a = out / "Classic" / "LD_00001_.png"
    b = out / "Flux" / "LD_00002_.png"
    a.write_bytes(b"png")
    b.write_bytes(b"png")
    outside = tmp_path / "precious.png"
    outside.write_bytes(b"png")

    assert sorted(webui.list_history(str(out))) == sorted([str(a), str(b)])

    msg = webui.delete_history_image(str(a), output_dir=str(out))
    assert "deleted" in msg and not a.exists() and b.exists()

    msg = webui.delete_history_image(str(outside), output_dir=str(out))
    assert "refusing" in msg and outside.exists()
    assert "no image" in webui.delete_history_image("", output_dir=str(out))

    # gallery selections resolve by INDEX into the rendered listing —
    # gradio's event value is a temp-cache copy path, and basenames
    # collide across workflow subfolders (every folder counts LD_NNNNN_)
    listing = webui.list_history(str(out))
    assert webui.select_from_history(listing, 0) == listing[0]
    assert webui.select_from_history(listing, len(listing)) == ""
    assert webui.select_from_history(listing, None) == ""

    msg = webui.clear_history(str(out))
    assert "deleted 1" in msg
    assert webui.list_history(str(out)) == []


def test_multiscale_kwargs_mapping():
    from lightdiffusion_next_tpu.app import webui

    kw = webui.multiscale_kwargs("custom", True, False, 0.25, 2, 5)
    assert kw == {
        "enable_multiscale": True,
        "multiscale_intermittent_fullres": False,
        "multiscale_factor": 0.25,
        "multiscale_fullres_start": 2,
        "multiscale_fullres_end": 5,
    }
    assert webui.multiscale_kwargs("disabled", True, True, 0.5, 3, 8) == {
        "enable_multiscale": False
    }
    assert webui.multiscale_kwargs("quality", False, False, 0.5, 3, 8) == {
        "multiscale_preset": "quality"
    }


def test_settings_merge_save(monkeypatch, tmp_path):
    """generate_images_with_preview must merge-update settings, not
    overwrite the full UI save with its partial kwargs."""
    monkeypatch.chdir(tmp_path)
    from lightdiffusion_next_tpu.app import webui
    from lightdiffusion_next_tpu.pipelines import pipeline as pipeline_mod

    webui.save_settings({**webui.DEFAULT_SETTINGS, "multiscale_factor": 0.25})
    monkeypatch.setattr(
        pipeline_mod, "pipeline", lambda **kw: ["x.png"]
    )
    list(webui.generate_images_with_preview(prompt="p", w=64, h=64))
    assert webui.load_settings()["multiscale_factor"] == 0.25
    assert webui.load_settings()["prompt"] == "p"


def test_img2img_temp_file_routing(monkeypatch, tmp_path):
    """img2img checkbox + uploaded array route through a temp file that is
    passed as the pipeline prompt (app.py:382-387, 615-631) and removed
    after the run."""
    monkeypatch.chdir(tmp_path)
    from lightdiffusion_next_tpu.app import webui
    from lightdiffusion_next_tpu.pipelines import pipeline as pipeline_mod

    captured = {}

    def fake_pipeline(**kw):
        captured.update(kw)
        captured["prompt_existed"] = os.path.exists(kw["prompt"])
        return ["x.png"]

    monkeypatch.setattr(pipeline_mod, "pipeline", fake_pipeline)
    img = np.zeros((16, 16, 3), np.uint8)
    outputs = list(
        webui.generate_images_with_preview(
            output_dir=str(tmp_path / "out"), prompt="ignored", w=64, h=64,
            img2img_enabled=True, img2img_image=img,
        )
    )
    assert outputs[-1][1] == "done"
    assert captured["img2img"] is True
    assert captured["prompt"].endswith("temp_img2img.png")
    assert captured["prompt_existed"]
    assert not os.path.exists(captured["prompt"])  # cleaned up

    # a path upload is passed through without a temp copy
    src = tmp_path / "src.png"
    from PIL import Image

    Image.fromarray(img).save(str(src))
    list(
        webui.generate_images_with_preview(
            output_dir=str(tmp_path / "out"), prompt="ignored", w=64, h=64,
            img2img_enabled=True, img2img_image=str(src),
        )
    )
    assert captured["prompt"] == str(src) and src.exists()


def test_preview_and_keep_models_toggles(monkeypatch, tmp_path):
    """enable_preview / keep_models_loaded / reuse_seed controls
    (app.py:600, 619, 624)."""
    monkeypatch.chdir(tmp_path)
    from lightdiffusion_next_tpu.app import webui
    from lightdiffusion_next_tpu.pipelines import loader as loader_mod
    from lightdiffusion_next_tpu.pipelines import pipeline as pipeline_mod

    captured = {}
    monkeypatch.setattr(
        pipeline_mod, "pipeline",
        lambda **kw: captured.update(kw) or ["x.png"],
    )
    cache = loader_mod.get_model_cache()
    old_keep = cache.keep_models_loaded
    try:
        list(
            webui.generate_images_with_preview(
                output_dir=str(tmp_path), prompt="p", w=64, h=64,
                enable_preview=False, keep_models_loaded=False,
                reuse_seed=True,
            )
        )
        assert instance_mod.app.previewer_enabled is False
        assert cache.keep_models_loaded is False
        assert captured["reuse_seed"] is True
        # settings persisted (app.py autosave parity)
        saved = webui.load_settings()
        assert saved["enable_preview"] is False
        assert saved["keep_models_loaded"] is False
        assert saved["reuse_seed"] is True
    finally:
        instance_mod.app.previewer_enabled = True
        cache.set_keep_models_loaded(old_keep)


def test_concurrent_generation_guard(monkeypatch, tmp_path):
    """A second Generate while one runs must not start a second pipeline
    thread (reference serializes via generation_in_progress,
    app.py:312-464)."""
    import threading

    monkeypatch.chdir(tmp_path)
    from lightdiffusion_next_tpu.app import webui
    from lightdiffusion_next_tpu.pipelines import pipeline as pipeline_mod

    release = threading.Event()
    started = threading.Event()
    calls = []

    def slow_pipeline(**kw):
        calls.append(1)
        started.set()
        release.wait(timeout=10)
        return ["x.png"]

    monkeypatch.setattr(pipeline_mod, "pipeline", slow_pipeline)

    first_result = []

    def run_first():
        first_result.extend(
            webui.generate_images_with_preview(
                output_dir=str(tmp_path), prompt="p", w=64, h=64
            )
        )

    t = threading.Thread(target=run_first)
    t.start()
    assert started.wait(timeout=10)
    # second click while the first is running: busy, no second pipeline call
    second = list(
        webui.generate_images_with_preview(
            output_dir=str(tmp_path), prompt="q", w=64, h=64
        )
    )
    assert second == [([], "busy: a generation is already in progress")]
    release.set()
    t.join(timeout=10)
    assert len(calls) == 1
    assert first_result[-1][1] == "done"
    # and the lock is released: a new run goes through
    third = list(
        webui.generate_images_with_preview(
            output_dir=str(tmp_path), prompt="r", w=64, h=64
        )
    )
    assert third[-1][1] == "done" and len(calls) == 2


def test_disconnect_mid_run_keeps_guard_until_worker_done(monkeypatch, tmp_path):
    """Closing the generator (client disconnect) while the pipeline thread
    runs must NOT release the generation guard or start a second run; the
    lock is handed to a waiter that joins the worker first."""
    import threading
    import time as time_mod

    monkeypatch.chdir(tmp_path)
    from lightdiffusion_next_tpu.app import webui
    from lightdiffusion_next_tpu.pipelines import pipeline as pipeline_mod

    release = threading.Event()
    started = threading.Event()
    calls = []

    def slow_pipeline(**kw):
        calls.append(1)
        started.set()
        release.wait(timeout=10)
        return ["x.png"]

    monkeypatch.setattr(pipeline_mod, "pipeline", slow_pipeline)
    gen = webui.generate_images_with_preview(
        output_dir=str(tmp_path), prompt="p", w=64, h=64
    )
    next(gen)  # enter the polling loop
    assert started.wait(timeout=10)
    gen.close()  # simulate the client disconnecting
    # worker still sampling: a second Generate must be refused
    second = list(
        webui.generate_images_with_preview(
            output_dir=str(tmp_path), prompt="q", w=64, h=64
        )
    )
    assert second == [([], "busy: a generation is already in progress")]
    assert len(calls) == 1
    release.set()
    # once the worker drains, the waiter releases the lock
    deadline = time_mod.time() + 10
    while time_mod.time() < deadline:
        if webui._GENERATION_LOCK.acquire(blocking=False):
            webui._GENERATION_LOCK.release()
            break
        time_mod.sleep(0.05)
    else:
        raise AssertionError("guard never released after worker completion")
    third = list(
        webui.generate_images_with_preview(
            output_dir=str(tmp_path), prompt="r", w=64, h=64
        )
    )
    assert third[-1][1] == "done" and len(calls) == 2


def test_img2img_without_image_errors(monkeypatch, tmp_path):
    monkeypatch.chdir(tmp_path)
    from lightdiffusion_next_tpu.app import webui
    from lightdiffusion_next_tpu.pipelines import pipeline as pipeline_mod

    calls = []
    monkeypatch.setattr(
        pipeline_mod, "pipeline", lambda **kw: calls.append(1) or ["x.png"]
    )
    outs = list(
        webui.generate_images_with_preview(
            output_dir=str(tmp_path), prompt="p", w=64, h=64,
            img2img_enabled=True, img2img_image=None,
        )
    )
    assert outs == [([], "error: img2img is enabled but no input image was provided")]
    assert calls == []  # no silent txt2img fallback


def test_cli_preview_flag_parses():
    from lightdiffusion_next_tpu.app.cli import build_parser

    args = build_parser().parse_args(["a cat", "64", "64", "--preview"])
    assert args.preview


def test_w8a8_toggle_sets_config(monkeypatch, tmp_path):
    """The W8A8 checkbox routes to config.w8a8 (this framework's own
    int8-MXU feature; no reference analogue) and is popped before the
    pipeline call."""
    monkeypatch.chdir(tmp_path)
    from lightdiffusion_next_tpu import config as _config
    from lightdiffusion_next_tpu.app import webui
    from lightdiffusion_next_tpu.pipelines import pipeline as pipeline_mod

    captured = {}
    monkeypatch.setattr(
        pipeline_mod, "pipeline",
        lambda **kw: captured.update(kw) or ["x.png"],
    )
    old = _config.get_config()
    try:
        list(
            webui.generate_images_with_preview(
                output_dir=str(tmp_path), prompt="p", w=64, h=64, w8a8=True,
            )
        )
        assert _config.get_config().w8a8 is True
        assert "w8a8" not in captured
        assert webui.load_settings()["w8a8"] is True
        list(
            webui.generate_images_with_preview(
                output_dir=str(tmp_path), prompt="p", w=64, h=64, w8a8=False,
            )
        )
        assert _config.get_config().w8a8 is False
    finally:
        _config.set_config(old)


def test_packed_attn_toggle_sets_config(monkeypatch, tmp_path):
    """The head-packed attention checkbox routes to config.packed_attn
    (TPU default since the VPU-lean softmax; no reference analogue) and is
    popped before the pipeline call."""
    monkeypatch.chdir(tmp_path)
    from lightdiffusion_next_tpu import config as _config
    from lightdiffusion_next_tpu.app import webui
    from lightdiffusion_next_tpu.pipelines import pipeline as pipeline_mod

    captured = {}
    monkeypatch.setattr(
        pipeline_mod, "pipeline",
        lambda **kw: captured.update(kw) or ["x.png"],
    )
    old = _config.get_config()
    try:
        list(
            webui.generate_images_with_preview(
                output_dir=str(tmp_path), prompt="p", w=64, h=64,
                packed_attn=True,
            )
        )
        assert _config.get_config().packed_attn is True
        assert "packed_attn" not in captured
        list(
            webui.generate_images_with_preview(
                output_dir=str(tmp_path), prompt="p", w=64, h=64,
                packed_attn=False,
            )
        )
        assert _config.get_config().packed_attn is False
    finally:
        _config.set_config(old)


def test_cli_packed_attn_flags():
    from lightdiffusion_next_tpu.app.cli import build_parser

    p = build_parser()
    assert p.parse_args(["a cat", "64", "64", "--packed-attn"]).packed_attn
    assert p.parse_args(["a cat", "64", "64", "--no-packed-attn"]).no_packed_attn
