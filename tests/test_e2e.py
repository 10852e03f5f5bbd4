"""End-to-end slice: tokenizer -> CLIP -> ksample(UNet) -> VAE -> PNG, with
tiny random-weight models (the reference's CI smoke run analog, SURVEY §4).
Also exercises hires-fix, FBCache, MSW-MSA, masked detailing and USDU paths.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from lightdiffusion_next_tpu.models import base as base_mod
from lightdiffusion_next_tpu.models import unet as unet_mod
from lightdiffusion_next_tpu.models import vae as vae_mod
from lightdiffusion_next_tpu.models.clip import facade as clip_facade
from lightdiffusion_next_tpu.models.clip import text_encoder as te
from lightdiffusion_next_tpu.models.clip import tokenizer as tok
from lightdiffusion_next_tpu.sampling import ksampler as ks
from lightdiffusion_next_tpu.utils import image as image_utils
from lightdiffusion_next_tpu.utils import latent as latent_mod

TINY_UNET = unet_mod.UNetConfig(
    model_channels=32, channel_mult=(1, 2), num_res_blocks=(1, 1),
    transformer_depth=(1, 1), context_dim=768, num_heads=4, dtype=jnp.float32,
)
TINY_VAE = vae_mod.VAEConfig(ch=16, ch_mult=(1, 2), num_res_blocks=1)


@pytest.fixture(scope="module")
def stack():
    model = base_mod.sd15_model(
        unet_mod.init_params(TINY_UNET, seed=0), cfg=TINY_UNET, dtype=jnp.float32
    )
    vae = vae_mod.VAE(vae_mod.init_params(TINY_VAE, seed=1), cfg=TINY_VAE)
    clip_params = te.init_params(num_layers=2, width=768, heads=8, seed=2)
    clip = clip_facade.CLIP(
        tok.SD1Tokenizer(), te.SD1ClipModel(te.SDClipModel(clip_params, num_layers=2, heads=8))
    )
    return model, clip, vae


def test_txt2img_slice(stack, tmp_path):
    model, clip, vae = stack
    clip = clip_facade.CLIPSetLastLayer().set_last_layer(clip, -2)
    encode = clip_facade.CLIPTextEncode()
    positive = encode.encode(clip, "a (cute:1.2) cat")
    negative = encode.encode(clip, "blurry")

    latent = latent_mod.empty_latent(128, 128, 1)  # 16x16 latent
    result = ks.ksample(
        model,
        seed=42,
        steps=4,
        cfg_scale=7.0,
        sampler_name="dpmpp_sde_cfgpp",
        scheduler="karras",
        positive=positive,
        negative=negative,
        latent_image=latent,
        denoise=1.0,
    )
    assert result.latent.shape == (1, 16, 16, 4)
    images = np.asarray(vae.decode(result.latent))
    # tiny test VAE has ch_mult (1,2) -> x2 upscale (the real SD VAE is x8)
    assert images.shape == (1, 32, 32, 3)
    assert images.min() >= 0 and images.max() <= 1

    saver = image_utils.SaveImage(output_dir=str(tmp_path))
    paths = saver.save_images(images, "Classic/LD", prompt="a cute cat")
    assert os.path.exists(paths[0])


def test_vae_decode_memory_chunking(stack):
    """Batched decode splits into free-memory-sized sub-batches with
    identical output (reference free-memory batch sizing,
    VariationalAE.py:690-703 — the OOM class hit at e2e batch 4 on TPU)."""
    _, _, vae = stack
    rng = np.random.default_rng(3)
    z = jnp.asarray(rng.standard_normal((3, 8, 8, 4)), jnp.float32)
    whole = np.asarray(vae.decode(z))
    try:
        vae._max_decode_batch = lambda shape: 2  # force 2+1 chunks
        chunked = np.asarray(vae.decode(z))
    finally:
        del vae._max_decode_batch
    np.testing.assert_allclose(whole, chunked, atol=1e-5)
    assert vae._max_decode_batch((1, 128, 128, 4)) >= 1


def test_txt2img_reproducible(stack):
    model, clip, vae = stack
    encode = clip_facade.CLIPTextEncode()
    positive = encode.encode(clip, "hello")
    negative = encode.encode(clip, "bad")
    latent = latent_mod.empty_latent(64, 64, 1)

    def run():
        return np.asarray(
            ks.ksample(
                model, seed=7, steps=3, cfg_scale=7.0,
                sampler_name="euler", scheduler="normal",
                positive=positive, negative=negative, latent_image=latent,
            ).latent
        )

    a, b = run(), run()
    np.testing.assert_array_equal(a, b)


def test_hires_fix_two_pass(stack):
    from lightdiffusion_next_tpu.utils import upscale as upscale_mod

    model, clip, vae = stack
    encode = clip_facade.CLIPTextEncode()
    positive = encode.encode(clip, "a landscape")
    negative = encode.encode(clip, "ugly")
    latent = latent_mod.empty_latent(64, 64, 1)
    r1 = ks.ksample(
        model, seed=1, steps=3, cfg_scale=7.0, sampler_name="dpmpp_2m_cfgpp",
        scheduler="karras", positive=positive, negative=negative,
        latent_image=latent,
    )
    up = upscale_mod.bislerp(np.asarray(r1.latent), 16, 16)
    r2 = ks.ksample(
        model, seed=2, steps=3, cfg_scale=8.0,
        sampler_name="euler_ancestral_cfgpp", scheduler="normal",
        positive=positive, negative=negative, latent_image=jnp.asarray(up),
        denoise=0.45,
    )
    assert r2.latent.shape == (1, 16, 16, 4)
    assert np.isfinite(np.asarray(r2.latent)).all()


def test_denoise_slicing():
    from lightdiffusion_next_tpu.sampling.model_sampling import (
        ModelSamplingDiscrete,
    )

    msamp = ModelSamplingDiscrete()
    full = ks.sigmas_for(msamp, "karras", 10, denoise=1.0)
    assert len(full) == 11
    partial = ks.sigmas_for(msamp, "karras", 10, denoise=0.5)
    assert len(partial) == 11
    # denoise 0.5 -> schedule computed for 20 steps, last 11 kept
    longer = ks.sigmas_for(msamp, "karras", 20, denoise=1.0)
    np.testing.assert_allclose(partial, longer[-11:], rtol=1e-5)
    assert len(ks.sigmas_for(msamp, "karras", 10, denoise=0.0)) == 0


def test_trim_sigmas():
    sig = np.asarray([10.0, 8, 6, 4, 2, 0], dtype=np.float32)
    t = ks.trim_sigmas(sig, last_step=3, force_full_denoise=True)
    assert len(t) == 4 and t[-1] == 0
    t2 = ks.trim_sigmas(sig, start_step=2)
    np.testing.assert_allclose(t2, sig[2:])
    t3 = ks.trim_sigmas(sig, start_step=10)
    assert len(t3) == 0


def test_masked_denoise(stack):
    model, clip, vae = stack
    encode = clip_facade.CLIPTextEncode()
    positive = encode.encode(clip, "x")
    negative = encode.encode(clip, "y")
    latent = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 16, 16, 4)), dtype=jnp.float32
    )
    mask = np.zeros((1, 16, 16, 1), dtype=np.float32)
    mask[:, :8] = 1.0
    r = ks.ksample(
        model, seed=3, steps=3, cfg_scale=7.0, sampler_name="euler",
        scheduler="normal", positive=positive, negative=negative,
        latent_image=latent, denoise=0.5, denoise_mask=jnp.asarray(mask),
    )
    assert np.isfinite(np.asarray(r.latent)).all()


def test_detailer_with_static_mask(stack):
    from lightdiffusion_next_tpu.pipelines import detailer as det

    model, clip, vae = stack
    encode = clip_facade.CLIPTextEncode()
    positive = encode.encode(clip, "face")
    negative = encode.encode(clip, "bad")
    image = np.random.default_rng(0).uniform(0, 1, (1, 128, 128, 3)).astype(
        np.float32
    )
    mask = np.zeros((128, 128), dtype=np.float32)
    mask[32:96, 32:96] = 1.0
    d = det.Detailer(
        model, clip, vae,
        det.DetailerConfig(steps=2, guide_size=64, max_size=128, denoise=0.4),
    )
    out, segs = d.detail(image, det.StaticMaskDetector([mask]), positive, negative)
    assert len(segs) == 1
    assert out.shape == image.shape
    # outside the (feathered) mask the image is untouched
    np.testing.assert_allclose(out[:, :16, :16], image[:, :16, :16], atol=1e-5)
    assert not np.allclose(out[:, 48:80, 48:80], image[:, 48:80, 48:80])


def test_usdu_tiny(stack):
    from lightdiffusion_next_tpu.pipelines import upscaler as usdu

    model, clip, vae = stack
    encode = clip_facade.CLIPTextEncode()
    positive = encode.encode(clip, "photo")
    negative = encode.encode(clip, "bad")
    image = np.random.default_rng(1).uniform(0, 1, (1, 64, 64, 3)).astype(
        np.float32
    )
    u = usdu.UltimateSDUpscale(
        model, vae, None,
        usdu.USDUConfig(upscale_by=2.0, tile_width=64, tile_height=64,
                        mask_blur=4, seam_fix_mode="half_tile"),
    )
    out = u.upscale(
        image, positive, negative, seed=0, steps=2, denoise=0.3,
        sampler_name="euler", scheduler="normal",
    )
    assert out.shape == (1, 128, 128, 3)
    assert np.isfinite(out).all()


@pytest.mark.slow
@pytest.mark.parametrize(
    "w8a8,tp",
    [(False, "auto"), (True, "auto"), (True, "off"),
     (False, "spmd"), (True, "spmd")],
    ids=["q8", "w8a8-tp", "w8a8-singlechip", "q8-spmd", "w8a8-spmd"],
)
def test_flux_pipeline_end_to_end_with_gguf_assets(
    tmp_path, monkeypatch, w8a8, tp
):
    """The FULL flux workflow through the real loaders: tiny GGUF DiT
    (Q8_0) + llama.cpp-named T5 GGUF + CLIP-L + flux AE, built by
    scripts/make_tiny_assets.make_flux_assets, then pipeline(flux=True).
    This is the drive that caught T5XXLModel choking on quantized leaves.
    The w8a8 variant drives the per-column int8 requant load path
    (config.w8a8 -> ggml.to_w8a8) through the same workflow."""
    import importlib.util
    import sys as _sys

    spec = importlib.util.spec_from_file_location(
        "make_tiny_assets",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts",
            "make_tiny_assets.py",
        ),
    )
    mta = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mta)
    root = str(tmp_path / "assets")
    mta.make_flux_assets(root)

    monkeypatch.setenv("LDT_ASSET_ROOT", root)
    monkeypatch.setenv("LDT_OFFLINE", "1")
    # "off" forces the single-chip path even on the 8-device virtual mesh:
    # with the tiny model's K=256/N%128 shapes the w8a8 Pallas kernel then
    # actually runs (interpret mode) inside the sampler runners
    monkeypatch.setenv("LDT_FLUX_TP", tp)
    import dataclasses as _dc

    from lightdiffusion_next_tpu import config as _config
    from lightdiffusion_next_tpu.pipelines import loader as loader_mod
    from lightdiffusion_next_tpu.pipelines.pipeline import pipeline

    loader_mod.get_model_cache().clear()  # other tests' residents
    old_cfg = _config.get_config()
    _config.set_config(_dc.replace(old_cfg, w8a8=w8a8))
    try:
        paths = pipeline(
            "a tiny castle", 128, 128, number=1, batch=1,
            flux_enabled=True, output_dir=str(tmp_path / "out"),
        )
        assert len(paths) == 1 and paths[0].endswith(".png")
        assert os.path.exists(paths[0])
        assert "Flux" in paths[0]
        if w8a8:
            from lightdiffusion_next_tpu.ops import ggml

            # the variant prefix depends on whether the virtual mesh
            # auto-TPed the model; match on the :w8a8 suffix
            cache = loader_mod.get_model_cache()
            cached = [
                v for k, v in cache._cache.items() if k.endswith(":w8a8")
            ]
            assert cached, "w8a8 variant missing from model cache"
            model = cached[0]
            leaves = list(model.params.values())
            is_tp = any(getattr(v, "tp", False) for v in leaves)
            assert is_tp == (tp == "auto")
            if tp == "spmd":
                # local view strips tp; w8a8 converts post-wrap
                assert any(isinstance(v, ggml.QTensor8W) for v in leaves)
            elif is_tp:
                # under auto-TP, w8a8 is inert by design (tp leaves pass
                # through to_w8a8 unconverted — the sharded path never
                # takes the single-device int8 kernel)
                assert not any(isinstance(v, ggml.QTensor8W) for v in leaves)
            else:
                assert any(isinstance(v, ggml.QTensor8W) for v in leaves)
            # the single-chip loader path converts regardless of the
            # session mesh: load directly without one
            m2 = loader_mod.load_diffusion_model_gguf(
                os.path.join(root, "unet", "flux1-dev-Q8_0.gguf"),
                mesh=None, w8a8=True,
            )
            assert any(
                isinstance(v, ggml.QTensor8W) for v in m2.params.values()
            )
    finally:
        _config.set_config(old_cfg)
        loader_mod.get_model_cache().clear()
