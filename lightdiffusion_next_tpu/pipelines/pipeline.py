"""pipeline() — THE public API: txt2img / hires-fix / img2img+USDU / Flux,
plus optional ADetailer, AutoHDR and prompt enhancement.

Counterpart of src/user/pipeline.py:31-639 (the 4 workflow branches, seed
persistence, default negative prompt, CLI) — same surface, re-plumbed onto
the TPU engine. The reference's Stable-Fast branch is a no-op here: every
model call is already jit-compiled (SURVEY §7: "Stable-Fast -> jax.jit; the
70% compile win is the baseline, not a feature").
"""

from __future__ import annotations

import dataclasses
import os
import random
from typing import List, Optional

import numpy as np

from lightdiffusion_next_tpu import config as _config
from lightdiffusion_next_tpu.models.clip import facade as clip_facade
from lightdiffusion_next_tpu.pipelines import downloader, loader
from lightdiffusion_next_tpu.sampling import cfg as cfg_mod
from lightdiffusion_next_tpu.sampling import fbcache as fb_mod
from lightdiffusion_next_tpu.sampling import ksampler as ks
from lightdiffusion_next_tpu.sampling import samplers as samplers_mod
from lightdiffusion_next_tpu.utils import hdr as hdr_mod
from lightdiffusion_next_tpu.utils import image as image_utils
from lightdiffusion_next_tpu.utils import latent as latent_mod
from lightdiffusion_next_tpu.utils import upscale as upscale_mod

DEFAULT_NEGATIVE = (
    "(worst quality, low quality:1.4), (zombie, sketch, interlocked fingers, "
    "comic), (embedding:EasyNegative), (embedding:badhandv4), (embedding:lr), "
    "(embedding:ng_deepnegative_v1_75t)"
)


def _seed_file() -> str:
    return os.path.join(_config.asset_root(), "last_seed.txt")


def load_last_seed() -> int:
    try:
        with open(_seed_file()) as f:
            return int(f.read().strip())
    except Exception:
        return 0


def save_last_seed(seed: int) -> None:
    os.makedirs(os.path.dirname(_seed_file()), exist_ok=True)
    with open(_seed_file(), "w") as f:
        f.write(str(seed))


def pipeline(
    prompt: str,
    w: int,
    h: int,
    number: int = 1,
    batch: int = 1,
    hires_fix: bool = False,
    adetailer: bool = False,
    enhance_prompt: bool = False,
    img2img: bool = False,
    stable_fast: bool = False,  # accepted for API parity; jit is always on
    reuse_seed: bool = False,
    flux_enabled: bool = False,
    prio_speed: bool = False,
    autohdr: bool = True,
    realistic_model: bool = False,
    negative_prompt: Optional[str] = None,
    multiscale_preset: Optional[str] = None,
    enable_multiscale: bool = True,
    multiscale_factor: float = 0.5,
    multiscale_fullres_start: int = 3,
    multiscale_fullres_end: int = 8,
    multiscale_intermittent_fullres: bool = False,
    output_dir: str = "./output",
    progress_callback=None,
    hidiffusion: bool = True,
) -> List[str]:
    """Run the generation pipeline; returns saved image paths
    (pipeline.py:31-520 parity)."""
    if multiscale_preset is not None:
        ms = samplers_mod.MultiScale.preset(multiscale_preset)
    else:
        ms = samplers_mod.MultiScale(
            enabled=enable_multiscale,
            factor=multiscale_factor,
            fullres_start=multiscale_fullres_start,
            fullres_end=multiscale_fullres_end,
            intermittent=multiscale_intermittent_fullres,
        )

    if negative_prompt is None or not negative_prompt.strip():
        negative_prompt = DEFAULT_NEGATIVE

    if reuse_seed:
        seed = load_last_seed()
    else:
        seed = random.randint(1, 2**63 - 1)
    save_last_seed(seed)

    # parameter-file record (util.py:324-369; the reference's Enhancer reads
    # the prompt back from this file but nothing ever wrote it — here the
    # flow is closed)
    try:
        from lightdiffusion_next_tpu.utils import params_io

        params_io.write_parameters_to_file(prompt, negative_prompt, w, h, 7)
    except OSError:
        pass

    if enhance_prompt:
        from lightdiffusion_next_tpu.pipelines.enhancer import (
            enhance_prompt as do_enhance,
        )

        prompt = do_enhance(prompt)

    saver = image_utils.SaveImage(output_dir=output_dir)
    saved: List[str] = []

    for _ in range(number):
        if _stop_requested(progress_callback):
            break
        if flux_enabled:
            saved += _flux_txt2img(
                prompt, w, h, batch, autohdr, saver, progress_callback
            )
            continue
        if img2img:
            saved += _img2img_usdu(
                prompt, autohdr, saver, realistic_model, progress_callback
            )
            continue
        saved += _sd15_generate(
            prompt, negative_prompt, w, h, batch, seed, hires_fix, adetailer,
            prio_speed, autohdr, realistic_model, ms, saver, progress_callback,
            hidiffusion,
        )
        seed = random.randint(1, 2**63 - 1)
    return saved


def _stop_requested(progress_callback) -> bool:
    """Interrupt poll between images/stages — a PreviewHook carries the app
    instance whose flag the WebUI Interrupt button sets; the per-step stop
    inside a sampler run is handled by the callback raising
    SampleInterrupted (samplers.sample)."""
    from lightdiffusion_next_tpu.app import instance as instance_mod

    return (
        isinstance(progress_callback, instance_mod.PreviewHook)
        and progress_callback.instance.interrupt_flag
    )


_TAESD_CACHE: dict = {}


def _load_taesd_params(taesd_file):
    """Load + normalize a TAESD decoder once per (path, mtime) — previews
    resolve a callback per stage and per image; re-parsing the checkpoint
    every time is pure waste. None (missing/unrecognized asset) is cached
    too: previews then use the linear-RGB fallback."""
    if not taesd_file:
        return None
    path = downloader.asset_path("vae_approx", taesd_file)
    if not os.path.exists(path):
        return None
    try:
        key = (path, os.path.getmtime(path))
    except OSError:
        return None
    if key not in _TAESD_CACHE:
        try:
            from lightdiffusion_next_tpu.models import taesd as taesd_mod
            from lightdiffusion_next_tpu.utils import state_dict as sd_utils

            raw = taesd_mod.normalize_decoder_params(
                sd_utils.load_torch_file(path)
            )
            _TAESD_CACHE[key] = (
                None if raw is None else sd_utils.convs_to_hwio(raw)
            )
        except Exception:
            _TAESD_CACHE[key] = None
    return _TAESD_CACHE[key]


def _resolve_callback(progress_callback, latent_format, total_steps, taesd_file):
    """Turn an app.instance.PreviewHook into a real per-stage sampler
    callback (previews + 0..1 progress); raw callables pass through.

    The TAESD decoder asset is optional — without it previews fall back to
    the latent-format linear RGB projection (Latent.py preview factors)."""
    from lightdiffusion_next_tpu.app import instance as instance_mod

    if progress_callback is None or not isinstance(
        progress_callback, instance_mod.PreviewHook
    ):
        return progress_callback

    taesd_params = _load_taesd_params(taesd_file)
    return instance_mod.make_preview_callback(
        progress_callback.instance,
        latent_format,
        taesd_params,
        every=progress_callback.every,
        total_steps=total_steps,
    )


# ---------------------------------------------------------------------------
# SD1.5 txt2img (+hires, +adetailer) — pipeline.py:279-511
# ---------------------------------------------------------------------------


def _load_sd15(realistic_model: bool):
    missing = downloader.check_and_download()
    ckpt = downloader.asset_path(
        "checkpoints",
        "DreamShaper_8_pruned.safetensors"
        if realistic_model
        else "Meina V10 - baked VAE.safetensors",
    )
    if not os.path.exists(ckpt):
        raise FileNotFoundError(
            f"checkpoint missing: {ckpt}"
            + (f" (downloads failed: {missing})" if missing else "")
        )
    return loader.CheckpointLoaderSimple().load_checkpoint(
        ckpt,
        embedding_directory=os.path.join(_config.asset_root(), "embeddings"),
    )


def _apply_lora_add_detail(model, clip):
    """LoraLoader('add_detail', 0.7, 0.7) step (pipeline.py:283-293)."""
    from lightdiffusion_next_tpu.models import lora as lora_mod
    from lightdiffusion_next_tpu.utils import state_dict as sd_utils

    path = downloader.asset_path("loras", "add_detail.safetensors")
    if not os.path.exists(path):
        return model, clip
    try:
        from lightdiffusion_next_tpu.models.clip import text_encoder as te

        lora_sd = sd_utils.load_torch_file(path)
        inner = clip.model.model  # SD1ClipModel -> SDClipModel
        new_unet, new_clip_params = lora_mod.load_and_apply_lora(
            lora_sd, model.params, inner.params, 0.7, 0.7
        )
        model = model.with_params(new_unet)
        new_inner = inner.clone()
        new_inner.params = new_clip_params
        clip = clip.clone()
        clip.model = te.SD1ClipModel(new_inner)
        return model, clip
    except Exception:
        return model, clip


def _sd15_generate(
    prompt, negative_prompt, w, h, batch, seed, hires_fix, adetailer,
    prio_speed, autohdr, realistic_model, ms, saver, progress_callback,
    hidiffusion,
):
    import jax.numpy as jnp

    model, clip, vae = _load_sd15(realistic_model)
    model, clip = _apply_lora_add_detail(model, clip)

    # clip-skip -2 (pipeline.py:295-298)
    clip = clip_facade.CLIPSetLastLayer().set_last_layer(clip, -2)
    encode = clip_facade.CLIPTextEncode()
    positive = encode.encode(clip, prompt)
    negative = encode.encode(clip, negative_prompt)

    # MSW-MSA windowed attention (hidiffoptimizer.go, pipeline.py:336-338)
    if hidiffusion:
        from lightdiffusion_next_tpu.ops import window

        model = model.with_options(
            attn1_override_factory=window.make_msw_msa_factory(
                model_sampling=model.model_sampling
            )
        )

    latent = latent_mod.empty_latent(w, h, batch)
    sampler_name = "dpmpp_2m_cfgpp" if prio_speed else "dpmpp_sde_cfgpp"
    callback = _resolve_callback(
        progress_callback, model.latent_format, 20, "taesd_decoder.safetensors"
    )
    result = ks.ksample(
        model,
        seed=seed,
        steps=20,
        cfg_scale=7.0,
        sampler_name=sampler_name,
        scheduler="karras",
        positive=positive,
        negative=negative,
        latent_image=latent,
        denoise=1.0,
        ms=ms,
        callback=callback,
    )

    if hires_fix and not _stop_requested(progress_callback):
        up = upscale_mod.bislerp(np.asarray(result.latent), (w * 2) // 8, (h * 2) // 8)
        result = ks.ksample(
            model,
            seed=random.randint(1, 2**63 - 1),
            steps=10,
            cfg_scale=8.0,
            sampler_name="euler_ancestral_cfgpp",
            scheduler="normal",
            positive=positive,
            negative=negative,
            latent_image=jnp.asarray(up),
            denoise=0.45,
            callback=_resolve_callback(
                progress_callback, model.latent_format, 10,
                "taesd_decoder.safetensors",
            ),
        )

    images = np.asarray(vae.decode(result.latent))

    if adetailer and not _stop_requested(progress_callback):
        images = _run_adetailer(
            images, model, vae, positive, negative, seed, progress_callback,
        )
        prefix = "Adetailer/LD-head"
    elif hires_fix:
        prefix = "HiresFix/LD"
    else:
        prefix = "Classic/LD"

    if autohdr:
        images = hdr_mod.apply_hdr_batch(images)
    return saver.save_images(images, prefix, prompt=prompt)


def _run_adetailer(images, model, vae, positive, negative, seed,
                   progress_callback=None):
    """2-pass person+face detail (pipeline.py:375-511). Conds come from the
    generation pass (no re-encode); the generation seed drives the detail
    re-diffusion (the reference threads its seed into do_detail — a fixed
    seed here would correlate face redraws across independent runs).
    Detection/upscale aux models are session-cached (SAM's 375 MB ViT and
    the YOLO weights otherwise reload from disk per generated image)."""
    from lightdiffusion_next_tpu.pipelines import detailer as det
    from lightdiffusion_next_tpu.pipelines import loader as loader_mod

    d = det.Detailer(
        model, None, vae, det.DetailerConfig(denoise=0.5, seed=seed)
    )
    cb = _resolve_callback(
        progress_callback, model.latent_format, d.cfg.steps,
        "taesd_decoder.safetensors",
    )
    cache = loader_mod.get_model_cache()

    sam = None
    sam_path = downloader.asset_path("yolos", "sam_vit_b_01ec64.pth")
    if os.path.exists(sam_path):
        sam = cache.get(sam_path, "sam")
        if sam is None:
            try:
                from lightdiffusion_next_tpu.pipelines.sam import SAMWrapper

                sam = SAMWrapper(sam_path)
                cache.put(sam_path, sam, "sam")
            except RuntimeError:
                sam = None

    for yolo_name in ("person_yolov8m-seg.pt", "face_yolov9c.pt"):
        path = downloader.asset_path("yolos", yolo_name)
        if not os.path.exists(path):
            continue
        detector = cache.get(path, "yolo")
        if detector is None:
            try:
                detector = det.UltralyticsDetector(path)
                cache.put(path, detector, "yolo")
            except RuntimeError:
                continue
        images, _ = d.detail(
            images, detector, positive, negative, sam=sam, callback=cb
        )
    return images


# ---------------------------------------------------------------------------
# img2img + UltimateSDUpscale — pipeline.py:135-214
# ---------------------------------------------------------------------------


def _img2img_usdu(image_path, autohdr, saver, realistic_model, progress_callback):
    from lightdiffusion_next_tpu.models import esrgan
    from lightdiffusion_next_tpu.pipelines import upscaler as usdu
    from lightdiffusion_next_tpu.utils import state_dict as sd_utils

    model, clip, vae = _load_sd15(realistic_model)
    clip = clip_facade.CLIPSetLastLayer().set_last_layer(clip, -2)
    encode = clip_facade.CLIPTextEncode()
    positive = encode.encode(
        clip, "masterpiece, best quality, highly detailed"
    )
    negative = encode.encode(clip, DEFAULT_NEGATIVE)

    image = image_utils.load_image(image_path)

    up_model = None
    esrgan_path = downloader.asset_path("ESRGAN", "RealESRGAN_x4plus.pth")
    if os.path.exists(esrgan_path):
        cache = loader.get_model_cache()
        up_model = cache.get(esrgan_path, "esrgan")
        if up_model is None:
            # session-cached: a fresh UpscaleModel per image re-reads the
            # checkpoint AND retraces its jitted conv stack
            params = sd_utils.convs_to_hwio(
                sd_utils.load_torch_file(esrgan_path)
            )
            up_model = esrgan.UpscaleModel(params)
            cache.put(esrgan_path, up_model, "esrgan")

    u = usdu.UltimateSDUpscale(
        model, vae, up_model, usdu.USDUConfig(upscale_by=2.0)
    )
    out = u.upscale(
        image,
        positive,
        negative,
        seed=random.randint(1, 2**63 - 1),
        steps=8,
        cfg_scale=6.0,
        sampler_name="dpmpp_2m_cfgpp",
        scheduler="karras",
        denoise=0.3,
        callback=_resolve_callback(
            progress_callback, model.latent_format, 8,
            "taesd_decoder.safetensors",
        ),
    )
    if autohdr:
        out = hdr_mod.apply_hdr_batch(out)
    return saver.save_images(out, "Img2Img/LD", prompt=image_path)


# ---------------------------------------------------------------------------
# Flux txt2img — pipeline.py:215-278
# ---------------------------------------------------------------------------


def _get_flux_models(
    unet_path, t5_path, clip_l_path, ae_path, mesh=None, spmd=False
):
    """Load (or fetch cached) flux model + VAE + text encoders.

    Everything is keyed in the session ModelCache by path+mtime so a second
    generation re-reads NOTHING from disk (the reference keeps these
    resident between generations, src/Device/ModelCache.py:34-62; round 1
    re-read the 12B GGUF per image).

    ``spmd``: wrap the TP-loaded model in the shard_map forward
    (parallel.spmd) — same Megatron collectives, but the fused int8/W8A8
    Pallas kernels run per shard instead of the GSPMD dequant+dot."""
    from lightdiffusion_next_tpu.models import vae as vae_mod
    from lightdiffusion_next_tpu.models.clip import t5 as t5_mod
    from lightdiffusion_next_tpu.models.clip import text_encoder as te
    from lightdiffusion_next_tpu.ops import ggml
    from lightdiffusion_next_tpu.utils import state_dict as sd_utils

    cache = loader.get_model_cache()

    # a TP-sharded model is a different resident object than the single-chip
    # one; the variant keeps mtime-based staleness on the real path
    spmd = spmd and mesh is not None  # spmd wrap only exists on a mesh
    variant = "" if mesh is None else f"mesh{tuple(mesh.shape.values())}"
    if spmd:
        variant += ":spmd"
    w8a8 = _config.get_config().resolve_w8a8()
    if w8a8:
        variant += ":w8a8"
    # scan-over-blocks composes with single-device AND shard_map TP (the
    # stacked local shards scan per device); GSPMD TP keeps the unrolled
    # forward (its tp leaves bypass the scalar-prefetch kernels anyway)
    scan_blocks = (
        _config.get_config().resolve_flux_scan() and (mesh is None or spmd)
    )
    if _config.get_config().resolve_flux_scan() and not scan_blocks:
        import logging

        logging.getLogger(__name__).warning(
            "flux_scan has no effect under GSPMD tensor parallelism; "
            "set LDT_FLUX_TP=spmd to scan stacked shards per device"
        )
    if scan_blocks:
        variant += ":scan"
    # fused-prologue attention permutes the resident weights' RoPE basis
    # (single-device loads — unrolled or scan-stacked — and the shard_map
    # TP load, which permutes before the head interleave); key the variant
    # so a toggle flip never reuses the other basis
    if _config.get_config().resolve_fused_attn() and (mesh is None or spmd):
        variant += ":fusedattn"
    model = cache.get(unet_path, variant=variant)
    if model is None:
        # one resident DiT at a time: a second 12B variant (w8a8 toggle /
        # TP-mode flip) alongside the first is ~26 GB vs 16 GB HBM
        cache.evict_other_variants(unet_path, keep_variant=variant)
        # under spmd the w8a8 conversion happens AFTER the local-view wrap
        # (the loader skips tp=True leaves by design)
        model = loader.load_diffusion_model_gguf(
            unet_path, mesh=mesh, w8a8=w8a8 and not spmd,
            scan_blocks=scan_blocks and mesh is None, spmd=spmd,
        )
        if spmd:
            from lightdiffusion_next_tpu.parallel import spmd as spmd_mod

            try:
                model = spmd_mod.to_spmd_model(
                    model, mesh, scan_blocks=scan_blocks
                )
                if w8a8:
                    model = model.with_params(ggml.to_w8a8(model.params))
            except ValueError as e:
                # e.g. num_heads not divisible by the model axis (24 heads
                # on a 16-way mesh): keep serving on the GSPMD path rather
                # than failing the generation
                if getattr(
                    getattr(model, "config", None), "fused_attn", False
                ):
                    # permuted-basis weights REQUIRE the shard_map fused
                    # kernel; a GSPMD fallback would serve wrong numerics
                    # (the loader pre-validates head divisibility, so this
                    # is a should-never-happen guard, not a flow)
                    raise
                import logging

                logging.getLogger(__name__).warning(
                    "LDT_FLUX_TP=spmd unavailable (%s); falling back to "
                    "GSPMD TP", e,
                )
        model = model.with_options(fbcache=fb_mod.FBCacheConfig(0.120))
        cache.put(unet_path, model, variant=variant)

    vae = cache.get(ae_path)
    if vae is None:
        ae_sd = sd_utils.convs_to_hwio(sd_utils.load_torch_file(ae_path))
        vae = vae_mod.VAE(ae_sd, cfg=vae_mod.detect_vae_config(ae_sd))
        cache.put(ae_path, vae)

    # the scan toggle re-layouts T5 too (24 identical encoder blocks);
    # variant-keyed so a toggle flip never reuses the other layout
    t5_scan = _config.get_config().resolve_flux_scan()
    t5_variant = "scan" if t5_scan else ""
    t5_model = cache.get(t5_path, variant=t5_variant)
    if t5_model is None:
        import jax.numpy as jnp

        cache.evict_other_variants(t5_path, keep_variant=t5_variant)
        t5_params = ggml.to_device_quantized(ggml.gguf_clip_loader(t5_path))
        t5_model = t5_mod.T5XXLModel(
            t5_params,
            cfg=t5_mod.detect_config(t5_params),
            compute_dtype=jnp.bfloat16,
            scan_blocks=t5_scan,
        )
        cache.put(t5_path, t5_model, variant=t5_variant)

    clip_model = cache.get(clip_l_path)
    if clip_model is None:
        clip_model = te.SDClipModel(sd_utils.load_torch_file(clip_l_path))
        cache.put(clip_l_path, clip_model)

    return model, vae, t5_model, clip_model


def _flux_txt2img(prompt, w, h, batch, autohdr, saver, progress_callback):
    import jax.numpy as jnp

    downloader.check_and_download_flux()

    unet_path = downloader.asset_path("unet", "flux1-dev-Q8_0.gguf")
    t5_path = downloader.asset_path("clip", "t5-v1_1-xxl-encoder-Q8_0.gguf")
    clip_l_path = downloader.asset_path("clip", "clip_l.safetensors")
    ae_path = downloader.asset_path("vae", "ae.safetensors")
    for p in (unet_path, t5_path, clip_l_path, ae_path):
        if not os.path.exists(p):
            raise FileNotFoundError(f"flux asset missing: {p}")

    # multi-chip: shard the 12B DiT tensor-parallel over every device
    # (pure-TP (1, N) mesh). LDT_FLUX_TP: "auto" = GSPMD TP, "spmd" =
    # shard_map TP (fused Pallas kernels per shard, parallel/spmd.py),
    # "off" = force single-chip.
    tp_mode = os.environ.get("LDT_FLUX_TP", "auto")
    if tp_mode not in ("auto", "spmd", "off"):
        raise ValueError(
            f"LDT_FLUX_TP={tp_mode!r}: must be auto (GSPMD TP), spmd "
            "(shard_map TP) or off (single chip)"
        )
    mesh = None
    if tp_mode != "off":
        import jax

        if len(jax.devices()) > 1:
            from lightdiffusion_next_tpu.parallel import inference as par_inf

            mesh = par_inf.inference_mesh(n_model=len(jax.devices()))

    model, vae, t5_model, clip_model = _get_flux_models(
        unet_path, t5_path, clip_l_path, ae_path, mesh=mesh,
        spmd=(tp_mode == "spmd"),
    )

    # dual text encode (CLIPTextEncodeFlux, Quantizer.py:960-991)
    positive = encode_flux_conditioning(
        prompt, prompt, guidance=3.0, t5_model=t5_model, clip_model=clip_model
    )
    negative = dataclasses.replace(  # ConditioningZeroOut (Quantizer.py:993)
        positive,
        cross_attn=jnp.zeros_like(positive.cross_attn),
        pooled=jnp.zeros_like(positive.pooled),
    )

    latent = latent_mod.empty_latent(w, h, batch, channels=16)
    result = ks.ksample(
        model,
        seed=random.randint(1, 2**63 - 1),
        steps=20,
        cfg_scale=1.0,
        sampler_name="euler_cfgpp",
        scheduler="beta",
        positive=positive,
        negative=negative,
        latent_image=latent,
        denoise=1.0,
        callback=_resolve_callback(
            progress_callback, latent_mod.FLUX1, 20,
            "diffusion_pytorch_model.safetensors",  # taef1
        ),
    )
    decoded = vae.decode(result.latent)
    if autohdr:
        # device->device HDR; only the final result crosses to host
        images = hdr_mod.apply_hdr_batch(decoded)
    else:
        images = np.asarray(decoded)
    return saver.save_images(images, "Flux/LD", prompt=prompt)


def encode_flux_conditioning(
    clip_l_text: str,
    t5xxl_text: str,
    guidance: float = 3.0,
    t5_model=None,
    clip_model=None,
    t5_path: Optional[str] = None,
    clip_l_path: Optional[str] = None,
) -> cfg_mod.CondInput:
    """FluxClipModel.encode_token_weights parity (FluxClip.py:704-755):
    T5 sequence as cross-attn context + CLIP-L projected pooled vector.
    Pass resident models (``t5_model``/``clip_model``, from
    _get_flux_models); the path arguments load-on-the-spot for one-shot
    callers."""
    import jax.numpy as jnp

    from lightdiffusion_next_tpu.models.clip import t5 as t5_mod
    from lightdiffusion_next_tpu.models.clip import text_encoder as te
    from lightdiffusion_next_tpu.models.clip import tokenizer as tok
    from lightdiffusion_next_tpu.ops import ggml
    from lightdiffusion_next_tpu.utils import state_dict as sd_utils

    if clip_model is None:
        clip_model = te.SDClipModel(sd_utils.load_torch_file(clip_l_path))
    if t5_model is None:
        t5_params = ggml.to_device_quantized(ggml.gguf_clip_loader(t5_path))
        t5_model = t5_mod.T5XXLModel(
            t5_params,
            cfg=t5_mod.detect_config(t5_params),
            compute_dtype=jnp.bfloat16,
        )

    # CLIP-L pooled
    bpe = tok.SDTokenizer()
    clip_rows = bpe.tokenize_with_weights(clip_l_text)
    _, pooled = clip_model.encode_token_weights(clip_rows)

    # T5 sequence (min_length 256, no max padding — T5XXLTokenizer parity)
    t5_tok = flux_t5_tokenize(t5xxl_text)
    t5_out, _ = t5_model.encode_token_weights([t5_tok])

    return cfg_mod.CondInput(
        cross_attn=jnp.asarray(t5_out),
        pooled=jnp.asarray(pooled),
        guidance=guidance,
    )


def flux_t5_tokenize(text: str, min_length: int = 256):
    """T5 tokenization (T5XXLTokenizer parity, FluxClip.py:593-644): pad
    with zeros to min_length, end token 1, NO maximum — the reference sets
    max_length=99999999 (FluxClip.py:612), so a long prompt keeps its full
    sequence (the jitted encoder/DiT retrace per distinct long length;
    <=255-token prompts all share the 256 bucket).

    The T5 tokenizer JSON is VENDORED under assets/tokenizer/t5 (public
    vocabulary data, same status as the vendored CLIP vocab — the reference
    vendors the identical file at src/clip/clip/t5_tokenizer). A user-
    provided asset-root copy takes precedence. Without any tokenizer this
    raises — hash-tokenized prompts produce garbage conditioning — unless
    LDT_ALLOW_DEGRADED_TOKENIZER=1 explicitly opts into the fallback."""
    ids = _t5_encode_ids(text)
    if ids and ids[-1] == 1:  # tokenizer post-processor already added </s>
        ids = ids[:-1]
    ids = ids + [1]
    row = [(t, 1.0) for t in ids]
    row += [(0, 1.0)] * (min_length - len(row))
    return row


def _t5_encode_ids(text: str):
    candidates = [
        os.path.join(_config.asset_root(), "clip", "t5_tokenizer.json"),
        _config.repo_asset("tokenizer", "t5", "tokenizer.json"),
    ]
    for tok_json in candidates:
        if os.path.exists(tok_json):
            try:
                from tokenizers import Tokenizer

                return Tokenizer.from_file(tok_json).encode(text).ids
            except Exception:
                continue
    spiece = os.path.join(_config.asset_root(), "clip", "spiece.model")
    if os.path.exists(spiece):
        try:
            import sentencepiece as spm

            sp = spm.SentencePieceProcessor(model_file=spiece)
            return list(sp.encode(text))
        except Exception:
            pass
    if os.environ.get("LDT_ALLOW_DEGRADED_TOKENIZER") == "1":
        import logging

        logging.warning(
            "T5 tokenizer assets unavailable; using DEGRADED hash tokenizer"
        )
        return [abs(hash(tk)) % 32000 for tk in text.lower().split()]
    raise RuntimeError(
        "no T5 tokenizer available (looked for the vendored "
        "assets/tokenizer/t5/tokenizer.json, <asset_root>/clip/"
        "t5_tokenizer.json and spiece.model). Set "
        "LDT_ALLOW_DEGRADED_TOKENIZER=1 to force the hash fallback."
    )
