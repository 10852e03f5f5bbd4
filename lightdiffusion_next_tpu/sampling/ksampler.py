"""KSampler facade: the unified sampling entry.

Counterpart of src/sample/sampling.py:500-1233 (KSampler / ksampler /
common_ksampler / sample1 / sample_custom) and the CFGGuider orchestration
(src/sample/CFG.py:164-357). One function, ``ksample``, does what the
reference's five nested layers do:

    schedule -> denoise slicing -> noise scaling -> CFG denoiser ->
    sampler loop -> inverse noise scaling -> latent process_out

All host-side prep (schedules, noise) is numpy; the loop itself is jitted
(sampling.samplers).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import jax.numpy as jnp
import numpy as np

from lightdiffusion_next_tpu import config as _config
from lightdiffusion_next_tpu.models.base import DiffusionModel
from lightdiffusion_next_tpu.sampling import cfg as cfg_mod
from lightdiffusion_next_tpu.sampling import noise as noise_mod
from lightdiffusion_next_tpu.sampling import samplers as samplers_mod
from lightdiffusion_next_tpu.sampling import schedules

SAMPLERS = samplers_mod.SAMPLER_NAMES
SCHEDULERS = schedules.SCHEDULERS

# NOTE: the reference's sampler signatures carry their own multi-scale
# fullres defaults (e.g. 5/8 for dpmpp_2m, samplers.py:755-775), but its
# pipeline always passes pipeline-level values down (pipeline.py:52-53 ->
# sampling.py:884-885), so those signature defaults are unreachable in the
# product. We keep only the pipeline-level defaults (MultiScale dataclass).


# Pre/post latent-scaling programs, cached by (model_sampling class,
# latent format, max_denoise). noise_scaling / inverse_noise_scaling /
# process_in / process_out are stateless formulas (EPS/CONST read only
# class attributes; LatentFormat is a frozen dataclass), so keying by TYPE
# and closing over the first instance seen is behavior-safe. Jitting them
# turns ~8 eager elementwise dispatches per ksample into 2 compiled calls
# — a fixed ~0.1-0.3 s/image over a relay-attached TPU, multiplied by the
# per-tile ksample loops in USDU/ADetailer.
_SCALING_CACHE: Dict = {}


def _scaling_runners(msampling, lf, max_denoise: bool):
    import jax

    key = (type(msampling), lf, bool(max_denoise))
    if key not in _SCALING_CACHE:

        def pre(sigma0, noise, latent_image):
            latent_in = lf.process_in(latent_image)
            x = msampling.noise_scaling(
                sigma0, noise, latent_in, max_denoise=max_denoise
            )
            return x, latent_in

        def post(sigma_last, out):
            raw = msampling.inverse_noise_scaling(sigma_last, out)
            return lf.process_out(raw), raw

        _SCALING_CACHE[key] = (jax.jit(pre), jax.jit(post))
    return _SCALING_CACHE[key]


def sigmas_for(
    model_sampling,
    scheduler: str,
    steps: int,
    denoise: float = 1.0,
) -> np.ndarray:
    """Schedule + denoise<1 slicing (KSampler.set_steps parity,
    sampling.py:659-700): denoise keeps the LAST steps+1 sigmas of a longer
    schedule."""
    if denoise is None or denoise > 0.9999:
        return schedules.calculate_sigmas(model_sampling, scheduler, steps)
    if denoise <= 0.0:
        return np.zeros((0,), dtype=np.float32)
    new_steps = int(steps / denoise)
    sigmas = schedules.calculate_sigmas(model_sampling, scheduler, new_steps)
    return sigmas[-(steps + 1) :]


def trim_sigmas(
    sigmas: np.ndarray,
    start_step: Optional[int] = None,
    last_step: Optional[int] = None,
    force_full_denoise: bool = False,
) -> np.ndarray:
    """start/last-step trimming (sample1 parity, sampling.py:891-990)."""
    sigmas = np.asarray(sigmas)
    if last_step is not None and last_step < (len(sigmas) - 1):
        sigmas = sigmas[: last_step + 1].copy()
        if force_full_denoise:
            sigmas[-1] = 0
    if start_step is not None:
        if start_step < (len(sigmas) - 1):
            sigmas = sigmas[start_step:]
        else:
            return sigmas[:0]
    return sigmas


@dataclasses.dataclass
class KSampleResult:
    latent: jnp.ndarray  # decoded-format latent (process_out applied)
    raw: jnp.ndarray  # model-space latent


class _MaskedDenoiser:
    """Masked latent blending (+ optional DifferentialDiffusion threshold,
    src/AutoDetailer/ADetailer.py:15-58). Mask and base latent travel in
    jit_args so the compiled sampler loop is reusable across calls.

    ``pure_fn`` (when the inner denoiser exposes one) closes over code and
    scalar statics only — cached sampler runners must not pin the param
    bundle (see cfg.CFGDenoiser). Reduced-resolution model calls
    (multiscale low-res segments, dy half-res extra steps) blend against
    the mask/base resized to the call shape."""

    def __init__(self, inner, mask, base, msampling, sigma_start, differential):
        self._inner = inner
        self._stateful = hasattr(inner, "init_state")
        if self._stateful:
            self.init_state = inner.init_state
        ts_from = ts_to = None
        if differential:
            ts_from = float(msampling.timestep(jnp.asarray(sigma_start)))
            ts_to = float(msampling.timestep(jnp.asarray(msampling.sigma_min)))
        inner_args = getattr(inner, "jit_args", None)
        self.jit_args = {"inner": inner_args, "mask": mask, "base": base}
        inner_key = getattr(inner, "cache_key", None)
        # _ts_from/_ts_to are trace CONSTANTS baked into the compiled
        # runner; they derive from sigma_start (denoise slicing), so two
        # runs differing only in denoise must not share a runner
        self.cache_key = (
            None
            if inner_key is None
            else (
                "masked",
                inner_key,
                differential,
                round(ts_from, 6) if differential else None,
                round(ts_to, 6) if differential else None,
            )
        )

        timestep_fn = msampling.timestep
        stateful = self._stateful
        inner_pure = getattr(inner, "pure_fn", None)

        def mask_at(ja, sig, hw):
            m = ja["mask"]
            base_l = ja["base"]
            if tuple(m.shape[1:3]) != tuple(hw):
                from lightdiffusion_next_tpu.ops import nn

                m = nn.interpolate_bilinear(m, hw)
                base_l = nn.interpolate_bilinear(base_l, hw)
            if differential:
                ts_cur = timestep_fn(jnp.max(jnp.asarray(sig)))
                thr = (ts_cur - ts_to) / max(ts_from - ts_to, 1e-9)
                m = (m >= thr).astype(jnp.float32)
            return m, base_l

        if inner_pure is not None and stateful:

            def pure_fn(ja, x, sig, state):
                den, unc, state = inner_pure(ja["inner"], x, sig, state)
                m, base_l = mask_at(ja, sig, den.shape[1:3])
                return den * m + base_l * (1.0 - m), unc, state

        elif inner_pure is not None:

            def pure_fn(ja, x, sig):
                den, unc = inner_pure(ja["inner"], x, sig)
                m, base_l = mask_at(ja, sig, den.shape[1:3])
                return den * m + base_l * (1.0 - m), unc

        else:
            pure_fn = None
        self.pure_fn = pure_fn
        self._mask_at = mask_at

    def call_with(self, ja, x, sig, state=None):
        if self.pure_fn is not None:
            if self._stateful:
                return self.pure_fn(ja, x, sig, state)
            return self.pure_fn(ja, x, sig)
        if self._stateful:
            if hasattr(self._inner, "call_with"):
                den, unc, state = self._inner.call_with(ja["inner"], x, sig, state)
            else:
                den, unc, state = self._inner(x, sig, state)
            m, base_l = self._mask_at(ja, sig, den.shape[1:3])
            return den * m + base_l * (1.0 - m), unc, state
        if hasattr(self._inner, "call_with"):
            den, unc = self._inner.call_with(ja["inner"], x, sig)
        else:
            den, unc = self._inner(x, sig)
        m, base_l = self._mask_at(ja, sig, den.shape[1:3])
        return den * m + base_l * (1.0 - m), unc

    def __call__(self, x, sig, state=None):
        if self._stateful:
            return self.call_with(self.jit_args, x, sig, state)
        return self.call_with(self.jit_args, x, sig)


def ksample(
    model: DiffusionModel,
    *,
    seed: int,
    steps: int,
    cfg_scale: float,
    sampler_name: str,
    scheduler: str,
    positive: cfg_mod.CondInput,
    negative: Optional[cfg_mod.CondInput],
    latent_image,  # NHWC latent (decoded-format, e.g. VAE output / zeros)
    denoise: float = 1.0,
    start_step: Optional[int] = None,
    last_step: Optional[int] = None,
    force_full_denoise: bool = False,
    disable_noise: bool = False,
    denoise_mask=None,  # NHWC [0,1] mask; 1 = resample, 0 = keep
    ms: Optional[samplers_mod.MultiScale] = None,
    sampler_opts: Optional[samplers_mod.SamplerOptions] = None,
    callback: Optional[Callable] = None,
    sigmas_override: Optional[np.ndarray] = None,
    model_wrapper: Optional[Callable] = None,
    fbcache=None,  # sampling.fbcache.FBCacheConfig
    differential_diffusion: bool = False,
):
    """common_ksampler + CFGGuider.sample parity (sampling.py:1142,
    CFG.py:296-357). Returns latent in decoded (VAE) space."""
    cfgv = _config.get_config()
    lf = model.latent_format
    msampling = model.model_sampling
    sampler_name = samplers_mod.SAMPLER_ALIASES.get(sampler_name, sampler_name)

    if sigmas_override is not None:
        sigmas = np.asarray(sigmas_override, dtype=np.float32)
    else:
        sigmas = sigmas_for(msampling, scheduler, steps, denoise)
    sigmas = trim_sigmas(sigmas, start_step, last_step, force_full_denoise)
    if len(sigmas) < 2:
        return KSampleResult(latent=latent_image, raw=lf.process_in(latent_image))

    n_steps = len(sigmas) - 1
    shape = tuple(latent_image.shape)

    # --- noise (host, seed-deterministic; ksampler_util.prepare_noise) ---
    if disable_noise:
        init_noise = np.zeros(shape, dtype=np.float32)
    else:
        init_noise = noise_mod.prepare_noise(shape, seed, mode=cfgv.rng_mode)

    ancestral = sampler_name in (
        "euler_ancestral",
        "euler_ancestral_cfg_pp",
        "euler_ancestral_dy_cfg_pp",
    )
    step_noise = None
    sde_noise = None
    # ksample's cfg_scale is authoritative: inject it into caller-provided
    # options so the sampler-side CFG schedule (true_cfgpp momentum weights)
    # can't silently diverge from the denoiser's cond/uncond lerp
    opts = (
        dataclasses.replace(sampler_opts, cfg_scale=cfg_scale)
        if sampler_opts is not None
        else samplers_mod.SamplerOptions(cfg_scale=cfg_scale)
    )
    if ancestral:
        step_noise = noise_mod.step_noise_batch(
            shape, n_steps, seed, mode=cfgv.rng_mode
        )
    if sampler_name in ("dpmpp_sde", "dpmpp_sde_cfgpp"):
        sde_noise = noise_mod.sde_noise_for_steps(
            shape, sigmas, r=opts.r, eta=opts.eta, seed=seed, mode=cfgv.rng_mode
        )

    # --- latent into model space + noise scaling (CFG.py:318-346) ---
    max_denoise = (
        abs(float(msampling.sigma_max) - float(sigmas[0])) < 1e-4
        or float(sigmas[0]) > float(msampling.sigma_max)
    )
    pre_fn, post_fn = _scaling_runners(msampling, lf, max_denoise)
    x, latent_in = pre_fn(
        jnp.asarray(sigmas[0]),
        jnp.asarray(init_noise),
        jnp.asarray(latent_image, dtype=jnp.float32),
    )

    # --- CFG denoiser (optionally FBCache-wrapped) ---
    fbcache = fbcache or model.model_options.get("fbcache")
    if fbcache is not None:
        from lightdiffusion_next_tpu.sampling import fbcache as fb_mod

        denoise_fn = fb_mod.for_model(
            model, positive, negative, cfg_scale, fbcache
        )
    else:
        denoise_fn = cfg_mod.make_cfg_denoiser(
            model.apply_fn,
            model.params,
            msampling,
            positive,
            negative,
            cfg_scale,
            model_wrapper=model_wrapper
            or model.model_options.get("model_function_wrapper"),
            disable_cfg1_optimization=model.model_options.get(
                "disable_cfg1_optimization", False
            ),
            attn1_override_factory=model.model_options.get(
                "attn1_override_factory"
            ),
            model_uid=model.uid,
        )

    if denoise_mask is not None:
        run_denoise = _MaskedDenoiser(
            denoise_fn,
            jnp.asarray(denoise_mask, dtype=jnp.float32),
            latent_in,
            msampling,
            float(sigmas[0]),
            differential_diffusion,
        )
    else:
        run_denoise = denoise_fn

    if ms is None:
        ms = samplers_mod.MultiScale()

    out = samplers_mod.sample(
        run_denoise,
        x,
        sigmas,
        sampler=sampler_name,
        ms=ms,
        step_noise=step_noise,
        sde_noise=sde_noise,
        opts=opts,
        callback=callback,
    )
    latent_out, raw = post_fn(jnp.asarray(sigmas[-1]), out)
    return KSampleResult(latent=latent_out, raw=raw)
