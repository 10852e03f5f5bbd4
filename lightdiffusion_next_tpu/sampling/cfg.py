"""Classifier-free guidance denoiser construction.

Counterpart of src/sample/CFG.py (cfg_function/sampling_function/CFGGuider)
and src/cond/cond.py calc_cond_batch. TPU design: cond and uncond are
ALWAYS batched into one model call with static shapes (the reference packs
them dynamically based on free VRAM, cond.py:186-223 — under jit the batch
is a compile-time constant so the packer is deleted, per SURVEY §7).

Compilation discipline (critical on TPU):
- ALL large arrays (weights AND conditioning) travel through the denoiser's
  ``jit_args`` bundle and are passed to jit as ARGUMENTS. Arrays captured as
  trace closure constants are embedded in the lowered HLO — for SD1.5 that
  turned a 38 s compile into a >25-minute one.
- Each denoiser exposes ``cache_key``, a hashable token covering every
  trace-relevant STATIC (model identity, cfg scale, hook configs), so the
  sampler loop can reuse one compiled program across calls that differ only
  in data (e.g. UltimateSDUpscale running 30+ tiles).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from lightdiffusion_next_tpu import config as _config


@dataclasses.dataclass
class CondInput:
    """One conditioning entry: cross-attention context + optional pooled/adm
    vector and extra model kwargs (CONDRegular/CONDCrossAttn analog,
    src/cond/cond.py:8-128)."""

    cross_attn: Any  # (1 or B, L, ctx_dim)
    pooled: Optional[Any] = None
    guidance: Optional[float] = None  # Flux distilled guidance


def _ctx_for_batch(c, batch: int):
    c = jnp.asarray(c)
    if c.shape[0] == 1 and batch > 1:
        c = jnp.repeat(c, batch, axis=0)
    return c


def pad_cross_attn_to_match(a, b):
    """CONDCrossAttn.concat parity (cond.py:100-127): pad the shorter context
    to the LCM token length by repeating it."""
    la, lb = a.shape[1], b.shape[1]
    if la == lb:
        return a, b
    lcm = np.lcm(la, lb)
    if la < lcm:
        a = jnp.concatenate([a] * (lcm // la), axis=1)
    if lb < lcm:
        b = jnp.concatenate([b] * (lcm // lb), axis=1)
    return a, b


def cfg_result(cond_pred, uncond_pred, cond_scale: float):
    """cfg_function core (CFG.py:53-62): lerp(uncond, cond, scale), skipping
    the math at scale==1."""
    if uncond_pred is None or abs(cond_scale - 1.0) < 1e-9:
        return cond_pred
    return uncond_pred + (cond_pred - uncond_pred) * cond_scale


class CFGDenoiser:
    """Callable denoiser with explicit jit-argument bundle.

    ``den(x, sigma)`` binds ``den.jit_args``; jitted loops call
    ``den.call_with(jit_args, x, sigma)`` passing the bundle as a jit arg.
    ``pure_fn`` is the underlying ``(bundle, x, sigma)`` function for the
    sampler's runner cache to close over — it holds model CODE only, so a
    cached runner never pins the params bundle (samplers.sample)."""

    def __init__(self, fn, jit_args, cache_key):
        self._fn = fn
        self.pure_fn = fn
        self.jit_args = jit_args
        self.cache_key = cache_key

    def __call__(self, x, sigma):
        return self._fn(self.jit_args, x, sigma)

    def call_with(self, jit_args, x, sigma):
        return self._fn(jit_args, x, sigma)


def make_cfg_denoiser_fn(
    apply_model: Callable,
    model_sampling,
    has_uncond: bool,
    has_pooled: bool,
    guidance: Optional[float],
    cond_scale: float,
    model_wrapper: Optional[Callable] = None,
    first_block_hook: Optional[Callable] = None,
    attn1_override_factory: Optional[Callable] = None,
):
    """Build the pure fn ``(bundle, x, sigma) -> (cfg_denoised, uncond)``
    where bundle = {"params", "c_ctx", "u_ctx", "c_pool", "u_pool"}.

    Sequence: EPS input scaling -> timestep lookup -> batched cond/uncond
    forward -> EPS output scaling -> CFG lerp (sampling_function parity,
    CFG.py:86-162 + BaseModel.apply_model, ModelBase.py:72-152)."""

    def inner_apply(params, x, t, context, y=None, **extra):
        if first_block_hook is not None:
            extra["first_block_hook"] = first_block_hook
        if attn1_override_factory is not None:
            extra["attn1_override"] = attn1_override_factory(t)
        if model_wrapper is not None:
            return model_wrapper(
                lambda xx, tt, cc, yy: apply_model(params, xx, tt, cc, y=yy, **extra),
                x,
                t,
                context,
                y,
            )
        return apply_model(params, x, t, context, y=y, **extra)

    def denoise(bundle, x, sigma):
        params = bundle["params"]
        sigma = jnp.asarray(sigma)
        if sigma.ndim == 0:
            sigma = jnp.broadcast_to(sigma, (x.shape[0],))
        xin = model_sampling.calculate_input(sigma, x)
        t = model_sampling.timestep(sigma)

        batch = x.shape[0]
        c_ctx = _ctx_for_batch(bundle["c_ctx"], batch)
        extra = {}
        if guidance is not None:
            extra["guidance"] = jnp.full((batch,), guidance, dtype=jnp.float32)

        if has_uncond:
            u_ctx = _ctx_for_batch(bundle["u_ctx"], batch)
            c_ctx2, u_ctx2 = pad_cross_attn_to_match(c_ctx, u_ctx)
            ctx = jnp.concatenate([c_ctx2, u_ctx2], axis=0)
            xx = jnp.concatenate([xin, xin], axis=0)
            tt = jnp.concatenate([t, t], axis=0)
            y = None
            if has_pooled:
                c_pool = jnp.asarray(bundle["c_pool"])
                u_pool = jnp.asarray(bundle["u_pool"])
                y = jnp.concatenate(
                    [
                        jnp.broadcast_to(c_pool, (batch,) + c_pool.shape[-1:]),
                        jnp.broadcast_to(u_pool, (batch,) + u_pool.shape[-1:]),
                    ],
                    axis=0,
                )
            if "guidance" in extra:
                extra["guidance"] = jnp.concatenate(
                    [extra["guidance"], extra["guidance"]], axis=0
                )
            out = inner_apply(params, xx, tt, ctx, y=y, **extra)
            sigma2 = jnp.concatenate([sigma, sigma], axis=0)
            den = model_sampling.calculate_denoised(
                sigma2, out.astype(jnp.float32), jnp.concatenate([x, x], axis=0)
            )
            cond_pred, uncond_pred = den[:batch], den[batch:]
        else:
            y = None
            if has_pooled:
                c_pool = jnp.asarray(bundle["c_pool"])
                y = jnp.broadcast_to(c_pool, (batch,) + c_pool.shape[-1:])
            out = inner_apply(params, xin, t, c_ctx, y=y, **extra)
            den = model_sampling.calculate_denoised(
                sigma, out.astype(jnp.float32), x
            )
            cond_pred, uncond_pred = den, None

        cfg_denoised = cfg_result(cond_pred, uncond_pred, cond_scale)
        return cfg_denoised, (
            uncond_pred if uncond_pred is not None else cfg_denoised
        )

    return denoise


def make_bundle(
    params,
    cond: CondInput,
    uncond: Optional[CondInput],
    use_uncond: bool,
    has_pooled: bool,
):
    bundle = {"params": params, "c_ctx": jnp.asarray(cond.cross_attn)}
    if use_uncond:
        bundle["u_ctx"] = jnp.asarray(uncond.cross_attn)
    if has_pooled:
        bundle["c_pool"] = jnp.asarray(cond.pooled)
        if use_uncond:
            bundle["u_pool"] = jnp.asarray(uncond.pooled)
    return bundle


def make_cfg_denoiser(
    apply_model: Callable,
    params: Dict,
    model_sampling,
    cond: CondInput,
    uncond: Optional[CondInput],
    cond_scale: float,
    latent_format=None,
    model_wrapper: Optional[Callable] = None,
    disable_cfg1_optimization: bool = False,
    first_block_hook: Optional[Callable] = None,
    attn1_override_factory: Optional[Callable] = None,
    model_uid: Optional[int] = None,
) -> CFGDenoiser:
    """CFGGuider-product denoiser (CFG.py:164-357 analog).

    ``model_uid`` (DiffusionModel.uid) is the model's monotonic trace
    identity; pass it whenever available so runner-cache keys survive model
    GC + id() reuse. The remaining id() components (wrapper/hook/factory)
    are safe as-is: every cached runner's closure holds those callables
    alive, so an id cannot be recycled while a cache entry keyed by it
    exists."""
    use_uncond = uncond is not None and (
        abs(cond_scale - 1.0) > 1e-9 or disable_cfg1_optimization
    )
    has_pooled = cond.pooled is not None and (
        not use_uncond or (uncond is not None and uncond.pooled is not None)
    )
    fn = make_cfg_denoiser_fn(
        apply_model,
        model_sampling,
        has_uncond=use_uncond,
        has_pooled=has_pooled,
        guidance=cond.guidance,
        cond_scale=cond_scale,
        model_wrapper=model_wrapper,
        first_block_hook=first_block_hook,
        attn1_override_factory=attn1_override_factory,
    )
    bundle = make_bundle(params, cond, uncond, use_uncond, has_pooled)
    cache_key = (
        "cfg",
        model_uid
        if model_uid is not None
        else (id(apply_model), id(model_sampling)),
        round(float(cond_scale), 6),
        use_uncond,
        has_pooled,
        None if cond.guidance is None else round(float(cond.guidance), 6),
        id(model_wrapper) if model_wrapper is not None else None,
        id(first_block_hook) if first_block_hook is not None else None,
        id(attn1_override_factory) if attn1_override_factory is not None else None,
        # global-config flags consulted at TRACE time (sage attention /
        # attention backend): without this token a WebUI-style set_config
        # flip between generations would silently reuse the previous
        # mode's compiled runner (jit sees identical arguments)
        _config.trace_token(),
    )
    return CFGDenoiser(fn, bundle, cache_key)
