"""Classifier-free guidance denoiser construction.

Counterpart of src/sample/CFG.py (cfg_function/sampling_function/CFGGuider)
and src/cond/cond.py calc_cond_batch. TPU design: cond and uncond are
ALWAYS batched into one model call with static shapes (the reference packs
them dynamically based on free VRAM, cond.py:186-223 — under jit the batch
is a compile-time constant so the packer is deleted, per SURVEY §7).

The produced ``denoise_fn(x, sigma) -> (denoised, uncond_denoised)`` is pure
and traceable; sampler loops scan over it. Post/pre-CFG hooks are explicit
function parameters instead of mutable model_options lists.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class CondInput:
    """One conditioning entry: cross-attention context + optional pooled/adm
    vector and extra model kwargs (CONDRegular/CONDCrossAttn analog,
    src/cond/cond.py:8-128)."""

    cross_attn: Any  # (1 or B, L, ctx_dim)
    pooled: Optional[Any] = None
    guidance: Optional[float] = None  # Flux distilled guidance

    def context_for_batch(self, batch: int):
        c = jnp.asarray(self.cross_attn)
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
):
    """Build ``denoise(x, sigma) -> (cfg_denoised, uncond_denoised)``.

    ``apply_model(params, x, t, context, y=None, **extra)`` is the raw net.
    ``model_wrapper`` replaces the inner model call (FBCache / compile
    wrappers; set_model_unet_function_wrapper analog).

    Sequence: EPS input scaling -> timestep lookup -> batched cond/uncond
    forward -> EPS output scaling -> CFG lerp (sampling_function parity,
    CFG.py:86-162 + BaseModel.apply_model, ModelBase.py:72-152).
    """
    use_uncond = uncond is not None and (
        abs(cond_scale - 1.0) > 1e-9 or disable_cfg1_optimization
    )

    def inner_apply(x, t, context, y=None, **extra):
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

    def denoise(x, sigma):
        sigma = jnp.asarray(sigma)
        if sigma.ndim == 0:
            sigma = jnp.broadcast_to(sigma, (x.shape[0],))
        xin = model_sampling.calculate_input(sigma, x)
        t = model_sampling.timestep(sigma)

        batch = x.shape[0]
        c_ctx = cond.context_for_batch(batch)
        extra = {}
        if cond.guidance is not None:
            extra["guidance"] = jnp.full((batch,), cond.guidance, dtype=jnp.float32)

        if use_uncond:
            u_ctx = uncond.context_for_batch(batch)
            c_ctx2, u_ctx2 = pad_cross_attn_to_match(c_ctx, u_ctx)
            ctx = jnp.concatenate([c_ctx2, u_ctx2], axis=0)
            xx = jnp.concatenate([xin, xin], axis=0)
            tt = jnp.concatenate([t, t], axis=0)
            y = None
            if cond.pooled is not None and uncond.pooled is not None:
                y = jnp.concatenate(
                    [
                        jnp.broadcast_to(cond.pooled, (batch,) + cond.pooled.shape[-1:]),
                        jnp.broadcast_to(
                            uncond.pooled, (batch,) + uncond.pooled.shape[-1:]
                        ),
                    ],
                    axis=0,
                )
            if "guidance" in extra:
                extra["guidance"] = jnp.concatenate(
                    [extra["guidance"], extra["guidance"]], axis=0
                )
            out = inner_apply(xx, tt, ctx, y=y, **extra)
            sigma2 = jnp.concatenate([sigma, sigma], axis=0)
            den = model_sampling.calculate_denoised(
                sigma2, out.astype(jnp.float32), jnp.concatenate([x, x], axis=0)
            )
            cond_pred, uncond_pred = den[:batch], den[batch:]
        else:
            y = None
            if cond.pooled is not None:
                y = jnp.broadcast_to(cond.pooled, (batch,) + cond.pooled.shape[-1:])
            out = inner_apply(xin, t, c_ctx, y=y, **extra)
            den = model_sampling.calculate_denoised(
                sigma, out.astype(jnp.float32), x
            )
            cond_pred, uncond_pred = den, None

        cfg_denoised = cfg_result(cond_pred, uncond_pred, cond_scale)
        return cfg_denoised, (
            uncond_pred if uncond_pred is not None else cfg_denoised
        )

    return denoise
