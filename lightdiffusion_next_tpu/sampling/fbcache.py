"""First-block residual cache (WaveSpeed FBCache) as traced scan state.

Counterpart of src/WaveSpeed/first_block_cache.py + fbcache_nodes.py:
- residual similarity test: mean|r - r_prev| / mean|r_prev| < threshold
  (are_two_tensors_similar, first_block_cache.py:106-112)
- on hit, skip ALL remaining blocks and re-apply the cached final residual
  (apply_prev_hidden_states_residual, :116-134)
- sigma window + max-consecutive-hits validation (fbcache_nodes.py:24-75)
- shape-change invalidation: state is re-initialized whenever the model-call
  resolution changes (multi-scale segments), matching the reference's
  cache-reset on shape mismatch.

TPU design (SURVEY §7): the cache is explicit scan-carry state
(prev_first_residual, cached_residual, consecutive_hits, valid); the hit/miss
decision is a ``lax.cond`` between "run remaining blocks" and "add cached
residual" — both branches trace once, only one executes per step.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class FBCacheConfig:
    """ApplyFBCacheOnModel.patch inputs (fbcache_nodes.py:10-111)."""

    residual_diff_threshold: float = 0.12
    start: float = 0.0  # percent of sampling where caching becomes active
    end: float = 1.0
    max_consecutive_cache_hits: int = -1  # <0: unlimited

    def sigma_window(self, model_sampling) -> Tuple[float, float]:
        """(sigma_start, sigma_end): cache valid while
        sigma_end < sigma <= sigma_start (fbcache_nodes.py:24-46)."""
        sigma_start = model_sampling.percent_to_sigma(self.start)
        sigma_end = model_sampling.percent_to_sigma(self.end)
        return float(sigma_start), float(sigma_end)


class FBCacheState(NamedTuple):
    prev_first_residual: Any
    cached_residual: Any
    consecutive_hits: Any  # int32 scalar
    valid: Any  # bool scalar — a prev residual exists


def init_state(first_shape, residual_shape, dtype=jnp.float32) -> FBCacheState:
    return FBCacheState(
        prev_first_residual=jnp.zeros(first_shape, dtype),
        cached_residual=jnp.zeros(residual_shape, dtype),
        consecutive_hits=jnp.zeros((), jnp.int32),
        valid=jnp.zeros((), jnp.bool_),
    )


def make_hook(state_box, cfg: FBCacheConfig, gate):
    """Build a first_block_hook closure.

    ``state_box`` is a single-element list holding the FBCacheState for the
    current traced call; the hook replaces it with the new state (pure
    functional dataflow — the box only orders values during tracing).
    ``gate``: traced bool scalar — sigma-window validity for this step.
    """

    def hook(h_prev, h_first, run_rest):
        state: FBCacheState = state_box[0]
        first_residual = (h_first - h_prev).astype(jnp.float32)

        mean_diff = jnp.mean(
            jnp.abs(first_residual - state.prev_first_residual)
        )
        mean_prev = jnp.mean(jnp.abs(state.prev_first_residual))
        diff = mean_diff / jnp.maximum(mean_prev, 1e-12)
        similar = diff < cfg.residual_diff_threshold

        hits_ok = (
            (state.consecutive_hits < cfg.max_consecutive_cache_hits)
            if cfg.max_consecutive_cache_hits >= 0
            else jnp.asarray(True)
        )
        can_use = jnp.logical_and(
            jnp.logical_and(state.valid, similar),
            jnp.logical_and(hits_ok, gate),
        )

        def hit(_):
            h = h_first + state.cached_residual.astype(h_first.dtype)
            return h, FBCacheState(
                prev_first_residual=state.prev_first_residual,
                cached_residual=state.cached_residual,
                consecutive_hits=state.consecutive_hits + 1,
                valid=jnp.asarray(True),
            )

        def miss(_):
            h = run_rest(h_first)
            residual = (h - h_first).astype(jnp.float32)
            return h, FBCacheState(
                prev_first_residual=first_residual,
                cached_residual=residual,
                consecutive_hits=jnp.zeros((), jnp.int32),
                valid=jnp.asarray(True),
            )

        h, new_state = jax.lax.cond(can_use, hit, miss, None)
        state_box[0] = new_state
        return h

    # expose the side channel: a wrapper that re-scopes the model call
    # (parallel.spmd's shard_map body) must return the new state as an
    # explicit output and re-stash it here, or the write above leaks a
    # body tracer into the outer trace
    hook.state_box = state_box
    return hook


class FBCachedDenoiser:
    """Stateful denoiser: wraps a cfg-denoiser factory so the model call runs
    with the FBCache hook and the cache state threads through the sampler
    loop (samplers.sample detects ``init_state``). Params stay explicit
    (``call_with``) so sampler jits take them as arguments — see
    cfg.CFGDenoiser for why."""

    def __init__(
        self,
        make_denoise_fn_with_hook,  # (hook_factory) -> fn(bundle, x, sigma)
        cfg: FBCacheConfig,
        model_sampling,
        state_shapes_fn,  # (x) -> (first_shape, residual_shape)
        jit_args,
        cache_key,
    ):
        self._make = make_denoise_fn_with_hook
        self.cfg = cfg
        self.sigma_start, self.sigma_end = cfg.sigma_window(model_sampling)
        self._shapes_fn = state_shapes_fn
        self.jit_args = jit_args
        self.cache_key = cache_key

        # pure function for the sampler runner cache: closes over the
        # factory + statics only, never over self (whose .jit_args holds
        # the param pytree) — see cfg.CFGDenoiser.pure_fn
        make = make_denoise_fn_with_hook
        sigma_start, sigma_end = self.sigma_start, self.sigma_end

        def pure_fn(ja, x, sigma, state: FBCacheState):
            sig = jnp.max(jnp.asarray(sigma))
            gate = jnp.logical_and(sig <= sigma_start, sig >= sigma_end)
            box = [state]
            fn = make(lambda: make_hook(box, cfg, gate))
            den, unc = fn(ja, x, sigma)
            return den, unc, box[0]

        self.pure_fn = pure_fn

    def init_state(self, x) -> FBCacheState:
        first_shape, residual_shape = self._shapes_fn(x)
        return init_state(first_shape, residual_shape)

    def call_with(self, jit_args, x, sigma, state: FBCacheState):
        return self.pure_fn(jit_args, x, sigma, state)

    def __call__(self, x, sigma, state: FBCacheState):
        return self.pure_fn(self.jit_args, x, sigma, state)


def for_model(
    model,  # models.base.DiffusionModel
    cond,
    uncond,
    cfg_scale: float,
    fb_cfg: FBCacheConfig = FBCacheConfig(),
) -> FBCachedDenoiser:
    """ApplyFBCacheOnModel.patch analog (fbcache_nodes.py:10-111): produce a
    stateful CFG denoiser with the cache installed at the model's first-block
    boundary."""
    from lightdiffusion_next_tpu.sampling import cfg as cfg_mod

    batched_uncond = uncond is not None and (
        abs(cfg_scale - 1.0) > 1e-9
        or model.model_options.get("disable_cfg1_optimization", False)
    )
    has_pooled = cond.pooled is not None and (
        not batched_uncond or (uncond is not None and uncond.pooled is not None)
    )
    attn1_factory = model.model_options.get("attn1_override_factory")
    model_wrapper = model.model_options.get("model_function_wrapper")

    # bind locals — the make/shapes_fn closures end up referenced by the
    # denoiser's pure_fn, which cached sampler runners hold; capturing
    # `model` would pin its full param pytree
    apply_fn = model.apply_fn
    model_sampling = model.model_sampling
    model_type = model.model_type
    model_config = model.config

    def make(hook_factory):
        return cfg_mod.make_cfg_denoiser_fn(
            apply_fn,
            model_sampling,
            has_uncond=batched_uncond,
            has_pooled=has_pooled,
            guidance=cond.guidance,
            cond_scale=cfg_scale,
            model_wrapper=model_wrapper,
            first_block_hook=hook_factory(),
            attn1_override_factory=attn1_factory,
        )

    def shapes_fn(x):
        b = x.shape[0] * (2 if batched_uncond else 1)
        if model_type == "flux":
            hh, ww = x.shape[1] // 2, x.shape[2] // 2
            shape = (b, hh * ww, model_config.hidden_size)
        else:
            shape = (b, x.shape[1], x.shape[2], model_config.model_channels)
        return shape, shape

    bundle = cfg_mod.make_bundle(
        model.params, cond, uncond, batched_uncond, has_pooled
    )
    cache_key = (
        "fbcache",
        model.uid,  # monotonic trace identity; survives GC + id() reuse
        round(float(cfg_scale), 6),
        batched_uncond,
        has_pooled,
        None if cond.guidance is None else round(float(cond.guidance), 6),
        fb_cfg,
        id(attn1_factory) if attn1_factory is not None else None,
        id(model_wrapper) if model_wrapper is not None else None,
    )
    return FBCachedDenoiser(
        make, fb_cfg, model.model_sampling, shapes_fn, bundle, cache_key
    )
