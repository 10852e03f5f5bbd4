"""Sigma schedules and timestep embeddings.

Schedules are tiny, static, per-generation host computations — they are kept
in numpy float32/float64 (not traced) and fed to the jitted sampler as
constants, exactly the role they play in the reference
(src/sample/ksampler_util.py:244-271, src/sample/sampling_util.py:18-127).

Behavioral parity:
- ``get_sigmas_karras``   == sampling_util.get_sigmas_karras (rho=7)
- ``normal_scheduler``    == ksampler_util.normal_scheduler
- ``simple_scheduler``    == ksampler_util.simple_scheduler
- ``beta_scheduler``      == ksampler_util.beta_scheduler (arXiv 2407.12173)
- ``make_beta_schedule``  == sampling_util.make_beta_schedule ("linear" only,
  which is all the reference ever uses)
- ``timestep_embedding``  == sampling_util.timestep_embedding (cos|sin order)
- ``get_ancestral_step``  == sampling_util.get_ancestral_step
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np

try:  # scipy is baked in; guard anyway so non-beta schedules work without it
    import scipy.stats

    _HAVE_SCIPY = True
except Exception:  # pragma: no cover
    _HAVE_SCIPY = False


def append_zero(x: np.ndarray) -> np.ndarray:
    return np.concatenate([x, np.zeros((1,), dtype=x.dtype)])


def make_beta_schedule(
    n_timestep: int, linear_start: float = 1e-4, linear_end: float = 2e-2
) -> np.ndarray:
    """Linear-sqrt beta schedule (float64, as the reference computes it)."""
    return (
        np.linspace(linear_start**0.5, linear_end**0.5, n_timestep, dtype=np.float64)
        ** 2
    )


def sigmas_from_betas(betas: np.ndarray) -> np.ndarray:
    """sigma_t = sqrt((1-acum)/acum) — the EPS discrete sigma table."""
    alphas_cumprod = np.cumprod(1.0 - betas, axis=0)
    return np.sqrt((1.0 - alphas_cumprod) / alphas_cumprod).astype(np.float32)


def get_sigmas_karras(
    n: int, sigma_min: float, sigma_max: float, rho: float = 7.0
) -> np.ndarray:
    ramp = np.linspace(0, 1, n, dtype=np.float32)
    min_inv_rho = sigma_min ** (1 / rho)
    max_inv_rho = sigma_max ** (1 / rho)
    sigmas = (max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** rho
    return append_zero(sigmas.astype(np.float32))


class _SigmaTable:
    """Protocol shim: anything with .sigmas (ascending, len T), .timestep(),
    .sigma() works — satisfied by sampling.model_sampling objects."""


def normal_scheduler(model_sampling, steps: int) -> np.ndarray:
    s = model_sampling
    start = float(s.timestep(np.asarray(s.sigma_max, dtype=np.float32)))
    end = float(s.timestep(np.asarray(s.sigma_min, dtype=np.float32)))
    timesteps = np.linspace(start, end, steps, dtype=np.float32)
    sigs = [float(s.sigma(np.asarray(ts, dtype=np.float32))) for ts in timesteps]
    sigs.append(0.0)
    return np.asarray(sigs, dtype=np.float32)


def simple_scheduler(model_sampling, steps: int) -> np.ndarray:
    s = model_sampling
    sigs = []
    ss = len(s.sigmas) / steps
    for x in range(steps):
        sigs.append(float(s.sigmas[-(1 + int(x * ss))]))
    sigs.append(0.0)
    return np.asarray(sigs, dtype=np.float32)


def beta_scheduler(
    model_sampling, steps: int, alpha: float = 0.6, beta: float = 0.6
) -> np.ndarray:
    """Beta-distribution timestep spacing (arXiv 2407.12173)."""
    if not _HAVE_SCIPY:  # pragma: no cover
        raise RuntimeError("beta scheduler requires scipy")
    total_timesteps = len(model_sampling.sigmas) - 1
    ts_normalized = np.linspace(0, 1, steps, endpoint=False)
    ts_beta = scipy.stats.beta.ppf(1 - ts_normalized, alpha, beta)
    ts_indices = np.rint(ts_beta * total_timesteps).astype(np.int32)
    unique_ts, indices = np.unique(ts_indices, return_index=True)
    ordered_unique_ts = unique_ts[np.argsort(indices)]
    sigs = [float(model_sampling.sigmas[idx]) for idx in ordered_unique_ts]
    sigs.append(0.0)
    return np.asarray(sigs, dtype=np.float32)


SCHEDULERS = ("karras", "normal", "simple", "beta")


def calculate_sigmas(model_sampling, scheduler_name: str, steps: int) -> np.ndarray:
    """Unified schedule entry (ksampler_util.calculate_sigmas parity)."""
    if scheduler_name == "karras":
        return get_sigmas_karras(
            steps,
            sigma_min=float(model_sampling.sigma_min),
            sigma_max=float(model_sampling.sigma_max),
        )
    if scheduler_name == "normal":
        return normal_scheduler(model_sampling, steps)
    if scheduler_name == "simple":
        return simple_scheduler(model_sampling, steps)
    if scheduler_name == "beta":
        return beta_scheduler(model_sampling, steps)
    raise ValueError(f"invalid scheduler {scheduler_name!r}")


def get_ancestral_step(
    sigma_from: float, sigma_to: float, eta: float = 1.0
) -> Tuple[float, float]:
    """(sigma_down, sigma_up) split of an ancestral step."""
    if not eta:
        return sigma_to, 0.0
    sigma_up = min(
        sigma_to,
        eta
        * (sigma_to**2 * (sigma_from**2 - sigma_to**2) / sigma_from**2) ** 0.5,
    )
    sigma_down = (sigma_to**2 - sigma_up**2) ** 0.5
    return sigma_down, sigma_up


# ---------------------------------------------------------------------------
# Timestep embeddings (used inside jit; jnp)
# ---------------------------------------------------------------------------


def timestep_embedding(timesteps, dim: int, max_period: int = 10000):
    """Sinusoidal embedding, [cos|sin] order (sampling_util.timestep_embedding).

    ``timesteps``: (B,) float array. Returns (B, dim) float32.
    """
    import jax.numpy as jnp

    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(0, half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def timestep_embedding_flux(
    t, dim: int, max_period: int = 10000, time_factor: float = 1000.0
):
    """Flux variant: scales t by 1000 and zero-pads odd dims."""
    import jax.numpy as jnp

    t = time_factor * t.astype(jnp.float32)
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(0, half, dtype=jnp.float32) / half
    )
    args = t[:, None] * freqs[None]
    embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        embedding = jnp.concatenate(
            [embedding, jnp.zeros_like(embedding[:, :1])], axis=-1
        )
    return embedding
