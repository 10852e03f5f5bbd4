"""Model-sampling parameterizations: EPS (sigma-scaled) and CONST (rectified
flow), plus the discrete 1000-step sigma table and the Flux time-shift table.

TPU-first counterpart of src/sample/sampling.py:26-356. These objects are
plain Python holding small numpy tables; the per-call math (calculate_input /
calculate_denoised / noise_scaling) is jnp and traces into the jitted denoiser.

The sigma tables are host-side numpy so schedule construction never touches
the device; ``timestep()`` also has a jnp path used inside jit by the
denoiser wrapper (BaseModel.apply_model parity, src/Model/ModelBase.py:72).
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import numpy as np

from lightdiffusion_next_tpu.sampling import schedules


def _bcast(sigma, like):
    """View sigma as (B, 1, 1, ...) to broadcast over `like`."""
    sigma = jnp.asarray(sigma)
    if sigma.ndim == 0:
        sigma = sigma[None]
    return sigma.reshape(sigma.shape[:1] + (1,) * (like.ndim - 1))


class EPS:
    """Noise-prediction parameterization (sampling.py:26-98)."""

    sigma_data = 1.0

    def calculate_input(self, sigma, noise):
        sigma = _bcast(sigma, noise)
        return noise / (sigma**2 + self.sigma_data**2) ** 0.5

    def calculate_denoised(self, sigma, model_output, model_input):
        sigma = _bcast(sigma, model_output)
        return model_input - model_output * sigma

    def noise_scaling(self, sigma, noise, latent_image, max_denoise: bool = False):
        if max_denoise:
            noise = noise * jnp.sqrt(1.0 + sigma**2.0)
        else:
            noise = noise * _bcast(sigma, noise)
        return noise + latent_image

    def inverse_noise_scaling(self, sigma, latent):
        return latent


class CONST:
    """Rectified-flow parameterization used by Flux (sampling.py:100-156)."""

    def calculate_input(self, sigma, noise):
        return noise

    def calculate_denoised(self, sigma, model_output, model_input):
        sigma = _bcast(sigma, model_output)
        return model_input - model_output * sigma

    def noise_scaling(self, sigma, noise, latent_image, max_denoise: bool = False):
        return sigma * noise + (1.0 - sigma) * latent_image

    def inverse_noise_scaling(self, sigma, latent):
        return latent / (1.0 - sigma)


class ModelSamplingDiscrete(EPS):
    """Discrete 1000-step sigma table from the linear beta schedule
    (sampling.py:221-356). sigma_min = sigmas[0], sigma_max = sigmas[-1]."""

    def __init__(
        self,
        beta_schedule: str = "linear",
        linear_start: float = 0.00085,
        linear_end: float = 0.012,
        timesteps: int = 1000,
    ):
        betas = schedules.make_beta_schedule(
            timesteps, linear_start=linear_start, linear_end=linear_end
        )
        self.num_timesteps = timesteps
        self.linear_start = linear_start
        self.linear_end = linear_end
        self.set_sigmas(schedules.sigmas_from_betas(betas))

    def set_sigmas(self, sigmas: np.ndarray):
        self.sigmas = np.asarray(sigmas, dtype=np.float32)
        self.log_sigmas = np.log(self.sigmas)

    @property
    def sigma_min(self) -> float:
        return float(self.sigmas[0])

    @property
    def sigma_max(self) -> float:
        return float(self.sigmas[-1])

    def timestep(self, sigma):
        """sigma -> nearest discrete timestep index. jnp-traceable."""
        log_sigma = jnp.log(jnp.asarray(sigma, dtype=jnp.float32))
        log_sigmas = jnp.asarray(self.log_sigmas)
        dists = log_sigma[..., None] - log_sigmas
        return jnp.abs(dists).argmin(axis=-1).astype(jnp.float32)

    def sigma(self, timestep):
        """timestep (possibly fractional) -> sigma via log-space lerp."""
        t = np.clip(
            np.asarray(timestep, dtype=np.float32), 0, len(self.sigmas) - 1
        )
        low_idx = np.floor(t).astype(np.int64)
        high_idx = np.ceil(t).astype(np.int64)
        w = t - np.floor(t)
        log_sigma = (1 - w) * self.log_sigmas[low_idx] + w * self.log_sigmas[high_idx]
        return np.exp(log_sigma).astype(np.float32)

    def percent_to_sigma(self, percent: float) -> float:
        if percent <= 0.0:
            return 999999999.9
        if percent >= 1.0:
            return 0.0
        percent = 1.0 - percent
        return float(self.sigma(np.asarray(percent * 999.0)))


def flux_time_shift(mu: float, sigma: float, t):
    return math.exp(mu) / (math.exp(mu) + (1 / t - 1) ** sigma)


class ModelSamplingFlux(CONST):
    """Flux rectified-flow sigma table: sigma(t) = e^mu/(e^mu + (1/t-1)^1),
    shift mu default 1.15 (sampling.py:172-218)."""

    def __init__(self, shift: float = 1.15, timesteps: int = 10000):
        self.set_parameters(shift=shift, timesteps=timesteps)

    def set_parameters(self, shift: float = 1.15, timesteps: int = 10000):
        self.shift = shift
        ts = np.arange(1, timesteps + 1, dtype=np.float64) / timesteps
        self.sigmas = np.asarray(
            [flux_time_shift(shift, 1.0, float(t)) for t in ts], dtype=np.float32
        )

    @property
    def sigma_max(self) -> float:
        return float(self.sigmas[-1])

    @property
    def sigma_min(self) -> float:
        return float(self.sigmas[0])

    def timestep(self, sigma):
        return sigma

    def sigma(self, timestep):
        t = np.asarray(timestep, dtype=np.float64)
        return np.asarray(
            math.exp(self.shift) / (math.exp(self.shift) + (1 / t - 1) ** 1.0),
            dtype=np.float32,
        )

    def percent_to_sigma(self, percent: float) -> float:
        if percent <= 0.0:
            return 1.0
        if percent >= 1.0:
            return 0.0
        return 1.0 - percent


def model_sampling_for(prediction_type: str, **kw):
    """Factory (sampling.py:1055 parity): 'eps' -> discrete EPS table,
    'const'/'flux' -> flux time-shift table."""
    if prediction_type == "eps":
        return ModelSamplingDiscrete(**kw)
    if prediction_type in ("const", "flux"):
        return ModelSamplingFlux(**kw)
    raise ValueError(f"unknown prediction type {prediction_type!r}")
