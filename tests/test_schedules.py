"""Schedule parity tests against torch-built oracles and analytic values.

The oracle formulas are re-derived in-test with torch/numpy (the reference
repo's behavior, not its code).
"""

import numpy as np
import pytest
import torch

from lightdiffusion_next_tpu.sampling import schedules
from lightdiffusion_next_tpu.sampling.model_sampling import (
    CONST,
    EPS,
    ModelSamplingDiscrete,
    ModelSamplingFlux,
)


def torch_karras(n, sigma_min, sigma_max, rho=7.0):
    ramp = torch.linspace(0, 1, n)
    min_inv_rho = sigma_min ** (1 / rho)
    max_inv_rho = sigma_max ** (1 / rho)
    sigmas = (max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** rho
    return torch.cat([sigmas, sigmas.new_zeros([1])]).numpy()


def torch_discrete_sigmas(linear_start=0.00085, linear_end=0.012, T=1000):
    betas = (
        torch.linspace(linear_start**0.5, linear_end**0.5, T, dtype=torch.float64)
        ** 2
    )
    alphas_cumprod = torch.cumprod(1.0 - betas, dim=0)
    return (((1 - alphas_cumprod) / alphas_cumprod) ** 0.5).float().numpy()


def test_discrete_sigma_table_matches_torch():
    ms = ModelSamplingDiscrete()
    oracle = torch_discrete_sigmas()
    np.testing.assert_allclose(ms.sigmas, oracle, rtol=1e-6)
    assert ms.sigma_min == pytest.approx(float(oracle[0]))
    assert ms.sigma_max == pytest.approx(float(oracle[-1]))


def test_karras_matches_torch():
    ms = ModelSamplingDiscrete()
    ours = schedules.get_sigmas_karras(20, ms.sigma_min, ms.sigma_max)
    oracle = torch_karras(20, ms.sigma_min, ms.sigma_max)
    np.testing.assert_allclose(ours, oracle, rtol=1e-5)
    assert ours[-1] == 0.0


def test_normal_scheduler_roundtrips_sigma_table():
    ms = ModelSamplingDiscrete()
    sigs = schedules.normal_scheduler(ms, 10)
    assert len(sigs) == 11
    assert sigs[0] == pytest.approx(ms.sigma_max, rel=1e-4)
    assert sigs[-1] == 0.0
    assert np.all(np.diff(sigs) < 0)


def test_simple_scheduler_picks_table_entries():
    ms = ModelSamplingDiscrete()
    sigs = schedules.simple_scheduler(ms, 8)
    assert len(sigs) == 9
    assert sigs[0] == pytest.approx(float(ms.sigmas[-1]))
    # every entry (but the trailing 0) is from the table
    for s in sigs[:-1]:
        assert np.min(np.abs(ms.sigmas - s)) < 1e-6


def test_beta_scheduler_monotone_and_terminated():
    ms = ModelSamplingDiscrete()
    sigs = schedules.beta_scheduler(ms, 20)
    assert sigs[-1] == 0.0
    assert np.all(np.diff(sigs) < 0)
    assert sigs[0] == pytest.approx(ms.sigma_max, rel=1e-4)


def test_flux_sigma_shift():
    ms = ModelSamplingFlux(shift=1.15)
    # sigma(t) = e^mu / (e^mu + (1/t - 1))
    import math

    t = 0.5
    expected = math.exp(1.15) / (math.exp(1.15) + 1.0)
    assert float(ms.sigma(np.asarray(t))) == pytest.approx(expected, rel=1e-6)
    assert ms.sigma_max == pytest.approx(1.0, abs=1e-6)


def test_ancestral_step():
    sd, su = schedules.get_ancestral_step(10.0, 5.0, eta=1.0)
    # oracle formula
    su_o = min(5.0, (5.0**2 * (10.0**2 - 5.0**2) / 10.0**2) ** 0.5)
    sd_o = (5.0**2 - su_o**2) ** 0.5
    assert su == pytest.approx(su_o)
    assert sd == pytest.approx(sd_o)
    sd, su = schedules.get_ancestral_step(10.0, 5.0, eta=0.0)
    assert (sd, su) == (5.0, 0.0)


def test_eps_parameterization_roundtrip():
    import jax.numpy as jnp

    eps = EPS()
    x = jnp.ones((2, 4, 4, 4))
    sigma = jnp.asarray([2.0, 3.0])
    inp = eps.calculate_input(sigma, x)
    np.testing.assert_allclose(
        np.asarray(inp[0]), 1.0 / np.sqrt(2.0**2 + 1.0), rtol=1e-6
    )
    den = eps.calculate_denoised(sigma, x * 0.5, x)
    np.testing.assert_allclose(np.asarray(den[1]), 1.0 - 0.5 * 3.0, rtol=1e-6)
    noised = eps.noise_scaling(sigma, x, x * 0.0)
    np.testing.assert_allclose(np.asarray(noised[0]), 2.0, rtol=1e-6)


def test_const_parameterization():
    import jax.numpy as jnp

    const = CONST()
    x = jnp.ones((1, 2, 2, 4))
    sigma = jnp.asarray([0.25])
    assert np.allclose(const.calculate_input(sigma, x), 1.0)
    noised = const.noise_scaling(0.25, x, x * 2.0)
    np.testing.assert_allclose(np.asarray(noised), 0.25 + 0.75 * 2.0)
    inv = const.inverse_noise_scaling(0.25, x)
    np.testing.assert_allclose(np.asarray(inv), 1.0 / 0.75)


def test_timestep_embedding_matches_torch():
    import jax.numpy as jnp
    import math

    t = np.asarray([0.0, 10.0, 999.0], dtype=np.float32)
    ours = np.asarray(schedules.timestep_embedding(jnp.asarray(t), 320))
    # torch oracle
    half = 160
    freqs = torch.exp(
        -math.log(10000) * torch.arange(0, half, dtype=torch.float32) / half
    )
    args = torch.tensor(t)[:, None] * freqs[None]
    oracle = torch.cat([torch.cos(args), torch.sin(args)], dim=-1).numpy()
    # fp32 trig range reduction differs between XLA and torch for large args
    # (t=999): tight for small t, loose overall.
    np.testing.assert_allclose(ours[:2], oracle[:2], atol=1e-4)
    np.testing.assert_allclose(ours, oracle, atol=5e-3)


def test_timestep_embedding_flux_padding():
    import jax.numpy as jnp

    t = jnp.asarray([0.5])
    emb = schedules.timestep_embedding_flux(t, 257)
    assert emb.shape == (1, 257)
    assert float(emb[0, -1]) == 0.0
