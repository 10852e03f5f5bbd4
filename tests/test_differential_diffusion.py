"""DifferentialDiffusion: threshold mask hardening over the trajectory.

Reference semantics (src/AutoDetailer/ADetailer.py:15-58): the denoise mask
is re-thresholded each step at
    thr = (ts(sigma) - ts(sigma_min)) / (ts(sigma_start) - ts(sigma_min))
so high-mask-value regions start resampling early and low-value regions join
late; the mask "hardens" as sigma falls. The reference enables it in the
ADetailer path whenever noise_mask_feather > 0 (ADetailer.py:729-733).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lightdiffusion_next_tpu.models import base as base_mod
from lightdiffusion_next_tpu.models import unet as unet_mod
from lightdiffusion_next_tpu.sampling import ksampler as ks
from lightdiffusion_next_tpu.sampling.model_sampling import ModelSamplingDiscrete

TINY_UNET = unet_mod.UNetConfig(
    model_channels=32, channel_mult=(1, 2), num_res_blocks=(1, 1),
    transformer_depth=(1, 1), context_dim=768, num_heads=4, dtype=jnp.float32,
)


@pytest.fixture(scope="module")
def model():
    return base_mod.sd15_model(
        unet_mod.init_params(TINY_UNET, seed=0), cfg=TINY_UNET, dtype=jnp.float32
    )


@pytest.fixture(scope="module")
def conds():
    # ksample only needs cross-attn conds; random context avoids the CLIP stack
    from lightdiffusion_next_tpu.sampling.cfg import CondInput

    r = np.random.default_rng(0)
    pos = CondInput(jnp.asarray(r.standard_normal((1, 77, 768)), jnp.float32))
    neg = CondInput(jnp.asarray(r.standard_normal((1, 77, 768)), jnp.float32))
    return pos, neg


def _mask_area_at(msamp, mask, sigma_start, sigma):
    """Evaluate _MaskedDenoiser's thresholded mask at one sigma."""
    mask = jnp.asarray(mask)
    den = ks._MaskedDenoiser(
        lambda x, s: (x, x), mask, jnp.zeros_like(mask),
        msamp, sigma_start, differential=True,
    )
    m, _ = den._mask_at(den.jit_args, jnp.asarray(sigma), mask.shape[1:3])
    return float(np.sum(np.asarray(m)))


def test_threshold_mask_hardens_monotonically():
    msamp = ModelSamplingDiscrete()
    # radial soft mask in (0, 1]
    yy, xx = np.mgrid[0:16, 0:16]
    soft = np.exp(-(((yy - 8) ** 2 + (xx - 8) ** 2) / 40.0)).astype(np.float32)
    soft = soft[None, :, :, None]
    s0 = float(msamp.sigma_max)
    areas = [
        _mask_area_at(msamp, soft, s0, s)
        for s in np.geomspace(s0, float(msamp.sigma_min), 6)
    ]
    # active area grows (mask "hardens" toward all-ones) as sigma falls
    assert all(a2 >= a1 for a1, a2 in zip(areas, areas[1:])), areas
    assert areas[0] < areas[-1]
    # at sigma_start only the mask==max region is active; at sigma_min all of
    # the (everywhere-positive) soft mask is active
    assert areas[-1] == soft.size


def test_binary_extremes_match_reference_semantics():
    msamp = ModelSamplingDiscrete()
    s0 = float(msamp.sigma_max)
    ones = np.ones((1, 8, 8, 1), np.float32)
    for s in np.geomspace(s0, float(msamp.sigma_min), 4):
        assert _mask_area_at(msamp, ones, s0, s) == ones.size  # 1 >= thr always
    zeros = np.zeros((1, 8, 8, 1), np.float32)
    mid = np.geomspace(s0, float(msamp.sigma_min), 4)[1:-1]
    for s in mid:  # thr > 0 strictly inside the trajectory
        assert _mask_area_at(msamp, zeros, s0, s) == 0.0


def _run(model, conds, mask, differential):
    pos, neg = conds
    latent = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 16, 16, 4)), jnp.float32
    )
    r = ks.ksample(
        model, seed=5, steps=4, cfg_scale=7.0, sampler_name="euler",
        scheduler="karras", positive=pos, negative=neg, latent_image=latent,
        denoise=0.5, denoise_mask=jnp.asarray(mask),
        differential_diffusion=differential,
    )
    return np.asarray(r.latent)


def test_fractional_mask_differs_static_vs_differential(model, conds):
    mask = np.full((1, 16, 16, 1), 0.5, np.float32)
    mask[:, :4] = 1.0
    a = _run(model, conds, mask, differential=False)
    b = _run(model, conds, mask, differential=True)
    assert np.isfinite(a).all() and np.isfinite(b).all()
    assert not np.allclose(a, b)


def test_all_ones_mask_matches_static(model, conds):
    mask = np.ones((1, 16, 16, 1), np.float32)
    a = _run(model, conds, mask, differential=False)
    b = _run(model, conds, mask, differential=True)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_detailer_enables_differential_when_feathered(monkeypatch):
    """pipelines.detailer must pass differential_diffusion=(feather > 0),
    matching the reference's noise_mask_feather gate (ADetailer.py:729-733)."""
    from lightdiffusion_next_tpu.pipelines import detailer as det

    captured = {}

    class _VAE:
        def encode(self, x):
            return jnp.zeros((1, x.shape[1] // 8, x.shape[2] // 8, 4))

        def decode(self, z):
            return jnp.zeros((1, z.shape[1] * 8, z.shape[2] * 8, 3))

    def fake_ksample(model, **kw):
        captured.update(kw)
        return ks.KSampleResult(latent=kw["latent_image"], raw=kw["latent_image"])

    monkeypatch.setattr(det.ks, "ksample", fake_ksample)
    image = np.zeros((1, 128, 128, 3), np.float32)
    mask = np.zeros((128, 128), np.float32)
    mask[32:96, 32:96] = 1.0
    seg = det.SEG((32, 32, 96, 96), (32, 32, 96, 96), mask, 1.0)

    d = det.Detailer(None, None, _VAE(), det.DetailerConfig(feather=5))
    d.enhance_detail(image, seg, None, None)
    assert captured["differential_diffusion"] is True

    d0 = det.Detailer(None, None, _VAE(), det.DetailerConfig(feather=0))
    d0.enhance_detail(image, seg, None, None)
    assert captured["differential_diffusion"] is False


def test_masked_denoise_with_multiscale_lowres_segments(model, conds):
    """Masked sampling through multiscale low-res segments: the denoiser is
    called at (sh, sw), so the mask/base must be blended at the call shape
    (previously a broadcast crash at trace time)."""
    from lightdiffusion_next_tpu.sampling import samplers as samplers_mod

    pos, neg = conds
    mask = np.zeros((1, 16, 16, 1), np.float32)
    mask[:, :8] = 1.0
    r = ks.ksample(
        model, seed=4, steps=6, cfg_scale=7.0, sampler_name="euler",
        scheduler="karras", positive=pos, negative=neg,
        latent_image=jnp.zeros((1, 16, 16, 4), jnp.float32),
        denoise_mask=jnp.asarray(mask),
        ms=samplers_mod.MultiScale(enabled=True, factor=0.5,
                                   fullres_start=2, fullres_end=2),
    )
    assert np.isfinite(np.asarray(r.latent)).all()


def test_masked_denoise_with_dy_half_res_steps(model, conds):
    """euler_dy's checkerboard extra step calls the denoiser at half
    resolution — the masked blend must follow the call shape."""
    pos, neg = conds
    mask = np.ones((1, 16, 16, 1), np.float32)
    mask[:, 8:] = 0.0
    r = ks.ksample(
        model, seed=5, steps=5, cfg_scale=7.0, sampler_name="euler_cfgpp",
        scheduler="karras", positive=pos, negative=neg,
        latent_image=jnp.zeros((1, 16, 16, 4), jnp.float32),
        denoise_mask=jnp.asarray(mask),
    )
    assert np.isfinite(np.asarray(r.latent)).all()
