"""FBCache: hit/miss logic, sigma window, consecutive-hit cap, end-to-end
with a tiny UNet in the sampler loop."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from lightdiffusion_next_tpu.models import base as base_mod
from lightdiffusion_next_tpu.models import unet as unet_mod
from lightdiffusion_next_tpu.sampling import cfg as cfg_mod
from lightdiffusion_next_tpu.sampling import fbcache, samplers

TINY_CFG = unet_mod.UNetConfig(
    model_channels=32, channel_mult=(1, 2), num_res_blocks=(1, 1),
    transformer_depth=(1, 1), context_dim=16, num_heads=4,
    dtype=jnp.float32,
)


def _make_model():
    params = unet_mod.init_params(TINY_CFG, seed=0, dtype=jnp.float32)
    return base_mod.sd15_model(params, cfg=TINY_CFG, dtype=jnp.float32)


def _make_denoiser(model, threshold=0.5, max_hits=-1, start=0.0, end=1.0, rng=None):
    rng = rng or np.random.default_rng(0)
    cond = cfg_mod.CondInput(
        cross_attn=jnp.asarray(rng.standard_normal((1, 7, 16)), dtype=jnp.float32)
    )
    uncond = cfg_mod.CondInput(
        cross_attn=jnp.asarray(rng.standard_normal((1, 7, 16)), dtype=jnp.float32)
    )
    fb = fbcache.FBCacheConfig(
        residual_diff_threshold=threshold,
        start=start,
        end=end,
        max_consecutive_cache_hits=max_hits,
    )
    return fbcache.for_model(model, cond, uncond, 7.5, fb)


def test_fbcache_first_call_is_miss(rng):
    model = _make_model()
    den = _make_denoiser(model, rng=rng)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 4)), dtype=jnp.float32)
    state = den.init_state(x)
    assert not bool(state.valid)
    d1, u1, state = den(x, jnp.asarray([14.0]), state)
    assert bool(state.valid)
    assert int(state.consecutive_hits) == 0  # miss path


def test_fbcache_hit_reuses_residual(rng):
    model = _make_model()
    den = _make_denoiser(model, threshold=10.0, rng=rng)  # always similar
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 4)), dtype=jnp.float32)
    state = den.init_state(x)
    d1, _, state = den(x, jnp.asarray([14.0]), state)
    d_hit, _, state = den(x, jnp.asarray([13.0]), state)
    assert int(state.consecutive_hits) == 1
    # the hit path (blocks 0-1 + cached residual) must differ from a full
    # recomputation at the same sigma with a fresh cache
    d_miss, _, _ = den(x, jnp.asarray([13.0]), den.init_state(x))
    assert np.isfinite(np.asarray(d_hit)).all()
    assert not np.allclose(np.asarray(d_hit), np.asarray(d_miss), atol=1e-6)
    # ...but it approximates it (the whole point of the cache): relative
    # error bounded vs the overall magnitude
    rel = np.abs(np.asarray(d_hit) - np.asarray(d_miss)).mean() / (
        np.abs(np.asarray(d_miss)).mean() + 1e-9
    )
    assert rel < 1.0


def test_fbcache_max_consecutive_hits(rng):
    model = _make_model()
    den = _make_denoiser(model, threshold=10.0, max_hits=1, rng=rng)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 4)), dtype=jnp.float32)
    state = den.init_state(x)
    _, _, state = den(x, jnp.asarray([14.0]), state)  # miss
    _, _, state = den(x, jnp.asarray([13.0]), state)  # hit (1)
    _, _, state = den(x, jnp.asarray([12.0]), state)  # forced miss
    assert int(state.consecutive_hits) == 0


def test_fbcache_threshold_zero_never_hits(rng):
    model = _make_model()
    den = _make_denoiser(model, threshold=0.0, rng=rng)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 4)), dtype=jnp.float32)
    state = den.init_state(x)
    _, _, state = den(x, jnp.asarray([14.0]), state)
    _, _, state = den(x, jnp.asarray([13.0]), state)
    assert int(state.consecutive_hits) == 0


def test_fbcache_matches_plain_when_disabled(rng):
    """threshold=0 (never hits) must produce the plain denoiser's output."""
    model = _make_model()
    rng2 = np.random.default_rng(1)
    cond = cfg_mod.CondInput(
        cross_attn=jnp.asarray(rng2.standard_normal((1, 7, 16)), dtype=jnp.float32)
    )
    uncond = cfg_mod.CondInput(
        cross_attn=jnp.asarray(rng2.standard_normal((1, 7, 16)), dtype=jnp.float32)
    )
    plain = cfg_mod.make_cfg_denoiser(
        model.apply_fn, model.params, model.model_sampling, cond, uncond, 7.5
    )
    fb = fbcache.for_model(
        model, cond, uncond, 7.5, fbcache.FBCacheConfig(residual_diff_threshold=0.0)
    )
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 4)), dtype=jnp.float32)
    d_plain, _ = plain(x, jnp.asarray([10.0]))
    d_fb, _, _ = fb(x, jnp.asarray([10.0]), fb.init_state(x))
    # fusion order differs inside lax.cond; tolerance covers fp reassociation
    np.testing.assert_allclose(
        np.asarray(d_fb), np.asarray(d_plain), rtol=5e-3, atol=1e-3
    )


def test_fbcache_in_scan_loop(rng):
    model = _make_model()
    den = _make_denoiser(model, threshold=0.3, rng=rng)
    x0 = jnp.asarray(rng.standard_normal((1, 16, 16, 4)), dtype=jnp.float32)
    sigmas = np.asarray([14.0, 10.0, 7.0, 4.0, 2.0, 1.0, 0.0], dtype=np.float32)
    out = samplers.sample(den, x0, sigmas, sampler="euler")
    assert out.shape == x0.shape
    assert np.isfinite(np.asarray(out)).all()


def test_fbcache_with_dpmpp_sde(rng):
    """The SDE midpoint model call runs inside a lax.cond branch; FBCache
    state must thread through the cond outputs (a box assignment leaks a
    tracer -> UnexpectedTracerError). dpmpp_sde_cfgpp IS the SD1.5 default
    sampler, and fbcache is a public ksample option."""
    import jax.numpy as jnp

    from lightdiffusion_next_tpu.models import base as base_mod
    from lightdiffusion_next_tpu.models import unet as unet_mod
    from lightdiffusion_next_tpu.sampling import fbcache as fb_mod
    from lightdiffusion_next_tpu.sampling import ksampler as ks
    from lightdiffusion_next_tpu.sampling.cfg import CondInput

    cfg = unet_mod.UNetConfig(
        model_channels=32, channel_mult=(1, 2), num_res_blocks=(1, 1),
        transformer_depth=(1, 1), context_dim=64, num_heads=4,
        dtype=jnp.float32,
    )
    model = base_mod.sd15_model(
        unet_mod.init_params(cfg, seed=0), cfg=cfg, dtype=jnp.float32
    )
    cond = CondInput(jnp.asarray(
        rng.standard_normal((1, 4, 64)), jnp.float32
    ))
    r = ks.ksample(
        model, seed=3, steps=4, cfg_scale=7.0,
        sampler_name="dpmpp_sde_cfgpp", scheduler="karras",
        positive=cond, negative=cond,
        latent_image=jnp.zeros((1, 16, 16, 4), jnp.float32),
        fbcache=fb_mod.FBCacheConfig(residual_diff_threshold=0.5),
    )
    out = np.asarray(r.latent)
    assert out.shape == (1, 16, 16, 4)
    assert np.isfinite(out).all()


def test_fbcache_keeps_model_function_wrapper(rng):
    """model_function_wrapper must still run when FBCache is enabled (it
    was silently dropped)."""
    import jax.numpy as jnp

    from lightdiffusion_next_tpu.models import base as base_mod
    from lightdiffusion_next_tpu.models import unet as unet_mod
    from lightdiffusion_next_tpu.sampling import fbcache as fb_mod
    from lightdiffusion_next_tpu.sampling.cfg import CondInput

    cfg = unet_mod.UNetConfig(
        model_channels=32, channel_mult=(1, 2), num_res_blocks=(1, 1),
        transformer_depth=(1, 1), context_dim=64, num_heads=4,
        dtype=jnp.float32,
    )
    model = base_mod.sd15_model(
        unet_mod.init_params(cfg, seed=0), cfg=cfg, dtype=jnp.float32
    )
    calls = []

    def wrapper(apply, x, t, context, y):
        calls.append(1)
        return apply(x, t, context, y)

    model = model.with_options(model_function_wrapper=wrapper)
    cond = CondInput(jnp.asarray(rng.standard_normal((1, 4, 64)), jnp.float32))
    den = fb_mod.for_model(model, cond, None, 1.0, fb_mod.FBCacheConfig())
    x = jnp.zeros((1, 8, 8, 4), jnp.float32)
    state = den.init_state(x)
    d, u, _ = den(x, jnp.asarray([5.0]), state)
    assert np.isfinite(np.asarray(d)).all()
    assert calls, "model_function_wrapper was not invoked under FBCache"
