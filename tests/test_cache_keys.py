"""Compiled-runner cache identity: keys are minted from a monotonic model
uid, never from recyclable id() addresses, so a long serving session that
loads/unloads models can never silently reuse a program traced for a dead
model (round-2 verdict, "weak" #1)."""

import gc

import jax.numpy as jnp
import numpy as np

from lightdiffusion_next_tpu.models import base as base_mod
from lightdiffusion_next_tpu.models import unet as unet_mod
from lightdiffusion_next_tpu.sampling import cfg as cfg_mod
from lightdiffusion_next_tpu.sampling import ksampler as ks
from lightdiffusion_next_tpu.sampling.cfg import CondInput


def _tiny(channels, seed=0):
    cfg = unet_mod.UNetConfig(
        model_channels=channels, channel_mult=(1, 2), num_res_blocks=(1, 1),
        transformer_depth=(1, 1), context_dim=64, num_heads=4,
        dtype=jnp.float32,
    )
    return base_mod.sd15_model(
        unet_mod.init_params(cfg, seed=seed), cfg=cfg, dtype=jnp.float32
    )


def test_uid_monotonic_across_gc():
    seen = set()
    for i in range(5):
        m = _tiny(32, seed=i)
        assert m.uid not in seen
        seen.add(m.uid)
        del m
        gc.collect()  # freed addresses may be recycled; uids must not be


def test_uid_survives_params_and_options_but_not_tp_relayout():
    m = _tiny(32)
    assert m.with_params(m.params).uid == m.uid
    assert m.with_options(foo=1).uid == m.uid
    import dataclasses

    # a new apply_fn (different traced program) must get a new identity
    m2 = dataclasses.replace(m, apply_fn=lambda *a, **k: None, uid=None)
    assert m2.uid != m.uid


def test_cfg_cache_keys_distinct_for_fresh_models():
    cond = CondInput(jnp.zeros((1, 4, 64)))
    keys = set()
    for i in range(4):
        m = _tiny(32, seed=i)
        den = cfg_mod.make_cfg_denoiser(
            m.apply_fn, m.params, m.model_sampling, cond, None, 1.0,
            model_uid=m.uid,
        )
        assert den.cache_key not in keys
        keys.add(den.cache_key)
        del m, den
        gc.collect()


def test_model_churn_no_stale_runner_reuse():
    """Sample through ksample (which populates the jitted-runner cache) with
    models of DIFFERENT configs created/destroyed in a loop; a stale-runner
    hit would apply the dead model's traced net (wrong channel count) and
    crash or produce the wrong shape."""
    cond = CondInput(jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 4, 64)), jnp.float32
    ))
    latent = jnp.zeros((1, 8, 8, 4), jnp.float32)
    for i, ch in enumerate([32, 64, 32, 64]):
        m = _tiny(ch, seed=i)
        r = ks.ksample(
            m, seed=1, steps=2, cfg_scale=7.0, sampler_name="euler",
            scheduler="normal", positive=cond, negative=cond,
            latent_image=latent,
        )
        out = np.asarray(r.latent)
        assert out.shape == (1, 8, 8, 4)
        assert np.isfinite(out).all()
        del m
        gc.collect()


def test_runner_cache_keys_include_latent_shape():
    """Low-res multiscale runners bake (sh, sw, h, w) closure constants;
    a runner cached at one latent size must not serve another (review
    finding: same model+sampler+ms at 512x512 then 768x512 crashed)."""
    from lightdiffusion_next_tpu.sampling import samplers as samplers_mod

    m = _tiny(32)
    cond = CondInput(jnp.zeros((1, 4, 64)))
    ms = samplers_mod.MultiScale(enabled=True, factor=0.5,
                                 fullres_start=1, fullres_end=1)
    for hw in [(16, 16), (24, 16)]:
        r = ks.ksample(
            m, seed=1, steps=4, cfg_scale=7.0, sampler_name="euler",
            scheduler="normal", positive=cond, negative=cond,
            latent_image=jnp.zeros((1,) + hw + (4,), jnp.float32), ms=ms,
        )
        out = np.asarray(r.latent)
        assert out.shape == (1,) + hw + (4,)
        assert np.isfinite(out).all()


def test_cached_runners_do_not_pin_params():
    """The jitted runners stored in samplers._RUNNER_CACHE must close over
    the denoiser's pure function, never the denoiser object — otherwise
    every cached runner pins a full param-pytree copy until eviction."""
    import weakref

    from lightdiffusion_next_tpu.sampling import samplers as samplers_mod

    cond = CondInput(jnp.zeros((1, 4, 64)))
    m = _tiny(32)
    sentinel = m.params["time_embed.0.weight"]
    ref = weakref.ref(sentinel)
    r = ks.ksample(
        m, seed=1, steps=2, cfg_scale=7.0, sampler_name="euler",
        scheduler="normal", positive=cond, negative=cond,
        latent_image=jnp.zeros((1, 8, 8, 4), jnp.float32),
    )
    assert np.isfinite(np.asarray(r.latent)).all()
    del r, m, sentinel
    gc.collect()
    assert ref() is None, (
        "param leaf kept alive after model release — a cached runner "
        "closure is pinning the params bundle"
    )
