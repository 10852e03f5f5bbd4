"""Sampler trajectory parity vs numpy oracles of the reference's effective
update rules (see samplers.py docstring for the CFG++ dead-code analysis —
the effective update uses the CFG output directly)."""

import jax.numpy as jnp
import numpy as np
import pytest

from lightdiffusion_next_tpu.sampling import samplers
from lightdiffusion_next_tpu.sampling.schedules import get_ancestral_step

SHAPE = (1, 8, 8, 4)


def make_denoiser(rng):
    bias = rng.standard_normal(SHAPE).astype(np.float32)
    jb = jnp.asarray(bias)

    def denoise(x, sigma):
        den = 0.3 * x + jb
        return den, 0.2 * x

    def np_denoise(x):
        return 0.3 * x + bias

    return denoise, np_denoise


SIGMAS = np.asarray([14.0, 8.0, 4.0, 2.0, 1.0, 0.5, 0.0], dtype=np.float32)


def test_euler_matches_oracle(rng):
    denoise, np_den = make_denoiser(rng)
    x0 = rng.standard_normal(SHAPE).astype(np.float32)
    out = samplers.sample(denoise, jnp.asarray(x0), SIGMAS, sampler="euler")
    x = x0.astype(np.float64)
    for i in range(len(SIGMAS) - 1):
        den = np_den(x)
        d = (x - den) / SIGMAS[i]
        x = x + d * (SIGMAS[i + 1] - SIGMAS[i])
    np.testing.assert_allclose(np.asarray(out), x, atol=1e-3)


def test_euler_ancestral_matches_oracle(rng):
    denoise, np_den = make_denoiser(rng)
    x0 = rng.standard_normal(SHAPE).astype(np.float32)
    n = len(SIGMAS) - 1
    noise = rng.standard_normal((n,) + SHAPE).astype(np.float32)
    out = samplers.sample(
        denoise, jnp.asarray(x0), SIGMAS, sampler="euler_ancestral",
        step_noise=noise,
    )
    x = x0.astype(np.float64)
    for i in range(n):
        den = np_den(x)
        sd, su = get_ancestral_step(float(SIGMAS[i]), float(SIGMAS[i + 1]), 1.0)
        x = x + (x - den) / SIGMAS[i] * (sd - SIGMAS[i])
        if SIGMAS[i + 1] > 0:
            x = x + noise[i] * su
    np.testing.assert_allclose(np.asarray(out), x, atol=1e-3)


def test_dpmpp_2m_matches_oracle(rng):
    denoise, np_den = make_denoiser(rng)
    x0 = rng.standard_normal(SHAPE).astype(np.float32)
    out = samplers.sample(denoise, jnp.asarray(x0), SIGMAS, sampler="dpmpp_2m_cfgpp")
    x = x0.astype(np.float64)
    t = -np.log(np.maximum(SIGMAS.astype(np.float64), 1e-38))
    for i in range(len(SIGMAS) - 1):
        den = np_den(x)
        ratio = SIGMAS[i + 1] / SIGMAS[i]
        h = t[i + 1] - t[i]
        x = ratio * x - np.expm1(-min(h, 80.0)) * den
    np.testing.assert_allclose(np.asarray(out), x, atol=1e-3)


def test_dpmpp_sde_matches_oracle(rng):
    denoise, np_den = make_denoiser(rng)
    x0 = rng.standard_normal(SHAPE).astype(np.float32)
    n = len(SIGMAS) - 1
    noise1 = rng.standard_normal((n,) + SHAPE).astype(np.float32)
    noise2 = rng.standard_normal((n,) + SHAPE).astype(np.float32)
    out = samplers.sample(
        denoise, jnp.asarray(x0), SIGMAS, sampler="dpmpp_sde_cfgpp",
        sde_noise=(noise1, noise2),
    )
    # oracle (reference formulas, effective math)
    r, eta, s_noise = 0.5, 1.0, 1.0
    x = x0.astype(np.float64)
    for i in range(n):
        den = np_den(x)
        if SIGMAS[i + 1] == 0:
            d = (x - den) / SIGMAS[i]
            x = x + d * (SIGMAS[i + 1] - SIGMAS[i])
            continue
        t, t_next = -np.log(SIGMAS[i]), -np.log(SIGMAS[i + 1])
        s = t + (t_next - t) * r
        sd1, su1 = get_ancestral_step(np.exp(-t), np.exp(-s), eta)
        s_ = -np.log(sd1)
        x2 = (sd1 / SIGMAS[i]) * x - np.expm1(t - s_) * den + noise1[i] * su1 * s_noise
        den2 = np_den(x2)
        sd2, su2 = get_ancestral_step(np.exp(-t), np.exp(-t_next), eta)
        t_next_ = -np.log(sd2)
        mix = (1 - 1 / (2 * r)) * den + (1 / (2 * r)) * den2
        x = (
            (sd2 / SIGMAS[i]) * x
            - np.expm1(t - t_next_) * mix
            + noise2[i] * su2 * s_noise
        )
    np.testing.assert_allclose(np.asarray(out), x, rtol=2e-3, atol=2e-3)


def test_multiscale_plan_flags():
    ms = samplers.MultiScale(True, 0.5, 3, 8, False)
    flags = samplers.fullres_flags(20, ms, 128, 128)
    assert flags[:3].all() and flags[-8:].all()
    assert not flags[3:12].any()
    ms_i = samplers.MultiScale(True, 0.5, 3, 8, True)
    flags_i = samplers.fullres_flags(20, ms_i, 128, 128)
    assert flags_i[3] and not flags_i[4] and flags_i[5]


def test_multiscale_segments():
    flags = np.asarray([True, True, False, False, True])
    segs = samplers.segment_flags(flags)
    assert segs == [(0, 2, True), (2, 4, False), (4, 5, True)]


def test_multiscale_sampling_runs(rng):
    denoise, _ = make_denoiser(rng)
    x0 = rng.standard_normal(SHAPE).astype(np.float32)
    ms = samplers.MultiScale(True, 0.5, 1, 2, False)
    sig = np.asarray([14.0, 8.0, 4.0, 2.0, 1.0, 0.0], dtype=np.float32)
    out = samplers.sample(
        denoise, jnp.asarray(x0), sig, sampler="euler", ms=ms
    )
    assert out.shape == SHAPE
    assert np.isfinite(np.asarray(out)).all()


def test_eager_mode_matches_scan(rng):
    denoise, _ = make_denoiser(rng)
    x0 = rng.standard_normal(SHAPE).astype(np.float32)
    out_scan = samplers.sample(denoise, jnp.asarray(x0), SIGMAS, sampler="euler")
    calls = []
    out_eager = samplers.sample(
        denoise, jnp.asarray(x0), SIGMAS, sampler="euler",
        callback=lambda d: calls.append(d["i"]),
    )
    np.testing.assert_allclose(np.asarray(out_scan), np.asarray(out_eager), atol=1e-5)
    assert calls == list(range(len(SIGMAS) - 1))


def test_euler_dy_extra_steps(rng):
    denoise, _ = make_denoiser(rng)
    # dy needs a denoiser valid at both full and half resolution
    def denoise_any(x, sigma):
        return 0.3 * x, 0.2 * x

    x0 = rng.standard_normal(SHAPE).astype(np.float32)
    out = samplers.sample(
        denoise_any, jnp.asarray(x0), SIGMAS, sampler="euler_dy_cfg_pp"
    )
    assert out.shape == SHAPE
    assert np.isfinite(np.asarray(out)).all()
    # oracle: euler + dy checkerboard update at steps 2,3
    x = x0.astype(np.float64)
    for i in range(len(SIGMAS) - 1):
        den = 0.3 * x
        x = x + (x - den) / SIGMAS[i] * (SIGMAS[i + 1] - SIGMAS[i])
        if SIGMAS[i + 1] > 0 and i // 2 == 1:
            c = x[:, 1::2, 1::2, :]
            cd = 0.3 * c
            c = c + (c - cd) / SIGMAS[i] * (SIGMAS[i + 1] - SIGMAS[i])
            x[:, 1::2, 1::2, :] = c
    np.testing.assert_allclose(np.asarray(out), x, atol=1e-3)


def test_sde_h_ratio_matches_reference_formula():
    """Regression: the true-CFG++ momentum ratio for dpmpp_sde is
    (t - s_)/(2*(t - t_next)) with BOTH terms negative (reference
    samplers.py:1178) — a maximum()-style clamp on the denominator turned
    it into ±1e40. The ratio must be finite and positive on live steps."""
    cs = samplers._step_consts(SIGMAS, eta=1.0)
    hr = np.asarray(cs["sde_h_ratio"], np.float64)
    assert np.all(np.isfinite(hr))
    live = SIGMAS[1:] > 0
    assert np.all(hr[live] > 0) and np.all(hr[live] < 1.0)
    # oracle: reference formula per step
    for i in range(len(SIGMAS) - 1):
        if SIGMAS[i + 1] == 0:
            assert hr[i] == 0.0
            continue
        t, t_next = -np.log(SIGMAS[i]), -np.log(SIGMAS[i + 1])
        s = t + (t_next - t) * 0.5
        sd, _ = get_ancestral_step(float(SIGMAS[i]), float(np.exp(-s)), 1.0)
        s_ = -np.log(sd)
        np.testing.assert_allclose(
            hr[i], (t - s_) / (2 * (t - t_next)), rtol=1e-6
        )


def test_dpmpp_sde_true_cfgpp_finite(rng):
    denoise, _ = make_denoiser(rng)
    x0 = rng.standard_normal(SHAPE).astype(np.float32)
    n = len(SIGMAS) - 1
    noise = rng.standard_normal((2 * n,) + SHAPE).astype(np.float32)
    out = samplers.sample(
        denoise, jnp.asarray(x0), SIGMAS, sampler="dpmpp_sde_cfgpp",
        step_noise=noise,
        opts=samplers.SamplerOptions(true_cfgpp=True, cfg_scale=2.0),
    )
    assert np.all(np.isfinite(np.asarray(out)))


def test_dy_extra_step_uses_compiled_runner(rng):
    """Regression: the dy checkerboard extra step must dispatch through a
    jitted runner (one compiled program), not the denoiser's raw __call__ —
    eager op-by-op execution of a 12B model over the device relay cost
    ~20s per extra step."""

    class KeyedDenoiser:
        cache_key = ("test-dy", 1)
        jit_args = {"w": jnp.asarray(0.3)}

        def call_with(self, ja, x, sigma):
            return ja["w"] * x, 0.2 * x

        def __call__(self, x, sigma):
            return self.call_with(self.jit_args, x, sigma)

    den = KeyedDenoiser()
    x0 = rng.standard_normal(SHAPE).astype(np.float32)
    out = samplers.sample(
        den, jnp.asarray(x0), SIGMAS, sampler="euler_dy_cfg_pp"
    )
    assert np.isfinite(np.asarray(out)).all()
    assert any(
        len(k) == 2 and k[1] == "dy_extra" for k in samplers._RUNNER_CACHE
    ), "dy extra step did not register a compiled runner"


def test_chunked_callback_matches_scan(rng):
    """A callback with .chunk runs compiled segments between callbacks:
    same trajectory as pure scan, one callback per chunk, and a raised
    SampleInterrupted stops at chunk granularity."""
    denoise, _ = make_denoiser(rng)
    x0 = rng.standard_normal(SHAPE).astype(np.float32)
    out_scan = samplers.sample(denoise, jnp.asarray(x0), SIGMAS, sampler="euler")

    calls = []

    def cb(info):
        calls.append(info["i"])
        assert info.get("chunk") == 2

    cb.chunk = 2
    out_chunked = samplers.sample(
        denoise, jnp.asarray(x0), SIGMAS, sampler="euler", callback=cb
    )
    np.testing.assert_allclose(
        np.asarray(out_scan), np.asarray(out_chunked), atol=1e-5
    )
    assert calls == [1, 3, 5]  # 6 steps, chunk 2 -> ends 2,4,6

    def cb_stop(info):
        calls2.append(info["i"])
        if info["i"] >= 1:
            raise samplers.SampleInterrupted()

    calls2 = []
    cb_stop.chunk = 2
    out_stopped = samplers.sample(
        denoise, jnp.asarray(x0), SIGMAS, sampler="euler", callback=cb_stop
    )
    assert calls2 == [1]
    assert np.isfinite(np.asarray(out_stopped)).all()
    assert not np.allclose(np.asarray(out_stopped), np.asarray(out_scan))


def test_chunked_callback_matches_scan_with_multiscale(rng):
    """Chunk marks must compose with multiscale segment boundaries (state
    re-init at resolution changes, same trajectory as pure scan)."""
    denoise, _ = make_denoiser(rng)

    def denoise_any(x, sigma):
        return 0.3 * x, 0.2 * x

    x0 = rng.standard_normal((1, 64, 64, 4)).astype(np.float32)
    ms = samplers.MultiScale(True, 0.5, 1, 2, False)
    flags = samplers.fullres_flags(len(SIGMAS) - 1, ms, 64, 64)
    assert not flags.all(), "multiscale must engage for this test"
    out_scan = samplers.sample(
        denoise_any, jnp.asarray(x0), SIGMAS, sampler="euler", ms=ms
    )

    calls = []

    def cb(info):
        calls.append(info["i"])

    cb.chunk = 2
    out_chunked = samplers.sample(
        denoise_any, jnp.asarray(x0), SIGMAS, sampler="euler", ms=ms,
        callback=cb,
    )
    np.testing.assert_allclose(
        np.asarray(out_scan), np.asarray(out_chunked), atol=1e-5
    )
    # 6 steps, ms segments [0,1),[1,4),[4,6), chunk marks {2,4} ->
    # sub-segment ends at 1,2,4,6 (callback i = end-1)
    assert calls == [0, 1, 3, 5]


def test_chunked_with_stateful_denoiser(rng):
    """Regression: the chunked loop's bound variables shadowed the batch
    size `b` read by init_segment_state, so stateful (FBCache) denoisers
    got a state with batch == chunk bound and lax.scan crashed on the
    carry shape. Exercises init_state through the chunked branch."""

    class StatefulDen:
        cache_key = ("stateful-chunk-test",)
        jit_args = {"w": jnp.asarray(0.3)}

        def init_state(self, x):
            return jnp.zeros(x.shape, jnp.float32)

        def call_with(self, ja, x, sigma, state):
            return ja["w"] * x + 0.0 * state, 0.2 * x, state + 1.0

        def __call__(self, x, sigma, state):
            return self.call_with(self.jit_args, x, sigma, state)

    den = StatefulDen()
    x0 = rng.standard_normal(SHAPE).astype(np.float32)  # batch 1

    def cb(info):
        pass

    cb.chunk = 2
    out = samplers.sample(
        den, jnp.asarray(x0), SIGMAS, sampler="euler", callback=cb
    )
    assert out.shape == SHAPE
    assert np.isfinite(np.asarray(out)).all()


def test_true_cfgpp_differs(rng):
    denoise, _ = make_denoiser(rng)
    x0 = rng.standard_normal(SHAPE).astype(np.float32)
    out_eff = samplers.sample(denoise, jnp.asarray(x0), SIGMAS, sampler="euler_cfg_pp")
    out_true = samplers.sample(
        denoise, jnp.asarray(x0), SIGMAS, sampler="euler_cfg_pp",
        opts=samplers.SamplerOptions(true_cfgpp=True, cfg_scale=2.0),
    )
    assert not np.allclose(np.asarray(out_eff), np.asarray(out_true))


def test_scaling_runners_match_eager_formulas(rng):
    """ksampler's jitted pre/post latent-scaling programs (cached by
    sampling CLASS + latent format) must equal the eager formulas for both
    parameterizations; two instances of the same class share one cache
    entry safely because noise_scaling reads no instance state."""
    from lightdiffusion_next_tpu.sampling import ksampler as ks
    from lightdiffusion_next_tpu.sampling import model_sampling as ms_mod
    from lightdiffusion_next_tpu.utils import latent as lf_mod

    latent = jnp.asarray(rng.standard_normal((1, 4, 4, 4)), jnp.float32)
    noise = jnp.asarray(rng.standard_normal((1, 4, 4, 4)), jnp.float32)
    for msampling, lf in (
        (ms_mod.ModelSamplingDiscrete(), lf_mod.SD15),
        (ms_mod.ModelSamplingFlux(), lf_mod.FLUX1),
    ):
        for max_denoise in (False, True):
            sigma0 = jnp.asarray(float(msampling.sigma_max))
            pre, post = ks._scaling_runners(msampling, lf, max_denoise)
            x, latent_in = pre(sigma0, noise, latent)
            ref_in = lf.process_in(latent)
            ref_x = msampling.noise_scaling(
                sigma0, noise, ref_in, max_denoise=max_denoise
            )
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(ref_x), rtol=1e-6, atol=1e-6
            )
            np.testing.assert_allclose(
                np.asarray(latent_in), np.asarray(ref_in), rtol=1e-6
            )
            sig_last = jnp.asarray(0.25)
            out_l, out_raw = post(sig_last, x)
            ref_raw = msampling.inverse_noise_scaling(sig_last, x)
            np.testing.assert_allclose(
                np.asarray(out_raw), np.asarray(ref_raw), rtol=1e-6, atol=1e-6
            )
            np.testing.assert_allclose(
                np.asarray(out_l), np.asarray(lf.process_out(ref_raw)),
                rtol=1e-6, atol=1e-6,
            )
        # second instance of the same class hits the same cache entry
        pre2, _ = ks._scaling_runners(type(msampling)(), lf, False)
        assert pre2 is ks._scaling_runners(msampling, lf, False)[0]
