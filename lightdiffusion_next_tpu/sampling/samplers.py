"""Sampler loops: Euler / Euler-ancestral (+CFG++ "dy" variants), DPM++(2M),
DPM++ SDE — as jit/scan programs with multi-scale resolution plans.

Counterpart of src/sample/samplers.py:14-1254. Key re-designs for TPU:

- All schedule-derived scalars (sigma, ancestral splits, exp-integrator
  ratios) are precomputed on the host from the numpy sigma table and fed to
  the traced step as per-step constants — nothing data-dependent remains in
  the loop.
- All stochastic noise is precomputed (sampling.noise) and passed as scan
  xs; the hot loop never synchronizes with the host.
- Multi-scale (samplers.py:73-109 etc.): the per-step full/low-res decision
  depends only on the step index, so the step list is segmented into runs of
  constant resolution; each segment is one ``lax.scan`` at a static model
  -call shape. The carry latent stays at full resolution throughout (exactly
  the reference's dataflow: only the model call is downscaled).

CFG++ parity note: in the reference, every sampler re-invokes its post-CFG
hook manually after the model call with ``uncond_denoised=None``
(samplers.py:553-556, 884-887, 1140-1143...), which resets the momentum state
before it is ever read — the momentum branches are dead code and the
effective update uses the CFG output directly. ``true_cfgpp=False`` (default)
reproduces that effective behavior for parity; ``true_cfgpp=True`` enables
the intended momentum math.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lightdiffusion_next_tpu import config as _config
from lightdiffusion_next_tpu.ops import nn
from lightdiffusion_next_tpu.sampling import schedules

SAMPLER_NAMES = (
    "euler",
    "euler_ancestral",
    "euler_cfg_pp",
    "euler_ancestral_cfg_pp",
    "euler_dy_cfg_pp",
    "euler_ancestral_dy_cfg_pp",
    "dpmpp_2m",
    "dpmpp_2m_cfgpp",
    "dpmpp_sde",
    "dpmpp_sde_cfgpp",
)

# the reference's public sampler-name registry (sampling.py:517-534).
# NB "euler_ancestral_dy_cfg_pp" performs NO dy checkerboard extra steps —
# that matches the reference: despite its name, sample_euler_ancestral_dy_
# cfg_pp never calls dy_sampling_step_cfg_pp (only the non-ancestral
# sibling does, samplers.py:592); its only extra mechanic is the s_gamma
# churn, which is inert at the 0.0 defaults the pipeline always uses.
SAMPLER_ALIASES = {
    "euler_cfgpp": "euler_dy_cfg_pp",
    "euler_ancestral_cfgpp": "euler_ancestral_dy_cfg_pp",
}


class SampleInterrupted(Exception):
    """Raised by a sampler callback to stop generation; the loop returns
    the current (partial) latent, the behavior the reference's dead
    interrupt_flag check intended (samplers.py:120-125)."""


def callback_requests_stop(callback) -> bool:
    """Poll a callback's optional ``should_stop`` hook — orchestrator loops
    (pipeline stages, USDU tiles, ADetailer segments) call this between
    units of work so an interrupt doesn't have to wait for every remaining
    tile to run its denoise."""
    fn = getattr(callback, "should_stop", None)
    try:
        return bool(fn and fn())
    except Exception:
        return False


def to_d(x, sigma, denoised):
    """Euler derivative (src/Utilities/util.py:26)."""
    return (x - denoised) / sigma


# compiled sampler-loop cache (see sample(): keyed by denoiser cache_key +
# sampler statics; entries are jax.jit wrappers whose arrays all arrive via
# the jit_args argument, so reuse across calls is sound). Bounded: in a
# long serving session every distinct (model, sampler, options) combo adds
# a wrapper holding compiled executables; evict oldest past the cap.


class _BoundedCache(dict):
    """LRU-bounded: a hit refreshes recency, so the hot runner for the
    resident model is never the one evicted."""

    MAX = 64

    def __getitem__(self, key):
        value = super().__getitem__(key)
        # re-insert to mark most-recently-used (dict preserves order)
        super().__delitem__(key)
        super().__setitem__(key, value)
        return value

    def __setitem__(self, key, value):
        if key in self:
            super().__delitem__(key)
        elif len(self) >= self.MAX:
            oldest = next(iter(self))
            super().__delitem__(oldest)
        super().__setitem__(key, value)


_RUNNER_CACHE: dict = _BoundedCache()


# ---------------------------------------------------------------------------
# Multi-scale plan
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class MultiScale:
    """Multi-scale diffusion settings (multiscale_presets.py:49-86)."""

    enabled: bool = False
    factor: float = 0.5
    fullres_start: int = 3
    fullres_end: int = 8
    intermittent: bool = False

    @staticmethod
    def preset(name: str) -> "MultiScale":
        # values from the reference preset table (multiscale_presets.py:49-86)
        presets = {
            "quality": MultiScale(True, 0.5, 10, 8, True),
            "performance": MultiScale(True, 0.25, 5, 8, True),
            "balanced": MultiScale(True, 0.5, 5, 8, True),
            "disabled": MultiScale(False, 1.0, 0, 0, False),
        }
        return presets[name]


def scaled_dims(h: int, w: int, factor: float) -> Tuple[int, int]:
    """Latent dims snapped to multiples of 8 (samplers.py:51-61)."""
    return (
        int(max(8, ((h * factor) // 8) * 8)),
        int(max(8, ((w * factor) // 8) * 8)),
    )


def fullres_flags(n_steps: int, ms: MultiScale, h: int, w: int) -> np.ndarray:
    """Per-step full-resolution booleans (should_use_fullres parity,
    samplers.py:88-109)."""
    if not ms.enabled or not (0.1 <= ms.factor <= 1.0):
        return np.ones(n_steps, dtype=bool)
    sh, sw = scaled_dims(h, w, ms.factor)
    if (sh, sw) == (h, w):
        return np.ones(n_steps, dtype=bool)
    flags = np.zeros(n_steps, dtype=bool)
    for i in range(n_steps):
        if i < ms.fullres_start or i >= n_steps - ms.fullres_end:
            flags[i] = True
        elif ms.intermittent:
            flags[i] = (i - ms.fullres_start) % 2 == 0
    return flags


def segment_flags(flags: np.ndarray) -> List[Tuple[int, int, bool]]:
    """Contiguous (start, end, fullres) runs."""
    segs = []
    i = 0
    n = len(flags)
    while i < n:
        j = i
        while j < n and flags[j] == flags[i]:
            j += 1
        segs.append((i, j, bool(flags[i])))
        i = j
    return segs


# ---------------------------------------------------------------------------
# Per-step constants (host-side, from the numpy sigma schedule)
# ---------------------------------------------------------------------------


def _step_consts(sigmas: np.ndarray, eta: float, r: float = 0.5) -> dict:
    """Everything any sampler needs, per step, as float32 numpy arrays."""
    sig = np.asarray(sigmas, dtype=np.float64)
    n = len(sig) - 1
    c = {
        "sigma": sig[:-1],
        "sigma_next": sig[1:],
        "is_last": (sig[1:] == 0).astype(np.float64),
    }
    # ancestral split
    sd = np.zeros(n)
    su = np.zeros(n)
    for i in range(n):
        sd[i], su[i] = schedules.get_ancestral_step(sig[i], sig[i + 1], eta)
    c["sigma_down"], c["sigma_up"] = sd, su
    # dpmpp_2m exponential integrator
    with np.errstate(divide="ignore", over="ignore", invalid="ignore"):
        t = -np.log(np.maximum(sig, 1e-38))
        h = t[1:] - t[:-1]
        c["ratio"] = np.where(sig[:-1] > 0, sig[1:] / sig[:-1], 0.0)
        c["h_expm1"] = np.expm1(-np.minimum(h, 80.0))
        c["h"] = h
        h_prev = np.concatenate([[np.nan], h[:-1]])
        c["h_ratio"] = np.where(
            np.isfinite(h_prev / (2 * h)), h_prev / (2 * h), 0.0
        )
        # dpmpp_sde two-stage quantities
        t_ = t[:-1]
        t_next = t[1:]
        s = t_ + (t_next - t_) * r
        sig_s = np.exp(-s)
        sd1 = np.zeros(n)
        su1 = np.zeros(n)
        sd2 = np.zeros(n)
        su2 = np.zeros(n)
        for i in range(n):
            if sig[i + 1] == 0:
                continue
            sd1[i], su1[i] = schedules.get_ancestral_step(sig[i], sig_s[i], eta)
            sd2[i], su2[i] = schedules.get_ancestral_step(sig[i], sig[i + 1], eta)
        s_ = -np.log(np.maximum(sd1, 1e-38))
        t_next_ = -np.log(np.maximum(sd2, 1e-38))
        last = sig[1:] == 0
        c["sde_sigma_mid"] = np.where(last, sig[:-1], sig_s)
        c["sde_fac1"] = np.where(last, 0.0, sd1 / np.maximum(sig[:-1], 1e-38))
        # expm1(t - s_) — negative; update is x2 = fac1*x - expm1_1*den + noise
        c["sde_expm1_1"] = np.where(last, 0.0, np.expm1(np.maximum(t_ - s_, -80.0)))
        c["sde_su1"] = su1
        c["sde_fac2"] = np.where(last, 0.0, sd2 / np.maximum(sig[:-1], 1e-38))
        c["sde_expm1_2"] = np.where(
            last, 0.0, np.expm1(np.maximum(t_ - t_next_, -80.0))
        )
        c["sde_su2"] = su2
        # sde h_ratio for true-cfg++ momentum: (t - s_) / (2*(t - t_next)).
        # Numerator and denominator are both negative (t increases as sigma
        # falls), so guard by |den| — clamping with maximum() would wipe out
        # the negative denominator entirely.
        den = 2.0 * (t_ - t_next)
        safe_den = np.where(np.abs(den) > 1e-12, den, 1.0)
        c["sde_h_ratio"] = np.where(
            (sig[1:] > 0) & (np.abs(den) > 1e-12), (t_ - s_) / safe_den, 0.0
        )
    return {k: np.asarray(v, dtype=np.float32) for k, v in c.items()}


# ---------------------------------------------------------------------------
# Step functions. Carry: (x, old_denoised, old_uncond). xs: consts + noise.
# ---------------------------------------------------------------------------


def _cfg_combine(denoised, uncond, old_den, old_unc, cs, cfg_w, true_cfgpp, momentum_fn):
    """Reference-effective (identity) or true-CFG++ combination."""
    if not true_cfgpp:
        return denoised
    momentum = momentum_fn(denoised, old_den)
    uncond_momentum = momentum_fn(uncond, old_unc)
    cfgpp = uncond_momentum + (momentum - uncond_momentum) * cfg_w
    # first/last steps fall back to the plain result
    use_plain = jnp.logical_or(jnp.isnan(jnp.sum(old_unc)), cs["is_last"] > 0)
    return jnp.where(use_plain, denoised, cfgpp)


def _euler_step(carry, cs, denoise, *, ancestral, true_cfgpp, cfg_w, s_noise=1.0):
    x, old_den, old_unc = carry
    sigma = cs["sigma"]
    denoised, uncond = denoise(x, sigma)
    cfg_den = _cfg_combine(
        denoised, uncond, old_den, old_unc, cs, cfg_w, true_cfgpp,
        momentum_fn=lambda d, od: d,
    )
    if ancestral:
        d = to_d(x, sigma, cfg_den)
        x = x + d * (cs["sigma_down"] - sigma)
        x = x + cs["noise"] * (s_noise * cs["sigma_up"])
    else:
        d = to_d(x, sigma, cfg_den)
        x = x + d * (cs["sigma_next"] - sigma)
    return (x, denoised, uncond)


def _dpmpp_2m_step(carry, cs, denoise, *, true_cfgpp, cfg_w):
    x, old_den, old_unc = carry
    denoised, uncond = denoise(x, cs["sigma"])
    cfg_den = _cfg_combine(
        denoised, uncond, old_den, old_unc, cs, cfg_w, true_cfgpp,
        momentum_fn=lambda d, od: (1 + cs["h_ratio"]) * d - cs["h_ratio"] * od,
    )
    x = cs["ratio"] * x - cs["h_expm1"] * cfg_den
    return (x, denoised, uncond)


def _dpmpp_sde_step(carry, cs, denoise, st, *, true_cfgpp, cfg_w, r=0.5,
                    s_noise=1.0):
    """Two-stage DPM++ SDE step (samplers.py:1120-1240). ``denoise`` is the
    state-threading form ``(x, sigma, st) -> (den, unc, st)``; the midpoint
    model call runs INSIDE a lax.cond branch, so its state must flow
    through the cond's outputs — a mutable box assigned in the branch
    would leak a tracer out of the sub-trace (stateful/FBCache denoisers)."""
    x, old_den, old_unc = carry
    sigma = cs["sigma"]
    denoised, uncond, st = denoise(x, sigma, st)

    def last_step(st):
        d = to_d(x, sigma, denoised)
        return x + d * (cs["sigma_next"] - sigma), st

    def sde_step(st):
        cfg_den = _cfg_combine(
            denoised, uncond, old_den, old_unc, cs, cfg_w, true_cfgpp,
            momentum_fn=lambda d, od: (1 + cs["sde_h_ratio"]) * d
            - cs["sde_h_ratio"] * od,
        )
        x2 = (
            cs["sde_fac1"] * x
            - cs["sde_expm1_1"] * cfg_den
            + cs["noise1"] * (s_noise * cs["sde_su1"])
        )
        denoised2, uncond2, st2 = denoise(x2, cs["sde_sigma_mid"], st)
        cfg_den2 = _cfg_combine(
            denoised2, uncond2, denoised, uncond, cs, cfg_w, true_cfgpp,
            momentum_fn=lambda d, od: (1 + cs["sde_h_ratio"]) * d
            - cs["sde_h_ratio"] * od,
        )
        mix = (1 - 1 / (2 * r)) * cfg_den + (1 / (2 * r)) * cfg_den2
        return (
            cs["sde_fac2"] * x
            - cs["sde_expm1_2"] * mix
            + cs["noise2"] * (s_noise * cs["sde_su2"])
        ), st2

    x, st = jax.lax.cond(cs["is_last"] > 0, last_step, sde_step, st)
    return (x, denoised, uncond), st


def _dy_extra_step(x, denoise_half, cs):
    """dy_sampling_step_cfg_pp (samplers.py:362-466): euler-update only the
    (1,1) pixel of every 2x2 block, with the model run at half resolution.
    Odd trailing row/col is left untouched (the reference preserves it)."""
    b, h, w, ch = x.shape
    m, n = h // 2, w // 2
    c = x[:, 1 : 2 * m : 2, 1 : 2 * n : 2, :]
    denoised, _ = denoise_half(c, cs["sigma"])
    d = to_d(c, cs["sigma"], denoised)
    c = c + d * (cs["sigma_next"] - cs["sigma"])
    return x.at[:, 1 : 2 * m : 2, 1 : 2 * n : 2, :].set(c)


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SamplerOptions:
    eta: float = 1.0
    s_noise: float = 1.0
    r: float = 0.5
    cfg_scale: float = 7.5
    cfg_min: float = 1.0
    cfg_x0_scale: float = 1.0
    true_cfgpp: bool = False
    s_extra_steps: bool = True  # "dy" extra checkerboard steps


def sample(
    denoise_fn: Callable,
    x,
    sigmas: np.ndarray,
    sampler: str = "euler",
    ms: MultiScale = MultiScale(),
    step_noise=None,  # (n, *x.shape) ancestral noise
    sde_noise: Optional[Tuple] = None,  # (noise1, noise2) for dpmpp_sde
    opts: SamplerOptions = SamplerOptions(),
    callback: Optional[Callable] = None,
):
    """Run a sampler loop. ``denoise_fn(x, sigma_batch) -> (denoised, uncond)``
    is the CFG guider product. Returns the final latent (full resolution).

    With ``callback`` (progress/preview) the loop runs eagerly (one jitted
    step per iteration); otherwise segments run as ``lax.scan`` programs.
    """
    sampler = SAMPLER_ALIASES.get(sampler, sampler)
    if sampler not in SAMPLER_NAMES:
        raise ValueError(f"unknown sampler {sampler!r}")
    sigmas = np.asarray(sigmas, dtype=np.float32)
    n_steps = len(sigmas) - 1
    if n_steps <= 0:
        return x

    b, h, w, ch = x.shape
    is_ms_sampler = sampler in (
        "euler",
        "euler_ancestral",
        "dpmpp_2m",
        "dpmpp_2m_cfgpp",
        "dpmpp_sde",
        "dpmpp_sde_cfgpp",
        "euler_dy_cfg_pp",  # dy runs fullres but keeps flags for parity
    )
    flags = (
        fullres_flags(n_steps, ms, h, w)
        if is_ms_sampler and sampler != "euler_dy_cfg_pp"
        else np.ones(n_steps, dtype=bool)
    )
    sh, sw = scaled_dims(h, w, ms.factor) if ms.enabled else (h, w)

    consts = _step_consts(sigmas, opts.eta, opts.r)
    # per-step cfg schedule (cfg -> cfg_min), used only by true_cfgpp
    steps = np.arange(n_steps, dtype=np.float32)
    cfg_sched = (
        opts.cfg_scale
        + (opts.cfg_min - opts.cfg_scale) * steps / max(n_steps, 1)
    ) * opts.cfg_x0_scale

    ancestral = sampler in (
        "euler_ancestral",
        "euler_ancestral_cfg_pp",
        "euler_ancestral_dy_cfg_pp",
    )
    is_sde = sampler in ("dpmpp_sde", "dpmpp_sde_cfgpp")
    is_2m = sampler in ("dpmpp_2m", "dpmpp_2m_cfgpp")
    is_dy = sampler == "euler_dy_cfg_pp"

    if step_noise is None and (ancestral):
        step_noise = np.zeros((n_steps,) + x.shape, dtype=np.float32)
    if is_sde and sde_noise is None:
        sde_noise = (
            np.zeros((n_steps,) + x.shape, dtype=np.float32),
            np.zeros((n_steps,) + x.shape, dtype=np.float32),
        )

    # stateful denoisers (FBCache) expose init_state(x_at_call_shape) and a
    # 3-arg call (x, sigma, state) -> (den, unc, state); normalize both forms.
    # Denoisers with .jit_args/.call_with get their arrays threaded as jit
    # ARGUMENTS and their compiled loops cached across calls (cfg.CFGDenoiser
    # docstring explains why this is critical on TPU).
    stateful = hasattr(denoise_fn, "init_state")
    has_jit_args = hasattr(denoise_fn, "jit_args")
    jit_args = denoise_fn.jit_args if has_jit_args else ()

    # Capture the denoiser's PURE function when it exposes one: the cached
    # jitted runners close over `raw`; closing over the denoiser OBJECT
    # would pin its .jit_args bundle (the full multi-GB param pytree) in
    # _RUNNER_CACHE long after the model is unloaded. pure_fn closes over
    # model CODE only — params arrive via the ja argument. (Denoisers
    # without pure_fn also have no cache_key, so their closures are never
    # cached and die with the call.)
    pure_fn = getattr(denoise_fn, "pure_fn", None)

    def make_step(fullres: bool):
        if pure_fn is not None and stateful:

            def raw(ja, xx, ss, st):
                return pure_fn(ja, xx, ss, st)

        elif pure_fn is not None:

            def raw(ja, xx, ss, st):
                d, u = pure_fn(ja, xx, ss)
                return d, u, st

        elif stateful and has_jit_args:

            def raw(ja, xx, ss, st):
                return denoise_fn.call_with(ja, xx, ss, st)

        elif stateful:

            def raw(ja, xx, ss, st):
                return denoise_fn(xx, ss, st)

        elif has_jit_args:

            def raw(ja, xx, ss, st):
                d, u = denoise_fn.call_with(ja, xx, ss)
                return d, u, st

        else:

            def raw(ja, xx, ss, st):
                d, u = denoise_fn(xx, ss)
                return d, u, st

        if fullres:
            scaled = raw
        else:

            def scaled(ja, xx, ss, st):
                xd = nn.interpolate_bilinear(xx, (sh, sw))
                d, u, st = raw(ja, xd, ss, st)
                return (
                    nn.interpolate_bilinear(d, (h, w)),
                    nn.interpolate_bilinear(u, (h, w)),
                    st,
                )

        def step(ja, carry, cs):
            inner, st = carry
            cs = dict(cs)
            cfg_w = cs.pop("cfg_w")
            box = [st]

            def den(xx, ss):
                d, u, s2 = scaled(ja, xx, ss, box[0])
                box[0] = s2
                return d, u

            if is_sde:
                # state threads through the step explicitly: the midpoint
                # model call runs inside a lax.cond branch, where a box
                # assignment would leak the branch tracer
                new_inner, new_st = _dpmpp_sde_step(
                    inner, cs, lambda xx, ss, s: scaled(ja, xx, ss, s), st,
                    true_cfgpp=opts.true_cfgpp, cfg_w=cfg_w, r=opts.r,
                    s_noise=opts.s_noise,
                )
                return (new_inner, new_st), None
            elif is_2m:
                new_inner = _dpmpp_2m_step(
                    inner, cs, den, true_cfgpp=opts.true_cfgpp, cfg_w=cfg_w
                )
            else:
                new_inner = _euler_step(
                    inner, cs, den, ancestral=ancestral,
                    true_cfgpp=opts.true_cfgpp, cfg_w=cfg_w,
                    s_noise=opts.s_noise,
                )
            return (new_inner, box[0]), None

        return step

    # compiled-loop cache: reuse across sample() calls that share all trace
    # -relevant statics (denoiser cache_key + sampler config); shape changes
    # retrace automatically inside jax.jit.
    base_key = (
        getattr(denoise_fn, "cache_key", None),
        sampler,
        opts,
        ms if ms.enabled else None,
        # latent dims are CLOSURE CONSTANTS of the step functions (the
        # low-res (sh, sw) interpolation targets, the dy checkerboard
        # split) — a runner cached for one latent size must never serve
        # another
        tuple(x.shape),
    )

    def get_runner(fullres: bool):
        key = (base_key, fullres, "scan")
        if base_key[0] is None:
            # uncachable denoiser: still jit (with the scoped-vmem option —
            # quant-matmul tiles are budgeted for it), just don't store it
            step = make_step(fullres)
            return _config.ldt_jit(
                lambda ja, carry, xs: jax.lax.scan(
                    lambda c, s: step(ja, c, s), carry, xs
                )
            )
        if key not in _RUNNER_CACHE:
            step = make_step(fullres)
            _RUNNER_CACHE[key] = _config.ldt_jit(
                lambda ja, carry, xs: jax.lax.scan(
                    lambda c, s: step(ja, c, s), carry, xs
                )
            )
        return _RUNNER_CACHE[key]

    def get_step_runner(fullres: bool):
        key = (base_key, fullres, "step")
        if base_key[0] is None:
            return _config.ldt_jit(make_step(fullres))
        if key not in _RUNNER_CACHE:
            _RUNNER_CACHE[key] = _config.ldt_jit(make_step(fullres))
        return _RUNNER_CACHE[key]

    def init_segment_state(fullres: bool):
        if not stateful:
            return jnp.zeros(())
        shape = (b, h, w, ch) if fullres else (b, sh, sw, ch)
        return denoise_fn.init_state(jnp.zeros(shape, jnp.float32))

    def xs_for(i0, i1):
        xs = {
            k: jnp.asarray(v[i0:i1])
            for k, v in consts.items()
        }
        xs["cfg_w"] = jnp.asarray(cfg_sched[i0:i1])
        if ancestral:
            xs["noise"] = jnp.asarray(step_noise[i0:i1])
        if is_sde:
            xs["noise1"] = jnp.asarray(sde_noise[0][i0:i1])
            xs["noise2"] = jnp.asarray(sde_noise[1][i0:i1])
        return xs

    nanfill = jnp.full_like(x, jnp.nan, dtype=jnp.float32)
    inner = (x.astype(jnp.float32), nanfill, nanfill)

    def get_dy_extra_runner():
        """One compiled program for the whole half-res checkerboard extra
        step (dy_sampling_step_cfg_pp). Calling the denoiser's raw
        ``__call__`` here would run the full model EAGERLY — op-by-op
        dispatch over a relay-attached TPU cost ~20 s per extra step on
        12B Flux; jitted it is one dispatch."""

        # dispatch chosen OUTSIDE fn: a cached fn must close over pure_fn
        # only — naming denoise_fn anywhere in fn's body would capture it
        # (and its params bundle) in the cached closure
        if pure_fn is not None and stateful:

            def call_den(ja, c, ss, box):
                d, u, box[0] = pure_fn(ja, c, ss, box[0])
                return d, u

        elif pure_fn is not None:

            def call_den(ja, c, ss, box):
                return pure_fn(ja, c, ss)

        elif stateful and has_jit_args:

            def call_den(ja, c, ss, box):
                d, u, box[0] = denoise_fn.call_with(ja, c, ss, box[0])
                return d, u

        elif stateful:

            def call_den(ja, c, ss, box):
                d, u, box[0] = denoise_fn(c, ss, box[0])
                return d, u

        elif has_jit_args:

            def call_den(ja, c, ss, box):
                return denoise_fn.call_with(ja, c, ss)

        else:

            def call_den(ja, c, ss, box):
                return denoise_fn(c, ss)

        def fn(ja, xx, sigma, sigma_next, st):
            box = [st]

            def half_den(c, ss):
                return call_den(ja, c, ss, box)

            return _dy_extra_step(
                xx, half_den, {"sigma": sigma, "sigma_next": sigma_next}
            )

        key = (base_key, "dy_extra")
        if base_key[0] is None:
            return _config.ldt_jit(fn)
        if key not in _RUNNER_CACHE:
            _RUNNER_CACHE[key] = _config.ldt_jit(fn)
        return _RUNNER_CACHE[key]

    def run_dy_extra(inner, i):
        if stateful:
            m_, n_ = inner[0].shape[1] // 2, inner[0].shape[2] // 2
            tmp = denoise_fn.init_state(jnp.zeros((b, m_, n_, ch), jnp.float32))
        else:
            tmp = jnp.zeros(())
        runner = get_dy_extra_runner()
        new_x = runner(
            jit_args,
            inner[0],
            jnp.asarray(sigmas[i], jnp.float32),
            jnp.asarray(sigmas[i + 1], jnp.float32),
            tmp,
        )
        return (new_x,) + inner[1:]

    dy_extra_steps = {
        i
        for i in range(n_steps)
        if is_dy and opts.s_extra_steps and sigmas[i + 1] > 0 and i // 2 == 1
    }

    chunk = int(getattr(callback, "chunk", 0) or 0)

    if callback is None and not dy_extra_steps:
        # scan mode: one compiled program per (segment length, resolution)
        for i0, i1, fullres in segment_flags(flags):
            runner = get_runner(fullres)
            carry = (inner, init_segment_state(fullres))
            carry, _ = runner(jit_args, carry, xs_for(i0, i1))
            inner = carry[0]
    elif callback is not None and chunk > 1:
        # chunked scan: compiled segments of up to `chunk` steps with the
        # callback invoked between them — previews/progress/interrupt at
        # chunk granularity WITHOUT the per-step eager dispatch the plain
        # callback path pays (the webui/preview default)
        marks = {0, n_steps}
        for i0, i1, _fr in segment_flags(flags):
            marks.update((i0, i1))
        for i in dy_extra_steps:
            marks.update((i, i + 1))
        marks.update(range(chunk, n_steps, chunk))
        bounds = sorted(marks)
        seg_state = None
        last_fullres = None
        # NB: loop bounds must NOT be named a/b — `b` is the batch size the
        # init_segment_state/run_dy_extra closures read at call time
        for seg_a, seg_b in zip(bounds[:-1], bounds[1:]):
            fullres = bool(flags[seg_a])
            if seg_state is None or fullres != last_fullres:
                seg_state = init_segment_state(fullres)
                last_fullres = fullres
            if seg_a in dy_extra_steps:
                step = get_step_runner(True)
                xs = {k: v[0] for k, v in xs_for(seg_a, seg_a + 1).items()}
                carry, _ = step(jit_args, (inner, seg_state), xs)
                inner, seg_state = carry
                inner = run_dy_extra(inner, seg_a)
            else:
                runner = get_runner(fullres)
                carry, _ = runner(
                    jit_args, (inner, seg_state), xs_for(seg_a, seg_b)
                )
                inner, seg_state = carry
            try:
                callback(
                    {
                        "x": inner[0],
                        "i": seg_b - 1,
                        "sigma": float(sigmas[seg_b - 1]),
                        "denoised": inner[1],
                        "chunk": chunk,
                    }
                )
            except SampleInterrupted:
                break
    elif callback is None:
        # dy scan mode: everything runs as lax.scan segments except the two
        # checkerboard-extra steps, which need a host-interleaved half-res
        # model call. One dispatch per segment instead of one per step —
        # over a relay-attached TPU the per-step dispatch of a ~1000-leaf
        # param pytree dominated the whole Flux denoise (device was idle
        # ~90% of the run).
        boundaries = sorted(dy_extra_steps)
        step_runner = get_step_runner(True)
        runner = get_runner(True)
        state = init_segment_state(True)
        i = 0
        while i < n_steps:
            if i in dy_extra_steps:
                xs = {k: v[0] for k, v in xs_for(i, i + 1).items()}
                (inner, state), _ = step_runner(jit_args, (inner, state), xs)
                inner = run_dy_extra(inner, i)
                i += 1
            else:
                j = min([bx for bx in boundaries if bx > i] + [n_steps])
                (inner, state), _ = runner(jit_args, (inner, state), xs_for(i, j))
                i = j
    else:
        # eager mode with callbacks (previews/progress) or dy extra steps
        seg_state = None
        last_fullres = None
        for i in range(n_steps):
            fullres = bool(flags[i])
            if seg_state is None or fullres != last_fullres:
                seg_state = init_segment_state(fullres)
                last_fullres = fullres
            step = get_step_runner(fullres)
            xs = {k: v[0] for k, v in xs_for(i, i + 1).items()}
            (inner, seg_state), _ = step(jit_args, (inner, seg_state), xs)
            if i in dy_extra_steps:
                inner = run_dy_extra(inner, i)
            if callback is not None:
                try:
                    callback(
                        {
                            "x": inner[0],
                            "i": i,
                            "sigma": float(sigmas[i]),
                            "denoised": inner[1],
                        }
                    )
                except SampleInterrupted:
                    # the reference's (inert) interrupt_flag check returns
                    # the partial latent mid-loop (samplers.py:120-125);
                    # here a callback raises to stop — and it actually works
                    break
    return inner[0]
