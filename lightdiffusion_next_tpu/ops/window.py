"""MSW-MSA windowed self-attention (HiDiffusion).

Counterpart of src/hidiffusion/msw_msa_attention.py:417-790: Swin-style 2x2
window partition with a per-step shift, applied to attn1 of selected UNet
blocks (SD15 preset: input 1,2 / output 9,10,11 — SIMPLE_PRESETS, :96-99).

Design notes (TPU-first, and fixing the reference's inert-patch bug — its
attn1 patches are registered but never consumed, SURVEY §2 "Noted inert
code"): the windowing is implemented FUNCTIONALLY as an attention-core
override threaded through models.unet. Window partition commutes with the
per-token q/k/v projections, so windowing q/k/v is equivalent to windowing
the block input. The per-step shift index is a deterministic function of the
timestep (the reference draws CPU RNG per step, msw_msa_attention.py:578-607
— unreproducible and irrelevant to quality; we rotate through the same 4
shifts).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from lightdiffusion_next_tpu.ops import attention as attn_ops

SD15_BLOCKS = (("input", 1), ("input", 2), ("output", 9), ("output", 10), ("output", 11))
SDXL_BLOCKS = (("input", 4), ("input", 5), ("output", 3), ("output", 4), ("output", 5))


def window_partition(x, hw: Tuple[int, int], shift: Tuple):
    """(B, H*W, C) -> (B*4, H/2*W/2, C) with roll by -shift
    (window_partition parity, msw_msa_attention.py:417-480)."""
    b, l, c = x.shape
    h, w = hw
    wh, ww = h // 2, w // 2
    x = x.reshape(b, h, w, c)
    x = jnp.roll(x, shift=(-shift[0], -shift[1]), axis=(1, 2))
    x = x.reshape(b, 2, wh, 2, ww, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b * 4, wh * ww, c)
    return x


def window_reverse(windows, hw: Tuple[int, int], shift: Tuple):
    """Inverse of window_partition (:481-533)."""
    h, w = hw
    wh, ww = h // 2, w // 2
    b4, l, c = windows.shape
    b = b4 // 4
    x = windows.reshape(b, 2, 2, wh, ww, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)
    x = jnp.roll(x, shift=(shift[0], shift[1]), axis=(1, 2))
    return x.reshape(b, h * w, c)


def shift_for_index(hw: Tuple[int, int], idx):
    """Shift sizes for index 0-3 (get_window_args, :568-577). ``idx`` may be
    a traced int scalar — jnp.roll accepts dynamic shifts."""
    wh, ww = hw[0] // 2, hw[1] // 2
    return ((wh // 4) * idx, (ww // 4) * idx)


def _rescale_tokens(x, src_hw: Tuple[int, int], dst_hw: Tuple[int, int]):
    """Resample a (B, H*W, C) token grid to new spatial dims — the
    reference's odd-dim workaround (scale_samples via window_partition,
    msw_msa_attention.py:455-467; default scale_mode "nearest-exact",
    Preset :73 — jax.image "nearest" has the same center-aligned
    semantics)."""
    b, _, c = x.shape
    g = x.reshape(b, src_hw[0], src_hw[1], c)
    g = jax.image.resize(g, (b, dst_hw[0], dst_hw[1], c), method="nearest")
    return g.reshape(b, dst_hw[0] * dst_hw[1], c)


def make_msw_msa_override(
    blocks=SD15_BLOCKS,
    shift_idx=0,
    attention_core=None,
    active=None,
):
    """Build an attn1 override.

    ``shift_idx``: python int or traced scalar (derived from the timestep
    by the denoiser). ``active``: optional traced bool — the sigma-window
    gate (check_time, hidiffusion/utils.py:129-143); when given, the
    windowed and plain paths are selected per step via lax.cond so gated
    steps pay only plain attention.

    Odd latent dims take the reference's rescale workaround
    (hidiffusion/utils.py:167 rescale_size + scale_mode): the token grid is
    resampled to the even-dim (2*ceil(h/2), 2*ceil(w/2)) grid, windowed,
    and resampled back — instead of skipping the optimization entirely."""
    core = attention_core or attn_ops.attention
    block_set = set(blocks)

    def override(q, k, v, heads: int, block=None, hw=None):
        applies = (
            block in block_set
            and hw is not None
            and q.shape == k.shape  # self-attention only
        )
        if not applies:
            return core(q, k, v, heads)
        h, w = hw
        eh, ew = ((h + 1) // 2) * 2, ((w + 1) // 2) * 2

        def windowed(args):
            qq, kk, vv = args
            if (eh, ew) != (h, w):
                qq, kk, vv = (
                    _rescale_tokens(x, (h, w), (eh, ew)) for x in (qq, kk, vv)
                )
            shift = shift_for_index((eh, ew), shift_idx)
            out = core(
                window_partition(qq, (eh, ew), shift),
                window_partition(kk, (eh, ew), shift),
                window_partition(vv, (eh, ew), shift),
                heads,
            )
            out = window_reverse(out, (eh, ew), shift)
            if (eh, ew) != (h, w):
                out = _rescale_tokens(out, (eh, ew), (h, w))
            return out

        if active is None:
            return windowed((q, k, v))
        return jax.lax.cond(
            active, windowed, lambda args: core(*args, heads), (q, k, v)
        )

    return override


_MSW_FACTORY_CACHE = {}


def make_msw_msa_factory(
    blocks=SD15_BLOCKS,
    model_sampling=None,
    start_percent: float = 0.2,
    end_percent: float = 1.0,
):
    """Timestep-indexed factory for the CFG denoiser: shift rotates 0-3 with
    the discrete timestep (deterministic stand-in for the reference's RNG).

    ``model_sampling`` + percents add the reference's sigma-window gate
    (SIMPLE_PRESETS start_time 0.2 / end_time 1.0, msw_msa_attention.py:71-72;
    check_time: active iff end_sigma <= sigma <= start_sigma) — windowing
    is OFF for the first ~20% of the trajectory, where structure forms.
    Without model_sampling the override is always active (legacy behavior).

    Memoized per (blocks, gate bounds): the denoiser cache key includes
    ``id(attn1_override_factory)``, so a fresh factory object per
    pipeline() call would miss the compiled-sampler-loop cache and retrace
    the whole program on EVERY image."""
    if model_sampling is not None:
        # sigma bounds -> timestep bounds on the host (timestep() is
        # monotone in sigma, so gating on the traced t is equivalent;
        # model_sampling.sigma() is host-numpy and can't see tracers)
        start_sigma = float(model_sampling.percent_to_sigma(start_percent))
        end_sigma = float(model_sampling.percent_to_sigma(end_percent))
        t_hi = float(model_sampling.timestep(jnp.float32(start_sigma)))
        t_lo = float(
            model_sampling.timestep(jnp.float32(max(end_sigma, 1e-20)))
        )
        bounds = (t_lo, t_hi)
    else:
        bounds = None
    key = (tuple(blocks), bounds)
    if key not in _MSW_FACTORY_CACHE:

        def factory(t):
            idx = jnp.mod(jnp.floor(jnp.max(t)).astype(jnp.int32), 4)
            active = None
            if bounds is not None:
                tm = jnp.max(jnp.asarray(t, jnp.float32))
                active = jnp.logical_and(tm <= bounds[1], tm >= bounds[0])
            return make_msw_msa_override(
                blocks=blocks, shift_idx=idx, active=active
            )

        _MSW_FACTORY_CACHE[key] = factory
    return _MSW_FACTORY_CACHE[key]
