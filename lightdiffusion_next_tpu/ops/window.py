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


def make_msw_msa_override(
    blocks=SD15_BLOCKS,
    shift_idx=0,
    attention_core=None,
):
    """Build an attn1 override. ``shift_idx``: python int or traced scalar
    (derived from the timestep by the denoiser)."""
    core = attention_core or attn_ops.attention
    block_set = set(blocks)

    def override(q, k, v, heads: int, block=None, hw=None):
        applies = (
            block in block_set
            and hw is not None
            and hw[0] % 2 == 0
            and hw[1] % 2 == 0
            and q.shape == k.shape  # self-attention only
        )
        if not applies:
            # incompatible latent (odd dims): skip, like scale_mode="skip"
            return core(q, k, v, heads)
        shift = shift_for_index(hw, shift_idx)
        qw = window_partition(q, hw, shift)
        kw = window_partition(k, hw, shift)
        vw = window_partition(v, hw, shift)
        out = core(qw, kw, vw, heads)
        return window_reverse(out, hw, shift)

    return override


_MSW_FACTORY_CACHE = {}


def make_msw_msa_factory(blocks=SD15_BLOCKS):
    """Timestep-indexed factory for the CFG denoiser: shift rotates 0-3 with
    the discrete timestep (deterministic stand-in for the reference's RNG).

    Memoized per ``blocks``: the denoiser cache key includes
    ``id(attn1_override_factory)``, so a fresh factory object per
    pipeline() call would miss the compiled-sampler-loop cache and retrace
    the whole program on EVERY image."""
    key = tuple(blocks)
    if key not in _MSW_FACTORY_CACHE:

        def factory(t):
            idx = jnp.mod(jnp.floor(jnp.max(t)).astype(jnp.int32), 4)
            return make_msw_msa_override(blocks=blocks, shift_idx=idx)

        _MSW_FACTORY_CACHE[key] = factory
    return _MSW_FACTORY_CACHE[key]
