"""Attention entry points.

Counterpart of src/Attention/AttentionMethods.py (xformers/SDPA dispatch) and
src/Attention/Attention.py (CrossAttention, VAE AttnBlock). On TPU the
"kernel choice" is Pallas flash attention vs plain XLA attention; the
xformers path has no analog (XLA fuses QK^T+softmax+V well on its own, and
the Pallas kernel exists for the long-sequence regime where VMEM blocking
wins).

All functions take "folded" tensors (B, L, heads*dim) like the reference's
attention_pytorch (AttentionMethods.py:107-140) so model code is layout-free.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from lightdiffusion_next_tpu import config as _config


def _unfold_heads(x, heads: int):
    b, l, inner = x.shape
    return x.reshape(b, l, heads, inner // heads).transpose(0, 2, 1, 3)


def _fold_heads(x):
    b, h, l, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * d)


def attention_xla(q, k, v, heads: int, mask: Optional[jax.Array] = None):
    """Scaled dot-product attention via plain XLA einsum.

    Matches attention_pytorch (AttentionMethods.py:107): fold heads, softmax
    in fp32, scale 1/sqrt(head_dim).
    """
    q, k, v = (_unfold_heads(t, heads) for t in (q, k, v))
    out = sdpa(q, k, v, mask=mask)
    return _fold_heads(out)


def sdpa(q, k, v, mask: Optional[jax.Array] = None):
    """(B, H, Lq, D) x (B, H, Lk, D) attention with fp32 softmax."""
    scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * scale
    if mask is not None:
        logits = logits + mask.astype(logits.dtype)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def _flash_kernel(head_dim: int = 0):
    """The active long-sequence Pallas kernel: bf16 flash attention, the
    int8 variant when RuntimeConfig.sage_attention is on (opt-in), or the
    head-packed variant when packed_attn resolves on and the head dim
    packs >= 2 per 128-lane tile (SD1.5 d=40 -> 3; TPU default since the
    VPU-lean softmax made the pack's MAC saving visible — config.py)."""
    cfg = _config.get_config()
    if cfg.sage_attention:
        from lightdiffusion_next_tpu.ops import sage_attention as sa

        return sa.sage_attention
    from lightdiffusion_next_tpu.ops import flash_attention as fa

    if cfg.resolve_packed_attn() and fa.pack_group(head_dim) >= 2:
        return fa.packed_flash_attention
    return fa.flash_attention


def attention_pallas(q, k, v, heads: int, mask: Optional[jax.Array] = None):
    """Pallas flash-attention path; falls back to XLA when unavailable
    (CPU tests, tiny/ragged shapes, or masked attention)."""
    from lightdiffusion_next_tpu.ops import flash_attention as fa

    q4, k4, v4 = (_unfold_heads(t, heads) for t in (q, k, v))
    if mask is None and fa.supported(q4, k4, v4):
        return _fold_heads(_flash_kernel(q4.shape[-1])(q4, k4, v4))
    return _fold_heads(sdpa(q4, k4, v4, mask=mask))


def attention(q, k, v, heads: int, mask: Optional[jax.Array] = None):
    """Backend-dispatching attention (Attention.py:34-41 parity point)."""
    backend = _config.get_config().resolve_attention_backend()
    if backend == "pallas":
        return attention_pallas(q, k, v, heads, mask)
    return attention_xla(q, k, v, heads, mask)


def attention_heads(q, k, v, mask: Optional[jax.Array] = None):
    """Backend-dispatching attention on HEAD-MAJOR (B, H, L, D) tensors,
    returning folded (B, L, H*D). For callers that already hold split heads
    (Flux after RoPE) — skips the fold->unfold round-trip of attention()."""
    from lightdiffusion_next_tpu.ops import flash_attention as fa

    backend = _config.get_config().resolve_attention_backend()
    if backend == "pallas" and mask is None and fa.supported(q, k, v):
        return _fold_heads(_flash_kernel(q.shape[-1])(q, k, v))
    return _fold_heads(sdpa(q, k, v, mask=mask))


def vae_attention_core(q, k, v):
    """q,k,v: (B, H, W, C) -> attention over H*W tokens, single head.

    Long sequences route through the Pallas flash kernel: the VAE
    mid-block attends over every latent pixel, and at a 1024² decode
    (128² = 16 384 tokens, C=512) plain sdpa materializes a 1 GiB f32
    logits matrix per image — at 2048² hires it is what used to force
    the tiled-decode OOM fallback. (Parity point: the reference
    dispatches VAE spatial attention the same way it does sequence
    attention, AttentionMethods.py:143-197.)"""
    from lightdiffusion_next_tpu.ops import flash_attention as fa

    b, h, w, c = q.shape
    qf = q.reshape(b, 1, h * w, c)
    kf = k.reshape(b, 1, h * w, c)
    vf = v.reshape(b, 1, h * w, c)
    backend = _config.get_config().resolve_attention_backend()
    if backend == "pallas" and fa.supported(qf, kf, vf):
        out = fa.flash_attention(qf, kf, vf)
    else:
        out = sdpa(qf, kf, vf)
    return out.reshape(b, h, w, c)
