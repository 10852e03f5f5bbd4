"""Multi-axis rotary position embeddings (Flux style).

Counterpart of src/BlackForest/Flux.py:36-114 (rope / apply_rope / EmbedND).
Implemented as a real-valued 2x2 rotation applied to feature pairs — the
layout XLA fuses cleanly (no complex dtype on TPU).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def rope(pos, dim: int, theta: int = 10000):
    """pos: (..., n) -> (..., n, dim/2, 2, 2) rotation matrices."""
    assert dim % 2 == 0
    scale = jnp.arange(0, dim, 2, dtype=jnp.float64) / dim
    omega = 1.0 / (theta**scale)
    out = pos.astype(jnp.float64)[..., None] * omega[None]
    cos, sin = jnp.cos(out), jnp.sin(out)
    mat = jnp.stack([cos, -sin, sin, cos], axis=-1)
    return mat.reshape(mat.shape[:-1] + (2, 2)).astype(jnp.float32)


def embed_nd(ids, axes_dim: Sequence[int], theta: int = 10000):
    """ids: (B, L, n_axes) -> pe (B, 1, L, sum(axes_dim)/2, 2, 2)
    (EmbedND.forward parity)."""
    embs = [rope(ids[..., i], axes_dim[i], theta) for i in range(ids.shape[-1])]
    emb = jnp.concatenate(embs, axis=-3)
    return emb[:, None]


def apply_rope(xq, xk, freqs_cis):
    """xq/xk: (B, H, L, D); freqs_cis: (B, 1, L, D/2, 2, 2)."""

    def rot(x):
        xf = x.astype(jnp.float32).reshape(x.shape[:-1] + (-1, 1, 2))
        out = (
            freqs_cis[..., 0] * xf[..., 0] + freqs_cis[..., 1] * xf[..., 1]
        )
        return out.reshape(x.shape).astype(x.dtype)

    return rot(xq), rot(xk)
