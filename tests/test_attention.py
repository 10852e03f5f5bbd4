"""Attention parity: XLA path vs torch SDPA; Pallas flash vs XLA path."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from lightdiffusion_next_tpu.ops import attention as attn
from lightdiffusion_next_tpu.ops import flash_attention as fa


def test_attention_xla_matches_torch_sdpa(rng):
    B, L, H, D = 2, 16, 4, 8
    q = rng.standard_normal((B, L, H * D)).astype(np.float32)
    k = rng.standard_normal((B, L, H * D)).astype(np.float32)
    v = rng.standard_normal((B, L, H * D)).astype(np.float32)
    ours = np.asarray(attn.attention_xla(*map(jnp.asarray, (q, k, v)), heads=H))

    def unfold(x):
        return torch.tensor(x).view(B, L, H, D).transpose(1, 2)

    oracle = (
        F.scaled_dot_product_attention(unfold(q), unfold(k), unfold(v))
        .transpose(1, 2)
        .reshape(B, L, H * D)
        .numpy()
    )
    np.testing.assert_allclose(ours, oracle, atol=1e-5)


def test_attention_cross_shapes(rng):
    # cross-attention: kv length != q length
    B, Lq, Lk, H, D = 1, 12, 7, 2, 8
    q = jnp.asarray(rng.standard_normal((B, Lq, H * D)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Lk, H * D)), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Lk, H * D)), dtype=jnp.float32)
    out = attn.attention_xla(q, k, v, heads=H)
    assert out.shape == (B, Lq, H * D)


def test_causal_mask(rng):
    B, L, H, D = 1, 8, 2, 4
    q = rng.standard_normal((B, L, H * D)).astype(np.float32)
    k = rng.standard_normal((B, L, H * D)).astype(np.float32)
    v = rng.standard_normal((B, L, H * D)).astype(np.float32)
    mask = np.triu(np.full((L, L), -np.inf, dtype=np.float32), k=1)
    ours = np.asarray(
        attn.attention_xla(
            *map(jnp.asarray, (q, k, v)), heads=H, mask=jnp.asarray(mask)
        )
    )

    def unfold(x):
        return torch.tensor(x).view(B, L, H, D).transpose(1, 2)

    oracle = (
        F.scaled_dot_product_attention(unfold(q), unfold(k), unfold(v), is_causal=True)
        .transpose(1, 2)
        .reshape(B, L, H * D)
        .numpy()
    )
    np.testing.assert_allclose(ours, oracle, atol=1e-5)


def test_flash_attention_matches_sdpa(rng):
    # interpret mode on CPU; small blocks to exercise the multi-block path
    B, H, L, D = 1, 2, 300, 40
    q = jnp.asarray(rng.standard_normal((B, H, L, D)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, L, D)), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, L, D)), dtype=jnp.float32)
    ours = np.asarray(fa.flash_attention(q, k, v, block_q=128, block_k=128))
    oracle = np.asarray(attn.sdpa(q, k, v))
    np.testing.assert_allclose(ours, oracle, atol=2e-5)


def test_flash_attention_ragged_kv(rng):
    B, H, Lq, Lk, D = 1, 1, 130, 260, 64
    q = jnp.asarray(rng.standard_normal((B, H, Lq, D)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, Lk, D)), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, Lk, D)), dtype=jnp.float32)
    ours = np.asarray(fa.flash_attention(q, k, v, block_q=128, block_k=128))
    oracle = np.asarray(attn.sdpa(q, k, v))
    np.testing.assert_allclose(ours, oracle, atol=2e-5)


def test_flash_attention_exact_tiling_blocks(rng):
    # divisor-aware block pick: L=96 with preferred (64, 64) resolves to
    # exact 48-wide blocks (no pad/mask path); Flux's 4352-token sequence
    # resolves the same way to (544, 1088) on device
    assert fa._exact_block(4352, 512) == 544
    assert fa._exact_block(4352, 1024) == 1088
    assert fa._exact_block(16384, 512) == 512  # power-of-two: unchanged
    assert fa._exact_block(77, 512) == 0  # not 16-divisible: pad path
    B, H, L, D = 1, 2, 96, 32
    q = jnp.asarray(rng.standard_normal((B, H, L, D)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, L, D)), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, L, D)), dtype=jnp.float32)
    assert fa._exact_block(L, 64) == 48
    ours = np.asarray(fa.flash_attention(q, k, v, block_q=64, block_k=64))
    oracle = np.asarray(attn.sdpa(q, k, v))
    np.testing.assert_allclose(ours, oracle, atol=2e-5)


def test_vae_attention_core(rng):
    x = rng.standard_normal((1, 4, 4, 8)).astype(np.float32)
    q = jnp.asarray(x)
    out = attn.vae_attention_core(q, q, q)
    assert out.shape == (1, 4, 4, 8)
    # single-head over flattened tokens == sdpa on (1,1,16,8)
    flat = q.reshape(1, 1, 16, 8)
    oracle = np.asarray(attn.sdpa(flat, flat, flat)).reshape(1, 4, 4, 8)
    np.testing.assert_allclose(np.asarray(out), oracle, atol=1e-6)


def test_vae_attention_long_sequence_flash_path(rng):
    """Long latents (a 1024² decode attends over 16 384 tokens) must route
    through the flash kernel under the pallas backend — plain sdpa would
    materialize the full L² logits matrix in HBM — and match it."""
    import dataclasses

    from lightdiffusion_next_tpu import config as _config

    x = rng.standard_normal((1, 32, 32, 64)).astype(np.float32)
    q = jnp.asarray(x)
    oracle = np.asarray(attn.vae_attention_core(q, q, q))  # cpu -> sdpa

    called = {"flash": 0}
    real = fa.flash_attention

    def spy(qf, kf, vf, **kw):
        called["flash"] += 1
        return real(qf, kf, vf, **kw)

    old = _config.get_config()
    try:
        _config.set_config(
            dataclasses.replace(old, attention_backend="pallas")
        )
        fa.flash_attention, saved = spy, real
        try:
            ours = np.asarray(attn.vae_attention_core(q, q, q))
        finally:
            fa.flash_attention = saved
    finally:
        _config.set_config(old)
    assert called["flash"] == 1
    np.testing.assert_allclose(ours, oracle, atol=2e-5)
