"""Int8 (sage) flash attention: accuracy vs the f32 reference, centering
invariances, the bf16-MXU fallback variant, and config dispatch.

The kernel runs in Pallas interpret mode on CPU — same code path the TPU
compiles. Tolerances are quantization-level (int8 per-token Q/K, int8 P),
not fp-exactness: we assert the error is small RELATIVE to the output's
own scale."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from lightdiffusion_next_tpu import config as _config
from lightdiffusion_next_tpu.ops import attention as attn
from lightdiffusion_next_tpu.ops import sage_attention as sa


def _rel_rmse(a, b):
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    return float(np.sqrt(np.mean((a - b) ** 2)) / (np.std(b) + 1e-12))


def _rand_qkv(rng, b, h, lq, lk, d):
    q = jnp.asarray(rng.standard_normal((b, h, lq, d)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, lk, d)), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, lk, d)), dtype=jnp.float32)
    return q, k, v


def test_sage_close_to_sdpa_sd15_head_dim(rng):
    # d=40 is SD1.5's level-0 head dim — the shape this kernel exists for
    q, k, v = _rand_qkv(rng, 1, 2, 256, 256, 40)
    ours = sa.sage_attention(q, k, v, block_q=128, block_k=128)
    oracle = attn.sdpa(q, k, v)
    assert _rel_rmse(ours, oracle) < 0.05


def test_sage_close_to_sdpa_flux_head_dim(rng):
    q, k, v = _rand_qkv(rng, 1, 1, 256, 256, 128)
    ours = sa.sage_attention(q, k, v, block_q=128, block_k=128)
    oracle = attn.sdpa(q, k, v)
    assert _rel_rmse(ours, oracle) < 0.05


def test_k_mean_centering_immunizes_against_k_offset(rng):
    """A constant added to K shifts every logit row uniformly — exact
    softmax no-op. Without centering it would eat the int8 range; with it
    the quantized result must stay as accurate as the unshifted one."""
    q, k, v = _rand_qkv(rng, 1, 1, 256, 256, 40)
    oracle = attn.sdpa(q, k, v)
    shifted = sa.sage_attention(q, k + 25.0, v, block_q=128, block_k=128)
    assert _rel_rmse(shifted, oracle) < 0.05


def test_v_mean_addback_is_exact(rng):
    """A constant added to V must move the output by exactly that constant
    (softmax rows sum to 1; the mean bypasses quantization entirely)."""
    q, k, v = _rand_qkv(rng, 1, 1, 256, 256, 40)
    base = np.asarray(sa.sage_attention(q, k, v, block_q=128, block_k=128))
    shifted = np.asarray(
        sa.sage_attention(q, k, v + 100.0, block_q=128, block_k=128)
    )
    np.testing.assert_allclose(shifted - base, 100.0, rtol=0, atol=5e-3)


def test_bf16_mxu_fallback_variant_matches_int8(rng):
    """int8_mxu=False contracts the SAME int8 codes at the bf16 MXU rate;
    int8 values are exact in bf16 so the two variants agree to f32
    accumulation noise."""
    q, k, v = _rand_qkv(rng, 1, 2, 256, 256, 40)
    a = np.asarray(sa.sage_attention(q, k, v, block_q=128, block_k=128))
    b = np.asarray(
        sa.sage_attention(q, k, v, block_q=128, block_k=128, int8_mxu=False)
    )
    np.testing.assert_allclose(a, b, atol=2e-3)


def test_sage_ragged_and_non32_lengths(rng):
    # 272 = 16*17: 16-divisible but NOT 32 — the int8 sublane granule must
    # reject the exact-divisor block and take the pad-and-mask path
    assert sa._int8_block(272, 256) == 0
    assert sa._int8_block(544, 512) == 544  # Flux joint seq: exact int8 tile
    q, k, v = _rand_qkv(rng, 1, 1, 272, 272, 40)
    ours = sa.sage_attention(q, k, v, block_q=128, block_k=128)
    oracle = attn.sdpa(q, k, v)
    assert ours.shape == oracle.shape
    assert _rel_rmse(ours, oracle) < 0.05


def test_sage_cross_lengths(rng):
    q, k, v = _rand_qkv(rng, 1, 1, 128, 320, 40)
    ours = sa.sage_attention(q, k, v, block_q=128, block_k=128)
    oracle = attn.sdpa(q, k, v)
    assert _rel_rmse(ours, oracle) < 0.05


def test_sage_bf16_inputs_and_output_dtype(rng):
    q, k, v = _rand_qkv(rng, 1, 1, 256, 256, 40)
    out = sa.sage_attention(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
        block_q=128, block_k=128,
    )
    assert out.dtype == jnp.bfloat16
    assert _rel_rmse(out.astype(jnp.float32), attn.sdpa(q, k, v)) < 0.06


def test_dispatch_uses_sage_only_when_enabled(rng, monkeypatch):
    """attention() routes long unmasked sequences to the int8 kernel iff
    RuntimeConfig.sage_attention is set (and the pallas backend is active)."""
    calls = {"sage": 0, "flash": 0}
    from lightdiffusion_next_tpu.ops import flash_attention as fa

    def fake_sage(q, k, v, **kw):
        calls["sage"] += 1
        return jnp.zeros_like(q)

    def fake_flash(q, k, v, **kw):
        calls["flash"] += 1
        return jnp.zeros_like(q)

    monkeypatch.setattr(sa, "sage_attention", fake_sage)
    monkeypatch.setattr(fa, "flash_attention", fake_flash)

    b, h, l, d = 1, 2, 512, 40
    q = jnp.zeros((b, l, h * d), dtype=jnp.float32)
    old = _config.get_config()
    try:
        _config.set_config(
            dataclasses.replace(
                old, attention_backend="pallas", sage_attention=True
            )
        )
        attn.attention(q, q, q, heads=h)
        assert calls == {"sage": 1, "flash": 0}
        _config.set_config(
            dataclasses.replace(
                old, attention_backend="pallas", sage_attention=False
            )
        )
        attn.attention(q, q, q, heads=h)
        assert calls == {"sage": 1, "flash": 1}
    finally:
        _config.set_config(old)


def test_pv_bf16_quality_variant(rng):
    """pv_int8=False (QK int8 only, unquantized bf16 P.V) must be at least
    as accurate as the full-int8 kernel and close to the f32 reference."""
    q, k, v = _rand_qkv(rng, 1, 2, 256, 256, 40)
    oracle = attn.sdpa(q, k, v)
    full = sa.sage_attention(q, k, v, block_q=128, block_k=128)
    quality = sa.sage_attention(
        q, k, v, block_q=128, block_k=128, pv_int8=False
    )
    e_full = _rel_rmse(full, oracle)
    e_quality = _rel_rmse(quality, oracle)
    assert e_quality < 0.05
    assert e_quality <= e_full + 1e-3  # dropping P/V rounding can't hurt


def test_sage_traces_inside_jitted_scan(rng):
    """The sampler loops are lax.scan bodies under an outer jit — the int8
    kernel (nested jit + quantization prologue) must trace there and match
    the eager XLA path step for step."""
    import jax
    from jax import lax

    b, l, h, d = 1, 512, 2, 40
    x0 = jnp.asarray(rng.standard_normal((b, l, h * d)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, l, h * d)), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, l, h * d)), dtype=jnp.float32)

    old = _config.get_config()
    try:
        _config.set_config(
            dataclasses.replace(
                old, attention_backend="pallas", sage_attention=True
            )
        )

        @jax.jit
        def run(x, k, v):
            def body(c, _):
                return attn.attention(c, k, v, heads=h), ()

            y, _ = lax.scan(body, x, None, length=2)
            return y

        ours = np.asarray(run(x0, k, v))
    finally:
        _config.set_config(old)

    ref = x0
    for _ in range(2):
        ref = attn.attention_xla(ref, k, v, heads=h)
    assert np.isfinite(ours).all()
    assert _rel_rmse(ours, np.asarray(ref)) < 0.08  # two quantized steps


def test_sharp_attention_stays_accurate(rng):
    """Near-one-hot rows (post-training attention is sharp): the int8 P
    quantization must not wash out the dominant key."""
    b, h, l, d = 1, 1, 256, 40
    q, k, v = _rand_qkv(rng, b, h, l, l, d)
    q = q * 6.0  # sharpen logits
    ours = sa.sage_attention(q, k, v, block_q=128, block_k=128)
    oracle = attn.sdpa(q, k, v)
    assert _rel_rmse(ours, oracle) < 0.05


def test_flux_joint_length_block_fallback(rng):
    """Regression: Flux's 4352-token joint sequence (2^8*17) has an exact
    divisor near 1024 (1088) that is NOT a multiple of 128 — the K-scale
    row vector's BlockSpec (1, 1, block_k) then fails Mosaic's lane rule
    and the kernel refused to lower on-chip (round-4 smoke). The K block
    must reject such divisors (lane=128) and take the pad-and-mask path
    while Q keeps its exact tiling. 544 = 2^5*17 reproduces the structure
    at interpret-mode-friendly size."""
    assert sa._int8_block(4352, 1024, lane=128) == 0  # 1088 rejected
    assert sa._int8_block(4352, 512) == 544  # q keeps the exact tile
    q, k, v = _rand_qkv(rng, 1, 2, 544, 544, 128)
    ours = sa.sage_attention(q, k, v)
    oracle = attn.sdpa(q, k, v)
    assert _rel_rmse(ours, oracle) < 0.05
    quality = sa.sage_attention(q, k, v, pv_int8=False)
    assert _rel_rmse(quality, oracle) < 0.05
