"""Head-packed flash attention (ops.flash_attention.packed_flash_attention).

Round-5 kernel targeting SD1.5's structural d=40 lane padding
(ARCHITECTURE §5 / round-4 verdict weak #4): G = floor(128/d) heads share
one 128-lane MXU tile via block-diagonal K/V staging, so one dense matmul
computes G per-head logit blocks. Parity oracle: plain sdpa on the same
head-major tensors. The math must be exact per head — packing is pure
layout, not an approximation.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from lightdiffusion_next_tpu import config as _config
from lightdiffusion_next_tpu.ops import attention as attn_ops
from lightdiffusion_next_tpu.ops import flash_attention as fa


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _qkv(rng, b, h, lq, lk, d):
    q = jnp.asarray(rng.standard_normal((b, h, lq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, lk, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, lk, d)), jnp.float32)
    return q, k, v


class TestPackGroup:
    def test_groups(self):
        assert fa.pack_group(40) == 3  # SD1.5 level 0
        assert fa.pack_group(42) == 3
        assert fa.pack_group(64) == 2
        assert fa.pack_group(80) == 1  # SD1.5 level 1: no packing win
        assert fa.pack_group(128) == 1
        assert fa.pack_group(160) == 1


class TestPackedKernelParity:
    @pytest.mark.parametrize(
        "h,d", [(8, 40), (3, 40), (2, 64), (9, 40)]
    )
    def test_matches_sdpa(self, rng, h, d):
        """h=8,d=40 is the SD1.5 level-0 shape (3 groups, one zero head);
        h=3 is the exact-group case; h=2,d=64 the 2-pack; h=9 exact 3x3."""
        b, l = 1, 512
        q, k, v = _qkv(rng, b, h, l, l, d)
        ref = np.asarray(attn_ops.sdpa(q, k, v))
        out = np.asarray(fa.packed_flash_attention(q, k, v))
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)

    def test_matches_plain_flash(self, rng):
        """Same result as the unpacked kernel (both are exact flash)."""
        q, k, v = _qkv(rng, 1, 8, 1024, 1024, 40)
        plain = np.asarray(fa.flash_attention(q, k, v))
        packed = np.asarray(fa.packed_flash_attention(q, k, v))
        np.testing.assert_allclose(packed, plain, atol=2e-5, rtol=1e-4)

    def test_ragged_lengths_masked(self, rng):
        """Non-block-multiple kv length: padded tokens must not leak into
        the softmax (the in-kernel token mask repeats per head block)."""
        q, k, v = _qkv(rng, 1, 8, 520, 600, 40)
        ref = np.asarray(attn_ops.sdpa(q, k, v))
        out = np.asarray(fa.packed_flash_attention(q, k, v))
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)

    def test_cross_lengths(self, rng):
        q, k, v = _qkv(rng, 2, 8, 512, 1024, 40)
        ref = np.asarray(attn_ops.sdpa(q, k, v))
        out = np.asarray(fa.packed_flash_attention(q, k, v))
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)

    def test_multistep_kv_grid(self, rng):
        """kv grid > 1 exercises the per-head online-softmax carry."""
        q, k, v = _qkv(rng, 1, 3, 512, 4096, 40)
        ref = np.asarray(attn_ops.sdpa(q, k, v))
        out = np.asarray(
            fa.packed_flash_attention(q, k, v, block_q=256, block_k=512)
        )
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


class TestPackedDispatch:
    def test_dispatch_via_config(self, rng):
        """RuntimeConfig.packed_attn routes attention_heads through the
        packed kernel at packable head dims; it is in the trace token so
        the flip retraces compiled runners."""
        q, k, v = _qkv(rng, 1, 8, 512, 512, 40)
        old = _config.get_config()
        try:
            _config.set_config(dataclasses.replace(
                old, attention_backend="pallas", packed_attn=True,
            ))
            tok_on = _config.trace_token()
            out = np.asarray(attn_ops.attention_heads(q, k, v))
            _config.set_config(dataclasses.replace(
                old, attention_backend="pallas", packed_attn=False,
            ))
            tok_off = _config.trace_token()
            base = np.asarray(attn_ops.attention_heads(q, k, v))
        finally:
            _config.set_config(old)
        assert tok_on != tok_off
        np.testing.assert_allclose(out, base, atol=2e-5, rtol=1e-4)

    def test_unpackable_dims_keep_plain_kernel(self, rng):
        """d=128 (Flux) must not route through the packed kernel even with
        the flag on — pack_group(128) == 1."""
        old = _config.get_config()
        try:
            _config.set_config(
                dataclasses.replace(old, packed_attn=True)
            )
            assert attn_ops._flash_kernel(128) is fa.flash_attention
            assert (
                attn_ops._flash_kernel(40) is fa.packed_flash_attention
            )
        finally:
            _config.set_config(old)
