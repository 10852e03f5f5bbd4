"""MSW-MSA window ops: partition/reverse roundtrip, shift behavior, override
gating, and equivalence with blockwise attention."""

import jax.numpy as jnp
import numpy as np

from lightdiffusion_next_tpu.ops import attention as attn
from lightdiffusion_next_tpu.ops import window


def test_partition_reverse_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 8 * 8, 16)), dtype=jnp.float32)
    for shift in [(0, 0), (1, 1), (2, 3)]:
        w = window.window_partition(x, (8, 8), shift)
        assert w.shape == (8, 16, 16)
        back = window.window_reverse(w, (8, 8), shift)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-6)


def test_shift_for_index():
    assert window.shift_for_index((8, 8), 0) == (0, 0)
    assert window.shift_for_index((8, 8), 1) == (1, 1)
    assert window.shift_for_index((16, 8), 3) == (6, 3)


def test_override_applies_only_to_listed_blocks(rng):
    q = jnp.asarray(rng.standard_normal((1, 16, 32)), dtype=jnp.float32)
    override = window.make_msw_msa_override(shift_idx=0)
    plain = attn.attention(q, q, q, heads=4)
    # unlisted block -> plain attention
    out = override(q, q, q, 4, block=("middle", 0), hw=(4, 4))
    np.testing.assert_allclose(np.asarray(out), np.asarray(plain), atol=1e-5)
    # listed block with zero shift -> blockwise window attention
    out_w = override(q, q, q, 4, block=("input", 1), hw=(4, 4))
    assert out_w.shape == q.shape
    assert not np.allclose(np.asarray(out_w), np.asarray(plain), atol=1e-5)


def test_windowed_equals_manual_blockwise(rng):
    # zero shift: window attention == attention over each 2x2 quadrant
    h = w = 4
    q = jnp.asarray(rng.standard_normal((1, h * w, 8)), dtype=jnp.float32)
    override = window.make_msw_msa_override(shift_idx=0)
    out = np.asarray(override(q, q, q, 2, block=("input", 1), hw=(h, w)))

    xg = np.asarray(q).reshape(1, h, w, 8)
    expected = np.zeros_like(xg)
    for yi in range(2):
        for xi in range(2):
            blk = xg[:, yi * 2 : yi * 2 + 2, xi * 2 : xi * 2 + 2, :].reshape(1, 4, 8)
            a = np.asarray(attn.attention(*map(jnp.asarray, (blk, blk, blk)), heads=2))
            expected[:, yi * 2 : yi * 2 + 2, xi * 2 : xi * 2 + 2, :] = a.reshape(
                1, 2, 2, 8
            )
    np.testing.assert_allclose(out.reshape(1, h, w, 8), expected, atol=1e-5)


def test_odd_dims_use_rescale_workaround(rng):
    """Odd latent dims are rescaled to the even grid, windowed, and
    rescaled back (reference scale_mode workaround, hidiffusion/utils.py:167
    rescale_size) — NOT skipped. Output keeps the original token count and
    is a genuine windowed result (differs from plain attention)."""
    q = jnp.asarray(rng.standard_normal((1, 15, 8)), dtype=jnp.float32)
    override = window.make_msw_msa_override(shift_idx=1)
    out = override(q, q, q, 2, block=("input", 1), hw=(3, 5))
    plain = attn.attention(q, q, q, heads=2)
    assert out.shape == q.shape
    assert np.isfinite(np.asarray(out)).all()
    assert not np.allclose(np.asarray(out), np.asarray(plain), atol=1e-5)


def test_odd_dims_127x127_finite(rng):
    """The 1016x1016 case: 127x127 latent tokens through the rescale +
    window path, jitted."""
    import jax

    h = w = 127
    q = jnp.asarray(rng.standard_normal((1, h * w, 8)), dtype=jnp.float32)
    override = window.make_msw_msa_override(shift_idx=2)
    out = jax.jit(
        lambda a: override(a, a, a, 2, block=("output", 9), hw=(h, w))
    )(q)
    assert out.shape == q.shape
    assert np.isfinite(np.asarray(out)).all()


def test_sigma_gate_selects_windowed_or_plain(rng):
    """active=False -> plain attention; active=True -> windowed (check_time
    parity, hidiffusion/utils.py:129-143) — under jit, via lax.cond."""
    import jax

    q = jnp.asarray(rng.standard_normal((1, 16, 8)), dtype=jnp.float32)
    plain = np.asarray(attn.attention(q, q, q, heads=2))
    windowed = np.asarray(
        window.make_msw_msa_override(shift_idx=0)(
            q, q, q, 2, block=("input", 1), hw=(4, 4)
        )
    )

    def f(flag):
        ov = window.make_msw_msa_override(shift_idx=0, active=flag)
        return ov(q, q, q, 2, block=("input", 1), hw=(4, 4))

    np.testing.assert_allclose(np.asarray(jax.jit(f)(False)), plain, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(jax.jit(f)(True)), windowed, atol=1e-6
    )


def test_factory_sigma_window_gating(rng):
    """With model_sampling, the factory is gated by the SIMPLE_PRESETS
    window (start 20% -> windowing OFF early / ON late,
    msw_msa_attention.py:71-72)."""
    from lightdiffusion_next_tpu.sampling.model_sampling import (
        ModelSamplingDiscrete,
    )

    msamp = ModelSamplingDiscrete()
    fac = window.make_msw_msa_factory(model_sampling=msamp)
    q = jnp.asarray(rng.standard_normal((1, 16, 8)), dtype=jnp.float32)
    plain = np.asarray(attn.attention(q, q, q, heads=2))

    def run(t):
        ov = fac(jnp.asarray([t], jnp.float32))
        return np.asarray(ov(q, q, q, 2, block=("input", 1), hw=(4, 4)))

    # early trajectory (high sigma, t=999): gate off -> plain
    np.testing.assert_allclose(run(999.0), plain, atol=1e-6)
    # late trajectory (low sigma): gate on -> windowed
    assert not np.allclose(run(100.0), plain, atol=1e-5)


def test_traced_shift_index(rng):
    import jax

    # 16x16: window 8x8, shift quantum 2 (4x4 windows would quantize to 0)
    q = jnp.asarray(rng.standard_normal((1, 256, 8)), dtype=jnp.float32)

    def f(idx):
        override = window.make_msw_msa_override(shift_idx=idx)
        return override(q, q, q, 2, block=("input", 1), hw=(16, 16))

    out0 = jax.jit(f)(jnp.asarray(0))
    out1 = jax.jit(f)(jnp.asarray(1))
    assert out0.shape == q.shape
    assert not np.allclose(np.asarray(out0), np.asarray(out1))


def test_msw_factory_is_memoized():
    """Identity-stable factory: the sampler's compiled-loop cache keys on
    id(attn1_override_factory); a fresh object per pipeline() call would
    retrace the whole 20-step program for every image."""
    from lightdiffusion_next_tpu.ops import window

    assert window.make_msw_msa_factory() is window.make_msw_msa_factory()
