"""Fused-elementwise W8A8 serving path (ops/quant_matmul
row_quantize_fused / row_quantize_concat_gelu / w8a8_matmul_ep +
ggml *.modulated_matmul + models/flux._mod_linear/_gated_out_linear).

The round-4 device trace put ~18% of the Flux image in XLA's separate
LN/modulation, row-quantize and gated-residual passes around the W8A8
matmuls; these kernels collapse them into the matmul's prologue/epilogue.
The reference has no analogue (its GGML path dequantizes to float
compute, src/Quantize/Quantizer.py:260-332); oracles here are the
unfused ops chain itself plus exact numpy integer contraction.

On CPU the kernels run in Pallas interpret mode; the same code compiles
on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightdiffusion_next_tpu.models import flux as flux_mod
from lightdiffusion_next_tpu.ops import ggml, nn, quant_matmul as qm


def _dequant(codes, sx):
    return np.asarray(codes, np.float64) * np.asarray(sx, np.float64)


def _ln(x, eps=1e-6):
    xf = np.asarray(x, np.float64)
    mu = xf.mean(-1, keepdims=True)
    xc = xf - mu
    var = (xc * xc).mean(-1, keepdims=True)
    return xc / np.sqrt(var + eps)


class TestRowQuantizeFused:
    def test_plain_matches_quantize_rows_bitwise(self, rng):
        x = jnp.asarray(rng.standard_normal((9, 256)), jnp.float32) * 2.5
        codes, sx = qm.row_quantize_fused(x)
        ref_c, ref_s = qm.quantize_rows(x)
        np.testing.assert_array_equal(np.asarray(codes), np.asarray(ref_c))
        np.testing.assert_array_equal(np.asarray(sx), np.asarray(ref_s))

    def test_gelu_prologue(self, rng):
        x = jnp.asarray(rng.standard_normal((5, 128)), jnp.float32) * 3
        codes, sx = qm.row_quantize_fused(x, prologue="gelu")
        ref = np.asarray(nn.gelu(x, approximate=True), np.float64)
        got = _dequant(codes, sx)
        # symmetric absmax quant: elementwise error <= scale/2
        assert np.all(np.abs(got - ref) <= np.asarray(sx) * 0.5 + 1e-6)

    def test_ln_mod_prologue(self, rng):
        x = jnp.asarray(rng.standard_normal((6, 384)), jnp.float32)
        s = jnp.asarray(rng.standard_normal((1, 384)), jnp.float32) * 0.3 + 1
        t = jnp.asarray(rng.standard_normal((1, 384)), jnp.float32) * 0.1
        codes, sx = qm.row_quantize_fused(
            x, mod_scale=s, mod_shift=t, prologue="ln_mod"
        )
        ref = _ln(x) * np.asarray(s, np.float64) + np.asarray(t, np.float64)
        got = _dequant(codes, sx)
        assert np.all(np.abs(got - ref) <= np.asarray(sx) * 0.5 + 1e-5)

    def test_batched_lead_dims(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 3, 128)), jnp.float32)
        codes, sx = qm.row_quantize_fused(x)
        assert codes.shape == (2, 3, 128) and sx.shape == (2, 3, 1)
        ref_c, _ = qm.quantize_rows(x)
        np.testing.assert_array_equal(np.asarray(codes), np.asarray(ref_c))

    def test_zero_rows_safe(self):
        codes, sx = qm.row_quantize_fused(jnp.zeros((4, 128), jnp.float32))
        assert np.all(np.asarray(codes) == 0)
        assert np.all(np.isfinite(np.asarray(sx)))


class TestRowQuantizeConcatGelu:
    def test_matches_explicit_concat(self, rng):
        # a = attn output (M, 256); b = full linear1 proj (M, 1024+256)
        # whose mlp window is the tail 256 lanes — qkv lanes never read
        a = jnp.asarray(rng.standard_normal((7, 256)), jnp.float32)
        b = jnp.asarray(rng.standard_normal((7, 1280)), jnp.float32) * 2
        codes, sx = qm.row_quantize_concat_gelu(a, b, 1024, 1280)
        full = jnp.concatenate(
            [a, nn.gelu(b[:, 1024:], approximate=True)], axis=-1
        )
        ref = np.asarray(full, np.float64)
        got = _dequant(codes, sx)
        assert codes.shape == (7, 512)
        assert np.all(np.abs(got - ref) <= np.asarray(sx) * 0.5 + 1e-5)

    def test_supported_rowquant(self):
        assert qm.supported_rowquant(256)
        assert not qm.supported_rowquant(192)


def _make_w8(rng, k, n):
    w = rng.standard_normal((n, k)).astype(np.float32)
    q, scales = ggml.quantize_q8_0(w)
    t8 = ggml.QTensor8(jnp.asarray(q), jnp.asarray(scales), (n, k))
    return ggml.to_w8a8({"w": ggml.transpose_for_matmul(t8)})["w"]


def _ep_oracle(xq, sx, w8, gate=None, bias=None, residual=None):
    """Exact integer contraction + the epilogue algebra the kernel does:
    o = res + acc*sx*(cs*gate) + gate*bias."""
    acc = np.asarray(xq, np.int64) @ np.asarray(w8.qt, np.int64)
    cs = np.asarray(w8.col_scales, np.float64)
    out = acc.astype(np.float64) * np.asarray(sx, np.float64) * cs
    if gate is not None:
        out = out * np.asarray(gate, np.float64)
        if bias is not None:
            out = out + np.asarray(gate, np.float64) * np.asarray(
                bias, np.float64
            )
    elif bias is not None:
        out = out + np.asarray(bias, np.float64)
    if residual is not None:
        out = out + np.asarray(residual, np.float64)
    return out


class TestW8A8MatmulEp:
    def test_bias_epilogue(self, rng):
        k, n = 256, 128
        w8 = _make_w8(rng, k, n)
        x = jnp.asarray(rng.standard_normal((9, k)), jnp.float32)
        b = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
        xq, sx = qm.quantize_rows(x)
        y = qm.w8a8_matmul_ep(
            xq, sx, w8.qt, w8.col_scales, b, out_dtype=jnp.float32
        )
        ref = _ep_oracle(xq, sx, w8, bias=b)
        np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-6, atol=2e-6)

    def test_gated_residual_epilogue(self, rng):
        k, n = 128, 256
        w8 = _make_w8(rng, k, n)
        x = jnp.asarray(rng.standard_normal((5, k)), jnp.float32)
        g = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
        b = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
        r = jnp.asarray(rng.standard_normal((5, n)), jnp.float32)
        xq, sx = qm.quantize_rows(x)
        # caller-side folds, as ggml._modulated_matmul_impl does them
        cs_eff = w8.col_scales * g
        b_eff = b * g
        y = qm.w8a8_matmul_ep(
            xq, sx, w8.qt, cs_eff, b_eff, residual=r, out_dtype=jnp.float32
        )
        ref = _ep_oracle(xq, sx, w8, gate=g, bias=b, residual=r)
        np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-6, atol=2e-6)

    def test_stacked_weight_scalar_prefetch(self, rng):
        k, n, d = 128, 128, 3
        ws = [_make_w8(rng, k, n) for _ in range(d)]
        qt3 = jnp.stack([w.qt for w in ws])
        x = jnp.asarray(rng.standard_normal((4, k)), jnp.float32)
        xq, sx = qm.quantize_rows(x)
        b = jnp.zeros((1, n), jnp.float32)
        for i in range(d):
            y = qm.w8a8_matmul_ep(
                xq, sx, (qt3, i), ws[i].col_scales, b, out_dtype=jnp.float32
            )
            ref = _ep_oracle(xq, sx, ws[i])
            np.testing.assert_allclose(
                np.asarray(y), ref, rtol=2e-6, atol=2e-6
            )


class TestModulatedMatmulDispatch:
    def test_ln_mod_path_matches_unfused_chain(self, rng):
        k, n = 256, 128
        w8 = _make_w8(rng, k, n)
        x = jnp.asarray(rng.standard_normal((1, 9, k)), jnp.float32)
        s = jnp.asarray(rng.standard_normal((1, 1, k)), jnp.float32) * 0.2 + 1
        t = jnp.asarray(rng.standard_normal((1, 1, k)), jnp.float32) * 0.1
        b = jnp.asarray(rng.standard_normal((n,)), jnp.float32)
        y = w8.modulated_matmul(
            x, prologue="ln_mod", mod_scale=s, mod_shift=t, bias=b
        )
        assert y is not None and y.shape == (1, 9, n)
        xm = nn.layer_norm(x, eps=1e-6) * s + t
        ref = nn.linear(xm, w8, b)
        np.testing.assert_allclose(
            np.asarray(y, np.float64), np.asarray(ref, np.float64),
            rtol=0, atol=2e-2,
        )

    def test_declines_batched_modulation(self, rng):
        w8 = _make_w8(rng, 128, 128)
        x = jnp.ones((2, 4, 128), jnp.float32)
        s = jnp.ones((2, 1, 128), jnp.float32)
        assert (
            w8.modulated_matmul(
                x, prologue="ln_mod", mod_scale=s, mod_shift=s
            )
            is None
        )

    def test_declines_unsupported_k(self, rng):
        w8 = _make_w8(rng, 96, 128)
        x = jnp.ones((1, 4, 96), jnp.float32)
        assert w8.modulated_matmul(x) is None


# hidden=256 keeps every quantized K a multiple of 128 so both the W8A8
# kernel and the fused row-quant run under interpret mode on CPU
TINY = flux_mod.FluxConfig(
    in_channels=4,
    hidden_size=256,
    num_heads=8,
    depth=2,
    depth_single_blocks=2,
    axes_dim=(4, 14, 14),
    context_in_dim=32,
    vec_in_dim=16,
)

QUANT_SUFFIXES = (
    "qkv.weight",
    "proj.weight",
    "mlp.0.weight",
    "mlp.2.weight",
    "linear1.weight",
    "linear2.weight",
)


def _w8a8_params(seed=0):
    params = flux_mod.init_params(TINY, seed=seed)
    sd = {}
    for k, v in params.items():
        if (
            v.ndim == 2
            and any(k.endswith(s) for s in QUANT_SUFFIXES)
            and v.shape[-1] % 32 == 0
        ):
            q, s = ggml.quantize_q8_0(v)
            sd[k] = ggml.QTensor8(q=q, scales=s, shape=v.shape)
        else:
            sd[k] = v
    return ggml.to_w8a8(ggml.to_device_quantized(sd, dtype=jnp.float32))


def _flux_inputs(rng):
    x = jnp.asarray(
        rng.standard_normal((1, 8, 8, TINY.in_channels)), jnp.float32
    )
    t = jnp.asarray([0.5])
    ctx = jnp.asarray(rng.standard_normal((1, 12, 32)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((1, 16)), jnp.float32)
    return x, t, ctx, y


class TestFluxFusedEwParity:
    """apply_flux with the fused-elementwise dispatch vs the unfused ops
    chain (RuntimeConfig.fused_ew toggle) — the whole-model guarantee that
    the serving default equals the reference-parity path up to int8
    row-quant reassociation."""

    @pytest.mark.parametrize("stacked", [False, True])
    def test_fused_matches_unfused(self, rng, stacked):
        import dataclasses

        from lightdiffusion_next_tpu import config as _config

        params = _w8a8_params(seed=7)
        assert isinstance(
            params["single_blocks.0.linear1.weight"], ggml.QTensor8W
        )
        x, t, ctx, y = _flux_inputs(rng)
        if stacked:
            params = flux_mod.stack_block_params(params, TINY)
            assert flux_mod.is_stacked(params)

        cfg0 = _config.get_config()
        try:
            _config.set_config(dataclasses.replace(cfg0, fused_ew=False))
            base = np.asarray(
                flux_mod.apply_flux(params, x, t, ctx, y, cfg=TINY),
                np.float64,
            )
            _config.set_config(dataclasses.replace(cfg0, fused_ew=True))
            fused = np.asarray(
                flux_mod.apply_flux(params, x, t, ctx, y, cfg=TINY),
                np.float64,
            )
        finally:
            _config.set_config(cfg0)
        # identical quantization law; differs only by f32-vs-bf16
        # reassociation inside one row (<= 1 int8 LSB per element)
        np.testing.assert_allclose(fused, base, rtol=0, atol=3e-2)
        assert np.abs(fused - base).mean() < 3e-3
