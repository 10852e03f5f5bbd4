"""W8A8 int8-MXU matmul path (ops/quant_matmul w8a8_* + ops/ggml.QTensor8W).

The reference has no analogue (its GGML path always dequantizes to float
compute, src/Quantize/Quantizer.py:260-332); the oracle here is explicit
numpy quantization math: per-column weight requantization of the Q8_0
logical value and per-row activation quantization, contracted in int32.
On CPU the kernel runs in Pallas interpret mode; the same path compiles
on TPU.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightdiffusion_next_tpu.ops import ggml, nn, quant_matmul as qm


def _make_qweight(rng, n_out, k):
    w = rng.standard_normal((n_out, k)).astype(np.float32)
    q, scales = ggml.quantize_q8_0(w)
    t8 = ggml.QTensor8(jnp.asarray(q), jnp.asarray(scales), (n_out, k))
    return ggml.transpose_for_matmul(t8)


def _np_w8a8_oracle(x, codes, cs, sx, xq):
    """Exact integer contraction: (M,K) int8 x (K,N) int8 -> int32, then
    the two rescales. Matches the kernel bit-for-bit up to the final
    dtype cast."""
    acc = xq.astype(np.int64) @ codes.astype(np.int64)
    return acc.astype(np.float64) * sx * cs


def _exact_w8a8(x, w8):
    """The kernel's exact expected output for float input ``x`` (M, K)
    against a QTensor8W — activation quantization included."""
    xq, sx = qm.quantize_rows(jnp.asarray(x))
    return _np_w8a8_oracle(
        x, np.asarray(w8.qt), np.asarray(w8.col_scales),
        np.asarray(sx), np.asarray(xq),
    )


class TestQuantizeRows:
    def test_roundtrip_error_bounded(self, rng):
        x = rng.standard_normal((7, 96)).astype(np.float32) * 3.0
        codes, sx = qm.quantize_rows(jnp.asarray(x))
        codes, sx = np.asarray(codes), np.asarray(sx)
        assert codes.dtype == np.int8 and sx.shape == (7, 1)
        # symmetric absmax quant: elementwise error <= scale/2
        assert np.all(np.abs(codes * sx - x) <= sx * 0.5 + 1e-9)

    def test_zero_row_safe(self):
        x = jnp.zeros((3, 64), jnp.float32)
        codes, sx = qm.quantize_rows(x)
        assert np.all(np.asarray(codes) == 0)
        assert np.all(np.isfinite(np.asarray(sx)))


class TestRequantAndClass:
    def test_to_w8a8_value_preservation(self, rng):
        t8t = _make_qweight(rng, 128, 256)
        params = {"blk.weight": t8t, "dense": jnp.ones((4, 4))}
        out = ggml.to_w8a8(params)
        w8 = out["blk.weight"]
        assert isinstance(w8, ggml.QTensor8W)
        assert w8.shape == t8t.shape and w8.qt.dtype == jnp.int8
        assert w8.col_scales.shape == (1, 128)
        # per-column requantization error bound: half a code step per elem
        ref = np.asarray(t8t.dequantize(jnp.float32))  # (N, K) torch layout
        got = np.asarray(w8.dequantize(jnp.float32))
        cs = np.asarray(w8.col_scales)[0][:, None]  # (N, 1)
        assert np.all(np.abs(got - ref) <= cs * 0.5 + 1e-9)
        # dense leaves pass through untouched
        assert out["dense"] is params["dense"]

    def test_to_w8a8_converts_lora_base(self, rng):
        t8t = _make_qweight(rng, 128, 256)
        lora = ggml.QTensorLoRA(
            base=t8t,
            up=jnp.zeros((128, 4), jnp.float32),
            down=jnp.zeros((4, 256), jnp.float32),
        )
        out = ggml.to_w8a8({"w": lora})["w"]
        assert isinstance(out, ggml.QTensorLoRA)
        assert isinstance(out.base, ggml.QTensor8W)

    def test_pytree_roundtrip_through_jit(self, rng):
        t8t = _make_qweight(rng, 128, 256)
        w8 = ggml.to_w8a8({"w": t8t})["w"]
        x = jnp.asarray(rng.standard_normal((8, 256)).astype(np.float32))

        @jax.jit
        def f(params, x):
            return nn.linear(x, params["w"])

        y = f({"w": w8}, x)
        ref = _exact_w8a8(np.asarray(x), w8)
        np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-5)

    def test_tp_flag_falls_back_to_dequant_dot(self, rng):
        t8t = _make_qweight(rng, 128, 256)
        w8 = ggml.to_w8a8({"w": dataclasses.replace(t8t, tp=True)})["w"]
        assert w8.tp
        x = jnp.asarray(rng.standard_normal((8, 256)).astype(np.float32))
        y = np.asarray(w8.fused_matmul(x))
        # exact dequant+dot (no activation quantization on the TP path)
        ref = np.asarray(x) @ np.asarray(w8.dequantize(jnp.float32)).T
        np.testing.assert_allclose(y, ref, rtol=2e-5, atol=2e-5)


class TestW8A8Kernel:
    def test_matches_integer_oracle(self, rng):
        m, k, n = 24, 256, 384
        t8t = _make_qweight(rng, n, k)
        w8 = ggml.to_w8a8({"w": t8t})["w"]
        x = rng.standard_normal((m, k)).astype(np.float32)
        xq, sx = qm.quantize_rows(jnp.asarray(x))
        out = np.asarray(
            qm.w8a8_matmul(jnp.asarray(x), w8.qt, w8.col_scales,
                           out_dtype=jnp.float32)
        )
        ref = _np_w8a8_oracle(
            x, np.asarray(w8.qt), np.asarray(w8.col_scales),
            np.asarray(sx), np.asarray(xq),
        )
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def test_m_padding(self, rng):
        # M=5 is not a multiple of the int8 sublane granule (32)
        m, k, n = 5, 256, 128
        t8t = _make_qweight(rng, n, k)
        w8 = ggml.to_w8a8({"w": t8t})["w"]
        x = rng.standard_normal((m, k)).astype(np.float32)
        out = np.asarray(
            qm.w8a8_matmul(jnp.asarray(x), w8.qt, w8.col_scales,
                           out_dtype=jnp.float32)
        )
        assert out.shape == (m, n)
        np.testing.assert_allclose(out, _exact_w8a8(x, w8), rtol=1e-5, atol=1e-5)

    def test_close_to_float_matmul(self, rng):
        # end-to-end accuracy vs the unquantized product: both the weight
        # and activation rounding contribute ~1e-2 relative error on
        # standard-normal data
        m, k, n = 16, 512, 256
        w = rng.standard_normal((n, k)).astype(np.float32)
        q, scales = ggml.quantize_q8_0(w)
        t8t = ggml.transpose_for_matmul(
            ggml.QTensor8(jnp.asarray(q), jnp.asarray(scales), (n, k))
        )
        w8 = ggml.to_w8a8({"w": t8t})["w"]
        x = rng.standard_normal((m, k)).astype(np.float32)
        out = np.asarray(
            qm.w8a8_matmul(jnp.asarray(x), w8.qt, w8.col_scales,
                           out_dtype=jnp.float32)
        )
        ref = x @ w.T
        denom = np.sqrt((ref**2).mean())
        assert np.sqrt(((out - ref) ** 2).mean()) / denom < 2e-2

    def test_tile_budget_respected(self):
        # picked tiles must fit the scoped-VMEM budget at the Flux shape
        from lightdiffusion_next_tpu import config as _config

        tm, tk = 2176, 512
        tn = qm._pick_tn_w8a8(12288, 1024, tm, tk, out_bytes=2)
        assert tn % 128 == 0
        assert qm._tile_vmem_w8a8(tm, tk, tn, 2) <= _config.scoped_vmem_budget_bytes()


class TestLinearDispatch:
    def test_linear_with_bias(self, rng):
        t8t = _make_qweight(rng, 128, 256)
        w8 = ggml.to_w8a8({"w": t8t})["w"]
        x = jnp.asarray(rng.standard_normal((4, 256)).astype(np.float32))
        b = jnp.asarray(rng.standard_normal((128,)).astype(np.float32))
        y = np.asarray(nn.linear(x, w8, b))
        ref = _exact_w8a8(np.asarray(x), w8) + np.asarray(b)
        np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-5)

    def test_lora_on_w8a8_base(self, rng):
        from lightdiffusion_next_tpu.models import lora as lora_mod

        t8t = _make_qweight(rng, 128, 256)
        w8 = ggml.to_w8a8({"w": t8t})["w"]
        up = rng.standard_normal((128, 4)).astype(np.float32) * 0.1
        down = rng.standard_normal((4, 256)).astype(np.float32) * 0.1
        params = lora_mod.apply_lora(
            {"w": w8}, {"w": (up, down, 4.0)}, strength=1.0
        )
        assert isinstance(params["w"], ggml.QTensorLoRA)
        x = jnp.asarray(rng.standard_normal((4, 256)).astype(np.float32))
        y = np.asarray(nn.linear(x, params["w"]))
        ref = _exact_w8a8(np.asarray(x), w8) + np.asarray(x) @ (up @ down).T
        np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-4)


class TestTPTransforms:
    def test_layout_take_rows_and_cols_preserve_values(self, rng):
        from lightdiffusion_next_tpu.parallel import layout

        t8t = _make_qweight(rng, 128, 256)
        w8 = ggml.to_w8a8({"w": t8t})["w"]
        deq = np.asarray(w8.dequantize(jnp.float32))  # (N=128, K=256)
        idx = np.arange(128)[::-1].copy()
        rows = layout._take_rows(w8, idx)
        assert isinstance(rows, ggml.QTensor8W) and rows.shape == (128, 256)
        np.testing.assert_allclose(
            np.asarray(rows.dequantize(jnp.float32)), deq[idx], atol=1e-6
        )
        cols = layout._take_input_cols(w8, 32, 160)
        assert isinstance(cols, ggml.QTensor8W) and cols.shape == (128, 128)
        np.testing.assert_allclose(
            np.asarray(cols.dequantize(jnp.float32)), deq[:, 32:160], atol=1e-6
        )

    def test_shard_params_roundtrips_w8a8(self, rng):
        import jax as _jax
        from jax.sharding import Mesh, PartitionSpec as P

        from lightdiffusion_next_tpu.parallel import sharding as shard_rules

        t8t = _make_qweight(rng, 128, 256)
        w8 = ggml.to_w8a8({"w": t8t})["w"]
        devs = np.array(_jax.devices()[:8]).reshape(1, 8)
        mesh = Mesh(devs, ("data", "model"))
        rec = shard_rules._quantized_sharding(w8, P("model", None), mesh)
        assert isinstance(rec, ggml.QTensor8W) and rec.tp
        out = shard_rules.shard_params({"w": w8}, {"w": rec})["w"]
        assert isinstance(out, ggml.QTensor8W) and out.tp
        np.testing.assert_allclose(
            np.asarray(out.dequantize(jnp.float32)),
            np.asarray(w8.dequantize(jnp.float32)),
            atol=1e-6,
        )


class TestK384:
    def test_kernel_supports_tp8_row_parallel_k(self, rng):
        """tp=8 row-parallel shards of Flux hidden=3072 have K_local=384 —
        the w8a8 kernel must take them (K granule 128; the Q8_0 kernel's
        256-multiple scale-block constraint does not apply)."""
        assert qm.supported_w8a8(64, 384, 128)
        assert not qm.supported(64, 384, 128)
        m, k, n = 64, 384, 128
        t8t = _make_qweight(rng, n, k)
        w8 = ggml.to_w8a8({"w": t8t})["w"]
        x = rng.standard_normal((m, k)).astype(np.float32)
        out = np.asarray(
            qm.w8a8_matmul(jnp.asarray(x), w8.qt, w8.col_scales,
                           out_dtype=jnp.float32)
        )
        np.testing.assert_allclose(out, _exact_w8a8(x, w8), rtol=1e-5, atol=1e-5)


class TestBf16MxuFallback:
    def test_int8_mxu_false_matches_integer_oracle(self, rng):
        """The A/B fallback (int8 blocks cast to bf16, f32 accumulator)
        stays within f32-accumulation rounding of the exact integer path
        at test K (partial sums far below 2^24 -> near-exact)."""
        m, k, n = 16, 256, 128
        t8t = _make_qweight(rng, n, k)
        w8 = ggml.to_w8a8({"w": t8t})["w"]
        x = rng.standard_normal((m, k)).astype(np.float32)
        out = np.asarray(
            qm.w8a8_matmul_2d(
                jnp.asarray(x), w8.qt, w8.col_scales,
                out_dtype=jnp.float32, interpret=True, int8_mxu=False,
            )
        )
        np.testing.assert_allclose(out, _exact_w8a8(x, w8), rtol=1e-4, atol=1e-4)


class TestAutoDefault:
    """Round 4: w8a8 became the Q8_0 serving default on TPU ("auto"
    resolves via platform), measured -18.5% s/image at 1.5% latent RMSE.
    CPU (this suite) must keep resolving to the bf16-dequant path."""

    def test_auto_resolves_by_platform(self, monkeypatch):
        from lightdiffusion_next_tpu import config as _config

        cfg = dataclasses.replace(_config.get_config(), w8a8="auto")
        monkeypatch.setattr(_config, "is_tpu", lambda: False)
        assert cfg.resolve_w8a8() is False
        monkeypatch.setattr(_config, "is_tpu", lambda: True)
        assert cfg.resolve_w8a8() is True

    def test_explicit_bool_wins_and_validates(self):
        from lightdiffusion_next_tpu import config as _config

        assert dataclasses.replace(
            _config.get_config(), w8a8=True).resolve_w8a8() is True
        assert dataclasses.replace(
            _config.get_config(), w8a8=False).resolve_w8a8() is False
        with pytest.raises(ValueError):
            dataclasses.replace(_config.get_config(), w8a8="yes")

    def test_env_default_parsing(self, monkeypatch):
        from lightdiffusion_next_tpu import config as _config

        for env, want in (("1", True), ("0", False), ("auto", "auto"),
                          ("", "auto"), ("junk", "auto")):
            monkeypatch.setenv("LDT_W8A8", env)
            assert _config.RuntimeConfig().w8a8 == want

    def test_trace_token_carries_resolved_w8a8(self, monkeypatch):
        """A platform flip (or explicit toggle) must change trace_token so
        warm compiled runners retrace instead of silently reusing the
        other mode's program."""
        from lightdiffusion_next_tpu import config as _config

        old = _config.get_config()
        try:
            _config.set_config(dataclasses.replace(old, w8a8="auto"))
            monkeypatch.setattr(_config, "is_tpu", lambda: False)
            tok_off = _config.trace_token()
            monkeypatch.setattr(_config, "is_tpu", lambda: True)
            tok_on = _config.trace_token()
            assert tok_off != tok_on
        finally:
            _config.set_config(old)
