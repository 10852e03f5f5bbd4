"""Fused Q8_0 dequant-matmul Pallas kernel (ops/quant_matmul.py).

Parity oracle: explicit blockwise dequant (d * q per 32-elem block,
reference semantics Quantizer.py:94-112) followed by a plain fp32 matmul.
On CPU the kernel runs in Pallas interpret mode; the same code path
compiles on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np

from lightdiffusion_next_tpu.ops import ggml, nn, quant_matmul as qm


def _make_qweight(rng, n_out, k):
    w = rng.standard_normal((n_out, k)).astype(np.float32)
    q, scales = ggml.quantize_q8_0(w)
    t8 = ggml.QTensor8(jnp.asarray(q), jnp.asarray(scales), (n_out, k))
    deq = np.asarray(t8.dequantize(jnp.float32))  # exact logical value
    return t8, deq


def test_quant_matmul_matches_dequant_dot(rng):
    m, k, n = 24, 256, 384
    t8, deq = _make_qweight(rng, n, k)
    t8t = ggml.transpose_for_matmul(t8)
    x = rng.standard_normal((m, k)).astype(np.float32)
    out = np.asarray(
        qm.quant_matmul(jnp.asarray(x), t8t.qt, t8t.scales_t,
                        out_dtype=jnp.float32)
    )
    ref = x @ deq.T
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-3)


def test_quant_matmul_m_padding(rng):
    # M not a multiple of the sublane granule exercises the pad/slice path
    m, k, n = 5, 256, 128
    t8, deq = _make_qweight(rng, n, k)
    t8t = ggml.transpose_for_matmul(t8)
    x = rng.standard_normal((m, k)).astype(np.float32)
    out = np.asarray(
        qm.quant_matmul(jnp.asarray(x), t8t.qt, t8t.scales_t,
                        out_dtype=jnp.float32)
    )
    np.testing.assert_allclose(out, x @ deq.T, rtol=2e-4, atol=2e-3)


def test_qtensor8t_dequantize_matches_qtensor8(rng):
    t8, deq = _make_qweight(rng, 64, 160)
    t8t = ggml.transpose_for_matmul(t8)
    np.testing.assert_allclose(
        np.asarray(t8t.dequantize(jnp.float32)), deq, atol=1e-6
    )
    assert t8t.shape == (64, 160)


def test_fused_matmul_fallback_for_small_shapes(rng):
    # K=64 is below the 128-lane tile granule -> dequant+dot fallback
    t8, deq = _make_qweight(rng, 48, 64)
    t8t = ggml.transpose_for_matmul(t8)
    x = rng.standard_normal((3, 64)).astype(np.float32)
    assert not qm.supported(3, 64, 48)
    assert not qm.supported(3, 128, 128)  # K must be a 256-multiple
    out = np.asarray(t8t.fused_matmul(jnp.asarray(x)))
    np.testing.assert_allclose(out, x @ deq.T, rtol=2e-4, atol=2e-3)


def test_linear_dispatches_qtensor8t(rng):
    t8, deq = _make_qweight(rng, 128, 128)
    t8t = ggml.transpose_for_matmul(t8)
    x = rng.standard_normal((4, 128)).astype(np.float32)
    b = rng.standard_normal((128,)).astype(np.float32)
    out = np.asarray(nn.linear(jnp.asarray(x), t8t, jnp.asarray(b)))
    np.testing.assert_allclose(out, x @ deq.T + b, rtol=2e-4, atol=2e-3)


def test_to_device_quantized_fused_layout(rng):
    w = rng.standard_normal((64, 128)).astype(np.float32)
    emb = rng.standard_normal((100, 128)).astype(np.float32)
    qw, sw = ggml.quantize_q8_0(w)
    qe, se = ggml.quantize_q8_0(emb)
    sd = {
        "blk.weight": ggml.QTensor8(qw, sw, (64, 128)),
        "shared.weight": ggml.QTensor8(qe, se, (100, 128)),
        "norm.weight": np.ones((128,), np.float32),
    }
    dev = ggml.to_device_quantized(sd)
    assert isinstance(dev["blk.weight"], ggml.QTensor8T)
    assert isinstance(dev["shared.weight"], ggml.QTensor8)  # row lookup
    assert dev["norm.weight"].dtype == jnp.bfloat16


def test_embedding_lookup_quantized_table(rng):
    emb = rng.standard_normal((50, 96)).astype(np.float32)
    q, s = ggml.quantize_q8_0(emb)
    t8 = ggml.QTensor8(jnp.asarray(q), jnp.asarray(s), (50, 96))
    deq = np.asarray(t8.dequantize(jnp.float32))
    ids = jnp.asarray([[0, 7, 49], [3, 3, 1]])
    # explicit f32 compute dtype: exact dequantized rows
    out = np.asarray(nn.embedding_lookup(ids, t8, dtype=jnp.float32))
    np.testing.assert_allclose(out, deq[np.asarray(ids)], atol=1e-5)
    # default: rows cast to bf16 (the reference Embedding's out_dtype cast)
    out_bf = nn.embedding_lookup(ids, t8)
    assert out_bf.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out_bf, np.float32), deq[np.asarray(ids)], rtol=1e-2, atol=2e-2
    )
    # a fused-layout table must fail loudly, not crash at trace time
    t8t = ggml.transpose_for_matmul(
        ggml.QTensor8(np.asarray(q), np.asarray(s), (50, 96))
    )
    import pytest

    with pytest.raises(TypeError, match="embed_keys"):
        nn.embedding_lookup(ids, t8t)


def test_quant_matmul_batched_leading_dims(rng):
    t8, deq = _make_qweight(rng, 128, 128)
    t8t = ggml.transpose_for_matmul(t8)
    x = rng.standard_normal((2, 3, 128)).astype(np.float32)
    out = np.asarray(t8t.fused_matmul(jnp.asarray(x)))
    assert out.shape == (2, 3, 128)
    np.testing.assert_allclose(out, x @ deq.T, rtol=2e-4, atol=2e-3)


def test_t5_forward_with_fused_quantized_weights(rng):
    """QTensor8T weights inside a real T5 encoder forward: the fused
    kernel path (d_model=128 satisfies the 128-lane tile granule) must
    match the same forward run on the dequantized dense weights."""
    import jax.numpy as jnp

    from lightdiffusion_next_tpu.models.clip import t5

    cfg = t5.T5Config(
        d_model=128, d_ff=256, num_heads=4, num_layers=1, vocab_size=96
    )
    P = t5.init_params(cfg, seed=0)
    tokens = jnp.asarray(rng.integers(0, 96, (1, 8)).astype(np.int32))

    quant, dense = {}, {}
    for k, v in P.items():
        v = np.asarray(v, dtype=np.float32)
        if v.ndim == 2 and k != "shared.weight" and v.shape[1] % 32 == 0:
            q, s = ggml.quantize_q8_0(v)
            t8 = ggml.QTensor8(q, s, v.shape)
            quant[k] = t8
            dense[k] = jnp.asarray(
                np.asarray(
                    ggml.QTensor8(
                        jnp.asarray(q), jnp.asarray(s), v.shape
                    ).dequantize(jnp.float32)
                )
            )
        else:
            quant[k] = v
            dense[k] = jnp.asarray(v)
    dev = ggml.to_device_quantized(quant, dtype=jnp.float32)
    assert any(isinstance(x, ggml.QTensor8T) for x in dev.values())

    out_q, _, _ = t5.apply_t5(dev, tokens, cfg=cfg)
    out_d, _, _ = t5.apply_t5(dense, tokens, cfg=cfg)
    np.testing.assert_allclose(
        np.asarray(out_q), np.asarray(out_d), rtol=2e-3, atol=2e-3
    )


def test_weight_stationary_grid_tall_m(rng):
    """M spanning multiple M-tiles takes the weight-stationary (j, kk, i)
    grid (weights fetched+dequantized once); numerics must match both the
    dense reference and the M-outer kernel."""
    t8, deq = _make_qweight(rng, 128, 256)
    t8t = ggml.transpose_for_matmul(t8)
    x = rng.standard_normal((2176, 256)).astype(np.float32)  # tm=544 -> 4 tiles
    out_ws = np.asarray(
        qm.quant_matmul_2d(jnp.asarray(x), t8t.qt, t8t.scales_t,
                           out_dtype=jnp.float32, interpret=True, weight_stationary=True)
    )
    np.testing.assert_allclose(out_ws, x @ deq.T, rtol=2e-4, atol=2e-2)
    # forced single-tile path (tile_n set -> standard grid) agrees
    out_std = np.asarray(
        qm.quant_matmul_2d(jnp.asarray(x), t8t.qt, t8t.scales_t,
                           out_dtype=jnp.float32, interpret=True, tile_n=128)
    )
    np.testing.assert_allclose(out_ws, out_std, rtol=1e-5, atol=1e-4)


def test_weight_stationary_ragged_m_padding(rng):
    """Non-multiple-of-8 M rows pad then unpad correctly through the
    weight-stationary grid."""
    t8, deq = _make_qweight(rng, 128, 256)
    t8t = ggml.transpose_for_matmul(t8)
    x = rng.standard_normal((50, 256)).astype(np.float32)
    out = np.asarray(
        qm.quant_matmul_2d(jnp.asarray(x), t8t.qt, t8t.scales_t,
                           out_dtype=jnp.float32, interpret=True, tile_m=16, weight_stationary=True)
    )
    assert out.shape == (50, 128)
    np.testing.assert_allclose(out, x @ deq.T, rtol=2e-4, atol=2e-2)


def test_tile_budget_dtype_aware():
    """The tile VMEM estimator scales with x/out dtype sizes, and _pick_tn
    steps tiles down under tighter budgets (the fp32-vs-bf16 scoped-vmem
    OOM class)."""
    bf16 = qm._tile_vmem(2176, 512, 1024, 2, 2)
    f32 = qm._tile_vmem(2176, 512, 1024, 4, 4)
    assert f32 > bf16
    # bf16 at the raised 32 MiB limit fits tn=1024; fp32 must step down
    budget = 30 << 20
    assert bf16 <= budget < f32
    # _pick_tn respects the active budget (CPU default: 16 MiB limit)
    tn_bf16 = qm._pick_tn(21504, 1024, 2176, 512, 2, 2)
    assert qm._tile_vmem(2176, 512, tn_bf16, 2, 2) <= qm._vmem_budget()
    tn_f32 = qm._pick_tn(21504, 1024, 2176, 512, 4, 4)
    assert qm._tile_vmem(2176, 512, tn_f32, 4, 4) <= qm._vmem_budget()
    assert tn_f32 <= tn_bf16
