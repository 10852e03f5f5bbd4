"""T5 encoder parity vs a torch-composed oracle (relative bias, RMSNorm,
gated gelu, unscaled attention)."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from lightdiffusion_next_tpu.models.clip import t5

TINY = t5.T5Config(d_model=32, d_ff=64, num_heads=4, num_layers=2, vocab_size=100)


def test_relative_position_bucket_matches_torch():
    rel = np.arange(-20, 21).reshape(1, -1)
    ours = t5.relative_position_bucket(rel, True, 32, 128)
    # torch oracle (FluxClip.py:153-205)
    rp = torch.tensor(rel)
    num_buckets = 16
    relative_buckets = (rp > 0).long() * num_buckets
    rp = torch.abs(rp)
    max_exact = num_buckets // 2
    is_small = rp < max_exact
    rp_large = max_exact + (
        torch.log(rp.float() / max_exact) / np.log(128 / max_exact) * (num_buckets - max_exact)
    ).long()
    rp_large = torch.min(rp_large, torch.full_like(rp_large, num_buckets - 1))
    oracle = relative_buckets + torch.where(is_small, rp, rp_large)
    np.testing.assert_array_equal(ours, oracle.numpy())


def _torch_t5(P, tokens, cfg):
    def t(k):
        return torch.tensor(np.asarray(P[k], dtype=np.float32))

    x = t("shared.weight")[torch.tensor(tokens)]
    L = x.shape[1]
    buckets = torch.tensor(t5.compute_bias_table(L, L, cfg))
    bias = t("encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight")[
        buckets
    ].permute(2, 0, 1)[None]

    def rms(h, w):
        return h * torch.rsqrt(h.pow(2).mean(-1, keepdim=True) + 1e-6) * w

    for i in range(cfg.num_layers):
        pre = f"encoder.block.{i}."
        h = rms(x, t(pre + "layer.0.layer_norm.weight"))
        q = F.linear(h, t(pre + "layer.0.SelfAttention.q.weight"))
        k = F.linear(h, t(pre + "layer.0.SelfAttention.k.weight"))
        v = F.linear(h, t(pre + "layer.0.SelfAttention.v.weight"))
        B, L2, C = q.shape
        H = cfg.num_heads
        D = C // H
        q, k, v = (z.view(B, L2, H, D).transpose(1, 2) for z in (q, k, v))
        logits = q @ k.transpose(-1, -2) + bias
        attn = torch.softmax(logits, dim=-1) @ v
        attn = attn.transpose(1, 2).reshape(B, L2, C)
        x = x + F.linear(attn, t(pre + "layer.0.SelfAttention.o.weight"))
        h = rms(x, t(pre + "layer.1.layer_norm.weight"))
        hg = F.gelu(F.linear(h, t(pre + "layer.1.DenseReluDense.wi_0.weight")), approximate="tanh")
        hl = F.linear(h, t(pre + "layer.1.DenseReluDense.wi_1.weight"))
        x = x + F.linear(hg * hl, t(pre + "layer.1.DenseReluDense.wo.weight"))
    return rms(x, t("encoder.final_layer_norm.weight"))


def test_t5_forward_matches_torch(rng):
    P = t5.init_params(TINY, seed=0)
    tokens = rng.integers(0, 100, (2, 9)).astype(np.int32)
    ours, _, _ = t5.apply_t5(
        {k: jnp.asarray(v) for k, v in P.items()}, jnp.asarray(tokens), cfg=TINY
    )
    oracle = _torch_t5(P, tokens, TINY)
    np.testing.assert_allclose(np.asarray(ours), oracle.numpy(), atol=3e-4)


def test_t5_attention_mask(rng):
    P = t5.init_params(TINY, seed=1)
    tokens = rng.integers(0, 100, (1, 6)).astype(np.int32)
    mask = np.asarray([[1, 1, 1, 0, 0, 0]], dtype=np.float32)
    full, _, _ = t5.apply_t5(
        {k: jnp.asarray(v) for k, v in P.items()},
        jnp.asarray(tokens),
        attention_mask=jnp.asarray(mask),
        cfg=TINY,
    )
    # masked tokens must not influence the first token's output
    tokens2 = tokens.copy()
    tokens2[0, 4] = (tokens2[0, 4] + 1) % 100
    full2, _, _ = t5.apply_t5(
        {k: jnp.asarray(v) for k, v in P.items()},
        jnp.asarray(tokens2),
        attention_mask=jnp.asarray(mask),
        cfg=TINY,
    )
    np.testing.assert_allclose(
        np.asarray(full[0, 0]), np.asarray(full2[0, 0]), atol=1e-5
    )


def test_t5_scan_matches_unrolled(rng):
    """Scan-over-blocks T5 (stack_t5_block_params): same values as the
    unrolled encoder, dense and Q8_0-quantized, with the block-0 relative
    bias staying flat."""
    from lightdiffusion_next_tpu.ops import ggml

    P = {k: jnp.asarray(v) for k, v in t5.init_params(TINY, seed=2).items()}
    tokens = jnp.asarray(rng.integers(0, 100, (2, 8)).astype(np.int32))
    base, _, _ = t5.apply_t5(P, tokens, cfg=TINY)

    stacked = t5.stack_t5_block_params(dict(P), TINY)
    assert t5.is_stacked(stacked)
    assert (
        "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"
        in stacked
    )
    out, _, _ = t5.apply_t5(stacked, tokens, cfg=TINY)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=1e-5)

    # quantized: d_model 32-multiple weights -> QTensor8T -> stacked
    qP = {}
    for k, v in t5.init_params(TINY, seed=3).items():
        v = np.asarray(v, np.float32)
        if v.ndim == 2 and "block" in k and v.shape[1] % 32 == 0 and \
                not k.endswith("relative_attention_bias.weight"):
            q, s = ggml.quantize_q8_0(v)
            qP[k] = ggml.transpose_for_matmul(
                ggml.QTensor8(jnp.asarray(q), jnp.asarray(s), v.shape)
            )
        else:
            qP[k] = jnp.asarray(v)
    qbase, _, _ = t5.apply_t5(qP, tokens, cfg=TINY)
    qstacked = t5.stack_t5_block_params(dict(qP), TINY)
    assert isinstance(
        qstacked[t5.T5_STACK_KEY]["layer.0.SelfAttention.q.weight"],
        ggml.StackedQTensor8T,
    )
    qout, _, _ = t5.apply_t5(qstacked, tokens, cfg=TINY)
    np.testing.assert_allclose(np.asarray(qout), np.asarray(qbase), atol=2e-5)


def test_t5_scan_intermediate_output(rng):
    """intermediate_output splits the scan at a static boundary; the
    captured intermediate must equal the unrolled one."""
    P = {k: jnp.asarray(v) for k, v in t5.init_params(TINY, seed=4).items()}
    tokens = jnp.asarray(rng.integers(0, 100, (1, 7)).astype(np.int32))
    base, bmid, _ = t5.apply_t5(P, tokens, cfg=TINY, intermediate_output=0)
    stacked = t5.stack_t5_block_params(dict(P), TINY)
    out, mid, _ = t5.apply_t5(stacked, tokens, cfg=TINY, intermediate_output=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=1e-5)
    np.testing.assert_allclose(np.asarray(mid), np.asarray(bmid), atol=1e-5)


def test_t5_model_scan_option(rng):
    """T5XXLModel(scan_blocks=True) stacks after upload and encodes
    identically to the unrolled resident; the input dict is consumed."""
    P = t5.init_params(TINY, seed=5)
    rows = [[(int(t_), 1.0) for t_ in rng.integers(0, 100, (6,))]]
    base_model = t5.T5XXLModel(dict(P), cfg=TINY)
    out_base, _ = base_model.encode_token_weights(rows)
    scan_model = t5.T5XXLModel(dict(P), cfg=TINY, scan_blocks=True)
    assert t5.is_stacked(scan_model.params)
    out_scan, _ = scan_model.encode_token_weights(rows)
    np.testing.assert_allclose(out_scan, out_base, atol=1e-5)
