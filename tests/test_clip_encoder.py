"""CLIP text encoder parity vs a torch-composed oracle (quick_gelu, causal
mask, clip-skip, eos pooling, weighted-token lerp)."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from lightdiffusion_next_tpu.models.clip import text_encoder as te


def _torch_clip_forward(P, tokens, num_layers=2, heads=4, intermediate=None):
    def t(k):
        return torch.tensor(np.asarray(P[k], dtype=np.float32))

    x = t("text_model.embeddings.token_embedding.weight")[torch.tensor(tokens)]
    x = x + t("text_model.embeddings.position_embedding.weight")[: x.shape[1]][None]
    L = x.shape[1]
    mask = torch.full((L, L), float("-inf")).triu_(1)
    inter = None
    if intermediate is not None and intermediate < 0:
        intermediate = num_layers + intermediate
    for i in range(num_layers):
        pre = f"text_model.encoder.layers.{i}."
        h = F.layer_norm(x, x.shape[-1:], t(pre + "layer_norm1.weight"), t(pre + "layer_norm1.bias"))
        q = F.linear(h, t(pre + "self_attn.q_proj.weight"), t(pre + "self_attn.q_proj.bias"))
        k = F.linear(h, t(pre + "self_attn.k_proj.weight"), t(pre + "self_attn.k_proj.bias"))
        v = F.linear(h, t(pre + "self_attn.v_proj.weight"), t(pre + "self_attn.v_proj.bias"))
        B, Lx, C = q.shape
        D = C // heads
        q, k, v = (z.view(B, Lx, heads, D).transpose(1, 2) for z in (q, k, v))
        a = F.scaled_dot_product_attention(q, k, v, attn_mask=mask)
        a = a.transpose(1, 2).reshape(B, Lx, C)
        x = x + F.linear(a, t(pre + "self_attn.out_proj.weight"), t(pre + "self_attn.out_proj.bias"))
        h = F.layer_norm(x, x.shape[-1:], t(pre + "layer_norm2.weight"), t(pre + "layer_norm2.bias"))
        h = F.linear(h, t(pre + "mlp.fc1.weight"), t(pre + "mlp.fc1.bias"))
        h = h * torch.sigmoid(1.702 * h)  # quick_gelu
        x = x + F.linear(h, t(pre + "mlp.fc2.weight"), t(pre + "mlp.fc2.bias"))
        if intermediate is not None and i == intermediate:
            inter = x.clone()
    x = F.layer_norm(x, x.shape[-1:], t("text_model.final_layer_norm.weight"), t("text_model.final_layer_norm.bias"))
    if inter is not None:
        inter = F.layer_norm(inter, x.shape[-1:], t("text_model.final_layer_norm.weight"), t("text_model.final_layer_norm.bias"))
    eos = (torch.tensor(tokens) == 49407).int().argmax(dim=-1)
    pooled = x[torch.arange(x.shape[0]), eos]
    return x, inter, pooled


def _tokens(rng, B=2, L=12):
    toks = rng.integers(0, 1000, (B, L)).astype(np.int32)
    toks[:, 0] = 49406
    toks[:, -1] = 49407
    return toks


def test_clip_forward_matches_torch(rng):
    P = te.init_params(num_layers=2, width=64, heads=4, seed=0)
    toks = _tokens(rng)
    x, inter, pooled = te.apply_clip_text(
        {k: jnp.asarray(v) for k, v in P.items()},
        jnp.asarray(toks),
        num_layers=2,
        heads=4,
    )
    xo, _, pooledo = _torch_clip_forward(P, toks)
    np.testing.assert_allclose(np.asarray(x), xo.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(pooled), pooledo.numpy(), atol=2e-4)


def test_clip_skip_intermediate(rng):
    P = te.init_params(num_layers=3, width=64, heads=4, seed=1)
    toks = _tokens(rng)
    jp = {k: jnp.asarray(v) for k, v in P.items()}
    _, inter, _ = te.apply_clip_text(
        jp, jnp.asarray(toks), intermediate_output=-2, num_layers=3, heads=4
    )
    _, intero, _ = _torch_clip_forward(P, toks, num_layers=3, intermediate=-2)
    np.testing.assert_allclose(np.asarray(inter), intero.numpy(), atol=2e-4)


def test_weighted_encoding_lerps_against_empty(rng):
    P = te.init_params(num_layers=2, width=64, heads=4, seed=2)
    model = te.SDClipModel(P, num_layers=2, heads=4)
    row_plain = [(49406, 1.0), (100, 1.0), (49407, 1.0)] + [(49407, 1.0)] * 4
    row_weighted = [(49406, 1.0), (100, 2.0), (49407, 1.0)] + [(49407, 1.0)] * 4
    z_plain, _ = model.encode_token_weights([row_plain])
    z_weighted, _ = model.encode_token_weights([row_weighted])
    # weighted must differ on the weighted position
    assert not np.allclose(z_plain[0, 1], z_weighted[0, 1])
    # unweighted positions use the identical encoding (weight==1 untouched)
    np.testing.assert_allclose(z_plain[0, 0], z_weighted[0, 0], atol=1e-5)


def test_textual_inversion_rows(rng):
    P = te.init_params(num_layers=2, width=64, heads=4, seed=3)
    model = te.SDClipModel(P, num_layers=2, heads=4)
    vec = rng.standard_normal((64,)).astype(np.float32)
    row = [(49406, 1.0), (vec, 1.0), (49407, 1.0)] + [(49407, 1.0)] * 4
    z, pooled = model.encode_token_weights([row])
    assert z.shape == (1, 7, 64)
    assert np.isfinite(z).all()


def test_projected_pooled(rng):
    P = te.init_params(num_layers=2, width=64, heads=4, seed=4, with_projection=True)
    model = te.SDClipModel(P, num_layers=2, heads=4)
    toks = _tokens(rng, B=1, L=7).tolist()
    z, pooled = model.encode(toks)
    raw_model = te.SDClipModel(P, num_layers=2, heads=4, return_projected_pooled=False)
    _, pooled_raw = raw_model.encode(toks)
    proj = np.asarray(P["text_projection.weight"])
    np.testing.assert_allclose(
        np.asarray(pooled), np.asarray(pooled_raw) @ proj.T, atol=1e-4
    )
