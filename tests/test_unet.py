"""UNet tests: block-level torch parity, SD1.5 structural key parity, and a
tiny-config end-to-end forward."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from lightdiffusion_next_tpu.models import unet
from lightdiffusion_next_tpu.ops import nn


def _np(x):
    return np.asarray(x)


def test_sd15_plan_structure():
    plan = unet.build_plan(unet.SD15_CONFIG)
    input_blocks, middle, output_blocks = plan
    assert len(input_blocks) == 12
    assert len(output_blocks) == 12
    kinds_in = [[m.kind for m in mods] for mods in input_blocks]
    assert kinds_in[0] == ["conv_in"]
    assert kinds_in[1] == ["res", "attn"]
    assert kinds_in[3] == ["down"]
    assert kinds_in[10] == ["res"]  # level 3 has no attention
    assert [m.kind for m in middle] == ["res", "attn", "res"]
    # upsamples close levels 3,2,1
    assert [m.kind for m in output_blocks[2]] == ["res", "up"]
    assert [m.kind for m in output_blocks[5]] == ["res", "attn", "up"]
    assert [m.kind for m in output_blocks[11]] == ["res", "attn"]
    # skip channels pop in reverse
    assert output_blocks[0][0].in_ch == 1280 + 1280
    assert output_blocks[11][0].in_ch == 320 + 320  # level-0 ch + conv_in skip


@pytest.mark.slow
def test_sd15_param_keys_match_checkpoint_layout():
    params = unet.init_params(unet.SD15_CONFIG, seed=0, dtype=jnp.float32)
    # SD1.5 diffusion_model has 686 tensors
    assert len(params) == 686
    for key in (
        "time_embed.0.weight",
        "input_blocks.0.0.weight",
        "input_blocks.1.0.in_layers.2.weight",
        "input_blocks.1.1.transformer_blocks.0.attn2.to_k.weight",
        "input_blocks.3.0.op.weight",
        "input_blocks.4.0.skip_connection.weight",
        "middle_block.1.proj_out.weight",
        "output_blocks.2.1.conv.weight",
        "output_blocks.5.2.conv.weight",
        "out.2.weight",
    ):
        assert key in params, key
    assert params["input_blocks.1.1.transformer_blocks.0.attn2.to_k.weight"].shape == (
        320,
        768,
    )
    assert params["input_blocks.0.0.weight"].shape == (3, 3, 4, 320)


def _torch_resblock(p, prefix, x_nchw, emb):
    """Torch oracle of an LDM ResBlock built from the same flat params."""

    def t(key, conv=False):
        a = np.asarray(p[prefix + key], dtype=np.float32)
        if conv:
            a = np.transpose(a, (3, 2, 0, 1))  # HWIO -> OIHW
        return torch.tensor(a)

    h = F.group_norm(x_nchw, 32, t("in_layers.0.weight"), t("in_layers.0.bias"))
    h = F.silu(h)
    h = F.conv2d(h, t("in_layers.2.weight", True), t("in_layers.2.bias"), padding=1)
    emb_out = F.linear(F.silu(emb), t("emb_layers.1.weight"), t("emb_layers.1.bias"))
    h = h + emb_out[:, :, None, None]
    h = F.group_norm(h, 32, t("out_layers.0.weight"), t("out_layers.0.bias"))
    h = F.silu(h)
    h = F.conv2d(h, t("out_layers.3.weight", True), t("out_layers.3.bias"), padding=1)
    if prefix + "skip_connection.weight" in p:
        x_nchw = F.conv2d(
            x_nchw, t("skip_connection.weight", True), t("skip_connection.bias")
        )
    return x_nchw + h


def test_resblock_matches_torch(rng):
    cfg = unet.UNetConfig(
        model_channels=32, channel_mult=(1, 2), num_res_blocks=(1, 1),
        transformer_depth=(1, 0), context_dim=32, num_heads=4,
    )
    params = unet.init_params(cfg, seed=1, dtype=jnp.float32)
    prefix = "input_blocks.3.0."  # 32 -> 64 with skip_connection (after down)
    x = rng.standard_normal((1, 8, 8, 32)).astype(np.float32)
    emb = rng.standard_normal((1, 128)).astype(np.float32)
    ours = _np(
        unet.resblock(
            nn.ParamView(params, prefix), jnp.asarray(x), jnp.asarray(emb)
        )
    )
    oracle = (
        _torch_resblock(
            params, prefix, torch.tensor(x).permute(0, 3, 1, 2), torch.tensor(emb)
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, oracle, atol=2e-4)


def test_transformer_block_matches_torch(rng):
    cfg = unet.UNetConfig(
        model_channels=32, channel_mult=(1,), num_res_blocks=(1,),
        transformer_depth=(1,), context_dim=24, num_heads=4,
    )
    params = unet.init_params(cfg, seed=2, dtype=jnp.float32)
    prefix = "input_blocks.1.1.transformer_blocks.0."
    x = rng.standard_normal((1, 16, 32)).astype(np.float32)
    ctx = rng.standard_normal((1, 5, 24)).astype(np.float32)
    ours = _np(
        unet.basic_transformer_block(
            nn.ParamView(params, prefix), jnp.asarray(x), jnp.asarray(ctx), heads=4
        )
    )

    def t(key):
        return torch.tensor(np.asarray(params[prefix + key], dtype=np.float32))

    def tattn(sub, q_in, kv_in, heads=4):
        q = F.linear(q_in, t(sub + "to_q.weight"))
        k = F.linear(kv_in, t(sub + "to_k.weight"))
        v = F.linear(kv_in, t(sub + "to_v.weight"))
        B, L, C = q.shape
        D = C // heads
        q, k, v = (
            z.view(B, -1, heads, D).transpose(1, 2) for z in (q, k, v)
        )
        o = F.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).reshape(B, L, C)
        return F.linear(o, t(sub + "to_out.0.weight"), t(sub + "to_out.0.bias"))

    xt = torch.tensor(x)
    ct = torch.tensor(ctx)
    h = F.layer_norm(xt, (32,), t("norm1.weight"), t("norm1.bias"))
    xt = xt + tattn("attn1.", h, h)
    h = F.layer_norm(xt, (32,), t("norm2.weight"), t("norm2.bias"))
    xt = xt + tattn("attn2.", h, ct)
    h = F.layer_norm(xt, (32,), t("norm3.weight"), t("norm3.bias"))
    proj = F.linear(h, t("ff.net.0.proj.weight"), t("ff.net.0.proj.bias"))
    val, gate = proj.chunk(2, dim=-1)
    xt = xt + F.linear(val * F.gelu(gate), t("ff.net.2.weight"), t("ff.net.2.bias"))
    np.testing.assert_allclose(ours, xt.numpy(), atol=2e-4)


def test_tiny_unet_forward_shapes(rng):
    cfg = unet.UNetConfig(
        in_channels=4, out_channels=4, model_channels=32,
        channel_mult=(1, 2), num_res_blocks=(1, 1), transformer_depth=(1, 1),
        transformer_depth_middle=1, context_dim=16, num_heads=4,
    )
    params = unet.init_params(cfg, seed=3, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 4)), dtype=jnp.float32)
    t = jnp.asarray([500.0, 500.0])
    ctx = jnp.asarray(rng.standard_normal((2, 7, 16)), dtype=jnp.float32)
    out = unet.apply_unet(params, x, t, ctx, cfg=cfg)
    assert out.shape == (2, 16, 16, 4)
    assert np.isfinite(_np(out)).all()


def test_unet_first_block_hook_identity(rng):
    cfg = unet.UNetConfig(
        model_channels=32, channel_mult=(1, 2), num_res_blocks=(1, 1),
        transformer_depth=(1, 1), context_dim=16, num_heads=4,
    )
    params = unet.init_params(cfg, seed=4, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 4)), dtype=jnp.float32)
    t = jnp.asarray([10.0])
    ctx = jnp.asarray(rng.standard_normal((1, 3, 16)), dtype=jnp.float32)
    plain = unet.apply_unet(params, x, t, ctx, cfg=cfg)
    hooked = unet.apply_unet(
        params, x, t, ctx, cfg=cfg,
        first_block_hook=lambda hp, h, rest: rest(h),
    )
    np.testing.assert_allclose(_np(plain), _np(hooked), atol=1e-6)


def test_attn1_override_receives_block_identities():
    """apply_unet must pass ("input"|"middle"|"output", idx) to the attn1
    override — without it the MSW-MSA block gate never matches and the
    windowing is silently inert (the reference's own bug, SURVEY §2;
    round-3 review caught us reproducing it)."""
    import jax.numpy as jnp

    from lightdiffusion_next_tpu.models import unet as unet_mod

    cfg = unet_mod.UNetConfig(
        model_channels=32, channel_mult=(1, 2), num_res_blocks=(1, 1),
        transformer_depth=(1, 1), context_dim=64, num_heads=4,
        dtype=jnp.float32,
    )
    params = unet_mod.init_params(cfg, seed=0)
    seen = []

    def override(q, k, v, heads, block=None, hw=None):
        seen.append((block, hw))
        from lightdiffusion_next_tpu.ops import attention as attn

        return attn.attention(q, k, v, heads)

    x = jnp.zeros((1, 8, 8, 4), jnp.float32)
    t = jnp.zeros((1,), jnp.float32)
    ctx = jnp.zeros((1, 4, 64), jnp.float32)
    unet_mod.apply_unet(params, x, t, ctx, cfg=cfg, attn1_override=override)
    assert seen, "override never called"
    blocks = {b for b, _ in seen}
    assert None not in blocks, "block identity missing from attn1 override"
    sections = {b[0] for b in blocks}
    assert "input" in sections and "output" in sections
    for b, hw in seen:
        assert isinstance(b[1], int)
        assert hw is not None and len(hw) == 2


def test_qkv_fuse_matches_unfused(rng):
    """The fused q|k|v projection computes each output element's contraction
    unchanged (concat along the OUT dim, split after) — self- and
    cross-attention outputs must match the separate-matmul path to fp32
    roundoff (XLA may tile the wide matmul differently, so last-ulp
    differences are possible; 1e-5 is ~10 ulp at these magnitudes)."""
    import dataclasses as _dc

    from lightdiffusion_next_tpu import config as _config

    cfg = unet.UNetConfig(
        model_channels=32, channel_mult=(1,), num_res_blocks=(1,),
        transformer_depth=(1,), context_dim=24, num_heads=4,
    )
    params = unet.init_params(cfg, seed=5, dtype=jnp.float32)
    prefix = "input_blocks.1.1.transformer_blocks.0."
    x = jnp.asarray(rng.standard_normal((1, 16, 32)).astype(np.float32))
    ctx = jnp.asarray(rng.standard_normal((1, 5, 24)).astype(np.float32))
    old = _config.get_config()
    try:
        _config.set_config(_dc.replace(old, qkv_fuse=True))
        fused = _np(unet.basic_transformer_block(
            nn.ParamView(params, prefix), x, ctx, heads=4))
        _config.set_config(_dc.replace(old, qkv_fuse=False))
        unfused = _np(unet.basic_transformer_block(
            nn.ParamView(params, prefix), x, ctx, heads=4))
    finally:
        _config.set_config(old)
    np.testing.assert_allclose(fused, unfused, atol=1e-5)


def test_qkv_fuse_falls_back_on_wrapped_weights(rng):
    """Quantized/dequant-wrapper weight leaves must take the separate-matmul
    path (the fusion concatenates raw arrays; wrappers define their own
    matmul)."""

    class _Wrapped:
        def __init__(self, w):
            self._w = jnp.asarray(w)
            self.shape = self._w.shape
            self.dtype = self._w.dtype

        def dequantize(self, dtype):
            return self._w.astype(dtype)

    assert not unet._can_fuse_qkv(
        _Wrapped(np.eye(8, dtype=np.float32)),
        _Wrapped(np.eye(8, dtype=np.float32)),
        _Wrapped(np.eye(8, dtype=np.float32)),
    )
    # mixed plain/wrapped refuses too
    assert not unet._can_fuse_qkv(
        jnp.eye(8), _Wrapped(np.eye(8, dtype=np.float32)), jnp.eye(8)
    )
    # plain equal-shape arrays fuse (config default on)
    assert unet._can_fuse_qkv(jnp.eye(8), jnp.eye(8), jnp.eye(8))
    # shape mismatch refuses
    assert not unet._can_fuse_qkv(jnp.eye(8), jnp.eye(4), jnp.eye(8))
