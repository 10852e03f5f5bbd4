"""SD1.5-class LDM UNet, TPU-native.

Behavioral counterpart of src/NeuralNetwork/unet.py:205-771 (UNetModel1) +
src/NeuralNetwork/transformer.py (SpatialTransformer/BasicTransformerBlock) +
src/AutoEncoders/ResBlock.py (ResBlock1/Upsample1/Downsample1), re-designed
as a pure function over a flat LDM-keyed param dict:

- activations NHWC, weights bf16, norms fp32 (TPU layout; the reference is
  NCHW/fp16-casting).
- the block walk is a static plan derived from UNetConfig (same layout math
  as the reference constructor), so the whole forward traces into one XLA
  program; there is no module tree and no runtime patching — feature hooks
  (FBCache, MSW-MSA) are explicit functional arguments.

Param keys match the checkpoint exactly (prefix "model.diffusion_model."
stripped): e.g. "input_blocks.1.0.in_layers.2.weight". Conv kernels are HWIO
(transformed at load by utils.state_dict).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, List, Optional, Sequence, Tuple

import jax.numpy as jnp

from lightdiffusion_next_tpu.ops import attention as attn_ops
from lightdiffusion_next_tpu.ops import nn
from lightdiffusion_next_tpu.sampling.schedules import timestep_embedding

# ---------------------------------------------------------------------------
# Config and plan
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """Static architecture description (detect_unet_config output analog,
    src/NeuralNetwork/unet.py:773-1080)."""

    in_channels: int = 4
    out_channels: int = 4
    model_channels: int = 320
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: Tuple[int, ...] = (2, 2, 2, 2)
    transformer_depth: Tuple[int, ...] = (1, 1, 1, 0)  # per level
    transformer_depth_middle: int = 1
    context_dim: Optional[int] = 768
    num_heads: int = 8
    num_head_channels: int = -1
    use_linear_in_transformer: bool = False
    adm_in_channels: Optional[int] = None
    dtype: Any = jnp.float32

    def heads_for(self, ch: int) -> Tuple[int, int]:
        if self.num_head_channels == -1:
            return self.num_heads, ch // self.num_heads
        return ch // self.num_head_channels, self.num_head_channels


SD15_CONFIG = UNetConfig()


@dataclasses.dataclass(frozen=True)
class _Block:
    kind: str  # "conv_in" | "res" | "attn" | "down" | "up"
    key: str  # param prefix, e.g. "input_blocks.1.0."
    in_ch: int = 0
    out_ch: int = 0
    skip_ch: int = 0
    depth: int = 0  # transformer depth for "attn"


def build_plan(cfg: UNetConfig):
    """Reproduce the reference constructor's block layout (unet.py:340-676):
    returns (input_blocks, middle_blocks, output_blocks) as lists of block
    lists; each inner list is the modules of one numbered block."""
    input_blocks: List[List[_Block]] = [
        [_Block("conv_in", "input_blocks.0.0.", cfg.in_channels, cfg.model_channels)]
    ]
    input_block_chans = [cfg.model_channels]
    ch = cfg.model_channels
    nb = 1
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks[level]):
            out_ch = cfg.model_channels * mult
            mods = [_Block("res", f"input_blocks.{nb}.0.", ch, out_ch)]
            ch = out_ch
            if cfg.transformer_depth[level] > 0:
                mods.append(
                    _Block(
                        "attn",
                        f"input_blocks.{nb}.1.",
                        ch,
                        ch,
                        depth=cfg.transformer_depth[level],
                    )
                )
            input_blocks.append(mods)
            input_block_chans.append(ch)
            nb += 1
        if level != len(cfg.channel_mult) - 1:
            input_blocks.append(
                [_Block("down", f"input_blocks.{nb}.0.", ch, ch)]
            )
            input_block_chans.append(ch)
            nb += 1

    middle = [
        _Block("res", "middle_block.0.", ch, ch),
        _Block("attn", "middle_block.1.", ch, ch, depth=cfg.transformer_depth_middle),
        _Block("res", "middle_block.2.", ch, ch),
    ]

    output_blocks: List[List[_Block]] = []
    nb = 0
    for level, mult in list(enumerate(cfg.channel_mult))[::-1]:
        for i in range(cfg.num_res_blocks[level] + 1):
            ich = input_block_chans.pop()
            out_ch = cfg.model_channels * mult
            mods = [
                _Block("res", f"output_blocks.{nb}.0.", ch + ich, out_ch, skip_ch=ich)
            ]
            ch = out_ch
            midx = 1
            if cfg.transformer_depth[level] > 0:
                mods.append(
                    _Block(
                        "attn",
                        f"output_blocks.{nb}.{midx}.",
                        ch,
                        ch,
                        depth=cfg.transformer_depth[level],
                    )
                )
                midx += 1
            if level and i == cfg.num_res_blocks[level]:
                mods.append(_Block("up", f"output_blocks.{nb}.{midx}.", ch, ch))
            output_blocks.append(mods)
            nb += 1
    return input_blocks, middle, output_blocks


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------


def resblock(p: nn.ParamView, x, emb):
    """ResBlock1 (ResBlock.py:197-340): GN-SiLU-conv, +emb, GN-SiLU-conv,
    skip (identity or 1x1)."""
    h = nn.group_norm(x, p("in_layers.0.weight"), p("in_layers.0.bias"))
    h = nn.silu(h)
    h = nn.conv2d(h, p("in_layers.2.weight"), p("in_layers.2.bias"), padding=1)
    emb_out = nn.linear(nn.silu(emb), p("emb_layers.1.weight"), p("emb_layers.1.bias"))
    h = h + emb_out[:, None, None, :].astype(h.dtype)
    h = nn.group_norm(h, p("out_layers.0.weight"), p("out_layers.0.bias"))
    h = nn.silu(h)
    h = nn.conv2d(h, p("out_layers.3.weight"), p("out_layers.3.bias"), padding=1)
    if p.has("skip_connection.weight"):
        x = nn.conv2d(x, p("skip_connection.weight"), p("skip_connection.bias"))
    return x + h


def _can_fuse_qkv(*ws) -> bool:
    """True when the projection weights may be concatenated into one matmul:
    plain dense arrays (no quantized/dequant wrappers) of equal shape/dtype,
    and the runtime config enables the fusion (config.qkv_fuse)."""
    from lightdiffusion_next_tpu import config as _config

    if not _config.get_config().resolve_qkv_fuse():
        return False
    for w in ws:
        if hasattr(w, "fused_matmul") or hasattr(w, "dequantize"):
            return False
        if not hasattr(w, "shape") or w.shape != ws[0].shape:
            return False
        if getattr(w, "dtype", None) != ws[0].dtype:
            return False
    return True


def cross_attention(
    p: nn.ParamView,
    x,
    context,
    heads: int,
    attn_override: Optional[Callable] = None,
    block=None,
    hw=None,
):
    """CrossAttention (Attention.py:53-125): to_q/k/v (no bias), attention,
    to_out. ``attn_override(q, k, v, heads, block=..., hw=...)`` swaps the
    core (MSW-MSA windowing, ops.window)."""
    ctx = x if context is None else context
    wq, wk, wv = p("to_q.weight"), p("to_k.weight"), p("to_v.weight")
    if context is None and _can_fuse_qkv(wq, wk, wv):
        # One wide (C -> 3*inner) matmul instead of three narrow ones: the
        # round-5 device trace has the separate N=320/640 projections at
        # 48-74 TF/s (x re-read 3x, MXU under-fed at 2.5 lane tiles) vs
        # 150-190 TF/s for wide matmuls. Identical math per output element
        # (same contraction, no reassociation) — see config.qkv_fuse.
        qkv = nn.linear(x, jnp.concatenate([wq, wk, wv], axis=0))
        q, k, v = jnp.split(qkv, 3, axis=-1)
    elif context is not None and _can_fuse_qkv(wk, wv):
        q = nn.linear(x, wq)
        kv = nn.linear(ctx, jnp.concatenate([wk, wv], axis=0))
        k, v = jnp.split(kv, 2, axis=-1)
    else:
        q = nn.linear(x, wq)
        k = nn.linear(ctx, wk)
        v = nn.linear(ctx, wv)
    if attn_override is not None:
        out = attn_override(q, k, v, heads, block=block, hw=hw)
    else:
        out = attn_ops.attention(q, k, v, heads)
    return nn.linear(out, p("to_out.0.weight"), p("to_out.0.bias"))


def basic_transformer_block(
    p: nn.ParamView,
    x,
    context,
    heads: int,
    attn1_override: Optional[Callable] = None,
    block=None,
    hw=None,
):
    """BasicTransformerBlock (transformer.py:73-245): self-attn, cross-attn,
    GEGLU FF, each with pre-LayerNorm and residual."""
    h = nn.layer_norm(x, p("norm1.weight"), p("norm1.bias"))
    x = x + cross_attention(
        p.scope("attn1."), h, None, heads, attn1_override, block=block, hw=hw
    )
    h = nn.layer_norm(x, p("norm2.weight"), p("norm2.bias"))
    x = x + cross_attention(p.scope("attn2."), h, context, heads)
    h = nn.layer_norm(x, p("norm3.weight"), p("norm3.bias"))
    x = x + nn.linear(
        nn.geglu(h, p("ff.net.0.proj.weight"), p("ff.net.0.proj.bias")),
        p("ff.net.2.weight"),
        p("ff.net.2.bias"),
    )
    return x


def spatial_transformer(
    p: nn.ParamView,
    x,
    context,
    cfg: UNetConfig,
    depth: int,
    attn1_override: Optional[Callable] = None,
    block=None,
):
    """SpatialTransformer (transformer.py:248-379): GN(eps 1e-6), 1x1 proj_in
    (conv for SD1.5), NHWC->tokens, blocks, proj_out, residual."""
    b, hh, ww, c = x.shape
    heads, _ = cfg.heads_for(c)
    x_in = x
    x = nn.group_norm(x, p("norm.weight"), p("norm.bias"), eps=1e-6)
    if cfg.use_linear_in_transformer:
        x = x.reshape(b, hh * ww, c)
        x = nn.linear(x, p("proj_in.weight"), p("proj_in.bias"))
    else:
        x = nn.conv2d(x, p("proj_in.weight"), p("proj_in.bias"))
        x = x.reshape(b, hh * ww, c)
    for d in range(depth):
        x = basic_transformer_block(
            p.scope(f"transformer_blocks.{d}."), x, context, heads,
            attn1_override, block=block, hw=(hh, ww),
        )
    if cfg.use_linear_in_transformer:
        x = nn.linear(x, p("proj_out.weight"), p("proj_out.bias"))
        x = x.reshape(b, hh, ww, c)
    else:
        x = x.reshape(b, hh, ww, c)
        x = nn.conv2d(x, p("proj_out.weight"), p("proj_out.bias"))
    return x + x_in


def downsample(p: nn.ParamView, x):
    """Downsample1 (ResBlock.py:141-195): stride-2 3x3 conv."""
    return nn.conv2d(x, p("op.weight"), p("op.bias"), stride=2, padding=1)


def upsample(p: nn.ParamView, x):
    """Upsample1 (ResBlock.py:75-139): nearest x2 + 3x3 conv."""
    x = nn.interpolate_nearest(x, 2)
    return nn.conv2d(x, p("conv.weight"), p("conv.bias"), padding=1)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _run_block(mods, params, h, emb, context, cfg, attn1_override, block=None):
    """``block``: ("input"|"middle"|"output", index) — the identity the
    MSW-MSA override gates on (SD15 preset windows input 1,2 / output
    9,10,11). Without it the override's block gate never matches and the
    windowing is silently inert — the reference's own bug."""
    for m in mods:
        p = nn.ParamView(params, m.key)
        if m.kind == "conv_in":
            h = nn.conv2d(h, p("weight"), p("bias"), padding=1)
        elif m.kind == "res":
            h = resblock(p, h, emb)
        elif m.kind == "attn":
            h = spatial_transformer(
                p, h, context, cfg, m.depth, attn1_override, block=block
            )
        elif m.kind == "down":
            h = downsample(p, h)
        elif m.kind == "up":
            h = upsample(p, h)
    return h


def apply_unet(
    params: dict,
    x,
    timesteps,
    context,
    y=None,
    cfg: UNetConfig = SD15_CONFIG,
    plan=None,
    attn1_override: Optional[Callable] = None,
    first_block_hook: Optional[Callable] = None,
):
    """UNetModel1.forward parity (unet.py:679-771).

    x: (B, H, W, C) latent; timesteps: (B,) discrete t; context: (B, L, 768).

    ``first_block_hook``: FBCache integration point (the reference's "first
    block" boundary after input blocks 0-1, WaveSpeed
    first_block_cache.py:484-543). Called as ``hook(h_prev, h_first,
    run_rest)`` where ``h_prev`` is the block-0 output (``original_h``),
    ``h_first`` the block-1 output, and ``run_rest(h)`` runs everything up to
    but NOT including the final ``out`` head — so the cached residual is
    ``h_pre_out - h_first``, matching call_remaining_blocks. The hook returns
    the (possibly cache-substituted) pre-out hidden state.
    """
    if plan is None:
        plan = build_plan(cfg)
    input_blocks, middle, output_blocks = plan

    t_emb = timestep_embedding(timesteps, cfg.model_channels).astype(cfg.dtype)
    pt = nn.ParamView(params, "time_embed.")
    emb = nn.linear(t_emb, pt("0.weight"), pt("0.bias"))
    emb = nn.linear(nn.silu(emb), pt("2.weight"), pt("2.bias"))
    if y is not None and "label_emb.0.0.weight" in params:
        pl_ = nn.ParamView(params, "label_emb.0.")
        le = nn.linear(y.astype(cfg.dtype), pl_("0.weight"), pl_("0.bias"))
        emb = emb + nn.linear(nn.silu(le), pl_("2.weight"), pl_("2.bias"))

    h = x.astype(cfg.dtype)
    if context is not None:
        context = context.astype(cfg.dtype)

    hs = []

    def run_rest(h):
        rest_hs = list(hs)
        for i, mods in enumerate(input_blocks[2:], start=2):
            h = _run_block(
                mods, params, h, emb, context, cfg, attn1_override,
                block=("input", i),
            )
            rest_hs.append(h)
        h = _run_block(
            middle, params, h, emb, context, cfg, attn1_override,
            block=("middle", 0),
        )
        for i, mods in enumerate(output_blocks):
            h = jnp.concatenate([h, rest_hs.pop()], axis=-1)
            h = _run_block(
                mods, params, h, emb, context, cfg, attn1_override,
                block=("output", i),
            )
        return h

    # first two numbered blocks = the FBCache "first block" boundary
    h = _run_block(
        input_blocks[0], params, h, emb, context, cfg, attn1_override,
        block=("input", 0),
    )
    hs.append(h)
    h_prev = h
    h = _run_block(
        input_blocks[1], params, h, emb, context, cfg, attn1_override,
        block=("input", 1),
    )
    hs.append(h)

    if first_block_hook is not None:
        h = first_block_hook(h_prev, h, run_rest)
    else:
        h = run_rest(h)

    po = nn.ParamView(params, "out.")
    h = nn.group_norm(h, po("0.weight"), po("0.bias"))
    h = nn.silu(h)
    return nn.conv2d(h, po("2.weight"), po("2.bias"), padding=1)


# ---------------------------------------------------------------------------
# Param init (random weights for tests/benchmarks; real use loads checkpoints)
# ---------------------------------------------------------------------------


def init_params(cfg: UNetConfig = SD15_CONFIG, seed: int = 0, dtype=None):
    """Randomly-initialized flat param dict with checkpoint-exact keys and
    shapes (HWIO convs). Used by tests and benchmarks; production params come
    from utils.state_dict loading real checkpoints."""
    import numpy as np

    rng = np.random.default_rng(seed)
    dtype = dtype or cfg.dtype
    P = {}

    def add_linear(key, out_d, in_d, bias=True):
        P[key + ".weight"] = rng.normal(0, in_d**-0.5, (out_d, in_d))
        if bias:
            P[key + ".bias"] = np.zeros((out_d,))

    def add_conv(key, out_c, in_c, k=3):
        P[key + ".weight"] = rng.normal(0, (in_c * k * k) ** -0.5, (k, k, in_c, out_c))
        P[key + ".bias"] = np.zeros((out_c,))

    def add_norm(key, c):
        P[key + ".weight"] = np.ones((c,))
        P[key + ".bias"] = np.zeros((c,))

    def add_attn(prefix, ch, ctx):
        add_linear(prefix + "to_q", ch, ch, bias=False)
        add_linear(prefix + "to_k", ch, ctx, bias=False)
        add_linear(prefix + "to_v", ch, ctx, bias=False)
        add_linear(prefix + "to_out.0", ch, ch)

    def add_st(prefix, ch, depth):
        add_norm(prefix + "norm", ch)
        if cfg.use_linear_in_transformer:
            add_linear(prefix + "proj_in", ch, ch)
            add_linear(prefix + "proj_out", ch, ch)
        else:
            add_conv(prefix + "proj_in", ch, ch, k=1)
            add_conv(prefix + "proj_out", ch, ch, k=1)
        for d in range(depth):
            tb = f"{prefix}transformer_blocks.{d}."
            add_norm(tb + "norm1", ch)
            add_norm(tb + "norm2", ch)
            add_norm(tb + "norm3", ch)
            add_attn(tb + "attn1.", ch, ch)
            add_attn(tb + "attn2.", ch, cfg.context_dim)
            add_linear(tb + "ff.net.0.proj", ch * 8, ch)
            add_linear(tb + "ff.net.2", ch, ch * 4)

    def add_res(prefix, in_ch, out_ch):
        add_norm(prefix + "in_layers.0", in_ch)
        add_conv(prefix + "in_layers.2", out_ch, in_ch)
        add_linear(prefix + "emb_layers.1", out_ch, cfg.model_channels * 4)
        add_norm(prefix + "out_layers.0", out_ch)
        add_conv(prefix + "out_layers.3", out_ch, out_ch)
        if in_ch != out_ch:
            add_conv(prefix + "skip_connection", out_ch, in_ch, k=1)

    add_linear("time_embed.0", cfg.model_channels * 4, cfg.model_channels)
    add_linear("time_embed.2", cfg.model_channels * 4, cfg.model_channels * 4)

    input_blocks, middle, output_blocks = build_plan(cfg)
    for mods in input_blocks + [middle] + output_blocks:
        for m in mods:
            key = m.key.rstrip(".")
            if m.kind == "conv_in":
                add_conv(key, m.out_ch, m.in_ch)
            elif m.kind == "res":
                add_res(m.key, m.in_ch, m.out_ch)
            elif m.kind == "attn":
                add_st(m.key, m.out_ch, m.depth)
            elif m.kind == "down":
                add_conv(key + ".op", m.out_ch, m.in_ch)
            elif m.kind == "up":
                add_conv(key + ".conv", m.out_ch, m.in_ch)

    add_norm("out.0", cfg.model_channels)
    add_conv("out.2", cfg.out_channels, cfg.model_channels)
    # host numpy (float32): device placement happens in one packed
    # transfer via utils.state_dict.device_put_params
    return {k: np.asarray(v, dtype=np.float32) for k, v in P.items()}
