"""SD VAE (AutoencoderKL) encoder/decoder, TPU-native NHWC.

Counterpart of src/AutoEncoders/VariationalAE.py:103-824: Encoder/Decoder
(ch=128, ch_mult 1-2-4-4, 2 res blocks, mid attention), DiagonalGaussian
regularizer, and the VAE facade with pixel-range scaling. The reference's
free-memory-based decode batching (VariationalAE.py:699-703) is replaced by
static batching + an optional tiled path: under XLA, memory is a compile-time
property, so "fit in VRAM" becomes "pick a tile size".

Param keys match the checkpoint exactly ("first_stage_model." stripped):
encoder.down.0.block.0.norm1.weight, decoder.up.3.upsample.conv.weight, ...
Conv kernels HWIO (converted at load).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lightdiffusion_next_tpu.ops import attention as attn_ops
from lightdiffusion_next_tpu.ops import nn


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    in_channels: int = 3
    out_ch: int = 3
    z_channels: int = 4
    double_z: bool = True
    has_quant_conv: bool = True  # False for the Flux AE (ae.safetensors)

    @property
    def downscale_ratio(self) -> int:
        return 2 ** (len(self.ch_mult) - 1)


SD_VAE = VAEConfig()
FLUX_AE = VAEConfig(z_channels=16, has_quant_conv=False)


def detect_vae_config(sd: dict) -> VAEConfig:
    """Infer VAEConfig from state-dict shapes (the reference hardcodes the
    SD ddconfig with an x4-upscaler special case, VariationalAE.py:608-637;
    we detect everything). Works on OIHW or HWIO tensors."""

    def ch_of(key, axis_out=True):
        w = sd[key]
        hwio = w.shape[0] == w.shape[1] and w.shape[0] <= 7
        if hwio:
            return w.shape[-1] if axis_out else w.shape[-2]
        return w.shape[0] if axis_out else w.shape[1]

    ch = ch_of("encoder.conv_in.weight")
    z_channels = ch_of("decoder.conv_in.weight", axis_out=False)
    # encoder levels: count down.N entries; mult from each level's block.0
    mults = []
    i = 0
    while f"encoder.down.{i}.block.0.conv1.weight" in sd:
        mults.append(ch_of(f"encoder.down.{i}.block.0.conv1.weight") // ch)
        i += 1
    nrb = 0
    while f"encoder.down.0.block.{nrb}.conv1.weight" in sd:
        nrb += 1
    return VAEConfig(
        ch=ch,
        ch_mult=tuple(mults) or (1, 2, 4, 4),
        num_res_blocks=nrb or 2,
        z_channels=z_channels,
        has_quant_conv="quant_conv.weight" in sd,
    )


def _gn(x, scale, bias):
    """GroupNorm(32) with eps 1e-6; group count clamps to the channel count
    so tiny test configs work (real VAEs always have >=128 channels)."""
    return nn.group_norm(x, scale, bias, groups=min(32, x.shape[-1]), eps=1e-6)


def _resnet(p: nn.ParamView, x):
    """VAE ResnetBlock (VariationalAE ResBlock.py:341 parity): GN(eps1e-6),
    swish, conv3x3 x2, nin_shortcut 1x1 when channels change."""
    h = _gn(x, p("norm1.weight"), p("norm1.bias"))
    h = nn.silu(h)
    h = nn.conv2d(h, p("conv1.weight"), p("conv1.bias"), padding=1)
    h = _gn(h, p("norm2.weight"), p("norm2.bias"))
    h = nn.silu(h)
    h = nn.conv2d(h, p("conv2.weight"), p("conv2.bias"), padding=1)
    if p.has("nin_shortcut.weight"):
        x = nn.conv2d(x, p("nin_shortcut.weight"), p("nin_shortcut.bias"))
    return x + h


def _attn_block(p: nn.ParamView, x):
    """Mid-block single-head spatial attention (AttnBlock, Attention.py:127).
    q/k/v/proj_out are 1x1 convs."""
    h = _gn(x, p("norm.weight"), p("norm.bias"))
    q = nn.conv2d(h, p("q.weight"), p("q.bias"))
    k = nn.conv2d(h, p("k.weight"), p("k.bias"))
    v = nn.conv2d(h, p("v.weight"), p("v.bias"))
    out = attn_ops.vae_attention_core(q, k, v)
    out = nn.conv2d(out, p("proj_out.weight"), p("proj_out.bias"))
    return x + out


def apply_encoder(params: dict, x, cfg: VAEConfig = SD_VAE):
    """pixels (B,H,W,3) in [-1,1] -> moments (B,h,w,2*z) (Encoder, :257)."""
    p = nn.ParamView(params, "encoder.")
    h = nn.conv2d(x, p("conv_in.weight"), p("conv_in.bias"), padding=1)
    for i, mult in enumerate(cfg.ch_mult):
        for j in range(cfg.num_res_blocks):
            h = _resnet(p.scope(f"down.{i}.block.{j}."), h)
        if i != len(cfg.ch_mult) - 1:
            # asymmetric (0,1,0,1) pad + stride-2 conv (Downsample, ldm style)
            hpad = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
            h = nn.conv2d(
                hpad,
                p(f"down.{i}.downsample.conv.weight"),
                p(f"down.{i}.downsample.conv.bias"),
                stride=2,
            )
    h = _resnet(p.scope("mid.block_1."), h)
    h = _attn_block(p.scope("mid.attn_1."), h)
    h = _resnet(p.scope("mid.block_2."), h)
    h = _gn(h, p("norm_out.weight"), p("norm_out.bias"))
    h = nn.silu(h)
    h = nn.conv2d(h, p("conv_out.weight"), p("conv_out.bias"), padding=1)
    if cfg.has_quant_conv:
        h = nn.conv2d(h, params["quant_conv.weight"], params["quant_conv.bias"])
    return h


def apply_decoder(params: dict, z, cfg: VAEConfig = SD_VAE):
    """latent (B,h,w,z) -> pixels (B,H,W,3) in [-1,1] (Decoder, :416)."""
    if cfg.has_quant_conv:
        z = nn.conv2d(
            z, params["post_quant_conv.weight"], params["post_quant_conv.bias"]
        )
    p = nn.ParamView(params, "decoder.")
    h = nn.conv2d(z, p("conv_in.weight"), p("conv_in.bias"), padding=1)
    h = _resnet(p.scope("mid.block_1."), h)
    h = _attn_block(p.scope("mid.attn_1."), h)
    h = _resnet(p.scope("mid.block_2."), h)
    for i in reversed(range(len(cfg.ch_mult))):
        for j in range(cfg.num_res_blocks + 1):
            h = _resnet(p.scope(f"up.{i}.block.{j}."), h)
        if i != 0:
            h = nn.interpolate_nearest(h, 2)
            h = nn.conv2d(
                h,
                p(f"up.{i}.upsample.conv.weight"),
                p(f"up.{i}.upsample.conv.bias"),
                padding=1,
            )
    h = _gn(h, p("norm_out.weight"), p("norm_out.bias"))
    h = nn.silu(h)
    return nn.conv2d(h, p("conv_out.weight"), p("conv_out.bias"), padding=1)


def gaussian_sample(moments, noise=None):
    """DiagonalGaussianDistribution.sample (VariationalAE.py:15-52): NHWC
    moments (mean|logvar on channel axis). noise=None -> mode (deterministic)."""
    mean, logvar = jnp.split(moments, 2, axis=-1)
    if noise is None:
        return mean
    logvar = jnp.clip(logvar, -30.0, 20.0)
    return mean + jnp.exp(0.5 * logvar) * noise


# ---------------------------------------------------------------------------
# Facade
# ---------------------------------------------------------------------------


class VAE:
    """VAE facade (VariationalAE.py:570-770): pixel scaling, jitted
    encode/decode, tiled fallback for large images."""

    def __init__(self, params: dict, cfg: VAEConfig = SD_VAE, dtype=jnp.float32):
        from lightdiffusion_next_tpu.utils import state_dict as sd_utils

        self.cfg = cfg
        self.dtype = dtype
        self.params = sd_utils.device_put_params(params, dtype)
        # config_jit: the spatial-attention dispatch inside the decoder
        # consults the global attention backend at trace time, so the
        # compiled program's identity must include config.trace_token()
        from lightdiffusion_next_tpu import config as _config

        self._decode = _config.config_jit(lambda p, z: apply_decoder(p, z, cfg))
        self._encode = _config.config_jit(lambda p, x: apply_encoder(p, x, cfg))

    # Decoder activation peak per latent pixel: 64 output pixels x 128 ch
    # x 4 B x ~handful of live buffers under XLA's scheduler. Matches the
    # reference's measured-constant approach (memory_used_decode,
    # VariationalAE.py:638-642) rather than trying to model the graph.
    _DECODE_BYTES_PER_LATENT_PIXEL = 160 * 1024

    def _max_decode_batch(self, shape) -> int:
        """Largest sub-batch the decoder fits in free HBM — the TPU
        translation of the reference's free-memory batch sizing
        (VAE.decode, VariationalAE.py:690-703). Memory stats may be
        unavailable (CPU tests, some relay setups): assume 8 GB free."""
        try:
            st = jax.local_devices()[0].memory_stats() or {}
            free = st["bytes_limit"] - st["bytes_in_use"]
        except Exception:
            free = 8 << 30
        per_image = shape[1] * shape[2] * self._DECODE_BYTES_PER_LATENT_PIXEL
        return max(1, int(free * 0.8) // max(per_image, 1))

    def _decode_scaled(self, samples):
        out = self._decode(self.params, samples.astype(self.dtype))
        return jnp.clip((out.astype(jnp.float32) + 1.0) / 2.0, 0.0, 1.0)

    def decode(self, samples):
        """latent NHWC -> images NHWC float32 in [0,1].

        Decodes in free-memory-sized sub-batches; if even a single image
        exhausts HBM, falls back to tiled decoding (the reference's OOM
        path, VariationalAE.py:704-716)."""
        b = samples.shape[0]
        step = min(self._max_decode_batch(samples.shape), b)
        try:
            if step >= b:
                out = self._decode_scaled(samples)
            else:
                outs = []
                for i in range(0, b, step):
                    chunk = samples[i : i + step]
                    n = chunk.shape[0]
                    if n < step:  # ragged tail: pad to the chunk shape so
                        # the batch-``step`` executable is reused (a second
                        # full-size decoder compile costs tens of seconds
                        # over a relay-attached TPU)
                        chunk = jnp.concatenate(
                            [chunk, chunk[-1:].repeat(step - n, axis=0)],
                            axis=0,
                        )
                    outs.append(self._decode_scaled(chunk)[:n])
                out = jnp.concatenate(outs, axis=0)
            # force execution INSIDE the try: dispatch is async, and an
            # execution-time OOM surfacing at the caller's np.asarray
            # would bypass this fallback
            return jax.block_until_ready(out)
        except jax.errors.JaxRuntimeError as e:  # pragma: no cover - OOM path
            if "RESOURCE_EXHAUSTED" not in str(e):
                raise
            return self.decode_tiled(samples)

    def decode_tiled(self, samples, tile: int = 64, overlap: int = 16):
        from lightdiffusion_next_tpu.utils import tiling

        def dec(z):
            # _decode_scaled directly: decode() falls back HERE on OOM, so
            # routing tiles back through decode() could recurse
            return self._decode_scaled(z)

        return tiling.tiled_apply_2d(
            dec, samples, tile=tile, overlap=overlap, upscale=8, out_channels=3
        )

    def encode(self, pixels, noise=None):
        """images NHWC in [0,1] -> latent NHWC (mode unless noise given)."""
        x = pixels.astype(self.dtype) * 2.0 - 1.0
        moments = self._encode(self.params, x)
        return gaussian_sample(moments.astype(jnp.float32), noise)


# ---------------------------------------------------------------------------
# Random init for tests
# ---------------------------------------------------------------------------


def init_params(cfg: VAEConfig = SD_VAE, seed: int = 0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    P = {}

    def conv(key, out_c, in_c, k=3):
        P[key + ".weight"] = rng.normal(0, (in_c * k * k) ** -0.5, (k, k, in_c, out_c))
        P[key + ".bias"] = np.zeros((out_c,))

    def norm(key, c):
        P[key + ".weight"] = np.ones((c,))
        P[key + ".bias"] = np.zeros((c,))

    def res(prefix, cin, cout):
        norm(prefix + "norm1", cin)
        conv(prefix + "conv1", cout, cin)
        norm(prefix + "norm2", cout)
        conv(prefix + "conv2", cout, cout)
        if cin != cout:
            conv(prefix + "nin_shortcut", cout, cin, k=1)

    def attn(prefix, c):
        norm(prefix + "norm", c)
        for nme in ("q", "k", "v", "proj_out"):
            conv(prefix + nme, c, c, k=1)

    # encoder
    conv("encoder.conv_in", cfg.ch, cfg.in_channels)
    ch = cfg.ch
    for i, mult in enumerate(cfg.ch_mult):
        out = cfg.ch * mult
        for j in range(cfg.num_res_blocks):
            res(f"encoder.down.{i}.block.{j}.", ch, out)
            ch = out
        if i != len(cfg.ch_mult) - 1:
            conv(f"encoder.down.{i}.downsample.conv", ch, ch)
    res("encoder.mid.block_1.", ch, ch)
    attn("encoder.mid.attn_1.", ch)
    res("encoder.mid.block_2.", ch, ch)
    norm("encoder.norm_out", ch)
    zc = cfg.z_channels * (2 if cfg.double_z else 1)
    conv("encoder.conv_out", zc, ch)
    if cfg.has_quant_conv:
        conv("quant_conv", zc, zc, k=1)
        conv("post_quant_conv", cfg.z_channels, cfg.z_channels, k=1)

    # decoder
    conv("decoder.conv_in", ch, cfg.z_channels)
    res("decoder.mid.block_1.", ch, ch)
    attn("decoder.mid.attn_1.", ch)
    res("decoder.mid.block_2.", ch, ch)
    for i in reversed(range(len(cfg.ch_mult))):
        out = cfg.ch * cfg.ch_mult[i]
        for j in range(cfg.num_res_blocks + 1):
            res(f"decoder.up.{i}.block.{j}.", ch, out)
            ch = out
        if i != 0:
            conv(f"decoder.up.{i}.upsample.conv", ch, ch)
    norm("decoder.norm_out", ch)
    conv("decoder.conv_out", cfg.out_ch, ch)
    return {k: np.asarray(v, dtype=np.float32) for k, v in P.items()}
