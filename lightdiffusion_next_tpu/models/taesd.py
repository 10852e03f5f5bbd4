"""TAESD tiny autoencoder (latent preview decode / fast encode).

Counterpart of src/AutoEncoders/taesd.py:17-255 (conv/Block/Encoder2/
Decoder2/TAESD). Flat params use the checkpoint's nn.Sequential index keys
("decoder.1.weight", "decoder.3.conv.0.weight", ...), NHWC/HWIO layout.

The preview pipeline (taesd_preview threads, samplers.py:160 etc.) becomes
app.previews.PreviewWriter — decode here is a tiny jitted program dispatched
async; no thread reads live tensors.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from lightdiffusion_next_tpu.ops import nn

LATENT_MAGNITUDE = 3.0
LATENT_SHIFT = 0.5

# Sequential layouts (index -> kind): taesd.py Encoder2/Decoder2
_ENCODER_LAYOUT = [
    ("conv", 3, 64), ("block", 64, 64), ("sconv", 64, 64), ("block", 64, 64),
    ("block", 64, 64), ("block", 64, 64), ("sconv", 64, 64), ("block", 64, 64),
    ("block", 64, 64), ("block", 64, 64), ("sconv", 64, 64), ("block", 64, 64),
    ("block", 64, 64), ("block", 64, 64), ("conv", 64, 4),
]
_DECODER_LAYOUT = [
    ("clamp",), ("conv", 4, 64), ("relu",), ("block", 64, 64), ("block", 64, 64),
    ("block", 64, 64), ("up",), ("conv_nb", 64, 64), ("block", 64, 64),
    ("block", 64, 64), ("block", 64, 64), ("up",), ("conv_nb", 64, 64),
    ("block", 64, 64), ("block", 64, 64), ("block", 64, 64), ("up",),
    ("conv_nb", 64, 64), ("block", 64, 64), ("conv", 64, 3),
]


def _block(p: nn.ParamView, x):
    h = nn.conv2d(x, p("conv.0.weight"), p("conv.0.bias"), padding=1)
    h = jnp.maximum(h, 0)
    h = nn.conv2d(h, p("conv.2.weight"), p("conv.2.bias"), padding=1)
    h = jnp.maximum(h, 0)
    h = nn.conv2d(h, p("conv.4.weight"), p("conv.4.bias"), padding=1)
    if p.has("skip.weight"):
        x = nn.conv2d(x, p("skip.weight"))
    return jnp.maximum(h + x, 0)


def _run_sequential(params: Dict, prefix: str, layout, x):
    for i, spec in enumerate(layout):
        kind = spec[0]
        p = nn.ParamView(params, f"{prefix}{i}.")
        if kind == "clamp":
            x = jnp.tanh(x / 3.0) * 3.0
        elif kind == "relu":
            x = jnp.maximum(x, 0)
        elif kind == "up":
            x = nn.interpolate_nearest(x, 2)
        elif kind == "conv":
            x = nn.conv2d(x, p("weight"), p("bias"), padding=1)
        elif kind == "conv_nb":
            x = nn.conv2d(x, p("weight"), padding=1)
        elif kind == "sconv":
            x = nn.conv2d(x, p("weight"), stride=2, padding=1)
        elif kind == "block":
            x = _block(p, x)
    return x


@functools.partial(jax.jit, static_argnames=("vae_scale", "vae_shift"))
def decode(params: Dict, latent, vae_scale: float = 1.0, vae_shift: float = 0.0):
    """latent NHWC -> image NHWC in [-1, 1] (TAESD.decode parity). Keys are
    expected under prefix 'decoder.'. Jitted: ~50 conv layers dispatched
    eagerly over a relay-attached TPU cost seconds per preview."""
    x = (latent - vae_shift) * vae_scale
    return _run_sequential(params, "decoder.", _DECODER_LAYOUT, x)


@functools.partial(jax.jit, static_argnames=("vae_scale", "vae_shift"))
def encode(params: Dict, image, vae_scale: float = 1.0, vae_shift: float = 0.0):
    """image NHWC [-1,1] -> latent (TAESD.encode parity)."""
    x = image * 0.5 + 0.5
    lat = _run_sequential(params, "encoder.", _ENCODER_LAYOUT, x)
    return lat / vae_scale + vae_shift


def scale_latents(x):
    return jnp.clip(x / (2 * LATENT_MAGNITUDE) + LATENT_SHIFT, 0, 1)


def unscale_latents(x):
    return (x - LATENT_SHIFT) * (2 * LATENT_MAGNITUDE)


def normalize_decoder_params(sd: Dict) -> "Dict | None":
    """Accept the circulating TAESD checkpoint layouts and return a dict in
    this module's 'decoder.N.*' sequential convention, or None when the
    layout is unrecognized (callers then fall back to linear-RGB previews
    instead of failing on every preview step):

    - 'decoder.N.*'          — this module / raw taesd repo with prefix
    - bare 'N.*'             — taesd_decoder.safetensors (decoder-only dump)
    - 'decoder.layers.N.*'   — diffusers AutoencoderTiny (taef1); its
      DecoderTiny has no Clamp layer (tanh applied in forward), so indices
      shift by one vs our layout's clamp at 0
    """
    keys = list(sd)
    if any(k.startswith("decoder.layers.") for k in keys):
        out = {}
        for k, v in sd.items():
            if not k.startswith("decoder.layers."):
                continue
            rest = k[len("decoder.layers."):]
            idx, _, tail = rest.partition(".")
            if not idx.isdigit():
                return None
            out[f"decoder.{int(idx) + 1}.{tail}"] = v
        sd = out
    elif not any(k.startswith("decoder.") for k in keys):
        if keys and all(k.split(".")[0].isdigit() for k in keys):
            sd = {f"decoder.{k}": v for k, v in sd.items()}
        else:
            return None
    else:
        sd = {k: v for k, v in sd.items() if k.startswith("decoder.")}
    # structural check against _DECODER_LAYOUT's conv positions — a wrong
    # layout must be rejected here, not KeyError per preview step
    required = [
        f"decoder.{i}.weight"
        for i, spec in enumerate(_DECODER_LAYOUT)
        if spec[0] in ("conv", "conv_nb")
    ]
    if not all(k in sd for k in required):
        return None
    return sd


def decode_preview(params: Dict, latent) -> np.ndarray:
    """latent -> uint8-ready float [0,1] RGB (taesd_preview semantics,
    taesd.py:257-310)."""
    img = decode(params, latent)
    img = jnp.clip((img + 1.0) / 2.0, 0.0, 1.0)
    return np.asarray(img)


def init_params(seed: int = 0, latent_channels: int = 4) -> Dict:
    rng = np.random.default_rng(seed)
    P = {}

    def conv(key, cin, cout, bias=True, k=3):
        P[key + ".weight"] = rng.normal(0, (cin * k * k) ** -0.5, (k, k, cin, cout)).astype(np.float32)
        if bias:
            P[key + ".bias"] = np.zeros((cout,), np.float32)

    def emit(prefix, layout):
        for i, spec in enumerate(layout):
            kind = spec[0]
            key = f"{prefix}{i}"
            if kind in ("conv", "sconv"):
                cin, cout = spec[1], spec[2]
                conv(key, cin, cout, bias=(kind == "conv"))
            elif kind == "conv_nb":
                conv(key, spec[1], spec[2], bias=False)
            elif kind == "block":
                cin, cout = spec[1], spec[2]
                conv(key + ".conv.0", cin, cout)
                conv(key + ".conv.2", cout, cout)
                conv(key + ".conv.4", cout, cout)
                if cin != cout:
                    conv(key + ".skip", cin, cout, bias=False, k=1)

    # encoder conv_out is latent_channels wide
    layout_enc = list(_ENCODER_LAYOUT)
    layout_enc[-1] = ("conv", 64, latent_channels)
    layout_dec = list(_DECODER_LAYOUT)
    layout_dec[1] = ("conv", latent_channels, 64)
    emit("encoder.", layout_enc)
    emit("decoder.", layout_dec)
    return P
