"""Minimal functional NN ops over flat state-dict params.

Design: model parameters are FLAT dicts keyed by the original (LDM/HF) state
-dict names — "the state dict is the pytree". Forward passes are pure
functions indexing that dict. This replaces the reference's cast-op layer
(src/cond/cast.py:88-525): there is no runtime dtype/device casting because
XLA owns placement and the dtype policy is applied once at load time.

Layout conventions (TPU-native):
- activations NHWC
- conv kernels HWIO (transformed from torch OIHW once, at load)
- linear weights kept in torch (out, in) layout; ``linear`` contracts
  x @ W^T via dot_general so no transpose materializes.

Norms compute in fp32 regardless of activation dtype (bf16-safe).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def linear(x, w, b=None):
    """x: (..., in), w: (out, in) torch layout, b: (out,).

    ``w`` may be a quantized ops.ggml.QTensor8/QTensor8T — the weight lives
    in HBM at int8 (GGMLOps.Linear parity, src/Quantize/Quantizer.py:334-390).
    QTensor8T routes through the fused Pallas dequant-matmul kernel
    (ops.quant_matmul); QTensor8 dequantizes into the trace."""
    if hasattr(w, "fused_matmul"):
        y = w.fused_matmul(x)
        if b is not None:
            y = y + b.astype(y.dtype)
        return y
    if hasattr(w, "dequantize"):
        w = w.dequantize(x.dtype)
    y = jax.lax.dot_general(
        x,
        w,
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=x.dtype,
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def conv2d(x, w, b=None, stride: int = 1, padding: int = 0, dilation: int = 1):
    """x: NHWC, w: HWIO, returns NHWC."""
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    y = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def group_norm(x, scale, bias, groups: int = 32, eps: float = 1e-5):
    """NHWC group norm, stats in fp32 (torch GroupNorm parity)."""
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h * w, groups, c // groups)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = xf.var(axis=(1, 3), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(b, h, w, c)
    if scale is not None:
        xf = xf * scale.astype(jnp.float32)
    if bias is not None:
        xf = xf + bias.astype(jnp.float32)
    return xf.astype(x.dtype)


def layer_norm(x, scale=None, bias=None, eps: float = 1e-5):
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = xf.var(axis=-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    if scale is not None:
        xf = xf * scale.astype(jnp.float32)
    if bias is not None:
        xf = xf + bias.astype(jnp.float32)
    return xf.astype(x.dtype)


def rms_norm(x, scale=None, eps: float = 1e-6):
    xf = x.astype(jnp.float32)
    xf = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    if scale is not None:
        xf = xf * scale.astype(jnp.float32)
    return xf.astype(x.dtype)


def silu(x):
    return jax.nn.silu(x)


def gelu(x, approximate: bool = False):
    return jax.nn.gelu(x, approximate=approximate)


def geglu(x, w, b):
    """GEGLU feed-forward gate: Linear -> split -> x * gelu(gate)
    (src/NeuralNetwork/transformer.py FeedForward/GEGLU parity; torch uses
    exact erf gelu)."""
    proj = linear(x, w, b)
    val, gate = jnp.split(proj, 2, axis=-1)
    return val * gelu(gate, approximate=False)


def interpolate_nearest(x, scale: int = 2):
    """NHWC nearest-neighbor upsample by integer factor (torch 'nearest')."""
    b, h, w, c = x.shape
    x = jnp.repeat(x, scale, axis=1)
    x = jnp.repeat(x, scale, axis=2)
    return x


def interpolate_bilinear(x, size, align_corners: bool = False):
    """NHWC bilinear resize matching torch.nn.functional.interpolate.

    torch does NOT antialias on downscale (unlike jax.image.resize), so this
    is a plain separable 2-tap gather with half-pixel (align_corners=False)
    or endpoint (align_corners=True) sample coordinates.
    """
    b, h, w, c = x.shape
    out_h, out_w = size
    if align_corners and out_h > 1 and out_w > 1:
        ys = jnp.linspace(0.0, h - 1.0, out_h)
        xs = jnp.linspace(0.0, w - 1.0, out_w)
    else:
        ys = jnp.clip((jnp.arange(out_h) + 0.5) * (h / out_h) - 0.5, 0, h - 1)
        xs = jnp.clip((jnp.arange(out_w) + 0.5) * (w / out_w) - 0.5, 0, w - 1)
    return _separable_linear_gather(x, ys, xs)


def _separable_linear_gather(x, ys, xs):
    y0 = jnp.floor(ys).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, x.shape[1] - 1)
    wy = (ys - y0)[None, :, None, None]
    xa = x[:, y0] * (1 - wy) + x[:, y1] * wy
    x0 = jnp.floor(xs).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, x.shape[2] - 1)
    wx = (xs - x0)[None, None, :, None]
    return (xa[:, :, x0] * (1 - wx) + xa[:, :, x1] * wx).astype(x.dtype)


def embedding_lookup(ids, table, dtype=None):
    """ids: int (...,), table: (vocab, dim).

    A quantized table (ops.ggml.QTensor8, e.g. a Q8_0 T5 ``token_embd``)
    is dequantized row-wise after the gather — only the looked-up rows
    ever materialize. ``dtype`` is the compute dtype of the returned rows
    (defaults to bf16 for quantized tables, matching the reference
    Embedding's out_dtype cast, src/Quantize/Quantizer.py:404-431)."""
    if hasattr(table, "qt"):
        raise TypeError(
            "embedding table was laid out as a fused-matmul QTensor8T; pass "
            "its key in to_device_quantized(embed_keys=...) so it keeps the "
            "row-major QTensor8 layout for lookup"
        )
    if hasattr(table, "q"):  # QTensor8: q (vocab, nb, 32), scales (vocab, nb)
        q_rows = jnp.take(table.q, ids, axis=0)
        s_rows = jnp.take(table.scales, ids, axis=0)
        rows = q_rows.astype(jnp.float32) * s_rows[..., None]
        rows = rows.reshape(ids.shape + (table.shape[-1],))
        return rows.astype(dtype or jnp.bfloat16)
    rows = jnp.take(table, ids, axis=0)
    return rows if dtype is None else rows.astype(dtype)


class ParamView:
    """Prefix-scoped view over a flat param dict: p('in_layers.0.weight')."""

    __slots__ = ("params", "prefix")

    def __init__(self, params: dict, prefix: str = ""):
        self.params = params
        self.prefix = prefix

    def __call__(self, key: str):
        return self.params[self.prefix + key]

    def get(self, key: str, default=None):
        return self.params.get(self.prefix + key, default)

    def has(self, key: str) -> bool:
        return (self.prefix + key) in self.params

    def scope(self, sub: str) -> "ParamView":
        return ParamView(self.params, self.prefix + sub)

    def keys(self):
        return [k for k in self.params if k.startswith(self.prefix)]


class StackView:
    """ParamView-compatible view over a STACKED block-param dict at block
    ``idx`` (a traced scan counter, or a static int for an unrolled block).
    Quantized stacked leaves return scalar-prefetch slice views (the fused
    kernels read block ``idx``'s tiles in place — ops.ggml
    StackedQTensor8T/W ``at_index``); dense stacked leaves (biases, norm
    scales, dense-checkpoint weights) gather row ``idx``. Used by the
    scan-over-blocks forwards (models/flux.py, models/clip/t5.py)."""

    __slots__ = ("params", "idx", "prefix")

    def __init__(self, params: dict, idx, prefix: str = ""):
        self.params = params
        self.idx = idx
        self.prefix = prefix

    def _slice(self, leaf):
        if hasattr(leaf, "at_index"):
            return leaf.at_index(self.idx)
        if isinstance(self.idx, int):
            return leaf[self.idx]
        return jax.lax.dynamic_index_in_dim(leaf, self.idx, 0, keepdims=False)

    def __call__(self, key: str):
        return self._slice(self.params[self.prefix + key])

    def get(self, key: str, default=None):
        leaf = self.params.get(self.prefix + key)
        return default if leaf is None else self._slice(leaf)

    def has(self, key: str) -> bool:
        return (self.prefix + key) in self.params

    def scope(self, sub: str) -> "StackView":
        return StackView(self.params, self.idx, self.prefix + sub)
