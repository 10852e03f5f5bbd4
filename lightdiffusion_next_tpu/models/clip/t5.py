"""T5 encoder (T5-XXL for Flux), TPU-native.

Counterpart of src/clip/FluxClip.py:15-592 (T5DenseGatedActDense, T5Attention
with relative position bias, T5LayerNorm=RMSNorm, T5Stack, T5XXLModel).

Notes carried over:
- T5 attention is UNSCALED (the reference cancels the 1/sqrt(d) by
  pre-scaling k, FluxClip.py:267); we simply skip the scale.
- Relative position bias comes only from block 0's embedding and is passed
  down the stack (past_bias threading, :242-270).
- Gated gelu_pytorch_tanh feed-forward.

Param keys are HF T5 encoder names: shared.weight,
encoder.block.{i}.layer.0.SelfAttention.{q,k,v,o}.weight,
...relative_attention_bias.weight, layer.{0,1}.layer_norm.weight,
layer.1.DenseReluDense.{wi_0,wi_1,wo}.weight, encoder.final_layer_norm.weight
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lightdiffusion_next_tpu.ops import nn


@dataclasses.dataclass(frozen=True)
class T5Config:
    d_model: int = 4096
    d_ff: int = 10240
    num_heads: int = 64
    num_layers: int = 24
    vocab_size: int = 32128
    relative_num_buckets: int = 32
    relative_max_distance: int = 128


T5_XXL = T5Config()


def relative_position_bucket(
    relative_position: np.ndarray,
    bidirectional: bool = True,
    num_buckets: int = 32,
    max_distance: int = 128,
) -> np.ndarray:
    """Mesh-TF bucket mapping (FluxClip.py:153-205). Host-side numpy — the
    bucket table depends only on (Lq, Lk), so it is a trace-time constant."""
    relative_buckets = np.zeros_like(relative_position)
    if bidirectional:
        num_buckets //= 2
        relative_buckets += (relative_position > 0).astype(np.int64) * num_buckets
        relative_position = np.abs(relative_position)
    else:
        relative_position = -np.minimum(relative_position, 0)
    max_exact = num_buckets // 2
    is_small = relative_position < max_exact
    with np.errstate(divide="ignore"):
        rp_large = max_exact + (
            np.log(np.maximum(relative_position, 1) / max_exact)
            / math.log(max_distance / max_exact)
            * (num_buckets - max_exact)
        ).astype(np.int64)
    rp_large = np.minimum(rp_large, num_buckets - 1)
    relative_buckets += np.where(is_small, relative_position, rp_large)
    return relative_buckets


def compute_bias_table(q_len: int, k_len: int, cfg: T5Config) -> np.ndarray:
    ctx = np.arange(q_len, dtype=np.int64)[:, None]
    mem = np.arange(k_len, dtype=np.int64)[None, :]
    return relative_position_bucket(
        mem - ctx,
        bidirectional=True,
        num_buckets=cfg.relative_num_buckets,
        max_distance=cfg.relative_max_distance,
    )


def _t5_attention(p: nn.ParamView, x, bias, heads: int):
    q = nn.linear(x, p("q.weight"))
    k = nn.linear(x, p("k.weight"))
    v = nn.linear(x, p("v.weight"))
    b, l, inner = q.shape
    d = inner // heads

    def split(t):
        return t.reshape(b, l, heads, d).transpose(0, 2, 1, 3)

    q, k, v = split(q), split(k), split(v)
    # UNSCALED logits + additive bias (T5 semantics)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    if bias is not None:
        logits = logits + bias.astype(logits.dtype)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, l, inner)
    return nn.linear(out, p("o.weight"))


def _t5_block(p: "nn.ParamView", x, bias, cfg: T5Config):
    """One T5 encoder block (attention + gated-gelu FF with pre-RMSNorm
    residuals) — shared by the unrolled loop and the scan body."""
    h = nn.rms_norm(x, p("layer.0.layer_norm.weight"))
    x = x + _t5_attention(
        p.scope("layer.0.SelfAttention."), h, bias, cfg.num_heads
    )
    h = nn.rms_norm(x, p("layer.1.layer_norm.weight"))
    hg = nn.gelu(
        nn.linear(h, p("layer.1.DenseReluDense.wi_0.weight")), approximate=True
    )
    hl = nn.linear(h, p("layer.1.DenseReluDense.wi_1.weight"))
    return x + nn.linear(hg * hl, p("layer.1.DenseReluDense.wo.weight"))


T5_STACK_KEY = "__t5_block_stack__"
_BIAS_REL = "layer.0.SelfAttention.relative_attention_bias.weight"


def is_stacked(params: Dict) -> bool:
    return T5_STACK_KEY in params


def stack_t5_block_params(params: Dict, cfg: T5Config) -> Dict:
    """Scan-over-blocks re-grouping for the T5 encoder: every
    ``encoder.block.{i}.{rel}`` family stacks along a leading depth axis
    under ``__t5_block_stack__`` (same machinery as the Flux stacker —
    ops.ggml.stack_leaves, Pallas scalar-prefetch streaming for quantized
    leaves). The block-0-only relative_attention_bias embedding stays at
    its flat key (it is read once before the stack loop, not per block).

    CONSUMES ``params`` (validate-first donation semantics, see
    models.flux.stack_block_params); raises ValueError before consuming
    for non-uniform/ragged families."""
    from lightdiffusion_next_tpu.ops import ggml

    out: Dict = {}
    fams: Dict[str, Dict[int, object]] = {}
    pre = "encoder.block."
    for k, v in params.items():
        if k.startswith(pre):
            idx_s, _, rel = k[len(pre):].partition(".")
            if idx_s.isdigit() and rel and rel != _BIAS_REL:
                fams.setdefault(rel, {})[int(idx_s)] = v
                continue
        out[k] = v
    for rel, by_idx in fams.items():
        if sorted(by_idx) != list(range(cfg.num_layers)):
            raise ValueError(
                f"encoder.block.*.{rel}: blocks {sorted(by_idx)} != "
                f"0..{cfg.num_layers - 1}"
            )
        ggml.check_stackable([by_idx[i] for i in range(cfg.num_layers)])
    params.clear()
    stacked = {}
    for rel in list(fams):
        by_idx = fams.pop(rel)
        leaves = [by_idx.pop(i) for i in range(cfg.num_layers)]
        s = ggml.stack_leaves(leaves)
        del leaves
        jax.block_until_ready(s)  # bound peak memory to one family's stack
        stacked[rel] = s
    out[T5_STACK_KEY] = stacked
    return out


def apply_t5(params, tokens, attention_mask=None, **kw):
    """Jitted T5 encode — see _apply_t5. The jit is created lazily so it
    carries config.jit_compiler_options() (the raised scoped-vmem limit):
    T5-XXL is Q8_0-quantized and the fused quant-matmul picks tiles
    against that budget, so a top-level jit compiling those kernels
    WITHOUT the option would hit a scoped-vmem OOM once the token batch
    grows past the small-tile range (M <= ~512 today)."""
    from lightdiffusion_next_tpu import config as _config

    return _jitted_apply_t5(_config.trace_token())(
        params, tokens, attention_mask, **kw
    )


@functools.lru_cache(maxsize=None)
def _jitted_apply_t5(_trace_token=None):
    # keyed on config.trace_token(): a mid-session attention-backend /
    # sage flip must get a fresh jit, not the previous mode's program
    from lightdiffusion_next_tpu import config as _config

    return _config.ldt_jit(
        _apply_t5,
        static_argnames=(
            "intermediate_output",
            "final_layer_norm_intermediate",
            "cfg",
            "compute_dtype",
        ),
    )


def _apply_t5(
    params: Dict,
    tokens,  # (B, L) int32
    attention_mask=None,  # (B, L) 1=attend
    intermediate_output: Optional[int] = None,
    final_layer_norm_intermediate: bool = True,
    cfg: T5Config = T5_XXL,
    compute_dtype=jnp.float32,
):
    """T5Stack.forward parity (FluxClip.py:457-500). Returns (x, intermediate,
    pooled=None). ``compute_dtype`` is the activation dtype (the reference
    Embedding casts gathered rows to out_dtype, Quantizer.py:404-431; use
    bf16 on TPU — norms/softmax stay fp32 inside ops.nn regardless).

    Jitted at the definition: the 4.7B-param T5-XXL executed EAGERLY here
    costs tens of seconds of op-by-op dispatch over a relay-attached TPU
    per prompt (same bug class as the dy sampler, ARCHITECTURE §3)."""
    x = nn.embedding_lookup(
        tokens, params["shared.weight"], dtype=compute_dtype
    )

    L = x.shape[1]
    buckets = jnp.asarray(compute_bias_table(L, L, cfg))
    bias_emb = params["encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"]
    if hasattr(bias_emb, "dequantize"):  # Q8_0-quantized bias table
        bias = nn.embedding_lookup(
            buckets.reshape(-1), bias_emb, dtype=jnp.float32
        ).reshape(L, L, -1)
    else:
        bias = jnp.take(bias_emb, buckets, axis=0)  # (L, L, H)
    bias = bias.transpose(2, 0, 1)[None].astype(jnp.float32)  # (1, H, L, L)
    if attention_mask is not None:
        am = jnp.asarray(attention_mask, dtype=jnp.float32)
        bias = bias + (1.0 - am)[:, None, None, :] * -1e9

    if intermediate_output is not None and intermediate_output < 0:
        intermediate_output = cfg.num_layers + intermediate_output

    intermediate = None
    if is_stacked(params):
        # scan-over-blocks (stack_t5_block_params): one block body instead
        # of num_layers unrolled — same compile-size lever as the Flux
        # --flux-scan forward. intermediate_output is STATIC, so the scan
        # splits there (segment ends are trace-time constants).
        stack = params[T5_STACK_KEY]

        def body(x_, idx):
            return _t5_block(nn.StackView(stack, idx), x_, bias, cfg), None

        def run(x_, lo: int, hi: int):
            if hi <= lo:
                return x_
            return jax.lax.scan(body, x_, jnp.arange(lo, hi))[0]

        if intermediate_output is None:
            x = run(x, 0, cfg.num_layers)
        else:
            x = run(x, 0, intermediate_output + 1)
            intermediate = x
            x = run(x, intermediate_output + 1, cfg.num_layers)
    else:
        for i in range(cfg.num_layers):
            p = nn.ParamView(params, f"encoder.block.{i}.")
            x = _t5_block(p, x, bias, cfg)
            if intermediate_output is not None and i == intermediate_output:
                intermediate = x
    x = nn.rms_norm(x, params["encoder.final_layer_norm.weight"])
    if intermediate is not None and final_layer_norm_intermediate:
        intermediate = nn.rms_norm(
            intermediate, params["encoder.final_layer_norm.weight"]
        )
    return x, intermediate, None


def detect_config(params: Dict) -> T5Config:
    """T5Config from state-dict shapes (leaves may be quantized records —
    only ``.shape`` is read). The reference hardcodes T5-XXL
    (FluxClip.py:501-592); detection lets scaled-down checkpoints / test
    assets load through the same path."""
    def shape(k):
        return tuple(params[k].shape)

    vocab, d_model = shape("shared.weight")
    n_layers = 0
    while f"encoder.block.{n_layers}.layer.0.layer_norm.weight" in params:
        n_layers += 1
    buckets, heads = shape(
        "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"
    )
    d_ff = shape("encoder.block.0.layer.1.DenseReluDense.wi_0.weight")[0]
    return T5Config(
        d_model=d_model,
        d_ff=d_ff,
        num_heads=heads,
        num_layers=n_layers or T5_XXL.num_layers,
        vocab_size=vocab,
        relative_num_buckets=buckets,
    )


class T5XXLModel:
    """SDClipModel-like facade for T5 (T5XXLModel, FluxClip.py:565-592)."""

    def __init__(
        self,
        params: Dict,
        cfg: T5Config = T5_XXL,
        dtype=jnp.float32,
        compute_dtype=None,
        scan_blocks: bool = False,
    ):
        from lightdiffusion_next_tpu.utils import state_dict as sd_utils

        self.cfg = cfg
        # quantized (QTensor8/QTensor8T) and already-device leaves pass
        # through; only host numpy arrays need the packed upload
        plain = {k: v for k, v in params.items() if isinstance(v, np.ndarray)}
        rest = {k: v for k, v in params.items() if k not in plain}
        self.params = {**sd_utils.device_put_params(plain, dtype), **rest}
        if scan_blocks:
            # AFTER the device upload so the stacks build on device; falls
            # back to the unrolled layout for unstackable checkpoints
            try:
                self.params = stack_t5_block_params(self.params, cfg)
            except ValueError as e:
                import logging

                logging.getLogger(__name__).warning(
                    "t5 scan-over-blocks unavailable (%s); keeping the "
                    "unrolled encoder", e,
                )
        self.compute_dtype = compute_dtype or dtype
        self.special_tokens = {"end": 1, "pad": 0}

    def encode_token_weights(self, token_weight_pairs):
        """T5 path ignores per-token weights' lerp (the reference encodes the
        weighted rows identically because T5 has no empty-row lerp in the
        Flux flow — FluxClipModel.encode_token_weights, :704-755 uses plain
        encode)."""
        rows = [[int(a[0]) for a in row] for row in token_weight_pairs]
        tokens = jnp.asarray(np.asarray(rows, dtype=np.int32))
        out, _, _ = apply_t5(
            self.params, tokens, cfg=self.cfg, compute_dtype=self.compute_dtype
        )
        return np.asarray(out, dtype=np.float32), None


def init_params(cfg: T5Config = T5_XXL, seed: int = 0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    P = {}

    def lin(key, out_d, in_d):
        P[key + ".weight"] = rng.normal(0, in_d**-0.5, (out_d, in_d)).astype(
            np.float32
        )

    P["shared.weight"] = rng.normal(0, 1.0, (cfg.vocab_size, cfg.d_model)).astype(
        np.float32
    )
    P[
        "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"
    ] = rng.normal(0, 0.1, (cfg.relative_num_buckets, cfg.num_heads)).astype(
        np.float32
    )
    for i in range(cfg.num_layers):
        pre = f"encoder.block.{i}."
        for nme in "qkvo":
            lin(pre + f"layer.0.SelfAttention.{nme}", cfg.d_model, cfg.d_model)
        P[pre + "layer.0.layer_norm.weight"] = np.ones((cfg.d_model,), np.float32)
        lin(pre + "layer.1.DenseReluDense.wi_0", cfg.d_ff, cfg.d_model)
        lin(pre + "layer.1.DenseReluDense.wi_1", cfg.d_ff, cfg.d_model)
        lin(pre + "layer.1.DenseReluDense.wo", cfg.d_model, cfg.d_ff)
        P[pre + "layer.1.layer_norm.weight"] = np.ones((cfg.d_model,), np.float32)
    P["encoder.final_layer_norm.weight"] = np.ones((cfg.d_model,), np.float32)
    return {k: jnp.asarray(v, dtype=dtype) for k, v in P.items()}
