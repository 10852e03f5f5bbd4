"""TP-friendly Flux param layout.

The BFL checkpoint fuses projections along the output dim: double-block
``*_attn.qkv.weight`` stacks rows ``[q(H); k(H); v(H)]`` and single-block
``linear1.weight`` stacks ``[qkv(3H); mlp(mlp_hidden)]`` (Flux.py:268-276,
:362-369). Column-sharding those fused dims over an n-way "model" axis
puts projection/sub-layer boundaries in the middle of shards, so GSPMD
must re-partition the qkv activation at every block (an all-gather of the
(B, 4352, 9216) tensor per stream per block — ~150 × 76 MB per step).

This module re-lays the params out so shard boundaries align with heads:

- qkv rows are HEAD-INTERLEAVED: ``[q_h0; k_h0; v_h0; q_h1; ...]``. A
  "model" shard then holds whole heads (v5e-8: 3 heads × q,k,v each), and
  the ``(B, L, 3H) -> (B, L, heads, 3, d)`` reshape propagates the
  sharding with zero collectives.
- single-block ``linear1`` is SPLIT into ``linear1_qkv`` (interleaved) +
  ``linear1_mlp`` — the fusion is a checkpoint storage artifact, not a
  compute requirement; XLA still fuses the two matmuls over the shared
  input.
- single-block ``linear2`` (input-fused ``[attn(H); mlp(4H)]``) is SPLIT
  along its INPUT dim into ``linear2_attn`` + ``linear2_mlp``. The fused
  input's even n-way sharding crosses the attn/mlp boundary, so GSPMD
  must all-gather BOTH activation halves before the concatenate (for real
  Flux: (B,4352,3072)+(B,4352,12288) per single block per step). Split,
  each matmul is cleanly row-parallel over its own aligned shards and the
  two partial sums fold into the block's single all-reduce.

The transform is value-preserving (pure row permutation/split); the
forward consumes it via ``FluxConfig.tp_layout``. Applied on the host
state dict before upload (pipelines.loader) or on device-resident params
(parallel.inference.shard_flux_model).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import numpy as np

from lightdiffusion_next_tpu.ops import ggml


def qkv_interleave_perm(num_heads: int, head_dim: int) -> np.ndarray:
    """Row permutation [q;k;v] (proj-major) -> head-major [h0:(q,k,v), ...]."""
    idx = np.arange(3 * num_heads * head_dim).reshape(3, num_heads, head_dim)
    return np.ascontiguousarray(idx.transpose(1, 0, 2)).reshape(-1)


def _take_rows(leaf, idx: np.ndarray):
    """Select/permute logical OUTPUT rows of a weight/bias leaf of any
    supported representation."""
    if isinstance(leaf, ggml.QTensorLoRA):
        return ggml.QTensorLoRA(
            base=_take_rows(leaf.base, idx),
            up=leaf.up[idx],
            down=leaf.down,
        )
    if isinstance(leaf, ggml.QTensor8T):  # device fused layout (K, N)
        return ggml.QTensor8T(
            qt=leaf.qt[:, idx],
            scales_t=leaf.scales_t[:, idx],
            shape=(len(idx), leaf.shape[1]),
            tp=leaf.tp,
        )
    if isinstance(leaf, ggml.QTensor8):  # host/row-major (rows, nb, 32)
        return ggml.QTensor8(
            q=leaf.q[idx],
            scales=leaf.scales[idx],
            shape=(len(idx),) + tuple(leaf.shape[1:]),
        )
    if isinstance(leaf, ggml.QTensor8W):  # w8a8 per-column layout (K, N)
        return ggml.QTensor8W(
            qt=leaf.qt[:, idx],
            col_scales=leaf.col_scales[:, idx],
            shape=(len(idx), leaf.shape[1]),
            tp=leaf.tp,
        )
    return leaf[idx]  # dense np/jnp weight (out, in) or bias (out,)


def _take_input_cols(leaf, lo: int, hi: int):
    """Slice the logical INPUT dim [lo:hi) of a weight leaf (any supported
    representation). lo/hi must land on 32-block boundaries for quantized
    leaves (hidden sizes are multiples of 32)."""
    if isinstance(leaf, ggml.QTensorLoRA):
        return ggml.QTensorLoRA(
            base=_take_input_cols(leaf.base, lo, hi),
            up=leaf.up,
            down=leaf.down[:, lo:hi],
        )
    if isinstance(leaf, ggml.QTensor8T):  # device fused layout (K, N)
        assert lo % 32 == 0 and hi % 32 == 0
        return ggml.QTensor8T(
            qt=leaf.qt[lo:hi, :],
            scales_t=leaf.scales_t[lo // 32 : hi // 32, :],
            shape=(leaf.shape[0], hi - lo),
            tp=leaf.tp,
        )
    if isinstance(leaf, ggml.QTensor8):  # host/row-major (rows, nb, 32)
        assert lo % 32 == 0 and hi % 32 == 0
        return ggml.QTensor8(
            q=leaf.q[:, lo // 32 : hi // 32, :],
            scales=leaf.scales[:, lo // 32 : hi // 32],
            shape=(leaf.shape[0], hi - lo),
        )
    if isinstance(leaf, ggml.QTensor8W):  # w8a8 per-column layout (K, N)
        return ggml.QTensor8W(
            qt=leaf.qt[lo:hi, :],
            col_scales=leaf.col_scales,
            shape=(leaf.shape[0], hi - lo),
            tp=leaf.tp,
        )
    return leaf[:, lo:hi]  # dense torch-layout (out, in)


def to_tp_layout_patches(patches: Dict, cfg) -> Dict:
    """Translate LoRA patches (key -> (up (out,rank), down (rank,in),
    alpha)) from checkpoint keyspace to the TP layout keyspace, so a LoRA
    merges correctly onto tp_layout params:

    - double/single qkv rows are head-interleaved -> permute ``up`` rows
    - single-block linear1 is split -> split+permute ``up`` rows
    - single-block linear2 is input-split -> split ``down`` cols

    Without this, a flux LoRA applied to a TP model would silently skip
    the split keys and MIS-apply onto the permuted qkv base. No-op when
    ``cfg.tp_layout`` is False."""
    if not getattr(cfg, "tp_layout", False):
        return patches
    H = cfg.hidden_size
    perm = qkv_interleave_perm(cfg.num_heads, cfg.head_dim)
    mlp_hidden = int(H * cfg.mlp_ratio)
    out = {}
    for key, (up, down, alpha) in patches.items():
        if key.endswith("attn.qkv.weight"):
            out[key] = (np.asarray(up)[perm], down, alpha)
        elif "single_blocks" in key and key.endswith(".linear1.weight"):
            base = key[: -len("linear1.weight")]
            up = np.asarray(up)
            out[base + "linear1_qkv.weight"] = (up[: 3 * H][perm], down, alpha)
            out[base + "linear1_mlp.weight"] = (
                up[3 * H : 3 * H + mlp_hidden], down, alpha,
            )
        elif "single_blocks" in key and key.endswith(".linear2.weight"):
            base = key[: -len("linear2.weight")]
            down = np.asarray(down)
            out[base + "linear2_attn.weight"] = (up, down[:, :H], alpha)
            out[base + "linear2_mlp.weight"] = (
                up, down[:, H : H + mlp_hidden], alpha,
            )
        else:
            out[key] = (up, down, alpha)
    return out


def permute_rope_basis_rows(params: Dict, cfg) -> Dict:
    """models.flux.permute_rope_basis for a HOST state dict in checkpoint
    keyspace BEFORE to_tp_layout: the fused-prologue attention kernel needs
    q/k in the half-split RoPE basis, and the rope permutation (within each
    head's 128-row segment of the q/k sections) commutes with the qkv head
    interleave (whole-128-row-block permutation) — so permute first in the
    simple proj-major indexing, then interleave. Handles every host leaf
    representation via _take_rows (GGUF QTensor8 included, which
    permute_rope_basis does not). Refuses LoRA-patched leaves and
    already-interleaved layouts loudly. Returns a NEW dict."""
    from lightdiffusion_next_tpu.models import flux as flux_mod

    if getattr(cfg, "tp_layout", False):
        raise ValueError("permute the rope basis BEFORE to_tp_layout")
    H = cfg.hidden_size
    D = cfg.head_dim
    pi = flux_mod.rope_pair_permutation(D)
    qkv_idx = flux_mod._qk_out_index(3 * H, H, D)
    lin1_idx = flux_mod._qk_out_index(3 * H + int(H * cfg.mlp_ratio), H, D)

    out = dict(params)

    def do(prefix, idx):
        for suf, ix in ((".weight", idx), (".bias", idx)):
            k = prefix + suf
            if k not in out:
                continue
            leaf = out[k]
            if isinstance(leaf, ggml.QTensorLoRA):
                raise ValueError(
                    "fused_attn cannot permute LoRA-patched qkv weights; "
                    "load without fused attention or merge the LoRA first"
                )
            out[k] = _take_rows(leaf, ix)

    for i in range(cfg.depth):
        for s in ("img", "txt"):
            do(f"double_blocks.{i}.{s}_attn.qkv", qkv_idx)
            for nk in ("query_norm", "key_norm"):
                key = f"double_blocks.{i}.{s}_attn.norm.{nk}.scale"
                out[key] = np.asarray(out[key])[pi]
    for i in range(cfg.depth_single_blocks):
        do(f"single_blocks.{i}.linear1", lin1_idx)
        for nk in ("query_norm", "key_norm"):
            key = f"single_blocks.{i}.norm.{nk}.scale"
            out[key] = np.asarray(out[key])[pi]
    return out


def to_tp_layout(params: Dict, cfg) -> Tuple[Dict, object]:
    """Re-lay Flux params head-interleaved + linear1-split. Idempotent via
    ``cfg.tp_layout``; returns (new_params, new_cfg)."""
    if getattr(cfg, "tp_layout", False):
        return params, cfg
    H = cfg.hidden_size
    perm = qkv_interleave_perm(cfg.num_heads, cfg.head_dim)
    mlp_hidden = int(H * cfg.mlp_ratio)
    mlp_rows = np.arange(3 * H, 3 * H + mlp_hidden)

    out = dict(params)
    for i in range(cfg.depth):
        for s in ("img", "txt"):
            for suf in ("weight", "bias"):
                k = f"double_blocks.{i}.{s}_attn.qkv.{suf}"
                if k in out:
                    out[k] = _take_rows(out[k], perm)
    for i in range(cfg.depth_single_blocks):
        for suf in ("weight", "bias"):
            k = f"single_blocks.{i}.linear1.{suf}"
            if k not in out:
                continue
            leaf = out.pop(k)
            out[f"single_blocks.{i}.linear1_qkv.{suf}"] = _take_rows(leaf, perm)
            out[f"single_blocks.{i}.linear1_mlp.{suf}"] = _take_rows(
                leaf, mlp_rows
            )
        k = f"single_blocks.{i}.linear2.weight"
        if k in out:
            leaf = out.pop(k)
            out[f"single_blocks.{i}.linear2_attn.weight"] = _take_input_cols(
                leaf, 0, H
            )
            out[f"single_blocks.{i}.linear2_mlp.weight"] = _take_input_cols(
                leaf, H, H + mlp_hidden
            )
        kb = f"single_blocks.{i}.linear2.bias"
        if kb in out:  # output bias: attach to one part, once
            out[f"single_blocks.{i}.linear2_attn.bias"] = out.pop(kb)
    return out, dataclasses.replace(cfg, tp_layout=True)
