"""Flux.1 DiT, TPU-native.

Counterpart of src/BlackForest/Flux.py:85-853 (Flux3 with double/single
stream blocks, 3-axis RoPE, MLPEmbedder time/vector/guidance embeds, adaLN
final layer). Re-designed for TPU:

- NHWC latent in/out; 2x2 patchify is a reshape/transpose pair.
- head_dim 128 == MXU lane width; attention runs through ops.attention
  (Pallas flash on TPU for the ~4k-token joint sequence).
- Params are a flat dict with the BFL checkpoint keys (double_blocks.0.
  img_attn.qkv.weight, ...), loadable straight from GGUF/safetensors.
- Tensor-parallel sharding rules for the v5e-8 target live in
  parallel.sharding (heads and MLP sharded over the "model" mesh axis).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lightdiffusion_next_tpu.ops import attention as attn_ops
from lightdiffusion_next_tpu.ops import nn, rope as rope_ops
from lightdiffusion_next_tpu.sampling.schedules import timestep_embedding_flux


@dataclasses.dataclass(frozen=True)
class FluxConfig:
    """FluxParams parity (Flux.py:528-541 / config classes :781-853)."""

    in_channels: int = 16
    hidden_size: int = 3072
    mlp_ratio: float = 4.0
    num_heads: int = 24
    depth: int = 19
    depth_single_blocks: int = 38
    axes_dim: Tuple[int, ...] = (16, 56, 56)
    theta: int = 10000
    qkv_bias: bool = True
    guidance_embed: bool = True
    vec_in_dim: int = 768
    context_in_dim: int = 4096
    patch_size: int = 2
    dtype: Any = jnp.float32
    # params re-laid out by parallel.layout.to_tp_layout: qkv rows
    # head-interleaved, single-block linear1 split into linear1_qkv +
    # linear1_mlp (shard boundaries align with heads; zero reshape
    # collectives under "model"-axis tensor parallelism)
    tp_layout: bool = False
    # set by parallel.spmd.make_spmd_apply_fn for the shard_map TP
    # forward: the mesh axis name to psum row-parallel partial sums over.
    # Inside the shard_map body num_heads is the LOCAL head count and
    # every weight leaf is a local shard — unlike the GSPMD path, the
    # fused int8/w8a8 Pallas kernels run per shard. None = single-device
    # or GSPMD semantics (no explicit collectives).
    tp_axis: Optional[str] = None
    # jax.checkpoint the scan-over-blocks bodies: the TRAINING memory lever
    # (save per-block carries, recompute block internals on backward at one
    # extra forward of FLOPs). Only meaningful with stacked params
    # (parallel.trainer build_sharded_trainer(scan_blocks=True, remat=True));
    # inference ignores it (no backward pass to save residuals for).
    remat_blocks: bool = False
    # Fused-prologue attention (round 4): QKNorm + RoPE + head indexing
    # run INSIDE the flash kernel, reading the fused qkv projection
    # directly (ops.flash_attention.fused_qkv_attention). Requires the
    # params to be in the permuted RoPE basis (permute_rope_basis) — the
    # loader sets this flag if and only if it permuted, so config and
    # weights cannot disagree. Single-device, unrolled, LoRA-free only.
    fused_attn: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


FLUX_DEV = FluxConfig()
FLUX_SCHNELL = dataclasses.replace(FLUX_DEV, guidance_embed=False)


def _mlp_embedder(p: nn.ParamView, x):
    """MLPEmbedder (Flux.py:116-146): in_layer -> silu -> out_layer."""
    h = nn.linear(x, p("in_layer.weight"), p("in_layer.bias"))
    return nn.linear(nn.silu(h), p("out_layer.weight"), p("out_layer.bias"))


def _modulation(p: nn.ParamView, vec, n: int):
    """Modulation (Flux.py:231-258): silu(vec) -> lin -> chunk(3n)."""
    out = nn.linear(nn.silu(vec), p("lin.weight"), p("lin.bias"))
    chunks = jnp.split(out[:, None, :], 3 * (n // 3), axis=-1)
    return chunks  # groups of (shift, scale, gate)


def rope_pair_permutation(d: int):
    """NEW->OLD index map turning interleaved RoPE pairs into the
    half-split (GPT-NeoX) layout: new lane j holds old feature 2j for
    j < d/2 and old feature 2(j-d/2)+1 above — so the rotation partner of
    lane j is lane j+d/2 and the in-kernel shuffle is one 64-lane roll
    (ops.flash_attention fused_qkv_attention docstring)."""
    import numpy as np

    half = d // 2
    idx = np.empty((d,), np.int64)
    idx[:half] = np.arange(half) * 2
    idx[half:] = np.arange(half) * 2 + 1
    return idx


def _qk_out_index(out_dim: int, hidden: int, head_dim: int):
    """Output-column permutation for a fused [q;k;v(;mlp)] projection:
    apply the rope pair permutation within every head's 128-col segment
    of the q and k sections; v/mlp columns stay put."""
    import numpy as np

    idx = np.arange(out_dim, dtype=np.int64)
    pi = rope_pair_permutation(head_dim)
    for sec in (0, hidden):  # q section, k section
        for h0 in range(sec, sec + hidden, head_dim):
            idx[h0 : h0 + head_dim] = h0 + pi
    return idx


def permute_rope_basis(params: Dict, cfg: FluxConfig,
                       device: bool = True) -> Dict:
    """One-time load-side rewrite for cfg.fused_attn: permute the q/k
    output columns of every qkv / single-block linear1 projection (plus
    biases and QKNorm scales) into the half-split RoPE basis. Attention
    logits are invariant (the same permutation hits q and k), v and every
    other weight are untouched, so the model output is bit-comparable to
    the unfused path up to the kernel's fusion reassociation.

    Refuses stacked/tp/LoRA layouts — callers keep those on the unfused
    forward. Returns a NEW dict; quantized leaves are gathered on device
    (a few GB one-time, block weights only).

    ``device=False`` runs the same (bit-exact, pure index shuffling)
    permutation in host numpy for numpy-backed leaves — the scan-mode
    host-prep path (stack_block_params_host) permutes before stacking so
    the device never sees unstacked block leaves."""
    from lightdiffusion_next_tpu.ops import ggml

    if cfg.tp_layout or cfg.tp_axis is not None:
        raise ValueError("fused_attn is single-device; tp layouts don't permute")
    if is_stacked(params):
        raise ValueError("permute before stacking (scan mode unsupported)")
    import numpy as np

    xp = jnp if device else np
    H = cfg.hidden_size
    D = cfg.head_dim
    assert D % 2 == 0

    def permute_out(leaf, idx):
        if isinstance(leaf, ggml.QTensorLoRA):
            raise ValueError(
                "fused_attn cannot permute LoRA-patched qkv weights; load "
                "without --fused-attn or merge the LoRA first"
            )
        idxj = xp.asarray(idx)
        if isinstance(leaf, ggml.QTensor8T):
            return ggml.QTensor8T(
                qt=xp.take(leaf.qt, idxj, axis=1),
                scales_t=xp.take(leaf.scales_t, idxj, axis=1),
                shape=leaf.shape,
            )
        if isinstance(leaf, ggml.QTensor8W):
            return ggml.QTensor8W(
                qt=xp.take(leaf.qt, idxj, axis=1),
                col_scales=xp.take(leaf.col_scales, idxj, axis=1),
                shape=leaf.shape,
            )
        return xp.take(xp.asarray(leaf), idxj, axis=0)  # (out, in) dense

    out = dict(params)
    pi = xp.asarray(rope_pair_permutation(D))
    qkv_idx = _qk_out_index(3 * H, H, D)
    lin1_idx = _qk_out_index(3 * H + int(H * cfg.mlp_ratio), H, D)

    def do(prefix, idx):
        wkey = prefix + ".weight"
        out[wkey] = permute_out(params[wkey], idx)
        bkey = prefix + ".bias"
        if bkey in params:
            out[bkey] = xp.take(xp.asarray(params[bkey]), xp.asarray(idx))

    for i in range(cfg.depth):
        for s in ("img", "txt"):
            do(f"double_blocks.{i}.{s}_attn.qkv", qkv_idx)
            for nk in ("query_norm", "key_norm"):
                key = f"double_blocks.{i}.{s}_attn.norm.{nk}.scale"
                out[key] = xp.take(xp.asarray(params[key]), pi)
    for i in range(cfg.depth_single_blocks):
        do(f"single_blocks.{i}.linear1", lin1_idx)
        for nk in ("query_norm", "key_norm"):
            key = f"single_blocks.{i}.norm.{nk}.scale"
            out[key] = xp.take(xp.asarray(params[key]), pi)
    return out


def rope_cos_sin(ids, axes_dim, theta: int = 10000):
    """(cos, sin) for the fused-prologue kernel, half-split layout:
    C = [cos; cos], S = [-sin; sin], each (L, sum(axes_dim)) f32. ids is
    (B, L, n_axes); position ids are identical across the batch (zeros for
    txt, tiled img grid — img_ids), so row 0 serves every batch entry."""
    pos = ids[0]
    parts_c, parts_s = [], []
    for ax, dim in enumerate(axes_dim):
        scale = jnp.arange(0, dim, 2, dtype=jnp.float32) / dim
        omega = 1.0 / (theta**scale)
        ang = pos[:, ax].astype(jnp.float32)[:, None] * omega[None]
        parts_c.append(jnp.cos(ang))
        parts_s.append(jnp.sin(ang))
    c = jnp.concatenate(parts_c, axis=-1)
    s = jnp.concatenate(parts_s, axis=-1)
    return (
        jnp.concatenate([c, c], axis=-1),
        jnp.concatenate([-s, s], axis=-1),
    )


def _qk_norm(p: nn.ParamView, q, k):
    """QKNorm (Flux.py:173-201): per-head RMSNorm on q and k."""
    q = nn.rms_norm(q, p("query_norm.scale"))
    k = nn.rms_norm(k, p("key_norm.scale"))
    return q, k


def _attention(q, k, v, pe):
    """attention() (Flux.py:18-34): rope then SDPA, heads folded out.
    q/k/v stay head-major (B, H, L, D) straight into the kernel — no
    fold/unfold transpose round-trip."""
    q, k = rope_ops.apply_rope(q, k, pe)
    return attn_ops.attention_heads(q, k, v)


def _split_heads(qkv, num_heads: int, interleaved: bool = False):
    """(B, L, 3*H) -> q,k,v (B, heads, L, head_dim).

    ``interleaved``: rows are head-major [h0:(q,k,v), h1:(q,k,v), ...]
    (parallel.layout.to_tp_layout) — the reshape's leading factor is then
    ``heads``, so a "model"-sharded last dim propagates shard-aligned."""
    b, l, _ = qkv.shape
    if interleaved:
        qkv = qkv.reshape(b, l, num_heads, 3, -1)
        qkv = qkv.transpose(3, 0, 2, 1, 4)
    else:
        qkv = qkv.reshape(b, l, 3, num_heads, -1)
        qkv = qkv.transpose(2, 0, 3, 1, 4)
    return qkv[0], qkv[1], qkv[2]


def _row_parallel(x, w, b, tp_axis: Optional[str]):
    """Row-parallel linear for the shard_map TP forward: the local matmul
    produces a PARTIAL sum over the sharded input dim; psum completes it
    and the (replicated) bias is added exactly once, after. With
    tp_axis=None this is plain nn.linear (bias-after-add is the same
    math)."""
    out = nn.linear(x, w, None)
    if tp_axis is not None:
        out = jax.lax.psum(out, tp_axis)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def _fused_ew() -> bool:
    """Fused-elementwise W8A8 dispatch (round 4): on the single-batch TPU
    serving path the LN+modulation+row-quant before every quantized matmul
    runs as ONE Pallas pass and the gate/bias/residual land in the matmul
    epilogue (ops.quant_matmul row_quantize_fused / w8a8_matmul_ep) — the
    round-4 trace showed XLA's separate passes re-reading each activation
    ~3x (~18% of the Flux image). Consulted at trace time; the flag rides
    config.trace_token() so flipping RuntimeConfig.fused_ew (or the
    LDT_FUSED_EW env default) mid-session retraces the compiled runners
    instead of silently reusing the other mode's program."""
    from lightdiffusion_next_tpu import config as _config

    return _config.get_config().resolve_fused_ew()


def _mod_linear(p: nn.ParamView, key: str, x, scale, shift):
    """layer_norm(x, 1e-6)*(1+scale)+shift -> linear(w, b), with the
    norm/modulation/row-quant fused into one kernel pass on the W8A8
    path (modulated_matmul returns None otherwise — batched vectors,
    TP leaves, unsupported shapes — and the plain ops chain runs)."""
    w = p(key + ".weight")
    b = p.get(key + ".bias")
    fm = getattr(w, "modulated_matmul", None) if _fused_ew() else None
    if fm is not None:
        y = fm(
            x, prologue="ln_mod",
            mod_scale=1.0 + scale.astype(jnp.float32),
            mod_shift=shift, bias=b,
        )
        if y is not None:
            return y
    xm = nn.layer_norm(x, eps=1e-6) * (1 + scale) + shift
    return nn.linear(xm, w, b)


def _gated_out_linear(x_res, h, w, b, gate, tp_axis, gelu: bool = False):
    """x_res + gate * linear(gelu?(h), w, b), with the gelu+row-quant
    prologue and the gate/bias/residual epilogue fused in-kernel on the
    single-device W8A8 path.

    Under shard_map TP (tp_axis set) the epilogue must land AFTER the
    cross-shard psum, so the fusion splits: the gelu+row-quant prologue and
    the int8 matmul still run in-kernel per shard (emitting the raw local
    partial — no gate/bias/residual), the explicit psum completes the sum,
    and one XLA elementwise pass applies gate/bias/residual. Any other
    fallback keeps the plain ops chain."""
    if _fused_ew():
        fm = getattr(w, "modulated_matmul", None)
        if fm is not None:
            if tp_axis is None:
                y = fm(h, prologue="gelu" if gelu else "none", gate=gate,
                       bias=b, residual=x_res)
                if y is not None:
                    return y
            else:
                part = fm(h, prologue="gelu" if gelu else "none")
                if part is not None:
                    out = jax.lax.psum(part, tp_axis)
                    if b is not None:
                        out = out + b.astype(out.dtype)
                    return x_res + gate * out
    if gelu:
        h = nn.gelu(h, approximate=True)
    return x_res + gate * _row_parallel(h, w, b, tp_axis)


def _double_block(p: nn.ParamView, img, txt, vec, pe, cfg: FluxConfig):
    """DoubleStreamBlock (Flux.py:260-349)."""
    im1_shift, im1_scale, im1_gate, im2_shift, im2_scale, im2_gate = _modulation(
        p.scope("img_mod."), vec, 6
    )
    tx1_shift, tx1_scale, tx1_gate, tx2_shift, tx2_scale, tx2_gate = _modulation(
        p.scope("txt_mod."), vec, 6
    )

    img_qkv = _mod_linear(p, "img_attn.qkv", img, im1_scale, im1_shift)
    txt_qkv = _mod_linear(p, "txt_attn.qkv", txt, tx1_scale, tx1_shift)

    if cfg.fused_attn:
        # permuted-basis params (permute_rope_basis); pe is (cos, sin).
        # One L-axis concat replaces three head-split transposes + the
        # norm/rope HBM round-trips (fused into the kernel prologue).
        # Under shard_map TP cfg.num_heads is the LOCAL head count and the
        # qkv columns are head-interleaved (parallel.layout) — the kernel
        # runs per shard unchanged modulo its stripe index maps.
        from lightdiffusion_next_tpu.ops import flash_attention as fa

        cos, sin = pe
        attn = fa.fused_qkv_attention(
            jnp.concatenate([txt_qkv, img_qkv], axis=1),
            p("img_attn.norm.query_norm.scale"),
            p("img_attn.norm.key_norm.scale"),
            cos, sin,
            num_heads=cfg.num_heads,
            txt_len=txt.shape[1],
            txt_q_scale=p("txt_attn.norm.query_norm.scale"),
            txt_k_scale=p("txt_attn.norm.key_norm.scale"),
            interleaved=cfg.tp_layout,
        )
    else:
        img_q, img_k, img_v = _split_heads(img_qkv, cfg.num_heads, cfg.tp_layout)
        img_q, img_k = _qk_norm(p.scope("img_attn.norm."), img_q, img_k)
        txt_q, txt_k, txt_v = _split_heads(txt_qkv, cfg.num_heads, cfg.tp_layout)
        txt_q, txt_k = _qk_norm(p.scope("txt_attn.norm."), txt_q, txt_k)

        q = jnp.concatenate([txt_q, img_q], axis=2)
        k = jnp.concatenate([txt_k, img_k], axis=2)
        v = jnp.concatenate([txt_v, img_v], axis=2)
        attn = _attention(q, k, v, pe)
    txt_attn, img_attn = attn[:, : txt.shape[1]], attn[:, txt.shape[1] :]

    img = _gated_out_linear(
        img, img_attn, p("img_attn.proj.weight"), p("img_attn.proj.bias"),
        im1_gate, cfg.tp_axis,
    )
    h = _mod_linear(p, "img_mlp.0", img, im2_scale, im2_shift)
    img = _gated_out_linear(
        img, h, p("img_mlp.2.weight"), p("img_mlp.2.bias"),
        im2_gate, cfg.tp_axis, gelu=True,
    )

    txt = _gated_out_linear(
        txt, txt_attn, p("txt_attn.proj.weight"), p("txt_attn.proj.bias"),
        tx1_gate, cfg.tp_axis,
    )
    h = _mod_linear(p, "txt_mlp.0", txt, tx2_scale, tx2_shift)
    txt = _gated_out_linear(
        txt, h, p("txt_mlp.2.weight"), p("txt_mlp.2.bias"),
        tx2_gate, cfg.tp_axis, gelu=True,
    )
    return img, txt


def _single_block(p: nn.ParamView, x, vec, pe, cfg: FluxConfig):
    """SingleStreamBlock (Flux.py:351-419)."""
    shift, scale, gate = _modulation(p.scope("modulation."), vec, 3)
    hidden = cfg.hidden_size
    if cfg.tp_layout:
        # linear1 de-fused at layout time (parallel.layout): two matmuls
        # over the shared input, each cleanly column-shardable. Both are
        # column-parallel (full K, sharded N), so the LN+modulation+
        # row-quant prologue fuses per shard exactly like single-device
        # (_mod_linear; the unfused fallback layer_norms twice — XLA CSEs)
        qkv = _mod_linear(p, "linear1_qkv", x, scale, shift)
        mlp = _mod_linear(p, "linear1_mlp", x, scale, shift)
    else:
        proj = _mod_linear(p, "linear1", x, scale, shift)
        qkv, mlp = proj[..., : 3 * hidden], proj[..., 3 * hidden :]
    if cfg.fused_attn and not cfg.tp_layout:
        # the kernel indexes q/k/v head stripes straight out of the full
        # linear1 output (extra mlp lanes are never touched) — no qkv
        # slice materializes and no head split/norm/rope round-trips
        from lightdiffusion_next_tpu.ops import flash_attention as fa

        cos, sin = pe
        attn = fa.fused_qkv_attention(
            proj,
            p("norm.query_norm.scale"),
            p("norm.key_norm.scale"),
            cos, sin,
            num_heads=cfg.num_heads,
        )
    elif cfg.fused_attn:
        # shard_map TP: the local linear1_qkv output is head-interleaved
        # whole heads (cfg.num_heads is the LOCAL count) — the fused
        # kernel runs per shard with interleaved stripe index maps
        from lightdiffusion_next_tpu.ops import flash_attention as fa

        cos, sin = pe
        attn = fa.fused_qkv_attention(
            qkv,
            p("norm.query_norm.scale"),
            p("norm.key_norm.scale"),
            cos, sin,
            num_heads=cfg.num_heads,
            interleaved=True,
        )
    else:
        q, k, v = _split_heads(qkv, cfg.num_heads, cfg.tp_layout)
        q, k = _qk_norm(p.scope("norm."), q, k)
        attn = _attention(q, k, v, pe)
    if cfg.tp_layout:
        # linear2 input-split at layout time (parallel.layout): concat
        # [attn; gelu(mlp)] shards unevenly across the attn/mlp boundary
        # and GSPMD would all-gather both halves; as two row-parallel
        # matmuls the partial sums fold into one all-reduce
        # biasless partial dots adjacent so XLA's AllReduceReassociate can
        # fold add(psum(a), psum(b)) -> psum(a+b); bias applied after.
        # Under the shard_map forward (tp_axis) the fold is literal: ONE
        # explicit psum over the already-added partials. With fused-EW the
        # two partial matmuls run in-kernel per shard (raw partials — the
        # gate/bias/residual epilogue must land after the psum, so it
        # stays one XLA pass; the gelu+row-quant prologues fuse).
        out = None
        if _fused_ew():
            fm_a = getattr(p("linear2_attn.weight"), "modulated_matmul", None)
            fm_m = getattr(p("linear2_mlp.weight"), "modulated_matmul", None)
            if fm_a is not None and fm_m is not None:
                pa = fm_a(attn, prologue="none")
                pm = fm_m(mlp, prologue="gelu")
                if pa is not None and pm is not None:
                    out = pa + pm
        if out is None:
            out = nn.linear(attn, p("linear2_attn.weight"), None) + nn.linear(
                nn.gelu(mlp, approximate=True), p("linear2_mlp.weight"), None
            )
        if cfg.tp_axis is not None:
            out = jax.lax.psum(out, cfg.tp_axis)
        b2 = p.get("linear2_attn.bias")
        if b2 is not None:
            out = out + b2
    else:
        w2 = p("linear2.weight")
        b2 = p("linear2.bias")
        fm = (getattr(w2, "modulated_matmul", None)
              if cfg.tp_axis is None and _fused_ew() else None)
        if fm is not None:
            # the concat never materializes: the quantizer reads attn and
            # the mlp WINDOW of the full linear1 projection (the qkv lanes
            # are never touched), applies gelu, and writes one int8 row —
            # gate/bias/residual ride the matmul epilogue. If the fused
            # path declines (shape/batch), the traced prequant is dead
            # code and XLA drops it.
            from lightdiffusion_next_tpu.ops import quant_matmul as qm

            if qm.supported_rowquant(attn.shape[-1] + mlp.shape[-1]):
                pq = qm.row_quantize_concat_gelu(
                    attn, proj, 3 * hidden, proj.shape[-1]
                )
                y = fm(None, prequant=pq, gate=gate, bias=b2, residual=x)
                if y is not None:
                    return y
        out = _row_parallel(
            jnp.concatenate([attn, nn.gelu(mlp, approximate=True)], axis=-1),
            p("linear2.weight"),
            p("linear2.bias"),
            cfg.tp_axis,
        )
    return x + gate * out


DOUBLE_STACK_KEY = "__double_stack__"
SINGLE_STACK_KEY = "__single_stack__"


# ParamView-compatible per-iteration view of a stacked block-param dict —
# shared with the T5 scan (models/clip/t5.py); lives next to ParamView.
_StackView = nn.StackView


def group_block_params(
    params: Dict, cfg: FluxConfig
) -> Tuple[Dict, Dict[str, Dict[str, list]]]:
    """Split a flat Flux param dict into (non_block, families) where
    ``families[head][rel]`` is the depth-ordered leaf list of one
    ``{head}.{i}.{rel}`` family. Shared by the single-device and the
    tensor-parallel (parallel.spmd.stack_tp_block_params) stackers.
    Raises ValueError for ragged families (missing/extra block indices)."""
    out: Dict[str, Any] = {}
    depths = {"double_blocks": cfg.depth, "single_blocks": cfg.depth_single_blocks}
    per_key: Dict[str, Dict[str, Dict[int, Any]]] = {g: {} for g in depths}
    for k, v in params.items():
        head, _, rest = k.partition(".")
        if head in depths and rest:
            idx_s, _, rel = rest.partition(".")
            if idx_s.isdigit() and rel:
                per_key[head].setdefault(rel, {})[int(idx_s)] = v
                continue
        out[k] = v
    fams: Dict[str, Dict[str, list]] = {}
    for head, groups in per_key.items():
        depth = depths[head]
        fams[head] = {}
        for rel, by_idx in groups.items():
            if sorted(by_idx) != list(range(depth)):
                raise ValueError(
                    f"{head}.*.{rel}: blocks {sorted(by_idx)} != 0..{depth - 1}"
                )
            fams[head][rel] = [by_idx[i] for i in range(depth)]
    return out, fams


def stack_block_params(params: Dict, cfg: FluxConfig) -> Dict:
    """Re-group a flat Flux param dict for the scan-over-blocks forward:
    every ``double_blocks.{i}.K`` / ``single_blocks.{i}.K`` family is
    stacked along a leading depth axis (ops.ggml.stack_leaves) under
    ``__double_stack__`` / ``__single_stack__``; non-block keys stay flat.

    Why: the unrolled forward emits ~12 linears x 57 blocks of HLO, which
    costs 430-1400 s of uncached XLA compile at production shapes over the
    TPU tunnel. Scanning two stacked bodies shrinks the program 7.2x
    (measured at 1024px Q8_0 — scripts/measure_flux_hlo.py); the
    quantized weights stream from the stacked arrays via Pallas scalar
    prefetch so the scan costs no per-iteration weight copy.

    CONSUMES ``params`` (same contract as ops.ggml.to_w8a8): every family
    is validated up front, then the input dict is cleared and families
    stack one at a time, awaiting each stack before dropping the source
    leaves — peak extra device memory is ONE family's stack (~1.8 GB at
    Flux 12B scale), not a second 13 GB generation next to the 13-GB
    resident on a 16 GB chip. Callers must treat the input dict as dead.

    Raises ValueError BEFORE consuming anything for layouts that cannot
    scan (tp-sharded leaves, per-block LoRA patches, ragged block
    families) — callers keep those models on the unrolled forward."""
    if cfg.tp_layout or cfg.tp_axis is not None:
        raise ValueError("scan mode is single-device; tp layouts do not stack")
    from lightdiffusion_next_tpu.ops import ggml

    out, fams = group_block_params(params, cfg)
    for head in fams:
        for rel, leaves in fams[head].items():
            ggml.check_stackable(leaves)  # validate-all-first: a failure
            # mid-stack after the dict is consumed would strand the caller
    params.clear()
    for head, groups in fams.items():
        stacked = {}
        for rel in list(groups):
            leaves = groups.pop(rel)
            s = ggml.stack_leaves(leaves)
            del leaves
            # await before releasing the sources: enqueued-but-unexecuted
            # stacks pin their input buffers, so without this every family
            # would be in flight at once and peak memory doubles anyway
            jax.block_until_ready(s)
            stacked[rel] = s
        out[DOUBLE_STACK_KEY if head == "double_blocks" else SINGLE_STACK_KEY] = (
            stacked
        )
    return out


def stack_block_params_host(params: Dict, cfg: FluxConfig) -> Dict:
    """stack_block_params for HOST-side leaves (numpy-backed QTensor8T /
    numpy dense, from ggml.to_device_quantized(device=False)): families
    np.stack on the host and each stacked buffer uploads whole, so the
    device heap only ever allocates the ~30 big scan-mode buffers plus
    the flat non-block leaves — never the ~700 small per-block leaves.

    Why a separate path exists: the device-side stacker frees those small
    uploaded leaves while allocating 0.5-2.5 GB stacks between them, and
    HBM cannot be compacted — on a 16 GB chip holding ~12 GB of weights
    the headroom fragments and the scan program OOMs at its first
    activation temp despite an analyzed peak of ~11.8 GB (round-4
    finding; scripts/probe_flux_memory.py --exec churn vs clean). Host
    stacking uploads the final layout into a clean heap.

    Load order with this path: host permute_rope_basis(device=False) ->
    stack_block_params_host -> ggml.to_w8a8 on device (the stacked
    requant is bit-identical to the unstacked one — requantization is
    per-column, so it commutes with the column permute — and its lax.map
    keeps the f32 temp to one block). CONSUMES ``params``."""
    from lightdiffusion_next_tpu.ops import ggml

    if cfg.tp_layout or cfg.tp_axis is not None:
        raise ValueError("scan mode is single-device; tp layouts do not stack")

    out, fams = group_block_params(params, cfg)
    for head in fams:
        for rel, leaves in fams[head].items():
            ggml.check_stackable(leaves)
    params.clear()

    def upload(v):
        if isinstance(v, ggml.QTensor8T):
            return ggml.QTensor8T(
                qt=jnp.asarray(v.qt),
                scales_t=jnp.asarray(v.scales_t, dtype=jnp.float32),
                shape=v.shape,
            )
        if isinstance(v, ggml.QTensor8):
            return ggml.QTensor8(
                q=jnp.asarray(v.q),
                scales=jnp.asarray(v.scales, dtype=jnp.float32),
                shape=v.shape,
            )
        return jnp.asarray(v)

    for k in list(out):
        out[k] = upload(out[k])
    for head, groups in fams.items():
        stacked = {}
        for rel in list(groups):
            leaves = groups.pop(rel)
            first = leaves[0]
            if isinstance(first, ggml.QTensor8T):
                s = ggml.StackedQTensor8T(
                    qt3=jnp.asarray(np.stack([l.qt for l in leaves])),
                    scales3=jnp.asarray(
                        np.stack([l.scales_t for l in leaves]),
                        dtype=jnp.float32,
                    ),
                    shape=first.shape,
                )
            else:
                s = jnp.asarray(np.stack([np.asarray(l) for l in leaves]))
            del leaves
            # await before the next family: keeps the host-side stack temp
            # and the in-flight transfer to ONE family at a time
            jax.block_until_ready(s)
            stacked[rel] = s
        out[DOUBLE_STACK_KEY if head == "double_blocks" else SINGLE_STACK_KEY] = (
            stacked
        )
    return out


def is_stacked(params: Dict) -> bool:
    return DOUBLE_STACK_KEY in params


def patchify(x, patch: int = 2):
    """NHWC (B,H,W,C) -> tokens (B, H/2*W/2, C*4), channel-major per patch
    (rearrange 'b c (h ph) (w pw) -> b (h w) (c ph pw)', Flux.py:732-760)."""
    b, h, w, c = x.shape
    hh, ww = h // patch, w // patch
    x = x.reshape(b, hh, patch, ww, patch, c)
    # -> (b, hh, ww, c, ph, pw)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, hh * ww, c * patch * patch)


def unpatchify(tokens, h: int, w: int, patch: int = 2):
    """Inverse of patchify -> NHWC (B, H, W, C)."""
    b, l, d = tokens.shape
    hh, ww = h // patch, w // patch
    c = d // (patch * patch)
    x = tokens.reshape(b, hh, ww, c, patch, patch)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, hh * patch, ww * patch, c)


def img_ids(batch: int, h: int, w: int, patch: int = 2):
    """3-axis position ids for the image tokens (Flux3.forward, :732)."""
    hh, ww = h // patch, w // patch
    ids = np.zeros((hh, ww, 3), dtype=np.float32)
    ids[..., 1] = np.arange(hh, dtype=np.float32)[:, None]
    ids[..., 2] = np.arange(ww, dtype=np.float32)[None, :]
    return jnp.asarray(np.tile(ids.reshape(1, hh * ww, 3), (batch, 1, 1)))


def apply_flux(
    params: Dict,
    x,  # NHWC latent (B, H, W, 16)
    timesteps,  # (B,) in [0,1] sigma space
    context,  # (B, L, 4096) T5 sequence
    y,  # (B, 768) CLIP pooled
    guidance=None,  # (B,) distilled guidance strength
    cfg: FluxConfig = FLUX_DEV,
    first_block_hook=None,
):
    """Flux3.forward/forward_orig parity (Flux.py:658-779).

    ``first_block_hook(img_after_block0, run_rest)``: FBCache boundary after
    double block 0 (WaveSpeed first_block_cache.py:725-790)."""
    if cfg.fused_attn and cfg.tp_layout and cfg.tp_axis is None:
        # permuted-basis TP weights REQUIRE the fused kernel, and the
        # Pallas call cannot run under GSPMD partitioning of sharded
        # global operands — only the shard_map forward (tp_axis) may
        # combine fused_attn with the TP layout. The unfused fallback
        # would silently rope the permuted basis (wrong numerics).
        raise ValueError(
            "fused_attn + tp_layout requires the shard_map TP forward "
            "(parallel.spmd.make_spmd_apply_fn); GSPMD TP must load with "
            "fused attention off"
        )
    b, h, w, c = x.shape
    dtype = cfg.dtype

    img = patchify(x.astype(dtype), cfg.patch_size)
    img = nn.linear(img, params["img_in.weight"], params["img_in.bias"])
    txt = nn.linear(
        context.astype(dtype), params["txt_in.weight"], params["txt_in.bias"]
    )

    vec = _mlp_embedder(
        nn.ParamView(params, "time_in."),
        timestep_embedding_flux(timesteps, 256).astype(dtype),
    )
    if cfg.guidance_embed:
        if guidance is None:
            guidance = jnp.full((b,), 3.5, dtype=jnp.float32)
        vec = vec + _mlp_embedder(
            nn.ParamView(params, "guidance_in."),
            timestep_embedding_flux(guidance, 256).astype(dtype),
        )
    vec = vec + _mlp_embedder(nn.ParamView(params, "vector_in."), y.astype(dtype))

    txt_ids = jnp.zeros((b, txt.shape[1], 3), dtype=jnp.float32)
    ids = jnp.concatenate([txt_ids, img_ids(b, h, w, cfg.patch_size)], axis=1)
    if cfg.fused_attn:
        pe = rope_cos_sin(ids, cfg.axes_dim, cfg.theta)  # (cos, sin)
    else:
        pe = rope_ops.embed_nd(ids, cfg.axes_dim, cfg.theta)

    img_prev = img
    if is_stacked(params):
        dstack = params[DOUBLE_STACK_KEY]
        sstack = params[SINGLE_STACK_KEY]
        # block 0 unrolled at static index 0 — the FBCache boundary
        # (first_block_hook) needs its output as a standalone value
        img, txt = _double_block(_StackView(dstack, 0), img, txt, vec, pe, cfg)

        def run_rest(img):
            """Scan-over-blocks run_rest (same contract as the unrolled
            one below): remaining double blocks then all single blocks as
            two lax.scan bodies — ~7x less HLO than 57 unrolled blocks.
            With cfg.remat_blocks each body is jax.checkpoint'ed: training
            saves only the per-block carries and recomputes block internals
            on the backward pass (activation memory O(depth·tokens·hidden)
            -> O(tokens·hidden) per stream at one extra forward of FLOPs —
            the standard big-model trade; no effect on inference)."""
            def dblk(im, tx, idx):
                return _double_block(
                    _StackView(dstack, idx), im, tx, vec, pe, cfg
                )

            def sblk(x_, idx):
                return _single_block(_StackView(sstack, idx), x_, vec, pe, cfg)

            if cfg.remat_blocks:
                # prevent_cse=False is safe (and faster) inside scan bodies
                dblk = jax.checkpoint(dblk, prevent_cse=False)
                sblk = jax.checkpoint(sblk, prevent_cse=False)

            def dbody(carry, idx):
                im, tx = carry
                im, tx = dblk(im, tx, idx)
                return (im, tx), None

            (img_, txt_), _ = jax.lax.scan(
                dbody, (img, txt), jnp.arange(1, cfg.depth)
            )
            xx = jnp.concatenate([txt_, img_], axis=1)

            def sbody(x_, idx):
                return sblk(x_, idx), None

            xx, _ = jax.lax.scan(
                sbody, xx, jnp.arange(cfg.depth_single_blocks)
            )
            return xx[:, txt_.shape[1] :]
    else:
        img, txt = _double_block(
            nn.ParamView(params, "double_blocks.0."), img, txt, vec, pe, cfg
        )

        def run_rest(img):
            """Remaining double + all single blocks; returns img tokens BEFORE
            the final layer (so FBCache's residual = pre-final - post-block-0,
            first_block_cache.py:725-790)."""
            txt_ = txt
            for i in range(1, cfg.depth):
                img, txt_ = _double_block(
                    nn.ParamView(params, f"double_blocks.{i}."), img, txt_, vec, pe, cfg
                )
            xx = jnp.concatenate([txt_, img], axis=1)
            for i in range(cfg.depth_single_blocks):
                xx = _single_block(
                    nn.ParamView(params, f"single_blocks.{i}."), xx, vec, pe, cfg
                )
            return xx[:, txt_.shape[1] :]

    if first_block_hook is not None:
        img_out = first_block_hook(img_prev, img, run_rest)
    else:
        img_out = run_rest(img)

    # LastLayer (Flux.py:420-478)
    pl_ = nn.ParamView(params, "final_layer.")
    mod = nn.linear(
        nn.silu(vec), pl_("adaLN_modulation.1.weight"), pl_("adaLN_modulation.1.bias")
    )
    shift, scale = jnp.split(mod, 2, axis=-1)
    img_out = nn.layer_norm(img_out, eps=1e-6) * (1 + scale[:, None]) + shift[
        :, None
    ]
    tokens = nn.linear(img_out, pl_("linear.weight"), pl_("linear.bias"))
    return unpatchify(
        tokens.astype(jnp.float32), h, w, cfg.patch_size
    )


def detect_config(sd: Dict, dtype=None) -> FluxConfig:
    """Flux config from a state dict (detect_unet_config parity for the
    flux branch, reference unet.py:912-936 — which hardcodes everything but
    depth/guidance; here the dims come from the tensor shapes so scaled
    -down checkpoints load too). Leaves may be arrays or quantized records;
    only ``.shape`` (logical (out, in)) is read."""
    def shape(k):
        return tuple(sd[k].shape)

    hidden = shape("img_in.weight")[0]
    patch = FLUX_DEV.patch_size
    head_dim = shape("double_blocks.0.img_attn.norm.key_norm.scale")[0]
    if hidden % head_dim:
        raise ValueError(f"hidden {hidden} not divisible by head_dim {head_dim}")
    depth = 0
    while f"double_blocks.{depth}.img_attn.qkv.weight" in sd:
        depth += 1
    depth_single = 0
    while (
        f"single_blocks.{depth_single}.linear2.weight" in sd
        or f"single_blocks.{depth_single}.linear1.weight" in sd
    ):
        depth_single += 1
    if head_dim == 128:
        axes = (16, 56, 56)
    else:
        # scale the (16,56,56) split; RoPE needs even per-axis dims
        axes = tuple(a * head_dim // 128 for a in (16, 56, 56))
        if sum(axes) != head_dim or any(a % 2 for a in axes):
            raise ValueError(
                f"cannot derive axes_dim for head_dim {head_dim}; "
                "load with an explicit FluxConfig"
            )
    return dataclasses.replace(
        FLUX_DEV,
        in_channels=shape("img_in.weight")[1] // patch**2,
        hidden_size=hidden,
        mlp_ratio=shape("double_blocks.0.img_mlp.0.weight")[0] / hidden,
        num_heads=hidden // head_dim,
        depth=depth,
        depth_single_blocks=depth_single,
        axes_dim=axes,
        qkv_bias="double_blocks.0.img_attn.qkv.bias" in sd,
        guidance_embed="guidance_in.in_layer.weight" in sd,
        vec_in_dim=shape("vector_in.in_layer.weight")[1],
        context_in_dim=shape("txt_in.weight")[1],
        dtype=dtype or FLUX_DEV.dtype,
    )


def make_apply_fn(cfg: FluxConfig):
    """The standard DiffusionModel.apply_fn closure for this config."""

    def apply_fn(p, x, t, context, y=None, guidance=None,
                 first_block_hook=None, **_):
        return apply_flux(
            p, x, t, context, y, guidance=guidance, cfg=cfg,
            first_block_hook=first_block_hook,
        )

    return apply_fn


# ---------------------------------------------------------------------------
# Random init (tests/benches); real weights come from GGUF/safetensors.
# ---------------------------------------------------------------------------


def init_params(cfg: FluxConfig = FLUX_DEV, seed: int = 0, dtype=None):
    rng = np.random.default_rng(seed)
    dtype = dtype or cfg.dtype
    H = cfg.hidden_size
    P = {}

    def lin(key, out_d, in_d, bias=True):
        P[key + ".weight"] = rng.normal(0, in_d**-0.5, (out_d, in_d))
        if bias:
            P[key + ".bias"] = np.zeros((out_d,))

    def scale(key, d):
        P[key] = np.ones((d,))

    lin("img_in", H, cfg.in_channels * cfg.patch_size**2)
    lin("txt_in", H, cfg.context_in_dim)
    lin("time_in.in_layer", H, 256)
    lin("time_in.out_layer", H, H)
    lin("vector_in.in_layer", H, cfg.vec_in_dim)
    lin("vector_in.out_layer", H, H)
    if cfg.guidance_embed:
        lin("guidance_in.in_layer", H, 256)
        lin("guidance_in.out_layer", H, H)
    mlp_hidden = int(H * cfg.mlp_ratio)
    for i in range(cfg.depth):
        pre = f"double_blocks.{i}."
        for s in ("img", "txt"):
            lin(pre + f"{s}_mod.lin", 6 * H, H)
            lin(pre + f"{s}_attn.qkv", 3 * H, H, bias=cfg.qkv_bias)
            scale(pre + f"{s}_attn.norm.query_norm.scale", cfg.head_dim)
            scale(pre + f"{s}_attn.norm.key_norm.scale", cfg.head_dim)
            lin(pre + f"{s}_attn.proj", H, H)
            lin(pre + f"{s}_mlp.0", mlp_hidden, H)
            lin(pre + f"{s}_mlp.2", H, mlp_hidden)
    for i in range(cfg.depth_single_blocks):
        pre = f"single_blocks.{i}."
        lin(pre + "linear1", 3 * H + mlp_hidden, H)
        lin(pre + "linear2", H, H + mlp_hidden)
        scale(pre + "norm.query_norm.scale", cfg.head_dim)
        scale(pre + "norm.key_norm.scale", cfg.head_dim)
        lin(pre + "modulation.lin", 3 * H, H)
    lin("final_layer.linear", cfg.patch_size**2 * cfg.in_channels, H)
    lin("final_layer.adaLN_modulation.1", 2 * H, H)
    return {k: np.asarray(v, dtype=np.float32) for k, v in P.items()}
