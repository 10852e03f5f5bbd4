"""Pallas TPU flash attention (online-softmax, VMEM-blocked).

This is the TPU-native replacement for the reference's xformers
memory-efficient attention (src/Attention/AttentionMethods.py:16-105): instead
of wrapping a CUDA kernel, we block Q over the grid and stream K/V blocks
through VMEM, keeping the L x L logits matrix out of HBM entirely. At SD1.5
1024x1024 the top UNet level runs 16384 tokens — the logits matrix alone
would be 1 GiB per (batch, head) in fp32, so this kernel is the difference
between HBM-bound and MXU-bound attention.

Layout: (B, H, L, D). D is zero-padded to a multiple of 128 (MXU lane width);
padded K tokens are masked with -inf logits, padded Q rows are computed and
dropped on unpad.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LOG2E = 1.4426950408889634  # 1/ln(2)

# VPU-lean softmax (round 5): the head-packing A/B (ARCHITECTURE §5a-ii)
# showed the d=40 SD1.5 attention kernel is softmax/VPU-bound, so the wins
# left are per-score-element VPU ops, not MACs. Two are structural:
#   - exp(x) lowers to exp2(x * log2e) — folding log2e into the logit
#     scale (one existing multiply) and calling exp2 directly drops one
#     full-vector multiply per score element (p AND alpha rescales);
#     m/l then live in the scaled-logit domain, which is self-consistent.
#   - the padded-kv column mask (iota + compare + select, 3 VPU ops per
#     score element) is statically unnecessary whenever the sequence
#     tiles exactly (every SD1.5 power-of-two level, Flux's 4352 joint
#     seq under both the (544,1088) snap and the whole-L fused table) —
#     the kernels take a static ``masked`` flag and elide it.


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _exact_block(length: int, preferred: int) -> int:
    """Divisor of ``length`` nearest ``preferred`` within [preferred/2,
    3*preferred/2], multiple of 16 (bf16 sublane granule); 0 if none. Used
    to trade the pad-and-mask path for exact tiling when a near-preferred
    divisor exists — e.g. Flux's 4352-token joint sequence tiles exactly as
    (544, 1088) blocks where (512, 1024) pads to 4608x5120 (1.245x the
    FLOPs). Power-of-two lengths (SD1.5 levels) return ``preferred``."""
    if length % 16:
        return 0
    lo = max(preferred // 2, 16)
    hi = min(preferred + preferred // 2, length)
    best = 0
    for b in range(lo - lo % -16, hi + 1, 16):
        if length % b == 0 and (not best or abs(b - preferred) <= abs(best - preferred)):
            best = b
    return best


def _kernel(
    q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
    *, kv_len, masked,
):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)
    block_k = k_ref.shape[1]

    @pl.when(ki == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # pre-scaled by scale*log2e (see module note)
    k = k_ref[0]
    # logits in fp32 on the MXU, already in the base-2 domain
    s = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    if masked:  # static: only when kv padding exists
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
        s = jnp.where(col < kv_len, s, NEG_INF)

    m_prev = m_ref[:]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp2(s - m_new)
    alpha = jnp.exp2(m_prev - m_new)
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype),
        v_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = m_new

    @pl.when(ki == nk - 1)
    def _finish():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def flash_attention(q, k, v, block_q: int = 512, block_k: int = 1024):
    """q: (B, H, Lq, D), k/v: (B, H, Lk, D) -> (B, H, Lq, D).

    Block sizes: (512, 1024) swept as optimal in round 1 and re-confirmed
    in round 3 — a padding-minimizing variant that dropped Flux's ragged
    4352-token joint sequence to exact (256, 256) blocks saved 25% of the
    attention FLOPs but measured 2.4x SLOWER per step on device traces
    (small blocks starve the MXU at d=128 and multiply per-program
    overhead). The up-to-18% padded-FLOP waste at ragged lengths is the
    cheaper side of that trade; padded kv columns are masked, padded q
    rows are dropped on unpad.

    No mask support (the diffusion hot paths are unmasked); use ops.attention
    for masked/causal cases.
    """
    b, h, lq, d = q.shape
    lk = k.shape[2]
    # fold scale AND log2e into q once (O(L*d), fused into the pad copy)
    # instead of scaling the score matrix per element (O(L^2)); the multiply
    # runs in f32 so the only extra rounding is the final cast back
    q = (q.astype(jnp.float32) * (LOG2E / math.sqrt(d))).astype(q.dtype)

    dp = _round_up(d, 128)
    block_q = _exact_block(lq, block_q) or min(block_q, _round_up(lq, 128))
    block_k = _exact_block(lk, block_k) or min(block_k, _round_up(lk, 128))
    lqp = _round_up(lq, block_q)
    lkp = _round_up(lk, block_k)

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, lqp - lq), (0, dp - d)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, lkp - lk), (0, dp - d)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, lkp - lk), (0, dp - d)))

    bh = b * h
    qp = qp.reshape(bh, lqp, dp)
    kp = kp.reshape(bh, lkp, dp)
    vp = vp.reshape(bh, lkp, dp)

    grid = (bh, lqp // block_q, lkp // block_k)

    # CPU (tests) runs the kernel in interpreter mode; TPU compiles it.
    interpret = jax.default_backend() == "cpu"

    out = pl.pallas_call(
        functools.partial(_kernel, kv_len=lk, masked=lkp != lk),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, block_q, dp), lambda i, j, kk: (i, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, block_k, dp), lambda i, j, kk: (i, kk, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, block_k, dp), lambda i, j, kk: (i, kk, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, dp), lambda i, j, kk: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bh, lqp, dp), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, dp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * lqp * lkp * dp,
            bytes_accessed=2 * bh * (lqp + 2 * lkp) * dp,
            transcendentals=bh * lqp * lkp,
        ),
        interpret=interpret,
    )(qp, kp, vp)

    out = out.reshape(b, h, lqp, dp)
    return out[:, :, :lq, :d]


def supported(q, k, v) -> bool:
    """Heuristic dispatch gate: the kernel pays off for long sequences; for
    short KV (cross-attention over 77 text tokens) XLA's fused path wins."""
    lq, d = q.shape[2], q.shape[3]
    lk = k.shape[2]
    if d > 512:
        return False
    return lq >= 512 and lk >= 512


# ---------------------------------------------------------------------------
# Head-packed variant: G heads per 128-lane tile (SD1.5 d=40 -> G=3)
# ---------------------------------------------------------------------------
#
# SD1.5's structural lane waste (round-5 target — ARCHITECTURE §5): the
# level-0 UNet attends at head_dim 40, and both attention matmuls round the
# 40 head lanes up to the 128-lane MXU tile — QK^T contracts over 40 of 128
# lanes and P·V writes 40 of 128 output lanes, a 3.2x padded-MAC bill on
# ~55% of the full-res step. Head-BATCHING over the M axis cannot fix this
# (the contraction stays 40-wide); transposing the contraction onto
# sublanes was measured and rejected in round 1 (Mosaic relayouts).
#
# This kernel packs G = floor(128 / d) heads into one grid cell and makes
# the single dense matmul compute G per-head logit blocks via BLOCK-
# DIAGONAL staging of K and V:
#
#   q_tile  (bq, 128): G heads' features side by side on lanes
#                      [q_h0 | q_h1 | q_h2 | 0-pad]   (packed in XLA)
#   K'  (G*bk, 128):   row block h = k_tile masked to lane segment
#                      [h*d, (h+1)*d) — pure VPU mask+concat, NO transpose
#   s = q_tile @ K'^T -> (bq, G*bk): column block h = q_h k_h^T exactly
#                      (other heads' lanes hit K''s zeros)
#   P' (bq, G*bk) softmaxed PER COLUMN BLOCK (independent m/l state per
#                      head, lane-sliced at bk multiples — no relayout)
#   V'  (G*bk, 128):   same masked staging; P' @ V' accumulates head h's
#                      output into lane segment h of one (bq, 128) acc.
#
# One MXU pass now carries G heads: the padded-MAC bill drops 128/d ->
# 128/(G*d) (3.2x -> 1.07x at d=40) and q/k/v HBM traffic shrinks the same
# factor. Cost: K'/V' staging (G VPU masked copies of each kv block) and a
# zero head when H % G != 0 (SD1.5: 8 heads -> 3 groups of 3, one zero).


def pack_group(d: int) -> int:
    """Heads per 128-lane tile: 3 at d<=42 (SD1.5 level 0), 2 at d<=64;
    1 means packing buys nothing (d=80/160 levels keep the plain kernel)."""
    if d <= 0:
        return 1
    return max(1, 128 // d) if d <= 64 else 1


def _packed_kernel(
    q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
    *, kv_len, G, d, block_k, masked,
):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)
    bk = block_k

    @pl.when(ki == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (bk, 128), 1)
    kp = [jnp.where((lanes >= h * d) & (lanes < (h + 1) * d), k, 0)
          for h in range(G)]
    kprime = jnp.concatenate(kp, axis=0)  # (G*bk, 128) block-diagonal

    # q pre-scaled by scale*log2e; logits land in the base-2 domain
    s = jax.lax.dot_general(
        q, kprime,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, G*bk); col block h = q_h k_h^T

    if masked:  # static: padded kv tokens (index repeats per head block)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        tok = jax.lax.rem(col, bk) + ki * bk
        s = jnp.where(tok < kv_len, s, NEG_INF)

    # online softmax per head block; state (bq, G), lane-sliced
    p_parts, alphas = [], []
    for h in range(G):
        s_h = s[:, h * bk : (h + 1) * bk]
        m_prev = m_ref[:, h : h + 1]
        m_new = jnp.maximum(m_prev, jnp.max(s_h, axis=1, keepdims=True))
        p_h = jnp.exp2(s_h - m_new)
        alpha = jnp.exp2(m_prev - m_new)
        l_ref[:, h : h + 1] = (
            l_ref[:, h : h + 1] * alpha + jnp.sum(p_h, axis=1, keepdims=True)
        )
        m_ref[:, h : h + 1] = m_new
        p_parts.append(p_h.astype(v.dtype))
        alphas.append(alpha)
    p_full = jnp.concatenate(p_parts, axis=1)  # (bq, G*bk)

    vp = [jnp.where((lanes >= h * d) & (lanes < (h + 1) * d), v, 0)
          for h in range(G)]
    vprime = jnp.concatenate(vp, axis=0)  # (G*bk, 128)
    pv = jax.lax.dot_general(
        p_full, vprime,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, 128): head h lands in lane segment h (V''s zeros elsewhere)

    # per-head alpha rescale broadcast onto each head's lane segment
    seg = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    alpha_full = jnp.zeros((q.shape[0], 128), jnp.float32)
    for h in range(G):
        segmask = ((seg >= h * d) & (seg < (h + 1) * d)).astype(jnp.float32)
        alpha_full = alpha_full + alphas[h] * segmask
    acc_ref[:] = acc_ref[:] * alpha_full + pv

    @pl.when(ki == nk - 1)
    def _finish():
        inv = jnp.zeros((q.shape[0], 128), jnp.float32)
        for h in range(G):
            segmask = (
                (seg >= h * d) & (seg < (h + 1) * d)
            ).astype(jnp.float32)
            inv = inv + segmask / l_ref[:, h : h + 1]
        o_ref[0] = (acc_ref[:] * inv).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def packed_flash_attention(q, k, v, block_q: int = 512, block_k: int = 1024):
    """Head-packed flash attention for small head dims (see module note).

    q: (B, H, Lq, D), k/v: (B, H, Lk, D) with pack_group(D) >= 2 ->
    (B, H, Lq, D). Heads pad to a multiple of G with a zero head (softmax
    over all-zero logits is uniform; its output is dropped on unpack)."""
    b, h, lq, d = q.shape
    lk = k.shape[2]
    G = pack_group(d)
    assert G >= 2, (d, "use flash_attention")
    # fold scale + log2e into q once (see flash_attention)
    q = (q.astype(jnp.float32) * (LOG2E / math.sqrt(d))).astype(q.dtype)
    hp = -(-h // G)

    def pack(x, l):
        if hp * G != h:
            x = jnp.pad(x, ((0, 0), (0, hp * G - h), (0, 0), (0, 0)))
        x = x.reshape(b, hp, G, l, d).transpose(0, 1, 3, 2, 4)
        x = x.reshape(b * hp, l, G * d)
        return jnp.pad(x, ((0, 0), (0, 0), (0, 128 - G * d)))

    # packed blocks need 128-aligned lane slices per head block
    bq = _exact_block(lq, block_q) or min(block_q, _round_up(lq, 128))
    bk = _exact_block(lk, block_k) or min(block_k, _round_up(lk, 128))
    if bq % 128:
        bq = min(block_q, _round_up(lq, 128))
    if bk % 128:
        bk = min(block_k, _round_up(lk, 128))
    lqp = _round_up(lq, bq)
    lkp = _round_up(lk, bk)

    qp = pack(q, lq)
    kp = pack(k, lk)
    vp = pack(v, lk)
    if lqp != lq:
        qp = jnp.pad(qp, ((0, 0), (0, lqp - lq), (0, 0)))
    if lkp != lk:
        kp = jnp.pad(kp, ((0, 0), (0, lkp - lk), (0, 0)))
        vp = jnp.pad(vp, ((0, 0), (0, lkp - lk), (0, 0)))

    grid = (b * hp, lqp // bq, lkp // bk)
    interpret = jax.default_backend() == "cpu"

    out = pl.pallas_call(
        functools.partial(
            _packed_kernel, kv_len=lk, G=G, d=d, block_k=bk,
            masked=lkp != lk,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, bq, 128), lambda i, j, kk: (i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, bk, 128), lambda i, j, kk: (i, kk, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, bk, 128), lambda i, j, kk: (i, kk, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, bq, 128), lambda i, j, kk: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * hp, lqp, 128), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, G), jnp.float32),
            pltpu.VMEM((bq, G), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hp * lqp * lkp * 128 * (1 + G),
            bytes_accessed=2 * b * hp * (lqp + 2 * lkp) * 128,
            transcendentals=b * hp * G * lqp * lkp,
        ),
        interpret=interpret,
    )(qp, kp, vp)

    # unpack: (b*hp, lqp, 128) -> (b, H, Lq, D)
    out = out[:, :lq, : G * d].reshape(b, hp, lq, G, d)
    out = out.transpose(0, 1, 3, 2, 4).reshape(b, hp * G, lq, d)
    return out[:, :h]


# ---------------------------------------------------------------------------
# Fused-prologue variant: QKNorm + RoPE + head indexing inside the kernel
# ---------------------------------------------------------------------------
#
# Round-4 device trace (ARCHITECTURE §6b-iv): after W8A8 the Flux step is
# ~29% quant matmuls (already ~93% of the s8 MXU roofline), ~24% flash
# attention, and ~40% elementwise/copy tail. A large share of that tail is
# structural: pallas_call is a fusion barrier, so the unfused chain
#   qkv matmul (pallas) -> split heads -> RMSNorm -> RoPE (XLA)
#   -> flash kernel (pallas)
# must materialize q and k in HBM several times between the two custom
# calls. This variant reads the fused qkv matmul OUTPUT directly (head =
# grid dimension indexing 128-lane blocks — no split/transpose), applies
# QKNorm and RoPE on tiles already in VMEM, and writes the output in
# folded (B, L, H*D) layout (no merge transpose).
#
# RoPE trick: Flux applies rotations to INTERLEAVED feature pairs
# (x[2i], x[2i+1]) — a lane-stride-2 shuffle Mosaic has no cheap vector op
# for. Attention logits are invariant to any fixed permutation of D
# applied to BOTH q and k, so the loader permutes the q/k OUTPUT columns
# of the qkv weights once (models.flux.permute_rope_basis: pair p -> lanes
# (p, p+64), GPT-NeoX layout) and the kernel's rotation becomes
#   out = x * C + roll(x, 64) * S,   C = [cos; cos], S = [-sin; sin]
# — one pltpu.roll over the lane axis and two multiply-adds.


def _fused_kernel(
    qs_ref, ks_ref, tqs_ref, tks_ref, cq_ref, sq_ref, ck_ref, sk_ref,
    q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
    qn_ref, kc_ref, vc_ref,
    *, scale, kv_len, txt_len, block_q, block_k, eps, masked,
):
    """Grid (b·h, lp/bq, lp/bk), kk innermost. The QKNorm+RoPE prologue is
    HOISTED out of the (j, kk) product (the round-4 follow-up trace showed
    the naive per-step prologue cost ~0.8 ms/call — 768 grid steps each
    re-norming its q AND k block, ~30% of the kernel):
      - q is normed+roped ONCE per (i, j), at kk == 0, into qn_ref;
      - k/v are cached for the WHOLE sequence in VMEM (kc/vc, lp x 128 —
        ~1.1 MB each at Flux 1024 px) during the j == 0 sweep, where the
        kk grid walks every block exactly once; later j rows read the
        cache, and their k/v input index maps pin to block 0 so Mosaic
        skips the HBM DMA too (k/v stream from HBM once per head, not
        once per q row).
    Sequential-grid guarantee: j must iterate after the j == 0 fill on the
    same core, so dimension j is 'arbitrary' (not 'parallel') — only the
    head dim may megacore-split, and each core refills its own cache at
    its first j row."""
    ki = pl.program_id(2)
    nk = pl.num_programs(2)
    ji = pl.program_id(1)

    @pl.when(ki == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def norm_rope(x, row0, n_rows, s_img, s_txt, cos, sin):
        xf = x.astype(jnp.float32)
        xf = xf * jax.lax.rsqrt(
            jnp.mean(xf * xf, axis=-1, keepdims=True) + eps
        )
        if txt_len > 0:
            row = (
                jax.lax.broadcasted_iota(jnp.int32, (n_rows, 1), 0) + row0
            )
            sel = jnp.where(row < txt_len, s_txt, s_img)
        else:
            sel = s_img
        xf = xf * sel
        return xf * cos + pltpu.roll(xf, 64, 1) * sin

    @pl.when(ki == 0)
    def _q_prologue():
        # scale*log2e folded here in f32, once per q row (O(bq*d)) — the
        # score matrix then needs no per-element scale and exp2 applies
        # directly (see module note)
        qn_ref[:] = (
            norm_rope(
                q_ref[0], ji * block_q, block_q, qs_ref[...], tqs_ref[...],
                cq_ref[...], sq_ref[...],
            )
            * (scale * LOG2E)
        ).astype(qn_ref.dtype)

    @pl.when(ji == 0)
    def _kv_fill():
        kc_ref[pl.ds(ki * block_k, block_k), :] = norm_rope(
            k_ref[0], ki * block_k, block_k, ks_ref[...], tks_ref[...],
            ck_ref[...], sk_ref[...],
        ).astype(kc_ref.dtype)
        vc_ref[pl.ds(ki * block_k, block_k), :] = v_ref[0]

    q = qn_ref[:]
    k = kc_ref[pl.ds(ki * block_k, block_k), :]

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # q pre-scaled: logits already in the base-2 domain
    if masked:  # static: only when kv padding exists
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
        s = jnp.where(col < kv_len, s, NEG_INF)

    m_prev = m_ref[:]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp2(s - m_new)
    alpha = jnp.exp2(m_prev - m_new)
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(vc_ref.dtype), vc_ref[pl.ds(ki * block_k, block_k), :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = m_new

    @pl.when(ki == nk - 1)
    def _finish():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


# Measured (block_q, block_k) for the fused kernel, keyed by sequence
# length (scripts/sweep_fused_attn_blocks.py on v5e, 2026-08-19): at the
# Flux 1024px joint seq the whole-L K-block (one kv step per q block over
# the prologue's full-length K/V VMEM cache) with a narrow q block beat
# the snapped (544, 1088) default 6.62 vs 7.03 ms/call (~6%). bq=544 at
# bk=4352 failed to compile (VMEM cliff: the (bq, bk) f32 score tile),
# so the entry stays at the measured-safe bq=256. Applies only when the
# caller left the preferred blocks at their defaults; unlisted lengths
# keep the _exact_block snap.
_FUSED_ATTN_BLOCKS = {4352: (256, 4352)}


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_heads", "txt_len", "block_q", "block_k", "eps", "interleaved"
    ),
)
def fused_qkv_attention(
    qkv, q_scale, k_scale, cos, sin,
    *, num_heads: int, txt_len: int = 0,
    txt_q_scale=None, txt_k_scale=None,
    block_q: int = 512, block_k: int = 1024, eps: float = 1e-6,
    interleaved: bool = False,
):
    """Joint attention straight off the fused qkv projection.

    qkv: (B, L, >=3*H*128) with layout [q_heads | k_heads | v_heads | ...]
        (extra trailing lanes — e.g. the single-block linear1's mlp
        columns — are simply never indexed). q/k sections must be in the
        PERMUTED RoPE basis (models.flux.permute_rope_basis).
    q_scale/k_scale: (128,) f32 QKNorm scales (permuted). For a joint
        txt+img sequence (Flux double blocks) pass the txt-stream scales
        via txt_q_scale/txt_k_scale and the boundary via txt_len: rows
        < txt_len use them (txt tokens sit first, models/flux.py).
    cos/sin: (L, 128) f32 in the half-split layout C=[cos;cos],
        S=[-sin;sin] (models.flux.rope_cos_sin).
    interleaved: qkv rows are HEAD-INTERLEAVED [q_h0|k_h0|v_h0|q_h1|...]
        (the tensor-parallel layout, parallel.layout.to_tp_layout) — each
        shard_map shard holds whole heads, so the only change is the
        head-stripe index maps (q/k/v of head h sit at 128-lane blocks
        3h/3h+1/3h+2 instead of h/H+h/2H+h). The OUTPUT layout is
        head-major folded either way — exactly the row-parallel proj's
        expected input order per shard.
    Returns (B, L, H*128) — folded heads, no transpose anywhere.
    """
    b, l, w = qkv.shape
    d = 128
    h = num_heads
    assert w >= 3 * h * d, (w, h)
    scale = 1.0 / math.sqrt(d)
    if txt_q_scale is None:
        txt_q_scale = q_scale
    if txt_k_scale is None:
        txt_k_scale = k_scale

    if (block_q, block_k) == (512, 1024) and l in _FUSED_ATTN_BLOCKS:
        block_q, block_k = _FUSED_ATTN_BLOCKS[l]
    bq = _exact_block(l, block_q) or min(block_q, _round_up(l, 128))
    bk = _exact_block(l, block_k) or min(block_k, _round_up(l, 128))
    lp = _round_up(l, bq)
    lkp = _round_up(l, bk)
    if lp != lkp:
        lp = lkp = _round_up(max(lp, lkp), bq * bk // math.gcd(bq, bk))
    if lp != l:
        qkv = jnp.pad(qkv, ((0, 0), (0, lp - l), (0, 0)))
        cos = jnp.pad(cos, ((0, lp - l), (0, 0)))
        sin = jnp.pad(sin, ((0, lp - l), (0, 0)))

    def vec2(x):
        return x.reshape(1, d).astype(jnp.float32)

    grid = (b * h, lp // bq, lp // bk)
    interpret = jax.default_backend() == "cpu"

    # 128-lane block index of head hh's q/k/v stripe in the qkv rows
    if interleaved:
        q_blk = lambda hh: 3 * hh          # noqa: E731
        k_blk = lambda hh: 3 * hh + 1      # noqa: E731
        v_blk = lambda hh: 3 * hh + 2      # noqa: E731
    else:
        q_blk = lambda hh: hh              # noqa: E731
        k_blk = lambda hh: h + hh          # noqa: E731
        v_blk = lambda hh: 2 * h + hh      # noqa: E731

    out = pl.pallas_call(
        functools.partial(
            _fused_kernel, scale=scale, kv_len=l, txt_len=txt_len,
            block_q=bq, block_k=bk, eps=eps, masked=lp != l,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, d), lambda i, j, kk: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j, kk: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j, kk: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j, kk: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, d), lambda i, j, kk: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, d), lambda i, j, kk: (j, 0), memory_space=pltpu.VMEM),
            # ck/sk and the k/v stripes of qkv are consumed only during the
            # j == 0 cache-fill sweep; pinning their block index to 0 for
            # j > 0 makes consecutive grid steps map to the same block, so
            # Mosaic elides the HBM->VMEM DMA (k/v stream once per head)
            pl.BlockSpec(
                (bk, d), lambda i, j, kk: (kk * (j == 0), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (bk, d), lambda i, j, kk: (kk * (j == 0), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, bq, d),
                lambda i, j, kk, h=h: (i // h, j, q_blk(i % h)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, bk, d),
                lambda i, j, kk, h=h: (i // h, kk * (j == 0), k_blk(i % h)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, bk, d),
                lambda i, j, kk, h=h: (i // h, kk * (j == 0), v_blk(i % h)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, bq, d),
            lambda i, j, kk, h=h: (i // h, j, i % h),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, lp, h * d), qkv.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
            pltpu.VMEM((bq, d), qkv.dtype),   # qn: normed+roped q, per (i, j)
            pltpu.VMEM((lp, d), qkv.dtype),   # kc: normed+roped K, per i
            pltpu.VMEM((lp, d), qkv.dtype),   # vc: raw V, per i
        ],
        compiler_params=pltpu.CompilerParams(
            # j is NOT parallel: rows j > 0 read the cache the j == 0 row
            # fills (see _fused_kernel docstring)
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * lp * lp * d,
            # q once per j row (lp total), k/v once per head, out once
            bytes_accessed=2 * b * h * (2 * lp + 2 * lp) * d,
            transcendentals=b * h * lp * lp,
        ),
        interpret=interpret,
    )(
        vec2(q_scale), vec2(k_scale), vec2(txt_q_scale), vec2(txt_k_scale),
        cos.astype(jnp.float32), sin.astype(jnp.float32),
        cos.astype(jnp.float32), sin.astype(jnp.float32),
        qkv, qkv, qkv,
    )
    return out[:, :l, :] if lp != l else out
