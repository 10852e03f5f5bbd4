"""Int8 flash attention (SageAttention-style) — opt-in.

Why: SD1.5's hot attention runs at head_dim 40/80/160, and the MXU
contracts over a 128-lane tile — QK^T wastes 3.2x of its cycles on lane
padding at d=40 and P.V wastes the same on its 40-wide output tile
(ARCHITECTURE §5: 88 ms of the 160 ms full-res CFG step is flash
attention, "MXU-bound at the lane-padded head dim"). The padding is
structural; what CAN change is the MAC rate: the v5e MXU contracts
s8 x s8 at twice the bf16 rate, so quantizing both attention matmuls to
int8 halves the padded-cycle bill without touching the math's shape.

Scheme (the standard smooth-K/smooth-V int8 attention recipe):
- K is mean-centered over tokens before quantization. Exactly
  softmax-invariant: logits_ij -> logits_ij - q_i.mu is a per-row
  constant shift.
- V is mean-centered over tokens; the mean is added back to the output
  AFTER normalization (rows of softmax sum to 1, so P(V - mu) = PV - mu
  exactly). Both centerings only improve the int8 range; they change no
  (infinite-precision) result.
- Q and centered K quantize per token (per row), centered V per channel;
  the softmax block P (values in [0, 1]) quantizes per element at a
  fixed 127 scale. Online-softmax state (m, l, acc) stays f32 — only the
  two MXU contractions are int8.

``int8_mxu=False`` is the A/B fallback (same discipline as
ops/quant_matmul._kernel_w8a8): the int8 blocks are cast to bf16 in-VMEM
and contracted at the bf16 rate — numerically near-identical (int8 is
exact in bf16), no cycle win; it exists so the variant flips with one
flag if Mosaic's s8 dot regresses.

Reference counterpart: none — the reference's xformers attention
(src/Attention/AttentionMethods.py:16-105) is fp16 end-to-end. This is a
beyond-parity TPU optimization, opt-in via RuntimeConfig.sage_attention /
LDT_SAGE_ATTN=1 / --sage-attention until on-chip speed and image-drift
numbers are measured.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lightdiffusion_next_tpu.ops import flash_attention as _fa

NEG_INF = -1e30


def _kernel(
    q_ref, k_ref, v_ref, sq_ref, sk_ref, sv_ref,
    o_ref, m_ref, l_ref, acc_ref, *, kv_len, int8_mxu, pv_int8,
):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)
    block_k = k_ref.shape[1]

    @pl.when(ki == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    qq = q_ref[0]  # (tq, dp) int8
    kq = k_ref[0]  # (tk, dp) int8
    if int8_mxu:
        s = jax.lax.dot_general(
            qq, kq,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
    else:
        s = jax.lax.dot_general(
            qq.astype(jnp.bfloat16), kq.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    # logits = s32 * sq_i * sk_j (1/sqrt(d) is folded into sq)
    s = s * sq_ref[0] * sk_ref[0]

    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
    s = jnp.where(col < kv_len, s, NEG_INF)

    m_prev = m_ref[:]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)

    if pv_int8:
        # quantize the softmax block for the second int8 contraction; p is
        # in [0, 1] so a fixed 127 scale loses nothing to range
        pq = jnp.round(p * 127.0).astype(jnp.int8)
        if int8_mxu:
            pv = jax.lax.dot_general(
                pq, v_ref[0],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
        else:
            pv = jax.lax.dot_general(
                pq.astype(jnp.bfloat16), v_ref[0].astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        pv = pv * (sv_ref[0] * (1.0 / 127.0))
    else:
        # quality variant: P.V at the bf16 rate on UNQUANTIZED bf16 V
        # (v_ref holds bf16, sv is ones) — only QK^T is int8
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    acc_ref[:] = acc_ref[:] * alpha + pv
    m_ref[:] = m_new

    @pl.when(ki == nk - 1)
    def _finish():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


def _quant_rows(x):
    """Per-row (per-token) symmetric int8: (..., L, D) f32 ->
    int8 codes + f32 (..., L, 1) scales."""
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    s = jnp.maximum(absmax, 1e-12) * (1.0 / 127.0)
    codes = jnp.clip(jnp.round(x / s), -127.0, 127.0).astype(jnp.int8)
    return codes, s


def _int8_block(length: int, preferred: int, lane: int = 32) -> int:
    """Exact-divisor block like flash_attention._exact_block, but int8
    VMEM tiles want a 32-row sublane granule (bf16's is 16). The K block
    additionally rides the LANE dim of the per-token K-scale row vector
    (sk BlockSpec (1, 1, block_k)), where Mosaic requires a multiple of
    128 — pass lane=128 for it. Flux's joint 4352 sequence has no such
    divisor near 1024 (4352 = 2^8*17), so K falls back to the
    pad-and-mask path there (lkp 4352->5120) while Q keeps its exact 544
    tiling."""
    b = _fa._exact_block(length, preferred)
    return b if b % max(32, lane) == 0 else 0


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "int8_mxu", "pv_int8")
)
def sage_attention(
    q, k, v, block_q: int = 512, block_k: int = 1024,
    int8_mxu: bool = True, pv_int8: bool = True,
):
    """q: (B, H, Lq, D), k/v: (B, H, Lk, D) -> (B, H, Lq, D) in q.dtype.

    Same blocking/padding contract as flash_attention; all quantization
    prep (centering, per-token/per-channel scales) is one fused XLA pass
    over Q/K/V — O(L*D) traffic next to the O(L^2) kernel.

    ``pv_int8=False`` is the QUALITY fallback (SageAttention-v1 style):
    only QK^T is int8; P.V contracts unquantized bf16 V at the bf16 rate
    — half the cycle win, none of the P/V rounding."""
    b, h, lq, d = q.shape
    lk = k.shape[2]
    scale = 1.0 / math.sqrt(d)

    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)

    # smooth K and V: mean over tokens (softmax-/output-exact, see module
    # docstring); V's mean is added back after normalization
    kf = kf - jnp.mean(kf, axis=2, keepdims=True)
    vmu = jnp.mean(vf, axis=2, keepdims=True)
    vf = vf - vmu

    qq, sq = _quant_rows(qf)
    kq, sk = _quant_rows(kf)
    if pv_int8:
        # V per channel: absmax over tokens
        v_absmax = jnp.max(jnp.abs(vf), axis=2, keepdims=True)
        sv = jnp.maximum(v_absmax, 1e-12) * (1.0 / 127.0)
        vq = jnp.clip(jnp.round(vf / sv), -127.0, 127.0).astype(jnp.int8)
    else:
        # quality variant: V rides into the kernel unquantized (bf16);
        # the kernel ignores sv on this path
        vq = vf.astype(jnp.bfloat16)
        sv = jnp.ones((b, h, 1, d), jnp.float32)

    sq = sq * scale  # fold 1/sqrt(d) into the per-row Q scale

    dp = _fa._round_up(d, 128)
    block_q = _int8_block(lq, block_q) or min(block_q, _fa._round_up(lq, 128))
    block_k = _int8_block(lk, block_k, lane=128) or min(
        block_k, _fa._round_up(lk, 128)
    )
    lqp = _fa._round_up(lq, block_q)
    lkp = _fa._round_up(lk, block_k)

    qq = jnp.pad(qq, ((0, 0), (0, 0), (0, lqp - lq), (0, dp - d)))
    kq = jnp.pad(kq, ((0, 0), (0, 0), (0, lkp - lk), (0, dp - d)))
    vq = jnp.pad(vq, ((0, 0), (0, 0), (0, lkp - lk), (0, dp - d)))
    # padded q rows: any positive scale (outputs are dropped on unpad);
    # padded k cols are -inf-masked in-kernel; padded v channels times a
    # 1.0 scale stay zero
    sq = jnp.pad(sq, ((0, 0), (0, 0), (0, lqp - lq), (0, 0)),
                 constant_values=1.0)
    sk = jnp.pad(sk, ((0, 0), (0, 0), (0, lkp - lk), (0, 0)),
                 constant_values=1.0)
    sv = jnp.pad(sv, ((0, 0), (0, 0), (0, 0), (0, dp - d)),
                 constant_values=1.0)

    bh = b * h
    qq = qq.reshape(bh, lqp, dp)
    kq = kq.reshape(bh, lkp, dp)
    vq = vq.reshape(bh, lkp, dp)
    sq = sq.reshape(bh, lqp, 1)
    sk = sk.reshape(bh, 1, lkp)  # row-vector layout: no in-kernel transpose
    sv = sv.reshape(bh, 1, dp)

    grid = (bh, lqp // block_q, lkp // block_k)
    interpret = jax.default_backend() == "cpu"

    out = pl.pallas_call(
        functools.partial(
            _kernel, kv_len=lk, int8_mxu=int8_mxu, pv_int8=pv_int8
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda i, j, kk: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dp), lambda i, j, kk: (i, kk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dp), lambda i, j, kk: (i, kk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda i, j, kk: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k), lambda i, j, kk: (i, 0, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, dp), lambda i, j, kk: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, dp), lambda i, j, kk: (i, j, 0),
                               memory_space=pltpu.VMEM),
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
            bytes_accessed=bh * (lqp + 2 * lkp) * dp,
            transcendentals=bh * lqp * lkp,
        ),
        interpret=interpret,
    )(qq, kq, vq, sq, sk, sv)

    out = out.reshape(b, h, lqp, dp)[:, :, :lq, :d]
    return (out + vmu.astype(out.dtype)).astype(q.dtype)


def supported(q, k, v) -> bool:
    """Same long-sequence gate as the bf16 flash kernel."""
    return _fa.supported(q, k, v)
