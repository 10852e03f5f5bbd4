"""Fused Q8_0 dequant + matmul Pallas kernel.

The reference dequantizes GGUF Q8_0 weights inside every forward
(GGMLLayer.get_weight, src/Quantize/Quantizer.py:260-332) and then runs a
normal torch matmul — on TPU that costs 5 bytes/weight of HBM traffic
(read int8 + write bf16 + re-read bf16). This kernel streams the int8
codes and per-32-block f32 scales straight into VMEM, dequantizes on the
VPU, and feeds the MXU — 1.125 bytes/weight, no bf16 weight materialized.

Layout: the weight is stored TRANSPOSED on device, ``qt`` int8 (K, N) with
``scales_t`` f32 (K/32, N), so the in-kernel scale broadcast is a sublane
-axis expand (cheap) and the MXU contraction runs over the K sublanes.
``x`` is (M, K) bf16; out (M, N).

Grid: (M/TM, N/TN, K/TK), K innermost, f32 accumulator scratch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QBLOCK = 32  # Q8_0 quantization block (elements per scale)


def _dequant(q, s, dtype):
    """(TK, TN) int8 + (TK//QBLOCK, TN) f32 -> (TK, TN) in compute dtype.
    Split the sublane axis into (blocks, QBLOCK) and broadcast the scale
    over each block; lane axis (TN) stays intact."""
    tk, tn = q.shape
    w = q.astype(jnp.float32).reshape(tk // QBLOCK, QBLOCK, tn) * s[:, None, :]
    return w.reshape(tk, tn).astype(dtype)


def _kernel(x_ref, q_ref, s_ref, o_ref, acc_ref, *, n_k: int, out_dtype):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = _dequant(q_ref[...], s_ref[...], x_ref.dtype)
    acc_ref[...] += jnp.dot(
        x_ref[...], w, preferred_element_type=jnp.float32
    )

    @pl.when(kk == n_k - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(out_dtype)


def _kernel_wstation(
    x_ref, q_ref, s_ref, o_ref, acc_ref, w_ref, *, n_k: int, tm: int, out_dtype
):
    """Weight-stationary variant: grid (j, kk, i) with the M-tile index i
    INNERMOST, so each (tk, tn) weight block is fetched from HBM and
    dequantized exactly ONCE per matmul instead of once per M-tile — the
    weight-side HBM term for tall activations (Flux image streams fetch
    the full 13.4 GB quantized checkpoint M/tm times per step under the
    M-outer grid; 2x at today's tm=2176 defaults, 4-17x with the small
    tiles this variant was built against). The accumulator spans ALL M-tiles of the current
    N-tile ((mp, tn) f32 scratch, VMEM-bounded by the tn picker); each
    row-tile's output is flushed on the last kk."""
    kk = pl.program_id(1)
    i = pl.program_id(2)
    rows = pl.ds(i * tm, tm)

    @pl.when(kk == 0)
    def _():
        acc_ref[rows, :] = jnp.zeros((tm, acc_ref.shape[1]), jnp.float32)

    @pl.when(i == 0)
    def _():
        w_ref[...] = _dequant(q_ref[...], s_ref[...], w_ref.dtype)

    acc_ref[rows, :] += jnp.dot(
        x_ref[...], w_ref[...], preferred_element_type=jnp.float32
    )

    @pl.when(kk == n_k - 1)
    def _():
        o_ref[...] = acc_ref[rows, :].astype(out_dtype)


def _kernel_w8a8(
    x_ref, q_ref, sx_ref, cs_ref, o_ref, acc_ref, *, n_k: int, out_dtype,
    int8_mxu: bool
):
    """W8A8 variant: both operands int8, MXU contracts at the int8 rate
    (2x bf16 peak on v5e) with an int32 accumulator; the only float work
    is the final per-(row, col) rescale. No dequant pass exists at all —
    the VPU serial fraction of the bf16 kernel disappears.

    ``int8_mxu=False`` is the A/B fallback: cast both int8 blocks to bf16
    and contract at the bf16 rate into an f32 accumulator — keeps the
    traffic/no-dequant wins (int8 in HBM and VMEM) if Mosaic's s8 x s8
    path regresses. int8 values are exact in bf16 (7-bit magnitudes) and
    the MXU forms their pairwise products exactly in f32; rounding enters
    only when f32 partial sums exceed 2^24 (possible at K=12288:
    worst-case |sum| ~ 2e8), so this variant is near-exact where
    int8_mxu=True is integer-exact."""
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    if int8_mxu:
        acc_ref[...] += jax.lax.dot_general(
            x_ref[...],
            q_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    else:
        acc_ref[...] += jax.lax.dot_general(
            x_ref[...].astype(jnp.bfloat16),
            q_ref[...].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(acc_ref.dtype)

    @pl.when(kk == n_k - 1)
    def _():
        o_ref[...] = (
            acc_ref[...].astype(jnp.float32) * sx_ref[...] * cs_ref[...]
        ).astype(out_dtype)


def _kernel_stacked(idx_ref, x_ref, q_ref, s_ref, o_ref, acc_ref, *, n_k: int,
                    out_dtype):
    """Scan-over-blocks variant of ``_kernel``: the weight lives STACKED in
    HBM as (D, K, N) int8 / (D, K/32, N) f32 and the scalar-prefetch block
    index steers the BlockSpec index_map straight at block ``idx`` — the
    per-iteration (K, N) slice copy a ``lax.scan``-carried xs weight would
    cost (read + write + re-read of the full 12 GB checkpoint per step)
    never materializes. idx_ref is consumed by the index_maps only."""
    del idx_ref
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = _dequant(q_ref[0], s_ref[0], x_ref.dtype)
    acc_ref[...] += jnp.dot(
        x_ref[...], w, preferred_element_type=jnp.float32
    )

    @pl.when(kk == n_k - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(out_dtype)


def _kernel_w8a8_stacked(
    idx_ref, x_ref, q_ref, sx_ref, cs_ref, o_ref, acc_ref, *, n_k: int,
    out_dtype, int8_mxu: bool
):
    """Scan-over-blocks variant of ``_kernel_w8a8`` (see _kernel_stacked)."""
    del idx_ref
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    if int8_mxu:
        acc_ref[...] += jax.lax.dot_general(
            x_ref[...],
            q_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    else:
        acc_ref[...] += jax.lax.dot_general(
            x_ref[...].astype(jnp.bfloat16),
            q_ref[0].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(acc_ref.dtype)

    @pl.when(kk == n_k - 1)
    def _():
        o_ref[...] = (
            acc_ref[...].astype(jnp.float32) * sx_ref[...] * cs_ref[0]
        ).astype(out_dtype)


def _pick_tile(dim: int, preferred: int, granule: int) -> int:
    """Largest tile <= preferred that divides dim and is a multiple of
    ``granule`` (dim is already a multiple of granule)."""
    t = min(preferred, dim)
    t -= t % granule
    while t > granule and dim % t:
        t -= granule
    return max(t, granule)


def _vmem_budget() -> int:
    """Per-grid-step VMEM budget: the scoped-vmem limit raised by
    config.jit_compiler_options() at the outer jit sites (32 MiB on TPU,
    compiler-default 16 MiB elsewhere), minus Mosaic stack headroom."""
    from lightdiffusion_next_tpu import config as _config

    return _config.scoped_vmem_budget_bytes()


def _tile_vmem(tm: int, tk: int, tn: int, x_bytes: int, out_bytes: int) -> int:
    """Scoped-VMEM bytes of one grid step under the M-outer grid: double
    -buffered x and weight (int8) + scales (f32) blocks, single f32
    accumulator, double-buffered out, plus the dequant's (tk, tn) f32
    intermediate (measured: a tk=1024 tile the formula-without-it approved
    compiled to 33.03 MiB actual vs 32 MiB limit). Matches the compiler's
    reported scoped allocation within rounding at bf16 Flux shapes."""
    return (
        2 * tm * tk * x_bytes
        + 2 * (tk * tn + (tk // QBLOCK) * tn * 4)
        + tm * tn * 4
        + 2 * tm * tn * out_bytes
        + tk * tn * 4
    )


def _pick_tn(
    n: int, preferred: int, tm: int, tk: int, x_bytes: int, out_bytes: int
) -> int:
    """Largest N-tile <= preferred that divides n AND fits the scoped-VMEM
    budget alongside the chosen (tm, tk) blocks. A wider tn divides the
    activation re-fetch traffic (x is streamed once per N-tile pass), so
    prefer 1024 where VMEM allows; under the default 16 MiB scoped limit
    the budget steps it back down (e.g. to 512 at tm=2048)."""
    budget = _vmem_budget()
    tn = _pick_tile(n, preferred, 128)
    while tn > 128 and _tile_vmem(tm, tk, tn, x_bytes, out_bytes) > budget:
        tn = _pick_tile(n, tn - 128, 128)
    return tn


def supported(m: int, k: int, n: int) -> bool:
    """Shapes the fused kernel handles without padding K/N. K must tile in
    256-multiples so the scales block keeps an 8-divisible sublane count
    (tk/32 % 8 == 0 — Mosaic block-shape constraint)."""
    return k % 256 == 0 and n % 128 == 0 and m >= 1


def supported_w8a8(m: int, k: int, n: int) -> bool:
    """The W8A8 kernel has NO block-scale tensor, so its K granule is the
    128-lane tile, not 256: tp=8 row-parallel shards of Flux hidden=3072
    (K_local=384) still take the kernel where the Q8_0 kernel must fall
    back to dequant+dot."""
    return k % 128 == 0 and n % 128 == 0 and m >= 1


def _quant_matmul_2d(
    x,
    qt,
    scales_t,
    out_dtype=jnp.bfloat16,
    interpret=False,
    tile_m=None,
    tile_k=None,
    tile_n=None,
    weight_stationary=False,
):
    """x (M, K) x quantized weight qt int8 (K, N) / scales_t (K/32, N)
    -> (M, N) in ``out_dtype``.

    Tile choice: the weight block is RE-dequantized for every M-tile, so a
    larger tile_m directly divides the VPU dequant overhead (M/tm repeats);
    the defaults favor the largest M-tile VMEM accommodates."""
    m, k = x.shape
    k2, n = qt.shape
    assert k == k2, (x.shape, qt.shape)
    assert scales_t.shape == (k // QBLOCK, n), scales_t.shape

    # pad M up to the sublane granule, then tile. The weight block is
    # re-dequantized once per M-tile, so prefer the largest M-tile that
    # fits VMEM alongside the (tk, tn) weight + scales + acc blocks:
    # Flux image-token matmuls (M=4096/4352) drop from 16-17 dequant
    # passes at tm=256 to 2 at tm<=2304 — the VPU dequant is a
    # significant serial fraction next to the MXU dot. (2304 rather than
    # 2048 so M=4352 lands its 2176 divisor under the raised 32 MiB
    # scoped-vmem limit.)
    pad = (-m) % 8
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    mp = m + pad
    tm = _pick_tile(mp, tile_m or 2304, 8)
    tk = _pick_tile(k, tile_k or 512, 256)
    n_k = k // tk

    # Weight-stationary grid (OPT-IN, weight_stationary=True): M-tile index
    # innermost with the dequantized block stationed in VMEM scratch, so
    # each weight block is fetched+dequantized once per matmul instead of
    # once per M-tile. Measured END-TO-END on Flux 1024² it is ~3.5% SLOWER
    # than the M-outer grid at tm=544 (14.29 vs 13.78 s/image): the
    # (mp, tn) accumulator's dynamic-slice read-modify-write per iteration
    # and the per-visit out-block flushes cost more than the saved weight
    # refetches once the M-outer pass count is already low. Kept for
    # shapes/tunings where the trade flips (very tall M, tiny tm).
    wstation = weight_stationary and mp // tm > 1 and tile_n is None
    if wstation:
        tn_cap = max(128, ((8 << 20) // (4 * mp)) // 128 * 128)
        tn = _pick_tile(n, min(512, tn_cap), 128)
    elif tile_n is not None:
        # explicit tile_n (tile sweeps): honor it verbatim — a clamp here
        # would silently measure a different tile than the caller labeled
        tn = _pick_tile(n, tile_n, 128)
    else:
        xb = jnp.dtype(x.dtype).itemsize
        ob = jnp.dtype(out_dtype).itemsize
        tn = _pick_tn(n, 1024, tm, tk, xb, ob)

    if wstation:
        out = pl.pallas_call(
            functools.partial(
                _kernel_wstation, n_k=n_k, tm=tm, out_dtype=out_dtype
            ),
            grid=(n // tn, n_k, mp // tm),  # (j, kk, i) — i innermost
            in_specs=[
                pl.BlockSpec(
                    (tm, tk), lambda j, kk, i: (i, kk), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (tk, tn), lambda j, kk, i: (kk, j), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (tk // QBLOCK, tn),
                    lambda j, kk, i: (kk, j),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (tm, tn), lambda j, kk, i: (i, j), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
            scratch_shapes=[
                pltpu.VMEM((mp, tn), jnp.float32),
                pltpu.VMEM((tk, tn), x.dtype),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * mp * k * n,
                bytes_accessed=(n // tn) * mp * k * 2
                + k * n
                + (k // QBLOCK) * n * 4
                + mp * n * 2,
                transcendentals=0,
            ),
            interpret=interpret,
        )(x, qt, scales_t)
        return out[:m] if mp != m else out

    out = pl.pallas_call(
        functools.partial(_kernel, n_k=n_k, out_dtype=out_dtype),
        grid=(mp // tm, n // tn, n_k),
        in_specs=[
            pl.BlockSpec(
                (tm, tk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tk, tn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tk // QBLOCK, tn),
                lambda i, j, kk: (kk, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (tm, tn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * k * n,
            bytes_accessed=mp * k * 2 + k * n + (k // QBLOCK) * n * 4 + mp * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, qt, scales_t)
    return out[:m] if mp != m else out


@functools.lru_cache(maxsize=1)
def _jitted_quant_matmul_2d():
    """Jit of the 2-D kernel entry, created lazily so the scoped-vmem
    compiler option (config.jit_compiler_options — needs an initialized
    backend) is attached for STANDALONE calls. Calls from inside an outer
    jit (the sampler runners) inline the trace and take the OUTER jit's
    compiler options instead — those sites attach the same options."""
    from lightdiffusion_next_tpu import config as _config

    return _config.ldt_jit(
        _quant_matmul_2d,
        static_argnames=(
            "out_dtype", "interpret", "tile_m", "tile_k", "tile_n",
            "weight_stationary",
        ),
    )


def _tracing() -> bool:
    try:
        from jax._src import core as _core

        return not _core.trace_state_clean()
    except Exception:  # pragma: no cover - private-API drift
        return True


def quant_matmul_2d(x, qt, scales_t, **kw):
    """x (M, K) x quantized weight -> (M, N); see _quant_matmul_2d.

    Standalone calls go through a jit carrying the scoped-vmem compiler
    option (the big tiles need it). Calls from inside an outer trace run
    the impl directly — jax forbids compiler_options on nested jits, and
    the OUTER jit (sampler runners, trainer step) carries the option."""
    if _tracing():
        return _quant_matmul_2d(x, qt, scales_t, **kw)
    return _jitted_quant_matmul_2d()(x, qt, scales_t, **kw)


def quant_matmul(x, qt, scales_t, out_dtype=None, interpret=None):
    """Batched wrapper: x (..., K) -> (..., N)."""
    out_dtype = out_dtype or x.dtype
    if interpret is None:
        # CPU (tests) runs the kernel in interpreter mode; TPU compiles it.
        interpret = jax.default_backend() == "cpu"
    lead = x.shape[:-1]
    k = x.shape[-1]
    y = quant_matmul_2d(
        x.reshape(-1, k), qt, scales_t, out_dtype=out_dtype, interpret=interpret
    )
    return y.reshape(lead + (y.shape[-1],))


def _quant_matmul_stacked_2d(
    x,
    qt3,
    scales3,
    idx,
    out_dtype=jnp.bfloat16,
    interpret=False,
    tile_m=None,
    tile_k=None,
    tile_n=None,
):
    """x (M, K) x block ``idx`` of a STACKED quantized weight — qt3 int8
    (D, K, N), scales3 f32 (D, K/32, N), idx int32 scalar (traced; the
    scan-over-blocks loop counter) -> (M, N) in ``out_dtype``.

    Same grid/tiling as ``_quant_matmul_2d``; the block index rides Pallas
    scalar prefetch into the weight/scales index_maps so tiles stream from
    the stacked array in place."""
    m, k = x.shape
    d, k2, n = qt3.shape
    assert k == k2, (x.shape, qt3.shape)
    assert scales3.shape == (d, k // QBLOCK, n), scales3.shape

    pad = (-m) % 8
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    mp = m + pad
    tm = _pick_tile(mp, tile_m or 2304, 8)
    tk = _pick_tile(k, tile_k or 512, 256)
    n_k = k // tk
    if tile_n is not None:
        tn = _pick_tile(n, tile_n, 128)
    else:
        xb = jnp.dtype(x.dtype).itemsize
        ob = jnp.dtype(out_dtype).itemsize
        tn = _pick_tn(n, 1024, tm, tk, xb, ob)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(mp // tm, n // tn, n_k),
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, kk, blk: (i, kk)),
            pl.BlockSpec((1, tk, tn), lambda i, j, kk, blk: (blk[0], kk, j)),
            pl.BlockSpec(
                (1, tk // QBLOCK, tn), lambda i, j, kk, blk: (blk[0], kk, j)
            ),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk, blk: (i, j)),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_kernel_stacked, n_k=n_k, out_dtype=out_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * k * n,
            bytes_accessed=mp * k * 2 + k * n + (k // QBLOCK) * n * 4 + mp * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(idx, jnp.int32).reshape(1), x, qt3, scales3)
    return out[:m] if mp != m else out


@functools.lru_cache(maxsize=1)
def _jitted_quant_matmul_stacked_2d():
    """Standalone-call jit of the stacked entry, carrying the scoped-vmem
    compiler option (see _jitted_quant_matmul_2d). The scan-body calls are
    always inside an outer trace and never reach this; the UNROLLED block 0
    of an eagerly-called apply_flux on stacked params does."""
    from lightdiffusion_next_tpu import config as _config

    return _config.ldt_jit(
        _quant_matmul_stacked_2d,
        static_argnames=("out_dtype", "interpret", "tile_m", "tile_k",
                         "tile_n"),
    )


def quant_matmul_stacked(x, qt3, scales3, idx, out_dtype=None, interpret=None):
    """Batched wrapper: x (..., K) x stacked-weight block ``idx`` -> (..., N).
    Scan-body calls run inside the outer ldt_jit (which carries the
    scoped-vmem option); a standalone call (eager apply_flux — the
    static-index block 0) self-jits with the option, like quant_matmul_2d."""
    out_dtype = out_dtype or x.dtype
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    lead = x.shape[:-1]
    k = x.shape[-1]
    entry = _quant_matmul_stacked_2d if _tracing() \
        else _jitted_quant_matmul_stacked_2d()
    y = entry(
        x.reshape(-1, k), qt3, scales3, idx,
        out_dtype=out_dtype, interpret=interpret,
    )
    return y.reshape(lead + (y.shape[-1],))


# ---------------------------------------------------------------------------
# W8A8: int8 activations x int8 weights on the MXU int8 path
# ---------------------------------------------------------------------------


def quantize_rows(x):
    """Per-token (per-row) symmetric int8 quantization of x (..., K):
    returns (codes int8, scales f32 (..., 1)) with x ~= codes * scales.
    Done in XLA (one fused absmax+scale pass, ~M*K*3 bytes of traffic —
    trivial next to the K*N weight stream the kernel saves)."""
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    sx = jnp.maximum(absmax, 1e-12) * (1.0 / 127.0)
    codes = jnp.clip(jnp.round(xf / sx), -127.0, 127.0).astype(jnp.int8)
    return codes, sx


def _tile_vmem_w8a8(tm: int, tk: int, tn: int, out_bytes: int) -> int:
    """Scoped-VMEM bytes of one w8a8 grid step: double-buffered int8 x and
    weight blocks, int32 accumulator, double-buffered out, the epilogue's
    (tm, tn) f32 temp, and the two scale blocks AT THEIR PHYSICAL layout:
    a (tm, 1) f32 block is lane-padded to 128 lanes and a (1, tn) block
    sublane-padded to 8 rows (the bf16 kernel's estimator was once burned
    by exactly this class of undercount — see _tile_vmem)."""
    return (
        2 * tm * tk
        + 2 * tk * tn
        + tm * tn * 4
        + 2 * tm * tn * out_bytes
        + tm * tn * 4
        + 2 * (tm * 128 * 4 + 8 * tn * 4)
    )


def _pick_tn_w8a8(n: int, preferred: int, tm: int, tk: int, out_bytes: int) -> int:
    budget = _vmem_budget()
    tn = _pick_tile(n, preferred, 128)
    while tn > 128 and _tile_vmem_w8a8(tm, tk, tn, out_bytes) > budget:
        tn = _pick_tile(n, tn - 128, 128)
    return tn


# Measured W8A8 tile table (v5e, 2026-08-19 on-chip sweep —
# scripts/sweep_w8a8_tiles.py, chained-jit RELATIVE timings at the Flux
# 1024px hot shapes, m=4352):
#   (k, n)         best tiles          vs the (2176, 512, <=1024) default
#   (3072, 3072):  (2176, 1024, 512)   3.83 -> 3.21 ms/op  (-16%)
#   (3072, 12288): (2176, 1024, 1024)  4.25 -> 3.83 ms/op  (-10%)
#   (3072, 9216):  (2176, 512, 1536)   4.46 -> 3.63 ms/op  (-19%)
# A confirmation sweep the same day (after the table landed) re-measured
# the 12288->3072 FFN down-projection the first session could not chain:
#   (12288, 3072): (1088, 512, 1024)   5.79 -> 5.04 ms/op  (-13%)
# (consistent winner across both sessions; the other rows' session-to-
# session deltas were within relay noise, so they stay as first measured).
# The common pattern: a deeper K-tile (fewer accumulator spills per
# N-pass) or a wider N-tile beats the analytic default's VMEM-driven
# choice. Unlisted shapes keep the analytic default. tile_m hints re-fit
# any M via _pick_tile.
_W8A8_TILE_TABLE = {
    (3072, 3072): (2176, 1024, 512),
    (3072, 12288): (2176, 1024, 1024),
    (3072, 9216): (2176, 512, 1536),
    (12288, 3072): (1088, 512, 1024),
}


def _w8a8_tile_hint(k, n, tile_m, tile_k, tile_n):
    """Fill unset tile args from the measured table (explicit args win)."""
    if tile_m is None and tile_k is None and tile_n is None:
        hint = _W8A8_TILE_TABLE.get((k, n))
        if hint is not None:
            return hint
    return tile_m, tile_k, tile_n


def _w8a8_matmul_2d(
    x,
    qt,
    col_scales,
    out_dtype=jnp.bfloat16,
    interpret=False,
    tile_m=None,
    tile_k=None,
    tile_n=None,
    int8_mxu=True,
):
    """x (M, K) float x per-column-requantized weight qt int8 (K, N) /
    col_scales f32 (1, N) -> (M, N) in ``out_dtype``.

    The activation is row-quantized to int8 in XLA first; the kernel's MXU
    contraction then runs s8 x s8 -> s32 (double the bf16 MACs/cycle on
    v5e) and the weight block needs NO dequantization — the bf16 kernel's
    per-M-tile VPU dequant pass (the reason it prefers huge M-tiles) is
    gone, as is the (K/32, N) f32 block-scale stream (1.125 -> 1.0
    bytes/weight)."""
    m, k = x.shape
    k2, n = qt.shape
    assert k == k2, (x.shape, qt.shape)
    assert col_scales.shape == (1, n), col_scales.shape

    xq, sx = quantize_rows(x)

    tile_m, tile_k, tile_n = _w8a8_tile_hint(k, n, tile_m, tile_k, tile_n)
    # int8 x blocks want 32-row sublane granules; pad M up to 32.
    pad = (-m) % 32
    if pad:
        xq = jnp.pad(xq, ((0, pad), (0, 0)))
        sx = jnp.pad(sx, ((0, pad), (0, 0)))
    mp = m + pad
    tm = _pick_tile(mp, tile_m or 2176, 32)
    # K granule 128 (x lane dim / q int8 sublane dim), not the bf16
    # kernel's 256 — no scales block to keep 8-sublane-aligned here
    tk = _pick_tile(k, tile_k or 512, 128)
    n_k = k // tk
    ob = jnp.dtype(out_dtype).itemsize
    tn = (
        _pick_tile(n, tile_n, 128)
        if tile_n is not None
        else _pick_tn_w8a8(n, 1024, tm, tk, ob)
    )

    out = pl.pallas_call(
        functools.partial(
            _kernel_w8a8, n_k=n_k, out_dtype=out_dtype, int8_mxu=int8_mxu
        ),
        grid=(mp // tm, n // tn, n_k),
        in_specs=[
            pl.BlockSpec(
                (tm, tk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tk, tn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tm, 1), lambda i, j, kk: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, tn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tm, tn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((tm, tn), jnp.int32 if int8_mxu else jnp.float32)
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * k * n,
            bytes_accessed=mp * k + k * n + n * 4 + mp * 4 + mp * n * ob,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xq, qt, sx, col_scales)
    return out[:m] if mp != m else out


@functools.lru_cache(maxsize=1)
def _jitted_w8a8_matmul_2d():
    from lightdiffusion_next_tpu import config as _config

    return _config.ldt_jit(
        _w8a8_matmul_2d,
        static_argnames=(
            "out_dtype", "interpret", "tile_m", "tile_k", "tile_n", "int8_mxu"
        ),
    )


def w8a8_matmul_2d(x, qt, col_scales, **kw):
    """x (M, K) x per-column int8 weight -> (M, N); see _w8a8_matmul_2d.
    Same outer-jit discipline as quant_matmul_2d (scoped-vmem option on
    standalone calls; inlined under an outer ldt_jit trace)."""
    if _tracing():
        return _w8a8_matmul_2d(x, qt, col_scales, **kw)
    return _jitted_w8a8_matmul_2d()(x, qt, col_scales, **kw)


def w8a8_matmul(x, qt, col_scales, out_dtype=None, interpret=None):
    """Batched wrapper: x (..., K) -> (..., N) through the W8A8 kernel."""
    out_dtype = out_dtype or x.dtype
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    lead = x.shape[:-1]
    k = x.shape[-1]
    y = w8a8_matmul_2d(
        x.reshape(-1, k), qt, col_scales, out_dtype=out_dtype, interpret=interpret
    )
    return y.reshape(lead + (y.shape[-1],))


def _w8a8_matmul_stacked_2d(
    x,
    qt3,
    col_scales3,
    idx,
    out_dtype=jnp.bfloat16,
    interpret=False,
    tile_m=None,
    tile_k=None,
    tile_n=None,
    int8_mxu=True,
):
    """W8A8 scan-over-blocks entry: x (M, K) x block ``idx`` of qt3 int8
    (D, K, N) with col_scales3 f32 (D, 1, N) -> (M, N). See
    _quant_matmul_stacked_2d for the scalar-prefetch rationale."""
    m, k = x.shape
    d, k2, n = qt3.shape
    assert k == k2, (x.shape, qt3.shape)
    assert col_scales3.shape == (d, 1, n), col_scales3.shape

    xq, sx = quantize_rows(x)
    tile_m, tile_k, tile_n = _w8a8_tile_hint(k, n, tile_m, tile_k, tile_n)
    pad = (-m) % 32
    if pad:
        xq = jnp.pad(xq, ((0, pad), (0, 0)))
        sx = jnp.pad(sx, ((0, pad), (0, 0)))
    mp = m + pad
    tm = _pick_tile(mp, tile_m or 2176, 32)
    tk = _pick_tile(k, tile_k or 512, 128)
    n_k = k // tk
    ob = jnp.dtype(out_dtype).itemsize
    tn = (
        _pick_tile(n, tile_n, 128)
        if tile_n is not None
        else _pick_tn_w8a8(n, 1024, tm, tk, ob)
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(mp // tm, n // tn, n_k),
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, kk, blk: (i, kk)),
            pl.BlockSpec((1, tk, tn), lambda i, j, kk, blk: (blk[0], kk, j)),
            pl.BlockSpec((tm, 1), lambda i, j, kk, blk: (i, 0)),
            pl.BlockSpec((1, 1, tn), lambda i, j, kk, blk: (blk[0], 0, j)),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk, blk: (i, j)),
        scratch_shapes=[
            pltpu.VMEM((tm, tn), jnp.int32 if int8_mxu else jnp.float32)
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel_w8a8_stacked, n_k=n_k, out_dtype=out_dtype,
            int8_mxu=int8_mxu,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * k * n,
            bytes_accessed=mp * k + k * n + n * 4 + mp * 4 + mp * n * ob,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(idx, jnp.int32).reshape(1), xq, qt3, sx, col_scales3)
    return out[:m] if mp != m else out


@functools.lru_cache(maxsize=1)
def _jitted_w8a8_matmul_stacked_2d():
    """Standalone-call jit with the scoped-vmem option (see
    _jitted_quant_matmul_stacked_2d)."""
    from lightdiffusion_next_tpu import config as _config

    return _config.ldt_jit(
        _w8a8_matmul_stacked_2d,
        static_argnames=("out_dtype", "interpret", "tile_m", "tile_k",
                         "tile_n", "int8_mxu"),
    )


def w8a8_matmul_stacked(
    x, qt3, col_scales3, idx, out_dtype=None, interpret=None, int8_mxu=True
):
    """Batched wrapper: x (..., K) x stacked W8A8 block ``idx`` -> (..., N).
    Same outer-jit discipline as quant_matmul_stacked."""
    out_dtype = out_dtype or x.dtype
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    lead = x.shape[:-1]
    k = x.shape[-1]
    entry = _w8a8_matmul_stacked_2d if _tracing() \
        else _jitted_w8a8_matmul_stacked_2d()
    y = entry(
        x.reshape(-1, k), qt3, col_scales3, idx,
        out_dtype=out_dtype, interpret=interpret, int8_mxu=int8_mxu,
    )
    return y.reshape(lead + (y.shape[-1],))


# ---------------------------------------------------------------------------
# Fused elementwise prologue/epilogue for the W8A8 serving path (round 4).
#
# The round-4 device trace of the w8a8+fused-attn Flux step put ~18% of the
# image in elementwise/copy fusions AROUND the matmuls: XLA computes
# layer_norm+modulation as its own pass, then quantize_rows as an
# absmax-reduce pass plus a scale+round pass (a loop fusion cannot consume
# its own reduce), re-reading the activation three times; every
# gated-residual add is another full read+write. These kernels collapse
# that to one read + one int8 write:
#
#   row_quantize_fused   x -> [layer_norm*(1+s)+t | gelu | id] -> absmax
#                        -> int8 codes + row scales, one pass over x
#   row_quantize_concat_gelu   [attn ; gelu(window of proj)] -> int8, for
#                        the single-block linear2 input (the concat never
#                        materializes; the gelu pass disappears)
#   w8a8_matmul_ep       prequantized x @ w8a8 weight with the bias,
#                        per-column gate, and residual add inside the
#                        kernel epilogue: o = res + acc*sx*cs_eff + b_eff
#                        (cs_eff = col_scales*gate and b_eff = gate*bias
#                        are (1, N) folds done in XLA for free)
#
# Numerics: identical quantization law to quantize_rows (same absmax, same
# 1e-12 clamp, same round/clip); the LN/gelu math is the same f32 ops as
# ops.nn, so results differ from the unfused path only by float
# reassociation inside one row (<= 1 int8 LSB).  models/flux.py routes
# through these only for single-batch W8A8 TPU serving (B=1; the
# modulation vectors are per-batch) and falls back to the unfused ops
# everywhere else.
# ---------------------------------------------------------------------------


def supported_rowquant(k: int) -> bool:
    return k % 128 == 0


def _rowquant_pick_tm(mp: int, k_bytes_per_row: int) -> int:
    """Largest 32-multiple row tile that divides mp and keeps one grid
    step's working set (double-buffered bf16 in + int8 out, one f32 temp
    set) inside the scoped-VMEM budget."""
    budget = _vmem_budget()
    tm = _pick_tile(mp, 512, 32)
    while tm > 32 and tm * k_bytes_per_row > budget:
        tm = _pick_tile(mp, tm - 32, 32)
    return tm


def _quantize_block(xf):
    """(tm, K) f32 -> int8 codes + (tm, 1) f32 scales, the quantize_rows
    law verbatim (bitwise-matching expressions)."""
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    sx = jnp.maximum(absmax, 1e-12) * (1.0 / 127.0)
    codes = jnp.clip(jnp.round(xf / sx), -127.0, 127.0).astype(jnp.int8)
    return codes, sx


def _kernel_rowquant_plain(x_ref, xq_ref, sx_ref, *, prologue):
    xf = x_ref[...].astype(jnp.float32)
    if prologue == "gelu":
        xf = jax.nn.gelu(xf, approximate=True)
    xq_ref[...], sx_ref[...] = _quantize_block(xf)


def _kernel_rowquant_lnmod(x_ref, s_ref, t_ref, xq_ref, sx_ref, *, eps):
    xf = x_ref[...].astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xf = xc * jax.lax.rsqrt(var + eps) * s_ref[...] + t_ref[...]
    xq_ref[...], sx_ref[...] = _quantize_block(xf)


def _kernel_rowquant_concat_gelu(a_ref, b_ref, xq_ref, sx_ref, *, b_lo, b_hi):
    af = a_ref[...].astype(jnp.float32)
    bf = b_ref[:, pl.ds(b_lo, b_hi - b_lo)].astype(jnp.float32)
    xf = jnp.concatenate(
        [af, jax.nn.gelu(bf, approximate=True)], axis=1
    )
    xq_ref[...], sx_ref[...] = _quantize_block(xf)


def _row_quantize_fused_2d(
    x, mod_scale=None, mod_shift=None, *, prologue="none",
    interpret=False, eps=1e-6,
):
    """x (M, K) -> (codes int8 (M, K), scales f32 (M, 1)) with the
    prologue ("none" | "gelu" | "ln_mod") fused into the quantize pass.
    For "ln_mod", mod_scale/mod_shift are (1, K) f32 and the row transform
    is layer_norm(x, eps)*mod_scale + mod_shift (callers fold the +1)."""
    m, k = x.shape
    pad = (-m) % 32
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    mp = m + pad
    # double-buffered bf16 in (2*2) + int8 out (2*1) + ~2 f32 temp rows (8)
    tm = _rowquant_pick_tm(mp, k * 14)

    if prologue == "ln_mod":
        kernel = functools.partial(_kernel_rowquant_lnmod, eps=eps)
        extra_in = [
            jnp.asarray(mod_scale, jnp.float32).reshape(1, k),
            jnp.asarray(mod_shift, jnp.float32).reshape(1, k),
        ]
        extra_specs = [
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
    else:
        kernel = functools.partial(_kernel_rowquant_plain, prologue=prologue)
        extra_in, extra_specs = [], []

    codes, sx = pl.pallas_call(
        kernel,
        grid=(mp // tm,),
        in_specs=[
            pl.BlockSpec((tm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *extra_specs,
        ],
        out_specs=[
            pl.BlockSpec((tm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mp, k), jnp.int8),
            jax.ShapeDtypeStruct((mp, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * mp * k,
            bytes_accessed=mp * k * 3 + mp * 4,
            transcendentals=mp * k if prologue == "gelu" else 0,
        ),
        interpret=interpret,
    )(x, *extra_in)
    if pad:
        codes, sx = codes[:m], sx[:m]
    return codes, sx


@functools.lru_cache(maxsize=1)
def _jitted_row_quantize_fused_2d():
    from lightdiffusion_next_tpu import config as _config

    return _config.ldt_jit(
        _row_quantize_fused_2d,
        static_argnames=("prologue", "interpret", "eps"),
    )


def row_quantize_fused(
    x, mod_scale=None, mod_shift=None, *, prologue="none", interpret=None,
    eps=1e-6,
):
    """Batched wrapper: x (..., K) -> (codes (..., K), scales (..., 1))."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    lead = x.shape[:-1]
    k = x.shape[-1]
    entry = _row_quantize_fused_2d if _tracing() \
        else _jitted_row_quantize_fused_2d()
    codes, sx = entry(
        x.reshape(-1, k), mod_scale, mod_shift,
        prologue=prologue, interpret=interpret, eps=eps,
    )
    return codes.reshape(lead + (k,)), sx.reshape(lead + (1,))


def _row_quantize_concat_gelu_2d(a, b, b_lo, b_hi, *, interpret=False):
    """codes/scales for rows [a ; gelu(b[:, b_lo:b_hi])] without ever
    materializing the concat (the Flux single-block linear2 input: a is
    the attention output, b the FULL linear1 projection whose mlp window
    is [b_lo, b_hi) — the qkv lanes are simply never read)."""
    m, ka = a.shape
    m2, kb_full = b.shape
    assert m == m2, (a.shape, b.shape)
    assert 0 <= b_lo < b_hi <= kb_full and b_lo % 128 == 0 and b_hi % 128 == 0
    kb = b_hi - b_lo
    k = ka + kb
    pad = (-m) % 32
    if pad:
        a = jnp.pad(a, ((0, pad), (0, 0)))
        b = jnp.pad(b, ((0, pad), (0, 0)))
    mp = m + pad
    tm = _rowquant_pick_tm(mp, (ka + kb_full + k) * 10)

    codes, sx = pl.pallas_call(
        functools.partial(_kernel_rowquant_concat_gelu, b_lo=b_lo, b_hi=b_hi),
        grid=(mp // tm,),
        in_specs=[
            pl.BlockSpec((tm, ka), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tm, kb_full), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((tm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mp, k), jnp.int8),
            jax.ShapeDtypeStruct((mp, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * mp * k,
            bytes_accessed=mp * (ka + kb_full) * 2 + mp * k + mp * 4,
            transcendentals=mp * kb,
        ),
        interpret=interpret,
    )(a, b)
    if pad:
        codes, sx = codes[:m], sx[:m]
    return codes, sx


@functools.lru_cache(maxsize=1)
def _jitted_row_quantize_concat_gelu_2d():
    from lightdiffusion_next_tpu import config as _config

    return _config.ldt_jit(
        _row_quantize_concat_gelu_2d,
        static_argnames=("b_lo", "b_hi", "interpret"),
    )


def row_quantize_concat_gelu(a, b, b_lo, b_hi, interpret=None):
    """Batched wrapper over _row_quantize_concat_gelu_2d."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    lead = a.shape[:-1]
    ka, kb_full = a.shape[-1], b.shape[-1]
    k = ka + (b_hi - b_lo)
    entry = _row_quantize_concat_gelu_2d if _tracing() \
        else _jitted_row_quantize_concat_gelu_2d()
    codes, sx = entry(
        a.reshape(-1, ka), b.reshape(-1, kb_full), b_lo, b_hi,
        interpret=interpret,
    )
    return codes.reshape(lead + (k,)), sx.reshape(lead + (1,))


def _w8a8_ep_dot(x_ref, q, acc_ref, int8_mxu):
    if int8_mxu:
        acc_ref[...] += jax.lax.dot_general(
            x_ref[...], q,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    else:
        acc_ref[...] += jax.lax.dot_general(
            x_ref[...].astype(jnp.bfloat16), q.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(acc_ref.dtype)


def _kernel_w8a8_ep(
    x_ref, q_ref, sx_ref, cs_ref, b_ref, o_ref, acc_ref,
    *, n_k: int, out_dtype, int8_mxu: bool, stacked: bool,
):
    """W8A8 matmul with the bias in the epilogue:
    o = acc*sx*cs + b (cs/b are (1, tn) f32; callers fold gates in)."""
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    _w8a8_ep_dot(x_ref, q_ref[0] if stacked else q_ref[...], acc_ref,
                 int8_mxu)

    @pl.when(kk == n_k - 1)
    def _():
        o_ref[...] = (
            acc_ref[...].astype(jnp.float32) * sx_ref[...] * cs_ref[...]
            + b_ref[...]
        ).astype(out_dtype)


def _kernel_w8a8_ep_res(
    x_ref, q_ref, sx_ref, cs_ref, b_ref, r_ref, o_ref, acc_ref,
    *, n_k: int, out_dtype, int8_mxu: bool, stacked: bool,
):
    """W8A8 matmul with gated-residual epilogue:
    o = r + acc*sx*cs_eff + b_eff  where the caller pre-folds
    cs_eff = col_scales*gate and b_eff = gate*bias (both (1, N) XLA
    elementwise — free). The separate gate-multiply + residual-add fusion
    (a full read+write of the output) disappears."""
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    _w8a8_ep_dot(x_ref, q_ref[0] if stacked else q_ref[...], acc_ref,
                 int8_mxu)

    @pl.when(kk == n_k - 1)
    def _():
        o_ref[...] = (
            r_ref[...].astype(jnp.float32)
            + acc_ref[...].astype(jnp.float32) * sx_ref[...] * cs_ref[...]
            + b_ref[...]
        ).astype(out_dtype)


def _w8a8_matmul_ep_2d(
    xq,
    sx,
    qt,
    cs_eff,
    b_eff,
    residual=None,
    out_dtype=jnp.bfloat16,
    interpret=False,
    tile_m=None,
    tile_k=None,
    tile_n=None,
    int8_mxu=True,
):
    """Prequantized W8A8 matmul with fused epilogue. xq int8 (M, K) +
    sx f32 (M, 1) come from row_quantize_fused; qt is int8 (K, N) or a
    stacked 3-tuple (qt3 (D, K, N), idx) for the scan forward (cs_eff and
    b_eff are always the XLA-prefolded (1, N) vectors — for stacked
    weights the (1, N) dynamic-index slice is ~12 KB, trivially cheap
    outside the kernel)."""
    stacked = isinstance(qt, tuple)
    if stacked:
        qt3, idx = qt
        d, k2, n = qt3.shape
    else:
        k2, n = qt.shape
    m, k = xq.shape
    assert k == k2, (xq.shape, k2)
    assert cs_eff.shape == (1, n) and b_eff.shape == (1, n)

    tile_m, tile_k, tile_n = _w8a8_tile_hint(k, n, tile_m, tile_k, tile_n)
    pad = (-m) % 32
    if pad:
        xq = jnp.pad(xq, ((0, pad), (0, 0)))
        sx = jnp.pad(sx, ((0, pad), (0, 0)))
        if residual is not None:
            residual = jnp.pad(residual, ((0, pad), (0, 0)))
    mp = m + pad
    tm = _pick_tile(mp, tile_m or 2176, 32)
    tk = _pick_tile(k, tile_k or 512, 128)
    n_k = k // tk
    ob = jnp.dtype(out_dtype).itemsize
    # the residual block rides the same double-buffered (tm, tn) budget as
    # the output; account for it so Mosaic never over-allocates scoped vmem
    rb = 2 * ob if residual is not None else 0
    tn = (
        _pick_tile(n, tile_n, 128)
        if tile_n is not None
        else _pick_tn_w8a8(n, 1024, tm, tk, ob + rb)
    )

    kernel = _kernel_w8a8_ep_res if residual is not None else _kernel_w8a8_ep
    vec_spec = pl.BlockSpec(
        (1, tn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec((tm, tk), lambda i, j, kk: (i, kk),
                     memory_space=pltpu.VMEM),
        (
            pl.BlockSpec((1, tk, tn), lambda i, j, kk, blk: (blk[0], kk, j))
            if stacked
            else pl.BlockSpec((tk, tn), lambda i, j, kk: (kk, j),
                              memory_space=pltpu.VMEM)
        ),
        pl.BlockSpec((tm, 1), lambda i, j, kk: (i, 0),
                     memory_space=pltpu.VMEM),
        vec_spec,
        vec_spec,
    ]
    operands = [xq, qt3 if stacked else qt, sx, cs_eff, b_eff]
    if residual is not None:
        in_specs.append(
            pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j),
                         memory_space=pltpu.VMEM)
        )
        operands.append(residual)
    out_spec = pl.BlockSpec(
        (tm, tn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM
    )
    scratch = [pltpu.VMEM((tm, tn), jnp.int32 if int8_mxu else jnp.float32)]
    kern = functools.partial(
        kernel, n_k=n_k, out_dtype=out_dtype, int8_mxu=int8_mxu,
        stacked=stacked,
    )
    cost = pl.CostEstimate(
        flops=2 * mp * k * n,
        bytes_accessed=mp * k + k * n + n * 8 + mp * 4
        + mp * n * ob * (2 if residual is not None else 1),
        transcendentals=0,
    )
    cparams = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"),
    )
    if stacked:
        # scalar-prefetch grid: blockspecs gain the prefetch arg; rebuild
        # the non-weight specs with a 4-arg index_map
        def im_x(i, j, kk, blk):
            return (i, kk)

        def im_sx(i, j, kk, blk):
            return (i, 0)

        def im_vec(i, j, kk, blk):
            return (0, j)

        def im_out(i, j, kk, blk):
            return (i, j)

        in_specs = [
            pl.BlockSpec((tm, tk), im_x),
            pl.BlockSpec((1, tk, tn), lambda i, j, kk, blk: (blk[0], kk, j)),
            pl.BlockSpec((tm, 1), im_sx),
            pl.BlockSpec((1, tn), im_vec),
            pl.BlockSpec((1, tn), im_vec),
        ]
        if residual is not None:
            in_specs.append(pl.BlockSpec((tm, tn), im_out))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(mp // tm, n // tn, n_k),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((tm, tn), im_out),
            scratch_shapes=scratch,
        )

        def kern_stacked(idx_ref, *refs, _kern=kern):
            del idx_ref
            _kern(*refs)

        out = pl.pallas_call(
            kern_stacked,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
            compiler_params=cparams,
            cost_estimate=cost,
            interpret=interpret,
        )(jnp.asarray(idx, jnp.int32).reshape(1), *operands)
    else:
        out = pl.pallas_call(
            kern,
            grid=(mp // tm, n // tn, n_k),
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
            scratch_shapes=scratch,
            compiler_params=cparams,
            cost_estimate=cost,
            interpret=interpret,
        )(*operands)
    return out[:m] if mp != m else out


@functools.lru_cache(maxsize=1)
def _jitted_w8a8_matmul_ep_2d():
    from lightdiffusion_next_tpu import config as _config

    return _config.ldt_jit(
        _w8a8_matmul_ep_2d,
        static_argnames=("out_dtype", "interpret", "tile_m", "tile_k",
                         "tile_n", "int8_mxu"),
    )


def w8a8_matmul_ep(
    xq, sx, qt, cs_eff, b_eff, residual=None, out_dtype=jnp.bfloat16,
    interpret=None, int8_mxu=True,
):
    """Batched wrapper: prequantized xq (..., K) -> (..., N) with the
    bias/gate/residual epilogue in-kernel. ``qt`` may be (qt3, idx) for
    the scan-over-blocks forward. See _w8a8_matmul_ep_2d."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    lead = xq.shape[:-1]
    k = xq.shape[-1]
    n = cs_eff.shape[-1]
    entry = _w8a8_matmul_ep_2d if _tracing() else _jitted_w8a8_matmul_ep_2d()
    y = entry(
        xq.reshape(-1, k), sx.reshape(-1, 1), qt,
        cs_eff.reshape(1, n), b_eff.reshape(1, n),
        residual.reshape(-1, n) if residual is not None else None,
        out_dtype=out_dtype, interpret=interpret, int8_mxu=int8_mxu,
    )
    return y.reshape(lead + (n,))
