"""Native GGUF reader + quantized tensors (no `gguf` dependency).

Counterpart of src/Quantize/Quantizer.py: gguf_sd_loader (:581-663, mmap'd
tensor table), Q8_0 block dequant (:94-112, x = d * q per 32-elem block),
GGMLTensor/GGMLOps (dequantize inside forward, :260-455) and the T5
llama.cpp->HF key remap (:815-856).

TPU design: a quantized weight is a ``QTensor8`` pytree leaf-pair (int8
codes + per-block scales) that lives in HBM at 1 byte/weight; dequant
happens per-layer inside the jitted forward (ops.nn.linear unwraps it), so
the 12B-param Flux fits a 16 GB v5e chip. A fused Pallas int8 x bf16 matmul
is the planned fast path (ops.quant_matmul).
"""

from __future__ import annotations

import dataclasses
import functools
import mmap
import struct
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

GGUF_MAGIC = 0x46554747

# ggml tensor types
GGML_F32 = 0
GGML_F16 = 1
GGML_Q8_0 = 8
GGML_BF16 = 30

_SCALAR_FMT = {
    0: ("B", 1), 1: ("b", 1), 2: ("H", 2), 3: ("h", 2), 4: ("I", 4),
    5: ("i", 4), 6: ("f", 4), 7: ("?", 1), 10: ("Q", 8), 11: ("q", 8),
    12: ("d", 8),
}


class _Reader:
    def __init__(self, buf):
        self.buf = buf
        self.pos = 0

    def read(self, fmt: str):
        size = struct.calcsize(fmt)
        vals = struct.unpack_from("<" + fmt, self.buf, self.pos)
        self.pos += size
        return vals if len(vals) > 1 else vals[0]

    def read_string(self) -> str:
        n = self.read("Q")
        s = bytes(self.buf[self.pos : self.pos + n]).decode("utf-8")
        self.pos += n
        return s

    def read_value(self, vtype: int):
        if vtype == 8:
            return self.read_string()
        if vtype == 9:
            atype = self.read("I")
            count = self.read("Q")
            return [self.read_value(atype) for _ in range(count)]
        fmt, _ = _SCALAR_FMT[vtype]
        return self.read(fmt)


@dataclasses.dataclass
class GGUFTensorInfo:
    name: str
    shape: Tuple[int, ...]  # numpy order (reversed ggml dims)
    ggml_type: int
    offset: int


def parse_gguf(path: str):
    """Parse header: returns (metadata dict, [GGUFTensorInfo], data_start,
    mmap buffer)."""
    with open(path, "rb") as f:
        # the mmap holds its own reference to the mapping; keeping the file
        # object open leaked one fd per checkpoint load for the process
        # lifetime (long-running servers reload many GGUFs)
        buf = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
    r = _Reader(buf)
    magic = r.read("I")
    if magic != GGUF_MAGIC:
        raise ValueError(f"{path}: not a GGUF file")
    version = r.read("I")
    if version < 2:
        raise ValueError(f"GGUF version {version} unsupported")
    tensor_count = r.read("Q")
    kv_count = r.read("Q")
    metadata: Dict[str, Any] = {}
    for _ in range(kv_count):
        key = r.read_string()
        vtype = r.read("I")
        metadata[key] = r.read_value(vtype)
    infos = []
    for _ in range(tensor_count):
        name = r.read_string()
        n_dims = r.read("I")
        dims = [r.read("Q") for _ in range(n_dims)]
        ggml_type = r.read("I")
        offset = r.read("Q")
        infos.append(
            GGUFTensorInfo(name, tuple(reversed(dims)), ggml_type, offset)
        )
    alignment = metadata.get("general.alignment", 32)
    data_start = (r.pos + alignment - 1) // alignment * alignment
    return metadata, infos, data_start, buf


# ---------------------------------------------------------------------------
# Quantized tensor pytree
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QTensor8:
    """Q8_0 weight: int8 codes (…, n_blocks, 32) + f32 scales (…, n_blocks).

    Logical value = q * scale per 32-element block along the LAST (input)
    axis (dequantize_blocks_Q8_0 parity, Quantizer.py:94-112)."""

    q: Any  # int8 (rows, n_blocks, 32)
    scales: Any  # f32 (rows, n_blocks)
    shape: Tuple[int, ...]  # logical (out, in)

    @property
    def ndim(self) -> int:
        return len(self.shape)

    def dequantize(self, dtype=jnp.bfloat16):
        w = self.q.astype(jnp.float32) * self.scales[..., None]
        return w.reshape(self.shape).astype(dtype)

    def astype(self, dtype):  # dtype of the DEQUANTIZED output
        return self

    def tree_flatten(self):
        return (self.q, self.scales), self.shape

    @classmethod
    def tree_unflatten(cls, aux, children):
        q, scales = children
        return cls(q, scales, aux)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QTensor8T:
    """Q8_0 weight in the fused-matmul device layout: codes TRANSPOSED to
    (K, N) int8 with scales (K/32, N) f32, so ops.quant_matmul can stream
    them straight into VMEM (sublane-axis scale broadcast + MXU contraction
    over K). Logical value identical to QTensor8 with ``shape`` (N, K).
    """

    qt: Any  # int8 (K, N)
    scales_t: Any  # f32 (K // 32, N)
    shape: Tuple[int, ...]  # logical torch-layout (out=N, in=K)
    # True when this weight participates in a multi-device (tensor-parallel)
    # computation: the single-device Pallas kernel is bypassed for the
    # dequant+dot path, which XLA SPMD partitions along the Megatron param
    # shardings. Set explicitly by parallel.sharding.shard_params — never
    # inferred from tracers (shardings are invisible inside jit).
    tp: bool = False

    @property
    def ndim(self) -> int:
        return len(self.shape)

    def dequantize(self, dtype=jnp.bfloat16):
        k, n = self.qt.shape
        w_t = self.qt.astype(jnp.float32).reshape(
            k // 32, 32, n
        ) * self.scales_t[:, None, :]
        return w_t.reshape(k, n).T.astype(dtype)

    def fused_matmul(self, x, out_dtype=None):
        """x (..., K) -> (..., N) through the fused Pallas kernel, falling
        back to dequant+dot for shapes the kernel doesn't tile."""
        from lightdiffusion_next_tpu.ops import quant_matmul as qm

        k, n = self.qt.shape
        m = 1
        for d in x.shape[:-1]:
            m *= d
        if not self.tp and qm.supported(m, k, n):
            self._check_not_silently_sharded()
            return qm.quant_matmul(x, self.qt, self.scales_t, out_dtype)
        w = self.dequantize(x.dtype)
        return jax.lax.dot_general(
            x,
            w,
            dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=x.dtype,
        )

    def _check_not_silently_sharded(self) -> None:
        """See module-level _check_not_silently_sharded."""
        _check_not_silently_sharded(self.qt, "QTensor8T")

    def astype(self, dtype):  # dtype of the DEQUANTIZED output
        return self

    def tree_flatten(self):
        return (self.qt, self.scales_t), (self.shape, self.tp)

    @classmethod
    def tree_unflatten(cls, aux, children):
        qt, scales_t = children
        shape, tp = aux
        return cls(qt, scales_t, shape, tp)


def _modulated_matmul_impl(
    weight, col_scales, tp, x, *, prologue="none", mod_scale=None,
    mod_shift=None, gate=None, bias=None, residual=None, out_dtype=None,
    prequant=None,
):
    """Shared body of QTensor8W/_StackedSlice8W.modulated_matmul: the
    fused-elementwise W8A8 path (ops.quant_matmul row_quantize_fused +
    w8a8_matmul_ep). ``weight`` is qt (K, N) or (qt3, idx) for the scan
    forward; ``col_scales`` the matching (1, N) f32. Returns the result,
    or None when this call can't take the fused path — unsupported shape,
    tensor-parallel leaf, or batched modulation/gate vectors (they are
    per-batch; the kernels fold them as (1, K)/(1, N)) — and the caller
    falls back to the unfused ops. See models/flux.py call sites."""
    from lightdiffusion_next_tpu.ops import quant_matmul as qm

    if tp:
        return None
    if isinstance(weight, tuple):
        _, k, n = weight[0].shape
    else:
        k, n = weight.shape
    ref = x if prequant is None else prequant[0]
    m = 1
    for d in ref.shape[:-1]:
        m *= d
    if not (qm.supported_w8a8(m, k, n) and qm.supported_rowquant(k)):
        return None

    def _vec(v, size):
        """(…, size) -> (1, size) f32, or None if batched/mismatched."""
        if v is None:
            return None
        lead = 1
        for d in v.shape[:-1]:
            lead *= d
        if lead != 1 or v.shape[-1] != size:
            return None
        return v.astype(jnp.float32).reshape(1, size)

    if prologue == "ln_mod":
        mod_scale = _vec(mod_scale, k)
        mod_shift = _vec(mod_shift, k)
        if mod_scale is None or mod_shift is None:
            return None
    gate_v = _vec(gate, n)
    if gate is not None and gate_v is None:
        return None
    bias_v = _vec(bias, n)
    if bias is not None and bias_v is None:
        return None

    if prequant is None:
        codes, sx = qm.row_quantize_fused(
            x, mod_scale, mod_shift, prologue=prologue
        )
    else:
        codes, sx = prequant
        if codes.shape[-1] != k:
            return None
    cs_eff = col_scales.reshape(1, n)
    b_eff = bias_v if bias_v is not None else jnp.zeros((1, n), jnp.float32)
    if gate_v is not None:
        cs_eff = cs_eff * gate_v
        b_eff = b_eff * gate_v
    out_dtype = out_dtype or (residual.dtype if residual is not None
                              else ref.dtype)
    if out_dtype == jnp.int8:  # prequant codes as the dtype ref
        out_dtype = jnp.bfloat16
    return qm.w8a8_matmul_ep(
        codes, sx, weight, cs_eff, b_eff, residual=residual,
        out_dtype=out_dtype,
    )


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QTensor8W:
    """Per-output-column int8 weight for the W8A8 MXU path (opt-in,
    config ``w8a8`` / CLI ``--w8a8``).

    Derived from a Q8_0 QTensor8T at load by ``to_w8a8``: the per-32-block
    scales are collapsed into one f32 scale per output column (the standard
    W8A8 per-channel weight quantization) so the s8 x s8 -> s32 MXU
    contraction can post-scale outside the K-sum. Costs one extra weight
    rounding step vs Q8_0 (block-scale granularity is lost); buys the int8
    MXU rate (2x bf16 peak on v5e), kills the in-kernel dequant pass, and
    shrinks scale storage (K/32*N f32 -> N f32 — ~1.4 GB on 12B Flux).
    The reference has no analogue (its GGML path always dequantizes to
    fp16 compute, src/Quantize/Quantizer.py:260-332); activations are
    row-quantized per call in ops.quant_matmul.quantize_rows."""

    qt: Any  # int8 (K, N) — per-column requantized codes
    col_scales: Any  # f32 (1, N)
    shape: Tuple[int, ...]  # logical torch-layout (out=N, in=K)
    tp: bool = False

    @property
    def ndim(self) -> int:
        return len(self.shape)

    def dequantize(self, dtype=jnp.bfloat16):
        w_t = self.qt.astype(jnp.float32) * self.col_scales
        return w_t.T.astype(dtype)

    def fused_matmul(self, x, out_dtype=None):
        from lightdiffusion_next_tpu.ops import quant_matmul as qm

        k, n = self.qt.shape
        m = 1
        for d in x.shape[:-1]:
            m *= d
        if not self.tp and qm.supported_w8a8(m, k, n):
            _check_not_silently_sharded(self.qt, "QTensor8W")
            return qm.w8a8_matmul(x, self.qt, self.col_scales, out_dtype)
        w = self.dequantize(x.dtype)
        return jax.lax.dot_general(
            x,
            w,
            dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=x.dtype,
        )

    def modulated_matmul(self, x, **kw):
        """Fused-elementwise W8A8 matmul (norm/modulation/gelu prologue +
        gate/bias/residual epilogue in-kernel); None -> caller falls back.
        See _modulated_matmul_impl."""
        if not self.tp:
            _check_not_silently_sharded(self.qt, "QTensor8W")
        return _modulated_matmul_impl(
            self.qt, self.col_scales, self.tp, x, **kw
        )

    def astype(self, dtype):  # dtype of the DEQUANTIZED output
        return self

    def tree_flatten(self):
        return (self.qt, self.col_scales), (self.shape, self.tp)

    @classmethod
    def tree_unflatten(cls, aux, children):
        qt, col_scales = children
        shape, tp = aux
        return cls(qt, col_scales, shape, tp)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class StackedQTensor8T:
    """D same-shaped QTensor8T weights stacked along a leading depth axis
    for the Flux scan-over-blocks mode (models.flux stack_block_params).

    The stacked codes stay resident in HBM; ``at_index(idx)`` (idx a traced
    scan counter) returns a per-iteration view whose fused_matmul streams
    tiles of block ``idx`` straight out of the stack via Pallas scalar
    prefetch (ops.quant_matmul.quant_matmul_stacked) — no (K, N) slice is
    ever materialized.

    ``tp`` mirrors QTensor8T.tp: True for GLOBALLY SHARDED stacks (built by
    parallel.spmd.stack_tp_block_params over a mesh — the slice view then
    bypasses the single-device kernel for GSPMD-partitionable dequant+dot);
    the shard_map local view rewraps with tp=False so the fused kernel runs
    per shard. models.flux.stack_block_params (single-device) always
    produces tp=False."""

    qt3: Any  # int8 (D, K, N)
    scales3: Any  # f32 (D, K/32, N)
    shape: Tuple[int, ...]  # per-block logical torch-layout (out=N, in=K)
    tp: bool = False

    @property
    def depth(self) -> int:
        return self.qt3.shape[0]

    def at_index(self, idx):
        return _StackedSlice8T(self, idx)

    def tree_flatten(self):
        return (self.qt3, self.scales3), (self.shape, self.tp)

    @classmethod
    def tree_unflatten(cls, aux, children):
        qt3, scales3 = children
        shape, tp = aux
        return cls(qt3, scales3, shape, tp)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class StackedQTensor8W:
    """Stacked per-column int8 (W8A8) weights — the scan-mode counterpart
    of QTensor8W (see StackedQTensor8T, incl. the ``tp`` semantics)."""

    qt3: Any  # int8 (D, K, N)
    col_scales3: Any  # f32 (D, 1, N)
    shape: Tuple[int, ...]  # per-block logical (out=N, in=K)
    tp: bool = False

    @property
    def depth(self) -> int:
        return self.qt3.shape[0]

    def at_index(self, idx):
        return _StackedSlice8W(self, idx)

    def tree_flatten(self):
        return (self.qt3, self.col_scales3), (self.shape, self.tp)

    @classmethod
    def tree_unflatten(cls, aux, children):
        qt3, col_scales3 = children
        shape, tp = aux
        return cls(qt3, col_scales3, shape, tp)


class _StackedSlice8T:
    """Per-scan-iteration view of one block of a StackedQTensor8T; quacks
    like QTensor8T for ops.nn.linear (fused_matmul / dequantize / shape).
    NOT a pytree — created inside the scan body from closure constants."""

    __slots__ = ("stack", "idx")

    def __init__(self, stack: StackedQTensor8T, idx):
        self.stack = stack
        self.idx = idx

    @property
    def shape(self) -> Tuple[int, ...]:
        return self.stack.shape

    @property
    def ndim(self) -> int:
        return len(self.stack.shape)

    def astype(self, dtype):  # dtype of the DEQUANTIZED output
        return self

    def _sliced(self):
        qt = jax.lax.dynamic_index_in_dim(
            self.stack.qt3, self.idx, 0, keepdims=False
        )
        scales = jax.lax.dynamic_index_in_dim(
            self.stack.scales3, self.idx, 0, keepdims=False
        )
        return qt, scales

    def dequantize(self, dtype=jnp.bfloat16):
        qt, scales = self._sliced()
        k, n = qt.shape
        w_t = qt.astype(jnp.float32).reshape(k // 32, 32, n) * scales[:, None, :]
        return w_t.reshape(k, n).T.astype(dtype)

    def fused_matmul(self, x, out_dtype=None):
        from lightdiffusion_next_tpu.ops import quant_matmul as qm

        d, k, n = self.stack.qt3.shape
        m = 1
        for s in x.shape[:-1]:
            m *= s
        if not self.stack.tp and qm.supported(m, k, n):
            _check_not_silently_sharded(self.stack.qt3, "StackedQTensor8T")
            return qm.quant_matmul_stacked(
                x, self.stack.qt3, self.stack.scales3, self.idx, out_dtype
            )
        w = self.dequantize(x.dtype)
        return jax.lax.dot_general(
            x,
            w,
            dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=x.dtype,
        )


class _StackedSlice8W:
    """W8A8 counterpart of _StackedSlice8T."""

    __slots__ = ("stack", "idx")

    def __init__(self, stack: StackedQTensor8W, idx):
        self.stack = stack
        self.idx = idx

    @property
    def shape(self) -> Tuple[int, ...]:
        return self.stack.shape

    @property
    def ndim(self) -> int:
        return len(self.stack.shape)

    def astype(self, dtype):  # dtype of the DEQUANTIZED output
        return self

    def dequantize(self, dtype=jnp.bfloat16):
        qt = jax.lax.dynamic_index_in_dim(
            self.stack.qt3, self.idx, 0, keepdims=False
        )
        cs = jax.lax.dynamic_index_in_dim(
            self.stack.col_scales3, self.idx, 0, keepdims=False
        )
        return (qt.astype(jnp.float32) * cs).T.astype(dtype)

    def fused_matmul(self, x, out_dtype=None):
        from lightdiffusion_next_tpu.ops import quant_matmul as qm

        d, k, n = self.stack.qt3.shape
        m = 1
        for s in x.shape[:-1]:
            m *= s
        if not self.stack.tp and qm.supported_w8a8(m, k, n):
            _check_not_silently_sharded(self.stack.qt3, "StackedQTensor8W")
            return qm.w8a8_matmul_stacked(
                x, self.stack.qt3, self.stack.col_scales3, self.idx, out_dtype
            )
        w = self.dequantize(x.dtype)
        return jax.lax.dot_general(
            x,
            w,
            dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=x.dtype,
        )

    def modulated_matmul(self, x, **kw):
        """Scan-mode fused-elementwise W8A8 matmul: the weight stack rides
        scalar prefetch ((qt3, idx) to w8a8_matmul_ep); the (1, N)
        col-scale slice for the epilogue fold is a ~12 KB dynamic-index —
        trivially cheap in XLA. None -> caller falls back."""
        if not self.stack.tp:
            _check_not_silently_sharded(self.stack.qt3, "StackedQTensor8W")
        cs = jax.lax.dynamic_index_in_dim(
            self.stack.col_scales3, self.idx, 0, keepdims=False
        )
        return _modulated_matmul_impl(
            (self.stack.qt3, self.idx), cs, self.stack.tp, x, **kw
        )


def check_stackable(leaves, allow_tp: bool = False) -> None:
    """Raise ValueError unless ``leaves`` is a uniform, stackable family
    (see stack_leaves). Split out so stackers can validate EVERY family
    before consuming the source dict — a mid-stack failure after partial
    consumption would strand the caller with neither layout."""
    first = leaves[0]
    if isinstance(first, QTensorLoRA):
        raise ValueError("LoRA-patched weights cannot be stacked for scan mode")
    if isinstance(first, (QTensor8T, QTensor8W)):
        kind = type(first)
        if any(not isinstance(l, kind) or l.shape != first.shape
               or (l.tp and not allow_tp) for l in leaves):
            raise ValueError(
                f"non-uniform or tp-sharded {kind.__name__} group"
            )
        return
    if is_quantized(first):
        raise ValueError(
            f"cannot stack {type(first).__name__} leaves (fused layout only)"
        )
    shape = np.shape(first)
    dtype = getattr(first, "dtype", None)
    if any(
        np.shape(l) != shape or getattr(l, "dtype", None) != dtype
        for l in leaves
    ):
        raise ValueError("non-uniform dense leaf group")


def stack_leaves(leaves):
    """Stack D per-block leaves (one key across every block) into the scan
    -mode stacked form: QTensor8T -> StackedQTensor8T, QTensor8W ->
    StackedQTensor8W, dense arrays -> a (D, ...) array. All leaves must be
    the same kind and per-block shape; QTensorLoRA (compute-time LoRA) and
    tp-flagged leaves refuse to stack — callers fall back to the unrolled
    forward for those models."""
    check_stackable(leaves)
    first = leaves[0]
    if isinstance(first, QTensor8T):
        return StackedQTensor8T(
            qt3=jnp.stack([l.qt for l in leaves]),
            scales3=jnp.stack([l.scales_t for l in leaves]),
            shape=first.shape,
        )
    if isinstance(first, QTensor8W):
        return StackedQTensor8W(
            qt3=jnp.stack([l.qt for l in leaves]),
            col_scales3=jnp.stack([l.col_scales for l in leaves]),
            shape=first.shape,
        )
    return jnp.stack([jnp.asarray(l) for l in leaves])


def _check_not_silently_sharded(arr, kind: str) -> None:
    """Backstop for the explicit ``tp`` flag: a CONCRETE multi-device
    array reaching a single-device kernel path is a wiring bug (the
    caller sharded the weight without marking it tp) — fail loudly
    instead of letting GSPMD replicate 12 GB of codes per chip. Tracers
    carry no shardings, so inside jit this is a no-op and the flag is
    the only authority."""
    sharding = getattr(arr, "sharding", None)
    if sharding is None:
        return
    try:
        multi = len(sharding.device_set) > 1
    except Exception:
        return
    if multi:
        raise ValueError(
            f"{kind} spans multiple devices but tp=False; shard it "
            "through parallel.sharding.shard_params (which sets tp=True)"
        )


@functools.lru_cache(maxsize=2)
def _jitted_requant_col(donate: bool):
    def requant(qt, scales_t):
        k, n = qt.shape
        w = qt.astype(jnp.float32).reshape(k // 32, 32, n) * scales_t[:, None, :]
        w = w.reshape(k, n)
        cs = jnp.maximum(
            jnp.max(jnp.abs(w), axis=0, keepdims=True), 1e-12
        ) * (1.0 / 127.0)
        codes = jnp.clip(jnp.round(w / cs), -127.0, 127.0).astype(jnp.int8)
        return codes, cs

    # Donating qt lets XLA write the new codes into the OLD (K, N) int8
    # buffer (same shape/dtype): without it, a 12B Flux conversion holds
    # BOTH int8 generations (~24 GB) and OOMs a 16 GB v5e mid-load. CPU
    # ignores donation (and warns), so only donate on TPU.
    return jax.jit(requant, donate_argnums=(0,) if donate else ())


@functools.lru_cache(maxsize=2)
def _jitted_requant_col_stacked(donate: bool):
    """Per-block (leading depth axis) W8A8 requant for stacked scan-mode
    weights: (D, K, N) codes + (D, K/32, N) scales -> (D, K, N) int8 +
    (D, 1, N) col scales. The column max is taken WITHIN each block —
    identical codes to requantizing the D blocks one by one."""

    def requant3(qt3, scales3):
        d, k, n = qt3.shape

        def one(args):
            qt, st = args
            w = qt.astype(jnp.float32).reshape(k // 32, 32, n) * st[:, None, :]
            w = w.reshape(k, n)
            cs = jnp.maximum(
                jnp.max(jnp.abs(w), axis=0, keepdims=True), 1e-12
            ) * (1.0 / 127.0)
            codes = jnp.clip(jnp.round(w / cs), -127.0, 127.0).astype(jnp.int8)
            return codes, cs

        # lax.map (not vmap): the f32 dequant temp stays ONE block (~150 MB
        # at Flux shapes), not D blocks (~5.7 GB — would OOM a 16 GB chip
        # that already holds the 12 GB stacked codes).
        return jax.lax.map(one, (qt3, scales3))

    return jax.jit(requant3, donate_argnums=(0,) if donate else ())


def to_w8a8(params: Dict[str, Any]) -> Dict[str, Any]:
    """Map every fused-layout QTensor8T leaf of a flat param dict to its
    per-column QTensor8W form (one jitted device pass per unique shape —
    a few seconds one-time at load on 12B). QTensorLoRA bases convert in
    place; embeddings (row-major QTensor8) and dense leaves pass through.

    The input dict's QTensor8T code buffers are DONATED on TPU (consumed
    in place, leaf by leaf — peak extra HBM is one leaf's f32 dequant
    temp, not a second 12 GB code generation); callers must treat the
    input dict as dead after this returns. tp=True leaves pass through
    unconverted: the sharded path never takes the int8 kernel, so
    conversion would cost per-column rounding for zero compute gain.

    Scan-over-blocks dicts convert too: StackedQTensor8T leaves (nested
    under the ``__double_stack__``/``__single_stack__`` sub-dicts) requant
    per block via a vmapped pass -> StackedQTensor8W, so the spmd x scan
    flow (parallel.spmd.to_spmd_model(scan_blocks=True) then to_w8a8 on
    the local view) keeps the stacked layout."""
    from lightdiffusion_next_tpu import config as _config

    requant = _jitted_requant_col(_config.is_tpu())
    requant3 = _jitted_requant_col_stacked(_config.is_tpu())

    def convert(v):
        if isinstance(v, dict):
            return {k: convert(x) for k, x in v.items()}
        if isinstance(v, QTensorLoRA):
            return QTensorLoRA(base=convert(v.base), up=v.up, down=v.down)
        if isinstance(v, QTensor8T) and not v.tp:
            codes, cs = requant(v.qt, v.scales_t)
            return QTensor8W(qt=codes, col_scales=cs, shape=v.shape, tp=v.tp)
        if isinstance(v, StackedQTensor8T) and not v.tp:
            codes, cs = requant3(v.qt3, v.scales3)
            return StackedQTensor8W(
                qt3=codes, col_scales3=cs, shape=v.shape, tp=v.tp
            )
        return v

    return {k: convert(v) for k, v in params.items()}


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QTensorLoRA:
    """Quantized weight + UNMERGED low-rank patch, applied at compute time.

    The reference GGUFModelPatcher applies LoRA on the dequantized value
    inside each forward (Quantizer.py:260-292) so weights stay 1.06 B/param
    in memory. Merging would densify to bf16 (2 B/param) and break the
    13-GB-in-16-GB single-chip Flux budget; instead ops.nn.linear computes
    ``y = base_matmul(x) + (x @ down^T) @ up^T`` — the base keeps its fused
    int8 kernel path and the low-rank correction is two skinny matmuls.
    ``up`` is pre-scaled by strength * alpha/rank at construction.
    """

    base: Any  # QTensor8T (fused layout)
    up: Any  # f32 (out, rank)
    down: Any  # f32 (rank, in)

    @property
    def shape(self) -> Tuple[int, ...]:
        return self.base.shape

    @property
    def ndim(self) -> int:
        return len(self.base.shape)

    def fused_matmul(self, x, out_dtype=None):
        y = self.base.fused_matmul(x, out_dtype)
        h = jax.lax.dot_general(
            x,
            self.down.astype(x.dtype),
            dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=x.dtype,
        )
        corr = jax.lax.dot_general(
            h,
            self.up.astype(x.dtype),
            dimension_numbers=(((h.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=x.dtype,
        )
        return y + corr.astype(y.dtype)

    def dequantize(self, dtype=jnp.bfloat16):
        w = self.base.dequantize(jnp.float32)
        return (w + self.up @ self.down).astype(dtype)

    def astype(self, dtype):  # dtype of the DEQUANTIZED output
        return self

    def tree_flatten(self):
        return (self.base, self.up, self.down), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def transpose_for_matmul(t: QTensor8, sharding=None, device: bool = True) -> QTensor8T:
    """QTensor8 (host or device) -> fused-layout QTensor8T. Only valid for
    2-D (out, in) weights. ``sharding`` is an optional QTensor8T-of-shardings
    record (parallel.sharding._quantized_sharding): the transposed codes are
    uploaded straight to their shards (host -> sharded, never materializing
    the full weight on one device) and the tp flag is stamped from it.

    ``device=False`` keeps the transposed codes/scales as host numpy
    arrays (a numpy-backed QTensor8T) for load paths that finish their
    param prep on the host — e.g. the scan-over-blocks path, which
    host-stacks block families and uploads only the ~30 big stacked
    buffers (models.flux.stack_block_params_host)."""
    from lightdiffusion_next_tpu.utils import native as _native

    assert len(t.shape) == 2, t.shape
    n, k = t.shape
    # threaded blocked transpose (native/ldt_native.cpp): ~12 GB of int8
    # codes per Flux checkpoint go through here at load
    q = _native.transpose2d(np.asarray(t.q).reshape(n, k))  # (K, N) int8
    scales = _native.transpose2d(
        np.asarray(t.scales, dtype=np.float32)
    )  # (K/32, N) f32
    if not device:
        assert sharding is None, "host-side prep is single-device"
        return QTensor8T(qt=q, scales_t=scales, shape=t.shape)
    if sharding is not None:
        return QTensor8T(
            qt=jax.device_put(q, sharding.qt),
            scales_t=jax.device_put(scales, sharding.scales_t),
            shape=t.shape,
            tp=sharding.tp,
        )
    return QTensor8T(
        qt=jnp.asarray(q),
        scales_t=jnp.asarray(scales, dtype=jnp.float32),
        shape=t.shape,
    )


def is_quantized(x) -> bool:
    return isinstance(x, (QTensor8, QTensor8T, QTensor8W))


def _load_tensor(info: GGUFTensorInfo, buf, data_start: int, lazy_np=True):
    n_elems = int(np.prod(info.shape))
    off = data_start + info.offset
    if info.ggml_type == GGML_F32:
        arr = np.frombuffer(buf, dtype=np.float32, count=n_elems, offset=off)
        return arr.reshape(info.shape)
    if info.ggml_type == GGML_F16:
        arr = np.frombuffer(buf, dtype=np.float16, count=n_elems, offset=off)
        return arr.reshape(info.shape).astype(np.float32)
    if info.ggml_type == GGML_BF16:
        raw = np.frombuffer(buf, dtype=np.uint16, count=n_elems, offset=off)
        return (raw.astype(np.uint32) << 16).view(np.float32).reshape(info.shape)
    if info.ggml_type == GGML_Q8_0:
        from lightdiffusion_next_tpu.utils import native

        n_blocks = n_elems // 32
        raw = np.frombuffer(buf, dtype=np.uint8, count=n_blocks * 34, offset=off)
        raw = raw.reshape(n_blocks, 34)
        q, scales = native.split_q8_0(raw)
        rows = info.shape[:-1]
        per_row = info.shape[-1] // 32
        return QTensor8(
            q=q.reshape(rows + (per_row, 32)),
            scales=scales.reshape(rows + (per_row,)),
            shape=info.shape,
        )
    raise NotImplementedError(
        f"GGML type {info.ggml_type} for {info.name} not supported"
    )


KNOWN_ARCHS = {"flux", "sd1", "sdxl", "t5", "t5encoder"}


def gguf_sd_loader(path: str, keep_quantized: bool = True) -> Dict[str, Any]:
    """GGUF -> flat state dict of np arrays / QTensor8 (gguf_sd_loader
    parity, Quantizer.py:581-663). Strips a leading 'model.' prefix if every
    tensor has it."""
    metadata, infos, data_start, buf = parse_gguf(path)
    arch = metadata.get("general.architecture")
    if arch is not None and arch not in KNOWN_ARCHS:
        raise ValueError(f"unexpected GGUF architecture {arch!r}")
    sd = {}
    prefix = "model.diffusion_model."
    has_prefix = all(i.name.startswith(prefix) for i in infos) if infos else False
    for info in infos:
        key = info.name[len(prefix) :] if has_prefix else info.name
        t = _load_tensor(info, buf, data_start)
        if not keep_quantized and is_quantized(t):
            t = np.asarray(t.q, dtype=np.float32).reshape(
                t.shape[:-1] + (-1, 32)
            ) * np.asarray(t.scales)[..., None]
            t = t.reshape(info.shape)
        sd[key] = t
    return sd


# llama.cpp T5 naming -> HF naming (clip_sd_map parity, Quantizer.py:815-835)
T5_KEY_MAP = {
    "enc.": "encoder.",
    ".blk.": ".block.",
    "token_embd": "shared",
    "output_norm": "final_layer_norm",
    "attn_q": "layer.0.SelfAttention.q",
    "attn_k": "layer.0.SelfAttention.k",
    "attn_v": "layer.0.SelfAttention.v",
    "attn_o": "layer.0.SelfAttention.o",
    "attn_norm": "layer.0.layer_norm",
    "attn_rel_b": "layer.0.SelfAttention.relative_attention_bias",
    "ffn_up": "layer.1.DenseReluDense.wi_1",
    "ffn_down": "layer.1.DenseReluDense.wo",
    "ffn_gate": "layer.1.DenseReluDense.wi_0",
    "ffn_norm": "layer.1.layer_norm",
}


def gguf_clip_loader(path: str) -> Dict[str, Any]:
    """T5 GGUF -> HF-keyed state dict (gguf_clip_loader parity,
    Quantizer.py:840-856)."""
    raw = gguf_sd_loader(path)
    if not any(k.startswith("enc.") for k in raw):
        raise ValueError("not a text-encoder GGUF")
    sd = {}
    for k, v in raw.items():
        for s, d in T5_KEY_MAP.items():
            k = k.replace(s, d)
        sd[k] = v
    return sd


def to_device_quantized(
    sd: Dict[str, Any],
    dtype=jnp.bfloat16,
    fused: Optional[bool] = None,
    embed_keys: Tuple[str, ...] = (
        "shared.weight",
        "token_embd.weight",
        # T5 relative-attention bias is a LOOKUP table (apply_t5 gathers
        # bucket rows) — fused matmul layout would crash the gather
        "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight",
    ),
    sharding_for=None,
    device: bool = True,
) -> Dict[str, Any]:
    """Move a GGUF state dict to device: Q8_0 stays int8+scales, dense
    tensors cast to ``dtype``.

    ``fused`` (default: on) re-lays 2-D quantized matmul weights out as
    QTensor8T for the fused Pallas dequant-matmul; embedding tables
    (``embed_keys``) keep the row-major QTensor8 layout for row lookup.

    ``sharding_for(key) -> sharding record`` (optional) places each tensor
    straight onto its mesh shards (tensor parallel): a NamedSharding for
    dense leaves, a QTensor8T-of-shardings record for quantized ones.

    ``device=False`` performs the same re-layout but keeps every leaf on
    the host (numpy-backed QTensor8/8T, numpy dense) — for load paths
    that upload a transformed layout instead (scan-over-blocks host
    stacking, models.flux.stack_block_params_host)."""
    if fused is None:
        fused = True
    out = {}
    for k, v in sd.items():
        rec = sharding_for(k) if sharding_for is not None else None
        if isinstance(v, QTensor8):
            if fused and len(v.shape) == 2 and k not in embed_keys:
                out[k] = transpose_for_matmul(v, sharding=rec, device=device)
            else:
                q = np.asarray(v.q)
                scales = np.asarray(v.scales, dtype=np.float32)
                if not device:
                    out[k] = QTensor8(q=q, scales=scales, shape=v.shape)
                elif rec is not None and hasattr(rec, "q"):
                    out[k] = QTensor8(
                        q=jax.device_put(q, rec.q),
                        scales=jax.device_put(scales, rec.scales),
                        shape=v.shape,
                    )
                else:
                    out[k] = QTensor8(
                        q=jnp.asarray(q),
                        scales=jnp.asarray(scales),
                        shape=v.shape,
                    )
        else:
            arr = np.asarray(v).astype(jnp.dtype(dtype), copy=False)
            if not device:
                out[k] = arr
            elif rec is not None and not hasattr(rec, "qt"):
                out[k] = jax.device_put(arr, rec)
            else:
                out[k] = jnp.asarray(arr)
    return out


# ---------------------------------------------------------------------------
# Writer (for tests and for re-quantizing checkpoints)
# ---------------------------------------------------------------------------


def quantize_q8_0(w: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """float (rows, in) -> (q int8 (rows, nb, 32), scales f32 (rows, nb))."""
    rows = w.shape[:-1]
    nb = w.shape[-1] // 32
    blocks = w.reshape(rows + (nb, 32)).astype(np.float32)
    amax = np.abs(blocks).max(axis=-1)
    scales = (amax / 127.0).astype(np.float32)
    inv = np.where(scales > 0, 1.0 / np.maximum(scales, 1e-30), 0.0)
    q = np.clip(np.round(blocks * inv[..., None]), -128, 127).astype(np.int8)
    return q, scales


def write_gguf(path: str, tensors: Dict[str, Any], arch: str = "flux",
               quantize: Tuple[str, ...] = ()):
    """Minimal GGUF v3 writer (tests + asset preparation). ``quantize`` lists
    key suffixes to store as Q8_0; everything else is F32."""
    metadata = {"general.architecture": arch}
    align = 32

    def enc_string(s: str) -> bytes:
        b = s.encode("utf-8")
        return struct.pack("<Q", len(b)) + b

    body = struct.pack("<IIQQ", GGUF_MAGIC, 3, len(tensors), len(metadata))
    for k, v in metadata.items():
        body += enc_string(k) + struct.pack("<I", 8) + enc_string(v)

    blobs = []
    offset = 0
    info_bytes = b""
    for name, w in tensors.items():
        w = np.asarray(w, dtype=np.float32)
        do_q = any(name.endswith(sfx) for sfx in quantize) and w.shape[-1] % 32 == 0
        if do_q:
            q, scales = quantize_q8_0(w)
            nb = q.shape[-2] * int(np.prod(q.shape[:-2], dtype=np.int64))
            blob = np.concatenate(
                [
                    scales.reshape(-1, 1).astype("<f2").view(np.uint8).reshape(-1, 2),
                    q.reshape(-1, 32).view(np.uint8),
                ],
                axis=1,
            ).tobytes()
            gtype = GGML_Q8_0
        else:
            blob = w.astype("<f4").tobytes()
            gtype = GGML_F32
        dims = list(reversed(w.shape))
        info_bytes += enc_string(name)
        info_bytes += struct.pack("<I", len(dims))
        for d in dims:
            info_bytes += struct.pack("<Q", d)
        info_bytes += struct.pack("<IQ", gtype, offset)
        pad = (-len(blob)) % align
        blobs.append(blob + b"\0" * pad)
        offset += len(blob) + pad

    header = body + info_bytes
    data_start_pad = (-len(header)) % align
    with open(path, "wb") as f:
        f.write(header)
        f.write(b"\0" * data_start_pad)
        for blob in blobs:
            f.write(blob)
