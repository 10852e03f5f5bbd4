"""Runtime configuration: dtype policy, attention backend, RNG policy, mesh.

This replaces the reference's device/VRAM runtime (src/Device/Device.py:15-1608).
On TPU there is no VRAM-state machine, no model paging, and no manual casting:
XLA owns placement, jit owns compilation, and dtype policy is a small static
config chosen once per run.

Reference parity notes:
- ``unet_dtype`` / ``should_use_bf16`` (Device.py:955/1522) -> ``compute_dtype``
  (bf16 on TPU, fp32 on CPU test runs).
- ``vae_dtype`` (Device.py:1105) -> ``vae_dtype`` (fp32 by default: the SD VAE
  is numerically fragile in fp16; bf16 is fine on TPU, fp32 used for parity).
- The xformers/SDPA dispatch (src/Attention/Attention.py:34-41) becomes the
  ``attention_backend`` field ("auto" picks Pallas flash attention on TPU and
  XLA dot-product attention elsewhere).
"""

from __future__ import annotations

import dataclasses
import os
from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Platform probing
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def default_backend() -> str:
    """The active JAX backend platform ("tpu", "cpu", "gpu", "axon"...)."""
    try:
        return jax.default_backend()
    except Exception:  # pragma: no cover - no devices at all
        return "cpu"


def is_tpu() -> bool:
    plat = default_backend()
    if plat in ("tpu", "axon"):
        return True
    try:
        return jax.devices()[0].platform.startswith("tpu") or "TPU" in str(
            jax.devices()[0]
        )
    except Exception:
        return False


# ---------------------------------------------------------------------------
# Compiler options
# ---------------------------------------------------------------------------

# XLA reserves 16 MiB of scoped VMEM for kernel stack allocations by default;
# the fused Q8_0 matmul's best tiles at Flux shapes ((2176, 512, 1024) for
# M=4352) need ~22 MiB. 32 MiB measured strictly faster end-to-end and leaves
# ~96 MiB of v5e VMEM for XLA's own fusions. Override with
# LDT_SCOPED_VMEM_KIB=0 to fall back to the compiler default.
SCOPED_VMEM_LIMIT_KIB = int(os.environ.get("LDT_SCOPED_VMEM_KIB", 32768))


def jit_compiler_options() -> Optional[dict]:
    """Options for ``jax.jit(..., compiler_options=...)`` at the OUTER jit
    entry points that compile Pallas quant-matmul calls (the sampler
    runners). TPU-only flags crash the CPU compiler, so return None off-TPU
    (CPU tests run the kernels in interpreter mode anyway)."""
    if SCOPED_VMEM_LIMIT_KIB and is_tpu():
        return {"xla_tpu_scoped_vmem_limit_kib": str(SCOPED_VMEM_LIMIT_KIB)}
    return None


def scoped_vmem_budget_bytes() -> int:
    """The per-grid-step VMEM budget Pallas kernels should tile within:
    the scoped limit minus 2 MiB headroom for Mosaic's own stack (half the
    limit when the user configures one too small for that headroom)."""
    limit_kib = SCOPED_VMEM_LIMIT_KIB if (SCOPED_VMEM_LIMIT_KIB and is_tpu()) \
        else 16384
    limit = limit_kib * 1024
    return max(limit - (2 << 20), limit // 2)


def ldt_jit(fn, **jit_kwargs):
    """``jax.jit`` with this framework's compiler options attached — use
    this for every OUTER jit that can compile Pallas quant-matmul calls,
    so the scoped-vmem invariant (kernel tiles budgeted against
    ``scoped_vmem_budget_bytes`` <= the compiled program's scoped limit)
    is structural rather than per-site convention. Must be called with an
    initialized backend and NOT from inside a trace (jax forbids
    compiler_options on nested jits)."""
    return jax.jit(fn, compiler_options=jit_compiler_options(), **jit_kwargs)


# ---------------------------------------------------------------------------
# Dtype policy
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class DtypePolicy:
    """Static mixed-precision policy.

    ``compute_dtype`` drives matmuls/convs (MXU wants bf16); ``param_dtype`` is
    the storage dtype of loaded weights; norms and sigma/schedule math always
    run in fp32 (matches the reference keeping schedules in fp32,
    src/sample/sampling.py:289).
    """

    compute_dtype: jnp.dtype
    param_dtype: jnp.dtype
    vae_dtype: jnp.dtype
    text_encoder_dtype: jnp.dtype

    @staticmethod
    def for_platform(platform: Optional[str] = None) -> "DtypePolicy":
        plat = platform or default_backend()
        if plat == "cpu":
            return DtypePolicy(jnp.float32, jnp.float32, jnp.float32, jnp.float32)
        return DtypePolicy(jnp.bfloat16, jnp.bfloat16, jnp.float32, jnp.bfloat16)


# ---------------------------------------------------------------------------
# Runtime config
# ---------------------------------------------------------------------------

_VALID_ATTENTION = ("auto", "xla", "pallas")
_VALID_RNG = ("torch", "jax")


@dataclasses.dataclass(frozen=True)
class RuntimeConfig:
    """Top-level knobs for a generation session.

    rng_mode:
      - "torch": initial/ancestral noise is drawn with torch's CPU Philox
        generator so outputs are bit-identical in distribution to the
        reference at a fixed seed (src/sample/ksampler_util.py:274-295).
      - "jax": pure jax.random (threefry) — the production default when
        reference parity is not required.
    """

    dtypes: DtypePolicy = dataclasses.field(
        default_factory=DtypePolicy.for_platform
    )
    attention_backend: str = "auto"
    rng_mode: str = "torch"
    # mesh axis sizes; None -> single device
    data_parallel: int = 1
    model_parallel: int = 1
    donate_latents: bool = True
    # enable jax profiler traces around the sampler loop
    profile_dir: Optional[str] = None
    # W8A8: requantize Q8_0 matmul weights per-column at load and run
    # s8 x s8 MXU matmuls with per-token int8 activations (2x bf16 peak
    # on v5e). Measured on-chip 2026-08-19: Flux 12.82 -> 10.45 s/image
    # (-18.5%), final-latent rel RMSE 1.5% vs the Q8_0 bf16-compute path
    # -- so "auto" resolves TPU->on / CPU->off (the Pallas s8 kernel and
    # the win are TPU-specific; CPU tests keep the dequant path).
    # Env override LDT_W8A8=1/0; resolve via resolve_w8a8().
    w8a8: object = dataclasses.field(
        default_factory=lambda: {"1": True, "0": False}.get(
            os.environ.get("LDT_W8A8", "auto"), "auto"
        )
    )
    # Int8 flash attention (ops/sage_attention.py): quantize both attention
    # matmuls to the MXU's s8 path (2x bf16 MAC rate — halves the
    # lane-padding cycle bill at SD1.5 head dims). Opt-in pending on-chip
    # speed + drift measurement. Env default LDT_SAGE_ATTN=1.
    sage_attention: bool = dataclasses.field(
        default_factory=lambda: os.environ.get("LDT_SAGE_ATTN", "") == "1"
    )
    # Head-packed flash attention (ops/flash_attention.py
    # packed_flash_attention): pack G=floor(128/d) heads per 128-lane MXU
    # tile via block-diagonal K/V staging — attacks SD1.5's structural
    # d=40 lane padding (3.2x padded MACs) where sage attacked only the
    # rate. First measured on-chip 2026-08-20 pre-VPU-lean-softmax
    # (scripts/ab_packed_attn.py): kernel 1.01-1.03x — the d=40 kernel
    # was softmax/VPU-bound, so removing 3.2x of padded MACs bought
    # ~nothing and it stayed opt-in (ARCHITECTURE 5a-ii). RE-MEASURED
    # the same day AFTER the VPU-lean softmax cut the per-score VPU
    # bill: kernel 1.05x at the MSW level-0 shape / 1.17x unwindowed
    # 16384, zero checksum drift — the MAC saving is now a visible
    # share, crossing the pre-registered >5% flip rule, so "auto"
    # resolves TPU->on / CPU->off (only engages when pack_group(d) >= 2;
    # d=64/128 shapes keep the plain kernel either way). Env override
    # LDT_PACKED_ATTN=1/0; resolve via resolve_packed_attn().
    packed_attn: object = dataclasses.field(
        default_factory=lambda: {"1": True, "0": False}.get(
            os.environ.get("LDT_PACKED_ATTN", "auto"), "auto"
        )
    )
    # Flux scan-over-blocks: stack the 19+38 identical DiT blocks' params
    # along a depth axis and lax.scan two block bodies instead of unrolling
    # 57 blocks of HLO — 7.2x smaller program (measured at production
    # shapes, scripts/measure_flux_hlo.py). Quantized weights stream from
    # the stacked arrays via Pallas scalar prefetch (no per-iteration
    # slice copies). Measured on-chip 2026-08-19 (with w8a8+fused_attn):
    # 7.77 s/image vs 8.09 unrolled (-4%), cold compile+first-run 496 s
    # vs 965 s, equal HBM peak (scripts/probe_flux_memory.py; params are
    # permuted+stacked in host numpy so no small-leaf churn fragments the
    # device heap), final-latent rel RMSE 0.66% vs unrolled — so "auto"
    # resolves TPU->on / CPU->off. Applies single-device and under
    # LDT_FLUX_TP=spmd (stacked local shards scan per device); GSPMD TP
    # keeps the unrolled forward. LoRA-on-stacked-params errors loudly
    # (models/lora.py) — disable with LDT_FLUX_SCAN=0 / --no-flux-scan
    # when patching Flux. Env override LDT_FLUX_SCAN=1/0.
    flux_scan: object = dataclasses.field(
        default_factory=lambda: {"1": True, "0": False}.get(
            os.environ.get("LDT_FLUX_SCAN", "auto"), "auto"
        )
    )
    # Fused-prologue attention for Flux: QKNorm + RoPE + head indexing run
    # inside the flash kernel off the raw qkv projection (weights permuted
    # to the half-split RoPE basis at load — models.flux.permute_rope_basis).
    # Removes the q/k HBM round-trips between the two pallas fusion
    # barriers. Measured on-chip 2026-08-19: Flux w8a8 10.45 -> 8.78
    # s/image (-16%), final-latent rel RMSE 0.56% vs the unfused w8a8
    # path — so "auto" resolves TPU->on / CPU->off like w8a8. Composes
    # with flux_scan (the stacked load permutes the basis on host). The
    # loader falls back loudly on unsupported combos (TP mesh, LoRA,
    # head_dim != 128). Env override LDT_FUSED_ATTN=1/0.
    fused_attn: object = dataclasses.field(
        default_factory=lambda: {"1": True, "0": False}.get(
            os.environ.get("LDT_FUSED_ATTN", "auto"), "auto"
        )
    )
    # Fused QKV projection for the UNet's CrossAttention: concatenate the
    # to_q/to_k/to_v (self-attn) or to_k/to_v (cross-attn) weight matrices
    # at trace time and run ONE wide matmul instead of 2-3 narrow ones.
    # The round-5 SD1.5 device trace showed the narrow N=320/640
    # projections running at 48-74 TF/s (the MXU under-fed at 2.5 lane
    # tiles, x re-read per projection) while every wide matmul in the step
    # sits at 150-190 TF/s; fusing widens N 3x and reads x once. Math is
    # identical (each output element's contraction is unchanged — no
    # reassociation, no drift); engages only on plain dense weights (any
    # quantized/LoRA-wrapped leaf falls back to separate matmuls).
    # Measured on-chip 2026-08-20 (bench.py same-session A/B):
    # 10.815 -> 11.029 it/s headline (+2.0%), fullres 6.736 -> 6.828
    # (+1.4%) — modest (the projections were ~6% of the step) but in the
    # predicted direction on both metrics. "auto" resolves to on
    # everywhere (the transform is numerically exact, so the >5% flip
    # rule for drift-bearing defaults does not apply); kept tri-state so
    # the e2e effect stays A/B-able.
    # Env override LDT_QKV_FUSE=1/0; resolve via resolve_qkv_fuse().
    qkv_fuse: object = dataclasses.field(
        default_factory=lambda: {"1": True, "0": False}.get(
            os.environ.get("LDT_QKV_FUSE", "auto"), "auto"
        )
    )
    # Fused-elementwise W8A8 epilogues/prologues: on the single-batch TPU
    # serving path the LN+modulation+row-quant before every quantized
    # matmul runs as ONE Pallas pass and the gate/bias/residual land in
    # the matmul epilogue (ops.quant_matmul row_quantize_fused /
    # w8a8_matmul_ep) — the round-4 trace showed XLA's separate passes
    # re-reading each activation ~3x (~18% of the Flux image). Only
    # reachable on W8A8 leaves (QTensor8W.modulated_matmul), so "auto"
    # resolves TPU->on / CPU->off alongside w8a8. Consulted at trace time
    # inside the block bodies (models/flux.py) and carried by
    # trace_token() so a mid-session flip retraces the compiled runners.
    # Env override LDT_FUSED_EW=1/0.
    fused_ew: object = dataclasses.field(
        default_factory=lambda: {"1": True, "0": False}.get(
            os.environ.get("LDT_FUSED_EW", "auto"), "auto"
        )
    )

    def __post_init__(self):
        if self.attention_backend not in _VALID_ATTENTION:
            raise ValueError(f"attention_backend must be one of {_VALID_ATTENTION}")
        if self.rng_mode not in _VALID_RNG:
            raise ValueError(f"rng_mode must be one of {_VALID_RNG}")
        if self.w8a8 not in (True, False, "auto"):
            raise ValueError('w8a8 must be True, False or "auto"')
        if self.fused_attn not in (True, False, "auto"):
            raise ValueError('fused_attn must be True, False or "auto"')
        if self.fused_ew not in (True, False, "auto"):
            raise ValueError('fused_ew must be True, False or "auto"')
        if self.flux_scan not in (True, False, "auto"):
            raise ValueError('flux_scan must be True, False or "auto"')
        if self.packed_attn not in (True, False, "auto"):
            raise ValueError('packed_attn must be True, False or "auto"')
        if self.qkv_fuse not in (True, False, "auto"):
            raise ValueError('qkv_fuse must be True, False or "auto"')

    def resolve_w8a8(self) -> bool:
        if self.w8a8 == "auto":
            return is_tpu()
        return bool(self.w8a8)

    def resolve_flux_scan(self) -> bool:
        if self.flux_scan == "auto":
            return is_tpu()
        return bool(self.flux_scan)

    def resolve_fused_attn(self) -> bool:
        if self.fused_attn == "auto":
            return is_tpu()
        return bool(self.fused_attn)

    def resolve_fused_ew(self) -> bool:
        if self.fused_ew == "auto":
            return is_tpu()
        return bool(self.fused_ew)

    def resolve_packed_attn(self) -> bool:
        if self.packed_attn == "auto":
            return is_tpu()
        return bool(self.packed_attn)

    def resolve_qkv_fuse(self) -> bool:
        if self.qkv_fuse == "auto":
            return True
        return bool(self.qkv_fuse)

    def resolve_attention_backend(self) -> str:
        if self.attention_backend != "auto":
            return self.attention_backend
        return "pallas" if is_tpu() else "xla"


_current: Optional[RuntimeConfig] = None


def trace_token() -> tuple:
    """Hashable token of every RuntimeConfig field that alters TRACED
    computation without altering the traced ARGUMENTS.

    jax.jit retraces when argument shapes/dtypes/pytree structure change,
    but it cannot see globals consulted at trace time — flipping
    ``sage_attention`` (ops/attention.py:_flash_kernel) or
    ``attention_backend`` mid-session would silently reuse the previous
    mode's compiled program. Every compiled-runner cache key (the denoiser
    cache_key in sampling/cfg.py, the definition-jitted T5/VAE programs)
    must include this token so a config flip retraces instead.

    ``w8a8``/``flux_scan`` restructure the param pytree (which forces a
    retrace on its own) but are included anyway: the invariant "the token
    covers every trace-affecting flag" should not depend on a side effect.
    """
    cfg = get_config()
    return (
        cfg.resolve_attention_backend(),
        cfg.sage_attention,
        cfg.resolve_packed_attn(),
        cfg.resolve_qkv_fuse(),
        cfg.resolve_w8a8(),
        cfg.resolve_flux_scan(),
        cfg.resolve_fused_attn(),
        cfg.resolve_fused_ew(),
    )


def config_jit(fn, **jit_kwargs):
    """``ldt_jit`` whose compiled-program identity includes trace_token():
    use for definition-time jits of functions that consult the global
    RuntimeConfig at trace time (attention dispatch). The token rides as a
    static argument, so same-config calls hit the jit cache as before and
    a config flip gets a fresh trace."""
    jitted = ldt_jit(
        lambda _ldt_token, _a, _k: fn(*_a, **_k), static_argnums=0
    )

    def wrapper(*args, **kwargs):
        return jitted(trace_token(), args, kwargs)

    return wrapper


def get_config() -> RuntimeConfig:
    global _current
    if _current is None:
        _current = RuntimeConfig()
    return _current


def set_config(cfg: RuntimeConfig) -> RuntimeConfig:
    global _current
    _current = cfg
    return cfg


# ---------------------------------------------------------------------------
# Asset locations (replaces src/FileManaging paths)
# ---------------------------------------------------------------------------


def asset_root() -> str:
    """Directory holding model assets (checkpoints/, loras/, clip/, ...)."""
    return os.environ.get(
        "LDT_ASSET_ROOT", os.path.join(os.path.expanduser("~"), ".ldt", "include")
    )


def repo_asset(*parts: str) -> str:
    """Path to an asset vendored inside this repository (tokenizer vocab...)."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(here, "assets", *parts)


def model_dirs() -> Tuple[str, ...]:
    root = asset_root()
    return tuple(
        os.path.join(root, d)
        for d in (
            "checkpoints",
            "loras",
            "embeddings",
            "clip",
            "vae",
            "unet",
            "ESRGAN",
            "yolos",
        )
    )
