"""Micro-bench: fused Q8_0 matmul block sweep + attention variants at the
Flux.1 hot shapes, on the real TPU.

Timing is relay-safe: each measurement chains N dependent kernel calls
inside one jit (lax.fori_loop carrying the activation) and closes with one
host readback.

Run from repo root: python scripts/bench_quant_shapes.py
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from lightdiffusion_next_tpu.ops import flash_attention as fa
from lightdiffusion_next_tpu.ops import quant_matmul as qm
from lightdiffusion_next_tpu.ops import ggml

# Flux hot matmul shapes (M, K, N) per step (img stream M=4096, txt M=256,
# single-stream M=4352):
SHAPES = [
    ("dbl_img_qkv", 4096, 3072, 9216),
    ("dbl_img_proj", 4096, 3072, 3072),
    ("dbl_img_mlp0", 4096, 3072, 12288),
    ("dbl_img_mlp2", 4096, 12288, 3072),
    ("single_lin1", 4352, 3072, 21504),
    ("single_lin2", 4352, 15360, 3072),
]

REPS = 20


def time_chain(fn, x, reps=REPS):
    """Chained jit: y = fn(...(fn(x))); one readback. Carries the scoped
    -vmem compiler option (config.ldt_jit) — the kernel's big tiles need
    it on the compiling (outer) jit."""
    from lightdiffusion_next_tpu import config as _config

    @_config.ldt_jit
    def chained(x):
        def body(_, v):
            return fn(v)

        return jax.lax.fori_loop(0, reps, body, x)

    out = chained(x)
    np.asarray(out)  # warm compile + first run
    t0 = time.perf_counter()
    out = chained(x)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / reps
    return dt


def bench_quant(name, m, k, n, tiles):
    rng = np.random.default_rng(0)
    w = (rng.standard_normal((n, k)) * 0.02).astype(np.float32)
    q, s = ggml.quantize_q8_0(w)
    t8t = ggml.transpose_for_matmul(ggml.QTensor8(q, s, (n, k)))
    x = jnp.asarray(rng.standard_normal((m, k)) * 0.1, jnp.bfloat16)
    flops = 2 * m * k * n

    results = {}
    for tm, tk, tn in tiles:
        if m % 8 or k % tk or n % tn:
            continue
        if tm > m + 8:
            continue

        def fn(v, _tm=tm, _tk=tk, _tn=tn):
            y = qm.quant_matmul_2d(
                v, t8t.qt, t8t.scales_t, out_dtype=jnp.bfloat16,
                tile_m=_tm, tile_k=_tk, tile_n=_tn,
            )
            # keep shape: fold N back to K via slice/pad-free trick — just
            # re-project with a cheap cast when shapes differ
            if y.shape[-1] != v.shape[-1]:
                y = jnp.broadcast_to(
                    y[:, :1], (y.shape[0], v.shape[-1])
                ) * 1e-3 + v
            return y.astype(v.dtype)

        try:
            dt = time_chain(fn, x)
            results[(tm, tk, tn)] = dt
            print(
                f"{name:14s} M{m} K{k} N{n} tm{tm:5d} tk{tk:5d} tn{tn:5d}"
                f"  {dt*1e3:8.2f} ms  {flops/dt/1e12:7.1f} TF/s",
                flush=True,
            )
        except Exception as e:
            print(f"{name} tm{tm} tk{tk} tn{tn} FAILED: {type(e).__name__} {e}",
                  flush=True)

    # XLA dequant-then-dot baseline (what nn.linear falls back to off
    # 256-multiples / under TP): materializes the bf16 weight per call.
    def xla_fn(v):
        w_deq = (
            t8t.qt.astype(jnp.bfloat16).reshape(k // 32, 32, n)
            * t8t.scales_t[:, None, :].astype(jnp.bfloat16)
        ).reshape(k, n)
        y = jnp.dot(v, w_deq, preferred_element_type=jnp.float32)
        y = y.astype(jnp.bfloat16)
        if y.shape[-1] != v.shape[-1]:
            y = jnp.broadcast_to(y[:, :1], (y.shape[0], v.shape[-1])) * 1e-3 + v
        return y.astype(v.dtype)

    try:
        dt = time_chain(xla_fn, x)
        results["xla_dequant_dot"] = dt
        print(
            f"{name:14s} M{m} K{k} N{n} xla dequant+dot      "
            f"  {dt*1e3:8.2f} ms  {flops/dt/1e12:7.1f} TF/s",
            flush=True,
        )
    except Exception as e:
        print(f"{name} xla FAILED: {type(e).__name__} {e}", flush=True)
    return results


def bench_attention():
    rng = np.random.default_rng(1)
    shape = (1, 24, 4352, 128)
    q = jnp.asarray(rng.standard_normal(shape) * 0.1, jnp.bfloat16)
    kv_flops = 2 * 2 * 24 * 4352 * 4352 * 128

    for bq, bk in ((512, 1024), (512, 512), (256, 1024), (1024, 512),
                   (256, 512)):

        def fn(v, _bq=bq, _bk=bk):
            o = fa.flash_attention(v, v, v, block_q=_bq, block_k=_bk)
            return o.astype(v.dtype)

        try:
            dt = time_chain(fn, q, reps=10)
            print(
                f"flash L4352 d128 bq{bq:5d} bk{bk:5d}  {dt*1e3:8.2f} ms "
                f" {kv_flops/dt/1e12:7.1f} TF/s",
                flush=True,
            )
        except Exception as e:
            print(f"flash bq{bq} bk{bk} FAILED: {e}", flush=True)

    from lightdiffusion_next_tpu.ops import attention as attn_ops

    def xla_fn(v):
        return attn_ops.sdpa(v, v, v).astype(v.dtype)

    dt = time_chain(xla_fn, q, reps=10)
    print(f"xla  L4352 d128                 {dt*1e3:8.2f} ms "
          f" {kv_flops/dt/1e12:7.1f} TF/s", flush=True)


def main():
    from lightdiffusion_next_tpu.utils import state_dict as sd_utils

    sd_utils.enable_compilation_cache()
    print(f"devices: {jax.devices()}", flush=True)

    tiles = [
        (256, 512, 512),   # current defaults
        (512, 512, 512),
        (1024, 512, 512),
        (512, 1024, 512),
        (512, 512, 1024),
        (1024, 1024, 512),
        (1024, 512, 1024),
        (2048, 512, 512),
    ]
    for name, m, k, n in SHAPES:
        bench_quant(name, m, k, n, tiles)
    bench_attention()
    return 0


if __name__ == "__main__":
    sys.exit(main())
