"""Int8 (sage) attention on-chip smoke + A/B at real model shapes.

First run after any kernel change: confirms Mosaic compiles the s8 x s8
attention contractions, checks drift against the bf16 flash kernel, and
times both (chained-jit relative comparison — absolute single-op numbers
over the axon relay are unreliable, see ARCHITECTURE.md; treat these as
A/B ratios only, end-to-end bench.py / bench_flux.py is the truth).

Run from the repo root on the TPU:  python scripts/smoke_sage.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np

# (B, H, L, D): SD1.5 1024^2 attention shapes (level-0 under MSW 2x2
# windowing runs batch*4 windows at 4096 tokens, d=40) and Flux's joint
# sequence (24 heads, 4352 tokens, d=128).
SHAPES = [
    ("sd15-L0-msw", (8, 8, 4096, 40)),
    ("sd15-L1", (2, 8, 4096, 80)),
    ("sd15-L2", (2, 8, 1024, 160)),
    ("flux-joint", (1, 24, 4352, 128)),
]

CHAIN = 8


def main():
    import bench as _bench

    _bench._probe_devices()
    import jax
    import jax.numpy as jnp

    from lightdiffusion_next_tpu.ops import attention as attn
    from lightdiffusion_next_tpu.ops import flash_attention as fa
    from lightdiffusion_next_tpu.ops import sage_attention as sa
    from lightdiffusion_next_tpu.utils import state_dict as sd_utils

    sd_utils.enable_compilation_cache()
    rng = np.random.default_rng(0)

    for name, (b, h, l, d) in SHAPES:
        q, k, v = (
            jnp.asarray(rng.standard_normal((b, h, l, d)), jnp.bfloat16)
            for _ in range(3)
        )

        # -- numerics on a small slice vs exact f32 sdpa (full-shape sdpa
        # would materialize the L^2 logits in HBM)
        ls = 512
        qs, ks, vs = (t[:1, :1, :ls].astype(jnp.float32) for t in (q, k, v))
        oracle = np.asarray(attn.sdpa(qs, ks, vs))
        got = np.asarray(sa.sage_attention(qs, ks, vs))
        ref = np.asarray(fa.flash_attention(qs, ks, vs))
        rel = lambda a, b: float(
            np.sqrt(((a - b) ** 2).mean()) / (np.sqrt((b**2).mean()) + 1e-12)
        )
        print(f"[{name}] numerics: sage-vs-sdpa rmse {rel(got, oracle):.4f} "
              f"(flash-vs-sdpa {rel(ref, oracle):.4f})", flush=True)

        def chain_fn(fn, qq, kk, vv):
            y = fn(qq, kk, vv)
            for _ in range(CHAIN - 1):
                y = fn(y, kk, vv)
            return y

        f_flash = jax.jit(lambda a, b2, c: chain_fn(fa.flash_attention, a, b2, c))
        f_sage = jax.jit(lambda a, b2, c: chain_fn(sa.sage_attention, a, b2, c))
        f_sage_bf16 = jax.jit(
            lambda a, b2, c: chain_fn(
                lambda x, y, z: sa.sage_attention(x, y, z, int8_mxu=False),
                a, b2, c,
            )
        )
        f_sage_pvbf16 = jax.jit(
            lambda a, b2, c: chain_fn(
                lambda x, y, z: sa.sage_attention(x, y, z, pv_int8=False),
                a, b2, c,
            )
        )

        results = {}
        for vname, f in [
            ("flash-bf16", f_flash),
            ("sage-int8mxu", f_sage),
            ("sage-bf16mxu", f_sage_bf16),
            ("sage-pv-bf16", f_sage_pvbf16),  # quality variant: QK int8 only
        ]:
            try:
                y = jax.block_until_ready(f(q, k, v))
            except Exception as e:  # compile failure is the smoke signal
                print(f"[{name}] {vname}: FAILED {type(e).__name__}: "
                      f"{str(e)[:300]}", flush=True)
                continue
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(f(q, k, v))
                ts.append(time.perf_counter() - t0)
            dt = min(ts) / CHAIN
            tf = 4 * b * h * l * l * d / dt / 1e12  # useful (unpadded) FLOPs
            results[vname] = dt
            print(f"[{name}] {vname}: {dt*1e3:.2f} ms/attn ~{tf:.1f} TF/s "
                  f"chk={float(jnp.abs(y.astype(jnp.float32)).mean()):.5f}",
                  flush=True)
        if "flash-bf16" in results and "sage-int8mxu" in results:
            print(f"[{name}] speedup int8/bf16: "
                  f"{results['flash-bf16']/results['sage-int8mxu']:.2f}x",
                  flush=True)


if __name__ == "__main__":
    main()
