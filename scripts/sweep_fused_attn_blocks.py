"""On-chip (block_q, block_k) sweep for the fused-prologue attention
kernel at the Flux joint shape.

The serving default (preferred 512/1024 snapped to exact divisors of
l=4352 -> bq=272, bk=544) runs a (24, 16, 8) = 3072-step grid at
~2.19 ms/call (round-4 trace) — ~0.71 us/step, of which the two MXU dots
account for only ~0.38 us, so per-step loop overhead + VPU softmax is
roughly half the kernel. Bigger blocks cut the step count 4-16x; this
sweep measures whether that wins on silicon. VMEM bound: the (bq, bk)
f32 score tile; candidates stay under ~10 MB.

Chained-jit RELATIVE timings only (single-op numbers over the axon relay
are unreliable — ARCHITECTURE.md); decision rule: candidate beats the
default by >5% on the same chain, then bench_flux end-to-end confirms
before any default changes.

Run from the repo root on the TPU:  python scripts/sweep_fused_attn_blocks.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np

# Flux 1024px joint sequence: 4096 img + 256 txt tokens, 24 heads, d=128
L, H, D = 4352, 24, 128
TXT_LEN = 256

# (block_q, block_k); None -> the kernel's own default (272, 544 at l=4352)
CANDIDATES = [
    None,
    (272, 1088),
    (272, 2176),
    (544, 544),
    (544, 1088),
    (544, 2176),
    (1088, 544),
    (1088, 1088),
    (1088, 2176),
    (2176, 1088),
    (256, 4352),
    (544, 4352),
]

CHAIN = 6


def main():
    global L, H, CANDIDATES, CHAIN
    tiny = "--tiny" in sys.argv
    if not tiny:
        import bench as _bench

        _bench._probe_devices()
    import jax
    import jax.numpy as jnp

    from lightdiffusion_next_tpu import config as _config
    from lightdiffusion_next_tpu.ops import flash_attention as fa
    from lightdiffusion_next_tpu.utils import state_dict as sd_utils

    if tiny:  # CPU self-test of the sweep harness (interpret mode)
        L, H = 256, 2
        CANDIDATES = [None, (128, 256), (256, 256)]
        CHAIN = 2
    else:
        sd_utils.enable_compilation_cache()
    rng = np.random.default_rng(0)

    w = 3 * H * D
    qkv0 = jnp.asarray(
        rng.standard_normal((1, L, w)).astype(np.float32) * 0.2, jnp.bfloat16
    )
    qs = jnp.asarray(1.0 + 0.1 * rng.standard_normal(D), jnp.float32)
    ks = jnp.asarray(1.0 + 0.1 * rng.standard_normal(D), jnp.float32)
    cos = jnp.asarray(rng.standard_normal((L, D)), jnp.float32) * 0.1 + 1.0
    sin = jnp.asarray(rng.standard_normal((L, D)), jnp.float32) * 0.1
    # per-call FLOPs: QK^T + PV, 2*2*H*L*L*D
    flops = 4.0 * H * L * L * D * CHAIN

    ref = None
    best = None
    for cand in CANDIDATES:
        kw = {}
        label = "default"
        if cand is not None:
            bq, bk = cand
            if L % bq or L % bk:
                continue
            kw = {"block_q": bq, "block_k": bk}
            label = f"bq{bq}_bk{bk}"

        def chain(x0, kw=kw):
            y = x0
            for _ in range(CHAIN):
                o = fa.fused_qkv_attention(
                    y, qs, ks, cos, sin, num_heads=H, txt_len=TXT_LEN,
                    **kw,
                )
                # fold the (1, L, H*D) output back to qkv width so the
                # chain stays shape-stable (timing only)
                y = jnp.concatenate([o, o, o], axis=-1)[..., :w]
            return y

        try:
            fn = _config.ldt_jit(chain)
            out = fn(qkv0)
            jax.block_until_ready(out)
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(fn(qkv0))
                ts.append(time.perf_counter() - t0)
            dt = min(ts)
            tf = flops / dt / 1e12
            chk = float(jnp.abs(out[0, :4, :4]).mean())
            if ref is None:
                ref = chk
            drift = abs(chk - ref) / max(abs(ref), 1e-9)
            print(
                f"[l={L} h={H}] {label}: {dt / CHAIN * 1e3:.2f} ms/call "
                f"~{tf:.0f} TF/s chk={chk:.4f} (drift {drift:.2e})",
                flush=True,
            )
            if best is None or dt < best[0]:
                best = (dt, label)
        except Exception as e:
            print(f"[l={L} h={H}] {label}: FAILED {type(e).__name__}: "
                  f"{str(e)[:140]}", flush=True)
    if best:
        print(f"[l={L} h={H}] BEST: {best[1]}", flush=True)


if __name__ == "__main__":
    main()
