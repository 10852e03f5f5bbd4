"""On-chip A/B: head-packed vs plain flash attention at the SD1.5 hot
shapes (round-5 target — ARCHITECTURE §5: level-0 attention at d=40 runs
3.2x lane-padded and is ~55% of the full-res step).

Shapes measured:
  - (8, 8, 4096, 40): the MSW-MSA level-0 call (CFG batch 2 x 4 windows,
    8 heads) — 5 such calls make the 88 ms/step attention bill.
  - (2, 8, 16384, 40): the unwindowed full-res level-0 sequence.
  - (2, 8, 4096, 80): level 1 (pack_group=1, plain kernel both sides —
    sanity row proving the A/B harness itself is flat there).

Chained-jit RELATIVE timings only (single-op numbers over the axon relay
are unreliable — ARCHITECTURE.md). Decision rule: packed beats plain by
>5% on the same chain -> flip RuntimeConfig.packed_attn default for TPU
and confirm end-to-end with bench.py before recording.

Run from the repo root on the TPU:  python scripts/ab_packed_attn.py
CPU self-test of the harness:       python scripts/ab_packed_attn.py --tiny
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np

SHAPES = [
    (8, 8, 4096, 40),
    (2, 8, 16384, 40),
    (2, 8, 4096, 80),
]
CHAIN = 6


def main():
    global SHAPES, CHAIN
    tiny = "--tiny" in sys.argv
    if not tiny:
        import bench as _bench

        _bench._probe_devices()
    import jax
    import jax.numpy as jnp

    from lightdiffusion_next_tpu import config as _config
    from lightdiffusion_next_tpu.ops import flash_attention as fa
    from lightdiffusion_next_tpu.utils import state_dict as sd_utils

    if tiny:
        SHAPES = [(1, 3, 512, 40), (1, 2, 512, 64)]
        CHAIN = 2
    else:
        sd_utils.enable_compilation_cache()
    rng = np.random.default_rng(0)

    for b, h, l, d in SHAPES:
        q = jnp.asarray(
            rng.standard_normal((b, h, l, d)).astype(np.float32) * 0.3,
            jnp.bfloat16,
        )
        k = jnp.asarray(
            rng.standard_normal((b, h, l, d)).astype(np.float32) * 0.3,
            jnp.bfloat16,
        )
        v = jnp.asarray(
            rng.standard_normal((b, h, l, d)).astype(np.float32) * 0.3,
            jnp.bfloat16,
        )
        flops = 4.0 * b * h * l * l * d * CHAIN  # useful (unpadded) MACs x2

        results = {}
        for label, kernel in (
            ("plain", fa.flash_attention),
            ("packed", fa.packed_flash_attention),
        ):
            if label == "packed" and fa.pack_group(d) < 2:
                continue

            def chain(q0, kernel=kernel):
                y = q0
                for _ in range(CHAIN):
                    y = kernel(y, k, v)
                return y

            try:
                fn = _config.ldt_jit(chain)
                out = fn(q)
                jax.block_until_ready(out)
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    jax.block_until_ready(fn(q))
                    ts.append(time.perf_counter() - t0)
                dt = min(ts)
                chk = float(jnp.abs(out[0, 0, :8, :8]).astype(jnp.float32).mean())
                results[label] = (dt, chk)
                print(
                    f"[b{b} h{h} l{l} d{d}] {label}: "
                    f"{dt / CHAIN * 1e3:.2f} ms/call "
                    f"~{flops / dt / 1e12:.1f} TF/s(useful) chk={chk:.4f}",
                    flush=True,
                )
            except Exception as e:
                print(
                    f"[b{b} h{h} l{l} d{d}] {label}: FAILED "
                    f"{type(e).__name__}: {str(e)[:140]}",
                    flush=True,
                )
        if "plain" in results and "packed" in results:
            (dtp, chp), (dtq, chq) = results["plain"], results["packed"]
            drift = abs(chq - chp) / max(abs(chp), 1e-9)
            print(
                f"[b{b} h{h} l{l} d{d}] packed/plain: {dtp / dtq:.2f}x "
                f"(chk drift {drift:.2e})",
                flush=True,
            )


if __name__ == "__main__":
    main()
