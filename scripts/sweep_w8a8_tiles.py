"""On-chip tile sweep for the W8A8 kernel at the four Flux hot shapes.

The round-4 measurement session put the kernel at 65-84 TF/s in-situ —
well under both the s8 MXU rate and the HBM roofline — so the tile
defaults (tm 2176, tk 512, tn<=1024) are worth an empirical sweep.
Chained-jit RELATIVE timings only (single-op numbers over the axon relay
are unreliable — ARCHITECTURE.md); the decision rule is "candidate beats
the default by >5% on the same chain", then bench_flux --w8a8 end-to-end
confirms before any default changes.

Run from the repo root on the TPU:  python scripts/sweep_w8a8_tiles.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np

SHAPES = [
    (4352, 3072, 3072),
    (4352, 3072, 12288),
    (4352, 12288, 3072),
    (4352, 3072, 9216),
]

# (tile_m, tile_k, tile_n) candidates; None -> the kernel's own default
CANDIDATES = [
    None,
    (1088, 512, 1024),
    (2176, 256, 1024),
    (2176, 512, 512),
    (2176, 512, 1536),
    (2176, 512, 2048),
    (2176, 1024, 512),
    (2176, 1024, 1024),
    (2176, 1536, 512),
    (4352, 512, 512),
    (4352, 512, 1024),
    (4352, 1024, 512),
]

CHAIN = 8


def main():
    global SHAPES, CANDIDATES
    tiny = "--tiny" in sys.argv
    if not tiny:
        import bench as _bench

        _bench._probe_devices()
    import jax
    import jax.numpy as jnp

    from lightdiffusion_next_tpu import config as _config
    from lightdiffusion_next_tpu.ops import ggml
    from lightdiffusion_next_tpu.ops import quant_matmul as qm
    from lightdiffusion_next_tpu.utils import state_dict as sd_utils

    if tiny:  # CPU self-test of the sweep harness (interpret mode)
        SHAPES = [(256, 256, 256)]
        CANDIDATES = [None, (128, 128, 128)]
    else:
        sd_utils.enable_compilation_cache()
    interpret = jax.default_backend() == "cpu"
    rng = np.random.default_rng(0)

    for m, k, n in SHAPES:
        w = rng.standard_normal((n, k)).astype(np.float32) * k**-0.5
        q, s = ggml.quantize_q8_0(w)
        w8 = ggml.to_w8a8(
            {
                "w": ggml.transpose_for_matmul(
                    ggml.QTensor8(jnp.asarray(q), jnp.asarray(s), (n, k))
                )
            }
        )["w"]
        x = jnp.asarray(
            rng.standard_normal((m, k)).astype(np.float32), jnp.bfloat16
        )
        flops = 2.0 * m * k * n * CHAIN

        best = None
        for cand in CANDIDATES:
            kw = {}
            label = "default"
            if cand is not None:
                tm, tk, tn = cand
                if m % tm or k % tk or n % tn:
                    continue
                kw = {"tile_m": tm, "tile_k": tk, "tile_n": tn}
                label = f"tm{tm}_tk{tk}_tn{tn}"

            def chain(x0, w8=w8, kw=kw):
                y = x0
                kk = w8.qt.shape[0]
                for _ in range(CHAIN):
                    if y.shape[1] < kk:  # n < k shapes: tile back up to K
                        reps = -(-kk // y.shape[1])
                        y = jnp.tile(y, (1, reps))[:, :kk]
                    elif y.shape[1] > kk:
                        y = y[:, :kk]
                    y = qm.w8a8_matmul_2d(
                        y,
                        w8.qt,
                        w8.col_scales,
                        out_dtype=jnp.bfloat16,
                        interpret=interpret,
                        **kw,
                    )
                return y

            try:
                fn = _config.ldt_jit(chain)
                out = fn(x)
                jax.block_until_ready(out)
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    jax.block_until_ready(fn(x))
                    ts.append(time.perf_counter() - t0)
                dt = min(ts)
                tf = flops / dt / 1e12
                chk = float(jnp.abs(out[:2, :2]).mean())
                print(
                    f"[{m}x{k}x{n}] {label}: {dt / CHAIN * 1e3:.2f} ms "
                    f"~{tf:.0f} TF/s chk={chk:.4f}",
                    flush=True,
                )
                if best is None or dt < best[0]:
                    best = (dt, label)
            except Exception as e:
                print(f"[{m}x{k}x{n}] {label}: FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)
        if best:
            print(f"[{m}x{k}x{n}] BEST: {best[1]}", flush=True)


if __name__ == "__main__":
    main()
