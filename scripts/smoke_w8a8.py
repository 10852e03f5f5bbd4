"""W8A8 on-chip smoke + A/B at real Flux matmul shapes.

First run after any kernel change: confirms Mosaic compiles the s8 x s8
MXU contraction, checks numerics against the bf16-dequant kernel, and
times both kernels (chained-jit relative comparison — absolute single-op
numbers over the axon relay are unreliable, see ARCHITECTURE.md; treat
these as A/B ratios only, end-to-end bench_flux --w8a8 is the truth).

Run from the repo root on the TPU:  python scripts/smoke_w8a8.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np


# Flux hot shapes at 1024^2 (+256 text tokens): M=4352, plus the 4096
# image-only single-stream shapes and the three weight shapes.
SHAPES = [
    (4352, 3072, 3072),    # qkv/proj per stream (double blocks)
    (4352, 3072, 12288),   # mlp in
    (4352, 12288, 3072),   # mlp out
    (4352, 3072, 9216),    # single-block linear1_qkv(+mods)
]


def main():
    import bench as _bench

    _bench._probe_devices()
    import jax
    import jax.numpy as jnp

    from lightdiffusion_next_tpu import config as _config
    from lightdiffusion_next_tpu.ops import ggml
    from lightdiffusion_next_tpu.ops import quant_matmul as qm
    from lightdiffusion_next_tpu.utils import state_dict as sd_utils

    sd_utils.enable_compilation_cache()
    rng = np.random.default_rng(0)
    chain = 8  # chained matmuls per timed call to keep the device busy

    for m, k, n in SHAPES:
        w = (rng.standard_normal((n, k)).astype(np.float32) * k**-0.5)
        q, s = ggml.quantize_q8_0(w)
        def make_t8t(q=q, s=s, n=n, k=k):
            return ggml.transpose_for_matmul(
                ggml.QTensor8(jnp.asarray(q), jnp.asarray(s), (n, k))
            )

        t8t = make_t8t()
        # to_w8a8 DONATES its input's code buffer on TPU (by design — see
        # ggml._jitted_requant_col), so convert a fresh upload and keep
        # t8t alive for the bf16-dequant reference/timing below.
        w8 = ggml.to_w8a8({"w": make_t8t()})["w"]
        x = jnp.asarray(
            rng.standard_normal((m, k)).astype(np.float32), jnp.bfloat16
        )

        # -- numerics first (single calls, small row slice): the kernel
        # must match the exact host int8 oracle; drift vs the bf16-dequant
        # kernel quantifies the activation+requant rounding.
        xs = x[:64].astype(jnp.float32)
        xq, sxs = qm.quantize_rows(xs)
        oracle = (
            np.asarray(xq).astype(np.int64) @ np.asarray(w8.qt).astype(np.int64)
        ).astype(np.float64) * np.asarray(sxs) * np.asarray(w8.col_scales)
        interp = jax.default_backend() == "cpu"
        got = np.asarray(
            qm.w8a8_matmul_2d(xs, w8.qt, w8.col_scales,
                              out_dtype=jnp.float32, interpret=interp)
        )
        kerr = np.abs(got - oracle).max() / (np.abs(oracle).max() + 1e-12)
        ref_bf16 = np.asarray(
            qm.quant_matmul(xs, t8t.qt, t8t.scales_t, out_dtype=jnp.float32)
        )
        drift = np.sqrt(((got - ref_bf16) ** 2).mean()) / (
            np.sqrt((ref_bf16**2).mean()) + 1e-12
        )
        status = "OK" if kerr < 1e-5 else "KERNEL MISMATCH"
        print(f"[{m}x{k}x{n}] numerics: kernel-vs-int-oracle rel {kerr:.2e} "
              f"({status}); drift vs bf16-dequant rmse {drift:.4f}",
              flush=True)

        def chain_fn(fn, xs, n_out):
            # feed a (m, k)-shaped view of each output back in so the
            # chain cannot be elided; k != n in general, so tile+slice
            y = fn(xs)
            reps = -(-k // n_out)
            for _ in range(chain - 1):
                xs = jnp.tile(y, (1, reps))[:, :k].astype(jnp.bfloat16)
                y = fn(xs)
            return y

        f_bf16 = _config.ldt_jit(
            lambda xs, t=t8t: chain_fn(
                lambda a: qm.quant_matmul(a, t.qt, t.scales_t), xs, n
            )
        )
        f_w8a8 = _config.ldt_jit(
            lambda xs, t=w8: chain_fn(
                lambda a: qm.w8a8_matmul(a, t.qt, t.col_scales), xs, n
            )
        )
        f_w8a8_bf16mxu = _config.ldt_jit(
            lambda xs, t=w8: chain_fn(
                lambda a: qm.w8a8_matmul_2d(
                    a, t.qt, t.col_scales, out_dtype=a.dtype,
                    int8_mxu=False, interpret=interp,
                ),
                xs, n,
            )
        )

        results = {}
        for name, f in [
            ("bf16-dequant", f_bf16),
            ("w8a8-int8mxu", f_w8a8),
            ("w8a8-bf16mxu", f_w8a8_bf16mxu),
        ]:
            try:
                y = jax.block_until_ready(f(x))
            except Exception as e:  # compile failure is the smoke signal
                print(f"[{m}x{k}x{n}] {name}: FAILED {type(e).__name__}: "
                      f"{str(e)[:300]}", flush=True)
                continue
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(f(x))
                ts.append(time.perf_counter() - t0)
            dt = min(ts) / chain
            tf = 2 * m * k * n / dt / 1e12
            results[name] = (dt, tf, float(jnp.abs(y.astype(jnp.float32)).mean()))
            print(f"[{m}x{k}x{n}] {name}: {dt*1e3:.2f} ms/matmul "
                  f"~{tf:.0f} TF/s chk={results[name][2]:.5f}", flush=True)
        if "bf16-dequant" in results and "w8a8-int8mxu" in results:
            print(f"[{m}x{k}x{n}] speedup int8mxu/bf16: "
                  f"{results['bf16-dequant'][0]/results['w8a8-int8mxu'][0]:.2f}x",
                  flush=True)

        if "--sweep" in sys.argv:
            # explicit w8a8 tile sweep (chained-jit relative numbers):
            # defaults vs the traffic-optimal full-M grid and wider-N picks
            for tm, tk, tn in [
                (None, None, None),   # picker defaults
                (4352, 512, 256),     # full M: x+weights fetched once each
                (4352, 512, 128),
                (2176, 512, 1024),    # wider N (may exceed scoped budget)
                (1088, 512, 1024),
                (2176, 1024, 512),
            ]:
                # _pick_tile snaps any preferred tile to a valid divisor,
                # so explicit preferences are safe at every shape
                label = f"tm={tm},tk={tk},tn={tn}"
                f = _config.ldt_jit(
                    lambda xs, t=w8, a=tm, b=tk, c=tn: chain_fn(
                        lambda q: qm.w8a8_matmul_2d(
                            q.reshape(-1, k), t.qt, t.col_scales,
                            out_dtype=q.dtype, tile_m=a, tile_k=b, tile_n=c,
                            interpret=interp,
                        ),
                        xs, n,
                    )
                )
                try:
                    jax.block_until_ready(f(x))
                    ts = []
                    for _ in range(3):
                        t0 = time.perf_counter()
                        jax.block_until_ready(f(x))
                        ts.append(time.perf_counter() - t0)
                    dt = min(ts) / chain
                    print(f"[{m}x{k}x{n}] sweep {label}: {dt*1e3:.2f} ms "
                          f"~{2*m*k*n/dt/1e12:.0f} TF/s", flush=True)
                except Exception as e:
                    print(f"[{m}x{k}x{n}] sweep {label}: FAILED "
                          f"{type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
