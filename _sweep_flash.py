"""Sweep flash-attention block sizes for the shapes that dominate the
SD1.5 1024px step (from the jax.profiler trace):
  A: MSW level0 windows: bh=64, L=4096, d=40   (5 calls x 16.5 ms!)
  B: plain 16k:          bh=16, L=16384, d=40
  C: MSW level1 windows: bh=64, L=1024, d=80
In-jit fori_loop timing (relay-safe)."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from lightdiffusion_next_tpu.utils import state_dict as sd_utils

sd_utils.enable_compilation_cache()
from lightdiffusion_next_tpu.ops import flash_attention as fa

N_IN = 30


def timeit_once(fn, *args):
    out = fn(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / N_IN


rng = np.random.default_rng(0)
shapes = {
    "A bh=64 L=4096 d=40": (64, 4096, 40),
    "B bh=16 L=16384 d=40": (16, 16384, 40),
    "C bh=64 L=1024 d=80": (64, 1024, 80),
}
combos = [(512, 1024), (1024, 512), (1024, 1024), (1024, 2048), (2048, 1024),
          (2048, 2048), (512, 4096), (4096, 512), (256, 4096)]

for label, (bh, L, d) in shapes.items():
    q = jnp.asarray(rng.standard_normal((1, bh, L, d)) * 0.1, dtype=jnp.bfloat16)
    best = None
    for bq, bk in combos:
        if bq > L or bk > L:
            continue

        @jax.jit
        def loop(q, bq=bq, bk=bk):
            def body(i, acc):
                return fa.flash_attention(acc, acc, acc, block_q=bq, block_k=bk)
            return jax.lax.fori_loop(0, N_IN, body, q)

        try:
            t = timeit_once(loop, q)
        except Exception as e:
            print(f"{label} bq={bq:5d} bk={bk:5d}: FAIL {type(e).__name__}", flush=True)
            continue
        gf = 4 * bh * L * L * d / 1e9
        print(f"{label} bq={bq:5d} bk={bk:5d}: {t*1e3:8.3f} ms ({gf/t/1e3:6.1f} TF/s useful)", flush=True)
        if best is None or t < best[0]:
            best = (t, bq, bk)
    print(f"  BEST {label}: bq={best[1]} bk={best[2]} {best[0]*1e3:.3f} ms", flush=True)
