"""Compare flash v1 vs v2 (sublane-contraction QK^T) on SD1.5 hot shapes,
check numerics, then time in-jit."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from lightdiffusion_next_tpu.utils import state_dict as sd_utils

sd_utils.enable_compilation_cache()
from lightdiffusion_next_tpu.ops import flash_attention as fa

sys.path.insert(0, "/root/repo")
import _flash_v2 as fa2

N_IN = 30


def timeit_once(fn, *args):
    out = fn(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / N_IN


rng = np.random.default_rng(0)

# numerics check first (small shape)
q = jnp.asarray(rng.standard_normal((1, 2, 512, 40)) * 0.5, dtype=jnp.bfloat16)
r1 = np.asarray(fa.flash_attention(q, q, q), dtype=np.float32)
r2 = np.asarray(fa2.flash_attention_v2(q, q, q), dtype=np.float32)
r3 = np.asarray(fa2.flash_attention_v2(q, q, q, bf16_exp=True), dtype=np.float32)
print("v2 vs v1 max abs diff:", np.abs(r1 - r2).max(), flush=True)
print("v2-bf16exp vs v1 diff:", np.abs(r1 - r3).max(), flush=True)

for label, (b, h, L, d) in {
    "A b=8 h=8 L=4096 d=40": (8, 8, 4096, 40),
    "B b=2 h=8 L=16384 d=40": (2, 8, 16384, 40),
}.items():
    q = jnp.asarray(rng.standard_normal((b, h, L, d)) * 0.1, dtype=jnp.bfloat16)

    def mk(fn, **kw):
        @jax.jit
        def loop(q):
            def body(i, acc):
                return fn(acc, acc, acc, **kw)
            return jax.lax.fori_loop(0, N_IN, body, q)
        return loop

    gf = 4 * b * h * L * L * d / 1e9
    for name, loop in [
        ("v1           ", mk(fa.flash_attention)),
        ("v2           ", mk(fa2.flash_attention_v2)),
        ("v2 bf16exp   ", mk(fa2.flash_attention_v2, bf16_exp=True)),
        ("v2 bq1024    ", mk(fa2.flash_attention_v2, block_q=1024)),
        ("v2 bq1024 bf ", mk(fa2.flash_attention_v2, block_q=1024, bf16_exp=True)),
    ]:
        try:
            t = timeit_once(loop, q)
            print(f"{label} {name}: {t*1e3:8.3f} ms ({gf/t/1e3:6.1f} TF/s useful)", flush=True)
        except Exception as e:
            print(f"{label} {name}: FAIL {type(e).__name__}", flush=True)
