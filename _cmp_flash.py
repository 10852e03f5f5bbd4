"""Head-to-head: our flash kernel vs jax.experimental.pallas.ops.tpu
flash_attention on the SD1.5 hot shapes."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from lightdiffusion_next_tpu.utils import state_dict as sd_utils

sd_utils.enable_compilation_cache()
from lightdiffusion_next_tpu.ops import flash_attention as fa

try:
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention as jax_fa,
        BlockSizes,
    )
    HAVE_JAX_FA = True
except Exception as e:
    print("no jax tpu flash:", e)
    HAVE_JAX_FA = False

N_IN = 30


def timeit_once(fn, *args):
    out = fn(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / N_IN


rng = np.random.default_rng(0)
for label, (b, h, L, d) in {
    "A b=8 h=8 L=4096 d=40": (8, 8, 4096, 40),
    "B b=2 h=8 L=16384 d=40": (2, 8, 16384, 40),
}.items():
    q = jnp.asarray(rng.standard_normal((b, h, L, d)) * 0.1, dtype=jnp.bfloat16)

    @jax.jit
    def loop_ours(q):
        def body(i, acc):
            return fa.flash_attention(acc, acc, acc)
        return jax.lax.fori_loop(0, N_IN, body, q)

    t = timeit_once(loop_ours, q)
    gf = 4 * b * h * L * L * d / 1e9
    print(f"{label} ours   : {t*1e3:8.3f} ms ({gf/t/1e3:6.1f} TF/s useful)", flush=True)

    if HAVE_JAX_FA:
        qp = jnp.pad(q, ((0, 0), (0, 0), (0, 0), (0, 128 - d)))
        sm = 1.0 / np.sqrt(d)

        @jax.jit
        def loop_jax(qp):
            def body(i, acc):
                o = jax_fa(acc * sm, acc, acc, causal=False, sm_scale=1.0)
                return o.astype(acc.dtype)
            return jax.lax.fori_loop(0, N_IN, body, qp)

        try:
            t = timeit_once(loop_jax, qp)
            print(f"{label} jax-fa : {t*1e3:8.3f} ms ({gf/t/1e3:6.1f} TF/s useful)", flush=True)
        except Exception as e:
            print(f"{label} jax-fa : FAIL {type(e).__name__}: {e}", flush=True)
