"""Per-op microbench with the repeat loop INSIDE one jit (fori_loop), so
axon-relay per-call dispatch latency cannot pollute per-op cost."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from lightdiffusion_next_tpu.utils import state_dict as sd_utils

sd_utils.enable_compilation_cache()
from lightdiffusion_next_tpu.ops import attention as attn_mod
from lightdiffusion_next_tpu.ops import nn as nn_ops

N_IN = 50


def timeit_once(fn, *args):
    out = fn(*args)  # compile+run
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / N_IN


rng = np.random.default_rng(0)

# conv3x3 in-loop
for hw, cin in ((128, 320), (64, 640), (32, 1280)):
    x = jnp.asarray(rng.standard_normal((2, hw, hw, cin)), dtype=jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, cin, cin)) * 0.02, dtype=jnp.bfloat16)

    @jax.jit
    def loop(x, w):
        def body(i, acc):
            return nn_ops.conv2d(acc, w, padding=1) * 0.1
        return jax.lax.fori_loop(0, N_IN, body, x)

    t = timeit_once(loop, x, w)
    gf = 2 * 2 * hw * hw * cin * cin * 9 / 1e9
    print(f"conv3x3 {hw:4d}^2 c={cin:4d}: {t*1e3:8.3f} ms/op ({gf/t/1e3:6.1f} TF/s)", flush=True)

# self-attention in-loop (flash kernel)
for L, ch in ((16384, 320), (4096, 640), (1024, 1280)):
    q = jnp.asarray(rng.standard_normal((2, L, ch)) * 0.1, dtype=jnp.bfloat16)

    @jax.jit
    def loop_a(q):
        def body(i, acc):
            return attn_mod.attention(acc, acc, acc, 8)
        return jax.lax.fori_loop(0, N_IN, body, q)

    t = timeit_once(loop_a, q)
    gf = 4 * 2 * L * L * ch / 1e9
    print(f"flash-attn L={L:6d} c={ch:4d}: {t*1e3:8.3f} ms/op ({gf/t/1e3:6.1f} TF/s)", flush=True)

# cross-attention 77 tokens in-loop
for L, ch in ((16384, 320), (4096, 640)):
    q = jnp.asarray(rng.standard_normal((2, L, ch)) * 0.1, dtype=jnp.bfloat16)
    kv = jnp.asarray(rng.standard_normal((2, 77, ch)) * 0.1, dtype=jnp.bfloat16)

    @jax.jit
    def loop_x(q, kv):
        def body(i, acc):
            return attn_mod.attention(acc, kv, kv, 8)
        return jax.lax.fori_loop(0, N_IN, body, q)

    t = timeit_once(loop_x, q, kv)
    print(f"cross-attn L={L:6d} c={ch:4d}: {t*1e3:8.3f} ms/op", flush=True)

# groupnorm+silu in-loop
for hw, c in ((128, 320), (64, 640)):
    x = jnp.asarray(rng.standard_normal((2, hw, hw, c)), dtype=jnp.bfloat16)
    s = jnp.ones((c,), jnp.float32)

    @jax.jit
    def loop_g(x, s):
        def body(i, acc):
            return nn_ops.silu(nn_ops.group_norm(acc, s, s)).astype(acc.dtype)
        return jax.lax.fori_loop(0, N_IN, body, x)

    t = timeit_once(loop_g, x, s)
    print(f"gn+silu {hw:4d}^2 c={c:4d}: {t*1e3:8.3f} ms/op", flush=True)

# linear (qkv-ish) in-loop
for L, ch in ((16384, 320), (4096, 640)):
    x = jnp.asarray(rng.standard_normal((2, L, ch)) * 0.1, dtype=jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((ch, ch)) * 0.02, dtype=jnp.bfloat16)

    @jax.jit
    def loop_l(x, w):
        def body(i, acc):
            return nn_ops.linear(acc, w)
        return jax.lax.fori_loop(0, N_IN, body, x)

    t = timeit_once(loop_l, x, w)
    gf = 2 * 2 * L * ch * ch / 1e9
    print(f"linear  L={L:6d} c={ch:4d}: {t*1e3:8.3f} ms/op ({gf/t/1e3:6.1f} TF/s)", flush=True)
