"""Compile-only HBM budget probe for the Flux forward: unrolled vs scan.

Round-4 finding: at production size (1024px, 12B Q8_0) the scan-over-
blocks program OOMs on a 16 GB v5e where the unrolled one runs — twice,
in back-to-back bench_flux runs (RESOURCE_EXHAUSTED at execution, after
stacking succeeded). This probe answers WHERE the memory goes without
uploading 13 GB: it lowers the forward against ShapeDtypeStruct params
(no device buffers at all), compiles on whatever backend is attached,
and prints ``compiled.memory_analysis()`` — argument/output/temp/alias
bytes — plus lower+compile wall time (which, run cold, is also the
compile-time A/B the abstract-lowering figures in ARCHITECTURE §5b-ii
could not give).

Usage:
  python scripts/probe_flux_memory.py [--scan] [--w8a8] [--steps N]
      [--tiny] [--exec clean|churn]
--tiny swaps in a 2-double/4-single 128-hidden config so the probe is
CPU-testable; --steps N wraps the forward in an N-step lax.scan to
mirror the sampler's outer scan structure (default 1: forward only).

--exec makes the probe ALLOCATE (zeros) and RUN the compiled program,
because round 4's compile-only analysis came back identical for scan
and unrolled (est_peak ~11.8 GB on a 16 GB chip) while the real scan
bench OOMs at execution — so the difference must be something the
analysis cannot see. Hypothesis: HBM fragmentation. The serving load
path uploads ~700 small per-block buffers, requants/permutes them
(every code buffer reallocated), then stacks them into ~30 buffers of
0.5-2.5 GB while freeing the small ones — an allocator cannot compact
live buffers, so the 4.6 GB of headroom ends up as holes between giant
stacks and the ~0.2-0.4 GB contiguous activation temps may not fit.
  --exec clean  allocates the (stacked, for --scan) layout directly —
                big buffers into a fresh heap — then runs.
  --exec churn  replays the serving order: small unstacked leaves,
                one copy-reallocation round (standing in for the w8a8
                requant), then device-side stack_block_params, then run.
If churn OOMs where clean runs, fragmentation is confirmed and the fix
is host-side param prep (upload only the final stacked buffers).
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def abstract_q8_params(cfg, w8a8=False, quant_min_dim=256):
    """ShapeDtypeStruct param dict in the fused Q8_0 (or W8A8) device
    layout — same keys/shapes as scripts.bench_flux.build_q8_params +
    upload, with zero bytes allocated."""
    from lightdiffusion_next_tpu.ops import ggml

    H = cfg.hidden_size
    P = {}

    def sds(shape, dtype):
        return jax.ShapeDtypeStruct(shape, dtype)

    def lin(key, out_d, in_d, bias=True):
        if out_d >= quant_min_dim and in_d >= quant_min_dim and in_d % 32 == 0:
            if w8a8:
                P[key + ".weight"] = ggml.QTensor8W(
                    qt=sds((in_d, out_d), jnp.int8),
                    col_scales=sds((1, out_d), jnp.float32),
                    shape=(out_d, in_d),
                )
            else:
                P[key + ".weight"] = ggml.QTensor8T(
                    qt=sds((in_d, out_d), jnp.int8),
                    scales_t=sds((in_d // 32, out_d), jnp.float32),
                    shape=(out_d, in_d),
                )
        else:
            P[key + ".weight"] = sds((out_d, in_d), cfg.dtype)
        if bias:
            P[key + ".bias"] = sds((out_d,), cfg.dtype)

    def scale(key, d):
        P[key] = sds((d,), cfg.dtype)

    lin("img_in", H, cfg.in_channels * cfg.patch_size**2)
    lin("txt_in", H, cfg.context_in_dim)
    lin("time_in.in_layer", H, 256)
    lin("time_in.out_layer", H, H)
    lin("vector_in.in_layer", H, cfg.vec_in_dim)
    lin("vector_in.out_layer", H, H)
    if cfg.guidance_embed:
        lin("guidance_in.in_layer", H, 256)
        lin("guidance_in.out_layer", H, H)
    mlp_hidden = int(H * cfg.mlp_ratio)
    for i in range(cfg.depth):
        pre = f"double_blocks.{i}."
        for s in ("img", "txt"):
            lin(pre + f"{s}_mod.lin", 6 * H, H)
            lin(pre + f"{s}_attn.qkv", 3 * H, H, bias=cfg.qkv_bias)
            scale(pre + f"{s}_attn.norm.query_norm.scale", cfg.head_dim)
            scale(pre + f"{s}_attn.norm.key_norm.scale", cfg.head_dim)
            lin(pre + f"{s}_attn.proj", H, H)
            lin(pre + f"{s}_mlp.0", mlp_hidden, H)
            lin(pre + f"{s}_mlp.2", H, mlp_hidden)
    for i in range(cfg.depth_single_blocks):
        pre = f"single_blocks.{i}."
        lin(pre + "linear1", 3 * H + mlp_hidden, H)
        lin(pre + "linear2", H, H + mlp_hidden)
        scale(pre + "norm.query_norm.scale", cfg.head_dim)
        scale(pre + "norm.key_norm.scale", cfg.head_dim)
        lin(pre + "modulation.lin", 3 * H, H)
    lin("final_layer.linear", cfg.patch_size**2 * cfg.in_channels, H)
    lin("final_layer.adaLN_modulation.1", 2 * H, H)
    return P


def abstract_stack(params, cfg):
    """stack_block_params for abstract leaves: same grouping/validation,
    ShapeDtypeStruct stacks instead of jnp.stack (which needs buffers)."""
    from lightdiffusion_next_tpu.models import flux as flux_mod
    from lightdiffusion_next_tpu.ops import ggml

    out, fams = flux_mod.group_block_params(params, cfg)

    def sds(shape, dtype):
        return jax.ShapeDtypeStruct(shape, dtype)

    def stack(leaves):
        d = len(leaves)
        first = leaves[0]
        if isinstance(first, ggml.QTensor8T):
            return ggml.StackedQTensor8T(
                qt3=sds((d,) + first.qt.shape, jnp.int8),
                scales3=sds((d,) + first.scales_t.shape, jnp.float32),
                shape=first.shape,
            )
        if isinstance(first, ggml.QTensor8W):
            return ggml.StackedQTensor8W(
                qt3=sds((d,) + first.qt.shape, jnp.int8),
                col_scales3=sds((d,) + first.col_scales.shape, jnp.float32),
                shape=first.shape,
            )
        return sds((d,) + first.shape, first.dtype)

    for head, groups in fams.items():
        key = (
            flux_mod.DOUBLE_STACK_KEY
            if head == "double_blocks"
            else flux_mod.SINGLE_STACK_KEY
        )
        out[key] = {rel: stack(leaves) for rel, leaves in groups.items()}
    return out


def concretize(tree):
    """ShapeDtypeStruct pytree -> on-device zeros, leaf by leaf (each
    jnp.zeros is a device-side fill; nothing crosses the relay)."""

    def zero(leaf):
        if isinstance(leaf, jax.ShapeDtypeStruct):
            return jnp.zeros(leaf.shape, leaf.dtype)
        return leaf

    return jax.tree.map(zero, tree)


def churn_copy(params):
    """One copy-reallocation round, leaf family by leaf family, awaiting
    each before dropping the source — the w8a8 requant's allocation
    pattern (to_w8a8 donates, so old and new code buffers never coexist
    beyond one leaf)."""
    for k in sorted(params):
        fresh = jax.tree.map(jnp.copy, params[k])
        jax.block_until_ready(fresh)
        params[k] = fresh
    return params


def main():
    from lightdiffusion_next_tpu.models import flux as flux_mod

    use_scan = "--scan" in sys.argv
    use_w8a8 = "--w8a8" in sys.argv
    tiny = "--tiny" in sys.argv
    exec_mode = None
    if "--exec" in sys.argv:
        exec_mode = sys.argv[sys.argv.index("--exec") + 1]
        if exec_mode not in ("clean", "churn"):
            raise SystemExit("--exec takes 'clean' or 'churn'")
    steps = 1
    if "--steps" in sys.argv:
        steps = int(sys.argv[sys.argv.index("--steps") + 1])

    import dataclasses

    from lightdiffusion_next_tpu import config as _config

    cfg = dataclasses.replace(
        flux_mod.FLUX_DEV,
        dtype=_config.get_config().dtypes.compute_dtype,
    )
    hw = 128  # 1024 px latent
    if tiny:
        cfg = dataclasses.replace(
            cfg, hidden_size=128, depth=2, depth_single_blocks=4,
            num_heads=1, mlp_ratio=4.0, axes_dim=(32, 48, 48),
        )
        hw = 16

    params = abstract_q8_params(cfg, w8a8=use_w8a8)
    if exec_mode == "churn":
        # serving order: small unstacked leaves first, churned, stacked on
        # device. (clean mode stacks abstractly and allocates big direct.)
        t0 = time.perf_counter()
        params = churn_copy(concretize(params))
        if use_scan:
            params = flux_mod.stack_block_params(params, cfg)
            jax.block_until_ready(
                jax.tree.leaves(params[flux_mod.DOUBLE_STACK_KEY])
            )
        t_alloc = time.perf_counter() - t0
    else:
        if use_scan:
            params = abstract_stack(params, cfg)
        if exec_mode == "clean":
            t0 = time.perf_counter()
            params = concretize(params)
            jax.block_until_ready(jax.tree.leaves(params))
            t_alloc = time.perf_counter() - t0

    x = jax.ShapeDtypeStruct((1, hw, hw, 16), jnp.bfloat16)
    t = jax.ShapeDtypeStruct((1,), jnp.float32)
    ctx = jax.ShapeDtypeStruct((1, 256, cfg.context_in_dim), jnp.bfloat16)
    y = jax.ShapeDtypeStruct((1, cfg.vec_in_dim), jnp.bfloat16)
    g = jax.ShapeDtypeStruct((1,), jnp.float32)

    def forward(p, x, t, ctx, y, g):
        return flux_mod.apply_flux(p, x, t, ctx, y, guidance=g, cfg=cfg)

    if steps == 1:
        fn = forward
    else:
        # mirror the sampler: outer lax.scan over steps, model in the body
        def fn(p, x, t, ctx, y, g):
            def body(carry, _):
                out = forward(p, carry, t, ctx, y, g)
                return (carry - 0.05 * out.astype(carry.dtype)), None

            carry, _ = jax.lax.scan(body, x, None, length=steps)
            return carry

        x = jax.ShapeDtypeStruct((1, hw, hw, 16), jnp.float32)

    if exec_mode:
        x = concretize(x)
        t, ctx, y, g = (concretize(a) for a in (t, ctx, y, g))

    t0 = time.perf_counter()
    # ldt_jit, not jax.jit: the serving path compiles with the raised
    # xla_tpu_scoped_vmem_limit_kib (config.SCOPED_VMEM_LIMIT_KIB) that the
    # stacked-kernel tile picks are budgeted against — a plain jax.jit
    # replays the 16 MiB default and the compile-helper rejects programs
    # the real bench runs (seen 2026-08-19: 19 MB scoped alloc vs 16 MB).
    lowered = _config.ldt_jit(fn).lower(params, x, t, ctx, y, g)
    t_lower = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0

    rec = {
        "variant": ("scan" if use_scan else "unrolled")
        + ("_w8a8" if use_w8a8 else "_q8"),
        "steps": steps,
        "backend": jax.default_backend(),
        "lower_s": round(t_lower, 1),
        "compile_s": round(t_compile, 1),
    }
    if exec_mode:
        rec["exec_mode"] = exec_mode
        rec["alloc_s"] = round(t_alloc, 1)
        t0 = time.perf_counter()
        try:
            out = compiled(params, x, t, ctx, y, g)
            jax.block_until_ready(out)
            rec["exec_s"] = round(time.perf_counter() - t0, 1)
            rec["exec_ok"] = True
        except Exception as e:
            rec["exec_ok"] = False
            rec["exec_error"] = repr(e)[:300]
    try:
        ma = compiled.memory_analysis()
        for name in (
            "argument_size_in_bytes",
            "output_size_in_bytes",
            "temp_size_in_bytes",
            "alias_size_in_bytes",
            "generated_code_size_in_bytes",
        ):
            v = getattr(ma, name, None)
            if v is not None:
                rec[name.replace("_size_in_bytes", "_mb")] = round(
                    v / (1 << 20), 1
                )
        peak = sum(
            rec.get(k, 0.0) for k in ("argument_mb", "output_mb", "temp_mb")
        ) - rec.get("alias_mb", 0.0)
        rec["est_peak_mb"] = round(peak, 1)
    except Exception as e:  # CPU backend may not implement it
        rec["memory_analysis_error"] = repr(e)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
