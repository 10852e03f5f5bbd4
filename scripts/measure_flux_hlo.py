"""Production-scale compile-cost evidence for the Flux scan-over-blocks mode.

Lowers the FULL FLUX_DEV forward (19+38 blocks, hidden=3072, 1024px ->
4352 joint tokens) twice — unrolled vs scan-over-stacked-blocks — from
ABSTRACT params (jax.ShapeDtypeStruct leaves; no 12 GB of weights, no
device) and reports trace+lower wall time and StableHLO module size.
This pins the program-size claim (ARCHITECTURE.md §5b-ii; measured 7.2x
smaller StableHLO for Q8_0, 7.6x w8a8, 5.7x dense) at the real shapes,
which the tiny-config test (tests/test_flux_scan.py
test_scan_program_size_constant_in_depth) cannot.

Usage:  python scripts/measure_flux_hlo.py [--quant q8|w8a8|dense]
                                           [--height 1024] [--txt 256]
        python scripts/measure_flux_hlo.py --model t5 [--txt 256]
                 (T5-XXL encoder, 24 blocks at d_model=4096/d_ff=10240 —
                  the same --flux-scan toggle stacks it; see
                  models/clip/t5.py stack_t5_block_params)

The numbers are lowering-side only; on-TPU compile time must still be
measured over the relay (scripts/bench_flux.py --flux-scan when it's up).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# abstract lowering needs no device — and the sandbox's sitecustomize
# re-adds the axon platform over JAX_PLATFORMS=cpu (a dead relay then
# hangs backend init), so force CPU in-process
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from lightdiffusion_next_tpu.models import flux as flux_mod
from lightdiffusion_next_tpu.ops import ggml

QBLOCK = 32


def _abstract_params(cfg: flux_mod.FluxConfig, quant: str):
    """ShapeDtypeStruct param tree with init_params' exact key/shape map
    (models/flux.py init_params), quantized the way the GGUF loader would:
    every 2-D block matmul weight -> QTensor8T (Q8_0 fused layout) or
    QTensor8W (W8A8), biases/norm scales dense."""
    H = cfg.hidden_size
    P = {}

    def sds(shape, dtype=jnp.float32):
        return jax.ShapeDtypeStruct(shape, dtype)

    def lin(key, out_d, in_d, bias=True, quantize=True):
        if quant != "dense" and quantize and in_d % 256 == 0:
            if quant == "w8a8":
                P[key + ".weight"] = ggml.QTensor8W(
                    qt=sds((in_d, out_d), jnp.int8),
                    col_scales=sds((1, out_d), jnp.float32),
                    shape=(out_d, in_d),
                )
            else:
                P[key + ".weight"] = ggml.QTensor8T(
                    qt=sds((in_d, out_d), jnp.int8),
                    scales_t=sds((in_d // QBLOCK, out_d), jnp.float32),
                    shape=(out_d, in_d),
                )
        else:
            P[key + ".weight"] = sds((out_d, in_d))
        if bias:
            P[key + ".bias"] = sds((out_d,))

    def scale(key, d):
        P[key] = sds((d,))

    lin("img_in", H, cfg.in_channels * cfg.patch_size**2, quantize=False)
    lin("txt_in", H, cfg.context_in_dim)
    lin("time_in.in_layer", H, 256)
    lin("time_in.out_layer", H, H)
    lin("vector_in.in_layer", H, cfg.vec_in_dim, quantize=False)
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
    lin("final_layer.linear", cfg.patch_size**2 * cfg.in_channels, H,
        quantize=False)
    lin("final_layer.adaLN_modulation.1", 2 * H, H)
    return P


def _abstract_stack(params, cfg):
    """stack_block_params for abstract leaves (ShapeDtypeStruct cannot ride
    jnp.stack, so re-group/stack the shapes directly)."""
    out = {}
    depths = {"double_blocks": cfg.depth, "single_blocks": cfg.depth_single_blocks}
    per = {g: {} for g in depths}
    for k, v in params.items():
        head, _, rest = k.partition(".")
        if head in depths and rest:
            idx_s, _, rel = rest.partition(".")
            if idx_s.isdigit() and rel:
                per[head].setdefault(rel, {})[int(idx_s)] = v
                continue
        out[k] = v

    def stk(leaf, d):
        def s3(x):
            return jax.ShapeDtypeStruct((d,) + x.shape, x.dtype)

        if isinstance(leaf, ggml.QTensor8T):
            return ggml.StackedQTensor8T(
                qt3=s3(leaf.qt), scales3=s3(leaf.scales_t), shape=leaf.shape
            )
        if isinstance(leaf, ggml.QTensor8W):
            return ggml.StackedQTensor8W(
                qt3=s3(leaf.qt), col_scales3=s3(leaf.col_scales),
                shape=leaf.shape,
            )
        return s3(leaf)

    for head, fams in per.items():
        d = depths[head]
        key = (flux_mod.DOUBLE_STACK_KEY if head == "double_blocks"
               else flux_mod.SINGLE_STACK_KEY)
        out[key] = {rel: stk(by[0], d) for rel, by in fams.items()}
    return out


def _abstract_t5_params(cfg, quant: str):
    """ShapeDtypeStruct tree with init_params' key map (models/clip/t5.py),
    block matmul weights quantized the way gguf_clip_loader +
    to_device_quantized lay them out (QTensor8T fused layout)."""
    from lightdiffusion_next_tpu.models.clip import t5 as t5_mod

    P = {}

    def sds(shape, dtype=jnp.float32):
        return jax.ShapeDtypeStruct(shape, dtype)

    def lin(key, out_d, in_d):
        if quant == "dense":
            P[key + ".weight"] = sds((out_d, in_d))
        else:
            P[key + ".weight"] = ggml.QTensor8T(
                qt=sds((in_d, out_d), jnp.int8),
                scales_t=sds((in_d // QBLOCK, out_d), jnp.float32),
                shape=(out_d, in_d),
            )

    P["shared.weight"] = sds((cfg.vocab_size, cfg.d_model))
    P[
        "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"
    ] = sds((cfg.relative_num_buckets, cfg.num_heads))
    for i in range(cfg.num_layers):
        pre = f"encoder.block.{i}."
        for nme in "qkvo":
            lin(pre + f"layer.0.SelfAttention.{nme}", cfg.d_model, cfg.d_model)
        P[pre + "layer.0.layer_norm.weight"] = sds((cfg.d_model,))
        lin(pre + "layer.1.DenseReluDense.wi_0", cfg.d_ff, cfg.d_model)
        lin(pre + "layer.1.DenseReluDense.wi_1", cfg.d_ff, cfg.d_model)
        lin(pre + "layer.1.DenseReluDense.wo", cfg.d_model, cfg.d_ff)
        P[pre + "layer.1.layer_norm.weight"] = sds((cfg.d_model,))
    P["encoder.final_layer_norm.weight"] = sds((cfg.d_model,))
    return P


def _abstract_t5_stack(params, cfg):
    """stack_t5_block_params for abstract leaves (shape-level re-group)."""
    from lightdiffusion_next_tpu.models.clip import t5 as t5_mod

    out = {}
    fams = {}
    pre = "encoder.block."
    for k, v in params.items():
        if k.startswith(pre):
            idx_s, _, rel = k[len(pre):].partition(".")
            if idx_s.isdigit() and rel and rel != t5_mod._BIAS_REL:
                fams.setdefault(rel, {})[int(idx_s)] = v
                continue
        out[k] = v

    def stk(leaf, d):
        def s3(x):
            return jax.ShapeDtypeStruct((d,) + x.shape, x.dtype)

        if isinstance(leaf, ggml.QTensor8T):
            return ggml.StackedQTensor8T(
                qt3=s3(leaf.qt), scales3=s3(leaf.scales_t), shape=leaf.shape
            )
        return s3(leaf)

    out[t5_mod.T5_STACK_KEY] = {
        rel: stk(by[0], cfg.num_layers) for rel, by in fams.items()
    }
    return out


def _lower_t5(quant: str, txt: int):
    from lightdiffusion_next_tpu.models.clip import t5 as t5_mod

    cfg = t5_mod.T5_XXL
    tokens = jax.ShapeDtypeStruct((1, txt), jnp.int32)
    params = _abstract_t5_params(cfg, quant)
    res = {"model": "t5-xxl", "quant": quant, "txt_tokens": txt}

    def lower(p, tag):
        fn = jax.jit(
            lambda pp, tt: t5_mod._apply_t5(
                pp, tt, cfg=cfg, compute_dtype=jnp.bfloat16
            )
        )
        t0 = time.perf_counter()
        text = fn.lower(p, tokens).as_text()
        r = {
            "trace_lower_s": round(time.perf_counter() - t0, 2),
            "stablehlo_bytes": len(text),
            "stablehlo_lines": text.count("\n"),
        }
        print(f"# t5 {tag}: {json.dumps(r)}", flush=True)
        return r

    res["scan"] = lower(_abstract_t5_stack(params, cfg), "scan")
    res["unrolled"] = lower(params, "unrolled")
    res["hlo_size_ratio"] = round(
        res["unrolled"]["stablehlo_bytes"] / res["scan"]["stablehlo_bytes"], 1
    )
    print(json.dumps(res))


def _lower(cfg, params, x, t, ctx, y, tag):
    fn = jax.jit(
        lambda p, xx, tt, cc, yy: flux_mod.apply_flux(
            p, xx, tt, cc, yy, cfg=cfg
        )
    )
    t0 = time.perf_counter()
    lowered = fn.lower(params, x, t, ctx, y)
    trace_s = time.perf_counter() - t0
    text = lowered.as_text()
    res = {
        "trace_lower_s": round(trace_s, 2),
        "stablehlo_bytes": len(text),
        "stablehlo_lines": text.count("\n"),
    }
    print(f"# {tag}: {json.dumps(res)}", flush=True)
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quant", choices=("q8", "w8a8", "dense"), default="q8")
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--txt", type=int, default=256)
    ap.add_argument("--model", choices=("flux", "t5"), default="flux")
    args = ap.parse_args()

    if args.model == "t5":
        _lower_t5(args.quant, args.txt)
        return

    cfg = flux_mod.FLUX_DEV
    h = args.height // 8
    x = jax.ShapeDtypeStruct((1, h, h, cfg.in_channels), jnp.float32)
    t = jax.ShapeDtypeStruct((1,), jnp.float32)
    ctx = jax.ShapeDtypeStruct((1, args.txt, cfg.context_in_dim), jnp.float32)
    y = jax.ShapeDtypeStruct((1, cfg.vec_in_dim), jnp.float32)

    params = _abstract_params(cfg, args.quant)
    res = {"quant": args.quant, "height": args.height,
           "img_tokens": (h // 2) ** 2, "txt_tokens": args.txt}
    res["scan"] = _lower(cfg, _abstract_stack(params, cfg), x, t, ctx, y, "scan")
    res["unrolled"] = _lower(cfg, params, x, t, ctx, y, "unrolled")
    res["hlo_size_ratio"] = round(
        res["unrolled"]["stablehlo_bytes"] / res["scan"]["stablehlo_bytes"], 1
    )
    print(json.dumps(res))


if __name__ == "__main__":
    main()
