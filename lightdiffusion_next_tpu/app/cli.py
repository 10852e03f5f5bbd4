"""Command-line interface.

Counterpart of the reference CLI (src/user/pipeline.py:521-639 argparse).
Usage:
    python -m lightdiffusion_next_tpu.app.cli "a cat" 512 512 1 1 --hires-fix
"""

from __future__ import annotations

import argparse
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="lightdiffusion-tpu",
        description="TPU-native LightDiffusion pipeline",
    )
    p.add_argument("prompt", help="prompt text (or image path with --img2img)")
    p.add_argument("width", type=int)
    p.add_argument("height", type=int)
    p.add_argument("number", type=int, nargs="?", default=1)
    p.add_argument("batch", type=int, nargs="?", default=1)
    p.add_argument("--hires-fix", action="store_true")
    p.add_argument("--adetailer", action="store_true")
    p.add_argument("--enhance-prompt", action="store_true")
    p.add_argument("--img2img", action="store_true")
    p.add_argument("--stable-fast", action="store_true",
                   help="accepted for parity; jit compilation is always on")
    p.add_argument("--reuse-seed", action="store_true")
    p.add_argument("--flux", action="store_true")
    p.add_argument("--prio-speed", action="store_true")
    p.add_argument("--autohdr", action="store_true")
    p.add_argument("--realistic-model", action="store_true")
    p.add_argument("--negative-prompt", default=None)
    p.add_argument("--multiscale-preset", default=None,
                   choices=["quality", "performance", "balanced", "disabled"])
    p.add_argument("--no-multiscale", action="store_true")
    p.add_argument("--multiscale-factor", type=float, default=0.5)
    p.add_argument("--multiscale-fullres-start", type=int, default=3)
    p.add_argument("--multiscale-fullres-end", type=int, default=8)
    p.add_argument("--multiscale-intermittent-fullres", action="store_true")
    p.add_argument("--output-dir", default="./output")
    p.add_argument("--preview", action="store_true",
                   help="write step previews to <output>/preview and track "
                        "progress (same channel the WebUI polls)")
    p.add_argument("--w8a8", action="store_true",
                   help="Flux: requantize Q8_0 matmul weights per-column and "
                        "run int8x int8 MXU matmuls (measured -18.5% s/image "
                        "on TPU, latent RMSE 1.5%; the TPU default — this "
                        "flag forces it on elsewhere; no reference analogue)")
    p.add_argument("--no-w8a8", action="store_true",
                   help="Flux: force the Q8_0 bf16-compute path even on TPU "
                        "(overrides the w8a8 auto default)")
    p.add_argument("--sage-attention", action="store_true",
                   help="run long-sequence attention as int8 (SageAttention-"
                        "style: mean-centered K/V, per-token int8 Q/K, int8 "
                        "P.V). Measured 0.95-1.01x on v5e — no win there; "
                        "kept for parity experiments (no reference analogue)")
    p.add_argument("--fused-attn", action="store_true",
                   help="Flux: run QKNorm+RoPE+head indexing inside the "
                        "flash attention kernel (weights permuted to the "
                        "half-split RoPE basis at load). Measured -16% "
                        "s/image on TPU (the TPU default — this flag forces "
                        "it on elsewhere); single-device, unrolled, "
                        "LoRA-free (no reference analogue)")
    p.add_argument("--no-fused-attn", action="store_true",
                   help="Flux: force the unfused attention prologue even on "
                        "TPU (overrides the fused-attn auto default)")
    p.add_argument("--flux-scan", action="store_true",
                   help="Flux: scan over stacked DiT blocks instead of "
                        "unrolling 57 blocks of HLO — 7.2x smaller program, "
                        "measured 2x faster cold compile AND -4% s/image "
                        "(the TPU default — this flag forces it on "
                        "elsewhere); single device or LDT_FLUX_TP=spmd "
                        "(GSPMD TP keeps the unroll; no reference analogue)")
    p.add_argument("--no-flux-scan", action="store_true",
                   help="Flux: force the unrolled forward even on TPU "
                        "(required when patching Flux with a LoRA)")
    p.add_argument("--fused-ew", action="store_true",
                   help="Flux: fuse the LN/modulation/gelu row-quant "
                        "prologues and gate/bias/residual epilogues into "
                        "the W8A8 matmul kernels. Measured -10.6% s/image "
                        "at the full default stack (the TPU default — "
                        "this flag forces it on elsewhere; only reachable "
                        "with w8a8; no reference analogue)")
    p.add_argument("--no-fused-ew", action="store_true",
                   help="Flux: keep the separate XLA elementwise passes "
                        "around the W8A8 matmuls (overrides the fused-ew "
                        "auto default)")
    p.add_argument("--packed-attn", action="store_true",
                   help="SD1.5: pack G=floor(128/head_dim) heads per "
                        "128-lane MXU tile in the flash kernel (d=40 -> 3 "
                        "heads, padded-MAC bill 3.2x -> 1.07x). Kernel "
                        "1.05-1.17x after the VPU-lean softmax (the TPU "
                        "default — this flag forces it on elsewhere; no "
                        "reference analogue)")
    p.add_argument("--no-packed-attn", action="store_true",
                   help="SD1.5: keep one head per MXU tile even on TPU "
                        "(overrides the packed-attn auto default)")
    p.add_argument("--qkv-fuse", action="store_true",
                   help="UNet attention: one wide q|k|v projection matmul "
                        "instead of three narrow ones (identical math; "
                        "the default everywhere — this flag forces it on "
                        "after a --no-qkv-fuse settings file)")
    p.add_argument("--no-qkv-fuse", action="store_true",
                   help="UNet attention: keep separate to_q/to_k/to_v "
                        "matmuls (overrides the qkv-fuse auto default)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from lightdiffusion_next_tpu.pipelines.pipeline import pipeline

    if args.w8a8 and args.no_w8a8:
        raise SystemExit("--w8a8 and --no-w8a8 are mutually exclusive")
    if args.fused_attn and args.no_fused_attn:
        raise SystemExit(
            "--fused-attn and --no-fused-attn are mutually exclusive")
    if args.flux_scan and args.no_flux_scan:
        raise SystemExit(
            "--flux-scan and --no-flux-scan are mutually exclusive")
    if args.fused_ew and args.no_fused_ew:
        raise SystemExit(
            "--fused-ew and --no-fused-ew are mutually exclusive")
    if args.packed_attn and args.no_packed_attn:
        raise SystemExit(
            "--packed-attn and --no-packed-attn are mutually exclusive")
    if args.qkv_fuse and args.no_qkv_fuse:
        raise SystemExit(
            "--qkv-fuse and --no-qkv-fuse are mutually exclusive")
    if (args.w8a8 or args.no_w8a8 or args.sage_attention or args.flux_scan
            or args.no_flux_scan or args.fused_attn or args.no_fused_attn
            or args.fused_ew or args.no_fused_ew
            or args.packed_attn or args.no_packed_attn
            or args.qkv_fuse or args.no_qkv_fuse):
        import dataclasses as _dc

        from lightdiffusion_next_tpu import config as _config

        _config.set_config(_dc.replace(
            _config.get_config(),
            w8a8=(True if args.w8a8
                  else False if args.no_w8a8
                  else _config.get_config().w8a8),
            sage_attention=args.sage_attention
            or _config.get_config().sage_attention,
            flux_scan=(True if args.flux_scan
                       else False if args.no_flux_scan
                       else _config.get_config().flux_scan),
            fused_attn=(True if args.fused_attn
                        else False if args.no_fused_attn
                        else _config.get_config().fused_attn),
            fused_ew=(True if args.fused_ew
                      else False if args.no_fused_ew
                      else _config.get_config().fused_ew),
            packed_attn=(True if args.packed_attn
                         else False if args.no_packed_attn
                         else _config.get_config().packed_attn),
            qkv_fuse=(True if args.qkv_fuse
                      else False if args.no_qkv_fuse
                      else _config.get_config().qkv_fuse),
        ))

    progress_callback = None
    if args.preview:
        from lightdiffusion_next_tpu.app import instance as instance_mod

        instance_mod.app.preview_dir = os.path.join(args.output_dir, "preview")
        progress_callback = instance_mod.PreviewHook(instance_mod.app)

    paths = pipeline(
        args.prompt,
        args.width,
        args.height,
        number=args.number,
        batch=args.batch,
        hires_fix=args.hires_fix,
        adetailer=args.adetailer,
        enhance_prompt=args.enhance_prompt,
        img2img=args.img2img,
        stable_fast=args.stable_fast,
        reuse_seed=args.reuse_seed,
        flux_enabled=args.flux,
        prio_speed=args.prio_speed,
        autohdr=args.autohdr,
        realistic_model=args.realistic_model,
        negative_prompt=args.negative_prompt,
        multiscale_preset=args.multiscale_preset,
        enable_multiscale=not args.no_multiscale,
        multiscale_factor=args.multiscale_factor,
        multiscale_fullres_start=args.multiscale_fullres_start,
        multiscale_fullres_end=args.multiscale_fullres_end,
        multiscale_intermittent_fullres=args.multiscale_intermittent_fullres,
        output_dir=args.output_dir,
        progress_callback=progress_callback,
    )
    for p_ in paths:
        print(p_)
    return 0


if __name__ == "__main__":
    sys.exit(main())
