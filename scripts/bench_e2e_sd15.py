"""End-to-end SD1.5 wall-clock benchmark: the FULL pipeline() path —
tokenize + CLIP encode + 20-step sampler + VAE decode + AutoHDR + PNG save
— at 1024x1024 bf16 batch 1 with production-size weights (random values,
real shapes; compute time is value-independent).

Complements bench.py (which measures the reference's tqdm it/s semantics:
sampler loop only). This is the number a user actually waits for per image
once models are warm in the session cache.

Run from the repo root on the TPU: python scripts/bench_e2e_sd15.py
First run builds a ~4 GB synthetic checkpoint under /tmp (cached).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ASSET_ROOT = "/tmp/ldt_fullsize_assets"


def ensure_assets():
    ckpt = os.path.join(
        ASSET_ROOT, "checkpoints", "Meina V10 - baked VAE.safetensors"
    )
    if os.path.exists(ckpt):
        return ckpt
    # build in a subprocess: make_tiny_assets forces the CPU backend, which
    # must not leak into this process's TPU backend selection
    import subprocess

    print("building full-size synthetic checkpoint (once)...", flush=True)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    here = os.path.dirname(os.path.abspath(__file__))
    subprocess.run(
        [sys.executable, os.path.join(here, "make_tiny_assets.py"),
         ASSET_ROOT, "--full"],
        check=True,
        env=env,
    )
    return ckpt


def main():
    ensure_assets()
    os.environ["LDT_ASSET_ROOT"] = ASSET_ROOT
    os.environ.setdefault("LDT_OFFLINE", "1")

    from lightdiffusion_next_tpu.utils import state_dict as sd_utils

    sd_utils.enable_compilation_cache()
    from lightdiffusion_next_tpu.pipelines.pipeline import pipeline

    # --batch N: serving-throughput variant — N latents denoised in one
    # batched program (better MXU utilization than N batch-1 runs); the
    # reported value stays per-image (wall / N).
    batch = 1
    if "--batch" in sys.argv:
        batch = int(sys.argv[sys.argv.index("--batch") + 1])

    out_dir = "/tmp/ldt_e2e_out"
    kwargs = dict(
        prompt="masterpiece, a cat on a hill at sunset",
        w=1024,
        h=1024,
        number=1,
        batch=batch,
        prio_speed=True,  # dpmpp_2m_cfgpp, the reference's speed sampler
        autohdr=True,
        output_dir=out_dir,
    )

    t0 = time.perf_counter()
    paths = pipeline(**kwargs)
    print(
        f"cold run (load+compile+generate): {time.perf_counter()-t0:.1f}s "
        f"-> {paths}",
        flush=True,
    )
    assert paths and all(os.path.exists(p) for p in paths)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        paths = pipeline(**kwargs)
        times.append(time.perf_counter() - t0)
    dt = min(times) / batch
    metric = "sd15_txt2img_1024px_e2e_s_per_image"
    if batch > 1:
        metric += f"_batch{batch}"
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(dt, 3),
                "unit": "s/image",
                "note": "full pipeline(): encode+sample+decode+hdr+save, warm model cache",
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    sys.exit(main())
