"""Benchmark: SD1.5 denoise-step throughput at 1024x1024 bf16, batch 1.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's best published number — 2.8 it/s with Stable-Fast
on an RTX 3060 mobile at 1024^2 bf16 batch 1 (reference README.md:83,
BASELINE.md). One "it" = one sampler step = one CFG denoise call
(cond+uncond batched), matching the reference's tqdm it/s metric.
"""

from __future__ import annotations

import json
import sys
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lightdiffusion_next_tpu import config as ldt_config
    from lightdiffusion_next_tpu.utils import state_dict as sd_utils

    sd_utils.enable_compilation_cache()
    from lightdiffusion_next_tpu.models import base as base_mod
    from lightdiffusion_next_tpu.models import unet as unet_mod
    from lightdiffusion_next_tpu.sampling import cfg as cfg_mod

    dtypes = ldt_config.DtypePolicy.for_platform()
    import dataclasses

    cfg = dataclasses.replace(unet_mod.SD15_CONFIG, dtype=dtypes.compute_dtype)
    params = unet_mod.init_params(cfg, seed=0, dtype=dtypes.param_dtype)
    model = base_mod.sd15_model(params, cfg=cfg, dtype=dtypes.param_dtype)

    # MSW-MSA windowed attention is the reference pipeline's default
    # (hidiffoptimizer.go, src/user/pipeline.py:336) — bench with parity.
    from lightdiffusion_next_tpu.ops import window

    model = model.with_options(
        attn1_override_factory=window.make_msw_msa_factory()
    )

    rng = np.random.default_rng(0)
    h = w = 128  # 1024x1024 image -> 128x128 latent
    cond = cfg_mod.CondInput(
        cross_attn=jnp.asarray(
            rng.standard_normal((1, 77, 768)), dtype=dtypes.compute_dtype
        )
    )
    uncond = cfg_mod.CondInput(
        cross_attn=jnp.asarray(
            rng.standard_normal((1, 77, 768)), dtype=dtypes.compute_dtype
        )
    )
    denoise = cfg_mod.make_cfg_denoiser(
        model.apply_fn, model.params, model.model_sampling, cond, uncond, 7.5
    )

    # weights + conds travel as jit ARGUMENTS (closure constants bloat the
    # HLO and blow up compile time — see sampling/cfg.py docstring)
    @jax.jit
    def step(ja, x, sigma):
        den, _ = denoise.call_with(ja, x, sigma)
        return den

    ja = denoise.jit_args
    x = jnp.asarray(rng.standard_normal((1, h, w, 4)), dtype=jnp.float32)
    sigma = jnp.asarray([14.0], dtype=jnp.float32)

    # compile + warmup (full host readback so async dispatch can't lie)
    np.asarray(step(ja, x, sigma))
    for _ in range(3):
        x_out = step(ja, x, sigma)
    np.asarray(x_out)

    # timed: chained steps, one final readback (per-step host sync would
    # measure the relay round-trip, not the chip)
    n = 20
    t0 = time.perf_counter()
    out = x
    for _ in range(n):
        out = step(ja, out, sigma)
    checksum = float(np.abs(np.asarray(out)).mean())
    dt = time.perf_counter() - t0
    assert np.isfinite(checksum), "non-finite bench output"

    it_s = n / dt
    baseline = 2.8  # reference README.md:83
    print(
        json.dumps(
            {
                "metric": "sd15_unet_1024px_bf16_batch1_it_per_s",
                "value": round(it_s, 3),
                "unit": "it/s",
                "vs_baseline": round(it_s / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
