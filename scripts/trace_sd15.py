"""Device-trace the SD1.5 bench step (bench.py's workload) for the per-op
budget that guides kernel work — ARCHITECTURE §6b has the Flux analog.

Runs ONE full-res 20-step dpmpp_2m_cfgpp sampler program (the
compute-honest bench variant: no multiscale credit) under jax.profiler,
then aggregates device-lane op times with scripts/parse_trace.py.

Usage (repo root, on the TPU): python scripts/trace_sd15.py [trace_dir]
"""

from __future__ import annotations

import dataclasses
import subprocess
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sd15_trace"

    import bench as _bench

    _bench._probe_devices()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lightdiffusion_next_tpu import config as ldt_config
    from lightdiffusion_next_tpu.models import base as base_mod
    from lightdiffusion_next_tpu.models import unet as unet_mod
    from lightdiffusion_next_tpu.ops import window
    from lightdiffusion_next_tpu.sampling import cfg as cfg_mod
    from lightdiffusion_next_tpu.sampling import ksampler
    from lightdiffusion_next_tpu.sampling import samplers as samplers_mod
    from lightdiffusion_next_tpu.utils import state_dict as sd_utils

    sd_utils.enable_compilation_cache()

    dtypes = ldt_config.DtypePolicy.for_platform()
    cfg = dataclasses.replace(unet_mod.SD15_CONFIG, dtype=dtypes.compute_dtype)
    params = unet_mod.init_params(cfg, seed=0, dtype=dtypes.param_dtype)
    model = base_mod.sd15_model(params, cfg=cfg, dtype=dtypes.param_dtype)
    model = model.with_options(
        attn1_override_factory=window.make_msw_msa_factory(
            model_sampling=model.model_sampling
        )
    )

    rng = np.random.default_rng(0)
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
    sigmas = ksampler.sigmas_for(model.model_sampling, "karras", 20)
    x0 = jnp.asarray(
        rng.standard_normal((1, 128, 128, 4)) * float(sigmas[0]), jnp.float32
    )
    ms_off = samplers_mod.MultiScale(enabled=False)

    def run():
        out = samplers_mod.sample(
            denoise, x0, sigmas, sampler="dpmpp_2m_cfgpp", ms=ms_off
        )
        return np.abs(np.asarray(out)).mean()

    print(f"warmup checksum {run():.4f}", flush=True)
    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        run()
    print(f"traced run: {time.perf_counter()-t0:.2f}s -> {trace_dir}",
          flush=True)
    return subprocess.call(
        [sys.executable, "scripts/parse_trace.py", trace_dir, "30"]
    )


if __name__ == "__main__":
    sys.exit(main())
