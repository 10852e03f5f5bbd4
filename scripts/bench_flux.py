"""Flux.1-dev single-chip step benchmark (Q8_0 weights, 1024x1024).

Measures one CONST denoise step (cfg=1: single model pass, the reference's
Flux setting, pipeline.py:251) with int8 weights living in HBM. The v5e-8
target (<4 s/image, BASELINE.md) extrapolates from this single-chip number
via the TP sharding validated in tests/test_flux.py.

Usage: python scripts/bench_flux.py [--tiny]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def random_q8_flux_params(cfg, seed=0):
    """Random Flux params with matmul weights quantized to Q8_0 (int8 codes
    + per-32-block scales) — the exact memory layout of a GGUF load."""
    import numpy as np

    from lightdiffusion_next_tpu.models import flux as flux_mod
    from lightdiffusion_next_tpu.ops import ggml

    P = flux_mod.init_params(cfg, seed=seed)
    out = {}
    for k, v in P.items():
        if v.ndim == 2 and v.shape[-1] % 32 == 0 and v.shape[0] >= 64:
            q, scales = ggml.quantize_q8_0(v)
            out[k] = ggml.QTensor8(q, scales, v.shape)
        else:
            out[k] = v
    return out


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lightdiffusion_next_tpu import config as ldt_config
    from lightdiffusion_next_tpu.models import base as base_mod
    from lightdiffusion_next_tpu.models import flux as flux_mod
    from lightdiffusion_next_tpu.ops import ggml
    from lightdiffusion_next_tpu.sampling import cfg as cfg_mod
    from lightdiffusion_next_tpu.sampling import model_sampling as ms_mod
    from lightdiffusion_next_tpu.utils import latent as latent_mod
    from lightdiffusion_next_tpu.utils import state_dict as sd_utils

    sd_utils.enable_compilation_cache()
    tiny = "--tiny" in sys.argv
    dtypes = ldt_config.DtypePolicy.for_platform()
    if tiny:
        fcfg = dataclasses.replace(
            flux_mod.FluxConfig(
                hidden_size=1024, num_heads=8, depth=4, depth_single_blocks=8,
                axes_dim=(16, 56, 56),
            ),
            dtype=dtypes.compute_dtype,
        )
    else:
        fcfg = dataclasses.replace(flux_mod.FLUX_DEV, dtype=dtypes.compute_dtype)

    t0 = time.time()
    params_host = random_q8_flux_params(fcfg, seed=0)
    print(f"# init+quantize {time.time()-t0:.0f}s", file=sys.stderr)

    t0 = time.time()
    params = ggml.to_device_quantized(params_host, dtype=dtypes.param_dtype)
    jax.block_until_ready(params)
    print(f"# upload {time.time()-t0:.0f}s", file=sys.stderr)

    def apply_fn(p, x, t, context, y=None, guidance=None, **kw):
        return flux_mod.apply_flux(
            p, x, t, context, y, guidance=guidance, cfg=fcfg,
            first_block_hook=kw.get("first_block_hook"),
        )

    model = base_mod.DiffusionModel(
        apply_fn=apply_fn,
        params=params,
        model_sampling=ms_mod.ModelSamplingFlux(),
        latent_format=latent_mod.FLUX1,
        config=fcfg,
        model_type="flux",
    )

    rng = np.random.default_rng(0)
    cond = cfg_mod.CondInput(
        cross_attn=jnp.asarray(
            rng.standard_normal((1, 256, fcfg.context_in_dim)),
            dtype=dtypes.compute_dtype,
        ),
        pooled=jnp.asarray(
            rng.standard_normal((1, fcfg.vec_in_dim)), dtype=jnp.float32
        ),
        guidance=3.0,
    )
    den = cfg_mod.make_cfg_denoiser(
        model.apply_fn, model.params, model.model_sampling, cond, None, 1.0
    )
    step = jax.jit(lambda ja, x, s: den.call_with(ja, x, s)[0])
    ja = den.jit_args
    x = jnp.asarray(rng.standard_normal((1, 128, 128, 16)), dtype=jnp.float32)
    sig = jnp.asarray([0.99], dtype=jnp.float32)

    t0 = time.time()
    np.asarray(step(ja, x, sig))
    print(f"# compile+first {time.time()-t0:.0f}s", file=sys.stderr)

    n = 6
    t0 = time.time()
    out = x
    for _ in range(n):
        out = step(ja, out, sig)
    checksum = float(np.abs(np.asarray(out)).mean())
    dt = (time.time() - t0) / n
    assert np.isfinite(checksum)
    print(
        json.dumps(
            {
                "metric": "flux_q8_1024px_batch1_s_per_step"
                + ("_tiny" if tiny else ""),
                "value": round(dt, 3),
                "unit": "s/step",
                "vs_baseline": round((4.0 / 20) / dt, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
