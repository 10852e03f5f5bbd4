"""Capture a jax.profiler trace of 3 bench steps."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from lightdiffusion_next_tpu import config as ldt_config
from lightdiffusion_next_tpu.utils import state_dict as sd_utils

sd_utils.enable_compilation_cache()
from lightdiffusion_next_tpu.models import base as base_mod
from lightdiffusion_next_tpu.models import unet as unet_mod
from lightdiffusion_next_tpu.sampling import cfg as cfg_mod
from lightdiffusion_next_tpu.ops import window

dtypes = ldt_config.DtypePolicy.for_platform()
cfg = dataclasses.replace(unet_mod.SD15_CONFIG, dtype=dtypes.compute_dtype)
params = unet_mod.init_params(cfg, seed=0, dtype=dtypes.param_dtype)
model = base_mod.sd15_model(params, cfg=cfg, dtype=dtypes.param_dtype)
model = model.with_options(attn1_override_factory=window.make_msw_msa_factory())

rng = np.random.default_rng(0)
cond = cfg_mod.CondInput(cross_attn=jnp.asarray(rng.standard_normal((1, 77, 768)), dtype=dtypes.compute_dtype))
uncond = cfg_mod.CondInput(cross_attn=jnp.asarray(rng.standard_normal((1, 77, 768)), dtype=dtypes.compute_dtype))
denoise = cfg_mod.make_cfg_denoiser(model.apply_fn, model.params, model.model_sampling, cond, uncond, 7.5)
ja = denoise.jit_args
x = jnp.asarray(rng.standard_normal((1, 128, 128, 4)), dtype=jnp.float32)
sigma = jnp.asarray([14.0], dtype=jnp.float32)


@jax.jit
def step(ja, x, sigma):
    den, _ = denoise.call_with(ja, x, sigma)
    return den


np.asarray(step(ja, x, sigma))  # warm
with jax.profiler.trace("/tmp/jaxtrace"):
    o = x
    for _ in range(3):
        o = step(ja, o, sigma)
    np.asarray(o)
print("trace done", flush=True)
