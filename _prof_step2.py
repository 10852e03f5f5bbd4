"""Ground truth: XLA cost analysis of the bench step + in-jit 20-step loop."""
import dataclasses
import time

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
h = w = 128
cond = cfg_mod.CondInput(
    cross_attn=jnp.asarray(rng.standard_normal((1, 77, 768)), dtype=dtypes.compute_dtype)
)
uncond = cfg_mod.CondInput(
    cross_attn=jnp.asarray(rng.standard_normal((1, 77, 768)), dtype=dtypes.compute_dtype)
)
denoise = cfg_mod.make_cfg_denoiser(
    model.apply_fn, model.params, model.model_sampling, cond, uncond, 7.5
)
ja = denoise.jit_args
x = jnp.asarray(rng.standard_normal((1, h, w, 4)), dtype=jnp.float32)
sigma = jnp.asarray([14.0], dtype=jnp.float32)


@jax.jit
def step(ja, x, sigma):
    den, _ = denoise.call_with(ja, x, sigma)
    return den


lowered = step.lower(ja, x, sigma)
compiled = lowered.compile()
ca = compiled.cost_analysis()
if isinstance(ca, list):
    ca = ca[0]
print(f"step flops (XLA cost analysis): {ca.get('flops', float('nan'))/1e12:.3f} TF", flush=True)
print(f"step bytes accessed:            {ca.get('bytes accessed', float('nan'))/1e9:.3f} GB", flush=True)

# in-jit 20-step loop (scan-sampler style): one dispatch for all steps
N = 20


@jax.jit
def loop(ja, x, sigma):
    def body(i, acc):
        den, _ = denoise.call_with(ja, acc, sigma)
        return den.astype(acc.dtype)
    return jax.lax.fori_loop(0, N, body, x)


out = loop(ja, x, sigma)
np.asarray(out)
t0 = time.perf_counter()
out = loop(ja, x, sigma)
np.asarray(out)
dt = (time.perf_counter() - t0) / N
print(f"in-jit loop: {dt*1e3:.2f} ms/step ({1/dt:.2f} it/s)", flush=True)

# chained dispatch (bench.py methodology) for comparison in the same process
np.asarray(step(ja, x, sigma))
o = x
t0 = time.perf_counter()
for _ in range(N):
    o = step(ja, o, sigma)
np.asarray(o)
dt2 = (time.perf_counter() - t0) / N
print(f"chained:     {dt2*1e3:.2f} ms/step ({1/dt2:.2f} it/s)", flush=True)
