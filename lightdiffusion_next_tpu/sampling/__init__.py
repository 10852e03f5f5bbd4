"""Sampling layer: sigma schedules, model-sampling parameterizations, CFG,
sampler loops (lax.scan), FBCache, multi-scale plans, and the KSampler facade.

TPU-first counterpart of the reference's src/sample/ package.
"""

from lightdiffusion_next_tpu.sampling import schedules  # noqa: F401
