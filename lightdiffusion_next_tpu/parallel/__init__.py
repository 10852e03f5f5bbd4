"""Device mesh + sharding: the distributed layer the reference lacks.

The reference is strictly single-GPU (SURVEY §2: "Parallelism & distributed
communication: NONE"); its closest analog is CPU<->GPU VRAM paging
(src/Device/Device.py:600-870). On TPU that machinery is replaced by a
``jax.sharding.Mesh`` over ICI with pjit-partitioned programs:

- SD1.5: data-parallel (batch over "data", weights replicated).
- Flux DiT: Megatron-style tensor parallel over "model" (attention heads and
  MLP shards), the v5e-8 target for sub-4s 1024^2 images.
"""

from lightdiffusion_next_tpu.parallel.mesh import make_mesh  # noqa: F401
