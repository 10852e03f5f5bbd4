"""Tensor-parallel inference (the new TPU-first component).

The reference has no multi-GPU story at all (SURVEY §2: "Parallelism:
NONE"); on TPU the Flux.1 12B DiT is the natural tensor-parallel target
(BASELINE: <4 s/image on v5e-8). Design:

- Params are laid out with the Megatron specs in ``parallel.sharding``
  (column-parallel qkv/mlp-in, row-parallel proj/mlp-out) over the
  ("data","model") mesh; quantized Q8_0 weights shard in their fused int8
  layout with tp=True so their forward takes the SPMD-partitionable
  dequant+dot path (ops/ggml.py QTensor8T).
- Nothing else changes: the ordinary ``ksample`` loop jits the denoiser
  with the sharded params as jit ARGUMENTS, and XLA GSPMD inserts exactly
  one all-reduce per stream per sublayer from the param shardings. No
  shard_map, no manual collectives — the sampler, FBCache state, and CFG
  plumbing are sharding-agnostic.
- Activations stay replicated over "model" and (optionally) batch-sharded
  over "data"; for the flagship 1-image Flux workload the mesh is (1, N)
  pure TP.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh

from lightdiffusion_next_tpu.parallel import sharding as shard_rules
from lightdiffusion_next_tpu.parallel.mesh import make_mesh


def inference_mesh(n_model: int = -1, n_data: int = 1, devices=None) -> Mesh:
    """The flagship inference layout: pure TP over all devices by default."""
    return make_mesh(n_data, n_model, devices=devices)


def shard_flux_model(model, mesh: Mesh):
    """Re-lay an already-loaded Flux DiffusionModel out tensor-parallel.

    Applies the TP param layout first (head-interleaved qkv, split
    linear1 — parallel.layout) so "model"-axis shards align with whole
    attention heads and GSPMD inserts only the two Megatron all-reduces
    per block, then places every leaf on its mesh shards.

    Prefer ``pipelines.loader.load_diffusion_model_gguf(path, mesh=mesh)``
    for real checkpoints (re-lays out + uploads host->shard directly);
    this helper is for models already resident (tests, random-init
    benches)."""
    import dataclasses

    from lightdiffusion_next_tpu.models import flux as flux_mod
    from lightdiffusion_next_tpu.parallel import layout

    params, cfg = layout.to_tp_layout(model.params, model.config)
    shardings = shard_rules.flux_param_shardings(params, mesh)
    return dataclasses.replace(
        model,
        params=shard_rules.shard_params(params, shardings),
        config=cfg,
        apply_fn=flux_mod.make_apply_fn(cfg),
        uid=None,  # new traced program (TP layout) -> mint a fresh identity
    )


def shard_batch(x, mesh: Mesh):
    """Batch-shard an activation over "data" (replicated over "model")."""
    return jax.device_put(x, shard_rules.batch_sharding(mesh))


def shard_sd15_model(model, mesh: Mesh):
    """Data-parallel SD1.5 (SURVEY §7: per-chip batch, fully replicated
    weights). Replicate every param on the mesh; callers batch-shard the
    latent/noise with ``shard_batch`` and XLA runs each chip's slice
    independently — no collectives in the forward at all."""
    shardings = shard_rules.replicated_shardings(model.params, mesh)
    return model.with_params(shard_rules.shard_params(model.params, shardings))
