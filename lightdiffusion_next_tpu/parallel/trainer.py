"""Minimal distributed training step (flow matching) for the DiT.

The reference is inference-only; this trainer exists because a TPU-native
framework should exercise its sharding end to end (dp x tp), and it is what
the multichip dry-run validates: one jitted train step over a
("data","model") mesh with Megatron-sharded Flux params, batch sharded over
"data", loss/grads psum'd by XLA. Train state checkpoints/resumes through
orbax with shardings preserved (save_checkpoint/restore_checkpoint).
Input batches should come through parallel.data.PrefetchLoader
(prefetch_to_mesh) so the next batch's host->device transfer overlaps the
current step's compute.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from lightdiffusion_next_tpu.models import flux as flux_mod
from lightdiffusion_next_tpu.parallel import sharding as shard_rules
from lightdiffusion_next_tpu.parallel.mesh import make_mesh


def flow_matching_loss(params, batch, cfg: flux_mod.FluxConfig):
    """Rectified-flow objective: x_t = (1-t) x1 + t x0, target v = x0 - x1
    (the CONST parameterization the Flux sampler inverts,
    src/sample/sampling.py:100-156)."""
    x1, x0, t, ctx, y, guidance = (
        batch["latent"],
        batch["noise"],
        batch["t"],
        batch["context"],
        batch["y"],
        batch["guidance"],
    )
    tb = t[:, None, None, None]
    xt = (1.0 - tb) * x1 + tb * x0
    target = x0 - x1
    pred = flux_mod.apply_flux(params, xt, t, ctx, y, guidance=guidance, cfg=cfg)
    return jnp.mean((pred.astype(jnp.float32) - target) ** 2)


def make_train_step(cfg: flux_mod.FluxConfig, optimizer=None):
    optimizer = optimizer or optax.adamw(1e-4)

    def train_step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(flow_matching_loss)(params, batch, cfg)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return optimizer, train_step


def build_sharded_trainer(
    n_data: int,
    n_model: int,
    cfg: flux_mod.FluxConfig,
    devices=None,
    scan_blocks: bool = False,
    remat: bool = False,
):
    """Construct (mesh, sharded params/opt_state, jitted step, batch_fn).

    ``scan_blocks`` stacks the block params (parallel.spmd
    stack_tp_block_params — Megatron shardings preserved under a replicated
    depth axis) so the train step compiles two scanned block bodies instead
    of a depth-unrolled graph; gradients and adamw moments follow the
    stacked pytree, and checkpoints round-trip in the stacked layout.
    ``remat`` (requires scan_blocks) jax.checkpoints each block body:
    activation memory drops from O(depth) to O(1) blocks per stream at one
    extra forward of FLOPs — the lever that fits long-token training on a
    16 GB chip."""
    import dataclasses

    if remat and not scan_blocks:
        raise ValueError("remat=True requires scan_blocks=True")
    mesh = make_mesh(n_data, n_model, devices=devices)
    params = flux_mod.init_params(cfg, seed=0, dtype=jnp.float32)
    pshard = shard_rules.flux_param_shardings(params, mesh)
    params = shard_rules.shard_params(params, pshard)
    if scan_blocks:
        from lightdiffusion_next_tpu.parallel import spmd as spmd_mod

        params = spmd_mod.stack_tp_block_params(params, cfg, mesh)
        cfg = dataclasses.replace(cfg, remat_blocks=remat)

    optimizer, step = make_train_step(cfg)
    opt_state = optimizer.init(params)  # moment shardings follow the params

    bshard = shard_rules.batch_sharding(mesh)

    from lightdiffusion_next_tpu import config as _config

    jit_step = _config.ldt_jit(step, donate_argnums=(0, 1))

    def make_batch(
        batch_size: int, h: int, w: int, txt_len: int, seed: int = 0
    ):
        import numpy as np

        rng = np.random.default_rng(seed)
        batch = {
            "latent": rng.standard_normal(
                (batch_size, h, w, cfg.in_channels)
            ).astype(np.float32),
            "noise": rng.standard_normal(
                (batch_size, h, w, cfg.in_channels)
            ).astype(np.float32),
            "t": rng.uniform(0, 1, (batch_size,)).astype(np.float32),
            "context": rng.standard_normal(
                (batch_size, txt_len, cfg.context_in_dim)
            ).astype(np.float32),
            "y": rng.standard_normal((batch_size, cfg.vec_in_dim)).astype(
                np.float32
            ),
            "guidance": np.full((batch_size,), 3.5, dtype=np.float32),
        }
        return {k: jax.device_put(v, bshard) for k, v in batch.items()}

    return mesh, params, opt_state, jit_step, make_batch


# ---------------------------------------------------------------------------
# Checkpoint save/restore (orbax) — the reference has no training at all
# (SURVEY §5 "checkpoint/resume": inference weights only); a trainer that
# can't resume isn't one, so the sharded train state round-trips through
# orbax with shardings preserved.
# ---------------------------------------------------------------------------


def save_checkpoint(path: str, params: Dict, opt_state, step: int) -> None:
    """Write the sharded train state to ``path`` (a directory). Each host
    writes only its shards (orbax handles the multi-host layout); the
    step counter rides along as a scalar leaf."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    state = {
        "params": params,
        "opt_state": opt_state,
        "step": jnp.asarray(step, jnp.int32),
    }
    import os

    ckptr.save(os.path.abspath(path), state, force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, params: Dict, opt_state) -> Tuple:
    """Restore (params, opt_state, step) from ``path`` INTO the shardings
    of the passed-in state (use the freshly built trainer state as the
    template — each leaf is restored directly onto its mesh shards, never
    materialized unsharded on one device)."""
    import os

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    template = {
        "params": params,
        "opt_state": opt_state,
        "step": jnp.asarray(0, jnp.int32),
    }
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
    restored = ckptr.restore(os.path.abspath(path), abstract)
    return restored["params"], restored["opt_state"], int(restored["step"])
