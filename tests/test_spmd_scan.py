"""Scan-over-blocks under the shard_map TP forward (parallel/spmd.py
stack_tp_block_params / to_spmd_model(scan_blocks=True)): the stacked
local shards scan per device with the fused scalar-prefetch kernels, and
the psum-completed output matches the single-device UNROLLED forward.
"""

import dataclasses
import logging

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightdiffusion_next_tpu.models import flux as flux_mod
from lightdiffusion_next_tpu.ops import ggml
from lightdiffusion_next_tpu.parallel import layout as layout_mod
from lightdiffusion_next_tpu.parallel import sharding as shard_rules
from lightdiffusion_next_tpu.parallel import spmd as spmd_mod
from lightdiffusion_next_tpu.parallel.mesh import make_mesh

# depth >= 2 so the scan body actually runs (block 0 stays unrolled for
# the FBCache boundary); hidden=512 keeps row-parallel K_local=256 at tp=2
# a 256-multiple so the fused kernels engage inside the shard_map body
CFG = flux_mod.FluxConfig(
    in_channels=4,
    hidden_size=512,
    num_heads=4,
    depth=2,
    depth_single_blocks=2,
    axes_dim=(16, 56, 56),
    context_in_dim=32,
    vec_in_dim=16,
)
TP = 2


def _inputs(rng, b=1, hw=8, txt=6):
    x = jnp.asarray(rng.standard_normal((b, hw, hw, CFG.in_channels)), jnp.float32)
    t = jnp.asarray(rng.uniform(0.2, 0.9, (b,)), jnp.float32)
    ctx = jnp.asarray(
        rng.standard_normal((b, txt, CFG.context_in_dim)) * 0.3, jnp.float32
    )
    y = jnp.asarray(rng.standard_normal((b, CFG.vec_in_dim)) * 0.3, jnp.float32)
    return x, t, ctx, y


def _mesh():
    if len(jax.devices()) < TP:
        pytest.skip("needs virtual multi-device CPU")
    return make_mesh(1, TP)


def _quantize_sd(sd, rng_unused=None):
    out = {}
    for k, v in sd.items():
        v = np.asarray(v, np.float32)
        if (
            v.ndim == 2
            and v.shape[1] % 32 == 0
            and shard_rules.flux_param_spec(k) != jax.sharding.PartitionSpec()
        ):
            q, s = ggml.quantize_q8_0(v)
            out[k] = ggml.QTensor8(q, s, v.shape)
        else:
            out[k] = v
    return out


def _shard(sd, fcfg, mesh, quantize=False):
    if quantize:
        sd = _quantize_sd(sd)
    sd, fcfg = layout_mod.to_tp_layout(sd, fcfg)
    return shard_rules.shard_state_dict(sd, mesh), fcfg


def _single_device_oracle(sd, x, t, ctx, y, quantize=False):
    if quantize:
        params = {}
        for k, v in _quantize_sd(sd).items():
            if isinstance(v, ggml.QTensor8):
                params[k] = ggml.transpose_for_matmul(
                    ggml.QTensor8(jnp.asarray(v.q), jnp.asarray(v.scales), v.shape)
                )
            else:
                params[k] = jnp.asarray(v, jnp.float32)
    else:
        params = {k: jnp.asarray(v, jnp.float32) for k, v in sd.items()}
    return np.asarray(
        jax.jit(
            lambda p, xx, tt, cc, yy: flux_mod.apply_flux(p, xx, tt, cc, yy, cfg=CFG)
        )(params, x, t, ctx, y)
    )


def _stacked_spmd(params, fcfg, mesh):
    stacked = spmd_mod.stack_tp_block_params(params, fcfg, mesh)
    apply_fn, local_view = spmd_mod.make_spmd_apply_fn(fcfg, mesh)
    return apply_fn, local_view(stacked)


def test_spmd_scan_dense_matches_single_device(rng):
    mesh = _mesh()
    sd = flux_mod.init_params(CFG, seed=20)
    x, t, ctx, y = _inputs(rng)
    base = _single_device_oracle(sd, x, t, ctx, y)

    params, fcfg = _shard(dict(sd), CFG, mesh)
    apply_fn, local = _stacked_spmd(params, fcfg, mesh)
    assert flux_mod.is_stacked(local)
    with mesh:
        out = np.asarray(jax.jit(apply_fn)(local, x, t, ctx, y))
    np.testing.assert_allclose(out, base, atol=3e-4)


def test_spmd_scan_quantized_matches_single_device(rng):
    """Stacked Q8_0 local shards stream through the scalar-prefetch kernel
    per device inside the scan body; output == single-device unrolled
    fused run on the same codes."""
    mesh = _mesh()
    sd = flux_mod.init_params(CFG, seed=21)
    x, t, ctx, y = _inputs(rng)
    base = _single_device_oracle(sd, x, t, ctx, y, quantize=True)

    params, fcfg = _shard(dict(sd), CFG, mesh, quantize=True)
    stacked = spmd_mod.stack_tp_block_params(params, fcfg, mesh)
    dstack = stacked[flux_mod.DOUBLE_STACK_KEY]
    qkv = dstack["img_attn.qkv.weight"]
    assert isinstance(qkv, ggml.StackedQTensor8T) and qkv.tp
    assert qkv.depth == CFG.depth

    apply_fn, local_view = spmd_mod.make_spmd_apply_fn(fcfg, mesh)
    local = local_view(stacked)
    lqkv = local[flux_mod.DOUBLE_STACK_KEY]["img_attn.qkv.weight"]
    # local view: tp stripped, logical out dim divided by tp (col-parallel)
    assert not lqkv.tp
    assert lqkv.shape == (qkv.shape[0] // TP, qkv.shape[1])
    with mesh:
        out = np.asarray(jax.jit(apply_fn)(local, x, t, ctx, y))
    np.testing.assert_allclose(out, base, atol=3e-4)


def test_spmd_scan_w8a8_runs_and_is_close(rng):
    """to_w8a8 AFTER the scan-mode local view: StackedQTensor8T ->
    StackedQTensor8W per block (lax.map requant), kernel per shard."""
    mesh = _mesh()
    sd = flux_mod.init_params(CFG, seed=22)
    x, t, ctx, y = _inputs(rng)
    base = _single_device_oracle(sd, x, t, ctx, y, quantize=True)

    params, fcfg = _shard(dict(sd), CFG, mesh, quantize=True)
    stacked = spmd_mod.stack_tp_block_params(params, fcfg, mesh)
    apply_fn, local_view = spmd_mod.make_spmd_apply_fn(fcfg, mesh)
    local = ggml.to_w8a8(local_view(stacked))
    sstack = local[flux_mod.SINGLE_STACK_KEY]
    assert isinstance(sstack["linear1_qkv.weight"], ggml.StackedQTensor8W)
    with mesh:
        out = np.asarray(jax.jit(apply_fn)(local, x, t, ctx, y))
    assert np.isfinite(out).all()
    denom = np.sqrt((base**2).mean()) + 1e-12
    assert np.sqrt(((out - base) ** 2).mean()) / denom < 0.05


def test_spmd_scan_collective_structure(rng):
    """Scanning must not change the wire pattern: explicit psums only
    (4/double block + 1/single block at most, fused or not) and NO
    all-gather of activations."""
    import re

    mesh = _mesh()
    sd = flux_mod.init_params(CFG, seed=23)
    params, fcfg = _shard(dict(sd), CFG, mesh)
    apply_fn, local = _stacked_spmd(params, fcfg, mesh)
    x, t, ctx, y = _inputs(rng)
    with mesh:
        hlo = jax.jit(apply_fn).lower(local, x, t, ctx, y).compile().as_text()
    assert not [
        ln for ln in hlo.splitlines() if re.search(r" all-gather\(", ln)
    ], "spmd scan forward must not all-gather"
    assert [ln for ln in hlo.splitlines() if re.search(r" all-reduce\(", ln)]


def test_to_spmd_model_scan_falls_back_on_lora(rng, caplog):
    """LoRA-patched blocks can't stack: to_spmd_model(scan_blocks=True)
    must warn and keep the unrolled shard_map forward, not fail."""
    from lightdiffusion_next_tpu.models import base as base_mod
    from lightdiffusion_next_tpu.sampling import model_sampling as ms_mod
    from lightdiffusion_next_tpu.utils import latent as latent_mod

    mesh = _mesh()
    sd = flux_mod.init_params(CFG, seed=24)
    params, fcfg = _shard(dict(sd), CFG, mesh, quantize=True)
    k = "double_blocks.0.img_attn.qkv.weight"
    params[k] = ggml.QTensorLoRA(
        base=params[k],
        up=jnp.zeros((params[k].shape[0], 2), jnp.float32),
        down=jnp.zeros((2, params[k].shape[1]), jnp.float32),
    )
    model = base_mod.DiffusionModel(
        apply_fn=flux_mod.make_apply_fn(fcfg),
        params=params,
        model_sampling=ms_mod.ModelSamplingFlux(),
        latent_format=latent_mod.FLUX1,
        config=fcfg,
        model_type="flux",
    )
    with caplog.at_level(logging.WARNING):
        spmd_model = spmd_mod.to_spmd_model(model, mesh, scan_blocks=True)
    assert not flux_mod.is_stacked(spmd_model.params)
    assert "unrolled" in caplog.text

    x, t, ctx, y = _inputs(rng)
    with mesh:
        out = np.asarray(jax.jit(spmd_model.apply_fn)(
            spmd_model.params, x, t, ctx, y
        ))
    assert np.isfinite(out).all()
