"""Flux DiT tests: patchify/rope parity, tiny forward, TP-sharded equality,
and the flow-matching trainer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from lightdiffusion_next_tpu.models import flux as flux_mod
from lightdiffusion_next_tpu.ops import rope as rope_ops

TINY = flux_mod.FluxConfig(
    in_channels=4,
    hidden_size=64,
    num_heads=4,
    depth=2,
    depth_single_blocks=2,
    axes_dim=(4, 6, 6),
    context_in_dim=32,
    vec_in_dim=16,
)


def test_patchify_matches_einops(rng):
    import einops

    x = rng.standard_normal((2, 8, 8, 16)).astype(np.float32)
    ours = np.asarray(flux_mod.patchify(jnp.asarray(x), 2))
    # reference rearrange is on NCHW (Flux.py:749)
    x_nchw = torch.tensor(x).permute(0, 3, 1, 2)
    oracle = einops.rearrange(
        x_nchw, "b c (h ph) (w pw) -> b (h w) (c ph pw)", ph=2, pw=2
    ).numpy()
    np.testing.assert_allclose(ours, oracle, atol=1e-6)


def test_unpatchify_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 12, 16)), dtype=jnp.float32)
    tokens = flux_mod.patchify(x, 2)
    back = flux_mod.unpatchify(tokens, 8, 12, 2)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-6)


def test_rope_matches_torch_formula(rng):
    pos = rng.integers(0, 64, (1, 10)).astype(np.float32)
    dim, theta = 8, 10000
    ours = np.asarray(rope_ops.rope(jnp.asarray(pos), dim, theta))
    # torch oracle (Flux.py:36-64)
    scale = torch.arange(0, dim, 2, dtype=torch.float64) / dim
    omega = 1.0 / (theta**scale)
    out = torch.einsum("...n,d->...nd", torch.tensor(pos, dtype=torch.float64), omega)
    oracle = torch.stack(
        [torch.cos(out), -torch.sin(out), torch.sin(out), torch.cos(out)], dim=-1
    )
    oracle = oracle.reshape(*oracle.shape[:-1], 2, 2).float().numpy()
    np.testing.assert_allclose(ours, oracle, atol=1e-5)


def test_apply_rope_rotates_pairs(rng):
    # rope at position 0 must be identity
    q = jnp.asarray(rng.standard_normal((1, 2, 3, 8)), dtype=jnp.float32)
    pe = rope_ops.embed_nd(jnp.zeros((1, 3, 1)), (8,))
    q2, k2 = rope_ops.apply_rope(q, q, pe)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q), atol=1e-6)


def test_tiny_flux_forward(rng):
    params = flux_mod.init_params(TINY, seed=0)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), dtype=jnp.float32)
    t = jnp.asarray([0.5])
    ctx = jnp.asarray(rng.standard_normal((1, 12, 32)), dtype=jnp.float32)
    y = jnp.asarray(rng.standard_normal((1, 16)), dtype=jnp.float32)
    out = flux_mod.apply_flux(params, x, t, ctx, y, cfg=TINY)
    assert out.shape == (1, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_flux_first_block_hook_identity(rng):
    params = flux_mod.init_params(TINY, seed=1)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), dtype=jnp.float32)
    t = jnp.asarray([0.3])
    ctx = jnp.asarray(rng.standard_normal((1, 6, 32)), dtype=jnp.float32)
    y = jnp.asarray(rng.standard_normal((1, 16)), dtype=jnp.float32)
    plain = flux_mod.apply_flux(params, x, t, ctx, y, cfg=TINY)
    hooked = flux_mod.apply_flux(
        params, x, t, ctx, y, cfg=TINY,
        first_block_hook=lambda ip, img, rest: rest(img),
    )
    np.testing.assert_allclose(np.asarray(plain), np.asarray(hooked), atol=1e-6)


def test_flux_tp_sharded_matches_unsharded(rng):
    from lightdiffusion_next_tpu.parallel import sharding as shard_rules
    from lightdiffusion_next_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs virtual multi-device CPU")
    params = flux_mod.init_params(TINY, seed=2)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), dtype=jnp.float32)
    t = jnp.asarray([0.5, 0.5])
    ctx = jnp.asarray(rng.standard_normal((2, 6, 32)), dtype=jnp.float32)
    y = jnp.asarray(rng.standard_normal((2, 16)), dtype=jnp.float32)
    base = np.asarray(flux_mod.apply_flux(params, x, t, ctx, y, cfg=TINY))

    mesh = make_mesh(2, 2)
    pshard = shard_rules.flux_param_shardings(params, mesh)
    sharded = shard_rules.shard_params(params, pshard)
    bshard = shard_rules.batch_sharding(mesh)
    xs = jax.device_put(x, bshard)

    with mesh:
        fn = jax.jit(
            lambda p, xx, tt, cc, yy: flux_mod.apply_flux(p, xx, tt, cc, yy, cfg=TINY)
        )
        out = np.asarray(fn(sharded, xs, t, ctx, y))
    np.testing.assert_allclose(out, base, atol=2e-4)


def test_trainer_step_runs():
    from lightdiffusion_next_tpu.parallel import trainer

    if len(jax.devices()) < 4:
        pytest.skip("needs virtual multi-device CPU")
    mesh, params, opt_state, jit_step, make_batch = trainer.build_sharded_trainer(
        2, 2, TINY
    )
    with mesh:
        batch = make_batch(batch_size=2, h=8, w=8, txt_len=6)
        params2, opt_state2, loss = jit_step(params, opt_state, batch)
        assert np.isfinite(float(loss))


def test_graft_entry_dryrun():
    import __graft_entry__ as ge

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    ge.dryrun_multichip(8)

def test_flux_tp_sharded_quantized_matches_unsharded(rng):
    """Tensor-parallel Flux with Q8_0 fused-layout weights: the structured
    QTensor8T shardings (parallel/sharding.py _quantized_sharding) must
    reproduce the single-device quantized forward exactly."""
    from lightdiffusion_next_tpu.ops import ggml
    from lightdiffusion_next_tpu.parallel import sharding as shard_rules
    from lightdiffusion_next_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs virtual multi-device CPU")
    params = flux_mod.init_params(TINY, seed=3)
    # quantize the TP-sharded weight classes (qkv/proj/mlp/linear1/linear2)
    qparams = {}
    for k, v in params.items():
        v = np.asarray(v, np.float32)
        if (
            v.ndim == 2
            and v.shape[1] % 32 == 0
            and any(
                k.endswith(s)
                for s in (
                    "attn.qkv.weight", "attn.proj.weight", "mlp.0.weight",
                    "mlp.2.weight", "linear1.weight", "linear2.weight",
                )
            )
        ):
            q, s = ggml.quantize_q8_0(v)
            qparams[k] = ggml.transpose_for_matmul(
                ggml.QTensor8(q, s, v.shape)
            )
        else:
            qparams[k] = jnp.asarray(v)
    assert any(isinstance(v, ggml.QTensor8T) for v in qparams.values())

    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), dtype=jnp.float32)
    t = jnp.asarray([0.5, 0.5])
    ctx = jnp.asarray(rng.standard_normal((2, 6, 32)), dtype=jnp.float32)
    y = jnp.asarray(rng.standard_normal((2, 16)), dtype=jnp.float32)
    base = np.asarray(flux_mod.apply_flux(qparams, x, t, ctx, y, cfg=TINY))

    mesh = make_mesh(2, 2)
    pshard = shard_rules.flux_param_shardings(qparams, mesh)
    assert isinstance(pshard[
        "double_blocks.0.img_attn.qkv.weight"], ggml.QTensor8T)
    sharded = shard_rules.shard_params(qparams, pshard)
    xs = jax.device_put(x, shard_rules.batch_sharding(mesh))

    with mesh:
        fn = jax.jit(
            lambda p, xx, tt, cc, yy: flux_mod.apply_flux(
                p, xx, tt, cc, yy, cfg=TINY
            )
        )
        out = np.asarray(fn(sharded, xs, t, ctx, y))
    np.testing.assert_allclose(out, base, atol=2e-4)
