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


def test_tp_layout_is_value_preserving(rng):
    """parallel.layout.to_tp_layout (head-interleaved qkv + split linear1)
    must not change the forward's value — same output single-device."""
    from lightdiffusion_next_tpu.parallel import layout

    params = flux_mod.init_params(TINY, seed=3)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), dtype=jnp.float32)
    t = jnp.asarray([0.5])
    ctx = jnp.asarray(rng.standard_normal((1, 12, 32)), dtype=jnp.float32)
    y = jnp.asarray(rng.standard_normal((1, 16)), dtype=jnp.float32)
    base = flux_mod.apply_flux(params, x, t, ctx, y, cfg=TINY)

    params2, cfg2 = layout.to_tp_layout(params, TINY)
    assert cfg2.tp_layout
    assert "single_blocks.0.linear1_qkv.weight" in params2
    assert "single_blocks.0.linear1.weight" not in params2
    out = flux_mod.apply_flux(params2, x, t, ctx, y, cfg=cfg2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=1e-5)
    # idempotent
    params3, cfg3 = layout.to_tp_layout(params2, cfg2)
    assert params3 is params2 and cfg3 is cfg2


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


def test_trainer_scan_matches_unrolled_and_remat():
    """scan_blocks trainer: same init (seed=0), same batch -> the first
    step's loss must match the unrolled trainer's, and remat=True must not
    change the math (only when residuals are saved)."""
    from lightdiffusion_next_tpu.models import flux as flux_mod_
    from lightdiffusion_next_tpu.parallel import trainer

    if len(jax.devices()) < 4:
        pytest.skip("needs virtual multi-device CPU")

    def one_step(**kw):
        mesh, params, opt_state, jit_step, make_batch = (
            trainer.build_sharded_trainer(2, 2, TINY, **kw)
        )
        with mesh:
            batch = make_batch(batch_size=2, h=8, w=8, txt_len=6, seed=3)
            params, _, loss = jit_step(params, opt_state, batch)
        return float(loss), params

    base_loss, _ = one_step()
    scan_loss, scan_params = one_step(scan_blocks=True)
    assert flux_mod_.is_stacked(scan_params)
    np.testing.assert_allclose(scan_loss, base_loss, rtol=1e-5)

    remat_loss, remat_params = one_step(scan_blocks=True, remat=True)
    np.testing.assert_allclose(remat_loss, scan_loss, rtol=1e-6)
    # the updated stacked params must match too (grads flow through the
    # rematerialized bodies identically)
    k = flux_mod_.SINGLE_STACK_KEY
    np.testing.assert_allclose(
        np.asarray(remat_params[k]["linear1.weight"]),
        np.asarray(scan_params[k]["linear1.weight"]),
        atol=1e-6,
    )

    with pytest.raises(ValueError, match="requires scan_blocks"):
        trainer.build_sharded_trainer(2, 2, TINY, remat=True)


def test_trainer_scan_checkpoint_roundtrip(tmp_path):
    """The stacked train state round-trips through orbax with shardings
    preserved, same as the unrolled layout."""
    from lightdiffusion_next_tpu.parallel import trainer

    if len(jax.devices()) < 4:
        pytest.skip("needs virtual multi-device CPU")
    mesh, params, opt_state, jit_step, make_batch = trainer.build_sharded_trainer(
        2, 2, TINY, scan_blocks=True
    )
    with mesh:
        batch = make_batch(batch_size=2, h=8, w=8, txt_len=6)
        params, opt_state, _ = jit_step(params, opt_state, batch)
    path = str(tmp_path / "ckpt_scan")
    trainer.save_checkpoint(path, params, opt_state, step=2)

    mesh2, p2, o2, _, _ = trainer.build_sharded_trainer(
        2, 2, TINY, scan_blocks=True
    )
    rp, ro, step = trainer.restore_checkpoint(path, p2, o2)
    assert step == 2
    got = jax.tree.leaves(rp)
    want = jax.tree.leaves(params)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
        assert g.sharding.is_equivalent_to(w.sharding, g.ndim)


def test_graft_entry_dryrun():
    import __graft_entry__ as ge

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    ge.dryrun_multichip(8)

def _quantize_flux_params(params):
    """Quantize the TP-sharded weight classes to fused-layout Q8_0."""
    from lightdiffusion_next_tpu.ops import ggml

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
            qparams[k] = ggml.transpose_for_matmul(ggml.QTensor8(q, s, v.shape))
        else:
            qparams[k] = jnp.asarray(v)
    return qparams


# TP-test config: big enough that Q8_0 scale rows (K/32) divide over a
# 4-way model axis (K % 128 == 0 everywhere)
TINY_TP = flux_mod.FluxConfig(
    in_channels=4,
    hidden_size=128,
    num_heads=4,
    depth=2,
    depth_single_blocks=2,
    axes_dim=(8, 12, 12),
    context_in_dim=32,
    vec_in_dim=16,
)


def _tiny_flux_model(params, fbcache=None, cfg=TINY):
    from lightdiffusion_next_tpu.models import base as base_mod
    from lightdiffusion_next_tpu.sampling import model_sampling as ms_mod
    from lightdiffusion_next_tpu.utils import latent as latent_mod

    def apply_fn(p, x, t, context, y=None, guidance=None,
                 first_block_hook=None, **_):
        return flux_mod.apply_flux(
            p, x, t, context, y, guidance=guidance, cfg=cfg,
            first_block_hook=first_block_hook,
        )

    opts = {}
    if fbcache is not None:
        opts["fbcache"] = fbcache
    return base_mod.DiffusionModel(
        apply_fn=apply_fn,
        params=params,
        model_sampling=ms_mod.ModelSamplingFlux(),
        latent_format=latent_mod.FLUX1,
        config=cfg,
        model_type="flux",
        model_options=opts,
    )


def test_flux_tp_inference_ksample_matches_single(rng):
    """THE multi-chip inference path: a full quantized ksample (euler +
    FBCache, the real Flux pipeline configuration) over a pure-TP mesh must
    reproduce the single-device result."""
    from lightdiffusion_next_tpu.parallel import inference as par_inf
    from lightdiffusion_next_tpu.sampling import cfg as cfg_mod
    from lightdiffusion_next_tpu.sampling import fbcache as fb_mod
    from lightdiffusion_next_tpu.sampling import ksampler as ks

    if len(jax.devices()) < 4:
        pytest.skip("needs virtual multi-device CPU")
    qparams = _quantize_flux_params(flux_mod.init_params(TINY_TP, seed=4))
    fbc = fb_mod.FBCacheConfig(0.12)
    pos = cfg_mod.CondInput(
        cross_attn=jnp.asarray(
            rng.standard_normal((1, 8, TINY_TP.context_in_dim)), jnp.float32
        ),
        pooled=jnp.asarray(
            rng.standard_normal((1, TINY_TP.vec_in_dim)), jnp.float32
        ),
        guidance=3.5,
    )
    latent = jnp.zeros((1, 8, 8, TINY_TP.in_channels), jnp.float32)

    def run(model):
        return np.asarray(
            ks.ksample(
                model,
                seed=7,
                steps=4,
                cfg_scale=1.0,
                sampler_name="euler",
                scheduler="beta",
                positive=pos,
                negative=None,
                latent_image=latent,
            ).latent
        )

    base = run(_tiny_flux_model(qparams, fbcache=fbc, cfg=TINY_TP))
    mesh = par_inf.inference_mesh(n_model=4)
    tp_model = par_inf.shard_flux_model(
        _tiny_flux_model(qparams, fbcache=fbc, cfg=TINY_TP), mesh
    )
    assert tp_model.params["double_blocks.0.img_attn.qkv.weight"].tp
    out = run(tp_model)
    np.testing.assert_allclose(out, base, atol=2e-3, rtol=1e-4)


def test_gguf_loader_tp_path_matches_single_device(tmp_path, rng):
    """Full GGUF -> TP integration: write a tiny flux GGUF, load once
    single-device and once with an 8-way mesh (host-side to_tp_layout on
    QTensor8 leaves + sharded upload), and compare one denoise output."""
    from lightdiffusion_next_tpu.ops import ggml
    from lightdiffusion_next_tpu.parallel import inference as par_inf
    from lightdiffusion_next_tpu.pipelines import loader

    if len(jax.devices()) < 8:
        pytest.skip("needs virtual multi-device CPU")

    # hidden=256/heads=8: every quantized K is a multiple of 256 so the
    # row-parallel scale tables (K/32 rows) shard 8 ways, like real Flux
    cfg_gguf = flux_mod.FluxConfig(
        in_channels=4,
        hidden_size=256,
        num_heads=8,
        depth=1,
        depth_single_blocks=1,
        axes_dim=(4, 14, 14),
        context_in_dim=32,
        vec_in_dim=16,
    )
    params = flux_mod.init_params(cfg_gguf, seed=6)
    # drop guidance embedder so the loader autodetects guidance_embed=False
    params = {k: v for k, v in params.items() if not k.startswith("guidance_in")}
    path = str(tmp_path / "tiny_flux.gguf")
    ggml.write_gguf(
        path, params, arch="flux",
        quantize=("qkv.weight", "linear1.weight", "linear2.weight"),
    )

    single = loader.load_diffusion_model_gguf(path)
    mesh = par_inf.inference_mesh(n_model=8)
    tp = loader.load_diffusion_model_gguf(path, mesh=mesh)
    assert tp.config.tp_layout and not single.config.tp_layout
    assert "single_blocks.0.linear1_qkv.weight" in tp.params

    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    t = jnp.asarray([0.5])
    ctx = jnp.asarray(
        rng.standard_normal((1, 12, cfg_gguf.context_in_dim)), jnp.float32
    )
    y = jnp.asarray(rng.standard_normal((1, cfg_gguf.vec_in_dim)), jnp.float32)
    base = np.asarray(single.apply_fn(single.params, x, t, ctx, y))
    with mesh:
        out = np.asarray(tp.apply_fn(tp.params, x, t, ctx, y))
    np.testing.assert_allclose(out, base, atol=2e-3, rtol=1e-4)


def test_qtensor8t_sharded_without_tp_flag_raises(rng):
    """Backstop for the explicit tp flag: a concretely multi-device QTensor8T
    reaching the single-device kernel path must fail loudly."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from lightdiffusion_next_tpu.ops import ggml
    from lightdiffusion_next_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs virtual multi-device CPU")
    w = rng.standard_normal((256, 256)).astype(np.float32)
    q, s = ggml.quantize_q8_0(w)
    qt = ggml.transpose_for_matmul(ggml.QTensor8(q, s, w.shape))
    mesh = make_mesh(1, 4)
    bad = ggml.QTensor8T(
        qt=jax.device_put(qt.qt, NamedSharding(mesh, P(None, "model"))),
        scales_t=jax.device_put(qt.scales_t, NamedSharding(mesh, P(None, "model"))),
        shape=qt.shape,
        tp=False,
    )
    x = jnp.asarray(rng.standard_normal((256, 256)), jnp.float32)
    with pytest.raises(ValueError, match="tp=False"):
        bad.fused_matmul(x)


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


def test_sd15_data_parallel_batch_matches_single(rng):
    """SURVEY §7's SD1.5 story: replicated weights + batch-sharded latents
    over the "data" axis produce the same denoise as single-device."""
    from lightdiffusion_next_tpu.models import base as base_mod
    from lightdiffusion_next_tpu.models import unet as unet_mod
    from lightdiffusion_next_tpu.parallel import inference as par_inf
    from lightdiffusion_next_tpu.parallel.mesh import make_mesh
    from lightdiffusion_next_tpu.sampling import cfg as cfg_mod

    if len(jax.devices()) < 4:
        pytest.skip("needs virtual multi-device CPU")

    ucfg = unet_mod.UNetConfig(
        model_channels=32, channel_mult=(1, 2), num_res_blocks=(1, 1),
        transformer_depth=(1, 1), context_dim=768, num_heads=4,
        dtype=jnp.float32,
    )
    model = base_mod.sd15_model(
        unet_mod.init_params(ucfg, seed=0), cfg=ucfg, dtype=jnp.float32
    )
    b = 4
    ctx = jnp.asarray(rng.standard_normal((b, 77, 768)), jnp.float32)
    cond = cfg_mod.CondInput(cross_attn=ctx)
    x = jnp.asarray(rng.standard_normal((b, 16, 16, 4)), jnp.float32)
    sigma = jnp.asarray([5.0] * b, jnp.float32)

    den = cfg_mod.make_cfg_denoiser(
        model.apply_fn, model.params, model.model_sampling, cond, None, 1.0
    )
    base = np.asarray(den(x, sigma)[0])

    mesh = make_mesh(4, 1)
    dp_model = par_inf.shard_sd15_model(model, mesh)
    with mesh:
        xs = par_inf.shard_batch(x, mesh)
        den_dp = cfg_mod.make_cfg_denoiser(
            dp_model.apply_fn, dp_model.params, dp_model.model_sampling,
            cfg_mod.CondInput(cross_attn=par_inf.shard_batch(ctx, mesh)),
            None, 1.0,
        )
        out = np.asarray(den_dp(xs, sigma)[0])
    np.testing.assert_allclose(out, base, atol=2e-4, rtol=1e-4)


def test_lora_on_tp_layout_matches_dense(rng):
    """A flux LoRA written for CHECKPOINT keys (fused linear1/linear2,
    proj-major qkv) must merge correctly onto TP-laid-out params: qkv up
    rows re-permuted, linear1 up split, linear2 down split
    (parallel.layout.to_tp_layout_patches via apply_lora(model_cfg=...)).
    Oracle: apply to the dense checkpoint layout, then re-lay out."""
    from lightdiffusion_next_tpu.models import lora as lora_mod
    from lightdiffusion_next_tpu.parallel import layout

    params = flux_mod.init_params(TINY, seed=5)
    H = TINY.hidden_size
    mlp_hidden = int(H * TINY.mlp_ratio)
    rank = 4

    def mk(out_d, in_d):
        return (
            rng.standard_normal((out_d, rank)).astype(np.float32) * 0.2,
            rng.standard_normal((rank, in_d)).astype(np.float32) * 0.2,
            float(rank),
        )

    lora_sd = {}
    for name, (out_d, in_d) in {
        "double_blocks_0_img_attn_qkv": (3 * H, H),
        "single_blocks_0_linear1": (3 * H + mlp_hidden, H),
        "single_blocks_1_linear2": (H, H + mlp_hidden),
        "double_blocks_1_txt_mlp_0": (mlp_hidden, H),
    }.items():
        up, down, alpha = mk(out_d, in_d)
        lora_sd[f"lora_unet_{name}.lora_up.weight"] = up
        lora_sd[f"lora_unet_{name}.lora_down.weight"] = down
        lora_sd[f"lora_unet_{name}.alpha"] = np.float32(alpha)

    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    t = jnp.asarray([0.5])
    ctx = jnp.asarray(rng.standard_normal((1, 6, 32)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((1, 16)), jnp.float32)

    # oracle: merge on dense checkpoint layout, then forward (no TP layout)
    patches, leftover = lora_mod.load_lora(
        lora_sd, lora_mod.unet_key_map(params)
    )
    assert not leftover and len(patches) == 4
    dense_merged = lora_mod.apply_lora(params, patches, strength=0.8)
    oracle = np.asarray(
        flux_mod.apply_flux(dense_merged, x, t, ctx, y, cfg=TINY)
    )

    # TP layout first, then merge the SAME lora through the translation
    tp_params, tp_cfg = layout.to_tp_layout(dict(params), TINY)
    tp_patches, tp_leftover = lora_mod.load_lora(
        lora_sd, lora_mod.unet_key_map(tp_params)
    )
    assert not tp_leftover and len(tp_patches) == 4
    tp_merged = lora_mod.apply_lora(
        tp_params, tp_patches, strength=0.8, model_cfg=tp_cfg
    )
    got = np.asarray(flux_mod.apply_flux(tp_merged, x, t, ctx, y, cfg=tp_cfg))
    np.testing.assert_allclose(got, oracle, atol=2e-4, rtol=1e-4)

    # without the translation the merge would be silently wrong
    bad = lora_mod.apply_lora(tp_params, tp_patches, strength=0.8)
    bad_out = np.asarray(flux_mod.apply_flux(bad, x, t, ctx, y, cfg=tp_cfg))
    assert not np.allclose(bad_out, oracle, atol=2e-4)


def test_trainer_checkpoint_roundtrip(tmp_path):
    """Sharded train-state save/restore (orbax): run a step, checkpoint,
    rebuild fresh state, restore, and verify params/opt_state/step come
    back bit-identical WITH their mesh shardings."""
    from lightdiffusion_next_tpu.parallel import trainer

    if len(jax.devices()) < 4:
        pytest.skip("needs virtual multi-device CPU")
    mesh, params, opt_state, jit_step, make_batch = trainer.build_sharded_trainer(
        2, 2, TINY
    )
    with mesh:
        batch = make_batch(batch_size=2, h=8, w=8, txt_len=6)
        params, opt_state, loss = jit_step(params, opt_state, batch)
    path = str(tmp_path / "ckpt")
    trainer.save_checkpoint(path, params, opt_state, step=1)

    # fresh trainer = fresh shardings template; restore into it
    mesh2, p2, o2, _, _ = trainer.build_sharded_trainer(2, 2, TINY)
    rp, ro, step = trainer.restore_checkpoint(path, p2, o2)
    assert step == 1
    for k in params:
        np.testing.assert_array_equal(np.asarray(rp[k]), np.asarray(params[k]))
        assert rp[k].sharding.is_equivalent_to(params[k].sharding, rp[k].ndim)
    # optimizer moments restored too (spot-check the flattened leaves)
    got = jax.tree.leaves(ro)
    want = jax.tree.leaves(opt_state)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
