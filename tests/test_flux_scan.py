"""Scan-over-blocks Flux forward (models.flux.stack_block_params + the
``__double_stack__``/``__single_stack__`` branch of apply_flux).

Parity: the scanned forward must produce the unrolled forward's values for
dense, Q8_0 (StackedQTensor8T -> quant_matmul_stacked) and W8A8
(StackedQTensor8W -> w8a8_matmul_stacked) params — and the compiled
program size must stop growing with depth (the whole point: the reference
-scale 19+38-block unroll costs 430-1400 s of uncached XLA compile)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightdiffusion_next_tpu.models import flux as flux_mod
from lightdiffusion_next_tpu.ops import ggml

# hidden=256 keeps every quantized K a multiple of 256 so the fused
# kernels run (interpret mode on CPU) instead of the dequant+dot fallback
TINY = flux_mod.FluxConfig(
    in_channels=4,
    hidden_size=256,
    num_heads=8,
    depth=3,
    depth_single_blocks=3,
    axes_dim=(4, 14, 14),
    context_in_dim=32,
    vec_in_dim=16,
)

QUANT_SUFFIXES = (
    "qkv.weight",
    "proj.weight",
    "mlp.0.weight",
    "mlp.2.weight",
    "linear1.weight",
    "linear2.weight",
    "mod.lin.weight",
    "modulation.lin.weight",
)


def _inputs(rng, cfg=TINY, tokens=12):
    x = jnp.asarray(rng.standard_normal((1, 8, 8, cfg.in_channels)), jnp.float32)
    t = jnp.asarray([0.5])
    ctx = jnp.asarray(
        rng.standard_normal((1, tokens, cfg.context_in_dim)), jnp.float32
    )
    y = jnp.asarray(rng.standard_normal((1, cfg.vec_in_dim)), jnp.float32)
    return x, t, ctx, y


def _quantized_params(cfg, seed=0):
    """init_params -> Q8_0-quantize the block matmul weights -> device
    (fused QTensor8T layout, like a real GGUF load)."""
    params = flux_mod.init_params(cfg, seed=seed)
    sd = {}
    for k, v in params.items():
        if (
            v.ndim == 2
            and any(k.endswith(s) for s in QUANT_SUFFIXES)
            and v.shape[-1] % 32 == 0
        ):
            q, s = ggml.quantize_q8_0(v)
            sd[k] = ggml.QTensor8(q=q, scales=s, shape=v.shape)
        else:
            sd[k] = v
    return ggml.to_device_quantized(sd, dtype=jnp.float32)


def test_dense_scan_matches_unrolled(rng):
    params = {
        k: jnp.asarray(v) for k, v in flux_mod.init_params(TINY, seed=0).items()
    }
    x, t, ctx, y = _inputs(rng)
    base = np.asarray(flux_mod.apply_flux(params, x, t, ctx, y, cfg=TINY))

    stacked = flux_mod.stack_block_params(params, TINY)
    assert flux_mod.is_stacked(stacked)
    assert "double_blocks.0.img_attn.qkv.weight" not in stacked
    out = np.asarray(flux_mod.apply_flux(stacked, x, t, ctx, y, cfg=TINY))
    np.testing.assert_allclose(out, base, atol=1e-5, rtol=1e-5)


def test_quantized_scan_matches_unrolled(rng):
    params = _quantized_params(TINY, seed=1)
    assert isinstance(
        params["double_blocks.0.img_attn.qkv.weight"], ggml.QTensor8T
    )
    x, t, ctx, y = _inputs(rng)
    base = np.asarray(flux_mod.apply_flux(params, x, t, ctx, y, cfg=TINY))

    stacked = flux_mod.stack_block_params(params, TINY)
    dstack = stacked[flux_mod.DOUBLE_STACK_KEY]
    assert isinstance(dstack["img_attn.qkv.weight"], ggml.StackedQTensor8T)
    assert dstack["img_attn.qkv.weight"].depth == TINY.depth
    out = np.asarray(flux_mod.apply_flux(stacked, x, t, ctx, y, cfg=TINY))
    np.testing.assert_allclose(out, base, atol=2e-5, rtol=1e-5)


def test_w8a8_scan_matches_unrolled(rng):
    params = ggml.to_w8a8(_quantized_params(TINY, seed=2))
    assert isinstance(
        params["single_blocks.0.linear1.weight"], ggml.QTensor8W
    )
    x, t, ctx, y = _inputs(rng)
    base = np.asarray(flux_mod.apply_flux(params, x, t, ctx, y, cfg=TINY))

    stacked = flux_mod.stack_block_params(params, TINY)
    sstack = stacked[flux_mod.SINGLE_STACK_KEY]
    assert isinstance(sstack["linear1.weight"], ggml.StackedQTensor8W)
    out = np.asarray(flux_mod.apply_flux(stacked, x, t, ctx, y, cfg=TINY))
    np.testing.assert_allclose(out, base, atol=2e-5, rtol=1e-5)


def test_scan_first_block_hook_boundary(rng):
    """The FBCache boundary survives stacking: a pass-through hook is an
    identity, and the hook sees block 0's output (h_first) equal to the
    unrolled forward's."""
    params = {
        k: jnp.asarray(v) for k, v in flux_mod.init_params(TINY, seed=3).items()
    }
    # stack a COPY: stack_block_params consumes its input dict (donation
    # semantics) and the unrolled oracle below still needs the flat keys
    stacked = flux_mod.stack_block_params(dict(params), TINY)
    x, t, ctx, y = _inputs(rng)

    seen = {}

    def capture(h_prev, h_first, run_rest):
        seen["first"] = h_first
        return run_rest(h_first)

    plain = np.asarray(flux_mod.apply_flux(stacked, x, t, ctx, y, cfg=TINY))
    hooked = np.asarray(
        flux_mod.apply_flux(
            stacked, x, t, ctx, y, cfg=TINY, first_block_hook=capture
        )
    )
    np.testing.assert_allclose(hooked, plain, atol=1e-6)

    seen_unrolled = {}

    def capture_unrolled(h_prev, h_first, run_rest):
        seen_unrolled["first"] = h_first
        return run_rest(h_first)

    flux_mod.apply_flux(
        params, x, t, ctx, y, cfg=TINY, first_block_hook=capture_unrolled
    )
    np.testing.assert_allclose(
        np.asarray(seen["first"]), np.asarray(seen_unrolled["first"]), atol=1e-5
    )


def test_scan_program_size_constant_in_depth():
    """The compiled program must not grow with block count — two scan
    bodies replace the 57-block unroll (the compile-time claim)."""
    def eqn_count(cfg):
        params = {
            k: jnp.asarray(v)
            for k, v in flux_mod.init_params(cfg, seed=0).items()
        }
        stacked = flux_mod.stack_block_params(params, cfg)
        x = jnp.zeros((1, 8, 8, cfg.in_channels), jnp.float32)
        t = jnp.asarray([0.5])
        ctx = jnp.zeros((1, 8, cfg.context_in_dim), jnp.float32)
        y = jnp.zeros((1, cfg.vec_in_dim), jnp.float32)
        jaxpr = jax.make_jaxpr(
            lambda p: flux_mod.apply_flux(p, x, t, ctx, y, cfg=cfg)
        )(stacked)
        return len(jaxpr.jaxpr.eqns)

    shallow = eqn_count(dataclasses.replace(TINY, depth=2, depth_single_blocks=2))
    deep = eqn_count(dataclasses.replace(TINY, depth=6, depth_single_blocks=8))
    assert deep == shallow, (shallow, deep)


def test_stack_refuses_tp_and_lora():
    params = flux_mod.init_params(TINY, seed=0)
    with pytest.raises(ValueError, match="single-device"):
        flux_mod.stack_block_params(
            params, dataclasses.replace(TINY, tp_layout=True)
        )
    qt = ggml.transpose_for_matmul(
        ggml.QTensor8(
            *ggml.quantize_q8_0(np.ones((64, 64), np.float32)), shape=(64, 64)
        )
    )
    lora = ggml.QTensorLoRA(
        base=qt, up=np.zeros((64, 2), np.float32), down=np.zeros((2, 64), np.float32)
    )
    with pytest.raises(ValueError, match="LoRA"):
        ggml.stack_leaves([lora, lora])


def test_stack_consumes_input_dict():
    """Donation semantics: the input dict is cleared as families stack, so
    the caller cannot keep a second full-footprint reference alive (the
    13-GB-next-to-13-GB load OOM class)."""
    params = {
        k: jnp.asarray(v) for k, v in flux_mod.init_params(TINY, seed=9).items()
    }
    stacked = flux_mod.stack_block_params(params, TINY)
    assert params == {}
    assert flux_mod.is_stacked(stacked)


def test_stack_validates_before_consuming():
    """A non-uniform family must raise BEFORE the input dict is touched —
    the loader's warn-and-fallback path keeps serving the unrolled dict."""
    params = {
        k: jnp.asarray(v) for k, v in flux_mod.init_params(TINY, seed=10).items()
    }
    # corrupt one block's weight shape -> non-uniform dense family
    bad = params["double_blocks.1.img_attn.proj.weight"]
    params["double_blocks.1.img_attn.proj.weight"] = bad[:, : bad.shape[1] // 2]
    n_keys = len(params)
    with pytest.raises(ValueError, match="non-uniform"):
        flux_mod.stack_block_params(params, TINY)
    assert len(params) == n_keys, "failed stacking must not consume"


def test_lora_refuses_stacked_params():
    """apply_lora on a scan-mode dict must be a loud error, not a silent
    no-op (patch keys are flat double_blocks.* names the stacked dict no
    longer contains)."""
    from lightdiffusion_next_tpu.models import lora as lora_mod

    params = {
        k: jnp.asarray(v) for k, v in flux_mod.init_params(TINY, seed=11).items()
    }
    stacked = flux_mod.stack_block_params(params, TINY)
    H = TINY.hidden_size
    patches = {
        "double_blocks.0.img_attn.qkv.weight": (
            np.zeros((3 * H, 2), np.float32), np.zeros((2, H), np.float32),
            2.0,
        )
    }
    with pytest.raises(ValueError, match="scan-mode"):
        lora_mod.apply_lora(stacked, patches)


def _host_quantized_params(cfg, seed=0):
    """_quantized_params but HOST-side (numpy-backed QTensor8T leaves,
    ggml.to_device_quantized(device=False)) for the scan host-prep path."""
    params = flux_mod.init_params(cfg, seed=seed)
    sd = {}
    for k, v in params.items():
        if (
            v.ndim == 2
            and any(k.endswith(s) for s in QUANT_SUFFIXES)
            and v.shape[-1] % 32 == 0
        ):
            q, s = ggml.quantize_q8_0(v)
            sd[k] = ggml.QTensor8(q=q, scales=s, shape=v.shape)
        else:
            sd[k] = v
    return ggml.to_device_quantized(sd, dtype=jnp.float32, device=False)


class TestHostPrep:
    """stack_block_params_host + permute_rope_basis(device=False): the
    HBM-fragmentation-free scan load order (host permute -> host stack ->
    big-buffer upload -> stacked device w8a8) must be BIT-identical to
    the device order (upload -> w8a8 -> permute -> stack) — every
    transform is integer index shuffling or a per-column requant that
    commutes with it."""

    def _assert_trees_equal(self, a, b):
        la, ta = jax.tree.flatten(a)
        lb, tb = jax.tree.flatten(b)
        assert ta == tb
        for x, y in zip(la, lb):
            assert np.asarray(x).dtype == np.asarray(y).dtype
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_host_stack_bit_exact(self):
        dev = flux_mod.stack_block_params(_quantized_params(TINY, seed=7), TINY)
        hst = flux_mod.stack_block_params_host(
            _host_quantized_params(TINY, seed=7), TINY
        )
        self._assert_trees_equal(dev, hst)

    def test_full_host_order_bit_exact_w8a8_fused(self):
        # device order: upload -> w8a8 -> permute -> stack
        dev = _quantized_params(TINY, seed=8)
        dev = ggml.to_w8a8(dev)
        dev = flux_mod.permute_rope_basis(dev, TINY)
        dev = flux_mod.stack_block_params(dev, TINY)
        # host order: permute -> stack -> upload -> w8a8
        hst = _host_quantized_params(TINY, seed=8)
        hst = flux_mod.permute_rope_basis(hst, TINY, device=False)
        hst = flux_mod.stack_block_params_host(hst, TINY)
        hst = ggml.to_w8a8(hst)
        self._assert_trees_equal(dev, hst)

    def test_host_prepped_forward_matches_unrolled(self, rng):
        base_params = _quantized_params(TINY, seed=9)
        x, t, ctx, y = _inputs(rng)
        base = np.asarray(flux_mod.apply_flux(base_params, x, t, ctx, y, cfg=TINY))
        hst = flux_mod.stack_block_params_host(
            _host_quantized_params(TINY, seed=9), TINY
        )
        out = np.asarray(flux_mod.apply_flux(hst, x, t, ctx, y, cfg=TINY))
        np.testing.assert_allclose(out, base, atol=2e-5, rtol=1e-5)

    def test_host_stack_validates_before_consuming(self):
        params = _host_quantized_params(TINY, seed=10)
        del params["double_blocks.1.img_attn.qkv.weight"]
        keys = set(params)
        with pytest.raises(ValueError):
            flux_mod.stack_block_params_host(params, TINY)
        assert set(params) == keys  # intact for the unrolled fallback


def test_loader_scan_falls_back_on_unstackable_checkpoint(
    tmp_path, rng, caplog, monkeypatch
):
    """A checkpoint whose families cannot stack must load unrolled with a
    warning, not fail the generation (loader warn-and-fallback parity with
    spmd.to_spmd_model)."""
    import logging

    from lightdiffusion_next_tpu.pipelines import loader

    params = flux_mod.init_params(TINY, seed=12)
    params = {k: v for k, v in params.items() if not k.startswith("guidance_in")}
    path = str(tmp_path / "tiny_flux_badscan.gguf")
    ggml.write_gguf(path, params, arch="flux", quantize=("qkv.weight",))

    def boom(p, cfg):
        raise ValueError("synthetic unstackable family")

    monkeypatch.setattr(flux_mod, "stack_block_params", boom)
    monkeypatch.setattr(flux_mod, "stack_block_params_host", boom)
    with caplog.at_level(logging.WARNING):
        model = loader.load_diffusion_model_gguf(path, scan_blocks=True)
    assert not flux_mod.is_stacked(model.params)
    assert "unrolled" in caplog.text

    x, t, ctx, y = _inputs(rng, cfg=model.config)
    out = np.asarray(model.apply_fn(model.params, x, t, ctx, y))
    assert np.isfinite(out).all()


def test_loader_scan_blocks_matches_unrolled(tmp_path, rng):
    """GGUF -> scan-mode integration: same file loaded unrolled and
    stacked must denoise identically (and the scan variant must actually
    be stacked)."""
    from lightdiffusion_next_tpu.pipelines import loader

    params = flux_mod.init_params(TINY, seed=6)
    params = {k: v for k, v in params.items() if not k.startswith("guidance_in")}
    path = str(tmp_path / "tiny_flux_scan.gguf")
    ggml.write_gguf(
        path, params, arch="flux",
        quantize=("qkv.weight", "linear1.weight", "linear2.weight"),
    )

    single = loader.load_diffusion_model_gguf(path)
    scanned = loader.load_diffusion_model_gguf(path, scan_blocks=True)
    assert flux_mod.is_stacked(scanned.params)
    assert not flux_mod.is_stacked(single.params)

    x, t, ctx, y = _inputs(rng, cfg=single.config)
    base = np.asarray(single.apply_fn(single.params, x, t, ctx, y))
    out = np.asarray(scanned.apply_fn(scanned.params, x, t, ctx, y))
    np.testing.assert_allclose(out, base, atol=2e-5, rtol=1e-5)


class TestAutoDefault:
    """Round 4: scan-over-blocks became the TPU serving default ("auto"
    resolves via platform) — measured 7.77 vs 8.09 s/image unrolled, cold
    compile+first-run 496 vs 965 s, equal HBM peak once params stack on
    the host. CPU (this suite) must keep resolving to the unrolled
    forward so oracle tests compare against the reference layout."""

    def test_auto_resolves_by_platform(self, monkeypatch):
        from lightdiffusion_next_tpu import config as _config

        cfg = dataclasses.replace(_config.get_config(), flux_scan="auto")
        monkeypatch.setattr(_config, "is_tpu", lambda: False)
        assert cfg.resolve_flux_scan() is False
        monkeypatch.setattr(_config, "is_tpu", lambda: True)
        assert cfg.resolve_flux_scan() is True

    def test_explicit_bool_wins_and_validates(self):
        from lightdiffusion_next_tpu import config as _config

        assert dataclasses.replace(
            _config.get_config(), flux_scan=True).resolve_flux_scan() is True
        assert dataclasses.replace(
            _config.get_config(), flux_scan=False).resolve_flux_scan() is False
        with pytest.raises(ValueError):
            dataclasses.replace(_config.get_config(), flux_scan="yes")

    def test_env_default_parsing(self, monkeypatch):
        from lightdiffusion_next_tpu import config as _config

        for env, want in (("1", True), ("0", False), ("auto", "auto"),
                          ("", "auto"), ("junk", "auto")):
            monkeypatch.setenv("LDT_FLUX_SCAN", env)
            assert _config.RuntimeConfig().flux_scan == want

    def test_trace_token_carries_resolved_flux_scan(self, monkeypatch):
        """trace_token must track the RESOLVED scan mode so a platform or
        toggle flip retraces warm runners instead of reusing the other
        layout's program."""
        from lightdiffusion_next_tpu import config as _config

        old = _config.get_config()
        try:
            _config.set_config(dataclasses.replace(old, flux_scan="auto"))
            monkeypatch.setattr(_config, "is_tpu", lambda: False)
            off = _config.trace_token()
            monkeypatch.setattr(_config, "is_tpu", lambda: True)
            on = _config.trace_token()
            assert off != on
        finally:
            _config.set_config(old)
