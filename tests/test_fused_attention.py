"""Fused-prologue attention (QKNorm + RoPE + head indexing in-kernel).

Round-4 kernel: ops.flash_attention.fused_qkv_attention reads the fused
qkv projection directly (models.flux.permute_rope_basis puts q/k in the
half-split RoPE basis so the in-kernel rotation is one lane roll).
Parity oracle: the unfused path (split heads -> nn.rms_norm ->
rope_ops.apply_rope -> sdpa -> fold) on the SAME unpermuted tensors.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightdiffusion_next_tpu.models import flux as flux_mod
from lightdiffusion_next_tpu.ops import attention as attn_ops
from lightdiffusion_next_tpu.ops import flash_attention as fa
from lightdiffusion_next_tpu.ops import nn, rope as rope_ops


def _ref_attention(q, k, v, qs, ks, ids, axes_dim, txt_len=0, tqs=None,
                   tks=None):
    """Unfused oracle on head-major (B, H, L, D) tensors."""
    if txt_len:
        qn = jnp.concatenate(
            [
                nn.rms_norm(q[:, :, :txt_len], tqs),
                nn.rms_norm(q[:, :, txt_len:], qs),
            ],
            axis=2,
        )
        kn = jnp.concatenate(
            [
                nn.rms_norm(k[:, :, :txt_len], tks),
                nn.rms_norm(k[:, :, txt_len:], ks),
            ],
            axis=2,
        )
    else:
        qn = nn.rms_norm(q, qs)
        kn = nn.rms_norm(k, ks)
    pe = rope_ops.embed_nd(ids, axes_dim)
    qr, kr = rope_ops.apply_rope(qn, kn, pe)
    return attn_ops.sdpa(qr, kr, v)  # (B, H, L, D)


def _fuse_qkv(q, k, v, pi):
    """(B, H, L, D) q/k/v -> fused (B, L, 3*H*D) with q,k permuted."""
    b, h, l, d = q.shape

    def fold(x):
        return x.transpose(0, 2, 1, 3).reshape(b, l, h * d)

    return jnp.concatenate(
        [fold(q[..., pi]), fold(k[..., pi]), fold(v)], axis=-1
    )


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _ids(b, l, n_axes=3, seed=3):
    r = np.random.default_rng(seed)
    ids = r.integers(0, 32, (1, l, n_axes)).astype(np.float32)
    return jnp.asarray(np.tile(ids, (b, 1, 1)))


class TestFusedKernel:
    def test_matches_unfused_single_stream(self, rng):
        b, h, l, d = 1, 2, 256, 128
        q, k, v = (
            jnp.asarray(rng.standard_normal((b, h, l, d)), jnp.float32)
            for _ in range(3)
        )
        qs = jnp.asarray(rng.standard_normal((d,)) * 0.2 + 1.0, jnp.float32)
        ks = jnp.asarray(rng.standard_normal((d,)) * 0.2 + 1.0, jnp.float32)
        ids = _ids(b, l)
        axes = (32, 48, 48)

        ref = _ref_attention(q, k, v, qs, ks, ids, axes)
        ref_folded = ref.transpose(0, 2, 1, 3).reshape(b, l, h * d)

        pi = flux_mod.rope_pair_permutation(d)
        cos, sin = flux_mod.rope_cos_sin(ids, axes)
        out = fa.fused_qkv_attention(
            _fuse_qkv(q, k, v, pi), qs[pi], ks[pi], cos, sin, num_heads=h
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref_folded), rtol=2e-2, atol=2e-2
        )

    def test_matches_unfused_joint_txt_img(self, rng):
        """Double-block shape: txt rows use their own QKNorm scales."""
        b, h, l, d, txt_len = 1, 1, 288, 128, 32
        q, k, v = (
            jnp.asarray(rng.standard_normal((b, h, l, d)), jnp.float32)
            for _ in range(3)
        )
        mk = lambda: jnp.asarray(
            rng.standard_normal((d,)) * 0.2 + 1.0, jnp.float32
        )
        qs, ks, tqs, tks = mk(), mk(), mk(), mk()
        ids = _ids(b, l)
        axes = (32, 48, 48)

        ref = _ref_attention(
            q, k, v, qs, ks, ids, axes, txt_len=txt_len, tqs=tqs, tks=tks
        )
        ref_folded = ref.transpose(0, 2, 1, 3).reshape(b, l, h * d)

        pi = flux_mod.rope_pair_permutation(d)
        cos, sin = flux_mod.rope_cos_sin(ids, axes)
        out = fa.fused_qkv_attention(
            _fuse_qkv(q, k, v, pi), qs[pi], ks[pi], cos, sin,
            num_heads=h, txt_len=txt_len,
            txt_q_scale=tqs[pi], txt_k_scale=tks[pi],
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref_folded), rtol=2e-2, atol=2e-2
        )

    def test_extra_trailing_lanes_ignored(self, rng):
        """single-block linear1 layout: mlp columns after v are inert."""
        b, h, l, d = 1, 1, 256, 128
        q, k, v = (
            jnp.asarray(rng.standard_normal((b, h, l, d)), jnp.float32)
            for _ in range(3)
        )
        qs = jnp.ones((d,), jnp.float32)
        ks = jnp.ones((d,), jnp.float32)
        ids = _ids(b, l)
        axes = (32, 48, 48)
        pi = flux_mod.rope_pair_permutation(d)
        cos, sin = flux_mod.rope_cos_sin(ids, axes)
        qkv = _fuse_qkv(q, k, v, pi)
        with_mlp = jnp.concatenate(
            [qkv, jnp.full((b, l, 256), 7.0, qkv.dtype)], axis=-1
        )
        a = fa.fused_qkv_attention(qkv, qs, ks, cos, sin, num_heads=h)
        bb = fa.fused_qkv_attention(with_mlp, qs, ks, cos, sin, num_heads=h)
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb))


class TestFusedFluxForward:
    def _tiny(self):
        return dataclasses.replace(
            flux_mod.FLUX_DEV,
            hidden_size=256, num_heads=2, depth=1, depth_single_blocks=2,
            mlp_ratio=2.0, axes_dim=(32, 48, 48), vec_in_dim=32,
            context_in_dim=48,
        )

    def test_forward_parity_fused_vs_unfused(self, rng):
        cfg = self._tiny()
        params = flux_mod.init_params(cfg, seed=0)
        b, hw = 1, 16
        x = jnp.asarray(rng.standard_normal((b, hw, hw, 16)), jnp.float32)
        t = jnp.asarray([0.5], jnp.float32)
        ctx = jnp.asarray(
            rng.standard_normal((b, 32, cfg.context_in_dim)), jnp.float32
        )
        y = jnp.asarray(rng.standard_normal((b, cfg.vec_in_dim)), jnp.float32)
        g = jnp.asarray([3.0], jnp.float32)

        ref = flux_mod.apply_flux(params, x, t, ctx, y, guidance=g, cfg=cfg)

        fcfg = dataclasses.replace(cfg, fused_attn=True)
        fparams = flux_mod.permute_rope_basis(params, cfg)
        out = flux_mod.apply_flux(fparams, x, t, ctx, y, guidance=g, cfg=fcfg)

        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=3e-2, atol=3e-2
        )

    def test_forward_parity_fused_scan_vs_fused_unrolled(self, rng):
        """fused_attn x flux_scan: permute THEN stack (the loader order,
        pipelines/loader.py) must reproduce the fused unrolled forward —
        the scan bodies dispatch the same fused kernel per iteration via
        StackView'd norm scales and streamed block weights."""
        cfg = dataclasses.replace(
            self._tiny(), depth=3, depth_single_blocks=3
        )
        params = flux_mod.init_params(cfg, seed=2)
        b, hw = 1, 16
        x = jnp.asarray(rng.standard_normal((b, hw, hw, 16)), jnp.float32)
        t = jnp.asarray([0.5], jnp.float32)
        ctx = jnp.asarray(
            rng.standard_normal((b, 32, cfg.context_in_dim)), jnp.float32
        )
        y = jnp.asarray(rng.standard_normal((b, cfg.vec_in_dim)), jnp.float32)

        fcfg = dataclasses.replace(cfg, fused_attn=True)
        fparams = flux_mod.permute_rope_basis(
            {k: jnp.asarray(v) for k, v in params.items()}, cfg
        )
        ref = np.asarray(
            flux_mod.apply_flux(dict(fparams), x, t, ctx, y, cfg=fcfg)
        )

        stacked = flux_mod.stack_block_params(fparams, fcfg)
        assert flux_mod.is_stacked(stacked)
        out = np.asarray(flux_mod.apply_flux(stacked, x, t, ctx, y, cfg=fcfg))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    def test_forward_parity_fused_scan_w8a8(self, rng):
        """The full TPU serving stack in one forward: W8A8 block weights
        (StackedQTensor8W streaming matmuls) + the fused-prologue kernel
        inside the scan bodies, vs the same leaves unrolled."""
        from lightdiffusion_next_tpu.ops import ggml

        cfg = dataclasses.replace(
            self._tiny(), depth=2, depth_single_blocks=2
        )
        params = flux_mod.init_params(cfg, seed=3)
        sd = {}
        for k, v in params.items():
            if (
                v.ndim == 2
                and v.shape[-1] % 256 == 0
                and ("_blocks." in k)
                and k.endswith(".weight")
            ):
                q, s = ggml.quantize_q8_0(v)
                sd[k] = ggml.QTensor8(q=q, scales=s, shape=v.shape)
            else:
                sd[k] = v
        qparams = ggml.to_w8a8(
            ggml.to_device_quantized(sd, dtype=jnp.float32)
        )

        fcfg = dataclasses.replace(cfg, fused_attn=True)
        fparams = flux_mod.permute_rope_basis(qparams, cfg)
        b, hw = 1, 16
        x = jnp.asarray(rng.standard_normal((b, hw, hw, 16)), jnp.float32)
        t = jnp.asarray([0.5], jnp.float32)
        ctx = jnp.asarray(
            rng.standard_normal((b, 32, cfg.context_in_dim)), jnp.float32
        )
        y = jnp.asarray(rng.standard_normal((b, cfg.vec_in_dim)), jnp.float32)
        ref = np.asarray(
            flux_mod.apply_flux(dict(fparams), x, t, ctx, y, cfg=fcfg)
        )
        stacked = flux_mod.stack_block_params(fparams, fcfg)
        out = np.asarray(flux_mod.apply_flux(stacked, x, t, ctx, y, cfg=fcfg))
        # RMSE bound, not allclose: under the scan's TRACED block index,
        # XLA reassociates the f32 elementwise chains (~1e-7), which can
        # flip an activation-quantization bin in quantize_rows — a ~one-
        # LSB (absmax/127) output step per flip. Inherent to any
        # activation-quantized path (same class as the measured on-chip
        # w8a8-vs-Q8_0 drift, 1.5% rel RMSE); the static-index stacked
        # forward is bit-identical to the flat kernels
        # (tests above / ops-level A/B in test_flux_scan).
        rel_rmse = np.sqrt(((out - ref) ** 2).mean()) / (
            np.sqrt((ref**2).mean()) + 1e-12
        )
        assert rel_rmse < 5e-3, rel_rmse
        assert np.abs(out - ref).max() < 5e-2

    def test_permute_refuses_tp_and_stacked(self):
        cfg = self._tiny()
        params = flux_mod.init_params(cfg, seed=0)
        with pytest.raises(ValueError):
            flux_mod.permute_rope_basis(
                params, dataclasses.replace(cfg, tp_layout=True)
            )
        stacked = flux_mod.stack_block_params(dict(params), cfg)
        with pytest.raises(ValueError):
            flux_mod.permute_rope_basis(stacked, cfg)

    def test_permutation_is_involution_on_logits(self, rng):
        """QK^T is invariant under the shared basis permutation."""
        d = 128
        pi = flux_mod.rope_pair_permutation(d)
        q = rng.standard_normal((8, d)).astype(np.float32)
        k = rng.standard_normal((8, d)).astype(np.float32)
        np.testing.assert_allclose(q @ k.T, q[:, pi] @ k[:, pi].T, rtol=1e-5)


class TestAutoDefault:
    """Round 4: fused-prologue attention became the TPU serving default
    ("auto" resolves via platform) after the on-chip measurement — Flux
    w8a8 10.45 -> 8.78 s/image (-16%), latent rel RMSE 0.56%. CPU (this
    suite) must keep resolving to the unfused prologue."""

    def test_auto_resolves_by_platform(self, monkeypatch):
        from lightdiffusion_next_tpu import config as _config

        cfg = dataclasses.replace(_config.get_config(), fused_attn="auto")
        monkeypatch.setattr(_config, "is_tpu", lambda: False)
        assert cfg.resolve_fused_attn() is False
        monkeypatch.setattr(_config, "is_tpu", lambda: True)
        assert cfg.resolve_fused_attn() is True

    def test_explicit_bool_wins_and_validates(self):
        from lightdiffusion_next_tpu import config as _config

        assert dataclasses.replace(
            _config.get_config(), fused_attn=True
        ).resolve_fused_attn() is True
        assert dataclasses.replace(
            _config.get_config(), fused_attn=False
        ).resolve_fused_attn() is False
        with pytest.raises(ValueError):
            dataclasses.replace(_config.get_config(), fused_attn="yes")

    def test_env_default_parsing(self, monkeypatch):
        from lightdiffusion_next_tpu import config as _config

        for env, want in (("1", True), ("0", False), ("auto", "auto"),
                          ("", "auto"), ("junk", "auto")):
            monkeypatch.setenv("LDT_FUSED_ATTN", env)
            assert _config.RuntimeConfig().fused_attn == want

    def test_trace_token_carries_resolved_fused_attn(self, monkeypatch):
        from lightdiffusion_next_tpu import config as _config

        monkeypatch.setattr(_config, "is_tpu", lambda: True)
        base = _config.get_config()
        try:
            _config.set_config(
                dataclasses.replace(base, fused_attn="auto"))
            tok_auto = _config.trace_token()
            _config.set_config(
                dataclasses.replace(base, fused_attn=False))
            tok_off = _config.trace_token()
        finally:
            _config.set_config(base)
        assert tok_auto != tok_off
