"""Elementwise/norm/conv op parity vs torch oracles (fp32, CPU)."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from lightdiffusion_next_tpu.ops import nn


def test_linear_matches_torch(rng):
    x = rng.standard_normal((2, 5, 16)).astype(np.float32)
    w = rng.standard_normal((8, 16)).astype(np.float32)
    b = rng.standard_normal((8,)).astype(np.float32)
    ours = np.asarray(nn.linear(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    oracle = F.linear(torch.tensor(x), torch.tensor(w), torch.tensor(b)).numpy()
    np.testing.assert_allclose(ours, oracle, atol=1e-5)


def test_conv2d_matches_torch(rng):
    x = rng.standard_normal((1, 9, 9, 3)).astype(np.float32)
    w_oihw = rng.standard_normal((6, 3, 3, 3)).astype(np.float32)
    b = rng.standard_normal((6,)).astype(np.float32)
    w_hwio = np.transpose(w_oihw, (2, 3, 1, 0))
    ours = np.asarray(
        nn.conv2d(jnp.asarray(x), jnp.asarray(w_hwio), jnp.asarray(b), padding=1)
    )
    oracle = (
        F.conv2d(
            torch.tensor(x).permute(0, 3, 1, 2),
            torch.tensor(w_oihw),
            torch.tensor(b),
            padding=1,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, oracle, atol=1e-4)


def test_conv2d_stride2(rng):
    x = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
    w_oihw = rng.standard_normal((4, 4, 3, 3)).astype(np.float32)
    w_hwio = np.transpose(w_oihw, (2, 3, 1, 0))
    ours = np.asarray(
        nn.conv2d(jnp.asarray(x), jnp.asarray(w_hwio), stride=2, padding=1)
    )
    oracle = (
        F.conv2d(
            torch.tensor(x).permute(0, 3, 1, 2), torch.tensor(w_oihw),
            stride=2, padding=1,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, oracle, atol=1e-4)


def test_group_norm_matches_torch(rng):
    x = rng.standard_normal((2, 6, 6, 32)).astype(np.float32)
    g = rng.standard_normal((32,)).astype(np.float32)
    b = rng.standard_normal((32,)).astype(np.float32)
    ours = np.asarray(
        nn.group_norm(jnp.asarray(x), jnp.asarray(g), jnp.asarray(b), groups=8)
    )
    oracle = (
        F.group_norm(
            torch.tensor(x).permute(0, 3, 1, 2), 8, torch.tensor(g), torch.tensor(b)
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, oracle, atol=1e-4)


def test_layer_norm_matches_torch(rng):
    x = rng.standard_normal((2, 7, 24)).astype(np.float32)
    g = rng.standard_normal((24,)).astype(np.float32)
    b = rng.standard_normal((24,)).astype(np.float32)
    ours = np.asarray(nn.layer_norm(jnp.asarray(x), jnp.asarray(g), jnp.asarray(b)))
    oracle = F.layer_norm(
        torch.tensor(x), (24,), torch.tensor(g), torch.tensor(b)
    ).numpy()
    np.testing.assert_allclose(ours, oracle, atol=1e-4)


def test_geglu_matches_torch(rng):
    x = rng.standard_normal((2, 4, 8)).astype(np.float32)
    w = rng.standard_normal((32, 8)).astype(np.float32)
    b = rng.standard_normal((32,)).astype(np.float32)
    ours = np.asarray(nn.geglu(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    proj = F.linear(torch.tensor(x), torch.tensor(w), torch.tensor(b))
    val, gate = proj.chunk(2, dim=-1)
    oracle = (val * F.gelu(gate)).numpy()
    np.testing.assert_allclose(ours, oracle, atol=1e-5)


def test_nearest_upsample_matches_torch(rng):
    x = rng.standard_normal((1, 4, 4, 3)).astype(np.float32)
    ours = np.asarray(nn.interpolate_nearest(jnp.asarray(x), 2))
    oracle = (
        F.interpolate(torch.tensor(x).permute(0, 3, 1, 2), scale_factor=2.0)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, oracle)


def test_bilinear_matches_torch(rng):
    x = rng.standard_normal((1, 8, 8, 3)).astype(np.float32)
    ours = np.asarray(nn.interpolate_bilinear(jnp.asarray(x), (5, 5)))
    oracle = (
        F.interpolate(
            torch.tensor(x).permute(0, 3, 1, 2), size=(5, 5), mode="bilinear",
            align_corners=False,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, oracle, atol=1e-5)


def test_rms_norm(rng):
    x = rng.standard_normal((2, 3, 16)).astype(np.float32)
    g = rng.standard_normal((16,)).astype(np.float32)
    ours = np.asarray(nn.rms_norm(jnp.asarray(x), jnp.asarray(g)))
    xt = torch.tensor(x)
    oracle = (
        xt * torch.rsqrt(xt.pow(2).mean(-1, keepdim=True) + 1e-6) * torch.tensor(g)
    ).numpy()
    np.testing.assert_allclose(ours, oracle, atol=1e-5)
