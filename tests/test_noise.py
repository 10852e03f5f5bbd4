"""Noise policy tests: torch-seed parity and Brownian interval statistics."""

import numpy as np
import torch

from lightdiffusion_next_tpu.sampling import noise


def test_prepare_noise_torch_parity():
    ours = noise.prepare_noise((2, 8, 8, 4), seed=42, mode="torch")
    gen = torch.manual_seed(42)
    oracle = torch.randn((2, 8, 8, 4), generator=gen).numpy()
    np.testing.assert_array_equal(ours, oracle)


def test_prepare_noise_noise_inds():
    ours = noise.prepare_noise((2, 4, 4, 4), seed=7, mode="torch", noise_inds=[1, 1])
    gen = torch.manual_seed(7)
    _ = torch.randn((1, 4, 4, 4), generator=gen)  # skipped index 0
    keep = torch.randn((1, 4, 4, 4), generator=gen).numpy()
    oracle = np.concatenate([keep, keep], axis=0)
    np.testing.assert_array_equal(ours, oracle)


def test_prepare_noise_jax_mode_deterministic():
    a = noise.prepare_noise((1, 4, 4, 4), seed=3, mode="jax")
    b = noise.prepare_noise((1, 4, 4, 4), seed=3, mode="jax")
    c = noise.prepare_noise((1, 4, 4, 4), seed=4, mode="jax")
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_step_noise_continues_torch_stream():
    shape = (1, 4, 4, 4)
    steps = noise.step_noise_batch(shape, 3, seed=11, mode="torch")
    gen = torch.manual_seed(11)
    _ = torch.randn(shape, generator=gen)
    oracle = torch.randn((3,) + shape, generator=gen).numpy()
    np.testing.assert_array_equal(steps, oracle)


def test_brownian_interval_statistics():
    # increments over disjoint intervals must be independent unit normals
    shape = (512,)
    levels = [0.1, 0.5, 1.0, 2.0]
    s = noise.BrownianIntervalSampler(shape, levels, seed=0, mode="jax")
    n1 = s(2.0, 1.0)
    n2 = s(1.0, 0.5)
    assert abs(np.std(n1) - 1.0) < 0.15
    assert abs(np.std(n2) - 1.0) < 0.15
    assert abs(np.corrcoef(n1, n2)[0, 1]) < 0.15


def test_brownian_overlapping_queries_consistent():
    # W(a->c) * sqrt(c-a) == W(a->b)*sqrt(b-a) + W(b->c)*sqrt(c-b)
    shape = (64,)
    s = noise.BrownianIntervalSampler(shape, [0.2, 0.7, 1.5], seed=5, mode="jax")
    ac = s(1.5, 0.2) * np.sqrt(1.3)
    ab = s(1.5, 0.7) * np.sqrt(0.8)
    bc = s(0.7, 0.2) * np.sqrt(0.5)
    np.testing.assert_allclose(ac, ab + bc, rtol=1e-5, atol=1e-7)


def test_sde_noise_shapes():
    sigmas = np.asarray([10.0, 5.0, 2.0, 0.0], dtype=np.float32)
    n1, n2 = noise.sde_noise_for_steps((1, 2, 2, 4), sigmas, r=0.5, eta=1.0, seed=9)
    assert n1.shape == (3, 1, 2, 2, 4)
    assert n2.shape == (3, 1, 2, 2, 4)
    # last step targets sigma 0 -> zero noise
    assert np.all(n1[-1] == 0) and np.all(n2[-1] == 0)
    assert np.std(n2[0]) > 0.1
