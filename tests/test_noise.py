"""Noise policy tests: torch-seed parity and Brownian interval statistics."""

import numpy as np
import pytest
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


class TestTorchSDEBrownianTree:
    """torchsde.BrownianTree-compatible value stream (the rng_mode="torch"
    SDE noise source). In-law properties assert unconditionally; the
    bitwise comparison runs wherever torchsde is importable."""

    def test_deterministic_and_seed_sensitive(self):
        a = noise.TorchSDEBrownianTree((64,), 0.03, 14.6, entropy=42)
        b = noise.TorchSDEBrownianTree((64,), 0.03, 14.6, entropy=42)
        c = noise.TorchSDEBrownianTree((64,), 0.03, 14.6, entropy=43)
        np.testing.assert_array_equal(a(5.0, 3.0), b(5.0, 3.0))
        assert not np.allclose(a(5.0, 3.0), c(5.0, 3.0))

    def test_path_additivity_and_antisymmetry(self):
        t = noise.TorchSDEBrownianTree((256,), 0.1, 10.0, entropy=1)
        ab, bc, ac = t(1.0, 4.0), t(4.0, 9.0), t(1.0, 9.0)
        np.testing.assert_allclose(ac, ab + bc, atol=1e-5)
        np.testing.assert_allclose(t(4.0, 1.0), -ab, atol=1e-6)

    def test_increment_law(self):
        t = noise.TorchSDEBrownianTree((8192,), 0.0, 16.0, entropy=9)
        for lo, hi in [(1.0, 3.0), (5.0, 5.5), (10.0, 14.0)]:
            w = np.asarray(t(lo, hi), np.float64)
            assert abs(w.mean()) < 0.1
            np.testing.assert_allclose(w.std(), np.sqrt(hi - lo), rtol=0.06)

    def test_descending_schedule_sign_convention(self):
        """BatchedBrownianTree sorts at init AND call; for a descending
        (sigma, sigma_next) query the result is -(W(hi)-W(lo))
        (sampling_util.py:190-236)."""
        t = noise.TorchSDEBrownianTree((32,), 0.1, 10.0, entropy=3)
        np.testing.assert_allclose(t(7.0, 2.0), -t(2.0, 7.0), atol=1e-6)

    def test_bitwise_vs_torchsde_when_available(self):
        """Exact-match oracle: runs only where torchsde is installed (not
        in this environment — zero egress; see PARITY.md)."""
        torchsde = pytest.importorskip("torchsde")
        import torch

        w0 = torch.zeros(16)
        ref_tree = torchsde.BrownianTree(
            torch.tensor(0.03), w0, torch.tensor(14.6), entropy=42, tol=1e-6
        )
        ours = noise.TorchSDEBrownianTree((16,), 0.03, 14.6, entropy=42)
        for lo, hi in [(0.5, 3.0), (3.0, 9.0), (0.1, 14.0)]:
            ref = ref_tree(torch.tensor(lo), torch.tensor(hi)).numpy()
            np.testing.assert_allclose(ours(lo, hi), ref, atol=1e-6)


def test_sde_noise_torch_mode_deterministic_and_normalized():
    sig = np.append(np.geomspace(14.6, 0.03, 11), 0.0).astype(np.float32)
    n1a, n2a = noise.sde_noise_for_steps((1, 4, 8, 8), sig, 0.5, 1.0, 7, "torch")
    n1b, n2b = noise.sde_noise_for_steps((1, 4, 8, 8), sig, 0.5, 1.0, 7, "torch")
    np.testing.assert_array_equal(n1a, n1b)
    np.testing.assert_array_equal(n2a, n2b)
    # last step targets sigma=0: zero noise rows
    assert n1a[-1].sum() == 0 and n2a[-1].sum() == 0
    # normalized queries are unit-ish gaussians
    assert 0.7 < n2a[:-1].std() < 1.3
    # different seed -> different stream
    n1c, _ = noise.sde_noise_for_steps((1, 4, 8, 8), sig, 0.5, 1.0, 8, "torch")
    assert not np.allclose(n1a[:-1], n1c[:-1])
