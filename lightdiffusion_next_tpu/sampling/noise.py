"""Noise policy: seeded initial noise, ancestral per-step noise, and a
Brownian-interval sampler replacing torchsde's BrownianTree.

The reference draws ALL noise on the host CPU for reproducibility
(src/sample/ksampler_util.py:274-295 `prepare_noise` with torch.manual_seed;
src/sample/sampling_util.py:168-293 BrownianTreeNoiseSampler on cpu=True).
We keep that contract — noise is a host-side, seed-deterministic input to the
jitted sampler — but make it scan-friendly: every step's noise is precomputed
up front and fed to ``lax.scan`` as xs, so the hot loop never leaves the
device.

Two RNG modes (config.RuntimeConfig.rng_mode):
- "torch": torch CPU Philox — bitwise-identical gaussians to the reference at
  the same seed (torch is a baked-in CPU dependency, never touches the TPU).
- "jax": jax.random threefry; fully native path.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import numpy as np


def prepare_noise(
    shape: Sequence[int],
    seed: int,
    mode: str = "torch",
    dtype=np.float32,
    noise_inds: Optional[Sequence[int]] = None,
) -> np.ndarray:
    """Initial latent noise (ksampler_util.prepare_noise parity).

    In "torch" mode this reproduces ``torch.manual_seed(seed); torch.randn``
    exactly. ``noise_inds`` (batch repeat indices) follows the reference's
    unique-then-gather scheme.
    """
    if mode == "torch":
        import torch

        generator = torch.manual_seed(seed)
        if noise_inds is None:
            return (
                torch.randn(tuple(shape), generator=generator, device="cpu")
                .numpy()
                .astype(dtype)
            )
        unique_inds, inverse = np.unique(noise_inds, return_inverse=True)
        noises = []
        for i in range(unique_inds[-1] + 1):
            noise = torch.randn(
                (1,) + tuple(shape)[1:], generator=generator, device="cpu"
            )
            if i in unique_inds:
                noises.append(noise.numpy())
        noises = [noises[i] for i in inverse]
        return np.concatenate(noises, axis=0).astype(dtype)

    rng = np.random.Generator(np.random.Philox(seed))
    if noise_inds is None:
        return rng.standard_normal(tuple(shape)).astype(dtype)
    unique_inds, inverse = np.unique(noise_inds, return_inverse=True)
    noises = []
    for i in range(unique_inds[-1] + 1):
        noise = rng.standard_normal((1,) + tuple(shape)[1:])
        if i in unique_inds:
            noises.append(noise)
    noises = [noises[i] for i in inverse]
    return np.concatenate(noises, axis=0).astype(dtype)


def step_noise_batch(
    shape: Sequence[int],
    n: int,
    seed: int,
    mode: str = "torch",
    dtype=np.float32,
) -> np.ndarray:
    """(n, *shape) i.i.d. standard normals for ancestral samplers.

    The reference's `default_noise_sampler` draws torch.randn_like(x) from the
    global torch RNG state left over from prepare_noise — in "torch" mode we
    reproduce that exact stream by continuing the same generator.
    """
    if mode == "torch":
        import torch

        # Continue the stream that prepare_noise(seed) started.
        generator = torch.manual_seed(seed)
        _ = torch.randn(tuple(shape), generator=generator)  # the initial noise
        out = torch.randn((n,) + tuple(shape), generator=generator)
        return out.numpy().astype(dtype)
    rng = np.random.Generator(np.random.Philox(key=seed, counter=1))
    return rng.standard_normal((n,) + tuple(shape)).astype(dtype)


class TorchSDEBrownianTree:
    """Reimplementation of torchsde's ``BrownianTree`` value stream (the
    reference's SDE noise source, sampling_util.py:168-293 wrapping
    ``torchsde.BrownianTree(t0, w0, t1, entropy=seed)``), used for
    rng_mode="torch" so dpmpp_sde trajectories are seed-deterministic with
    the same tree machinery the reference uses. torchsde itself is not
    installable in this environment (zero egress); the algorithm below
    follows torchsde 0.2.6's halfway-tree BrownianInterval:

    - seeds: ``np.random.SeedSequence(entropy, pool_size=24)`` yields
      (initial_W_seed, initial_H_seed, top_seed); gaussians come from
      ``torch.Generator().manual_seed(node_seed)`` + ``torch.randn``
    - the global increment is ``randn(initial_W_seed) * sqrt(t1-t0)``
    - the interval bisects at midpoints; a child's increment comes from the
      Brownian bridge  W_left ~ N(W * lf, (m-lo)(hi-m)/(hi-lo)), with the
      bridge gaussian drawn from the node's SeedSequence-spawned seed and
      W_right = W - W_left, recursing until the interval width <= tol
      (BrownianTree default tol=1e-6), then snapping to the nearer endpoint
    - ``__call__(ta, tb)`` returns W(tb) - W(ta) with torchsde's sign
      conventions (BatchedBrownianTree.sort at init and call)

    Exact-match status vs torchsde is verifiable only where torchsde is
    importable — tests/test_noise.py has the bitwise comparison behind
    ``pytest.importorskip("torchsde")``; see PARITY.md. In-law correctness
    (bridge consistency, increment variance, overlap coupling) is asserted
    unconditionally.
    """

    def __init__(
        self,
        shape: Sequence[int],
        t0: float,
        t1: float,
        entropy: int,
        tol: float = 1e-6,
        dtype=np.float32,
    ):
        self.shape = tuple(shape)
        self._t0, self._t1 = float(t0), float(t1)
        self._sign_init = 1.0
        if self._t0 > self._t1:
            self._t0, self._t1 = self._t1, self._t0
            self._sign_init = -1.0
        self._tol = float(tol)
        self.dtype = dtype
        ss = np.random.SeedSequence(entropy=int(entropy), pool_size=24)
        w_seed, _h_seed, top_seed = (int(s) for s in ss.generate_state(3))
        self._top_seed = top_seed
        self._W_global = self._randn(w_seed) * np.float32(
            math.sqrt(self._t1 - self._t0)
        )
        # bridge-noise cache keyed by the dyadic node (spawn_key, depth):
        # queries share path segments, so descents reuse upper levels.
        # Bounded (insertion-order eviction): a 20-step SDE precompute makes
        # ~40 queries x ~24 levels of full-latent-shaped arrays — unbounded
        # that holds GBs of host RAM at large latents; the shared upper
        # levels stay resident under the cap, deep diverged nodes recompute.
        self._bridge_cache: dict = {}
        self._cache_max = 64

    def _randn(self, seed: int) -> np.ndarray:
        # float32, matching torchsde's _randn in the w0 dtype
        # (brownian_interval._randn via torch.Generator.manual_seed)
        import torch

        g = torch.Generator().manual_seed(int(seed))
        return (
            torch.randn(self.shape, generator=g, dtype=torch.float32)
            .numpy()
        )

    def _node_noise(self, spawn_key: int, depth: int) -> np.ndarray:
        key = (spawn_key, depth)
        cached = self._bridge_cache.get(key)
        if cached is not None:
            # refresh recency: the shared upper-level nodes are the hottest
            # entries and must outlive one-off deep nodes under the cap
            self._bridge_cache.pop(key)
            self._bridge_cache[key] = cached
            return cached
        seed = int(
            np.random.SeedSequence(
                entropy=self._top_seed, spawn_key=key
            ).generate_state(1)[0]
        )
        noise = self._randn(seed)
        if len(self._bridge_cache) >= self._cache_max:
            self._bridge_cache.pop(next(iter(self._bridge_cache)))
        self._bridge_cache[key] = noise
        return noise

    def _w_at(self, t: float) -> np.ndarray:
        """W(t) - W(t0) by dyadic bisection to within tol."""
        t = min(max(float(t), self._t0), self._t1)
        lo, hi = self._t0, self._t1
        w_lo = np.zeros(self.shape, dtype=np.float32)
        w_int = self._W_global
        spawn_key, depth = 0, 0
        while (hi - lo) > self._tol and lo < t < hi:
            mid = (lo + hi) / 2
            lf = np.float32((mid - lo) / (hi - lo))
            std = np.float32(math.sqrt((mid - lo) * (hi - mid) / (hi - lo)))
            w_left = w_int * lf + std * self._node_noise(2 * spawn_key, depth + 1)
            if t <= mid:
                hi, w_int = mid, w_left
                spawn_key, depth = 2 * spawn_key, depth + 1
            else:
                lo = mid
                w_lo = w_lo + w_left
                w_int = w_int - w_left
                spawn_key, depth = 2 * spawn_key + 1, depth + 1
        # snap to the nearer endpoint of the tol-sized interval
        if t >= (lo + hi) / 2:
            w_lo = w_lo + w_int
        return w_lo

    def __call__(self, t_a: float, t_b: float) -> np.ndarray:
        ta, tb, sign = (
            (float(t_a), float(t_b), 1.0)
            if float(t_a) < float(t_b)
            else (float(t_b), float(t_a), -1.0)
        )
        w = (self._w_at(tb) - self._w_at(ta)) * (self._sign_init * sign)
        return w.astype(self.dtype)


class BrownianIntervalSampler:
    """Distributional replacement for BrownianTreeNoiseSampler
    (sampling_util.py:239-293) without torchsde.

    A Brownian path W over the sigma axis is realized once at construction
    over all breakpoints the sampler will query; ``__call__(s_from, s_to)``
    returns the normalized increment (W(t1)-W(t0))/sqrt(|t1-t0|). Overlapping
    queries share path segments, so the joint law matches torchsde's tree
    (values differ — the reference's Levy-area stream is torchsde-internal).
    """

    def __init__(
        self,
        shape: Sequence[int],
        levels: Sequence[float],
        seed: Optional[int] = None,
        mode: str = "torch",
        dtype=np.float32,
    ):
        self.shape = tuple(shape)
        pts = sorted({float(v) for v in levels})
        self.points = np.asarray(pts, dtype=np.float64)
        n_seg = max(len(pts) - 1, 0)
        if mode == "torch":
            import torch

            generator = torch.manual_seed(seed if seed is not None else 0)
            gauss = torch.randn(
                (n_seg,) + self.shape, generator=generator
            ).numpy()
        else:
            rng = np.random.Generator(np.random.Philox(seed or 0))
            gauss = rng.standard_normal((n_seg,) + self.shape)
        # W(points[i]) via cumulative sum of sqrt(dt)-scaled gaussians.
        seg_std = np.sqrt(np.diff(self.points)).astype(np.float64)
        incs = gauss.astype(np.float64) * seg_std.reshape(
            (n_seg,) + (1,) * len(self.shape)
        )
        self.W = np.concatenate(
            [np.zeros((1,) + self.shape), np.cumsum(incs, axis=0)], axis=0
        )
        self.dtype = dtype

    def _w_at(self, t: float) -> np.ndarray:
        idx = int(np.argmin(np.abs(self.points - t)))
        if not np.isclose(self.points[idx], t, rtol=1e-5, atol=1e-8):
            raise KeyError(f"sigma level {t} was not registered at construction")
        return self.W[idx]

    def __call__(self, sigma_from: float, sigma_to: float) -> np.ndarray:
        t0, t1 = float(sigma_from), float(sigma_to)
        lo, hi, sign = (t0, t1, 1.0) if t0 < t1 else (t1, t0, -1.0)
        dt = hi - lo
        if dt <= 0:
            return np.zeros(self.shape, dtype=self.dtype)
        w = (self._w_at(hi) - self._w_at(lo)) * sign
        return (w / np.sqrt(dt)).astype(self.dtype)


def sde_noise_for_steps(
    shape: Sequence[int],
    sigmas: np.ndarray,
    r: float,
    eta: float,
    seed: Optional[int],
    mode: str = "torch",
) -> Tuple[np.ndarray, np.ndarray]:
    """Precompute the two per-step Brownian noises used by dpmpp_sde.

    Step i queries the Brownian path over (sigma_i, sigma_mid_i) and
    (sigma_i, sigma_{i+1}) where sigma_mid = exp(lerp(log sigmas, r))
    (samplers.py:1090-1233). Returns arrays of shape (n_steps, *shape).
    """
    sigmas = np.asarray(sigmas, dtype=np.float64)
    n = len(sigmas) - 1
    t = -np.log(np.maximum(sigmas, 1e-20))
    mids = np.exp(-(t[:-1] + (t[1:] - t[:-1]) * r))
    if mode == "torch":
        # the reference's exact tree: BrownianTreeNoiseSampler(x,
        # sigmas[sigmas>0].min(), sigmas.max(), seed=seed, cpu=True)
        # (samplers.py:1091-1094), queries normalized by sqrt(|t1-t0|)
        # (sampling_util.py:273-287)
        pos = sigmas[sigmas > 0]
        tree = TorchSDEBrownianTree(
            shape, float(pos.min()), float(sigmas.max()), entropy=seed or 0
        )

        def sampler(s_from, s_to):
            return tree(s_from, s_to) / np.sqrt(abs(s_to - s_from))

    else:
        levels = list(sigmas[sigmas > 0]) + [
            m for i, m in enumerate(mids) if sigmas[i + 1] > 0
        ]
        sampler = BrownianIntervalSampler(shape, levels, seed=seed, mode=mode)
    noise1 = np.zeros((n,) + tuple(shape), dtype=np.float32)
    noise2 = np.zeros((n,) + tuple(shape), dtype=np.float32)
    for i in range(n):
        if sigmas[i + 1] == 0:
            continue
        noise1[i] = sampler(sigmas[i], mids[i])
        noise2[i] = sampler(sigmas[i], sigmas[i + 1])
    return noise1, noise2
