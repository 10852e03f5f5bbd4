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
