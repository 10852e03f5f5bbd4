"""Native C++ loader kernels vs numpy references."""

import numpy as np
import pytest

from lightdiffusion_next_tpu.utils import native


@pytest.fixture(scope="module")
def lib():
    lib = native.load_library()
    if lib is None:
        pytest.skip("g++ unavailable; numpy fallback covered elsewhere")
    return lib


def test_bf16_roundtrip(lib, rng):
    import torch

    x = rng.standard_normal(1000).astype(np.float32)
    raw = torch.tensor(x).bfloat16().view(torch.uint16).numpy()
    out = native.bf16_to_f32(raw)
    oracle = torch.tensor(x).bfloat16().float().numpy()
    np.testing.assert_array_equal(out, oracle)


def test_f16_conversion(lib, rng):
    x = rng.standard_normal(1000).astype(np.float16)
    out = native.f16_to_f32(x.view(np.uint16))
    np.testing.assert_array_equal(out, x.astype(np.float32))
    # specials
    specials = np.asarray([0.0, -0.0, np.inf, -np.inf, 6e-8, -6e-8], np.float16)
    out = native.f16_to_f32(specials.view(np.uint16))
    np.testing.assert_array_equal(out, specials.astype(np.float32))


def test_q8_split_and_dequant(lib, rng):
    from lightdiffusion_next_tpu.ops import ggml

    w = rng.standard_normal((8, 64)).astype(np.float32)
    q, scales = ggml.quantize_q8_0(w)
    # build raw 34-byte blocks
    raw = np.concatenate(
        [
            scales.reshape(-1, 1).astype("<f2").view(np.uint8).reshape(-1, 2),
            q.reshape(-1, 32).view(np.uint8),
        ],
        axis=1,
    )
    q2, s2 = native.split_q8_0(raw)
    np.testing.assert_array_equal(q2, q.reshape(-1, 32))
    np.testing.assert_allclose(s2, scales.reshape(-1), atol=1e-3)
    deq = native.dequant_q8_0(raw)
    oracle = (q.astype(np.float32) * scales[..., None]).reshape(-1)
    np.testing.assert_allclose(deq, oracle, rtol=1e-3, atol=1e-4)


def test_box_blur(lib):
    m = np.zeros((16, 16), dtype=np.float32)
    m[8, 8] = 1.0
    out = native.box_blur_2d(m, 2)
    assert out.sum() == pytest.approx(1.0, rel=1e-4)
    assert out[8, 8] < 1.0
    assert out[8, 6] > 0


def test_transpose2d_matches_numpy():
    from lightdiffusion_next_tpu.utils import native

    rng = np.random.default_rng(0)
    for dtype, shape in [
        (np.int8, (513, 1027)),
        (np.float32, (130, 96)),
        (np.float16, (7, 3)),
        (np.int64, (64, 640)),
    ]:
        a = rng.integers(-100, 100, shape).astype(dtype)
        np.testing.assert_array_equal(native.transpose2d(a), a.T)
        assert native.transpose2d(a).flags["C_CONTIGUOUS"]
    # large-ish threaded path (cols >= 512 triggers the thread split)
    big = rng.integers(-128, 127, (2048, 1536)).astype(np.int8)
    np.testing.assert_array_equal(native.transpose2d(big, n_threads=8), big.T)


def test_transpose2d_fallback_matches(monkeypatch):
    from lightdiffusion_next_tpu.utils import native

    a = np.arange(12, dtype=np.float32).reshape(3, 4)
    monkeypatch.setattr(native, "load_library", lambda: None)
    np.testing.assert_array_equal(native.transpose2d(a), a.T)
