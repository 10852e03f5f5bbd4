"""USDU tile-region math: padding, aspect expansion, static model shapes
(reference: UltimateSDUpscale.py process_images :126-245 + image_util
get_crop_region :206 / expand_crop :248)."""

import numpy as np
import pytest

from lightdiffusion_next_tpu.pipelines import upscaler as usdu


def oracle_expand_crop(region, width, height, target_width, target_height):
    """Direct transcription of image_util.expand_crop (:248-285) as a
    differential oracle."""
    x1, y1, x2, y2 = region
    width_diff = target_width - (x2 - x1)
    x2 = min(x2 + width_diff // 2, width)
    width_diff = target_width - (x2 - x1)
    x1 = max(x1 - width_diff, 0)
    width_diff = target_width - (x2 - x1)
    x2 = min(x2 + width_diff, width)
    height_diff = target_height - (y2 - y1)
    y2 = min(y2 + height_diff // 2, height)
    height_diff = target_height - (y2 - y1)
    y1 = max(y1 - height_diff, 0)
    height_diff = target_height - (y2 - y1)
    y2 = min(y2 + height_diff, height)
    return (x1, y1, x2, y2)


def test_expand_region_matches_reference_oracle():
    rng = np.random.default_rng(0)
    for _ in range(200):
        W, H = int(rng.integers(64, 2048)), int(rng.integers(64, 2048))
        x1 = int(rng.integers(0, W - 8))
        y1 = int(rng.integers(0, H - 8))
        x2 = int(rng.integers(x1 + 1, W))
        y2 = int(rng.integers(y1 + 1, H))
        tw = int(rng.integers(x2 - x1, min(W, (x2 - x1) + 256) + 1))
        th = int(rng.integers(y2 - y1, min(H, (y2 - y1) + 256) + 1))
        got = usdu.expand_region((x1, y1, x2, y2), W, H, tw, th)
        want = oracle_expand_crop((x1, y1, x2, y2), W, H, tw, th)
        assert got == want, ((x1, y1, x2, y2), W, H, tw, th)


def test_interior_tile_region_has_pad_overlap():
    """A 512-grid interior tile in a 2048 image with padding 32 yields the
    576x576 crop (tile + 2*pad, exactly like the reference, which then
    resizes it to the 544 model shape) — context overlaps all 4 neighbors."""
    region = usdu.region_for_rect(
        (512, 512, 1024, 1024), 2048, 2048, pad=32, model_w=544, model_h=544
    )
    x1, y1, x2, y2 = region
    assert (x2 - x1, y2 - y1) == (576, 576)
    # padded symmetrically around the tile
    assert x1 == 512 - 32 and y1 == 512 - 32
    # context overlaps the neighboring tiles on every side
    assert x1 < 512 and x2 > 1024 and y1 < 512 and y2 > 1024


def test_corner_tile_region_shifts_inside_image():
    region = usdu.region_for_rect(
        (0, 0, 512, 512), 2048, 2048, pad=32, model_w=544, model_h=544
    )
    x1, y1, x2, y2 = region
    assert (x1, y1) == (0, 0)
    assert (x2 - x1, y2 - y1) == (544, 544)  # still the static shape


def test_small_image_region_clamps():
    region = usdu.region_for_rect(
        (0, 0, 64, 64), 96, 96, pad=32, model_w=544, model_h=544
    )
    x1, y1, x2, y2 = region
    assert (x1, y1, x2, y2) == (0, 0, 96, 96)


def test_redraw_crop_regions_are_model_sized_or_larger():
    """Every redraw tile (interior, edge, corner) of a 1280x1024 image on a
    512 grid resolves to a crop at least the 544 model shape — so after the
    resize-to-model step the denoiser runs at ONE static shape."""
    W, H, t, pad = 1280, 1024, 512, 32
    shapes = set()
    for yi in range(-(-H // t)):
        for xi in range(-(-W // t)):
            rect = (
                xi * t, yi * t, min((xi + 1) * t, W), min((yi + 1) * t, H)
            )
            x1, y1, x2, y2 = usdu.region_for_rect(
                rect, W, H, pad, model_w=544, model_h=544
            )
            shapes.add((x2 - x1, y2 - y1))
    assert all(w >= 544 and h >= 544 for w, h in shapes), shapes
    # interior tiles carry the full double-pad overlap
    assert (576, 576) in shapes


def test_feather_box_blur_properties():
    m = np.zeros((32, 32), dtype=np.float32)
    m[8:24, 8:24] = 1.0
    out = usdu._feather(m, 4)
    assert out.shape == m.shape
    assert out.max() <= 1.0 and out.min() >= 0.0
    assert out[16, 16] == pytest.approx(1.0)  # interior stays solid
    assert 0.0 < out[8, 8] < 1.0  # edges soften
    assert out[0, 0] == 0.0  # far field untouched (blur radius 4 < 8)


def test_padding_overlap_blends_neighbor_context(rng):
    """Integration: with a denoiser that paints the crop a constant color,
    the padded redraw must write that color ONLY inside the feathered tile
    rect, proving the pad region is context, not output."""

    class ConstVAE:
        downscale = 1

        def encode(self, img):
            return np.asarray(img)

        def decode(self, latent):
            return np.ones_like(np.asarray(latent)) * 0.75

    class NoopModel:
        pass

    u = usdu.UltimateSDUpscale(
        NoopModel(), ConstVAE(), None,
        usdu.USDUConfig(tile_width=16, tile_height=16, mask_blur=0, padding=8),
    )

    # stub the sampler: identity latent passthrough
    import lightdiffusion_next_tpu.pipelines.upscaler as upscaler_mod

    orig = upscaler_mod.ks.ksample
    try:
        upscaler_mod.ks.ksample = lambda *a, **k: type(
            "R", (), {"latent": k["latent_image"]}
        )()
        img = np.zeros((1, 32, 32, 3), dtype=np.float32)
        out = u.redraw(
            img, None, None, seed=0, steps=1, cfg_scale=1.0,
            sampler_name="euler", scheduler="normal", denoise=0.3,
        )
    finally:
        upscaler_mod.ks.ksample = orig
    np.testing.assert_allclose(out, 0.75, atol=1e-6)
    # rect-only compositing: a HALF-painted mask would leave zeros
    assert out.min() > 0.7


def test_redraw_stops_between_tiles_on_interrupt(rng):
    """A callback whose should_stop() fires makes redraw return without
    processing remaining tiles (interrupt propagation across the grid)."""

    class ConstVAE:
        downscale = 1

        def encode(self, img):
            return np.asarray(img)

        def decode(self, latent):
            return np.ones_like(np.asarray(latent)) * 0.75

    u = usdu.UltimateSDUpscale(
        object(), ConstVAE(), None,
        usdu.USDUConfig(tile_width=16, tile_height=16, mask_blur=0, padding=8),
    )
    import lightdiffusion_next_tpu.pipelines.upscaler as upscaler_mod

    calls = []
    stop = {"flag": False}

    def cb(info):
        pass

    cb.should_stop = lambda: stop["flag"]

    orig = upscaler_mod.ks.ksample
    try:
        def fake_ksample(*a, **k):
            calls.append(1)
            stop["flag"] = True  # request stop after the first tile
            return type("R", (), {"latent": k["latent_image"]})()

        upscaler_mod.ks.ksample = fake_ksample
        img = np.zeros((1, 32, 32, 3), dtype=np.float32)  # 2x2 tile grid
        out = u.redraw(
            img, None, None, seed=0, steps=1, cfg_scale=1.0,
            sampler_name="euler", scheduler="normal", denoise=0.3,
            callback=cb,
        )
    finally:
        upscaler_mod.ks.ksample = orig
    assert len(calls) == 1  # remaining 3 tiles skipped
    assert out.shape == img.shape


def test_interior_tiles_hit_no_resize_branch():
    """_model_tile is sized to the 2-sided padded crop (tile + 2*pad, /8),
    so interior crops equal the model shape exactly and edge crops are
    grown to it — no per-tile resize round-trip (round-2 verdict #9)."""
    u = usdu.UltimateSDUpscale(
        None, None, None,
        usdu.USDUConfig(tile_width=512, tile_height=512, padding=32),
    )
    image = np.zeros((1, 2048, 2048, 3), np.float32)
    mh, mw = u._model_tile(image, 32)
    assert (mh, mw) == (576, 576)  # 512 + 2*32
    # interior tile: crop == model exactly
    x1, y1, x2, y2 = usdu.region_for_rect(
        (512, 512, 1024, 1024), 2048, 2048, 32, mw, mh
    )
    assert (x2 - x1, y2 - y1) == (mw, mh)
    # corner tile: expand_region grows it to exactly the model shape
    x1, y1, x2, y2 = usdu.region_for_rect((0, 0, 512, 512), 2048, 2048, 32, mw, mh)
    assert (x2 - x1, y2 - y1) == (mw, mh)


def test_redraw_never_resizes_on_large_images(monkeypatch):
    """Behavioral: a full redraw + seam pass over an image larger than the
    model tile performs ZERO crop resizes."""
    import jax.numpy as jnp

    from lightdiffusion_next_tpu.sampling import ksampler as ks_mod

    calls = []
    orig = usdu.UltimateSDUpscale._resize

    def counting_resize(img, h, w):
        calls.append((img.shape, h, w))
        return orig(img, h, w)

    monkeypatch.setattr(
        usdu.UltimateSDUpscale, "_resize", staticmethod(counting_resize)
    )

    class _VAE:
        def encode(self, x):
            return jnp.zeros((x.shape[0], x.shape[1] // 8, x.shape[2] // 8, 4))

        def decode(self, z):
            return jnp.zeros((z.shape[0], z.shape[1] * 8, z.shape[2] * 8, 3))

    def fake_ksample(model, **kw):
        return ks_mod.KSampleResult(
            latent=kw["latent_image"], raw=kw["latent_image"]
        )

    monkeypatch.setattr(usdu.ks, "ksample", fake_ksample)
    u = usdu.UltimateSDUpscale(
        None, _VAE(), None,
        usdu.USDUConfig(
            upscale_by=1.0, tile_width=64, tile_height=64, padding=16,
            seam_fix_padding=16, mask_blur=4,
        ),
    )
    image = np.zeros((1, 256, 256, 3), np.float32)
    out = u.upscale(image, None, None, steps=1)
    assert out.shape == image.shape
    assert calls == [], f"unexpected resizes: {calls}"
