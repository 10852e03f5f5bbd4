"""LoRA merge math vs torch oracle; tiling, HDR, image-save, state-dict."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from lightdiffusion_next_tpu.models import lora
from lightdiffusion_next_tpu.utils import hdr, image as image_utils, state_dict, tiling


def test_lora_linear_merge_matches_torch(rng):
    w = rng.standard_normal((16, 8)).astype(np.float32)
    up = rng.standard_normal((16, 4)).astype(np.float32)
    down = rng.standard_normal((4, 8)).astype(np.float32)
    alpha = 2.0
    params = {"foo.weight": jnp.asarray(w)}
    patches = {"foo.weight": (up, down, alpha)}
    out = lora.apply_lora(params, patches, strength=0.7)
    oracle = torch.tensor(w) + 0.7 * (alpha / 4) * torch.mm(
        torch.tensor(up), torch.tensor(down)
    )
    np.testing.assert_allclose(np.asarray(out["foo.weight"]), oracle.numpy(), atol=1e-5)


def test_lora_on_quantized_weight_stays_quantized(rng):
    """LoRA onto a Q8_0 weight must NOT densify (ADVICE r1): the result is a
    QTensorLoRA whose compute-time matmul equals the dense merged oracle,
    and whose base stays int8."""
    from lightdiffusion_next_tpu.ops import ggml

    w = rng.standard_normal((64, 128)).astype(np.float32)
    q, s = ggml.quantize_q8_0(w)
    qt = ggml.transpose_for_matmul(ggml.QTensor8(q, s, w.shape))
    deq = np.asarray(qt.dequantize(jnp.float32))
    up = rng.standard_normal((64, 4)).astype(np.float32)
    down = rng.standard_normal((4, 128)).astype(np.float32)
    alpha = 2.0
    params = {"foo.weight": qt}
    patches = {"foo.weight": (up, down, alpha)}
    out = lora.apply_lora(params, patches, strength=0.7)
    patched = out["foo.weight"]
    assert isinstance(patched, ggml.QTensorLoRA)
    assert patched.base.qt.dtype == jnp.int8

    x = rng.standard_normal((3, 128)).astype(np.float32)
    got = np.asarray(patched.fused_matmul(jnp.asarray(x), jnp.float32))
    oracle = x @ (deq + 0.7 * (alpha / 4) * (up @ down)).T
    np.testing.assert_allclose(got, oracle, rtol=2e-4, atol=2e-3)

    # stacking a second LoRA chains onto the same quantized base
    up2 = rng.standard_normal((64, 2)).astype(np.float32)
    down2 = rng.standard_normal((2, 128)).astype(np.float32)
    out2 = lora.apply_lora(out, {"foo.weight": (up2, down2, None)}, strength=0.5)
    stacked = out2["foo.weight"]
    assert isinstance(stacked, ggml.QTensorLoRA)
    assert stacked.up.shape == (64, 6)
    got2 = np.asarray(stacked.fused_matmul(jnp.asarray(x), jnp.float32))
    oracle2 = oracle + x @ (0.5 * (up2 @ down2)).T
    np.testing.assert_allclose(got2, oracle2, rtol=2e-4, atol=2e-3)


def test_lora_conv_merge_matches_torch(rng):
    w_oihw = rng.standard_normal((8, 4, 3, 3)).astype(np.float32)
    w_hwio = np.transpose(w_oihw, (2, 3, 1, 0))
    up = rng.standard_normal((8, 2, 1, 1)).astype(np.float32)
    down = rng.standard_normal((2, 4, 3, 3)).astype(np.float32)
    params = {"conv.weight": jnp.asarray(w_hwio)}
    patches = {"conv.weight": (up, down, None)}
    out = lora.apply_lora(params, patches, strength=1.0)
    delta = torch.mm(
        torch.tensor(up).flatten(start_dim=1), torch.tensor(down).flatten(start_dim=1)
    ).reshape(8, 4, 3, 3)
    oracle = torch.tensor(w_oihw) + delta
    np.testing.assert_allclose(
        np.asarray(out["conv.weight"]),
        oracle.permute(2, 3, 1, 0).numpy(),
        atol=1e-5,
    )


def test_lora_key_maps():
    unet_params = {"input_blocks.1.1.transformer_blocks.0.attn1.to_q.weight": 0}
    km = lora.unet_key_map(unet_params)
    assert (
        km["lora_unet_input_blocks_1_1_transformer_blocks_0_attn1_to_q"]
        == "input_blocks.1.1.transformer_blocks.0.attn1.to_q.weight"
    )
    clip_params = {"text_model.encoder.layers.3.self_attn.q_proj.weight": 0}
    km = lora.clip_key_map(clip_params)
    assert (
        km["lora_te_text_model_encoder_layers_3_self_attn_q_proj"]
        == "text_model.encoder.layers.3.self_attn.q_proj.weight"
    )


def test_load_lora_roundtrip(rng):
    up = rng.standard_normal((8, 2)).astype(np.float32)
    down = rng.standard_normal((2, 8)).astype(np.float32)
    lora_sd = {
        "lora_unet_out_2.lora_up.weight": up,
        "lora_unet_out_2.lora_down.weight": down,
        "lora_unet_out_2.alpha": np.asarray(2.0),
        "lora_unet_unused.lora_up.weight": up,
    }
    km = {"lora_unet_out_2": "out.2.weight"}
    patches, leftover = lora.load_lora(lora_sd, km)
    assert "out.2.weight" in patches
    assert patches["out.2.weight"][2] == 2.0
    assert "lora_unet_unused.lora_up.weight" in leftover


def test_tiled_apply_identity(rng):
    x = rng.standard_normal((1, 20, 20, 3)).astype(np.float32)
    out = tiling.tiled_apply_2d(lambda t: t, x, tile=8, overlap=2, upscale=1,
                                out_channels=3)
    np.testing.assert_allclose(out, x, atol=1e-5)


def test_tiled_apply_upscale(rng):
    x = rng.standard_normal((1, 12, 12, 3)).astype(np.float32)

    def up2(t):
        return np.repeat(np.repeat(t, 2, axis=1), 2, axis=2)

    out = tiling.tiled_apply_2d(up2, x, tile=8, overlap=2, upscale=2,
                                out_channels=3)
    oracle = up2(x)
    np.testing.assert_allclose(out, oracle, atol=1e-5)


def test_hdr_runs_and_preserves_range(rng):
    img = rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32)
    out = hdr.apply_hdr_batch(img)
    assert out.shape == img.shape
    assert out.min() >= 0.0 and out.max() <= 1.0
    # not a no-op
    assert not np.allclose(out, img)


def test_hdr_lab_roundtrip(rng):
    rgb = rng.uniform(0, 1, (8, 8, 3))
    back = hdr._lab_to_srgb(hdr._srgb_to_lab(rgb))
    np.testing.assert_allclose(back, rgb, atol=1e-4)


def test_save_image_counters(tmp_path, rng):
    saver = image_utils.SaveImage(output_dir=str(tmp_path))
    img = rng.uniform(0, 1, (1, 8, 8, 3)).astype(np.float32)
    p1 = saver.save_images(img, "Classic/LD")
    p2 = saver.save_images(img, "Classic/LD")
    assert p1[0].endswith("LD_00001_.png")
    assert p2[0].endswith("LD_00002_.png")


@pytest.mark.slow
def test_state_dict_split_and_detect(rng):
    from lightdiffusion_next_tpu.models import unet as unet_mod

    params = unet_mod.init_params(unet_mod.SD15_CONFIG, seed=0)
    sd = {"model.diffusion_model." + k: np.asarray(v) for k, v in params.items()}
    sd["first_stage_model.decoder.conv_in.weight"] = np.zeros((3, 3, 4, 512))
    sd["cond_stage_model.transformer.text_model.final_layer_norm.weight"] = np.ones(
        (768,)
    )
    unet_sd, clip_sd, vae_sd = state_dict.split_checkpoint(sd)
    assert len(unet_sd) == 686
    assert "decoder.conv_in.weight" in vae_sd
    assert "text_model.final_layer_norm.weight" in clip_sd

    cfg = state_dict.detect_unet_config(unet_sd)
    assert cfg.model_channels == 320
    assert cfg.channel_mult == (1, 2, 4, 4)
    assert cfg.num_res_blocks == (2, 2, 2, 2)
    assert cfg.transformer_depth == (1, 1, 1, 0)
    assert cfg.context_dim == 768
    assert cfg.transformer_depth_middle == 1
    assert not cfg.use_linear_in_transformer


def test_bf16_safetensors_roundtrip(tmp_path):
    import safetensors.numpy

    x = np.asarray([1.5, -2.25, 0.0], dtype=np.float32)
    import torch as th

    import safetensors.torch

    safetensors.torch.save_file(
        {"w": th.tensor(x).bfloat16()}, str(tmp_path / "t.safetensors")
    )
    sd = state_dict.load_torch_file(str(tmp_path / "t.safetensors"))
    np.testing.assert_allclose(sd["w"], x, atol=1e-2)
