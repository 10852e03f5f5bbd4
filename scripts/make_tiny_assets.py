"""Build a synthetic SD checkpoint so the full CLI/pipeline can be driven
end-to-end without downloading real weights (zero-egress environments and
CI smoke runs).

Usage: python scripts/make_tiny_assets.py [asset_root] [--full] [--flux]
Creates <root>/checkpoints/"Meina V10 - baked VAE.safetensors" with
model.diffusion_model.* / first_stage_model.* / cond_stage_model.* tensors
in the checkpoint's native layout (OIHW convs, torch-style keys).

``--full`` emits the production SD1.5 architecture (860M UNet + full VAE +
12-layer CLIP, ~4 GB fp32) — random values, real shapes — for honest
end-to-end wall-clock benchmarking (scripts/bench_e2e_sd15.py).

``--flux`` additionally emits a tiny Flux asset set under the names the
pipeline downloads (unet/flux1-dev-Q8_0.gguf Q8-quantized,
clip/t5-v1_1-xxl-encoder-Q8_0.gguf in llama.cpp key naming,
clip/clip_l.safetensors, vae/ae.safetensors) so the ``--flux`` workflow
runs end-to-end through the REAL loaders (GGUF reader, config detection,
dual encode) on CPU.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(root=None, full=False):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from lightdiffusion_next_tpu.models import unet as unet_mod
    from lightdiffusion_next_tpu.models import vae as vae_mod
    from lightdiffusion_next_tpu.models.clip import text_encoder as te

    root = root or os.environ.get("LDT_ASSET_ROOT", "./tiny_assets")
    ckpt_dir = os.path.join(root, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    os.makedirs(os.path.join(root, "embeddings"), exist_ok=True)

    if full:
        ucfg = unet_mod.SD15_CONFIG
        vcfg = vae_mod.VAEConfig()
        clip_layers, clip_heads = 12, 12
    else:
        ucfg = unet_mod.UNetConfig(
            model_channels=32, channel_mult=(1, 2), num_res_blocks=(1, 1),
            transformer_depth=(1, 1), context_dim=768, num_heads=4,
        )
        vcfg = vae_mod.VAEConfig(ch=32, ch_mult=(1, 2, 4, 4), num_res_blocks=1)
        clip_layers, clip_heads = 2, 12
    unet_params = unet_mod.init_params(ucfg, seed=0)
    vae_params = vae_mod.init_params(vcfg, seed=1)
    clip_params = te.init_params(
        num_layers=clip_layers, width=768, heads=clip_heads, seed=2
    )

    sd = {}
    for k, v in unet_params.items():
        arr = np.asarray(v, dtype=np.float32)
        if arr.ndim == 4:  # HWIO -> OIHW (checkpoint layout)
            arr = np.transpose(arr, (3, 2, 0, 1))
        sd["model.diffusion_model." + k] = arr
    for k, v in vae_params.items():
        arr = np.asarray(v, dtype=np.float32)
        if arr.ndim == 4:
            arr = np.transpose(arr, (3, 2, 0, 1))
        sd["first_stage_model." + k] = arr
    for k, v in clip_params.items():
        sd["cond_stage_model.transformer." + k] = np.asarray(v, dtype=np.float32)

    import safetensors.numpy

    path = os.path.join(ckpt_dir, "Meina V10 - baked VAE.safetensors")
    safetensors.numpy.save_file(sd, path)
    print(path)
    return path


# our HF-style T5 keys -> llama.cpp GGUF names (inverse of ggml.T5_KEY_MAP)
_T5_INV = [
    ("encoder.", "enc."),
    (".block.", ".blk."),
    ("shared", "token_embd"),
    ("final_layer_norm", "output_norm"),
    ("layer.0.SelfAttention.relative_attention_bias", "attn_rel_b"),
    ("layer.0.SelfAttention.q", "attn_q"),
    ("layer.0.SelfAttention.k", "attn_k"),
    ("layer.0.SelfAttention.v", "attn_v"),
    ("layer.0.SelfAttention.o", "attn_o"),
    ("layer.0.layer_norm", "attn_norm"),
    ("layer.1.DenseReluDense.wi_1", "ffn_up"),
    ("layer.1.DenseReluDense.wo", "ffn_down"),
    ("layer.1.DenseReluDense.wi_0", "ffn_gate"),
    ("layer.1.layer_norm", "ffn_norm"),
]


def make_flux_assets(root):
    """Tiny Flux asset set under the production file names (module
    docstring). Dims are chosen so config DETECTION reproduces them:
    head_dim 32 -> axes (4,14,14) per models.flux.detect_config's scaled
    split; T5 d_model == flux context_in_dim; CLIP-L width stays 768 (the
    pooled vector feeds vec_in_dim)."""
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from lightdiffusion_next_tpu.models import flux as flux_mod
    from lightdiffusion_next_tpu.models import vae as vae_mod
    from lightdiffusion_next_tpu.models.clip import t5 as t5_mod
    from lightdiffusion_next_tpu.models.clip import text_encoder as te
    from lightdiffusion_next_tpu.ops import ggml

    for sub in ("unet", "clip", "vae", "vae_approx"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)

    t5_cfg = t5_mod.T5Config(
        d_model=64, d_ff=128, num_heads=2, num_layers=2, vocab_size=32128
    )
    fcfg = flux_mod.FluxConfig(
        in_channels=16,
        hidden_size=256,
        num_heads=8,
        depth=1,
        depth_single_blocks=1,
        axes_dim=(4, 14, 14),
        context_in_dim=t5_cfg.d_model,
        vec_in_dim=768,
    )

    # flux DiT GGUF (Q8_0 on the matmul weights, like the real checkpoint)
    fparams = flux_mod.init_params(fcfg, seed=10)
    unet_path = os.path.join(root, "unet", "flux1-dev-Q8_0.gguf")
    ggml.write_gguf(
        unet_path, fparams, arch="flux",
        quantize=("qkv.weight", "linear1.weight", "linear2.weight",
                  "mlp.0.weight", "mlp.2.weight", "proj.weight"),
    )

    # T5 encoder GGUF in llama.cpp naming (round-trips gguf_clip_loader)
    t5_params = t5_mod.init_params(t5_cfg, seed=11)
    t5_named = {}
    for k, v in t5_params.items():
        for ours, theirs in _T5_INV:
            k = k.replace(ours, theirs)
        t5_named[k] = v
    t5_path = os.path.join(root, "clip", "t5-v1_1-xxl-encoder-Q8_0.gguf")
    ggml.write_gguf(
        t5_path, t5_named, arch="t5",
        quantize=("attn_q.weight", "attn_k.weight", "attn_v.weight",
                  "attn_o.weight", "ffn_up.weight", "ffn_down.weight",
                  "ffn_gate.weight", "token_embd.weight"),
    )

    import safetensors.numpy

    clip_params = te.init_params(num_layers=2, width=768, heads=12, seed=12)
    safetensors.numpy.save_file(
        {k: np.asarray(v, np.float32) for k, v in clip_params.items()},
        os.path.join(root, "clip", "clip_l.safetensors"),
    )

    vcfg = vae_mod.VAEConfig(
        ch=16, ch_mult=(1, 1, 2, 2), num_res_blocks=1, z_channels=16,
        has_quant_conv=False,
    )
    vae_params = vae_mod.init_params(vcfg, seed=13)
    vae_sd = {}
    for k, v in vae_params.items():
        arr = np.asarray(v, dtype=np.float32)
        if arr.ndim == 4:  # HWIO -> OIHW checkpoint layout
            arr = np.transpose(arr, (3, 2, 0, 1))
        vae_sd[k] = arr
    safetensors.numpy.save_file(
        vae_sd, os.path.join(root, "vae", "ae.safetensors")
    )
    print(unet_path)
    return unet_path


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    root = args[0] if args else None
    main(root, full="--full" in sys.argv[1:])
    if "--flux" in sys.argv[1:]:
        make_flux_assets(root or os.environ.get("LDT_ASSET_ROOT", "./tiny_assets"))
