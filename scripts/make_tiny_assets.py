"""Build a synthetic SD checkpoint so the full CLI/pipeline can be driven
end-to-end without downloading real weights (zero-egress environments and
CI smoke runs).

Usage: python scripts/make_tiny_assets.py [asset_root] [--full]
Creates <root>/checkpoints/"Meina V10 - baked VAE.safetensors" with
model.diffusion_model.* / first_stage_model.* / cond_stage_model.* tensors
in the checkpoint's native layout (OIHW convs, torch-style keys).

``--full`` emits the production SD1.5 architecture (860M UNet + full VAE +
12-layer CLIP, ~4 GB fp32) — random values, real shapes — for honest
end-to-end wall-clock benchmarking (scripts/bench_e2e_sd15.py).
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


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--full"]
    main(args[0] if args else None, full="--full" in sys.argv[1:])
