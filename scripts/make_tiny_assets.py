"""Build a tiny synthetic SD checkpoint so the full CLI/pipeline can be
driven end-to-end without downloading real weights (zero-egress environments
and CI smoke runs).

Usage: python scripts/make_tiny_assets.py [asset_root]
Creates <root>/checkpoints/"Meina V10 - baked VAE.safetensors" with
model.diffusion_model.* / first_stage_model.* / cond_stage_model.* tensors
in the checkpoint's native layout (OIHW convs, torch-style keys).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(root=None):
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

    ucfg = unet_mod.UNetConfig(
        model_channels=32, channel_mult=(1, 2), num_res_blocks=(1, 1),
        transformer_depth=(1, 1), context_dim=768, num_heads=4,
    )
    unet_params = unet_mod.init_params(ucfg, seed=0)
    vcfg = vae_mod.VAEConfig(ch=32, ch_mult=(1, 2, 4, 4), num_res_blocks=1)
    vae_params = vae_mod.init_params(vcfg, seed=1)
    clip_params = te.init_params(num_layers=2, width=768, heads=12, seed=2)

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
    main(sys.argv[1] if len(sys.argv) > 1 else None)
