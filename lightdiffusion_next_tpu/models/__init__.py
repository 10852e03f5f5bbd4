"""Model architectures: SD1.5 UNet, Flux DiT, VAE/TAESD, CLIP/T5, ESRGAN."""
