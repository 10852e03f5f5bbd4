"""LightDiffusion-Next TPU — a TPU-native (JAX/XLA/Pallas) diffusion framework.

A from-scratch re-design of the capabilities of Aatricks/LightDiffusion-Next
(single-GPU PyTorch inference engine) for TPU hardware:

- Compute path: JAX + XLA, bf16 on the MXU, Pallas kernels for attention and
  quantized matmuls.
- Weights are immutable pytrees; "model patching" (LoRA, clip-skip, caching
  wrappers) is function composition over pure params, not module mutation.
- Sampler loops are ``lax.scan`` programs; multi-resolution plans compile as
  static segments.
- Scaling is a ``jax.sharding.Mesh`` ("data", "model") with pjit/shard_map;
  there is no VRAM-paging runtime because XLA owns placement.

Package layout (mirrors the reference's layer map, SURVEY.md §1):
    config        — dtype/device/mesh policy (replaces src/Device/Device.py policy)
    utils         — latents, state-dict IO, tiling, images, HDR
    ops           — attention, Pallas kernels, GGUF/Q8_0, RoPE, windows
    models        — CLIP/T5 encoders, SD1.5 UNet, Flux DiT, VAE, TAESD, ESRGAN, LoRA
    sampling      — schedules, model-sampling, CFG, samplers, FBCache, multiscale
    parallel      — mesh construction and sharding rules
    pipelines     — pipeline() orchestration, loader, upscaler, detailer
    app           — CLI / web UI
"""

__version__ = "0.1.0"
