"""Checkpoint IO: safetensors/torch loading, prefix surgery, layout
transforms, and architecture detection from state-dict shapes.

Counterpart of src/Utilities/util.py:40-157 (load_torch_file,
state_dict_prefix_replace), src/NeuralNetwork/unet.py:773-1126
(detect_unet_config / model_config_from_unet) and the split logic in
src/FileManaging/Loader.py:11-113.

TPU specifics: tensors load as numpy (host), conv kernels are transposed
OIHW -> HWIO once here, and the dtype cast to the policy dtype happens on
device_put — there is no runtime cast layer (src/cond/cast.py is deleted by
design).
"""

from __future__ import annotations

import dataclasses
import logging
import os
from typing import Dict, Optional, Tuple

import numpy as np


def enable_compilation_cache() -> None:
    """Persistent XLA compilation cache: first compile of the big nets is
    expensive (remote-compile tunnels especially); cache survives processes."""
    import jax

    try:
        cache_dir = os.environ.get(
            "LDT_XLA_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "ldt", "xla"),
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        # never fatal, but never silent: a missing import here once made
        # this a no-op and every process paid full multi-minute recompiles
        logging.getLogger(__name__).warning(
            "persistent XLA compilation cache NOT enabled", exc_info=True
        )


def device_put_params(params: Dict[str, np.ndarray], dtype) -> Dict:
    """Upload a whole param dict as ONE packed transfer per dtype group.

    Per-leaf jnp.asarray issues one host->device RPC per tensor — ~200 s for
    SD1.5's 686 tensors over the axon relay. Packing into a single flat
    buffer (cast host-side, bf16 included via ml_dtypes) and slicing on
    device turns that into one transfer + one trivial compiled reshape
    program.
    """
    import jax
    import jax.numpy as jnp
    import ml_dtypes

    np_dtype = np.dtype(
        ml_dtypes.bfloat16 if jnp.dtype(dtype) == jnp.bfloat16 else jnp.dtype(dtype)
    )
    keys = sorted(params.keys())
    flats = []
    metas = []
    offset = 0
    for k in keys:
        v = np.asarray(params[k])
        flat = np.ascontiguousarray(v, dtype=np_dtype).ravel()
        flats.append(flat)
        metas.append((k, offset, v.shape))
        offset += flat.size
    if not flats:
        return {}
    packed = jax.device_put(np.concatenate(flats))

    @jax.jit
    def unpack(buf):
        return {
            k: jax.lax.dynamic_slice_in_dim(
                buf, off, int(np.prod(shape, dtype=np.int64))
            ).reshape(shape)
            for k, off, shape in metas
        }

    out = unpack(packed)
    # free the packed buffer reference; XLA keeps the slices
    return dict(out)


def load_torch_file(path: str) -> Dict[str, np.ndarray]:
    """Load .safetensors / .ckpt / .pt into a flat numpy dict."""
    if path.lower().endswith(".safetensors") or path.lower().endswith(".sft"):
        import safetensors

        out = {}
        with safetensors.safe_open(path, framework="np") as f:
            for k in f.keys():
                t = f.get_tensor(k)
                if t.dtype == np.dtype("V2"):  # bfloat16 raw view
                    t = _bf16_to_f32(t)
                out[k] = t
        return out
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.float().numpy() for k, v in sd.items() if hasattr(v, "numpy")}


def _bf16_to_f32(raw: np.ndarray) -> np.ndarray:
    from lightdiffusion_next_tpu.utils import native

    return native.bf16_to_f32(raw).reshape(raw.shape)


def state_dict_prefix_replace(
    sd: Dict, replace_prefix: Dict[str, str], filter_keys: bool = False
) -> Dict:
    """util.state_dict_prefix_replace parity (util.py:92)."""
    out = {} if filter_keys else dict(sd)
    for rp, new in replace_prefix.items():
        keys = [k for k in sd if k.startswith(rp)]
        for k in keys:
            # pop BEFORE assigning (reference order, util.py:92-105):
            # with an identity/overlapping prefix map, assign-then-pop
            # deletes the renamed key outright
            if not filter_keys:
                out.pop(k, None)
            out[new + k[len(rp) :]] = sd[k]
    return out


def convs_to_hwio(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Transpose every 4-D tensor OIHW -> HWIO (one-time load transform)."""
    return {
        k: (np.transpose(v, (2, 3, 1, 0)) if getattr(v, "ndim", 0) == 4 else v)
        for k, v in sd.items()
    }


def split_checkpoint(
    sd: Dict[str, np.ndarray],
) -> Tuple[Dict, Dict, Dict]:
    """One-file SD checkpoint -> (unet_sd, clip_sd, vae_sd), prefixes
    stripped (Loader.load_checkpoint_guess_config parity)."""
    unet = {}
    clip = {}
    vae = {}
    for k, v in sd.items():
        if k.startswith("model.diffusion_model."):
            unet[k[len("model.diffusion_model.") :]] = v
        elif k.startswith("first_stage_model."):
            vae[k[len("first_stage_model.") :]] = v
        elif k.startswith("cond_stage_model."):
            kk = k[len("cond_stage_model.") :]
            # normalize "transformer.*" to "transformer.text_model.*"
            # (sm_SD15.process_clip_state_dict, SD15.py:33-57)
            if kk.startswith("transformer.") and not kk.startswith(
                "transformer.text_model."
            ):
                kk = "transformer.text_model." + kk[len("transformer.") :]
            if kk.startswith("transformer."):
                kk = kk[len("transformer.") :]
            clip[kk] = v
        elif k.startswith("te.") or k.startswith("conditioner."):
            clip[k] = v
    return unet, clip, vae


# ---------------------------------------------------------------------------
# Architecture detection (detect_unet_config parity, unet.py:773-1080)
# ---------------------------------------------------------------------------


def detect_model_type(unet_sd: Dict) -> str:
    if "double_blocks.0.img_attn.norm.key_norm.scale" in unet_sd:
        return "flux"
    if "input_blocks.0.0.weight" in unet_sd:
        return "unet"
    raise ValueError("unrecognized diffusion model state dict")


def detect_unet_config(unet_sd: Dict):
    """Infer UNetConfig from state-dict shapes. Mirrors the decision data of
    detect_unet_config (unet.py:773) without the torch plumbing.

    Works on HWIO or OIHW tensors (uses channel dims that are invariant)."""
    from lightdiffusion_next_tpu.models.unet import UNetConfig

    def _is_hwio(w) -> bool:
        # HWIO convs have the (small, equal) kernel dims first; OIHW last.
        return w.shape[0] == w.shape[1] and w.shape[0] <= 7

    def out_ch_of(key):
        w = unet_sd[key]
        if w.ndim != 4:
            return w.shape[0]
        return w.shape[-1] if _is_hwio(w) else w.shape[0]

    def in_ch_of(key):
        w = unet_sd[key]
        if w.ndim != 4:
            return w.shape[1]
        return w.shape[-2] if _is_hwio(w) else w.shape[1]

    model_channels = out_ch_of("input_blocks.0.0.weight")
    in_channels = in_ch_of("input_blocks.0.0.weight")
    out_channels = out_ch_of("out.2.weight")

    context_dim = None
    use_linear = False
    for k in unet_sd:
        if k.endswith("attn2.to_k.weight"):
            context_dim = unet_sd[k].shape[1]
            break
    pk = "input_blocks.1.1.proj_in.weight"
    if pk in unet_sd:
        use_linear = unet_sd[pk].ndim == 2

    # walk numbered input blocks
    channel_mult = []
    num_res_blocks = []
    transformer_depth = []
    cur_res = 0
    level_blocks = 0
    level_depth = 0
    level_ch = model_channels
    i = 1
    while f"input_blocks.{i}.0.in_layers.0.weight" in unet_sd or (
        f"input_blocks.{i}.0.op.weight" in unet_sd
    ):
        if f"input_blocks.{i}.0.op.weight" in unet_sd:
            channel_mult.append(level_ch // model_channels)
            num_res_blocks.append(level_blocks)
            transformer_depth.append(level_depth)
            level_blocks = 0
            level_depth = 0
            i += 1
            continue
        level_ch = out_ch_of(f"input_blocks.{i}.0.out_layers.3.weight")
        level_blocks += 1
        d = 0
        while f"input_blocks.{i}.1.transformer_blocks.{d}.attn1.to_q.weight" in unet_sd:
            d += 1
        level_depth = max(level_depth, d)
        i += 1
    channel_mult.append(level_ch // model_channels)
    num_res_blocks.append(level_blocks)
    transformer_depth.append(level_depth)

    dm = 0
    while f"middle_block.1.transformer_blocks.{dm}.attn1.to_q.weight" in unet_sd:
        dm += 1

    adm = None
    if "label_emb.0.0.weight" in unet_sd:
        adm = in_ch_of("label_emb.0.0.weight")

    return UNetConfig(
        in_channels=in_channels,
        out_channels=out_channels,
        model_channels=model_channels,
        channel_mult=tuple(channel_mult),
        num_res_blocks=tuple(num_res_blocks),
        transformer_depth=tuple(transformer_depth),
        transformer_depth_middle=dm,
        context_dim=context_dim,
        num_heads=8,
        use_linear_in_transformer=use_linear,
        adm_in_channels=adm,
    )
