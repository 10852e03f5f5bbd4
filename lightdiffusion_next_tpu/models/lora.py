"""LoRA: key mapping + pure weight-merge over param pytrees.

Counterpart of src/Model/LoRas.py (load_lora/model_lora_keys_unet/clip,
LoraLoader) and the merge math in src/Model/ModelPatcher.py:621-650
(W += strength * (alpha/rank) * up @ down).

TPU design: no clone-on-write patcher — ``apply_lora`` returns a NEW flat
param dict (SURVEY §7: "merged = apply_lora(params, lora, alpha)"). Conv
deltas are computed in the checkpoint's OIHW layout then transposed to our
HWIO storage.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

LORA_CLIP_MAP = {
    "mlp.fc1": "mlp_fc1",
    "mlp.fc2": "mlp_fc2",
    "self_attn.k_proj": "self_attn_k_proj",
    "self_attn.q_proj": "self_attn_q_proj",
    "self_attn.v_proj": "self_attn_v_proj",
    "self_attn.out_proj": "self_attn_out_proj",
}


def unet_key_map(unet_params: Dict) -> Dict[str, str]:
    """lora_unet_<name_with_underscores> -> our flat param key
    (model_lora_keys_unet parity, LoRas.py:88-130)."""
    key_map = {}
    for k in unet_params:
        if k.endswith(".weight"):
            key_lora = k[: -len(".weight")].replace(".", "_")
            key_map[f"lora_unet_{key_lora}"] = k
            key_map[f"lora_prior_unet_{key_lora}"] = k
            # TP-laid-out Flux params (parallel.layout) split the fused
            # single-block linear1/linear2; keep accepting LoRAs named for
            # the CHECKPOINT keys — the patch lands on the fused pseudo-key
            # and apply_lora(model_cfg=...) re-splits it
            for split, fused in (
                ("linear1_qkv", "linear1"),
                ("linear2_attn", "linear2"),
            ):
                if k.endswith(f".{split}.weight"):
                    fused_key = k.replace(f".{split}.weight", f".{fused}.weight")
                    fused_lora = fused_key[: -len(".weight")].replace(".", "_")
                    key_map[f"lora_unet_{fused_lora}"] = fused_key
                    key_map[f"lora_prior_unet_{fused_lora}"] = fused_key
    return key_map


def clip_key_map(clip_params: Dict) -> Dict[str, str]:
    """lora_te_* / lora_te1_* / diffusers text_encoder.* -> our flat key
    (model_lora_keys_clip parity, LoRas.py:58-86)."""
    key_map = {}
    for b in range(32):
        for c, lname in LORA_CLIP_MAP.items():
            k = f"text_model.encoder.layers.{b}.{c}.weight"
            if k in clip_params:
                key_map[f"lora_te_text_model_encoder_layers_{b}_{lname}"] = k
                key_map[f"lora_te1_text_model_encoder_layers_{b}_{lname}"] = k
                key_map[f"text_encoder.text_model.encoder.layers.{b}.{c}"] = k
    return key_map


def load_lora(
    lora_sd: Dict, key_map: Dict[str, str]
) -> Tuple[Dict[str, Tuple], List]:
    """LoRA state dict -> {our_param_key: (up, down, alpha)} (load_lora
    parity, LoRas.py:15-55). Unmatched lora keys are reported."""
    patches = {}
    loaded = set()
    for lora_key, model_key in key_map.items():
        a_name = f"{lora_key}.lora_up.weight"
        if a_name not in lora_sd:
            continue
        b_name = f"{lora_key}.lora_down.weight"
        alpha_name = f"{lora_key}.alpha"
        alpha = None
        if alpha_name in lora_sd:
            alpha = float(np.asarray(lora_sd[alpha_name]))
            loaded.add(alpha_name)
        patches[model_key] = (
            np.asarray(lora_sd[a_name], dtype=np.float32),
            np.asarray(lora_sd[b_name], dtype=np.float32),
            alpha,
        )
        loaded.update((a_name, b_name))
    leftover = [k for k in lora_sd if k not in loaded]
    return patches, leftover


def _lora_delta(up: np.ndarray, down: np.ndarray, alpha: Optional[float]):
    """strength-free delta in OIHW/out-in layout (calculate_weight math)."""
    rank = down.shape[0]
    scale = 1.0 if alpha is None else alpha / rank
    mat = up.reshape(up.shape[0], -1) @ down.reshape(down.shape[0], -1)
    target_shape = (up.shape[0],) + tuple(down.shape[1:])
    return scale * mat.reshape(target_shape)


def apply_lora(
    params: Dict,
    patches: Dict[str, Tuple],
    strength: float = 1.0,
    model_cfg=None,
) -> Dict:
    """Return a new param dict with LoRA merged at ``strength``.

    Our convs are stored HWIO; LoRA decompositions are OIHW — the delta is
    built in OIHW and transposed before adding.

    ``model_cfg``: pass the model's FluxConfig when patching a Flux param
    dict — if it carries the TP layout, patches are translated to the
    layout keyspace first (parallel.layout.to_tp_layout_patches); merging
    checkpoint-keyed patches onto a TP-laid-out dict without translation
    would skip split keys and mis-apply onto permuted qkv rows."""
    import jax.numpy as jnp

    from lightdiffusion_next_tpu.ops import ggml

    if getattr(model_cfg, "tp_layout", False):
        from lightdiffusion_next_tpu.parallel import layout as tp_layout

        patches = tp_layout.to_tp_layout_patches(patches, model_cfg)

    from lightdiffusion_next_tpu.models import flux as flux_mod

    if flux_mod.is_stacked(params):
        # scan-mode dicts have no flat double_blocks.*/single_blocks.* keys;
        # the skip-missing loop below would silently drop every block patch
        # and generate as if the LoRA were not loaded
        raise ValueError(
            "cannot apply LoRA to a scan-mode (stacked) Flux model — load "
            "with flux_scan disabled, or apply the LoRA before stacking"
        )

    out = dict(params)
    for key, (up, down, alpha) in patches.items():
        if key not in out:
            continue
        w = out[key]
        if (
            hasattr(w, "fused_matmul")  # QTensor8T / stacked QTensorLoRA
            and w.ndim == 2
            and up.ndim == 2
            and down.ndim == 2
        ):
            # GGUF Q8_0 target: keep the weight quantized and apply the
            # low-rank patch at compute time (GGUFModelPatcher semantics,
            # Quantizer.py:260-292 — patches evaluate on the dequantized
            # value per forward; merging would densify int8 -> bf16 and
            # double the layer's HBM). Stacked LoRAs chain onto the same
            # base by concatenating ranks.
            rank = down.shape[0]
            scale = strength * (1.0 if alpha is None else alpha / rank)
            new_up = jnp.asarray(up * scale, dtype=jnp.float32)
            new_down = jnp.asarray(down, dtype=jnp.float32)
            if isinstance(w, ggml.QTensorLoRA):
                out[key] = ggml.QTensorLoRA(
                    base=w.base,
                    up=jnp.concatenate([w.up, new_up], axis=1),
                    down=jnp.concatenate([w.down, new_down], axis=0),
                )
            else:
                out[key] = ggml.QTensorLoRA(base=w, up=new_up, down=new_down)
            continue
        delta = _lora_delta(up, down, alpha) * strength
        if w.ndim == 4:  # HWIO storage
            delta = np.transpose(delta, (2, 3, 1, 0))
        if hasattr(w, "dequantize"):
            # non-2D quantized target (none in practice): densify
            out[key] = (
                w.dequantize(jnp.float32) + jnp.asarray(delta)
            ).astype(jnp.bfloat16)
        else:
            out[key] = (w.astype(jnp.float32) + jnp.asarray(delta)).astype(
                w.dtype
            )
    return out


def load_and_apply_lora(
    lora_sd: Dict,
    unet_params: Dict,
    clip_params: Optional[Dict],
    strength_model: float,
    strength_clip: float,
    model_cfg=None,
):
    """LoraLoader.load_lora parity (LoRas.py:164-193): returns new
    (unet_params, clip_params). Pass ``model_cfg`` (FluxConfig) when the
    diffusion params are TP-laid-out (see apply_lora)."""
    new_unet, new_clip = unet_params, clip_params
    if strength_model != 0:
        patches, _ = load_lora(lora_sd, unet_key_map(unet_params))
        new_unet = apply_lora(unet_params, patches, strength_model, model_cfg)
    if clip_params is not None and strength_clip != 0:
        patches, _ = load_lora(lora_sd, clip_key_map(clip_params))
        new_clip = apply_lora(clip_params, patches, strength_clip)
    return new_unet, new_clip
