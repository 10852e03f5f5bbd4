"""CLIP facade: tokenizer + encoder bundle with clip-skip cloning.

Counterpart of src/clip/Clip.py:298-633 (CLIP, CLIPTextEncode,
CLIPSetLastLayer, load_text_encoder_state_dicts). Clones share params (jax
arrays are immutable) and differ only in options — the reference's
ModelPatcher-clone machinery reduces to dataclass copies.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from lightdiffusion_next_tpu.models.clip import text_encoder as te
from lightdiffusion_next_tpu.models.clip import tokenizer as tok
from lightdiffusion_next_tpu.sampling.cfg import CondInput


class CLIP:
    """Tokenizer + text model pair (Clip.CLIP parity)."""

    def __init__(self, tokenizer, model, layer_idx: Optional[int] = None):
        self.tokenizer = tokenizer
        self.model = model  # SD1ClipModel-like (encode_token_weights)
        self.layer_idx = layer_idx

    def clone(self) -> "CLIP":
        c = CLIP(self.tokenizer, self.model, self.layer_idx)
        return c

    def clip_layer(self, layer_idx: Optional[int]):
        """CLIPSetLastLayer semantics (Clip.py:592-633): -2 = clip-skip 2."""
        self.layer_idx = layer_idx

    def tokenize(self, text: str, return_word_ids: bool = False):
        return self.tokenizer.tokenize_with_weights(text, return_word_ids)

    def encode_from_tokens(self, tokens, return_pooled: bool = False):
        inner = getattr(self.model, "model", self.model)
        if self.layer_idx is not None:
            inner.set_clip_options({"layer": self.layer_idx})
        else:
            inner.reset_clip_options()
        out, pooled = self.model.encode_token_weights(tokens)
        if return_pooled:
            return out, pooled
        return out

    def encode(self, text: str):
        return self.encode_from_tokens(self.tokenize(text))


class CLIPTextEncode:
    """CLIPTextEncode node parity (Clip.py:574-590): text -> CondInput."""

    def encode(self, clip: CLIP, text: str) -> CondInput:
        tokens = clip.tokenize(text)
        cond, pooled = clip.encode_from_tokens(tokens, return_pooled=True)
        import jax.numpy as jnp

        return CondInput(
            cross_attn=jnp.asarray(np.asarray(cond)),
            pooled=jnp.asarray(np.asarray(pooled)) if pooled is not None else None,
        )


class CLIPSetLastLayer:
    """Clip-skip node (Clip.py:592)."""

    def set_last_layer(self, clip: CLIP, stop_at_clip_layer: int) -> CLIP:
        c = clip.clone()
        c.clip_layer(stop_at_clip_layer)
        return c


def sd1_clip_from_state_dict(
    clip_sd: Dict,
    embedding_directory: Optional[str] = None,
    dtype=None,
) -> CLIP:
    """Assemble the SD1.5 CLIP stack from a checkpoint's text-encoder dict
    (clip keys already normalized to text_model.* by utils.state_dict).
    Layer count / width are inferred from the state dict shapes."""
    import jax.numpy as jnp

    num_layers = 0
    while f"text_model.encoder.layers.{num_layers}.layer_norm1.weight" in clip_sd:
        num_layers += 1
    width = clip_sd["text_model.embeddings.token_embedding.weight"].shape[1]
    heads = max(1, width // 64)

    model = te.SDClipModel(
        clip_sd,
        layer="last",
        num_layers=num_layers or te.CLIP_L_LAYERS,
        heads=heads,
        dtype=dtype or jnp.float32,
    )
    wrapped = te.SD1ClipModel(model)
    tk = tok.SD1Tokenizer(
        embedding_directory=embedding_directory, embedding_size=width
    )
    return CLIP(tk, wrapped)
