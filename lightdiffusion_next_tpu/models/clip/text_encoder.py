"""CLIP-L text transformer + weighted-token encoding.

Counterpart of src/clip/Clip.py (CLIPAttention/CLIPMLP/CLIPLayer/CLIPEncoder/
CLIPEmbeddings, :14-295), src/clip/CLIPTextModel.py (causal transformer with
clip-skip intermediate tap and eos-pooled projection) and src/SD15/SDClip.py
(ClipTokenWeightEncoder weight-lerp against the empty prompt, :36-98; textual
-inversion vocab splicing, :213-260).

TPU design: one jitted function per (n_rows,) batch shape encodes all prompt
rows at once; textual-inversion embeddings are appended as extra rows to the
embedding table OUTSIDE the trace (pure array concat — the reference mutates
an nn.Embedding in place).

Param keys match HF/ldm checkpoints with prefix "text_model." plus an
optional top-level "text_projection.weight".
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lightdiffusion_next_tpu.ops import attention as attn_ops
from lightdiffusion_next_tpu.ops import nn

# CLIP-L constants (include/clip/sd1_clip_config.json)
CLIP_L_LAYERS = 12
CLIP_L_HEADS = 12
CLIP_L_WIDTH = 768
CLIP_L_VOCAB = 49408
SPECIAL_TOKENS = {"start": 49406, "end": 49407, "pad": 49407}


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _clip_layer(p: nn.ParamView, x, mask, heads: int, act):
    h = nn.layer_norm(x, p("layer_norm1.weight"), p("layer_norm1.bias"))
    q = nn.linear(h, p("self_attn.q_proj.weight"), p("self_attn.q_proj.bias"))
    k = nn.linear(h, p("self_attn.k_proj.weight"), p("self_attn.k_proj.bias"))
    v = nn.linear(h, p("self_attn.v_proj.weight"), p("self_attn.v_proj.bias"))
    a = attn_ops.attention_xla(q, k, v, heads=heads, mask=mask)
    x = x + nn.linear(
        a, p("self_attn.out_proj.weight"), p("self_attn.out_proj.bias")
    )
    h = nn.layer_norm(x, p("layer_norm2.weight"), p("layer_norm2.bias"))
    h = nn.linear(h, p("mlp.fc1.weight"), p("mlp.fc1.bias"))
    h = act(h)
    x = x + nn.linear(h, p("mlp.fc2.weight"), p("mlp.fc2.bias"))
    return x


@functools.partial(
    jax.jit,
    static_argnames=(
        "intermediate_output",
        "final_layer_norm_intermediate",
        "num_layers",
        "heads",
        "eos_token_id",
        "act",
    ),
)
def apply_clip_text(
    params: dict,
    tokens,  # (B, 77) int32
    embeds_override=None,  # (B, 77, width) — pre-looked-up embeddings (TI path)
    intermediate_output: Optional[int] = None,
    final_layer_norm_intermediate: bool = True,
    num_layers: int = CLIP_L_LAYERS,
    heads: int = CLIP_L_HEADS,
    eos_token_id: int = SPECIAL_TOKENS["end"],
    act=quick_gelu,
):
    """Returns (last_hidden, intermediate, pooled_raw).

    CLIPTextModel_.forward parity (CLIPTextModel.py:51-108): causal mask,
    optional clip-skip tap, final LN, eos-position pooling.
    """
    p = nn.ParamView(params, "text_model.")
    if embeds_override is not None:
        x = embeds_override
    else:
        x = nn.embedding_lookup(tokens, p("embeddings.token_embedding.weight"))
    pos = p("embeddings.position_embedding.weight")[: x.shape[1]]
    x = x + pos[None]

    L = x.shape[1]
    mask = jnp.triu(jnp.full((L, L), -jnp.inf, dtype=jnp.float32), k=1)

    if intermediate_output is not None and intermediate_output < 0:
        intermediate_output = num_layers + intermediate_output

    intermediate = None
    for i in range(num_layers):
        x = _clip_layer(p.scope(f"encoder.layers.{i}."), x, mask, heads, act)
        if intermediate_output is not None and i == intermediate_output:
            intermediate = x
    x = nn.layer_norm(x, p("final_layer_norm.weight"), p("final_layer_norm.bias"))
    if intermediate is not None and final_layer_norm_intermediate:
        intermediate = nn.layer_norm(
            intermediate, p("final_layer_norm.weight"), p("final_layer_norm.bias")
        )

    eos_pos = jnp.argmax((tokens == eos_token_id).astype(jnp.int32), axis=-1)
    pooled = x[jnp.arange(x.shape[0]), eos_pos]
    return x, intermediate, pooled


class SDClipModel:
    """CLIP-L encoder facade with clip-skip + weighted-token encoding
    (SDClip.SDClipModel + ClipTokenWeightEncoder parity)."""

    def __init__(
        self,
        params: dict,
        layer: str = "last",
        layer_idx: Optional[int] = None,
        num_layers: int = CLIP_L_LAYERS,
        heads: int = CLIP_L_HEADS,
        special_tokens: dict = SPECIAL_TOKENS,
        layer_norm_hidden_state: bool = True,
        return_projected_pooled: bool = True,
        dtype=jnp.float32,
    ):
        from lightdiffusion_next_tpu.utils import state_dict as sd_utils

        # host-side copy of the embedding table for textual-inversion row
        # assembly (avoids a device->host pull per encode)
        self._token_table = np.asarray(
            params["text_model.embeddings.token_embedding.weight"],
            dtype=np.float32,
        )
        # layer count from the state dict (scaled-down checkpoints / test
        # assets); an explicit non-default num_layers still wins
        if num_layers == CLIP_L_LAYERS:
            n = 0
            while (
                f"text_model.encoder.layers.{n}.self_attn.q_proj.weight"
                in params
            ):
                n += 1
            if n:
                num_layers = n
        self.params = sd_utils.device_put_params(params, dtype)
        self.layer = layer
        self.layer_idx = layer_idx
        self.num_layers = num_layers
        self.heads = heads
        self.special_tokens = special_tokens
        self.layer_norm_hidden_state = layer_norm_hidden_state
        self.return_projected_pooled = return_projected_pooled
        self.dtype = dtype
        self.options_default = (layer, layer_idx, return_projected_pooled)

    # --- clip options (CLIPSetLastLayer / clip-skip, SDClip.py:191-211) ---
    def clone(self) -> "SDClipModel":
        c = SDClipModel.__new__(SDClipModel)
        c.__dict__.update(self.__dict__)
        return c

    def set_clip_options(self, options: dict):
        layer_idx = options.get("layer", self.layer_idx)
        self.return_projected_pooled = options.get(
            "projected_pooled", self.return_projected_pooled
        )
        if layer_idx is None or abs(layer_idx) > self.num_layers:
            self.layer = "last"
            self.layer_idx = None
        else:
            self.layer = "hidden"
            self.layer_idx = layer_idx

    def reset_clip_options(self):
        self.layer, self.layer_idx, self.return_projected_pooled = (
            self.options_default
        )

    # --- encoding ---
    def _embed_rows(self, token_rows: List[List]) -> Tuple[np.ndarray, np.ndarray]:
        """Resolve int tokens + TI numpy vectors into an embeddings tensor.

        Returns (embeds (B,L,W) float, tokens_int (B,L) with TI slots holding
        the pad id for eos-pooling purposes)."""
        table = self._token_table
        width = table.shape[1]
        B = len(token_rows)
        L = len(token_rows[0])
        embeds = np.zeros((B, L, width), dtype=np.float32)
        tok_ids = np.zeros((B, L), dtype=np.int32)
        for i, row in enumerate(token_rows):
            for j, t in enumerate(row):
                if isinstance(t, (int, np.integer)):
                    embeds[i, j] = table[int(t)]
                    tok_ids[i, j] = int(t)
                else:
                    vec = np.asarray(t, dtype=np.float32)
                    if vec.shape[0] == width:
                        embeds[i, j] = vec
                    # NOT the pad id: SD1.5's pad EQUALS the end token
                    # (49407), so a TI slot marked "pad" would win the
                    # eos-argmax and pooling would read the TI position
                    # instead of the real end token (the reference avoids
                    # this with fresh beyond-vocab ids, SDClip.py:213-268)
                    tok_ids[i, j] = -1
        return embeds, tok_ids

    def encode(self, token_rows: List[List]):
        """token_rows: list of 77-length rows of (int | TI vector)."""
        embeds, tok_ids = self._embed_rows(token_rows)
        intermediate_idx = self.layer_idx if self.layer == "hidden" else None
        x, inter, pooled = apply_clip_text(
            self.params,
            jnp.asarray(tok_ids),
            embeds_override=jnp.asarray(embeds, dtype=self.dtype),
            intermediate_output=intermediate_idx,
            final_layer_norm_intermediate=self.layer_norm_hidden_state,
            num_layers=self.num_layers,
            heads=self.heads,
            eos_token_id=self.special_tokens["end"],
        )
        z = x if self.layer == "last" else inter
        pooled_out = pooled
        if (
            self.return_projected_pooled
            and "text_projection.weight" in self.params
        ):
            pooled_out = nn.linear(pooled, self.params["text_projection.weight"])
        return jnp.asarray(z, dtype=jnp.float32), jnp.asarray(
            pooled_out, dtype=jnp.float32
        )

    def encode_token_weights(self, token_weight_pairs):
        """ClipTokenWeightEncoder.encode_token_weights parity (SDClip.py:36):
        encode all rows + an empty row, lerp weighted tokens against the
        empty-prompt baseline, concat rows on the sequence axis."""
        to_encode = []
        max_len = 0
        has_weights = False
        for row in token_weight_pairs:
            tokens = [a[0] for a in row]
            max_len = max(max_len, len(tokens))
            has_weights = has_weights or any(a[1] != 1.0 for a in row)
            to_encode.append(tokens)

        sections = len(to_encode)
        if has_weights or sections == 0:
            to_encode.append(_gen_empty_tokens(self.special_tokens, max_len))

        out, pooled = self.encode(to_encode)
        out = np.asarray(out)
        first_pooled = np.asarray(pooled[0:1]) if pooled is not None else None

        output = []
        for k in range(sections):
            z = out[k : k + 1].copy()
            if has_weights:
                z_empty = out[-1]
                for j in range(z.shape[1]):
                    weight = token_weight_pairs[k][j][1]
                    if weight != 1.0:
                        z[0, j] = (z[0, j] - z_empty[j]) * weight + z_empty[j]
            output.append(z)

        if not output:
            return out[-1:], first_pooled
        return np.concatenate(output, axis=-2), first_pooled


def _gen_empty_tokens(special_tokens: dict, length: int) -> List[int]:
    start = special_tokens.get("start")
    end = special_tokens.get("end")
    pad = special_tokens.get("pad")
    out = []
    if start is not None:
        out.append(start)
    if end is not None:
        out.append(end)
    out.extend([pad] * (length - len(out)))
    return out


class SD1ClipModel:
    """{"l": rows} keyed wrapper (SDClip.SD1ClipModel, :358-403)."""

    def __init__(self, clip_model: SDClipModel, clip_name: str = "l"):
        self.clip_name = clip_name
        self.model = clip_model

    def set_clip_options(self, options):
        self.model.set_clip_options(options)

    def reset_clip_options(self):
        self.model.reset_clip_options()

    def encode_token_weights(self, token_weight_pairs: dict):
        return self.model.encode_token_weights(token_weight_pairs[self.clip_name])


# ---------------------------------------------------------------------------
# Random init for tests
# ---------------------------------------------------------------------------


def init_params(
    num_layers: int = 2,
    width: int = 64,
    heads: int = 4,
    vocab: int = 49408,
    mlp_ratio: int = 4,
    seed: int = 0,
    with_projection: bool = False,
    max_positions: int = 77,
):
    rng = np.random.default_rng(seed)
    P = {}

    def lin(key, out_d, in_d):
        P[key + ".weight"] = rng.normal(0, in_d**-0.5, (out_d, in_d)).astype(
            np.float32
        )
        P[key + ".bias"] = np.zeros((out_d,), dtype=np.float32)

    def norm(key, c):
        P[key + ".weight"] = np.ones((c,), dtype=np.float32)
        P[key + ".bias"] = np.zeros((c,), dtype=np.float32)

    P["text_model.embeddings.token_embedding.weight"] = rng.normal(
        0, 0.02, (vocab, width)
    ).astype(np.float32)
    P["text_model.embeddings.position_embedding.weight"] = rng.normal(
        0, 0.01, (max_positions, width)
    ).astype(np.float32)
    for i in range(num_layers):
        pre = f"text_model.encoder.layers.{i}."
        norm(pre + "layer_norm1", width)
        norm(pre + "layer_norm2", width)
        for nme in ("q_proj", "k_proj", "v_proj", "out_proj"):
            lin(pre + f"self_attn.{nme}", width, width)
        lin(pre + "mlp.fc1", width * mlp_ratio, width)
        lin(pre + "mlp.fc2", width, width * mlp_ratio)
    norm("text_model.final_layer_norm", width)
    if with_projection:
        P["text_projection.weight"] = rng.normal(0, width**-0.5, (width, width)).astype(
            np.float32
        )
    return P
