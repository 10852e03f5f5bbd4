"""Native CLIP BPE tokenizer + SD prompt syntax.

Counterpart of src/SD15/SDToken.py: the reference wraps transformers'
CLIPTokenizerFast; here the byte-pair encoder is implemented directly (the
vocab/merges data files are vendored under assets/tokenizer/clip — they are
OpenAI CLIP's public vocabulary, not reference code). Prompt syntax parity:

- ``(text)`` weight x1.1, nested multiplies (SDToken.token_weights, :50)
- ``(text:1.3)`` explicit weight (rfind ':', :66-71)
- ``\\(`` / ``\\)`` escapes (escape_important, :79)
- ``embedding:name`` textual-inversion splices (:125-206, :292-340)
- 77-token batching with start/end/pad, long words (>=8 tokens) split across
  batches (SDTokenizer.tokenize_with_weights, :292-400)
"""

from __future__ import annotations

import functools
import gzip
import html
import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from lightdiffusion_next_tpu import config as _config

try:
    import regex as re
except ImportError:  # pragma: no cover
    import re  # type: ignore


# ---------------------------------------------------------------------------
# Prompt weight parsing (semantics of SDToken.py:13-103)
# ---------------------------------------------------------------------------


def parse_parentheses(string: str) -> List[str]:
    result = []
    current_item = ""
    nesting_level = 0
    for char in string:
        if char == "(":
            if nesting_level == 0:
                if current_item:
                    result.append(current_item)
                current_item = "("
            else:
                current_item += char
            nesting_level += 1
        elif char == ")":
            nesting_level -= 1
            if nesting_level == 0:
                result.append(current_item + ")")
                current_item = ""
            else:
                current_item += char
        else:
            current_item += char
    if current_item:
        result.append(current_item)
    return result


def token_weights(string: str, current_weight: float) -> List[Tuple[str, float]]:
    a = parse_parentheses(string)
    out = []
    for x in a:
        weight = current_weight
        if len(x) >= 2 and x[-1] == ")" and x[0] == "(":
            x = x[1:-1]
            xx = x.rfind(":")
            weight *= 1.1
            if xx > 0:
                try:
                    weight = float(x[xx + 1 :])
                    x = x[:xx]
                except ValueError:
                    pass
            out += token_weights(x, weight)
        else:
            out += [(x, current_weight)]
    return out


def escape_important(text: str) -> str:
    return text.replace("\\)", "\0\1").replace("\\(", "\0\2")


def unescape_important(text: str) -> str:
    return text.replace("\0\1", ")").replace("\0\2", "(")


# ---------------------------------------------------------------------------
# Byte-pair encoding (OpenAI CLIP tokenizer algorithm)
# ---------------------------------------------------------------------------


@functools.lru_cache()
def bytes_to_unicode() -> Dict[int, str]:
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(2**8):
        if b not in bs:
            bs.append(b)
            cs.append(2**8 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word: Tuple[str, ...]):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


_WORD_PATTERN = (
    r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"
    r"[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+"
)


class ClipBPE:
    """CLIP byte-pair encoder over the vendored vocab.json/merges.txt."""

    def __init__(self, vocab_path: Optional[str] = None, merges_path: Optional[str] = None):
        vocab_path = vocab_path or _config.repo_asset("tokenizer", "clip", "vocab.json")
        merges_path = merges_path or _config.repo_asset(
            "tokenizer", "clip", "merges.txt"
        )
        opener = gzip.open if vocab_path.endswith(".gz") else open
        with opener(vocab_path, "rt", encoding="utf-8") as f:
            self.encoder: Dict[str, int] = json.load(f)
        self.decoder = {v: k for k, v in self.encoder.items()}
        with open(merges_path, encoding="utf-8") as f:
            merges = f.read().split("\n")
        # first line is the version header
        merges = [tuple(m.split()) for m in merges[1:] if m and len(m.split()) == 2]
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.byte_encoder = bytes_to_unicode()
        try:
            self.pat = re.compile(_WORD_PATTERN, re.IGNORECASE)
        except re.error:  # pragma: no cover — stdlib re lacks \p classes
            self.pat = re.compile(
                r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"
                r"[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+",
                re.IGNORECASE,
            )
        self.cache: Dict[str, str] = {}
        self.start_token = self.encoder["<|startoftext|>"]
        self.end_token = self.encoder["<|endoftext|>"]

    def _bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if (
                    word[i] == first
                    and i < len(word) - 1
                    and word[i + 1] == second
                ):
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        result = " ".join(word)
        self.cache[token] = result
        return result

    def encode(self, text: str) -> List[int]:
        """Text -> BPE ids (no special tokens)."""
        text = _whitespace_clean(text).lower()
        bpe_tokens: List[int] = []
        for token in re.findall(self.pat, text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            bpe_tokens.extend(
                self.encoder[t] for t in self._bpe(token).split(" ")
            )
        return bpe_tokens

    def decode(self, ids) -> str:
        byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        text = "".join(self.decoder[int(i)] for i in ids)
        return (
            bytearray(byte_decoder[c] for c in text)
            .decode("utf-8", errors="replace")
            .replace("</w>", " ")
        )


def _whitespace_clean(text: str) -> str:
    text = re.sub(r"\s+", " ", html.unescape(html.unescape(text)))
    return text.strip()


# ---------------------------------------------------------------------------
# Textual-inversion embedding loading (SDToken.load_embed, :125-206)
# ---------------------------------------------------------------------------


def load_embed(
    embedding_name: str,
    embedding_directories: Optional[List[str]],
    embedding_size: int,
    embed_key: Optional[str] = None,
) -> Optional[np.ndarray]:
    if not embedding_directories:
        return None
    if isinstance(embedding_directories, str):
        embedding_directories = [embedding_directories]
    valid_file = None
    for embed_dir in embedding_directories:
        embed_path = os.path.abspath(os.path.join(embed_dir, embedding_name))
        embed_dir_abs = os.path.abspath(embed_dir)
        try:
            if os.path.commonpath((embed_dir_abs, embed_path)) != embed_dir_abs:
                continue
        except ValueError:
            continue
        if not os.path.isfile(embed_path):
            for ext in (".safetensors", ".pt", ".bin"):
                if os.path.isfile(embed_path + ext):
                    valid_file = embed_path + ext
                    break
        else:
            valid_file = embed_path
        if valid_file is not None:
            break
    if valid_file is None:
        return None

    if valid_file.endswith(".safetensors"):
        import safetensors.numpy

        embed = safetensors.numpy.load_file(valid_file)
    else:
        import torch

        data = torch.load(valid_file, map_location="cpu", weights_only=False)
        embed = {
            k: (v.float().numpy() if hasattr(v, "numpy") else v)
            for k, v in _flatten_embed_dict(data).items()
        }

    # pick the tensor matching the requested embedding size / key
    values = list(embed.values())
    if embed_key is not None and embed_key in embed:
        out = embed[embed_key]
    elif len(values) == 1:
        out = values[0]
    else:
        out = None
        for v in values:
            arr = np.asarray(v)
            if arr.ndim and arr.shape[-1] == embedding_size:
                out = arr
                break
        if out is None:
            out = values[0]
    out = np.asarray(out, dtype=np.float32)
    if out.ndim == 1:
        out = out[None]
    if out.shape[-1] != embedding_size:
        return None
    return out


def _flatten_embed_dict(data):
    """A1111 .pt embeddings nest tensors under string_to_param."""
    if isinstance(data, dict):
        if "string_to_param" in data:
            return {k: v for k, v in data["string_to_param"].items()}
        if "emb_params" in data:
            return {"emb_params": data["emb_params"]}
        out = {}
        for k, v in data.items():
            if hasattr(v, "shape"):
                out[k] = v
        return out
    return {"embed": data}


# ---------------------------------------------------------------------------
# SD tokenizer facade
# ---------------------------------------------------------------------------


class SDTokenizer:
    """Weighted tokenizer with TI support (SDToken.SDTokenizer parity)."""

    def __init__(
        self,
        max_length: int = 77,
        pad_with_end: bool = True,
        embedding_directory=None,
        embedding_size: int = 768,
        embedding_key: str = "clip_l",
        has_start_token: bool = True,
        pad_to_max_length: bool = True,
        min_length: Optional[int] = None,
        bpe: Optional[ClipBPE] = None,
    ):
        self.bpe = bpe or ClipBPE()
        self.max_length = max_length
        self.min_length = min_length
        self.start_token = self.bpe.start_token if has_start_token else None
        self.end_token = self.bpe.end_token
        self.tokens_start = 1 if has_start_token else 0
        self.pad_with_end = pad_with_end
        self.pad_to_max_length = pad_to_max_length
        self.embedding_directory = embedding_directory
        self.max_word_length = 8
        self.embedding_identifier = "embedding:"
        self.embedding_size = embedding_size
        self.embedding_key = embedding_key

    def _try_get_embedding(self, name: str):
        embed = load_embed(
            name, self.embedding_directory, self.embedding_size, self.embedding_key
        )
        if embed is None:
            stripped = name.strip(",")
            if len(stripped) < len(name):
                embed = load_embed(
                    stripped,
                    self.embedding_directory,
                    self.embedding_size,
                    self.embedding_key,
                )
                return embed, name[len(stripped) :]
        return embed, ""

    def tokenize_with_weights(self, text: str, return_word_ids: bool = False):
        pad_token = self.end_token if self.pad_with_end else 0
        text = escape_important(text)
        parsed_weights = token_weights(text, 1.0)

        tokens: List[List[Tuple]] = []
        for weighted_segment, weight in parsed_weights:
            to_tokenize = (
                unescape_important(weighted_segment).replace("\n", " ").split(" ")
            )
            for word in (w for w in to_tokenize if w):
                if (
                    word.startswith(self.embedding_identifier)
                    and self.embedding_directory is not None
                ):
                    embedding_name = word[len(self.embedding_identifier) :].strip("\n")
                    embed, leftover = self._try_get_embedding(embedding_name)
                    if embed is None:
                        import logging

                        logging.warning(
                            "warning, embedding:%s does not exist, ignoring",
                            embedding_name,
                        )
                    else:
                        tokens.append([(embed[x], weight) for x in range(embed.shape[0])])
                    if leftover:
                        word = leftover
                    else:
                        continue
                tokens.append([(t, weight) for t in self.bpe.encode(word)])

        # batch to max_length rows
        batched_tokens = []
        batch: List[Tuple] = []
        if self.start_token is not None:
            batch.append((self.start_token, 1.0, 0))
        batched_tokens.append(batch)
        for i, t_group in enumerate(tokens):
            is_large = len(t_group) >= self.max_word_length
            while len(t_group) > 0:
                if len(t_group) + len(batch) > self.max_length - 1:
                    remaining_length = self.max_length - len(batch) - 1
                    if is_large:
                        batch.extend(
                            [(t, w, i + 1) for t, w in t_group[:remaining_length]]
                        )
                        batch.append((self.end_token, 1.0, 0))
                        t_group = t_group[remaining_length:]
                    else:
                        batch.append((self.end_token, 1.0, 0))
                        if self.pad_to_max_length:
                            batch.extend([(pad_token, 1.0, 0)] * remaining_length)
                    batch = []
                    if self.start_token is not None:
                        batch.append((self.start_token, 1.0, 0))
                    batched_tokens.append(batch)
                else:
                    batch.extend([(t, w, i + 1) for t, w in t_group])
                    t_group = []

        batch.append((self.end_token, 1.0, 0))
        if self.pad_to_max_length:
            batch.extend([(pad_token, 1.0, 0)] * (self.max_length - len(batch)))
        if self.min_length is not None and len(batch) < self.min_length:
            batch.extend([(pad_token, 1.0, 0)] * (self.min_length - len(batch)))

        if not return_word_ids:
            batched_tokens = [[(t, w) for t, w, _ in x] for x in batched_tokens]
        return batched_tokens

    def untokenize(self, token_weight_pair):
        return list(
            map(lambda a: (a, self.bpe.decoder.get(a[0])), token_weight_pair)
        )


class SD1Tokenizer:
    """Keyed wrapper ({"l": ...}) (SDToken.SD1Tokenizer, :410-450)."""

    def __init__(self, embedding_directory=None, clip_name: str = "l", **kwargs):
        self.clip_name = clip_name
        self.clip = f"clip_{clip_name}"
        setattr(
            self,
            self.clip,
            SDTokenizer(embedding_directory=embedding_directory, **kwargs),
        )

    def tokenize_with_weights(self, text: str, return_word_ids: bool = False):
        return {
            self.clip_name: getattr(self, self.clip).tokenize_with_weights(
                text, return_word_ids
            )
        }

    def untokenize(self, token_weight_pair):
        return getattr(self, self.clip).untokenize(token_weight_pair)
