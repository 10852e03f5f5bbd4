"""Tokenizer parity: native BPE vs transformers' CLIPTokenizer (loaded from
the same vendored vocab), and prompt-weight syntax semantics."""

import numpy as np
import pytest

from lightdiffusion_next_tpu import config as cfg
from lightdiffusion_next_tpu.models.clip import tokenizer as tok


@pytest.fixture(scope="module")
def bpe():
    return tok.ClipBPE()


@pytest.fixture(scope="module")
def hf_tok():
    from transformers import CLIPTokenizer

    return CLIPTokenizer(
        vocab_file=cfg.repo_asset("tokenizer", "clip", "vocab.json"),
        merges_file=cfg.repo_asset("tokenizer", "clip", "merges.txt"),
    )


@pytest.mark.parametrize(
    "text",
    [
        "a photo of a cat",
        "masterpiece, best quality, 1girl, (extremely detailed:1.2)",
        "Ünïcòdé tëxt with wëird chars!!! 123",
        "hyphenated-words and apostrophe's",
        "",
        "a" * 100,
    ],
)
def test_bpe_matches_transformers(bpe, hf_tok, text):
    ours = bpe.encode(text)
    oracle = hf_tok(text)["input_ids"][1:-1]  # strip start/end
    assert ours == oracle


def test_special_tokens(bpe):
    assert bpe.start_token == 49406
    assert bpe.end_token == 49407


def test_token_weights_nesting():
    out = tok.parse_prompt_weights("a (b) ((c)) (d:1.5)", 1.0)
    d = {k.strip(): w for k, w in out if k.strip()}
    assert d["a"] == 1.0
    assert d["b"] == pytest.approx(1.1)
    assert d["c"] == pytest.approx(1.21)
    assert d["d"] == pytest.approx(1.5)


def test_escapes():
    out = tok.parse_prompt_weights(
        tok.protect_escaped_parens(r"smile \(happy\)"), 1.0
    )
    assert len(out) == 1
    assert tok.restore_escaped_parens(out[0][0]) == "smile (happy)"


def test_weight_parser_matches_reference_semantics():
    """Differential check of the group-tree parser against an independent
    reimplementation of the reference's recursive split (SDToken.py:13-77),
    over tricky nesting / explicit-weight / malformed inputs."""

    def oracle_split(s):
        res, cur, depth = [], "", 0
        for ch in s:
            if ch == "(":
                if depth == 0:
                    if cur:
                        res.append(cur)
                    cur = "("
                else:
                    cur += ch
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    res.append(cur + ")")
                    cur = ""
                else:
                    cur += ch
            else:
                cur += ch
        if cur:
            res.append(cur)
        return res

    def oracle(s, w):
        out = []
        for x in oracle_split(s):
            weight = w
            if len(x) >= 2 and x[0] == "(" and x[-1] == ")":
                x = x[1:-1]
                pos = x.rfind(":")
                weight *= 1.1
                if pos > 0:
                    try:
                        weight = float(x[pos + 1 :])
                        x = x[:pos]
                    except ValueError:
                        pass
                out += oracle(x, weight)
            else:
                out.append((x, w))
        return out

    cases = [
        "plain text",
        "(a)",
        "((a))",
        "(a:1.5)",
        "(a:2 b)",
        "(a (b:2) c)",
        "(a (b) c:2.0)",
        "((b):2)",
        "(a:)",
        "(:2)",
        "(a (b:2))",
        "(a:1.5 (b))",
        "text (mid:0.8) tail",
        "(nested (deep (deeper:3)))",
        "(a, b:1.25), c",
        "()",
        "(a:nan_not_float)",
        "(unclosed",
        "trail (x:2",
    ]
    for s in cases:
        got = [(t, round(w, 9)) for t, w in tok.parse_prompt_weights(s, 1.0)]
        want = [(t, round(w, 9)) for t, w in oracle(s, 1.0)]
        assert got == want, (s, got, want)


def test_tokenize_with_weights_structure(bpe):
    t = tok.SDTokenizer(bpe=bpe)
    rows = t.tokenize_with_weights("a photo of (a cat:1.3)")
    assert len(rows) == 1
    row = rows[0]
    assert len(row) == 77
    assert row[0][0] == 49406
    ids = [x[0] for x in row]
    assert 49407 in ids
    # weights applied to the weighted segment
    weights = {w for _, w in row}
    assert 1.3 in {round(w, 4) for w in weights}


def test_tokenize_long_prompt_overflows_batches(bpe):
    t = tok.SDTokenizer(bpe=bpe)
    rows = t.tokenize_with_weights("cat " * 120)
    assert len(rows) == 2
    for row in rows:
        assert len(row) == 77
        assert row[0][0] == 49406


def test_textual_inversion_embedding(tmp_path, bpe):
    import safetensors.numpy

    emb = np.random.default_rng(0).normal(size=(2, 768)).astype(np.float32)
    safetensors.numpy.save_file({"emb_params": emb}, str(tmp_path / "myti.safetensors"))
    t = tok.SDTokenizer(bpe=bpe, embedding_directory=str(tmp_path))
    rows = t.tokenize_with_weights("a embedding:myti cat")
    row = rows[0]
    vecs = [x for x in row if not isinstance(x[0], (int, np.integer))]
    assert len(vecs) == 2
    np.testing.assert_allclose(np.asarray(vecs[0][0]), emb[0])


def test_textual_inversion_embedding_in_subdirectory(tmp_path, bpe):
    """load_embed walks subdirectories (expand_directory_list parity,
    SDToken.py:108-123)."""
    import safetensors.numpy

    nested = tmp_path / "packs" / "anime"
    nested.mkdir(parents=True)
    emb = np.random.default_rng(1).normal(size=(1, 768)).astype(np.float32)
    safetensors.numpy.save_file({"emb_params": emb}, str(nested / "deepti.safetensors"))
    t = tok.SDTokenizer(bpe=bpe, embedding_directory=str(tmp_path))
    rows = t.tokenize_with_weights("a embedding:deepti cat")
    vecs = [x for x in rows[0] if not isinstance(x[0], (int, np.integer))]
    assert len(vecs) == 1
    np.testing.assert_allclose(np.asarray(vecs[0][0]), emb[0])
    # path traversal out of the root is still rejected
    assert tok.load_embed("../../etc/passwd", [str(nested)], 768) is None


def test_sd1_tokenizer_keying(bpe):
    t = tok.SD1Tokenizer()
    out = t.tokenize_with_weights("hello world")
    assert "l" in out
    assert len(out["l"][0]) == 77
