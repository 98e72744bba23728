"""Exact-parity tests for the in-repo byte-level BPE engine (utils/bpe.py).

The real roberta-base vocab.json/merges.txt are data this zero-egress image
does not ship, so the oracle is transformers.RobertaTokenizer (the SLOW,
pure-python tokenizer) constructed from a locally GENERATED vocab/merges
pair — the engine semantics (GPT-2 regex pretokenization, byte->unicode
table, rank-greedy merges, special wrapping, padding) are exactly what is
being certified; the data is a drop-in. Reference tokenization path:
given_models.py:592-605 (laion_clap's bundled RobertaTokenizer).
"""
import json

import numpy as np
import pytest

from audio_algebra_tpu.utils.bpe import RobertaBPE, bytes_to_unicode


def _make_assets(tmp_path):
    """A small but real vocab/merges pair covering the full byte alphabet
    plus merges that exercise rank order, multi-step merges, and the Ġ
    (space) prefix."""
    byte_vocab = sorted(set(bytes_to_unicode().values()))
    merges = [
        ("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o"),
        ("Ġ", "w"), ("o", "r"), ("Ġw", "or"), ("l", "d"), ("Ġwor", "ld"),
        ("t", "h"), ("th", "e"), ("Ġ", "the"),
        ("1", "2"), ("12", "3"),
        ("é", "é"),  # (mapped bytes of 'é' merge) multibyte utf-8
    ]
    tokens = ["<s>", "<pad>", "</s>", "<unk>"] + byte_vocab + \
        ["".join(m) for m in merges]
    vocab = {t: i for i, t in enumerate(dict.fromkeys(tokens))}
    (tmp_path / "vocab.json").write_text(
        json.dumps(vocab, ensure_ascii=False), encoding="utf-8")
    (tmp_path / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges) + "\n",
        encoding="utf-8")
    return vocab, merges


SAMPLES = [
    "hello world",
    "the theory of the world",
    "Hello, World!  123 1234",
    "it's we've don't I'll they'd I'm you're",
    "  leading and   trailing spaces  ",
    "tabs\tand\nnewlines",
    "caffé sauté déjà-vu",          # 2-byte utf-8
    "音楽 ユニット 🎶🎛️",            # 3/4-byte utf-8 + emoji
    "",
    "a",
    "ĠweirdĊliteral",                # chars that collide with the byte table
]


def test_bpe_matches_transformers_slow_tokenizer(tmp_path):
    transformers = pytest.importorskip("transformers")
    _make_assets(tmp_path)
    oracle = transformers.RobertaTokenizer(
        vocab_file=str(tmp_path / "vocab.json"),
        merges_file=str(tmp_path / "merges.txt"))
    engine = RobertaBPE.from_assets(tmp_path)
    for s in SAMPLES:
        want = oracle(s, truncation=True, max_length=77)["input_ids"]
        got = [engine.bos_id] + engine.encode_text(s)[:75] + [engine.eos_id]
        assert got == want, (s, got, want)


def test_bpe_batch_padding_and_mask(tmp_path):
    _make_assets(tmp_path)
    engine = RobertaBPE.from_assets(tmp_path)
    ids, mask = engine(["hello world", "the"], max_len=16)
    assert ids.dtype == np.int32 and ids.shape == mask.shape
    # row 0 longer than row 1; row 1 padded with <pad>=1 and mask 0
    assert ids[0, 0] == engine.bos_id
    n1 = int(mask[1].sum())
    assert (ids[1, n1:] == engine.pad_id).all()
    assert (mask[0] == 1).all()


def test_bpe_truncation(tmp_path):
    _make_assets(tmp_path)
    engine = RobertaBPE.from_assets(tmp_path)
    ids, _ = engine(["x " * 100], max_len=8)
    assert ids.shape[1] == 8
    assert ids[0, -1] == engine.eos_id   # eos survives truncation


def test_find_assets_env(tmp_path, monkeypatch):
    from audio_algebra_tpu.utils import bpe as bpe_mod

    _make_assets(tmp_path)
    monkeypatch.setenv("AA_ROBERTA_VOCAB", str(tmp_path))
    assert bpe_mod.find_assets() == tmp_path


def test_tokenize_uses_engine_when_assets_present(tmp_path, monkeypatch):
    """models/clap.tokenize routes through the engine when assets exist."""
    from audio_algebra_tpu.models import clap as clap_mod

    _make_assets(tmp_path)
    monkeypatch.setenv("AA_ROBERTA_VOCAB", str(tmp_path))
    clap_mod._bpe_engine.cache_clear()
    try:
        cfg = clap_mod.ClapTextCfg()
        ids = clap_mod.tokenize(["hello world"], cfg)
        engine = RobertaBPE.from_assets(tmp_path)
        want, _ = engine(["hello world"], max_len=cfg.max_len)
        np.testing.assert_array_equal(ids, want)
    finally:
        clap_mod._bpe_engine.cache_clear()


# ---------------------------------------------------------------- vendoring
# tools/fetch_tokenizer.py: the network fetch can't run here (zero egress),
# but the integrity layer — SHA-256 trust-on-first-use pinning and the
# structural validator — is pure local logic.

def _load_fetch_tool():
    import importlib.util
    import pathlib
    p = pathlib.Path(__file__).resolve().parents[1] / "tools" / "fetch_tokenizer.py"
    spec = importlib.util.spec_from_file_location("fetch_tokenizer", p)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_fetch_tokenizer_pins_roundtrip(tmp_path):
    ft = _load_fetch_tool()
    (tmp_path / "vocab.json").write_text('{"x": 1}')
    (tmp_path / "merges.txt").write_text("#version: 0.2\na b\n")
    ft.verify_pins(tmp_path, write_if_missing=True)       # first fetch: pin
    assert (tmp_path / "SHA256SUMS").is_file()
    ft.verify_pins(tmp_path, write_if_missing=False)      # re-verify: green
    (tmp_path / "vocab.json").write_text('{"x": 2}')      # tamper
    with pytest.raises(SystemExit, match="SHA-256 mismatch"):
        ft.verify_pins(tmp_path, write_if_missing=False)


def test_fetch_tokenizer_rejects_non_roberta_vocab(tmp_path):
    ft = _load_fetch_tool()
    _make_assets(tmp_path)   # structurally valid BPE pair, but not roberta-base
    with pytest.raises(SystemExit, match="50265"):
        ft.validate_structure(tmp_path)
