"""Differential tests: C++ BPE merge core vs the pure-Python implementation."""

import random

import pytest

from rich_text_to_image_tpu.models.tokenizer import CLIPTokenizer, bytes_to_unicode
from rich_text_to_image_tpu.native import load_bpe_lib


pytestmark = pytest.mark.skipif(
    load_bpe_lib() is None, reason="g++ unavailable"
)


def _tokenizers(merges):
    units = list(bytes_to_unicode().values())
    vocab = {}
    for u in units:
        vocab[u] = len(vocab)
    for u in units:
        vocab[u + "</w>"] = len(vocab)
    for m in merges:
        vocab.setdefault("".join(m), len(vocab))
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    native = CLIPTokenizer(vocab, merges, use_native=True)
    python = CLIPTokenizer(vocab, merges, use_native=False)
    assert native._native is not None
    return native, python


def test_simple_merges():
    merges = [("c", "a"), ("ca", "t</w>"), ("t", "h"), ("th", "e</w>")]
    nat, py = _tokenizers(merges)
    for text in ["the cat", "cats that chat", "ca ca ca"]:
        assert nat._tokenize(text) == py._tokenize(text), text


def test_random_merge_tables():
    rng = random.Random(0)
    letters = list("abcdefgh")
    # random two-symbol merges over letters and grown symbols
    symbols = letters + [l + "</w>" for l in letters]
    merges = []
    for _ in range(40):
        a, b = rng.choice(symbols), rng.choice(symbols)
        if (a, b) not in merges and not a.endswith("</w>"):
            merges.append((a, b))
            if not b.endswith("</w>"):
                symbols.append(a + b)
    nat, py = _tokenizers(merges)
    for _ in range(60):
        word = "".join(rng.choice(letters) for _ in range(rng.randint(1, 12)))
        # compare through the public path (caches are per-instance)
        assert nat._tokenize(word) == py._tokenize(word), word


def test_multibyte_utf8():
    merges = [("é", "t</w>")]
    units = list(bytes_to_unicode().values())
    # byte-encode "é" (2 utf-8 bytes → 2 byte-units); merges act on units,
    # so just check native==python on non-ascii input
    nat, py = _tokenizers([("c", "a")])
    for text in ["école", "ça va", "naïve"]:
        assert nat._tokenize(text) == py._tokenize(text), text
