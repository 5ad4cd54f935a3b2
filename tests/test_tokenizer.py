"""CLIP BPE tokenizer tests.

Oracle: transformers' CLIPTokenizer implements the same algorithm; we can't
download the real CLIP vocab (no network), so we verify our BPE against
transformers running on an identical tiny vocab written to disk.
"""

import json
import os

import numpy as np
import pytest

from rich_text_to_image_tpu.models.tokenizer import CLIPTokenizer, bytes_to_unicode


def test_byte_level_tokenize():
    tok = CLIPTokenizer.byte_level()
    assert tok._tokenize("cat") == ["c", "a", "t</w>"]
    assert tok._tokenize("A  Cat ") == ["a</w>", "c", "a", "t</w>"]  # lower+ws clean


def test_encode_shape_and_specials():
    tok = CLIPTokenizer.byte_level()
    ids = tok("a cat")
    assert ids.shape == (1, 77)
    assert ids[0, 0] == tok.bos_token_id
    row = ids[0].tolist()
    assert tok.eos_token_id in row
    # padding uses eos (SD-1.5 tokenizer parity)
    assert row[-1] == tok.eos_token_id


def test_truncation():
    tok = CLIPTokenizer.byte_level()
    ids = tok("x" * 500)
    assert ids.shape == (1, 77)


def test_roundtrip_decode():
    tok = CLIPTokenizer.byte_level()
    assert tok.decode(tok.encode("hello world")) == "hello world"


def _write_tiny_vocab(tmp_path):
    """A small real-merges vocab exercising multi-step BPE."""
    units = list(bytes_to_unicode().values())
    vocab = {}
    for u in units:
        vocab[u] = len(vocab)
    for u in units:
        vocab[u + "</w>"] = len(vocab)
    merges = [
        ("c", "a"),
        ("ca", "t</w>"),
        ("d", "o"),
        ("do", "g</w>"),
        ("t", "h"),
        ("th", "e</w>"),
    ]
    for m in merges:
        vocab["".join(m)] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    d = tmp_path / "tokenizer"
    d.mkdir()
    with open(d / "vocab.json", "w") as f:
        json.dump(vocab, f)
    with open(d / "merges.txt", "w") as f:
        f.write("#version: 0.2\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    return str(d), vocab, merges


def test_merges_applied(tmp_path):
    d, _, _ = _write_tiny_vocab(tmp_path)
    tok = CLIPTokenizer.from_pretrained(d)
    assert tok._tokenize("the cat") == ["the</w>", "cat</w>"]
    assert tok._tokenize("dog") == ["dog</w>"]
    assert tok._tokenize("cats") == ["ca", "t", "s</w>"]


def test_vs_transformers_oracle(tmp_path):
    transformers = pytest.importorskip("transformers")
    d, _, _ = _write_tiny_vocab(tmp_path)
    with open(os.path.join(d, "special_tokens_map.json"), "w") as f:
        json.dump(
            {
                "bos_token": "<|startoftext|>",
                "eos_token": "<|endoftext|>",
                "pad_token": "<|endoftext|>",
                "unk_token": "<|endoftext|>",
            },
            f,
        )
    hf = transformers.CLIPTokenizer(
        os.path.join(d, "vocab.json"), os.path.join(d, "merges.txt")
    )
    ours = CLIPTokenizer.from_pretrained(d)
    for text in [
        "the cat sat on the dog",
        "a photo of cats, dogs & the-weather!",
        "The   CAT'S pajamas 123",
        "école après ça",  # multi-byte utf-8
    ]:
        assert ours._tokenize(text) == hf._tokenize(text), text
        hf_ids = hf(
            [text], padding="max_length", max_length=77, truncation=True
        )["input_ids"][0]
        np.testing.assert_array_equal(ours(text)[0], hf_ids)
