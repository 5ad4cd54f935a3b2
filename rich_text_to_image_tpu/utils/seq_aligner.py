"""Token-sequence alignment for the prompt-to-prompt baseline.

Builds the Refine mapper: for each position of the *edited* prompt's token
sequence, the position of the matching token in the *base* sequence (and an
alpha of 1), or its own position (alpha 0) for tokens that only exist in the
edit. Matches the behavioral contract of the vendored Needleman-Wunsch
aligner the reference benchmarks use (utils/seq_aligner.py /
ptp_utils.py:30-142); implemented here with difflib's longest-contiguous-
match alignment, which agrees on the word-insertion/replacement edits the
benchmarks perform.
"""

from __future__ import annotations

import difflib

import numpy as np


def get_word_inds(prompt: str, word: str, tokenizer) -> np.ndarray:
    """Token positions (1-based, after BOS) of every occurrence of ``word``
    in ``prompt`` (ptp_utils.get_word_inds contract)."""
    words = prompt.replace(",", " ,").split(" ")
    out = []
    pos = 1  # BOS occupies 0
    for w in words:
        toks = tokenizer._tokenize(w)
        if w.strip(".,!?").lower() == word.strip(".,!?").lower():
            out.extend(range(pos, pos + len(toks)))
        pos += len(toks)
    return np.asarray(out, dtype=np.int32)


def get_replacement_mapper(
    base_prompt: str, edited_prompt: str, tokenizer, max_len: int = 77
) -> np.ndarray:
    """AttentionReplace mapper for word-swap edits (ptp get_replacement_mapper).

    Both prompts must have the same word count; swapped words must tokenize
    to equal lengths (the original redistributes fractionally for unequal
    lengths — out of scope, raises instead). Returns a [max_len] column
    mapper usable as ``cross_mapper`` with full mix.
    """
    bw = base_prompt.split(" ")
    ew = edited_prompt.split(" ")
    if len(bw) != len(ew):
        raise ValueError("AttentionReplace requires equal word counts; "
                         "use AttentionRefine for insertions/deletions")
    mapper = np.arange(max_len, dtype=np.int32)
    pos_b = pos_e = 1
    for wb, we in zip(bw, ew):
        nb = len(tokenizer._tokenize(wb))
        ne = len(tokenizer._tokenize(we))
        if wb != we and nb != ne:
            raise ValueError(
                f"swapped words {wb!r}→{we!r} tokenize to different lengths "
                f"({nb} vs {ne}); use AttentionRefine"
            )
        for k in range(min(ne, max_len - pos_e)):
            mapper[pos_e + k] = pos_b + min(k, nb - 1)
        pos_b += nb
        pos_e += ne
    return mapper


def get_refinement_mapper(
    base_ids: np.ndarray, edited_ids: np.ndarray, max_len: int = 77
) -> tuple[np.ndarray, np.ndarray]:
    """(mapper [max_len] int32, alphas [max_len] float32).

    mapper[j] = index into the base sequence whose attention column the
    edited position j should inherit; alphas[j] = 1 where inherited.
    """
    base = np.asarray(base_ids).reshape(-1).tolist()[:max_len]
    edit = np.asarray(edited_ids).reshape(-1).tolist()[:max_len]
    sm = difflib.SequenceMatcher(a=base, b=edit, autojunk=False)
    mapper = np.arange(max_len, dtype=np.int32)
    alphas = np.zeros(max_len, dtype=np.float32)
    for block in sm.get_matching_blocks():
        for k in range(block.size):
            j = block.b + k
            if j < max_len:
                mapper[j] = block.a + k
                alphas[j] = 1.0
    return mapper, alphas
