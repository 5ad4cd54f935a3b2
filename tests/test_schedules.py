"""Encoder-reuse key-step schedules (pipelines/base.encoder_key_gates)."""

import numpy as np
import pytest

from rich_text_to_image_tpu.pipelines.base import encoder_key_gates


def test_encoder_key_gates_schedules():
    """'early' must cost the same as 'uniform' (equal key-step count),
    include step 0, and pack keys denser in the first half."""
    for S, stride in [(50, 2), (50, 3), (41, 4), (7, 2), (6, 3)]:
        u = encoder_key_gates(S, stride, "uniform")
        e = encoder_key_gates(S, stride, "early")
        assert u.sum() == e.sum() == len(range(0, S, stride))
        assert e[0] and u[0]
        assert e[: S // 2].sum() >= u[: S // 2].sum()


def test_encoder_key_gates_early_engages():
    e = encoder_key_gates(50, 2, "early")
    # uniform puts exactly 13 key steps in [0, 25); denser-early beats it
    assert e[:25].sum() > 13
    assert e.sum() == 25


def test_encoder_key_gates_edges():
    assert encoder_key_gates(10, 1).all()
    assert encoder_key_gates(1, 3).sum() == 1
    with pytest.raises(ValueError):
        encoder_key_gates(10, 2, "bogus")
