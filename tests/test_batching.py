"""Unit tests for the shared equal-length chunking rule
(`adx_tpu/batching.py`) — the single owner of the grouping idiom used by
every track-folding path."""

import numpy as np
import pytest

from adx_tpu.batching import equal_length_chunks


def test_groups_by_length_then_chunks():
    items = {
        "a": np.zeros(10),
        "b": np.zeros(20),
        "c": np.zeros(10),
        "d": np.zeros(10),
        "e": np.zeros(20),
    }
    chunks = equal_length_chunks(items, batch_size=2)
    # sorted by length: 10s first (a, c, d) then 20s (b, e)
    assert chunks == [["a", "c"], ["d"], ["b", "e"]]


def test_singletons_are_yielded_not_dropped():
    chunks = equal_length_chunks({"only": np.zeros(5)}, batch_size=4)
    assert chunks == [["only"]]


def test_input_order_preserved_within_length_class():
    items = {i: np.zeros(7) for i in [3, 1, 4, 1.5, 9]}
    chunks = equal_length_chunks(items, batch_size=10)
    assert chunks == [[3, 1, 4, 1.5, 9]]


def test_empty_mapping():
    assert equal_length_chunks({}, batch_size=4) == []


def test_batch_size_validated():
    with pytest.raises(ValueError):
        equal_length_chunks({"a": np.zeros(3)}, batch_size=0)


def test_all_keys_covered_exactly_once():
    rng = np.random.default_rng(0)
    items = {k: np.zeros(int(rng.integers(1, 5))) for k in range(37)}
    chunks = equal_length_chunks(items, batch_size=4)
    flat = [k for c in chunks for k in c]
    assert sorted(flat) == sorted(items)
    for c in chunks:
        assert 1 <= len(c) <= 4
        assert len({len(items[k]) for k in c}) == 1
