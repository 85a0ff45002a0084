"""Shared grouping rule for device-batched sweep folding.

SINGLE OWNER of the "group by equal length, then chunk by batch size"
idiom used by every track-folding path (feature extraction, the LIME and
occlusion sweep precomputes, ``extract_all_features_separately``). The
copies had started to drift within one round — singleton handling and
containment semantics differed per site — so the grouping itself lives
here and each caller applies its own containment around the chunks.

Contract notes the callers rely on:

- Chunks are yielded in sorted-length order, preserving input order
  inside a length class — deterministic across runs.
- Singletons are yielded as B=1 chunks, NOT dropped: callers must route
  them through the same batched program family as full chunks, so a
  track's numerics never depend on how many unprocessed peers happen to
  share its folder (accidental-grouping consistency rule).
"""

from __future__ import annotations

from typing import Dict, Hashable, List, Mapping, Sized


def equal_length_chunks(
    items: Mapping[Hashable, Sized], batch_size: int
) -> List[list]:
    """``{key: sized value}`` → chunks of keys, grouped per ``len(value)``.

    Each chunk holds at most ``batch_size`` keys whose values share one
    length (batched device programs need a rectangular stack)."""
    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    by_len: Dict[int, list] = {}
    for k, v in items.items():
        by_len.setdefault(len(v), []).append(k)
    chunks: List[list] = []
    for _ln, keys in sorted(by_len.items()):
        for j0 in range(0, len(keys), batch_size):
            chunks.append(keys[j0 : j0 + batch_size])
    return chunks
