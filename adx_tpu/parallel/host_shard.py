"""Track-level data parallelism across hosts (SURVEY.md §2.6(c)).

The device mesh (``parallel/mesh.py``) parallelizes the *perturbation
batch* within one host's chips over ICI. Dataset sweeps scale further by
sharding the *work list* across hosts over DCN: every host runs the same
runner with ``--num-shards N --shard-index i`` and processes a
deterministic, disjoint round-robin slice of each model folder's (sorted,
capped) file list. Shard outputs are merged afterwards with
``scripts/merge_results.py`` using the same ``append_update_*`` policies
the incremental writers use, so the union of a sharded sweep equals a
single-host sweep.

Reference parity: the reference is strictly single-host — its only remote
element is the per-prediction Gradio HTTPS client
(/root/reference/src/sonics_api.py:64-73); SURVEY.md §2.6 prescribes
"track-level DP across hosts over DCN for dataset sweeps" as the
TPU-native replacement. No custom transport is needed: per-file results
are keyed by ``safe_stem``, so shard merging is associative and the
filesystem (or object store) is the only rendezvous.

Round-robin (``items[i::n]``) rather than contiguous blocks keeps shards
balanced when per-folder file counts are small (the committed sweeps cap
at ≤10 tracks per model folder).
"""

from __future__ import annotations

import os
from typing import Sequence, TypeVar

T = TypeVar("T")

__all__ = ["host_shard", "add_shard_args", "shard_spec_from_args"]


def host_shard(items: Sequence[T], shard_index: int = 0, num_shards: int = 1) -> list[T]:
    """Deterministic round-robin slice of an (already sorted/capped) work
    list: shard ``i`` of ``n`` processes ``items[i::n]``.

    The union of all shards is exactly ``items`` and shards are pairwise
    disjoint, so merged results match a single-host run.
    """
    if num_shards < 1:
        raise ValueError(f"num_shards must be >= 1, got {num_shards}")
    if not 0 <= shard_index < num_shards:
        raise ValueError(
            f"shard_index must be in [0, {num_shards}), got {shard_index}"
        )
    if num_shards == 1:
        return list(items)
    return list(items[shard_index::num_shards])


def add_shard_args(parser) -> None:
    """Attach ``--num-shards`` / ``--shard-index`` to an argparse parser.

    Defaults come from ``ADX_NUM_SHARDS`` / ``ADX_SHARD_INDEX`` so a
    multi-host launcher can set the env once instead of editing every
    command line.
    """
    parser.add_argument(
        "--num-shards",
        type=int,
        default=int(os.environ.get("ADX_NUM_SHARDS", "1")),
        help="Split each folder's file list across this many hosts "
        "(track-level DP; merge outputs with scripts/merge_results.py)",
    )
    parser.add_argument(
        "--shard-index",
        type=int,
        default=int(os.environ.get("ADX_SHARD_INDEX", "0")),
        help="This host's shard id in [0, num-shards)",
    )


def shard_spec_from_args(args) -> tuple[int, int]:
    """(shard_index, num_shards) from parsed args, validated."""
    host_shard([], args.shard_index, args.num_shards)  # validate only
    return args.shard_index, args.num_shards
