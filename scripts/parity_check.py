#!/usr/bin/env python
"""Parity checker: compare two experiment result trees (e.g. a reference run
vs this framework's run) within tolerances (SURVEY.md §7.2.11 — the ≤1e-3
saliency-delta gate).

Compares, where present in both trees:
* fbp_results.json           — per-file global/component importance stats
* spectrogram_results_*.json — per-file saliency stats
* explanations.json          — LIME component influences
* predictions.json           — fake probabilities
* bands metadata JSONs       — per-band deltas

Prints a per-family summary and exits non-zero if any compared value
exceeds tolerance.

IMPORTANT: runs being compared across backends must be produced with
``adx_tpu.predict.enable_fidelity_mode()`` (HIGHEST matmul precision).
TPU f32 dots default to FAST (bf16 multiply passes) and drift up to ~0.06
in raw probabilities vs CPU f32; with fidelity mode the measured TPU-vs-CPU
gap at SpecTTTra-α/120 s scale is ≤ 8.8e-4 — inside the 1e-3 gate.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def _load(path):
    with open(path, "r", encoding="utf-8") as f:
        return json.load(f)


def _walk_numbers(obj, prefix=""):
    if isinstance(obj, dict):
        for k, v in obj.items():
            yield from _walk_numbers(v, f"{prefix}/{k}")
    elif isinstance(obj, list):
        for i, v in enumerate(obj):
            yield from _walk_numbers(v, f"{prefix}[{i}]")
    elif isinstance(obj, bool):
        return
    elif isinstance(obj, (int, float)):
        yield prefix, float(obj)


def compare_json(path_a: Path, path_b: Path, tol: float, label: str,
                 allow_missing: bool = False):
    a = dict(_walk_numbers(_load(path_a)))
    b = dict(_walk_numbers(_load(path_b)))
    common = sorted(set(a) & set(b))
    missing_a = len(set(b) - set(a))
    missing_b = len(set(a) - set(b))
    worst = 0.0
    worst_key = None
    n_fail = 0
    for k in common:
        d = abs(a[k] - b[k])
        if d > worst:
            worst, worst_key = d, k
        if d > tol:
            n_fail += 1
    # missing keys and value-free file pairs are FAILURES by default: a
    # truncated tree must not pass the SURVEY §7.2.11 gate just because the
    # values it DID produce agree
    structural_ok = allow_missing or (missing_a == 0 and missing_b == 0)
    ok = n_fail == 0 and bool(common) and structural_ok
    status = "OK" if ok else ("EMPTY" if not common else "FAIL")
    print(
        f"[{status:5s}] {label}: {len(common)} shared values, "
        f"max |Δ| = {worst:.3e} at {worst_key or '-'}; "
        f"{n_fail} over tol={tol:g}; missing: {missing_b} (ours) / {missing_a} (theirs)"
    )
    return ok


def find_and_compare(root_a: Path, root_b: Path, rel_glob: str, tol: float,
                     allow_missing: bool = False):
    ok = True
    files_a = {p.relative_to(root_a): p for p in root_a.rglob(rel_glob)}
    files_b = {p.relative_to(root_b): p for p in root_b.rglob(rel_glob)}
    shared = sorted(set(files_a) & set(files_b), key=str)
    for rel in shared:
        ok &= compare_json(files_a[rel], files_b[rel], tol, str(rel),
                           allow_missing=allow_missing)
    only_a = set(files_a) - set(files_b)
    only_b = set(files_b) - set(files_a)
    for rel in sorted(only_b, key=str):
        print(f"[MISS ] {rel}: present only in tree B")
    for rel in sorted(only_a, key=str):
        print(f"[MISS ] {rel}: present only in tree A")
    if (only_a or only_b) and not allow_missing:
        ok = False  # a file one tree never produced is a parity failure
    return ok, len(shared)


def main():
    ap = argparse.ArgumentParser(description="Compare two experiment result trees")
    ap.add_argument("tree_a", help="Result tree A (e.g. reference outputs)")
    ap.add_argument("tree_b", help="Result tree B (e.g. adx_tpu outputs)")
    ap.add_argument("--tol", type=float, default=1e-3, help="Absolute tolerance")
    ap.add_argument(
        "--allow-missing", action="store_true",
        help="Report missing files/keys without failing the gate (default: "
             "a key or file present in only one tree FAILS)",
    )
    ap.add_argument(
        "--families", nargs="*", default=[
            "fbp_results.json", "spectrogram_results_*.json", "explanations.json",
            "predictions.json", "*_bands_metadata.json",
            "*_occlusion_patches_from_list.json",
        ],
    )
    args = ap.parse_args()

    root_a, root_b = Path(args.tree_a), Path(args.tree_b)
    all_ok = True
    total = 0
    print(f"Comparing {root_a}  vs  {root_b}  (tol {args.tol:g})")
    print("-" * 70)
    for fam in args.families:
        ok, n = find_and_compare(root_a, root_b, fam, args.tol,
                                 allow_missing=args.allow_missing)
        all_ok &= ok
        total += n
    print("-" * 70)
    if total == 0:
        print("⚠️  No shared result files found — nothing compared.")
        sys.exit(2)
    print("✅ PARITY OK" if all_ok else "❌ PARITY FAILED")
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
