#!/usr/bin/env python
"""Measure bf16-production vs f32-fidelity probability drift at TRAINED
logit scales, plus an artifact dose-response probe (VERDICT r4 item 1).

Every earlier drift number (±0.11 probability at random init) was measured
on seeded-random weights whose logits sit near zero, where sigmoid is
steepest — the open claim was that trained logits (large, saturated) shrink
the drift. This drive:

1. loads the committed trained SpecTTTra-α-120s checkpoint twice — once as
   the production bf16 predictor (TPU-default FAST matmul precision) and
   once as the f32 fidelity predictor (HIGHEST precision, the
   parity_check.py mode);
2. scores a probe set spanning the full confidence range: REAL and
   generated tracks from the training distribution (saturated logits) plus
   a vocoder-buzz dose-response series (artifact amplitude × 0 … 1 on a
   REAL base) that sweeps the decision boundary;
3. reports per-track probabilities for both modes, max/mean |Δp|, and the
   dose-response curve (the classifier should be monotone in artifact dose
   — ground truth for the trained-weights saliency story).

Run on the real chip (plain python). Results recorded in BASELINE.md and
PARITY.md.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

CKPT = ROOT / "checkpoints" / "alpha120s" / "best"
SR = 44100
SECONDS = 120.0


def build_probes():
    from scripts.make_synth_dataset import (
        _bass, _harmonic_voice, _percussion, _high_shelf_cut, _vocoder_buzz,
        synth_track,
    )

    probes = {}
    # in-distribution tracks (UNSEEN indices ≥ 200: the training dataset
    # used seeds 0..63 per class)
    for i in (200, 201):
        probes[f"real_{i}"] = synth_track(
            np.random.default_rng(i), SECONDS, SR, fake=False)
        probes[f"fake_{i}"] = synth_track(
            np.random.default_rng(10_000 + i), SECONDS, SR, fake=True)

    # dose-response: REAL base + buzz/shelf artifacts scaled by `dose`
    n = int(SECONDS * SR)
    t = np.arange(n) / SR
    rng = np.random.default_rng(777)
    base = (
        0.50 * _harmonic_voice(rng, t, SR, fake=False)
        + 0.22 * _bass(rng, t)
        + 0.18 * _percussion(rng, t, SR)
        + 0.012 * rng.standard_normal(n)
    )
    buzz = _vocoder_buzz(np.random.default_rng(778), t, SR)
    buzz = buzz / (np.sqrt(np.mean(buzz ** 2)) + 1e-12)
    for dose in (0.0, 0.03, 0.1, 0.3, 1.0):
        y = base + dose * 0.035 * buzz
        if dose > 0:
            y = _high_shelf_cut(y, SR, depth_db=9.0 * dose)
        y = 0.1 * y / (np.sqrt(np.mean(y ** 2)) + 1e-12)
        probes[f"dose_{dose:g}"] = np.clip(y, -0.99, 0.99).astype(np.float32)
    return probes


def score_all(predictor, probes):
    out = {}
    for name, y in probes.items():
        t0 = time.time()
        p = float(predictor.predict(y, SR))
        out[name] = (p, time.time() - t0)
    return out


def main():
    import jax

    from adx_tpu.predict import LocalSonics, enable_fidelity_mode

    if not CKPT.exists():
        sys.exit(f"checkpoint missing: {CKPT}")
    probes = build_probes()
    print(f"{len(probes)} probe tracks × {SECONDS:.0f}s")

    print("\n— production bf16 predictor (FAST matmul default) —")
    pred_bf16 = LocalSonics.from_pretrained(
        "spectttra-alpha-120s", checkpoint_dir=str(CKPT), max_batch=8,
        dtype=jax.numpy.bfloat16,
    )
    bf16 = score_all(pred_bf16, probes)
    for k, (p, dt) in bf16.items():
        print(f"  {k:12s} p(fake)={p:.6f}  ({dt:.2f} s)")

    print("\n— fidelity f32 predictor (HIGHEST matmul precision) —")
    enable_fidelity_mode()
    pred_f32 = LocalSonics.from_pretrained(
        "spectttra-alpha-120s", checkpoint_dir=str(CKPT), max_batch=8,
        dtype=jax.numpy.float32,
    )
    f32 = score_all(pred_f32, probes)
    for k, (p, dt) in f32.items():
        print(f"  {k:12s} p(fake)={p:.6f}  ({dt:.2f} s)")

    deltas = {k: abs(bf16[k][0] - f32[k][0]) for k in probes}
    worst = max(deltas, key=deltas.get)
    print("\n— bf16-vs-f32 drift at trained logit scales —")
    for k in probes:
        print(f"  {k:12s} |Δp| = {deltas[k]:.3e}")
    print(f"  max |Δp| = {deltas[worst]:.3e} at {worst}; "
          f"mean = {np.mean(list(deltas.values())):.3e}")

    doses = sorted((float(k.split('_')[1]), k) for k in probes if k.startswith("dose"))
    curve = [f32[k][0] for _, k in doses]
    print("\n— artifact dose-response (f32) —")
    for (d, k), p in zip(doses, curve):
        print(f"  dose {d:4g}: p(fake) = {p:.6f}")
    mono = all(b >= a - 1e-6 for a, b in zip(curve, curve[1:]))
    print(f"  monotone non-decreasing: {mono}")


if __name__ == "__main__":
    main()
