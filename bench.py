#!/usr/bin/env python
"""Benchmark: full explanation (FBP + occlusion + LIME-style stem masking)
of one 120 s track on one chip.

The north-star target (BASELINE.json) is < 10 s p50 for occlusion + FBP +
LIME of a 120 s track on one TPU v5e chip; the reference runs the same
workload as serial per-mask Python loops over a CPU/remote predictor (no
published numbers — SURVEY.md §6).

Prints ONE JSON line:
  {"metric": "full_explain_latency_120s_track", "value": <p50 seconds>,
   "unit": "s", "vs_baseline": <10.0 / value>, ...details}

``vs_baseline`` > 1 means the 10 s north-star budget is beaten, and by how
much. Details carry the secondary metric (perturbation forwards/sec/chip)
and the per-stage split.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))

# Workload constants — the committed reference configuration
SR = 44100
DURATION = 120.0
N_FFT, HOP, WIN = 2048, 512, 2048
FBP_BANDS = [(20, 100), (100, 250), (250, 2000), (2000, 4000), (4000, 8000), (8000, 16000)]
OCC = dict(patch_time_frames=1024, stride_time_frames=1024,
           patch_freq_percent=20.0, stride_freq_percent=10.0)
LIME_SAMPLES = 500
LIME_STEMS = 4
REPEATS = 3


def main():
    import argparse

    ap = argparse.ArgumentParser(description="Full-explain benchmark (prints one JSON line)")
    ap.add_argument(
        "--profile", metavar="DIR", default=None,
        help="Capture a jax.profiler trace of one measured iteration into DIR",
    )
    ap.add_argument(
        "--lime-chunk", type=int, default=64,
        help="LIME stem-mix chunk size (per-dispatch batch)",
    )
    ap.add_argument(
        "--dtype", choices=("bf16", "f32"), default="bf16",
        help="Classifier compute dtype: bf16 = production serving mode "
        "(default), f32 = the fidelity mode parity_check.py uses "
        "(also forces HIGHEST matmul precision: TPU f32 dots are "
        "bf16-pass FAST by default and drift ~0.06 from CPU f32)",
    )
    ap.add_argument(
        "--checkpoint", metavar="DIR", default=None,
        help="Orbax/converted checkpoint dir for the classifier weights. "
        "Default: checkpoints/alpha120s/best when it exists (the committed "
        "trained flagship — VERDICT r4 item 1: bench the real model, not "
        "seeded-random weights), else random init with a stderr warning. "
        "Pass 'random' to force random init.",
    )
    ap.add_argument(
        "--tracks", type=int, default=1, metavar="T",
        help="Multi-track throughput mode: explain T distinct 120 s tracks "
        "per iteration through the engine's *_multi batched sweeps and "
        "report tracks/min/chip (VERDICT r2 item 3). Default 1 keeps the "
        "single-track latency metric the driver records.",
    )
    cli = ap.parse_args()

    import jax

    # Fail fast (not forever) when the accelerator pool is unreachable:
    # FIRST backend init blocks indefinitely during a pool outage (observed
    # live: 2 h+ of UNAVAILABLE on the axon tunnel). Run the init in a
    # watchdog thread so the driver records a clear failure instead of a
    # hang; a healthy boot (worst measured first-touch ~9 min) is unaffected.
    import os
    import threading

    init_done = threading.Event()
    init_err: list = []

    def _init_backend():
        try:
            jax.devices()
        except Exception as e:  # noqa: BLE001 — report any init failure
            init_err.append(e)
        finally:
            init_done.set()

    threading.Thread(target=_init_backend, daemon=True).start()
    budget_s = float(os.environ.get("ADX_BENCH_INIT_TIMEOUT_S", "2400"))
    if not init_done.wait(budget_s):
        print(
            f"bench: backend init did not complete within {budget_s:.0f} s "
            "(accelerator pool unreachable?) — aborting",
            file=sys.stderr,
        )
        os._exit(1)
    if init_err:
        print(f"bench: backend init failed: {init_err[0]}", file=sys.stderr)
        os._exit(1)

    if cli.dtype == "f32":
        from adx_tpu.predict import enable_fidelity_mode

        enable_fidelity_mode()

    from adx_tpu.ops import band_gain_matrix, fft_frequencies, occlusion_patch_grid
    from adx_tpu.ops.masks import lime_mask_batch
    from adx_tpu.predict import LocalSonics
    from adx_tpu.runtime.engine import PerturbationEngine

    t_setup = time.time()
    from adx_tpu.io.config import resolve_default_checkpoint

    ckpt_dir = resolve_default_checkpoint(cli.checkpoint, "spectttra-alpha-120s")
    predictor = LocalSonics.from_pretrained(
        "spectttra-alpha-120s", max_batch=8, checkpoint_dir=ckpt_dir,
        dtype=jax.numpy.bfloat16 if cli.dtype == "bf16" else jax.numpy.float32,
    )
    engine = PerturbationEngine(
        predictor, sr=SR, duration=DURATION, n_fft=N_FFT, hop_length=HOP,
        win_length=WIN, spec_type="stft", chunk=8, lime_chunk=cli.lime_chunk,
    )

    n = int(SR * DURATION)
    rng = np.random.default_rng(0)
    t = np.arange(n) / SR
    track = (
        0.3 * np.sin(2 * np.pi * 220 * t)
        + 0.2 * np.sin(2 * np.pi * 1320 * t)
        + 0.05 * rng.standard_normal(n)
    ).astype(np.float32)

    freqs = fft_frequencies(SR, N_FFT)
    gains = np.asarray(
        band_gain_matrix(freqs, FBP_BANDS, attenuation=0.25, transition_mode="rel",
                         transition_rel=0.2, transition_min_hz=5.0, transition_max_hz=500.0)
    )
    # synthetic 4-stem decomposition for the LIME stage (separation itself is
    # benchmarked separately once the UNet weights are converted)
    stems = np.stack([track * w for w in (0.4, 0.3, 0.2, 0.1)]).astype(np.float32)
    lime_rows = lime_mask_batch(jax.random.key(0), LIME_SAMPLES, LIME_STEMS)

    # one-time H2D: the track and stems stay device-resident across stages
    # (a 21 MB transfer per stage otherwise dominates the short stages).
    # Multi-track mode never calls full_explain, so skip its ~105 MB of
    # single-track buffers there (the tunnel moves ~15-22 MB/s — that
    # transfer would inflate setup_s by seconds and squat on HBM).
    import jax.numpy as jnp

    T = max(1, cli.tracks)
    if T == 1:
        track = jnp.asarray(track)
        stems = jnp.asarray(stems)
        track.block_until_ready()
    if T > 1:
        # T distinct tracks (different fundamentals) + per-track stems,
        # device-resident once, like the single-track path
        waves = []
        for k in range(T):
            w = (
                0.3 * np.sin(2 * np.pi * (220 + 30 * k) * t)
                + 0.2 * np.sin(2 * np.pi * (1320 + 60 * k) * t)
                + 0.05 * rng.standard_normal(n)
            ).astype(np.float32)
            waves.append(w)
        tracks_d = jnp.asarray(np.stack(waves))
        stems_d = jnp.asarray(
            np.stack([
                np.stack([w * f for f in (0.4, 0.3, 0.2, 0.1)]) for w in waves
            ]).astype(np.float32)
        )
        tracks_d.block_until_ready()

    setup_s = time.time() - t_setup

    def full_explain():
        stage = {}
        t0 = time.time()
        # spectrogram + baseline forward fused into one dispatch; S and S_db
        # stay device-resident
        S, _S_db, base = engine.analyze_and_baseline(track)
        stage["analyze_baseline"] = time.time() - t0

        t0 = time.time()
        engine.fbp_probs(S, track, gains, normalize_loudness=False)
        stage["fbp"] = time.time() - t0

        t0 = time.time()
        starts, pf, pt = occlusion_patch_grid(
            N_FFT // 2 + 1, S.shape[-1], OCC["patch_time_frames"],
            OCC["stride_time_frames"], OCC["patch_freq_percent"], OCC["stride_freq_percent"],
        )
        engine.occlusion_probs(S, starts, pf, pt, 0.0, n)
        stage["occlusion"] = time.time() - t0
        stage["n_patches"] = len(starts)

        t0 = time.time()
        engine.stem_mix_probs(stems, lime_rows)
        stage["lime"] = time.time() - t0
        del base
        return stage

    def full_explain_multi():
        """All four sweep stages over T tracks via the engine's batched
        multi-track programs (track axis folded into the perturbation
        batch — runtime/engine.py multi-track API)."""
        stage = {}
        t0 = time.time()
        S_stack, _Sdb, _base = engine.analyze_and_baseline_multi(tracks_d)
        stage["analyze_baseline"] = time.time() - t0

        t0 = time.time()
        engine.fbp_probs_multi(S_stack, tracks_d, gains, normalize_loudness=False)
        stage["fbp"] = time.time() - t0

        t0 = time.time()
        starts, pf, pt = occlusion_patch_grid(
            N_FFT // 2 + 1, S_stack.shape[-1], OCC["patch_time_frames"],
            OCC["stride_time_frames"], OCC["patch_freq_percent"],
            OCC["stride_freq_percent"],
        )
        engine.occlusion_probs_multi(S_stack, starts, pf, pt, 0.0, n)
        stage["occlusion"] = time.time() - t0
        stage["n_patches"] = len(starts)

        t0 = time.time()
        engine.stem_mix_probs_multi(stems_d, [lime_rows] * T)
        stage["lime"] = time.time() - t0
        return stage

    if T > 1:
        t0 = time.time()
        warm = full_explain_multi()
        compile_s = time.time() - t0
        if cli.profile:
            with jax.profiler.trace(cli.profile):
                full_explain_multi()
            print(f"# profiler trace written to {cli.profile}",
                  file=sys.stderr, flush=True)
        times = []
        for _ in range(REPEATS):
            t0 = time.time()
            stages = full_explain_multi()
            times.append(time.time() - t0)
        p50 = float(np.percentile(times, 50))
        lime_unique = int(len(np.unique(np.asarray(lime_rows), axis=0)))
        n_forwards = T * (1 + len(FBP_BANDS) + warm["n_patches"] + lime_unique)
        print(
            json.dumps(
                {
                    "metric": "multi_track_explain_throughput",
                    "value": round(T / p50 * 60.0, 2),
                    "unit": "tracks/min/chip",
                    # single-track p50 baseline is 0.593 s ⇒ 101 tracks/min
                    "vs_baseline": round((T / p50 * 60.0) / (60.0 / 0.593), 3),
                    "details": {
                        "device": str(jax.devices()[0]),
                        "n_tracks": T,
                        "p50_batch_s": round(p50, 3),
                        "per_track_s": round(p50 / T, 3),
                        "perturbation_forwards_per_sec_per_chip": round(n_forwards / p50, 1),
                        "stages_s": {k: round(v, 3) for k, v in stages.items() if k != "n_patches"},
                        "warmup_compile_s": round(compile_s, 1),
                        "setup_s": round(setup_s, 1),
                        "runs": [round(x, 3) for x in times],
                    },
                }
            )
        )
        return

    # warm-up (compiles every program once; cached for later runs)
    t0 = time.time()
    warm = full_explain()
    compile_s = time.time() - t0

    if cli.profile:
        with jax.profiler.trace(cli.profile):
            full_explain()
        # stderr: stdout must stay ONE JSON line (driver contract)
        print(f"# profiler trace written to {cli.profile}",
              file=sys.stderr, flush=True)

    times = []
    for _ in range(REPEATS):
        t0 = time.time()
        stages = full_explain()
        times.append(time.time() - t0)

    p50 = float(np.percentile(times, 50))
    # the engine dedups LIME's 500-row design matrix to its ≤2^S unique
    # mask rows before forwarding — count what actually runs
    lime_unique = int(len(np.unique(np.asarray(lime_rows), axis=0)))
    n_forwards = 1 + len(FBP_BANDS) + warm["n_patches"] + lime_unique
    forwards_per_sec = n_forwards / p50

    # ---- MFU / roofline (VERDICT r1 #10) --------------------------------
    # Analytic per-forward encoder FLOPs (model forwards only — the
    # dominant compute; resynthesis/frontend excluded, so MFU is a floor):
    # per layer 2·(4·S·d² + S²·d + S·d·d_ff·... ) with FLOPs = 2·MACs.
    cfg = predictor.cfg
    S_tok = cfg.n_tokens
    d = cfg.model.embed_dim
    d_ff = int(cfg.model.embed_dim * cfg.model.mlp_ratio)
    L = cfg.model.num_layers
    macs_per_layer = 4 * S_tok * d * d + 2 * S_tok * S_tok * d + 2 * S_tok * d * d_ff
    flops_fwd = 2 * macs_per_layer * L  # one un-batched forward
    peak_tflops = 197.0  # TPU v5e bf16 peak (MXU)
    total_model_tflops = n_forwards * flops_fwd / 1e12
    mfu_pct = 100.0 * total_model_tflops / (p50 * peak_tflops)
    stage_forwards = {
        "analyze_baseline": 1,
        "fbp": len(FBP_BANDS),
        "occlusion": warm["n_patches"],
        "lime": lime_unique,
    }
    stage_mfu = {
        k: round(100.0 * nf * flops_fwd / 1e12 / (stages[k] * peak_tflops), 1)
        for k, nf in stage_forwards.items()
        if stages.get(k)
    }

    print(
        json.dumps(
            {
                "metric": "full_explain_latency_120s_track",
                "value": round(p50, 3),
                "unit": "s",
                "vs_baseline": round(10.0 / p50, 3),
                "details": {
                    "device": str(jax.devices()[0]),
                    "perturbation_forwards_per_sec_per_chip": round(forwards_per_sec, 1),
                    "n_perturbation_forwards": n_forwards,
                    "lime_logical_samples": LIME_SAMPLES,
                    "lime_unique_mixes": lime_unique,
                    "stages_s": {k: round(v, 3) for k, v in stages.items() if k != "n_patches"},
                    "n_occlusion_patches": warm["n_patches"],
                    "warmup_compile_s": round(compile_s, 1),
                    "setup_s": round(setup_s, 1),
                    "runs": [round(x, 3) for x in times],
                    "mfu_pct": round(mfu_pct, 1),
                    "stage_mfu_pct": stage_mfu,
                    "model_tflops_per_forward": round(flops_fwd / 1e12, 4),
                    "peak_tflops_bf16_assumed": peak_tflops,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
