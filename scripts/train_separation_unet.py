#!/usr/bin/env python
"""Train the flax SpleeterUNet separator on synthetic stem mixtures and
export weights in the production ``.npz`` loader format (VERDICT r4 item 3).

The real Spleeter checkpoint download is egress-blocked, so until now every
production LIME sweep used the weight-free DSP fallback separator and the
converted-UNet inference graph (`unet_separate`) had only run inside
tests/test_separation_unet.py. This script closes that: it trains the SAME
flax module (``SpleeterUNet(train=True)`` — Keras BN training semantics)
on synthetic vocals/drums/bass/other mixtures, saves per-stem ``.npz``
trees exactly as ``scripts/convert_spleeter.py`` would (so
``ADX_SPLEETER_WEIGHTS`` + ``load_spleeter_params`` + ``unet_separate``
— the full production path — serve the result), and reports SI-SNR vs the
fallback separator and the mixture-as-estimate floor on held-out mixtures.

Training recipe (Spleeter's own): per-stem L1 between the masked mixture
magnitude and the true stem magnitude on the 4096/1024 STFT's 1024 kept
bins; all four stems train in ONE vmapped program over stacked params.
Clips are sized to exactly 512 STFT frames so no time padding is needed.

Reference separation entry: src/lime_explainer.py:386-392.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

SR = 44100
N_FFT, HOP = 4096, 1024
T_FRAMES = 512
N_CLIP = (T_FRAMES - 1) * HOP  # center=True STFT: 1 + n//hop frames


def synth_stems(rng) -> dict:
    """One synthetic 4-stem clip: the stems the fallback separator (and
    Spleeter's taxonomy) assume — harmonic voice, percussive bursts, low
    bass, residual pad+noise."""
    n = N_CLIP
    t = np.arange(n) / SR

    f0 = rng.uniform(160.0, 360.0)
    vib = 1 + 0.013 * np.sin(2 * np.pi * rng.uniform(4.5, 6.5) * t)
    phase = 2 * np.pi * np.cumsum(f0 * vib) / SR
    vocals = sum((h ** -1.1) * np.sin(phase * h + rng.uniform(0, 6.28))
                 for h in range(1, 7))
    vocals *= 0.5 + 0.5 * np.clip(np.sin(2 * np.pi * rng.uniform(0.3, 0.8) * t), 0, 1)

    drums = np.zeros(n)
    step = int(SR * 60.0 / rng.uniform(90, 150))
    blen = int(0.05 * SR)
    env = np.exp(-np.linspace(0, 7, blen))
    for s in range(int(rng.integers(0, step)), n - blen, step):
        drums[s:s + blen] += env * rng.standard_normal(blen)
    # band-limit drums to 1.5-8 kHz (like real percussion brightness, and
    # spectrally distinct from other's chord/noise floor — full-band noise
    # bursts were mask-confusable with other's stationary noise and the
    # UNet's drums SI-SNR sat at ~0 dB)
    D = np.fft.rfft(drums)
    f = np.fft.rfftfreq(n, 1.0 / SR)
    D *= np.clip((f - 1000.0) / 500.0, 0, 1) * np.clip((9000.0 - f) / 1000.0, 0, 1)
    drums = np.fft.irfft(D, n)

    fb = rng.uniform(50.0, 95.0)
    bass = np.sin(2 * np.pi * fb * t) + 0.3 * np.sin(2 * np.pi * 2 * fb * t)
    bass *= 0.7 + 0.3 * np.sin(2 * np.pi * rng.uniform(0.1, 0.4) * t)

    chord = sum(np.sin(2 * np.pi * f * t + rng.uniform(0, 6.28))
                for f in (523.3, 659.3, 784.0))
    other = 0.5 * chord * (0.6 + 0.4 * np.sin(2 * np.pi * 0.25 * t)) \
        + 0.012 * rng.standard_normal(n)

    stems = {"vocals": vocals, "drums": drums, "bass": bass, "other": other}
    gains = {"vocals": 0.32, "drums": 0.25, "bass": 0.28, "other": 0.15}
    return {
        k: (gains[k] * v / (np.sqrt(np.mean(v ** 2)) + 1e-12)).astype(np.float32)
        for k, v in stems.items()
    }


def si_snr(est: np.ndarray, ref: np.ndarray) -> float:
    est = est - est.mean()
    ref = ref - ref.mean()
    s = (np.dot(est, ref) / (np.dot(ref, ref) + 1e-12)) * ref
    e = est - s
    return float(10 * np.log10((np.dot(s, s) + 1e-12) / (np.dot(e, e) + 1e-12)))


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--out", default="checkpoints/spleeter_unet_synth")
    ap.add_argument("--n-train", type=int, default=48)
    ap.add_argument("--n-val", type=int, default=4)
    # 2400 = the shipping budget that produced checkpoints/spleeter_unet_synth
    # and the BASELINE.md SI-SNR table (800 was the probe budget where drums
    # sat at -0.2 dB pre-normalization)
    ap.add_argument("--steps", type=int, default=2400)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--lr", type=float, default=1e-3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from adx_tpu.explainers.separation import (
        STEM_NAMES, SpleeterUNet, load_spleeter_params, mask_separate,
        unet_separate,
    )
    from adx_tpu.ops.stft import magphase, stft

    names = STEM_NAMES["spleeter:4stems"]

    print(f"Generating {args.n_train}+{args.n_val} synthetic 4-stem clips "
          f"({N_CLIP / SR:.1f}s each)…", flush=True)
    t0 = time.time()
    all_clips = [synth_stems(np.random.default_rng(1000 + i))
                 for i in range(args.n_train + args.n_val)]
    train_clips = all_clips[: args.n_train]
    val_clips = all_clips[args.n_train:]
    print(f"  {time.time() - t0:.1f} s", flush=True)

    # device-resident stem cache as int16 (one H2D; mixtures derived on
    # device as the exact stem sum)
    stems_np = np.stack([
        np.stack([c[n] for n in names]) for c in train_clips
    ])  # [N, 4, n]
    q = np.clip(np.round(stems_np * 32768.0), -32768, 32767).astype(np.int16)
    print(f"Uploading stem cache: {q.nbytes / 1e6:.0f} MB int16…", flush=True)
    stems_dev = jax.device_put(q)

    unet_train = SpleeterUNet(channels=1, deterministic=False, train=True)

    def mags_of(waves):  # [B, n] → [B, T, 1024, 1]
        S = stft(waves, n_fft=N_FFT, hop_length=HOP)
        mag, _ = magphase(S)
        return mag[:, : N_FFT // 4, :].transpose(0, 2, 1)[..., None]

    def init_stem(seed):
        x0 = jnp.zeros((1, T_FRAMES, N_FFT // 4, 1), jnp.float32)
        return unet_train.init(
            {"params": jax.random.key(seed), "dropout": jax.random.key(seed + 99)},
            x0,
        )

    params0 = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[init_stem(s) for s in range(len(names))]
    )
    tx = optax.adam(args.lr)
    opt0 = tx.init(params0["params"])

    def loss_fn(variables, mix_mag, stem_mags, rng):
        def one(v, target, key):
            mask, updates = unet_train.apply(
                v, mix_mag, rngs={"dropout": key}, mutable=["batch_stats"],
            )
            l1 = jnp.mean(jnp.abs(mask[..., 0] * mix_mag[..., 0] - target))
            # per-stem energy normalization: sparse/transient stems (drums)
            # contribute gradients comparable to dense harmonic stems —
            # raw L1 let drums under-train (SI-SNR −0.2 dB at 800 steps vs
            # +19.9 vocals)
            return l1 / (jnp.mean(target) + 1e-4), updates

        keys = jax.random.split(rng, len(names))
        losses, updates = jax.vmap(one)(variables, stem_mags, keys)
        return jnp.mean(losses), updates

    @jax.jit
    def train_step(variables, opt_state, stems_i16, idx, step):
        stems_f = stems_i16[idx].astype(jnp.float32) * (1.0 / 32768.0)  # [B,4,n]
        mix = jnp.sum(stems_f, axis=1)
        mix_mag = mags_of(mix)
        stem_mags = jnp.stack([
            mags_of(stems_f[:, s])[..., 0] for s in range(len(names))
        ])  # [4, B, T, 1024]
        rng = jax.random.fold_in(jax.random.key(0), step)
        (loss, updates), grads = jax.value_and_grad(
            lambda p: loss_fn({"params": p,
                               "batch_stats": variables["batch_stats"]},
                              mix_mag, stem_mags, rng),
            has_aux=True,
        )(variables["params"])
        upd, opt_state = tx.update(grads, opt_state)
        new_params = optax.apply_updates(variables["params"], upd)
        return (
            {"params": new_params, "batch_stats": updates["batch_stats"]},
            opt_state, loss,
        )

    variables = params0
    opt_state = opt0
    rng = np.random.default_rng(0)
    t0 = time.time()
    for step in range(args.steps):
        idx = rng.choice(args.n_train, args.batch_size, replace=False)
        variables, opt_state, loss = train_step(
            variables, opt_state, stems_dev, jnp.asarray(idx), step)
        if step % 50 == 0 or step == args.steps - 1:
            print(f"step {step:4d}  L1 {float(loss):.5f}  "
                  f"({time.time() - t0:.0f} s)", flush=True)

    # export per-stem npz in the converter's exact format
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    host_vars = jax.device_get(variables)
    for si, stem in enumerate(names):
        flat = {}
        for coll in ("params", "batch_stats"):
            leaves = jax.tree_util.tree_flatten_with_path(host_vars[coll])[0]
            for path, leaf in leaves:
                key = "/".join([coll] + [p.key for p in path])
                arr = np.asarray(leaf[si])
                # params ship f16 (halves the repo weight; the loader casts
                # back to f32); batch_stats stay f32 — BN variances of raw
                # STFT magnitudes exceed the f16 range (65504) and would
                # round to inf
                if coll == "params":
                    arr = arr.astype(np.float16)
                flat[key] = arr
        np.savez_compressed(out_dir / f"4stems_{stem}.npz", **flat)
    print(f"💾 {out_dir}/4stems_*.npz")

    # SI-SNR eval through the PRODUCTION loader + separation path
    params_loaded = load_spleeter_params(out_dir, "spleeter:4stems")
    assert params_loaded is not None, "loader failed on exported npz"
    print("\nSI-SNR on held-out mixtures (dB; higher is better):")
    print(f"{'stem':8s} {'unet':>8s} {'fallback':>9s} {'mixture':>8s}")
    agg = {n: [] for n in names}
    for clip in val_clips:
        mix = np.sum([clip[n] for n in names], axis=0).astype(np.float32)
        est_u = unet_separate(mix, SR, params_loaded, "spleeter:4stems")
        est_f = mask_separate(mix, SR, "spleeter:4stems")
        for n in names:
            agg[n].append((
                si_snr(np.asarray(est_u[f"{n}0"]), clip[n]),
                si_snr(np.asarray(est_f[f"{n}0"]), clip[n]),
                si_snr(mix, clip[n]),
            ))
    for n in names:
        u, f, m = np.mean(agg[n], axis=0)
        print(f"{n:8s} {u:8.2f} {f:9.2f} {m:8.2f}")


if __name__ == "__main__":
    main()
