"""Hardware drive: device-side top-window export (keep_patch_audio_pcm16_slices).

Runs on the real TPU (plain python). Production shape: 120 s @ 44.1 kHz,
stft engine, 15 uniform patches (the best/worst/most_influential groups of a
real export are 3 x 5 rows). Checks the device slice+quantize path against
the old host path (full-track keep_patch_audio D2H -> host slice ->
pcm16_quantize) within 1 LSB, and times both warm.
"""
import sys
import time

import numpy as np

from adx_tpu.io.audio_io import pcm16_quantize
from adx_tpu.predict import LocalSonics
from adx_tpu.runtime.engine import cached_engine

SR, DUR = 44100, 120


def main():
    rng = np.random.default_rng(0)
    t = np.arange(SR * DUR) / SR
    y = (0.3 * np.sin(2 * np.pi * 440 * t)
         + 0.2 * np.sin(2 * np.pi * 1337 * t)
         + 0.05 * rng.standard_normal(SR * DUR)).astype(np.float32)

    pred = LocalSonics.from_pretrained("spectttra-alpha-120s")
    eng = cached_engine(pred, sr=SR, duration=DUR, n_fft=2048,
                        hop_length=512, win_length=2048, spec_type="stft")
    print("analyze...", flush=True)
    S, _ = eng.analyze(y)
    print("analyze done", flush=True)

    hop = eng.hop_length
    pf, pt = 256, 2048  # default occlusion patch (25% of 1025 bins, 2048 frames)
    n_time = int(S.shape[-1])
    t_starts = rng.integers(0, max(1, n_time - pt), 15)
    starts = np.asarray([(int(ts), int(rng.integers(0, 1025 - pf))) for ts in t_starts], np.int32)
    slice_starts = np.asarray([ts * hop for ts, _ in starts], np.int32)
    slice_len = pt * hop

    import time as _t
    print("compiling device slice path...", flush=True); _c0 = _t.perf_counter()
    # warm-up + timing: device path
    q = eng.keep_patch_audio_pcm16_slices(S, starts, pf, pt, len(y), slice_starts, slice_len)
    print(f"device path compiled+run1 in {_t.perf_counter()-_c0:.1f} s", flush=True)
    t0 = time.perf_counter()
    q = eng.keep_patch_audio_pcm16_slices(S, starts, pf, pt, len(y), slice_starts, slice_len)
    dev_s = time.perf_counter() - t0

    print("compiling host path...", flush=True); _c1 = _t.perf_counter()
    # old host path
    full = eng.keep_patch_audio(S, starts, pf, pt, len(y))
    print(f"host path compiled+run1 in {_t.perf_counter()-_c1:.1f} s", flush=True)
    t0 = time.perf_counter()
    full = eng.keep_patch_audio(S, starts, pf, pt, len(y))
    host_s = time.perf_counter() - t0

    worst = 0
    for k in range(len(starts)):
        s0 = int(slice_starts[k])
        host = pcm16_quantize(full[k][s0:s0 + slice_len])
        if len(host) < slice_len:
            host = np.pad(host, (0, slice_len - len(host)))
        worst = max(worst, int(np.max(np.abs(q[k].astype(np.int32) - host.astype(np.int32)))))

    dev_mb = q.nbytes / 1e6
    host_mb = full.nbytes / 1e6
    print(f"rows=15 slice_len={slice_len} worst_lsb={worst}")
    print(f"device path warm: {dev_s:.2f} s ({dev_mb:.1f} MB D2H)")
    print(f"host   path warm: {host_s:.2f} s ({host_mb:.1f} MB D2H)")
    if worst > 1:
        print("FAIL: device vs host > 1 LSB", file=sys.stderr)
        sys.exit(1)
    print("OK")


if __name__ == "__main__":
    main()
