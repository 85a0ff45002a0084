"""Data-prep tests: BS.1770 meter calibration, normalization control flow,
degradation arms, and the output taxonomy."""

import numpy as np
import pytest

from adx_tpu.dataprep.degrade import (
    degrade_add_noise,
    degrade_resample,
    degrade_reverb_synthetic,
)
from adx_tpu.dataprep.loudness import (
    apply_gain,
    integrated_lufs,
    normalize_to_lufs_with_tp,
    soft_limiter,
    tpdf_dither,
    true_peak_dbtp,
)

SR = 44100


def test_integrated_lufs_sine_calibration():
    """997 Hz sine at −23.01 dBFS RMS must read ≈ −23 LUFS (BS.1770
    calibration point: the −0.691 offset cancels the K-weighting gain at 1 kHz)."""
    t = np.arange(10 * SR) / SR
    y = 0.1 * np.sqrt(2) * np.sin(2 * np.pi * 997.0 * t)  # RMS 0.1 → −20 dBFS
    lufs = integrated_lufs(y, SR)
    assert lufs == pytest.approx(-20.0, abs=0.5)


def test_integrated_lufs_gain_linearity():
    rng = np.random.default_rng(0)
    y = 0.05 * rng.standard_normal(5 * SR)
    l0 = integrated_lufs(y, SR)
    l6 = integrated_lufs(apply_gain(y, 6.0), SR)
    assert l6 - l0 == pytest.approx(6.0, abs=0.1)


def test_integrated_lufs_gating_ignores_silence():
    """Appending silence must not change gated loudness much."""
    rng = np.random.default_rng(1)
    y = 0.1 * rng.standard_normal(5 * SR)
    l_only = integrated_lufs(y, SR)
    l_padded = integrated_lufs(np.concatenate([y, np.zeros(5 * SR)]), SR)
    assert abs(l_only - l_padded) < 0.5


def test_true_peak_exceeds_sample_peak_for_intersample():
    # inter-sample peak: tone near Nyquist sampled off-peak
    t = np.arange(SR) / SR
    y = 0.8 * np.sin(2 * np.pi * 11025.0 * t + 0.7)
    tp = true_peak_dbtp(y, SR, oversample=4)
    sample_peak = 20 * np.log10(np.max(np.abs(y)))
    assert tp >= sample_peak - 0.1


def test_soft_limiter_respects_ceiling():
    y = np.linspace(-2, 2, 1000)
    out = soft_limiter(y, ceiling_dbfs=-1.0)
    ceiling = 10 ** (-1.0 / 20.0)
    assert np.max(np.abs(out)) <= ceiling + 1e-9
    # below the knee the signal passes through
    small = soft_limiter(0.1 * np.ones(10), ceiling_dbfs=-1.0)
    np.testing.assert_allclose(small, 0.1)


def test_normalize_to_lufs_hits_target():
    rng = np.random.default_rng(2)
    y = 0.01 * rng.standard_normal(10 * SR)
    y_norm, info = normalize_to_lufs_with_tp(y, SR, target_lufs=-14.0)
    assert info["final_lufs"] == pytest.approx(-14.0, abs=0.7)
    assert info["final_true_peak_dbTP"] <= -1.0 + 0.3


def test_tpdf_dither_magnitude():
    y = np.zeros(10000)
    out = tpdf_dither(y, 16)
    q = 1.0 / 2**15
    assert np.max(np.abs(out)) <= q
    assert np.std(out) > 0
    np.testing.assert_array_equal(tpdf_dither(y, 32), y)  # unsupported depth = no-op


def test_degrade_resample_bandlimits():
    t = np.arange(2 * SR) / SR
    y = (0.3 * np.sin(2 * np.pi * 440 * t) + 0.3 * np.sin(2 * np.pi * 15000 * t)).astype(np.float32)
    y_deg, sr = degrade_resample(y, SR, down_sr=22050)
    assert sr == SR and len(y_deg) == len(y)
    spec = np.abs(np.fft.rfft(y_deg))
    freqs = np.fft.rfftfreq(len(y_deg), 1 / SR)
    hi = spec[freqs > 12000].max()
    lo = spec[np.abs(freqs - 440) < 5].max()
    assert hi < 0.01 * lo  # 15 kHz content removed by the 22.05 kHz round trip


def test_degrade_add_noise_snr():
    rng = np.random.default_rng(3)
    t = np.arange(2 * SR) / SR
    y = (0.3 * np.sin(2 * np.pi * 500 * t)).astype(np.float32)
    y_n = degrade_add_noise(y, snr_db=30, rng=rng)
    noise = y_n - y
    snr = 20 * np.log10(np.sqrt(np.mean(y**2)) / np.sqrt(np.mean(noise**2)))
    assert snr == pytest.approx(30.0, abs=1.0)


def test_degrade_reverb_adds_tail():
    y = np.zeros(SR, dtype=np.float32)
    y[1000] = 1.0  # impulse
    y_rv = degrade_reverb_synthetic(y, SR, rt60=0.6, mix=0.15)
    assert len(y_rv) == len(y)
    # energy after the impulse (the tail) must appear
    assert np.sum(y_rv[2000:] ** 2) > 1e-4
    # dry part preserved at (1-mix) scale plus wet onset
    assert y_rv[1000] == pytest.approx(0.85 + 0.15 * 1.0, abs=0.2)


def test_pipeline_output_taxonomy(tmp_path, rng):
    from adx_tpu.dataprep.pipeline import run_pipeline
    from adx_tpu.io.audio_io import write_wav

    src = tmp_path / "src" / "REAL"
    n = SR  # 1 s
    t = np.arange(n) / SR
    y = 0.2 * np.sin(2 * np.pi * 220 * t) + 0.01 * rng.standard_normal(n)
    write_wav(src / "song.wav", y.astype(np.float32), SR)

    out = tmp_path / "out"
    run_pipeline([str(tmp_path / "src")], out, arms=["resample22k", "noise_snr30"])

    for minus in ("minus14", "minus23"):
        for arm in ("base", "resample22k", "noise_snr30"):
            path = out / minus / arm / "REAL" / "song.wav"
            assert path.exists(), path
    assert (out / "pipeline_log.csv").exists()

    # run labels derived from these paths round-trip through the comparator
    from adx_tpu.viz.runs_compare import extract_run_label

    assert extract_run_label(str(out / "minus14" / "base" / "REAL" / "song.wav")) == "m14_base"
    assert (
        extract_run_label(str(out / "minus23" / "noise_snr30" / "REAL" / "song.wav"))
        == "m23_noise_snr30"
    )


def test_mp3_roundtrip_native_codec(rng):
    """mp3_192 arm on the in-process libmp3lame/libmpg123 codecs
    (notebook cell 7 degrade_mp3_roundtrip semantics: same sr, same
    length, lossy but aligned)."""
    from adx_tpu.dataprep.degrade import degrade_mp3_roundtrip
    from adx_tpu.io.mp3 import have_mp3

    if not have_mp3():
        pytest.skip("mp3 codec libraries not in this image")
    n = SR * 2
    t = np.arange(n) / SR
    y = (0.4 * np.sin(2 * np.pi * 330 * t)
         + 0.1 * rng.standard_normal(n)).astype(np.float32)
    y2 = degrade_mp3_roundtrip(y, SR, bitrate="192k")
    assert y2.shape == y.shape and y2.dtype == np.float32
    # gapless: no codec delay offset, high but imperfect correlation
    seg = slice(SR // 2, SR // 2 + 4096)
    corr = np.corrcoef(y2[seg], y[seg])[0, 1]
    assert corr > 0.98
    assert not np.allclose(y2, y)  # actually lossy, not the identity fallback
    # stereo keeps channel layout
    ys = np.stack([y, 0.5 * y])
    ys2 = degrade_mp3_roundtrip(ys, SR)
    assert ys2.shape == ys.shape


def test_mp3_roundtrip_bad_bitrate_degrades_gracefully(rng, capsys):
    """A non-'<int>k' bitrate spelling must fall through the warning chain
    (the notebook's graceful fallback), never raise out of the dataprep arm."""
    from adx_tpu.dataprep.degrade import degrade_mp3_roundtrip

    import shutil

    y = (0.1 * rng.standard_normal(SR)).astype(np.float32)
    y2 = degrade_mp3_roundtrip(y, SR, bitrate="192kbps")
    assert "Warning" in capsys.readouterr().out
    if shutil.which("ffmpeg") is None:
        np.testing.assert_array_equal(y2, y)  # identity fallback, not a crash
    else:  # an ffmpeg that tolerates the spelling may return lossy audio
        assert y2.shape == y.shape


def test_mp3_decode_corrupt_streams(rng):
    """decode_mp3 against hostile bytes: never crashes the process, raises
    ValueError on non-MP3 data, and — the regression — keeps the leading
    coherent stream when mpg123 resyncs onto a Frankenstein tail instead
    of relabeling all PCM with the garbage frames' rate/channels."""
    from adx_tpu.io.mp3 import decode_mp3, encode_mp3, have_mp3

    if not have_mp3():
        pytest.skip("mp3 codec libraries not in this image")
    sr = 44100
    y = (0.3 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)).astype(np.float32)
    blob = encode_mp3(y, sr, bitrate_kbps=128)
    clean, sr_c = decode_mp3(blob)
    assert sr_c == sr and clean.ndim == 1

    # valid stream + random tail: identical leading audio, same format
    out, sr_o = decode_mp3(blob + rng.bytes(10000))
    assert sr_o == sr and out.ndim == 1
    np.testing.assert_array_equal(out[: len(clean)], clean)
    assert abs(len(out) - len(clean)) < 4000  # no garbage-tail "audio"

    # non-MP3 data raises (never returns silence or segfaults)
    for data in (b"", rng.bytes(4096), b"ID3\x04\x00\x00\x00\x00\x00\x00",
                 bytes(64 * 1024)):
        with pytest.raises((ValueError, RuntimeError)):
            decode_mp3(data)

    # heavily bit-flipped stream: whatever decodes must still be at the
    # true rate (prefix recovery), or raise — never the wrong format
    flipped = bytes(b ^ 0xFF if i % 97 == 0 else b for i, b in enumerate(blob))
    try:
        o, s = decode_mp3(flipped)
        assert s == sr
    except (ValueError, RuntimeError):
        pass


def test_mp3_ingestion_load_audio(tmp_path, rng):
    """.mp3 files decode through load_audio without ffmpeg (reference
    ingests mp3 sources via librosa, analyzesongs.ipynb cell 7)."""
    from adx_tpu.io.audio_io import load_audio
    from adx_tpu.io.mp3 import encode_mp3, have_mp3

    if not have_mp3():
        pytest.skip("mp3 codec libraries not in this image")
    n = SR * 2
    t = np.arange(n) / SR
    y = (0.3 * np.sin(2 * np.pi * 523 * t)).astype(np.float32)
    p = tmp_path / "tone.mp3"
    p.write_bytes(encode_mp3(y, SR))
    out, sr = load_audio(p, sr=SR, duration=1.0)
    assert sr == SR and out.shape == (SR,)
    assert np.corrcoef(out[100:4196], y[100:4196])[0, 1] > 0.98


def test_pipeline_mp3_arm(tmp_path, rng):
    from adx_tpu.dataprep.pipeline import run_pipeline
    from adx_tpu.io.audio_io import read_wav, write_wav
    from adx_tpu.io.mp3 import have_mp3

    if not have_mp3():
        pytest.skip("mp3 codec libraries not in this image")
    src = tmp_path / "src" / "REAL"
    n = SR
    t = np.arange(n) / SR
    y = 0.2 * np.sin(2 * np.pi * 220 * t) + 0.01 * rng.standard_normal(n)
    write_wav(src / "song.wav", y.astype(np.float32), SR)
    out = tmp_path / "out"
    run_pipeline([str(tmp_path / "src")], out, arms=["mp3_192"])
    p = out / "minus14" / "mp3_192" / "REAL" / "song.wav"
    assert p.exists()
    base, _ = read_wav(out / "minus14" / "base" / "REAL" / "song.wav")
    deg, _ = read_wav(p)
    assert deg.shape == base.shape
    assert not np.allclose(deg, base)  # the arm did real codec work


def test_normalize_gated_input_passes_through(rng):
    """Digital silence integrates to -inf LUFS; the gain would be +inf and
    the reference writes NaN garbage — we pass the audio through unchanged
    (deviate where broken) and flag it."""
    from adx_tpu.dataprep.loudness import normalize_to_lufs_with_tp

    y = np.zeros(44100, np.float32)
    out, info = normalize_to_lufs_with_tp(y, 44100, target_lufs=-14.0)
    assert np.all(np.isfinite(out)) and np.array_equal(out, y)
    assert info["skipped_gated"] is True and info["desired_gain_db"] == 0.0
    # near-silence below the -70 LUFS absolute gate behaves the same
    y2 = (1e-7 * rng.standard_normal(44100)).astype(np.float32)
    out2, info2 = normalize_to_lufs_with_tp(y2, 44100, target_lufs=-14.0)
    assert np.all(np.isfinite(out2))


def test_fractional_lufs_targets_get_distinct_dirs(tmp_path, rng):
    """-16.2 and -16.8 must not both truncate to minus16/ (last writer
    wins); int targets keep the reference's minus14 naming."""
    from pathlib import Path

    from adx_tpu.dataprep.pipeline import process_file
    from adx_tpu.io.audio_io import write_wav

    d = tmp_path / "SUNO"
    d.mkdir()
    y = (0.2 * rng.standard_normal(44100)).astype(np.float32)
    write_wav(d / "t.wav", y, 44100)
    logs = process_file(d / "t.wav", tmp_path / "out", arms=[],
                        lufs_targets=[16.2, 16.8, 14])
    outs = {Path(l["output_path"]).parts[-4] for l in logs}
    assert outs == {"minus16.2", "minus16.8", "minus14"}, outs
