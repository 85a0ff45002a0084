"""Predictor + PerturbationEngine tests on the tiny model (CPU mesh).

Checks the batched engine against the reference's serial semantics: each
batched probability must equal what a one-at-a-time perturb→invert→predict
loop produces (SURVEY.md §7.1's core equivalence claim).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adx_tpu.ops import (
    band_gain_matrix,
    fft_frequencies,
    istft,
    magphase,
    occlusion_patch_grid,
    stft,
)
from adx_tpu.predict import LocalSonics
from adx_tpu.runtime.engine import PerturbationEngine


SR = 8000  # analysis rate == tiny model rate (keeps the test fast)


@pytest.fixture(scope="module")
def predictor():
    return LocalSonics.from_pretrained("tiny", max_batch=4)


@pytest.fixture(scope="module")
def engine(predictor):
    return PerturbationEngine(
        predictor, sr=SR, duration=predictor.cfg.audio.duration,
        n_fft=256, hop_length=128, win_length=256, spec_type="stft", chunk=4,
    )


@pytest.fixture(scope="module")
def track(predictor):
    rng = np.random.default_rng(0)
    n = predictor.cfg.audio.n_samples
    t = np.arange(n) / SR
    return (0.4 * np.sin(2 * np.pi * 440 * t) + 0.1 * rng.standard_normal(n)).astype(
        np.float32
    )


def test_predict_batch_matches_predict(predictor, track):
    waves = np.stack([track, 0.5 * track, track[::-1].copy()])
    batch = predictor.predict_batch(waves, SR)
    singles = [predictor.predict(w, SR) for w in waves]
    np.testing.assert_allclose(batch, singles, atol=1e-5)
    assert np.all((batch >= 0) & (batch <= 1))


def test_predict_resamples_other_rates(predictor, track):
    # same content at 2x rate should give a similar probability
    up = np.repeat(track, 2)  # crude 2x; fine for a smoke check
    p1 = predictor.predict(track, SR)
    p2 = predictor.predict(up, SR * 2)
    assert abs(p1 - p2) < 0.2


def test_occlusion_patch_larger_than_spectrogram(engine, track):
    """A patch wider than the time axis (the reference truncates it with
    t_end = min(t_start + t_patch, n_time), e.g. a 10 s clip at the default
    2048-frame patch) must clamp to ONE full-span patch, not crash the
    fixed-size dynamic_slice at trace time."""
    from adx_tpu.ops import occlusion_patch_grid

    S, _ = engine.analyze(track)
    F, T = int(S.shape[-2]), int(S.shape[-1])
    starts, pf, pt = occlusion_patch_grid(F, T, 10 * T, 10 * T, 50.0, 50.0)
    assert pt == T  # clamped to the axis
    assert pf <= F
    probs = engine.occlusion_probs(S, starts, pf, pt, 0.0, len(track))
    assert probs.shape == (len(starts),)
    assert np.isfinite(probs).all()
    assert np.all((probs >= 0) & (probs <= 1))


def test_fbp_probs_match_serial_loop(engine, predictor, track):
    """Batched FBP == serial mask→istft→predict loop, band by band."""
    S, S_db = engine.analyze(track)
    freqs = fft_frequencies(SR, 256)
    bands = [(100, 500), (500, 1500), (1500, 3000)]
    gains = np.asarray(
        band_gain_matrix(freqs, bands, attenuation=0.25, transition_mode="abs", transition_hz=50.0)
    )
    batched = engine.fbp_probs(S, track, gains, normalize_loudness=True)

    # serial reference path
    S_host_mag, S_host_phase = magphase(S)
    serial = []
    for g in gains:
        S_p = (jnp.asarray(g)[:, None] * S_host_mag) * S_host_phase
        y_p = istft(S_p, hop_length=128, win_length=256, n_fft=256, length=len(track))
        from adx_tpu.ops.audio import match_rms

        y_p = match_rms(jnp.asarray(track), y_p)
        serial.append(predictor.predict(np.asarray(y_p), SR))
    np.testing.assert_allclose(batched, serial, atol=1e-4)


def test_occlusion_probs_match_serial_loop(engine, predictor, track):
    S, _ = engine.analyze(track)
    n_freq, n_time = S.shape
    starts, patch_f, patch_t = occlusion_patch_grid(
        n_freq, n_time, patch_time_frames=8, stride_time_frames=8,
        patch_freq_percent=50.0, stride_freq_percent=50.0,
    )
    batched = engine.occlusion_probs(S, starts, patch_f, patch_t, 0.0, len(track))
    assert len(batched) == len(starts)

    S_np = np.array(jnp.stack([jnp.real(S), jnp.imag(S)]))  # complex→host via floats
    S_c = S_np[0] + 1j * S_np[1]
    serial = []
    for t0, f0 in starts[:5]:
        S_occ = S_c.copy()
        S_occ[f0 : f0 + patch_f, t0 : t0 + patch_t] = 0.0
        y_occ = istft(
            jnp.asarray(S_occ.astype(np.complex64)), hop_length=128,
            win_length=256, n_fft=256, length=len(track),
        )
        serial.append(predictor.predict(np.asarray(y_occ), SR))
    np.testing.assert_allclose(batched[:5], serial, atol=1e-4)


def test_rise_map_shapes_and_range(engine, track):
    S, _ = engine.analyze(track)
    probs, imp = engine.rise_map(S, n_masks=10, mask_probability=0.5, n_out=len(track))
    assert probs.shape == (10,)
    assert imp.shape == S.shape
    assert np.all((probs >= 0) & (probs <= 1))
    # Σ mask·p is bounded by Σ p
    assert imp.max() <= probs.sum() + 1e-5


def test_stem_mix_probs_match_manual(engine, predictor, track):
    n = len(track)
    rng = np.random.default_rng(2)
    stems = np.stack([track * 0.5, rng.standard_normal(n).astype(np.float32) * 0.05])
    rows = np.array([[1, 1], [1, 0], [0, 1], [0, 0]], np.float32)
    got = engine.stem_mix_probs(stems, rows)
    want = [predictor.predict(rows[i] @ stems, SR) for i in range(4)]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_stem_mix_probs_dedups_duplicate_rows(engine, predictor, track):
    """A mix is a deterministic function of its mask row, so the engine must
    forward only the unique rows (≤2^S of them) and scatter the probs back
    to the full LIME design matrix — exact values, ~31x fewer forwards."""
    n = len(track)
    rng = np.random.default_rng(3)
    stems = np.stack([track * 0.5, rng.standard_normal(n).astype(np.float32) * 0.05])
    uniq = np.array([[1, 1], [1, 0], [0, 1], [0, 0]], np.float32)
    idx = rng.integers(0, 4, size=37)
    before = engine.profiler.counters.get("perturbation_forwards", 0)
    got = engine.stem_mix_probs(stems, uniq[idx])
    after = engine.profiler.counters.get("perturbation_forwards", 0)
    assert after - before <= 4
    ref = engine.stem_mix_probs(stems, uniq)
    np.testing.assert_array_equal(got, ref[idx])


def test_to_device_wave_pcm16_exact(engine, track):
    """PCM16-representable floats ship as int16 and dequantize to the
    IDENTICAL float32 values; anything else takes the float path."""
    y16 = (np.clip(np.round(track * 32768.0), -32768, 32767) / 32768.0).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(engine.to_device_wave(y16)), y16)
    np.testing.assert_array_equal(np.asarray(engine.to_device_wave(track)), track)
    # the analyze funnel must produce the same spectrogram either way
    _, db_a = engine.analyze(y16)
    import jax.numpy as jnp

    _, db_b = engine.analyze(jnp.asarray(y16))
    np.testing.assert_array_equal(np.asarray(db_a), np.asarray(db_b))


def test_synthesize_masked_pcm16_matches_float_path(engine, track):
    """The device-side peak-norm + int16 quantization must reproduce the
    host float path + WAV-writer formula (±1 LSB for reduction-order)."""
    S, _ = engine.analyze(track)
    F = S.shape[0]
    rng = np.random.default_rng(5)
    rows = np.stack([np.ones(F, np.float32), rng.uniform(0, 1, F).astype(np.float32)])
    y = engine.synthesize_masked(S, rows, n_out=len(track))
    peak = np.max(np.abs(y), axis=-1, keepdims=True)
    y_norm = np.where(peak > 0, y * 0.99 / peak, y)
    want = np.clip(np.round(y_norm * 32768.0), -32768, 32767).astype(np.int16)
    got = engine.synthesize_masked_pcm16(S, rows, n_out=len(track))
    assert got.dtype == np.int16
    np.testing.assert_allclose(got, want, atol=1)


def test_rise_scan_equals_chunked_remainder_path(engine, track):
    """The scan path (full chunks) and the exact-size remainder path must
    produce the same stream: n_masks=chunk*k exercises scan only; adding a
    remainder must keep the first chunk*k probs identical."""
    import jax

    S, _ = engine.analyze(track)
    key = jax.random.key(42)
    p_full, imp_full = engine.rise_map(S, n_masks=8, mask_probability=0.5,
                                       n_out=len(track), key=key)
    p_more, imp_more = engine.rise_map(S, n_masks=10, mask_probability=0.5,
                                       n_out=len(track), key=key)
    np.testing.assert_allclose(p_more[:8], p_full, atol=1e-6)
    # the extra 2 masks only ADD to the accumulated map
    assert imp_more.sum() >= imp_full.sum() - 1e-3


def test_profiler_counts_forwards(engine):
    assert engine.profiler.counters.get("perturbation_forwards", 0) > 0


def test_occlusion_mel_split_path_matches_serial(predictor, track):
    """The single-device mel sweep (split synth→forward dispatches — the
    fused program exhausted v5e HBM at 120 s scale) must match per-patch
    serial synthesis + prediction."""
    import jax

    from adx_tpu.parallel.mesh import perturbation_mesh

    single = LocalSonics.from_pretrained(
        "tiny", max_batch=4, mesh=perturbation_mesh(jax.devices()[:1])
    )
    single.params = jax.device_put(
        jax.tree_util.tree_map(np.asarray, predictor.params)
    )
    eng1 = PerturbationEngine(
        single, sr=SR, duration=single.cfg.audio.duration,
        n_fft=256, hop_length=128, win_length=256, spec_type="mel",
        n_mels=16, n_iter=2, chunk=4,
    )
    assert eng1.n_devices == 1
    S, _ = eng1.analyze(track)
    starts = np.array([[0, 0], [2, 4], [5, 8]], np.int32)
    got = eng1.occlusion_probs(S, starts, 4, 3, 0.0, len(track))
    # reference: the original FUSED one-program sweep at the same chunk
    # width (Griffin-Lim's phase init depends on the batch layout, so
    # equivalence only holds chunk-for-chunk, not per-patch)
    import jax.numpy as jnp

    from adx_tpu.parallel.mesh import pad_batch

    padded, nn = pad_batch(starts, 4)
    fused = eng1._occlusion_all(
        S, jnp.asarray(padded), 4, 3, jnp.float32(0.0), len(track), 4
    )
    np.testing.assert_allclose(got, np.asarray(fused)[:nn], atol=1e-5)

    # RISE mel split path: probs must equal the fused scan's stream when
    # the chunk sizes coincide (same fold_in(key, chunk_id) mask draws)
    k = jax.random.key(7)
    p_split, imp_split = eng1.rise_map(S, n_masks=8, mask_probability=0.5,
                                       n_out=len(track), key=k)
    ids = jnp.arange(2, dtype=jnp.int32)
    p_scan, imp_scan = eng1._rise_scan(
        S, k, ids, jnp.ones((2,), jnp.float32), jnp.float32(0.5), 4, len(track)
    )
    np.testing.assert_allclose(p_split, np.asarray(p_scan), atol=1e-5)
    np.testing.assert_allclose(imp_split, np.asarray(imp_scan), atol=1e-4)


def test_mesh_size_invariance(predictor, engine, track):
    """Sharded sweeps (8-device mesh, the default here) must equal the
    single-device path: DP over the mask axis is a layout choice, not a
    numerics choice (SURVEY.md §2.6)."""
    from adx_tpu.parallel.mesh import perturbation_mesh

    single = LocalSonics.from_pretrained(
        "tiny", max_batch=4, mesh=perturbation_mesh(jax.devices()[:1])
    )
    # same random init on both predictors
    single.params = jax.device_put(
        jax.tree_util.tree_map(np.asarray, predictor.params)
    )
    eng1 = PerturbationEngine(
        single, sr=SR, duration=single.cfg.audio.duration,
        n_fft=256, hop_length=128, win_length=256, spec_type="stft", chunk=4,
    )

    S, _, base8 = engine.analyze_and_baseline(track)
    S1, _, base1 = eng1.analyze_and_baseline(track)
    assert base8 == pytest.approx(base1, abs=1e-5)

    n_freq, n_time = S.shape
    starts, pf, pt = occlusion_patch_grid(n_freq, n_time, 8, 8, 50.0, 50.0)
    p8 = np.asarray(engine.occlusion_probs(S, starts, pf, pt, 0.0, len(track)))
    p1 = np.asarray(eng1.occlusion_probs(S1, starts, pf, pt, 0.0, len(track)))
    np.testing.assert_allclose(p8, p1, atol=1e-5)

    stems = np.stack([track * w for w in (0.4, 0.3, 0.2, 0.1)]).astype(np.float32)
    rows = np.array(
        [[1, 1, 1, 1], [1, 0, 1, 0], [0, 1, 0, 1], [1, 1, 0, 0], [0, 0, 1, 1]],
        np.float32,
    )
    m8 = np.asarray(engine.stem_mix_probs(stems, rows))
    m1 = np.asarray(eng1.stem_mix_probs(stems, rows))
    np.testing.assert_allclose(m8, m1, atol=1e-5)


def test_occlusion_chunk_invariance(predictor, engine, track):
    """Explicit occlusion_chunk settings change performance only, never
    results (the final chunk is zero-padded, padded rows are discarded)."""
    S, _, _ = engine.analyze_and_baseline(track)
    n_freq, n_time = S.shape
    starts, pf, pt = occlusion_patch_grid(n_freq, n_time, 8, 8, 50.0, 50.0)
    ref = np.asarray(engine.occlusion_probs(S, starts, pf, pt, 0.0, len(track)))
    for ck in (1, 5, 96):
        eng = PerturbationEngine(
            predictor, sr=SR, duration=predictor.cfg.audio.duration,
            n_fft=256, hop_length=128, win_length=256, spec_type="stft",
            chunk=4, occlusion_chunk=ck,
        )
        S2, _, _ = eng.analyze_and_baseline(track)
        got = np.asarray(eng.occlusion_probs(S2, starts, pf, pt, 0.0, len(track)))
        np.testing.assert_allclose(got, ref, atol=1e-5, err_msg=f"occlusion_chunk={ck}")


def test_rise_mesh_size_invariance(predictor, engine, track):
    """Sharded RISE (keys split over the mesh, psum'd map) reproduces the
    1-device scan exactly: chunk ids are global, padding chunks weigh 0."""
    import jax

    from adx_tpu.parallel.mesh import perturbation_mesh
    from adx_tpu.predict import LocalSonics
    from adx_tpu.runtime.engine import PerturbationEngine

    params = jax.device_get(predictor.params)
    single = LocalSonics(
        predictor.cfg, params,
        mesh=perturbation_mesh(jax.devices()[:1]), max_batch=4,
    )
    eng1 = PerturbationEngine(
        single, sr=SR, duration=predictor.cfg.audio.duration,
        n_fft=256, hop_length=128, win_length=256, spec_type="stft", chunk=4,
    )
    assert engine.n_devices > 1 and eng1.n_devices == 1

    key = jax.random.key(7)
    S, _ = engine.analyze(track)
    S1, _ = eng1.analyze(track)
    p8, i8 = engine.rise_map(S, n_masks=10, mask_probability=0.5,
                             n_out=len(track), key=key)
    p1, i1 = eng1.rise_map(S1, n_masks=10, mask_probability=0.5,
                           n_out=len(track), key=key)
    np.testing.assert_allclose(p8, p1, atol=1e-5)
    np.testing.assert_allclose(i8, i1, atol=1e-4)


@pytest.mark.parametrize("sr_analysis", [SR, 12000, 16000])
def test_occlusion_hoist_matches_wave_path(predictor, track, sr_analysis):
    """The frontend-hoisted occlusion (windowed delta resample + mel column
    splice) equals the full resynth+forward path — same-rate, the
    up/down = 2/3 config, AND the reduced down=2 config whose tiny
    down-blocks used to truncate the polyphase ring-out (the window margin
    is now sized by the filter half-width, not by `down`)."""
    import jax

    from adx_tpu.ops.masks import occlusion_patch_grid
    from adx_tpu.runtime.engine import PerturbationEngine

    if sr_analysis == SR:
        y = track
    else:
        n = int(predictor.cfg.audio.duration * sr_analysis)
        t = np.arange(n) / sr_analysis
        y = (0.4 * np.sin(2 * np.pi * 440 * t)
             + 0.1 * np.random.default_rng(0).standard_normal(n)).astype(np.float32)

    kw = dict(sr=sr_analysis, duration=predictor.cfg.audio.duration,
              n_fft=256, hop_length=128, win_length=256, spec_type="stft", chunk=4)
    eng_h = PerturbationEngine(predictor, occlusion_frontend_hoist=True, **kw)
    eng_w = PerturbationEngine(predictor, occlusion_frontend_hoist=False, **kw)

    S, _ = eng_h.analyze(y)
    starts, pf, pt = occlusion_patch_grid(S.shape[-2], S.shape[-1], 8, 6, 40.0, 30.0)
    # include the first patch (t0=0, start-edge clipping) and last rows
    p_h = eng_h.occlusion_probs(S, starts, pf, pt, 0.0, len(y))
    p_w = eng_w.occlusion_probs(S, starts, pf, pt, 0.0, len(y))
    np.testing.assert_allclose(p_h, p_w, atol=2e-5)


def test_cached_engine_normalizes_kwarg_subsets(predictor):
    """ADVICE r2: callers passing semantically identical configs with
    different kwarg subsets (one spelling defaults explicitly, one omitting
    them) must share ONE engine — duplicate engines re-trace every sweep
    program. Unknown kwargs must fail loudly instead of silently keying."""
    from adx_tpu.runtime.engine import cached_engine
    from adx_tpu.runtime.profiler import TimeAggregator

    base = dict(sr=SR, duration=predictor.cfg.audio.duration,
                n_fft=256, hop_length=128, win_length=256, chunk=4)
    e1 = cached_engine(predictor, **base)
    # same config, defaults spelled out + different key order
    e2 = cached_engine(
        predictor, spec_type="stft", n_mels=128, n_iter=256,
        fmax=None, lime_chunk=64, **base,
    )
    assert e1 is e2
    # fmax=None resolves to sr/2 — identical either way
    e3 = cached_engine(predictor, fmax=SR // 2, **base)
    assert e3 is e1
    # a REAL config difference still builds a new engine
    e4 = cached_engine(predictor, spec_type="mel", n_iter=2, n_mels=16, **base)
    assert e4 is not e1
    # profiler is rebound, never part of the key
    prof = TimeAggregator()
    e5 = cached_engine(predictor, profiler=prof, **base)
    assert e5 is e1 and e5.profiler is prof
    with pytest.raises(TypeError):
        cached_engine(predictor, not_a_real_kwarg=3, **base)


def test_mel_gl_synth_dtype_paths_agree(predictor, track):
    """The matmul Griffin-Lim mel path (default bf16) must agree with the
    FFT-pair loop: f32 matmul ≈ fft within float tolerance; bf16 within a
    loose probability tolerance (phase renormalizes per iteration)."""
    def make(gl):
        return PerturbationEngine(
            predictor, sr=SR, duration=predictor.cfg.audio.duration,
            n_fft=256, hop_length=128, win_length=256, spec_type="mel",
            n_mels=16, n_iter=4, chunk=4, gl_synth_dtype=gl,
        )

    e_fft, e_f32, e_bf = make("fft"), make("float32"), make("bfloat16")
    S, _ = e_fft.analyze(track)
    starts = np.array([[0, 0], [2, 4], [5, 8]], np.int32)
    p_fft = e_fft.occlusion_probs(S, starts, 4, 3, 0.0, len(track))
    p_f32 = e_f32.occlusion_probs(S, starts, 4, 3, 0.0, len(track))
    p_bf = e_bf.occlusion_probs(S, starts, 4, 3, 0.0, len(track))
    np.testing.assert_allclose(p_f32, p_fft, atol=2e-3)
    assert np.all(np.isfinite(p_bf))
    np.testing.assert_allclose(p_bf, p_fft, atol=0.08)


# ---------------------------------------------------------------------------
# multi-track batching (VERDICT r2 item 3): fold [T] tracks into the batch
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tracks(predictor):
    rng = np.random.default_rng(7)
    n = predictor.cfg.audio.n_samples
    t = np.arange(n) / SR
    return [
        (0.4 * np.sin(2 * np.pi * f * t)
         + 0.05 * rng.standard_normal(n)).astype(np.float32)
        for f in (220.0, 440.0, 587.0)
    ]


def test_analyze_baseline_multi_matches_single(engine, tracks):
    S_m, Sdb_m, probs_m = engine.analyze_and_baseline_multi(tracks)
    for t, y in enumerate(tracks):
        S, Sdb, prob = engine.analyze_and_baseline(y)
        np.testing.assert_allclose(np.asarray(S_m[t]), np.asarray(S), atol=1e-4)
        # per-track ref=max dB must be preserved (not a coupled global max)
        np.testing.assert_allclose(np.asarray(Sdb_m[t]), np.asarray(Sdb), atol=1e-3)
        assert abs(probs_m[t] - prob) < 1e-5


def test_analyze_baseline_multi_track_batched(engine, tracks):
    # track_batch 2 over 3 tracks exercises the HBM-bounded group path
    # (incl. the repeated-tail padding) — must equal the one-dispatch result
    S_m, Sdb_m, probs_m = engine.analyze_and_baseline_multi(tracks)
    S_b, Sdb_b, probs_b = engine.analyze_and_baseline_multi(tracks, track_batch=2)
    np.testing.assert_allclose(np.asarray(S_b), np.asarray(S_m), atol=1e-5)
    np.testing.assert_allclose(np.asarray(Sdb_b), np.asarray(Sdb_m), atol=1e-5)
    np.testing.assert_allclose(probs_b, probs_m, atol=1e-6)


def test_fbp_probs_multi_matches_single(engine, tracks):
    from adx_tpu.ops import band_gain_matrix, fft_frequencies

    freqs = fft_frequencies(SR, 256)
    bands = [(0.0, 1000.0), (1000.0, 2500.0), (2500.0, 4000.0)]
    gains = band_gain_matrix(freqs, bands, attenuation=0.25, transition_hz=100.0)
    S_m, _, _ = engine.analyze_and_baseline_multi(tracks)
    # track_batch 2 over 3 tracks also exercises the repeated-tail padding
    probs_m = engine.fbp_probs_multi(S_m, tracks, gains, track_batch=2)
    assert probs_m.shape == (len(tracks), len(bands))
    for t, y in enumerate(tracks):
        S, _ = engine.analyze(y)
        p = engine.fbp_probs(S, y, gains)
        np.testing.assert_allclose(probs_m[t], p, atol=2e-5)


def test_occlusion_probs_multi_matches_single(engine, tracks):
    from adx_tpu.ops import occlusion_patch_grid

    n_out = len(tracks[0])
    S_m, _, _ = engine.analyze_and_baseline_multi(tracks)
    F, T = S_m.shape[-2], S_m.shape[-1]
    starts, pf, pt = occlusion_patch_grid(F, T, 8, 8, 50.0, 50.0)
    probs_m = engine.occlusion_probs_multi(S_m, starts, pf, pt, 0.0, n_out,
                                           track_batch=2)
    assert probs_m.shape == (len(tracks), len(starts))
    for t, y in enumerate(tracks):
        S, _ = engine.analyze(y)
        p = engine.occlusion_probs(S, starts, pf, pt, 0.0, n_out)
        np.testing.assert_allclose(probs_m[t], p, atol=5e-5)


def test_stem_mix_probs_multi_matches_single(engine, tracks):
    rng = np.random.default_rng(3)
    stems_stack = np.stack([
        np.stack([y, 0.5 * y, np.roll(y, 100), 0.25 * y]) for y in tracks
    ])
    # per-track design matrices with duplicate rows (LIME-style)
    rows_list = [rng.integers(0, 2, size=(20, 4)).astype(np.float32)
                 for _ in tracks]
    out = engine.stem_mix_probs_multi(stems_stack, rows_list)
    assert len(out) == len(tracks)
    for t in range(len(tracks)):
        p = engine.stem_mix_probs(stems_stack[t], rows_list[t])
        np.testing.assert_allclose(out[t], p, atol=2e-5)
    # HBM-bounded track groups (2 over 3 → repeated-tail pad) are exact
    out_b = engine.stem_mix_probs_multi(stems_stack, rows_list, track_batch=2)
    for t in range(len(tracks)):
        np.testing.assert_allclose(out_b[t], out[t], atol=1e-6)
    # a LIST of per-track device stems (separation's natural output) stays
    # on device via jnp.stack and gives identical results
    import jax.numpy as jnp

    stems_list = [jnp.asarray(s) for s in stems_stack]
    out_l = engine.stem_mix_probs_multi(stems_list, rows_list)
    for t in range(len(tracks)):
        np.testing.assert_allclose(out_l[t], out[t], atol=1e-6)


def test_keep_patch_audio_partial_chunk_matches_full(engine, track):
    """A 1-start call pads to the next pow2 (not the full chunk — the
    non-uniform top-window fallback was synthesizing chunk full-track
    copies to keep one row); values must match the batched call."""
    S, _ = engine.analyze(track)
    starts = np.asarray([(0, 0), (1, 2), (2, 1)], np.int32)
    full = engine.keep_patch_audio(S, starts, 4, 8, len(track))
    for k in range(3):
        one = engine.keep_patch_audio(S, starts[k : k + 1], 4, 8, len(track))
        np.testing.assert_allclose(one[0], full[k], atol=1e-6)


def test_keep_patch_pcm16_slices_match_host_path(engine, track):
    """Device slice+quantize (keep_patch_audio_pcm16_slices) must equal the
    old host path — full-track keep_patch_audio, host slice, pcm16_quantize
    — within 1 LSB (same rule as the FBP band-audio device export)."""
    from adx_tpu.io.audio_io import pcm16_quantize

    S, _ = engine.analyze(track)
    pf, pt = 4, 8
    hop = engine.hop_length
    starts = np.asarray([(0, 0), (1, 2), (2, 1)], np.int32)
    slice_starts = np.asarray([t * hop for t, _f in starts], np.int32)
    slice_len = pt * hop

    q = engine.keep_patch_audio_pcm16_slices(
        S, starts, pf, pt, len(track), slice_starts, slice_len
    )
    assert q.dtype == np.int16 and q.shape == (3, slice_len)

    full = engine.keep_patch_audio(S, starts, pf, pt, len(track))
    for k in range(3):
        s0 = int(slice_starts[k])
        host = pcm16_quantize(full[k][s0 : s0 + slice_len])
        if len(host) < slice_len:  # tail window: device reads zeros
            host = np.pad(host, (0, slice_len - len(host)))
        assert np.max(np.abs(q[k].astype(np.int32) - host.astype(np.int32))) <= 1


def test_keep_patch_pcm16_slices_tail_window_zero_padded(engine, track):
    """A slice reaching past the track end must read zeros, not clamp the
    start (JAX dynamic_slice default) — the caller trims to true length."""
    pf, pt = 4, 8
    hop = engine.hop_length
    S, _ = engine.analyze(track)
    # start so the window sticks out past the end
    t_start = max(0, (len(track) - 3 * hop) // hop)
    starts = np.asarray([(t_start, 0)], np.int32)
    s0 = t_start * hop
    q = engine.keep_patch_audio_pcm16_slices(
        S, starts, pf, pt, len(track), np.asarray([s0], np.int32), pt * hop
    )[0]
    n_real = max(0, len(track) - s0)
    if n_real < pt * hop:
        assert np.all(q[n_real:] == 0)
