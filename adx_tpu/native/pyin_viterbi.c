/* Banded two-row Viterbi for pYIN (Mauch & Dixon 2014), C hot loop.
 *
 * Reference behavior: librosa's pyin Viterbi over 2M states (M voiced
 * pitch bins + M unvoiced), banded triangular pitch transitions and a
 * voiced<->unvoiced switch probability — the decode the reference invokes
 * through librosa.pyin (reference src/feature_extraction.py:11-13).
 *
 * This file is the native twin of the numpy loop in
 * adx_tpu/features/pyin.py::pyin (the "Viterbi over 2M states" section)
 * and is kept BIT-EXACT to it: every float32/float64 mixed-precision
 * step of the numpy code is reproduced (f32 banded scores, f64 combine
 * with the switch terms, f32 store of the new delta), and ties resolve
 * to the lowest window slot exactly like np.argmax. tests/test_pyin_native.py
 * asserts state-sequence equality against the numpy path.
 *
 * Layout choice: the banded max-plus step runs k (window slot) OUTER and
 * state s INNER, so each k pass is an elementwise shifted add + compare
 * over M contiguous floats — auto-vectorizable (AVX-512 on this host),
 * unlike the s-outer/k-inner argmax scan. Per frame that is
 * 2 rows x (2K+1) passes x M lanes with no temporaries beyond two M
 * vectors; the numpy version materializes a [2, M, 2K+1] window buffer
 * (~1 MB/frame) per frame instead.
 *
 * Backpointers store the winning window slot k (0..2K <= 255) as uint8
 * plus one row flag per target state: 4*M bytes/frame total, ~12 MB for
 * a 120 s track, reconstructed as absolute states (s - K + k) during the
 * backtrace.
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include <math.h>

#ifdef __cplusplus
extern "C" {
#endif

/* Viterbi decode.
 *
 *  log_obs_v : [T*M] float64, per-frame voiced log observation
 *  log_obs_u : [T] float64, per-frame unvoiced log observation
 *              (constant across states within a frame)
 *  log_tri   : [2K+1] float32, log triangular transition weights,
 *              slot k <-> source offset (k - K)
 *  rn        : [M] float32 or NULL, per-SOURCE-state penalty subtracted
 *              when the previous delta enters the band window (librosa's
 *              transition_local edge-row renormalization; zero interior)
 *  delta_init: [2*M] float32, frame-0 delta rows (voiced row 0,
 *              unvoiced row 1), already including frame-0 observations
 *  states    : [T] int32 out, decoded state index per frame
 *  voiced    : [T] uint8 out, 1 where the decoded state is voiced
 *
 * Returns 0 on success, -1 on allocation failure or bad sizes.
 */
int pyin_viterbi(
    const double *log_obs_v,
    const double *log_obs_u,
    int64_t T,
    int64_t M,
    const float *log_tri,
    int64_t K,
    double log_stay,
    double log_switch,
    const float *rn,
    const float *delta_init,
    int32_t *states,
    uint8_t *voiced)
{
    if (T < 1 || M < 1 || K < 0 || 2 * K > 255)
        return -1;

    const int64_t W = 2 * K + 1;
    const int64_t P = M + 2 * K; /* padded row length */

    float *padded = NULL, *best = NULL, *delta = NULL;
    int32_t *argk = NULL;
    uint8_t *kback = NULL, *fromflag = NULL;
    int rc = -1;

    padded = (float *)malloc(sizeof(float) * 2 * P);
    best = (float *)malloc(sizeof(float) * 2 * M);
    delta = (float *)malloc(sizeof(float) * 2 * M);
    /* int32 arg lanes in the hot loop (uint8 stores defeat the
     * compiler's float-lane blend vectorization); narrowed to uint8
     * only when spilled into the per-frame backpointer array */
    argk = (int32_t *)malloc(sizeof(int32_t) * 2 * M);
    /* per-frame backpointers: winning slot for each (row, state) and the
     * cross-row switch flag for each target row/state */
    kback = (uint8_t *)malloc((size_t)T * 2 * M);
    fromflag = (uint8_t *)malloc((size_t)T * 2 * M);
    if (!padded || !best || !delta || !argk || !kback || !fromflag)
        goto done;

    for (int64_t i = 0; i < 2 * P; i++)
        padded[i] = -INFINITY;
    memcpy(delta, delta_init, sizeof(float) * 2 * M);

    for (int64_t t = 1; t < T; t++) {
        /* refresh padded centers with the previous delta (minus the
         * per-source renormalization penalty when provided) */
        if (rn) {
            for (int64_t s = 0; s < M; s++) {
                padded[K + s] = delta[s] - rn[s];
                padded[P + K + s] = delta[M + s] - rn[s];
            }
        } else {
            memcpy(padded + K, delta, sizeof(float) * M);
            memcpy(padded + P + K, delta + M, sizeof(float) * M);
        }

        /* banded max-plus: best[r][s] = max_k padded[r][s+k] + tri[k],
         * first (lowest-k) maximum wins ties like np.argmax */
        for (int r = 0; r < 2; r++) {
            const float *__restrict__ prow = padded + (int64_t)r * P;
            float *__restrict__ brow = best + (int64_t)r * M;
            int32_t *__restrict__ arow = argk + (int64_t)r * M;
            const float tri0 = log_tri[0];
            for (int64_t s = 0; s < M; s++) {
                brow[s] = prow[s] + tri0;
                arow[s] = 0;
            }
            for (int64_t k = 1; k < W; k++) {
                const float trik = log_tri[k];
                const float *__restrict__ src = prow + k;
                for (int64_t s = 0; s < M; s++) {
                    float cand = src[s] + trik;
                    int better = cand > brow[s];
                    brow[s] = better ? cand : brow[s];
                    arow[s] = better ? (int32_t)k : arow[s];
                }
            }
        }

        /* combine rows with the switch terms. numpy 2.x weak promotion:
         * bm + log_stay runs in FLOAT32 (the python scalar is pre-cast),
         * the comparison is f32, and only the final np.add with the f64
         * observation upcasts to float64 before the downcasting store
         * into the f32 delta (verified empirically) — mirror exactly. */
        const float stay32 = (float)log_stay;
        const float switch32 = (float)log_switch;
        const double *obs_v = log_obs_v + t * M;
        const double obs_u_t = log_obs_u[t];
        uint8_t *kb = kback + (size_t)t * 2 * M;
        uint8_t *ff = fromflag + (size_t)t * 2 * M;
        for (int64_t s = 0; s < M; s++) {
            float bm_v = best[s];
            float bm_u = best[M + s];
            /* voiced[t] from voiced (stay) or unvoiced (switch) */
            float cand_vv = bm_v + stay32;
            float cand_uv = bm_u + switch32;
            int take_u = cand_uv > cand_vv;
            delta[s] = (float)((double)(take_u ? cand_uv : cand_vv) + obs_v[s]);
            ff[s] = (uint8_t)take_u;
            kb[s] = (uint8_t)(take_u ? argk[M + s] : argk[s]);
            /* unvoiced[t] from unvoiced (stay) or voiced (switch) */
            float cand_uu = bm_u + stay32;
            float cand_vu = bm_v + switch32;
            int take_v = cand_vu > cand_uu;
            delta[M + s] = (float)((double)(take_v ? cand_vu : cand_uu) + obs_u_t);
            ff[M + s] = (uint8_t)take_v;
            kb[M + s] = (uint8_t)(take_v ? argk[s] : argk[M + s]);
        }
    }

    /* terminal state: voiced row wins ties (numpy `>=`) */
    {
        float vmax = -INFINITY, umax = -INFINITY;
        int64_t varg = 0, uarg = 0;
        for (int64_t s = 0; s < M; s++) {
            if (delta[s] > vmax) { vmax = delta[s]; varg = s; }
            if (delta[M + s] > umax) { umax = delta[M + s]; uarg = s; }
        }
        if (vmax >= umax) { states[T - 1] = (int32_t)varg; voiced[T - 1] = 1; }
        else { states[T - 1] = (int32_t)uarg; voiced[T - 1] = 0; }
    }

    for (int64_t t = T - 1; t > 0; t--) {
        const uint8_t *kb = kback + (size_t)t * 2 * M;
        const uint8_t *ff = fromflag + (size_t)t * 2 * M;
        int64_t s = states[t];
        if (voiced[t]) {
            states[t - 1] = (int32_t)(s - K + kb[s]);
            voiced[t - 1] = (uint8_t)(!ff[s]);
        } else {
            states[t - 1] = (int32_t)(s - K + kb[M + s]);
            voiced[t - 1] = ff[M + s];
        }
    }
    rc = 0;

done:
    free(padded); free(best); free(delta);
    free(argk); free(kback); free(fromflag);
    return rc;
}

#ifdef __cplusplus
} /* extern "C" */
#endif
