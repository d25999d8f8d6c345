// Native exact ksw_extd2 — scalar/autovectorized port of the golden model
// (minimap2_chaindp_tpu/ops/ksw2.py:extd2, itself a bit-exact emulation of
// the reference's ksw2_extd2_sse.c anti-diagonal difference DP).
//
// Purpose: small extension jobs are latency-bound on a remote device link —
// one device round trip costs more than computing hundreds of sub-kilobase
// problems on the host, and the reference itself runs ksw2 on host SIMD.
// The Pallas wavefront kernel (ops/ksw2_pallas.py) stays the device path
// for large problems; this is the host half of that split, producing
// byte-identical Ez results (scores, flags, CIGAR).
//
// Bit-exactness notes (all mirrored from the golden model):
//  * int8 wrap-around arithmetic (stores cast to int8_t)
//  * 16-wide score blocks written from st0, core band aligned st..en —
//    stale bytes outside written blocks persist across rows (kcalloc
//    semantics of the C kernel)
//  * exact max via int64 H row with the lane-of-4 tie order of the SSE code
//  * left/right gap alignment backtrack-byte conventions and
//    ksw_backtrack's state machine
#include <cstdint>
#include <immintrin.h>
#include <cstring>
#include <cstdlib>
#include <vector>
#include <algorithm>
#include <atomic>

namespace {

constexpr int64_t KSW_NEG_INF = -0x40000000;
constexpr int KSW_EZ_SCORE_ONLY = 0x01;
constexpr int KSW_EZ_RIGHT = 0x02;
constexpr int KSW_EZ_GENERIC_SC = 0x04;
constexpr int KSW_EZ_APPROX_MAX = 0x08;
constexpr int KSW_EZ_APPROX_DROP = 0x10;
constexpr int KSW_EZ_EXTZ_ONLY = 0x40;
constexpr int KSW_EZ_REV_CIGAR = 0x80;

struct EzOut {
    int64_t max, zdropped, max_q, max_t, mqe, mqe_t, mte, mte_q, score,
        reach_end, n_cigar;
};

struct Work {  // reused across jobs
    std::vector<int8_t> u, v, x, y, x2, y2, s;
    std::vector<uint8_t> sf, qr, p;
    std::vector<int64_t> H;
    std::vector<int32_t> off, off_end;
};

// Extension-DP call statistics (always cheap: a handful of relaxed atomic
// adds per JOB, not per row). 0 calls, 1 rows, 2 band cells, 3 exact-H
// calls, 4 approx-max calls, 5 sum qlen, 6 sum tlen.
static std::atomic<int64_t> g_ext_stat[8];
extern "C" void mm2tpu_ext_stat_read(int64_t* out8) {
    for (int i = 0; i < 8; ++i)
        out8[i] = g_ext_stat[i].load(std::memory_order_relaxed);
}
extern "C" void mm2tpu_ext_stat_reset() {
    for (int i = 0; i < 8; ++i)
        g_ext_stat[i].store(0, std::memory_order_relaxed);
}


// vectorized exact-H band pass: adds v to H over [st0,en1) and folds the
// lane-of-4 first-strict-max (the golden model's tie order) into max_H/max_t
static inline void h_band_update(int64_t* __restrict__ H, const int8_t* __restrict__ vrow,
                                 int64_t st0, int64_t en1,
                                 int64_t& max_H, int64_t& max_t) {
#ifdef __AVX2__
    __m256i vmax = _mm256_set1_epi64x(INT64_MIN);
    __m256i vidx = _mm256_set1_epi64x(-1);
    __m256i tvec = _mm256_setr_epi64x(st0, st0 + 1, st0 + 2, st0 + 3);
    const __m256i four = _mm256_set1_epi64x(4);
    for (int64_t t = st0; t < en1; t += 4) {
        __m128i vb = _mm_cvtsi32_si128(*(const int32_t*)(vrow + t));
        __m256i h = _mm256_add_epi64(
            _mm256_loadu_si256((const __m256i*)(H + t)),
            _mm256_cvtepi8_epi64(vb));
        _mm256_storeu_si256((__m256i*)(H + t), h);
        __m256i gt = _mm256_cmpgt_epi64(h, vmax);
        vmax = _mm256_blendv_epi8(vmax, h, gt);
        vidx = _mm256_blendv_epi8(vidx, tvec, gt);
        tvec = _mm256_add_epi64(tvec, four);
    }
    alignas(32) int64_t mx[4], ix[4];
    _mm256_store_si256((__m256i*)mx, vmax);
    _mm256_store_si256((__m256i*)ix, vidx);
    for (int l = 0; l < 4; ++l)
        if (mx[l] > max_H) { max_H = mx[l]; max_t = ix[l]; }
#else
    for (int l = 0; l < 4; ++l) {
        int64_t cmax = INT64_MIN, ct = -1;
        for (int64_t t = st0 + l; t < en1; t += 4) {
            H[t] += vrow[t];
            if (H[t] > cmax) { cmax = H[t]; ct = t; }
        }
        if (cmax > max_H) { max_H = cmax; max_t = ct; }
    }
#endif
}

inline void push_cigar(uint32_t* cig, int64_t& n, int op, int64_t len) {
    if (n && (int)(cig[n-1] & 0xF) == op) cig[n-1] += (uint32_t)(len << 4);
    else cig[n++] = (uint32_t)(len << 4 | op);
}

// rotated backtrack (golden model _backtrack_rot; reference ksw2.h:119-151);
// min_intron_len > 0 maps state 3 to CIGAR op N (splice)
void backtrack_rot(const uint8_t* p, const int32_t* off,
                   const int32_t* off_end, int64_t n_col, int64_t i0,
                   int64_t j0, bool is_rev, uint32_t* cig, int64_t& n_cig,
                   int64_t min_intron_len = 0) {
    int64_t i = i0, j = j0, state = 0;
    n_cig = 0;
    while (i >= 0 && j >= 0) {
        int64_t r = i + j;
        int force_state = -1;
        if (i < off[r]) force_state = 2;
        if (off_end && i > off_end[r]) force_state = 1;
        int tmp = force_state < 0 ? p[r * n_col + i - off[r]] : 0;
        if (state == 0) state = tmp & 7;
        else if (!(tmp >> (state + 2) & 1)) state = 0;
        if (state == 0) state = tmp & 7;
        if (force_state >= 0) state = force_state;
        if (state == 0) { push_cigar(cig, n_cig, 0, 1); --i; --j; }
        else if (state == 1 || (state == 3 && min_intron_len <= 0)) {
            push_cigar(cig, n_cig, 2, 1); --i;
        } else if (state == 3) { push_cigar(cig, n_cig, 3, 1); --i; }
        else { push_cigar(cig, n_cig, 1, 1); --j; }
    }
    if (i >= 0)
        push_cigar(cig, n_cig,
                   (min_intron_len > 0 && i >= min_intron_len) ? 3 : 2,
                   i + 1);
    if (j >= 0) push_cigar(cig, n_cig, 1, j + 1);
    if (!is_rev) std::reverse(cig, cig + n_cig);
}

#define RST __restrict__

// score-profile fill for the simple match/mismatch matrices: covers
// [st0, st0 + 16*ceil((en0-st0+1)/16)) in 16-byte blocks, exactly like the
// scalar model (stale bytes outside that range are load-bearing).  Hand
// SSE4.1: the autovectorizer versions the scalar loop for aliasing per
// 16-byte block, which dominates short rows.
static inline void build_score_profile(
    const uint8_t* RST sf, const uint8_t* RST qr, int64_t qrr,
    int8_t* RST s_, int64_t st0, int64_t en0,
    int8_t sc_mch, int8_t sc_mis, int8_t sc_N, int m) {
#ifdef __SSE4_1__
    int64_t t0 = st0;
#ifdef __AVX2__
    // 32-wide pairs of 16-byte blocks; coverage is IDENTICAL to the 16-wide
    // loop (block at t0 is written iff t0 <= en0), so the load-bearing stale
    // bytes outside the covered blocks are untouched.
    const __m256i ymch = _mm256_set1_epi8(sc_mch),
                  ymis = _mm256_set1_epi8(sc_mis),
                  yN = _mm256_set1_epi8(sc_N),
                  ym1 = _mm256_set1_epi8((char)(m - 1));
    for (; t0 + 16 <= en0; t0 += 32) {
        __m256i sq = _mm256_loadu_si256((const __m256i*)(sf + t0));
        __m256i stq = _mm256_loadu_si256((const __m256i*)(qr + qrr + t0));
        __m256i v = _mm256_blendv_epi8(ymis, ymch,
                                       _mm256_cmpeq_epi8(sq, stq));
        __m256i orv = _mm256_or_si256(sq, stq);
        __m256i ge = _mm256_cmpeq_epi8(_mm256_max_epu8(orv, ym1), orv);
        _mm256_storeu_si256((__m256i*)(s_ + t0),
                            _mm256_blendv_epi8(v, yN, ge));
    }
#endif
    const __m128i vmch = _mm_set1_epi8(sc_mch), vmis = _mm_set1_epi8(sc_mis),
                  vN = _mm_set1_epi8(sc_N),
                  vm1 = _mm_set1_epi8((char)(m - 1));
    for (; t0 <= en0; t0 += 16) {
        __m128i sq = _mm_loadu_si128((const __m128i*)(sf + t0));
        __m128i stq = _mm_loadu_si128((const __m128i*)(qr + qrr + t0));
        __m128i v = _mm_blendv_epi8(vmis, vmch, _mm_cmpeq_epi8(sq, stq));
        __m128i orv = _mm_or_si128(sq, stq);
        // unsigned orv >= m-1  <=>  max_epu8(orv, m-1) == orv
        __m128i ge = _mm_cmpeq_epi8(_mm_max_epu8(orv, vm1), orv);
        _mm_storeu_si128((__m128i*)(s_ + t0), _mm_blendv_epi8(v, vN, ge));
    }
#else
    for (int64_t t0 = st0; t0 <= en0; t0 += 16) {
        const uint8_t* RST sfp = sf + t0;
        const uint8_t* RST qrp = qr + qrr + t0;
        int8_t* RST sp = s_ + t0;
        for (int l = 0; l < 16; ++l) {
            uint8_t sq = sfp[l], stq = qrp[l];
            int8_t v0 = sq == stq ? sc_mch : sc_mis;
            sp[l] = (uint8_t)(sq | stq) >= (uint8_t)(m - 1) ? sc_N : v0;
        }
    }
#endif
}

#ifdef __AVX2__
static inline void row_left_v(int64_t, const int8_t* RST, const int8_t* RST,
    const int8_t* RST, const int8_t* RST, const int8_t* RST, int8_t* RST,
    int8_t* RST, int8_t* RST, int8_t* RST, int8_t* RST, int8_t* RST,
    uint8_t* RST, int8_t, int8_t, int8_t, int8_t, int8_t, int64_t&);
static inline void row_right_v(int64_t, const int8_t* RST, const int8_t* RST,
    const int8_t* RST, const int8_t* RST, const int8_t* RST, int8_t* RST,
    int8_t* RST, int8_t* RST, int8_t* RST, int8_t* RST, int8_t* RST,
    uint8_t* RST, int8_t, int8_t, int8_t, int8_t, int8_t, int64_t&);
static inline void row_score_v(int64_t, const int8_t* RST, const int8_t* RST,
    const int8_t* RST, const int8_t* RST, const int8_t* RST, int8_t* RST,
    int8_t* RST, int8_t* RST, int8_t* RST, int8_t* RST, int8_t* RST,
    int8_t, int8_t, int8_t, int8_t, int8_t, int64_t&);
#endif


// core anti-diagonal update, left-aligned gaps (model lines 266-310);
// all-distinct buffers => autovectorizes (int8, 32/64-lane AVX2/512)
static void row_left(int64_t len, const int8_t* RST s_, const int8_t* RST xt1,
                     const int8_t* RST x2t1, const int8_t* RST vt1,
                     const int8_t* RST ut, int8_t* RST u_, int8_t* RST v_,
                     int8_t* RST x_, int8_t* RST y_, int8_t* RST x2_,
                     int8_t* RST y2_, uint8_t* RST prow, int8_t mat0,
                     int8_t q_, int8_t q2_, int8_t qe_, int8_t qe2_) {
    int64_t iv = 0;
#ifdef __AVX2__
    row_left_v(len, s_, xt1, x2t1, vt1, ut, u_, v_, x_, y_, x2_, y2_, prow,
               mat0, q_, q2_, qe_, qe2_, iv);
#endif
    for (int64_t i0 = iv; i0 < len; i0 += 16)
    for (int64_t i = i0; i < i0 + 16; ++i) {
        int8_t z = s_[i];
        int8_t a = (int8_t)(xt1[i] + vt1[i]);
        int8_t b = (int8_t)(y_[i] + ut[i]);
        int8_t a2 = (int8_t)(x2t1[i] + vt1[i]);
        int8_t b2 = (int8_t)(y2_[i] + ut[i]);
        uint8_t d = a > z ? 1 : 0; z = std::max(z, a);
        d = b > z ? 2 : d; z = std::max(z, b);
        d = a2 > z ? 3 : d; z = std::max(z, a2);
        d = b2 > z ? 4 : d; z = std::max(z, b2);
        z = std::min(z, mat0);
        u_[i] = (int8_t)(z - vt1[i]);
        v_[i] = (int8_t)(z - ut[i]);
        int8_t tmp = (int8_t)(z - q_);
        a = (int8_t)(a - tmp); b = (int8_t)(b - tmp);
        int8_t tmp2 = (int8_t)(z - q2_);
        a2 = (int8_t)(a2 - tmp2); b2 = (int8_t)(b2 - tmp2);
        x_[i] = (int8_t)((a > 0 ? a : 0) - qe_);
        d |= a > 0 ? 0x08 : 0;
        y_[i] = (int8_t)((b > 0 ? b : 0) - qe_);
        d |= b > 0 ? 0x10 : 0;
        x2_[i] = (int8_t)((a2 > 0 ? a2 : 0) - qe2_);
        d |= a2 > 0 ? 0x20 : 0;
        y2_[i] = (int8_t)((b2 > 0 ? b2 : 0) - qe2_);
        d |= b2 > 0 ? 0x40 : 0;
        prow[i] = d;
    }
}

#ifdef __AVX2__
// 32-lane AVX2 bodies of the three row kernels.  Bit-exact with the scalar
// loops: int8 adds/subs wrap identically, the blend chain reproduces the
// scalar ternary order (compare against z BEFORE folding the candidate in),
// and writes cover exactly [0,len) so stale-byte semantics are unchanged.
// len is always a multiple of 16; the 16-byte remainder runs the scalar loop.
static inline void row_left_v(int64_t len, const int8_t* RST s_,
                              const int8_t* RST xt1, const int8_t* RST x2t1,
                              const int8_t* RST vt1, const int8_t* RST ut,
                              int8_t* RST u_, int8_t* RST v_, int8_t* RST x_,
                              int8_t* RST y_, int8_t* RST x2_, int8_t* RST y2_,
                              uint8_t* RST prow, int8_t mat0, int8_t q_,
                              int8_t q2_, int8_t qe_, int8_t qe2_,
                              int64_t& i) {
    const __m256i vmat0 = _mm256_set1_epi8(mat0), vq = _mm256_set1_epi8(q_),
                  vq2 = _mm256_set1_epi8(q2_), vqe = _mm256_set1_epi8(qe_),
                  vqe2 = _mm256_set1_epi8(qe2_), zero = _mm256_setzero_si256(),
                  c1 = _mm256_set1_epi8(1), c2 = _mm256_set1_epi8(2),
                  c3 = _mm256_set1_epi8(3), c4 = _mm256_set1_epi8(4),
                  c8 = _mm256_set1_epi8(0x08), c16 = _mm256_set1_epi8(0x10),
                  c32 = _mm256_set1_epi8(0x20), c64 = _mm256_set1_epi8(0x40);
    for (; i + 32 <= len; i += 32) {
        __m256i z = _mm256_loadu_si256((const __m256i*)(s_ + i));
        __m256i vt = _mm256_loadu_si256((const __m256i*)(vt1 + i));
        __m256i u0 = _mm256_loadu_si256((const __m256i*)(ut + i));
        __m256i a = _mm256_add_epi8(
            _mm256_loadu_si256((const __m256i*)(xt1 + i)), vt);
        __m256i b = _mm256_add_epi8(
            _mm256_loadu_si256((const __m256i*)(y_ + i)), u0);
        __m256i a2 = _mm256_add_epi8(
            _mm256_loadu_si256((const __m256i*)(x2t1 + i)), vt);
        __m256i b2 = _mm256_add_epi8(
            _mm256_loadu_si256((const __m256i*)(y2_ + i)), u0);
        __m256i m = _mm256_cmpgt_epi8(a, z);
        __m256i d = _mm256_and_si256(m, c1);
        z = _mm256_max_epi8(z, a);
        m = _mm256_cmpgt_epi8(b, z);
        d = _mm256_blendv_epi8(d, c2, m);
        z = _mm256_max_epi8(z, b);
        m = _mm256_cmpgt_epi8(a2, z);
        d = _mm256_blendv_epi8(d, c3, m);
        z = _mm256_max_epi8(z, a2);
        m = _mm256_cmpgt_epi8(b2, z);
        d = _mm256_blendv_epi8(d, c4, m);
        z = _mm256_max_epi8(z, b2);
        z = _mm256_min_epi8(z, vmat0);
        _mm256_storeu_si256((__m256i*)(u_ + i), _mm256_sub_epi8(z, vt));
        _mm256_storeu_si256((__m256i*)(v_ + i), _mm256_sub_epi8(z, u0));
        __m256i t1 = _mm256_sub_epi8(z, vq);
        a = _mm256_sub_epi8(a, t1);
        b = _mm256_sub_epi8(b, t1);
        __m256i t2 = _mm256_sub_epi8(z, vq2);
        a2 = _mm256_sub_epi8(a2, t2);
        b2 = _mm256_sub_epi8(b2, t2);
        m = _mm256_cmpgt_epi8(a, zero);
        d = _mm256_or_si256(d, _mm256_and_si256(m, c8));
        _mm256_storeu_si256((__m256i*)(x_ + i),
            _mm256_sub_epi8(_mm256_max_epi8(a, zero), vqe));
        m = _mm256_cmpgt_epi8(b, zero);
        d = _mm256_or_si256(d, _mm256_and_si256(m, c16));
        _mm256_storeu_si256((__m256i*)(y_ + i),
            _mm256_sub_epi8(_mm256_max_epi8(b, zero), vqe));
        m = _mm256_cmpgt_epi8(a2, zero);
        d = _mm256_or_si256(d, _mm256_and_si256(m, c32));
        _mm256_storeu_si256((__m256i*)(x2_ + i),
            _mm256_sub_epi8(_mm256_max_epi8(a2, zero), vqe2));
        m = _mm256_cmpgt_epi8(b2, zero);
        d = _mm256_or_si256(d, _mm256_and_si256(m, c64));
        _mm256_storeu_si256((__m256i*)(y2_ + i),
            _mm256_sub_epi8(_mm256_max_epi8(b2, zero), vqe2));
        _mm256_storeu_si256((__m256i*)(prow + i), d);
    }
    if (i + 16 <= len) {  // 16-lane SSE tail (len is a multiple of 16)
        const __m128i wmat0 = _mm256_castsi256_si128(vmat0),
                      wq = _mm256_castsi256_si128(vq),
                      wq2 = _mm256_castsi256_si128(vq2),
                      wqe = _mm256_castsi256_si128(vqe),
                      wqe2 = _mm256_castsi256_si128(vqe2),
                      wz = _mm_setzero_si128(),
                      w1 = _mm256_castsi256_si128(c1),
                      w2 = _mm256_castsi256_si128(c2),
                      w3 = _mm256_castsi256_si128(c3),
                      w4 = _mm256_castsi256_si128(c4),
                      w8 = _mm256_castsi256_si128(c8),
                      w16 = _mm256_castsi256_si128(c16),
                      w32 = _mm256_castsi256_si128(c32),
                      w64 = _mm256_castsi256_si128(c64);
        __m128i z = _mm_loadu_si128((const __m128i*)(s_ + i));
        __m128i vt = _mm_loadu_si128((const __m128i*)(vt1 + i));
        __m128i u0 = _mm_loadu_si128((const __m128i*)(ut + i));
        __m128i a = _mm_add_epi8(
            _mm_loadu_si128((const __m128i*)(xt1 + i)), vt);
        __m128i b = _mm_add_epi8(
            _mm_loadu_si128((const __m128i*)(y_ + i)), u0);
        __m128i a2 = _mm_add_epi8(
            _mm_loadu_si128((const __m128i*)(x2t1 + i)), vt);
        __m128i b2 = _mm_add_epi8(
            _mm_loadu_si128((const __m128i*)(y2_ + i)), u0);
        __m128i m = _mm_cmpgt_epi8(a, z);
        __m128i d = _mm_and_si128(m, w1);
        z = _mm_max_epi8(z, a);
        m = _mm_cmpgt_epi8(b, z);
        d = _mm_blendv_epi8(d, w2, m);
        z = _mm_max_epi8(z, b);
        m = _mm_cmpgt_epi8(a2, z);
        d = _mm_blendv_epi8(d, w3, m);
        z = _mm_max_epi8(z, a2);
        m = _mm_cmpgt_epi8(b2, z);
        d = _mm_blendv_epi8(d, w4, m);
        z = _mm_max_epi8(z, b2);
        z = _mm_min_epi8(z, wmat0);
        _mm_storeu_si128((__m128i*)(u_ + i), _mm_sub_epi8(z, vt));
        _mm_storeu_si128((__m128i*)(v_ + i), _mm_sub_epi8(z, u0));
        __m128i t1 = _mm_sub_epi8(z, wq);
        a = _mm_sub_epi8(a, t1);
        b = _mm_sub_epi8(b, t1);
        __m128i t2 = _mm_sub_epi8(z, wq2);
        a2 = _mm_sub_epi8(a2, t2);
        b2 = _mm_sub_epi8(b2, t2);
        m = _mm_cmpgt_epi8(a, wz);
        d = _mm_or_si128(d, _mm_and_si128(m, w8));
        _mm_storeu_si128((__m128i*)(x_ + i),
            _mm_sub_epi8(_mm_max_epi8(a, wz), wqe));
        m = _mm_cmpgt_epi8(b, wz);
        d = _mm_or_si128(d, _mm_and_si128(m, w16));
        _mm_storeu_si128((__m128i*)(y_ + i),
            _mm_sub_epi8(_mm_max_epi8(b, wz), wqe));
        m = _mm_cmpgt_epi8(a2, wz);
        d = _mm_or_si128(d, _mm_and_si128(m, w32));
        _mm_storeu_si128((__m128i*)(x2_ + i),
            _mm_sub_epi8(_mm_max_epi8(a2, wz), wqe2));
        m = _mm_cmpgt_epi8(b2, wz);
        d = _mm_or_si128(d, _mm_and_si128(m, w64));
        _mm_storeu_si128((__m128i*)(y2_ + i),
            _mm_sub_epi8(_mm_max_epi8(b2, wz), wqe2));
        _mm_storeu_si128((__m128i*)(prow + i), d);
        i += 16;
    }
}

static inline void row_right_v(int64_t len, const int8_t* RST s_,
                               const int8_t* RST xt1, const int8_t* RST x2t1,
                               const int8_t* RST vt1, const int8_t* RST ut,
                               int8_t* RST u_, int8_t* RST v_, int8_t* RST x_,
                               int8_t* RST y_, int8_t* RST x2_,
                               int8_t* RST y2_, uint8_t* RST prow,
                               int8_t mat0, int8_t q_, int8_t q2_,
                               int8_t qe_, int8_t qe2_, int64_t& i) {
    const __m256i vmat0 = _mm256_set1_epi8(mat0), vq = _mm256_set1_epi8(q_),
                  vq2 = _mm256_set1_epi8(q2_), vqe = _mm256_set1_epi8(qe_),
                  vqe2 = _mm256_set1_epi8(qe2_), zero = _mm256_setzero_si256(),
                  c1 = _mm256_set1_epi8(1), c2 = _mm256_set1_epi8(2),
                  c3 = _mm256_set1_epi8(3), c4 = _mm256_set1_epi8(4),
                  c8 = _mm256_set1_epi8(0x08), c16 = _mm256_set1_epi8(0x10),
                  c32 = _mm256_set1_epi8(0x20), c64 = _mm256_set1_epi8(0x40);
    for (; i + 32 <= len; i += 32) {
        __m256i z = _mm256_loadu_si256((const __m256i*)(s_ + i));
        __m256i vt = _mm256_loadu_si256((const __m256i*)(vt1 + i));
        __m256i u0 = _mm256_loadu_si256((const __m256i*)(ut + i));
        __m256i a = _mm256_add_epi8(
            _mm256_loadu_si256((const __m256i*)(xt1 + i)), vt);
        __m256i b = _mm256_add_epi8(
            _mm256_loadu_si256((const __m256i*)(y_ + i)), u0);
        __m256i a2 = _mm256_add_epi8(
            _mm256_loadu_si256((const __m256i*)(x2t1 + i)), vt);
        __m256i b2 = _mm256_add_epi8(
            _mm256_loadu_si256((const __m256i*)(y2_ + i)), u0);
        // d = z > a ? 0 : 1  (keep where z strictly greater)
        __m256i m = _mm256_cmpgt_epi8(z, a);
        __m256i d = _mm256_andnot_si256(m, c1);
        z = _mm256_max_epi8(z, a);
        m = _mm256_cmpgt_epi8(z, b);
        d = _mm256_blendv_epi8(c2, d, m);
        z = _mm256_max_epi8(z, b);
        m = _mm256_cmpgt_epi8(z, a2);
        d = _mm256_blendv_epi8(c3, d, m);
        z = _mm256_max_epi8(z, a2);
        m = _mm256_cmpgt_epi8(z, b2);
        d = _mm256_blendv_epi8(c4, d, m);
        z = _mm256_max_epi8(z, b2);
        z = _mm256_min_epi8(z, vmat0);
        _mm256_storeu_si256((__m256i*)(u_ + i), _mm256_sub_epi8(z, vt));
        _mm256_storeu_si256((__m256i*)(v_ + i), _mm256_sub_epi8(z, u0));
        __m256i t1 = _mm256_sub_epi8(z, vq);
        a = _mm256_sub_epi8(a, t1);
        b = _mm256_sub_epi8(b, t1);
        __m256i t2 = _mm256_sub_epi8(z, vq2);
        a2 = _mm256_sub_epi8(a2, t2);
        b2 = _mm256_sub_epi8(b2, t2);
        // d |= a >= 0 ? bit : 0  ==  ~(0 > a)
        m = _mm256_cmpgt_epi8(zero, a);
        d = _mm256_or_si256(d, _mm256_andnot_si256(m, c8));
        _mm256_storeu_si256((__m256i*)(x_ + i),
            _mm256_sub_epi8(_mm256_max_epi8(a, zero), vqe));
        m = _mm256_cmpgt_epi8(zero, b);
        d = _mm256_or_si256(d, _mm256_andnot_si256(m, c16));
        _mm256_storeu_si256((__m256i*)(y_ + i),
            _mm256_sub_epi8(_mm256_max_epi8(b, zero), vqe));
        m = _mm256_cmpgt_epi8(zero, a2);
        d = _mm256_or_si256(d, _mm256_andnot_si256(m, c32));
        _mm256_storeu_si256((__m256i*)(x2_ + i),
            _mm256_sub_epi8(_mm256_max_epi8(a2, zero), vqe2));
        m = _mm256_cmpgt_epi8(zero, b2);
        d = _mm256_or_si256(d, _mm256_andnot_si256(m, c64));
        _mm256_storeu_si256((__m256i*)(y2_ + i),
            _mm256_sub_epi8(_mm256_max_epi8(b2, zero), vqe2));
        _mm256_storeu_si256((__m256i*)(prow + i), d);
    }
    if (i + 16 <= len) {  // 16-lane SSE tail (len is a multiple of 16)
        const __m128i wmat0 = _mm256_castsi256_si128(vmat0),
                      wq = _mm256_castsi256_si128(vq),
                      wq2 = _mm256_castsi256_si128(vq2),
                      wqe = _mm256_castsi256_si128(vqe),
                      wqe2 = _mm256_castsi256_si128(vqe2),
                      wz = _mm_setzero_si128(),
                      w1 = _mm256_castsi256_si128(c1),
                      w2 = _mm256_castsi256_si128(c2),
                      w3 = _mm256_castsi256_si128(c3),
                      w4 = _mm256_castsi256_si128(c4),
                      w8 = _mm256_castsi256_si128(c8),
                      w16 = _mm256_castsi256_si128(c16),
                      w32 = _mm256_castsi256_si128(c32),
                      w64 = _mm256_castsi256_si128(c64);
        __m128i z = _mm_loadu_si128((const __m128i*)(s_ + i));
        __m128i vt = _mm_loadu_si128((const __m128i*)(vt1 + i));
        __m128i u0 = _mm_loadu_si128((const __m128i*)(ut + i));
        __m128i a = _mm_add_epi8(
            _mm_loadu_si128((const __m128i*)(xt1 + i)), vt);
        __m128i b = _mm_add_epi8(
            _mm_loadu_si128((const __m128i*)(y_ + i)), u0);
        __m128i a2 = _mm_add_epi8(
            _mm_loadu_si128((const __m128i*)(x2t1 + i)), vt);
        __m128i b2 = _mm_add_epi8(
            _mm_loadu_si128((const __m128i*)(y2_ + i)), u0);
        __m128i m = _mm_cmpgt_epi8(z, a);
        __m128i d = _mm_andnot_si128(m, w1);
        z = _mm_max_epi8(z, a);
        m = _mm_cmpgt_epi8(z, b);
        d = _mm_blendv_epi8(w2, d, m);
        z = _mm_max_epi8(z, b);
        m = _mm_cmpgt_epi8(z, a2);
        d = _mm_blendv_epi8(w3, d, m);
        z = _mm_max_epi8(z, a2);
        m = _mm_cmpgt_epi8(z, b2);
        d = _mm_blendv_epi8(w4, d, m);
        z = _mm_max_epi8(z, b2);
        z = _mm_min_epi8(z, wmat0);
        _mm_storeu_si128((__m128i*)(u_ + i), _mm_sub_epi8(z, vt));
        _mm_storeu_si128((__m128i*)(v_ + i), _mm_sub_epi8(z, u0));
        __m128i t1 = _mm_sub_epi8(z, wq);
        a = _mm_sub_epi8(a, t1);
        b = _mm_sub_epi8(b, t1);
        __m128i t2 = _mm_sub_epi8(z, wq2);
        a2 = _mm_sub_epi8(a2, t2);
        b2 = _mm_sub_epi8(b2, t2);
        m = _mm_cmpgt_epi8(wz, a);
        d = _mm_or_si128(d, _mm_andnot_si128(m, w8));
        _mm_storeu_si128((__m128i*)(x_ + i),
            _mm_sub_epi8(_mm_max_epi8(a, wz), wqe));
        m = _mm_cmpgt_epi8(wz, b);
        d = _mm_or_si128(d, _mm_andnot_si128(m, w16));
        _mm_storeu_si128((__m128i*)(y_ + i),
            _mm_sub_epi8(_mm_max_epi8(b, wz), wqe));
        m = _mm_cmpgt_epi8(wz, a2);
        d = _mm_or_si128(d, _mm_andnot_si128(m, w32));
        _mm_storeu_si128((__m128i*)(x2_ + i),
            _mm_sub_epi8(_mm_max_epi8(a2, wz), wqe2));
        m = _mm_cmpgt_epi8(wz, b2);
        d = _mm_or_si128(d, _mm_andnot_si128(m, w64));
        _mm_storeu_si128((__m128i*)(y2_ + i),
            _mm_sub_epi8(_mm_max_epi8(b2, wz), wqe2));
        _mm_storeu_si128((__m128i*)(prow + i), d);
        i += 16;
    }
}

static inline void row_score_v(int64_t len, const int8_t* RST s_,
                               const int8_t* RST xt1, const int8_t* RST x2t1,
                               const int8_t* RST vt1, const int8_t* RST ut,
                               int8_t* RST u_, int8_t* RST v_, int8_t* RST x_,
                               int8_t* RST y_, int8_t* RST x2_,
                               int8_t* RST y2_, int8_t mat0, int8_t q_,
                               int8_t q2_, int8_t qe_, int8_t qe2_,
                               int64_t& i) {
    const __m256i vmat0 = _mm256_set1_epi8(mat0), vq = _mm256_set1_epi8(q_),
                  vq2 = _mm256_set1_epi8(q2_), vqe = _mm256_set1_epi8(qe_),
                  vqe2 = _mm256_set1_epi8(qe2_), zero = _mm256_setzero_si256();
    for (; i + 32 <= len; i += 32) {
        __m256i z = _mm256_loadu_si256((const __m256i*)(s_ + i));
        __m256i vt = _mm256_loadu_si256((const __m256i*)(vt1 + i));
        __m256i u0 = _mm256_loadu_si256((const __m256i*)(ut + i));
        __m256i a = _mm256_add_epi8(
            _mm256_loadu_si256((const __m256i*)(xt1 + i)), vt);
        __m256i b = _mm256_add_epi8(
            _mm256_loadu_si256((const __m256i*)(y_ + i)), u0);
        __m256i a2 = _mm256_add_epi8(
            _mm256_loadu_si256((const __m256i*)(x2t1 + i)), vt);
        __m256i b2 = _mm256_add_epi8(
            _mm256_loadu_si256((const __m256i*)(y2_ + i)), u0);
        z = _mm256_max_epi8(_mm256_max_epi8(z, a), _mm256_max_epi8(b, a2));
        z = _mm256_max_epi8(z, b2);
        z = _mm256_min_epi8(z, vmat0);
        _mm256_storeu_si256((__m256i*)(u_ + i), _mm256_sub_epi8(z, vt));
        _mm256_storeu_si256((__m256i*)(v_ + i), _mm256_sub_epi8(z, u0));
        __m256i t1 = _mm256_sub_epi8(z, vq);
        a = _mm256_sub_epi8(a, t1);
        b = _mm256_sub_epi8(b, t1);
        __m256i t2 = _mm256_sub_epi8(z, vq2);
        a2 = _mm256_sub_epi8(a2, t2);
        b2 = _mm256_sub_epi8(b2, t2);
        _mm256_storeu_si256((__m256i*)(x_ + i),
            _mm256_sub_epi8(_mm256_max_epi8(a, zero), vqe));
        _mm256_storeu_si256((__m256i*)(y_ + i),
            _mm256_sub_epi8(_mm256_max_epi8(b, zero), vqe));
        _mm256_storeu_si256((__m256i*)(x2_ + i),
            _mm256_sub_epi8(_mm256_max_epi8(a2, zero), vqe2));
        _mm256_storeu_si256((__m256i*)(y2_ + i),
            _mm256_sub_epi8(_mm256_max_epi8(b2, zero), vqe2));
    }
    if (i + 16 <= len) {  // 16-lane SSE tail (len is a multiple of 16)
        const __m128i wmat0 = _mm256_castsi256_si128(vmat0),
                      wq = _mm256_castsi256_si128(vq),
                      wq2 = _mm256_castsi256_si128(vq2),
                      wqe = _mm256_castsi256_si128(vqe),
                      wqe2 = _mm256_castsi256_si128(vqe2),
                      wz = _mm_setzero_si128();
        __m128i z = _mm_loadu_si128((const __m128i*)(s_ + i));
        __m128i vt = _mm_loadu_si128((const __m128i*)(vt1 + i));
        __m128i u0 = _mm_loadu_si128((const __m128i*)(ut + i));
        __m128i a = _mm_add_epi8(
            _mm_loadu_si128((const __m128i*)(xt1 + i)), vt);
        __m128i b = _mm_add_epi8(
            _mm_loadu_si128((const __m128i*)(y_ + i)), u0);
        __m128i a2 = _mm_add_epi8(
            _mm_loadu_si128((const __m128i*)(x2t1 + i)), vt);
        __m128i b2 = _mm_add_epi8(
            _mm_loadu_si128((const __m128i*)(y2_ + i)), u0);
        z = _mm_max_epi8(_mm_max_epi8(z, a), _mm_max_epi8(b, a2));
        z = _mm_max_epi8(z, b2);
        z = _mm_min_epi8(z, wmat0);
        _mm_storeu_si128((__m128i*)(u_ + i), _mm_sub_epi8(z, vt));
        _mm_storeu_si128((__m128i*)(v_ + i), _mm_sub_epi8(z, u0));
        __m128i t1 = _mm_sub_epi8(z, wq);
        a = _mm_sub_epi8(a, t1);
        b = _mm_sub_epi8(b, t1);
        __m128i t2 = _mm_sub_epi8(z, wq2);
        a2 = _mm_sub_epi8(a2, t2);
        b2 = _mm_sub_epi8(b2, t2);
        _mm_storeu_si128((__m128i*)(x_ + i),
            _mm_sub_epi8(_mm_max_epi8(a, wz), wqe));
        _mm_storeu_si128((__m128i*)(y_ + i),
            _mm_sub_epi8(_mm_max_epi8(b, wz), wqe));
        _mm_storeu_si128((__m128i*)(x2_ + i),
            _mm_sub_epi8(_mm_max_epi8(a2, wz), wqe2));
        _mm_storeu_si128((__m128i*)(y2_ + i),
            _mm_sub_epi8(_mm_max_epi8(b2, wz), wqe2));
        i += 16;
    }
}
#endif  // __AVX2__

static void row_right(int64_t len, const int8_t* RST s_, const int8_t* RST xt1,
                      const int8_t* RST x2t1, const int8_t* RST vt1,
                      const int8_t* RST ut, int8_t* RST u_, int8_t* RST v_,
                      int8_t* RST x_, int8_t* RST y_, int8_t* RST x2_,
                      int8_t* RST y2_, uint8_t* RST prow, int8_t mat0,
                      int8_t q_, int8_t q2_, int8_t qe_, int8_t qe2_) {
    int64_t iv = 0;
#ifdef __AVX2__
    row_right_v(len, s_, xt1, x2t1, vt1, ut, u_, v_, x_, y_, x2_, y2_, prow,
                mat0, q_, q2_, qe_, qe2_, iv);
#endif
    for (int64_t i0 = iv; i0 < len; i0 += 16)
    for (int64_t i = i0; i < i0 + 16; ++i) {
        int8_t z = s_[i];
        int8_t a = (int8_t)(xt1[i] + vt1[i]);
        int8_t b = (int8_t)(y_[i] + ut[i]);
        int8_t a2 = (int8_t)(x2t1[i] + vt1[i]);
        int8_t b2 = (int8_t)(y2_[i] + ut[i]);
        uint8_t d = z > a ? 0 : 1; z = std::max(z, a);
        d = z > b ? d : 2; z = std::max(z, b);
        d = z > a2 ? d : 3; z = std::max(z, a2);
        d = z > b2 ? d : 4; z = std::max(z, b2);
        z = std::min(z, mat0);
        u_[i] = (int8_t)(z - vt1[i]);
        v_[i] = (int8_t)(z - ut[i]);
        int8_t tmp = (int8_t)(z - q_);
        a = (int8_t)(a - tmp); b = (int8_t)(b - tmp);
        int8_t tmp2 = (int8_t)(z - q2_);
        a2 = (int8_t)(a2 - tmp2); b2 = (int8_t)(b2 - tmp2);
        x_[i] = (int8_t)((a >= 0 ? a : 0) - qe_);
        d |= a >= 0 ? 0x08 : 0;
        y_[i] = (int8_t)((b >= 0 ? b : 0) - qe_);
        d |= b >= 0 ? 0x10 : 0;
        x2_[i] = (int8_t)((a2 >= 0 ? a2 : 0) - qe2_);
        d |= a2 >= 0 ? 0x20 : 0;
        y2_[i] = (int8_t)((b2 >= 0 ? b2 : 0) - qe2_);
        d |= b2 >= 0 ? 0x40 : 0;
        prow[i] = d;
    }
}

static void row_score(int64_t len, const int8_t* RST s_, const int8_t* RST xt1,
                      const int8_t* RST x2t1, const int8_t* RST vt1,
                      const int8_t* RST ut, int8_t* RST u_, int8_t* RST v_,
                      int8_t* RST x_, int8_t* RST y_, int8_t* RST x2_,
                      int8_t* RST y2_, int8_t mat0,
                      int8_t q_, int8_t q2_, int8_t qe_, int8_t qe2_) {
    int64_t iv = 0;
#ifdef __AVX2__
    row_score_v(len, s_, xt1, x2t1, vt1, ut, u_, v_, x_, y_, x2_, y2_,
                mat0, q_, q2_, qe_, qe2_, iv);
#endif
    for (int64_t i0 = iv; i0 < len; i0 += 16)
    for (int64_t i = i0; i < i0 + 16; ++i) {
        int8_t z = s_[i];
        int8_t a = (int8_t)(xt1[i] + vt1[i]);
        int8_t b = (int8_t)(y_[i] + ut[i]);
        int8_t a2 = (int8_t)(x2t1[i] + vt1[i]);
        int8_t b2 = (int8_t)(y2_[i] + ut[i]);
        z = std::max(z, a); z = std::max(z, b);
        z = std::max(z, a2); z = std::max(z, b2);
        z = std::min(z, mat0);
        u_[i] = (int8_t)(z - vt1[i]);
        v_[i] = (int8_t)(z - ut[i]);
        int8_t tmp = (int8_t)(z - q_);
        a = (int8_t)(a - tmp); b = (int8_t)(b - tmp);
        int8_t tmp2 = (int8_t)(z - q2_);
        a2 = (int8_t)(a2 - tmp2); b2 = (int8_t)(b2 - tmp2);
        x_[i] = (int8_t)((a > 0 ? a : 0) - qe_);
        y_[i] = (int8_t)((b > 0 ? b : 0) - qe_);
        x2_[i] = (int8_t)((a2 > 0 ? a2 : 0) - qe2_);
        y2_[i] = (int8_t)((b2 > 0 ? b2 : 0) - qe2_);
    }
}

inline bool apply_zdrop(EzOut& ez, int64_t H, int64_t r, int64_t t,
                        int64_t zdrop, int64_t e) {
    if (H > ez.max) { ez.max = H; ez.max_t = t; ez.max_q = r - t; }
    else if (t >= ez.max_t && r - t >= ez.max_q) {
        int64_t tl = t - ez.max_t, ql = (r - t) - ez.max_q;
        int64_t l = tl > ql ? tl - ql : ql - tl;
        if (zdrop >= 0 && ez.max - H > zdrop + l * e) {
            ez.zdropped = 1;
            return true;
        }
    }
    return false;
}

void extd2_one(const uint8_t* qseq, int64_t qlen, const uint8_t* tseq,
               int64_t tlen, const int8_t* mat, int q, int e, int q2, int e2,
               int w, int zdrop, int end_bonus, int flag, Work& wk,
               EzOut& ez, uint32_t* cig, int64_t& n_cig) {
    const int m = 5;
    ez = EzOut{0, 0, -1, -1, KSW_NEG_INF, -1, KSW_NEG_INF, -1, KSW_NEG_INF,
               0, 0};
    n_cig = 0;
    if (qlen <= 0 || tlen <= 0) return;
    if (q2 + e2 < q + e) { std::swap(q, q2); std::swap(e, e2); }
    bool with_cigar = !(flag & KSW_EZ_SCORE_ONLY);
    bool approx_max = flag & KSW_EZ_APPROX_MAX;
    int mat0 = mat[0];
    int8_t sc_mch = mat[0], sc_mis = mat[1], sc_N = (int8_t)(-e2);

    if (w < 0) w = (int)std::max(tlen, qlen);
    int wl = w, wr = w;
    int64_t tlen16 = (tlen + 15) / 16 * 16;
    int64_t n_col = std::min(qlen, tlen);
    n_col = ((std::min(n_col, (int64_t)w + 1) + 15) / 16 + 1) * 16;
    int min_sc = 127;
    for (int i = 0; i < m * m; ++i) min_sc = std::min(min_sc, (int)mat[i]);
    if (-min_sc > 2 * (q + e)) return;

    int64_t long_thres = e != e2 ? (q2 - q) / (e - e2) - 1 : 0;
    if (q2 + e2 + long_thres * e2 > q + e + long_thres * e) ++long_thres;
    int64_t long_diff = long_thres * (e - e2) - (q2 - q) - e2;

    // u/v/x/x2 are ping-pong row pairs (prev/cur) with a 16-byte front pad:
    // "previous row shifted by one" is then a plain pointer offset into the
    // prev half instead of a per-row shifted memcpy.  Band bounds st/en are
    // monotone non-decreasing in r, so a cell the previous row did not write
    // is either the one carry cell st-1 (patched below from x1/x21/v1) or
    // right-edge cells never written by ANY row (both halves hold the init
    // fill) — identical stale-cell semantics to the single-buffer C model.
    int64_t stride = tlen16 + 16;
    wk.u.assign(2 * stride, (int8_t)(-q - e));
    wk.v.assign(2 * stride, (int8_t)(-q - e));
    wk.x.assign(2 * stride, (int8_t)(-q - e));
    wk.y.assign(tlen16, (int8_t)(-q - e));
    wk.x2.assign(2 * stride, (int8_t)(-q2 - e2));
    wk.y2.assign(tlen16, (int8_t)(-q2 - e2));
    wk.s.assign(tlen16 + 16, 0);
    int8_t *up = wk.u.data() + 16, *uc = wk.u.data() + stride + 16,
           *vp = wk.v.data() + 16, *vc = wk.v.data() + stride + 16,
           *xp = wk.x.data() + 16, *xc = wk.x.data() + stride + 16,
           *x2p = wk.x2.data() + 16, *x2c = wk.x2.data() + stride + 16,
           *y = wk.y.data(), *y2 = wk.y2.data(), *s = wk.s.data();
    int64_t H0 = 0, last_H0_t = 0;
    int64_t* H = nullptr;
    if (!approx_max) {
        wk.H.assign(tlen16, KSW_NEG_INF);
        H = wk.H.data();
    }
    wk.sf.assign(tlen16 + 16, 0);
    memcpy(wk.sf.data(), tseq, tlen);
    wk.qr.assign(qlen + 32 + tlen16, 0);
    for (int64_t i = 0; i < qlen; ++i) wk.qr[i] = qseq[qlen - 1 - i];
    const uint8_t *sf = wk.sf.data(), *qr = wk.qr.data();

    uint8_t* p = nullptr;
    int32_t *off = nullptr, *off_end = nullptr;
    if (with_cigar) {
        if ((int64_t)wk.p.size() < (qlen + tlen - 1) * n_col)
            wk.p.resize((qlen + tlen - 1) * n_col);
        if ((int64_t)wk.off.size() < qlen + tlen - 1) {
            wk.off.resize(qlen + tlen - 1);
            wk.off_end.resize(qlen + tlen - 1);
        }
        p = wk.p.data();
        off = wk.off.data();
        off_end = wk.off_end.data();
    }
    bool right = flag & KSW_EZ_RIGHT;
    bool generic_sc = flag & KSW_EZ_GENERIC_SC;

    int64_t last_st = -1, last_en = -1;
    int8_t qe_ = (int8_t)(q + e), qe2_ = (int8_t)(q2 + e2);
    int8_t q_ = (int8_t)q, q2_ = (int8_t)q2;
    int64_t stat_rows = 0, stat_cells = 0;

    for (int64_t r = 0; r < qlen + tlen - 1; ++r) {
        int64_t st = 0, en = tlen - 1;
        if (st < r - qlen + 1) st = r - qlen + 1;
        if (en > r) en = r;
        if (st < ((r - wr + 1) >> 1)) st = (r - wr + 1) >> 1;
        if (en > ((r + wl) >> 1)) en = (r + wl) >> 1;
        if (st > en) { ez.zdropped = 1; break; }
        int64_t st0 = st, en0 = en;
        st = st / 16 * 16;
        en = (en + 16) / 16 * 16 - 1;
        int8_t x1, x21, v1;
        if (st > 0) {
            if (last_st <= st - 1 && st - 1 <= last_en) {
                x1 = xp[st-1]; x21 = x2p[st-1]; v1 = vp[st-1];
            } else {
                x1 = (int8_t)(-q - e); x21 = (int8_t)(-q2 - e2);
                v1 = (int8_t)(-q - e);
            }
        } else {
            x1 = (int8_t)(-q - e); x21 = (int8_t)(-q2 - e2);
            v1 = (int8_t)(r == 0 ? -q - e : r < long_thres ? -e
                          : r == long_thres ? long_diff : -e2);
        }
        if (en >= r) {
            y[r] = (int8_t)(-q - e);
            y2[r] = (int8_t)(-q2 - e2);
            up[r] = (int8_t)(r == 0 ? -q - e : r < long_thres ? -e
                             : r == long_thres ? long_diff : -e2);
        }
        int64_t qrr = qlen - 1 - r;
        if (!generic_sc) {
            build_score_profile(sf, qr, qrr, s, st0, en0, sc_mch, sc_mis,
                                sc_N, m);
        } else {
            // generic matrix path (unused by the simple mat presets)
            for (int64_t t = st0; t <= en0; ++t)
                s[t] = mat[sf[t] * m + qr[qrr + t]];
        }
        int64_t len = en - st + 1;
        // patch the carry cell so the shifted prev-row reads start at x1/x21/v1
        xp[st-1] = x1; x2p[st-1] = x21; vp[st-1] = v1;
        if (with_cigar && !right) {
            row_left(len, s + st, xp + st - 1, x2p + st - 1, vp + st - 1,
                     up + st, uc + st, vc + st, xc + st, y + st, x2c + st,
                     y2 + st, p + r * n_col, (int8_t)mat0, q_, q2_, qe_, qe2_);
        } else if (with_cigar) {
            row_right(len, s + st, xp + st - 1, x2p + st - 1, vp + st - 1,
                      up + st, uc + st, vc + st, xc + st, y + st, x2c + st,
                      y2 + st, p + r * n_col, (int8_t)mat0, q_, q2_, qe_, qe2_);
        } else {
            row_score(len, s + st, xp + st - 1, x2p + st - 1, vp + st - 1,
                      up + st, uc + st, vc + st, xc + st, y + st, x2c + st,
                      y2 + st, (int8_t)mat0, q_, q2_, qe_, qe2_);
        }
        if (with_cigar) { off[r] = (int32_t)st; off_end[r] = (int32_t)en; }
        ++stat_rows; stat_cells += len;

        if (!approx_max) {
            int64_t max_H, max_t;
            if (r > 0) {
                if (en0 > 0) H[en0] = H[en0 - 1] + uc[en0];
                else H[en0] = H[en0] + vc[en0];
                max_H = H[en0]; max_t = en0;
                int64_t en1 = st0 + (en0 - st0) / 4 * 4;
                if (en1 > st0) h_band_update(H, vc, st0, en1, max_H, max_t);
                for (int64_t t = en1; t < en0; ++t) {
                    H[t] += vc[t];
                    if (H[t] > max_H) { max_H = H[t]; max_t = t; }
                }
            } else {
                H[0] = vc[0] - (q + e);
                max_H = H[0]; max_t = 0;
            }
            if (en0 == tlen - 1 && H[en0] > ez.mte) {
                ez.mte = H[en0]; ez.mte_q = r - en;
            }
            if (r - st0 == qlen - 1 && H[st0] > ez.mqe) {
                ez.mqe = H[st0]; ez.mqe_t = st0;
            }
            if (apply_zdrop(ez, max_H, r, max_t, zdrop, e2)) break;
            if (r == qlen + tlen - 2 && en0 == tlen - 1)
                ez.score = H[tlen - 1];
        } else {
            if (r > 0) {
                if (st0 <= last_H0_t && last_H0_t <= en0
                    && st0 <= last_H0_t + 1 && last_H0_t + 1 <= en0) {
                    int64_t d0 = vc[last_H0_t], d1 = uc[last_H0_t + 1];
                    if (d0 > d1) H0 += d0;
                    else { H0 += d1; ++last_H0_t; }
                } else if (st0 <= last_H0_t && last_H0_t <= en0) {
                    H0 += vc[last_H0_t];
                } else {
                    ++last_H0_t;
                    H0 += uc[last_H0_t];
                }
            } else {
                H0 = (int64_t)vc[0] - (q + e);
                last_H0_t = 0;
            }
            if ((flag & KSW_EZ_APPROX_DROP)
                && apply_zdrop(ez, H0, r, last_H0_t, zdrop, e2)) break;
            if (r == qlen + tlen - 2 && en0 == tlen - 1) ez.score = H0;
        }
        last_st = st; last_en = en;
        std::swap(up, uc); std::swap(vp, vc);
        std::swap(xp, xc); std::swap(x2p, x2c);
    }
    g_ext_stat[0].fetch_add(1, std::memory_order_relaxed);
    g_ext_stat[1].fetch_add(stat_rows, std::memory_order_relaxed);
    g_ext_stat[2].fetch_add(stat_cells, std::memory_order_relaxed);
    g_ext_stat[approx_max ? 4 : 3].fetch_add(1, std::memory_order_relaxed);
    g_ext_stat[5].fetch_add(qlen, std::memory_order_relaxed);
    g_ext_stat[6].fetch_add(tlen, std::memory_order_relaxed);

    if (with_cigar) {
        bool rev_cigar = flag & KSW_EZ_REV_CIGAR;
        if (!ez.zdropped && !(flag & KSW_EZ_EXTZ_ONLY)) {
            backtrack_rot(p, off, off_end, n_col, tlen - 1, qlen - 1,
                          rev_cigar, cig, n_cig);
        } else if (!ez.zdropped && (flag & KSW_EZ_EXTZ_ONLY)
                   && ez.mqe + end_bonus > ez.max) {
            ez.reach_end = 1;
            backtrack_rot(p, off, off_end, n_col, ez.mqe_t, qlen - 1,
                          rev_cigar, cig, n_cig);
        } else if (ez.max_t >= 0 && ez.max_q >= 0) {
            backtrack_rot(p, off, off_end, n_col, ez.max_t, ez.max_q,
                          rev_cigar, cig, n_cig);
        }
    }
    ez.n_cigar = n_cig;
}

// ---- splice variant (golden model ops/ksw2_splice.py; reference
// ksw_exts2_sse): second gap state is an intron driven by donor/acceptor
// splice-signal bytes; unbanded; CIGAR op N via min_intron_len backtrack.

static void srow_left(int64_t len, const int8_t* RST s_,
                      const int8_t* RST xt1, const int8_t* RST x2t1,
                      const int8_t* RST vt1, const int8_t* RST ut,
                      const int8_t* RST don, const int8_t* RST acc,
                      int8_t* RST u_, int8_t* RST v_, int8_t* RST x_,
                      int8_t* RST y_, int8_t* RST x2_, uint8_t* RST prow,
                      int8_t q_, int8_t q2_, int8_t qe_) {
    for (int64_t i0 = 0; i0 < len; i0 += 16)
    for (int64_t i = i0; i < i0 + 16; ++i) {
        int8_t z = s_[i];
        int8_t a = (int8_t)(xt1[i] + vt1[i]);
        int8_t b = (int8_t)(y_[i] + ut[i]);
        int8_t a2 = (int8_t)(x2t1[i] + vt1[i]);
        int8_t a2a = (int8_t)(a2 + acc[i]);
        uint8_t d = a > z ? 1 : 0; z = std::max(z, a);
        d = b > z ? 2 : d; z = std::max(z, b);
        d = a2a > z ? 3 : d; z = std::max(z, a2a);
        u_[i] = (int8_t)(z - vt1[i]);
        v_[i] = (int8_t)(z - ut[i]);
        int8_t tmp = (int8_t)(z - q_);
        a = (int8_t)(a - tmp); b = (int8_t)(b - tmp);
        a2 = (int8_t)(a2 - (int8_t)(z - q2_));
        x_[i] = (int8_t)((a > 0 ? a : 0) - qe_);
        d |= a > 0 ? 0x08 : 0;
        y_[i] = (int8_t)((b > 0 ? b : 0) - qe_);
        d |= b > 0 ? 0x10 : 0;
        int8_t dn = don[i];
        bool gt = a2 > dn;
        x2_[i] = (int8_t)((gt ? a2 : dn) - q2_);
        d |= gt ? 0x20 : 0;
        prow[i] = d;
    }
}

static void srow_right(int64_t len, const int8_t* RST s_,
                       const int8_t* RST xt1, const int8_t* RST x2t1,
                       const int8_t* RST vt1, const int8_t* RST ut,
                       const int8_t* RST don, const int8_t* RST acc,
                       int8_t* RST u_, int8_t* RST v_, int8_t* RST x_,
                       int8_t* RST y_, int8_t* RST x2_, uint8_t* RST prow,
                       int8_t q_, int8_t q2_, int8_t qe_) {
    for (int64_t i0 = 0; i0 < len; i0 += 16)
    for (int64_t i = i0; i < i0 + 16; ++i) {
        int8_t z = s_[i];
        int8_t a = (int8_t)(xt1[i] + vt1[i]);
        int8_t b = (int8_t)(y_[i] + ut[i]);
        int8_t a2 = (int8_t)(x2t1[i] + vt1[i]);
        int8_t a2a = (int8_t)(a2 + acc[i]);
        uint8_t d = z > a ? 0 : 1; z = std::max(z, a);
        d = z > b ? d : 2; z = std::max(z, b);
        d = z > a2a ? d : 3; z = std::max(z, a2a);
        u_[i] = (int8_t)(z - vt1[i]);
        v_[i] = (int8_t)(z - ut[i]);
        int8_t tmp = (int8_t)(z - q_);
        a = (int8_t)(a - tmp); b = (int8_t)(b - tmp);
        a2 = (int8_t)(a2 - (int8_t)(z - q2_));
        x_[i] = (int8_t)((a >= 0 ? a : 0) - qe_);
        d |= a >= 0 ? 0x08 : 0;
        y_[i] = (int8_t)((b >= 0 ? b : 0) - qe_);
        d |= b >= 0 ? 0x10 : 0;
        int8_t dn = don[i];
        bool ge = a2 >= dn;
        x2_[i] = (int8_t)((ge ? a2 : dn) - q2_);
        d |= ge ? 0x20 : 0;
        prow[i] = d;
    }
}

static void srow_score(int64_t len, const int8_t* RST s_,
                       const int8_t* RST xt1, const int8_t* RST x2t1,
                       const int8_t* RST vt1, const int8_t* RST ut,
                       const int8_t* RST don, const int8_t* RST acc,
                       int8_t* RST u_, int8_t* RST v_, int8_t* RST x_,
                       int8_t* RST y_, int8_t* RST x2_,
                       int8_t q_, int8_t q2_, int8_t qe_) {
    for (int64_t i0 = 0; i0 < len; i0 += 16)
    for (int64_t i = i0; i < i0 + 16; ++i) {
        int8_t z = s_[i];
        int8_t a = (int8_t)(xt1[i] + vt1[i]);
        int8_t b = (int8_t)(y_[i] + ut[i]);
        int8_t a2 = (int8_t)(x2t1[i] + vt1[i]);
        int8_t a2a = (int8_t)(a2 + acc[i]);
        z = std::max(std::max(z, a), std::max(b, a2a));
        u_[i] = (int8_t)(z - vt1[i]);
        v_[i] = (int8_t)(z - ut[i]);
        int8_t tmp = (int8_t)(z - q_);
        a = (int8_t)(a - tmp); b = (int8_t)(b - tmp);
        a2 = (int8_t)(a2 - (int8_t)(z - q2_));
        x_[i] = (int8_t)((a > 0 ? a : 0) - qe_);
        y_[i] = (int8_t)((b > 0 ? b : 0) - qe_);
        int8_t dn = don[i];
        x2_[i] = (int8_t)((a2 > dn ? a2 : dn) - q2_);
    }
}

void exts2_one(const uint8_t* qseq, int64_t qlen, const uint8_t* tseq,
               int64_t tlen, const int8_t* mat, int q, int e, int q2,
               int noncan, int zdrop, int flag, Work& wk, EzOut& ez,
               uint32_t* cig, int64_t& n_cig) {
    const int m = 5;
    constexpr int KSW_EZ_SPLICE_FOR = 0x100;
    constexpr int KSW_EZ_SPLICE_REV = 0x200;
    constexpr int KSW_EZ_SPLICE_FLANK = 0x400;
    ez = EzOut{0, 0, -1, -1, KSW_NEG_INF, -1, KSW_NEG_INF, -1, KSW_NEG_INF,
               0, 0};
    n_cig = 0;
    if (qlen <= 0 || tlen <= 0 || q2 <= q + e) return;
    bool with_cigar = !(flag & KSW_EZ_SCORE_ONLY);
    bool approx_max = flag & KSW_EZ_APPROX_MAX;
    int8_t sc_mch = mat[0], sc_mis = mat[1], sc_N = (int8_t)(-e);
    int min_sc = 127;
    for (int i = 0; i < m * m; ++i) min_sc = std::min(min_sc, (int)mat[i]);
    if (-min_sc > 2 * (q + e)) return;

    int64_t long_thres = (q2 - q) / e - 1;
    if (q2 > q + e + long_thres * e) ++long_thres;
    int64_t long_diff = long_thres * e - (q2 - q);

    int64_t tlen16 = (tlen + 15) / 16 * 16;
    int64_t n_col = (std::min(qlen, tlen) + 15) / 16 * 16 + 16;

    // ping-pong u/v/x/x2 row pairs with front pad — same scheme and stale-cell
    // argument as extd2_one above (st/en monotone; carry cell patched at st-1)
    int64_t stride = tlen16 + 16;
    wk.u.assign(2 * stride, (int8_t)(-q - e));
    wk.v.assign(2 * stride, (int8_t)(-q - e));
    wk.x.assign(2 * stride, (int8_t)(-q - e));
    wk.y.assign(tlen16, (int8_t)(-q - e));
    wk.x2.assign(2 * stride, (int8_t)(-q2));
    wk.s.assign(tlen16 + 16, 0);
    int8_t *up = wk.u.data() + 16, *uc = wk.u.data() + stride + 16,
           *vp = wk.v.data() + 16, *vc = wk.v.data() + stride + 16,
           *xp = wk.x.data() + 16, *xc = wk.x.data() + stride + 16,
           *x2p = wk.x2.data() + 16, *x2c = wk.x2.data() + stride + 16,
           *y = wk.y.data(), *s = wk.s.data();
    // donor/acceptor signal arrays (reference ksw2_exts2_sse.c:112-131)
    static thread_local std::vector<int8_t> don_b, acc_b;
    don_b.assign(tlen16, 0);
    acc_b.assign(tlen16, 0);
    if (flag & (KSW_EZ_SPLICE_FOR | KSW_EZ_SPLICE_REV)) {
        // NB the golden model computes int(-noncan / 2) i.e. trunc toward 0
        int8_t semi = (flag & KSW_EZ_SPLICE_FLANK)
                          ? (int8_t)(-(noncan / 2)) : 0;
        std::fill(don_b.begin(), don_b.end(), (int8_t)(-noncan));
        for (int64_t t = 0; t < tlen - 4; ++t) {
            int can = 0;
            if ((flag & KSW_EZ_SPLICE_FOR) && tseq[t+1] == 2 && tseq[t+2] == 3)
                can = 1;
            if ((flag & KSW_EZ_SPLICE_REV) && tseq[t+1] == 1 && tseq[t+2] == 3)
                can = 1;
            if (can && (tseq[t+3] == 0 || tseq[t+3] == 2)) can = 2;
            if (can) don_b[t] = can == 2 ? 0 : semi;
        }
        std::fill(acc_b.begin(), acc_b.end(), (int8_t)(-noncan));
        for (int64_t t = 2; t < tlen; ++t) {
            int can = 0;
            if ((flag & KSW_EZ_SPLICE_FOR) && tseq[t-1] == 0 && tseq[t] == 2)
                can = 1;
            if ((flag & KSW_EZ_SPLICE_REV) && tseq[t-1] == 0 && tseq[t] == 1)
                can = 1;
            if (can && (tseq[t-2] == 1 || tseq[t-2] == 3)) can = 2;
            if (can) acc_b[t] = can == 2 ? 0 : semi;
        }
    }
    int64_t H0 = 0, last_H0_t = 0;
    int64_t* H = nullptr;
    if (!approx_max) {
        wk.H.assign(tlen16, KSW_NEG_INF);
        H = wk.H.data();
    }
    wk.sf.assign(tlen16 + 16, 0);
    memcpy(wk.sf.data(), tseq, tlen);
    wk.qr.assign(qlen + 32 + tlen16, 0);
    for (int64_t i = 0; i < qlen; ++i) wk.qr[i] = qseq[qlen - 1 - i];
    const uint8_t *sf = wk.sf.data(), *qr = wk.qr.data();

    uint8_t* p = nullptr;
    int32_t *off = nullptr, *off_end = nullptr;
    if (with_cigar) {
        if ((int64_t)wk.p.size() < (qlen + tlen - 1) * n_col)
            wk.p.resize((qlen + tlen - 1) * n_col);
        if ((int64_t)wk.off.size() < qlen + tlen - 1) {
            wk.off.resize(qlen + tlen - 1);
            wk.off_end.resize(qlen + tlen - 1);
        }
        p = wk.p.data(); off = wk.off.data(); off_end = wk.off_end.data();
    }
    bool right = flag & KSW_EZ_RIGHT;
    bool generic_sc = flag & KSW_EZ_GENERIC_SC;
    int64_t last_st = -1, last_en = -1;
    int8_t qe_ = (int8_t)(q + e), q_ = (int8_t)q, q2_ = (int8_t)q2;

    for (int64_t r = 0; r < qlen + tlen - 1; ++r) {
        int64_t st = std::max((int64_t)0, r - qlen + 1);
        int64_t en = std::min(tlen - 1, r);
        int64_t st0 = st, en0 = en;
        st = st / 16 * 16;
        en = (en + 16) / 16 * 16 - 1;
        int8_t x1, x21, v1;
        if (st > 0) {
            if (last_st <= st - 1 && st - 1 <= last_en) {
                x1 = xp[st-1]; x21 = x2p[st-1]; v1 = vp[st-1];
            } else {
                x1 = (int8_t)(-q - e); x21 = (int8_t)(-q2);
                v1 = (int8_t)(-q - e);
            }
        } else {
            x1 = (int8_t)(-q - e); x21 = (int8_t)(-q2);
            v1 = (int8_t)(r == 0 ? -q - e : r < long_thres ? -e
                          : r == long_thres ? long_diff : 0);
        }
        if (en >= r) {
            y[r] = (int8_t)(-q - e);
            up[r] = (int8_t)(r == 0 ? -q - e : r < long_thres ? -e
                             : r == long_thres ? long_diff : 0);
        }
        int64_t qrr = qlen - 1 - r;
        if (!generic_sc) {
            build_score_profile(sf, qr, qrr, s, st0, en0, sc_mch, sc_mis,
                                sc_N, m);
        } else {
            for (int64_t t = st0; t <= en0; ++t)
                s[t] = mat[sf[t] * m + qr[qrr + t]];
        }
        int64_t len = en - st + 1;
        xp[st-1] = x1; x2p[st-1] = x21; vp[st-1] = v1;
        if (with_cigar && !right) {
            srow_left(len, s + st, xp + st - 1, x2p + st - 1, vp + st - 1,
                      up + st, don_b.data() + st, acc_b.data() + st,
                      uc + st, vc + st, xc + st, y + st, x2c + st,
                      p + r * n_col, q_, q2_, qe_);
        } else if (with_cigar) {
            srow_right(len, s + st, xp + st - 1, x2p + st - 1, vp + st - 1,
                       up + st, don_b.data() + st, acc_b.data() + st,
                       uc + st, vc + st, xc + st, y + st, x2c + st,
                       p + r * n_col, q_, q2_, qe_);
        } else {
            srow_score(len, s + st, xp + st - 1, x2p + st - 1, vp + st - 1,
                       up + st, don_b.data() + st, acc_b.data() + st,
                       uc + st, vc + st, xc + st, y + st, x2c + st,
                       q_, q2_, qe_);
        }
        if (with_cigar) { off[r] = (int32_t)st; off_end[r] = (int32_t)en; }

        if (!approx_max) {
            int64_t max_H, max_t;
            if (r > 0) {
                if (en0 > 0) H[en0] = H[en0 - 1] + uc[en0];
                else H[en0] = H[en0] + vc[en0];
                max_H = H[en0]; max_t = en0;
                int64_t en1 = st0 + (en0 - st0) / 4 * 4;
                if (en1 > st0) h_band_update(H, vc, st0, en1, max_H, max_t);
                for (int64_t t = en1; t < en0; ++t) {
                    H[t] += vc[t];
                    if (H[t] > max_H) { max_H = H[t]; max_t = t; }
                }
            } else {
                H[0] = vc[0] - (q + e);
                max_H = H[0]; max_t = 0;
            }
            if (en0 == tlen - 1 && H[en0] > ez.mte) {
                ez.mte = H[en0]; ez.mte_q = r - en;
            }
            if (r - st0 == qlen - 1 && H[st0] > ez.mqe) {
                ez.mqe = H[st0]; ez.mqe_t = st0;
            }
            if (apply_zdrop(ez, max_H, r, max_t, zdrop, 0)) break;
            if (r == qlen + tlen - 2 && en0 == tlen - 1)
                ez.score = H[tlen - 1];
        } else {
            if (r > 0) {
                if (st0 <= last_H0_t && last_H0_t <= en0
                    && st0 <= last_H0_t + 1 && last_H0_t + 1 <= en0) {
                    int64_t d0 = vc[last_H0_t], d1 = uc[last_H0_t + 1];
                    if (d0 > d1) H0 += d0;
                    else { H0 += d1; ++last_H0_t; }
                } else if (st0 <= last_H0_t && last_H0_t <= en0) {
                    H0 += vc[last_H0_t];
                } else {
                    ++last_H0_t;
                    H0 += uc[last_H0_t];
                }
            } else {
                H0 = (int64_t)vc[0] - (q + e);
                last_H0_t = 0;
            }
            if ((flag & KSW_EZ_APPROX_DROP)
                && apply_zdrop(ez, H0, r, last_H0_t, zdrop, 0)) break;
            if (r == qlen + tlen - 2 && en0 == tlen - 1) ez.score = H0;
        }
        last_st = st; last_en = en;
        std::swap(up, uc); std::swap(vp, vc);
        std::swap(xp, xc); std::swap(x2p, x2c);
    }

    if (with_cigar) {
        bool rev_cigar = flag & KSW_EZ_REV_CIGAR;
        if (!ez.zdropped && !(flag & KSW_EZ_EXTZ_ONLY)) {
            backtrack_rot(p, off, off_end, n_col, tlen - 1, qlen - 1,
                          rev_cigar, cig, n_cig, long_thres);
        } else if (ez.max_t >= 0 && ez.max_q >= 0) {
            backtrack_rot(p, off, off_end, n_col, ez.max_t, ez.max_q,
                          rev_cigar, cig, n_cig, long_thres);
        }
    }
    ez.n_cigar = n_cig;
}

// mm_test_zdrop's scan half (align.c:46-66): walk a CIGAR accumulating the
// running score, tracking the max and the largest diagonal-adjusted drop.
// out[5] = {max_zdrop, t_start, t_end, q_start, q_end}.
static void zdrop_scan_one(const uint8_t* qseq, const uint8_t* tseq,
                           const uint32_t* cigar, int64_t n_cigar,
                           const int8_t* mat, int32_t q, int32_t e,
                           int64_t* out) {
    int64_t score = 0, maxv = -(1LL << 31), max_zdrop = 0;
    int64_t i = 0, j = 0, max_i = -1, max_j = -1;
    out[1] = out[2] = out[3] = out[4] = -1;
    auto upd = [&](int64_t ci, int64_t cj) {
        if (score < maxv) {
            int64_t li = ci - max_i, lj = cj - max_j;
            int64_t diff = li > lj ? li - lj : lj - li;
            int64_t z = maxv - score - diff * e;
            if (z > max_zdrop) {
                max_zdrop = z;
                out[1] = max_i; out[2] = ci + 1;
                out[3] = max_j; out[4] = cj + 1;
            }
        } else {
            maxv = score; max_i = ci; max_j = cj;
        }
    };
    for (int64_t k = 0; k < n_cigar; ++k) {
        uint32_t c = cigar[k];
        int op = c & 0xF;
        int64_t len = c >> 4;
        if (op == 0) {
            for (int64_t l = 0; l < len; ++l) {
                score += mat[tseq[i + l] * 5 + qseq[j + l]];
                upd(i + l, j + l);
            }
            i += len; j += len;
        } else if (op == 1 || op == 2 || op == 3) {
            score -= q + e * len;
            if (op == 1) j += len; else i += len;
            upd(i, j);
        }
    }
    out[0] = max_zdrop;
}

}  // namespace

extern "C" {

// Batch driver: seqs packed into one uint8 buffer with per-job offsets
// (qseq then tseq per job); params per job int32 {w, zdrop, end_bonus,
// flag}; results: ez_out is (n, 11) int64 rows, cigars written at
// cig_offs[i] into cig_buf (caller sizes it as sum(qlen+tlen+4)).
// zwant/zout (both may be null): jobs with zwant[i] != 0 additionally get
// the mm_test_zdrop scan run on their result CIGAR (fused here so the
// pipeline needs no second native call per fill job), 5 int64 per job.
void mm2tpu_extd2_batch(
    const uint8_t* seq_buf, const int64_t* qoff, const int64_t* toff,
    int64_t n_jobs, const int32_t* params, const int8_t* mat,
    int32_t q, int32_t e, int32_t q2, int32_t e2,
    int64_t* ez_out, uint32_t* cig_buf, const int64_t* cig_offs,
    int64_t* cig_lens, const uint8_t* zwant, int64_t* zout)
{
    Work wk;
    for (int64_t i = 0; i < n_jobs; ++i) {
        const uint8_t* qs = seq_buf + qoff[i];
        int64_t qlen = toff[i] - qoff[i];
        const uint8_t* ts = seq_buf + toff[i];
        int64_t tlen = qoff[i + 1] - toff[i];
        EzOut ez;
        int64_t n_cig = 0;
        extd2_one(qs, qlen, ts, tlen, mat, q, e, q2, e2,
                  params[4*i], params[4*i+1], params[4*i+2], params[4*i+3],
                  wk, ez, cig_buf + cig_offs[i], n_cig);
        int64_t* row = ez_out + 11 * i;
        row[0] = ez.max; row[1] = ez.zdropped; row[2] = ez.max_q;
        row[3] = ez.max_t; row[4] = ez.mqe; row[5] = ez.mqe_t;
        row[6] = ez.mte; row[7] = ez.mte_q; row[8] = ez.score;
        row[9] = ez.reach_end; row[10] = n_cig;
        cig_lens[i] = n_cig;
        if (zwant && zwant[i])
            zdrop_scan_one(qs, ts, cig_buf + cig_offs[i], n_cig, mat, q, e,
                           zout + 5 * i);
    }
}

// Splice batch driver: params per job int32 {zdrop, flag} (unbanded, no w /
// end_bonus); otherwise the same packing contract as mm2tpu_extd2_batch.
void mm2tpu_exts2_batch(
    const uint8_t* seq_buf, const int64_t* qoff, const int64_t* toff,
    int64_t n_jobs, const int32_t* params, const int8_t* mat,
    int32_t q, int32_t e, int32_t q2, int32_t noncan,
    int64_t* ez_out, uint32_t* cig_buf, const int64_t* cig_offs,
    int64_t* cig_lens)
{
    Work wk;
    for (int64_t i = 0; i < n_jobs; ++i) {
        const uint8_t* qs = seq_buf + qoff[i];
        int64_t qlen = toff[i] - qoff[i];
        const uint8_t* ts = seq_buf + toff[i];
        int64_t tlen = qoff[i + 1] - toff[i];
        EzOut ez;
        int64_t n_cig = 0;
        exts2_one(qs, qlen, ts, tlen, mat, q, e, q2, noncan,
                  params[2*i], params[2*i+1], wk, ez,
                  cig_buf + cig_offs[i], n_cig);
        int64_t* row = ez_out + 11 * i;
        row[0] = ez.max; row[1] = ez.zdropped; row[2] = ez.max_q;
        row[3] = ez.max_t; row[4] = ez.mqe; row[5] = ez.mqe_t;
        row[6] = ez.mte; row[7] = ez.mte_q; row[8] = ez.score;
        row[9] = ez.reach_end; row[10] = n_cig;
        cig_lens[i] = n_cig;
    }
}

}  // extern "C"
