// Native host epilogue for the alignment stage.
//
// These are the per-region CIGAR/anchor scan loops that run on the host
// after the device kernels — the equivalents of the reference's
// mm_test_zdrop (align.c:46-88), mm_update_extra (align.c:148-193),
// mm_est_err's anchor/minimizer merge (esterr.c:16-64), and the fuzzy
// mlen/blen accumulation (hit.c:8-21). Python drives the control flow and
// keeps all float32 math (divergence log) so output stays bit-identical;
// C++ does the integer scans, which dominate host time at large batch
// sizes. C ABI via ctypes (no pybind11 in this image).
#include <cstdint>
#include <cstdlib>

extern "C" {

// ---- mm_test_zdrop scan (align.c:46-73): returns max_zdrop; writes the
// t/q break coordinates into pos[4] = {t_st, t_en, q_st, q_en}.
int64_t mm2tpu_zdrop_scan(
    const uint8_t* qseq, const uint8_t* tseq,
    const uint32_t* cigar, int64_t n_cigar,
    const int8_t* mat /*25*/, int32_t q, int32_t e, int32_t* pos)
{
    int64_t score = 0, maxv = -(1LL << 31), max_zdrop = 0;
    int64_t i = 0, j = 0, max_i = -1, max_j = -1;
    pos[0] = pos[1] = pos[2] = pos[3] = -1;
    auto upd = [&](int64_t ci, int64_t cj) {
        if (score < maxv) {
            int64_t li = ci - max_i, lj = cj - max_j;
            int64_t diff = li > lj ? li - lj : lj - li;
            int64_t z = maxv - score - diff * e;
            if (z > max_zdrop) {
                max_zdrop = z;
                pos[0] = (int32_t)max_i; pos[1] = (int32_t)(ci + 1);
                pos[2] = (int32_t)max_j; pos[3] = (int32_t)(cj + 1);
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
    return max_zdrop;
}

// ---- mm_update_extra scan (align.c:155-192), after fix_cigar: running
// clamped score, blen/mlen/n_ambi accumulation.  out[5] =
// {blen, mlen, n_ambi, dp_max, ok(toff/qoff==expected)}.
void mm2tpu_update_extra_scan(
    const uint8_t* qseq, const uint8_t* tseq,
    const uint32_t* cigar, int64_t n_cigar,
    const int8_t* mat /*25*/, int32_t q, int32_t e,
    int64_t exp_qoff, int64_t exp_toff, int64_t* out)
{
    int64_t blen = 0, mlen = 0, n_ambi_tot = 0;
    int64_t toff = 0, qoff = 0, s = 0, maxv = 0;
    for (int64_t k = 0; k < n_cigar; ++k) {
        uint32_t c = cigar[k];
        int op = c & 0xF;
        int64_t len = c >> 4;
        if (op == 0) {
            int64_t n_ambi = 0, n_diff = 0;
            for (int64_t l = 0; l < len; ++l) {
                uint8_t ct = tseq[toff + l], cq = qseq[qoff + l];
                if (ct > 3 || cq > 3) ++n_ambi;
                else if (ct != cq) ++n_diff;
                s += mat[ct * 5 + cq];
                if (s < 0) s = 0;
                else if (s > maxv) maxv = s;
            }
            blen += len - n_ambi;
            mlen += len - (n_ambi + n_diff);
            n_ambi_tot += n_ambi;
            toff += len; qoff += len;
        } else if (op == 1) {
            int64_t n_ambi = 0;
            for (int64_t l = 0; l < len; ++l)
                if (qseq[qoff + l] > 3) ++n_ambi;
            blen += len - n_ambi; n_ambi_tot += n_ambi;
            s -= q + e * len; if (s < 0) s = 0;
            qoff += len;
        } else if (op == 2) {
            int64_t n_ambi = 0;
            for (int64_t l = 0; l < len; ++l)
                if (tseq[toff + l] > 3) ++n_ambi;
            blen += len - n_ambi; n_ambi_tot += n_ambi;
            s -= q + e * len; if (s < 0) s = 0;
            toff += len;
        } else if (op == 3) {
            toff += len;
        }
    }
    out[0] = blen; out[1] = mlen; out[2] = n_ambi_tot; out[3] = maxv;
    out[4] = (qoff == exp_qoff && toff == exp_toff) ? 1 : 0;
}

static inline int64_t qpos_of(int64_t qlen, uint64_t ax, uint64_t ay)
{
    int64_t x = (int32_t)(ay & 0xFFFFFFFFu);
    int64_t q_span = (ay >> 32) & 0xFF;
    if (ax >> 63) x = qlen - 1 - (x + 1 - q_span);
    return x;
}

// ---- mm_est_err per-region merge (esterr.c:16-47): counts the chain's
// anchors whose query positions appear in the sorted minimizer-position
// list.  Returns 1 and fills out[3] = {st_found_en, n_match, n_tot_base}
// when the first anchor's position is present, else 0 (div stays -1).
// The float32 log arithmetic stays in Python (bit-exact dv:f output).
int32_t mm2tpu_est_err_merge(
    const uint64_t* ax, const uint64_t* ay, int64_t as, int64_t cnt,
    int32_t rev, int64_t qlen, const int64_t* mp_lo, int64_t n_mp,
    int64_t* out)
{
    if (cnt <= 0) return 0;
    int64_t k0 = rev ? as + cnt - 1 : as;
    int64_t x = qpos_of(qlen, ax[k0], ay[k0]);
    // lower_bound
    int64_t lo = 0, hi = n_mp;
    while (lo < hi) {
        int64_t mid = (lo + hi) >> 1;
        if (mp_lo[mid] < x) lo = mid + 1; else hi = mid;
    }
    int64_t st = lo;
    if (st >= n_mp || mp_lo[st] != x) return 0;
    int64_t en = st, n_match = 1, k = 1, j = st + 1;
    while (j < n_mp && k < cnt) {
        int64_t ki = rev ? as + cnt - 1 - k : as + k;
        x = qpos_of(qlen, ax[ki], ay[ki]);
        if (x == mp_lo[j]) { ++k; en = j; ++n_match; }
        ++j;
    }
    out[0] = en - st + 1;   // n_tot before the end-window bumps
    out[1] = n_match;
    return 1;
}

// ---- fuzzy mlen/blen from anchor gaps (hit.c:8-21). a is the interleaved
// (n, 2) anchor array (x, y rows). out[2] = {mlen, blen}.
void mm2tpu_cal_fuzzy_len(
    const uint64_t* a, int64_t as, int64_t cnt, int64_t* out)
{
    int64_t mlen = 0, blen = 0;
    if (cnt > 0) {
        mlen = blen = (int64_t)((a[2 * as + 1] >> 32) & 0xFF);
        for (int64_t i = as + 1; i < as + cnt; ++i) {
            uint64_t x = a[2 * i], y = a[2 * i + 1];
            uint64_t xp = a[2 * (i - 1)], yp = a[2 * (i - 1) + 1];
            int64_t span = (int64_t)((y >> 32) & 0xFF);
            int64_t tl = (int64_t)(uint32_t)x - (int64_t)(uint32_t)xp;
            int64_t ql = (int64_t)(uint32_t)y - (int64_t)(uint32_t)yp;
            blen += tl > ql ? tl : ql;
            mlen += (tl > span && ql > span) ? span : (tl < ql ? tl : ql);
        }
    }
    out[0] = mlen; out[1] = blen;
}

}  // extern "C"
