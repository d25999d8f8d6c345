// Oracle shim over align.c's STATIC epilogue helpers (mm_fix_cigar,
// mm_update_extra, align.c:90-193): the whole translation unit is included
// so the statics are visible, then thin flat-array marshalling wrappers are
// exported for ctypes. Built into .golden/libhit_oracle.so alongside
// hit_test.c (golden/build_reference.sh).
#include "align.c"

// Link-time stubs for main.c/map.c globals pulled in via kthread.c /
// index.c / fpga_stub.c (perf-counter arrays, the software-FPGA-model
// globals) — never executed by the oracle entry points below.
double send_task1[100], send_task2[100], process_result[100];
struct mm_idx_bucket_s *g_B = 0;
int32_t g_b = 0;
void *fpga_work(void *buf, int size, int *result_size)
{ (void)buf; (void)size; (void)result_size; abort(); }

// update_extra (which runs fix_cigar first, align.c:153): takes a region's
// coordinates {qs, qe, rs, re, rev}, its CIGAR, and the already-extracted
// qseq/tseq windows (qseq[0..qe-qs), tseq[0..re-rs)). Writes
// out[9] = {qs, qe, rs, re, blen, mlen, n_ambi, dp_max, n_cigar} and the
// fixed CIGAR into out_cigar. mat is the 25-entry scoring matrix.
void align_oracle_update_extra(int64_t qs, int64_t qe, int64_t rs,
                               int64_t re, int64_t rev,
                               const uint32_t *cigar, int64_t n_cigar,
                               const uint8_t *qseq, const uint8_t *tseq,
                               const int8_t *mat, int64_t q, int64_t e,
                               int64_t *out, uint32_t *out_cigar)
{
    mm_reg1_t r;
    memset(&r, 0, sizeof(r));
    r.qs = (int32_t)qs; r.qe = (int32_t)qe;
    r.rs = (int32_t)rs; r.re = (int32_t)re;
    r.rev = rev ? 1 : 0;
    r.p = (mm_extra_t*)calloc(1, sizeof(mm_extra_t) + n_cigar * 4);
    r.p->capacity = (uint32_t)n_cigar;
    r.p->n_cigar = (uint32_t)n_cigar;
    memcpy(r.p->cigar, cigar, n_cigar * 4);
    mm_update_extra(&r, qseq, tseq, mat, (int8_t)q, (int8_t)e);
    out[0] = r.qs; out[1] = r.qe; out[2] = r.rs; out[3] = r.re;
    out[4] = r.blen; out[5] = r.mlen; out[6] = r.p->n_ambi;
    out[7] = r.p->dp_max; out[8] = r.p->n_cigar;
    memcpy(out_cigar, r.p->cigar, r.p->n_cigar * 4);
    free(r.p);
}

// fix_cigar alone: same inputs; writes out[7] = {qs, qe, rs, re, qshift,
// tshift, n_cigar} and the fixed CIGAR.
void align_oracle_fix_cigar(int64_t qs, int64_t qe, int64_t rs, int64_t re,
                            int64_t rev, const uint32_t *cigar,
                            int64_t n_cigar, const uint8_t *qseq,
                            const uint8_t *tseq, int64_t *out,
                            uint32_t *out_cigar)
{
    mm_reg1_t r;
    int qshift, tshift;
    memset(&r, 0, sizeof(r));
    r.qs = (int32_t)qs; r.qe = (int32_t)qe;
    r.rs = (int32_t)rs; r.re = (int32_t)re;
    r.rev = rev ? 1 : 0;
    r.p = (mm_extra_t*)calloc(1, sizeof(mm_extra_t) + n_cigar * 4);
    r.p->capacity = (uint32_t)n_cigar;
    r.p->n_cigar = (uint32_t)n_cigar;
    memcpy(r.p->cigar, cigar, n_cigar * 4);
    mm_fix_cigar(&r, qseq, tseq, &qshift, &tshift);
    out[0] = r.qs; out[1] = r.qe; out[2] = r.rs; out[3] = r.re;
    out[4] = qshift; out[5] = tshift; out[6] = r.p->n_cigar;
    memcpy(out_cigar, r.p->cigar, r.p->n_cigar * 4);
    free(r.p);
}

// mm_filter_bad_seeds oracle: anchors (2n u64, in-place y update with
// MM_SEED_IGNORE marks).
void align_oracle_filter_bad_seeds(uint64_t *anch, int64_t n,
                                   int64_t min_gap, int64_t diff_thres,
                                   int64_t max_ext_len, int64_t max_ext_cnt)
{
    mm128_t *a = (mm128_t*)malloc(n * sizeof(mm128_t));
    for (int64_t i = 0; i < n; ++i) {
        a[i].x = anch[2 * i];
        a[i].y = anch[2 * i + 1];
    }
    mm_filter_bad_seeds(0, 0, (int)n, a, (int)min_gap, (int)diff_thres,
                        (int)max_ext_len, (int)max_ext_cnt);
    for (int64_t i = 0; i < n; ++i)
        anch[2 * i + 1] = a[i].y;
    free(a);
}

// mm_fix_bad_ends oracle: region {as, cnt, mlen} + anchors -> new as/cnt.
void align_oracle_fix_bad_ends(int64_t as, int64_t cnt, int64_t mlen,
                               const uint64_t *anch, int64_t n_a,
                               int64_t bw, int64_t min_match, int64_t *out)
{
    mm_reg1_t r;
    memset(&r, 0, sizeof(r));
    r.as = (int32_t)as; r.cnt = (int32_t)cnt; r.mlen = (int32_t)mlen;
    mm128_t *a = (mm128_t*)malloc(n_a * sizeof(mm128_t));
    for (int64_t i = 0; i < n_a; ++i) {
        a[i].x = anch[2 * i];
        a[i].y = anch[2 * i + 1];
    }
    int32_t as1, cnt1;
    mm_fix_bad_ends(&r, a, (int)bw, (int)min_match, &as1, &cnt1);
    out[0] = as1; out[1] = cnt1;
    free(a);
}

// mm_adjust_minier oracle: one anchor against a 1-seq index built from raw
// target bases (packed 4-bit like mm_idx_t::S) + fwd/rev query encodings.
// The anchor's rid bits must be 0.
void align_oracle_adjust_minier(const uint8_t *tbases, int64_t tlen,
                                const uint8_t *qfwd, const uint8_t *qrev,
                                uint64_t ax, uint64_t ay, int64_t k,
                                int64_t is_hpc, int64_t *out)
{
    mm_idx_t mi;
    mm_idx_seq_t seq;
    memset(&mi, 0, sizeof(mi));
    memset(&seq, 0, sizeof(seq));
    seq.offset = 0;
    seq.len = (uint32_t)tlen;
    mi.k = (int32_t)k;
    mi.flag = is_hpc ? MM_I_HPC : 0;
    mi.seq = &seq;
    mi.n_seq = 1;
    uint32_t *S = (uint32_t*)calloc((tlen + 7) / 8, 4);
    for (int64_t i = 0; i < tlen; ++i)
        S[i >> 3] |= (uint32_t)(tbases[i] & 0xf) << ((i & 7) << 2);
    mi.S = S;
    uint8_t *qseq0[2] = {(uint8_t*)qfwd, (uint8_t*)qrev};
    mm128_t a1;
    a1.x = ax; a1.y = ay;
    int32_t r, q;
    mm_adjust_minier(&mi, qseq0, &a1, &r, &q);
    out[0] = r; out[1] = q;
    free(S);
}

// mm_test_zdrop oracle: returns 0/1/2 (no drop / zdrop / potential
// inversion, align.c:46-88 incl. the ksw_ll_i16 inversion probe).
int64_t align_oracle_test_zdrop(const uint8_t *qseq, const uint8_t *tseq,
                                const uint32_t *cigar, int64_t n_cigar,
                                const int8_t *mat, int64_t q, int64_t e,
                                int64_t zdrop, int64_t zdrop_inv,
                                int64_t max_gap, int64_t min_chain_score,
                                int64_t min_dp_max, int64_t match_a,
                                int64_t flag)
{
    mm_mapopt_t opt;
    memset(&opt, 0, sizeof(opt));
    opt.q = (int)q; opt.e = (int)e;
    opt.zdrop = (int)zdrop; opt.zdrop_inv = (int)zdrop_inv;
    opt.max_gap = (int)max_gap;
    opt.min_chain_score = (int)min_chain_score;
    opt.min_dp_max = (int)min_dp_max;
    opt.a = (int)match_a;
    opt.flag = flag;
    uint32_t *cig = (uint32_t*)malloc(n_cigar * 4);
    memcpy(cig, cigar, n_cigar * 4);
    int ret = mm_test_zdrop(0, &opt, qseq, tseq, (uint32_t)n_cigar, cig,
                            mat);
    free(cig);
    return ret;
}
