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
