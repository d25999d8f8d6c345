// Oracle shim over the reference's hit.c/pe.c epilogue functions: builds
// mm_reg1_t arrays from flat int64 rows and runs mm_set_mapq /
// mm_select_sub / mm_select_sub_multi / mm_split_reg so the Python/native
// ports can be fuzz-compared against the real reference semantics
// (including its in-place compaction aliasing and float32 arithmetic).
//
// Row layout (15 int64 per region):
//   0 id, 1 cnt, 2 rid, 3 score, 4 qs, 5 qe, 6 rs, 7 re, 8 parent,
//   9 subsc, 10 mlen, 11 blen, 12 n_sub, 13 score0, 14 as
// plus per-region (4 int64): dp_max, dp_max2, has_p, rev
#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include "minimap.h"

void mm_set_mapq(void *km, int n_regs, mm_reg1_t *regs, int min_chain_sc,
                 int match_sc, int rep_len, int is_sr);
void mm_select_sub(void *km, float pri_ratio, int min_diff, int best_n,
                   int *n_, mm_reg1_t *r);
void mm_select_sub_multi(void *km, float pri_ratio, float pri1, float pri2,
                         int max_gap_ref, int min_diff, int best_n,
                         int n_segs, const int *qlens, int *n_, mm_reg1_t *r);

static void fill(mm_reg1_t *r, const int64_t *row, const int64_t *aux)
{
    memset(r, 0, sizeof(*r));
    r->id = row[0]; r->cnt = row[1]; r->rid = row[2]; r->score = row[3];
    r->qs = row[4]; r->qe = row[5]; r->rs = row[6]; r->re = row[7];
    r->parent = row[8]; r->subsc = row[9]; r->mlen = row[10];
    r->blen = row[11]; r->n_sub = row[12]; r->score0 = row[13];
    r->as = row[14];
    r->rev = aux[3] ? 1 : 0;
    if (aux[2]) {
        r->p = (mm_extra_t*)calloc(1, sizeof(mm_extra_t));
        r->p->dp_max = (int32_t)aux[0];
        r->p->dp_max2 = (int32_t)aux[1];
    }
}

// returns mapq per input region into out_mapq
void hit_oracle_set_mapq(const int64_t *rows, const int64_t *auxs,
                         int64_t n, int64_t min_chain_sc, int64_t match_sc,
                         int64_t rep_len, int64_t is_sr, int64_t *out_mapq)
{
    mm_reg1_t *regs = (mm_reg1_t*)calloc(n, sizeof(mm_reg1_t));
    for (int64_t i = 0; i < n; ++i)
        fill(&regs[i], rows + 15 * i, auxs + 4 * i);
    mm_set_mapq(0, (int)n, regs, (int)min_chain_sc, (int)match_sc,
                (int)rep_len, (int)is_sr);
    for (int64_t i = 0; i < n; ++i) {
        out_mapq[i] = regs[i].mapq;
        free(regs[i].p);
    }
    free(regs);
}

// runs select_sub; writes surviving region ids; returns survivor count
int64_t hit_oracle_select_sub(const int64_t *rows, const int64_t *auxs,
                              int64_t n, double pri_ratio, int64_t min_diff,
                              int64_t best_n, int64_t *out_ids)
{
    mm_reg1_t *regs = (mm_reg1_t*)calloc(n, sizeof(mm_reg1_t));
    for (int64_t i = 0; i < n; ++i)
        fill(&regs[i], rows + 15 * i, auxs + 4 * i);
    int nn = (int)n;
    mm_select_sub(0, (float)pri_ratio, (int)min_diff, (int)best_n,
                  &nn, regs);
    for (int i = 0; i < nn; ++i) {
        out_ids[i] = regs[i].id;
        free(regs[i].p);
    }
    free(regs);
    return nn;
}

int64_t hit_oracle_select_sub_multi(
    const int64_t *rows, const int64_t *auxs, int64_t n, double pri_ratio,
    double pri1, double pri2, int64_t max_gap_ref, int64_t min_diff,
    int64_t best_n, int64_t n_segs, const int64_t *qlens64,
    int64_t *out_ids)
{
    mm_reg1_t *regs = (mm_reg1_t*)calloc(n, sizeof(mm_reg1_t));
    int qlens[2] = {(int)qlens64[0], (int)qlens64[1]};
    for (int64_t i = 0; i < n; ++i)
        fill(&regs[i], rows + 15 * i, auxs + 4 * i);
    int nn = (int)n;
    mm_select_sub_multi(0, (float)pri_ratio, (float)pri1, (float)pri2,
                        (int)max_gap_ref, (int)min_diff, (int)best_n,
                        (int)n_segs, qlens, &nn, regs);
    for (int i = 0; i < nn; ++i) {
        out_ids[i] = regs[i].id;
        free(regs[i].p);
    }
    free(regs);
    return nn;
}

void mm_set_parent(void *km, float mask_level, int n, mm_reg1_t *r,
                   int sub_diff);
void mm_pair(void *km, int max_gap_ref, int pe_bonus, int sub_diff,
             int match_sc, const int *qlens, int *n_regs, mm_reg1_t **regs);

// set_parent: returns parent and subsc per region (input order preserved)
void hit_oracle_set_parent(const int64_t *rows, const int64_t *auxs,
                           int64_t n, double mask_level, int64_t sub_diff,
                           int64_t *out_parent, int64_t *out_subsc)
{
    mm_reg1_t *regs = (mm_reg1_t*)calloc(n, sizeof(mm_reg1_t));
    for (int64_t i = 0; i < n; ++i)
        fill(&regs[i], rows + 15 * i, auxs + 4 * i);
    mm_set_parent(0, (float)mask_level, (int)n, regs, (int)sub_diff);
    for (int64_t i = 0; i < n; ++i) {
        out_parent[i] = regs[i].parent;
        out_subsc[i] = regs[i].subsc;
        free(regs[i].p);
    }
    free(regs);
}

// mm_pair: two region sets; pair-aux stride 6:
// {dp_max, dp_max2, has_p, rev, hash, mapq}. Returns final mapq and
// proper_frag per region of each segment.
void hit_oracle_pair(const int64_t *rows0, const int64_t *auxs0, int64_t n0,
                     const int64_t *rows1, const int64_t *auxs1, int64_t n1,
                     int64_t max_gap_ref, int64_t pe_bonus,
                     int64_t sub_diff, int64_t match_sc,
                     const int64_t *qlens64,
                     int64_t *out_mapq0, int64_t *out_pf0,
                     int64_t *out_mapq1, int64_t *out_pf1)
{
    mm_reg1_t *r0 = (mm_reg1_t*)calloc(n0, sizeof(mm_reg1_t));
    mm_reg1_t *r1 = (mm_reg1_t*)calloc(n1, sizeof(mm_reg1_t));
    for (int64_t i = 0; i < n0; ++i) {
        fill(&r0[i], rows0 + 15 * i, auxs0 + 6 * i);
        r0[i].hash = (uint32_t)auxs0[6 * i + 4];
        r0[i].mapq = (uint32_t)auxs0[6 * i + 5];
    }
    for (int64_t i = 0; i < n1; ++i) {
        fill(&r1[i], rows1 + 15 * i, auxs1 + 6 * i);
        r1[i].hash = (uint32_t)auxs1[6 * i + 4];
        r1[i].mapq = (uint32_t)auxs1[6 * i + 5];
    }
    int qlens[2] = {(int)qlens64[0], (int)qlens64[1]};
    int n_regs[2] = {(int)n0, (int)n1};
    mm_reg1_t *regs[2] = {r0, r1};
    mm_pair(0, (int)max_gap_ref, (int)pe_bonus, (int)sub_diff,
            (int)match_sc, qlens, n_regs, regs);
    for (int64_t i = 0; i < n0; ++i) {
        out_mapq0[i] = r0[i].mapq; out_pf0[i] = r0[i].proper_frag;
        free(r0[i].p);
    }
    for (int64_t i = 0; i < n1; ++i) {
        out_mapq1[i] = r1[i].mapq; out_pf1[i] = r1[i].proper_frag;
        free(r1[i].p);
    }
    free(r0); free(r1);
}

mm_reg1_t *mm_gen_regs(void *km, uint32_t hash, int qlen, int n_u,
                       uint64_t *u, mm128_t *a);
void mm_join_long(void *km, const mm_mapopt_t *opt, int qlen, int *n_regs_,
                  mm_reg1_t *regs, mm128_t *a);

// gen_regs: u (n_u u64 score<<32|cnt), anchors (2*n_a u64 x,y rows).
// Writes per output region 10 int64: score, cnt, as, rid, rev, qs, qe,
// rs, re, hash. Returns region count.
int64_t hit_oracle_gen_regs(uint64_t hash, int64_t qlen, int64_t n_u,
                            const uint64_t *u, const uint64_t *anch,
                            int64_t n_a, int64_t *out)
{
    uint64_t *uu = (uint64_t*)malloc(n_u * 8);
    memcpy(uu, u, n_u * 8);
    mm128_t *a = (mm128_t*)malloc(n_a * sizeof(mm128_t));
    for (int64_t i = 0; i < n_a; ++i) {
        a[i].x = anch[2 * i];
        a[i].y = anch[2 * i + 1];
    }
    mm_reg1_t *r = mm_gen_regs(0, (uint32_t)hash, (int)qlen, (int)n_u,
                               uu, a);
    for (int64_t i = 0; i < n_u; ++i) {
        int64_t *o = out + 10 * i;
        o[0] = r[i].score; o[1] = r[i].cnt; o[2] = r[i].as;
        o[3] = r[i].rid; o[4] = r[i].rev; o[5] = r[i].qs; o[6] = r[i].qe;
        o[7] = r[i].rs; o[8] = r[i].re; o[9] = r[i].hash;
    }
    free(r); free(a); free(uu);
    return n_u;
}

// join_long: regions (14-row layout + stride-4 aux) + anchors; opt fields
// passed explicitly. Writes surviving ids + per-survivor score/cnt/parent;
// returns survivor count.
int64_t hit_oracle_join_long(const int64_t *rows, const int64_t *auxs,
                             int64_t n, const uint64_t *anch, int64_t n_a,
                             int64_t qlen, int64_t max_join_long,
                             int64_t max_join_short,
                             int64_t min_join_flank_sc, int64_t min_cnt,
                             int64_t min_chain_score, int64_t min_dp_max,
                             double max_clip_ratio, int64_t *out)
{
    mm_mapopt_t opt;
    memset(&opt, 0, sizeof(opt));
    opt.max_join_long = (int)max_join_long;
    opt.max_join_short = (int)max_join_short;
    opt.min_join_flank_sc = (int)min_join_flank_sc;
    opt.min_cnt = (int)min_cnt;
    opt.min_chain_score = (int)min_chain_score;
    opt.min_dp_max = (int)min_dp_max;
    opt.max_clip_ratio = (float)max_clip_ratio;
    mm_reg1_t *regs = (mm_reg1_t*)calloc(n, sizeof(mm_reg1_t));
    for (int64_t i = 0; i < n; ++i)
        fill(&regs[i], rows + 15 * i, auxs + 4 * i);
    mm128_t *a = (mm128_t*)malloc(n_a * sizeof(mm128_t));
    for (int64_t i = 0; i < n_a; ++i) {
        a[i].x = anch[2 * i];
        a[i].y = anch[2 * i + 1];
    }
    int nn = (int)n;
    mm_join_long(0, &opt, (int)qlen, &nn, regs, a);
    for (int i = 0; i < nn; ++i) {
        int64_t *o = out + 6 * i;
        o[0] = regs[i].id; o[1] = regs[i].score; o[2] = regs[i].cnt;
        o[3] = regs[i].parent; o[4] = regs[i].qs; o[5] = regs[i].qe;
        free(regs[i].p);
    }
    free(regs); free(a);
    return nn;
}

void mm_est_err(const mm_idx_t *mi, int qlen, int n_regs, mm_reg1_t *regs,
                const mm128_t *a, int32_t n, const uint64_t *mini_pos);

// est_err: regions (15-row + stride-4 aux), anchors, mini_pos, per-rid
// reference lengths. Writes each region's div as its raw float bits.
void hit_oracle_est_err(const int64_t *rows, const int64_t *auxs, int64_t nr,
                        const uint64_t *anch, int64_t n_a,
                        const uint64_t *mini_pos, int64_t n_mini,
                        const int64_t *rid_lens, int64_t n_rid,
                        int64_t qlen, int64_t *out_div_bits)
{
    mm_reg1_t *regs = (mm_reg1_t*)calloc(nr, sizeof(mm_reg1_t));
    for (int64_t i = 0; i < nr; ++i)
        fill(&regs[i], rows + 15 * i, auxs + 4 * i);
    mm128_t *a = (mm128_t*)malloc(n_a * sizeof(mm128_t));
    for (int64_t i = 0; i < n_a; ++i) {
        a[i].x = anch[2 * i];
        a[i].y = anch[2 * i + 1];
    }
    mm_idx_t idx;
    memset(&idx, 0, sizeof(idx));
    mm_idx_seq_t *seq = (mm_idx_seq_t*)calloc(n_rid, sizeof(mm_idx_seq_t));
    for (int64_t i = 0; i < n_rid; ++i) seq[i].len = (uint32_t)rid_lens[i];
    idx.seq = seq;
    idx.n_seq = (uint32_t)n_rid;
    mm_est_err(&idx, (int)qlen, (int)nr, regs, a, (int32_t)n_mini,
               mini_pos);
    for (int64_t i = 0; i < nr; ++i) {
        union { float f; uint32_t u; } v;
        v.f = regs[i].div;
        out_div_bits[i] = v.u;
        free(regs[i].p);
    }
    free(regs); free(a); free(seq);
}

#include "mmpriv.h"

// mm_sketch oracle: emits (x, y) u64 pairs for one sequence.
// Returns the minimizer count (caller provides a generous out buffer).
int64_t hit_oracle_sketch(const char *seq, int64_t len, int64_t w,
                          int64_t k, int64_t rid, int64_t is_hpc,
                          uint64_t *out, int64_t cap)
{
    mm128_v v = {0, 0, 0};
    mm_sketch(0, seq, (int)len, (int)w, (int)k, (uint32_t)rid,
              (int)is_hpc, &v);
    int64_t n = (int64_t)v.n < cap / 2 ? (int64_t)v.n : cap / 2;
    for (int64_t i = 0; i < n; ++i) {
        out[2 * i] = v.a[i].x;
        out[2 * i + 1] = v.a[i].y;
    }
    free(v.a);
    return (int64_t)v.n;
}

// mm_filter_regs oracle: rows + stride-4 aux + per-region flag bits
// {bit0 inv, bit1 seg_split}. Writes surviving ids; returns survivor count.
int64_t hit_oracle_filter_regs(const int64_t *rows, const int64_t *auxs,
                               const int64_t *flags, int64_t n, int64_t qlen,
                               int64_t min_cnt, int64_t min_chain_score,
                               int64_t min_dp_max, double max_clip_ratio,
                               int64_t *out_ids)
{
    mm_mapopt_t opt;
    memset(&opt, 0, sizeof(opt));
    opt.min_cnt = (int)min_cnt;
    opt.min_chain_score = (int)min_chain_score;
    opt.min_dp_max = (int)min_dp_max;
    opt.max_clip_ratio = (float)max_clip_ratio;
    mm_reg1_t *regs = (mm_reg1_t*)calloc(n, sizeof(mm_reg1_t));
    for (int64_t i = 0; i < n; ++i) {
        fill(&regs[i], rows + 15 * i, auxs + 4 * i);
        regs[i].inv = flags[i] & 1;
        regs[i].seg_split = (flags[i] >> 1) & 1;
    }
    int nn = (int)n;
    mm_filter_regs(0, &opt, (int)qlen, &nn, regs);
    for (int i = 0; i < nn; ++i) {
        out_ids[i] = regs[i].id;
        free(regs[i].p);
    }
    free(regs);
    return nn;
}

// mm_split_reg oracle: one region (15-row + stride-4 aux, plus its split
// bits in `split_in`), global anchors, split point n, qlen. Writes 10
// int64 each for r then r2: id, cnt, score, as, parent, qs, qe, rs, re,
// split. Returns 1 if a split happened, 0 if the call was a no-op.
int64_t hit_oracle_split_reg(const int64_t *row, const int64_t *aux,
                             int64_t split_in, const uint64_t *anch,
                             int64_t n_a, int64_t n, int64_t qlen,
                             int64_t *out)
{
    mm_reg1_t r, r2;
    memset(&r2, 0, sizeof(r2));
    fill(&r, row, aux);
    r.split = (uint32_t)split_in & 3;
    mm128_t *a = (mm128_t*)malloc(n_a * sizeof(mm128_t));
    for (int64_t i = 0; i < n_a; ++i) {
        a[i].x = anch[2 * i];
        a[i].y = anch[2 * i + 1];
    }
    int did = !(n <= 0 || n >= r.cnt);
    mm_split_reg(&r, &r2, (int)n, (int)qlen, a);
    const mm_reg1_t *both[2] = {&r, &r2};
    for (int s = 0; s < 2; ++s) {
        int64_t *o = out + 10 * s;
        const mm_reg1_t *x = both[s];
        o[0] = x->id; o[1] = x->cnt; o[2] = x->score; o[3] = x->as;
        o[4] = x->parent; o[5] = x->qs; o[6] = x->qe; o[7] = x->rs;
        o[8] = x->re; o[9] = x->split;
    }
    free(r.p); free(a);
    return did;
}

// mm_seg_gen oracle: fragment regions (only score/cnt/as are read) +
// global anchors with seg ids in y bits 48-55. Per segment s writes
// out_counts[s] regions of the 10-int64 gen_regs layout (score, cnt, as,
// rid, rev, qs, qe, rs, re, hash) into out_regs + s*n_regs0*10, and the
// segment's adjusted anchors concatenated into out_anch (out_na[s] each).
void hit_oracle_seg_gen(uint64_t hash, int64_t n_segs,
                        const int64_t *qlens64, const int64_t *rows,
                        const int64_t *auxs, int64_t n_regs0,
                        const uint64_t *anch, int64_t n_a,
                        int64_t *out_counts, int64_t *out_regs,
                        int64_t *out_na, uint64_t *out_anch)
{
    mm_reg1_t *regs0 = (mm_reg1_t*)calloc(n_regs0, sizeof(mm_reg1_t));
    int qlens[8];
    for (int64_t s = 0; s < n_segs; ++s) qlens[s] = (int)qlens64[s];
    for (int64_t i = 0; i < n_regs0; ++i)
        fill(&regs0[i], rows + 15 * i, auxs + 4 * i);
    mm128_t *a = (mm128_t*)malloc(n_a * sizeof(mm128_t));
    for (int64_t i = 0; i < n_a; ++i) {
        a[i].x = anch[2 * i];
        a[i].y = anch[2 * i + 1];
    }
    int n_regs[8];
    mm_reg1_t *regs[8];
    mm_seg_t *seg = mm_seg_gen(0, (uint32_t)hash, (int)n_segs, qlens,
                               (int)n_regs0, regs0, n_regs, regs, a);
    uint64_t *oa = out_anch;
    for (int64_t s = 0; s < n_segs; ++s) {
        out_counts[s] = n_regs[s];
        for (int i = 0; i < n_regs[s]; ++i) {
            const mm_reg1_t *x = &regs[s][i];
            int64_t *o = out_regs + (s * n_regs0 + i) * 10;
            o[0] = x->score; o[1] = x->cnt; o[2] = x->as; o[3] = x->rid;
            o[4] = x->rev; o[5] = x->qs; o[6] = x->qe; o[7] = x->rs;
            o[8] = x->re; o[9] = x->hash;
            free(x->p);
        }
        out_na[s] = seg[s].n_a;
        for (int i = 0; i < seg[s].n_a; ++i) {
            *oa++ = seg[s].a[i].x;
            *oa++ = seg[s].a[i].y;
        }
        free(regs[s]);
    }
    mm_seg_free(0, (int)n_segs, seg);
    for (int64_t i = 0; i < n_regs0; ++i) free(regs0[i].p);
    free(regs0); free(a);
}
