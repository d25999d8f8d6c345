/* Golden-test driver: feeds cases to the reference ksw2 kernels and prints ez
 * results, for validating the Python/NumPy emulations. Input (one case per
 * line-group on stdin):
 *   kind q e q2 e2 w zdrop end_bonus flag a b
 *   qseq (digits 0-4)
 *   tseq (digits 0-4)
 * kind: 0 = ksw_extd2_sse, 1 = ksw_ll_i16, 2 = ksw_exts2_sse (e2 field = noncan)
 * Output: "score max zdropped max_q max_t mqe mqe_t mte mte_q reach_end CIGAR"
 * or for ll: "score qe te"
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "ksw2.h"

static void gen_simple_mat(int m, int8_t *mat, int8_t a, int8_t b)
{
    int i, j;
    a = a < 0? -a : a;
    b = b > 0? -b : b;
    for (i = 0; i < m - 1; ++i) {
        for (j = 0; j < m - 1; ++j)
            mat[i * m + j] = i == j? a : b;
        mat[i * m + m - 1] = 0;
    }
    for (j = 0; j < m; ++j)
        mat[(m - 1) * m + j] = 0;
}

int main(void)
{
    char qs[200000], ts[200000];
    int kind, q, e, q2, e2, w, zdrop, end_bonus, flag, a, b;
    while (scanf("%d %d %d %d %d %d %d %d %d %d %d", &kind, &q, &e, &q2, &e2,
                 &w, &zdrop, &end_bonus, &flag, &a, &b) == 11) {
        int i, qlen, tlen;
        int8_t mat[25];
        uint8_t *qseq, *tseq;
        scanf("%s %s", qs, ts);
        qlen = strlen(qs); tlen = strlen(ts);
        qseq = (uint8_t*)malloc(qlen); tseq = (uint8_t*)malloc(tlen);
        for (i = 0; i < qlen; ++i) qseq[i] = qs[i] - '0';
        for (i = 0; i < tlen; ++i) tseq[i] = ts[i] - '0';
        gen_simple_mat(5, mat, a, b);
        if (kind == 0 || kind == 2) {
            ksw_extz_t ez;
            memset(&ez, 0, sizeof(ez));
            if (kind == 0)
                ksw_extd2_sse(0, qlen, qseq, tlen, tseq, 5, mat, q, e, q2, e2, w, zdrop, end_bonus, flag, &ez);
            else
                ksw_exts2_sse(0, qlen, qseq, tlen, tseq, 5, mat, q, e, q2, e2 /*noncan*/, zdrop, flag, &ez);
            printf("%d %d %d %d %d %d %d %d %d %d ", ez.score, ez.max, ez.zdropped,
                   ez.max_q, ez.max_t, ez.mqe, ez.mqe_t, ez.mte, ez.mte_q, ez.reach_end);
            for (i = 0; i < ez.n_cigar; ++i)
                printf("%d%c", ez.cigar[i]>>4, "MIDN"[ez.cigar[i]&0xf]);
            printf("\n");
            free(ez.cigar);
        } else {
            int qe, te, score;
            void *qp = ksw_ll_qinit(0, 2, qlen, qseq, 5, mat);
            score = ksw_ll_i16(qp, tlen, tseq, q, e, &qe, &te);
            printf("%d %d %d\n", score, qe, te);
            free(qp);
        }
        free(qseq); free(tseq);
        fflush(stdout);
    }
    return 0;
}
