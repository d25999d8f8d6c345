/* Single-core baseline benchmark: times the reference chaining DP
 * (mm_chain_dp_fpga from chain.o) on synthetic anchors read from stdin.
 * Input: n_reads, then per read: n, then n lines "x y" (uint64 hex).
 * Output: one line "<total_anchors> <seconds>"
 */
#include <stdio.h>
#include <stdlib.h>
#include <stdint.h>
#include <time.h>
#include "minimap.h"

struct new_seed *mm_chain_dp_fpga(int max_dist_x, int max_dist_y, int bw,
                                  int max_skip, int min_sc, int is_cdna,
                                  int n_segs, int64_t n, mm128_t *a,
                                  uint32_t *new_i);

static double now(void)
{
    struct timespec tp;
    clock_gettime(CLOCK_MONOTONIC, &tp);
    return tp.tv_sec + tp.tv_nsec * 1e-9;
}

int main(int argc, char **argv)
{
    int n_reads, r;
    long total = 0;
    int max_dist_x = atoi(argv[1]), max_dist_y = atoi(argv[2]);
    int bw = atoi(argv[3]), max_skip = atoi(argv[4]), min_sc = atoi(argv[5]);
    if (scanf("%d", &n_reads) != 1) return 1;
    mm128_t **all = malloc(n_reads * sizeof(mm128_t*));
    int64_t *ns = malloc(n_reads * sizeof(int64_t));
    for (r = 0; r < n_reads; ++r) {
        long long n, i;
        scanf("%lld", &n);
        all[r] = malloc(n * sizeof(mm128_t));
        for (i = 0; i < n; ++i)
            scanf("%llx %llx", (unsigned long long*)&all[r][i].x,
                  (unsigned long long*)&all[r][i].y);
        ns[r] = n;
        total += n;
    }
    /* optional argv[6]: minimum seconds of work — the whole read set is
     * looped until the budget is met, so a 1-core host's scheduler bursts
     * average out instead of deciding the number (a single ~40 ms pass
     * was observed swinging 2x between sessions). 0/absent = one pass. */
    double min_s = argc > 6 ? atof(argv[6]) : 0.0;
    long done = 0;
    double t0 = now(), t1;
    do {
        for (r = 0; r < n_reads; ++r) {
            uint32_t new_i = 0;
            /* mm_chain_dp_fpga frees a[], so hand it a copy */
            mm128_t *a = malloc(ns[r] * sizeof(mm128_t));
            for (int64_t i = 0; i < ns[r]; ++i) a[i] = all[r][i];
            struct new_seed *fa = mm_chain_dp_fpga(max_dist_x, max_dist_y,
                                                   bw, max_skip, min_sc, 0,
                                                   1, ns[r], a, &new_i);
            free(fa);
        }
        done += total;
        t1 = now();
    } while (t1 - t0 < min_s);
    printf("%ld %.6f\n", done, t1 - t0);
    return 0;
}
