#!/bin/bash
# Build .golden/minimap2_fix: the reference fork with its three paired-end
# bugs fixed (documented in golden/README.md). The fork's PE path as shipped
# segfaults / emits racy output, so PE fixtures and live PE differentials
# need this binary. The fixes restore STOCK minimap2 v2.10 semantics; they
# touch nothing on the single-end path (verified: minimap2_fix output is
# byte-identical to minimap2_ref on every single-end case).
#
#   1. fpga_work n_segs field bug (map.c:517): n_segs read from gap_qry.
#   2. NULL r->p deref on immediate Z-drop in the gap-fill loop
#      (align.c:597/605): guard by allocating an empty mm_extra_t.
#   3. PE revcomp/flip-back race (map.c:608-631): worker_for revcomps the
#      read in place, calls the ASYNC mm_map_frag, then immediately restores
#      it and "flips back" zero regions; result threads later align the
#      wrong strand. Fixed: map a revcomp copy, flip regions at result
#      completion (read_result_handle) = stock synchronous behavior.
#
# Requires .golden/*.o from build_reference.sh (run it first).
set -euo pipefail
REF=/root/reference
OUT=/root/repo/.golden
CFLAGS="-g -Wall -O2 -std=gnu99 -DHAVE_KALLOC"

python3 - "$REF" "$OUT" <<'EOF'
import sys
ref, out = sys.argv[1], sys.argv[2]

m = open(f"{ref}/map.c").read()

# fix 1: n_segs read from the wrong packet field
old = "int n_segs = sub_head->gap_qry;"
assert m.count(old) == 1
m = m.replace(old, "int n_segs = sub_head->n_segs; /* PE-fix 1 */")

# fix 3a: map a revcomp COPY instead of revcomping in place around an
# asynchronous call
old = """	for (j = 0; j < s->n_seg[i]; ++j) {
		if (s->n_seg[i] == 2 && ((j == 0 && (pe_ori>>1&1)) || (j == 1 && (pe_ori&1))))
			mm_revcomp_bseq(&s->seq[off + j]);
		qlens[j] = s->seq[off + j].l_seq;
		qseqs[j] = s->seq[off + j].seq;
	}"""
assert m.count(old) == 1
new = """	for (j = 0; j < s->n_seg[i]; ++j) { /* PE-fix 3a: revcomp a copy */
		qlens[j] = s->seq[off + j].l_seq;
		if (s->n_seg[i] == 2 && ((j == 0 && (pe_ori>>1&1)) || (j == 1 && (pe_ori&1)))) {
			mm_revcomp_bseq(&s->seq[off + j]);
			qseqs[j] = strdup(s->seq[off + j].seq);
			mm_revcomp_bseq(&s->seq[off + j]);
		} else qseqs[j] = s->seq[off + j].seq;
	}"""
m = m.replace(old, new)

# fix 3b: delete the premature flip-back loop (regions do not exist yet)
old = """	for (j = 0; j < s->n_seg[i]; ++j) // flip the query strand and coordinate to the original read strand
		if (s->n_seg[i] == 2 && ((j == 0 && (pe_ori>>1&1)) || (j == 1 && (pe_ori&1)))) {
			int k, t;
			mm_revcomp_bseq(&s->seq[off + j]);
			for (k = 0; k < s->n_reg[off + j]; ++k) {
				mm_reg1_t *r = &s->reg[off + j][k];
				t = r->qs;
				r->qs = qlens[j] - r->qe;
				r->qe = qlens[j] - t;
				r->rev = !r->rev;
			}
		}
"""
assert m.count(old) == 1
m = m.replace(old, "\t/* PE-fix 3b: flip-back moved to read_result_handle */\n")

# fix 3c: flip regions to the original read strand at result completion
old = "    free(context->qlens);\n    free(context->seqs);"
assert m.count(old) == 1
new = """    for (i = 0; i < n_segs; ++i) /* PE-fix 3c: flip to original strand */
        if (n_segs == 2 && ((i == 0 && (opt->pe_ori>>1&1)) || (i == 1 && (opt->pe_ori&1)))) {
            int k, t;
            for (k = 0; k < n_regs[i]; ++k) {
                mm_reg1_t *r = &regs[i][k];
                t = r->qs;
                r->qs = qlens[i] - r->qe;
                r->qe = qlens[i] - t;
                r->rev = !r->rev;
            }
            free(seqs[i]); /* the revcomp copy from PE-fix 3a */
        }
    free(context->qlens);
    free(context->seqs);"""
m = m.replace(old, new)
open(f"{out}/map_fixed.c", "w").write(m)

a = open(f"{ref}/align.c").read()
# fix 2: the gap-fill loop touches r->p->dp_score even when no CIGAR was
# ever appended (immediate Z-drop): allocate an empty extra (the region
# then dies in mm_filter_regs, mlen < min_chain_score)
old = "\t\t\tif (ez->zdropped) { // truncated by Z-drop"
assert a.count(old) == 1
new = """\t\t\tif (r->p == 0) { /* PE-fix 2: immediate Z-drop, no cigar yet */
\t\t\t\tuint32_t capacity = sizeof(mm_extra_t);
\t\t\t\tkroundup32(capacity);
\t\t\t\tr->p = (mm_extra_t*)calloc(capacity, 4);
\t\t\t\tr->p->capacity = capacity;
\t\t\t}
\t\t\tif (ez->zdropped) { // truncated by Z-drop"""
a = a.replace(old, new)
open(f"{out}/align_fixed.c", "w").write(a)
print("patched map_fixed.c + align_fixed.c")
EOF

gcc -c $CFLAGS -I"$REF" "$OUT/map_fixed.c" -o "$OUT/map_fixed.o"
gcc -c $CFLAGS -I"$REF" "$OUT/align_fixed.c" -o "$OUT/align_fixed.o"
OBJS=""
for s in fpga_chaindp kthread kalloc misc bseq sketch sdust options index \
         chain hit format pe esterr main getopt fpga_stub \
         ksw2_ll_sse ksw2_extz2_sse ksw2_extd2_sse ksw2_exts2_sse; do
  OBJS="$OBJS $OUT/$s.o"
done
gcc $CFLAGS -o "$OUT/minimap2_fix" "$OUT/map_fixed.o" "$OUT/align_fixed.o" \
  $OBJS -lm -lz -lpthread
echo "built $OUT/minimap2_fix"
