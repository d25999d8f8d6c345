#!/bin/bash
# Out-of-tree build of the reference fork (/root/reference, read-only) against the
# stub FPGA driver (golden/fpga_stub.c), for generating golden test outputs.
# Produces .golden/minimap2_ref . Nothing is written into /root/reference.
set -euo pipefail
REF=/root/reference
OUT=/root/repo/.golden
mkdir -p "$OUT"
CFLAGS="-g -Wall -O2 -std=gnu99 -DHAVE_KALLOC"
SRCS="fpga_chaindp kthread kalloc misc bseq sketch sdust options index chain align hit map format pe esterr main getopt"
for s in $SRCS; do
  gcc -c $CFLAGS "$REF/$s.c" -o "$OUT/$s.o" 2>"$OUT/$s.err" || { cat "$OUT/$s.err"; exit 1; }
done
# ksw2 kernels, sse2only-style build (no cpu dispatch)
gcc -c $CFLAGS -msse2 "$REF/ksw2_ll_sse.c" -o "$OUT/ksw2_ll_sse.o"
for k in extz2 extd2 exts2; do
  gcc -c $CFLAGS -msse4.1 "$REF/ksw2_${k}_sse.c" -o "$OUT/ksw2_${k}_sse.o"
done
gcc -c $CFLAGS /root/repo/golden/fpga_stub.c -o "$OUT/fpga_stub.o"
# link an EXPLICIT object list: a *.o glob would also pick up the
# *_fixed.o objects of the PE-fixed oracle build (build_reference_fix.sh)
# when both builds share .golden, fail on duplicate symbols, and destroy
# the existing minimap2_ref
OBJS=""
for s in $SRCS ksw2_ll_sse ksw2_extz2_sse ksw2_extd2_sse ksw2_exts2_sse \
         fpga_stub; do
  OBJS="$OBJS $OUT/$s.o"
done
gcc $CFLAGS -o "$OUT/minimap2_ref" $OBJS -lm -lz -lpthread
gcc $CFLAGS -I"$REF" /root/repo/golden/ksw_test.c \
  "$OUT"/ksw2_extd2_sse.o "$OUT"/ksw2_extz2_sse.o "$OUT"/ksw2_exts2_sse.o \
  "$OUT"/ksw2_ll_sse.o "$OUT"/kalloc.o -o "$OUT/ksw_test" -lm -lz -lpthread
gcc -O2 -std=gnu99 -D_SDUST_MAIN -DHAVE_KALLOC "$REF/sdust.c" "$REF/kalloc.c" \
  "$REF/getopt.c" -o "$OUT/sdust_ref" -lz -lm
gcc -O2 -std=gnu99 -DHAVE_KALLOC -I"$REF" -shared -fPIC \
  /root/repo/golden/hit_test.c /root/repo/golden/align_test.c \
  "$REF/hit.c" "$REF/pe.c" "$REF/esterr.c" \
  "$REF/sketch.c" "$REF/kalloc.c" "$REF/misc.c" "$REF/index.c" \
  "$REF/options.c" \
  "$REF/bseq.c" "$REF/kthread.c" /root/repo/golden/fpga_stub.c \
  "$REF/ksw2_extz2_sse.c" "$REF/ksw2_extd2_sse.c" "$REF/ksw2_exts2_sse.c" \
  "$REF/ksw2_ll_sse.c" \
  -o "$OUT/libhit_oracle.so" -lm -lz -lpthread -msse4.1
echo "built $OUT/minimap2_ref + $OUT/ksw_test + $OUT/sdust_ref + $OUT/libhit_oracle.so"
