"""paftools subcommand tests: each command exercised on fixtures whose
expected output is computed independently (by construction or from the
byte-identical golden SAM/PAF outputs of the pipeline)."""
import io
import os
import re
import sys

import pytest

from conftest import GOLDEN_DIR, REF_TEST_DIR
from minimap2_chaindp_tpu.tools import paftools as pt


def run(cmd, *args, inputs=None):
    """Run a paftools subcommand, returning (stdout, stderr) text."""
    out, err = io.StringIO(), io.StringIO()
    so, se = sys.stdout, sys.stderr
    sys.stdout, sys.stderr = out, err
    try:
        pt.main([cmd, *args])
    finally:
        sys.stdout, sys.stderr = so, se
    return out.getvalue(), err.getvalue()


def test_version():
    out, _ = run("version")
    assert out.strip() == "r755"


# ------------------------------------------------------------------ sam2paf

def test_sam2paf_consistent_with_native_paf():
    """sam2paf(minimap2 SAM) must agree with minimap2's own PAF on
    coordinates, mlen, blen, mapq for the primary alignment."""
    out, _ = run("sam2paf", os.path.join(GOLDEN_DIR, "mt.sam"))
    lines = [l.split("\t") for l in out.splitlines()]
    with open(os.path.join(GOLDEN_DIR, "mt.paf")) as f:
        want = [l.split("\t") for l in f.read().splitlines()]
    pri = [l for l in lines if "tp:A:P" in l]
    assert len(pri) == len(want) == 1
    got, ref = pri[0], want[0]
    # qname qlen qs qe strand tname tlen ts te mlen blen mapq
    assert got[0] == ref[0] and got[4] == ref[4] and got[5] == ref[5]
    for i in (1, 2, 3, 6, 7, 8, 9, 10, 11):
        assert got[i] == ref[i], f"field {i}: {got[i]} != {ref[i]}"


def test_sam2paf_cs_from_md():
    sam = ("@SQ\tSN:ref\tLN:20\n"
           "q1\t0\tref\t3\t60\t2S4M1I3M2D3M\t*\t0\t0\tAACCGGTAACCGG\t*\t"
           "NM:i:4\tMD:Z:2A4^TT3\n")
    p = "/tmp/s2p_test.sam"
    with open(p, "w") as f:
        f.write(sam)
    out, _ = run("sam2paf", p)
    t = out.strip().split("\t")
    # qlen = 10M+1I+2S = 13; qs=2 (leading clip); ts = pos-1 = 2; te = 2+10M+2D
    assert t[0] == "q1" and t[1] == "13" and t[2] == "2" and t[3] == "13"
    assert t[7] == "2" and t[8] == "14"
    # NM=4, gaps=3 -> mm=1; mlen = 10-1 = 9; blen = 10+1+2 = 13
    assert (t[9], t[10]) == ("9", "13")
    assert "cg:Z:4M1I3M2D3M" in t
    assert "mm:i:1" in t and "gn:i:3" in t and "go:i:2" in t
    # MD walk: 2 match, A>G mismatch, 1 match, +T insertion, 3 match,
    # TT deletion, 3 match (MD/SEQ case preserved, like the reference)
    assert any(x == "cs:Z::2*AG:1+T:3-TT:3" for x in t), t


# --------------------------------------------------------------------- stat

def test_stat_counts():
    out, _ = run("stat", os.path.join(GOLDEN_DIR, "mt.paf"))
    d = dict(l.rsplit(": ", 1) for l in out.splitlines())
    assert d["Number of mapped sequences"] == "1"
    assert d["Number of primary alignments"] == "1"
    # gap histogram should equal I/D op counts in the golden cigar
    with open(os.path.join(GOLDEN_DIR, "mt.paf")) as f:
        cg = re.search(r"cg:Z:(\S+)", f.read()).group(1)
    n_i = sum(1 for m in re.finditer(r"(\d+)I", cg))
    n_d = sum(1 for m in re.finditer(r"(\d+)D", cg))
    tot_i = sum(int(d[f"Number of insertions in {b}"]) for b in
                ("[0,50)", "[50,100)", "[100,300)", "[300,400)",
                 "[400,1000)", "[1000,inf)"))
    tot_d = sum(int(d[f"Number of deletions in {b}"]) for b in
                ("[0,50)", "[50,100)", "[100,300)", "[300,400)",
                 "[400,1000)", "[1000,inf)"))
    assert (tot_i, tot_d) == (n_i, n_d)
    # mapped bases = qe - qs of the single alignment
    assert d["Number of mapped bases"] == "16025"
    assert d["Number of bases in mapped sequences"] == "16499"


# ------------------------------------------------------------------ mapeval

def make_paf(qname, tname, ts, te, strand="+", mapq=60, blen=1000):
    return "\t".join(map(str, [qname, 1000, 0, 1000, strand, tname, 100000,
                               ts, te, blen - 10, blen, mapq,
                               "tp:A:P", "s1:i:500", "s2:i:100"]))


def test_mapeval_pbsim_names():
    # read!chr!st!en!strand — one correct, one wrong-chr at q60,
    # one wrong-pos at q30
    lines = [
        make_paf("r1!chr1!5000!6000!+", "chr1", 5000, 6000),
        make_paf("r2!chr1!5000!6000!+", "chr2", 5000, 6000),
        make_paf("r3!chr1!5000!6000!+", "chr1", 50000, 51000, mapq=30),
    ]
    p = "/tmp/mapeval_test.paf"
    with open(p, "w") as f:
        f.write("\n".join(lines) + "\n")
    out, _ = run("mapeval", p)
    rows = [l.split("\t") for l in out.splitlines()]
    # Q60: 2 reads, 1 error; Q30 cumulative: 3 reads, 2 errors
    assert rows[0] == ["Q", "60", "2", "1", f"{1/2:.9f}", "2"]
    assert rows[1] == ["Q", "30", "1", "1", f"{2/3:.9f}", "3"]


def test_mapeval_overlap_ratio():
    # overlap/union = 500/1500 = 0.333 -> correct at default r=0.1,
    # wrong at r=0.4
    lines = [make_paf("r1!chr1!5000!6000!+", "chr1", 5500, 6500)]
    p = "/tmp/mapeval_ovlp.paf"
    with open(p, "w") as f:
        f.write("\n".join(lines) + "\n")
    out, _ = run("mapeval", p)
    assert out.splitlines()[0].split("\t") == \
        ["Q", "60", "1", "0", f"{0:.9f}", "1"]
    out, _ = run("mapeval", "-r", "0.4", p)
    assert out.splitlines()[0].split("\t") == \
        ["Q", "60", "1", "1", f"{1:.9f}", "1"]


# --------------------------------------------------------------- splice2bed

def test_splice2bed_blocks_match_cigar():
    out, _ = run("splice2bed", os.path.join(GOLDEN_DIR, "splice.paf"))
    rows = [l.split("\t") for l in out.splitlines()]
    with open(os.path.join(GOLDEN_DIR, "splice.paf")) as f:
        pafs = [l.split("\t") for l in f.read().splitlines()]
    assert len(rows) == len(pafs)
    for row, paf in zip(rows, pafs):
        cg = next(x[5:] for x in paf if x.startswith("cg:Z:"))
        n_introns = len(re.findall(r"\d+N", cg))
        assert int(row[9]) == n_introns + 1          # block count
        assert row[0] == paf[5] and row[1] == paf[7] and row[2] == paf[8]
        sizes = [int(x) for x in row[10].rstrip(",").split(",")]
        starts = [int(x) for x in row[11].rstrip(",").split(",")]
        # blocks tile [ts, te) with intron gaps
        assert starts[0] == 0
        assert starts[-1] + sizes[-1] == int(paf[8]) - int(paf[7])


def test_splice2bed_non_bed_format_emits_nothing():
    """The reference's print_lines (paftools.js:1338) only has a "bed"
    branch; any other -f value silently produces no output."""
    out, _ = run("splice2bed", "-f", "x",
                 os.path.join(GOLDEN_DIR, "splice.paf"))
    assert out == ""


# ------------------------------------------------------------------ gff2bed

GTF = """chr1\tHAVANA\texon\t1001\t1100\t.\t+\t.\tgene_name "G1"; transcript_id "T1"; transcript_type "protein_coding";
chr1\tHAVANA\tCDS\t1021\t1100\t.\t+\t.\tgene_name "G1"; transcript_id "T1"; transcript_type "protein_coding";
chr1\tHAVANA\texon\t1201\t1300\t.\t+\t.\tgene_name "G1"; transcript_id "T1"; transcript_type "protein_coding";
chr1\tHAVANA\tCDS\t1201\t1250\t.\t+\t.\tgene_name "G1"; transcript_id "T1"; transcript_type "protein_coding";
"""


def test_gff2bed():
    p = "/tmp/t.gtf"
    with open(p, "w") as f:
        f.write(GTF)
    out, _ = run("gff2bed", p)
    t = out.strip().split("\t")
    assert t[:4] == ["chr1", "1000", "1300", "T1|protein_coding|G1"]
    assert t[5] == "+" and t[6] == "1020" and t[7] == "1250"
    assert t[8] == "0,128,255"
    assert t[9] == "2" and t[10] == "100,100," and t[11] == "0,200,"


# ----------------------------------------------------------------- junceval

def test_junceval():
    gtf = ('chr1\tx\texon\t101\t200\t.\t+\t.\ttranscript_id "T1";\n'
           'chr1\tx\texon\t301\t400\t.\t+\t.\ttranscript_id "T1";\n')
    # SAM: one read with the correct intron [200,300), one with a shifted
    # intron, one unspliced
    sam = ("r1\t0\tchr1\t151\t60\t50M100N50M\t*\t0\t0\t*\t*\n"
           "r2\t0\tchr1\t151\t60\t50M90N50M\t*\t0\t0\t*\t*\n"
           "r3\t0\tchr1\t151\t60\t100M\t*\t0\t0\t*\t*\n")
    pg, ps = "/tmp/t_junc.gtf", "/tmp/t_junc.sam"
    with open(pg, "w") as f:
        f.write(gtf)
    with open(ps, "w") as f:
        f.write(sam)
    out, _ = run("junceval", pg, ps)
    d = dict(l.rsplit(": ", 1) for l in out.splitlines())
    assert d["# mapped reads"] == "3"
    assert d["# singletons"] == "1"
    assert d["# predicted introns"] == "2"
    assert d["# correct introns"].startswith("1 ")
    assert d["# non-overlapping introns"] == "0"
    # fuzzy tolerance rescues the shifted junction
    out, _ = run("junceval", "-l", "10", pg, ps)
    d = dict(l.rsplit(": ", 1) for l in out.splitlines())
    assert d["# correct introns"].startswith("2 ")


# ----------------------------------------------------------------- liftover

def test_liftover():
    # query q maps + to target t at t[100..200) with a 10D at query offset 50
    paf = "\t".join(map(str, [
        "q", 300, 0, 90, "+", "t", 1000, 100, 200, 90, 100, 60,
        "tp:A:P", "cg:Z:50M10D40M"]))
    bed = "q\t10\t20\nq\t45\t55\n"
    pp, pb = "/tmp/lift.paf", "/tmp/lift.bed"
    with open(pp, "w") as f:
        f.write(paf + "\n")
    with open(pb, "w") as f:
        f.write(bed)
    out, _ = run("liftover", "-l", "50", "-q", "0", pp, pb)
    rows = [l.split("\t") for l in out.splitlines()]
    # q[10,20) -> t[110,120); q[45,55) -> spans the deletion:
    # q45->t145, q54 -> t(50M 10D)=160 + 4 = 164 => [145, 165)
    assert rows[0] == ["t", "110", "120", "q_10_20", "0", "+"]
    assert rows[1] == ["t", "145", "165", "q_45_55", "0", "+"]


def test_liftover_skips_non_mid_ops():
    """paftools.js:232's CIGAR regex only matches [MID]: an N (or any other)
    op must be skipped without advancing either coordinate."""
    paf = "\t".join(map(str, [
        "q1", 100, 0, 100, "+", "t1", 1000, 100, 198, 90, 100, 60,
        "tp:A:P", "cg:Z:30M5N40M2I28M"]))
    pp, pb = "/tmp/lift_n.paf", "/tmp/lift_n.bed"
    with open(pp, "w") as f:
        f.write(paf + "\n")
    with open(pb, "w") as f:
        f.write("q1\t10\t50\n")
    out, _ = run("liftover", "-l", "0", pp, pb)
    # MID-only accounting: q10 -> t110, q50 -> t150 (the 5N never moves t)
    assert out.splitlines() == ["t1\t110\t150\tq1_10_50\t0\t+"]


# --------------------------------------------------------------------- call

def test_call_variants():
    # two contigs tiling one chromosome with known diffs in cs tags
    paf = [
        "\t".join(map(str, [
            "ctg1", 60000, 0, 60000, "+", "chr1", 120000, 0, 60000,
            59990, 60000, 60, "tp:A:P",
            "cs:Z::20000*ac:19999+gg:20000"])),
        "\t".join(map(str, [
            "ctg2", 60000, 0, 60000, "+", "chr1", 120000, 59000, 119000,
            59990, 60000, 60, "tp:A:P",
            "cs:Z::30000-tt:29998"])),
    ]
    p = "/tmp/call.paf"
    with open(p, "w") as f:
        f.write("\n".join(paf) + "\n")
    out, err = run("call", p)
    vs = [l.split("\t") for l in out.splitlines() if l[0] == "V"]
    rs = [l.split("\t") for l in out.splitlines() if l[0] == "R"]
    # substitution at chr1:20000, insertion at 40000, deletion at 89000
    assert ["V", "chr1", "20000", "20001", "1", "60", "a", "c", "ctg1",
            "20000", "20001", "+"] == vs[0]
    assert vs[1][1:7] == ["chr1", "40000", "40000", "1", "60", "-"] \
        and vs[1][7] == "gg"
    assert vs[2][1:8] == ["chr1", "89000", "89002", "1", "60", "tt", "-"]
    # 1-contig regions: [0,59000) and [60000,119000)
    assert rs == [["R", "chr1", "0", "59000"],
                  ["R", "chr1", "60000", "119000"]]
    assert "1 substitutions" in err and "118000 reference bases" in err


# ------------------------------------------------------------------- bedcov

def test_bedcov():
    reg = "chr1\t100\t200\nchr1\t150\t300\n"      # merged: [100,300)
    tgt = "chr1\t250\t400\nchr2\t0\t100\n"
    pr, pt_ = "/tmp/cov_reg.bed", "/tmp/cov_tgt.bed"
    with open(pr, "w") as f:
        f.write(reg)
    with open(pt_, "w") as f:
        f.write(tgt)
    out, err = run("bedcov", "-p", pr, pt_)
    rows = [l.split("\t") for l in out.splitlines()]
    # chr2 is absent from regions -> counted in tot_len but no F line
    # (the reference `continue`s before printing, paftools.js:792)
    assert rows == [["F", "chr1", "250", "400", "150", "50"]]
    assert "# target bases: 250" in err
    assert "overlapping regions: 50 (20.00%)" in err


# ---------------------------------------------------------------- delta2paf

def test_delta2paf():
    delta = (">ref qry 1000 800\n"
             "101 200 51 150 3 3 0\n"
             "60\n"           # 59M 1D
             "-20\n"          # 19M 1I
             "0\n")
    p = "/tmp/t.delta"
    with open(p, "w") as f:
        f.write(delta)
    out, _ = run("delta2paf", p)
    t = out.strip().split("\t")
    assert t[0] == "qry" and t[5] == "ref"
    assert (t[2], t[3], t[7], t[8]) == ("50", "150", "100", "200")
    assert "cg:Z:59M1D19M1I21M" in t
    # blen=59+1+19+1+21=101, mlen=blen-NM=98
    assert (t[9], t[10]) == ("98", "101")


# ------------------------------------------------------------------ ov-eval

def test_ov_eval():
    # reads r1,r2 overlap on ref by 3000bp; r3 overlaps r2 by 500 (below min)
    to_ref = [
        "\t".join(map(str, ["r1", 5000, 0, 5000, "+", "chr1", 100000,
                            10000, 15000, 4900, 5000, 60, "tp:A:P"])),
        "\t".join(map(str, ["r2", 5000, 0, 5000, "+", "chr1", 100000,
                            12000, 17000, 4900, 5000, 60, "tp:A:P"])),
        "\t".join(map(str, ["r3", 5000, 0, 5000, "+", "chr1", 100000,
                            16500, 21500, 4900, 5000, 60, "tp:A:P"])),
    ]
    ovlp = ["\t".join(map(str, ["r1", 5000, 2000, 5000, "+", "r2", 5000,
                                0, 3000, 2900, 3000, 0]))]
    p1, p2 = "/tmp/ov_ref.paf", "/tmp/ov_ovl.paf"
    with open(p1, "w") as f:
        f.write("\n".join(to_ref) + "\n")
    with open(p2, "w") as f:
        f.write("\n".join(ovlp) + "\n")
    out, _ = run("ov-eval", p1, p2)
    lines = out.splitlines()
    assert lines[0].startswith("1 overlaps")
    assert lines[1].startswith("0 missed")
    assert lines[2].startswith("100.00%")


# ----------------------------------------------------------------- mason2fq

def test_mason2fq_paired():
    sam = ("@SQ\tSN:chr1\tLN:10000\n"
           "simulated.1\t99\tchr1\t101\t60\t4M\t*\t0\t0\tACGT\tFFFF\t"
           "XE:i:1\tXS:i:2\tXI:i:0\n"
           "simulated.1\t147\tchr1\t201\t60\t4M\t*\t0\t0\tACGT\tFFFF\t"
           "XE:i:0\tXS:i:0\tXI:i:1\n")
    p = "/tmp/mason.sam"
    with open(p, "w") as f:
        f.write(sam)
    out, _ = run("mason2fq", p)
    lines = out.splitlines()
    # read2 of the pair is reverse strand (flag 147 has 0x10)
    assert lines[0] == "@1!chr1!100_200!104_204!+-/1 1:2:0"
    assert lines[1] == "ACGT"
    assert lines[4] == "@1!chr1!100_200!104_204!+-/2 0:0:1"
    assert lines[5] == "ACGT"[::-1].translate(str.maketrans("ACGT", "TGCA"))


# ----------------------------------------------------------------- pbsim2fq

def test_pbsim2fq():
    fai = "chrA\t1000\nchrB\t2000\n"
    maf = ("a\n"
           "s ref 150 20 + 1000 ACGTACGTACGTACGTAC-T\n"
           "s S2_1 0 19 - 19 ACGTACGTACGTACGTACT\n")
    pf, pm = "/tmp/t.fai", "/tmp/t.maf"
    with open(pf, "w") as f:
        f.write(fai)
    with open(pm, "w") as f:
        f.write(maf)
    out, _ = run("pbsim2fq", pf, pm)
    lines = out.splitlines()
    assert lines[0] == ">S2_1!chrB!150!170!-"
    assert lines[1] == pt.revcomp("ACGTACGTACGTACGTACT")


# --------------------------------------------------------------------- view

def test_view_formats():
    # ref span: 4 + 1(mismatch) + 3 + 1(del) + 3 = 12 -> te = 62
    # qry span: 4 + 1 + 2(ins) + 3 + 3 = 13 -> qe = 13
    paf = "\t".join(map(str, [
        "q", 20, 0, 13, "+", "t", 100, 50, 62, 10, 13, 60, "tp:A:P",
        "AS:i:42", "cs:Z::4*ac+gg:3-t:3", "cg:Z:4M1X2I3M1D3M"]))
    p = "/tmp/view.paf"
    with open(p, "w") as f:
        f.write(paf + "\n")
    out, _ = run("view", p)
    lines = out.splitlines()
    assert lines[0].startswith(">q\t20")
    assert "cs:Z" not in lines[0] and "cg:Z" not in lines[0]
    # Ref row: 4 match + a + -- + 3 match + t + 3 match, coords 51..62
    assert lines[1].split() == ["Ref+:", "51", "====a--===t===", "62"]
    assert lines[3].split() == ["Qry+:", "1", "====cgg===-===", "13"]
    assert lines[4] == "//"
    out, _ = run("view", "-f", "lastz-cigar", p)
    assert out.startswith("cigar: q 0 13 + t 50 62 + 42 M 4 X 1 I 2 M 3 D 1 M 3")
    # MAF needs --cs=long (explicit '=' match runs)
    paf_long = paf.replace("cs:Z::4*ac+gg:3-t:3",
                           "cs:Z:=ACGT*ac+gg=CCC-t=GGG")
    with open(p, "w") as f:
        f.write(paf_long + "\n")
    out, _ = run("view", "-f", "maf", p)
    rows = out.splitlines()
    assert rows[0] == "##maf version=1"
    assert rows[2] == "a 42"
    s_ref = rows[3].split()
    assert s_ref[0] == "s" and s_ref[1] == "t" and s_ref[6] == "ACGTa--CCCtGGG"
    s_qry = rows[4].split()
    assert s_qry[1] == "q" and s_qry[6] == "ACGTcggCCC-GGG"
