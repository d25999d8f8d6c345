"""paftools — evaluation / format-conversion toolkit for PAF/SAM alignments.

Python re-implementation of the reference's misc/paftools.js (r755): the same
subcommands, options, and output formats (fields are tab-separated like the
k8 `print`). Subcommands and their reference locations:

  view        paftools.js:832   PAF -> BLAST-like / MAF / LASTZ-cigar
  splice2bed  paftools.js:1333  spliced PAF/SAM -> BED12
  sam2paf     paftools.js:1117  SAM -> PAF (with cs from MD)
  delta2paf   paftools.js:1270  MUMmer delta -> PAF
  gff2bed     paftools.js:994   GTF/GFF3 -> BED12
  stat        paftools.js:558   mapping statistics from PAF/SAM
  liftover    paftools.js:206   simplistic liftOver through PAF
  call        paftools.js:340   variant calling from asm-to-ref cs-PAF
  bedcov      paftools.js:707   covered-base counting
  mapeval     paftools.js:1453  mapping-accuracy evaluation (simulated reads)
  mason2fq    paftools.js:1622  mason2 SAM -> FASTQ with truth names
  pbsim2fq    paftools.js:1703  PBSIM MAF -> FASTA with truth names
  junceval    paftools.js:1759  splice-junction accuracy vs GTF
  ov-eval     paftools.js:1915  overlap sensitivity evaluation
"""
from __future__ import annotations

import argparse
import gzip
import re
import sys

VERSION = "r755"

RE_CIGAR = re.compile(r"(\d+)([MIDNSHX=])")
RE_CS = re.compile(r"([:=*+-])(\d+|[A-Za-z]+)")

_RC = str.maketrans("WSATUGCYRKMBDHVNwsatugcyrkmbdhvn",
                    "WSTAACGRYMKVHDBNwstaacgrymkvhdbn")


def revcomp(s: str) -> str:
    return s.translate(_RC)[::-1]


def _open(fn):
    if fn == "-":
        return sys.stdin
    if fn.endswith(".gz"):
        return gzip.open(fn, "rt")
    return open(fn)


def _print(*fields):
    print("\t".join(str(f) for f in fields))


def _warn(msg):
    print(msg, file=sys.stderr)


# ---------------------------------------------------------------- intervals

def intv_sort(a):
    a.sort(key=lambda x: (x[0], x[1]))


def intv_merge(a, sorted_=True):
    if not sorted_:
        intv_sort(a)
    k = 0
    for i in range(1, len(a)):
        if a[k][1] >= a[i][0]:
            a[k][1] = max(a[k][1], a[i][1])
        else:
            k += 1
            a[k] = list(a[i])
    del a[k + 1:]


def intv_dedup(a, sorted_=True):
    if not sorted_:
        intv_sort(a)
    k = 0
    for i in range(1, len(a)):
        if a[i][0] != a[k][0] or a[i][1] != a[k][1]:
            k += 1
            a[k] = list(a[i])
    del a[k + 1:]


def intv_index_end(a, sorted_=True):
    """Append, per interval, the smallest index k such that scanning from k
    cannot miss an overlap (reference Interval.index_end)."""
    if not a:
        return
    if not sorted_:
        intv_sort(a)
    a[0].append(0)
    k, k_en = 0, a[0][1]
    for i in range(1, len(a)):
        if k_en <= a[i][0]:
            k += 1
            while k < i:
                if a[k][1] > a[i][0]:
                    break
                k += 1
            k_en = a[k][1]
        a[i].append(k)


def intv_find_ovlp(a, st, en):
    if not a or st >= en:
        return []
    left, right = -1, len(a)
    while right - left > 1:
        mid = left + ((right - left) >> 1)
        if a[mid][0] > st:
            right = mid
        elif a[mid][0] < st:
            left = mid
        else:
            left = mid
            break
    k = 0 if left < 0 else a[left][-1]
    b = []
    for i in range(k, len(a)):
        if a[i][0] >= en:
            break
        if st < a[i][1]:
            b.append(a[i])
    return b


# --------------------------------------------------------------------- stat

def paf_stat(argv):
    ap = argparse.ArgumentParser(prog="paftools stat")
    ap.add_argument("-l", dest="gap_out_len", type=int, default=None)
    ap.add_argument("input")
    ns = ap.parse_args(argv)

    n_pri = n_2nd = n_seq = n_cigar_64k = l_tot = l_cov = 0
    n_gap = [[0] * 6, [0] * 6]

    def cov_len(regs):
        regs.sort(key=lambda r: r[0])
        st, en = regs[0]
        length = 0
        for s, e in regs[1:]:
            if s < en:
                en = max(en, e)
            else:
                length += en - st
                st, en = s, e
        return length + (en - st)

    last = last_qlen = None
    regs = []
    lineno = 0
    with _open(ns.input) as f:
        for line in f:
            line = line.rstrip("\n")
            lineno += 1
            if not line or line[0] == "@":
                continue
            t = line.split("\t", 12)
            atlen = None
            if t[4] in "+-":  # PAF
                if not re.search(r"\ts2:i:\d+", line):
                    n_2nd += 1
                    continue
                m = re.search(r"\tcg:Z:(\S+)", line)
                if m is None:
                    _warn(f"WARNING: no CIGAR at line {lineno}")
                    continue
                cigar = m.group(1)
                tname = t[5]
                qs, qe = int(t[2]), int(t[3])
                aqlen = qe - qs
                is_rev = t[4] == "-"
                rs = int(t[7])
                atlen = int(t[8]) - rs
                ori_qlen = int(t[1])
                is_sam = False
            else:  # SAM
                flag = int(t[1])
                if (flag & 4) or t[2] == "*" or t[5] == "*":
                    continue
                if flag & 0x100:
                    n_2nd += 1
                    continue
                cigar = t[5]
                tname = t[2]
                rs = int(t[3]) - 1
                aqlen = len(t[9])
                is_sam = True
                is_rev = bool(flag & 0x10)
            n_pri += 1
            if last != t[0]:
                if last is not None:
                    l_tot += last_qlen
                    l_cov += cov_len(regs)
                regs = []
                n_seq += 1
                last = t[0]
            M = tl = ql = sclip = n_cigar = 0
            clip = [0, 0]
            for m in RE_CIGAR.finditer(cigar):
                ln, op = int(m.group(1)), m.group(2)
                n_cigar += 1
                if op in "M=X":
                    tl += ln
                    ql += ln
                    M += ln
                elif op in "ID":
                    typ = (0 if ln < 50 else 1 if ln < 100 else 2 if ln < 300
                           else 3 if ln < 400 else 4 if ln < 1000 else 5)
                    if op == "I":
                        ql += ln
                        n_gap[0][typ] += 1
                    else:
                        tl += ln
                        n_gap[1][typ] += 1
                    if ns.gap_out_len is not None and ln >= ns.gap_out_len:
                        _print(t[0], ql, "-" if is_rev else "+", tname,
                               rs + tl, op, ln)
                elif op == "N":
                    tl += ln
                elif op == "S":
                    clip[0 if M == 0 else 1] = ln
                    sclip += ln
                elif op == "H":
                    clip[0 if M == 0 else 1] = ln
            if n_cigar > 65535:
                n_cigar_64k += 1
            if ql + sclip != aqlen:
                _warn(f"WARNING: aligned query length is inconsistent with "
                      f"CIGAR at line {lineno} ({ql + sclip} != {aqlen})")
            if atlen is not None and atlen != tl:
                _warn("WARNING: aligned reference length is inconsistent "
                      f"with CIGAR at line {lineno}")
            if is_sam:
                qs = clip[1 if is_rev else 0]
                qe = qs + ql
                ori_qlen = clip[0] + ql + clip[1]
            regs.append([qs, qe])
            last_qlen = ori_qlen
    if last is not None:
        l_tot += last_qlen
        l_cov += cov_len(regs)

    if ns.gap_out_len is None:
        print(f"Number of mapped sequences: {n_seq}")
        print(f"Number of primary alignments: {n_pri}")
        print(f"Number of secondary alignments: {n_2nd}")
        print("Number of primary alignments with >65535 CIGAR operations: "
              f"{n_cigar_64k}")
        print(f"Number of bases in mapped sequences: {l_tot}")
        print(f"Number of mapped bases: {l_cov}")
        names = ["insertions", "deletions"]
        bins = ["[0,50)", "[50,100)", "[100,300)", "[300,400)", "[400,1000)",
                "[1000,inf)"]
        for w in range(2):
            for b in range(6):
                print(f"Number of {names[w]} in {bins[b]}: {n_gap[w][b]}")


# ------------------------------------------------------------------ sam2paf

def paf_sam2paf(argv):
    ap = argparse.ArgumentParser(prog="paftools sam2paf")
    ap.add_argument("-p", dest="pri_only", action="store_true")
    ap.add_argument("input")
    ns = ap.parse_args(argv)

    re_md = re.compile(r"(\d+)|(\^[A-Za-z]+)|([A-Za-z])")
    re_tag = re.compile(r"\t(\S\S:[AZif]):(\S+)")
    ctg_len = {}
    lineno = 0
    with _open(ns.input) as f:
        for line in f:
            line = line.rstrip("\n")
            lineno += 1
            if line.startswith("@"):
                if line.startswith("@SQ"):
                    mn = re.search(r"\tSN:(\S+)", line)
                    ml = re.search(r"\tLN:(\d+)", line)
                    if mn and ml:
                        ctg_len[mn.group(1)] = int(ml.group(1))
                continue
            t = line.split("\t", 11)
            flag = int(t[1])
            if t[9] != "*" and t[10] != "*" and len(t[9]) != len(t[10]):
                raise SystemExit(f"at line {lineno}: inconsistent SEQ and "
                                 f"QUAL lengths - {len(t[9])} != {len(t[10])}")
            if t[2] == "*" or (flag & 4) or t[5] == "*":
                continue
            if ns.pri_only and (flag & 0x100):
                continue
            tlen = ctg_len.get(t[2])
            if tlen is None:
                raise SystemExit(f"at line {lineno}: can't find the length "
                                 f"of contig {t[2]}")
            nn, NM, MD = 0, None, None
            for m in re_tag.finditer(line):
                if m.group(1) == "NM:i":
                    NM = int(m.group(2))
                elif m.group(1) == "nn:i":
                    nn = int(m.group(2))
                elif m.group(1) == "MD:Z":
                    MD = m.group(2)
            if t[9] == "*":
                MD = None
            clip = [0, 0]
            soft_clip = 0
            I = [0, 0]
            D = [0, 0]
            M = N = mm = 0
            have_M = have_ext = False
            cigar = []
            n_cigar = 0
            for m in RE_CIGAR.finditer(t[5]):
                ln, op = int(m.group(1)), m.group(2)
                if op == "M":
                    M += ln
                    have_M = True
                elif op == "I":
                    I[0] += 1
                    I[1] += ln
                elif op == "D":
                    D[0] += 1
                    D[1] += ln
                elif op == "N":
                    N += ln
                elif op == "S":
                    clip[0 if n_cigar == 0 else 1] = ln
                    soft_clip += ln
                elif op == "H":
                    clip[0 if n_cigar == 0 else 1] = ln
                elif op == "=":
                    M += ln
                    have_ext = True
                    op = "M"
                elif op == "X":
                    M += ln
                    mm += ln
                    have_ext = True
                    op = "M"
                n_cigar += 1
                if MD is not None and op != "H":
                    if cigar and cigar[-1][1] == op:
                        cigar[-1][0] += ln
                    else:
                        cigar.append([ln, op])
            ql = M + I[1] + soft_clip
            tl = M + D[1] + N
            ts = int(t[3]) - 1
            te = ts + tl
            if n_cigar > 65535:
                _warn(f"WARNING at line {lineno}: {n_cigar} CIGAR operations")
            if te > tlen:
                _warn(f"WARNING at line {lineno}: alignment end position "
                      "larger than ref length; skipped")
                continue
            if t[9] != "*" and len(t[9]) != ql:
                _warn(f"WARNING at line {lineno}: SEQ length inconsistent "
                      f"with CIGAR ({len(t[9])} != {ql}); skipped")
                continue
            cs = []
            if MD is not None:
                k = cx = cy = mx = my = 0
                ok = True
                for m in re_md.finditer(MD):
                    if m.group(2) is not None:  # deletion from the reference
                        ln = len(m.group(2)) - 1
                        cs.extend(["-", m.group(2)[1:]])
                        mx += ln
                        cx += ln
                        k += 1
                    else:
                        ml = int(m.group(1)) if m.group(1) is not None else 1
                        while k < len(cigar) and cigar[k][1] != "D":
                            cl, op = cigar[k]
                            if op == "M":
                                if my + ml < cy + cl:
                                    if ml > 0:
                                        if m.group(3) is not None:
                                            cs.extend(["*", m.group(3),
                                                       t[9][my]])
                                        else:
                                            cs.extend([":", str(ml)])
                                    mx += ml
                                    my += ml
                                    ml = 0
                                    break
                                dl = cy + cl - my
                                cs.extend([":", str(dl)])
                                cx += cl
                                cy += cl
                                k += 1
                                mx += dl
                                my += dl
                                ml -= dl
                            elif op == "I":
                                cs.extend(["+", t[9][cy:cy + cl]])
                                cy += cl
                                my += cl
                                k += 1
                            elif op == "S":
                                cy += cl
                                my += cl
                                k += 1
                            else:
                                raise SystemExit(f"at line {lineno}: "
                                                 "inconsistent MD tag")
                        if ml != 0:
                            raise SystemExit(f"at line {lineno}: "
                                             "inconsistent MD tag")
                if cx != mx or cy != my:
                    raise SystemExit(f"at line {lineno}: inconsistent MD tag")
            if have_ext and not have_M:  # extended CIGAR
                if NM is not None and NM != I[1] + D[1] + mm:
                    _warn(f"WARNING at line {lineno}: NM is different from "
                          "sum of gaps and mismatches")
                NM = I[1] + D[1] + mm
            elif NM is not None:
                if NM < I[1] + D[1]:
                    _warn(f"WARNING at line {lineno}: NM is less than the "
                          f"total number of gaps ({NM} < {I[1] + D[1]})")
                    NM = I[1] + D[1]
                mm = NM - (I[1] + D[1])
            else:
                _warn(f"WARNING at line {lineno}: unable to find the number "
                      "of mismatches; assuming zero")
                mm = 0
            mlen = M - mm
            blen = M + I[1] + D[1]
            qlen = M + I[1] + clip[0] + clip[1]
            qname = t[0]
            if (flag & 1) and (flag & 0x40):
                qname += "/1"
            if (flag & 1) and (flag & 0x80):
                qname += "/2"
            if flag & 16:
                qs, qe = clip[1], qlen - clip[0]
            else:
                qs, qe = clip[0], qlen - clip[1]
            tags = ["tp:A:" + ("S" if flag & 0x100 else "P")]
            if NM is not None:
                tags.append(f"mm:i:{mm}")
            tags.append(f"gn:i:{I[1] + D[1]}")
            tags.append(f"go:i:{I[0] + D[0]}")
            tags.append("cg:Z:" + re.sub(r"\d+[SH]", "", t[5]))
            if cs:
                tags.append("cs:Z:" + "".join(cs))
            _print(qname, qlen, qs, qe, "-" if flag & 16 else "+", t[2],
                   tlen, ts, te, mlen, blen, t[4], *tags)


# --------------------------------------------------------------------- view

def _update_aln(s_ref, s_qry, s_mid, typ, seq, slen):
    ln = 1 if typ == "*" else len(seq)
    if typ in "=:":
        s_ref.append(seq)
        s_qry.append(seq)
        s_mid.append("|" * ln)
        slen[0] += ln
        slen[1] += ln
    elif typ == "*":
        s_ref.append(seq[0])
        s_qry.append(seq[1])
        s_mid.append(" ")
        slen[0] += 1
        slen[1] += 1
    elif typ == "+":
        s_ref.append("-" * ln)
        s_qry.append(seq)
        s_mid.append(" " * ln)
        slen[1] += ln
    elif typ == "-":
        s_ref.append(seq)
        s_qry.append("-" * ln)
        s_mid.append(" " * ln)
        slen[0] += ln


def paf_view(argv):
    ap = argparse.ArgumentParser(prog="paftools view")
    ap.add_argument("-f", dest="fmt", default="aln",
                    choices=["aln", "lastz-cigar", "maf"])
    ap.add_argument("-l", dest="line_len", type=int, default=80)
    ap.add_argument("input")
    ns = ap.parse_args(argv)
    line_len = ns.line_len if ns.line_len else 0x7FFFFFFF

    def print_aln(rs, qs, strand, slen, elen, s_ref, s_qry, s_mid):
        r, q, m = "".join(s_ref), "".join(s_qry), "".join(s_mid)
        print(" ".join(["Ref+:", f"{rs + slen[0] + 1:>10}", r,
                        f"{rs + elen[0]:<10}"]))
        print("                 " + m)
        if strand == "+":
            st, en = qs + slen[1] + 1, qs + elen[1]
        else:
            st, en = qs - slen[1], qs - elen[1] + 1
        print(" ".join([f"Qry{strand}:", f"{st:>10}", q, f"{en:<10}"]))

    lineno = 0
    if ns.fmt == "maf":
        print("##maf version=1\n")
    with _open(ns.input) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            t = line.split("\t", 12)
            lineno += 1
            s_ref, s_qry, s_mid = [], [], []
            slen, elen = [0, 0], [0, 0]
            if ns.fmt == "lastz-cigar":
                m = re.search(r"\tcg:Z:(\S+)", line)
                if m is None:
                    _warn("WARNING: converting to LASTZ-cigar format requires "
                          f"the 'cg' tag, which is absent on line {lineno}")
                    continue
                ms = re.search(r"\tAS:i:(\d+)", line)
                score = ms.group(1) if ms else 0
                out = ["cigar:", t[0], t[2], t[3], t[4], t[5], t[7], t[8],
                       "+", score]
                for mm in RE_CIGAR.finditer(m.group(1)):
                    out.extend([mm.group(2), mm.group(1)])
                print(" ".join(str(x) for x in out))
            elif ns.fmt == "maf":
                m = re.search(r"\tcs:Z:(\S+)", line)
                if m is None:
                    _warn("WARNING: converting to MAF requires the 'cs' tag, "
                          f"which is absent on line {lineno}")
                    continue
                for mm in RE_CS.finditer(m.group(1)):
                    if mm.group(1) == ":":
                        raise SystemExit("converting to MAF only works with "
                                         "'minimap2 --cs=long'")
                    _update_aln(s_ref, s_qry, s_mid, mm.group(1),
                                mm.group(2), elen)
                ms = re.search(r"\tAS:i:(\d+)", line)
                score = int(ms.group(1)) if ms else 0
                ln = max(len(t[0]), len(t[5]))
                print(f"a {score}")
                print(" ".join(["s", f"{t[5]:<{ln}}", f"{t[7]:>10}",
                                f"{int(t[8]) - int(t[7]):>10}", "+",
                                f"{t[6]:>10}", "".join(s_ref)]))
                ql = int(t[1])
                if t[4] == "+":
                    qs, qe = int(t[2]), int(t[3])
                else:
                    qs, qe = ql - int(t[3]), ql - int(t[2])
                print(" ".join(["s", f"{t[0]:<{ln}}", f"{qs:>10}",
                                f"{qe - qs:>10}", t[4], f"{ql:>10}",
                                "".join(s_qry)]))
                print("")
            else:  # BLAST-like
                m = re.search(r"\tcs:Z:(\S+)", line)
                if m is None:
                    _warn("WARNING: converting to BLAST-like alignment "
                          "requires the 'cs' tag, which is absent on line "
                          f"{lineno}")
                    continue
                cs = m.group(1)
                print(">" + re.sub(r"\tc[sg]:Z:\S+", "", line))
                rs = int(t[7])
                qs = int(t[2]) if t[4] == "+" else int(t[3])
                n_blocks = 0
                cur_len = 0
                for mm in RE_CS.finditer(cs):
                    typ, seq = mm.group(1), mm.group(2)
                    if typ == ":":
                        seq = "=" * int(seq)
                    start, rest = 0, 1 if typ == "*" else len(seq)
                    while rest > 0:
                        if cur_len + rest >= line_len:
                            l_proc = line_len - cur_len
                            _update_aln(s_ref, s_qry, s_mid, typ,
                                        seq if typ == "*"
                                        else seq[start:start + l_proc], elen)
                            if n_blocks > 0:
                                print("")
                            print_aln(rs, qs, t[4], slen, elen,
                                      s_ref, s_qry, s_mid)
                            n_blocks += 1
                            s_ref, s_qry, s_mid = [], [], []
                            cur_len = 0
                            slen = list(elen)
                        else:
                            l_proc = rest
                            _update_aln(s_ref, s_qry, s_mid, typ,
                                        seq if typ == "*"
                                        else seq[start:start + l_proc], elen)
                            cur_len += l_proc if typ != "*" else 1
                        rest -= l_proc
                        start += l_proc
                if s_ref:
                    if n_blocks > 0:
                        print("")
                    print_aln(rs, qs, t[4], slen, elen, s_ref, s_qry, s_mid)
                print("//")


# ---------------------------------------------------------------- delta2paf

def paf_delta2paf(argv):
    ap = argparse.ArgumentParser(prog="paftools delta2paf")
    ap.add_argument("input")
    ns = ap.parse_args(argv)
    rname = qname = None
    rlen = qlen = 0
    seen_gt = False
    with _open(ns.input) as f:
        for line in f:
            line = line.rstrip("\n")
            m = re.match(r"^>(\S+)\s+(\S+)\s+(\d+)\s+(\d+)", line)
            if m:
                rname, qname = m.group(1), m.group(2)
                rlen, qlen = int(m.group(3)), int(m.group(4))
                seen_gt = True
                continue
            if not seen_gt:
                continue
            t = line.split(" ")
            if len(t) == 7:
                ti = [int(x) for x in t[:5]]
                strand = 1 if ((ti[0] < ti[1]) == (ti[2] < ti[3])) else -1
                rs, rE = min(ti[0], ti[1]) - 1, max(ti[0], ti[1])
                qs, qE = min(ti[2], ti[3]) - 1, max(ti[2], ti[3])
                x = y = 0
                NM = ti[4]
                cigar = []
            elif len(t) == 1:
                d = int(t[0])
                if d == 0:
                    blen = 0
                    cigar_str = []
                    if rE - rs - x != qE - qs - y:
                        raise SystemExit("inconsisnt alignment")
                    cigar.append((rE - rs - x) << 4)
                    for c in cigar:
                        blen += c >> 4
                        cigar_str.append(f"{c >> 4}{'MID'[c & 0xF]}")
                    _print(qname, qlen, qs, qE, "+" if strand > 0 else "-",
                           rname, rlen, rs, rE, blen - NM, blen, 0,
                           f"NM:i:{NM}", "cg:Z:" + "".join(cigar_str))
                elif d > 0:
                    ln = d - 1
                    x += ln + 1
                    y += ln
                    if ln > 0:
                        cigar.append(ln << 4)
                    if cigar and (cigar[-1] & 0xF) == 2:
                        cigar[-1] += 1 << 4
                    else:
                        cigar.append(1 << 4 | 2)
                else:
                    ln = -d - 1
                    x += ln
                    y += ln + 1
                    if ln > 0:
                        cigar.append(ln << 4)
                    if cigar and (cigar[-1] & 0xF) == 1:
                        cigar[-1] += 1 << 4
                    else:
                        cigar.append(1 << 4 | 1)


# --------------------------------------------------------------- splice2bed

def paf_splice2bed(argv):
    ap = argparse.ArgumentParser(prog="paftools splice2bed")
    ap.add_argument("-m", dest="keep_multi", action="store_true")
    ap.add_argument("-f", dest="fmt", default="bed")
    ap.add_argument("-n", dest="name_conv", default=None)
    ap.add_argument("input")
    ns = ap.parse_args(argv)
    colors = ["0,128,255", "255,0,0", "0,192,0"]

    def print_lines(a):
        if not a:
            return
        n_pri = sum(1 for x in a if x[8] == 0)
        if n_pri > 1:
            for x in a:
                if x[8] == 0:
                    x[8] = 1
        elif n_pri == 0:
            _warn(f"Warning: {a[0][3]} doesn't have a primary alignment")
        for x in a:
            if not ns.keep_multi and x[8] == 2:
                continue
            x[8] = colors[x[8]]
            _print(*x)
        a.clear()

    conv = None
    if ns.name_conv is not None:
        conv = {}
        with _open(ns.name_conv) as f:
            for line in f:
                t = line.rstrip("\n").split("\t")
                conv[t[0]] = t[1]

    a = []
    with _open(ns.input) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line[0] == "@":
                continue
            t = line.split("\t")
            is_pri = False
            cigar = None
            if conv is not None and t[0] in conv:
                t[0] = conv[t[0]]
            if (len(t) >= 10 and t[4] not in "+-"
                    and re.match(r"^\d+", t[1])):  # SAM read-pair suffix
                flag = int(t[1])
                if flag & 1:
                    t[0] += "/" + str(flag >> 6 & 3)
            if a and a[0][3] != t[0]:
                print_lines(a)
            if len(t) >= 12 and t[4] in "+-":  # PAF
                for fld in t[12:]:
                    if fld.startswith("cg:Z:"):
                        cigar = fld[5:]
                    elif fld.startswith("s2:i:"):
                        is_pri = True
                a1 = [t[5], int(t[7]), int(t[8]), t[0],
                      int(t[9]) * 1000 // int(t[10]), t[4]]
            elif len(t) >= 10:  # SAM
                flag = int(t[1])
                if (flag & 4) or t[2] == "*":
                    continue
                cigar = t[5]
                is_pri = not (flag & 0x100)
                a1 = [t[2], int(t[3]) - 1, None, t[0], 1000,
                      "-" if flag & 16 else "+"]
            else:
                raise SystemExit("unrecognized input format")
            if cigar is None:
                raise SystemExit("missing CIGAR")
            x0 = x = 0
            bs, bl = [], []
            for m in RE_CIGAR.finditer(cigar):
                if m.group(2) in "MD":
                    x += int(m.group(1))
                elif m.group(2) == "N":
                    bs.append(x0)
                    bl.append(x - x0)
                    x += int(m.group(1))
                    x0 = x
            bs.append(x0)
            bl.append(x - x0)
            if a1[2] is None:
                a1[2] = a1[1] + x
            a1.extend([a1[1], a1[2], 0 if is_pri else 2, len(bs),
                       ",".join(map(str, bl)) + ",",
                       ",".join(map(str, bs)) + ","])
            a.append(a1)
    print_lines(a)


# ------------------------------------------------------------------ gff2bed

def paf_gff2bed(argv):
    ap = argparse.ArgumentParser(prog="paftools gff2bed")
    ap.add_argument("-u", dest="ucsc_fai", default=None)
    ap.add_argument("-s", dest="is_short", action="store_true")
    ap.add_argument("-g", dest="keep_gff", action="store_true")
    ap.add_argument("input")
    ns = ap.parse_args(argv)

    ens2ucsc = {}
    if ns.ucsc_fai is not None:
        with _open(ns.ucsc_fai) as f:
            for line in f:
                t = line.rstrip("\n").split("\t")
                s = t[0]
                if re.search(r"_(random|alt|decoy)$", s):
                    s = re.sub(r"_(random|alt|decoy)$", "", s)
                    s = re.sub(r"^chr\S+_", "", s)
                else:
                    s = re.sub(r"^chrUn_", "", s)
                s = re.sub(r"v(\d+)", r".\1", s)
                if s != t[0]:
                    ens2ucsc[s] = t[0]

    colors = {"protein_coding": "0,128,255", "lincRNA": "0,192,0",
              "snRNA": "0,192,0", "miRNA": "0,192,0", "misc_RNA": "0,192,0"}
    re_gtf = re.compile(r'(transcript_id|transcript_type|transcript_biotype|'
                        r'gene_name|transcript_name) "([^"]+)";')
    re_gff3 = re.compile(r"(transcript_id|transcript_type|transcript_biotype|"
                         r"gene_name|transcript_name)=([^;]+)")

    gname = "N/A"  # NB: mirrors the reference's leaked `name` global

    def print_bed12(exons, cds_st, cds_en):
        if not exons:
            return
        name = (exons[0][7] + "|" + exons[0][5] if ns.is_short
                else "|".join(str(x) for x in exons[0][4:7]))
        a = sorted(exons, key=lambda e: e[1])
        st, en = a[0][1], a[-1][2]
        if cds_st == 1 << 30:
            cds_st = st
        if cds_en == 0:
            cds_en = en
        if cds_st < st or cds_en > en:
            raise SystemExit("inconsistent thick start or end for "
                             f"transcript {a[0][4]}")
        sizes = [e[2] - e[1] for e in a]
        starts = [e[1] - st for e in a]
        color = colors.get(a[0][5], "196,196,196")
        _print(a[0][0], st, en, name, 1000, a[0][3], cds_st, cds_en, color,
               len(a), ",".join(map(str, sizes)) + ",",
               ",".join(map(str, starts)) + ",")

    exons = []
    cds_st, cds_en = 1 << 30, 0
    last_id = None
    with _open(ns.input) as f:
        for line in f:
            t = line.rstrip("\n").split("\t")
            if ns.keep_gff:
                if t[0] and t[0][0] != "#" and t[0] in ens2ucsc:
                    t[0] = ens2ucsc[t[0]]
                print("\t".join(t))
                continue
            if not t[0] or t[0][0] == "#":
                continue
            if len(t) < 9 or t[2] not in ("CDS", "exon"):
                continue
            st3 = int(t[3]) - 1
            en4 = int(t[4])
            tid, typ, biotype, tname = None, "", "", "N/A"
            for m in list(re_gtf.finditer(t[8])) + list(re_gff3.finditer(t[8])):
                if m.group(1) == "transcript_id":
                    tid = m.group(2)
                elif m.group(1) == "transcript_type":
                    typ = m.group(2)
                elif m.group(1) == "transcript_biotype":
                    biotype = m.group(2)
                elif m.group(1) == "gene_name":
                    gname = m.group(2)
                elif m.group(1) == "transcript_name":
                    tname = m.group(2)
            if typ == "" and biotype != "":
                typ = biotype
            if tid is None:
                raise SystemExit("No transcript_id")
            if tid != last_id:
                print_bed12(exons, cds_st, cds_en)
                exons = []
                cds_st, cds_en = 1 << 30, 0
                last_id = tid
            if t[2] == "CDS":
                cds_st = min(cds_st, st3)
                cds_en = max(cds_en, en4)
            else:
                chrom = t[0]
                if ns.ucsc_fai is not None:
                    if chrom in ens2ucsc:
                        chrom = ens2ucsc[chrom]
                    elif re.match(r"^[A-Z]+\d+\.\d+$", chrom):
                        chrom = re.sub(r"([A-Z]+\d+)\.(\d+)",
                                       r"chrUn_\1v\2", chrom)
                exons.append([chrom, st3, en4, t[6], tid, typ, gname, tname])
    if last_id is not None:
        print_bed12(exons, cds_st, cds_en)


# ----------------------------------------------------------------- liftover

def paf_liftover(argv):
    ap = argparse.ArgumentParser(prog="paftools liftover")
    ap.add_argument("-m", dest="to_merge", action="store_true")
    ap.add_argument("-q", dest="min_mapq", type=int, default=5)
    ap.add_argument("-l", dest="min_len", type=int, default=50000)
    ap.add_argument("-d", dest="max_div", type=float, default=2.0)
    ap.add_argument("paf")
    ap.add_argument("bed")
    ns = ap.parse_args(argv)

    bed = {}
    with _open(ns.bed) as f:
        for line in f:
            t = line.rstrip("\n").split("\t")
            bed.setdefault(t[0], []).append([int(t[1]), int(t[2])])
    for chrom in bed:
        intv_sort(bed[chrom])
        if ns.to_merge:
            intv_merge(bed[chrom], True)
        intv_index_end(bed[chrom], True)

    re_tag = re.compile(r"^(\S\S):([AZif]):(\S+)$")
    with _open(ns.paf) as f:
        for line in f:
            t = line.rstrip("\n").split("\t")
            if t[0] not in bed:
                continue
            tp = cg = None
            for fld in t[12:]:
                m = re_tag.match(fld)
                if m:
                    if m.group(1) == "tp":
                        tp = m.group(3)
                    elif m.group(1) == "cg":
                        cg = m.group(3)
            if tp not in ("P", "I"):
                continue
            if cg is None:
                raise SystemExit("unable to find the 'cg' tag")
            for i in (1, 2, 3, 6, 7, 8, 9, 10, 11):
                t[i] = int(t[i])
            if t[11] < ns.min_mapq or t[10] < ns.min_len:
                continue
            regs = intv_find_ovlp(bed[t[0]], t[2], t[3])
            if not regs:
                continue
            if 0.0 <= ns.max_div < 1.0:
                n_gaps = n_opens = 0
                for m in RE_CIGAR.finditer(cg):
                    if m.group(2) in "ID":
                        n_gaps += int(m.group(1))
                        n_opens += 1
                n_mm = t[10] - t[9] - n_gaps
                n_diff2 = n_mm + n_opens
                if n_diff2 / (n_diff2 + t[9]) > ns.max_div:
                    continue
            a, r = [], []
            strand = t[4]
            for i, (s, e, *_) in enumerate(regs):
                if strand == "+":
                    a.append([s, 0, i, -2])
                    a.append([e - 1, 1, i, -2])
                else:
                    a.append([t[1] - e, 0, i, -2])
                    a.append([t[1] - s - 1, 1, i, -2])
                r.append([-2, -2])
            a.sort(key=lambda x: x[0])
            k, x = 0, t[7]
            y = t[2] if strand == "+" else t[1] - t[3]
            for m in RE_CIGAR.finditer(cg):
                ln = int(m.group(1))
                if m.group(2) == "D":
                    x += ln
                    continue
                while k < len(a) and a[k][0] < y:
                    k += 1
                for i in range(k, len(a)):
                    if y <= a[i][0] < y + ln:
                        a[i][3] = x + (a[i][0] - y) if m.group(2) == "M" else x
                    else:
                        break
                y += ln
                if m.group(2) == "M":
                    x += ln
            if (x != t[8] or (strand == "+" and y != t[3])
                    or (strand == "-" and y != t[1] - t[2])):
                raise SystemExit("CIGAR is inconsistent with mapping "
                                 "coordinates")
            for pos, which, i, lifted in a:
                if which == 0:
                    r[i][0] = lifted
                else:
                    r[i][1] = lifted + 1
            for i, rr in enumerate(r):
                name = "_".join(map(str, (t[0], regs[i][0], regs[i][1])))
                if rr[0] < 0:
                    name += "_t5"
                    rr[0] = t[7]
                if rr[1] < 0:
                    name += "_t3"
                    rr[1] = t[8]
                _print(t[5], rr[0], rr[1], name, 0, strand)


# --------------------------------------------------------------------- call

def paf_call(argv):
    ap = argparse.ArgumentParser(prog="paftools call")
    ap.add_argument("-l", dest="min_cov_len", type=int, default=10000)
    ap.add_argument("-L", dest="min_var_len", type=int, default=50000)
    ap.add_argument("-g", dest="gap_thres", type=int, default=50)
    ap.add_argument("-q", dest="min_mapq", type=int, default=5)
    ap.add_argument("-f", dest="ref_fa", default=None)
    ap.add_argument("input")
    ns = ap.parse_args(argv)

    fa, fa_lens, is_vcf = None, [], False
    if ns.ref_fa is not None:
        from ..io.fastx import read_fastx
        fa = {}
        for rec in read_fastx(ns.ref_fa):
            fa[rec.name] = rec.seq
            fa_lens.append((rec.name, len(rec.seq)))
        is_vcf = True

    re_tag = re.compile(r"\t(\S\S:[AZif]):(\S+)")
    n_sub = [0, 0, 0]
    n_ins = [0, 0, 0, 0]
    n_del = [0, 0, 0, 0]

    def print_vcf(o):
        if o[3] != 1 or (o[5] == "-" and o[6] == "-"):
            return
        rev_s = o[10]
        if o[5] != "-" and o[6] != "-":
            v = [o[0], o[1] + 1, ".", o[5].upper(), o[6].upper()]
        elif o[1] > 0:
            if o[0] not in fa:
                raise SystemExit(f'sequence "{o[0]}" is absent from the '
                                 "reference FASTA")
            ref = fa[o[0]][o[1] - 1].upper()
            if o[5] == "-":
                v = [o[0], o[1], ".", ref, ref + o[6].upper()]
            else:
                v = [o[0], o[1], ".", ref + o[5].upper(), ref]
        else:
            raise SystemExit(f"unexpected variant: {o}")
        v.extend([o[4], ".",
                  f"QNAME={o[7]};QSTART={o[8] + 1};QSTRAND={rev_s}",
                  "GT", "1/1"])
        _print(*v)

    def count_var(o):
        if o[3] > 1 or (o[5] == "-" and o[6] == "-"):
            return
        if o[5] == "-":
            ln = len(o[6])
            n_ins[0 if ln == 1 else 1 if ln == 2
                  else 2 if ln < ns.gap_thres else 3] += 1
        elif o[6] == "-":
            ln = len(o[5])
            n_del[0 if ln == 1 else 1 if ln == 2
                  else 2 if ln < ns.gap_thres else 3] += 1
        else:
            n_sub[0] += 1
            s = (o[5] + o[6]).lower()
            if s in ("ag", "ga", "ct", "tc"):
                n_sub[1] += 1
            else:
                n_sub[2] += 1

    def flush(o):
        count_var(o)
        if is_vcf:
            print_vcf(o)
        else:
            _print("V", *o)

    if is_vcf:
        print("##fileformat=VCFv4.1")
        for name, ln in fa_lens:
            print(f"##contig=<ID={name},length={ln}>")
        print('##INFO=<ID=QNAME,Number=1,Type=String,'
              'Description="Query name">')
        print('##INFO=<ID=QSTART,Number=1,Type=Integer,'
              'Description="Query start">')
        print('##INFO=<ID=QSTRAND,Number=1,Type=String,'
              'Description="Query strand">')
        print('##FORMAT=<ID=GT,Number=1,Type=String,'
              'Description="Genotype">')
        print("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tsample")

    a, out = [], []
    c1_ctg, c1_start, c1_end, c1_counted, c1_len = None, 0, 0, False, 0
    with _open(ns.input) as f:
        for line in f:
            line = line.rstrip("\n")
            t = line.split("\t", 12)
            for i in range(6, 12):
                t[i] = int(t[i])
            if t[10] < ns.min_cov_len or t[11] < ns.min_mapq:
                continue
            for i in range(1, 4):
                t[i] = int(t[i])
            ctg, x, end = t[5], t[7], t[8]
            query, rev = t[0], t[4] == "-"
            y = t[3] if rev else t[2]
            cs = tp = None
            have_s1 = have_s2 = False
            for m in re_tag.finditer(line):
                if m.group(1) == "cs:Z":
                    cs = m.group(2)
                elif m.group(1) == "tp:A":
                    tp = m.group(2)
                elif m.group(1) == "s1:i":
                    have_s1 = True
                elif m.group(1) == "s2:i":
                    have_s2 = True
            if have_s1 and not have_s2:
                continue
            if tp in ("S", "i"):
                continue
            if ctg != c1_ctg or x >= c1_end:
                if c1_counted and c1_end > c1_start:
                    c1_len += c1_end - c1_start
                    if not is_vcf:
                        _print("R", c1_ctg, c1_start, c1_end)
                c1_ctg, c1_start, c1_end = ctg, x, end
                c1_counted = t[10] >= ns.min_var_len
            elif end > c1_end:  # overlap
                if c1_counted and x > c1_start:
                    c1_len += x - c1_start
                    if not is_vcf:
                        _print("R", c1_ctg, c1_start, x)
                c1_start, c1_end = c1_end, end
                c1_counted = t[10] >= ns.min_var_len
            elif end > c1_start:  # contained
                if c1_counted and x > c1_start:
                    c1_len += x - c1_start
                    if not is_vcf:
                        _print("R", c1_ctg, c1_start, x)
                c1_start = end
            while out:
                if out[0][0] != ctg or out[0][2] <= x:
                    flush(out.pop(0))
                else:
                    break
            for o in out:
                if o[1] >= x and o[2] <= end:
                    o[3] += 1
            a = [ai for ai in a if a and a[0][0] == ctg and a[0][2] > x]
            if t[10] >= ns.min_var_len:
                if cs is None:
                    continue
                for m in RE_CS.finditer(cs):
                    cov = 1
                    if m.group(1) in "*+-":
                        for _ai in a:
                            if a[0][2] > x:
                                cov += 1
                    if m.group(1) in "=:":
                        ln = (len(m.group(2)) if m.group(1) == "="
                              else int(m.group(2)))
                        y = y - ln if rev else y + ln
                        x += ln
                    elif m.group(1) == "*":
                        if rev:
                            qs, qe = y - 1, y
                            y -= 1
                        else:
                            qs, qe = y, y + 1
                            y += 1
                        br, bq = m.group(2)[0], m.group(2)[1]
                        if br != "n" and bq != "n":
                            out.append([t[5], x, x + 1, cov, t[11], br, bq,
                                        query, qs, qe, "-" if rev else "+"])
                        x += 1
                    elif m.group(1) == "+":
                        ln = len(m.group(2))
                        if rev:
                            qs, qe = y - ln, y
                            y -= ln
                        else:
                            qs, qe = y, y + ln
                            y += ln
                        out.append([t[5], x, x, cov, t[11], "-", m.group(2),
                                    query, qs, qe, "-" if rev else "+"])
                    elif m.group(1) == "-":
                        ln = len(m.group(2))
                        out.append([t[5], x, x + ln, cov, t[11], m.group(2),
                                    "-", query, y, y, "-" if rev else "+"])
                        x += ln
            a.append([t[5], t[7], t[8]])
    if c1_counted and c1_end > c1_start:
        c1_len += c1_end - c1_start
        if not is_vcf:
            _print("R", c1_ctg, c1_start, c1_end)
    while out:
        flush(out.pop(0))

    _warn(f"{c1_len} reference bases covered by exactly one contig")
    tstv = n_sub[1] / n_sub[2] if n_sub[2] else float("nan")
    _warn(f"{n_sub[0]} substitutions; ts/tv = {tstv:.3f}")
    _warn(f"{n_del[0]} 1bp deletions")
    _warn(f"{n_ins[0]} 1bp insertions")
    _warn(f"{n_del[1]} 2bp deletions")
    _warn(f"{n_ins[1]} 2bp insertions")
    _warn(f"{n_del[2]} [3,{ns.gap_thres}) deletions")
    _warn(f"{n_ins[2]} [3,{ns.gap_thres}) insertions")
    _warn(f"{n_del[3]} >={ns.gap_thres} deletions")
    _warn(f"{n_ins[3]} >={ns.gap_thres} insertions")


# ------------------------------------------------------------------- bedcov

def _read_bed12(fn, to_merge, to_dedup):
    h = {}
    with _open(fn) as f:
        for line in f:
            t = line.rstrip("\n").split("\t")
            lst = h.setdefault(t[0], [])
            bst, ben = int(t[1]), int(t[2])
            if len(t) >= 12 and re.match(r"^\d+$", t[9]):
                n = int(t[9])
                sz = t[10].split(",")
                st = t[11].split(",")
                for i in range(n):
                    lst.append([bst + int(st[i]),
                                bst + int(st[i]) + int(sz[i]), 0, 0, 0])
            else:
                lst.append([bst, ben, 0, 0, 0])
    for chrom in h:
        if to_merge:
            intv_merge(h[chrom], False)
        elif to_dedup:
            intv_dedup(h[chrom], False)
        else:
            intv_sort(h[chrom])
        intv_index_end(h[chrom])
    return h


def paf_bedcov(argv):
    ap = argparse.ArgumentParser(prog="paftools bedcov")
    ap.add_argument("-p", dest="print_len", action="store_true")
    ap.add_argument("-d", dest="dedup", action="store_true")
    ap.add_argument("-e", dest="excl", default=None)
    ap.add_argument("regions")
    ap.add_argument("target")
    ns = ap.parse_args(argv)
    to_merge, to_dedup = (False, True) if ns.dedup else (True, False)

    excl = _read_bed12(ns.excl, True, False) if ns.excl else None
    target = _read_bed12(ns.regions, to_merge, to_dedup)

    tot_len = hit_len = 0
    with _open(ns.target) as f:
        for line in f:
            t = line.rstrip("\n").split("\t")
            a = []
            bst, ben = int(t[1]), int(t[2])
            if len(t) >= 12 and re.match(r"^\d+$", t[9]):
                n = int(t[9])
                sz = t[10].split(",")
                st = t[11].split(",")
                for i in range(n):
                    a.append([bst + int(st[i]),
                              bst + int(st[i]) + int(sz[i]), False])
            else:
                a.append([bst, ben, False])
            feat_len = 0
            for ai in a:
                if excl is not None and t[0] in excl:
                    if intv_find_ovlp(excl[t[0]], ai[0], ai[1]):
                        continue
                ai[2] = True
                feat_len += ai[1] - ai[0]
            tot_len += feat_len
            if t[0] not in target:
                continue
            b = []
            for ai in a:
                if not ai[2]:
                    continue
                for o in intv_find_ovlp(target[t[0]], ai[0], ai[1]):
                    max_st = max(o[0], ai[0])
                    min_en = min(o[1], ai[1])
                    b.append([max_st, min_en])
                    o[2] += min_en - max_st
                    o[3] += 1
                    if max_st == o[0] and min_en == o[1]:
                        o[4] += 1
            feat_hit_len = 0
            if b:
                b.sort(key=lambda x: x[0])
                st, en = b[0]
                for s, e in b[1:]:
                    if s <= en:
                        en = max(en, e)
                    else:
                        feat_hit_len += en - st
                        st, en = s, e
                feat_hit_len += en - st
            hit_len += feat_hit_len
            if ns.print_len:
                _print("F", *t[:4], feat_len, feat_hit_len)
    _warn(f"# target bases: {tot_len}")
    pct = 100.0 * hit_len / tot_len if tot_len else float("nan")
    _warn(f"# target bases overlapping regions: {hit_len} ({pct:.2f}%)")


# ------------------------------------------------------------------ mapeval

RE_PBSIM = re.compile(r"^(\S+)!(\S+)!(\d+)!(\d+)!([+\-])$")
RE_MASON = re.compile(
    r"^(\S+)!(\S+)!(\d+)_(\d+)!(\d+)_(\d+)!([+\-])([+\-])/([12])$")


def paf_mapeval(argv):
    ap = argparse.ArgumentParser(prog="paftools mapeval")
    ap.add_argument("-Q", dest="err_out_q", type=int, default=None)
    ap.add_argument("-r", dest="ovlp_ratio", type=float, default=0.1)
    ap.add_argument("-m", dest="mode", type=int, default=0)
    ap.add_argument("-c", dest="cap_short_mapq", action="store_true")
    ap.add_argument("input")
    ns = ap.parse_args(argv)
    max_mapq = 60
    err_out_q = 256 if ns.err_out_q is None else ns.err_out_q

    tot = [0] * (max_mapq + 1)
    err = [0] * (max_mapq + 1)

    def is_correct(s, b):
        if s[0] != b[0] or s[3] != b[3]:
            return False
        if s[1] < b[1]:
            if s[2] <= b[1]:
                return False
            o = min(s[2], b[2]) - b[1]
            length = max(s[2], b[2]) - s[1]
        else:
            if b[2] <= s[1]:
                return False
            o = min(s[2], b[2]) - s[1]
            length = max(s[2], b[2]) - b[1]
        return o / length > ns.ovlp_ratio

    def count_err(qname, a):
        if not a:
            return
        m = RE_PBSIM.match(qname)
        if m:
            s = [m.group(2), int(m.group(3)), int(m.group(4)), m.group(5)]
        else:
            m = RE_MASON.match(qname)
            if m is None:
                raise SystemExit("Failed to parse simulated read names "
                                 f"'{qname}'")
            if m.group(9) == "1":
                s = [m.group(2), int(m.group(3)), int(m.group(5)), m.group(7)]
            else:
                s = [m.group(2), int(m.group(4)), int(m.group(6)), m.group(8)]
        if ns.mode in (0, 1):
            max_i = 0
            if ns.mode == 0:
                best = 0
                for i, ai in enumerate(a):
                    if ai[5] > best:
                        best, max_i = ai[5], i
            mapq = a[max_i][4]
            tot[mapq] += 1
            if not is_correct(s, a[max_i]):
                if mapq >= err_out_q:
                    _print("E", qname, *a[max_i])
                err[mapq] += 1
        elif ns.mode == 2:
            if ns.cap_short_mapq:
                best, best_q = 0, 0
                for ai in a:
                    if ai[5] > best:
                        best, best_q = ai[5], ai[4]
                for ai in a:
                    ai[4] = min(best_q, ai[4])
            max_err_mapq, mmax_mapq, max_err_i = -1, 0, -1
            for i, ai in enumerate(a):
                mmax_mapq = max(mmax_mapq, ai[4])
                if not is_correct(s, ai) and ai[4] > max_err_mapq:
                    max_err_mapq, max_err_i = ai[4], i
            if max_err_mapq >= 0:
                tot[max_err_mapq] += 1
                err[max_err_mapq] += 1
                if max_err_mapq >= err_out_q:
                    _print("E", qname, *a[max_err_i])
            else:
                tot[mmax_mapq] += 1

    last, a, n_unmapped = None, [], None
    with _open(ns.input) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line[0] == "@":
                continue
            t = line.split("\t")
            if t[4] in "+-":  # PAF
                if last != t[0]:
                    if last is not None:
                        count_err(last, a)
                    a, last = [], t[0]
                if (re.search(r"\ts1:i:\d+", line)
                        and not re.search(r"\ts2:i:\d+", line)):
                    continue
                mapq = min(int(t[11]), max_mapq)
                a.append([t[5], int(t[7]), int(t[8]), t[4], mapq, int(t[9])])
            else:  # SAM
                flag = int(t[1])
                read_no = flag >> 6 & 0x3
                qname = t[0]
                if not re.search(r"/[12]$", qname) and read_no in (1, 2):
                    qname = f"{t[0]}/{read_no}"
                if last != qname:
                    if last is not None:
                        count_err(last, a)
                    a, last = [], qname
                if flag & 0x100:
                    continue
                if (flag & 4) or t[2] == "*":
                    n_unmapped = (n_unmapped or 0) + 1
                    continue
                mapq = min(int(t[4]), max_mapq)
                pos = int(t[3]) - 1
                pos_end = pos
                n_gap = mlen = 0
                for m in RE_CIGAR.finditer(t[5]):
                    ln = int(m.group(1))
                    if m.group(2) == "M":
                        pos_end += ln
                        mlen += ln
                    elif m.group(2) == "I":
                        n_gap += ln
                    elif m.group(2) == "D":
                        n_gap += ln
                        pos_end += ln
                score = pos_end - pos
                mnm = re.search(r"\tNM:i:(\d+)", line)
                if mnm:
                    NM = int(mnm.group(1))
                    if NM >= n_gap:
                        score = mlen - (NM - n_gap)
                a.append([t[2], pos, pos_end, "-" if flag & 16 else "+",
                          mapq, score])
    if last is not None:
        count_err(last, a)

    sum_tot = sum_err = sum_tot2 = sum_err2 = 0
    q_out = -1
    for q in range(max_mapq, -1, -1):
        if tot[q] == 0:
            continue
        if q_out < 0 or err[q] > 0:
            if q_out >= 0:
                _print("Q", q_out, sum_tot, sum_err,
                       f"{sum_err2 / sum_tot2:.9f}", sum_tot2)
            sum_tot = sum_err = 0
            q_out = q
        sum_tot += tot[q]
        sum_err += err[q]
        sum_tot2 += tot[q]
        sum_err2 += err[q]
    if sum_tot2 > 0:
        _print("Q", q_out, sum_tot, sum_err, f"{sum_err2 / sum_tot2:.9f}",
               sum_tot2)
    if n_unmapped is not None:
        _print("U", n_unmapped)


# ----------------------------------------------------------------- mason2fq

def paf_mason2fq(argv):
    ap = argparse.ArgumentParser(prog="paftools mason2fq")
    ap.add_argument("input")
    ns = ap.parse_args(argv)

    def print_se(a):
        print("@" + "!".join(str(x) for x in a[:5]) + " " + a[8])
        print(a[5])
        print("+")
        print(a[6])

    last = None
    with _open(ns.input) as f:
        for line in f:
            t = line.rstrip("\n").split("\t")
            if t[0].startswith("@"):
                continue
            l_ref = sum(int(m.group(1)) for m in RE_CIGAR.finditer(t[5])
                        if m.group(2) in "DMN")
            flag = int(t[1])
            if flag & 16:
                seq = revcomp(t[9])
                qual = t[10][::-1]
            else:
                seq, qual = t[9], t[10]
            qname = re.sub(r"^simulated\.", "", t[0])
            chrom = t[2]
            pos = int(t[3]) - 1
            strand = "-" if flag & 16 else "+"
            read_no = flag & 0xC0
            read_no = 1 if read_no == 0x40 else 2 if read_no == 0x80 else 0
            errv = snp = indel = 0
            for fld in t[11:]:
                m = re.match(r"^XE:i:(\d+)", fld)
                if m:
                    errv = m.group(1)
                    continue
                m = re.match(r"^XS:i:(\d+)", fld)
                if m:
                    snp = m.group(1)
                    continue
                m = re.match(r"^XI:i:(\d+)", fld)
                if m:
                    indel = m.group(1)
            comment = f"{errv}:{snp}:{indel}"
            cur = [qname, chrom, pos, pos + l_ref, strand, seq, qual,
                   read_no, comment]
            if last is None:
                last = cur
            elif last[0] != qname:
                print_se(last)
                last = cur
            else:
                if read_no == 2:
                    if last[7] != 1:
                        raise SystemExit("ERROR: can't find read1")
                    name = "!".join([qname, chrom, f"{last[2]}_{pos}",
                                     f"{last[3]}_{pos + l_ref}",
                                     last[4] + strand])
                    print(f"@{name}/1 {last[8]}\n{last[5]}\n+\n{last[6]}")
                    print(f"@{name}/2 {comment}\n{seq}\n+\n{qual}")
                else:
                    if last[7] != 2:
                        raise SystemExit("ERROR: can't find read2")
                    name = "!".join([qname, chrom, f"{pos}_{last[2]}",
                                     f"{pos + l_ref}_{last[3]}",
                                     strand + last[4]])
                    print(f"@{name}/1 {comment}\n{seq}\n+\n{qual}")
                    print(f"@{name}/2 {last[8]}\n{last[5]}\n+\n{last[6]}")
                last = None
    if last is not None:
        print_se(last)


# ----------------------------------------------------------------- pbsim2fq

def paf_pbsim2fq(argv):
    ap = argparse.ArgumentParser(prog="paftools pbsim2fq")
    ap.add_argument("fai")
    ap.add_argument("mafs", nargs="+")
    ns = ap.parse_args(argv)

    chr_list = []
    with _open(ns.fai) as f:
        for line in f:
            chr_list.append(re.split(r"\s+", line.rstrip("\n"))[0])

    for fn in ns.mafs:
        state = 0
        reg = None
        with _open(fn) as f:
            for line in f:
                line = line.rstrip("\n")
                if state == 0 and line.startswith("a"):
                    state = 1
                elif state == 1 and line.startswith("s"):
                    t = re.split(r"\s+", line)
                    st = int(t[2])
                    reg = [st, st + int(t[3])]
                    state = 2
                elif state == 2 and line.startswith("s"):
                    t = re.split(r"\s+", line)
                    m = re.search(r"S(\d+)_\d+", t[1])
                    if m is None:
                        raise SystemExit("Failed to parse the read name")
                    chr_id = int(m.group(1)) - 1
                    if chr_id >= len(chr_list):
                        raise SystemExit("Index outside the chr list")
                    name = "!".join(map(str, [t[1], chr_list[chr_id],
                                              reg[0], reg[1], t[4]]))
                    seq = t[6].replace("-", "")
                    if len(seq) != int(t[5]):
                        raise SystemExit("Inconsistent read length")
                    if "NN" not in seq:
                        if t[4] == "-":
                            seq = revcomp(seq)
                        print(">" + name)
                        print(seq)
                    state = 0


# ----------------------------------------------------------------- junceval

def paf_junceval(argv):
    ap = argparse.ArgumentParser(prog="paftools junceval")
    ap.add_argument("-l", dest="l_fuzzy", type=int, default=0)
    ap.add_argument("-e", dest="err_only", action="store_true")
    ap.add_argument("-p", dest="print_ovlp", action="store_true")
    ap.add_argument("-c", dest="chr_only", action="store_true")
    ap.add_argument("gtf")
    ap.add_argument("sam", nargs="?", default="-")
    ns = ap.parse_args(argv)
    print_ovlp = ns.print_ovlp or ns.err_only

    tr = {}
    with _open(ns.gtf) as f:
        for line in f:
            t = line.rstrip("\n").split("\t")
            if t[0].startswith("#") or len(t) < 9 or t[2] != "exon":
                continue
            m = re.search(r'transcript_id "(\S+)"', t[8])
            if m is None:
                continue
            tid = m.group(1)
            if tid not in tr:
                tr[tid] = [t[0], t[6], 0, 0, []]
            tr[tid][4].append([int(t[3]) - 1, int(t[4])])

    anno = {}
    for tid, t in tr.items():
        intv_sort(t[4])
        s = t[4]
        lst = anno.setdefault(t[0], [])
        for i in range(len(s) - 1):
            if s[i][1] >= s[i + 1][0]:
                _warn(f"WARNING: incorrect annotation for transcript {tid} "
                      f"({s[i][1]} >= {s[i + 1][0]})")
            # NB the reference appends inside the warning's (mis-indented)
            # body — i.e. unconditionally; reproduced by appending always
            lst.append([s[i][1], s[i + 1][0]])
    tr = None

    for chrom in anno:
        e = anno[chrom]
        if not e:
            continue
        intv_sort(e)
        intv_dedup(e)
        intv_index_end(e)

    n_pri = n_unmapped = n_mapped = 0
    n_sgl = n_splice = n_splice_hit = n_splice_novel = 0
    last_qname = None
    with _open(ns.sam) as f:
        for line in f:
            t = line.rstrip("\n").split("\t")
            if t[0].startswith("@"):
                continue
            if ns.chr_only and not re.match(r"^(chr)?([0-9]+|X|Y)$", t[2]):
                continue
            flag = int(t[1])
            if flag & 0x100:
                continue
            if t[2] == "*":
                n_unmapped += 1
                continue
            n_pri += 1
            if last_qname != t[0]:
                n_mapped += 1
                last_qname = t[0]
            pos = int(t[3]) - 1
            introns = []
            for m in RE_CIGAR.finditer(t[5]):
                ln, op = int(m.group(1)), m.group(2)
                if op == "N":
                    introns.append([pos, pos + ln])
                    pos += ln
                elif op in "MX=D":
                    pos += ln
            if not introns:
                n_sgl += 1
                continue
            n_splice += len(introns)
            chrom = anno.get(t[2])
            if chrom is not None:
                for i, (ist, ien) in enumerate(introns):
                    o = intv_find_ovlp(chrom, ist, ien)
                    if o:
                        hit = False
                        for oj in o:
                            if (abs(ist - oj[0]) <= ns.l_fuzzy
                                    and abs(ien - oj[1]) <= ns.l_fuzzy):
                                n_splice_hit += 1
                                hit = True
                            if hit:
                                break
                        if print_ovlp:
                            if hit and ns.err_only:
                                continue
                            x = "[" + ", ".join(f"({oj[0]},{oj[1]})"
                                                for oj in o) + "]"
                            _print("C" if hit else "P", t[0], i + 1, t[2],
                                   ist, ien, x)
                    else:
                        n_splice_novel += 1
                        if print_ovlp:
                            _print("N", t[0], i + 1, t[2], ist, ien)
            else:
                n_splice_novel += len(introns)

    if not print_ovlp:
        print(f"# unmapped reads: {n_unmapped}")
        print(f"# mapped reads: {n_mapped}")
        print(f"# primary alignments: {n_pri}")
        print(f"# singletons: {n_sgl}")
        print(f"# predicted introns: {n_splice}")
        print(f"# non-overlapping introns: {n_splice_novel}")
        pct = n_splice_hit / n_splice * 100 if n_splice else float("nan")
        print(f"# correct introns: {n_splice_hit} ({pct:.2f}%)")


# ------------------------------------------------------------------ ov-eval

def paf_ov_eval(argv):
    ap = argparse.ArgumentParser(prog="paftools ov-eval")
    ap.add_argument("-l", dest="min_ovlp", type=int, default=2000)
    ap.add_argument("-f", dest="min_frac", type=float, default=0.95)
    ap.add_argument("-q", dest="min_mapq", type=int, default=10)
    ap.add_argument("to_ref_paf")
    ap.add_argument("ovlp_paf")
    ns = ap.parse_args(argv)

    a, h = [], {}
    with _open(ns.to_ref_paf) as f:
        for line in f:
            t = line.rstrip("\n").split("\t")
            if int(t[11]) < ns.min_mapq:
                continue
            if "tp:A:P" not in t[12:]:
                continue
            for i in (1, 2, 3, 6, 7, 8):
                t[i] = int(t[i])
            if (t[3] - t[2] < ns.min_ovlp or t[8] - t[7] < ns.min_ovlp
                    or (t[3] - t[2]) / t[1] < ns.min_frac):
                continue
            ctg, st, en = t[5], t[7], t[8]
            while a:
                if a[0][0] == ctg and a[0][2] > st:
                    break
                a.pop(0)
            for aj in a:
                if aj[3] == t[0]:
                    continue
                ln = min(en, aj[2]) - st
                if ln >= ns.min_ovlp:
                    key = (min(aj[3], t[0]), max(aj[3], t[0]))
                    h[key] = ln
            a.append([ctg, st, en, t[0]])

    with _open(ns.ovlp_paf) as f:
        for line in f:
            t = line.rstrip("\n").split("\t")
            key = (min(t[0], t[5]), max(t[0], t[5]))
            if h.get(key, 0) > 0:
                h[key] = -h[key]

    n_ovlp = len(h)
    n_missing = sum(1 for v in h.values() if v > 0)
    print(f"{n_ovlp} overlaps inferred from the reference mapping")
    print(f"{n_missing} missed by the read overlapper")
    sens = 100 * (1 - n_missing / n_ovlp) if n_ovlp else float("nan")
    print(f"{sens:.2f}% sensitivity")


# --------------------------------------------------------------------- main

_COMMANDS = {
    "view": paf_view,
    "sam2paf": paf_sam2paf,
    "delta2paf": paf_delta2paf,
    "splice2bed": paf_splice2bed,
    "gff2bed": paf_gff2bed,
    "stat": paf_stat,
    "liftover": paf_liftover,
    "liftOver": paf_liftover,
    "call": paf_call,
    "mapeval": paf_mapeval,
    "bedcov": paf_bedcov,
    "mason2fq": paf_mason2fq,
    "pbsim2fq": paf_pbsim2fq,
    "junceval": paf_junceval,
    "ov-eval": paf_ov_eval,
}

_USAGE = """Usage: paftools <command> [arguments]
Commands:
  view       convert PAF to BLAST-like (for eyeballing) or MAF
  splice2bed convert spliced alignment in PAF/SAM to BED12
  sam2paf    convert SAM to PAF
  delta2paf  convert MUMmer's delta to PAF
  gff2bed    convert GTF/GFF3 to BED12

  stat       collect basic mapping information in PAF/SAM
  liftover   simplistic liftOver
  call       call variants from asm-to-ref alignment with the cs tag
  bedcov     compute the number of bases covered
  version    print paftools version

  mapeval    evaluate mapping accuracy using mason2/PBSIM-simulated FASTQ
  mason2fq   convert mason2-simulated SAM to FASTQ
  pbsim2fq   convert PBSIM-simulated MAF to FASTQ
  junceval   evaluate splice junction consistency with known annotations
  ov-eval    evaluate read overlap sensitivity using read-to-ref mapping"""


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        print(_USAGE)
        return 1
    cmd, rest = argv[0], argv[1:]
    if cmd == "version":
        print(VERSION)
        return 0
    fn = _COMMANDS.get(cmd)
    if fn is None:
        raise SystemExit(f"unrecognized command: {cmd}")
    fn(rest)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
