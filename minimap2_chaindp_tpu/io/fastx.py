"""FASTA/FASTQ reading (gzip-transparent) and batch staging.

Mirrors the behavior of the reference's bseq.c/kseq.h layer: U->T conversion
(bseq.c:70-72), batching by base count (bseq.c:78-123), fragment grouping by
query-name pairing for paired-end mode (bseq.c:98-107), and round-robin
interleave of multiple files (mm_bseq_read_frag2, bseq.c:124).
"""
from __future__ import annotations

import gzip
import io as _io
from dataclasses import dataclass, field
from typing import Iterator, Sequence


@dataclass
class SeqRecord:
    name: str
    seq: str
    qual: str | None = None
    comment: str | None = None
    rid: int = -1


def _open_maybe_gzip(path: str):
    if path == "-":
        # stdin ("-", like the reference's gzdopen(0) path, bseq.c:38):
        # buffer it so the gzip sniff can peek (stdin is not seekable)
        import sys
        f = _io.BufferedReader(sys.stdin.buffer.raw
                               if hasattr(sys.stdin.buffer, "raw")
                               else sys.stdin.buffer)
        magic = f.peek(2)[:2]
        if magic == b"\x1f\x8b":
            return _io.TextIOWrapper(gzip.GzipFile(fileobj=f))
        return _io.TextIOWrapper(f)
    f = open(path, "rb")
    magic = f.read(2)
    f.seek(0)
    if magic == b"\x1f\x8b":
        return _io.TextIOWrapper(gzip.GzipFile(fileobj=f))
    return _io.TextIOWrapper(f)


def read_fastx(path: str) -> Iterator[SeqRecord]:
    """Parse FASTA or FASTQ (auto-detected), converting U/u to T/t like
    bseq.c:70-72. Uses the native (C++) reader when available."""
    from . import native_fastx
    if path != "-" and native_fastx.available():
        for name, seq, qual, comment in native_fastx.read_fastx_native(path):
            yield SeqRecord(name, seq, qual, comment)
        return
    yield from _read_fastx_py(path)


def _read_fastx_py(path: str) -> Iterator[SeqRecord]:
    with _open_maybe_gzip(path) as fh:
        name = None
        comment = None
        seq_parts: list[str] = []
        line = fh.readline()
        while line:
            line = line.rstrip("\n")
            if not line:
                line = fh.readline()
                continue
            if line[0] == ">":
                if name is not None:
                    yield SeqRecord(name, _fix_seq("".join(seq_parts)), None, comment)
                fields = line[1:].split(None, 1)
                name = fields[0] if fields else ""
                comment = fields[1] if len(fields) > 1 else None
                seq_parts = []
                line = fh.readline()
            elif line[0] == "@":
                fields = line[1:].split(None, 1)
                qname = fields[0] if fields else ""
                qcomment = fields[1] if len(fields) > 1 else None
                seq = fh.readline().rstrip("\n")
                fh.readline()  # +
                qual = fh.readline().rstrip("\n")
                yield SeqRecord(qname, _fix_seq(seq), qual, qcomment)
                line = fh.readline()
            else:
                seq_parts.append(line)
                line = fh.readline()
        if name is not None:
            yield SeqRecord(name, _fix_seq("".join(seq_parts)), None, comment)


def _fix_seq(s: str) -> str:
    if "U" in s or "u" in s:
        s = s.replace("U", "T").replace("u", "t")
    return s


def strip_pair_suffix(name: str) -> str:
    """Drop a trailing /1 or /2 read-pair suffix (reference bseq.c mm_qname_same logic)."""
    if len(name) > 2 and name[-2] == "/" and name[-1] in "12":
        return name[:-2]
    return name


def qname_same(a: str, b: str) -> bool:
    return strip_pair_suffix(a) == strip_pair_suffix(b)


@dataclass
class Frag:
    """A fragment: 1 read (single-end) or N paired segments kept together."""
    segs: list[SeqRecord]


def read_frags(paths: Sequence[str], batch_bases: int, frag_mode: bool) -> Iterator[list[Frag]]:
    """Yield batches of fragments totalling ~batch_bases bases.

    Multiple files are interleaved record-by-record (PE convention,
    reference bseq.c:124 mm_bseq_read_frag2). In frag mode, consecutive records
    with the same base name within one file form one fragment (bseq.c:98-107).
    """
    iters = [read_fastx(p) for p in paths]
    if len(iters) > 1:
        def interleave():
            while True:
                recs = []
                for it in iters:
                    r = next(it, None)
                    if r is not None:
                        recs.append(r)
                if not recs:
                    return
                yield Frag(recs)
        stream: Iterator[Frag] = interleave()
    elif frag_mode:
        def group():
            prev: list[SeqRecord] = []
            for r in iters[0]:
                if prev and not qname_same(prev[-1].name, r.name):
                    yield Frag(prev)
                    prev = []
                prev.append(r)
            if prev:
                yield Frag(prev)
        stream = group()
    else:
        stream = (Frag([r]) for r in iters[0])

    batch: list[Frag] = []
    nb = 0
    for frag in stream:
        batch.append(frag)
        nb += sum(len(s.seq) for s in frag.segs)
        if nb >= batch_bases:
            yield batch
            batch, nb = [], 0
    if batch:
        yield batch
