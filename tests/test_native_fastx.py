"""The native (C++) FASTX reader must parse identically to the pure-Python
parser on FASTA, multi-line FASTA, FASTQ, gzip, and U->T conversion."""
import gzip
import os

import pytest

from conftest import REF_TEST_DIR
from minimap2_chaindp_tpu.io import native_fastx
from minimap2_chaindp_tpu.io.fastx import _read_fastx_py, read_fastx

pytestmark = pytest.mark.skipif(not native_fastx.available(),
                                reason="native reader not built")


def same(path):
    a = [(r.name, r.seq, r.qual, r.comment) for r in _read_fastx_py(path)]
    b = list(native_fastx.read_fastx_native(path, block_bases=100))
    assert a == b, f"mismatch on {path}"
    return a


def test_reference_fastas():
    for fa in ("MT-human.fa", "MT-orang.fa", "q-inv.fa", "t-inv.fa",
               "t2.fa", "q2.fa"):
        recs = same(os.path.join(REF_TEST_DIR, fa))
        assert recs


def test_fastq_and_comments(tmp_path):
    fq = tmp_path / "t.fq"
    fq.write_text("@r1 some comment here\nACGUACGU\n+\nIIIIIIII\n"
                  "@r2\nacgu\n+junk\n!!!!\n")
    recs = same(str(fq))
    assert recs[0] == ("r1", "ACGTACGT", "IIIIIIII", "some comment here")
    assert recs[1] == ("r2", "acgt", "!!!!", None)


def test_multiline_fasta_gzip(tmp_path):
    fa = tmp_path / "t.fa.gz"
    with gzip.open(fa, "wt") as f:
        f.write(">s1 desc\nACGT\nACGT\nAC\n>s2\nTTTT\n")
    recs = same(str(fa))
    assert recs[0] == ("s1", "ACGTACGTAC", None, "desc")
    assert recs[1] == ("s2", "TTTT", None, None)


def test_pipeline_uses_native(tmp_path):
    # read_fastx dispatches to the native reader and yields SeqRecords
    fa = tmp_path / "t.fa"
    fa.write_text(">a\nACGT\n")
    recs = list(read_fastx(str(fa)))
    assert recs[0].name == "a" and recs[0].seq == "ACGT"
