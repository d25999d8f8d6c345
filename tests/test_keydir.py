"""Key-lookup prefix directory (native/align_epilogue.cc keydir, r5):
at >=2^20 keys the native collect switches from whole-table binary
search to a radix directory over the hashed key space.  These tests
force that regime (a ~32 Mb genome, ~5M keys) and require the native
driver's output to stay byte-identical to the exact Python pipeline,
plus anchor-level identity against the golden collector."""
import os

import numpy as np
import pytest

from minimap2_chaindp_tpu import constants as C
from minimap2_chaindp_tpu.index.build import build_index
from minimap2_chaindp_tpu.options import set_opt

BASES = np.frombuffer(b"ACGT", np.uint8)


@pytest.fixture(scope="module")
def big_index():
    io, mo = set_opt("map-ont")
    mo.flag |= C.MM_F_OUT_SAM | C.MM_F_CIGAR
    rng = np.random.default_rng(5)
    seq = BASES[rng.integers(0, 4, 32_000_000)].tobytes().decode()
    mi = build_index(["big1"], [seq], io.w, io.k, io.flag, io.bucket_bits)
    assert len(mi.keys) >= (1 << 20), "fixture must force the directory"
    mo.update(mi)
    return mi, mo, seq


def _reads(seq, n, L, seed):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        st = int(rng.integers(0, len(seq) - L))
        s = list(seq[st:st + L])
        for _ in range(int(L * 0.05)):
            s[int(rng.integers(0, L))] = "ACGT"[int(rng.integers(0, 4))]
        r = "".join(s)
        if i % 2:
            r = r[::-1].translate(str.maketrans("ACGT", "TGCA"))
        out.append((f"kd{i}", r))
    return out


class _Seg:
    def __init__(self, name, seq):
        self.name, self.seq = name, seq
        self.qual = None
        self.comment = None


def test_keydir_collect_matches_golden(big_index):
    """Native collect (directory-accelerated) produces the same anchors,
    rep_len and mini_pos as the exact Python collector."""
    from minimap2_chaindp_tpu.native import collect_seeds_native
    from minimap2_chaindp_tpu.ops.seeds import collect_seed_hits
    from minimap2_chaindp_tpu.index.sketch import sketch
    mi, mo, seq = big_index
    for nm, rs in _reads(seq, 6, 5000, seed=7):
        mv = sketch(rs, 10, 15, 0, False)
        want = collect_seed_hits(mi, mo.flag, mo.mid_occ, mv, None, len(rs))
        got = collect_seeds_native(mi, mo.mid_occ, mv, len(rs), 0)
        if got is None:
            pytest.skip("native lib unavailable")
        anchors, rep_len, mini = got
        assert np.array_equal(anchors, want.anchors), nm
        assert rep_len == want.rep_len
        assert np.array_equal(mini, want.mini_pos)


def test_keydir_driver_matches_pipeline(big_index):
    """Full native driver (batched) == exact Python pipeline at a key
    count that forces the directory."""
    from minimap2_chaindp_tpu.native import map_batch_text_native
    from minimap2_chaindp_tpu.models.pipeline import map_fragment_output
    mi, mo, seq = big_index
    segs = [_Seg(nm, rs) for nm, rs in _reads(seq, 8, 3000, seed=11)]
    got = map_batch_text_native(mi, mo, segs, "")
    if got is None:
        pytest.skip("native lib unavailable")
    want = [map_fragment_output(mi, mo, [s]) for s in segs]
    assert got == want


def test_keydir_absent_and_extreme_keys(big_index):
    """Keys above the max index key (directory prefix out of range) and
    below the min key resolve to not-found, not a crash or bogus hit."""
    from minimap2_chaindp_tpu.native import collect_seeds_native
    mi, mo, _ = big_index
    # synthetic minimizer vector with keys beyond both ends of the table
    hi_key = (np.uint64(mi.keys[-1]) + np.uint64(12345)) << np.uint64(8)
    lo_key = np.uint64(0) << np.uint64(8)
    mv = np.array([[hi_key | np.uint64(15), np.uint64(100 << 1)],
                   [lo_key | np.uint64(15), np.uint64(200 << 1)]],
                  dtype=np.uint64)
    got = collect_seeds_native(mi, mo.mid_occ, mv, 5000, 0)
    if got is None:
        pytest.skip("native lib unavailable")
    anchors, _rep, _mini = got
    present = np.isin(np.array([np.uint64(mi.keys[-1])
                                + np.uint64(12345), np.uint64(0)]),
                      mi.keys)
    if not present.any():
        assert len(anchors) == 0


def test_key_lookup_batch_matches_searchsorted(big_index):
    """Native batched lookup (prefix directory) == np.searchsorted on
    hit, miss, below-min and above-max keys."""
    from minimap2_chaindp_tpu.native import key_lookup_batch
    mi, _, _ = big_index
    rng = np.random.default_rng(13)
    qk = np.concatenate([
        mi.keys[rng.integers(0, len(mi.keys), 500)],        # hits
        rng.integers(0, 1 << 34, 500).astype(np.uint64),    # mixed
        np.array([0, np.uint64(mi.keys[-1]) + np.uint64(1),
                  np.uint64(0xFFFFFFFFFFFFFFFF)], np.uint64)])
    got = key_lookup_batch(mi.keys, qk)
    if got is None:
        pytest.skip("native lib unavailable")
    want = np.searchsorted(mi.keys, qk)
    assert np.array_equal(got, want)
