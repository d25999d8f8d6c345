"""The native align-epilogue scans (native/align_epilogue.cc) must match
the pure-Python implementations exactly on fuzzed CIGARs/anchors."""
import numpy as np
import pytest

from minimap2_chaindp_tpu import native
from minimap2_chaindp_tpu.ops import ksw2 as K

pytestmark = pytest.mark.skipif(native.load_align() is None,
                                reason="native toolchain unavailable")


def _rand_cigar_and_seqs(rng):
    """A structurally valid CIGAR plus matching-length seqs."""
    ops = []
    qlen = tlen = 0
    last = -1
    for _ in range(int(rng.integers(1, 12))):
        op = int(rng.choice([0, 0, 0, 1, 2, 3]))
        if op == last:
            continue
        length = int(rng.integers(1, 120))
        ops.append(length << 4 | op)
        if op in (0, 1):
            qlen += length
        if op in (0, 2, 3):
            tlen += length
        last = op
    qseq = rng.integers(0, 5, qlen).astype(np.uint8)
    tseq = rng.integers(0, 5, tlen).astype(np.uint8)
    return ops, qseq, tseq


def _py_zdrop_scan(qseq, tseq, cigar, mat, q, e):
    from minimap2_chaindp_tpu.align import mm_update_max_zdrop
    state = (-(1 << 31), -1, -1, 0)
    pos = [[-1, -1], [-1, -1]]
    i = j = score = 0
    matq = mat.reshape(5, 5)
    for c in cigar:
        op, length = c & 0xF, c >> 4
        if op == 0:
            sub = matq[tseq[i:i + length], qseq[j:j + length]].astype(np.int64)
            for l in range(length):
                score += int(sub[l])
                state = mm_update_max_zdrop(score, i + l, j + l, state, e, pos)
            i += length
            j += length
        elif op in (1, 2, 3):
            score -= q + e * length
            if op == 1:
                j += length
            else:
                i += length
            state = mm_update_max_zdrop(score, i, j, state, e, pos)
    return state[3], pos


def test_zdrop_scan_parity():
    rng = np.random.default_rng(11)
    mat = K.gen_simple_mat(5, 2, 4)
    for _ in range(200):
        cig, qseq, tseq = _rand_cigar_and_seqs(rng)
        ref_z, ref_pos = _py_zdrop_scan(qseq, tseq, cig, mat, 4, 2)
        got_z, got_pos = native.zdrop_scan(qseq, tseq, cig, mat, 4, 2)
        assert (ref_z, ref_pos) == (got_z, got_pos)


def test_update_extra_scan_parity():
    rng = np.random.default_rng(12)
    mat = K.gen_simple_mat(5, 2, 4).reshape(5, 5).astype(np.int64)
    for _ in range(200):
        cig, qseq, tseq = _rand_cigar_and_seqs(rng)
        # python model (align.update_extra body after fix_cigar)
        blen = mlen = n_ambi_tot = 0
        toff = qoff = s = maxv = 0
        for c in cig:
            op, length = c & 0xF, c >> 4
            if op == 0:
                cq = qseq[qoff:qoff + length]
                ct = tseq[toff:toff + length]
                ambi = (ct > 3) | (cq > 3)
                n_ambi = int(ambi.sum())
                n_diff = int(((ct != cq) & ~ambi).sum())
                for v in mat[ct, cq]:
                    s += int(v)
                    s = max(s, 0)
                    maxv = max(maxv, s)
                blen += length - n_ambi
                mlen += length - (n_ambi + n_diff)
                n_ambi_tot += n_ambi
                toff += length
                qoff += length
            elif op == 1:
                n_ambi = int((qseq[qoff:qoff + length] > 3).sum())
                blen += length - n_ambi
                n_ambi_tot += n_ambi
                s = max(s - (4 + 2 * length), 0)
                qoff += length
            elif op == 2:
                n_ambi = int((tseq[toff:toff + length] > 3).sum())
                blen += length - n_ambi
                n_ambi_tot += n_ambi
                s = max(s - (4 + 2 * length), 0)
                toff += length
            else:
                toff += length
        got = native.update_extra_scan(qseq, tseq, cig,
                                       K.gen_simple_mat(5, 2, 4), 4, 2,
                                       qoff, toff)
        assert got == (blen, mlen, n_ambi_tot, maxv, 1)


def test_cal_fuzzy_len_and_est_err_merge_parity():
    from minimap2_chaindp_tpu.esterr import _get_for_qpos
    rng = np.random.default_rng(13)
    for _ in range(100):
        n = int(rng.integers(2, 60))
        rpos = np.sort(rng.integers(0, 5000, n)).astype(np.uint64)
        qpos = np.sort(rng.integers(0, 900, n)).astype(np.uint64)
        span = rng.integers(10, 20, n).astype(np.uint64)
        rev = int(rng.integers(0, 2))
        a = np.zeros((n, 2), dtype=np.uint64)
        a[:, 0] = (np.uint64(rev) << np.uint64(63)) | rpos
        a[:, 1] = (span << np.uint64(32)) | qpos
        # fuzzy len
        mlen = blen = int(span[0])
        for i in range(1, n):
            tl = int(rpos[i]) - int(rpos[i - 1])
            ql = int(qpos[i]) - int(qpos[i - 1])
            blen += max(tl, ql)
            sp = int(span[i])
            mlen += sp if (tl > sp and ql > sp) else min(tl, ql)
        assert native.cal_fuzzy_len_native(a, 0, n) == (mlen, blen)
        # est_err merge vs python two-pointer walk
        qlen = 1000
        xs = [_get_for_qpos(qlen, int(a[k, 0]), int(a[k, 1]))
              for k in range(n)]
        mp = np.sort(rng.choice(np.arange(1000, dtype=np.int64), 80,
                                replace=False))
        if rng.random() < 0.7:   # ensure the found-path is exercised
            first = xs[n - 1] if rev else xs[0]
            if 0 <= first < 1000 and first not in mp:
                mp = np.sort(np.append(mp, first))
        st = int(np.searchsorted(mp, xs[n - 1] if rev else xs[0]))
        if st >= len(mp) or mp[st] != (xs[n - 1] if rev else xs[0]):
            exp = (0, 0, 0)
        else:
            en, n_match, k, j = st, 1, 1, st + 1
            while j < len(mp) and k < n:
                x = xs[n - 1 - k] if rev else xs[k]
                if x == mp[j]:
                    k += 1
                    en = j
                    n_match += 1
                j += 1
            exp = (1, en - st + 1, n_match)
        got = native.est_err_merge(np.ascontiguousarray(a[:, 0]),
                                   np.ascontiguousarray(a[:, 1]),
                                   0, n, rev, qlen, mp)
        if exp[0] == 0:
            assert got[0] == 0
        else:
            assert got == exp
