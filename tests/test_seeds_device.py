"""Device seed collection must be bit-identical to the host golden model
(anchors, order, flags, rep_len, mini_pos) on bundled data."""
import os

import numpy as np

from conftest import REF_TEST_DIR
from minimap2_chaindp_tpu.options import set_opt
from minimap2_chaindp_tpu.io.fastx import read_fastx
from minimap2_chaindp_tpu.index.build import build_index
from minimap2_chaindp_tpu.ops.seeds import collect_minimizers, collect_seed_hits
from minimap2_chaindp_tpu.ops.seeds_device import DeviceSeedCollector


def check_pair(ref_fa, q_fa, preset=None):
    io, mo = set_opt(preset)
    refs = list(read_fastx(os.path.join(REF_TEST_DIR, ref_fa)))
    mi = build_index([r.name for r in refs], [r.seq for r in refs],
                     io.w, io.k, io.flag, io.bucket_bits)
    mo.update(mi)
    queries = list(read_fastx(os.path.join(REF_TEST_DIR, q_fa)))
    mvs, qlens = [], []
    for q in queries:
        mvs.append(collect_minimizers(mo, mi, [q.seq]))
        qlens.append(len(q.seq))
    dc = DeviceSeedCollector(mi)
    got = dc.collect_batch(mvs, mo.mid_occ, qlens)
    n_dev = 0
    for q, mv, g, ql in zip(queries, mvs, got, qlens):
        want = collect_seed_hits(mi, mo.flag, mo.mid_occ, mv, q.name, ql)
        if g is None:
            continue
        n_dev += 1
        assert np.array_equal(g.anchors, want.anchors), q.name
        assert g.rep_len == want.rep_len
        assert np.array_equal(g.mini_pos, want.mini_pos)
    assert n_dev > 0


def test_seeds_device_mt():
    check_pair("MT-human.fa", "MT-orang.fa")


def test_seeds_device_inv():
    check_pair("t-inv.fa", "q-inv.fa")


def test_seeds_device_hpc():
    check_pair("MT-human.fa", "MT-orang.fa", preset="map-pb")


def test_seeds_device_self_map():
    # q-inv vs itself: lots of exact multi-occurrence hits
    check_pair("q-inv.fa", "q-inv.fa")
