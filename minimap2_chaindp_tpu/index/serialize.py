"""Index checkpointing: dump/load of the device-resident CSR tables.

Replaces the reference's .mmi khash serialization (index.c:785-874) with a
flat-table format — the same role the fork's B/H/V/P FPGA images play
(index.c:603-720): the expensive index build happens once, then loads are a
handful of bulk array reads straight into device-uploadable buffers.

Format (little-endian):
  magic "MM2TPU\\x01" | k w flag b n_seq (int32 x5)
  per seq: name_len int32, name bytes, length int32
  S uint8[total_bases]  (nt4 codes)
  n_keys int64, keys uint64[n_keys], starts int64[n_keys+1]
  n_vals int64, values uint64[n_vals]
"""
from __future__ import annotations

import struct

import numpy as np

from .build import MinimizerIndex, RefSeq

MAGIC = b"MM2TPU\x01"


def dump_index(mi: MinimizerIndex, path: str) -> None:
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<5i", mi.k, mi.w, mi.flag, mi.b, mi.n_seq))
        for s in mi.seqs:
            nb = s.name.encode()
            f.write(struct.pack("<i", len(nb)))
            f.write(nb)
            f.write(struct.pack("<i", s.length))
        f.write(mi.S.astype(np.uint8).tobytes())
        f.write(struct.pack("<q", len(mi.keys)))
        f.write(mi.keys.astype("<u8").tobytes())
        f.write(mi.starts.astype("<i8").tobytes())
        f.write(struct.pack("<q", len(mi.values)))
        f.write(mi.values.astype("<u8").tobytes())


def load_index(path: str) -> MinimizerIndex:
    with open(path, "rb") as f:
        if f.read(len(MAGIC)) != MAGIC:
            raise ValueError(f"{path}: not an mm2tpu index")
        k, w, flag, b, n_seq = struct.unpack("<5i", f.read(20))
        mi = MinimizerIndex(k=k, w=w, flag=flag, b=b)
        names = []
        off = 0
        for _ in range(n_seq):
            (nl,) = struct.unpack("<i", f.read(4))
            name = f.read(nl).decode()
            (length,) = struct.unpack("<i", f.read(4))
            mi.seqs.append(RefSeq(name=name, offset=off, length=length))
            names.append(name)
            off += length
        mi.S = np.frombuffer(f.read(off), dtype=np.uint8).copy()
        (n_keys,) = struct.unpack("<q", f.read(8))
        mi.keys = np.frombuffer(f.read(8 * n_keys), dtype="<u8").copy()
        mi.starts = np.frombuffer(f.read(8 * (n_keys + 1)), dtype="<i8").copy()
        (n_vals,) = struct.unpack("<q", f.read(8))
        mi.values = np.frombuffer(f.read(8 * n_vals), dtype="<u8").copy()
        order = sorted(range(len(names)), key=lambda i: names[i])
        mi.sorted_names = [names[i] for i in order]
        rank = np.empty(len(names), dtype=np.int64)
        for r, i in enumerate(order):
            rank[i] = r
        mi.name_rank = rank
    return mi


def is_mm2tpu_index(path: str) -> bool:
    try:
        with open(path, "rb") as f:
            return f.read(len(MAGIC)) == MAGIC
    except OSError:
        return False
