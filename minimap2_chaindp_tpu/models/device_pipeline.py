"""Multi-chip mapping step: sharded seed lookup + data-parallel chaining.

The "model" being sharded is the mapping pipeline itself:
  * "data" axis: read batches are data-parallel (the reference's kt_for over
    fragments, SURVEY.md §2 parallelism #2)
  * "index" axis: the sorted minimizer table is sharded across chips for
    genomes larger than one chip's HBM; per-shard lookups are combined with a
    psum over the index axis (the all-to-all seed-routing design from
    BASELINE.json's north star). With index_shards=1 this reduces to the
    replicated-index fast path with no hot-path collectives.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:  # jax >= 0.8 promotes shard_map out of experimental
    from jax import shard_map
    _SM_KW = {"check_vma": False}
except ImportError:  # pragma: no cover - older jax
    # the experimental shard_map only knows check_rep; branch the kwarg with
    # the import so the fallback path actually runs on older jax
    from jax.experimental.shard_map import shard_map
    _SM_KW = {"check_rep": False}

from ..ops import chain_pallas as CP


def make_sharded_collect_step(mesh: Mesh, *, cap: int):
    """Build the jitted sharded-index seed-collect step (>chip-HBM genomes).

    The CSR minimizer index is key-range-sharded over the "index" axis
    (ops/seeds_device.shard_index_tables); query minimizer batches are
    data-parallel over "data". Each index shard looks up its own key range
    and the disjoint per-slot anchor contributions combine with psums over
    ICI — no shard ever holds the whole index. Output anchors are
    data-sharded and identical to the single-chip device collector's.
    """
    from ..ops.seeds_device import _collect_dev
    dspec, ispec = P("data"), P("index")

    def step(khi, klo, starts, vhi, vlo, qhi, qlo, qvalid, qpos, qspan,
             qseg, qtnd, max_occ, qls):
        return _collect_dev(khi, klo, starts, vhi, vlo, qhi, qlo, qvalid,
                            qpos, qspan, qseg, qtnd, max_occ, qls,
                            cap=cap, axis_name="index")

    return jax.jit(shard_map(
        step, mesh=mesh,
        in_specs=(ispec, ispec, ispec, ispec, ispec,
                  dspec, dspec, dspec, dspec, dspec, dspec, dspec,
                  P(), dspec),
        out_specs=(dspec,) * 7,
        **_SM_KW,
    ))


def make_sharded_map_step(mesh: Mesh, *, max_n: int, max_dist: int, bw: int,
                          max_skip: int, interpret: bool = False):
    """Build the jitted multi-chip mapping compute step.

    Inputs (global shapes):
      qkeys   (R, M) int32   — per-read query minimizer keys  [data-sharded]
      xhi/rpos/qpos/span/sid (R, max_n) int32 — anchors       [data-sharded]
      nn      (R, 128) int32 — per-read anchor counts          [data-sharded]
      w1/exc (R, 128)     — per-read gap-cost slope + exceptions  [data-sharded]
      keys    (K,) int32     — sorted index keys               [index-sharded]
    Returns f, p, flag (data-sharded) and occ (R, M) total occurrence counts
    across all index shards (psum over "index").
    """
    dspec = P("data")
    ispec = P("index")

    def step(qkeys, xhi, rpos, qpos, span, sid, stw, nn, w1, exc, keys):
        # sharded-index seed lookup: local binary search + psum over shards
        pos = jnp.searchsorted(keys, qkeys)
        pos_c = jnp.minimum(pos, keys.shape[0] - 1)
        hit = (keys[pos_c] == qkeys).astype(jnp.int32)
        occ = jax.lax.psum(hit, "index")

        f, p, flag = CP.chain_scores_batch(
            xhi, rpos, qpos, span, sid, stw, nn, w1, exc, max_n=max_n,
            max_dist_x=max_dist, max_dist_y=max_dist, bw=bw,
            max_skip=max_skip, is_cdna=False, many_segs=False,
            interpret=interpret)
        # cross-shard summary (stats/telemetry ride the ICI too)
        total_flagged = jax.lax.psum(jnp.sum(flag[:, 0]), "data")
        return f, p, flag, occ, total_flagged

    return jax.jit(shard_map(
        step, mesh=mesh,
        in_specs=(dspec, dspec, dspec, dspec, dspec, dspec, dspec, dspec, dspec, dspec, ispec),
        out_specs=(dspec, dspec, dspec, dspec, P()),
        **_SM_KW,
    ))
