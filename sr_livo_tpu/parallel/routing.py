"""Static-shape routing primitives for shard_map programs.

Building blocks for the owner-routed sharded LIO engine
(parallel.sharded_lio): pack rows into fixed per-destination buffers,
exchange them with one `all_to_all`, and compact the received rows.
(Dedup itself is sort-free: ops.frame.bucket_dedup_min claim rounds —
round 4 removed the lex-sort machinery that dominated per-shard cost.)  Every shape is
static; overflow beyond a buffer budget is DROPPED deterministically and
counted (never silent — callers psum and surface the counter).

int32 key columns travel through f32 row matrices via bitcast (lossless);
f32 cannot represent 31-bit hashes exactly.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

I32_MAX = np.int32(0x7FFFFFFF)


def rup(x: int, m: int = 8) -> int:
    """Round up to a multiple of m (TPU-friendly static sizes)."""
    return max(m, int((int(np.ceil(x)) + m - 1) // m * m))


def headroom(mean: float, sigmas: float = 8.0, const: int = 32) -> int:
    """Static budget for a load whose per-destination distribution is
    Binomial-concentrated around `mean` (uniform hash routing): mean +
    `sigmas` standard deviations + a constant floor.  ADDITIVE headroom —
    the overhead fraction vanishes as workloads grow (mean 128 -> 1.9x,
    mean 4096 -> 1.13x), unlike a multiplicative slack."""
    return rup(mean + sigmas * np.sqrt(max(mean, 1.0)) + const)


def pack_cols(*cols: jnp.ndarray) -> jnp.ndarray:
    """Pack f32/int32 1-D/2-D columns into one (m, d) f32 row matrix.
    int32 columns are bitcast (exact)."""
    out = []
    for c in cols:
        if c.ndim == 1:
            c = c[:, None]
        if c.dtype in (jnp.int32,):
            c = jax.lax.bitcast_convert_type(c, jnp.float32)
        out.append(c.astype(jnp.float32))
    return jnp.concatenate(out, axis=1)


def unpack_col_i32(rows: jnp.ndarray, j: int) -> jnp.ndarray:
    return jax.lax.bitcast_convert_type(rows[:, j], jnp.int32)


def hash_range_owner(h: jnp.ndarray, n: int) -> jnp.ndarray:
    """Owner shard of a 31-bit non-negative hash.

    The voxel key is a LINEAR combination of grid coordinates (lattice
    structure), so raw range/mod partitioning is measurably imbalanced
    (round 4: head(F/n)-sized segments overflowed by ~1.5x on real
    workloads).  A finalizer mix decorrelates the owner from the lattice
    first; dedup exactness only needs equal keys -> equal owner, and the
    histogram-rank subsample (sort-free) does not care about range
    contiguity (the round-3 sort-based design did)."""
    if n == 1:
        return jnp.zeros_like(h)
    m = (h ^ jax.lax.shift_right_logical(h, 16)) * np.int32(0x45D9F3B)
    return jax.lax.shift_right_logical(m, 8) % np.int32(n)


def pack_for_exchange(dest: jnp.ndarray, valid: jnp.ndarray,
                      rows: jnp.ndarray, n: int, budget: int
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Scatter rows into an (n, budget, d) per-destination send buffer.

    Row order within a destination is the input order (stable: rank =
    running count of earlier rows with the same destination).  Returns
    (buffer, buffer_valid, n_dropped) — rows beyond `budget` for their
    destination are dropped and counted.
    """
    m, d = rows.shape
    dest_c = jnp.clip(dest, 0, n - 1)
    onehot = (dest_c[:, None] == jnp.arange(n, dtype=dest.dtype)[None, :]) \
        & valid[:, None]
    cum = jnp.cumsum(onehot.astype(jnp.int32), axis=0)        # inclusive
    rank = jnp.take_along_axis(cum, dest_c[:, None], axis=1)[:, 0] - 1
    ok = valid & (rank < budget)
    pos = jnp.where(ok, dest_c * budget + rank, n * budget)
    buf = jnp.zeros((n * budget, d), rows.dtype).at[pos].set(
        rows, mode="drop", unique_indices=True)
    bval = jnp.zeros((n * budget,), bool).at[pos].set(
        True, mode="drop", unique_indices=True)
    dropped = jnp.sum(valid & ~ok).astype(jnp.int32)
    return buf.reshape(n, budget, d), bval.reshape(n, budget), dropped


def exchange(buf: jnp.ndarray, bval: jnp.ndarray, axis_name: str
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ONE all_to_all: chunk j of my buffer goes to shard j; received
    chunks concatenate in source-shard order.  The validity mask rides
    as an extra packed column (collective LAUNCH latency, not bytes,
    dominates small exchanges on ICI).  Returns flat
    ((n*budget, d), (n*budget,)) received rows + validity."""
    packed = jnp.concatenate(
        [buf, bval[..., None].astype(buf.dtype)], axis=-1)
    rp = jax.lax.all_to_all(packed, axis_name, 0, 0)
    rp = rp.reshape(-1, packed.shape[-1])
    return rp[:, :-1], rp[:, -1] > 0.5


def compact(rows: jnp.ndarray, valid: jnp.ndarray, out_size: int
            ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Stable compaction of valid rows to `out_size` slots.
    Returns (rows, valid, n_dropped)."""
    rank = jnp.cumsum(valid.astype(jnp.int32)) - 1
    ok = valid & (rank < out_size)
    dst = jnp.where(ok, rank, out_size)
    out = jnp.zeros((out_size,) + rows.shape[1:], rows.dtype).at[dst].set(
        rows, mode="drop", unique_indices=True)
    oval = jnp.zeros((out_size,), bool).at[dst].set(
        True, mode="drop", unique_indices=True)
    dropped = jnp.sum(valid).astype(jnp.int32) - jnp.sum(ok).astype(jnp.int32)
    return out, oval, dropped
