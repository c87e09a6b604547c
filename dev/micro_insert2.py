"""Phase-cumulative ablation of vm.insert at bench shapes (donated map)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timeit(fn, *args, n=30, warmup=4):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    from sr_livo_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from sr_livo_tpu.ops import voxel_map as vm

    print("backend:", jax.default_backend())
    rng = np.random.RandomState(0)
    capacity, K = 1 << 18, 20
    n, b = 8192, 2048
    max_probe = 8
    voxel_size = 1.0
    min_distance = 0.1

    vmap_ = vm.make_map(capacity, K)
    pts0 = jnp.asarray(rng.uniform(-40, 40, (60000, 3)).astype(np.float32))
    vmap_, _ = vm.insert(vmap_, pts0, jnp.ones(60000, bool), voxel_size,
                         min_distance, max_probe, budget=None)
    pts = jax.device_put(rng.uniform(-40, 40, (n, 3)).astype(np.float32))
    valid = jnp.ones(n, bool)
    jax.block_until_ready(vmap_.counts)

    def upto(stage):
        def f(v, p):
            coords = vm.voxel_coords(p, voxel_size)
            point_ids = jnp.full((n,), -1, jnp.int32)
            keys, sig_col = v.keys, v.sig
            cand, match_idx, empty_idx = vm._probe_chain(sig_col, coords,
                                                         max_probe)
            slot = vm._resolve(keys, cand, match_idx, empty_idx, coords,
                               max_probe)
            if stage == "probe":
                return slot
            has_slot = slot >= 0
            safe_slot = jnp.where(has_slot, slot, 0)
            blk_cnt = jnp.where(has_slot, v.counts[safe_slot], 0)
            blk_pts = v.points[safe_slot]
            occ = jnp.arange(K)[None, :] < blk_cnt[:, None]
            d2 = jnp.sum((blk_pts - p[:, None, :]) ** 2, axis=-1)
            min_d2 = jnp.min(jnp.where(occ, d2, jnp.inf), axis=-1)
            far_enough = min_d2 > (min_distance * min_distance)
            ok_existing = valid & has_slot & far_enough & (blk_cnt < K)
            needs_claim = valid & ~has_slot & (empty_idx < max_probe)
            cand_mask = ok_existing | needs_claim
            if stage == "gate":
                return cand_mask
            idx_b = jnp.arange(b, dtype=jnp.int32)
            rank_n = jnp.cumsum(cand_mask.astype(jnp.int32)) - 1
            dst = jnp.where(cand_mask & (rank_n < b), rank_n, b)
            sel = jnp.full((b,), n - 1, jnp.int32).at[dst].set(
                jnp.arange(n, dtype=jnp.int32), mode="drop",
                unique_indices=True)
            live = jnp.zeros((b,), bool).at[dst].set(
                True, mode="drop", unique_indices=True)
            pts_c = p[sel]
            coords_c = coords[sel]
            ids_c = point_ids[sel]
            slot_c = jnp.where(live, slot[sel], -1)
            cnt_c = blk_cnt[sel]
            want_c = vm.voxel_sig(coords_c)
            if stage == "compact":
                return slot_c
            def _claim_round(carry):
                keys, sig_col, slot_c, cnt_c, pending = carry
                cand_c, mi_c, ei_c = vm._probe_chain(sig_col, coords_c,
                                                     max_probe)
                resolved = vm._resolve(keys, cand_c, mi_c, ei_c, coords_c,
                                       max_probe)
                joined = pending & (resolved >= 0)
                slot_c = jnp.where(joined, resolved, slot_c)
                cnt_c = jnp.where(joined, 0, cnt_c)
                unresolved = pending & ~joined & (ei_c < max_probe)
                tgt = jnp.take_along_axis(
                    cand_c, jnp.minimum(ei_c, max_probe - 1)[..., None],
                    -1)[..., 0]
                claim = jnp.full((capacity,), b, jnp.int32)
                claim = claim.at[jnp.where(unresolved, tgt, capacity)].min(
                    idx_b, mode="drop")
                winner = unresolved & (claim[tgt] == idx_b)
                w_idx = jnp.where(winner, tgt, capacity + idx_b)
                keys = keys.at[w_idx].set(coords_c, mode="drop",
                                          unique_indices=True)
                sig_col = sig_col.at[w_idx].set(want_c, mode="drop",
                                                unique_indices=True)
                slot_c = jnp.where(winner, tgt, slot_c)
                cnt_c = jnp.where(winner, 0, cnt_c)
                pending = unresolved & ~winner
                return keys, sig_col, slot_c, cnt_c, pending

            keys, sig_col, slot_c, cnt_c, _ = jax.lax.while_loop(
                lambda c: jnp.any(c[4]), _claim_round,
                (keys, sig_col, slot_c, cnt_c, live & (slot_c < 0)))
            if stage == "claim":
                return slot_c
            ok_c = live & (slot_c >= 0)
            safe_c = jnp.where(ok_c, slot_c, 0)
            ro = jnp.argsort(jnp.where(ok_c, slot_c, capacity), stable=True)
            ss = jnp.where(ok_c, slot_c, capacity)[ro]
            seg = jnp.concatenate([jnp.ones((1,), bool), ss[1:] != ss[:-1]])
            start = jax.lax.associative_scan(
                jnp.maximum, jnp.where(seg, jnp.arange(b), 0))
            rank = jnp.zeros((b,), jnp.int32).at[ro].set(
                (jnp.arange(b) - start).astype(jnp.int32))
            pos = cnt_c + rank
            accept_c = ok_c & (pos < K)
            if stage == "rank":
                return pos
            flat_idx = jnp.where(accept_c, safe_c * K + pos,
                                 capacity * K + idx_b)
            points_flat = v.points.reshape(capacity * K, 3)
            points_flat = points_flat.at[flat_idx].set(
                pts_c, mode="drop", unique_indices=True)
            ids_flat = v.point_ids.reshape(capacity * K)
            ids_flat = ids_flat.at[flat_idx].set(ids_c, mode="drop",
                                                 unique_indices=True)
            add = jnp.zeros((capacity,), jnp.int32).at[
                jnp.where(accept_c, safe_c, capacity)].add(1, mode="drop")
            counts = v.counts + add
            return points_flat[0], counts
        return jax.jit(f)

    prev = 0.0
    for stage in ("probe", "gate", "compact", "claim", "rank", "full"):
        ms = timeit(upto(stage), vmap_, pts)
        print(f"  upto {stage:8s} {ms:8.2f} ms   (+{ms - prev:6.2f})")
        prev = ms


if __name__ == "__main__":
    main()
