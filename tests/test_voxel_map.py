"""Tests for the device voxel-hash map (sr_livo_tpu.ops.voxel_map).

Checks insertion semantics (per-voxel capacity, min-distance spacing,
deterministic parallel claiming) and kNN against a brute-force reference
restricted to the 27-voxel neighborhood (searchNeighbors semantics).
"""
import jax.numpy as jnp
import numpy as np

from sr_livo_tpu.ops import voxel_map as vm

RNG = np.random.RandomState(7)
CAP = 1 << 12
K = 20
PROBE = 16


def _fresh():
    return vm.make_map(CAP, K)


def test_insert_and_lookup_roundtrip():
    m = _fresh()
    pts = jnp.asarray(RNG.uniform(-20, 20, size=(500, 3)), jnp.float32)
    valid = jnp.ones(500, bool)
    m, acc = vm.insert(m, pts, valid, 1.0, 0.0, PROBE)
    assert bool(jnp.all(acc))
    coords = vm.voxel_coords(pts, 1.0)
    slots = vm.lookup(m, coords, PROBE)
    assert bool(jnp.all(slots >= 0))
    # every stored point is in the block of its own voxel
    for i in [0, 17, 123, 499]:
        K = m.block_capacity
        blk = np.asarray(m.points)[int(slots[i]) * K:(int(slots[i]) + 1) * K]
        cnt = int(m.counts[slots[i]])
        d = np.linalg.norm(blk[:cnt] - np.asarray(pts[i]), axis=-1)
        assert d.min() < 1e-5


def test_voxel_capacity_enforced():
    m = _fresh()
    # 50 points all in the same voxel, zero min distance -> only K stored
    pts = jnp.asarray(RNG.uniform(0.1, 0.9, size=(50, 3)), jnp.float32)
    m, acc = vm.insert(m, pts, jnp.ones(50, bool), 1.0, 0.0, PROBE)
    assert int(jnp.sum(acc)) == K
    assert int(vm.map_size(m)) == K
    # accepted ones are the lowest indices (deterministic ordering)
    assert bool(jnp.all(acc[:K])) and not bool(jnp.any(acc[K:]))


def test_min_distance_gate():
    m = _fresh()
    p0 = jnp.asarray([[0.5, 0.5, 0.5]], jnp.float32)
    m, acc = vm.insert(m, p0, jnp.ones(1, bool), 1.0, 0.1, PROBE)
    assert bool(acc[0])
    # second point 5 cm away in the same voxel: rejected at min_distance=0.1
    p1 = jnp.asarray([[0.55, 0.5, 0.5]], jnp.float32)
    m, acc1 = vm.insert(m, p1, jnp.ones(1, bool), 1.0, 0.1, PROBE)
    assert not bool(acc1[0])
    # 20 cm away: accepted
    p2 = jnp.asarray([[0.7, 0.5, 0.5]], jnp.float32)
    m, acc2 = vm.insert(m, p2, jnp.ones(1, bool), 1.0, 0.1, PROBE)
    assert bool(acc2[0])
    assert int(vm.map_size(m)) == 2


def test_invalid_points_ignored():
    m = _fresh()
    pts = jnp.asarray(RNG.uniform(-5, 5, size=(64, 3)), jnp.float32)
    valid = jnp.asarray(np.arange(64) % 2 == 0)
    m, acc = vm.insert(m, pts, valid, 1.0, 0.0, PROBE)
    assert not bool(jnp.any(acc & ~valid))
    assert int(vm.map_size(m)) == int(jnp.sum(acc))


def test_negative_coord_truncation_matches_cpp():
    # C++ static_cast<short>(-0.5 / 1.0) == 0, not -1.
    pts = jnp.asarray([[-0.5, -1.5, 0.5]], jnp.float32)
    c = np.asarray(vm.voxel_coords(pts, 1.0))
    assert (c == np.array([[0, -1, 0]])).all()


def test_knn_matches_bruteforce():
    m = _fresh()
    pts = RNG.uniform(-10, 10, size=(2000, 3)).astype(np.float32)
    m, acc = vm.insert(m, jnp.asarray(pts), jnp.ones(2000, bool), 1.0, 0.0, PROBE)
    stored = pts[np.asarray(acc)]

    queries = RNG.uniform(-8, 8, size=(50, 3)).astype(np.float32)
    nb, ok, dist = vm.knn(m, jnp.asarray(queries), voxel_size=1.0,
                          max_neighbors=20, max_probe=PROBE, nb_voxels=1)
    nb, ok, dist = np.asarray(nb), np.asarray(ok), np.asarray(dist)

    for qi in range(50):
        q = queries[qi]
        # brute force restricted to the 27-voxel neighborhood (truncation)
        qc = np.trunc(q / 1.0).astype(int)
        sc = np.trunc(stored / 1.0).astype(int)
        in_hood = np.all(np.abs(sc - qc) <= 1, axis=-1)
        # C++ trunc voxels: |coord diff| <= 1 must be computed on voxel ids
        cand = stored[in_hood]
        d = np.linalg.norm(cand - q, axis=-1)
        d.sort()
        n_expect = min(len(d), 20)
        assert int(ok[qi].sum()) == n_expect, qi
        assert np.allclose(np.sort(dist[qi][ok[qi]]), d[:n_expect], atol=1e-4)


def test_knn_threshold_capacity():
    m = _fresh()
    # voxel A: 1 point; voxel B: 5 points
    pa = jnp.asarray([[0.5, 0.5, 0.5]], jnp.float32)
    pb = jnp.asarray(RNG.uniform(1.1, 1.9, size=(5, 3)), jnp.float32)
    m, _ = vm.insert(m, pa, jnp.ones(1, bool), 1.0, 0.0, PROBE)
    m, _ = vm.insert(m, pb, jnp.ones(5, bool), 1.0, 0.0, PROBE)
    q = jnp.asarray([[0.9, 0.9, 0.9]], jnp.float32)
    _, ok_all, _ = vm.knn(m, q, voxel_size=1.0, max_neighbors=20,
                          max_probe=PROBE, nb_voxels=1, threshold_capacity=1)
    _, ok_thr, _ = vm.knn(m, q, voxel_size=1.0, max_neighbors=20,
                          max_probe=PROBE, nb_voxels=1, threshold_capacity=2)
    assert int(ok_all.sum()) == 6
    assert int(ok_thr.sum()) == 5  # voxel A filtered by occupancy threshold


def test_hash_collision_resolution():
    # Force many voxels into a tiny table to exercise probing.
    m = vm.make_map(64, 4)
    pts = jnp.asarray(RNG.uniform(-25, 25, size=(40, 3)), jnp.float32)
    m, acc = vm.insert(m, pts, jnp.ones(40, bool), 1.0, 0.0, 64)
    coords = vm.voxel_coords(pts, 1.0)
    slots = vm.lookup(m, coords, 64)
    stored = np.asarray(acc)
    assert stored.sum() > 30  # most points land despite collisions
    s = np.asarray(slots)
    keys = np.asarray(m.keys)
    c = np.asarray(coords)
    for i in range(40):
        if stored[i]:
            assert s[i] >= 0
            assert (keys[s[i]] == c[i]).all()


def test_incremental_insert_same_voxel_across_batches():
    m = _fresh()
    for b in range(4):
        pts = jnp.asarray(RNG.uniform(0.0, 1.0, size=(3, 3)), jnp.float32)
        m, _ = vm.insert(m, pts, jnp.ones(3, bool), 1.0, 0.0, PROBE)
    slots = vm.lookup(m, jnp.asarray([[0, 0, 0]], jnp.int32), PROBE)
    assert int(m.counts[slots[0]]) == 12


def test_remove_far_voxels():
    m = _fresh()
    near = jnp.asarray(RNG.uniform(-2, 2, size=(20, 3)), jnp.float32)
    far = jnp.asarray(RNG.uniform(80, 90, size=(20, 3)), jnp.float32)
    m, _ = vm.insert(m, jnp.concatenate([near, far]), jnp.ones(40, bool),
                     1.0, 0.0, PROBE)
    before = int(vm.map_size(m))
    m = vm.remove_far_voxels(m, jnp.zeros(3, jnp.float32), 50.0)
    after = int(vm.map_size(m))
    assert after < before
    # near points survive
    _, ok, _ = vm.knn(m, near[:5], voxel_size=1.0, max_neighbors=5,
                      max_probe=PROBE, nb_voxels=1)
    assert bool(jnp.all(ok[:, 0]))


def test_compact_map_reclaims_slots():
    """compact_map = robin_map erase semantics: far voxels disappear AND
    their slots become claimable again (the tombstone remove_far_voxels
    leaves dead keys that saturate probe chains on long traverses)."""
    m = vm.make_map(1 << 10, 5)
    rng = np.random.RandomState(0)
    near = rng.uniform(-5, 5, (600, 3)).astype(np.float32)
    far = rng.uniform(95, 105, (600, 3)).astype(np.float32)
    pts = np.concatenate([near, far])
    m, acc = vm.insert(m, jnp.asarray(pts), jnp.ones(len(pts), bool),
                       1.0, 0.0, 8)
    size0 = int(vm.map_size(m))
    keys_near = set(map(tuple, np.asarray(
        vm.voxel_coords(jnp.asarray(near), 1.0))))

    # snapshot pre-compaction state (compact_map donates its input)
    nc = vm.voxel_coords(jnp.asarray(near), 1.0)
    ids0 = np.asarray(vm.lookup(m, nc, 8))
    counts0 = np.asarray(m.counts)
    K0 = m.block_capacity
    blocks0 = np.asarray(vm.gather_blocks(
        m.points, jnp.asarray(np.maximum(ids0, 0)), K0))

    m2, dropped = vm.compact_map(m, jnp.zeros(3, jnp.float32),
                                 distance=50.0, max_probe=8)
    assert int(dropped) == 0
    # every near voxel that made it into the original table is still
    # resolvable after the rebuild, with identical block content
    ids = np.asarray(vm.lookup(m2, nc, 8))
    assert np.all(ids[ids0 >= 0] >= 0)
    assert np.sum(ids0 >= 0) > 300
    sel = np.nonzero(ids0 >= 0)[0]
    np.testing.assert_array_equal(
        counts0[ids0[sel]], np.asarray(m2.counts)[ids[sel]])
    np.testing.assert_allclose(
        blocks0[sel],
        np.asarray(vm.gather_blocks(m2.points, jnp.asarray(ids[sel]), K0)))
    # far voxels gone from keys, not just zero-counted
    live_keys = np.asarray(m2.keys)[np.asarray(m2.counts) > 0]
    for k in map(tuple, live_keys):
        assert k in keys_near
    assert int(vm.map_size(m2)) < size0
    n_live_slots = int(np.sum(np.asarray(m2.sig) != vm.SIG_EMPTY))
    assert n_live_slots == int(np.sum(np.asarray(m2.counts) > 0))


def test_compact_map_survives_capacity_pressure():
    """Long-traverse soak at deliberately small capacity: a sensor walks a
    line inserting local structure; WITH periodic compaction the
    insert-accept rate stays healthy to the end, WITHOUT it the table
    saturates with dead keys (the round-3 failure mode)."""
    cap, K = 1 << 11, 5
    rng = np.random.RandomState(1)
    steps, batch = 120, 512

    def traverse(evict):
        m = vm.make_map(cap, K)
        acc_rate = []
        for s in range(steps):
            x0 = 2.0 * s                     # 2 m per step
            pts = np.c_[rng.uniform(x0 - 8, x0 + 8, batch),
                        rng.uniform(-6, 6, batch),
                        rng.uniform(0, 3, batch)].astype(np.float32)
            m, acc = vm.insert(m, jnp.asarray(pts),
                               jnp.ones(batch, bool), 1.0, 0.2, 8)
            # acceptance among NEW-voxel candidates: compare against a
            # fresh-map insert of the same batch (upper bound)
            acc_rate.append(float(jnp.sum(acc)) / batch)
            if evict and s % 10 == 9:
                loc = jnp.asarray([x0, 0.0, 1.5], jnp.float32)
                m, _ = vm.compact_map(m, loc, distance=30.0, max_probe=8)
        return np.array(acc_rate), m

    rate_e, m_e = traverse(True)
    rate_n, _ = traverse(False)
    head_e = rate_e[10:30].mean()
    tail_e = rate_e[-20:].mean()
    tail_n = rate_n[-20:].mean()
    # with compaction the tail keeps accepting like the head
    assert tail_e > 0.7 * head_e, (head_e, tail_e)
    # without reclamation the saturated table accepts far less
    assert tail_e > 2.0 * tail_n, (tail_e, tail_n)
    # live map stays bounded to the local neighborhood
    assert int(vm.map_size(m_e)) < cap * K // 2


def test_chunked_gate_matches_full_batch():
    """vm.insert(gate_chunk=...) must be bit-identical to the full-batch
    gate for a prefix-compacted batch (the gate is per-row vs the
    pre-insert table, so chunking is exact by construction)."""
    rng = np.random.RandomState(5)
    m = vm.make_map(1 << 12, 8)
    warm = jnp.asarray(rng.uniform(-20, 20, (600, 3)).astype(np.float32))
    m, _ = vm.insert(m, warm, jnp.ones(600, bool), 1.0, 0.1, 8)
    n, nv = 512, 317          # padded batch, valid prefix
    pts = np.zeros((n, 3), np.float32)
    pts[:nv] = rng.uniform(-20, 20, (nv, 3))
    valid = np.arange(n) < nv
    pts_j, val_j = jnp.asarray(pts), jnp.asarray(valid)
    m_full, acc_full = vm.insert(m, pts_j, val_j, 1.0, 0.1, 8)
    for chunk in (64, 100, 512):
        m_c, acc_c = vm.insert(m, pts_j, val_j, 1.0, 0.1, 8,
                               gate_chunk=chunk)
        assert np.array_equal(np.asarray(acc_full), np.asarray(acc_c)), chunk
        assert np.array_equal(np.asarray(m_full.counts),
                              np.asarray(m_c.counts)), chunk
        assert np.array_equal(np.asarray(m_full.points),
                              np.asarray(m_c.points)), chunk
    g_full = vm.insert_gate(m, pts_j, val_j, 1.0, 0.1, 8)
    g_c = vm.insert_gate(m, pts_j, val_j, 1.0, 0.1, 8, gate_chunk=100)
    assert np.array_equal(np.asarray(g_full), np.asarray(g_c))
