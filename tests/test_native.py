"""Native C++ graph runtime vs numpy reference implementations."""

import numpy as np
import pytest

from noise_gnn_tpu import native


def numpy_csr(src, dst, n):
    order = np.argsort(dst, kind="stable")
    indptr = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(dst, minlength=n), out=indptr[1:])
    return indptr, src[order].astype(np.int32)


def test_native_builds():
    assert native.available(), "g++ toolchain present; native build must work"


def test_coo_to_csr_matches_numpy():
    rng = np.random.default_rng(0)
    n, e = 500, 20000
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    ip, ix = native.coo_to_csr(src, dst, n)
    ip2, ix2 = numpy_csr(src, dst, n)
    np.testing.assert_array_equal(ip, ip2)
    np.testing.assert_array_equal(ix, ix2)  # stable within-row order


def test_expand_rows_matches_numpy():
    rng = np.random.default_rng(1)
    n, e = 700, 9000
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    ip, ix = native.coo_to_csr(src, dst, n)
    out = native.expand_rows(ip, n)
    assert out is not None
    want = np.repeat(np.arange(n, dtype=np.int32), np.diff(ip))
    np.testing.assert_array_equal(out, want)


def test_sample_hop_semantics():
    # ring: in-degree exactly 2 per node
    n = 20
    src = np.concatenate([np.arange(n), (np.arange(n) + 1) % n]).astype(np.int32)
    dst = np.concatenate([(np.arange(n) + 1) % n, np.arange(n)]).astype(np.int32)
    ip, ix = native.coo_to_csr(src, dst, n)
    frontier = np.asarray([3, 7, 11], np.int32)
    children, mask = native.sample_hop(ip, ix, frontier, 5, seed=42)
    children = children.reshape(3, 5)
    mask = mask.reshape(3, 5)
    # deg=2 <= fanout=5: exact neighbors, no replacement
    assert mask.sum(axis=1).tolist() == [2, 2, 2]
    np.testing.assert_array_equal(np.sort(children[0][mask[0]]), [2, 4])

    # high-degree: all sampled children must be true in-neighbors
    rng = np.random.default_rng(2)
    e2 = 2000
    src2 = rng.integers(0, 50, e2).astype(np.int32)
    dst2 = rng.integers(0, 50, e2).astype(np.int32)
    ip2, ix2 = native.coo_to_csr(src2, dst2, 50)
    in_neigh = {i: set(src2[dst2 == i].tolist()) for i in range(50)}
    fr = np.arange(50, dtype=np.int32)
    ch, mk = native.sample_hop(ip2, ix2, fr, 4, seed=7)
    ch, mk = ch.reshape(50, 4), mk.reshape(50, 4)
    for i in range(50):
        for j in range(4):
            if mk[i, j]:
                assert ch[i, j] in in_neigh[i]


def test_sample_hop_frontier_mask():
    n = 10
    src = np.arange(n).astype(np.int32)
    dst = ((np.arange(n) + 1) % n).astype(np.int32)
    ip, ix = native.coo_to_csr(src, dst, n)
    frontier = np.asarray([1, 2], np.int32)
    fm = np.asarray([True, False])
    ch, mk = native.sample_hop(ip, ix, frontier, 3, seed=0, frontier_mask=fm)
    mk = mk.reshape(2, 3)
    assert mk[0].sum() == 1 and mk[1].sum() == 0


def test_sample_hop_deterministic_by_seed():
    rng = np.random.default_rng(3)
    src = rng.integers(0, 100, 5000).astype(np.int32)
    dst = rng.integers(0, 100, 5000).astype(np.int32)
    ip, ix = native.coo_to_csr(src, dst, 100)
    fr = np.arange(100, dtype=np.int32)
    a, _ = native.sample_hop(ip, ix, fr, 8, seed=5)
    b, _ = native.sample_hop(ip, ix, fr, 8, seed=5)
    c, _ = native.sample_hop(ip, ix, fr, 8, seed=6)
    np.testing.assert_array_equal(a, b)
    assert (a != c).any()


def test_hash_i32():
    a = np.arange(1000, dtype=np.int32)
    h1 = native.hash_i32(a)
    h2 = native.hash_i32(a.copy())
    assert h1 == h2
    a2 = a.copy()
    a2[500] += 1
    assert native.hash_i32(a2) != h1


def test_label_prop_native_matches_numpy_recurrence():
    """ngt_label_prop == the numpy recurrence in halo.locality_order (same
    votes, same balance scaling, same sticky, first-max tie-break)."""
    from noise_gnn_tpu import native

    if not native.available():
        import pytest

        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(0)
    n, e, d, iters, sticky = 500, 4000, 4, 6, 1.1
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    per = -(-n // d)
    part0 = np.minimum(np.arange(n) // per, d - 1).astype(np.int32)

    part_np = part0.copy()
    for _ in range(iters):
        counts = np.zeros((n, d), np.float32)
        np.add.at(counts, (dst, part_np[src]), 1.0)
        np.add.at(counts, (src, part_np[dst]), 1.0)
        sizes = np.bincount(part_np, minlength=d).astype(np.float64)
        balance = (n / d) / np.maximum(sizes, 1.0)
        score = counts * balance[None, :].astype(np.float32)
        score[np.arange(n), part_np] *= sticky
        part_np = score.argmax(1).astype(np.int32)

    part_c = native.label_prop(src, dst, n, d, part0.copy(),
                               iters=iters, sticky=sticky)
    # float-op ordering can flip exact ties; demand near-total agreement
    assert (part_c == part_np).mean() > 0.98
    assert np.bincount(part_c, minlength=d).max() <= 2 * per
