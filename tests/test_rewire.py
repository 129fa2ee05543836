"""topk_rewire vs a dense numpy implementation of the reference semantics
(src/utils/augmentation.py:38-86, undirected path)."""

import jax.numpy as jnp
import numpy as np

from noise_gnn_tpu.augment.rewire import topk_rewire
from noise_gnn_tpu.augment.features import shuffle_neg, shuffle_pos
import jax


def dense_reference(h, edge_index, k):
    """Reference math with dense matrices: returns (pos_set, neg_set) of
    directed edge tuples."""
    n = h.shape[0]
    hn = h / np.maximum(np.linalg.norm(h, axis=1, keepdims=True), 1e-12)
    sim = hn @ hn.T
    adj = np.zeros((n, n), bool)
    adj[edge_index[0], edge_index[1]] = True
    off_diag = ~np.eye(n, dtype=bool)

    # pos: remove 2k lowest-sim existing off-diag edges
    cand = np.argwhere(adj & off_diag)
    scores = sim[cand[:, 0], cand[:, 1]]
    rm = cand[np.argsort(scores)[: 2 * k]]
    kept = adj.copy()
    kept[rm[:, 0], rm[:, 1]] = False
    # add 2k best non-edges (vs kept adjacency, excluding diag)
    mask = ~kept & off_diag
    nz = np.argwhere(mask)
    scores = sim[nz[:, 0], nz[:, 1]]
    add = nz[np.argsort(-scores)[: 2 * k]]
    pos = set(map(tuple, np.argwhere(kept))) | set(map(tuple, add))

    # neg: remove 2k highest-sim existing edges
    cand = np.argwhere(adj & off_diag)
    scores = sim[cand[:, 0], cand[:, 1]]
    rm = cand[np.argsort(-scores)[: 2 * k]]
    kept_n = adj.copy()
    kept_n[rm[:, 0], rm[:, 1]] = False
    # add 2k lowest-sim non-edges (vs ORIGINAL adjacency, excluding diag)
    mask = ~adj & off_diag
    nz = np.argwhere(mask)
    scores = sim[nz[:, 0], nz[:, 1]]
    add = nz[np.argsort(scores)[: 2 * k]]
    neg = set(map(tuple, np.argwhere(kept_n))) | set(map(tuple, add))
    return pos, neg


def to_set(edges, mask):
    e = np.asarray(edges)
    m = np.asarray(mask)
    return set(zip(e[0][m].tolist(), e[1][m].tolist()))


def test_topk_rewire_matches_dense_reference():
    rng = np.random.default_rng(0)
    n, e = 60, 240
    h = rng.standard_normal((n, 16)).astype(np.float32)
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    keep = src != dst
    # dedupe directed edges so set-comparison is exact
    pairs = sorted(set(zip(src[keep].tolist(), dst[keep].tolist())))
    ei = np.asarray(pairs, np.int32).T
    k = int(n * 0.05)

    (pos_e, pos_m), (neg_e, neg_m) = topk_rewire(
        jnp.asarray(h), jnp.asarray(ei), None, k_percent=0.05, block=32
    )
    pos_ref, neg_ref = dense_reference(h, ei, k)
    assert to_set(pos_e, pos_m) == pos_ref
    assert to_set(neg_e, neg_m) == neg_ref


def test_topk_rewire_static_shapes():
    rng = np.random.default_rng(1)
    h = jnp.asarray(rng.standard_normal((40, 8)), jnp.float32)
    ei = jnp.asarray(rng.integers(0, 40, (2, 100)), jnp.int32)
    mask = jnp.asarray(rng.random(100) < 0.9)
    (pos_e, pos_m), (neg_e, neg_m) = topk_rewire(h, ei, mask, k_percent=0.1)
    k2 = 2 * int(40 * 0.1)
    assert pos_e.shape == (2, 100 + k2)
    assert neg_e.shape == (2, 100 + k2)
    # added edges never duplicate the kept originals
    kept = to_set(pos_e[:, :100], pos_m[:100])
    added = to_set(pos_e[:, 100:], pos_m[100:])
    assert not (kept & added)


def test_shuffle_pos_preserves_multiset_per_row():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((30, 40)), jnp.float32)
    out = shuffle_pos(jax.random.key(0), x, prob=0.3)
    xs = np.sort(np.asarray(x), axis=1)
    os_ = np.sort(np.asarray(out), axis=1)
    np.testing.assert_allclose(xs, os_, rtol=1e-6)
    assert (np.asarray(out) != np.asarray(x)).any()


def test_shuffle_neg_permutes_rows():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((25, 6)), jnp.float32)
    out = shuffle_neg(jax.random.key(1), x)
    xs = np.asarray(x)
    os_ = np.asarray(out)
    # same row multiset
    np.testing.assert_allclose(
        np.sort(xs.sum(axis=1)), np.sort(os_.sum(axis=1)), rtol=1e-5
    )
    assert (xs != os_).any()
