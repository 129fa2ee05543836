import jax.numpy as jnp
import numpy as np

from noise_gnn_tpu.ops.scatter import (
    degree,
    gather_scatter_mean,
    gather_scatter_sum,
    segment_count,
    segment_max,
    segment_mean,
    segment_sum,
)


def dense_adj(edge_index, n, mask=None):
    a = np.zeros((n, n), np.float32)
    for e in range(edge_index.shape[1]):
        if mask is not None and not mask[e]:
            continue
        s, d = edge_index[0, e], edge_index[1, e]
        a[d, s] += 1.0
    return a


def test_segment_sum_mean_max():
    data = jnp.asarray(np.arange(12, dtype=np.float32).reshape(6, 2))
    ids = jnp.asarray([0, 0, 1, 3, 3, 3])
    s = segment_sum(data, ids, 4)
    np.testing.assert_allclose(np.asarray(s)[0], [2.0, 4.0])
    np.testing.assert_allclose(np.asarray(s)[2], [0.0, 0.0])
    m = segment_mean(data, ids, 4)
    np.testing.assert_allclose(np.asarray(m)[3], data[3:].mean(axis=0))
    np.testing.assert_allclose(np.asarray(m)[2], [0.0, 0.0])
    mx = segment_max(data, ids, 4)
    np.testing.assert_allclose(np.asarray(mx)[3], [10.0, 11.0])
    np.testing.assert_allclose(np.asarray(mx)[2], [0.0, 0.0])
    c = segment_count(ids, 4)
    np.testing.assert_allclose(np.asarray(c), [2, 1, 0, 3])


def test_gather_scatter_against_dense():
    rng = np.random.default_rng(0)
    n, e, f = 13, 57, 5
    x = rng.standard_normal((n, f)).astype(np.float32)
    ei = rng.integers(0, n, size=(2, e)).astype(np.int32)
    mask = rng.random(e) < 0.8
    a = dense_adj(ei, n, mask)

    got_sum = np.asarray(gather_scatter_sum(jnp.asarray(x), jnp.asarray(ei), n, jnp.asarray(mask)))
    np.testing.assert_allclose(got_sum, a @ x, rtol=1e-5, atol=1e-5)

    got_mean = np.asarray(
        gather_scatter_mean(jnp.asarray(x), jnp.asarray(ei), n, jnp.asarray(mask))
    )
    deg = a.sum(axis=1, keepdims=True)
    want = a @ x / np.maximum(deg, 1.0)
    np.testing.assert_allclose(got_mean, want, rtol=1e-5, atol=1e-5)

    d = np.asarray(degree(jnp.asarray(ei), n, jnp.asarray(mask), axis=1))
    np.testing.assert_allclose(d, a.sum(axis=1))


def test_masked_edges_contribute_nothing():
    x = jnp.asarray(np.eye(3, dtype=np.float32))
    ei = jnp.asarray([[0, 1], [2, 2]])
    mask = jnp.asarray([True, False])
    out = np.asarray(gather_scatter_sum(x, ei, 3, mask))
    np.testing.assert_allclose(out[2], [1.0, 0.0, 0.0])


def test_bf16_accumulates_fp32():
    x = jnp.ones((4, 2), jnp.bfloat16)
    ei = jnp.asarray([[0, 1, 2, 3], [0, 0, 0, 0]])
    out = gather_scatter_sum(x, ei, 4)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32)[0], [4.0, 4.0])
