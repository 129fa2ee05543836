import jax
import jax.numpy as jnp
import numpy as np

from noise_gnn_tpu.models import layers as L
from noise_gnn_tpu.models import nets
from noise_gnn_tpu.ops.sampler import flat_edge_index


def dense_mean_adj(edge_index, n):
    a = np.zeros((n, n), np.float32)
    a[edge_index[1], edge_index[0]] = 1.0
    deg = a.sum(axis=1, keepdims=True)
    return a / np.maximum(deg, 1.0)


def test_sage_conv_math():
    """SAGEConv parity: out = mean_neigh @ W_l + b + x @ W_r (SURVEY §2.3)."""
    rng = np.random.default_rng(1)
    n, fi, fo = 9, 4, 3
    x = rng.standard_normal((n, fi)).astype(np.float32)
    ei = np.asarray([[0, 1, 2, 3, 4, 1], [1, 2, 3, 4, 0, 0]], np.int32)
    p = L.sage_conv_init(jax.random.key(0), fi, fo)
    got = np.asarray(L.sage_conv(p, jnp.asarray(x), jnp.asarray(ei)))
    am = dense_mean_adj(ei, n)
    want = am @ x @ np.asarray(p["w_neigh"]) + x @ np.asarray(p["w_root"]) + np.asarray(p["b"])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_gcn_conv_math():
    rng = np.random.default_rng(2)
    n, fi, fo = 7, 5, 4
    x = rng.standard_normal((n, fi)).astype(np.float32)
    ei = np.asarray([[0, 1, 2], [1, 2, 0]], np.int32)
    p = L.gcn_conv_init(jax.random.key(0), fi, fo)
    got = np.asarray(L.gcn_conv(p, jnp.asarray(x), jnp.asarray(ei)))
    a = np.zeros((n, n), np.float32)
    a[ei[1], ei[0]] = 1.0
    want = (a @ x + x) @ np.asarray(p["w"]) + np.asarray(p["b"])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_tree_forward_matches_edge_list():
    """Tree-mode SAGE forward == edge-list forward on the flat tree subgraph."""
    rng = np.random.default_rng(3)
    b, fanouts = 4, (3, 2)
    sizes = [b, b * 3, b * 6]
    n_sub = sum(sizes)
    f_in, hid, out = 5, 8, 3
    spec = nets.NetSpec(module="sage", in_size=f_in, hidden_size=hid, out_size=out, num_layers=2, dropout=0.0)
    params = nets.init_params(jax.random.key(0), spec)

    x_sub = rng.standard_normal((n_sub, f_in)).astype(np.float32)
    masks = [np.ones(s, bool) for s in sizes]
    masks[1][4] = False
    masks[2][np.arange(8, 12)] = False  # children of the invalid node
    masks[2][17] = False

    ei = flat_edge_index(b, fanouts)
    edge_mask = np.concatenate([masks[1], masks[2]])
    res_flat = nets.apply(
        spec, params, jnp.asarray(x_sub), jnp.asarray(ei),
        edge_mask=jnp.asarray(edge_mask), train=False,
    )["logits"][:b]

    xs = [jnp.asarray(x_sub[: sizes[0]]),
          jnp.asarray(x_sub[sizes[0] : sizes[0] + sizes[1]]),
          jnp.asarray(x_sub[sizes[0] + sizes[1] :])]
    ms = [jnp.asarray(m) for m in masks]
    res_tree = nets.apply_tree(spec, params, xs, ms, fanouts, train=False)["logits"]
    np.testing.assert_allclose(np.asarray(res_flat), np.asarray(res_tree), rtol=1e-4, atol=1e-4)


def test_sagepl_outputs():
    n, f_in, c = 12, 6, 4
    spec = nets.NetSpec(module="sagePL", in_size=f_in, hidden_size=8, out_size=c, num_layers=2, nbr_nodes=50, dropout=0.0)
    params = nets.init_params(jax.random.key(1), spec)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((n, f_in)), jnp.float32)
    ei = jnp.asarray([[0, 1, 2], [1, 2, 3]])
    n_id = jnp.arange(n) + 10
    out = nets.apply(spec, params, x, ei, n_id=n_id, noise_rate=0.2)
    assert set(out) == {"h_pure", "y_pure", "z_pure", "h_noisy", "y_noisy", "z_noisy"}
    np.testing.assert_allclose(
        np.asarray(jnp.exp(out["y_pure"]).sum(axis=-1)), np.ones(n), rtol=1e-5
    )
    assert out["h_pure"].shape == (n, 8)
    # noisy branch differs from pure branch
    assert np.abs(np.asarray(out["z_pure"] - out["z_noisy"])).max() > 1e-6


def test_sagefc_and_sageh():
    spec_h = nets.NetSpec(module="sageH", in_size=4, hidden_size=6, out_size=3, num_layers=2, dropout=0.0)
    p = nets.init_params(jax.random.key(2), spec_h)
    x = jnp.ones((5, 4))
    ei = jnp.asarray([[0], [1]])
    out = nets.apply(spec_h, p, x, ei)
    assert out["logits"].shape == (5, 3) and out["h"].shape == (5, 6)

    spec_fc = nets.NetSpec(module="sageFC", in_size=4, hidden_size=6, out_size=3, num_layers=2, dropout=0.0)
    p = nets.init_params(jax.random.key(3), spec_fc)
    out = nets.apply(spec_fc, p, x, ei)
    assert out["h"].shape == (5, spec_fc.proj_size)


def test_gat_runs():
    spec = nets.NetSpec(module="gat", in_size=4, hidden_size=6, out_size=3, num_layers=2)
    p = nets.init_params(jax.random.key(4), spec)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((6, 4)), jnp.float32)
    ei = jnp.asarray([[0, 1, 2, 3], [1, 2, 3, 0]])
    out = nets.apply(spec, p, x, ei)["logits"]
    assert out.shape == (6, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_dropout_scaling():
    key = jax.random.key(0)
    x = jnp.ones((1000, 10))
    y = L.dropout(key, x, 0.5, True)
    frac = float((np.asarray(y) == 0).mean())
    assert 0.4 < frac < 0.6
    np.testing.assert_allclose(float(np.asarray(y).max()), 2.0)
    np.testing.assert_allclose(np.asarray(L.dropout(key, x, 0.5, False)), np.asarray(x))


def test_sage_conv_max_aggregation():
    """SAGEConv(aggr='max') parity: out = max_neigh @ W_l + b + x @ W_r
    (BASELINE.json north star lists GraphSAGE mean/max convolutions)."""
    rng = np.random.default_rng(7)
    n, fi, fo = 9, 4, 3
    x = rng.standard_normal((n, fi)).astype(np.float32)
    ei = np.asarray([[0, 1, 2, 3, 4, 1], [1, 2, 3, 4, 0, 0]], np.int32)
    p = L.sage_conv_init(jax.random.key(0), fi, fo)
    got = np.asarray(L.sage_conv(p, jnp.asarray(x), jnp.asarray(ei), aggr="max"))
    agg = np.zeros((n, fi), np.float32)
    for i in range(n):
        srcs = ei[0][ei[1] == i]
        if srcs.size:
            agg[i] = x[srcs].max(axis=0)
    want = agg @ np.asarray(p["w_neigh"]) + x @ np.asarray(p["w_root"]) + np.asarray(p["b"])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_sage_conv_tree_max_matches_manual():
    rng = np.random.default_rng(8)
    n, k, fi, fo = 6, 4, 5, 3
    x_self = rng.standard_normal((n, fi)).astype(np.float32)
    x_neigh = rng.standard_normal((n, k, fi)).astype(np.float32)
    mask = rng.random((n, k)) > 0.4
    mask[0] = False  # isolated node -> aggregates to 0
    p = L.sage_conv_init(jax.random.key(1), fi, fo)
    got = np.asarray(
        L.sage_conv_tree(p, jnp.asarray(x_self), jnp.asarray(x_neigh),
                         jnp.asarray(mask), aggr="max")
    )
    agg = np.zeros((n, fi), np.float32)
    for i in range(n):
        if mask[i].any():
            agg[i] = x_neigh[i][mask[i]].max(axis=0)
    want = agg @ np.asarray(p["w_neigh"]) + x_self @ np.asarray(p["w_root"]) + np.asarray(p["b"])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_max_aggr_full_stack():
    """aggr='max' threads through NetSpec apply / apply_tree / inference."""
    from noise_gnn_tpu.eval.inference import FullGraphInference
    from noise_gnn_tpu.graph.datasets import synthetic_graph

    g = synthetic_graph(120, 8, 3, 700, seed=5)
    spec = nets.NetSpec(module="sage", in_size=8, hidden_size=16, out_size=3,
                        num_layers=2, dropout=0.0, aggr="max")
    params = nets.init_params(jax.random.key(0), spec)
    x = jnp.asarray(g.x)
    ei = jnp.asarray(g.edge_index)
    logits = nets.apply(spec, params, x, ei)["logits"]
    infer = FullGraphInference(spec, g.edge_index, g.num_nodes)
    got = infer(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(logits),
                               rtol=1e-4, atol=1e-4)
