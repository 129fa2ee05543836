import numpy as np

from noise_gnn_tpu.graph.datasets import DATASET_REGISTRY, load_network, synthetic_graph


def test_synthetic_graph_learnable_structure():
    g = synthetic_graph(500, 32, 5, 4000, homophily=0.9, seed=0)
    assert g.x.shape == (500, 32)
    assert g.num_edges > 3000
    src, dst = g.edge_index
    same = (g.y[src] == g.y[dst]).mean()
    assert same > 0.5  # homophilous
    assert (src != dst).all()


def test_load_cora_splits():
    cfg = {"dataset_name": "cora", "seed": 3, "synthetic_scale": 20}
    g = load_network(cfg)
    prof = DATASET_REGISTRY["cora"]
    assert g.num_classes == prof.num_classes
    idx = g.split_idx()
    # 20/class train, 30/class val (reference load_utils.py:118-121);
    # classes smaller than 50 in the scaled synthetic graph contribute
    # min(count, quota) like the reference's i[:20] slicing
    counts = np.bincount(g.y, minlength=g.num_classes)
    assert idx["train"].shape[0] == np.minimum(counts, 20).sum()
    assert idx["valid"].shape[0] == np.clip(counts - 20, 0, 30).sum()
    assert not (g.train_mask & g.val_mask).any()
    assert not (g.train_mask & g.test_mask).any()


def test_load_computers_splits():
    g = load_network({"dataset_name": "computers", "seed": 0, "synthetic_scale": 10})
    idx = g.split_idx()
    assert idx["train"].shape[0] == 30 * g.num_classes
    assert idx["valid"].shape[0] == 20 * g.num_classes


def test_load_pubmed_normalized():
    g = load_network({"dataset_name": "pubmed", "seed": 0, "synthetic_scale": 10})
    sums = np.abs(g.x).sum(axis=1)
    # row-normalized: rows sum to ~1 in abs terms only if non-negative; check scale
    assert np.isfinite(g.x).all()
    idx = g.split_idx()
    assert idx["train"].shape[0] == 20 * g.num_classes
    assert idx["valid"].shape[0] == 500
    assert idx["test"].shape[0] == 1000


def test_load_arxiv_undirected():
    g = load_network({"dataset_name": "ogbn-arxiv", "seed": 0, "synthetic_scale": 100})
    pairs = set(zip(g.edge_index[0].tolist(), g.edge_index[1].tolist()))
    assert all((b, a) in pairs for a, b in list(pairs)[:200])


def test_products_frac_subsample():
    cfg = {
        "dataset_name": "ogbn-products",
        "seed": 0,
        "synthetic_scale": 500,
        "whole_test_set": False,
        "train_frac": 2,
        "tvalid_frac": 2,
        "test_frac": 4,
    }
    g_full = load_network({**cfg, "whole_test_set": True})
    g_sub = load_network(cfg)
    f_idx, s_idx = g_full.split_idx(), g_sub.split_idx()
    assert abs(s_idx["train"].shape[0] - f_idx["train"].shape[0] // 2) <= 1
    assert abs(s_idx["test"].shape[0] - f_idx["test"].shape[0] // 4) <= 1


def test_deterministic_by_seed():
    a = load_network({"dataset_name": "cora", "seed": 7, "synthetic_scale": 50})
    b = load_network({"dataset_name": "cora", "seed": 7, "synthetic_scale": 50})
    np.testing.assert_array_equal(a.x, b.x)
    np.testing.assert_array_equal(a.train_mask, b.train_mask)


def test_load_index_caching(tmp_path):
    cfg = {"dataset_name": "cora", "seed": 5, "synthetic_scale": 50,
           "data_dir": str(tmp_path), "load_index": True}
    g1 = load_network(cfg)
    # cache written
    import glob
    assert glob.glob(str(tmp_path / "index" / "*.npz"))
    g2 = load_network(cfg)
    np.testing.assert_array_equal(g1.train_mask, g2.train_mask)
    np.testing.assert_array_equal(g1.test_mask, g2.test_mask)


def test_real_npz_roundtrip_with_official_splits(tmp_path):
    """The real-dataset ingestion branch (graph/datasets.py _load_npz):
    a hand-built npz with official-style split indices must round-trip with
    the provided splits honored, undirected conversion applied (arxiv), and
    feature normalization applied (pubmed) — reference semantics
    src/utils/load_utils.py:24-47."""
    rng = np.random.default_rng(0)
    n, f, c, e = 120, 16, 40, 600
    x = rng.standard_normal((n, f)).astype(np.float32)
    y = rng.integers(0, c, n).astype(np.int32)
    # directed edges (so arxiv's ToUndirected has something to do)
    src = rng.integers(0, n, e)
    dst = (src + 1 + rng.integers(0, n - 1, e)) % n
    edge_index = np.stack([src, dst]).astype(np.int32)
    tr = np.arange(0, 50)
    va = np.arange(50, 80)
    te = np.arange(80, 120)
    np.savez(tmp_path / "ogbn-arxiv.npz", x=x, y=y, edge_index=edge_index,
             train_idx=tr, valid_idx=va, test_idx=te)

    g = load_network({"dataset_name": "ogbn-arxiv", "data_dir": str(tmp_path),
                      "seed": 0})
    # provided split indices honored verbatim (no random re-split)
    idx = g.split_idx()
    np.testing.assert_array_equal(np.sort(idx["train"]), tr)
    np.testing.assert_array_equal(np.sort(idx["valid"]), va)
    np.testing.assert_array_equal(np.sort(idx["test"]), te)
    # undirected: every edge has its reverse
    pairs = set(zip(g.edge_index[0].tolist(), g.edge_index[1].tolist()))
    assert all((b, a) in pairs for a, b in pairs)
    # features and labels round-trip
    assert g.num_classes == int(y.max()) + 1
    assert g.x.shape == (n, f)

    # pubmed branch: NormalizeFeatures row-normalization on the npz features
    x_pos = np.abs(x)
    np.savez(tmp_path / "pubmed.npz", x=x_pos, y=y, edge_index=edge_index,
             train_idx=tr, valid_idx=va, test_idx=te)
    g2 = load_network({"dataset_name": "pubmed", "data_dir": str(tmp_path),
                       "seed": 0})
    np.testing.assert_allclose(g2.x.sum(axis=1), np.ones(n), rtol=1e-5)
