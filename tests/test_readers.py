"""Native real-format readers (graph/readers.py) against tiny checked-in
fixtures in the upstream on-disk layouts (VERDICT r4 missing #1 / next #3;
reference loaders: src/utils/load_utils.py:24-47). Also proves the
load_network preference order: real raw data beats the synthetic fallback
with no config changes."""

import os

import numpy as np
import pytest

from noise_gnn_tpu.graph.readers import (
    detect_and_read,
    read_npz_graph,
    read_ogb_nodeprop,
    read_planetoid,
)

FIX = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures",
                   "real_formats")


def _expected(name):
    return np.load(os.path.join(FIX, f"{name}_expected.npz"))


def test_planetoid_parse():
    g = read_planetoid(FIX, "pubmed")
    exp = _expected("pubmed")
    assert g.num_nodes == exp["x"].shape[0]
    # the fixture writes tx/ty rows in SHUFFLED test.index order: the parser
    # must scatter them back to node-id order
    np.testing.assert_allclose(g.x, exp["x"], rtol=1e-6)
    np.testing.assert_array_equal(g.y, exp["y"])
    # public split: first n_train labelled, 500-capped val, test.index test
    n_train = int(exp["n_train"])
    assert g.train_mask[:n_train].all() and not g.train_mask[n_train:].any()
    assert set(np.flatnonzero(g.test_mask)) == set(exp["test_ids"].tolist())
    # adjacency dict is symmetric; parser dedupes and drops self-loops
    src, dst = g.edge_index
    assert (src != dst).all()
    pairs = set(zip(src.tolist(), dst.tolist()))
    assert all((d, s) in pairs for s, d in pairs)


@pytest.mark.parametrize("name,fname", [
    ("cora", "cora.npz"),                              # CSR attrs
    ("computers", "amazon_electronics_computers.npz"),  # dense attrs
])
def test_npz_graph_parse(name, fname):
    g = read_npz_graph(os.path.join(FIX, name, "raw", fname), name)
    exp = _expected(name)
    # PyG parse_npz semantics: binarized features, undirected, no loops
    np.testing.assert_allclose(g.x, exp["x"], rtol=1e-6)
    assert set(np.unique(g.x)) <= {0.0, 1.0}
    np.testing.assert_array_equal(g.y, exp["y"])
    assert g.num_classes == int(exp["y"].max()) + 1
    assert g.train_mask is None  # format carries no split
    src, dst = g.edge_index
    assert (src != dst).all()
    pairs = set(zip(src.tolist(), dst.tolist()))
    assert all((d, s) in pairs for s, d in pairs)  # symmetrized


def test_ogb_nodeprop_parse():
    g = read_ogb_nodeprop(FIX, "ogbn-arxiv")
    exp = _expected("ogbn_arxiv")
    np.testing.assert_allclose(g.x, exp["x"], rtol=1e-5)
    np.testing.assert_array_equal(g.y, exp["y"])
    # official split carried from split/time/*.csv.gz
    np.testing.assert_array_equal(np.flatnonzero(g.train_mask),
                                  np.sort(exp["train_idx"]))
    np.testing.assert_array_equal(np.flatnonzero(g.val_mask),
                                  np.sort(exp["valid_idx"]))
    np.testing.assert_array_equal(np.flatnonzero(g.test_mask),
                                  np.sort(exp["test_idx"]))


def test_detect_and_read_probes_layouts():
    assert detect_and_read(FIX, "pubmed").name == "pubmed"
    assert detect_and_read(FIX, "cora").name == "cora"
    assert detect_and_read(FIX, "computers").name == "computers"
    assert detect_and_read(FIX, "ogbn-arxiv").name == "ogbn-arxiv"
    assert detect_and_read(FIX, "ogbn-products") is None  # not present


def test_detect_and_read_pyg_dir_casing(tmp_path):
    """PyG capitalizes some dataset dirs (Amazon -> 'Computers/raw',
    Planetoid -> 'Pubmed/raw'); the probe must find both casings."""
    import shutil

    shutil.copytree(os.path.join(FIX, "computers"), tmp_path / "Computers")
    shutil.copytree(os.path.join(FIX, "pubmed"), tmp_path / "Pubmed")
    assert detect_and_read(str(tmp_path), "computers").name == "computers"
    assert detect_and_read(str(tmp_path), "pubmed").name == "pubmed"


@pytest.mark.parametrize("name", ["pubmed", "cora", "computers",
                                  "ogbn-arxiv"])
def test_load_network_prefers_real_data(name):
    """Dropping real raw files under data_dir yields a real-data run: the
    graph is the parsed fixture (not the synthetic fallback) and splits
    follow the reference semantics for formats without one."""
    from noise_gnn_tpu.graph.datasets import DATASET_REGISTRY, load_network

    g = load_network({"dataset_name": name, "data_dir": FIX, "seed": 0})
    assert g.num_nodes < 1000  # fixture-sized, not the registry profile
    assert g.num_nodes != DATASET_REGISTRY[name].num_nodes
    # every dataset ends up with a usable split
    idx = g.split_idx()
    assert len(idx["train"]) and len(idx["valid"]) and len(idx["test"])
    if name == "pubmed":
        # NormalizeFeatures applied after the planetoid parse
        s = g.x.sum(axis=1)
        np.testing.assert_allclose(s[s > 0], 1.0, rtol=1e-5)
