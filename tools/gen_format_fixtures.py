"""Generate tiny checked-in fixtures in the reference's real on-disk
dataset formats (graph/readers.py parses them; tests/test_readers.py
exercises every parser — VERDICT r4 next #3).

The fixtures are synthetic miniatures BUILT IN the upstream formats:
* Planetoid pickle family (pubmed layout) — scipy CSR feature blocks,
  one-hot label blocks, adjacency dict, shuffled test.index
* graph2gauss/GNN-benchmark npz (CitationFull cora + Amazon computers)
* OGB node-prop csv.gz layout (ogbn-arxiv, split/time)

Run once; outputs land under tests/fixtures/real_formats/ (a few KB).
"""

from __future__ import annotations

import gzip
import os
import pickle

import numpy as np
import scipy.sparse as sp

ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tests", "fixtures", "real_formats")


def _ring_edges(n: int, rng) -> tuple[list[int], list[int]]:
    src = list(range(n)) + [int(rng.integers(0, n)) for _ in range(n)]
    dst = [(i + 1) % n for i in range(n)] + [
        int(rng.integers(0, n)) for _ in range(n)
    ]
    return src, dst


def make_planetoid(name="pubmed"):
    rng = np.random.default_rng(0)
    n_train, n_rest, n_test, F, C = 6, 4, 4, 5, 3
    n_allx = n_train + n_rest
    n = n_allx + n_test

    feats = rng.random((n, F)).astype(np.float32)
    labels = np.arange(n) % C

    def onehot(idx):
        o = np.zeros((len(idx), C), np.int32)
        o[np.arange(len(idx)), labels[idx]] = 1
        return o

    raw = os.path.join(ROOT, name, "raw")
    os.makedirs(raw, exist_ok=True)
    p = lambda s: os.path.join(raw, f"ind.{name}.{s}")  # noqa: E731

    # test rows are written in a SHUFFLED test.index order to exercise the
    # scatter-back in read_planetoid
    test_ids = np.arange(n_allx, n)
    order = rng.permutation(n_test)
    test_ids_shuffled = test_ids[order]

    blocks = {
        "x": sp.csr_matrix(feats[:n_train]),
        "allx": sp.csr_matrix(feats[:n_allx]),
        "tx": sp.csr_matrix(feats[test_ids_shuffled]),
        "y": onehot(np.arange(n_train)),
        "ally": onehot(np.arange(n_allx)),
        "ty": onehot(test_ids_shuffled),
    }
    src, dst = _ring_edges(n, rng)
    graph = {}
    for u, v in zip(src, dst):
        if u != v:
            graph.setdefault(u, []).append(v)
            graph.setdefault(v, []).append(u)
    blocks["graph"] = graph
    for suf, obj in blocks.items():
        with open(p(suf), "wb") as f:
            pickle.dump(obj, f, protocol=2)
    np.savetxt(p("test.index"), test_ids_shuffled, fmt="%d")
    # ground truth for the test
    np.savez(os.path.join(ROOT, f"{name}_expected.npz"),
             x=feats, y=labels.astype(np.int32), n_train=n_train,
             test_ids=test_ids)


def make_npz(name: str, fname: str, dense_attr: bool):
    rng = np.random.default_rng(1)
    C, per, F = 3, 60, 8
    n = C * per
    labels = (np.arange(n) % C).astype(np.int32)
    feats = rng.random((n, F)).astype(np.float32)
    feats[feats < 0.7] = 0.0  # sparse-ish, like bag-of-words attrs
    src, dst = _ring_edges(n, rng)
    adj = sp.csr_matrix(
        (np.ones(len(src), np.float32), (src, dst)), shape=(n, n)
    )
    out = {
        "adj_data": adj.data,
        "adj_indices": adj.indices,
        "adj_indptr": adj.indptr,
        "adj_shape": np.asarray(adj.shape),
        "labels": labels,
    }
    if dense_attr:
        out["attr_matrix"] = feats
    else:
        attr = sp.csr_matrix(feats)
        out.update(attr_data=attr.data, attr_indices=attr.indices,
                   attr_indptr=attr.indptr,
                   attr_shape=np.asarray(attr.shape))
    d = os.path.join(ROOT, name, "raw")
    os.makedirs(d, exist_ok=True)
    np.savez(os.path.join(d, fname), **out)
    # expected follows the PyG parse_npz semantics the reader reproduces:
    # binarized features (the raw npz keeps the counts)
    np.savez(os.path.join(ROOT, f"{name}_expected.npz"),
             x=(feats > 0).astype(np.float32), y=labels)


def make_ogb(name="ogbn-arxiv"):
    rng = np.random.default_rng(2)
    n, F, C = 30, 4, 5
    feats = np.round(rng.random((n, F)).astype(np.float32), 4)
    labels = (np.arange(n) % C).astype(np.int32)
    src, dst = _ring_edges(n, rng)
    ddir = os.path.join(ROOT, name.replace("-", "_"))
    raw = os.path.join(ddir, "raw")
    split = os.path.join(ddir, "split", "time")
    os.makedirs(raw, exist_ok=True)
    os.makedirs(split, exist_ok=True)

    def w(path, arr, fmt):
        with gzip.open(path, "wt") as f:
            for row in arr:
                f.write(fmt(row) + "\n")

    w(os.path.join(raw, "edge.csv.gz"), list(zip(src, dst)),
      lambda r: f"{r[0]},{r[1]}")
    w(os.path.join(raw, "node-feat.csv.gz"), feats,
      lambda r: ",".join(repr(float(v)) for v in r))
    w(os.path.join(raw, "node-label.csv.gz"), labels,
      lambda r: str(int(r)))
    perm = rng.permutation(n)
    parts = {"train": perm[:18], "valid": perm[18:24], "test": perm[24:]}
    for part, idx in parts.items():
        w(os.path.join(split, f"{part}.csv.gz"), idx, lambda r: str(int(r)))
    np.savez(os.path.join(ROOT, "ogbn_arxiv_expected.npz"), x=feats,
             y=labels, train_idx=parts["train"], valid_idx=parts["valid"],
             test_idx=parts["test"])


if __name__ == "__main__":
    make_planetoid()
    make_npz("cora", "cora.npz", dense_attr=False)
    make_npz("computers", "amazon_electronics_computers.npz", dense_attr=True)
    make_ogb()
    print(f"fixtures written under {ROOT}")
