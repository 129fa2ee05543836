"""Export a PyG/OGB dataset to the npz format noise-gnn-tpu loads.

Run in an environment WITH torch + torch_geometric + ogb (this repo's
runtime does not need them):

    python tools/convert_pyg.py --dataset ogbn-arxiv --root /data --out data/

Produces ``<out>/<dataset>.npz`` with keys:
    x          [N, F] float32
    y          [N]    int32
    edge_index [2, E] int32
    train_idx / valid_idx / test_idx   (when the dataset has official splits)

Datasets with random reference splits (cora, computers) omit the split keys;
noise-gnn-tpu regenerates them with the reference's per-class quotas
(graph/splits.py).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--root", default="data_raw")
    ap.add_argument("--out", default="data")
    args = ap.parse_args()

    name = args.dataset
    out = {}
    if name.startswith("ogbn-"):
        from ogb.nodeproppred import PygNodePropPredDataset

        ds = PygNodePropPredDataset(name, root=args.root)
        data = ds[0]
        split = ds.get_idx_split()
        out["train_idx"] = split["train"].numpy().astype(np.int32)
        out["valid_idx"] = split["valid"].numpy().astype(np.int32)
        out["test_idx"] = split["test"].numpy().astype(np.int32)
    elif name == "pubmed":
        from torch_geometric.datasets import Planetoid

        ds = Planetoid(root=args.root, name=name)
        data = ds[0]
        out["train_idx"] = data.train_mask.nonzero().view(-1).numpy().astype(np.int32)
        out["valid_idx"] = data.val_mask.nonzero().view(-1).numpy().astype(np.int32)
        out["test_idx"] = data.test_mask.nonzero().view(-1).numpy().astype(np.int32)
    elif name == "cora":
        from torch_geometric.datasets import CitationFull

        ds = CitationFull(root=args.root, name=name)
        data = ds[0]
    elif name == "computers":
        from torch_geometric.datasets import Amazon

        ds = Amazon(root=args.root, name=name)
        data = ds[0]
    else:
        raise SystemExit(f"unknown dataset {name}")

    out["x"] = data.x.numpy().astype(np.float32)
    out["y"] = data.y.view(-1).numpy().astype(np.int32)
    out["edge_index"] = data.edge_index.numpy().astype(np.int32)

    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, f"{name}.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path}: N={out['x'].shape[0]} F={out['x'].shape[1]} "
          f"E={out['edge_index'].shape[1]}")


if __name__ == "__main__":
    main()
