"""Calibrate synthetic-fallback difficulty (DATASET_REGISTRY.feature_noise).

The synthetic graphs stand in for the real datasets in this zero-egress
environment, so their difficulty must be calibrated: a plain 2-layer SAGE
trained on CLEAN labels should land near the real dataset's published
accuracy band (else label-noise experiments degenerate — a saturating graph
shows no baseline/co-teaching gap). ``feature_noise`` is the per-direction
noise std (see graph/datasets.py::synthetic_graph); accuracy is monotone
decreasing in it, so we bisect.

Usage:
  python tools/calibrate_synthetic.py cora pubmed computers   # CPU ok
  python tools/calibrate_synthetic.py ogbn-arxiv              # bigger
  python tools/calibrate_synthetic.py ogbn-products --scale 10

Targets (real-dataset accuracy bands for the reference's model regime):
  cora (CitationFull, 70 cls, 20/cls train)  ~0.62
  pubmed (public split)                      ~0.77
  computers (30/cls train)                   ~0.82
  ogbn-arxiv (official split)                ~0.71
  ogbn-products (official split)             ~0.78

Prints one line per probe and a final suggested registry value per dataset.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TARGETS = {
    "cora": 0.62,
    "pubmed": 0.77,
    "computers": 0.82,
    "ogbn-arxiv": 0.71,
    "ogbn-products": 0.78,
}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def train_eval(g, *, epochs: int, hidden: int, lr: float, seed: int = 0) -> float:
    """Full-batch 2-layer SAGE on clean labels; test acc at best-val epoch."""
    import jax
    import jax.numpy as jnp
    import optax

    from noise_gnn_tpu.models import nets

    spec = nets.NetSpec(
        module="sage", in_size=g.num_features, hidden_size=hidden,
        out_size=g.num_classes, num_layers=2, dropout=0.5,
    )
    params = nets.init_params(jax.random.key(seed), spec)
    x = jnp.asarray(g.x)
    y = jnp.asarray(g.y)
    ei = jnp.asarray(g.edge_index)
    idx = g.split_idx()
    tr = jnp.asarray(idx["train"].astype(np.int32))
    va = jnp.asarray(idx["valid"].astype(np.int32))
    te = jnp.asarray(idx["test"].astype(np.int32))

    opt = optax.adam(lr)
    ost = opt.init(params)

    @jax.jit
    def step(params, ost, key):
        def loss_fn(p):
            out = nets.apply(spec, p, x, ei, train=True, key=key)["logits"]
            lo = jnp.take(out, tr, axis=0)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                lo, jnp.take(y, tr)
            )
            return ce.mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        u, ost2 = opt.update(grads, ost, params)
        return optax.apply_updates(params, u), ost2, loss

    @jax.jit
    def accs(params):
        out = nets.apply(spec, params, x, ei, train=False)["logits"]
        pred = jnp.argmax(out, -1)
        acc = lambda ix: (jnp.take(pred, ix) == jnp.take(y, ix)).mean()
        return acc(va), acc(te)

    best_va, best_te = -1.0, 0.0
    key = jax.random.key(seed + 1)
    for ep in range(epochs):
        key, kd = jax.random.split(key)
        params, ost, _ = step(params, ost, kd)
        if ep % 5 == 4 or ep == epochs - 1:
            va_a, te_a = accs(params)
            va_a, te_a = float(va_a), float(te_a)
            if va_a > best_va:
                best_va, best_te = va_a, te_a
    return best_te


def probe(name: str, fnoise: float, scale: int, epochs: int, hidden: int,
          lr: float, via_cli: bool = False) -> float:
    from noise_gnn_tpu.graph import datasets as D

    prof = D.DATASET_REGISTRY[name]
    old = prof
    D.DATASET_REGISTRY[name] = dataclasses.replace(prof, feature_noise=fnoise)
    try:
        t0 = time.time()
        if via_cli:
            # products-scale: full-batch jax.grad on one chip would blow HBM;
            # use the real pipeline (mini-batch train + full-graph eval) with
            # zero injected noise so 'baseline' accuracy = clean-label band
            import main as cli
            from noise_gnn_tpu.utils.config import load_config

            base = {"ogbn-products": "config_products.yml",
                    "ogbn-arxiv": "config_arxiv.yml"}[name]
            cfg = load_config(os.path.join("configs", base))
            with tempfile.TemporaryDirectory() as td:
                cfg.update(dict(
                    dataset_name=name, train_type="baseline",
                    compare_loss="normal", noise_rate=0.0, noise_type="sym",
                    num_runs=1, max_epochs=epochs, synthetic_scale=scale,
                    data_dir=td, batch_id=98, epoch_logger=False,
                    exact_leaf=True, what="", module="sage",
                    module_compare="sage",
                ))
                acc = float(cli.main(cfg)["baseline"][0])
        else:
            with tempfile.TemporaryDirectory() as td:
                g = D.load_network({
                    "dataset_name": name, "seed": 0, "synthetic_scale": scale,
                    "data_dir": td,
                })
            acc = train_eval(g, epochs=epochs, hidden=hidden, lr=lr)
        log(f"  {name} f={fnoise:.3f} -> test {acc:.3f}  ({time.time()-t0:.0f}s)")
        return acc
    finally:
        D.DATASET_REGISTRY[name] = old


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("datasets", nargs="+")
    ap.add_argument("--scale", type=int, default=1)
    ap.add_argument("--epochs", type=int, default=80)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--lr", type=float, default=5e-3)
    ap.add_argument("--iters", type=int, default=5, help="bisection steps")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--cli", action="store_true",
                    help="probe via the real pipeline (mini-batch train + "
                         "full-graph eval); required at ogbn-products scale")
    ap.add_argument("--lo", type=float, default=0.2)
    ap.add_argument("--hi", type=float, default=8.0,
                    help="raise for dense graphs (deg ~25 aggregation "
                         "suppresses feature noise ~5x per hop)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    for name in args.datasets:
        target = TARGETS[name]
        lo, hi = args.lo, args.hi  # acc(lo) high, acc(hi) low
        log(f"== {name} target {target:.2f} (scale {args.scale})")
        for _ in range(args.iters):
            mid = (lo * hi) ** 0.5  # geometric bisection
            acc = probe(name, mid, args.scale, args.epochs, args.hidden,
                        args.lr, via_cli=args.cli)
            if acc > target:
                lo = mid  # too easy -> more noise
            else:
                hi = mid
        final = (lo * hi) ** 0.5
        print(f"{name}: feature_noise={final:.2f}")


if __name__ == "__main__":
    main()
