"""Training pipelines mirroring the reference zoo (src/pipeline*.py).

Pipeline -> reference file:
  PipelineCO  -> src/pipeline.py         (co-teaching, OGB datasets)
  PipelineS   -> src/pipeline_s.py       (co-teaching, small graphs)
  PipelineTE  -> src/pipeline_test.py    (sagePL co-teaching+contrastive, OGB)
  PipelineTES -> src/pipeline_test_s.py  (same, small graphs)
  PipelineCTP -> src/pipeline_ctp.py     (co-teaching + consistency)
  PipelineCT  -> src/pipeline_contrast.py(contrastive pretrain/finetune)
  PipelineH   -> src/pipeline_h.py       (pseudo-label co-teaching)
  PipelineSG  -> src/pipeline_sgrid.py   (beta x tau grid search)
  PipelineA   -> src/pipeline_analysis.py(selection-quality analysis)

Differences by design (TPU-first):
  * sampling + forward + loss + update run as ONE jitted step on device;
  * evaluation is a full-graph on-device forward (no host-staged layer loop);
  * every epoch's metrics stream to JSONL next to the reference-style log.
"""

from __future__ import annotations

import os
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..eval.metrics import confusion_matrix
from ..graph.datasets import load_network
from ..losses.schedules import forget_rate_schedule
from ..models import nets
from ..noise import flip_label, noise_or_not
from ..utils.checkpoint import load_checkpoint, save_checkpoint
from ..utils.config import run_name, validate_config
from ..utils.logging import MetricsWriter, initialize_logger
from ..utils.profiling import tree_edges_per_batch
from . import steps as S

OGB_DATASETS = ("ogbn-arxiv", "ogbn-products")


def selection_degenerate(run_pure, clean_frac: float, tol: float = 0.005) -> bool:
    """True when a run's small-loss selection never found signal: the best
    per-epoch pure ratio over the LAST QUARTER of training stays within
    ``tol`` of the clean fraction (what a uniformly random subsample would
    score). The injected-noise oracle makes this observable online
    (reference pure-ratio bookkeeping, src/utils/losses.py:31-32)."""
    tail = [max(p) for p in run_pure[len(run_pure) * 3 // 4:]]
    return bool(tail) and max(tail) < clean_frac + tol


def optimization_collapsed(run_loss, run_fit, clean_frac: float,
                           loss_frac_tol: float = 0.75,
                           fit_frac: float = 0.5) -> bool:
    """True when the run's optimizer never engaged even though selection is
    healthy: the mean training loss over the LAST 5 epochs still sits above
    ``loss_frac_tol`` of the FIRST epoch's loss AND the final fit to the
    (mostly clean) selected noisy training targets is below ``fit_frac`` x
    the clean fraction. Train-side signals only — no test peeking.
    Measured failure mode (round-5 flagship run 3): loss 3.85 -> 3.03
    (0.79x, vs ~0.55x for healthy runs) with purity perfectly healthy
    (0.731 > clean 0.707) while test accuracy pinned at 0.13; the
    selection-degeneracy detector is blind to it by construction."""
    if len(run_loss) < 10 or not run_fit:
        return False
    tail = float(np.mean(run_loss[-5:]))
    return (tail > loss_frac_tol * float(run_loss[0])
            and float(run_fit[-1]) < fit_frac * clean_frac)


class RunSummary(tuple):
    """(mean, std) of per-run BEST test accuracy — tuple-compatible with
    every existing consumer (``mean, std = pipe.loop()``) — carrying the
    final-accuracy evidence alongside: per-run bests, per-run FINAL-epoch
    accuracy and last-10-epoch means (the reference's criterion is best-epoch
    only, src/pipeline.py:267-271; both are reported here so best-vs-final
    claims are auditable)."""

    def __new__(cls, mean: float, std: float, extra: dict | None = None):
        self = super().__new__(cls, (mean, std))
        self.extra = extra or {}
        return self


class BasePipeline:
    """Shared setup: data, noise, schedules, logger, batching, eval."""

    schedule_variant = "ogb"
    # re-flip labels at the top of every run (reference src/pipeline.py:207-208
    # does this for BOTH the nalgo and baseline branches); the small-graph
    # pipelines flip once (src/pipeline_s.py semantics)
    reflip_per_run = True

    def __init__(self, config: dict):
        validate_config(config)
        self.config = config
        self.rng = np.random.default_rng(int(config.get("seed", 0)))

        t0 = time.perf_counter()
        self.graph = load_network(config)
        self._t_load = time.perf_counter() - t0
        g = self.graph
        config["nbr_features"] = g.num_features
        config["nbr_classes"] = g.num_classes
        config["nbr_nodes"] = g.num_nodes

        self.split_idx = g.split_idx()
        if config.get("batch_size_full"):
            # full-batch mode: one batch covering every train seed
            # (reference src/pipeline_s.py:62-63)
            config["batch_size"] = int(self.split_idx["train"].shape[0])

        # ---- distributed execution (the reference is single-device;
        # the TPU build trains data-parallel over every visible chip by
        # default — SURVEY §2.4 DP disposition). `data_parallel: auto`
        # engages whenever >1 device is visible; batches shard over the
        # mesh `data` axis inside the SAME jitted epoch drivers, and
        # full-graph eval runs node-sharded with halo exchange.
        self.mesh = None
        want_dp = config.get("data_parallel", "auto")
        if want_dp == "auto":
            want_dp = jax.device_count() > 1
        if want_dp and jax.device_count() > 1:
            from ..parallel.mesh import make_mesh

            self.mesh = make_mesh(
                model_parallel=int(config.get("model_parallel", 1))
            )
            nd = self.mesh.shape["data"]
            bs = int(config["batch_size"])
            if bs % nd:
                # per-step batches shard evenly over the data axis; pad
                # rows are masked out of every loss/metric
                config["batch_size"] = bs + (-bs) % nd

        if int(config.get("model_parallel", 1)) > 1 and self.mesh is None:
            # never a silent no-op: TP needs a multi-device mesh (and rides
            # the same `data_parallel` engagement switch)
            raise ValueError(
                f"model_parallel={config['model_parallel']} requested but no "
                f"multi-device mesh is available (devices visible: "
                f"{jax.device_count()}, data_parallel={config.get('data_parallel')!r})"
            )

        self.output_name = run_name(config)
        # runtime-injected (like nbr_features etc): lets callers that hold
        # the config dict locate this run's metrics/pure artifacts
        config["_output_name"] = self.output_name
        self.logger = initialize_logger(config, self.output_name)
        self.metrics = MetricsWriter(config, self.output_name)

        if self.mesh is not None:
            self.logger.info(
                f"   data-parallel over {self.mesh.shape['data']} devices "
                f"(mesh {dict(self.mesh.shape)}), batch_size "
                f"{config['batch_size']}"
            )
        t0 = time.perf_counter()
        self._flip_labels()
        self.logger.info(
            f"   setup: load_network {self._t_load:.1f}s, "
            f"noise+device placement {time.perf_counter() - t0:.1f}s"
        )
        # noise-matrix snapshot for offline inspection (reference
        # src/pipeline_contrast.py:56 saves ../out_nmat/<name>.npy)
        nmat_dir = os.path.join(config.get("out_dir", "out"), "nmat")
        os.makedirs(nmat_dir, exist_ok=True)
        np.save(os.path.join(nmat_dir, f"{self.output_name}.npy"), self.noise_mat)

        self.fanouts = tuple(int(f) for f in config["nbr_neighbors"])[
            : config["num_layers"]
        ]
        while len(self.fanouts) < config["num_layers"]:
            self.fanouts = self.fanouts + (self.fanouts[-1],)

        self.rate_schedule = forget_rate_schedule(
            config["max_epochs"],
            float(config["noise_rate"]),
            int(config["ct_tk"]),
            float(config["ct_tau"]),
            ct_exp=float(config.get("ct_exp", 1)),
            warmup=int(config.get("warmup", 0)) or None,
            variant=self.schedule_variant,
        )

        self.optimizer = self._make_optimizer(config)
        self._full_edge_index_cache = None  # lazy: ~500 MB H2D for products
        self._leaf_agg_cache = {}  # exact-leaf aggregate tables by kind
        self._host_indptr_cache = None
        self.key = jax.random.key(int(config.get("seed", 0)))

    @property
    def _full_edge_index(self):
        if self._full_edge_index_cache is None:
            self._full_edge_index_cache = self._put(
                jnp.asarray(self.graph.edge_index)
            )
        return self._full_edge_index_cache

    def _put(self, tree):
        """Replicate a pytree over the mesh (no-op single-device)."""
        if self.mesh is None:
            return tree
        from ..parallel.mesh import replicated

        return jax.device_put(tree, replicated(self.mesh))

    @property
    def _tp(self) -> int:
        return self.mesh.shape["model"] if self.mesh is not None else 1

    def _put_state(self, state):
        """Place a train state (or tuple of them) on the mesh: with
        ``model_parallel > 1`` weight-matrix hidden columns (and their
        mirrored Adam moments) shard over the ``model`` axis per
        parallel.mesh.param_sharding; otherwise replicate. This is the
        product-path TP wiring — the config key applies to every pipeline
        state, not just __graft_entry__."""
        if self.mesh is None:
            return state
        if self._tp > 1:
            from ..parallel.mesh import param_sharding

            return jax.device_put(state, param_sharding(self.mesh, state))
        return self._put(state)

    def _replicate_params(self, params):
        """Eval-side gather of TP-sharded params: the halo/full-graph eval
        paths expect replicated weights (their shard_maps partition nodes,
        not the hidden dim); an all-gather of these small models is cheap."""
        if self._tp > 1:
            from ..parallel.mesh import replicated

            return jax.device_put(params, replicated(self.mesh))
        return params

    # -------------------------------------------------------------- helpers

    @staticmethod
    def _make_optimizer(config: dict):
        """Reference NGNN.init_optimizer parity (src/models/model.py:66-81):
        'adam' = plain Adam (the reference comments out weight decay);
        'single_adam' = Adam with weight decay; 'double_adam' (joint params
        under one optimizer) is expressed by passing param TUPLES to any
        optimizer, as the TE/H pipelines do."""
        lr = float(config["learning_rate"])
        kind = config.get("optimizer", "adam")
        wd = float(config.get("weight_decay", 0.0))
        if kind == "single_adam" or (kind == "adam" and wd > 0):
            return optax.adamw(lr, weight_decay=wd)
        return optax.adam(lr)

    def _flip_labels(self, run: int | None = None):
        """Inject label noise. With ``run`` given, the realization is a pure
        function of (seed, run) so the nalgo and baseline branches of a
        multi-run A/B see the SAME per-run noise draws (paired comparison).
        The reference re-flips per run only in the nalgo branch
        (src/pipeline.py:207-208) and lets every baseline run reuse the last
        nalgo draw — unpaired, and rand_pair realizations differ wildly in
        difficulty (measured flagship spread: best-acc 0.23..0.65 across
        draws), so pairing is the statistically meaningful upgrade."""
        g = self.graph
        rng = (
            np.random.default_rng((int(self.config.get("seed", 0)), run))
            if run is not None else self.rng
        )
        yhn, self.noise_mat = flip_label(
            g.y, g.num_classes, self.config["noise_type"],
            float(self.config["noise_rate"]), rng,
        )
        self.graph = g.replace(yhn=yhn)
        self.clean = noise_or_not(g.y, yhn)
        x_dtype = (
            jnp.bfloat16
            if self.config.get("compute_dtype") == "bfloat16"
            else jnp.float32
        )
        self.data = S.GraphData(
            x=jnp.asarray(g.x, dtype=x_dtype),
            y=jnp.asarray(g.y),
            yhn=jnp.asarray(yhn),
            clean=jnp.asarray(self.clean),
            csr=g.csr(),
        )
        if self.mesh is not None:
            # replicate across the mesh so the DP epoch drivers (and any
            # eager probe math) see mesh-committed inputs
            from ..parallel.mesh import replicated

            self.data = jax.device_put(self.data, replicated(self.mesh))

    def next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    # --------------------------------------------------- checkpoint/resume
    # Shared by every long-running loop (CO/TE/TES/CTP/H and the CT
    # finetune): the bundle is states + device PRNG key, and the metadata
    # carries the HOST rng state too, so the resumed process replays the
    # exact batch permutations — kill-and-resume reproduces the
    # uninterrupted run's per-epoch metrics (tests/test_checkpoint.py).

    def _ckpt_meta(self, run: int, epoch: int, attempt: int = 0) -> dict:
        # `attempt` = reinit-retry counter: a checkpoint saved mid-attempt
        # must restore it, or a crash during a retry would re-enter with
        # attempt=0 and allow more re-inits than reinit_retries
        return {"run": run, "epoch": epoch, "attempt": attempt,
                "rng_state": self.rng.bit_generator.state}

    def _ckpt_setup(self, tag: str):
        """(ckpt_every, ckpt_path) for a loop family. ckpt_path override:
        the derived name embeds the date (reference run-name parity), so
        cross-day resume needs a stable user path."""
        c = self.config
        path = c.get("ckpt_path") or (
            f"{c['out_dir']}/models/{self.output_name}_{tag}_ckpt"
        )
        return int(c.get("ckpt_every", 0)), path

    def _try_resume(self, ckpt_path: str, tmpl_states):
        """Load (states, key) + positions if `resume` is set and the bundle
        exists; restores the host RNG stream. Returns
        (states_or_None, start_run, start_epoch, meta)."""
        if not (self.config.get("resume")
                and os.path.exists(ckpt_path + ".npz")):
            return None, 0, 0, {}
        (states, self.key), meta = load_checkpoint(
            ckpt_path, (tmpl_states, self.key)
        )
        st = meta.get("rng_state")
        if st:
            self.rng.bit_generator.state = st
        run, epoch = int(meta["run"]), int(meta["epoch"]) + 1
        self.logger.info(f"   Resumed from {ckpt_path} at run {run} epoch {epoch}")
        return self._put_state(states), run, epoch, meta

    # ----------------------------------------------------- exact-leaf mode

    def exact_leaf_on(self, spec) -> bool:
        from ..ops.leaf_agg import leaf_agg_eligible

        return bool(self.config.get("exact_leaf")) and leaf_agg_eligible(
            spec, self.fanouts
        )

    def data_for(self, spec):
        """GraphData for a spec: attaches the precomputed exact-leaf
        aggregate table (ops/leaf_agg.py) when enabled and eligible. The
        table depends only on (x, csr, aggregation kind), so it is cached
        across runs/label re-flips."""
        if not self.exact_leaf_on(spec):
            return self.data
        kind = "sum" if spec.module == "gcn" else spec.aggr
        return self.data._replace(leaf_agg=self._fused_table(kind))

    def _host_indptr(self) -> np.ndarray:
        if self._host_indptr_cache is None:
            indptr = np.zeros(self.graph.num_nodes + 1, np.int64)
            np.cumsum(
                np.bincount(self.graph.edge_index[1],
                            minlength=self.graph.num_nodes),
                out=indptr[1:],
            )
            self._host_indptr_cache = indptr
        return self._host_indptr_cache

    def epoch_seed_matrix(self, idx: np.ndarray, batch_size: int):
        """All of an epoch's padded seed batches as [nsteps, B] arrays, for
        the scanning whole-epoch drivers."""
        idx = self.rng.permutation(idx)
        n = idx.shape[0]
        nsteps = max(-(-n // batch_size), 1)
        pad = nsteps * batch_size - n
        seeds = np.concatenate([idx, np.zeros(pad, idx.dtype)])
        mask = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
        out = (
            jnp.asarray(seeds.reshape(nsteps, batch_size)),
            jnp.asarray(mask.reshape(nsteps, batch_size)),
        )
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sh = NamedSharding(self.mesh, P(None, "data"))
            out = tuple(jax.device_put(a, sh) for a in out)
        return out

    def epoch_batches(self, idx: np.ndarray, batch_size: int, shuffle=True):
        """Padded seed batches covering ``idx`` once (replaces NeighborLoader
        iteration; sampling itself happens on device inside the step)."""
        if shuffle:
            idx = self.rng.permutation(idx)
        n = idx.shape[0]
        for lo in range(0, n, batch_size):
            chunk = idx[lo : lo + batch_size]
            pad = batch_size - chunk.shape[0]
            seeds = np.concatenate([chunk, np.zeros(pad, chunk.dtype)])
            mask = np.concatenate([np.ones(chunk.shape[0], bool), np.zeros(pad, bool)])
            yield self._put(S.Batch(jnp.asarray(seeds), jnp.asarray(mask)))

    def _split_accuracy_fn(self):
        """Device-side split accuracy: ONE tiny [3] fetch per evaluation.

        ``evaluate_splits`` pulls the whole [N] argmax to the host — ~10 MB
        per eval on products, through a ~10-20 MB/s dev-tunnel link, twice
        per epoch. Computing masked correct-counts on device reduces the
        round-trip to 12 bytes."""
        parts = list(self.split_idx)
        n = self.graph.num_nodes
        masks = self._put(jnp.stack([
            jnp.zeros(n, bool).at[jnp.asarray(self.split_idx[p])].set(True)
            for p in parts
        ]))
        sizes = [max(int(self.split_idx[p].shape[0]), 1) for p in parts]

        @jax.jit
        def _counts(logits, y, masks):
            ok = jnp.argmax(logits, axis=-1) == y
            return jnp.sum(ok[None, :] & masks, axis=1)

        def accs(logits):
            vals = np.asarray(_counts(logits, self.data.y, masks))
            return {p: float(v) / c for p, v, c in zip(parts, vals, sizes)}

        return accs

    def _fused_table(self, kind: str):
        """The [N, 2F] concat([x, agg(x)], 1) table for an aggregation kind,
        built once per pipeline (x and the graph never change across runs)."""
        if kind not in self._leaf_agg_cache:
            from ..ops.leaf_agg import fused_leaf_table

            self._leaf_agg_cache[kind] = fused_leaf_table(
                self.data.x, self.data.csr,
                indptr_np=self._host_indptr(), aggr=kind,
            )
            self.logger.info(f"   precomputed '{kind}' x||agg(x) table")
        return self._leaf_agg_cache[kind]

    _STACK_MODULES = ("sage", "gcn", "sageH", "sageFC", "sagePL")

    def _make_infer(self, spec):
        """Full-graph inference operator for conv-stack modules; picks the
        Pallas SpMM backend for many-edge graphs on TPU (eval/inference.py)."""
        from ..eval.inference import FullGraphInference

        # layer 1 aggregates the run-constant raw features — reuse the
        # exact-leaf table (or build it) so eval skips one full SpMM.
        # Under input BN the first layer aggregates bn1(x), which changes
        # every step — no constant table exists, so skip it.
        if spec.use_bn:
            x_agg = None
        else:
            kind = "sum" if spec.module == "gcn" else spec.aggr
            f = self.data.x.shape[-1]
            x_agg = self._fused_table(kind)[:, f:]
        return FullGraphInference(
            spec, None, self.graph.num_nodes,
            csr=self.data.csr, indptr_np=self._host_indptr(),
            x_agg=x_agg,
        )

    def _halo_ops(self, spec):
        """(infer, infer_pair, x_sharded) for node-sharded halo-exchange
        full-graph eval over the mesh (parallel/halo.py). The partition pack
        and the sharded feature matrix are per-graph, cached across
        runs/specs."""
        from ..parallel.halo import make_halo_inference, shard_features

        part = getattr(self, "_halo_part", None)
        new = part is None
        part, infer, infer_pair = make_halo_inference(
            self.mesh, spec, None if part is not None else self.graph.edge_index,
            self.graph.num_nodes, part=part,
            log=self.logger.info if new else None,
        )
        if new:
            self._halo_part = part
            self._halo_x = shard_features(
                self.mesh, np.asarray(self.data.x), part
            )
        return infer, infer_pair, self._halo_x

    def _fullgraph_on(self, spec) -> bool:
        """`full_graph: true` trains on the EXACT every-edge aggregation,
        node-sharded with halo exchange (parallel/fullbatch.py) — the scaling
        upgrade past the reference's fanout-sampled `batch_size_full` mode
        (src/pipeline_s.py:62-63 still samples neighborhoods). Needs a mesh
        and a plain conv stack."""
        want = bool(self.config.get("full_graph"))
        ok = (
            self.mesh is not None
            and self._tp == 1  # fullbatch shard_map partitions nodes over
            # `data` with replicated params; TP-sharded states don't compose
            and spec.module in ("sage", "gcn")
            and not spec.use_bn
            and spec.aggr != "max"
        )
        if want and not ok:
            self.logger.info(
                "   full_graph requested but needs a multi-device mesh "
                "(model_parallel=1) and a plain sage/gcn stack - falling "
                "back to sampled-tree training"
            )
        return want and ok

    def _halo_eval_ok(self, spec) -> bool:
        # batch-stat BN needs pad-row-aware statistics the halo stack does
        # not carry; GAT is dense-attention (no SpMM). Both fall back to the
        # replicated full-graph forward under the mesh.
        return (
            self.mesh is not None
            and spec.module in self._STACK_MODULES
            and not spec.use_bn
            and spec.aggr != "max"
        )

    def make_eval(self, spec):
        accs = self._split_accuracy_fn()
        n = self.graph.num_nodes
        rp = self._replicate_params  # TP-sharded params gather before eval
        if self._halo_eval_ok(spec):
            infer, _, xs = self._halo_ops(spec)

            def evaluate(params):
                return accs(infer(rp(params), xs)[:n])

            return evaluate
        if self.mesh is None and spec.module in self._STACK_MODULES:
            infer = self._make_infer(spec)

            def evaluate(params):
                return accs(infer(params, self.data.x))

            return evaluate

        # replicated fallback: gat / use_bn / aggr=max under a mesh, and any
        # non-stack module single-device
        eval_fn = S.make_eval_fn(spec)

        def evaluate(params):
            return accs(eval_fn(rp(params), self.data.x, self._full_edge_index))

        return evaluate

    def make_eval_pair(self, spec):
        """Fused dual-model evaluation: co-teaching always evaluates BOTH
        nets on the same graph, and the SpMM gather is per-index bound — one
        [N, 2H] pass serves both models for the cost of one (docs/DESIGN.md
        gather-engine findings). Under a mesh the same fusion rides the
        halo-exchange sharded sweep (one boundary exchange for two nets)."""
        accs = self._split_accuracy_fn()
        n = self.graph.num_nodes
        rp = self._replicate_params  # TP-sharded params gather before eval
        if self._halo_eval_ok(spec):
            _, infer_pair, xs = self._halo_ops(spec)

            def evaluate2(p1, p2):
                l1, l2 = infer_pair(rp(p1), rp(p2), xs)
                return accs(l1[:n]), accs(l2[:n])

            return evaluate2
        if self.mesh is None and spec.module in self._STACK_MODULES:
            infer = self._make_infer(spec)

            def evaluate2(p1, p2):
                l1, l2 = infer.pair(p1, p2, self.data.x)
                return accs(l1), accs(l2)

            return evaluate2

        eval_fn = S.make_eval_fn(spec)

        def evaluate2(p1, p2):
            return (
                accs(eval_fn(rp(p1), self.data.x, self._full_edge_index)),
                accs(eval_fn(rp(p2), self.data.x, self._full_edge_index)),
            )

        return evaluate2

    def spec_for(self, module: str | None = None) -> nets.NetSpec:
        c = self.config
        return nets.NetSpec(
            module=module or c["module"],
            in_size=c["nbr_features"],
            hidden_size=int(c["hidden_size"]),
            out_size=c["nbr_classes"],
            num_layers=int(c["num_layers"]),
            dropout=float(c["dropout"]),
            use_bn=bool(c.get("use_bn", False)),
            nbr_nodes=c["nbr_nodes"],
            compute_dtype=str(c.get("compute_dtype", "float32")),
            aggr=str(c.get("aggr", "mean")),
        )

    @staticmethod
    def _acc_metrics(agg, m):
        """Accumulate step metrics ON DEVICE (a host float() per step costs a
        device round-trip — ~1 s/step through the dev tunnel)."""
        if agg is None:
            return dict(m)
        return {k: agg[k] + m[k] for k in m}

    @staticmethod
    def _fetch_metrics(agg, nb):
        """One stacked device->host transfer for the whole metrics dict
        (per-scalar float() costs a full tunnel round-trip each)."""
        if not agg:
            return {}
        keys = list(agg)
        vals = np.asarray(jnp.stack([agg[k] for k in keys]))
        return {k: float(v) / nb for k, v in zip(keys, vals)}

    def _report_runs(self, label: str, best_accs: list[float],
                     test_hists: list[list[float]] | None = None,
                     reinits: list[int] | None = None) -> RunSummary:
        """Per-branch multi-run summary. Beyond the reference's best-epoch
        mean±std (src/pipeline.py:267-271) every summary also records FINAL
        accuracy (last epoch) and the last-10-epoch mean — the robust
        algorithms' advantage concentrates late in training, and a claim
        about final accuracy must be a table cell, not prose."""
        mean, std = float(np.mean(best_accs)), float(np.std(best_accs, ddof=1) if len(best_accs) > 1 else 0.0)
        extra: dict = {"runs": [round(float(b), 4) for b in best_accs]}
        if test_hists:
            finals = [float(h[-1]) for h in test_hists if h]
            last10 = [float(np.mean(h[-10:])) for h in test_hists if h]
            extra.update(
                final_mean=float(np.mean(finals)),
                final_std=float(np.std(finals, ddof=1) if len(finals) > 1 else 0.0),
                last10_mean=float(np.mean(last10)),
                last10_std=float(np.std(last10, ddof=1) if len(last10) > 1 else 0.0),
                final_accs=[round(f, 4) for f in finals],
                last10_accs=[round(f, 4) for f in last10],
            )
        if reinits and any(reinits):
            # auditability vs the non-retry protocol (PARITY deviation 8):
            # flag which runs consumed a degenerate-selection re-init
            extra["reinit_attempts"] = list(reinits)
        line = f"   RUN {label} mean {mean:.3f} +- {std:.3f} std"
        if test_hists:
            line += (f" | final {extra['final_mean']:.3f} +- "
                     f"{extra['final_std']:.3f} | last10 "
                     f"{extra['last10_mean']:.3f}")
        if reinits and any(reinits):
            line += f" | reinit retries per run {reinits}"
        self.logger.info(line)
        self.metrics.write(event=f"summary_{label}", mean=mean, std=std,
                           **extra)
        return RunSummary(mean, std, extra)

    def _degen_retry(self, run: int, attempt: int, run_pure,
                     best: float, resumed_partial: bool,
                     run_loss=None, run_fit=None) -> bool:
        """Shared degenerate-selection retry decision for every
        co-teaching-family loop (CO/S/TE/TES/CTP/H). True = re-enter the
        run's epoch loop with fresh inits (the noise realization stays
        FIXED, so paired A/Bs stay paired). Measured failure mode
        (docs/RESULTS.md round 3): on a hard pair-noise draw with an unlucky
        init the mutual small-loss feedback never engages — purity pins at
        the clean fraction and co-teaching degrades to CE on a random
        (1-forget_rate) subsample; detectable online precisely because
        purity IS the injected-noise oracle metric, and re-init recovers it
        (tools/probe_hard_draw.py: 0.220 -> 0.768)."""
        if resumed_partial:
            # a run resumed mid-way has a truncated purity tail — never
            # judge it degenerate (and never burn a retry) on partial data
            return False
        retries = int(self.config.get("reinit_retries", 0))
        clean_frac = float(np.mean(self.clean))
        degen = selection_degenerate(run_pure, clean_frac)
        # second trigger (round 5): optimization collapse with HEALTHY
        # selection — loss never descends, fit to the selected targets
        # stays at chance (optimization_collapsed above)
        opt_fail = (not degen and run_loss is not None
                    and optimization_collapsed(run_loss, run_fit or [],
                                               clean_frac))
        if not (degen or opt_fail):
            return False
        mode = ("selection purity flat at the clean fraction "
                f"({clean_frac:.3f})" if degen
                else "training loss never descended (optimization collapse, "
                     "selection healthy)")
        if attempt < retries:
            self.logger.warning(
                f"   RUN {run + 1}: {mode} - re-initializing and "
                f"retraining (attempt {attempt + 1}/{retries})"
            )
            # the discarded attempt's best acc is recorded so the flagship
            # numbers stay auditable against the non-retry protocol
            self.metrics.write(event="reinit_degenerate", run=run,
                               attempt=attempt + 1, discarded_best=best,
                               mode="selection" if degen else "optimization")
            return True
        self.logger.warning(
            f"   RUN {run + 1}: {mode} - no signal on this noise draw/init; "
            f"consider a longer epoch budget or reinit_retries > 0 "
            f"(docs/RESULTS.md)"
        )
        return False

    def _save_pure(self, pure_hist: list[list[tuple]]):
        """Pure-ratio curve artifact (the reference persists the tensor,
        src/pipeline.py:273-275). Runs resumed mid-way have SHORT histories
        (missing their pre-resume epochs): left-pad each run with NaN to the
        longest run's length so the artifact survives ragged histories
        instead of vanishing exactly on resumed runs."""
        if not pure_hist:
            return
        pure_dir = os.path.join(self.config["out_dir"], "pure")
        os.makedirs(pure_dir, exist_ok=True)
        max_e = max(len(p) for p in pure_hist)
        arr = np.full((len(pure_hist), max_e, 2), np.nan, np.float32)
        for i, p in enumerate(pure_hist):
            if p:
                arr[i, max_e - len(p):] = np.asarray(p, np.float32)
        np.save(os.path.join(pure_dir, f"{self.output_name}.npy"), arr)

    def _loop_baseline(self):
        """Plain CE / backward-correction baseline on the module_compare net
        (reference train(), src/pipeline.py:144-173 and
        src/pipeline_test.py:173-204 — shared by the CO/S and TE/TES A/B
        comparisons)."""
        c = self.config
        spec = self.spec_for(c.get("module_compare", c["module"]))
        fullgraph = self._fullgraph_on(spec)
        if fullgraph:
            from ..parallel import fullbatch as FB

            _, _, fg_x = self._halo_ops(spec)
            fg_epoch = FB.make_fullgraph_baseline_epoch(
                self.mesh, spec, self.optimizer,
                compare_loss=c["compare_loss"],
            )
            fg_seeds = self._put(jnp.asarray(self.split_idx["train"]))
            fg_mask = self._put(jnp.ones(fg_seeds.shape[0], bool))
        epoch_fn = S.make_baseline_epoch(
            spec, self.optimizer, self.fanouts, compare_loss=c["compare_loss"],
            exact_leaf=self.exact_leaf_on(spec), mesh=self.mesh,
        )
        evaluate = self.make_eval(spec)
        train_idx = self.split_idx["train"]
        bs = int(c["batch_size"])
        best_accs, test_hists = [], []
        for run in range(int(c["num_runs"])):
            if self.reflip_per_run:
                # same (seed, run) realization as nalgo run `run`: a PAIRED
                # A/B. (The reference re-flips only in the nalgo branch,
                # src/pipeline.py:207-208 — its baseline runs all reuse the
                # last nalgo draw, so its comparison is unpaired.)
                self._flip_labels(run)
            noise_mat = self._put(jnp.asarray(self.noise_mat, jnp.float32))
            s = self._put_state(S.init_state(self.next_key(), spec, self.optimizer))
            best, hist = 0.0, []
            for epoch in range(int(c["max_epochs"])):
                if fullgraph:
                    nb = 1
                    s, agg = fg_epoch(
                        s, self._halo_part, fg_x, self.data.y, self.data.yhn,
                        fg_seeds, fg_mask, self.next_key(), noise_mat,
                    )
                else:
                    seeds, masks = self.epoch_seed_matrix(train_idx, bs)
                    nb = seeds.shape[0]
                    s, agg = epoch_fn(s, self.data_for(spec), seeds, masks,
                                      self.next_key(), noise_mat)
                rec_raw = self._fetch_metrics(agg, nb)
                acc = evaluate(s.params)
                best = max(best, acc["test"])
                hist.append(acc["test"])
                rec = dict(
                    loss=rec_raw["loss"],
                    train_acc=rec_raw["correct"] * nb / train_idx.shape[0],
                    val_acc=acc["valid"], test_acc=acc["test"],
                )
                if "agree" in rec_raw:
                    # memorization probes (counts summed over the epoch;
                    # _fetch_metrics divided by nb, which cancels in ratios)
                    rec["train_acc_noisy"] = (
                        rec_raw["agree"] * nb / train_idx.shape[0])
                    rec["noisy_fit"] = (
                        rec_raw["noisyfit"] / max(rec_raw["corrupt_n"], 1e-9))
                self.metrics.write(event="epoch_baseline", run=run,
                                   epoch=epoch, **rec)
                if c["epoch_logger"] and not ((epoch + 1) % 10):
                    self.logger.info(
                        f"   Train epoch {epoch + 1}/{c['max_epochs']} --- "
                        f"acc t: {acc['train']:.3f} v: {acc['valid']:.3f} tst: {acc['test']:.3f}"
                    )
            self.logger.info(f"   RUN {run + 1} - best baseline test acc: {best:.3f}")
            best_accs.append(best)
            test_hists.append(hist)
        return self._report_runs("baseline", best_accs, test_hists)


class PipelineCO(BasePipeline):
    """Dual-network co-teaching + CE/backward baseline, multi-run
    (reference PipelineCO/PipelineS loop, src/pipeline.py:200-313)."""

    schedule_variant = "ogb"
    reflip_per_run = True

    def loop(self):
        c = self.config
        if not c.get("do_train", True):
            return self._load_and_eval()
        self.logger.info(f"{c['num_runs']} RUNS")
        results = {}
        if c["train_type"] in ("nalgo", "both"):
            results["nalgo"] = self._loop_ct()
        if c["train_type"] in ("baseline", "both"):
            results["baseline"] = self._loop_baseline()
        if c.get("do_plot"):
            from ..utils.plotting import plot_metrics_file

            out = plot_metrics_file(self.metrics.path)
            if out:
                self.logger.info(f"   plot saved to {out}")
        return results

    def _load_and_eval(self):
        """do_train: false — load a checkpoint and evaluate (reference
        src/pipeline_s.py:305-313, with config-derived paths instead of the
        reference's hard-coded filenames)."""
        c = self.config
        spec = self.spec_for()
        path = c.get("load_model_path") or c.get("ckpt_path") or (
            f"{c['out_dir']}/models/{self.output_name}_ct_ckpt"
        )
        tmpl_s = S.init_state(jax.random.key(0), spec, self.optimizer)
        (s1, s2, _), meta = load_checkpoint(path, (tmpl_s, tmpl_s, self.key))
        s1, s2 = self._put(s1), self._put(s2)
        evaluate = self.make_eval(spec)
        acc1, acc2 = evaluate(s1.params), evaluate(s2.params)
        self.logger.info(
            f"   Load eval v1: {acc1['valid']:.3f} v2: {acc2['valid']:.3f}"
        )
        return {"loaded": (acc1, acc2), "meta": meta}

    def _loop_ct(self):
        c = self.config
        spec = self.spec_for()
        algo = c["algo_type"] if c["algo_type"] in ("codi",) else "coteaching"
        fullgraph = self._fullgraph_on(spec)
        if fullgraph:
            from ..parallel import fullbatch as FB

            _, _, fg_x = self._halo_ops(spec)  # builds/caches the partition
            fg_epoch = FB.make_fullgraph_ct_epoch(
                self.mesh, spec, self.optimizer, algo=algo,
                co_lambda=float(c["co_lambda"]),
            )
            fg_seeds = self._put(jnp.asarray(self.split_idx["train"]))
            fg_mask = self._put(jnp.ones(fg_seeds.shape[0], bool))
        epoch_fn = S.make_ct_epoch(
            spec, self.optimizer, self.fanouts,
            algo=algo,
            co_lambda=float(c["co_lambda"]),
            exact_leaf=self.exact_leaf_on(spec),
            mesh=self.mesh,
        )
        evaluate_pair = self.make_eval_pair(spec)
        train_idx = self.split_idx["train"]
        bs = int(c["batch_size"])
        edges_per_batch = (
            2 * spec.num_layers * self.graph.num_edges  # both nets, exact
            if fullgraph else tree_edges_per_batch(bs, self.fanouts)
        )
        ckpt_every, ckpt_path = self._ckpt_setup("ct")
        best_accs, test_hists, reinits = [], [], []
        pure_hist = []  # [run][epoch] -> (pure_ratio_1, pure_ratio_2)
        tmpl_s = S.init_state(jax.random.key(0), spec, self.optimizer)
        states, start_run, start_epoch, meta = self._try_resume(
            ckpt_path, (tmpl_s, tmpl_s)
        )
        s1, s2 = states if states is not None else (None, None)
        for run in range(start_run, int(c["num_runs"])):
            if self.reflip_per_run:
                self._flip_labels(run)  # (seed, run)-keyed: pairs the A/B
            # retry shell (shared decision: _degen_retry): when the run ends
            # selection-degenerate and reinit_retries allows, re-enter the
            # epoch loop with freshly initialized nets
            attempt = int(meta.get("attempt", 0)) if run == start_run else 0
            while True:
              resumed_partial = start_epoch > 0
              if s1 is None:
                s1 = self._put_state(S.init_state(self.next_key(), spec, self.optimizer))
                s2 = self._put_state(S.init_state(self.next_key(), spec, self.optimizer))
              best1 = best2 = 0.0
              run_pure, run_test = [], []
              run_loss, run_fit = [], []  # optimization-collapse signals
              for epoch in range(start_epoch, int(c["max_epochs"])):
                fr = jnp.float32(self.rate_schedule[epoch])
                t_train = time.perf_counter()
                if fullgraph:
                    nb = 1
                    s1, s2, agg = fg_epoch(
                        s1, s2, self._halo_part, fg_x, self.data.y,
                        self.data.yhn, self.data.clean, fg_seeds, fg_mask,
                        self.next_key(), fr,
                    )
                else:
                    seeds, masks = self.epoch_seed_matrix(train_idx, bs)
                    nb = seeds.shape[0]
                    s1, s2, agg = epoch_fn(
                        s1, s2, self.data_for(spec), seeds, masks,
                        self.next_key(), fr,
                    )
                rec_raw = self._fetch_metrics(agg, nb)  # single device sync
                t_train = time.perf_counter() - t_train
                acc1, acc2 = evaluate_pair(s1.params, s2.params)
                best1, best2 = max(best1, acc1["test"]), max(best2, acc2["test"])
                run_test.append(max(acc1["test"], acc2["test"]))
                rec = dict(rec_raw)
                rec["train_acc_1"] = rec_raw["correct_1"] * nb / train_idx.shape[0]
                rec["train_acc_2"] = rec_raw["correct_2"] * nb / train_idx.shape[0]
                for i in ("1", "2"):  # memorization probes (see ct_epoch_fn)
                    if f"agree_{i}" in rec_raw:
                        rec[f"train_acc_noisy_{i}"] = (
                            rec_raw[f"agree_{i}"] * nb / train_idx.shape[0])
                        rec[f"noisy_fit_{i}"] = (
                            rec_raw[f"noisyfit_{i}"]
                            / max(rec_raw.get("corrupt_n", 0.0), 1e-9))
                        rec.pop(f"agree_{i}", None)
                        rec.pop(f"noisyfit_{i}", None)
                rec.pop("corrupt_n", None)
                run_pure.append((rec_raw.get("pure_ratio_1", 0.0),
                                 rec_raw.get("pure_ratio_2", 0.0)))
                run_loss.append(min(rec_raw.get("loss_1", 0.0),
                                    rec_raw.get("loss_2", 0.0)))
                if "train_acc_noisy_1" in rec:
                    run_fit.append(max(rec["train_acc_noisy_1"],
                                       rec.get("train_acc_noisy_2", 0.0)))
                self.metrics.write(
                    event="epoch_ct", run=run, epoch=epoch, **rec,
                    val_acc_1=acc1["valid"], val_acc_2=acc2["valid"],
                    test_acc_1=acc1["test"], test_acc_2=acc2["test"],
                    epoch_train_s=t_train,
                    edges_per_s=nb * edges_per_batch / max(t_train, 1e-9),
                )
                if ckpt_every and (epoch + 1) % ckpt_every == 0:
                    save_checkpoint(ckpt_path, ((s1, s2), self.key),
                                    self._ckpt_meta(run, epoch, attempt))
                if c["epoch_logger"] and not ((epoch + 1) % 10):
                    self.logger.info(
                        f"   Train epoch {epoch + 1}/{c['max_epochs']} --- "
                        f"acc t1: {acc1['train']:.3f} t2: {acc2['train']:.3f} "
                        f"v1: {acc1['valid']:.3f} v2: {acc2['valid']:.3f} "
                        f"tst1: {acc1['test']:.3f} tst2: {acc2['test']:.3f}"
                    )
              self.logger.info(
                f"   RUN {run + 1} - best nalgo test acc1: {best1:.3f}   acc2: {best2:.3f}"
              )
              s1 = s2 = None
              start_epoch = 0
              if self._degen_retry(run, attempt, run_pure,
                                   max(best1, best2), resumed_partial,
                                   run_loss=run_loss, run_fit=run_fit):
                attempt += 1
                continue
              break
            best_accs.append(max(best1, best2))
            test_hists.append(run_test)
            reinits.append(attempt)
            pure_hist.append(run_pure)
        self._save_pure(pure_hist)
        return self._report_runs("nalgo", best_accs, test_hists, reinits)

class PipelineS(PipelineCO):
    """Small-graph variant: 'small' forget schedule, labels flipped once
    (reference src/pipeline_s.py:52-53, loop at 187)."""

    schedule_variant = "small"
    reflip_per_run = False


class PipelineTE(BasePipeline):
    """sagePL co-teaching + topk-rewire contrastive after ct_tk epochs,
    joint optimizer (reference PipelineTE, src/pipeline_test.py)."""

    schedule_variant = "ogb"

    def loop(self):
        """train_type dispatch (reference src/pipeline_test.py:235,290):
        'nalgo' / 'baseline' return that branch's (mean, std); 'both' returns
        a dict with both."""
        c = self.config
        results = {}
        if c["train_type"] in ("nalgo", "both"):
            results["nalgo"] = self._loop_te()
        if c["train_type"] in ("baseline", "both"):
            results["baseline"] = self._loop_baseline()
        return results if len(results) > 1 else next(iter(results.values()))

    def _loop_te(self):
        c = self.config
        spec = self.spec_for()  # module: sagePL
        algo = "codi" if c["algo_type"] == "codi" else "coteaching"
        common = dict(
            algo=algo, co_lambda=float(c["co_lambda"]),
            spl_cont_beta=float(c["spl_cont_beta"]),
            spl_rewire_rate=float(c["spl_rewire_rate"]),
            spl_noise_rate_pos=float(c["spl_noise_rate_pos"]),
            spl_noise_rate_neg=float(c["spl_noise_rate_neg"]),
        )
        epoch_plain = S.make_te_epoch(spec, self.optimizer, self.fanouts,
                                      use_contrast=False, mesh=self.mesh,
                                      **common)
        epoch_cont = S.make_te_epoch(spec, self.optimizer, self.fanouts,
                                     use_contrast=True, mesh=self.mesh,
                                     **common)
        evaluate_pair = self.make_eval_pair(spec)
        train_idx = self.split_idx["train"]
        bs = int(c["batch_size"])
        ckpt_every, ckpt_path = self._ckpt_setup("te")
        tp = (nets.init_params(jax.random.key(0), spec),) * 2
        s, start_run, start_epoch, meta = self._try_resume(
            ckpt_path, S.TrainState(tp, self.optimizer.init(tp))
        )
        best_accs, test_hists, reinits = [], [], []
        for run in range(start_run, int(c["num_runs"])):
            if self.reflip_per_run:
                # (seed, run)-keyed draw: the SAME realization _loop_baseline
                # uses for run `run`, making train_type='both' a paired A/B
                # (reference re-flip semantics src/pipeline.py:207-208 +
                # docs/PARITY.md deviation 7)
                self._flip_labels(run)
            attempt = int(meta.get("attempt", 0)) if run == start_run else 0
            while True:
              resumed_partial = start_epoch > 0
              if s is None:
                p1 = nets.init_params(self.next_key(), spec)
                p2 = nets.init_params(self.next_key(), spec)
                s = self._put_state(
                    S.TrainState((p1, p2), self.optimizer.init((p1, p2)))
                )
              best = 0.0
              run_pure, run_test = [], []
              for epoch in range(start_epoch, int(c["max_epochs"])):
                fr = jnp.float32(self.rate_schedule[epoch])
                epoch_fn = epoch_cont if epoch > int(c["ct_tk"]) else epoch_plain
                seeds, masks = self.epoch_seed_matrix(train_idx, bs)
                nb = seeds.shape[0]
                t_train = time.perf_counter()
                s, agg = epoch_fn(s, self.data, seeds, masks, self.next_key(), fr)
                rec = self._fetch_metrics(agg, nb)  # device sync: train done
                t_train = time.perf_counter() - t_train
                acc1, acc2 = evaluate_pair(s.params[0], s.params[1])
                best = max(best, acc1["test"], acc2["test"])
                run_test.append(max(acc1["test"], acc2["test"]))
                run_pure.append((rec.get("pure_ratio_1", 0.0),
                                 rec.get("pure_ratio_2", 0.0)))
                self.metrics.write(
                    event="epoch_te", run=run, epoch=epoch, **rec,
                    epoch_train_s=t_train,
                    val_acc_1=acc1["valid"], val_acc_2=acc2["valid"],
                    test_acc_1=acc1["test"], test_acc_2=acc2["test"],
                )
                if ckpt_every and (epoch + 1) % ckpt_every == 0:
                    save_checkpoint(ckpt_path, (s, self.key),
                                    self._ckpt_meta(run, epoch, attempt))
                if c["epoch_logger"] and not ((epoch + 1) % 5):
                    self.logger.info(
                        f"   Train epoch {epoch + 1}/{c['max_epochs']} --- "
                        f"v1: {acc1['valid']:.3f} v2: {acc2['valid']:.3f} "
                        f"tst1: {acc1['test']:.3f} tst2: {acc2['test']:.3f}"
                    )
              self.logger.info(f"   RUN {run + 1} - best test acc: {best:.3f}")
              s, start_epoch = None, 0
              if self._degen_retry(run, attempt, run_pure, best,
                                   resumed_partial):
                  attempt += 1
                  continue
              break
            best_accs.append(best)
            test_hists.append(run_test)
            reinits.append(attempt)
        return self._report_runs("te", best_accs, test_hists, reinits)


class PipelineTES(PipelineTE):
    """Small-graph TE (reference src/pipeline_test_s.py)."""

    schedule_variant = "small"
    # small-graph semantics: labels flipped ONCE at init, both branches
    # (reference src/pipeline_test_s.py mirrors src/pipeline_s.py here)
    reflip_per_run = False


class PipelineCTP(BasePipeline):
    """Co-teaching + uncertainty-weighted FixMatch consistency
    (reference PipelineCTP, src/pipeline_ctp.py)."""

    schedule_variant = "ogb"

    def loop(self):
        """train_type dispatch (reference src/pipeline_ctp.py:292-380 runs
        the plain-CE train() when 'baseline'/'both'): single branch returns
        its (mean, std); 'both' returns a dict with both (paired draws)."""
        c = self.config
        results = {}
        if c["train_type"] in ("nalgo", "both"):
            results["nalgo"] = self._loop_ctp()
        if c["train_type"] in ("baseline", "both"):
            results["baseline"] = self._loop_baseline()
        return results if len(results) > 1 else next(iter(results.values()))

    def _loop_ctp(self):
        c = self.config
        spec = self.spec_for()  # sagePL
        kw = dict(beta=1.0, spl_noise=float(c.get("spl_noise", 0.1)),
                  mesh=self.mesh)
        epoch0 = S.make_ctp_epoch(spec, self.optimizer, self.fanouts, use_cr=False, **kw)
        epoch1 = S.make_ctp_epoch(spec, self.optimizer, self.fanouts, use_cr=True, **kw)
        evaluate_pair = self.make_eval_pair(spec)
        train_idx = self.split_idx["train"]
        bs = int(c["batch_size"])
        ckpt_every, ckpt_path = self._ckpt_setup("ctp")
        tmpl_s = S.init_state(jax.random.key(0), spec, self.optimizer)
        states, start_run, start_epoch, meta = self._try_resume(
            ckpt_path, (tmpl_s, tmpl_s)
        )
        s1, s2 = states if states is not None else (None, None)
        best_accs, test_hists, reinits = [], [], []
        for run in range(start_run, int(c["num_runs"])):
            if self.reflip_per_run:
                self._flip_labels(run)  # (seed, run)-keyed: pairs the A/B
            attempt = int(meta.get("attempt", 0)) if run == start_run else 0
            while True:
              resumed_partial = start_epoch > 0
              if s1 is None:
                s1 = self._put_state(S.init_state(self.next_key(), spec, self.optimizer))
                s2 = self._put_state(S.init_state(self.next_key(), spec, self.optimizer))
              best = 0.0
              run_pure, run_test = [], []
              for epoch in range(start_epoch, int(c["max_epochs"])):
                fr = jnp.float32(self.rate_schedule[epoch])
                epoch_fn = epoch1 if epoch > 0 else epoch0
                seeds, masks = self.epoch_seed_matrix(train_idx, bs)
                nb = seeds.shape[0]
                t_train = time.perf_counter()
                s1, s2, agg = epoch_fn(
                    s1, s2, self.data, seeds, masks, self.next_key(), fr
                )
                rec = self._fetch_metrics(agg, nb)  # device sync: train done
                t_train = time.perf_counter() - t_train
                acc1, acc2 = evaluate_pair(s1.params, s2.params)
                best = max(best, acc1["test"], acc2["test"])
                run_test.append(max(acc1["test"], acc2["test"]))
                run_pure.append((rec.get("pure_ratio_1", 0.0),
                                 rec.get("pure_ratio_2", 0.0)))
                self.metrics.write(
                    event="epoch_ctp", run=run, epoch=epoch, **rec,
                    epoch_train_s=t_train,
                    val_acc_1=acc1["valid"], val_acc_2=acc2["valid"],
                    test_acc_1=acc1["test"], test_acc_2=acc2["test"],
                )
                if ckpt_every and (epoch + 1) % ckpt_every == 0:
                    save_checkpoint(ckpt_path, ((s1, s2), self.key),
                                    self._ckpt_meta(run, epoch, attempt))
                if c["epoch_logger"] and not ((epoch + 1) % 5):
                    self.logger.info(
                        f"   Train epoch {epoch + 1}/{c['max_epochs']} --- "
                        f"v1: {acc1['valid']:.3f} v2: {acc2['valid']:.3f} "
                        f"tst1: {acc1['test']:.3f} tst2: {acc2['test']:.3f}"
                    )
              self.logger.info(f"   RUN {run + 1} - best test acc: {best:.3f}")
              s1, s2, start_epoch = None, None, 0
              if self._degen_retry(run, attempt, run_pure, best,
                                   resumed_partial):
                  attempt += 1
                  continue
              break
            best_accs.append(best)
            test_hists.append(run_test)
            reinits.append(attempt)
        return self._report_runs("ctp", best_accs, test_hists, reinits)


class PipelineH(BasePipeline):
    """Co-teaching + pseudo-labeler third net on a rewired graph
    (reference PipelineH, src/pipeline_h.py)."""

    schedule_variant = "ogb"

    def loop(self):
        c = self.config
        spec = self.spec_for()  # sage or sageH
        pseudo_spec = self.spec_for("sage")
        epoch0 = S.make_h_epoch(spec, pseudo_spec, self.optimizer, self.fanouts,
                                use_pseudo=False, mesh=self.mesh)
        epoch1 = S.make_h_epoch(spec, pseudo_spec, self.optimizer, self.fanouts,
                                use_pseudo=True, mesh=self.mesh,
                                rewire_rate=float(c.get("spl_rewire_rate", 0.2)))
        evaluate_pair = self.make_eval_pair(spec)
        train_idx = self.split_idx["train"]
        bs = int(c["batch_size"])
        ckpt_every, ckpt_path = self._ckpt_setup("h")
        tj = (
            nets.init_params(jax.random.key(0), spec),
            nets.init_params(jax.random.key(0), spec),
            nets.init_params(jax.random.key(0), pseudo_spec),
        )
        s, start_run, start_epoch, meta = self._try_resume(
            ckpt_path, S.TrainState(tj, self.optimizer.init(tj))
        )
        best_accs, test_hists, reinits = [], [], []
        for run in range(start_run, int(c["num_runs"])):
            if self.reflip_per_run:
                self._flip_labels(run)  # (seed, run)-keyed: pairs the A/B
            attempt = int(meta.get("attempt", 0)) if run == start_run else 0
            while True:
              resumed_partial = start_epoch > 0
              if s is None:
                joint = (
                    nets.init_params(self.next_key(), spec),
                    nets.init_params(self.next_key(), spec),
                    nets.init_params(self.next_key(), pseudo_spec),
                )
                s = self._put_state(S.TrainState(joint, self.optimizer.init(joint)))
              best = 0.0
              run_pure, run_test = [], []
              for epoch in range(start_epoch, int(c["max_epochs"])):
                fr = jnp.float32(self.rate_schedule[epoch])
                epoch_fn = epoch1 if epoch > 0 else epoch0
                seeds, masks = self.epoch_seed_matrix(train_idx, bs)
                nb = seeds.shape[0]
                t_train = time.perf_counter()
                s, agg = epoch_fn(s, self.data, seeds, masks, self.next_key(), fr)
                rec = self._fetch_metrics(agg, nb)  # device sync: train done
                t_train = time.perf_counter() - t_train
                acc1, acc2 = evaluate_pair(s.params[0], s.params[1])
                best = max(best, acc1["test"], acc2["test"])
                run_test.append(max(acc1["test"], acc2["test"]))
                run_pure.append((rec.get("pure_ratio_1", 0.0),
                                 rec.get("pure_ratio_2", 0.0)))
                self.metrics.write(
                    event="epoch_h", run=run, epoch=epoch, **rec,
                    epoch_train_s=t_train,
                    val_acc_1=acc1["valid"], test_acc_1=acc1["test"],
                    val_acc_2=acc2["valid"], test_acc_2=acc2["test"],
                )
                if ckpt_every and (epoch + 1) % ckpt_every == 0:
                    save_checkpoint(ckpt_path, (s, self.key),
                                    self._ckpt_meta(run, epoch, attempt))
              self.logger.info(f"   RUN {run + 1} - best test acc: {best:.3f}")
              s, start_epoch = None, 0
              if self._degen_retry(run, attempt, run_pure, best,
                                   resumed_partial):
                  attempt += 1
                  continue
              break
            best_accs.append(best)
            test_hists.append(run_test)
            reinits.append(attempt)
        return self._report_runs("h", best_accs, test_hists, reinits)


class PipelineCT(BasePipeline):
    """Contrastive pretrain/finetune (reference PipelineCT,
    src/pipeline_contrast.py): co-teaching warmup with checkpointing ->
    small-loss split into clean/noisy -> semi-supervised CE on clean +
    multi-view contrastive on noisy."""

    schedule_variant = "contrast"

    def loop(self):
        from ..augment.edges import augment_edges_pos
        from ..augment.features import shuffle_pos as shuffle_pos_dev, shuffle_neg

        c = self.config
        g = self.graph
        # intended module is sageFC (config_contrast.yml:13; unwired in the
        # reference's NGNN — wired here per SURVEY §7.3 item 8)
        spec = self.spec_for()
        warm_epoch = S.make_ct_epoch(spec, self.optimizer, self.fanouts,
                                     exact_leaf=self.exact_leaf_on(spec),
                                     mesh=self.mesh)
        evaluate = self.make_eval(spec)
        evaluate_pair = self.make_eval_pair(spec)
        train_idx = self.split_idx["train"]
        bs = int(c["batch_size"])

        # ---- graph augmentation views (host-side, one-time)
        views = {}
        if c.get("augment_edge", True):
            edge_s = augment_edges_pos(g.edge_index, g.num_nodes, float(c["prob_s"]), self.rng)
            edge_l = augment_edges_pos(g.edge_index, g.num_nodes, float(c["prob_l"]), self.rng)
        else:
            edge_s = edge_l = g.edge_index
        if c.get("augment_feat", True):
            feat_s = np.asarray(
                shuffle_pos_dev(self.next_key(), jnp.asarray(g.x), float(c["prob_s"]))
            )
            feat_l = np.asarray(shuffle_neg(self.next_key(), jnp.asarray(g.x)))
        else:
            feat_s = feat_l = g.x
        from ..graph.containers import CSRGraph

        views = self._put({
            "orig": (self.data.x, self.data.csr),
            "edge_s": (self.data.x, CSRGraph.from_coo(edge_s, g.num_nodes)),
            "feat_s": (jnp.asarray(feat_s), self.data.csr),
            "large": (jnp.asarray(feat_l), CSRGraph.from_coo(edge_l, g.num_nodes)),
        })
        self._ct_views = views

        # ---- finetune-phase resume (VERDICT r2 item #8): the bundle holds
        # the finetune state + the small-loss split ids, so a killed run
        # re-enters phase 2 directly (views above are deterministic replays
        # of the same seed) and reproduces the uninterrupted trajectory.
        ckpt_every, ft_ckpt = self._ckpt_setup("ctft")
        ft_opt = optax.adam(float(c.get("next_lr", c["learning_rate"])))
        tmpl_p = nets.init_params(jax.random.key(0), spec)
        resumed, _, ft_start, ft_meta = self._try_resume(
            ft_ckpt,
            (S.TrainState(tmpl_p, ft_opt.init(tmpl_p)),
             np.zeros(0, np.int64), np.zeros(0, np.int64)),
        )
        warmup = int(c["warmup"])
        if resumed is not None:
            s, clean_ids, noisy_ids = resumed
            clean_ids, noisy_ids = np.asarray(clean_ids), np.asarray(noisy_ids)
            best_val = float(ft_meta.get("best_val", 0.0))
            best_test = float(ft_meta.get("best_test", 0.0))
            ft_start = max(ft_start, warmup)
            return self._finetune(spec, evaluate, ft_opt, s, clean_ids,
                                  noisy_ids, ft_start, best_val, best_test,
                                  ckpt_every, ft_ckpt)

        # ---- phase 1: warmup with best-val checkpointing
        s1 = self._put_state(S.init_state(self.next_key(), spec, self.optimizer))
        s2 = self._put_state(S.init_state(self.next_key(), spec, self.optimizer))
        best_val, best_params = 0.0, s1.params
        for epoch in range(warmup):
            fr = jnp.float32(self.rate_schedule[epoch])
            seeds, masks = self.epoch_seed_matrix(train_idx, bs)
            s1, s2, _ = warm_epoch(
                s1, s2, self.data_for(spec), seeds, masks, self.next_key(), fr
            )
            acc1, acc2 = evaluate_pair(s1.params, s2.params)
            self.metrics.write(event="warmup", epoch=epoch,
                               val_acc_1=acc1["valid"], val_acc_2=acc2["valid"])
            self.logger.info(
                f"   Warmup epoch {epoch + 1}/{warmup} --- "
                f"v1: {acc1['valid']:.3f} v2: {acc2['valid']:.3f}"
            )
            if acc1["valid"] > best_val:
                # deep-copy: warm_epoch donates its state buffers, so an
                # alias of s1.params is DELETED by the next epoch call
                best_val = acc1["valid"]
                best_params = jax.tree.map(jnp.copy, s1.params)
                ckpt = f"{c['out_dir']}/models/{c['algo_type']}{self.output_name}"
                save_checkpoint(ckpt + "_m1", s1.params, {"epoch": epoch})
                save_checkpoint(ckpt + "_m2", s2.params, {"epoch": epoch})
                self.logger.info("   Saved  model")

        # ---- split into clean / noisy by small-loss selection
        clean_ids, noisy_ids = self._split(spec, s1.params, s2.params, warmup - 1)
        cr = self.clean[clean_ids].mean() if clean_ids.size else float("nan")
        self.logger.info(
            f"clean ratio in clean {cr:.3f}; "
            f"nbr clean {clean_ids.shape[0]}, noisy {noisy_ids.shape[0]}"
        )
        # oversample noisy to clean size (reference pipeline_contrast.py:336-338)
        if noisy_ids.size and clean_ids.size > noisy_ids.size:
            extra = self.rng.integers(0, clean_ids.size, clean_ids.size - noisy_ids.size)
            noisy_ids = np.concatenate([noisy_ids, clean_ids[extra]])

        # ---- phase 2: semi + contrastive finetune of model1
        s = self._put_state(S.TrainState(best_params, ft_opt.init(best_params)))
        # best-epoch reporting like every other pipeline (the reference only
        # logs val acc per epoch; the repo-wide criterion is best test acc)
        start_acc = evaluate(s.params)
        best_test = start_acc["test"]
        self.logger.info(
            f"   finetune start (warmup best-val params): "
            f"val {start_acc['valid']:.3f} test {start_acc['test']:.3f}"
        )
        return self._finetune(spec, evaluate, ft_opt, s, clean_ids, noisy_ids,
                              warmup, best_val, best_test, ckpt_every, ft_ckpt)

    def _finetune(self, spec, evaluate, ft_opt, s, clean_ids, noisy_ids,
                  ft_start, best_val, best_test, ckpt_every, ft_ckpt):
        """Phase-2 epoch loop, shared by the fresh path and finetune-resume."""
        c = self.config
        views = self._ct_views
        ft_epoch = S.make_contrast_train_epoch(spec, ft_opt, self.fanouts,
                                               lam=float(c["lambda"]),
                                               mesh=self.mesh)
        bs2 = min(1024, max(clean_ids.size, 1))
        if self.mesh is not None:  # seed batches shard over the data axis
            nd = self.mesh.shape["data"]
            bs2 += (-bs2) % nd
        ft_test = []
        for epoch in range(ft_start, int(c["max_epochs"])):
            cs, cm = self.epoch_seed_matrix(clean_ids, bs2)
            ns, nm = self.epoch_seed_matrix(noisy_ids, bs2)
            nb = min(cs.shape[0], ns.shape[0])  # zip semantics
            s, agg = ft_epoch(
                s, self.data, views, cs[:nb], cm[:nb], ns[:nb], nm[:nb],
                self.next_key(),
            )
            rec = self._fetch_metrics(agg, max(nb, 1))
            acc = evaluate(s.params)
            best_test = max(best_test, acc["test"])
            ft_test.append(acc["test"])
            self.metrics.write(event="finetune", epoch=epoch, **rec,
                               val_acc=acc["valid"], test_acc=acc["test"])
            if ckpt_every and (epoch + 1) % ckpt_every == 0:
                save_checkpoint(
                    ft_ckpt, ((s, clean_ids, noisy_ids), self.key),
                    {**self._ckpt_meta(0, epoch),
                     "best_val": best_val, "best_test": best_test},
                )
            self.logger.info(
                f"   Train epoch {epoch + 1}/{c['max_epochs']} --- "
                f"loss semi: {rec.get('loss_semi', 0):.3f} "
                f"loss cont: {rec.get('loss_cont', 0):.3f} "
                f"val acc {acc['valid']:.3f} test acc {acc['test']:.3f}"
            )
        final = evaluate(s.params)
        extra = {
            "final_mean": final["test"],
            "last10_mean": float(np.mean(ft_test[-10:])) if ft_test
            else final["test"],
            "warmup_best_val": best_val,
        }
        self.metrics.write(event="summary_contrastive", mean=best_test, std=0.0,
                           final=final["test"], **extra)
        self.logger.info(
            f"   contrastive best test {best_test:.3f} (final {final['test']:.3f})"
        )
        return {"contrastive": RunSummary(best_test, 0.0, extra),
                "final": final}

    def _split(self, spec, p1, p2, epoch):
        """Small-loss partition of the train set (reference split(),
        src/pipeline_contrast.py:110-131 — note it feeds SOFTMAX outputs to
        CTLoss; replicated)."""
        from ..losses.coteaching import ct_loss

        c = self.config
        eval_fn = S.make_eval_fn(spec)
        logits = eval_fn(p1, self.data.x, self._full_edge_index)
        logits2 = eval_fn(p2, self.data.x, self._full_edge_index)
        train_idx = self.split_idx["train"]
        fr = jnp.float32(self.rate_schedule[epoch])
        clean_ids, noisy_ids = [], []
        for batch in self.epoch_batches(train_idx, int(c["batch_size"]), shuffle=False):
            o1 = jax.nn.softmax(jnp.take(logits, batch.seeds, axis=0), axis=-1)
            o2 = jax.nn.softmax(jnp.take(logits2, batch.seeds, axis=0), axis=-1)
            yb = jnp.take(self.data.yhn, batch.seeds)
            cb = jnp.take(self.data.clean, batch.seeds)
            out = ct_loss(o1, o2, yb, fr, cb, sample_mask=batch.mask)
            seeds = np.asarray(batch.seeds)
            clean_ids.append(seeds[np.asarray(out.keep_1)])
            noisy_ids.append(seeds[np.asarray(out.noisy_1)])
        return np.concatenate(clean_ids), np.concatenate(noisy_ids)


class PipelineSG(BasePipeline):
    """Grid search over spl_cont_beta x ct_tau re-running TES-style training
    (reference PipelineSG, src/pipeline_sgrid.py:176-241)."""

    schedule_variant = "small"

    def loop(self):
        c = self.config
        results = []
        for beta in c.get("grid_beta", [1.0]):
            for tau in c.get("grid_tau", [0.2]):
                sub = dict(c)
                sub["spl_cont_beta"] = float(beta)
                sub["ct_tau"] = float(tau)
                sub["num_runs"] = 1
                sub["do_plot"] = False
                # grid cells compare hyperparameters, not algo-vs-baseline:
                # force the nalgo branch (PipelineTES.loop returns a dict for
                # 'both', which the (mean, std) unpack below cannot take)
                sub["train_type"] = "nalgo"
                pipe = PipelineTES(sub)
                mean, std = pipe.loop()
                results.append({"beta": float(beta), "tau": float(tau),
                                "acc": mean, "std": std})
                self.logger.info(f"   grid beta={beta} tau={tau} -> {mean:.3f}")
        results.sort(key=lambda r: -r["acc"])
        for r in results[:12]:
            self.logger.info(
                f"   top: beta={r['beta']} tau={r['tau']} acc={r['acc']:.3f}"
            )
        self.metrics.write(event="grid_results", results=results)
        return results


class PipelineA(BasePipeline):
    """TES-style training instrumented with selection-quality analysis:
    per-epoch accuracy on clean-kept vs noisy-rejected subsets, best-model
    checkpoint, confusion matrix (reference PipelineA,
    src/pipeline_analysis.py)."""

    schedule_variant = "small"

    def loop(self):
        c = self.config
        spec = self.spec_for()
        epoch_fn = S.make_ct_epoch(spec, self.optimizer, self.fanouts,
                                   exact_leaf=self.exact_leaf_on(spec),
                                   mesh=self.mesh)
        evaluate = self.make_eval(spec)
        eval_fn = S.make_eval_fn(spec)
        train_idx = self.split_idx["train"]
        bs = int(c["batch_size"])
        ckpt_every, ckpt_path = self._ckpt_setup("a")
        tmpl_s = S.init_state(jax.random.key(0), spec, self.optimizer)
        states, _, start_epoch, meta = self._try_resume(
            ckpt_path, (tmpl_s, tmpl_s)
        )
        best_path = f"{c['out_dir']}/models/analysis{self.output_name}_best"
        if states is not None:
            s1, s2 = states
            best_val = float(meta.get("best_val", 0.0))
            best_params = s1.params
            if os.path.exists(best_path + ".npz"):
                best_params, _ = load_checkpoint(best_path, s1.params)
                best_params = self._put(best_params)
        else:
            s1 = self._put(S.init_state(self.next_key(), spec, self.optimizer))
            s2 = self._put(S.init_state(self.next_key(), spec, self.optimizer))
            best_val = 0.0
            best_params = s1.params
        from ..losses.coteaching import ct_loss

        for epoch in range(start_epoch, int(c["max_epochs"])):
            fr = jnp.float32(self.rate_schedule[epoch])
            seeds, masks = self.epoch_seed_matrix(train_idx, bs)
            s1, s2, _ = epoch_fn(s1, s2, self.data_for(spec), seeds, masks,
                                 self.next_key(), fr)
            # selection-quality probes on the train set
            logits = eval_fn(s1.params, self.data.x, self._full_edge_index)
            sel_stats = {"clean_correct": 0, "clean_total": 0,
                         "noisy_correct": 0, "noisy_total": 0}
            logits2 = eval_fn(s2.params, self.data.x, self._full_edge_index)
            for batch in self.epoch_batches(train_idx, bs, shuffle=False):
                o1 = jnp.take(logits, batch.seeds, axis=0)
                o2 = jnp.take(logits2, batch.seeds, axis=0)
                yb = jnp.take(self.data.yhn, batch.seeds)
                cb = jnp.take(self.data.clean, batch.seeds)
                out = ct_loss(o1, o2, yb, fr, cb, sample_mask=batch.mask)
                pred = np.asarray(jnp.argmax(o1, -1))
                ytrue = np.asarray(jnp.take(self.data.y, batch.seeds))
                keep = np.asarray(out.keep_1)
                noisy = np.asarray(out.noisy_1)
                sel_stats["clean_correct"] += int((pred[keep] == ytrue[keep]).sum())
                sel_stats["clean_total"] += int(keep.sum())
                sel_stats["noisy_correct"] += int((pred[noisy] == ytrue[noisy]).sum())
                sel_stats["noisy_total"] += int(noisy.sum())
            acc = evaluate(s1.params)
            if acc["valid"] > best_val:
                # deep-copy: epoch_fn donates its state buffers, so an alias
                # of s1.params would be DELETED by the next epoch call
                best_val = acc["valid"]
                best_params = jax.tree.map(jnp.copy, s1.params)
                save_checkpoint(
                    f"{c['out_dir']}/models/analysis{self.output_name}_best",
                    s1.params, {"epoch": epoch, "val_acc": acc["valid"]},
                )
            self.metrics.write(
                event="epoch_analysis", epoch=epoch,
                clean_sel_acc=sel_stats["clean_correct"] / max(sel_stats["clean_total"], 1),
                noisy_sel_acc=sel_stats["noisy_correct"] / max(sel_stats["noisy_total"], 1),
                val_acc=acc["valid"], test_acc=acc["test"],
            )
            if ckpt_every and (epoch + 1) % ckpt_every == 0:
                save_checkpoint(ckpt_path, ((s1, s2), self.key),
                                {**self._ckpt_meta(0, epoch),
                                 "best_val": best_val})
        # confusion matrix of the best model (reference pipeline_analysis.py:227)
        logits = eval_fn(best_params, self.data.x, self._full_edge_index)
        pred = np.asarray(jnp.argmax(logits, -1))
        cm = confusion_matrix(self.graph.y[self.split_idx["test"]],
                              pred[self.split_idx["test"]], self.graph.num_classes)
        np.save(f"{c['out_dir']}/metrics/confusion_{self.output_name}.npy", cm)
        self.logger.info(f"   best val {best_val:.3f}; confusion matrix saved")
        return {"best_val": best_val, "confusion": cm}
