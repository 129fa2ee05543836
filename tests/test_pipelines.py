"""Pipeline integration: each pipeline runs a tiny config end-to-end and the
noise-robust path beats chance (reference's empirical-validation style,
SURVEY §4)."""

import os

import numpy as np
import pytest

from noise_gnn_tpu.train.pipelines import (
    PipelineA,
    PipelineCO,
    PipelineCT,
    PipelineCTP,
    PipelineH,
    PipelineS,
    PipelineSG,
    PipelineTES,
)
from noise_gnn_tpu.utils.config import DEFAULTS


def tiny_config(tmp_path, **over):
    cfg = dict(DEFAULTS)
    cfg.update(
        dataset_name="cora",
        synthetic_scale=16,
        hidden_size=32,
        num_layers=2,
        nbr_neighbors=[5, 3],
        num_runs=1,
        max_epochs=4,
        batch_size=128,
        noise_rate=0.3,
        noise_type="sym",
        ct_tk=2,
        ct_tau=0.5,
        epoch_logger=False,
        out_dir=str(tmp_path),
        seed=0,
    )
    cfg.update(over)
    return cfg


def test_pipeline_s_both(tmp_path):
    cfg = tiny_config(tmp_path, train_type="both", compare_loss="back")
    res = PipelineS(cfg).loop()
    assert "nalgo" in res and "baseline" in res
    mean, std = res["nalgo"]
    assert mean > 2.0 / cfg["nbr_classes"]  # far above chance
    # metrics stream written
    import glob, json

    files = glob.glob(str(tmp_path / "metrics" / "*.jsonl"))
    assert files
    lines = [json.loads(l) for l in open(files[0])]
    assert any(r.get("event") == "epoch_ct" for r in lines)


def test_pipeline_co_products_frac(tmp_path):
    cfg = tiny_config(
        tmp_path,
        dataset_name="ogbn-products",
        synthetic_scale=2000,
        whole_test_set=False,
        train_frac=2,
        tvalid_frac=2,
        test_frac=4,
        train_type="nalgo",
        max_epochs=2,
    )
    res = PipelineCO(cfg).loop()
    assert np.isfinite(res["nalgo"][0])


def test_pipeline_tes(tmp_path):
    cfg = tiny_config(tmp_path, module="sagePL", train_type="nalgo",
                      algo_type="coteaching", ct_tk=1, max_epochs=3,
                      spl_rewire_rate=0.02, batch_size=64)
    res = PipelineTES(cfg).loop()
    assert np.isfinite(res[0])


def test_pipeline_ctp(tmp_path):
    cfg = tiny_config(tmp_path, module="sagePL", algo_type="ctp",
                      train_type="nalgo", max_epochs=2, batch_size=64)
    res = PipelineCTP(cfg).loop()
    assert np.isfinite(res[0])


def test_pipeline_ctp_both(tmp_path):
    """train_type 'both' runs the plain-CE baseline branch too (reference
    src/pipeline_ctp.py:292-380) and returns a dict with paired results."""
    cfg = tiny_config(tmp_path, module="sagePL", algo_type="ctp",
                      train_type="both", max_epochs=2, batch_size=64)
    res = PipelineCTP(cfg).loop()
    assert set(res) == {"nalgo", "baseline"}
    assert np.isfinite(res["nalgo"][0]) and np.isfinite(res["baseline"][0])


def test_pipeline_h(tmp_path):
    cfg = tiny_config(tmp_path, module="sageH", algo_type="hpseudo",
                      train_type="nalgo", max_epochs=2, batch_size=64,
                      spl_rewire_rate=0.02)
    res = PipelineH(cfg).loop()
    assert np.isfinite(res[0])


def test_pipeline_ct(tmp_path):
    cfg = tiny_config(tmp_path, module="sageFC", algo_type="contrastive",
                      max_epochs=3, warmup=2, batch_size=128,
                      prob_s=0.05, prob_l=0.1)
    res = PipelineCT(cfg).loop()
    assert np.isfinite(res["contrastive"][0])
    assert np.isfinite(res["final"]["valid"])


def test_pipeline_analysis(tmp_path):
    cfg = tiny_config(tmp_path, algo_type="analysis", train_type="nalgo",
                      max_epochs=2, batch_size=64)
    res = PipelineA(cfg).loop()
    assert res["confusion"].sum() > 0


def test_pipeline_grid(tmp_path):
    cfg = tiny_config(tmp_path, module="sagePL", algo_type="grid",
                      train_type="nalgo", max_epochs=2, batch_size=64,
                      grid_beta=[1.0], grid_tau=[0.2, 0.4], ct_tk=1)
    res = PipelineSG(cfg).loop()
    assert len(res) == 2
    assert res[0]["acc"] >= res[1]["acc"]


def test_determinism_same_seed_same_run(tmp_path):
    """seed is real here (the reference's seed key is never applied,
    SURVEY §7.3 item 9): identical configs => identical results."""
    r1 = PipelineS(tiny_config(tmp_path, train_type="nalgo", seed=7)).loop()
    r2 = PipelineS(tiny_config(tmp_path, train_type="nalgo", seed=7)).loop()
    assert r1 == r2
    r3 = PipelineS(tiny_config(tmp_path, train_type="nalgo", seed=8)).loop()
    assert r3 != r1  # different seed takes a different trajectory


def test_pipeline_te_ogb(tmp_path):
    """TE = the OGB variant of the sagePL co-teaching+contrastive pipeline
    (reference src/pipeline_test.py): official-style split + rewire phase."""
    from noise_gnn_tpu.train.pipelines import PipelineTE

    cfg = tiny_config(tmp_path, dataset_name="ogbn-arxiv",
                      synthetic_scale=120, module="sagePL",
                      train_type="nalgo", algo_type="coteaching", what="_test3",
                      ct_tk=1, max_epochs=3, batch_size=64,
                      spl_rewire_rate=0.02)
    res = PipelineTE(cfg).loop()
    assert np.isfinite(res[0])


def test_main_dispatch_table():
    """algo_type x what x dataset -> pipeline class (reference main.py:21-44)."""
    import main as climain

    cases = [
        (dict(algo_type="coteaching", what="", dataset_name="ogbn-arxiv"), "PipelineCO"),
        (dict(algo_type="codi", what="", dataset_name="cora"), "PipelineS"),
        (dict(algo_type="coteaching", what="_test2", dataset_name="ogbn-products"), "PipelineTE"),
        (dict(algo_type="codi", what="_test3", dataset_name="pubmed"), "PipelineTES"),
        (dict(algo_type="ctp", dataset_name="cora"), "PipelineCTP"),
        (dict(algo_type="contrastive", dataset_name="cora"), "PipelineCT"),
        (dict(algo_type="grid", dataset_name="cora"), "PipelineSG"),
        (dict(algo_type="analysis", dataset_name="cora"), "PipelineA"),
        (dict(algo_type="hpseudo", dataset_name="cora"), "PipelineH"),
        (dict(algo_type="baseline", dataset_name="computers"), "PipelineS"),
    ]
    calls = []

    class Spy:
        def __init__(self, name):
            self.name = name

        def __call__(self, cfg):
            calls.append(self.name)
            return type("P", (), {"loop": lambda self: None})()

    saved = {}
    names = ["PipelineA", "PipelineCO", "PipelineCT", "PipelineCTP",
             "PipelineH", "PipelineS", "PipelineSG", "PipelineTE",
             "PipelineTES"]
    for nm in names:
        saved[nm] = getattr(climain, nm)
        setattr(climain, nm, Spy(nm))
    try:
        for cfg, expect in cases:
            climain.main(dict(cfg))
            assert calls[-1] == expect, (cfg, calls[-1], expect)
        with pytest.raises(ValueError):
            climain.main(dict(algo_type="nope", dataset_name="cora"))
    finally:
        for nm in names:
            setattr(climain, nm, saved[nm])


def test_plot_export(tmp_path):
    """do_plot renders the reference-style multi-panel PNG from the metrics
    stream (reference: matplotlib tails of every pipeline,
    src/pipeline.py:315-360)."""
    import glob

    cfg = tiny_config(tmp_path, train_type="nalgo", do_plot=True, max_epochs=3)
    PipelineS(cfg).loop()
    pngs = glob.glob(str(tmp_path / "plots" / "*.png"))
    assert pngs, "do_plot must write a PNG under out_dir/plots"
    assert os.path.getsize(pngs[0]) > 1000


def test_flip_labels_run_keyed_pairing(tmp_path):
    """_flip_labels(run) must be a pure function of (seed, run): the nalgo
    and baseline branches of a multi-run A/B then see identical noise
    realizations (paired comparison; rand_pair draws vary wildly in
    difficulty)."""
    from noise_gnn_tpu.train.pipelines import PipelineS

    p1 = PipelineS(tiny_config(tmp_path, batch_id=7101))
    p2 = PipelineS(tiny_config(tmp_path, batch_id=7102))
    p1._flip_labels(run=1)
    y1 = np.asarray(p1.graph.yhn).copy()
    p2._flip_labels(run=2)
    p2._flip_labels(run=1)  # order-independent: keyed by (seed, run)
    np.testing.assert_array_equal(np.asarray(p2.graph.yhn), y1)
    p2._flip_labels(run=2)
    assert (np.asarray(p2.graph.yhn) != y1).any()


def test_cli_gat_smoke(tmp_path):
    """`module: gat` trains through the CLI dispatch (dense masked attention
    on the flat sampled subgraph; reference attention.py is dead code, ported
    for completeness)."""
    import main as climain

    cfg = tiny_config(tmp_path, module="gat", module_compare="gat",
                      algo_type="baseline", max_epochs=2, batch_size=64,
                      hidden_size=16)
    res = climain.main(cfg)
    assert np.isfinite(res["baseline"][0])


@pytest.mark.parametrize(
    "cls_name,over,expect_runs",
    [
        ("PipelineTE", dict(dataset_name="ogbn-arxiv", synthetic_scale=120,
                            module="sagePL", what="_test3"), [0, 1]),
        ("PipelineTES", dict(module="sagePL"), []),
        ("PipelineCTP", dict(module="sagePL", algo_type="ctp"), [0, 1]),
        ("PipelineH", dict(module="sageH", algo_type="hpseudo"), [0, 1]),
    ],
)
def test_loop_flips_are_run_keyed(tmp_path, cls_name, over, expect_runs):
    """Every nalgo loop that coexists with _loop_baseline must draw noise
    keyed by (seed, run) — same realizations as the baseline branch (paired
    A/B) — and the small-graph TES must flip once at init only (reference
    flip-once semantics, src/pipeline_s.py)."""
    import noise_gnn_tpu.train.pipelines as P

    cfg = tiny_config(tmp_path, train_type="nalgo", algo_type="coteaching",
                      num_runs=2, max_epochs=1, batch_size=64, ct_tk=1,
                      spl_rewire_rate=0.02)
    cfg.update(over)
    pipe = getattr(P, cls_name)(cfg)
    calls = []
    orig = pipe._flip_labels

    def spy(run=None):
        calls.append(run)
        return orig(run)

    pipe._flip_labels = spy
    pipe.loop()
    assert calls == expect_runs


def test_selection_degenerate_detector():
    """Flat purity == clean fraction over the last training quarter flags
    the measured co-teaching collapse mode (docs/RESULTS.md round 3);
    rising purity does not."""
    from noise_gnn_tpu.train.pipelines import selection_degenerate

    flat = [(0.70, 0.701)] * 40
    rising = [(0.70, 0.70)] * 20 + [(0.72 + 0.001 * i, 0.72)
                                    for i in range(20)]
    assert selection_degenerate(flat, 0.70)
    assert not selection_degenerate(rising, 0.70)
    assert not selection_degenerate([], 0.70)


def test_optimization_collapsed_detector():
    """Round-5 flagship run-3 mode: loss stalls near its initial value and
    fit to the noisy targets stays at chance while selection purity is
    healthy. Healthy descent does not trigger; short runs never judge."""
    from noise_gnn_tpu.train.pipelines import optimization_collapsed

    # measured shapes: ln(47)=3.85 start; collapsed tail ~3.03 (0.79x),
    # fit 0.084 vs clean 0.707; healthy tail ~2.10 (0.55x), fit 0.24
    collapsed_loss = [3.85 - 0.017 * i for i in range(50)]
    healthy_loss = [3.85 - 0.036 * i for i in range(50)]
    assert optimization_collapsed(collapsed_loss, [0.084], 0.707)
    assert not optimization_collapsed(healthy_loss, [0.24], 0.707)
    # healthy fit vetoes even with a stalled-looking loss
    assert not optimization_collapsed(collapsed_loss, [0.40], 0.707)
    # too-short runs and missing fit probes never judge
    assert not optimization_collapsed(collapsed_loss[:5], [0.08], 0.707)
    assert not optimization_collapsed(collapsed_loss, [], 0.707)


def test_reinit_on_degenerate_retries_once(tmp_path, monkeypatch):
    """With reinit_retries > 0 the CO loop re-initializes and retrains a
    run whose selection ended degenerate — same noise realization, fresh
    init keys — and records the retry in the metrics stream."""
    import json

    import noise_gnn_tpu.train.pipelines as P

    calls = []

    def fake_degenerate(run_pure, clean_frac, tol=0.005):
        calls.append(len(run_pure))
        return len(calls) == 1  # first attempt degenerate, retry clean

    monkeypatch.setattr(P, "selection_degenerate", fake_degenerate)
    cfg = tiny_config(tmp_path, train_type="nalgo", reinit_retries=1)
    pipe = P.PipelineCO(cfg)
    flips = []
    orig = pipe._flip_labels

    def spy(run=None):
        flips.append(run)
        return orig(run)

    pipe._flip_labels = spy
    res = pipe.loop()
    assert len(calls) == 2  # one retry, second attempt accepted
    assert flips == [0]  # noise NOT redrawn on retry: the A/B stays paired
    mean, _ = res if isinstance(res, tuple) else res["nalgo"]
    assert mean > 1.0 / cfg["nbr_classes"]
    files = [os.path.join(r, f) for r, _, fs in os.walk(tmp_path)
             for f in fs if f.endswith(".jsonl")]
    lines = [json.loads(l) for f in files for l in open(f)]
    assert any(r.get("event") == "reinit_degenerate" for r in lines)
    # both attempts' epochs are in the stream
    n_epochs = sum(r.get("event") == "epoch_ct" for r in lines)
    assert n_epochs == 2 * cfg["max_epochs"]


@pytest.mark.parametrize("cls_name,over", [
    ("PipelineTES", dict(module="sagePL", algo_type="coteaching", ct_tk=1,
                         spl_rewire_rate=0.02, batch_size=64)),
    ("PipelineCTP", dict(module="sagePL", algo_type="ctp", batch_size=64)),
])
def test_reinit_retry_shared_with_family(tmp_path, monkeypatch, cls_name,
                                         over):
    """The degenerate-selection retry shell is shared by the whole
    co-teaching family (VERDICT r3 item #7): TE/TES and CTP honor
    reinit_retries through the same _degen_retry decision."""
    import json

    import noise_gnn_tpu.train.pipelines as P

    calls = []

    def fake_degenerate(run_pure, clean_frac, tol=0.005):
        calls.append(len(run_pure))
        return len(calls) == 1  # first attempt degenerate, retry clean

    monkeypatch.setattr(P, "selection_degenerate", fake_degenerate)
    cfg = tiny_config(tmp_path, train_type="nalgo", reinit_retries=1,
                      max_epochs=3, **over)
    pipe = getattr(P, cls_name)(cfg)
    res = pipe.loop()
    assert len(calls) == 2  # one retry, second attempt accepted
    assert np.isfinite(res[0])
    files = [os.path.join(r, f) for r, _, fs in os.walk(tmp_path)
             for f in fs if f.endswith(".jsonl")]
    lines = [json.loads(l) for f in files for l in open(f)]
    ev = [r for r in lines if r.get("event") == "reinit_degenerate"]
    assert len(ev) == 1
    # the discarded attempt's best acc is recorded for auditability
    assert "discarded_best" in ev[0]


def test_summary_reports_final_and_last10(tmp_path):
    """Every branch summary carries final-epoch and last-10-epoch accuracy
    next to the reference's best-epoch criterion (VERDICT r3 item #2)."""
    import json

    cfg = tiny_config(tmp_path, train_type="both", compare_loss="back")
    res = PipelineS(cfg).loop()
    for branch in ("nalgo", "baseline"):
        extra = res[branch].extra
        assert {"final_mean", "last10_mean", "final_accs",
                "runs"} <= set(extra)
        assert 0.0 <= extra["final_mean"] <= 1.0
        # tuple compatibility intact
        mean, std = res[branch]
        assert np.isfinite(mean) and np.isfinite(std)
    files = [os.path.join(r, f) for r, _, fs in os.walk(tmp_path)
             for f in fs if f.endswith(".jsonl")]
    lines = [json.loads(l) for f in files for l in open(f)]
    summaries = [r for r in lines
                 if str(r.get("event", "")).startswith("summary_")]
    assert summaries and all("final_mean" in s for s in summaries)


def test_save_pure_survives_ragged_resume_histories(tmp_path):
    """A run resumed mid-way has a SHORT pure history; the artifact must
    still be written, NaN-left-padded (VERDICT r3 item #8 — the bare
    `except ValueError: pass` dropped it exactly on resumed runs)."""
    cfg = tiny_config(tmp_path, train_type="nalgo", max_epochs=2)
    pipe = PipelineCO(cfg)
    ragged = [[(0.7, 0.71), (0.72, 0.73)], [(0.74, 0.75)]]  # run 1 resumed
    pipe._save_pure(ragged)
    path = tmp_path / "pure" / f"{pipe.output_name}.npy"
    arr = np.load(path)
    assert arr.shape == (2, 2, 2)
    assert np.isnan(arr[1, 0]).all()  # missing pre-resume epochs padded
    np.testing.assert_allclose(arr[1, 1], [0.74, 0.75])
    np.testing.assert_allclose(arr[0], [[0.7, 0.71], [0.72, 0.73]])
