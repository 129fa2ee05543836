"""tools/evidence.py artifact harvesting: per-epoch curve extraction with
session-boundary filtering, downsampling, and confusion-matrix pickup
(VERDICT r4 next #1/#7 — the committed artifacts must carry the curves the
verdict claims rest on)."""

import importlib.util
import json
import os
import sys

import numpy as np

_spec = importlib.util.spec_from_file_location(
    "evidence",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tools", "evidence.py"),
)
evidence = importlib.util.module_from_spec(_spec)
sys.modules["evidence"] = evidence
_spec.loader.exec_module(evidence)


def _write_metrics(path, events):
    with open(path, "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")


def test_harvest_curves_and_session_filter(tmp_path):
    mdir = tmp_path / "out" / "metrics"
    mdir.mkdir(parents=True)
    name = "rowX"
    stale = [  # a previous session of the same output name (appended file)
        {"event": "epoch_ct", "run": 0, "epoch": i, "test_acc_1": 0.1,
         "ts": 100.0 + i}
        for i in range(3)
    ]
    fresh = [
        {"event": "epoch_ct", "run": 0, "epoch": i, "test_acc_1": 0.5 + i / 10,
         "noisy_fit_1": 0.01 * i, "ts": 1000.0 + i}
        for i in range(4)
    ] + [
        {"event": "epoch_baseline", "run": 1, "epoch": i, "test_acc": 0.4,
         "ts": 1000.0 + i}
        for i in range(4)
    ] + [{"event": "summary_nalgo", "mean": 0.6, "std": 0.01, "ts": 1010.0}]
    _write_metrics(mdir / f"{name}.jsonl", stale + fresh)
    np.save(mdir / f"confusion_{name}.npy", np.eye(3, dtype=np.int64))

    cfg = {"_output_name": name, "out_dir": str(tmp_path / "out"),
           "_harvest_after_ts": 1000.0}
    art = evidence._harvest_artifacts(cfg)

    # stale session excluded: 4 fresh epochs only, values from the fresh run
    c = art["_curves"]["epoch_ct_r0"]
    assert c["epoch"] == [0, 1, 2, 3]
    assert c["test_acc_1"] == [0.5, 0.6, 0.7, 0.8]
    assert c["noisy_fit_1"] == [0.0, 0.01, 0.02, 0.03]
    assert art["_curves"]["epoch_baseline_r1"]["test_acc"] == [0.4] * 4
    # summaries filtered to the fresh session too
    assert [e["event"] for e in art["_events"]] == ["summary_nalgo"]
    # confusion matrix picked up as a plain list
    assert art["_confusion"] == np.eye(3, dtype=int).tolist()


def test_harvest_downsamples_long_streams(tmp_path):
    mdir = tmp_path / "out" / "metrics"
    mdir.mkdir(parents=True)
    events = [
        {"event": "epoch_ct", "run": 0, "epoch": i, "test_acc_1": i / 1000.0,
         "ts": 1000.0 + i}
        for i in range(600)
    ]
    _write_metrics(mdir / "rowY.jsonl", events)
    art = evidence._harvest_artifacts(
        {"_output_name": "rowY", "out_dir": str(tmp_path / "out"),
         "_harvest_after_ts": 0.0}
    )
    c = art["_curves"]["epoch_ct_r0"]
    assert len(c["epoch"]) <= 251
    assert c["epoch"][0] == 0 and c["epoch"][-1] == 599  # last epoch kept
    assert len(c["epoch"]) == len(c["test_acc_1"])
