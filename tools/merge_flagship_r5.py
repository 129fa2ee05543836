"""Round-5 flagship row recovery merge.

The 5-run flagship row (train_type 'both') lost its CE half to a tunnel
hang: the CT branch completed (summary_nalgo + per-epoch stream + pure
ratios all on disk) but the jax client froze on a dead RPC at the CT->CE
transition and the process was killed. The CE half was then re-run
standalone (train_type 'baseline', same base config, same seed/num_runs)
— by construction it trains on the IDENTICAL per-run noise draws, because
`pipelines._flip_labels` is a pure function of (seed, run) and batch_id
only names outputs (the same pairing guarantee the ct_tau diagnostic row
relies on, tests/test_pipelines.py::test_flip_labels_run_keyed_pairing).

This script reassembles the row exactly as `evidence.run_one` would have
emitted it for an uninterrupted 'both' run — nalgo branch from the CT
attempt's summary event + curve/pure harvest, baseline branch from the
standalone run's printed result — and appends the {label: result} line to
the campaign log so `evidence.py --from-log` picks it up as the row
result. Provenance is recorded in the result itself.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.evidence import _harvest_artifacts  # noqa: E402

LABEL = "ogbn-products rand_pair 0.3 co-teaching vs CE (flagship)"
BOTH_NAME = ("dt822_ogbn-products_id90_both_coteaching_sage_noise_"
             "rand_pair0.3_lay3_hid256_lr0.001_epo50_bs512_drop0.5_"
             "tk15_cttau1.2_neigh15105")


def main():
    mpath = os.path.join("out", "metrics", BOTH_NAME + ".jsonl")
    events = []
    for line in open(mpath):
        try:
            events.append(json.loads(line))
        except json.JSONDecodeError:
            pass
    # the CT attempt that completed is the LAST (run 0, epoch 0) restart
    starts = [e["ts"] for e in events
              if e.get("event") == "epoch_ct" and e.get("run") == 0
              and e.get("epoch") == 0]
    after = max(starts)
    summ = [e for e in events
            if e.get("event") == "summary_nalgo" and e["ts"] >= after]
    assert len(summ) == 1, f"want exactly one post-attempt summary, got {len(summ)}"
    nalgo = {k: v for k, v in summ[0].items() if k not in ("event", "ts")}

    ce = json.load(open(os.path.join("out", "flagship_ce.json")))
    assert "baseline" in ce, "standalone CE run carries no baseline branch"

    res = {
        "wall_s": round((summ[0]["ts"] - after) + ce.get("wall_s", 0.0), 1),
        "nalgo": nalgo,
        "baseline": ce["baseline"],
        "branch_provenance": (
            "nalgo: train_type 'both' row whose process lost its CE half to "
            "a tunnel hang after the CT branch completed; baseline: "
            "standalone train_type 'baseline' re-run, identical per-run "
            "noise draws by (seed, run) keying (batch_id only names "
            "outputs). wall_s = CT event span + CE run wall."
        ),
    }
    art = _harvest_artifacts({"_output_name": BOTH_NAME, "out_dir": "out",
                              "_harvest_after_ts": after + 1.0})
    res["_events"] = art.get("_events", []) + ce.get("_events", [])
    res["_curves"] = {**art.get("_curves", {}), **ce.get("_curves", {})}
    if "_pure" in art:
        res["_pure"] = art["_pure"]

    line = json.dumps({LABEL: res}, default=float)
    with open(os.path.join("out", "evidence_r5.log"), "a") as f:
        f.write(line + "\n")
    print("appended merged flagship row:",
          {b: res[b].get("mean") for b in ("nalgo", "baseline")},
          "curves:", sorted(res["_curves"]))


if __name__ == "__main__":
    main()
