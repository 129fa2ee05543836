"""Checkpoint/resume + config validation (SURVEY §5 aux subsystems).

The reference only torch.saves bare state_dicts under hard-coded names
(reference src/pipeline_contrast.py:308-320); here the bundle is params +
optimizer state + PRNG key + run/epoch position with config-derived paths.
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from noise_gnn_tpu.models import nets
from noise_gnn_tpu.train import steps as S
from noise_gnn_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from noise_gnn_tpu.utils.config import DEFAULTS, run_name, validate_config


def _spec():
    return nets.NetSpec(module="sage", in_size=8, hidden_size=16, out_size=3,
                        num_layers=2, dropout=0.5)


def test_checkpoint_roundtrip(tmp_path):
    opt = optax.adam(1e-3)
    s1 = S.init_state(jax.random.key(1), _spec(), opt)
    s2 = S.init_state(jax.random.key(2), _spec(), opt)
    key = jax.random.key(7)
    path = str(tmp_path / "ck" / "bundle")
    save_checkpoint(path, (s1, s2, key), {"run": 2, "epoch": 13})

    tmpl = (S.init_state(jax.random.key(0), _spec(), opt),
            S.init_state(jax.random.key(0), _spec(), opt), jax.random.key(0))
    (r1, r2, rkey), meta = load_checkpoint(path, tmpl)
    assert meta == {"run": 2, "epoch": 13}
    def raw(x):
        if jax.dtypes.issubdtype(getattr(x, "dtype", np.float32),
                                 jax.dtypes.prng_key):
            x = jax.random.key_data(x)
        return np.asarray(x)

    for want, got in zip(jax.tree_util.tree_leaves((s1, s2, key)),
                         jax.tree_util.tree_leaves((r1, r2, rkey))):
        np.testing.assert_array_equal(raw(want), raw(got))
    # restored PRNG key streams identically
    assert jnp.array_equal(jax.random.uniform(key, (4,)),
                           jax.random.uniform(rkey, (4,)))


def test_checkpoint_leaf_mismatch_raises(tmp_path):
    path = str(tmp_path / "bundle")
    save_checkpoint(path, {"a": jnp.ones(3)}, {})
    with pytest.raises(ValueError, match="leaves"):
        load_checkpoint(path, {"a": jnp.ones(3), "b": jnp.ones(2)})


def test_pipeline_resume(tmp_path):
    """Interrupt a run after its checkpoint epoch; resuming continues from
    the saved (run, epoch) with the saved params/opt/PRNG bundle."""
    from noise_gnn_tpu.train.pipelines import PipelineS

    cfg = dict(
        DEFAULTS, dataset_name="cora", synthetic_scale=16, num_runs=1,
        max_epochs=2, batch_size=64, hidden_size=16, num_layers=2,
        nbr_neighbors=[3, 2], train_type="nalgo", algo_type="coteaching",
        out_dir=str(tmp_path), ckpt_every=1, seed=5, epoch_logger=False,
        ckpt_path=str(tmp_path / "models" / "stable_ckpt"),
    )
    p1 = PipelineS(copy.deepcopy(cfg))
    p1.loop()
    assert (tmp_path / "models" / "stable_ckpt.npz").exists(), \
        "ckpt_every must have written a checkpoint at the stable path"

    cfg2 = dict(copy.deepcopy(cfg), resume=True, max_epochs=4)
    p2 = PipelineS(cfg2)
    p2.loop()
    log = (tmp_path / "logs").glob("**/*.log")
    text = "".join(f.read_text() for f in log)
    assert "Resumed from" in text
    assert "epoch 2" in text  # max_epochs=2 ran epochs 0..1, resume at 2


def _metric_by_epoch(out_dir, event, key):
    import glob
    import json

    rows = []
    for f in glob.glob(str(out_dir / "metrics" / "*.jsonl")):
        rows += [json.loads(line) for line in open(f)]
    return {
        (r.get("run", 0), r["epoch"]): r[key]
        for r in rows if r.get("event") == event
    }


@pytest.mark.parametrize("family,event,key,over", [
    ("PipelineS", "epoch_ct", "test_acc_1", {}),
    ("PipelineTES", "epoch_te", "test_acc_1",
     dict(module="sagePL", what="_test3", ct_tk=1, spl_rewire_rate=0.02)),
    ("PipelineCTP", "epoch_ctp", "test_acc_1",
     dict(module="sagePL", algo_type="ctp")),
    ("PipelineH", "epoch_h", "test_acc_1",
     dict(module="sageH", algo_type="hpseudo")),
    ("PipelineA", "epoch_analysis", "val_acc", dict(algo_type="analysis")),
])
def test_kill_and_resume_reproduces_metrics(tmp_path, family, event, key, over):
    """Kill-and-resume reproduction (VERDICT r2 item #8): a run interrupted
    at epoch 2 and resumed finishes with the SAME per-epoch metrics as the
    uninterrupted run — the bundle carries params+opt+device PRNG key AND
    the host RNG state, so batch permutations replay exactly."""
    import noise_gnn_tpu.train.pipelines as P

    base = dict(
        DEFAULTS, dataset_name="cora", synthetic_scale=16, num_runs=1,
        batch_size=64, hidden_size=16, num_layers=2, nbr_neighbors=[3, 2],
        train_type="nalgo", algo_type="coteaching", seed=11,
        epoch_logger=False, data_parallel=False,
    )
    base.update(over)
    cls = getattr(P, family)

    full = dict(base, max_epochs=4, out_dir=str(tmp_path / "full"))
    cls(copy.deepcopy(full)).loop()
    want = _metric_by_epoch(tmp_path / "full", event, key)

    ckpt = str(tmp_path / "kr" / "models" / "stable")
    killed = dict(base, max_epochs=2, out_dir=str(tmp_path / "kr"),
                  ckpt_every=1, ckpt_path=ckpt)
    cls(copy.deepcopy(killed)).loop()
    resumed = dict(killed, resume=True, max_epochs=4)
    cls(copy.deepcopy(resumed)).loop()
    got = _metric_by_epoch(tmp_path / "kr", event, key)

    assert set(got) == set(want)
    for pos in [(0, 2), (0, 3)]:  # post-resume epochs
        assert got[pos] == pytest.approx(want[pos], abs=1e-7), \
            f"epoch {pos} metric diverged after resume"


def test_kill_and_resume_ct_finetune(tmp_path):
    """PipelineCT: resume lands directly in the finetune phase (split ids in
    the bundle) and reproduces the uninterrupted finetune metrics."""
    from noise_gnn_tpu.train.pipelines import PipelineCT

    base = dict(
        DEFAULTS, dataset_name="cora", synthetic_scale=16, num_runs=1,
        batch_size=64, hidden_size=16, num_layers=2, nbr_neighbors=[3, 2],
        algo_type="contrastive", module="sageFC", warmup=2, seed=11,
        prob_s=0.05, prob_l=0.1, epoch_logger=False, data_parallel=False,
    )
    full = dict(base, max_epochs=5, out_dir=str(tmp_path / "full"))
    PipelineCT(copy.deepcopy(full)).loop()
    want = _metric_by_epoch(tmp_path / "full", "finetune", "test_acc")

    ckpt = str(tmp_path / "kr" / "models" / "stable_ft")
    killed = dict(base, max_epochs=3, out_dir=str(tmp_path / "kr"),
                  ckpt_every=1, ckpt_path=ckpt)
    PipelineCT(copy.deepcopy(killed)).loop()
    resumed = dict(killed, resume=True, max_epochs=5)
    PipelineCT(copy.deepcopy(resumed)).loop()
    got = _metric_by_epoch(tmp_path / "kr", "finetune", "test_acc")

    assert set(got) == set(want)
    for pos in [(0, 3), (0, 4)]:
        assert got[pos] == pytest.approx(want[pos], abs=1e-7)


def test_config_validation_errors():
    cfg = dict(DEFAULTS)
    for key, bad in [("algo_type", "nope"), ("noise_type", "gauss"),
                     ("train_type", "x"), ("noise_rate", 1.5),
                     ("num_layers", 0), ("nbr_neighbors", [0, 5])]:
        c = dict(cfg)
        c[key] = bad
        with pytest.raises(ValueError):
            validate_config(c)


def test_reference_configs_load():
    """Every shipped config passes validation with the reference key
    surface (reference main.py:54-57 loads raw YAML unvalidated)."""
    import glob

    from noise_gnn_tpu.utils.config import load_config

    paths = glob.glob("configs/*.yml")
    # full reference hypervolume: 12 distinct shapes + 24 numbered variants
    # (tools/gen_config_variants.py), = the reference's 36 config/ files
    assert len(paths) >= 36
    import main as climain

    dispatch = {"codi", "coteaching", "ctp", "contrastive", "grid",
                "analysis", "hpseudo", "baseline"}
    for p in paths:
        cfg = load_config(p)
        assert run_name(cfg)  # name derivation works for every config
        assert cfg["algo_type"] in dispatch  # CLI dispatch resolves
        assert hasattr(climain, "main")
