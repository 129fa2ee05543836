"""Acceptance: the noise-robust machinery behaves as designed under label
noise, in the reference's own validation style (SURVEY §4): the ground-truth
noise oracle measures small-loss selection precision ("pure ratio" curves,
reference src/pipeline.py:273-275), with an A/B against the plain-CE
baseline on the same data + noise.

Setup mirrors the reference's small-graph regime: 20 labels/class train
split (reference load_utils.py:118-121), full-batch steps.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from noise_gnn_tpu.graph.datasets import synthetic_graph
from noise_gnn_tpu.models import nets
from noise_gnn_tpu.noise import flip_label, noise_or_not
from noise_gnn_tpu.train import steps as S

C = 40


@pytest.fixture(scope="module")
def noisy_world():
    # 0.19 per-direction noise ~= the pre-v2 generator's 1.5/sqrt(64):
    # raw features stay informative, so the failure mode under test is label
    # noise, not feature noise
    g = synthetic_graph(4000, 64, C, 32000, homophily=0.85, seed=0,
                        feature_noise=0.19)
    yhn, mat = flip_label(g.y, C, "sym", 0.45, np.random.default_rng(0))
    clean = noise_or_not(g.y, yhn)
    data = S.GraphData(
        x=jnp.asarray(g.x),
        y=jnp.asarray(g.y),
        yhn=jnp.asarray(yhn),
        clean=jnp.asarray(clean),
        csr=g.csr(),
    )
    train_idx = np.concatenate([np.nonzero(g.y == c)[0][:20] for c in range(C)])
    return g, data, mat, clean, train_idx


def _train(g, data, mat, train_idx, mode, epochs=100):
    spec = nets.NetSpec(module="sage", in_size=g.num_features, hidden_size=64,
                        out_size=C, num_layers=2, dropout=0.5)
    opt = optax.adam(5e-3)
    ev = S.make_eval_fn(spec)
    ei = jnp.asarray(g.edge_index)
    nm = jnp.asarray(mat, jnp.float32)
    b = S.Batch(jnp.asarray(train_idx.astype(np.int32)),
                jnp.ones(train_idx.shape[0], bool))
    pures = []
    if mode == "coteaching":
        step = S.make_ct_step(spec, opt, (8, 4))
        s1 = S.init_state(jax.random.key(1), spec, opt)
        s2 = S.init_state(jax.random.key(2), spec, opt)
        for ep in range(epochs):
            fr = jnp.float32(min(ep / 15, 1.0) * 0.45)
            s1, s2, m = step(s1, s2, data, b, jax.random.key(100 + ep), fr)
            pures.append(float(m["pure_ratio_1"]))
        params = s1.params
    else:
        step = S.make_baseline_step(spec, opt, (8, 4), compare_loss=mode)
        s = S.init_state(jax.random.key(1), spec, opt)
        for ep in range(epochs):
            s, _ = step(s, data, b, jax.random.key(100 + ep), nm)
        params = s.params
    logits = ev(params, data.x, ei)
    acc = float((jnp.argmax(logits, -1) == data.y).mean())
    return acc, pures


def test_small_loss_selection_finds_clean_labels(noisy_world):
    """THE core mechanism: selection precision well above the clean fraction
    (chance level) once the forget-rate ramp completes."""
    g, data, mat, clean, tr = noisy_world
    acc_ct, pures = _train(g, data, mat, tr, "coteaching")
    clean_frac = float(clean[tr].mean())  # ~0.55 at 45% sym noise
    tail = float(np.mean(pures[-10:]))
    assert tail > clean_frac + 0.20, f"pure={tail:.3f} clean_frac={clean_frac:.3f}"
    assert acc_ct > 0.70, acc_ct  # learns well despite 45% label noise


def test_coteaching_beats_plain_ce_in_memorization_regime(noisy_world):
    """THE co-teaching claim (Han et al., the reference's core algorithm):
    plain CE peaks early then memorizes the 45% wrong labels, while
    co-teaching's small-loss selection keeps it near its peak. Measured here
    (fixed keys, deterministic): CE 0.934 @100ep -> 0.794 @300ep; CT stays
    ~0.83 at both horizons and ends ahead."""
    g, data, mat, clean, tr = noisy_world
    ce_100, _ = _train(g, data, mat, tr, "normal", epochs=100)
    ce_300, _ = _train(g, data, mat, tr, "normal", epochs=300)
    ct_100, _ = _train(g, data, mat, tr, "coteaching", epochs=100)
    ct_300, _ = _train(g, data, mat, tr, "coteaching", epochs=300)
    # CE memorizes: final accuracy decays well below its early peak
    assert ce_300 < ce_100 - 0.05, f"ce 100ep={ce_100:.3f} 300ep={ce_300:.3f}"
    # co-teaching is stable across the same horizon
    assert ct_300 > ct_100 - 0.05, f"ct 100ep={ct_100:.3f} 300ep={ct_300:.3f}"
    # and wins where it is designed to: the long/memorization regime
    assert ct_300 > ce_300, f"ct={ct_300:.3f} ce={ce_300:.3f}"


def test_backward_correction_noninferior_to_plain_ce(noisy_world):
    g, data, mat, clean, tr = noisy_world
    acc_bc, _ = _train(g, data, mat, tr, "back")
    acc_ce, _ = _train(g, data, mat, tr, "normal")
    assert acc_bc > acc_ce - 0.05, f"back={acc_bc:.3f} ce={acc_ce:.3f}"


def test_selection_has_signal_at_flagship_shape():
    """Round-3 criterion (VERDICT r2 item #4): on a PRODUCTS-shaped graph
    (deg ~25, homophily 0.81, heavy-tailed per-node difficulty, weak
    per-node features) the small-loss selection purity must RISE well above
    the clean fraction — the round-2 homogeneous generator failed exactly
    this (selection degenerated to random subsampling and co-teaching lost
    to CE at flagship scale)."""
    n, F, Cp = 24000, 100, 47
    g = synthetic_graph(n, F, Cp, n * 25, homophily=0.81, seed=0,
                        feature_noise=30.0, difficulty_sigma=1.0)
    rng = np.random.default_rng(1)
    yhn, _ = flip_label(g.y, Cp, "rand_pair", 0.3, rng)
    clean = noise_or_not(g.y, yhn)
    data = S.GraphData(
        x=jnp.asarray(g.x), y=jnp.asarray(g.y), yhn=jnp.asarray(yhn),
        clean=jnp.asarray(clean), csr=g.csr(),
    )
    tr = rng.permutation(n)[:2000].astype(np.int32)
    spec = nets.NetSpec(module="sage", in_size=F, hidden_size=64,
                        out_size=Cp, num_layers=2, dropout=0.5)
    opt = optax.adam(3e-3)
    step = S.make_ct_step(spec, opt, (10, 5))
    s1 = S.init_state(jax.random.key(1), spec, opt)
    s2 = S.init_state(jax.random.key(2), spec, opt)
    b = S.Batch(jnp.asarray(tr), jnp.ones(tr.shape[0], bool))
    pures = []
    for ep in range(250):
        fr = jnp.float32(min(ep / 15, 1.0) * 0.3)
        s1, s2, m = step(s1, s2, data, b, jax.random.key(50 + ep), fr)
        pures.append(float(m["pure_ratio_1"]))
    clean_frac = float(clean[tr].mean())  # ~0.70 at 30% noise
    tail = float(np.mean(pures[-10:]))
    head = float(np.mean(pures[:5]))
    assert tail > clean_frac + 0.03, (
        f"selection purity {tail:.3f} not above clean fraction "
        f"{clean_frac:.3f} — no memorization signal at flagship shape"
    )
    assert tail > head + 0.02, f"purity must rise: head={head:.3f} tail={tail:.3f}"
