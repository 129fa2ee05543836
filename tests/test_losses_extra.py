"""Parity tests for the remaining loss/metric inventory: ct_loss2,
neighbor_align, bce_expert_loss2, discriminator_innerprod2, topk_accuracy,
augment_edges_neg, and the fast_take gather helper.

Reference math replicated in-test with torch (CPU) / numpy:
ct_loss2 = losses.py:141-180, neighbor_align_batch = losses.py:248-292
(intended math — the reference body crashes on a debug print),
BCEExeprtLoss2 / Discriminator_innerprod2 = data_utils.py:66-97,
topk_accuracy = data_utils.py:17-32, augment_edges_neg =
augmentation.py:181-217.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from noise_gnn_tpu.augment import augment_edges_neg, augment_edges_pos
from noise_gnn_tpu.losses import (
    bce_expert_loss2,
    ct_loss2,
    discriminator_innerprod2,
    neighbor_align,
    topk_accuracy,
)
from noise_gnn_tpu.ops import fast_take


def test_ct_loss2_parity():
    rng = np.random.default_rng(3)
    b, c = 24, 5
    y1 = rng.normal(size=(b, c)).astype(np.float32)
    y2 = rng.normal(size=(b, c)).astype(np.float32)
    yn1 = rng.integers(0, c, b)
    yn2 = rng.integers(0, c, b)
    clean = rng.random(b) < 0.7
    fr = 0.25

    # reference CTLoss2 semantics: each net ranked by CE vs ITS OWN noisy
    # view, small-loss exchange
    l1 = F.cross_entropy(torch.tensor(y1), torch.tensor(yn1), reduction="none")
    l2 = F.cross_entropy(torch.tensor(y2), torch.tensor(yn2), reduction="none")
    i1 = np.argsort(l1.numpy(), kind="stable")
    i2 = np.argsort(l2.numpy(), kind="stable")
    nr = int((1 - fr) * b)
    ref_loss1 = F.cross_entropy(
        torch.tensor(y1[i2[:nr]]), torch.tensor(yn1[i2[:nr]])).item()
    ref_loss2 = F.cross_entropy(
        torch.tensor(y2[i1[:nr]]), torch.tensor(yn2[i1[:nr]])).item()
    ref_pure1 = clean[i1[:nr]].sum() / nr
    ref_pure2 = clean[i2[:nr]].sum() / nr

    out = ct_loss2(
        jnp.asarray(y1), jnp.asarray(y2), jnp.asarray(yn1), jnp.asarray(yn2),
        jnp.float32(fr), jnp.asarray(clean),
    )
    np.testing.assert_allclose(float(out.loss_1), ref_loss1, rtol=1e-5)
    np.testing.assert_allclose(float(out.loss_2), ref_loss2, rtol=1e-5)
    np.testing.assert_allclose(float(out.pure_ratio_1), ref_pure1, rtol=1e-5)
    np.testing.assert_allclose(float(out.pure_ratio_2), ref_pure2, rtol=1e-5)
    assert set(np.flatnonzero(np.asarray(out.keep_1))) == set(i1[:nr].tolist())
    assert set(np.flatnonzero(np.asarray(out.keep_2))) == set(i2[:nr].tolist())


def test_neighbor_align_matches_numpy():
    rng = np.random.default_rng(7)
    n, c, temp = 6, 4, 0.5
    # h in log space (log_softmax outputs), as F.kl_div expects
    h = np.log(rng.dirichlet(np.ones(c), size=n)).astype(np.float32)
    ei = np.array([[0, 0, 1, 2, 3, 4, 5, 5],
                   [1, 2, 0, 0, 4, 3, 3, 4]], np.int32)
    noisy = np.array([1, 0, 1, 1, 0, 1], bool)

    # intended reference math: A-mean of h rows, sharpen, KL(h || sharp)
    mean = np.zeros((n, c), np.float64)
    deg = np.zeros(n)
    for s, d in zip(ei[0], ei[1]):
        mean[s] += h[d]
        deg[s] += 1
    mean = mean / (deg[:, None] + 1e-16)
    powed = np.power(np.maximum(mean, 0.0), 1.0 / temp)
    sharp = powed / (powed + 1e-16).sum(-1, keepdims=True)
    kl = (sharp * (np.log(np.maximum(sharp, 1e-30)) - h)).sum(-1)
    conf = mean.max(-1) > 0.0
    sel = noisy & conf
    expect = (kl * sel).sum() / max(sel.sum(), 1)

    got = neighbor_align(jnp.asarray(ei), jnp.asarray(h), jnp.asarray(noisy),
                         temp=temp, ncr_conf=0.0)
    np.testing.assert_allclose(float(got), expect, rtol=1e-4)


def test_bce_expert_loss2_parity():
    rng = np.random.default_rng(11)
    b = 17
    p1 = rng.normal(size=b).astype(np.float32)
    p2 = rng.normal(size=b).astype(np.float32)
    ng = rng.normal(size=b).astype(np.float32)
    bce = torch.nn.BCEWithLogitsLoss()
    pos = torch.tensor(np.concatenate([p1, p2]))
    ref = (bce(pos, torch.ones_like(pos))
           + bce(torch.tensor(ng), torch.zeros(b))).item()
    got = bce_expert_loss2(jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(ng))
    np.testing.assert_allclose(float(got), ref, rtol=1e-5)


def test_discriminator_innerprod2():
    rng = np.random.default_rng(13)
    h, hp1, hp2, hn = (rng.normal(size=(5, 8)).astype(np.float32)
                       for _ in range(4))
    l1, l2, ln = discriminator_innerprod2(
        jnp.asarray(h), jnp.asarray(hp1), jnp.asarray(hp2), jnp.asarray(hn))
    np.testing.assert_allclose(np.asarray(l1), (h * hp1).sum(-1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(l2), (h * hp2).sum(-1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ln), (h * hn).sum(-1), rtol=1e-5)


def test_topk_accuracy():
    logits = jnp.asarray([
        [0.1, 0.9, 0.0, 0.0],   # top1 = 1
        [0.8, 0.1, 0.05, 0.05], # top1 = 0, top2 = {0,1}
        [0.3, 0.4, 0.2, 0.1],   # top1 = 1, top2 = {1,0}
    ])
    y = jnp.asarray([1, 1, 0])
    top1, top2 = topk_accuracy(logits, y, topk=(1, 2))
    np.testing.assert_allclose(float(top1), 100.0 / 3, rtol=1e-5)
    np.testing.assert_allclose(float(top2), 100.0, rtol=1e-5)


def test_augment_edges_neg_all_new_and_symmetric():
    rng = np.random.default_rng(5)
    n = 40
    # random undirected base graph
    a = rng.integers(0, n, 60)
    b = rng.integers(0, n, 60)
    keep = a != b
    ei = np.concatenate(
        [np.stack([a[keep], b[keep]]), np.stack([b[keep], a[keep]])], axis=1
    )
    base_pairs = {(min(s, d), max(s, d)) for s, d in zip(ei[0], ei[1])}
    out = augment_edges_neg(ei, n, rng=np.random.default_rng(9))
    out_pairs = {(min(s, d), max(s, d)) for s, d in zip(out[0], out[1])}
    # adversarial graph: as many NEW pairs as the base graph, none shared,
    # emitted symmetrically, no self loops (reference augmentation.py:181-217)
    assert len(out_pairs) == len(base_pairs)
    assert not (out_pairs & base_pairs)
    assert out.shape[1] == 2 * len(out_pairs)
    assert set(zip(out[0].tolist(), out[1].tolist())) == set(
        zip(out[1].tolist(), out[0].tolist()))
    assert np.all(out[0] != out[1])


def test_augment_edges_pos_exact_count():
    rng = np.random.default_rng(5)
    n = 60
    a = rng.integers(0, n, 120)
    b = rng.integers(0, n, 120)
    keep = a != b
    ei = np.concatenate(
        [np.stack([a[keep], b[keep]]), np.stack([b[keep], a[keep]])], axis=1
    )
    base_pairs = {(min(s, d), max(s, d)) for s, d in zip(ei[0], ei[1])}
    out = augment_edges_pos(ei, n, prob=0.25, rng=np.random.default_rng(2))
    out_pairs = {(min(s, d), max(s, d)) for s, d in zip(out[0], out[1])}
    n_del = int(0.25 * len(base_pairs))
    n_add = int(0.25 * len(base_pairs))
    # exact-count semantics: |kept| = |base| - n_del, plus exactly n_add new
    assert len(out_pairs & base_pairs) == len(base_pairs) - n_del
    assert len(out_pairs - base_pairs) == n_add


def test_fast_take_matches_take():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(500, 12)).astype(np.float32))
    # 8192 = above threshold AND divisible by 1024 -> padded path
    idx = jnp.asarray(rng.integers(0, 500, 8192).astype(np.int32))
    np.testing.assert_array_equal(
        np.asarray(fast_take(x, idx)), np.asarray(jnp.take(x, idx, axis=0)))
    # 2D index block on a 1D operand (sampler's children gather shape)
    idx2 = jnp.asarray(rng.integers(0, 500, (1024, 8)).astype(np.int32))
    v = jnp.asarray(rng.normal(size=500).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(fast_take(v, idx2)), np.asarray(jnp.take(v, idx2)))
