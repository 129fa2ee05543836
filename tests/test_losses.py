"""Loss parity tests — the reference math is replicated in-test with
torch (CPU) / numpy and compared against the on-device implementations."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from noise_gnn_tpu.losses import (
    backward_correction,
    bce_expert_loss,
    codi_loss,
    ct_loss,
    cross_entropy,
    discriminator_innerprod,
    fix_cr,
    forget_rate_schedule,
    get_uncertainty,
    jensen_shannon,
)


def ref_ct_loss(y1, y2, y_noise, forget_rate, clean):
    """Reference CTLoss semantics (src/utils/losses.py:19-49)."""
    t1, t2 = torch.tensor(y1), torch.tensor(y2)
    tn = torch.tensor(y_noise).long()
    l1 = F.cross_entropy(t1, tn, reduction="none")
    l2 = F.cross_entropy(t2, tn, reduction="none")
    i1 = np.argsort(l1.numpy(), kind="stable")
    i2 = np.argsort(l2.numpy(), kind="stable")
    num_remember = int((1 - forget_rate) * len(l1))
    pure1 = clean[i1[:num_remember]].sum() / num_remember
    pure2 = clean[i2[:num_remember]].sum() / num_remember
    loss1 = F.cross_entropy(t1[i2[:num_remember]], tn[i2[:num_remember]]).item()
    loss2 = F.cross_entropy(t2[i1[:num_remember]], tn[i1[:num_remember]]).item()
    return loss1, loss2, pure1, pure2, i1[:num_remember], i2[:num_remember]


def test_ct_loss_parity():
    rng = np.random.default_rng(0)
    b, c = 64, 7
    y1 = rng.standard_normal((b, c)).astype(np.float32)
    y2 = rng.standard_normal((b, c)).astype(np.float32)
    yn = rng.integers(0, c, b).astype(np.int32)
    clean = rng.random(b) < 0.7
    for fr in (0.0, 0.2, 0.45):
        out = ct_loss(jnp.asarray(y1), jnp.asarray(y2), jnp.asarray(yn), jnp.float32(fr), jnp.asarray(clean))
        w1, w2, p1, p2, sel1, sel2 = ref_ct_loss(y1, y2, yn, fr, clean)
        np.testing.assert_allclose(float(out.loss_1), w1, rtol=1e-4)
        np.testing.assert_allclose(float(out.loss_2), w2, rtol=1e-4)
        np.testing.assert_allclose(float(out.pure_ratio_1), p1, rtol=1e-5)
        np.testing.assert_allclose(float(out.pure_ratio_2), p2, rtol=1e-5)
        np.testing.assert_array_equal(np.sort(np.nonzero(np.asarray(out.keep_1))[0]), np.sort(sel1))
        np.testing.assert_array_equal(np.sort(np.nonzero(np.asarray(out.keep_2))[0]), np.sort(sel2))


def test_ct_loss_padded_batch():
    rng = np.random.default_rng(1)
    b, c, valid = 32, 5, 20
    y1 = rng.standard_normal((b, c)).astype(np.float32)
    y2 = rng.standard_normal((b, c)).astype(np.float32)
    yn = rng.integers(0, c, b).astype(np.int32)
    clean = rng.random(b) < 0.5
    mask = np.arange(b) < valid
    out = ct_loss(
        jnp.asarray(y1), jnp.asarray(y2), jnp.asarray(yn), jnp.float32(0.25),
        jnp.asarray(clean), sample_mask=jnp.asarray(mask),
    )
    w1, w2, p1, p2, _, _ = ref_ct_loss(y1[:valid], y2[:valid], yn[:valid], 0.25, clean[:valid])
    np.testing.assert_allclose(float(out.loss_1), w1, rtol=1e-4)
    np.testing.assert_allclose(float(out.pure_ratio_2), p2, rtol=1e-5)
    assert not np.asarray(out.keep_1)[valid:].any()
    assert not np.asarray(out.noisy_1)[valid:].any()


def test_codi_loss_parity():
    """CoDis: CE - lambda*JS ranking, plain-CE exchange (losses.py:106-137)."""
    rng = np.random.default_rng(2)
    b, c, lam, fr = 48, 6, 0.15, 0.3
    y1 = rng.standard_normal((b, c)).astype(np.float32)
    y2 = rng.standard_normal((b, c)).astype(np.float32)
    yn = rng.integers(0, c, b).astype(np.int32)
    clean = rng.random(b) < 0.6

    t1, t2, tn = torch.tensor(y1), torch.tensor(y2), torch.tensor(yn).long()
    p1s, p2s = F.softmax(t1, 1), F.softmax(t2, 1)
    m = (p1s + p2s) / 2
    js = (
        F.kl_div(F.log_softmax(t1, 1), m, reduction="none")
        + F.kl_div(F.log_softmax(t2, 1), m, reduction="none")
    ).sum(1) / 2
    l1 = F.cross_entropy(t1, tn, reduction="none") - lam * js
    l2 = F.cross_entropy(t2, tn, reduction="none") - lam * js
    i1 = np.argsort(l1.detach().numpy(), kind="stable")
    i2 = np.argsort(l2.detach().numpy(), kind="stable")
    nr = int((1 - fr) * b)
    want1 = F.cross_entropy(t1[i2[:nr]], tn[i2[:nr]]).item()
    want2 = F.cross_entropy(t2[i1[:nr]], tn[i1[:nr]]).item()

    out = codi_loss(jnp.asarray(y1), jnp.asarray(y2), jnp.asarray(yn), jnp.float32(fr), jnp.asarray(clean), co_lambda=lam)
    np.testing.assert_allclose(float(out.loss_1), want1, rtol=1e-4)
    np.testing.assert_allclose(float(out.loss_2), want2, rtol=1e-4)


def test_backward_correction_parity():
    rng = np.random.default_rng(3)
    b, c = 16, 5
    logits = rng.standard_normal((b, c)).astype(np.float32)
    labels = rng.integers(0, c, b).astype(np.int64)
    cmat = 0.7 * np.eye(c) + 0.3 / (c - 1) * (np.ones((c, c)) - np.eye(c))

    c_inv = torch.tensor(np.linalg.inv(cmat).astype(np.float32))
    oh = torch.zeros(b, c).scatter_(1, torch.tensor(labels).view(-1, 1), 1)
    out_t = torch.clamp(F.softmax(torch.tensor(logits), 1), 1e-5, 1 - 1e-5)
    want = -torch.mean(torch.matmul(oh, c_inv) * torch.log(out_t)).item()

    got = float(backward_correction(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(cmat)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_fix_cr_parity():
    """fix_cr: exp(log_softmax) treated as logits for CE (losses.py:215-246)."""
    rng = np.random.default_rng(4)
    n, bs, c = 20, 8, 4
    zp = rng.standard_normal((n, c)).astype(np.float32)
    zn = rng.standard_normal((n, c)).astype(np.float32)
    yp = np.asarray(jax.nn.log_softmax(jnp.asarray(zp), axis=-1))
    yn_ = np.asarray(jax.nn.log_softmax(jnp.asarray(zn), axis=-1))
    w = rng.random(n).astype(np.float32)

    tp, tn = torch.tensor(yp[:bs]), torch.tensor(yn_[:bs])
    pseudo_p, pseudo_n = torch.exp(tp), torch.exp(tn)
    max_probs, max_idx = torch.max(pseudo_p, dim=-1)
    mask = max_probs.ge(0.0).float()
    masked = F.cross_entropy(pseudo_n, max_idx, reduction="none") * mask
    want = (torch.tensor(w[:bs]) * masked).mean().item()

    got = float(fix_cr(jnp.asarray(yp), jnp.asarray(yn_), bs, w=jnp.asarray(w)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_uncertainty_parity():
    """get_uncertainty vs reference sparse-matmul math (losses.py:185-204)."""
    rng = np.random.default_rng(5)
    n, c, e = 10, 4, 30
    y_pure = np.asarray(jax.nn.log_softmax(jnp.asarray(rng.standard_normal((n, c)).astype(np.float32)), -1))
    ei = rng.integers(0, n, (2, e)).astype(np.int32)

    p = np.exp(y_pure)
    a = np.zeros((n, n), np.float32)
    for s, d in zip(ei[0], ei[1]):
        a[s, d] += 1.0
    ptc = a @ p / (a.sum(1, keepdims=True) + 1e-16)
    h = -(ptc * np.log2(ptc + 1e-5)).sum(1)
    want = np.exp(-h / np.log2(c))

    got = np.asarray(get_uncertainty(jnp.asarray(ei), jnp.asarray(y_pure), c))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_discriminator_and_bce():
    rng = np.random.default_rng(6)
    h = rng.standard_normal((9, 5)).astype(np.float32)
    hp = rng.standard_normal((9, 5)).astype(np.float32)
    hn = rng.standard_normal((9, 5)).astype(np.float32)
    lp, ln = discriminator_innerprod(jnp.asarray(h), jnp.asarray(hp), jnp.asarray(hn))
    np.testing.assert_allclose(np.asarray(lp), (h * hp).sum(1), rtol=1e-5)
    crit = torch.nn.BCEWithLogitsLoss()
    want = (
        crit(torch.tensor(np.asarray(lp)), torch.ones(9))
        + crit(torch.tensor(np.asarray(ln)), torch.zeros(9))
    ).item()
    got = float(bce_expert_loss(lp, ln))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_js_divergence():
    p = jnp.asarray([[0.5, 0.5], [0.9, 0.1]])
    np.testing.assert_allclose(np.asarray(jensen_shannon(p, p)), [0.0, 0.0], atol=1e-6)


def test_forget_rate_schedules():
    s = forget_rate_schedule(50, 0.3, 15, 1.2, ct_exp=1, variant="ogb")
    assert s.shape == (50,)
    np.testing.assert_allclose(s[0], 0.0)
    np.testing.assert_allclose(s[14], 0.3, rtol=1e-6)
    np.testing.assert_allclose(s[20], 0.3 * 1.2, rtol=1e-6)
    s2 = forget_rate_schedule(30, 0.4, 5, 1.1, warmup=15, variant="contrast")
    np.testing.assert_allclose(s2[20], 1.0)
    np.testing.assert_allclose(s2[10], 0.4 * 1.1, rtol=1e-6)


def test_cross_entropy_matches_torch():
    rng = np.random.default_rng(7)
    logits = rng.standard_normal((10, 6)).astype(np.float32)
    labels = rng.integers(0, 6, 10)
    want = F.cross_entropy(torch.tensor(logits), torch.tensor(labels), reduction="none").numpy()
    got = np.asarray(cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(got, want, rtol=1e-5)
