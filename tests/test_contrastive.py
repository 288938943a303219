"""Contrastive-loss algebra: class-sum rewrite vs naive (B,HW,HW) masks."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from stswincl_tpu.ops import class_sum_contrastive_loss, pixel_pair_stats


def torch_regression_loss(q, keysets, labels_q, labels_k, class_num):
    """Naive torch implementation of reference regression_loss semantics
    (PixPro_swin_v5.py:71-129) with an arbitrary number of key sets.
    q: (N, C, HW); keysets: list of (N, C, HW); labels: (N, HW)."""

    def onehot(lbl):
        return F.one_hot(lbl.long(), num_classes=class_num).float()

    oq = onehot(labels_q)
    pos_num, pos_den = 0.0, 0.0
    Nterm = 0.0
    for k, lk in zip(keysets, labels_k):
        logit = torch.bmm(q.transpose(1, 2), k)  # (N, HW, HW)
        mask_p = torch.bmm(oq, onehot(lk).transpose(1, 2))
        mask_n = 1 - mask_p
        pos_num = pos_num + (mask_p * logit).sum(-1)
        pos_den = pos_den + mask_p.sum(-1)
        Nterm = Nterm + (mask_n * logit).sum(-1) / (mask_n.sum(-1) + 1e-6)
    P = pos_num / (pos_den + 1e-6)
    P_exp, N_exp = torch.exp(P), torch.exp(Nterm)
    return -torch.mean(torch.log(P_exp / (P_exp + N_exp) + 1e-6)).item()


def _make_case(rng, B=2, HW=60, D=16, class_num=5, n_sets=5):
    def feat():
        x = rng.standard_normal((B, HW, D)).astype(np.float32)
        return x / np.linalg.norm(x, axis=-1, keepdims=True)

    q = feat()
    lq = rng.integers(0, class_num, size=(B, HW)).astype(np.int32)
    ks, lks = [], []
    for _ in range(n_sets):
        ks.append(feat())
        lks.append(rng.integers(0, class_num, size=(B, HW)).astype(np.int32))
    return q, lq, ks, lks


def test_loss_matches_naive_torch(rng):
    class_num = 5
    q, lq, ks, lks = _make_case(rng, class_num=class_num)
    got = class_sum_contrastive_loss(
        jnp.asarray(q), jnp.asarray(lq),
        [(jnp.asarray(k), jnp.asarray(l)) for k, l in zip(ks, lks)], class_num,
    )
    want = torch_regression_loss(
        torch.from_numpy(q.transpose(0, 2, 1)),
        [torch.from_numpy(k.transpose(0, 2, 1)) for k in ks],
        torch.from_numpy(lq), [torch.from_numpy(l) for l in lks], class_num,
    )
    np.testing.assert_allclose(float(got), want, rtol=1e-5, atol=1e-6)


def test_stats_match_naive_numpy(rng):
    class_num = 7
    q, lq, ks, lks = _make_case(rng, B=1, HW=30, D=8, class_num=class_num, n_sets=2)
    P, N = pixel_pair_stats(
        jnp.asarray(q), jnp.asarray(lq),
        [(jnp.asarray(k), jnp.asarray(l)) for k, l in zip(ks, lks)], class_num,
    )
    # naive per-pixel
    pos_num = np.zeros((1, 30)); pos_den = np.zeros((1, 30)); neg = np.zeros((1, 30))
    for k, lk in zip(ks, lks):
        sims = q @ k.transpose(0, 2, 1)  # (1, HW, HW)
        same = (lq[:, :, None] == lk[:, None, :]).astype(np.float32)
        pos_num += (sims * same).sum(-1)
        pos_den += same.sum(-1)
        neg += (sims * (1 - same)).sum(-1) / ((1 - same).sum(-1) + 1e-6)
    np.testing.assert_allclose(np.asarray(P), pos_num / (pos_den + 1e-6), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(N), neg, rtol=1e-4, atol=1e-5)


def test_missing_class_in_keys(rng):
    # a query pixel whose class never appears in any key set: P term -> 0/eps
    class_num = 4
    q, lq, ks, lks = _make_case(rng, B=1, HW=20, D=8, class_num=class_num, n_sets=2)
    lq[:] = 3
    for l in lks:
        l[:] = l % 3  # class 3 absent from keys
    got = class_sum_contrastive_loss(
        jnp.asarray(q), jnp.asarray(lq),
        [(jnp.asarray(k), jnp.asarray(l)) for k, l in zip(ks, lks)], class_num,
    )
    want = torch_regression_loss(
        torch.from_numpy(q.transpose(0, 2, 1)),
        [torch.from_numpy(k.transpose(0, 2, 1)) for k in ks],
        torch.from_numpy(lq), [torch.from_numpy(l) for l in lks], class_num,
    )
    np.testing.assert_allclose(float(got), want, rtol=1e-5, atol=1e-6)
