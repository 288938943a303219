"""OHEM CE parity vs a torch implementation of the reference semantics."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from stswincl_tpu.ops import ohem_cross_entropy


def torch_ohem(logits, labels, n_min, thresh=0.7, ignore_index=-1):
    # reference semantics: losses.py:16-40
    loss = F.cross_entropy(
        logits, labels, ignore_index=ignore_index, reduction="none"
    ).view(-1)
    loss, _ = torch.sort(loss, descending=True)
    t = -math.log(thresh)
    if loss[n_min] > t:
        loss = loss[loss > t]
    else:
        loss = loss[:n_min]
    return loss.mean().item()


def _case(rng, scale, n_min, with_ignore=False):
    B, C, H, W = 2, 12, 16, 20
    logits = (rng.standard_normal((B, C, H, W)) * scale).astype(np.float32)
    labels = rng.integers(0, C, size=(B, H, W)).astype(np.int64)
    if with_ignore:
        labels[rng.random((B, H, W)) < 0.3] = -1
    want = torch_ohem(torch.from_numpy(logits), torch.from_numpy(labels), n_min)
    got = ohem_cross_entropy(
        jnp.asarray(logits.transpose(0, 2, 3, 1)), jnp.asarray(labels), n_min
    )
    np.testing.assert_allclose(float(got), want, rtol=1e-5, atol=1e-6)


def test_ohem_topk_branch(rng):
    # small logits -> losses near log(C) > -log(0.7): threshold branch
    _case(rng, scale=0.01, n_min=40)


def test_ohem_thresh_branch(rng):
    _case(rng, scale=0.01, n_min=10)


def test_ohem_confident_topk(rng):
    # large-scale logits -> most losses tiny -> top-k branch
    _case(rng, scale=8.0, n_min=100)


def test_ohem_with_ignore(rng):
    _case(rng, scale=0.01, n_min=40, with_ignore=True)


def test_ohem_jit_static(rng):
    f = jax.jit(lambda lg, lb: ohem_cross_entropy(lg, lb, 40))
    logits = jnp.asarray(rng.standard_normal((2, 16, 20, 12)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 12, size=(2, 16, 20)).astype(np.int32))
    v = f(logits, labels)
    assert np.isfinite(float(v))


def test_ohem_select_matches_sort_oracle(rng):
    """The sort-free selection (bit-bisection order statistic) must equal
    the sort transcription bitwise-ish, including heavy ties at the k-th
    value and at the threshold."""
    from stswincl_tpu.ops.ohem import _ohem_select, _ohem_select_sort

    t = math.log(1.0 / 0.7)
    cases = [
        rng.random(4096).astype(np.float32) * 3.0,            # generic
        np.repeat(rng.random(32).astype(np.float32), 128),    # massive ties
        np.zeros(4096, np.float32),                           # all zero
        np.full(4096, t, np.float32),                         # all == thresh
        np.concatenate([np.full(100, 5.0, np.float32),        # hard block
                        np.zeros(3996, np.float32)]),
    ]
    for loss in cases:
        for n_min in (1, 100, 512, 4000):
            a = float(_ohem_select(jnp.asarray(loss), n_min, 0.7))
            b = float(_ohem_select_sort(jnp.asarray(loss), n_min, 0.7))
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7), (
                loss[:4], n_min)


def test_ohem_channels_first_matches_nhwc(rng):
    from stswincl_tpu.ops.ohem import ohem_cross_entropy_channels_first

    B, C, H, W = 2, 12, 16, 20
    logits = rng.standard_normal((B, H, W, C)).astype(np.float32)
    labels = rng.integers(0, C, size=(B, H, W)).astype(np.int32)
    labels[rng.random((B, H, W)) < 0.2] = -1
    a = ohem_cross_entropy(jnp.asarray(logits), jnp.asarray(labels), 40)
    b = ohem_cross_entropy_channels_first(
        jnp.asarray(logits.transpose(0, 3, 1, 2)), jnp.asarray(labels), 40)
    np.testing.assert_allclose(float(a), float(b), rtol=1e-5)


def test_per_pixel_ce_cf(rng):
    from stswincl_tpu.ops.ohem import per_pixel_ce_channels_first
    import torch
    import torch.nn.functional as F

    B, C, H, W = 2, 5, 8, 8
    logits = rng.standard_normal((B, C, H, W)).astype(np.float32)
    labels = rng.integers(0, C, size=(B, H, W)).astype(np.int64)
    got = per_pixel_ce_channels_first(jnp.asarray(logits), jnp.asarray(labels))
    want = F.cross_entropy(torch.from_numpy(logits), torch.from_numpy(labels),
                           reduction="none").numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)
