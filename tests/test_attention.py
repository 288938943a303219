"""Parity test for joint space-time window attention vs a torch mini-impl."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from stswincl_tpu.ops import (
    space_time_window_attention,
    relative_position_index,
    shifted_window_attention_mask,
)


def torch_space_time_attn(q, k, v, bias_table, rel_index, mask, scale, T):
    # q,k,v: (Bw, heads, T*N, d); bias_table: (num_rel, heads); mask: (nW,N,N)
    attn = (q * scale) @ k.transpose(-2, -1)
    N = rel_index.shape[0]
    bias = bias_table[rel_index.reshape(-1)].reshape(N, N, -1).permute(2, 0, 1)
    bias = bias.repeat(1, T, T)
    attn = attn + bias.unsqueeze(0)
    if mask is not None:
        m = mask.repeat(1, T, T)
        nW = m.shape[0]
        Bw, heads, TN, _ = attn.shape
        attn = attn.view(Bw // nW, nW, heads, TN, TN) + m.unsqueeze(1).unsqueeze(0)
        attn = attn.view(Bw, heads, TN, TN)
    attn = F.softmax(attn, dim=-1)
    return attn @ v


def _run_case(with_mask, rng):
    T, ws, heads, d = 2, 4, 2, 8
    H, W = 8, 12
    nW = (H // ws) * (W // ws)
    B = 2
    Bw = B * nW
    N = ws * ws
    q = rng.standard_normal((Bw, heads, T * N, d)).astype(np.float32)
    k = rng.standard_normal((Bw, heads, T * N, d)).astype(np.float32)
    v = rng.standard_normal((Bw, heads, T * N, d)).astype(np.float32)
    table = rng.standard_normal(((2 * ws - 1) ** 2, heads)).astype(np.float32) * 0.02
    idx = relative_position_index(ws, ws)
    bias = table[idx.reshape(-1)].reshape(N, N, heads).transpose(2, 0, 1)
    mask = shifted_window_attention_mask(H, W, ws, 2) if with_mask else None
    scale = d ** -0.5

    ours = space_time_window_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(bias),
        jnp.asarray(mask) if mask is not None else None, scale,
    )
    theirs = torch_space_time_attn(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v),
        torch.from_numpy(table), torch.from_numpy(idx.astype(np.int64)),
        torch.from_numpy(mask) if mask is not None else None, scale, T,
    )
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=1e-5, atol=1e-5)


def test_attention_no_mask(rng):
    _run_case(False, rng)


def test_attention_with_mask(rng):
    _run_case(True, rng)
