"""Machine-checked parity anchor against the ACTUAL reference code.

Round-1 review finding: `tests/torch_ref.py` (the golden oracle every other
parity test compares against) was itself only hand-verified against the
reference. These tests close that gap in two layers:

  1. When `/root/reference` is on disk, the reference's own
     `SwinTransformerLayerv5` (`seg18/net/Ours/swin_512.py:280-327`) is
     imported directly (timm shims in `reference_import.py`) and compared
     against the replica under identical weights.
  2. A checked-in fixture (`tests/fixtures/reference_swin_golden.npz`,
     generated once from the reference by `tools/gen_reference_fixture.py`)
     pins the reference's numeric outputs, so drift in the replica or in the
     JAX model/importer is caught even where the reference tree is absent.
"""

import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.reference_import import load_reference_swin, reference_available
from tests.torch_ref import TSwinStack

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "reference_swin_golden.npz")

DIM, HEADS, RES = 16, 4, (16, 16)


def _fixture():
    data = np.load(FIXTURE)
    sd = {k[3:]: torch.from_numpy(data[k]) for k in data.files
          if k.startswith("sd:")}
    return data["input"], data["stage1"], data["stage2"], sd


@pytest.mark.skipif(not reference_available(), reason="reference not on disk")
def test_replica_matches_reference_module():
    """torch_ref.TSwinStack == reference SwinTransformerLayerv5, same
    weights, fresh random input (not the fixture's)."""
    ref_mod = load_reference_swin()
    torch.manual_seed(7)
    ref = ref_mod.SwinTransformerLayerv5(
        dim=DIM, input_resolution=RES, num_heads=HEADS).eval()
    gen = torch.Generator().manual_seed(11)
    sd = ref.state_dict()
    for k, v in sd.items():
        # keep derived buffers (attn_mask) — they are semantics, not weights
        if v.dtype.is_floating_point and not k.endswith("attn_mask"):
            sd[k] = torch.empty_like(v).uniform_(-0.5, 0.5, generator=gen)
    ref.load_state_dict(sd)

    rep = TSwinStack(DIM, RES, HEADS).eval()
    missing, unexpected = rep.load_state_dict(ref.state_dict(), strict=False)
    # only derived integer buffers may differ in registration
    assert all("relative_position_index" in k for k in missing + unexpected), (
        missing, unexpected)

    x = torch.empty((2, 4, DIM, RES[0], RES[1])).uniform_(
        -1.0, 1.0, generator=gen)
    with torch.no_grad():
        r1, r2 = ref(x)
        p1, p2 = rep(x)
    np.testing.assert_allclose(p1.numpy(), r1.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(p2.numpy(), r2.numpy(), rtol=1e-5, atol=1e-5)


def test_replica_matches_checked_in_golden():
    """torch_ref.TSwinStack reproduces the checked-in reference outputs."""
    x, s1, s2, sd = _fixture()
    rep = TSwinStack(DIM, RES, HEADS).eval()
    missing, unexpected = rep.load_state_dict(sd, strict=False)
    assert all("relative_position_index" in k for k in missing + unexpected), (
        missing, unexpected)
    with torch.no_grad():
        p1, p2 = rep(torch.from_numpy(x))
    np.testing.assert_allclose(p1.numpy(), s1, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(p2.numpy(), s2, rtol=1e-5, atol=1e-5)


def test_jax_swin_matches_checked_in_golden():
    """SwinTemporalStack + torch importer reproduce the reference outputs
    (full chain: reference numerics -> importer -> JAX forward)."""
    from stswincl_tpu.ckpt import import_tswinplus_state_dict
    from stswincl_tpu.models.swin import SwinTemporalStack

    x, s1, s2, sd = _fixture()
    params, stats, unmatched = import_tswinplus_state_dict(
        {"swin." + k: v.numpy() for k, v in sd.items()})
    assert not unmatched, unmatched

    model = SwinTemporalStack(dim=DIM, input_resolution=RES, num_heads=HEADS)
    # torch input is (B, T, C, H, W); JAX is NHWC
    xj = jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2)))
    j1, j2 = jax.jit(
        lambda v, a: model.apply(v, a))({"params": params["swin"]}, xj)
    j1 = np.transpose(np.asarray(j1), (0, 1, 4, 2, 3))
    j2 = np.transpose(np.asarray(j2), (0, 1, 4, 2, 3))
    np.testing.assert_allclose(j1, s1, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(j2, s2, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# full-network anchor (round-3): ResNet18-OS8 + TswinPlus imported directly
# ---------------------------------------------------------------------------

FULL_FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                            "reference_full_golden.npz")


def _full_model_input(seed):
    rng = np.random.Generator(np.random.PCG64(int(seed)))
    return torch.from_numpy(
        rng.uniform(-1.0, 1.0, (1, 4, 3, 512, 640)).astype(np.float32))


@pytest.mark.slow
@pytest.mark.skipif(not reference_available(), reason="reference not on disk")
def test_resnet_replica_matches_reference_module():
    """torch_ref.TResNetOS8 == the reference ResNet18_OS8
    (`seg18/net/Ours/resnet.py:93-137`, imported with the torchvision shim),
    same weights — closes the round-2 gap where the resnet half of the
    oracle was only hand-derived."""
    from tests.reference_import import (load_reference_seg18,
                                        patched_torch_load,
                                        randomize_state_dict)
    from tests.torch_ref import TResNetOS8

    _, resnet_mod = load_reference_seg18()
    with patched_torch_load():
        ref = resnet_mod.ResNet18_OS8().eval()
    sd = randomize_state_dict(ref.state_dict(), seed=77)
    ref.load_state_dict(sd)

    rep = TResNetOS8().eval()
    missing, unexpected = rep.load_state_dict(sd, strict=False)
    assert not missing and not unexpected, (missing, unexpected)

    rng = np.random.Generator(np.random.PCG64(9))
    x = torch.from_numpy(
        rng.uniform(-1.0, 1.0, (2, 3, 64, 96)).astype(np.float32))
    with torch.no_grad():
        np.testing.assert_allclose(rep(x).numpy(), ref(x).numpy(),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.slow
@pytest.mark.skipif(not reference_available(), reason="reference not on disk")
def test_full_replica_matches_reference_module():
    """torch_ref.TTswinPlus == the reference TswinPlus
    (`seg18/net/Ours/base18.py:52-119`, imported directly), same weights,
    native 512x640 — the resnet/ASPP/projection/classifier halves of the
    oracle are now machine-checked, not replica-vs-replica."""
    from tests.reference_import import (load_reference_seg18,
                                        patched_torch_load,
                                        randomize_state_dict)
    from tests.torch_ref import TTswinPlus

    base18, _ = load_reference_seg18()
    with patched_torch_load():
        ref = base18.TswinPlus(12).eval()
    sd = randomize_state_dict(ref.state_dict(), seed=123)
    ref.load_state_dict(sd)

    rep = TTswinPlus(12).eval()
    missing, unexpected = rep.load_state_dict(sd, strict=False)
    assert all("relative_position_index" in k for k in missing + unexpected), (
        missing, unexpected)

    x = _full_model_input(5)
    with torch.no_grad():
        want = ref(x).numpy()
        got = rep(x).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_full_replica_matches_checked_in_golden():
    """TTswinPlus reproduces the checked-in full-model reference outputs
    (weights reconstructed from the fixture's PCG64 seed — runs without the
    reference tree). The JAX side is covered transitively: importer/logit
    parity tests pin JAX == TTswinPlus, and this test pins TTswinPlus ==
    reference."""
    from tests.reference_import import randomize_state_dict
    from tests.torch_ref import TTswinPlus

    data = np.load(FULL_FIXTURE)
    rep = TTswinPlus(12).eval()
    sd = randomize_state_dict(rep.state_dict(), int(data["weight_seed"]))
    missing, unexpected = rep.load_state_dict(sd, strict=False)
    assert not missing and not unexpected, (missing, unexpected)

    x = _full_model_input(data["input_seed"])
    with torch.no_grad():
        logits = rep(x).numpy()
    np.testing.assert_allclose(logits[:, :, ::8, ::8],
                               data["logits_strided"],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(logits.mean(), float(data["logits_mean"]),
                               rtol=1e-5)
    np.testing.assert_allclose(np.abs(logits.astype(np.float64)).sum(),
                               float(data["logits_abssum"]), rtol=1e-5)
