"""Checkpoint save/load roundtrip + stage translation tests."""

import numpy as np
import jax
import jax.numpy as jnp

from stswincl_tpu.ckpt import (
    save_checkpoint,
    load_checkpoint,
    latest_step,
    translate_seg_to_pretrain,
    translate_pretrain_to_seg,
)


def _tree(seed):
    k = jax.random.key(seed)
    return {
        "params": {"a": jax.random.normal(k, (4, 3)), "b": {"c": jnp.ones((2,))}},
        "step": jnp.asarray(seed),
    }


def test_roundtrip(tmp_path):
    d = str(tmp_path / "ckpt")
    t5, t9 = _tree(5), _tree(9)
    save_checkpoint(d, 5, t5)
    save_checkpoint(d, 9, t9)
    assert latest_step(d) == 9
    back = load_checkpoint(d, target=t9)
    np.testing.assert_array_equal(np.asarray(back["params"]["a"]),
                                  np.asarray(t9["params"]["a"]))
    back5 = load_checkpoint(d, step=5, target=t5)
    assert int(back5["step"]) == 5


def test_stage_translation_roundtrip():
    seg = {
        "resnet": {"w": np.full((2, 2), 1.0)},
        "swin": {"w": np.full((3,), 2.0)},
        "aspp": {"w": np.full((4,), 3.0)},
        "project1": {"w": np.full((1,), 4.0)},
        "project2": {"w": np.full((1,), 5.0)},
        "project3": {"w": np.full((1,), 6.0)},
        "classifier": {"w": np.full((5,), 7.0)},
    }
    enc_init = {
        "segmentor": {
            "resnet": {"w": np.zeros((2, 2))},
            "swin": {"w": np.zeros((3,))},
            "aspp": {"w": np.zeros((4,))},
            "project1": {"w": np.zeros((1,))},
            "project2": {"w": np.zeros((1,))},
            "project3": {"w": np.zeros((1,))},
        },
        "projector": {"w": np.full((6,), -1.0)},
    }
    enc, skipped = translate_seg_to_pretrain(seg, enc_init)
    assert skipped == []
    assert enc["segmentor"]["resnet"]["w"][0, 0] == 1.0
    assert enc["projector"]["w"][0] == -1.0  # projector keeps fresh init

    # mutate encoder then translate back to a fresh seg init
    enc["segmentor"]["swin"]["w"] = np.full((3,), 20.0)
    seg_init = {k: {"w": np.zeros_like(v["w"])} for k, v in seg.items()}
    seg2, skipped2 = translate_pretrain_to_seg(enc, seg_init)
    assert skipped2 == []
    assert seg2["swin"]["w"][0] == 20.0
    assert np.all(seg2["classifier"]["w"] == 0.0)  # classifier fresh


def test_translation_tolerates_mismatch():
    seg = {"resnet": {"w": np.ones((2, 2)), "extra": np.ones(3)},
           "swin": {"w": np.ones((9,))}}
    enc_init = {"segmentor": {"resnet": {"w": np.zeros((2, 2))},
                              "swin": {"w": np.zeros((3,))}}}
    enc, skipped = translate_seg_to_pretrain(seg, enc_init)
    assert enc["segmentor"]["resnet"]["w"][0, 0] == 1.0
    assert enc["segmentor"]["swin"]["w"].shape == (3,)  # kept init
    assert any("shape mismatch" in s for s in skipped)
    assert any("missing in target" in s for s in skipped)
