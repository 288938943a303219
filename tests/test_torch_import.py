"""End-to-end parity: torch golden model -> state_dict import -> same logits."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import flax

from stswincl_tpu.models import TswinPlus
from stswincl_tpu.ckpt import import_tswinplus_state_dict

from tests.torch_ref import TTswinPlus


def _tree_paths(tree, prefix=()):
    out = []
    for k, v in tree.items():
        if isinstance(v, dict):
            out += _tree_paths(v, prefix + (k,))
        else:
            out.append((prefix + (k,), tuple(v.shape)))
    return out


def test_full_model_logit_parity(rng):
    H, W = 128, 192
    num_classes = 12
    tm = TTswinPlus(num_classes, resolution=(H // 8, W // 8)).eval()
    # randomize BN running stats so eval-mode parity is nontrivial
    with torch.no_grad():
        for mod in tm.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.2, 0.2)
                mod.running_var.uniform_(0.7, 1.3)

    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params, stats, unmatched = import_tswinplus_state_dict(sd)
    # every tensor except derived buffers must be consumed
    assert unmatched == [], f"unmatched keys: {unmatched[:10]}"

    jm = TswinPlus(num_classes=num_classes)
    x = rng.standard_normal((1, 4, H, W, 3)).astype(np.float32)
    init_vars = jm.init(jax.random.key(0), jnp.asarray(x), train=False)

    # imported trees must cover exactly the same leaves as a fresh init
    got_p = set(p for p, _ in _tree_paths(params))
    want_p = set(p for p, _ in _tree_paths(
        flax.core.unfreeze(init_vars["params"])))
    assert got_p == want_p, (
        f"missing: {sorted(want_p - got_p)[:5]} extra: {sorted(got_p - want_p)[:5]}")
    got_s = set(p for p, _ in _tree_paths(stats))
    want_s = set(p for p, _ in _tree_paths(
        flax.core.unfreeze(init_vars["batch_stats"])))
    assert got_s == want_s

    # shapes must agree leaf-by-leaf
    init_shapes = dict(_tree_paths(flax.core.unfreeze(init_vars["params"])))
    for p, shp in _tree_paths(params):
        assert init_shapes[p] == shp, f"{p}: {shp} vs {init_shapes[p]}"

    variables = {"params": params, "batch_stats": stats}
    y_jax = jm.apply(variables, jnp.asarray(x), train=False)

    with torch.no_grad():
        xt = torch.from_numpy(x.transpose(0, 1, 4, 2, 3)).contiguous()
        y_t = tm(xt).numpy().transpose(0, 2, 3, 1)

    np.testing.assert_allclose(np.asarray(y_jax), y_t, rtol=1e-4, atol=1e-4)


def test_torchvision_resnet18_import(rng):
    """A hand-built torchvision-style resnet18 state_dict must land in the
    stem/layer1/layer2 subtrees and reproduce activations."""
    from stswincl_tpu.ckpt import import_torchvision_resnet18
    from stswincl_tpu.models.resnet import ResNet18OS8
    from tests.torch_ref import TResNetOS8

    tm = TResNetOS8().eval()
    with torch.no_grad():
        for mod in tm.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.1, 0.1)
                mod.running_var.uniform_(0.8, 1.2)
    # build a torchvision-style dict from the nested-Sequential replica
    sd = {}
    for k, v in tm.state_dict().items():
        if k.startswith("resnet.0."):
            sd["conv1." + k[len("resnet.0."):]] = v.numpy()
        elif k.startswith("resnet.1."):
            sd["bn1." + k[len("resnet.1."):]] = v.numpy()
        elif k.startswith("resnet.4."):
            sd["layer1." + k[len("resnet.4."):]] = v.numpy()
        elif k.startswith("resnet.5."):
            sd["layer2." + k[len("resnet.5."):]] = v.numpy()
    params, stats, um = import_torchvision_resnet18(sd)
    assert um == []
    assert "stem" in params and "layer1_0" in params and "layer2_1" in params
    assert "layer4_0" not in params  # dilated stages stay fresh

    # merged into a fresh init, the stem+layer1/2 activations must match
    jm = ResNet18OS8()
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    v0 = jm.init(jax.random.key(0), jnp.asarray(x), train=False)
    merged_p = dict(flax.core.unfreeze(v0["params"]))
    merged_s = dict(flax.core.unfreeze(v0["batch_stats"]))
    merged_p.update(params)
    merged_s.update(stats)
    y = jm.apply({"params": merged_p, "batch_stats": merged_s},
                 jnp.asarray(x), train=False)
    assert y.shape == (1, 8, 8, 512)
