"""PyTorch -> JAX weight importer for reference checkpoints.

Translates reference `state_dict` key naming into this framework's flax
variable tree, so a checkpoint trained with the PyTorch reference reproduces
identical logits here (the parity anchor demanded by SURVEY.md §7 step 2).

Covers the reference checkpoint formats:
  * seg-model state_dicts (`.t7`, bare `state_dict`, possibly `module.`
    prefixed by DataParallel — `seg18/utils/summary.py:83-88`);
  * pretrain dicts (`ckpt_epoch_N.pth` with a `model` sub-dict whose keys
    are `pixpro.encoder_1/2/3`, `pixpro.proj1/2/3`, `pixpro.projector`,
    plus momentum `*_k_*` twins — `main_pretrain_swinv5.py:87-103`), with
    the same prefix translation as `load_model_mswin_CL`
    (`seg18/utils/LoadModel.py:6-49`): encoder_1->resnet, encoder_2->swin,
    encoder_3->aspp, proj1/2/3->project1/2/3.

Layout conversions: torch conv (O, I, kh, kw) -> flax (kh, kw, I, O); torch
linear (O, I) -> flax (I, O); BatchNorm weight/bias/running_mean/running_var
-> scale/bias + batch_stats mean/var. `num_batches_tracked` is dropped.

Like the reference's `load_model*` zoo, unknown keys are tolerated and
reported rather than fatal (`strict=False`), since checkpoint surgery
between stages intentionally drops/keeps subtrees.
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _linear(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _set(tree: dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _convbn_paths(dst: Tuple[str, ...], leaf: str, params: dict, stats: dict,
                  value: np.ndarray, kind: str):
    """Route one torch tensor of a Conv/BN pair into params or batch_stats."""
    if kind == "conv.weight":
        _set(params, dst + ("conv", "kernel"), _conv(value))
    elif kind == "conv.bias":
        _set(params, dst + ("conv", "bias"), value)
    elif kind == "bn.weight":
        _set(params, dst + ("bn", "scale"), value)
    elif kind == "bn.bias":
        _set(params, dst + ("bn", "bias"), value)
    elif kind == "bn.running_mean":
        _set(stats, dst + ("bn", "mean"), value)
    elif kind == "bn.running_var":
        _set(stats, dst + ("bn", "var"), value)
    else:
        raise KeyError(kind)


_RESNET_BLOCK_SUB = {
    "conv1": ("cb1", "conv.weight"),
    "bn1": ("cb1", "bn"),
    "conv2": ("cb2", "conv.weight"),
    "bn2": ("cb2", "bn"),
    "downsample.0": ("downsample", "conv.weight"),
    "downsample.1": ("downsample", "bn"),
}

_ASPP_MAP = {
    "conv_1x1_1": "branch_1x1",
    "bn_conv_1x1_1": "branch_1x1",
    "conv_3x3_1": "branch_r6",
    "bn_conv_3x3_1": "branch_r6",
    "conv_3x3_2": "branch_r12",
    "bn_conv_3x3_2": "branch_r12",
    "conv_3x3_3": "branch_r18",
    "bn_conv_3x3_3": "branch_r18",
    "conv_1x1_2": "branch_img",
    "bn_conv_1x1_2": "branch_img",
    "conv_1x1_3": "fuse",
    "bn_conv_1x1_3": "fuse",
}


def _import_resnet(key: str, value, params, stats) -> bool:
    """Handle `resnet.*` keys. Returns True if consumed."""
    parts = key.split(".")
    if parts[0] != "resnet":
        return False
    rest = parts[1:]
    # torchvision stem/early layers live under a nested Sequential:
    # resnet.resnet.{0=conv1,1=bn1,4=layer1,5=layer2}...
    if rest[0] == "resnet":
        idx = rest[1]
        if idx == "0" and rest[2] == "weight":
            _set(params, ("resnet", "stem", "conv", "kernel"), _conv(value))
            return True
        if idx == "1":
            kind = {"weight": "bn.weight", "bias": "bn.bias",
                    "running_mean": "bn.running_mean",
                    "running_var": "bn.running_var"}.get(rest[2])
            if kind is None:
                return True  # num_batches_tracked
            _convbn_paths(("resnet", "stem"), rest[2], params, stats, value,
                          kind)
            return True
        if idx in ("4", "5"):
            layer = {"4": "layer1", "5": "layer2"}[idx]
            block = rest[2]
            sub = ".".join(rest[3:-1])
            leaf = rest[-1]
            return _route_block(("resnet", f"{layer}_{block}"), sub, leaf,
                                value, params, stats)
        return True  # relu / maxpool have no params
    # dilated stages: resnet.layer4.{b}..., resnet.layer5.{b}...
    if rest[0] in ("layer4", "layer5"):
        block = rest[1]
        sub = ".".join(rest[2:-1])
        leaf = rest[-1]
        return _route_block(("resnet", f"{rest[0]}_{block}"), sub, leaf,
                            value, params, stats)
    return False


def _route_block(dst: Tuple[str, ...], sub: str, leaf: str, value,
                 params, stats) -> bool:
    """Route a BasicBlock tensor (conv1/bn1/conv2/bn2/downsample.{0,1})."""
    if leaf == "num_batches_tracked":
        return True
    if sub in ("conv1", "conv2", "downsample.0"):
        target, _ = _RESNET_BLOCK_SUB[sub]
        _convbn_paths(dst + (target,), leaf, params, stats, value, "conv.weight")
        return True
    if sub in ("bn1", "bn2", "downsample.1"):
        target, _ = _RESNET_BLOCK_SUB[sub]
        _convbn_paths(dst + (target,), leaf, params, stats, value,
                      f"bn.{leaf}")
        return True
    return False


def _import_swin(key: str, value, params, stats) -> bool:
    parts = key.split(".")
    if parts[0] != "swin":
        return False
    rest = parts[1:]
    if rest[0] == "layers":
        i, which = rest[1], rest[2]  # layer index, 0 (W) or 1 (SW)
        name = f"layers_{i}_" + ("w" if which == "0" else "sw")
        sub, leaf = rest[3], rest[-1]
        if sub == "attn_mask":  # derived buffer, recomputed host-side
            return True
        if sub == "attn":
            field = rest[4]
            if field == "relative_position_bias_table":
                _set(params, ("swin", name, "attn",
                              "relative_position_bias_table"), value)
            elif field in ("qkv", "proj"):
                if leaf == "weight":
                    _set(params, ("swin", name, "attn", field, "kernel"),
                         _linear(value))
                else:
                    _set(params, ("swin", name, "attn", field, "bias"), value)
            # relative_position_index buffer: derived constant, skip
            return True
        if sub in ("norm1", "norm2"):
            _set(params, ("swin", name, sub,
                          "scale" if leaf == "weight" else "bias"), value)
            return True
        if sub == "mlp":
            fc = rest[4]
            if leaf == "weight":
                _set(params, ("swin", name, "mlp", fc, "kernel"), _linear(value))
            else:
                _set(params, ("swin", name, "mlp", fc, "bias"), value)
            return True
        return False
    if rest[0] == "downsample":
        sub, leaf = rest[1], rest[-1]
        if sub == "norm":
            _set(params, ("swin", "downsample", "norm",
                          "scale" if leaf == "weight" else "bias"), value)
        elif sub == "reduction":
            _set(params, ("swin", "downsample", "reduction", "kernel"),
                 _linear(value))
        return True
    return False


def _import_aspp(key: str, value, params, stats) -> bool:
    parts = key.split(".")
    if parts[0] != "aspp":
        return False
    sub, leaf = parts[1], parts[-1]
    if sub == "conv_1x1_4":
        if leaf == "weight":
            _set(params, ("aspp", "out_conv", "kernel"), _conv(value))
        else:
            _set(params, ("aspp", "out_conv", "bias"), value)
        return True
    if sub in _ASPP_MAP:
        dst = ("aspp", _ASPP_MAP[sub])
        if sub.startswith("conv"):
            _convbn_paths(dst, leaf, params, stats, value, f"conv.{leaf}")
        else:
            if leaf == "num_batches_tracked":
                return True
            _convbn_paths(dst, leaf, params, stats, value, f"bn.{leaf}")
        return True
    return False


def _import_project(key: str, value, params, stats) -> bool:
    parts = key.split(".")
    if parts[0] not in ("project1", "project2", "project3", "project"):
        return False
    proj, idx, leaf = parts[0], parts[1], parts[-1]
    if leaf == "num_batches_tracked":
        return True
    if idx == "0":
        _convbn_paths((proj,), leaf, params, stats, value, "conv.weight")
    else:
        _convbn_paths((proj,), leaf, params, stats, value, f"bn.{leaf}")
    return True


def _import_classifier(key: str, value, params, stats) -> bool:
    parts = key.split(".")
    if parts[0] != "classifier":
        return False
    idx, leaf = parts[1], parts[-1]
    if leaf == "num_batches_tracked":
        return True
    if idx == "0":
        _set(params, ("classifier", "conv1", "kernel"), _conv(value))
    elif idx == "1":
        _convbn_paths(("classifier",), leaf, params, stats, value, f"bn.{leaf}")
    elif idx == "3":
        if leaf == "weight":
            _set(params, ("classifier", "conv2", "kernel"), _conv(value))
        else:
            _set(params, ("classifier", "conv2", "bias"), value)
    return True


def _import_projector(key: str, value, params, stats) -> bool:
    """MLP2d projector keys: projector.{linear1,bn1,linear2}.*"""
    parts = key.split(".")
    if parts[0] != "projector":
        return False
    sub, leaf = parts[1], parts[-1]
    if leaf == "num_batches_tracked":
        return True
    if sub in ("linear1", "linear2"):
        if leaf == "weight":
            _set(params, ("projector", sub, "kernel"), _conv(value))
        else:
            _set(params, ("projector", sub, "bias"), value)
    elif sub == "bn1":
        if leaf == "weight":
            _set(params, ("projector", "bn1", "scale"), value)
        elif leaf == "bias":
            _set(params, ("projector", "bn1", "bias"), value)
        elif leaf == "running_mean":
            _set(stats, ("projector", "bn1", "mean"), value)
        elif leaf == "running_var":
            _set(stats, ("projector", "bn1", "var"), value)
    return True


def import_torchvision_resnet18(
    state_dict: Mapping[str, np.ndarray],
) -> Tuple[dict, dict, list]:
    """Import a raw torchvision resnet18 ImageNet state_dict into the
    backbone's stem/layer1/layer2 subtrees (the portion the reference
    initializes from ImageNet, `seg18/net/Ours/resnet.py:98-102`; the
    dilated layer4/layer5 stay at fresh init).

    Returns (params, batch_stats, unmatched) shaped as the `resnet` subtree.
    """
    # translate torchvision naming into the reference's nested-Sequential
    # naming, then reuse the standard importer path
    remapped = {}
    unmatched = []
    for key, value in state_dict.items():
        if key.startswith("conv1."):
            remapped["resnet.resnet.0." + key[len("conv1."):]] = value
        elif key.startswith("bn1."):
            remapped["resnet.resnet.1." + key[len("bn1."):]] = value
        elif key.startswith("layer1."):
            remapped["resnet.resnet.4." + key[len("layer1."):]] = value
        elif key.startswith("layer2."):
            remapped["resnet.resnet.5." + key[len("layer2."):]] = value
        elif key.startswith(("layer3.", "layer4.", "fc.")):
            continue  # not used by the OS8 backbone
        else:
            unmatched.append(key)
    params: dict = {}
    stats: dict = {}
    for key, value in remapped.items():
        if not _import_resnet(key, np.asarray(value), params, stats):
            unmatched.append(key)
    return params.get("resnet", {}), stats.get("resnet", {}), unmatched


def import_tswinplus_state_dict(
    state_dict: Mapping[str, np.ndarray],
) -> Tuple[dict, dict, list]:
    """Import a reference TswinPlus/TswinPlusv5 state_dict.

    Returns (params, batch_stats, unmatched_keys) as nested dicts matching
    `TswinPlus` variable trees (without the top-level collection names).
    """
    params: dict = {}
    stats: dict = {}
    unmatched = []
    for key, value in state_dict.items():
        if key.startswith("module."):
            key = key[len("module."):]
        v = np.asarray(value)
        handled = (
            _import_resnet(key, v, params, stats)
            or _import_swin(key, v, params, stats)
            or _import_aspp(key, v, params, stats)
            or _import_project(key, v, params, stats)
            or _import_classifier(key, v, params, stats)
        )
        if not handled:
            unmatched.append(key)
    return params, stats, unmatched


# load_model_mswin_CL prefix translation (seg18/utils/LoadModel.py:6-49)
_PIXPRO_PREFIX = {
    "pixpro.encoder_1.": "resnet.",
    "pixpro.encoder_2.": "swin.",
    "pixpro.encoder_3.": "aspp.",
    "pixpro.proj1.": "project1.",
    "pixpro.proj2.": "project2.",
    "pixpro.proj3.": "project3.",
    "pixpro.projector.": "projector.",
    # bare (non-ConsistencyLoss-wrapped) naming
    "encoder_1.": "resnet.",
    "encoder_2.": "swin.",
    "encoder_3.": "aspp.",
    "proj1.": "project1.",
    "proj2.": "project2.",
    "proj3.": "project3.",
}


def import_pixpro_state_dict(
    state_dict: Mapping[str, np.ndarray],
    include_momentum: bool = False,
) -> Tuple[dict, dict, list]:
    """Import a reference pretrain (PixPro) state_dict into seg-model trees.

    Query-branch weights are mapped through the `load_model_mswin_CL`
    prefix table; momentum (`*_k_*`, `projector_k`) weights are skipped
    unless `include_momentum`, in which case THEY are mapped instead
    (useful for resuming pretraining with both branches).
    """
    remapped = {}
    unmatched = []
    for key, value in state_dict.items():
        if key.startswith("module."):
            key = key[len("module."):]
        is_momentum = ("_k_" in key.split(".")[0] + "." or
                       key.startswith(("pixpro.encoder_k", "pixpro.proj_k",
                                       "pixpro.projector_k", "encoder_k",
                                       "proj_k", "projector_k")))
        if is_momentum != include_momentum:
            continue
        if include_momentum:
            key = (key.replace("encoder_k_", "encoder_")
                      .replace("proj_k_", "proj")
                      .replace("projk", "proj")
                      .replace("projector_k", "projector"))
            # proj_k_1 -> proj1 handled above via proj_k_ -> proj
        matched = False
        for prefix, target in _PIXPRO_PREFIX.items():
            if key.startswith(prefix):
                remapped[target + key[len(prefix):]] = value
                matched = True
                break
        if not matched:
            unmatched.append(key)
    params, stats, um2 = import_tswinplus_state_dict(remapped)
    # projector tree is part of the contrast encoder, not TswinPlus — route it
    proj_params: dict = {}
    proj_stats: dict = {}
    for key in list(remapped):
        if key.startswith("projector."):
            _import_projector(key, np.asarray(remapped[key]), proj_params, proj_stats)
    if proj_params:
        params["projector"] = proj_params.get("projector", {})
    if proj_stats:
        stats["projector"] = proj_stats.get("projector", {})
    unmatched += [k for k in um2 if not k.startswith("projector.")]
    return params, stats, unmatched
