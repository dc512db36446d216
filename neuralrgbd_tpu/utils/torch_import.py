"""Import the reference's released PyTorch checkpoints into our param tree.

The released weights (``code/saved_models/download_weights.sh``:
kvnet_scannet.tar / kvnet_kitti.tar) are torch ``state_dict``s of the
DataParallel'd KVNET. This module maps them onto the Flax tree:

layout transforms
  Conv2d   (O,I,kh,kw)      -> (kh,kw,I,O)
  Conv3d   (O,I,kd,kh,kw)   -> (kd,kh,kw,I,O)
  ConvT2d  (I,O,kh,kw)      -> (kh,kw,I,O) spatially flipped (our deconv is
                               an lhs-dilated conv)
  BatchNorm weight/bias     -> bn scale/bias (no running stats: the
                               reference trains with track_running_stats=False)

name map (torch module path -> our flax path) is generated from the
architecture structure below; unmatched tensors are reported loudly.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _convbn(torch_prefix: str, flax_prefix: str, dims: int = 2):
    """convbn/convbn_3d Sequential(conv, bn)."""
    return {
        f"{torch_prefix}.0.weight": (f"{flax_prefix}/conv/kernel",
                                     "conv3d" if dims == 3 else "conv2d"),
        f"{torch_prefix}.1.weight": (f"{flax_prefix}/bn/scale", "copy"),
        f"{torch_prefix}.1.bias": (f"{flax_prefix}/bn/bias", "copy"),
    }


def _conv_bias(torch_prefix: str, flax_prefix: str):
    return {
        f"{torch_prefix}.weight": (f"{flax_prefix}/kernel", "conv2d"),
        f"{torch_prefix}.bias": (f"{flax_prefix}/bias", "copy"),
    }


def build_name_map(refine_net: str = "DPV") -> Dict[str, Tuple[str, str]]:
    """torch state_dict key -> (flax path 'a/b/c/leaf', transform).

    ``refine_net`` selects the r_net section: 'DPV' (RefineNet_DPV_upsample)
    or 'DGF' (RefineNet_DGF, Refine.py:587-641)."""
    m: Dict[str, Tuple[str, str]] = {}

    # ---- feature extractor (psm_submodule.feature_extraction) ----
    fe_t = "feature_extractor.feature_extraction"
    fe_f = "feature_extractor"
    for i, j in ((0, 0), (2, 1), (4, 2)):
        m.update(_convbn(f"{fe_t}.firstconv.{i}", f"{fe_f}/first{j}"))

    layer_blocks = {"layer1": 3, "layer2": 16, "layer3": 3, "layer4": 3}
    for lname, nblocks in layer_blocks.items():
        for b in range(nblocks):
            t = f"{fe_t}.{lname}.{b}"
            f = f"{fe_f}/{lname}_{b}"
            # BasicBlock: conv1 = Sequential(convbn, ReLU) => conv1.0.*
            m.update(_convbn(f"{t}.conv1.0", f"{f}/conv1"))
            m.update(_convbn(f"{t}.conv2", f"{f}/conv2"))
            # downsample = Sequential(Conv2d, BN) on the first block when
            # stride/channels change (layer2_0, layer3_0)
            m[f"{t}.downsample.0.weight"] = (f"{f}/down_conv/kernel", "conv2d")
            m[f"{t}.downsample.1.weight"] = (f"{f}/down_bn/scale", "copy")
            m[f"{t}.downsample.1.bias"] = (f"{f}/down_bn/bias", "copy")

    for k in range(4):  # torch branch1..4 == our branch0..3
        m.update(_convbn(f"{fe_t}.branch{k + 1}.1", f"{fe_f}/branch{k}"))
    m.update(_convbn(f"{fe_t}.lastconv.0", f"{fe_f}/last0"))
    m[f"{fe_t}.lastconv.2.weight"] = (f"{fe_f}/last1/kernel", "conv2d")

    # ---- D-Net optional costV refinement convs (basic.py:189-196) ----
    # present only when the model was built with refine_costv; entries for
    # an absent branch land in the report's missing_flax_keys
    m.update(_conv_bias("d_net.conv0.0", "costv_conv0"))
    m.update(_conv_bias("d_net.conv0_1.0", "costv_conv0_1"))
    m.update(_conv_bias("d_net.conv0_2", "costv_conv0_2"))

    # ---- K-Net (basic.KV_NET_BASIC) ----
    kv_t, kv_f = "kv_net", "kv_net"
    for d in range(5):
        for i, j in ((0, 0), (2, 1)):
            m.update(_convbn(f"{kv_t}.dres{d}.{i}", f"{kv_f}/dres{d}_{j}",
                             dims=3))
    m.update(_convbn(f"{kv_t}.classify.0", f"{kv_f}/classify_0", dims=3))
    m[f"{kv_t}.classify.2.weight"] = (f"{kv_f}/classify_1/kernel", "conv3d")

    # ---- R-Net ----
    r_t, r_f = "r_net", "r_net"
    if refine_net == "DGF":
        # RefineNet_DGF.feature_ext = Sequential(Conv2d(3,64,1), ReLU,
        # Conv2d(64,1,1)) (Refine.py:598-601)
        m.update(_conv_bias(f"{r_t}.feature_ext.0", f"{r_f}/feature_ext_0"))
        m.update(_conv_bias(f"{r_t}.feature_ext.2", f"{r_f}/feature_ext_2"))
        return m
    # Refine.RefineNet_DPV_upsample
    for name in ("conv0", "conv0_1", "conv1", "conv1_1", "conv2", "conv2_1"):
        m.update(_conv_bias(f"{r_t}.{name}.0", f"{r_f}/{name}"))
    m.update(_conv_bias(f"{r_t}.conv2_2", f"{r_f}/conv2_2"))
    for name in ("trans_conv0", "trans_conv1"):
        m[f"{r_t}.{name}.0.weight"] = (f"{r_f}/{name}/kernel", "deconv2d")
        m[f"{r_t}.{name}.0.bias"] = (f"{r_f}/{name}/bias", "copy")
    return m


def build_refine_head_map(head: str) -> Dict[str, Tuple[str, str]]:
    """Name map for a STANDALONE legacy refine head's bare state_dict
    (models/refine_legacy.py vs Refine.py:135-585). ``head`` in
    {'unet2d', 'demon', '3d', '3d_nearest', 'unet3d_res', 'unet3d'}."""
    m: Dict[str, Tuple[str, str]] = {}

    def convbn3(tp, fp):
        m[f"{tp}.0.0.weight"] = (f"{fp}/conv/kernel", "conv3d")
        m[f"{tp}.0.0.bias"] = (f"{fp}/conv/bias", "copy")   # _bias variant
        m[f"{tp}.0.1.weight"] = (f"{fp}/bn/scale", "copy")
        m[f"{tp}.0.1.bias"] = (f"{fp}/bn/bias", "copy")

    if head in ("unet2d", "demon"):
        m.update(_conv_bias("conv0.0", "conv0"))
        if head == "unet2d":
            m.update(_conv_bias("conv0_1.0", "conv0_1"))
        for name in ("conv1", "conv1_1", "conv2", "conv2_1", "conv3"):
            m.update(_conv_bias(f"{name}.0", f"core/{name}"))
        for name in ("trans_conv0", "trans_conv1"):
            m[f"{name}.0.weight"] = (f"core/{name}/kernel", "deconv2d")
            m[f"{name}.0.bias"] = (f"core/{name}/bias", "copy")
        m.update(_conv_bias("conv3_1", "core/conv3_1"))
        return m

    if head in ("3d", "3d_nearest"):
        for name in ("conv1", "conv2", "conv3", "conv4"):
            convbn3(name, name)
        if head == "3d":
            for name in ("conv5", "conv6"):
                m[f"{name}.0.weight"] = (f"{name}/kernel", "deconv3d")
                m[f"{name}.1.weight"] = (f"{name}_bn/scale", "copy")
                m[f"{name}.1.bias"] = (f"{name}_bn/bias", "copy")
        else:  # Sequential(Upsample, convbn_3d) -> index 1
            for name in ("conv5", "conv6"):
                m[f"{name}.1.0.weight"] = (f"{name}/conv/kernel", "conv3d")
                m[f"{name}.1.1.weight"] = (f"{name}/bn/scale", "copy")
                m[f"{name}.1.1.bias"] = (f"{name}/bn/bias", "copy")
        convbn3("classif1", "classif1_0")
        m["classif1.2.weight"] = ("classif1_1/kernel", "conv3d")
        return m

    if head in ("unet3d_res", "unet3d"):
        for name in ("conv1", "conv2", "conv3", "conv4", "conv5",
                     "conv5_r", "conv6", "conv6_r", "conv7"):
            convbn3(name, name)
        return m

    raise ValueError(head)


def import_refine_head(state_dict, params, head: str):
    """Pull a standalone legacy-head torch state_dict into flax params."""
    name_map = build_refine_head_map(head)
    return _import_with_map(state_dict, params, name_map)


def _transform(arr: np.ndarray, kind: str) -> np.ndarray:
    if kind == "copy":
        return arr
    if kind == "conv2d":
        return arr.transpose(2, 3, 1, 0)
    if kind == "conv3d":
        return arr.transpose(2, 3, 4, 1, 0)
    if kind == "deconv2d":
        # (I, O, kh, kw) -> flipped (kh, kw, I, O)
        return arr[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)
    if kind == "deconv3d":
        # (I, O, kd, kh, kw) -> flipped (kd, kh, kw, I, O)
        return arr[:, :, ::-1, ::-1, ::-1].transpose(2, 3, 4, 0, 1)
    raise ValueError(kind)


def _strip_prefix(key: str) -> str:
    for pre in ("module.", "model."):
        if key.startswith(pre):
            key = key[len(pre):]
    return key


def import_torch_state_dict(state_dict, params, strict_shapes: bool = True,
                            refine_net: str = "DPV",
                            mark_provenance: bool = True):
    """Map a torch state_dict (tensors or ndarrays) onto a flax param tree.

    Returns (new_params, report dict). The D-Net duplicates the feature
    extractor in the torch tree (``d_net.feature_extraction.*`` aliases
    ``feature_extractor.*``) — duplicates are skipped silently.

    ``mark_provenance``: stamp the returned variables dict with a
    ``provenance`` collection (``mark_torch_imported``) so inference
    entry points default the accuracy-gated deviations (cached-FE) to
    exact reference semantics for weights the gates never covered
    (basic.py:245-252 joint-window BN). Flax ignores unused collections;
    the marker survives tree_map/device_put/orbax round-trips.
    """
    name_map = build_name_map(refine_net)
    new_params, report = _import_with_map(state_dict, params, name_map,
                                          strict_shapes)
    if mark_provenance:
        new_params = mark_torch_imported(new_params)
    return new_params, report


def mark_torch_imported(params):
    """Stamp a variables dict as holding torch-imported weights."""
    if isinstance(params, dict):
        params = dict(params)
        params["provenance"] = {"torch_imported": np.ones((), np.float32)}
    return params


def params_torch_imported(params) -> bool:
    """True iff ``params`` carries the torch-import provenance marker."""
    try:
        marker = params["provenance"]["torch_imported"]
    except (KeyError, TypeError, IndexError):
        return False
    return bool(np.any(np.asarray(marker)))


def _import_with_map(state_dict, params, name_map, strict_shapes=True):
    import jax

    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(
            p.key for p in path if hasattr(p, "key")
        )
        flat[key.replace("params/", "")] = (path, np.asarray(leaf))

    new_leaves = {k: v[1] for k, v in flat.items()}
    used, missing, skipped, mismatched = [], [], [], []

    for tkey, tval in state_dict.items():
        key = _strip_prefix(str(tkey))
        if key.startswith("d_net.feature_extraction."):
            continue  # alias of feature_extractor.*
        if "num_batches_tracked" in key or "running_" in key:
            continue
        if key not in name_map:
            skipped.append(key)
            continue
        fkey, kind = name_map[key]
        if fkey not in new_leaves:
            missing.append(fkey)
            continue
        arr = _transform(np.asarray(tval), kind).astype(np.float32)
        if arr.shape != new_leaves[fkey].shape:
            mismatched.append((key, arr.shape, new_leaves[fkey].shape))
            if strict_shapes:
                continue
        new_leaves[fkey] = arr
        used.append(fkey)

    # rebuild the tree
    leaves = []
    for path, _ in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(p.key for p in path if hasattr(p, "key"))
        leaves.append(new_leaves[key.replace("params/", "")])
    treedef = jax.tree_util.tree_structure(params)
    new_params = jax.tree_util.tree_unflatten(treedef, leaves)

    report = {
        "n_imported": len(used),
        "n_params_total": len(flat),
        "unmatched_torch_keys": skipped,
        "missing_flax_keys": missing,
        "shape_mismatches": mismatched,
    }
    return new_params, report


def import_psmnet_state_dict(state_dict, params):
    """Warm-start the feature extractor from a PSMNet checkpoint.

    Equivalent of ``load_pretrained_PSMNet``
    (``/root/reference/code/utils/models.py:12-37``): a *partial* load that
    copies every checkpoint tensor whose name matches the feature-extraction
    tree and leaves everything else at its current value. PSMNet checkpoints
    name the tree ``feature_extraction.*`` (optionally ``module.``-prefixed);
    our full-model map prefixes it ``feature_extractor.`` — rewrite and
    reuse the same layout transforms.
    """
    remapped = {}
    for k, v in state_dict.items():
        key = _strip_prefix(str(k))
        if key.startswith("feature_extraction."):
            remapped["feature_extractor." + key] = v
    # import_torch_state_dict is inherently partial: unmatched checkpoint
    # keys are reported, untouched leaves keep their current values.
    # No provenance mark: a PSMNet warm-start is a TRAINING initializer —
    # the weights that ship are trained in this repo, which the deviation
    # gates cover.
    return import_torch_state_dict(remapped, params, mark_provenance=False)


def load_torch_checkpoint(path: str):
    """Load a reference .tar checkpoint -> numpy state_dict (CPU torch)."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    sd = payload.get("state_dict", payload)
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}
