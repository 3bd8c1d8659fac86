"""Offline torch-checkpoint -> Flax parameter conversion.

The reference gets ImageNet-pretrained backbones from timm at construction
time (training/models/backbone.py:143-177). This framework has no torch in
its training path, so pretraining is a one-time offline conversion: load a
torchvision/timm-format state dict FILE and rewrite it into this package's
Flax param/batch_stats trees (SURVEY.md §7 "hard parts": the weight
conversion story).

Conventions converted:
- conv weights OIHW -> HWIO
- depthwise conv weights (C,1,kh,kw) -> (kh,kw,1,C)
- linear weights (out,in) -> (in,out)
- BatchNorm weight/bias/running_mean/running_var -> scale/bias + batch_stats
- LayerNorm weight/bias -> scale/bias

Supported architectures: the torchvision/timm ResNet family (basic +
bottleneck, incl. ResNeXt/WideResNet naming) and timm/facebookresearch
ConvNeXt v1/v2.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Mapping

import numpy as np

from spine_vision_tpu.core import logger


def _np(tensor: Any) -> np.ndarray:
    if hasattr(tensor, "detach"):
        tensor = tensor.detach().cpu().numpy()
    return np.asarray(tensor)


def _conv(tensor: Any) -> np.ndarray:
    return _np(tensor).transpose(2, 3, 1, 0)  # OIHW -> HWIO


def _dwconv(tensor: Any) -> np.ndarray:
    return _np(tensor).transpose(2, 3, 1, 0)  # (C,1,kh,kw) -> (kh,kw,1,C)


def _linear(tensor: Any) -> np.ndarray:
    return _np(tensor).transpose(1, 0)  # (out,in) -> (in,out)


def _set(tree: dict, path: tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def convert_resnet_state_dict(
    state_dict: Mapping[str, Any],
) -> tuple[dict, dict]:
    """torchvision/timm ResNet state dict -> (params, batch_stats) trees.

    Torch names: ``conv1/bn1`` stem, ``layer{1-4}.{i}.conv{n}/bn{n}`` blocks,
    ``layer{s}.{i}.downsample.0/1`` projections. The classifier ``fc`` is
    dropped (backbones are created with num_classes=0 in the reference).
    """
    params: dict = {}
    stats: dict = {}
    consumed = 0

    def put_bn(prefix: tuple[str, ...], torch_key: str) -> None:
        nonlocal consumed
        _set(params, prefix + ("scale",), _np(state_dict[f"{torch_key}.weight"]))
        _set(params, prefix + ("bias",), _np(state_dict[f"{torch_key}.bias"]))
        _set(stats, prefix + ("mean",), _np(state_dict[f"{torch_key}.running_mean"]))
        _set(stats, prefix + ("var",), _np(state_dict[f"{torch_key}.running_var"]))
        consumed += 4

    _set(params, ("stem_conv", "kernel"), _conv(state_dict["conv1.weight"]))
    consumed += 1
    put_bn(("stem_bn",), "bn1")

    for torch_key in state_dict:
        if not torch_key.startswith("layer"):
            continue
        parts = torch_key.split(".")
        stage = int(parts[0][len("layer") :])
        block = int(parts[1]) + 1
        prefix = (f"stage{stage}_block{block}",)
        rest = parts[2:]
        if rest[0].startswith("conv") and rest[1] == "weight":
            _set(params, prefix + (rest[0], "kernel"), _conv(state_dict[torch_key]))
            consumed += 1
        elif rest[0].startswith("bn") and rest[1] == "weight":
            put_bn(prefix + (rest[0],), f"{parts[0]}.{parts[1]}.{rest[0]}")
        elif rest[0] == "downsample" and rest[1] == "0" and rest[2] == "weight":
            _set(
                params,
                prefix + ("downsample_conv", "kernel"),
                _conv(state_dict[torch_key]),
            )
            consumed += 1
        elif rest[0] == "downsample" and rest[1] == "1" and rest[2] == "weight":
            put_bn(
                prefix + ("downsample_bn",), f"{parts[0]}.{parts[1]}.downsample.1"
            )

    total = len(
        [
            k
            for k in state_dict
            if not k.startswith("fc.") and not k.endswith("num_batches_tracked")
        ]
    )
    if consumed != total:
        logger.warning(
            "ResNet conversion consumed %d of %d non-classifier tensors",
            consumed,
            total,
        )
    return params, stats


def _normalize_convnext_keys(state_dict: Mapping[str, Any]) -> dict[str, Any]:
    """Rewrite timm ConvNeXt naming to the facebookresearch layout.

    timm: ``stem.{0,1}``, ``stages.{s}.blocks.{b}.{conv_dw,norm,mlp.fc1,
    mlp.fc2,gamma}``, ``stages.{s}.downsample.{0,1}`` (s>=1), ``head.norm``.
    fb:   ``downsample_layers.0.{0,1}``, ``stages.{s}.{b}.{dwconv,norm,
    pwconv1,pwconv2,gamma}``, ``downsample_layers.{s}.{0,1}``, ``norm``.
    """
    out: dict[str, Any] = {}
    for key, value in state_dict.items():
        new = key
        if new.startswith("stem.0."):
            new = new.replace("stem.0.", "downsample_layers.0.0.", 1)
        elif new.startswith("stem.1."):
            new = new.replace("stem.1.", "downsample_layers.0.1.", 1)
        elif ".downsample." in new and new.startswith("stages."):
            stage = new.split(".")[1]
            new = new.replace(
                f"stages.{stage}.downsample.", f"downsample_layers.{stage}.", 1
            )
        if ".blocks." in new:
            new = new.replace(".blocks.", ".", 1)
        new = (
            new.replace(".conv_dw.", ".dwconv.")
            .replace(".mlp.fc1.", ".pwconv1.")
            .replace(".mlp.fc2.", ".pwconv2.")
        )
        if new.startswith("head.norm."):
            new = new.replace("head.norm.", "norm.", 1)
        out[new] = value
    return out


def convert_convnext_state_dict(
    state_dict: Mapping[str, Any],
) -> dict:
    """timm or facebookresearch ConvNeXt state dict -> params tree.

    facebookresearch names: ``downsample_layers.0.{0,1}`` stem conv+LN,
    ``downsample_layers.{s}.{0,1}`` LN+conv, ``stages.{s}.{b}.*`` blocks
    (dwconv, norm, pwconv1/2, [gamma|grn]), final ``norm``; timm naming is
    rewritten to this layout first. The classifier ``head`` is dropped.
    A conversion that consumes no tensors raises instead of returning an
    empty tree.
    """
    if any(".blocks." in k or k.startswith("stem.") for k in state_dict):
        state_dict = _normalize_convnext_keys(state_dict)
    params: dict = {}
    consumed = 0

    def put(path: tuple[str, ...], value: np.ndarray) -> None:
        nonlocal consumed
        _set(params, path, value)
        consumed += 1

    for key, tensor in state_dict.items():
        parts = key.split(".")
        if parts[0] == "head" or parts[0] == "fc":
            continue
        if parts[0] == "downsample_layers":
            stage = int(parts[1])
            sub = parts[2]
            kind = "weight" if parts[3] == "weight" else "bias"
            if stage == 0:
                if sub == "0":  # stem conv
                    if kind == "weight":
                        put(("stem_conv", "kernel"), _conv(tensor))
                    else:
                        put(("stem_conv", "bias"), _np(tensor))
                else:  # stem LN
                    put(
                        ("stem_norm", "scale" if kind == "weight" else "bias"),
                        _np(tensor),
                    )
            else:
                if sub == "0":  # LN before downsample conv
                    put(
                        (
                            f"downsample{stage}_norm",
                            "scale" if kind == "weight" else "bias",
                        ),
                        _np(tensor),
                    )
                else:
                    if kind == "weight":
                        put((f"downsample{stage}_conv", "kernel"), _conv(tensor))
                    else:
                        put((f"downsample{stage}_conv", "bias"), _np(tensor))
        elif parts[0] == "stages":
            stage = int(parts[1]) + 1
            block = int(parts[2]) + 1
            prefix = (f"stage{stage}_block{block}",)
            leaf = parts[3]
            if leaf == "dwconv":
                if parts[4] == "weight":
                    put(prefix + ("dwconv", "kernel"), _dwconv(tensor))
                else:
                    put(prefix + ("dwconv", "bias"), _np(tensor))
            elif leaf == "norm":
                put(
                    prefix + ("norm", "scale" if parts[4] == "weight" else "bias"),
                    _np(tensor),
                )
            elif leaf in ("pwconv1", "pwconv2"):
                if parts[4] == "weight":
                    put(prefix + (leaf, "kernel"), _linear(tensor))
                else:
                    put(prefix + (leaf, "bias"), _np(tensor))
            elif leaf == "gamma":
                put(prefix + ("gamma",), _np(tensor))
            elif leaf == "grn":
                put(
                    prefix + ("grn", parts[4]),
                    _np(tensor).reshape(-1),
                )
        elif parts[0] == "norm":
            put(("head_norm", "scale" if parts[1] == "weight" else "bias"), _np(tensor))

    total = len(
        [k for k in state_dict if not (k.startswith("head") or k.startswith("fc"))]
    )
    if consumed == 0:
        raise ValueError(
            "ConvNeXt conversion consumed no tensors — unrecognized naming "
            f"scheme (sample keys: {sorted(state_dict)[:4]})"
        )
    if consumed != total:
        logger.warning(
            "ConvNeXt conversion consumed %d of %d non-classifier tensors",
            consumed,
            total,
        )
    return params


def load_torch_backbone(
    checkpoint_path: Path, arch: str
) -> tuple[dict, dict]:
    """Load a torch .pth/.pt state dict file and convert for ``arch``.

    Returns (params, batch_stats); batch_stats is empty for BN-free nets.
    """
    import torch

    raw = torch.load(checkpoint_path, map_location="cpu", weights_only=True)
    if isinstance(raw, dict) and "state_dict" in raw:
        raw = raw["state_dict"]
    if arch.startswith(("resnet", "resnext", "wide_resnet")):
        return convert_resnet_state_dict(raw)
    if arch.startswith("convnext"):
        return convert_convnext_state_dict(raw), {}
    raise ValueError(f"No converter for architecture: {arch}")
