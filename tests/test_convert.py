"""Torch->Flax weight conversion: tree/shape parity + numeric convention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from spine_vision_tpu.models.convert import (
    convert_convnext_state_dict,
    convert_resnet_state_dict,
)
from spine_vision_tpu.models.convnext import CONVNEXT_CONFIGS, ConvNeXt
from spine_vision_tpu.models.resnet import RESNET_CONFIGS, ResNet


def _tree_shapes(tree, prefix=()):
    out = {}
    for key, value in tree.items():
        if isinstance(value, dict):
            out.update(_tree_shapes(value, prefix + (key,)))
        else:
            out["/".join(prefix + (key,))] = tuple(value.shape)
    return out


def _synth_resnet18_torch_sd():
    """torchvision-format resnet18 state dict with random tensors."""
    rng = np.random.default_rng(0)
    sd = {}

    def t(*shape):
        return torch.tensor(rng.normal(size=shape).astype(np.float32))

    def bn(name, c):
        sd[f"{name}.weight"] = t(c)
        sd[f"{name}.bias"] = t(c)
        sd[f"{name}.running_mean"] = t(c)
        sd[f"{name}.running_var"] = torch.abs(t(c)) + 0.5
        sd[f"{name}.num_batches_tracked"] = torch.tensor(0)

    sd["conv1.weight"] = t(64, 3, 7, 7)
    bn("bn1", 64)
    channels = {1: 64, 2: 128, 3: 256, 4: 512}
    for layer in (1, 2, 3, 4):
        c = channels[layer]
        c_in = channels.get(layer - 1, 64)
        for block in (0, 1):
            p = f"layer{layer}.{block}"
            first_in = c_in if block == 0 else c
            sd[f"{p}.conv1.weight"] = t(c, first_in, 3, 3)
            bn(f"{p}.bn1", c)
            sd[f"{p}.conv2.weight"] = t(c, c, 3, 3)
            bn(f"{p}.bn2", c)
            if block == 0 and layer > 1:
                sd[f"{p}.downsample.0.weight"] = t(c, c_in, 1, 1)
                bn(f"{p}.downsample.1", c)
    sd["fc.weight"] = t(1000, 512)
    sd["fc.bias"] = t(1000)
    return sd


def test_resnet18_conversion_matches_init_tree():
    sd = _synth_resnet18_torch_sd()
    params, stats = convert_resnet_state_dict(sd)

    model = ResNet(config=RESNET_CONFIGS["resnet18"], dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False
    )
    assert _tree_shapes(params) == _tree_shapes(variables["params"])
    # batch_stats trees: ours uses mean/var leaves under the same modules
    assert _tree_shapes(stats) == _tree_shapes(variables["batch_stats"])

    # Converted params must actually run.
    out = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.zeros((1, 32, 32, 3)),
        train=False,
    )
    assert out.shape == (1, 512)
    assert np.all(np.isfinite(np.asarray(out)))


def _synth_convnext_tiny_torch_sd():
    rng = np.random.default_rng(1)
    sd = {}

    def t(*shape):
        return torch.tensor(rng.normal(size=shape).astype(np.float32))

    dims = (96, 192, 384, 768)
    depths = (3, 3, 9, 3)
    sd["downsample_layers.0.0.weight"] = t(dims[0], 3, 4, 4)
    sd["downsample_layers.0.0.bias"] = t(dims[0])
    sd["downsample_layers.0.1.weight"] = t(dims[0])
    sd["downsample_layers.0.1.bias"] = t(dims[0])
    for s in (1, 2, 3):
        sd[f"downsample_layers.{s}.0.weight"] = t(dims[s - 1])
        sd[f"downsample_layers.{s}.0.bias"] = t(dims[s - 1])
        sd[f"downsample_layers.{s}.1.weight"] = t(dims[s], dims[s - 1], 2, 2)
        sd[f"downsample_layers.{s}.1.bias"] = t(dims[s])
    for s, (depth, dim) in enumerate(zip(depths, dims)):
        for b in range(depth):
            p = f"stages.{s}.{b}"
            sd[f"{p}.dwconv.weight"] = t(dim, 1, 7, 7)
            sd[f"{p}.dwconv.bias"] = t(dim)
            sd[f"{p}.norm.weight"] = t(dim)
            sd[f"{p}.norm.bias"] = t(dim)
            sd[f"{p}.pwconv1.weight"] = t(4 * dim, dim)
            sd[f"{p}.pwconv1.bias"] = t(4 * dim)
            sd[f"{p}.pwconv2.weight"] = t(dim, 4 * dim)
            sd[f"{p}.pwconv2.bias"] = t(dim)
            sd[f"{p}.gamma"] = t(dim)
    sd["norm.weight"] = t(dims[-1])
    sd["norm.bias"] = t(dims[-1])
    sd["head.weight"] = t(1000, dims[-1])
    sd["head.bias"] = t(1000)
    return sd


def test_convnext_tiny_conversion_matches_init_tree():
    sd = _synth_convnext_tiny_torch_sd()
    params = convert_convnext_state_dict(sd)
    model = ConvNeXt(config=CONVNEXT_CONFIGS["convnext_tiny"], dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    assert _tree_shapes(params) == _tree_shapes(variables["params"])
    out = model.apply({"params": params}, jnp.zeros((1, 64, 64, 3)), train=False)
    assert out.shape == (1, 768)


def test_conv_transpose_convention_numeric():
    """OIHW->HWIO must reproduce torch's conv2d output."""
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 3, 8, 8)).astype(np.float32)  # NCHW
    w = rng.normal(size=(4, 3, 3, 3)).astype(np.float32)  # OIHW
    torch_out = (
        torch.nn.functional.conv2d(torch.tensor(x), torch.tensor(w), padding=1)
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    jax_out = jax.lax.conv_general_dilated(
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(w.transpose(2, 3, 1, 0)),
        (1, 1),
        [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(jax_out), torch_out, rtol=1e-4, atol=1e-4)


def test_convnext_timm_naming_converts():
    """timm naming (stem.X, stages.S.blocks.B.conv_dw/mlp.fcN) must convert
    identically to facebookresearch naming."""
    fb_sd = _synth_convnext_tiny_torch_sd()
    timm_sd = {}
    for key, value in fb_sd.items():
        new = key
        if new.startswith("downsample_layers.0.0."):
            new = new.replace("downsample_layers.0.0.", "stem.0.")
        elif new.startswith("downsample_layers.0.1."):
            new = new.replace("downsample_layers.0.1.", "stem.1.")
        elif new.startswith("downsample_layers."):
            s = new.split(".")[1]
            new = new.replace(f"downsample_layers.{s}.", f"stages.{s}.downsample.")
        elif new.startswith("stages."):
            parts = new.split(".")
            rest = ".".join(parts[3:])
            rest = (
                rest.replace("dwconv.", "conv_dw.")
                .replace("pwconv1.", "mlp.fc1.")
                .replace("pwconv2.", "mlp.fc2.")
            )
            new = f"stages.{parts[1]}.blocks.{parts[2]}.{rest}"
        elif new.startswith("norm."):
            new = new.replace("norm.", "head.norm.")
        timm_sd[new] = value

    params_fb = convert_convnext_state_dict(fb_sd)
    params_timm = convert_convnext_state_dict(timm_sd)
    assert _tree_shapes(params_fb) == _tree_shapes(params_timm)


def test_convnext_unknown_naming_raises():
    with pytest.raises(ValueError, match="consumed no tensors"):
        convert_convnext_state_dict({"foo.bar": torch.zeros(3)})
