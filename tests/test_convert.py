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


# ---------------------------------------------------------------------------
# ViT / Swin / EfficientNet / MobileNetV3 (round-2 coverage, VERDICT item 8)
# ---------------------------------------------------------------------------
#
# Synthetic state dicts are generated by walking the Flax init tree and
# emitting the timm-named torch-format tensors (the inverse of each
# converter's layout mapping), so shapes are exact per family and the test
# pins both naming and transpose conventions.

from spine_vision_tpu.models.convert import (
    _MERGE_GROUP_PERM,
    convert_efficientnet_state_dict,
    convert_mobilenetv3_state_dict,
    convert_swin_state_dict,
    convert_vit_state_dict,
)


def _t(arr):
    return torch.tensor(np.ascontiguousarray(arr, dtype=np.float32))


def _inv_conv(kernel):  # HWIO -> OIHW
    return _t(np.transpose(kernel, (3, 2, 0, 1)))


def _inv_dwconv(kernel):  # (kh,kw,1,C) -> (C,1,kh,kw)
    return _t(np.transpose(kernel, (3, 2, 0, 1)))


def _inv_linear(kernel):  # (in,out) -> (out,in)
    return _t(np.transpose(kernel, (1, 0)))


def _emit_bn(sd, torch_key, p_bn, s_bn):
    sd[f"{torch_key}.weight"] = _t(p_bn["scale"])
    sd[f"{torch_key}.bias"] = _t(p_bn["bias"])
    sd[f"{torch_key}.running_mean"] = _t(s_bn["mean"])
    sd[f"{torch_key}.running_var"] = _t(np.abs(s_bn["var"]) + 0.5)


def test_vit_conversion_matches_init_tree():
    from spine_vision_tpu.models.vit import VIT_CONFIGS, ViT

    cfg = VIT_CONFIGS["vit_tiny"]
    model = ViT(config=cfg, dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    p = jax.tree_util.tree_map(np.asarray, variables["params"])

    sd = {}
    sd["cls_token"] = _t(p["cls_token"])
    sd["pos_embed"] = _t(p["pos_embed"])
    sd["patch_embed.proj.weight"] = _inv_conv(p["patch_embed"]["kernel"])
    sd["patch_embed.proj.bias"] = _t(p["patch_embed"]["bias"])
    d = cfg.hidden_dim
    for i in range(1, cfg.depth + 1):
        blk = p[f"block{i}"]
        tp = f"blocks.{i - 1}"
        for norm in ("norm1", "norm2"):
            sd[f"{tp}.{norm}.weight"] = _t(blk[norm]["scale"])
            sd[f"{tp}.{norm}.bias"] = _t(blk[norm]["bias"])
        qkv_w = np.concatenate(
            [blk["attn"][k]["kernel"].reshape(d, d).T for k in ("query", "key", "value")],
            axis=0,
        )
        qkv_b = np.concatenate(
            [blk["attn"][k]["bias"].reshape(-1) for k in ("query", "key", "value")]
        )
        sd[f"{tp}.attn.qkv.weight"] = _t(qkv_w)
        sd[f"{tp}.attn.qkv.bias"] = _t(qkv_b)
        sd[f"{tp}.attn.proj.weight"] = _t(blk["attn"]["out"]["kernel"].reshape(d, d).T)
        sd[f"{tp}.attn.proj.bias"] = _t(blk["attn"]["out"]["bias"])
        sd[f"{tp}.mlp.fc1.weight"] = _inv_linear(blk["fc1"]["kernel"])
        sd[f"{tp}.mlp.fc1.bias"] = _t(blk["fc1"]["bias"])
        sd[f"{tp}.mlp.fc2.weight"] = _inv_linear(blk["fc2"]["kernel"])
        sd[f"{tp}.mlp.fc2.bias"] = _t(blk["fc2"]["bias"])
    sd["norm.weight"] = _t(p["norm"]["scale"])
    sd["norm.bias"] = _t(p["norm"]["bias"])
    sd["head.weight"] = _t(np.zeros((1000, d)))
    sd["head.bias"] = _t(np.zeros(1000))

    converted = convert_vit_state_dict(sd, cfg.num_heads)
    assert _tree_shapes(converted) == _tree_shapes(variables["params"])
    # Values must round-trip exactly (pins the qkv split + head reshapes).
    flat_a = jax.tree_util.tree_leaves(converted)
    flat_b = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, variables["params"])
    )
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(a, b, rtol=1e-6)
    out = model.apply({"params": converted}, jnp.zeros((1, 64, 64, 3)), train=False)
    assert out.shape == (1, d) and np.all(np.isfinite(np.asarray(out)))


def test_swin_conversion_matches_init_tree():
    from spine_vision_tpu.models.swin import SWIN_CONFIGS, SwinTransformer

    cfg = SWIN_CONFIGS["swin_tiny"]
    model = SwinTransformer(config=cfg, dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    p = jax.tree_util.tree_map(np.asarray, variables["params"])

    def perm_groups(arr, axis=0):
        parts = np.split(arr, 4, axis=axis)
        return np.concatenate([parts[i] for i in _MERGE_GROUP_PERM], axis=axis)

    sd = {}
    sd["patch_embed.proj.weight"] = _inv_conv(p["patch_embed"]["kernel"])
    sd["patch_embed.proj.bias"] = _t(p["patch_embed"]["bias"])
    sd["patch_embed.norm.weight"] = _t(p["patch_norm"]["scale"])
    sd["patch_embed.norm.bias"] = _t(p["patch_norm"]["bias"])
    for s, depth in enumerate(cfg.depths):
        if s >= 1:
            merge = p[f"merge{s}"]
            sd[f"layers.{s}.downsample.reduction.weight"] = _inv_linear(
                perm_groups(merge["Dense_0"]["kernel"])
            )
            sd[f"layers.{s}.downsample.norm.weight"] = _t(
                perm_groups(merge["LayerNorm_0"]["scale"])
            )
            sd[f"layers.{s}.downsample.norm.bias"] = _t(
                perm_groups(merge["LayerNorm_0"]["bias"])
            )
        for b in range(depth):
            blk = p[f"stage{s + 1}_block{b + 1}"]
            tp = f"layers.{s}.blocks.{b}"
            for norm in ("norm1", "norm2"):
                sd[f"{tp}.{norm}.weight"] = _t(blk[norm]["scale"])
                sd[f"{tp}.{norm}.bias"] = _t(blk[norm]["bias"])
            sd[f"{tp}.attn.qkv.weight"] = _inv_linear(blk["attn"]["qkv"]["kernel"])
            sd[f"{tp}.attn.qkv.bias"] = _t(blk["attn"]["qkv"]["bias"])
            sd[f"{tp}.attn.proj.weight"] = _inv_linear(blk["attn"]["proj"]["kernel"])
            sd[f"{tp}.attn.proj.bias"] = _t(blk["attn"]["proj"]["bias"])
            sd[f"{tp}.attn.relative_position_bias_table"] = _t(
                blk["attn"]["relative_position_bias_table"]
            )
            sd[f"{tp}.attn.relative_position_index"] = torch.zeros(49, 49)
            sd[f"{tp}.mlp.fc1.weight"] = _inv_linear(blk["fc1"]["kernel"])
            sd[f"{tp}.mlp.fc1.bias"] = _t(blk["fc1"]["bias"])
            sd[f"{tp}.mlp.fc2.weight"] = _inv_linear(blk["fc2"]["kernel"])
            sd[f"{tp}.mlp.fc2.bias"] = _t(blk["fc2"]["bias"])
    sd["norm.weight"] = _t(p["norm"]["scale"])
    sd["norm.bias"] = _t(p["norm"]["bias"])

    converted = convert_swin_state_dict(sd)
    assert _tree_shapes(converted) == _tree_shapes(variables["params"])
    for a, b in zip(
        jax.tree_util.tree_leaves(converted), jax.tree_util.tree_leaves(p)
    ):
        np.testing.assert_allclose(a, b, rtol=1e-6)
    out = model.apply({"params": converted}, jnp.zeros((1, 64, 64, 3)), train=False)
    assert out.shape == (1, cfg.num_features)


def _emit_effnet_block(sd, tk, blk_p, blk_s, fused):
    if fused:
        sd[f"{tk}.conv_exp.weight"] = _inv_conv(blk_p["fused_conv"]["kernel"])
        _emit_bn(sd, f"{tk}.bn1", blk_p["fused_bn"], blk_s["fused_bn"])
        sd[f"{tk}.conv_pwl.weight"] = _inv_conv(blk_p["project_conv"]["kernel"])
        _emit_bn(sd, f"{tk}.bn2", blk_p["project_bn"], blk_s["project_bn"])
        return
    if "expand_conv" in blk_p:
        sd[f"{tk}.conv_pw.weight"] = _inv_conv(blk_p["expand_conv"]["kernel"])
        _emit_bn(sd, f"{tk}.bn1", blk_p["expand_bn"], blk_s["expand_bn"])
        sd[f"{tk}.conv_dw.weight"] = _inv_dwconv(blk_p["dwconv"]["kernel"])
        _emit_bn(sd, f"{tk}.bn2", blk_p["dw_bn"], blk_s["dw_bn"])
        sd[f"{tk}.conv_pwl.weight"] = _inv_conv(blk_p["project_conv"]["kernel"])
        _emit_bn(sd, f"{tk}.bn3", blk_p["project_bn"], blk_s["project_bn"])
    else:
        sd[f"{tk}.conv_dw.weight"] = _inv_dwconv(blk_p["dwconv"]["kernel"])
        _emit_bn(sd, f"{tk}.bn1", blk_p["dw_bn"], blk_s["dw_bn"])
        sd[f"{tk}.conv_pw.weight"] = _inv_conv(blk_p["project_conv"]["kernel"])
        _emit_bn(sd, f"{tk}.bn2", blk_p["project_bn"], blk_s["project_bn"])
    if "se" in blk_p:
        se = blk_p["se"]
        sd[f"{tk}.se.conv_reduce.weight"] = _t(
            se["fc1"]["kernel"].T[:, :, None, None]
        )
        sd[f"{tk}.se.conv_reduce.bias"] = _t(se["fc1"]["bias"])
        sd[f"{tk}.se.conv_expand.weight"] = _t(
            se["fc2"]["kernel"].T[:, :, None, None]
        )
        sd[f"{tk}.se.conv_expand.bias"] = _t(se["fc2"]["bias"])


def test_efficientnet_conversion_matches_init_tree():
    from spine_vision_tpu.models.efficientnet import (
        EFFICIENTNET_CONFIGS,
        EfficientNet,
    )

    for variant in ("efficientnet_b0", "efficientnetv2_s"):
        cfg = EFFICIENTNET_CONFIGS[variant]
        model = EfficientNet(config=cfg, dtype=jnp.float32)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
        )
        p = jax.tree_util.tree_map(np.asarray, variables["params"])
        s = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

        sd = {}
        sd["conv_stem.weight"] = _inv_conv(p["stem_conv"]["kernel"])
        _emit_bn(sd, "bn1", p["stem_bn"], s["stem_bn"])
        for si, spec in enumerate(cfg.blocks):
            for b in range(spec.num_blocks):
                name = f"stage{si + 1}_block{b + 1}"
                _emit_effnet_block(
                    sd, f"blocks.{si}.{b}", p[name], s[name], spec.kind == "fused"
                )
        sd["conv_head.weight"] = _inv_conv(p["head_conv"]["kernel"])
        _emit_bn(sd, "bn2", p["head_bn"], s["head_bn"])
        sd["classifier.weight"] = _t(np.zeros((10, cfg.head_filters)))

        cp, cs = convert_efficientnet_state_dict(sd)
        assert _tree_shapes(cp) == _tree_shapes(variables["params"]), variant
        assert _tree_shapes(cs) == _tree_shapes(variables["batch_stats"]), variant
        out = model.apply(
            {"params": cp, "batch_stats": cs},
            jnp.zeros((1, 64, 64, 3)),
            train=False,
        )
        assert out.shape == (1, cfg.head_filters)
        assert np.all(np.isfinite(np.asarray(out))), variant


def test_mobilenetv3_conversion_matches_init_tree():
    from spine_vision_tpu.models.efficientnet import (
        MOBILENETV3_CONFIGS,
        MobileNetV3,
    )

    cfg = MOBILENETV3_CONFIGS["mobilenetv3_small"]
    model = MobileNetV3(config=cfg, dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    s = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

    sd = {}
    sd["conv_stem.weight"] = _inv_conv(p["stem_conv"]["kernel"])
    _emit_bn(sd, "bn1", p["stem_bn"], s["stem_bn"])
    for i in range(1, len(cfg.blocks) + 1):
        tk = f"blocks.0.{i - 1}"
        if f"block{i}_expand" in p:
            sd[f"{tk}.conv_pw.weight"] = _inv_conv(p[f"block{i}_expand"]["kernel"])
            _emit_bn(sd, f"{tk}.bn1", p[f"block{i}_expand_bn"], s[f"block{i}_expand_bn"])
            sd[f"{tk}.conv_dw.weight"] = _inv_dwconv(p[f"block{i}_dw"]["kernel"])
            _emit_bn(sd, f"{tk}.bn2", p[f"block{i}_dw_bn"], s[f"block{i}_dw_bn"])
            sd[f"{tk}.conv_pwl.weight"] = _inv_conv(p[f"block{i}_project"]["kernel"])
            _emit_bn(sd, f"{tk}.bn3", p[f"block{i}_project_bn"], s[f"block{i}_project_bn"])
        else:
            sd[f"{tk}.conv_dw.weight"] = _inv_dwconv(p[f"block{i}_dw"]["kernel"])
            _emit_bn(sd, f"{tk}.bn1", p[f"block{i}_dw_bn"], s[f"block{i}_dw_bn"])
            sd[f"{tk}.conv_pw.weight"] = _inv_conv(p[f"block{i}_project"]["kernel"])
            _emit_bn(sd, f"{tk}.bn2", p[f"block{i}_project_bn"], s[f"block{i}_project_bn"])
        if f"block{i}_se" in p:
            se = p[f"block{i}_se"]
            sd[f"{tk}.se.conv_reduce.weight"] = _t(se["fc1"]["kernel"].T[:, :, None, None])
            sd[f"{tk}.se.conv_reduce.bias"] = _t(se["fc1"]["bias"])
            sd[f"{tk}.se.conv_expand.weight"] = _t(se["fc2"]["kernel"].T[:, :, None, None])
            sd[f"{tk}.se.conv_expand.bias"] = _t(se["fc2"]["bias"])
    # Final ConvBnAct stage -> head conv/bn; post-pool conv_head -> head_fc.
    n = len(cfg.blocks)
    sd[f"blocks.0.{n}.conv.weight"] = _inv_conv(p["head_conv"]["kernel"])
    _emit_bn(sd, f"blocks.0.{n}.bn1", p["head_bn"], s["head_bn"])
    sd["conv_head.weight"] = _t(p["head_fc"]["kernel"].T[:, :, None, None])
    sd["conv_head.bias"] = _t(p["head_fc"]["bias"])

    cp, cs = convert_mobilenetv3_state_dict(sd)
    assert _tree_shapes(cp) == _tree_shapes(variables["params"])
    assert _tree_shapes(cs) == _tree_shapes(variables["batch_stats"])
    out = model.apply(
        {"params": cp, "batch_stats": cs}, jnp.zeros((1, 64, 64, 3)), train=False
    )
    assert out.shape == (1, cfg.head_filters)
    assert np.all(np.isfinite(np.asarray(out)))


# ---------------------------------------------------------------------------
# Full-model numeric oracles (round-3, VERDICT item 5): run random torch-format
# weights through the converter AND through a hand-written
# torch.nn.functional forward of the reference architecture, and require the
# Flax forward to match torch to ~1e-4. This is the end-to-end check that the
# per-op convention tests above cannot give: a silent wiring error (downsample
# order, BN eps, stride placement, qkv packing) fails here.
# Reference: timm backbone consumption, training/models/backbone.py:143-177.
# ---------------------------------------------------------------------------


def _torch_resnet18_forward(sd, x):
    """torchvision resnet18 (num_classes=0 contract) via F.* only."""
    F = torch.nn.functional

    def bn(name, h):
        return F.batch_norm(
            h,
            sd[f"{name}.running_mean"],
            sd[f"{name}.running_var"],
            sd[f"{name}.weight"],
            sd[f"{name}.bias"],
            training=False,
            eps=1e-5,
        )

    h = F.conv2d(x, sd["conv1.weight"], None, 2, 3)
    h = F.relu(bn("bn1", h))
    h = F.max_pool2d(h, 3, 2, 1)
    for layer in (1, 2, 3, 4):
        for b in (0, 1):
            p = f"layer{layer}.{b}"
            stride = 2 if (layer > 1 and b == 0) else 1
            identity = h
            out = F.conv2d(h, sd[f"{p}.conv1.weight"], None, stride, 1)
            out = F.relu(bn(f"{p}.bn1", out))
            out = F.conv2d(out, sd[f"{p}.conv2.weight"], None, 1, 1)
            out = bn(f"{p}.bn2", out)
            if f"{p}.downsample.0.weight" in sd:
                identity = bn(
                    f"{p}.downsample.1",
                    F.conv2d(h, sd[f"{p}.downsample.0.weight"], None, stride),
                )
            h = F.relu(out + identity)
    return h.mean(dim=(2, 3))


def test_resnet18_full_model_matches_torch_oracle():
    # Tame the random weights (keep running_var as-is: it must stay
    # positive) so activations don't blow up f32 through 8 blocks.
    sd = {
        k: (v if "running_var" in k else v * 0.1)
        for k, v in _synth_resnet18_torch_sd().items()
    }
    params, stats = convert_resnet_state_dict(sd)
    model = ResNet(config=RESNET_CONFIGS["resnet18"], dtype=jnp.float32)

    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        torch_out = _torch_resnet18_forward(sd, torch.tensor(x)).numpy()
    jax_out = np.asarray(
        model.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(x.transpose(0, 2, 3, 1)),
            train=False,
        )
    )
    np.testing.assert_allclose(jax_out, torch_out, rtol=1e-4, atol=1e-4)


def _torch_convnext_tiny_forward(sd, x, gelu="none"):
    """facebookresearch ConvNeXt-tiny forward_features via F.* only."""
    F = torch.nn.functional
    dims = (96, 192, 384, 768)
    depths = (3, 3, 9, 3)

    def ln(prefix, h):  # channels-last LN, eps 1e-6 (reference impl)
        return F.layer_norm(
            h, (h.shape[-1],), sd[f"{prefix}.weight"], sd[f"{prefix}.bias"], 1e-6
        )

    h = F.conv2d(
        x, sd["downsample_layers.0.0.weight"], sd["downsample_layers.0.0.bias"], 4
    )
    h = ln("downsample_layers.0.1", h.permute(0, 2, 3, 1))
    for s in range(4):
        if s > 0:
            h = ln(f"downsample_layers.{s}.0", h).permute(0, 3, 1, 2)
            h = F.conv2d(
                h,
                sd[f"downsample_layers.{s}.1.weight"],
                sd[f"downsample_layers.{s}.1.bias"],
                2,
            ).permute(0, 2, 3, 1)
        for b in range(depths[s]):
            p = f"stages.{s}.{b}"
            inp = h
            y = F.conv2d(
                h.permute(0, 3, 1, 2),
                sd[f"{p}.dwconv.weight"],
                sd[f"{p}.dwconv.bias"],
                1,
                3,
                groups=dims[s],
            ).permute(0, 2, 3, 1)
            y = ln(f"{p}.norm", y)
            y = F.linear(y, sd[f"{p}.pwconv1.weight"], sd[f"{p}.pwconv1.bias"])
            y = F.gelu(y, approximate=gelu)
            y = F.linear(y, sd[f"{p}.pwconv2.weight"], sd[f"{p}.pwconv2.bias"])
            h = inp + sd[f"{p}.gamma"] * y
    h = h.mean(dim=(1, 2))
    return ln("norm", h)


def _scaled_convnext_sd():
    """Tame random weights so activations stay O(1) through 18 blocks."""
    sd = _synth_convnext_tiny_torch_sd()
    out = {}
    for key, value in sd.items():
        v = value * 0.2
        if key.endswith(".gamma"):
            v = value * 0.02
        out[key] = v
    return out


@pytest.mark.parametrize("gelu", ["erf", "tanh"])
def test_convnext_tiny_full_model_matches_torch_oracle(gelu):
    """Both activation modes: gelu='erf' is exact torch nn.GELU parity
    (PARITY.md: the framework default is tanh, deviation < bf16 rounding);
    'tanh' pins the default path against torch's approximate='tanh'."""
    sd = _scaled_convnext_sd()
    params = convert_convnext_state_dict(sd)
    model = ConvNeXt(
        config=CONVNEXT_CONFIGS["convnext_tiny"], dtype=jnp.float32, gelu=gelu
    )

    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        torch_out = _torch_convnext_tiny_forward(
            sd, torch.tensor(x), gelu="none" if gelu == "erf" else "tanh"
        ).numpy()
    jax_out = np.asarray(
        model.apply(
            {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False
        )
    )
    np.testing.assert_allclose(jax_out, torch_out, rtol=1e-4, atol=1e-4)


def _torch_vit_forward(sd, x, num_heads, depth):
    """timm vit (class-token pooling) via F.* only."""
    F = torch.nn.functional
    d = sd["cls_token"].shape[-1]
    h = F.conv2d(x, sd["patch_embed.proj.weight"], sd["patch_embed.proj.bias"], 16)
    bsz = h.shape[0]
    h = h.flatten(2).transpose(1, 2)
    h = torch.cat([sd["cls_token"].expand(bsz, -1, -1), h], dim=1)
    h = h + sd["pos_embed"]

    def ln(prefix, t):
        return F.layer_norm(
            t, (d,), sd[f"{prefix}.weight"], sd[f"{prefix}.bias"], 1e-6
        )

    def split_heads(t):
        return t.view(bsz, -1, num_heads, d // num_heads).transpose(1, 2)

    for i in range(depth):
        tp = f"blocks.{i}"
        y = ln(f"{tp}.norm1", h)
        qkv = F.linear(y, sd[f"{tp}.attn.qkv.weight"], sd[f"{tp}.attn.qkv.bias"])
        q, k, v = qkv.chunk(3, dim=-1)
        att = F.scaled_dot_product_attention(
            split_heads(q), split_heads(k), split_heads(v)
        )
        att = att.transpose(1, 2).reshape(bsz, -1, d)
        h = h + F.linear(
            att, sd[f"{tp}.attn.proj.weight"], sd[f"{tp}.attn.proj.bias"]
        )
        y = ln(f"{tp}.norm2", h)
        y = F.linear(y, sd[f"{tp}.mlp.fc1.weight"], sd[f"{tp}.mlp.fc1.bias"])
        y = F.gelu(y)
        y = F.linear(y, sd[f"{tp}.mlp.fc2.weight"], sd[f"{tp}.mlp.fc2.bias"])
        h = h + y
    return ln("norm", h)[:, 0]


def test_vit_tiny_full_model_matches_torch_oracle():
    from spine_vision_tpu.models.vit import VIT_CONFIGS, ViT

    cfg = VIT_CONFIGS["vit_tiny"]
    model = ViT(config=cfg, dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)), train=False
    )
    # Randomize EVERY leaf (init zeros would hide bias/cls wiring errors),
    # scaled small so activations stay sane through 12 blocks.
    rng = np.random.default_rng(5)
    p = jax.tree_util.tree_map(
        lambda a: (rng.normal(size=a.shape) * 0.05).astype(np.float32),
        jax.tree_util.tree_map(np.asarray, variables["params"]),
    )

    d = cfg.hidden_dim
    sd = {"cls_token": _t(p["cls_token"]), "pos_embed": _t(p["pos_embed"])}
    sd["patch_embed.proj.weight"] = _inv_conv(p["patch_embed"]["kernel"])
    sd["patch_embed.proj.bias"] = _t(p["patch_embed"]["bias"])
    for i in range(1, cfg.depth + 1):
        blk = p[f"block{i}"]
        tp = f"blocks.{i - 1}"
        for norm in ("norm1", "norm2"):
            sd[f"{tp}.{norm}.weight"] = _t(blk[norm]["scale"])
            sd[f"{tp}.{norm}.bias"] = _t(blk[norm]["bias"])
        qkv_w = np.concatenate(
            [
                blk["attn"][k]["kernel"].reshape(d, d).T
                for k in ("query", "key", "value")
            ],
            axis=0,
        )
        qkv_b = np.concatenate(
            [blk["attn"][k]["bias"].reshape(-1) for k in ("query", "key", "value")]
        )
        sd[f"{tp}.attn.qkv.weight"] = _t(qkv_w)
        sd[f"{tp}.attn.qkv.bias"] = _t(qkv_b)
        sd[f"{tp}.attn.proj.weight"] = _t(blk["attn"]["out"]["kernel"].reshape(d, d).T)
        sd[f"{tp}.attn.proj.bias"] = _t(blk["attn"]["out"]["bias"])
        sd[f"{tp}.mlp.fc1.weight"] = _inv_linear(blk["fc1"]["kernel"])
        sd[f"{tp}.mlp.fc1.bias"] = _t(blk["fc1"]["bias"])
        sd[f"{tp}.mlp.fc2.weight"] = _inv_linear(blk["fc2"]["kernel"])
        sd[f"{tp}.mlp.fc2.bias"] = _t(blk["fc2"]["bias"])
    sd["norm.weight"] = _t(p["norm"]["scale"])
    sd["norm.bias"] = _t(p["norm"]["bias"])
    sd["head.weight"] = _t(np.zeros((10, d)))
    sd["head.bias"] = _t(np.zeros(10))

    converted = convert_vit_state_dict(sd, cfg.num_heads)
    x = rng.normal(size=(1, 3, 224, 224)).astype(np.float32)
    with torch.no_grad():
        torch_out = _torch_vit_forward(
            sd, torch.tensor(x), cfg.num_heads, cfg.depth
        ).numpy()
    jax_out = np.asarray(
        model.apply(
            {"params": converted}, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False
        )
    )
    np.testing.assert_allclose(jax_out, torch_out, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# EfficientNet-B0 full-model oracle: the torch side DEFINES the timm layout
# (shapes synthesized from the architecture spec, not from Flax init), so SE
# squeeze widths, BN eps, stride placement, and residual gating are all
# checked against an independent implementation. timm semantics: SE squeeze
# width = round(in_chs * se_ratio) with the block activation (SiLU) inside
# and a sigmoid gate; BN eps 1e-3.
# Reference consumption: efficientnet_b0.ra_in1k, backbone.py:73-77.
# ---------------------------------------------------------------------------

# (kind, expand, in0, out, num_blocks, kernel, stride) — unscaled B0.
_B0_SPECS = (
    ("ds", 1, 32, 16, 1, 3, 1),
    ("ir", 6, 16, 24, 2, 3, 2),
    ("ir", 6, 24, 40, 2, 5, 2),
    ("ir", 6, 40, 80, 3, 3, 2),
    ("ir", 6, 80, 112, 3, 5, 1),
    ("ir", 6, 112, 192, 4, 5, 2),
    ("ir", 6, 192, 320, 1, 3, 1),
)


def _synth_effnet_b0_sd():
    rng = np.random.default_rng(11)
    sd = {}

    def t(*shape, scale=0.1):
        return torch.tensor((rng.normal(size=shape) * scale).astype(np.float32))

    def bn(name, c):
        sd[f"{name}.weight"] = t(c, scale=1.0)
        sd[f"{name}.bias"] = t(c)
        sd[f"{name}.running_mean"] = t(c)
        sd[f"{name}.running_var"] = torch.abs(t(c, scale=1.0)) + 0.5

    def se(p, mid, rd):
        sd[f"{p}.se.conv_reduce.weight"] = t(rd, mid, 1, 1)
        sd[f"{p}.se.conv_reduce.bias"] = t(rd)
        sd[f"{p}.se.conv_expand.weight"] = t(mid, rd, 1, 1)
        sd[f"{p}.se.conv_expand.bias"] = t(mid)

    sd["conv_stem.weight"] = t(32, 3, 3, 3)
    bn("bn1", 32)
    for s, (kind, e, cin0, cout, n, k, _stride) in enumerate(_B0_SPECS):
        for b in range(n):
            cin = cin0 if b == 0 else cout
            mid = cin * e
            rd = max(1, cin // 4)
            p = f"blocks.{s}.{b}"
            if kind == "ds":
                sd[f"{p}.conv_dw.weight"] = t(mid, 1, k, k)
                bn(f"{p}.bn1", mid)
                se(p, mid, rd)
                sd[f"{p}.conv_pw.weight"] = t(cout, mid, 1, 1)
                bn(f"{p}.bn2", cout)
            else:
                sd[f"{p}.conv_pw.weight"] = t(mid, cin, 1, 1)
                bn(f"{p}.bn1", mid)
                sd[f"{p}.conv_dw.weight"] = t(mid, 1, k, k)
                bn(f"{p}.bn2", mid)
                se(p, mid, rd)
                sd[f"{p}.conv_pwl.weight"] = t(cout, mid, 1, 1)
                bn(f"{p}.bn3", cout)
    sd["conv_head.weight"] = t(1280, 320, 1, 1)
    bn("bn2", 1280)
    sd["classifier.weight"] = t(10, 1280)
    sd["classifier.bias"] = t(10)
    return sd


def _torch_effnet_b0_forward(sd, x):
    F = torch.nn.functional

    def bn(name, h):
        return F.batch_norm(
            h,
            sd[f"{name}.running_mean"],
            sd[f"{name}.running_var"],
            sd[f"{name}.weight"],
            sd[f"{name}.bias"],
            training=False,
            eps=1e-3,
        )

    def se(p, y):
        s = y.mean((2, 3), keepdim=True)
        s = F.silu(
            F.conv2d(
                s, sd[f"{p}.se.conv_reduce.weight"], sd[f"{p}.se.conv_reduce.bias"]
            )
        )
        s = torch.sigmoid(
            F.conv2d(
                s, sd[f"{p}.se.conv_expand.weight"], sd[f"{p}.se.conv_expand.bias"]
            )
        )
        return y * s

    h = F.silu(bn("bn1", F.conv2d(x, sd["conv_stem.weight"], None, 2, 1)))
    for s, (kind, e, cin0, cout, n, k, stride) in enumerate(_B0_SPECS):
        for b in range(n):
            cin = cin0 if b == 0 else cout
            st = stride if b == 0 else 1
            mid = cin * e
            p = f"blocks.{s}.{b}"
            identity = h
            if kind == "ds":
                y = F.silu(
                    bn(
                        f"{p}.bn1",
                        F.conv2d(
                            h, sd[f"{p}.conv_dw.weight"], None, st, k // 2,
                            groups=mid,
                        ),
                    )
                )
                y = se(p, y)
                y = bn(f"{p}.bn2", F.conv2d(y, sd[f"{p}.conv_pw.weight"]))
            else:
                y = F.silu(bn(f"{p}.bn1", F.conv2d(h, sd[f"{p}.conv_pw.weight"])))
                y = F.silu(
                    bn(
                        f"{p}.bn2",
                        F.conv2d(
                            y, sd[f"{p}.conv_dw.weight"], None, st, k // 2,
                            groups=mid,
                        ),
                    )
                )
                y = se(p, y)
                y = bn(f"{p}.bn3", F.conv2d(y, sd[f"{p}.conv_pwl.weight"]))
            if st == 1 and cin == cout:
                y = y + identity
            h = y
    h = F.silu(bn("bn2", F.conv2d(h, sd["conv_head.weight"])))
    return h.mean((2, 3))


def test_efficientnet_b0_full_model_matches_torch_oracle():
    from spine_vision_tpu.models.convert import convert_efficientnet_state_dict
    from spine_vision_tpu.models.efficientnet import (
        EFFICIENTNET_CONFIGS,
        EfficientNet,
    )

    sd = _synth_effnet_b0_sd()
    params, stats = convert_efficientnet_state_dict(sd)
    model = EfficientNet(
        config=EFFICIENTNET_CONFIGS["efficientnet_b0"], dtype=jnp.float32
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    assert _tree_shapes(params) == _tree_shapes(variables["params"])
    assert _tree_shapes(stats) == _tree_shapes(variables["batch_stats"])

    rng = np.random.default_rng(12)
    x = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        torch_out = _torch_effnet_b0_forward(sd, torch.tensor(x)).numpy()
    jax_out = np.asarray(
        model.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(x.transpose(0, 2, 3, 1)),
            train=False,
        )
    )
    np.testing.assert_allclose(jax_out, torch_out, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# MobileNetV3-small full-model oracle — same contract as the B0 oracle: the
# torch side defines the timm layout (shapes from the architecture spec).
# timm MNv3 SE: squeeze width make_divisible(mid/4, 8), relu inside,
# hard-sigmoid gate; BN eps 1e-3; post-pool conv_head (with bias) + hswish.
# Reference consumption: mobilenetv3_small_100.lamb_in1k, backbone.py:83.
# ---------------------------------------------------------------------------

# timm stage grouping for mobilenetv3_small_100:
# (expand, out, kernel, stride, se, act) per block; final ConvBnAct stage.
_MNV3_SMALL_STAGES = (
    ((16, 16, 3, 2, True, "relu"),),
    ((72, 24, 3, 2, False, "relu"), (88, 24, 3, 1, False, "relu")),
    (
        (96, 40, 5, 2, True, "hswish"),
        (240, 40, 5, 1, True, "hswish"),
        (240, 40, 5, 1, True, "hswish"),
    ),
    ((120, 48, 5, 1, True, "hswish"), (144, 48, 5, 1, True, "hswish")),
    (
        (288, 96, 5, 2, True, "hswish"),
        (576, 96, 5, 1, True, "hswish"),
        (576, 96, 5, 1, True, "hswish"),
    ),
)


def _mnv3_rd(mid):
    from spine_vision_tpu.models.efficientnet import _scale_filters

    return _scale_filters(mid, 0.25)


def _synth_mnv3_small_sd():
    rng = np.random.default_rng(21)
    sd = {}

    def t(*shape, scale=0.1):
        return torch.tensor((rng.normal(size=shape) * scale).astype(np.float32))

    def bn(name, c):
        sd[f"{name}.weight"] = t(c, scale=1.0)
        sd[f"{name}.bias"] = t(c)
        sd[f"{name}.running_mean"] = t(c)
        sd[f"{name}.running_var"] = torch.abs(t(c, scale=1.0)) + 0.5

    sd["conv_stem.weight"] = t(16, 3, 3, 3)
    bn("bn1", 16)
    cin = 16
    for s, stage in enumerate(_MNV3_SMALL_STAGES):
        for b, (exp, out, k, _stride, use_se, _act) in enumerate(stage):
            p = f"blocks.{s}.{b}"
            if exp == cin:
                sd[f"{p}.conv_dw.weight"] = t(exp, 1, k, k)
                bn(f"{p}.bn1", exp)
                sd[f"{p}.conv_pw.weight"] = t(out, exp, 1, 1)
                bn(f"{p}.bn2", out)
            else:
                sd[f"{p}.conv_pw.weight"] = t(exp, cin, 1, 1)
                bn(f"{p}.bn1", exp)
                sd[f"{p}.conv_dw.weight"] = t(exp, 1, k, k)
                bn(f"{p}.bn2", exp)
                sd[f"{p}.conv_pwl.weight"] = t(out, exp, 1, 1)
                bn(f"{p}.bn3", out)
            if use_se:
                rd = _mnv3_rd(exp)
                sd[f"{p}.se.conv_reduce.weight"] = t(rd, exp, 1, 1)
                sd[f"{p}.se.conv_reduce.bias"] = t(rd)
                sd[f"{p}.se.conv_expand.weight"] = t(exp, rd, 1, 1)
                sd[f"{p}.se.conv_expand.bias"] = t(exp)
            cin = out
    s_final = len(_MNV3_SMALL_STAGES)
    sd[f"blocks.{s_final}.0.conv.weight"] = t(576, 96, 1, 1)
    bn(f"blocks.{s_final}.0.bn1", 576)
    sd["conv_head.weight"] = t(1024, 576, 1, 1)
    sd["conv_head.bias"] = t(1024)
    sd["classifier.weight"] = t(10, 1024)
    sd["classifier.bias"] = t(10)
    return sd


def _torch_mnv3_small_forward(sd, x):
    F = torch.nn.functional

    def bn(name, h):
        return F.batch_norm(
            h,
            sd[f"{name}.running_mean"],
            sd[f"{name}.running_var"],
            sd[f"{name}.weight"],
            sd[f"{name}.bias"],
            training=False,
            eps=1e-3,
        )

    def se(p, y):
        s = y.mean((2, 3), keepdim=True)
        s = F.relu(
            F.conv2d(
                s, sd[f"{p}.se.conv_reduce.weight"], sd[f"{p}.se.conv_reduce.bias"]
            )
        )
        s = F.hardsigmoid(
            F.conv2d(
                s, sd[f"{p}.se.conv_expand.weight"], sd[f"{p}.se.conv_expand.bias"]
            )
        )
        return y * s

    h = F.hardswish(bn("bn1", F.conv2d(x, sd["conv_stem.weight"], None, 2, 1)))
    cin = 16
    for s, stage in enumerate(_MNV3_SMALL_STAGES):
        for b, (exp, out, k, stride, use_se, act_name) in enumerate(stage):
            act = F.relu if act_name == "relu" else F.hardswish
            p = f"blocks.{s}.{b}"
            identity = h
            y = h
            if exp != cin:
                y = act(bn(f"{p}.bn1", F.conv2d(y, sd[f"{p}.conv_pw.weight"])))
                dw_bn, proj_key, proj_bn = "bn2", "conv_pwl", "bn3"
            else:
                dw_bn, proj_key, proj_bn = "bn1", "conv_pw", "bn2"
            y = act(
                bn(
                    f"{p}.{dw_bn}",
                    F.conv2d(
                        y, sd[f"{p}.conv_dw.weight"], None, stride, k // 2,
                        groups=exp,
                    ),
                )
            )
            if use_se:
                y = se(p, y)
            y = bn(f"{p}.{proj_bn}", F.conv2d(y, sd[f"{p}.{proj_key}.weight"]))
            if stride == 1 and cin == out:
                y = y + identity
            h = y
            cin = out
    s_final = len(_MNV3_SMALL_STAGES)
    h = F.hardswish(
        bn(
            f"blocks.{s_final}.0.bn1",
            F.conv2d(h, sd[f"blocks.{s_final}.0.conv.weight"]),
        )
    )
    h = h.mean((2, 3))
    h = F.hardswish(
        F.linear(
            h,
            sd["conv_head.weight"].reshape(1024, 576),
            sd["conv_head.bias"],
        )
    )
    return h


def test_mobilenetv3_small_full_model_matches_torch_oracle():
    from spine_vision_tpu.models.convert import convert_mobilenetv3_state_dict
    from spine_vision_tpu.models.efficientnet import (
        MOBILENETV3_CONFIGS,
        MobileNetV3,
    )

    sd = _synth_mnv3_small_sd()
    params, stats = convert_mobilenetv3_state_dict(sd)
    model = MobileNetV3(
        config=MOBILENETV3_CONFIGS["mobilenetv3_small"], dtype=jnp.float32
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    assert _tree_shapes(params) == _tree_shapes(variables["params"])
    assert _tree_shapes(stats) == _tree_shapes(variables["batch_stats"])

    rng = np.random.default_rng(22)
    x = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        torch_out = _torch_mnv3_small_forward(sd, torch.tensor(x)).numpy()
    jax_out = np.asarray(
        model.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(x.transpose(0, 2, 3, 1)),
            train=False,
        )
    )
    np.testing.assert_allclose(jax_out, torch_out, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# Swin-tiny full-model oracle — torch side implements the original
# SwinTransformer algorithm (window partition, cyclic shift + additive mask,
# relative position bias, timm patch-merge concat order x0/x1/x2/x3 =
# (h0w0, h1w0, h0w1, h1w1)) with timm naming, so the converter's merge-group
# permutation and qkv packing are checked numerically.
# Reference consumption: swin_tiny via timm, backbone.py:747-749.
# ---------------------------------------------------------------------------

_SWIN_T = dict(dims=(96, 192, 384, 768), depths=(2, 2, 6, 2), heads=(3, 6, 12, 24), ws=7)


def _torch_rel_index(ws):
    coords = torch.stack(
        torch.meshgrid(torch.arange(ws), torch.arange(ws), indexing="ij")
    )
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.permute(1, 2, 0).contiguous()
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


def _synth_swin_tiny_sd():
    rng = np.random.default_rng(31)
    sd = {}

    def t(*shape, scale=0.1):
        return torch.tensor((rng.normal(size=shape) * scale).astype(np.float32))

    def lnp(name, c):
        sd[f"{name}.weight"] = t(c, scale=1.0)
        sd[f"{name}.bias"] = t(c)

    cfg = _SWIN_T
    sd["patch_embed.proj.weight"] = t(96, 3, 4, 4)
    sd["patch_embed.proj.bias"] = t(96)
    lnp("patch_embed.norm", 96)
    for s, (d, depth, heads) in enumerate(
        zip(cfg["dims"], cfg["depths"], cfg["heads"])
    ):
        if s > 0:
            sd[f"layers.{s}.downsample.reduction.weight"] = t(d, 2 * d)
            lnp(f"layers.{s}.downsample.norm", 2 * d)
        for b in range(depth):
            p = f"layers.{s}.blocks.{b}"
            lnp(f"{p}.norm1", d)
            sd[f"{p}.attn.qkv.weight"] = t(3 * d, d)
            sd[f"{p}.attn.qkv.bias"] = t(3 * d)
            sd[f"{p}.attn.proj.weight"] = t(d, d)
            sd[f"{p}.attn.proj.bias"] = t(d)
            sd[f"{p}.attn.relative_position_bias_table"] = t(
                (2 * cfg["ws"] - 1) ** 2, heads
            )
            sd[f"{p}.attn.relative_position_index"] = _torch_rel_index(cfg["ws"])
            lnp(f"{p}.norm2", d)
            sd[f"{p}.mlp.fc1.weight"] = t(4 * d, d)
            sd[f"{p}.mlp.fc1.bias"] = t(4 * d)
            sd[f"{p}.mlp.fc2.weight"] = t(d, 4 * d)
            sd[f"{p}.mlp.fc2.bias"] = t(d)
    lnp("norm", 768)
    sd["head.weight"] = t(10, 768)
    sd["head.bias"] = t(10)
    return sd


def _torch_swin_tiny_forward(sd, x):
    F = torch.nn.functional
    cfg = _SWIN_T
    ws = cfg["ws"]

    def ln(name, h):
        return F.layer_norm(
            h, (h.shape[-1],), sd[f"{name}.weight"], sd[f"{name}.bias"], 1e-5
        )

    def win_part(h):
        b, H, W, c = h.shape
        h = h.view(b, H // ws, ws, W // ws, ws, c)
        return h.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)

    def win_rev(wins, b, H, W):
        c = wins.shape[-1]
        h = wins.view(b, H // ws, W // ws, ws, ws, c)
        return h.permute(0, 1, 3, 2, 4, 5).reshape(b, H, W, c)

    def attn_mask(H, W, shift):
        img = torch.zeros(1, H, W, 1)
        cnt = 0
        for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
                img[:, hs, wsl, :] = cnt
                cnt += 1
        mw = win_part(img).squeeze(-1)
        m = mw[:, None, :] - mw[:, :, None]
        return torch.where(m != 0, torch.tensor(-100.0), torch.tensor(0.0))

    def block(p, h, heads, shift):
        b, H, W, c = h.shape
        hd = c // heads
        if min(H, W) <= ws:
            shift = 0
        y = ln(f"{p}.norm1", h)
        if shift:
            y = torch.roll(y, (-shift, -shift), dims=(1, 2))
        wins = win_part(y)
        qkv = F.linear(wins, sd[f"{p}.attn.qkv.weight"], sd[f"{p}.attn.qkv.bias"])
        n = ws * ws
        qkv = qkv.reshape(-1, n, 3, heads, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * hd**-0.5) @ k.transpose(-2, -1)
        idx = sd[f"{p}.attn.relative_position_index"]
        bias = sd[f"{p}.attn.relative_position_bias_table"][
            idx.reshape(-1)
        ].reshape(n, n, heads).permute(2, 0, 1)
        attn = attn + bias[None]
        if shift:
            mask = attn_mask(H, W, shift)
            nw = mask.shape[0]
            attn = attn.view(-1, nw, heads, n, n) + mask[None, :, None]
            attn = attn.view(-1, heads, n, n)
        attn = attn.softmax(-1)
        out = (attn @ v).transpose(1, 2).reshape(-1, n, c)
        out = F.linear(out, sd[f"{p}.attn.proj.weight"], sd[f"{p}.attn.proj.bias"])
        y = win_rev(out, b, H, W)
        if shift:
            y = torch.roll(y, (shift, shift), dims=(1, 2))
        h = h + y
        y = ln(f"{p}.norm2", h)
        y = F.gelu(F.linear(y, sd[f"{p}.mlp.fc1.weight"], sd[f"{p}.mlp.fc1.bias"]))
        y = F.linear(y, sd[f"{p}.mlp.fc2.weight"], sd[f"{p}.mlp.fc2.bias"])
        return h + y

    h = F.conv2d(x, sd["patch_embed.proj.weight"], sd["patch_embed.proj.bias"], 4)
    h = ln("patch_embed.norm", h.permute(0, 2, 3, 1))
    for s, (depth, heads) in enumerate(zip(cfg["depths"], cfg["heads"])):
        if s > 0:
            x0 = h[:, 0::2, 0::2]
            x1 = h[:, 1::2, 0::2]
            x2 = h[:, 0::2, 1::2]
            x3 = h[:, 1::2, 1::2]
            m = ln(f"layers.{s}.downsample.norm", torch.cat([x0, x1, x2, x3], -1))
            h = F.linear(m, sd[f"layers.{s}.downsample.reduction.weight"])
        for b in range(depth):
            h = block(
                f"layers.{s}.blocks.{b}", h, heads,
                0 if b % 2 == 0 else ws // 2,
            )
    h = ln("norm", h)
    return h.mean((1, 2))


def test_swin_tiny_full_model_matches_torch_oracle():
    from spine_vision_tpu.models.convert import convert_swin_state_dict
    from spine_vision_tpu.models.swin import SWIN_CONFIGS, SwinTransformer

    sd = _synth_swin_tiny_sd()
    params = convert_swin_state_dict(sd)
    model = SwinTransformer(config=SWIN_CONFIGS["swin_tiny"], dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)), train=False
    )
    assert _tree_shapes(params) == _tree_shapes(variables["params"])

    rng = np.random.default_rng(32)
    x = rng.normal(size=(1, 3, 224, 224)).astype(np.float32)
    with torch.no_grad():
        torch_out = _torch_swin_tiny_forward(sd, torch.tensor(x)).numpy()
    jax_out = np.asarray(
        model.apply(
            {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False
        )
    )
    np.testing.assert_allclose(jax_out, torch_out, rtol=1e-4, atol=1e-4)


def test_npz_artifact_roundtrip_and_torch_free_load(tmp_path):
    """`spine-vision-tpu convert` path: torch .pth -> native .npz artifact,
    loaded back leaf-exact with the recorded arch enforced."""
    from spine_vision_tpu.models.convert import (
        convert_checkpoint,
        load_pretrained_backbone,
    )

    sd = _synth_resnet18_torch_sd()
    pth = tmp_path / "r18.pth"
    torch.save(sd, pth)
    npz = tmp_path / "r18.npz"
    convert_checkpoint(pth, "resnet18", npz)

    params, stats = load_pretrained_backbone(npz, "resnet18")
    ref_params, ref_stats = convert_resnet_state_dict(sd)
    for got, want in (
        (params, ref_params),
        (stats, ref_stats),
    ):
        got_leaves = jax.tree_util.tree_leaves_with_path(got)
        want_leaves = jax.tree_util.tree_leaves_with_path(want)
        assert len(got_leaves) == len(want_leaves)
        for (gp, gv), (wp, wv) in zip(got_leaves, want_leaves):
            assert gp == wp
            assert gv.dtype == np.asarray(wv).dtype
            np.testing.assert_array_equal(gv, np.asarray(wv))

    with pytest.raises(ValueError, match="converted for"):
        load_pretrained_backbone(npz, "convnext_tiny")

    # The torch-file path through the same entry point still works.
    params2, _ = load_pretrained_backbone(pth, "resnet18")
    assert _tree_shapes(params2) == _tree_shapes(ref_params)
