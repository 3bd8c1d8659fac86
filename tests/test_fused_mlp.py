"""Fused ConvNeXt-MLP Pallas kernel: interpreter-mode parity with XLA."""

import jax.numpy as jnp
import numpy as np
import pytest

from spine_vision_tpu.ops.fused_mlp import fused_mlp, mlp_reference


@pytest.mark.parametrize("m,c", [(256, 128), (512, 256)])
def test_parity_f32(m, c):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(m, c)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(c, 4 * c)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(4 * c,)), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(4 * c, c)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
    got = fused_mlp(x, w1, b1, w2, b2, tile_m=128, interpret=True)
    want = mlp_reference(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_non_tile_multiple_tokens():
    rng = np.random.default_rng(1)
    m, c = 300, 128
    x = jnp.asarray(rng.normal(size=(m, c)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(c, 4 * c)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(4 * c,)), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(4 * c, c)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
    got = fused_mlp(x, w1, b1, w2, b2, tile_m=128, interpret=True)
    want = mlp_reference(x, w1, b1, w2, b2)
    assert got.shape == (m, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_block_tail_gamma_residual():
    rng = np.random.default_rng(3)
    m, c = 256, 128
    x = jnp.asarray(rng.normal(size=(m, c)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(c, 4 * c)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(4 * c,)), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(4 * c, c)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
    gamma = jnp.asarray(rng.normal(size=(c,)) * 1e-2, jnp.float32)
    res = jnp.asarray(rng.normal(size=(m, c)), jnp.float32)
    got = fused_mlp(
        x, w1, b1, w2, b2, gamma=gamma, residual=res, tile_m=128, interpret=True
    )
    want = mlp_reference(x, w1, b1, w2, b2, gamma=gamma, residual=res)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_bf16_inputs():
    rng = np.random.default_rng(2)
    m, c = 256, 128
    x = jnp.asarray(rng.normal(size=(m, c)), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(c, 4 * c)) * 0.05, jnp.bfloat16)
    b1 = jnp.asarray(rng.normal(size=(4 * c,)), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(4 * c, c)) * 0.05, jnp.bfloat16)
    b2 = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
    got = fused_mlp(x, w1, b1, w2, b2, tile_m=128, interpret=True)
    want = mlp_reference(x, w1, b1, w2, b2)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=0.125
    )


def test_convnext_flags_match_xla_path():
    """ConvNeXt with Pallas dwconv+MLP flags matches the plain XLA model."""
    import jax

    from spine_vision_tpu.models.convnext import ConvNeXt, ConvNeXtConfig

    cfg = ConvNeXtConfig(depths=(1, 1), dims=(128, 256))
    x = jnp.asarray(
        np.random.default_rng(4).normal(size=(2, 32, 32, 3)), jnp.float32
    )
    ref_model = ConvNeXt(config=cfg)
    variables = ref_model.init(jax.random.key(0), x)
    want = ref_model.apply(variables, x)
    got = ConvNeXt(config=cfg, use_pallas_dwconv=True, use_pallas_mlp=True).apply(
        variables, x
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3)


def test_gradients_match_reference():
    """custom-VJP path: grads of the fused kernel match jax.grad of XLA."""
    import jax

    rng = np.random.default_rng(5)
    m, c = 192, 128
    args = (
        jnp.asarray(rng.normal(size=(m, c)), jnp.float32),
        jnp.asarray(rng.normal(size=(c, 4 * c)) * 0.05, jnp.float32),
        jnp.asarray(rng.normal(size=(4 * c,)), jnp.float32),
        jnp.asarray(rng.normal(size=(4 * c, c)) * 0.05, jnp.float32),
        jnp.asarray(rng.normal(size=(c,)), jnp.float32),
        jnp.asarray(rng.normal(size=(c,)) * 1e-2, jnp.float32),
        jnp.asarray(rng.normal(size=(m, c)), jnp.float32),
    )

    def loss_fused(*a):
        out = fused_mlp(
            a[0], a[1], a[2], a[3], a[4], gamma=a[5], residual=a[6],
            tile_m=128, interpret=True,
        )
        return jnp.sum(out * out)

    def loss_ref(*a):
        out = mlp_reference(a[0], a[1], a[2], a[3], a[4], gamma=a[5], residual=a[6])
        return jnp.sum(out * out)

    got = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    want = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    for i, (ga, wa) in enumerate(zip(got, want)):
        np.testing.assert_allclose(
            np.asarray(ga), np.asarray(wa), atol=5e-3, rtol=1e-4,
            err_msg=f"grad mismatch for arg {i}",
        )


def test_gradients_plain_path_no_tail():
    """The public no-tail path (gamma=None, residual=None) must also be
    differentiable (it previously returned the raw pallas_call, ADVICE r1)."""
    import jax

    rng = np.random.default_rng(6)
    m, c = 160, 128
    args = (
        jnp.asarray(rng.normal(size=(m, c)), jnp.float32),
        jnp.asarray(rng.normal(size=(c, 4 * c)) * 0.05, jnp.float32),
        jnp.asarray(rng.normal(size=(4 * c,)), jnp.float32),
        jnp.asarray(rng.normal(size=(4 * c, c)) * 0.05, jnp.float32),
        jnp.asarray(rng.normal(size=(c,)), jnp.float32),
    )

    def loss_fused(*a):
        return jnp.sum(fused_mlp(*a, tile_m=128, interpret=True) ** 2)

    def loss_ref(*a):
        return jnp.sum(mlp_reference(*a) ** 2)

    got = jax.grad(loss_fused, argnums=tuple(range(5)))(*args)
    want = jax.grad(loss_ref, argnums=tuple(range(5)))(*args)
    for i, (ga, wa) in enumerate(zip(got, want)):
        np.testing.assert_allclose(
            np.asarray(ga), np.asarray(wa), atol=5e-3, rtol=1e-4,
            err_msg=f"grad mismatch for arg {i}",
        )


def test_convnext_grads_with_pallas_mlp():
    """Model-level grads with use_pallas_mlp=True match the XLA path."""
    import jax

    from spine_vision_tpu.models.convnext import ConvNeXt, ConvNeXtConfig

    cfg = ConvNeXtConfig(depths=(1,), dims=(128,))
    x = jnp.asarray(
        np.random.default_rng(6).normal(size=(2, 16, 16, 3)), jnp.float32
    )
    ref_model = ConvNeXt(config=cfg)
    variables = ref_model.init(jax.random.key(0), x)
    pallas_model = ConvNeXt(config=cfg, use_pallas_mlp=True)

    def loss(model, params):
        out = model.apply({"params": params}, x)
        return jnp.sum(out * out)

    g_ref = jax.grad(lambda p: loss(ref_model, p))(variables["params"])
    g_pal = jax.grad(lambda p: loss(pallas_model, p))(variables["params"])
    flat_ref = jax.tree.leaves_with_path(g_ref)
    flat_pal = dict(jax.tree.leaves_with_path(g_pal))
    assert len(flat_ref) == len(flat_pal)
    for path, leaf in flat_ref:
        np.testing.assert_allclose(
            np.asarray(flat_pal[path]), np.asarray(leaf), atol=1e-3, rtol=1e-3,
            err_msg=f"grad mismatch at {path}",
        )


def test_large_dim_falls_back_to_xla():
    """C beyond MAX_FUSED_DIM must route to the XLA composition, not OOM."""
    rng = np.random.default_rng(7)
    m, c = 64, 1024
    x = jnp.asarray(rng.normal(size=(m, c)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(c, 4 * c)) * 0.02, jnp.float32)
    b1 = jnp.zeros((4 * c,), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(4 * c, c)) * 0.02, jnp.float32)
    b2 = jnp.zeros((c,), jnp.float32)
    got = fused_mlp(x, w1, b1, w2, b2, interpret=True)
    want = mlp_reference(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_gradients_multi_hchunk_path():
    """C=512 routes the backward through 4 H-chunks (hc=512 < H=2048);
    chunk-accumulated weight grads must match the XLA reference."""
    import jax

    rng = np.random.default_rng(8)
    m, c = 320, 512  # m not a tile multiple: exercises zero-padded rows too
    args = (
        jnp.asarray(rng.normal(size=(m, c)), jnp.float32),
        jnp.asarray(rng.normal(size=(c, 4 * c)) * 0.02, jnp.float32),
        jnp.asarray(rng.normal(size=(4 * c,)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(4 * c, c)) * 0.02, jnp.float32),
        jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(c,)) * 1e-2, jnp.float32),
        jnp.asarray(rng.normal(size=(m, c)), jnp.float32),
    )

    def loss_fused(*a):
        out = fused_mlp(
            a[0], a[1], a[2], a[3], a[4], gamma=a[5], residual=a[6],
            interpret=True,
        )
        return jnp.sum(out * out)

    def loss_ref(*a):
        out = mlp_reference(a[0], a[1], a[2], a[3], a[4], gamma=a[5], residual=a[6])
        return jnp.sum(out * out)

    got = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    want = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    for i, (ga, wa) in enumerate(zip(got, want)):
        scale = max(1.0, float(jnp.max(jnp.abs(wa))))
        np.testing.assert_allclose(
            np.asarray(ga) / scale, np.asarray(wa) / scale, atol=5e-3,
            err_msg=f"grad mismatch for arg {i}",
        )


def test_ln_mlp_forward_matches_reference():
    """LN-fused variant: forward parity vs the XLA composition."""
    from spine_vision_tpu.ops.fused_mlp import fused_ln_mlp, ln_mlp_reference

    rng = np.random.default_rng(8)
    m, c = 192, 128
    x = jnp.asarray(rng.normal(size=(m, c)), jnp.float32)
    ls = jnp.asarray(1.0 + 0.1 * rng.normal(size=(c,)), jnp.float32)
    lb = jnp.asarray(0.05 * rng.normal(size=(c,)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(c, 4 * c)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(4 * c,)), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(4 * c, c)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
    gamma = jnp.asarray(rng.normal(size=(c,)) * 1e-2, jnp.float32)
    res = jnp.asarray(rng.normal(size=(m, c)), jnp.float32)
    got = fused_ln_mlp(x, ls, lb, w1, b1, w2, b2, gamma, res, tile_m=64, interpret=True)
    want = ln_mlp_reference(x, ls, lb, w1, b1, w2, b2, gamma, res)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-4)


@pytest.mark.parametrize("c,m,tile", [(128, 192, 64), (512, 96, 96)])
def test_ln_mlp_gradients_match_reference(c, m, tile):
    """LN-fused grads vs jax.grad of the XLA composition, incl. the
    multi-H-chunk backward at C=512 (hc=512 < H=2048)."""
    import jax

    from spine_vision_tpu.ops.fused_mlp import fused_ln_mlp, ln_mlp_reference

    rng = np.random.default_rng(9)
    args = (
        jnp.asarray(rng.normal(size=(m, c)), jnp.float32),
        jnp.asarray(1.0 + 0.1 * rng.normal(size=(c,)), jnp.float32),
        jnp.asarray(0.05 * rng.normal(size=(c,)), jnp.float32),
        jnp.asarray(rng.normal(size=(c, 4 * c)) * 0.03, jnp.float32),
        jnp.asarray(rng.normal(size=(4 * c,)) * 0.3, jnp.float32),
        jnp.asarray(rng.normal(size=(4 * c, c)) * 0.03, jnp.float32),
        jnp.asarray(rng.normal(size=(c,)) * 0.3, jnp.float32),
        jnp.asarray(rng.normal(size=(c,)) * 1e-2, jnp.float32),
        jnp.asarray(rng.normal(size=(m, c)), jnp.float32),
    )

    def loss_fused(*a):
        out = fused_ln_mlp(*a, tile_m=tile, interpret=True)
        return jnp.sum(out * out)

    def loss_ref(*a):
        return jnp.sum(ln_mlp_reference(*a) ** 2)

    got = jax.grad(loss_fused, argnums=tuple(range(9)))(*args)
    want = jax.grad(loss_ref, argnums=tuple(range(9)))(*args)
    for i, (ga, wa) in enumerate(zip(got, want)):
        scale = max(1.0, float(np.abs(np.asarray(wa)).max()))
        np.testing.assert_allclose(
            np.asarray(ga) / scale, np.asarray(wa) / scale, atol=5e-3,
            err_msg=f"grad mismatch for arg {i}",
        )


def test_fused_ln_mlp_nhwc_matches_flat():
    """The NHWC path (4-D blocks, no boundary reshape) must match the flat
    [M, C] path exactly — forward and all gradients — including when H does
    not divide the row tile (padded rows)."""
    import jax

    from spine_vision_tpu.ops.fused_mlp import fused_ln_mlp

    rng = np.random.default_rng(7)
    b, h, w, c = 2, 5, 8, 128
    x4 = jnp.asarray(rng.normal(size=(b, h, w, c)) * 0.5, jnp.float32)
    r4 = jnp.asarray(rng.normal(size=(b, h, w, c)) * 0.5, jnp.float32)
    ls = jnp.asarray(rng.normal(size=(c,)) + 1.0, jnp.float32)
    lb = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(c, 4 * c)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(4 * c,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(4 * c, c)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    gamma = jnp.asarray(rng.normal(size=(c,)) * 1e-2, jnp.float32)

    def run4(x4_, r4_, *params):
        return fused_ln_mlp(x4_, *params[:7], r4_, interpret=True)

    def run2(x4_, r4_, *params):
        out = fused_ln_mlp(
            x4_.reshape(-1, c), *params[:7], r4_.reshape(-1, c), interpret=True
        )
        return out.reshape(b, h, w, c)

    params = (ls, lb, w1, b1, w2, b2, gamma)
    out4 = run4(x4, r4, *params)
    out2 = run2(x4, r4, *params)
    assert out4.shape == (b, h, w, c)
    np.testing.assert_allclose(np.asarray(out4), np.asarray(out2), atol=1e-5)

    def loss4(*a):
        return jnp.sum(run4(*a).astype(jnp.float32) ** 2)

    def loss2(*a):
        return jnp.sum(run2(*a).astype(jnp.float32) ** 2)

    g4 = jax.grad(loss4, argnums=tuple(range(9)))(x4, r4, *params)
    g2 = jax.grad(loss2, argnums=tuple(range(9)))(x4, r4, *params)
    for i, (a, bb) in enumerate(zip(g4, g2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), atol=2e-4, err_msg=f"arg {i}"
        )


def test_fused_ln_mlp_nhwc_multi_hchunk(monkeypatch):
    """Force num_h > 1 so the NHWC backward exercises the chunked g_y
    accumulation + last-chunk LN backward (the production C=512 shape runs
    this path; CPU-interpret it at C=128 by shrinking the H chunk)."""
    import jax

    from spine_vision_tpu.ops import fused_mlp

    monkeypatch.setitem(fused_mlp._BWD_HCHUNK, 128, 256)  # hd=512 -> 2 chunks
    rng = np.random.default_rng(11)
    b, h, w, c = 1, 4, 8, 128
    x4 = jnp.asarray(rng.normal(size=(b, h, w, c)) * 0.5, jnp.float32)
    r4 = jnp.asarray(rng.normal(size=(b, h, w, c)) * 0.5, jnp.float32)
    ls = jnp.asarray(rng.normal(size=(c,)) + 1.0, jnp.float32)
    lb = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(c, 4 * c)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(4 * c,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(4 * c, c)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    gamma = jnp.asarray(rng.normal(size=(c,)) * 1e-2, jnp.float32)

    def loss_pallas(*a):
        out = fused_mlp.fused_ln_mlp(*a, interpret=True)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_ref(*a):
        out = fused_mlp.ln_mlp_reference(*a)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    args = (x4, ls, lb, w1, b1, w2, b2, gamma, r4)
    # reference path works on flattened tokens
    ref_args = (x4.reshape(-1, c), ls, lb, w1, b1, w2, b2, gamma, r4.reshape(-1, c))
    gp = jax.grad(loss_pallas, argnums=tuple(range(9)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(9)))(*ref_args)
    for i, (a, bb) in enumerate(zip(gp, gr)):
        np.testing.assert_allclose(
            np.asarray(a).reshape(np.asarray(bb).shape),
            np.asarray(bb),
            atol=3e-4,
            err_msg=f"arg {i}",
        )


def test_fused_ln_mlp_resident_bwd_c512():
    """C=512 dispatches to the resident-weights backward (internal
    fori_loop over H chunks, weights fetched once per kernel): gradients
    must match the XLA reference composition."""
    import jax

    from spine_vision_tpu.ops import fused_mlp

    rng = np.random.default_rng(13)
    m, c = 48, 512
    x = jnp.asarray(rng.normal(size=(m, c)) * 0.5, jnp.float32)
    r = jnp.asarray(rng.normal(size=(m, c)) * 0.5, jnp.float32)
    ls = jnp.asarray(rng.normal(size=(c,)) + 1.0, jnp.float32)
    lb = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(c, 4 * c)) * 0.02, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(4 * c,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(4 * c, c)) * 0.02, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    gamma = jnp.asarray(rng.normal(size=(c,)) * 1e-2, jnp.float32)
    args = (x, ls, lb, w1, b1, w2, b2, gamma, r)

    assert c in fused_mlp._RESIDENT_BWD_DIMS

    def loss_pallas(*a):
        return jnp.sum(
            fused_mlp.fused_ln_mlp(*a, interpret=True).astype(jnp.float32) ** 2
        )

    def loss_ref(*a):
        return jnp.sum(
            fused_mlp.ln_mlp_reference(*a).astype(jnp.float32) ** 2
        )

    gp = jax.grad(loss_pallas, argnums=tuple(range(9)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(9)))(*args)
    for i, (a, b) in enumerate(zip(gp, gr)):
        scale = max(1.0, float(jnp.max(jnp.abs(b))))
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=2e-4,
            err_msg=f"arg {i}",
        )
