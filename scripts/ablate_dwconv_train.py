"""In-model fwd+bwd with the dwconv skipped (LN kept): bounds how much of
the ConvNeXt-base@512 train step the XLA depthwise convolutions cost."""

from __future__ import annotations

import time

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

import spine_vision_tpu.models.convnext as cx

BATCH = 32
SIZE = 512
ITERS = 10


class AblatedBlock(nn.Module):
    """ConvNeXtBlock with the depthwise conv replaced by identity."""

    dim: int
    use_grn: bool
    layer_scale_init: float
    dtype: object = jnp.float32
    use_pallas_dwconv: bool = False
    use_pallas_mlp: bool = False

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(x)
        y = y.astype(self.dtype)
        from spine_vision_tpu.ops.fused_mlp import MAX_FUSED_DIM, fused_mlp

        if self.use_pallas_mlp and not self.use_grn and self.dim <= MAX_FUSED_DIM:
            w1, b1 = cx._DenseParams(self.dim, 4 * self.dim, name="pwconv1")()
            w2, b2 = cx._DenseParams(4 * self.dim, self.dim, name="pwconv2")()
            gamma = self.param(
                "gamma", nn.initializers.constant(self.layer_scale_init), (self.dim,)
            )
            b, hgt, wid, c = y.shape
            out = fused_mlp(
                y.reshape(b * hgt * wid, c), w1.astype(self.dtype), b1,
                w2.astype(self.dtype), b2, gamma=gamma,
                residual=residual.astype(self.dtype).reshape(b * hgt * wid, c),
            )
            return out.reshape(b, hgt, wid, c)
        y = nn.Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(y)
        gamma = self.param(
            "gamma", nn.initializers.constant(self.layer_scale_init), (self.dim,)
        )
        return residual + y * gamma.astype(self.dtype)


def bench(use_pallas):
    from spine_vision_tpu.models import CoordinateRegressor

    model = CoordinateRegressor(
        backbone_name="convnext_base", dtype=jnp.bfloat16, use_pallas=use_pallas
    )
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 3), jnp.bfloat16)
    )
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(BATCH, SIZE, SIZE, 3)), jnp.bfloat16
    )

    @jax.jit
    def chained(vars_, images):
        def body(carry, _):
            def loss(q):
                out = model.apply(vars_, q, train=False)
                return jnp.sum(out.astype(jnp.float32) ** 2)

            g = jax.grad(loss)(images + carry * 1e-9)
            return jnp.sum(g).astype(images.dtype), None

        final, _ = jax.lax.scan(body, jnp.zeros((), images.dtype), None, length=ITERS)
        return final

    float(chained(variables, x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(variables, x))
        best = min(best, time.perf_counter() - t0)
    return BATCH * ITERS / best


if __name__ == "__main__":
    cx.ConvNeXtBlock = AblatedBlock  # monkeypatch before model build
    img_s = bench("mlp")
    print(f"fwdbwd no-dwconv use_pallas=mlp {img_s:8.1f} img/s/chip")
