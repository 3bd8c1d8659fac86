"""Configurable Flax head architectures.

Capability parity with the reference head library (training/heads.py:35-503):
linear, MLP, self-attention, residual-MLP, and 1x1-conv heads, a HeadConfig +
factory with custom registration, and a MultiTaskHead. All heads map
[B, in_features] -> [B, out_features].
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Literal

import flax.linen as nn
import jax.numpy as jnp
from jax import Array

HeadType = Literal["mlp", "linear", "attention", "conv", "residual"]


@dataclass(frozen=True)
class HeadConfig:
    """Configuration for model heads (reference heads.py:35-55)."""

    head_type: HeadType = "mlp"
    hidden_dims: tuple[int, ...] = (256,)
    dropout: float = 0.2
    activation: str = "gelu"
    use_layer_norm: bool = True
    num_attention_heads: int = 4
    output_activation: str = "none"


_ACTIVATIONS: dict[str, Callable[[Array], Array]] = {
    "relu": nn.relu,
    "gelu": lambda x: nn.gelu(x, approximate=False),
    "silu": nn.silu,
    "tanh": jnp.tanh,
    "sigmoid": nn.sigmoid,
    "softmax": lambda x: nn.softmax(x, axis=-1),
    "none": lambda x: x,
}


def get_activation(name: str) -> Callable[[Array], Array]:
    """Activation function by name."""
    key = name.lower()
    if key not in _ACTIVATIONS:
        raise ValueError(
            f"Unknown activation: {name}. Available: {list(_ACTIVATIONS)}"
        )
    return _ACTIVATIONS[key]


class LinearHead(nn.Module):
    """[LN] -> [dropout] -> Dense -> output activation."""

    out_features: int
    dropout: float = 0.0
    use_layer_norm: bool = False
    output_activation: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        if self.use_layer_norm:
            x = nn.LayerNorm(dtype=jnp.float32)(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.out_features, dtype=self.dtype)(x)
        return get_activation(self.output_activation)(x)


class MLPHead(nn.Module):
    """Multi-layer perceptron head with configurable hidden layers.

    Dropout schedule matches the reference (heads.py:160-173): full dropout
    before the first hidden layer, half-rate afterwards and before output.
    """

    out_features: int
    hidden_dims: tuple[int, ...] = (256,)
    dropout: float = 0.2
    activation: str = "gelu"
    use_layer_norm: bool = True
    output_activation: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        act = get_activation(self.activation)
        if self.use_layer_norm:
            x = nn.LayerNorm(dtype=jnp.float32)(x)
        for i, hidden in enumerate(self.hidden_dims):
            if self.dropout > 0:
                rate = self.dropout if i == 0 else self.dropout / 2
                x = nn.Dropout(rate, deterministic=not train)(x)
            x = nn.Dense(hidden, dtype=self.dtype)(x)
            x = act(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout / 2, deterministic=not train)(x)
        x = nn.Dense(self.out_features, dtype=self.dtype)(x)
        return get_activation(self.output_activation)(x)


class AttentionHead(nn.Module):
    """Self-attention pooling head (reference heads.py:185-227).

    Features enter as a length-1 sequence; attention output is added
    residually, mean-pooled, and projected.
    """

    out_features: int
    num_heads: int = 4
    dropout: float = 0.2
    use_layer_norm: bool = True
    output_activation: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        if x.ndim == 2:
            x = x[:, None, :]
        if self.use_layer_norm:
            x = nn.LayerNorm(dtype=jnp.float32)(x).astype(self.dtype)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            dropout_rate=self.dropout,
            deterministic=not train,
            dtype=self.dtype,
        )(x, x)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        x = x + attn
        x = jnp.mean(x, axis=1)
        x = nn.Dense(self.out_features, dtype=self.dtype)(x)
        return get_activation(self.output_activation)(x)


class ResidualHead(nn.Module):
    """Residual MLP head with skip connections (reference heads.py:230-288)."""

    out_features: int
    hidden_dims: tuple[int, ...] = (256,)
    dropout: float = 0.2
    activation: str = "gelu"
    use_layer_norm: bool = True
    output_activation: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        act = get_activation(self.activation)
        if self.use_layer_norm:
            x = nn.LayerNorm(dtype=jnp.float32)(x)
        x = nn.Dense(self.hidden_dims[0], dtype=self.dtype, name="input_proj")(x)

        prev_dim = self.hidden_dims[0]
        for i, hidden in enumerate(self.hidden_dims):
            y = x
            if self.use_layer_norm:
                y = nn.LayerNorm(dtype=jnp.float32, name=f"block{i}_norm")(y)
            y = nn.Dropout(self.dropout, deterministic=not train)(y)
            y = nn.Dense(hidden, dtype=self.dtype, name=f"block{i}_fc1")(y)
            y = act(y)
            y = nn.Dropout(self.dropout / 2, deterministic=not train)(y)
            y = nn.Dense(prev_dim, dtype=self.dtype, name=f"block{i}_fc2")(y)
            x = x + y

        if self.use_layer_norm:
            x = nn.LayerNorm(dtype=jnp.float32, name="output_norm")(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.out_features, dtype=self.dtype, name="output_fc")(x)
        return get_activation(self.output_activation)(x)


class ConvHead(nn.Module):
    """1x1 convolution head over feature channels (reference heads.py:291-335).

    Features [B, C] are treated as a length-1 1D signal; 1x1 convs are Dense
    layers with BatchNorm between them.
    """

    out_features: int
    hidden_dims: tuple[int, ...] = (256,)
    dropout: float = 0.2
    activation: str = "gelu"
    output_activation: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        act = get_activation(self.activation)
        for i, hidden in enumerate(self.hidden_dims):
            x = nn.Dense(hidden, dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.BatchNorm(
                use_running_average=not train, dtype=self.dtype, name=f"bn{i}"
            )(x)
            x = act(x)
            if self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.out_features, dtype=self.dtype, name="conv_out")(x)
        return get_activation(self.output_activation)(x)


class HeadFactory:
    """Factory for head modules with custom-type registration."""

    _heads: dict[str, type[nn.Module]] = {
        "linear": LinearHead,
        "mlp": MLPHead,
        "attention": AttentionHead,
        "residual": ResidualHead,
        "conv": ConvHead,
    }

    @classmethod
    def register(cls, name: str) -> Callable[[type[nn.Module]], type[nn.Module]]:
        def decorator(head_cls: type[nn.Module]) -> type[nn.Module]:
            cls._heads[name] = head_cls
            return head_cls

        return decorator

    @classmethod
    def create(cls, head_type: str, out_features: int, **kwargs: Any) -> nn.Module:
        if head_type not in cls._heads:
            available = ", ".join(cls._heads)
            raise KeyError(f"Unknown head type: {head_type}. Available: {available}")
        return cls._heads[head_type](out_features=out_features, **kwargs)

    @classmethod
    def list_heads(cls) -> list[str]:
        return list(cls._heads)


def create_head(config: HeadConfig, out_features: int, dtype: Any = jnp.float32) -> nn.Module:
    """Create a head module from configuration (reference heads.py:404-439)."""
    kwargs: dict[str, Any] = {
        "dropout": config.dropout,
        "output_activation": config.output_activation,
        "dtype": dtype,
    }
    if config.head_type in ("mlp", "residual", "conv"):
        kwargs["hidden_dims"] = tuple(config.hidden_dims)
        kwargs["activation"] = config.activation
    if config.head_type in ("mlp", "linear", "residual", "attention"):
        kwargs["use_layer_norm"] = config.use_layer_norm
    if config.head_type == "attention":
        kwargs["num_heads"] = config.num_attention_heads
    return HeadFactory.create(config.head_type, out_features, **kwargs)


class MultiTaskHead(nn.Module):
    """Separate heads per task: features -> {task: logits}."""

    task_configs: dict[str, tuple[int, HeadConfig]]
    dtype: Any = jnp.float32

    def setup(self) -> None:
        heads = {}
        for task_name, (out_features, head_config) in self.task_configs.items():
            heads[task_name] = create_head(head_config, out_features, self.dtype)
        self.heads = heads

    def __call__(self, x: Array, train: bool = False) -> dict[str, Array]:
        return {name: head(x, train=train) for name, head in self.heads.items()}

    @property
    def task_names(self) -> list[str]:
        return list(self.task_configs)
