"""Train state pytree.

The single mutable object of the training loop, donated through the jitted
train step: params, optimizer state, BatchNorm running stats, and the dropout
PRNG key. Replaces the reference's scattered torch mutable state
(model/optimizer/scaler in trainers/base.py).
"""

from __future__ import annotations

from typing import Any

import jax
import optax
from flax import struct
from flax.core import FrozenDict


class TrainState(struct.PyTreeNode):
    """Functional train state: advanced by pure steps, never mutated."""

    step: jax.Array
    params: Any
    opt_state: optax.OptState
    batch_stats: Any  # FrozenDict or None-like empty dict
    dropout_key: jax.Array
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(
        cls,
        params: Any,
        tx: optax.GradientTransformation,
        batch_stats: Any = None,
        seed: int = 0,
    ) -> "TrainState":
        import jax.numpy as jnp

        return cls(
            step=jnp.zeros((), dtype=jnp.int32),
            params=params,
            opt_state=tx.init(params),
            batch_stats=batch_stats if batch_stats is not None else FrozenDict(),
            dropout_key=jax.random.PRNGKey(seed),
            tx=tx,
        )

    def variables(self) -> dict[str, Any]:
        """Assemble the flax variables dict for apply()."""
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v
