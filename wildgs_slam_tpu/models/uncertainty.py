"""Per-pixel uncertainty MLP (flax).

The paper's core dynamic-distractor machinery: a tiny MLP mapping DINOv2
patch features (384-d) to a per-patch uncertainty σ, trained by the mapper
and read by the tracker (reference src/utils/dyn_uncertainty/
uncertainty_model.py:5-72). Architecture: 384 -> 64 -> 64 -> 1, ReLU +
dropout(0.2), softplus output.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class UncertaintyMLP(nn.Module):
    """384 -> n_hidden -> n_hidden -> 1, softplus output."""

    in_dim: int = 384
    hidden: int = 64
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        """x: (..., in_dim) features -> (...,) uncertainty σ > 0."""
        h = nn.Dense(self.hidden, name="fc1")(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(self.hidden, name="fc2")(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(1, name="fc3")(h)
        return jax.nn.softplus(h)[..., 0]


def init_uncertainty_mlp(key: jax.Array, in_dim: int = 384, hidden: int = 64):
    """Create (module, params) matching generate_uncertainty_mlp
    (uncertainty_model.py:69-72)."""
    mlp = UncertaintyMLP(in_dim=in_dim, hidden=hidden)
    params = mlp.init(key, jnp.zeros((1, in_dim)))
    return mlp, params
