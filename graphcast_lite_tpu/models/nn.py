"""Basic neural building blocks with torch/PyG-parity semantics.

These reproduce the exact numerics of the reference's torch modules so that
converted reference weights produce allclose outputs:

* ``TorchLinear`` — ``torch.nn.Linear`` layout (kernel [in, out] here, but
  init bounds match torch's kaiming-uniform fan-in rule).
* ``PReLU`` — ``torch.nn.PReLU`` default: ONE shared learnable slope,
  initialized to 0.25.
* ``PyGLayerNorm`` — ``torch_geometric.nn.LayerNorm`` with its two modes:
  ``node`` (per-node LN over channels) and ``graph`` (single mean/var over
  every element of the graph).  The graph mode here takes an optional weight
  mask so padded edges/nodes don't contaminate the statistics.
* ``MLPTower`` — the reference's ``MLP`` (reference src/models.py:54-109):
  Linear→PReLU per hidden layer (each with its own slope), final Linear,
  optional trailing PyGLayerNorm.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = [
    "torch_linear_init",
    "glorot_uniform_pyg",
    "TorchLinear",
    "PReLU",
    "PyGLayerNorm",
    "MLPTower",
    "resolve_activation",
]


def torch_linear_init(bound_from_fan_in: bool = True):
    """torch.nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""

    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0] if len(shape) == 2 else shape[-1]
        bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0
        return nn.initializers.uniform(scale=2 * bound)(key, shape, dtype) - bound

    return init


def glorot_uniform_pyg(key, shape, dtype=jnp.float32):
    """PyG `glorot`: U(±sqrt(6/(size(-2)+size(-1))))."""
    fan = shape[-2] + shape[-1]
    bound = np.sqrt(6.0 / fan)
    return nn.initializers.uniform(scale=2 * bound)(key, shape, dtype) - bound


class TorchLinear(nn.Module):
    """Linear layer with torch's default initialization. kernel: [in, out]."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel", torch_linear_init(), (in_features, self.features)
        )
        y = x @ kernel
        if self.use_bias:
            bound = 1.0 / np.sqrt(in_features) if in_features > 0 else 0.0

            def bias_init(key, shape, dtype=jnp.float32):
                return nn.initializers.uniform(scale=2 * bound)(
                    key, shape, dtype
                ) - bound

            bias = self.param("bias", bias_init, (self.features,))
            y = y + bias
        return y


class PReLU(nn.Module):
    """torch.nn.PReLU(num_parameters=1, init=0.25)."""

    init_value: float = 0.25

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        alpha = self.param(
            "alpha", lambda key, shape: jnp.full(shape, self.init_value), (1,)
        )
        return jnp.where(x >= 0, x, alpha * x)


class PyGLayerNorm(nn.Module):
    """torch_geometric.nn.LayerNorm (affine), modes 'node' | 'graph'.

    node:  per-row normalization over the channel axis (F.layer_norm).
    graph: one scalar mean/var over ALL elements of the tensor, then the
           per-channel affine.  ``mask`` (per-row weights in [0,1]) restricts
           the statistics to live rows — required here because edges are
           padded to static shapes.
    """

    mode: str = "node"
    eps: float = 1e-5

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        c = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        if self.mode == "node":
            mean = x.mean(axis=-1, keepdims=True)
            var = x.var(axis=-1, keepdims=True)
            out = (x - mean) / jnp.sqrt(var + self.eps)
        elif self.mode == "graph":
            if mask is None:
                mean = x.mean()
                var = x.var()
            else:
                w = mask[:, None]
                denom = jnp.maximum(w.sum() * c, 1.0)
                mean = (x * w).sum() / denom
                var = (jnp.square(x - mean) * w).sum() / denom
            out = (x - mean) / jnp.sqrt(var + self.eps)
        else:
            raise ValueError(f"Unknown LayerNorm mode: {self.mode}")
        return out * weight + bias


def resolve_activation(name: Optional[str]) -> Callable | None:
    """Map an activation name to a stateless callable, or None for PReLU
    (which is a parameterized module and must be instantiated by the caller).
    ~ reference src/models.py:154-163."""
    name = (name or "prelu").lower()
    if name in ("swish", "silu"):
        return nn.silu
    if name == "relu":
        return nn.relu
    if name == "prelu":
        return None
    raise ValueError(f"Unknown activation: {name}")


class MLPTower(nn.Module):
    """Linear stack with PReLU after each hidden layer + optional PyG LN.

    hidden_dims may be empty/None -> a single Linear.  Each hidden PReLU has
    its own slope parameter (matching the reference MLP, which constructs a
    fresh nn.PReLU per hidden layer).
    """

    hidden_dims: Optional[Sequence[int]]
    output_dim: int
    use_layer_norm: bool = False
    layer_norm_mode: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hidden = list(self.hidden_dims or [])
        for i, h in enumerate(hidden):
            x = TorchLinear(h, name=f"lin_{i}")(x)
            x = PReLU(name=f"prelu_{i}")(x)
        x = TorchLinear(self.output_dim, name=f"lin_{len(hidden)}")(x)
        if self.use_layer_norm:
            x = PyGLayerNorm(mode=self.layer_norm_mode or "node", name="norm")(x)
        return x
