"""Activation factory (reference src/utils.py:168-181 name set)."""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def _mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


_ACTIVATIONS = {
    "relu": jax.nn.relu,
    "silu": jax.nn.silu,
    # exact (erf) gelu: torch nn.GELU's default, unlike jax's tanh approx
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "leaky_relu": lambda x: jax.nn.leaky_relu(x, negative_slope=0.2),
    "mish": _mish,
}


def get_activation(name: str) -> Callable:
    """Look up an activation by name; unknown names fall back to relu,
    matching the reference's behavior (src/utils.py:180-181)."""
    return _ACTIVATIONS.get(name, jax.nn.relu)
