"""Shared type annotations."""

import typing as tp

import jax

#: A JAX array (or anything array-like accepted by jnp ops)
Array = jax.Array

#: Static sequence of chemical symbols, e.g. ("H", "C", "N", "O")
Symbols = tp.Tuple[str, ...]

StrPath = tp.Union[str, "tp.Any"]
