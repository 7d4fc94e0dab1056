"""Batched forward-difference Jacobian, the ground-truth oracle for gradients.

JAX port of the reference helper
(/root/reference/tests/finite_difference.py:23-112): for a batchwise function
``f : [B, *DX] -> [B, *DY]`` returns the Jacobian approximation of shape
``[B, *DY, *DX]`` via ``(f(x + eps e) - f(x)) / eps`` over unit vectors ``e``.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def finite_difference_batch_jacobian(
    func: Callable[[jax.Array], jax.Array], x: jax.Array, epsilon: float
) -> jax.Array:
    y0 = func(x)
    batch = x.shape[0]
    dims_x = x.shape[1:]
    dims_y = y0.shape[1:]
    dim_x = 1
    for d in dims_x:
        dim_x *= d

    x_flat = x.reshape(batch, dim_x)

    def perturbed(i):
        dx = jnp.zeros((dim_x,), x.dtype).at[i].set(epsilon)
        y = func((x_flat + dx[None, :]).reshape(x.shape))
        return (y - y0).reshape(batch, -1) / epsilon

    cols = jax.lax.map(perturbed, jnp.arange(dim_x))  # [dim_x, B, dim_y]
    jac = jnp.moveaxis(cols, 0, -1)  # [B, dim_y, dim_x]
    return jac.reshape((batch, *dims_y, *dims_x))
