"""Combined structural loss.

Reference: ``compute_combined_loss`` (OpenPyStruct_BeamOpt.py:128-168):

    total = sum(I) + alpha_m * sum(M^2 / (2 E I + 1e-6))
                   + alpha_s * sum(V^2 / (G * 0.03 * sqrt(I)))

The reference wraps the OpenSees-fetched moments/shears in fresh leaf
tensors (OpenPyStruct_BeamOpt.py:150-151), so its gradients treat M and V as
constants per iteration — a semi-gradient / Picard scheme.  ``grad_mode``
exposes both that behavior ("semi", via stop_gradient) and the exact
implicit-differentiation adjoint through the FE solve ("adjoint"), which the
reference never computes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class LossComponents:
    total: jax.Array
    primary: jax.Array         # sum(I)
    bending_energy: jax.Array  # already scaled by alpha_moment
    shear_energy: jax.Array    # already scaled by alpha_shear


def structural_loss(
    I,
    bending_moments,
    shear_forces,
    E,
    G,
    alpha_moment=1e-2,
    alpha_shear=1e-2,
    grad_mode: str = "semi",
) -> LossComponents:
    """Sum-of-inertia + bending-energy + shear-energy loss.

    Constants match the reference exactly: +1e-6 bending denominator guard
    (OpenPyStruct_BeamOpt.py:154) and the k=0.03 proportional shear area
    A = 0.03 * sqrt(I) (OpenPyStruct_BeamOpt.py:157-160).
    """
    if grad_mode == "semi":
        bending_moments = jax.lax.stop_gradient(bending_moments)
        shear_forces = jax.lax.stop_gradient(shear_forces)
    elif grad_mode != "adjoint":
        raise ValueError(f"unknown grad_mode: {grad_mode!r}")

    bending = jnp.sum(bending_moments**2 / (2.0 * E * I + 1e-6))
    A_approx = 0.03 * jnp.sqrt(I)
    shear = jnp.sum(shear_forces**2 / (G * A_approx))
    primary = jnp.sum(I)
    b = alpha_moment * bending
    s = alpha_shear * shear
    return LossComponents(
        total=primary + b + s, primary=primary, bending_energy=b, shear_energy=s
    )
