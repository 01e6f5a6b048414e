"""2D Euler–Bernoulli beam-column element.

Matches the element the reference builds through OpenSeesPy:
``ops.element('elasticBeamColumn', e, i, j, A, E, I, transf)`` with a
``Linear`` geometric transform on a horizontal member
(OpenPyStruct_BeamOpt.py:107-109), i.e. local axes == global axes.

DOF order per node: (ux, uy, rz); element vector: (ux_i, uy_i, rz_i,
ux_j, uy_j, rz_j).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def beam_element_stiffness(E, A, I, Le):
    """6x6 element stiffness for a horizontal 2D elastic beam-column.

    All scalar arguments broadcast; the result has shape
    ``broadcast_shape + (6, 6)``.  This is the closed-form matrix OpenSees
    assembles for ``elasticBeamColumn`` (reference OpenPyStruct_BeamOpt.py:109).
    """
    E, A, I, Le = jnp.broadcast_arrays(
        *map(jnp.asarray, (E, A, I, Le))
    )
    dtype = jnp.result_type(E, A, I, Le)
    z = jnp.zeros_like(Le)

    ea = E * A / Le
    eil = E * I / Le
    eil2 = eil / Le          # E I / Le^2
    eil3 = eil2 / Le         # E I / Le^3

    k11, k12, k13 = 12.0 * eil3, 6.0 * eil2, 4.0 * eil
    k2 = 2.0 * eil

    rows = [
        [ea,   z,     z,    -ea,  z,     z],
        [z,    k11,   k12,  z,    -k11,  k12],
        [z,    k12,   k13,  z,    -k12,  k2],
        [-ea,  z,     z,    ea,   z,     z],
        [z,    -k11,  -k12, z,    k11,   -k12],
        [z,    k12,   k2,   z,    -k12,  k13],
    ]
    k = jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)
    return k.astype(dtype)


def udl_equivalent_loads(w, Le):
    """Consistent nodal loads of a uniform transverse load ``w`` (N/m, +y).

    Shape: ``broadcast + (6,)``.  This is what OpenSees applies for
    ``eleLoad '-beamUniform' w`` (reference OpenPyStruct_BeamOpt.py:117-119):
    half the total load to each node plus the +/- w Le^2/12 fixed-end moments.
    """
    w, Le = jnp.broadcast_arrays(jnp.asarray(w), jnp.asarray(Le))
    z = jnp.zeros_like(Le)
    half = w * Le / 2.0
    m = w * Le * Le / 12.0
    return jnp.stack([z, half, m, z, half, -m], axis=-1)


def element_end_forces(u_e, E, A, I, Le, w=0.0):
    """Element end forces ``k_e @ u_e - f_eq(w)``: the member's internal
    resisting forces at its two ends, matching OpenSees
    ``eleResponse(e, 'forces')`` (reference OpenPyStruct_BeamOpt.py:136-138).

    ``u_e``: ``(..., 6)`` element displacement vector.
    Returns ``(..., 6)``: (N_i, V_i, M_i, N_j, V_j, M_j).
    The reference reads index 1 (shear at start) and 2 (moment at start).
    """
    k = beam_element_stiffness(E, A, I, Le)
    # Full float32 precision: TPU einsum otherwise runs bf16 MXU passes,
    # which destroys the large-term cancellation in end-force recovery.
    f = jnp.einsum(
        "...ij,...j->...i", k, u_e, precision=jax.lax.Precision.HIGHEST
    )
    return f - udl_equivalent_loads(w, Le)
