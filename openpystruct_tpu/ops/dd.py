"""Double-double (two-float) arithmetic for Pallas kernels.

A value is an unevaluated sum hi + lo of two float32s with |lo| <=
ulp(hi)/2, giving ~48 bits of effective mantissa (float64 has 53) while
staying entirely on the float32 VPU datapath.  This is what lets the
random-bridge datagen's extremely ill-conditioned tail (stiffness contrast
~5e7 from one roller near the pin plus the 1e-8 I clamp,
OpenPyStruct_BeamOpt_training_MultiCore.py:137-162 + the clamp at :219)
stay ON the TPU: a float32 factorization is garbage at cond*eps ~ 6 and
iterative refinement diverges there, but a dd factorization has
cond*eps_dd ~ 2e-7 — the same regime float64 OpenSees occupies.

Error-free transforms are Dekker/Knuth (no FMA exposure in Mosaic, so
``two_prod`` uses the split trick).  All helpers take/return (hi, lo)
tuples of identically-shaped arrays and are shape-polymorphic — inside
kernels the operands are (sub, LANES) slabs.

References: Dekker 1971; Hida, Li & Bailey, "Library for Double-Double and
Quad-Double Arithmetic" (QD), whose add/mul/div/sqrt algorithms these
follow (public, standard numerics — no reference-repo code involved).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_SPLIT = 4097.0  # Dekker split constant for float32 (2^12 + 1)
_SPLIT64 = 134217729.0  # for float64 (2^27 + 1)


def _split_const(a, b):
    """Dekker split constant for the operands' dtype.  The kernels are
    float32 everywhere, but the shared host-side compensated residual
    (fem/solve.py) also runs under an enable_x64 scope, where the f32
    constant would split at the wrong bit and quietly destroy the error
    term."""
    if jnp.result_type(a, b) == jnp.float64:
        return _SPLIT64
    return _SPLIT


def two_sum(a, b):
    """Error-free a + b = s + e (Knuth)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def quick_two_sum(a, b):
    """Error-free a + b = s + e assuming |a| >= |b| (Dekker)."""
    s = a + b
    e = b - (s - a)
    return s, e


def two_prod(a, b):
    """Error-free a * b = p + e (Dekker split; no FMA in Mosaic)."""
    split = _split_const(a, b)
    p = a * b
    ca = split * a
    ahi = ca - (ca - a)
    alo = a - ahi
    cb = split * b
    bhi = cb - (cb - b)
    blo = b - bhi
    e = ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo
    return p, e


def dd(x):
    """Lift a float32 array to dd."""
    return x, jnp.zeros_like(x)


def neg(a):
    return -a[0], -a[1]


def add(a, b):
    """dd + dd (QD's accurate ieee_add)."""
    s1, s2 = two_sum(a[0], b[0])
    t1, t2 = two_sum(a[1], b[1])
    s2 = s2 + t1
    s1, s2 = quick_two_sum(s1, s2)
    s2 = s2 + t2
    return quick_two_sum(s1, s2)


def sub(a, b):
    return add(a, neg(b))


def add_f(a, f):
    """dd + float."""
    s1, s2 = two_sum(a[0], f)
    s2 = s2 + a[1]
    return quick_two_sum(s1, s2)


def mul(a, b):
    """dd * dd."""
    p1, p2 = two_prod(a[0], b[0])
    p2 = p2 + a[0] * b[1] + a[1] * b[0]
    return quick_two_sum(p1, p2)


def mul_f(a, f):
    """dd * float."""
    p1, p2 = two_prod(a[0], f)
    p2 = p2 + a[1] * f
    return quick_two_sum(p1, p2)


def prod_ff(x, y):
    """float * float -> dd (exact)."""
    return two_prod(x, y)


def div(a, b):
    """dd / dd (QD's accurate division: three float quotient corrections)."""
    q1 = a[0] / b[0]
    r = sub(a, mul_f(b, q1))
    q2 = r[0] / b[0]
    r = sub(r, mul_f(b, q2))
    q3 = r[0] / b[0]
    s, e = quick_two_sum(q1, q2)
    return add((s, e), dd(q3))


def div_fd(f, b):
    """float / dd."""
    return div(dd(f), b)


def recip(b):
    return div_fd(jnp.ones_like(b[0]), b)


def rsqrt_f(x):
    """1/sqrt(float) -> dd via one dd Newton step from the f32 seed:
    y <- y + y*(1 - x*y^2)/2 doubles the ~24 accurate bits to ~48."""
    return _rsqrt_newton(dd(x), jax.lax.rsqrt(x))


def _rsqrt_newton(xdd, y0):
    y = dd(y0)
    y2 = mul(y, y)
    r = sub(dd(jnp.ones_like(y0)), mul(xdd, y2))
    return add(y, mul_f(mul(y, r), 0.5))


def rsqrt_dd(a):
    """1/sqrt(dd) -> dd (Newton from the f32 seed of the hi component)."""
    return _rsqrt_newton(a, jax.lax.rsqrt(a[0]))


def sqrt_dd(a):
    """sqrt(dd) -> dd: f32 seed + one Newton step y += (x - y^2)/(2y)."""
    y0 = jnp.sqrt(a[0])
    r = sub(a, two_prod(y0, y0))
    corr = r[0] * (0.5 / y0)
    return quick_two_sum(y0, corr + r[1] * (0.5 / y0))


# ---------------------------------------------------------------------------
# Operator-overloading layer.
#
# ``DD`` makes the generic 3x3 slab helpers in ops/block_tridiag.py
# (``_inv3_slabs``, ``_mm``, ``_mv``, ...) and the shared kernel stages in
# ops/beam_kernel.py work unchanged on double-double values: the stages are
# written against ``+ - * /`` plus a handful of dispatch points (``dd_where``,
# ``dd_rsqrt``, ``absval``, ``zeros_entry``) that promote when an operand is
# a DD.  ``RefPair`` (paired hi/lo VMEM scratch) and ``LiftRef`` (a float32
# input ref whose reads lift to dd) complete the protocol, so one kernel
# source serves both precisions.
#
# jnp-array-LEFT operands (array * DD) do NOT reliably defer to __rmul__;
# the shared stages keep DD on the left (enforced by the dd-kernel tests).
# ---------------------------------------------------------------------------


class DD:
    """An unevaluated float32 sum hi + lo with arithmetic overloads."""

    __slots__ = ("hi", "lo")

    def __init__(self, hi, lo):
        self.hi = hi
        self.lo = lo

    @staticmethod
    def lift(x):
        """Plain array/scalar -> DD (exact)."""
        if isinstance(x, DD):
            return x
        x = jnp.asarray(x)
        return DD(x, jnp.zeros_like(x))

    @property
    def t(self):
        return (self.hi, self.lo)

    @property
    def dtype(self):
        return self.hi.dtype

    def __neg__(self):
        return DD(-self.hi, -self.lo)

    def __add__(self, o):
        if isinstance(o, DD):
            return DD(*add(self.t, o.t))
        return DD(*add_f(self.t, o))

    __radd__ = __add__

    def __sub__(self, o):
        if isinstance(o, DD):
            return DD(*sub(self.t, o.t))
        return DD(*add_f(self.t, -o))

    def __rsub__(self, o):
        return DD(*add_f(neg(self.t), o))

    def __mul__(self, o):
        if isinstance(o, DD):
            return DD(*mul(self.t, o.t))
        return DD(*mul_f(self.t, o))

    __rmul__ = __mul__

    def __truediv__(self, o):
        if isinstance(o, DD):
            return DD(*div(self.t, o.t))
        return DD(*div(self.t, dd(jnp.asarray(o, self.hi.dtype))))

    def __rtruediv__(self, o):
        return DD(*div_fd(jnp.asarray(o, self.hi.dtype), self.t))


jax.tree_util.register_pytree_node(
    DD,
    lambda a: ((a.hi, a.lo), None),
    lambda _, leaves: DD(*leaves),
)


def dd_where(c, a, b):
    """jnp.where dispatching on DD operands (mixed operands promote)."""
    if isinstance(a, DD) or isinstance(b, DD):
        a, b = DD.lift(a), DD.lift(b)
        return DD(jnp.where(c, a.hi, b.hi), jnp.where(c, a.lo, b.lo))
    return jnp.where(c, a, b)


def dd_rsqrt(x):
    """lax.rsqrt dispatching on DD."""
    if isinstance(x, DD):
        return DD(*rsqrt_dd(x.t))
    return jax.lax.rsqrt(x)


def dd_sqrt(x):
    if isinstance(x, DD):
        return DD(*sqrt_dd(x.t))
    return jnp.sqrt(x)


def absval(x):
    """|x| collapsed to a PLAIN float32 array (diagnostics: pivot dets)."""
    if isinstance(x, DD):
        return jnp.abs(x.hi + x.lo)
    return jnp.abs(x)


def zeros_entry(x):
    """zeros_like dispatching on DD (same slab shape, both components)."""
    if isinstance(x, DD):
        z = jnp.zeros_like(x.hi)
        return DD(z, z)
    return jnp.zeros_like(x)


def collapse(x):
    """DD -> best plain float32 (hi + lo rounds to one float)."""
    if isinstance(x, DD):
        return x.hi + x.lo
    return x


class RefPair:
    """Paired (hi, lo) refs presenting one dd-valued ref."""

    __slots__ = ("h", "l")

    def __init__(self, hi_ref, lo_ref):
        self.h = hi_ref
        self.l = lo_ref

    @property
    def dtype(self):
        return self.h.dtype

    def __getitem__(self, idx):
        return DD(self.h[idx], self.l[idx])

    def __setitem__(self, idx, v):
        v = DD.lift(v)
        self.h[idx] = v.hi
        self.l[idx] = v.lo


class LiftRef:
    """Read-only view of a plain float32 ref whose reads lift to DD."""

    __slots__ = ("r",)

    def __init__(self, ref):
        self.r = ref

    @property
    def dtype(self):
        return self.r.dtype

    @property
    def shape(self):
        return self.r.shape

    def __getitem__(self, idx):
        return DD.lift(self.r[idx])


class CollapseRef:
    """Plain float32 ref that collapses DD writes and lifts reads.

    For quantities where CONSISTENCY, not extra precision, is what
    correctness needs — e.g. the Jacobi scale vector: any fixed S gives an
    exactly equivalent scaled system, so storing S in f32 halves its VMEM
    while the dd pipeline still sees exact (lifted) values."""

    __slots__ = ("r",)

    def __init__(self, ref):
        self.r = ref

    @property
    def dtype(self):
        return self.r.dtype

    def __getitem__(self, idx):
        return DD.lift(self.r[idx])

    def __setitem__(self, idx, v):
        self.r[idx] = collapse(v)
