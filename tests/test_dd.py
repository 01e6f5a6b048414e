"""Double-double arithmetic unit tests.

Every op is checked against float64 on float32 inputs: the dd result
(hi + lo, accumulated in f64) must agree with the f64 computation to the
~2^-45 level — the accuracy that lets the random-bridge rescue stay on the
TPU (reference computes in f64 throughout via torch/OpenSees,
OpenPyStruct_BeamOpt_training_MultiCore.py:164-219).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openpystruct_tpu.ops import dd


def _rand(key, shape=(256,), scale=1.0):
    x = jax.random.normal(key, shape, dtype=jnp.float64) * scale
    return x.astype(jnp.float32)


def _val(a):
    """dd -> float64 value."""
    return np.asarray(a[0], np.float64) + np.asarray(a[1], np.float64)


K = jax.random.split(jax.random.PRNGKey(0), 8)
A32 = _rand(K[0])
B32 = _rand(K[1], scale=7.0)
A64 = np.asarray(A32, np.float64)
B64 = np.asarray(B32, np.float64)
EPS_DD = 2.0**-45


def test_two_sum_exact():
    s, e = dd.two_sum(A32, B32)
    np.testing.assert_array_equal(
        np.asarray(s, np.float64) + np.asarray(e, np.float64), A64 + B64
    )


def test_two_prod_exact():
    # product of two f32 is exactly representable in f64
    p, e = dd.two_prod(A32, B32)
    np.testing.assert_array_equal(
        np.asarray(p, np.float64) + np.asarray(e, np.float64), A64 * B64
    )


def test_add_sub_mul_accuracy():
    a = dd.two_prod(A32, B32)        # non-trivial lo components
    b = dd.two_prod(B32, 1.0 + A32)
    a64, b64 = _val(a), _val(b)
    for got, want in [
        (dd.add(a, b), a64 + b64),
        (dd.sub(a, b), a64 - b64),
        (dd.mul(a, b), a64 * b64),
        (dd.add_f(a, B32), a64 + B64),
        (dd.mul_f(a, B32), a64 * B64),
    ]:
        err = np.abs(_val(got) - want) / np.maximum(np.abs(want), 1e-300)
        assert err.max() < 8 * EPS_DD, err.max()


def test_div_accuracy():
    a = dd.two_prod(A32, B32)
    b = dd.add_f(dd.two_prod(B32, B32), 1.5)   # bounded away from 0
    want = _val(a) / _val(b)
    err = np.abs(_val(dd.div(a, b)) - want) / np.abs(want)
    assert err.max() < 16 * EPS_DD, err.max()
    err = np.abs(_val(dd.recip(b)) - 1.0 / _val(b)) * np.abs(_val(b))
    assert err.max() < 16 * EPS_DD, err.max()


def test_sqrt_rsqrt_accuracy():
    x = dd.add_f(dd.two_prod(A32, A32), 0.5)   # positive
    x64 = _val(x)
    err = np.abs(_val(dd.sqrt_dd(x)) - np.sqrt(x64)) / np.sqrt(x64)
    assert err.max() < 16 * EPS_DD, err.max()
    want = 1.0 / np.sqrt(x64)
    err = np.abs(_val(dd.rsqrt_dd(x)) - want) / want
    assert err.max() < 16 * EPS_DD, err.max()
    # float-seeded variant
    pos = np.abs(A64) + 0.25
    pos32 = jnp.asarray(pos, jnp.float32)
    pos64 = np.asarray(pos32, np.float64)
    want = 1.0 / np.sqrt(pos64)
    err = np.abs(_val(dd.rsqrt_f(pos32)) - want) / want
    assert err.max() < 16 * EPS_DD, err.max()


def test_cancellation_beats_f32():
    """The motivating case: differences of near-equal products, where f32
    keeps no correct digits but dd keeps ~25 bits past f32."""
    a = jnp.asarray(1.0 + 2.0**-12, jnp.float32)
    b = jnp.asarray(1.0 - 2.0**-12, jnp.float32)
    # a*b - (1 - 2^-24) == 0 exactly; compute a*b - 1 + 2^-24
    p = dd.two_prod(a, b)
    r = dd.add_f(dd.add_f(p, -1.0), float(2.0**-24))
    assert float(_val(r)) == 0.0


class TestDDClass:
    def test_operators_match_f64(self):
        a = dd.DD(*dd.two_prod(A32, B32))
        b = dd.DD(*dd.add_f(dd.two_prod(B32, B32), 2.0))
        a64, b64 = _val((a.hi, a.lo)), _val((b.hi, b.lo))
        cases = [
            (a + b, a64 + b64),
            (a - b, a64 - b64),
            (a * b, a64 * b64),
            (a / b, a64 / b64),
            (-a, -a64),
            (a + B32, a64 + B64),          # DD (+|-|*) plain array
            (a - B32, a64 - B64),
            (a * B32, a64 * B64),
            (2.0 * a, 2.0 * a64),          # python-scalar left
            (1.0 - a, 1.0 - a64),
            (1.0 / b, 1.0 / b64),
            (a / 12.0, a64 / 12.0),
            (sum([a, b]), a64 + b64),      # sum() starts from int 0
        ]
        for got, want in cases:
            err = np.abs(_val((got.hi, got.lo)) - want) / np.maximum(
                np.abs(want), 1e-30
            )
            assert err.max() < 32 * EPS_DD, (err.max(), want)

    def test_pytree(self):
        a = dd.DD(A32, B32)
        leaves, treedef = jax.tree.flatten(a)
        assert len(leaves) == 2
        b = jax.tree.unflatten(treedef, leaves)
        assert isinstance(b, dd.DD)
        np.testing.assert_array_equal(np.asarray(b.hi), np.asarray(A32))

    def test_fori_loop_carry(self):
        def body(i, acc):
            return acc + dd.DD.lift(jnp.float32(0.1))

        acc = jax.lax.fori_loop(0, 1000, body, dd.DD.lift(jnp.float32(0.0)))
        got = float(np.float64(acc.hi) + np.float64(acc.lo))
        want = 1000 * np.float64(np.float32(0.1))
        assert abs(got - want) / want < 1e-12

    def test_where_dispatch(self):
        a = dd.DD(*dd.two_prod(A32, B32))
        b = dd.DD.lift(B32)
        c = A32 > 0
        w = dd.dd_where(c, a, b)
        want = np.where(np.asarray(c), _val((a.hi, a.lo)), B64)
        np.testing.assert_allclose(_val((w.hi, w.lo)), want, rtol=1e-13)
        # plain arrays pass through
        w2 = dd.dd_where(c, A32, B32)
        assert not isinstance(w2, dd.DD)
        np.testing.assert_array_equal(
            np.asarray(w2), np.where(np.asarray(c), A32, B32)
        )

    def test_absval(self):
        a = dd.DD(*dd.two_prod(A32, B32))
        np.testing.assert_allclose(
            np.asarray(dd.absval(a), np.float64),
            np.abs(np.float32(A64 * B64)), rtol=1e-6,
        )
        np.testing.assert_array_equal(dd.absval(A32), np.abs(A32))


def test_refpair_roundtrip():
    """RefPair read/write against plain numpy-backed buffers (the kernel
    uses VMEM refs; the indexing protocol is identical)."""

    class FakeRef:
        def __init__(self, arr):
            self.arr = arr
            self.dtype = arr.dtype

        def __getitem__(self, idx):
            return self.arr[idx]

        def __setitem__(self, idx, v):
            self.arr[idx] = v

    hi = FakeRef(np.zeros((4, 3), np.float32))
    lo = FakeRef(np.zeros((4, 3), np.float32))
    pair = dd.RefPair(hi, lo)
    v = dd.DD(np.float32(1.5), np.float32(2.0**-30))
    pair[2, 1] = v
    got = pair[2, 1]
    assert isinstance(got, dd.DD)
    assert float(got.hi) == 1.5 and float(got.lo) == 2.0**-30
    # plain-value write lifts to (x, 0)
    pair[0, 0] = np.float32(3.0)
    assert float(pair[0, 0].hi) == 3.0 and float(pair[0, 0].lo) == 0.0


def test_liftref_reads_dd():
    class FakeRef:
        def __init__(self, arr):
            self.arr = arr
            self.dtype = arr.dtype
            self.shape = arr.shape

        def __getitem__(self, idx):
            return self.arr[idx]

    r = dd.LiftRef(FakeRef(np.arange(6, dtype=np.float32).reshape(2, 3)))
    v = r[1, 2]
    assert isinstance(v, dd.DD)
    assert float(v.hi) == 5.0 and float(v.lo) == 0.0
    assert r.dtype == np.float32
    assert r.shape == (2, 3)
