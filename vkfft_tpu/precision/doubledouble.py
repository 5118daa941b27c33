"""Double-double arithmetic: the TPU "fp64" tier.

TPU v5e has no double-precision unit, so — exactly like the reference's quad
precision, which emulates fp128 as double-double pairs of fp64
(``PfQuadSum/PfQuadProd/PfQuadSplit`` emitters, ``vkFFT_MathUtils.h``;
enabled by ``VKFFT_USE_DOUBLEDOUBLE_FP128``, ``vkFFT/vkFFT.h:74-89``) — this
module emulates ~fp64 as an unevaluated sum of two fp32 values using
error-free transformations:

  two_sum  : Knuth's branch-free exact addition (6 flops)
  two_prod : Dekker's split-based exact product (no FMA exposed in XLA;
             fp32 mantissa is 24 bits, split constant 2^12+1)

All ops are elementwise VPU work on real planes, so they run on any backend
(including the complex-free axon TPU) and vectorize over (8,128) tiles.
Effective precision: ~2^-48 relative (the reference's double-double of fp64
gives ~2^-104; same construction, one tier down).
"""
from __future__ import annotations

import contextvars
import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

_SPLITTER = np.float32(4097.0)  # 2^12 + 1 for fp32 (24-bit mantissa)

# Two compiler hazards destroy error-free transformations under jit (observed:
# Bluestein dd pipeline degraded from 9e-15 to 3e-8 relative error):
#   1. the algebraic simplifier folds float identities like s - (s - a) -> a;
#   2. FMA contraction fuses p = a*b into a later p + e, so the unrounded
#      product no longer matches the rounded p the error term was built for
#      (exactly ulp(p)-sized corruption).
# optimization_barrier on the cancellation-carrying intermediates makes them
# opaque to both, while the surrounding elementwise work still fuses.
#
# Inside a Pallas TPU kernel the hazards do not exist — the traced jaxpr is
# lowered directly to Mosaic (no XLA algebraic simplifier, no FMA
# contraction pass) — and Mosaic cannot lower optimization_barrier at all
# (hardware-validated: tests/tpu_smoke.py dd section).  The dd Pallas
# kernels therefore trace their bodies under ``no_barriers()``; interpreter
# mode keeps the barriers because there the ops DO run through XLA.
# Context-local (not a module global): a concurrent trace in another thread
# must not observe this trace's barrier setting — a Mosaic trace capturing
# barriers fails hardware lowering, and an XLA trace captured barrier-free
# silently degrades dd precision to ~3e-8.
_BARRIERS = contextvars.ContextVar("vkfft_tpu_dd_barriers", default=True)


def _ob(x):
    return jax.lax.optimization_barrier(x) if _BARRIERS.get() else x


class no_barriers:
    """Context manager: trace EFT ops without optimization_barrier (for
    Pallas kernel bodies, where Mosaic neither needs nor supports it)."""

    def __enter__(self):
        self._token = _BARRIERS.set(False)

    def __exit__(self, *exc):
        _BARRIERS.reset(self._token)
        return False


def _two_sum(a, b):
    s = _ob(a + b)
    bb = _ob(s - a)
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _quick_two_sum(a, b):
    # requires |a| >= |b|
    s = _ob(a + b)
    err = b - _ob(s - a)
    return s, err


def _split(a):
    t = _SPLITTER * a
    u = _ob(t - a)
    hi = t - u
    lo = a - hi
    return hi, lo


def _two_prod(a, b):
    p = _ob(a * b)
    a_hi, a_lo = _split(a)
    b_hi, b_lo = _split(b)
    err = ((a_hi * b_hi - p) + a_hi * b_lo + a_lo * b_hi) + a_lo * b_lo
    return p, err


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DD:
    """Double-float real value: hi + lo with |lo| <= ulp(hi)/2."""

    hi: Any
    lo: Any

    def tree_flatten(self):
        return (self.hi, self.lo), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        return self.hi.shape

    @property
    def ndim(self):
        return self.hi.ndim

    def reshape(self, *shape):
        return DD(self.hi.reshape(*shape), self.lo.reshape(*shape))

    def __getitem__(self, idx):
        return DD(self.hi[idx], self.lo[idx])

    def __add__(self, other):
        return dd_add(self, other)

    def __sub__(self, other):
        return dd_sub(self, other)

    def __mul__(self, other):
        return dd_mul(self, other)

    def __neg__(self):
        return dd_neg(self)


def dd_zero(shape, dtype=jnp.float32):
    z = jnp.zeros(shape, dtype)
    return DD(z, z)


def dd_add(x: DD, y: DD) -> DD:
    """Full double-double addition (reference ``PfQuadSum`` analog)."""
    s, e = _two_sum(x.hi, y.hi)
    e = e + x.lo + y.lo
    hi, lo = _quick_two_sum(s, e)
    return DD(hi, lo)


def dd_neg(x: DD) -> DD:
    return DD(-x.hi, -x.lo)


def dd_sub(x: DD, y: DD) -> DD:
    return dd_add(x, dd_neg(y))


def dd_mul(x: DD, y: DD) -> DD:
    """Double-double product (reference ``PfQuadProd`` analog)."""
    p, e = _two_prod(x.hi, y.hi)
    e = e + x.hi * y.lo + x.lo * y.hi
    hi, lo = _quick_two_sum(p, e)
    return DD(hi, lo)


def dd_from_f64(a: np.ndarray, dtype=np.float32) -> DD:
    """Host split of fp64 data into an exact hi+lo fp32 pair."""
    hi = a.astype(dtype)
    lo = (a - hi.astype(np.float64)).astype(dtype)
    return DD(jnp.asarray(hi), jnp.asarray(lo))


def dd_to_f64(x: DD) -> np.ndarray:
    return np.asarray(x.hi).astype(np.float64) + np.asarray(x.lo).astype(np.float64)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DDComplex:
    """Planar complex with double-double planes — the quad-plane format the
    TPU 'fp64' FFT runs on (4 fp32 planes per complex array)."""

    re: DD
    im: DD

    def tree_flatten(self):
        return (self.re, self.im), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        return self.re.shape

    @property
    def ndim(self):
        return self.re.ndim

    def reshape(self, *shape):
        return DDComplex(self.re.reshape(*shape), self.im.reshape(*shape))

    def __getitem__(self, idx):
        return DDComplex(self.re[idx], self.im[idx])

    def __add__(self, other):
        return DDComplex(self.re + other.re, self.im + other.im)

    def __sub__(self, other):
        return DDComplex(self.re - other.re, self.im - other.im)

    def __mul__(self, other):
        if isinstance(other, DDComplex):
            return DDComplex(self.re * other.re - self.im * other.im,
                             self.re * other.im + self.im * other.re)
        return DDComplex(self.re * other, self.im * other)

    def conj(self):
        return DDComplex(self.re, dd_neg(self.im))


def ddc_from_complex128(x: np.ndarray) -> DDComplex:
    return DDComplex(dd_from_f64(np.ascontiguousarray(x.real)),
                     dd_from_f64(np.ascontiguousarray(x.imag)))


def ddc_to_complex128(x: DDComplex) -> np.ndarray:
    return dd_to_f64(x.re) + 1j * dd_to_f64(x.im)
