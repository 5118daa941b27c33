"""Planar complex representation — the device-level number format.

The axon TPU backend (and Pallas/Mosaic generally) does not support complex
dtypes, so every on-device value is a pair of real planes.  This mirrors how
the reference treats complex data as 2-vectors of scalars in its generated
kernels (``PfContainer`` complex values, ``vkFFT_Structs.h:73-91``) rather
than a language-level complex type.

``Planar`` is a registered pytree so it traces through jit/shard_map
transparently.  Host-side conversion to/from numpy complex happens only at
the API boundary.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Planar:
    """A complex array stored as separate real/imag planes."""

    re: Any
    im: Any

    def tree_flatten(self):
        return (self.re, self.im), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- shape/dtype passthroughs -----------------------------------------
    @property
    def shape(self):
        return self.re.shape

    @property
    def ndim(self):
        return self.re.ndim

    @property
    def dtype(self):
        return self.re.dtype

    def astype(self, dtype):
        return Planar(self.re.astype(dtype), self.im.astype(dtype))

    def reshape(self, *shape):
        return Planar(self.re.reshape(*shape), self.im.reshape(*shape))

    def __getitem__(self, idx):
        return Planar(self.re[idx], self.im[idx])

    # -- arithmetic --------------------------------------------------------
    def __add__(self, other):
        if isinstance(other, Planar):
            return Planar(self.re + other.re, self.im + other.im)
        return Planar(self.re + other, self.im)

    def __sub__(self, other):
        if isinstance(other, Planar):
            return Planar(self.re - other.re, self.im - other.im)
        return Planar(self.re - other, self.im)

    def __mul__(self, other):
        if isinstance(other, Planar):
            return Planar(self.re * other.re - self.im * other.im,
                          self.re * other.im + self.im * other.re)
        return Planar(self.re * other, self.im * other)

    def __rmul__(self, other):
        return self.__mul__(other)

    def conj(self):
        return Planar(self.re, -self.im)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class TlSpectrum(Planar):
    """Opaque transposed-intermediate spectrum (the ``keep_intermediate_order``
    forward result for v3 sizes; reference ``disableReorderFourStep``,
    ``vkFFT_Structs.h:221``).

    The planes hold the kernel-state layout — 1-D: (steps, n, gb) with
    lines in lanes; 2-D pair (``n2`` > 0): (..., n2, n) transposed planes —
    and the round-trip contract (``lead`` original leading dims, ``batch``
    flattened line/plane count, ``n``/``n2`` transform lengths) rides the
    VALUE as static pytree metadata, so any application instance (including
    one reloaded from a plan blob) can invert a forward produced elsewhere.
    Elementwise arithmetic with broadcastable operands (e.g. a
    spectrum-domain convolution table in the same layout) preserves the
    wrapper."""

    lead: tuple = ()
    batch: int = 0
    n: int = 0
    n2: int = 0

    def tree_flatten(self):
        return (self.re, self.im), (tuple(self.lead), self.batch, self.n,
                                    self.n2)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    def _like(self, p: Planar) -> "TlSpectrum":
        return TlSpectrum(p.re, p.im, self.lead, self.batch, self.n,
                          self.n2)

    def __add__(self, other):
        return self._like(Planar.__add__(self, other))

    def __sub__(self, other):
        return self._like(Planar.__sub__(self, other))

    def __mul__(self, other):
        return self._like(Planar.__mul__(self, other))

    def conj(self):
        return self._like(Planar.conj(self))


def from_complex(x) -> Planar:
    """Host/CPU conversion: complex array -> planes (numpy or jnp)."""
    if isinstance(x, Planar):
        return x
    if isinstance(x, np.ndarray) and np.iscomplexobj(x):
        r = np.ascontiguousarray(x.real)
        i = np.ascontiguousarray(x.imag)
        dt = np.float32 if x.dtype == np.complex64 else r.dtype
        return Planar(jnp.asarray(r.astype(dt)), jnp.asarray(i.astype(dt)))
    xr = jnp.real(x)
    return Planar(xr, jnp.imag(x) if jnp.iscomplexobj(x) else jnp.zeros_like(xr))


def to_complex(p: Planar):
    """Device conversion back to a complex jnp array (CPU backends only)."""
    return jax.lax.complex(p.re, p.im)


def to_numpy(p: Planar) -> np.ndarray:
    """Host conversion: planes -> numpy complex (safe on complex-free
    backends: transfers the real planes, combines on host)."""
    r = np.asarray(p.re)
    i = np.asarray(p.im)
    dt = np.complex64 if r.dtype == np.float32 else np.complex128
    return (r + 1j * i).astype(dt)


def planar_table(tab: np.ndarray, dtype=np.float32) -> Planar:
    """Host constant table -> planar jnp constants."""
    return Planar(jnp.asarray(np.real(tab).astype(dtype)),
                  jnp.asarray(np.imag(tab).astype(dtype)))


def mul_i(p: Planar) -> Planar:
    """Multiply by +i: (a+bi)*i = -b + ai."""
    return Planar(-p.im, p.re)


def mul_neg_i(p: Planar) -> Planar:
    """Multiply by -i."""
    return Planar(p.im, -p.re)


def real_planar(x) -> Planar:
    """Wrap a real array as a planar complex with zero imaginary part."""
    x = jnp.asarray(x)
    return Planar(x, jnp.zeros_like(x))


def is_complex_input(x) -> bool:
    return not isinstance(x, Planar) and (
        np.iscomplexobj(x) if isinstance(x, np.ndarray)
        else jnp.issubdtype(jnp.asarray(x).dtype, jnp.complexfloating))
