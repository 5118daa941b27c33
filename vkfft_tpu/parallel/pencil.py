"""Slab/pencil-decomposed distributed FFTs over a device mesh.

This is the framework's genuinely new layer relative to the reference, which
lists "multiple GPU job splitting" only as a future plan (README.md:24-25).
Design: the same mathematics as the reference's four-step long-sequence
decomposition (``vkFFT_Scheduler.h:2651-2888``) lifted across chips — each
device transforms the axes it holds contiguously, and `all_to_all` transposes
over ICI re-pencil the array so the remaining axes become local.

  slab  (1-D mesh, arrays >= 2-D):  local FFT over axes 1..d-1,
        all_to_all (split axis 1, concat axis 0), local FFT over axis 0.
  pencil (2-D mesh, 3-D arrays):    FFT z; a2a over mesh axis 1 (z<->y);
        FFT y; a2a over mesh axis 0 (y<->x); FFT x.

Outputs are left in the transposed sharding by default — the distributed
analog of the reference's ``disableReorderFourStep`` ordering contract
(``vkFFT_Structs.h:221``): callers doing convolutions don't care about the
intermediate order, and the inverse undoes it.  ``transpose_back=True`` adds
the extra all_to_all to restore the input sharding.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.4.35 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from vkfft_tpu import api
from vkfft_tpu.errors import InvalidConfigError
from vkfft_tpu.pcomplex import Planar
from vkfft_tpu.planner.plan import AxisPlan, plan_axis


def _a2a(x, name, split_axis, concat_axis):
    """all_to_all over arrays or Planar plane pairs."""
    if isinstance(x, Planar):
        return Planar(
            jax.lax.all_to_all(x.re, name, split_axis=split_axis,
                               concat_axis=concat_axis, tiled=True),
            jax.lax.all_to_all(x.im, name, split_axis=split_axis,
                               concat_axis=concat_axis, tiled=True))
    return jax.lax.all_to_all(x, name, split_axis=split_axis,
                              concat_axis=concat_axis, tiled=True)


def _split(x, k, axis):
    if isinstance(x, Planar):
        res = [Planar(r, i) for r, i in zip(jnp.split(x.re, k, axis=axis),
                                            jnp.split(x.im, k, axis=axis))]
        return res
    return jnp.split(x, k, axis=axis)


def _concat(parts, axis):
    if isinstance(parts[0], Planar):
        return Planar(jnp.concatenate([p.re for p in parts], axis=axis),
                      jnp.concatenate([p.im for p in parts], axis=axis))
    return jnp.concatenate(parts, axis=axis)


def _overlapped(x, free_axis, chunks, stage):
    """Run ``stage`` (an all_to_all + local-FFT pair) over ``chunks`` slices
    of ``x`` along ``free_axis`` — an axis touched by neither the transpose
    nor the transform, so each chunk's chain is independent and XLA's
    latency-hiding scheduler can overlap chunk i+1's collective with chunk
    i's compute.  Falls back to the monolithic stage when the axis does not
    divide.  This is the communication/compute overlap the reference cannot
    express (single-device; SURVEY §2.5) — the distributed analog of its
    inter-upload pipelining."""
    size = (x.re if isinstance(x, Planar) else x).shape[free_axis]
    if chunks <= 1 or size % chunks or chunks > size:
        return stage(x)
    parts = _split(x, chunks, free_axis)
    return _concat([stage(p) for p in parts], free_axis)


def _eng(engine: Optional[str]):
    return api._engine(engine or ("jnp" if jax.devices()[0].platform == "cpu" else "pallas"))


class DistributedFFT:
    """Planned multi-chip N-D FFT application.

    Parameters
    ----------
    shape: global transform shape (the trailing dims of the operand).
    mesh:  1-axis mesh for slab decomposition, 2-axis mesh (3-D arrays) for
           pencil decomposition.
    engine: per-device execution engine ('jnp'/'pallas').
    transpose_back: restore the input sharding after the transform.
    """

    def __init__(self, shape: tuple[int, ...], mesh: Mesh,
                 engine: Optional[str] = None, transpose_back: bool = False,
                 normalize: bool = True, overlap_chunks: int = 1,
                 real: bool = False):
        self.shape = tuple(shape)
        self.mesh = mesh
        self.engine = engine
        self.transpose_back = transpose_back
        self.normalize = normalize
        self.overlap_chunks = int(overlap_chunks)
        self.real = bool(real)
        self.axis_names = tuple(mesh.axis_names)
        ndim = len(self.shape)
        if len(self.axis_names) == 1:
            if ndim < 2:
                raise InvalidConfigError("slab decomposition needs >= 2-D arrays")
            self.kind = "slab"
        elif len(self.axis_names) == 2:
            if ndim != 3:
                raise InvalidConfigError("pencil decomposition implemented for 3-D arrays")
            self.kind = "pencil"
        else:
            raise InvalidConfigError("mesh must have 1 or 2 axes")

        # the real transform works on the half spectrum (n//2+1 bins) along
        # the last axis — the all_to_all that splits that axis must divide it
        self._half = self.shape[-1] // 2 + 1
        last_len = self._half if self.real else self.shape[-1]
        sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
        if self.kind == "slab":
            p = sizes[self.axis_names[0]]
            needed = {0: p}
            # the a2a splits axis 1 — for 2-D real transforms that is the
            # half-spectrum axis
            if ndim == 2:
                if last_len % p:
                    raise InvalidConfigError(
                        f"axis 1 {'half-spectrum ' if self.real else ''}length "
                        f"{last_len} not divisible by mesh size {p}")
            else:
                needed[1] = p
        else:
            p1, p2 = sizes[self.axis_names[0]], sizes[self.axis_names[1]]
            # axis 1 is split by p2 on input and by p1 mid-transform
            needed = {0: p1}
            if last_len % p2:
                raise InvalidConfigError(
                    f"axis 2 {'half-spectrum ' if self.real else ''}length "
                    f"{last_len} not divisible by mesh size {p2}")
            if self.shape[1] % p1 or self.shape[1] % p2:
                raise InvalidConfigError(
                    f"axis 1 length {self.shape[1]} must divide by both mesh sizes {p1},{p2}")
        for ax, p in needed.items():
            if self.shape[ax] % p:
                raise InvalidConfigError(
                    f"axis {ax} length {self.shape[ax]} not divisible by mesh size {p}")
        self.plans = {i: plan_axis(self.shape[i]) for i in range(ndim)}

        # slab tail fusion: the two minor axes are both device-local — fuse
        # them into one pair kernel per device (one local HBM r+w less)
        self._tail_pair = False
        if self.kind == "slab" and ndim >= 3 and not self.real:
            from vkfft_tpu.planner.factorize import Algorithm as _Alg
            eng = _eng(self.engine)
            self._tail_pair = (
                hasattr(eng, "fft_pair_p")
                and self.plans[ndim - 2].algorithm is _Alg.DIRECT
                and self.plans[ndim - 1].algorithm is _Alg.DIRECT
                and eng.pair_available(self.shape[-2], self.shape[-1]))

        self._fwd = self._build(inverse=False)
        self._inv = self._build(inverse=True)

    # -- sharding specs ----------------------------------------------------

    def input_spec(self) -> P:
        """PartitionSpec of the operand.  Operands must have rank exactly
        ``len(shape)`` (no extra leading batch dims — batch over transforms
        by vmapping or stacking into axis 0 of a slab decomposition)."""
        ndim = len(self.shape)
        if self.kind == "slab":
            return P(self.axis_names[0], *([None] * (ndim - 1)))
        return P(self.axis_names[0], self.axis_names[1], None)

    def output_spec(self) -> P:
        ndim = len(self.shape)
        if self.transpose_back:
            return self.input_spec()
        if self.kind == "slab":
            return P(None, self.axis_names[0], *([None] * (ndim - 2)))
        return P(None, self.axis_names[0], self.axis_names[1])

    # -- implementation ----------------------------------------------------

    def _local_fft(self, x, axis, inverse):
        eng = _eng(self.engine)
        if isinstance(x, Planar):
            return eng.fft_axis_p(x, axis, self.plans[axis], inverse)
        return eng.fft_axis(x, axis, self.plans[axis], inverse)

    def _build(self, inverse: bool):
        names = self.axis_names
        ndim = len(self.shape)
        oc = self.overlap_chunks

        def tail_ffts(x):
            # trailing local axes; the minor pair fuses into one kernel when
            # eligible (slab: all trailing axes are device-local)
            if self.real:
                # real last axis: forward = local rfft first (half-spectrum
                # output halves every later all_to_all's bytes); inverse =
                # local irfft last
                from vkfft_tpu.transforms import r2c as _r2c
                if not inverse:
                    x = _r2c.rfft(x, axis=-1, engine=self.engine)
                for ax in range(1, ndim - 1):
                    x = self._local_fft(x, ax, inverse)
                if inverse:
                    x = _r2c.irfft(x, n=self.shape[-1], axis=-1,
                                   engine=self.engine)
                return x
            if self._tail_pair and isinstance(x, Planar):
                eng = _eng(self.engine)
                x = eng.fft_pair_p(x, self.shape[-2], self.shape[-1], inverse)
                last = ndim - 2
            else:
                last = ndim
            for ax in range(1, last):
                x = self._local_fft(x, ax, inverse)
            return x

        def fwd_slab(x):
            # x local: (X/P, Y, Z, ...) — transform trailing axes, transpose,
            # transform axis 0.  With >= 3 dims the a2a+FFT stage is chunked
            # along the last axis (untouched by both) for comm/compute overlap.
            x = tail_ffts(x)
            stage = lambda c: self._local_fft(_a2a(c, names[0], 1, 0),
                                              0, inverse)
            x = _overlapped(x, ndim - 1, oc if ndim >= 3 else 1, stage)
            if self.transpose_back:
                x = _a2a(x, names[0], 0, 1)
            return x

        def inv_slab(x):
            # exact reverse of fwd_slab's dataflow
            if self.transpose_back:
                x = _a2a(x, names[0], 1, 0)
            stage = lambda c: _a2a(self._local_fft(c, 0, inverse),
                                   names[0], 0, 1)
            x = _overlapped(x, ndim - 1, oc if ndim >= 3 else 1, stage)
            x = tail_ffts(x)
            return x

        def fwd_pencil(x):
            # x local: (X/P1, Y/P2, Z); each a2a+FFT stage is chunked along
            # its free axis (0 for the z<->y stage, 2 for y<->x) so chunk
            # i+1's all_to_all overlaps chunk i's transform
            if self.real:
                from vkfft_tpu.transforms import r2c as _r2c
                x = _r2c.rfft(x, axis=-1, engine=self.engine)
            else:
                x = self._local_fft(x, 2, inverse)
            x = _overlapped(
                x, 0, oc,
                lambda c: self._local_fft(_a2a(c, names[1], 2, 1), 1, inverse))
            x = _overlapped(
                x, 2, oc,
                lambda c: self._local_fft(_a2a(c, names[0], 1, 0), 0, inverse))
            if self.transpose_back:
                x = _a2a(x, names[0], 0, 1)
                x = _a2a(x, names[1], 1, 2)
            return x

        def inv_pencil(x):
            if self.transpose_back:
                x = _a2a(x, names[1], 2, 1)
                x = _a2a(x, names[0], 1, 0)
            x = _overlapped(
                x, 2, oc,
                lambda c: _a2a(self._local_fft(c, 0, inverse), names[0], 0, 1))
            x = _overlapped(
                x, 0, oc,
                lambda c: _a2a(self._local_fft(c, 1, inverse), names[1], 1, 2))
            if self.real:
                from vkfft_tpu.transforms import r2c as _r2c
                x = _r2c.irfft(x, n=self.shape[-1], axis=-1,
                               engine=self.engine)
            else:
                x = self._local_fft(x, 2, inverse)
            return x

        if self.kind == "slab":
            body = inv_slab if inverse else fwd_slab
        else:
            body = inv_pencil if inverse else fwd_pencil

        def fn(x):
            y = body(x)
            if inverse and self.normalize:
                # irfft already normalizes its own axis (numpy convention)
                total = int(np.prod(self.shape[:-1] if self.real
                                    else self.shape))
                if total != 1:
                    if isinstance(y, Planar):
                        y = y * np.asarray(1.0 / total, dtype=y.dtype)
                    else:
                        y = y * y.dtype.type(1.0 / total)
            return y

        in_spec = self.output_spec() if inverse else self.input_spec()
        out_spec = self.input_spec() if inverse else self.output_spec()
        # check_vma=False: pallas_call results carry no varying-mesh-axes
        # annotation, which trips shard_map's vma checker (the specs above
        # fully describe the sharding)
        mapped = shard_map(fn, mesh=self.mesh, in_specs=(in_spec,),
                           out_specs=out_spec, check_vma=False)
        return jax.jit(mapped)

    def _check_rank(self, x):
        if x.ndim != len(self.shape):
            raise InvalidConfigError(
                f"DistributedFFT operands must have rank {len(self.shape)} "
                f"(the global transform shape {self.shape}); got rank "
                f"{x.ndim}.  Fold batch dims into axis 0 or vmap.")

    def forward(self, x):
        self._check_rank(x)
        return self._fwd(x)

    def inverse(self, x):
        self._check_rank(x)
        return self._inv(x)

    def shard_input(self, x):
        """Place a host array (or Planar pair) on the mesh with the expected
        input sharding."""
        sh = NamedSharding(self.mesh, self.input_spec())
        if isinstance(x, Planar):
            return Planar(jax.device_put(x.re, sh), jax.device_put(x.im, sh))
        return jax.device_put(x, sh)


# -- functional facade ------------------------------------------------------

@functools.lru_cache(maxsize=128)
def _cached_dist(shape, mesh_key, engine, transpose_back, overlap_chunks=1,
                 real=False):
    mesh = _MESHES[mesh_key]
    return DistributedFFT(shape, mesh, engine=engine,
                          transpose_back=transpose_back,
                          overlap_chunks=overlap_chunks, real=real)


_MESHES: dict = {}


def _dist_for(x, mesh, engine, transpose_back, overlap_chunks=1, real=False,
              shape=None):
    key = (tuple(mesh.axis_names), tuple(mesh.devices.shape),
           tuple(d.id for d in mesh.devices.flat))
    _MESHES[key] = mesh
    return _cached_dist(tuple(shape if shape is not None else x.shape), key,
                        engine, transpose_back, overlap_chunks, real)


def pfftn(x, mesh: Mesh, engine: Optional[str] = None,
          transpose_back: bool = False, overlap_chunks: int = 1):
    """Distributed forward N-D FFT of a globally-shaped array over ``mesh``."""
    app = _dist_for(x, mesh, engine, transpose_back, overlap_chunks)
    return app.forward(app.shard_input(x) if not _is_sharded(x, mesh) else x)


def pifftn(x, mesh: Mesh, engine: Optional[str] = None,
           transpose_back: bool = False, overlap_chunks: int = 1):
    """Distributed inverse N-D FFT.  Host arrays are placed with the expected
    *spectrum* sharding (``output_spec``), mirroring ``pfftn``."""
    app = _dist_for(x, mesh, engine, transpose_back, overlap_chunks)
    if not _is_sharded(x, mesh):
        sh = NamedSharding(mesh, app.output_spec())
        if isinstance(x, Planar):
            x = Planar(jax.device_put(x.re, sh), jax.device_put(x.im, sh))
        else:
            x = jax.device_put(x, sh)
    return app.inverse(x)


def prfftn(x, mesh: Mesh, engine: Optional[str] = None,
           transpose_back: bool = False, overlap_chunks: int = 1):
    """Distributed forward N-D *real* FFT: local rfft over the (device-local)
    last axis first, so every all_to_all moves the half spectrum — ~half the
    interconnect bytes of embedding the data in a complex transform.  Returns
    the (..., n//2+1) half spectrum in the transform's output sharding."""
    app = _dist_for(x, mesh, engine, transpose_back, overlap_chunks, real=True)
    return app.forward(app.shard_input(x) if not _is_sharded(x, mesh) else x)


def pirfftn(X, shape: tuple[int, ...], mesh: Mesh,
            engine: Optional[str] = None, transpose_back: bool = False,
            overlap_chunks: int = 1):
    """Distributed inverse real FFT.  ``shape`` is the global *real* shape
    (the last axis is ambiguous from the half spectrum, like numpy's
    ``irfft(n=...)``)."""
    app = _dist_for(X, mesh, engine, transpose_back, overlap_chunks,
                    real=True, shape=shape)
    if not _is_sharded(X, mesh):
        sh = NamedSharding(mesh, app.output_spec())
        if isinstance(X, Planar):
            X = Planar(jax.device_put(X.re, sh), jax.device_put(X.im, sh))
        else:
            X = jax.device_put(X, sh)
    return app.inverse(X)


def pfft(x, mesh: Mesh, engine: Optional[str] = None):
    """Batch-sharded 1-D FFT: shard the leading batch dim, no communication —
    the embarrassingly-parallel layer (reference analog: threadblock-grid
    batch parallelism, ``vkFFT_RunApp.h:144-147``)."""
    name = mesh.axis_names[0]
    spec = P(name, *([None] * (x.ndim - 1)))

    def local(v):
        eng = _eng(engine)
        return eng.fft_axis(v, v.ndim - 1, plan_axis(x.shape[-1]), False)

    mapped = shard_map(local, mesh=mesh, in_specs=(spec,), out_specs=spec,
                       check_vma=False)
    xs = jax.device_put(x, NamedSharding(mesh, spec))
    return jax.jit(mapped)(xs)


def _is_sharded(x, mesh) -> bool:
    sh = getattr(x, "sharding", None)
    return sh is not None and getattr(sh, "mesh", None) is mesh


class DistributedConvolution:
    """Distributed frequency-domain convolution over a device mesh.

    The distributed rendition of the reference's fused convolution pipeline
    (``performConvolution``, ``vkFFT_FFT.h:241-351``): forward transform kept
    in the transposed sharding, spectrum multiply (sharding-aligned — no
    communication), inverse transform.  Because forward and inverse share the
    `transpose_back=False` contract, the convolution pays zero reorder
    transposes — the distributed analog of ``disableReorderFourStep``
    (README.md:16).

    ``real=True`` convolves real data with a real kernel through the
    half-spectrum pipeline (~half the all_to_all bytes).
    """

    def __init__(self, shape: tuple[int, ...], mesh: Mesh, kernel,
                 engine: Optional[str] = None, overlap_chunks: int = 1,
                 real: bool = False):
        self.fft = DistributedFFT(shape, mesh, engine=engine,
                                  transpose_back=False, normalize=True,
                                  overlap_chunks=overlap_chunks, real=real)
        kshape = tuple((kernel.re if isinstance(kernel, Planar)
                        else kernel).shape)
        if kshape != tuple(shape):
            raise InvalidConfigError(
                f"kernel shape {kshape} must equal transform shape {tuple(shape)}")
        self.kernel_f = self.fft.forward(self.fft.shard_input(kernel))

    def shard_input(self, x):
        return self.fft.shard_input(x)

    def __call__(self, x):
        if not _is_sharded(x.re if isinstance(x, Planar) else x,
                           self.fft.mesh):
            x = self.fft.shard_input(x)
        X = self.fft.forward(x)
        if isinstance(X, Planar) and not isinstance(self.kernel_f, Planar):
            K = Planar(jnp.real(self.kernel_f), jnp.imag(self.kernel_f))
        else:
            K = self.kernel_f
        return self.fft.inverse(X * K)
