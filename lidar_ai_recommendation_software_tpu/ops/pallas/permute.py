"""Serial VMEM permutation kernels.

XLA's TPU gather/scatter run at ~18-20M elem/s (measured: ~50 ms per
1M-element scatter, ~25 ms per 1M gather) because every element round-
trips HBM. When the SOURCE (gather) or DESTINATION (scatter) fits in
VMEM, a sequential on-core loop does the same permutation at ~10 cycles
per element (~10 ms at 1M) with the small operand resident in VMEM and
the streaming side pipelined through normal block specs.

Also ``sorted_fill``: build a large (ROWS, W) HBM table from payload rows
whose target row-indices are SORTED and UNIQUE (the column-grid build
produces exactly this) — a merge-style streaming write, replacing two
XLA scatters (~95 ms at 1M rows) with one sequential pass. Empty rows
are filled with the bit pattern 0xFFFFFFFF: int32 lanes read -1, float
lanes read NaN — which the distance tests reject naturally (NaN <= r2 is
false), so one fill value serves mixed-typed payloads.

All kernels run in interpreter mode off-TPU (same convention as
kernels.py) and have jnp reference implementations for testing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# VMEM-resident operand budget (bytes): small enough to leave room for
# the pipelined streaming blocks and double buffering.
VMEM_OPERAND_BYTES = 8 * 1024 * 1024


# ---------------------------------------------------------------------------
# vmem_gather: out[k] = src[idx[k]], src resident in VMEM
# ---------------------------------------------------------------------------

def _vmem_gather_kernel(chunk, src_ref, idx_ref, out_ref):
    def body(k, _):
        j = idx_ref[k]
        out_ref[k] = src_ref[j]
        return 0

    jax.lax.fori_loop(0, chunk, body, 0)


def permutation_scatter(perm: jnp.ndarray, val: jnp.ndarray
                        ) -> jnp.ndarray:
    """out[perm[k]] = val[k] for a PERMUTATION ``perm`` — via one sort.

    XLA's TPU scatter runs ~20M elem/s (~50 ms at 1M); its sort runs a
    1M int32 key/payload pair in ~12 ms. Sorting (perm, val) by perm
    leaves val in exactly out-order. Pure jnp, works on every backend.
    """
    _, out = jax.lax.sort((perm, val), num_keys=1)
    return out


def permutation_gather(src: jnp.ndarray, perm: jnp.ndarray
                       ) -> jnp.ndarray:
    """out[k] = src[perm[k]] for a PERMUTATION ``perm`` — via two sorts
    (src rides along the inverse permutation, then back)."""
    n = perm.shape[0]
    i32 = jnp.arange(n, dtype=jnp.int32)
    _, inv = jax.lax.sort((perm, i32), num_keys=1)    # inv = perm^-1
    _, out = jax.lax.sort((inv, src), num_keys=1)
    return out


def vmem_gather(src: jnp.ndarray, idx: jnp.ndarray,
                chunk: int = 8192) -> jnp.ndarray:
    """out[k] = src[idx[k]] for 1-D int32/float32 ``src`` that fits in
    VMEM. idx must be in-range (callers clip).

    NOTE: the serial kernel only runs in interpreter mode — Mosaic
    cannot prove alignment for dynamic scalar VMEM indexing ("index in
    dimension 0 is a multiple of 1024"), so on real TPU this falls back
    to XLA gather. Kept for documentation of the measured alternative
    and for a future SMEM-chunked variant."""
    if (not _interpret()
            or src.size * src.dtype.itemsize > VMEM_OPERAND_BYTES):
        return src[idx]
    n = idx.shape[0]
    npad = _round_up(n, chunk)
    idx_p = jnp.pad(idx, (0, npad - n))
    out = pl.pallas_call(
        functools.partial(_vmem_gather_kernel, chunk),
        grid=(npad // chunk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),      # src, whole
            pl.BlockSpec((chunk,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad,), src.dtype),
        interpret=_interpret(),
    )(src, idx_p)
    return out[:n]


# ---------------------------------------------------------------------------
# vmem_scatter: out[idx[k]] = val[k], out resident in VMEM
# ---------------------------------------------------------------------------

def _vmem_scatter_kernel(chunk, nvalid, fill, idx_ref, val_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.full_like(out_ref, fill)

    base = i * chunk

    def body(k, _):
        @pl.when(base + k < nvalid)
        def _():
            j = idx_ref[k]
            out_ref[j] = val_ref[k]
        return 0

    jax.lax.fori_loop(0, chunk, body, 0)


def vmem_scatter(idx: jnp.ndarray, val: jnp.ndarray, size: int,
                 fill=0, chunk: int = 8192) -> jnp.ndarray:
    """out (size,) with out[idx[k]] = val[k] (last write wins; unique
    indices in practice), ``fill`` elsewhere. Interpreter-only (see
    vmem_gather); on real TPU use permutation_scatter or XLA."""
    if not _interpret() or size * val.dtype.itemsize > VMEM_OPERAND_BYTES:
        return jnp.full((size,), fill, val.dtype).at[idx].set(val)
    n = idx.shape[0]
    npad = _round_up(n, chunk)
    idx_p = jnp.pad(idx, (0, npad - n))
    val_p = jnp.pad(val, (0, npad - n))
    return pl.pallas_call(
        functools.partial(_vmem_scatter_kernel, chunk, n, fill),
        grid=(npad // chunk,),
        in_specs=[
            pl.BlockSpec((chunk,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),   # whole array
        out_shape=jax.ShapeDtypeStruct((size,), val.dtype),
        interpret=_interpret(),
    )(idx_p, val_p)


# ---------------------------------------------------------------------------
# sorted_fill: large table from sorted-unique row targets
# ---------------------------------------------------------------------------

def _sorted_fill_kernel(trows, width, flat_ref, pay_ref, out_ref,
                        ptr_ref, vflat, vpay, sem_f, sem_p):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        ptr_ref[0] = 0

    p0 = ptr_ref[0]
    rd_f = pltpu.make_async_copy(flat_ref.at[pl.ds(p0, trows)], vflat,
                                 sem_f)
    rd_p = pltpu.make_async_copy(pay_ref.at[pl.ds(p0, trows), :], vpay,
                                 sem_p)
    rd_f.start()
    rd_p.start()

    # fill: 0xFFFFFFFF == int32 -1 == float32 NaN — one pattern for all
    # lane types
    out_ref[:] = pltpu.bitcast(
        jnp.full(out_ref.shape, -1, jnp.int32), jnp.float32)
    rd_f.wait()
    rd_p.wait()

    tile_end = (i + 1) * trows
    base = i * trows

    def cond(k):
        # both sides evaluate under tracing — clamp the speculative read
        return (k < trows) & (vflat[jnp.minimum(k, trows - 1)] < tile_end)

    def body(k):
        out_ref[vflat[k] - base, :] = vpay[k, :]
        return k + 1

    used = jax.lax.while_loop(cond, body, jnp.asarray(0, jnp.int32))
    ptr_ref[0] = p0 + used


def sorted_fill(flat: jnp.ndarray, payload: jnp.ndarray, rows: int,
                trows: int = 8192) -> jnp.ndarray:
    """Build a (rows, W) float32 table with table[flat[k], :] =
    payload[k, :]; all other rows carry the 0xFFFFFFFF pattern (-1 as
    int32, NaN as float32). ``flat`` must be SORTED ascending with
    unique in-range values (the column-grid invariant); out-of-range
    (== rows, the spill sentinel) entries must sort last and are
    dropped."""
    n, w = payload.shape
    rows_p = _round_up(rows, trows)
    # sentinel-pad so the per-tile while_loop always terminates at n and
    # spill entries (flat == rows) never match a real tile
    flat_p = jnp.pad(flat, (0, trows), constant_values=rows_p)
    flat_p = jnp.where(flat_p >= rows, rows_p, flat_p)
    pay_p = jnp.pad(payload, ((0, trows), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_sorted_fill_kernel, trows, w),
        grid=(rows_p // trows,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((trows, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_p, w), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((trows,), jnp.int32),
            pltpu.VMEM((trows, w), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=_interpret(),
    )(flat_p, pay_p)
    return out[:rows]


# ---------------------------------------------------------------------------
# jnp references (test oracles)
# ---------------------------------------------------------------------------

def vmem_gather_reference(src, idx):
    return src[idx]


def vmem_scatter_reference(idx, val, size, fill=0):
    return jnp.full((size,), fill, val.dtype).at[idx].set(val)


def sorted_fill_reference(flat, payload, rows):
    fill = jnp.full((rows, payload.shape[1]), -1, jnp.int32)
    tab = jax.lax.bitcast_convert_type(fill, jnp.float32)
    # out-of-range scatter indices (the spill sentinel) are dropped by
    # jax's .at[].set semantics — same contract as the kernel
    return tab.at[flat].set(payload)
