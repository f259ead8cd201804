"""Pallas TPU kernels for the hot compute paths.

Three kernels, each with identical-semantics jnp fallbacks (used on
non-TPU backends and as test oracles):

  - ``radius_count``: people-within-radius count per cell centre — the
    reference's hottest loop (app_simplified.py:269-281, per-cell KD-tree
    queries in Python). Formulated as |c|^2 + |p|^2 - 2 c.p so the cross
    term rides the MXU; cells are tiled over the grid, the people tensor
    streams through VMEM.
  - ``sa_mlp_pool``: the set-abstraction inner loop — 3-layer shared MLP
    over grouped features fused with the masked max-pool, so the
    (M, K, hidden) intermediates never round-trip to HBM.
  - ``fps``: farthest-point sampling with the whole distance cache
    resident in VMEM; the sequential selection loop runs on-core instead
    of issuing M host-visible argmax reductions.

All kernels run in interpreter mode automatically off-TPU
(``interpret=jax.default_backend() != "tpu"``), so the same code path is
unit-tested on CPU and compiled by Mosaic on TPU.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# radius_count
# ---------------------------------------------------------------------------

def _radius_count_kernel(kt: int, r2_ref, nv_ref, centers_ref, people_ref,
                         pmask_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # people capacity is a static power-of-two bucket but the VALID people
    # occupy a dense prefix (cluster ids are compacted); skip tiles that
    # are entirely past the live count — at venue densities that's ~2/3
    # of the people axis
    @pl.when(j * kt < nv_ref[0])
    def _():
        c = centers_ref[:]                 # (TC, 2)
        p = people_ref[:]                  # (2, TK) — transposed layout so
        pm = pmask_ref[:]                  # (1, TK)   every op is a 2D
        r2 = r2_ref[0]                     #           static slice (Mosaic
                                           #           has no gather)
        # direct difference form (not |c|^2+|p|^2-2c.p): the coordinates
        # are venue-scale (~1e1-1e3) while r^2 is ~4, so the cancellation
        # in the dot-product form costs ~1e-5 relative error — enough to
        # flip borderline counts and break bit-parity with the CPU oracle
        dx = c[:, 0:1] - p[0:1, :]          # (TC, TK)
        dy = c[:, 1:2] - p[1:2, :]
        d2 = dx * dx + dy * dy
        hit = (d2 <= r2) & (pm > 0)
        out_ref[:] += jnp.sum(hit.astype(jnp.int32), axis=1)


def radius_count(centers: jnp.ndarray, people: jnp.ndarray,
                 pmask: jnp.ndarray, radius: float, tile: int = 1024,
                 people_tile: int = 2048) -> jnp.ndarray:
    # NB tile=1024 matches XLA's native 1-D layout tiling for 4-byte
    # element types (T(1024)); other block sizes fail Mosaic layout
    # verification for the s32 output.
    """Count valid people within ``radius`` (inclusive) of each centre.

    centers: (C, 2); people: (K, 2); pmask: (K,) bool -> (C,) int32.
    2-D grid: centre tiles x people tiles, counts accumulated in the
    revisited output block so the (TC, TK) distance tile stays in VMEM."""
    c = centers.shape[0]
    k = people.shape[0]
    cp = _round_up(c, tile)
    kt = min(people_tile, _round_up(k, 128))
    kp = _round_up(k, kt)
    centers_p = jnp.pad(centers, ((0, cp - c), (0, 0)))
    people_t = jnp.pad(people.T, ((0, 0), (0, kp - k)))      # (2, KP)
    pmask_f = jnp.pad(pmask.astype(jnp.float32),
                      (0, kp - k)).reshape(1, kp)            # (1, KP)
    r2 = jnp.asarray([radius * radius], jnp.float32)
    # live extent = last valid index + 1 (valid ids are normally a dense
    # prefix — cluster ids are cumsum-compacted — but this stays correct
    # for any mask); tiles past it are skipped in-kernel
    nv = jnp.max(jnp.where(
        pmask, jnp.arange(1, k + 1, dtype=jnp.int32), 0)).reshape(1)

    out = pl.pallas_call(
        functools.partial(_radius_count_kernel, kt),
        out_shape=jax.ShapeDtypeStruct((cp,), jnp.int32),
        grid=(cp // tile, kp // kt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, 2), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, kt), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kt), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile,), lambda i, j: (i,),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(r2, nv, centers_p.astype(jnp.float32), people_t.astype(jnp.float32),
      pmask_f)
    return out[:c]


def radius_count_reference(centers, people, pmask, radius):
    """jnp oracle for the kernel (and the non-TPU fast path)."""
    d2 = jnp.sum((centers[:, None, :] - people[None, :, :]) ** 2, axis=-1)
    return jnp.sum((d2 <= radius * radius) & pmask[None, :],
                   axis=1).astype(jnp.int32)


# ---------------------------------------------------------------------------
# sa_mlp_pool: fused shared-MLP + masked max-pool
# ---------------------------------------------------------------------------

def _sa_mlp_kernel(compute_dtype, grouped_ref, valid_ref, w1_ref, b1_ref,
                   w2_ref, b2_ref, w3_ref, b3_ref, out_ref):
    g = grouped_ref[:]                     # (TM, K, Cin)
    v = valid_ref[:]                       # (TM, K)
    tm, k, cin = g.shape
    # MXU feeds in compute_dtype (bf16 on TPU doubles matmul throughput);
    # accumulation stays f32 via preferred_element_type, bias adds in f32
    x = g.reshape(tm * k, cin).astype(compute_dtype)
    x = jnp.maximum(jnp.dot(x, w1_ref[:].astype(compute_dtype),
                            preferred_element_type=jnp.float32)
                    + b1_ref[:][None, :], 0.0)
    x = jnp.maximum(jnp.dot(x.astype(compute_dtype),
                            w2_ref[:].astype(compute_dtype),
                            preferred_element_type=jnp.float32)
                    + b2_ref[:][None, :], 0.0)
    x = jnp.maximum(jnp.dot(x.astype(compute_dtype),
                            w3_ref[:].astype(compute_dtype),
                            preferred_element_type=jnp.float32)
                    + b3_ref[:][None, :], 0.0)
    cout = x.shape[-1]
    x = x.reshape(tm, k, cout)
    # additive mask penalty, all-f32: Mosaic cannot insert a minor dim on
    # an i1 vector ((TM, K) bool -> (TM, K, 1)), so instead of a where()
    # the invalid rows are pushed to <= -1e9 arithmetically (v is 0/1 f32;
    # post-ReLU activations are >= 0, so valid lanes are untouched and the
    # any-valid wrapper zeroes all-invalid centroids)
    x = x + (v[..., None] - 1.0) * 1e9
    out_ref[:] = jnp.max(x, axis=1)


def sa_mlp_pool(grouped: jnp.ndarray, valid: jnp.ndarray,
                weights: Sequence[Tuple[jnp.ndarray, jnp.ndarray]],
                tile: int = 128,
                compute_dtype=jnp.float32) -> jnp.ndarray:
    """Fused 3-layer shared MLP + masked max-pool.

    grouped: (M, K, Cin); valid: (M, K) bool;
    weights: [(W1, b1), (W2, b2), (W3, b3)] -> (M, Cout) f32.
    ``compute_dtype=bfloat16`` feeds the MXU at its native rate
    (activations/weights cast per-layer, f32 accumulate).
    Centroids with no valid neighbor yield 0 (matching the masked
    pooled-feature semantics of models/crowdnet.py)."""
    assert len(weights) == 3, "kernel is specialised to 3 MLP layers"
    m, k, cin = grouped.shape
    mp = _round_up(m, tile)
    g = jnp.pad(grouped, ((0, mp - m), (0, 0), (0, 0))).astype(jnp.float32)
    v = jnp.pad(valid, ((0, mp - m), (0, 0))).astype(jnp.float32)
    (w1, b1), (w2, b2), (w3, b3) = [
        (w.astype(jnp.float32), b.astype(jnp.float32))
        for w, b in weights]
    cout = w3.shape[1]

    out = pl.pallas_call(
        functools.partial(_sa_mlp_kernel, compute_dtype),
        out_shape=jax.ShapeDtypeStruct((mp, cout), jnp.float32),
        grid=(mp // tile,),
        in_specs=[
            pl.BlockSpec((tile, k, cin), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w1.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(b1.shape, lambda i: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w2.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(b2.shape, lambda i: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w3.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(b3.shape, lambda i: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, cout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(g, v, w1, b1, w2, b2, w3, b3)
    pooled = out[:m]
    any_valid = jnp.any(valid, axis=1)
    return jnp.where(any_valid[:, None], pooled, 0.0)


def _sa_jnp_math(compute_dtype, grouped, valid, w1, b1, w2, b2, w3, b3):
    """Differentiable jnp twin of the fused kernel's exact math: per-layer
    casts to ``compute_dtype`` feeding the MXU, f32 accumulation/bias,
    additive -1e9 mask penalty, masked max-pool. Used as the backward
    recompute of ``sa_mlp_pool_trainable`` so the gradient is the VJP of
    the same function the kernel evaluates."""
    x = grouped.astype(jnp.float32)
    for w, b in ((w1, b1), (w2, b2), (w3, b3)):
        x = jnp.maximum(
            jnp.dot(x.astype(compute_dtype), w.astype(compute_dtype),
                    preferred_element_type=jnp.float32)
            + b.astype(jnp.float32), 0.0)
    x = x + (valid[..., None].astype(jnp.float32) - 1.0) * 1e9
    pooled = jnp.max(x, axis=1)
    return jnp.where(jnp.any(valid, axis=1)[:, None], pooled, 0.0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _sa_mlp_pool_ad(compute_dtype, grouped, valid, w1, b1, w2, b2, w3,
                    b3):
    return sa_mlp_pool(grouped, valid, [(w1, b1), (w2, b2), (w3, b3)],
                       compute_dtype=compute_dtype)


def _sa_mlp_pool_fwd(compute_dtype, grouped, valid, w1, b1, w2, b2, w3,
                     b3):
    out = _sa_mlp_pool_ad(compute_dtype, grouped, valid, w1, b1, w2, b2,
                          w3, b3)
    # rematerialisation contract: save only the INPUTS — the (M, K,
    # hidden) activations the fused forward never materialised are
    # recomputed by the backward, preserving the kernel's HBM win
    return out, (grouped, valid, w1, b1, w2, b2, w3, b3)


def _sa_mlp_pool_bwd(compute_dtype, res, ct):
    grouped, valid, w1, b1, w2, b2, w3, b3 = res
    _, vjp = jax.vjp(
        lambda g, *ws: _sa_jnp_math(compute_dtype, g, valid, *ws),
        grouped, w1, b1, w2, b2, w3, b3)
    dg, dw1, db1, dw2, db2, dw3, db3 = vjp(ct)
    import numpy as np
    dvalid = np.zeros(valid.shape, dtype=jax.dtypes.float0)
    return (dg, dvalid, dw1, db1, dw2, db2, dw3, db3)


_sa_mlp_pool_ad.defvjp(_sa_mlp_pool_fwd, _sa_mlp_pool_bwd)


def sa_mlp_pool_trainable(grouped: jnp.ndarray, valid: jnp.ndarray,
                          weights: Sequence[Tuple[jnp.ndarray,
                                                  jnp.ndarray]],
                          compute_dtype=jnp.float32) -> jnp.ndarray:
    """``sa_mlp_pool`` with a custom VJP, legal under jax.grad.

    Forward is the fused Pallas kernel; backward recomputes the MLP
    activations with the bit-matching jnp math (``_sa_jnp_math``) and
    takes its VJP — a remat-style pairing, so training rides the same
    fused path as serving while the (M, K, hidden) intermediates exist
    only transiently inside each pass."""
    assert len(weights) == 3, "kernel is specialised to 3 MLP layers"
    (w1, b1), (w2, b2), (w3, b3) = weights
    return _sa_mlp_pool_ad(compute_dtype, grouped, valid, w1, b1, w2, b2,
                           w3, b3)


def sa_mlp_pool_reference(grouped, valid, weights):
    x = grouped.astype(jnp.float32)
    for w, b in weights:
        x = jnp.maximum(jnp.einsum("mkc,cd->mkd", x, w) + b, 0.0)
    x = jnp.where(valid[..., None], x, -1e9)
    pooled = jnp.max(x, axis=1)
    return jnp.where(jnp.any(valid, axis=1)[:, None], pooled, 0.0)


# ---------------------------------------------------------------------------
# fps: farthest point sampling with VMEM-resident distance cache
# ---------------------------------------------------------------------------

def _fps_kernel(start_ref, x_ref, y_ref, z_ref, mask_ref, out_ref,
                dist_ref):
    """Full-lane FPS: coordinates live as (R, 128) planes so every VPU op
    runs 128 lanes wide (an (N, 3) layout uses 3 of 128 lanes — measured
    ~10x slower per iteration). The selected point's coordinates are
    extracted by a masked reduce instead of a dynamic VMEM index (Mosaic
    cannot prove dynamic scalar indices aligned)."""
    big = jnp.asarray(3.4e38, jnp.float32)
    int_max = jnp.iinfo(jnp.int32).max
    r, lanes = x_ref.shape
    flat = (jax.lax.broadcasted_iota(jnp.int32, (r, lanes), 0) * lanes
            + jax.lax.broadcasted_iota(jnp.int32, (r, lanes), 1))
    dist_ref[:] = jnp.full((r, lanes), big, jnp.float32)
    out_ref[0] = start_ref[0]

    n_samples = out_ref.shape[0]
    x, y, z = x_ref[:], y_ref[:], z_ref[:]
    msk = mask_ref[:] > 0

    def body(i, last):
        sel = flat == last
        lx = jnp.max(jnp.where(sel, x, -big))
        ly = jnp.max(jnp.where(sel, y, -big))
        lz = jnp.max(jnp.where(sel, z, -big))
        dx = x - lx
        dy = y - ly
        dz = z - lz
        d = dx * dx + dy * dy + dz * dz
        dmin = jnp.minimum(dist_ref[:], d)
        dist_ref[:] = dmin
        masked = jnp.where(msk, dmin, -big)
        # argmax with first-index tie-break (jnp.argmax semantics)
        mx = jnp.max(masked)
        nxt = jnp.min(jnp.where(masked == mx, flat, int_max))
        out_ref[i] = nxt
        return nxt

    jax.lax.fori_loop(1, n_samples, body, start_ref[0])


def _fps_planes(pts: jnp.ndarray, mask: jnp.ndarray, lanes: int = 128):
    """(N, 3)/(N,) -> three (rows, lanes) coordinate planes + mask plane."""
    n = pts.shape[0]
    rows = _round_up(_round_up(n, lanes) // lanes, 8)
    npad = rows * lanes
    pts = pts.astype(jnp.float32)
    planes = [
        jnp.pad(pts[:, d], (0, npad - n)).reshape(rows, lanes)
        for d in range(3)]
    mask_f = jnp.pad(mask.astype(jnp.float32),
                     (0, npad - n)).reshape(rows, lanes)
    return planes, mask_f, rows


def _fps_single(points: jnp.ndarray, mask: jnp.ndarray, n_samples: int,
                start_index: int) -> jnp.ndarray:
    planes, mask_f, rows = _fps_planes(points, mask)
    start = jnp.asarray([start_index], jnp.int32)
    return pl.pallas_call(
        _fps_kernel,
        out_shape=jax.ShapeDtypeStruct((n_samples,), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.VMEM((rows, 128), jnp.float32)],
        interpret=_interpret(),
    )(start, *planes, mask_f)


def _fps_grid_kernel(start_ref, x_ref, y_ref, z_ref, mask_ref, out_ref,
                     dist_ref):
    """Batched FPS: grid dim = example; the (B, n_samples) SMEM output
    block is shared (constant index map) and each program fills its row.
    Body identical to _fps_kernel with the example's planes delivered as
    (rows, lanes) blocks."""
    big = jnp.asarray(3.4e38, jnp.float32)
    int_max = jnp.iinfo(jnp.int32).max
    b = pl.program_id(0)
    r, lanes = x_ref.shape
    flat = (jax.lax.broadcasted_iota(jnp.int32, (r, lanes), 0) * lanes
            + jax.lax.broadcasted_iota(jnp.int32, (r, lanes), 1))
    dist_ref[:] = jnp.full((r, lanes), big, jnp.float32)
    out_ref[b, 0] = start_ref[0]

    n_samples = out_ref.shape[1]
    x, y, z = x_ref[:], y_ref[:], z_ref[:]
    msk = mask_ref[:] > 0

    def body(i, last):
        sel = flat == last
        lx = jnp.max(jnp.where(sel, x, -big))
        ly = jnp.max(jnp.where(sel, y, -big))
        lz = jnp.max(jnp.where(sel, z, -big))
        dx = x - lx
        dy = y - ly
        dz = z - lz
        d = dx * dx + dy * dy + dz * dz
        dmin = jnp.minimum(dist_ref[:], d)
        dist_ref[:] = dmin
        masked = jnp.where(msk, dmin, -big)
        mx = jnp.max(masked)
        nxt = jnp.min(jnp.where(masked == mx, flat, int_max))
        out_ref[b, i] = nxt
        return nxt

    jax.lax.fori_loop(1, n_samples, body, start_ref[0])


def _fps_batched(points: jnp.ndarray, mask: jnp.ndarray, n_samples: int,
                 start_index: int) -> jnp.ndarray:
    """(B, N, 3) + (B, N) -> (B, n_samples) int32.

    The auto-batched (vmapped) form of the single-example call is illegal
    on TPU — a 1D SMEM output cannot carry a squeezed batch block — so
    batching is explicit: one grid step per example, same VMEM-resident
    distance-cache body (this is also what CrowdNet's lifted vmap lowers
    to via the custom_vmap rule on ``fps``)."""
    bsz, n, _ = points.shape
    lanes = 128
    rows = _round_up(_round_up(n, lanes) // lanes, 8)
    npad = rows * lanes
    pts = points.astype(jnp.float32)
    planes = [
        jnp.pad(pts[..., d], ((0, 0), (0, npad - n))
                ).reshape(bsz, rows, lanes)
        for d in range(3)]
    mask_f = jnp.pad(mask.astype(jnp.float32),
                     ((0, 0), (0, npad - n))).reshape(bsz, rows, lanes)
    start = jnp.asarray([start_index], jnp.int32)
    vspec = pl.BlockSpec((None, rows, lanes), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _fps_grid_kernel,
        grid=(bsz,),
        out_shape=jax.ShapeDtypeStruct((bsz, n_samples), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            vspec, vspec, vspec, vspec,
        ],
        out_specs=pl.BlockSpec((bsz, n_samples), lambda b: (0, 0),
                               memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.VMEM((rows, lanes), jnp.float32)],
        interpret=_interpret(),
    )(start, *planes, mask_f)


def fps(points: jnp.ndarray, mask: jnp.ndarray, n_samples: int,
        start_index: int = 0) -> jnp.ndarray:
    """Farthest-point sampling: (N, 3) + mask -> (n_samples,) int32.

    Replaces the sequential KD-tree-free outer loop the reference never
    had (its whole analytics stack is CPU sklearn); the distance cache and
    the per-step argmax stay VMEM-resident across all ``n_samples`` steps.

    Also accepts explicitly batched input ((B, N, 3) + (B, N) ->
    (B, n_samples)), and carries a custom_vmap rule so ``jax.vmap`` /
    flax lifted vmap route to the batched grid kernel instead of the
    (TPU-illegal) auto-batched lowering.
    """
    if points.ndim == 3:
        return _fps_batched(points, mask, n_samples, start_index)

    @jax.custom_batching.custom_vmap
    def _call(p, m):
        return _fps_single(p, m, n_samples, start_index)

    @_call.def_vmap
    def _rule(axis_size, in_batched, p, m):  # noqa: ANN001
        if not in_batched[0]:
            p = jnp.broadcast_to(p[None], (axis_size,) + p.shape)
        if not in_batched[1]:
            m = jnp.broadcast_to(m[None], (axis_size,) + m.shape)
        return _fps_batched(p, m, n_samples, start_index), True

    return _call(points, mask)
