"""Permutation primitives for the column-grid build.

XLA's TPU scatter/gather run at ~18-20M elem/s (measured: ~50 ms per
1M-element scatter, ~25 ms per 1M gather) because every element round-
trips HBM, while its sort runs a 1M int32 key/payload pair in ~12 ms.
For PERMUTATION index maps — the column-grid build's point<->slot maps
are exactly that — the permutation can therefore ride sorts instead:
these two functions are used by ops/bucket_density and by
ops/ccl.build_planes (the >= 2^24-point scatter fallback; the default
stream build in ops/pallas/fill.py needs neither).

(An earlier revision also carried serial VMEM gather/scatter kernels and
a merge-style ``sorted_fill`` table writer; Mosaic cannot prove
alignment for dynamic scalar VMEM indexing, so they never ran on real
TPU and were removed — the table build is one fused XLA width-4 scatter,
see ccl.build_planes.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def permutation_scatter(perm: jnp.ndarray, val: jnp.ndarray
                        ) -> jnp.ndarray:
    """out[perm[k]] = val[k] for a PERMUTATION ``perm`` — via one sort.

    Sorting (perm, val) by perm leaves val in exactly out-order.
    Pure jnp, works on every backend.
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
