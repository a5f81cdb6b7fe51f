"""Pallas TPU kernel for gathered-ADC distance lookup.

Problem: PQ-guided traversal needs `out[b, c] = sum_j T[b, j, code[b,c,j]]`
for per-query tables T [B, m, 256] and gathered candidate codes
[B, C, m]. XLA lowers the lookup to per-element gathers, which are slow
on TPU; materializing one-hots in HBM would cost B*C*m*256 bytes of
bandwidth. This kernel keeps the tables in VMEM and turns the lookup into
a broadcast-compare + multiply + lane reduction (pure VPU work on VMEM
data), processing candidate tiles per grid step.

Falls back transparently to the XLA gather implementation when Pallas is
unavailable (e.g., CPU tests run the `interpret` path instead).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl

try:  # TPU-only module; absent on CPU builds
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None


def _adc_kernel(tables_ref, codes_ref, out_ref):
    """Grid cell: one query block x one candidate tile.

    tables_ref: [BQ, m, 256] f32 (VMEM)
    codes_ref:  [BQ, m, CT] int32 (VMEM, m-major so the subspace loop
                slices the middle dim — lane-dim dynamic slices are not
                lowerable)
    out_ref:    [BQ, CT] f32

    The subspace loop is a fori_loop (not unrolled): unrolling keeps all
    m one-hot temporaries live simultaneously and blows the VMEM stack.
    Ref-level pl.ds slicing is used because Mosaic cannot lower
    dynamic_slice on values.
    """
    bq, m, k = tables_ref.shape
    ct = codes_ref.shape[2]
    lane = jax.lax.broadcasted_iota(jnp.int32, (bq, ct, k), 2)

    def body(j, acc):
        cj = codes_ref[:, pl.ds(j, 1), :][:, 0, :]   # [BQ, CT]
        tj = tables_ref[:, pl.ds(j, 1), :][:, 0, :]  # [BQ, K]
        onehot = (cj[:, :, None] == lane).astype(jnp.float32)
        return acc + jnp.sum(onehot * tj[:, None, :], axis=2)

    out_ref[...] = jax.lax.fori_loop(
        0, m, body, jnp.zeros((bq, ct), jnp.float32)
    )


@functools.partial(jax.jit, static_argnames=("interpret", "query_block", "cand_tile"))
def adc_lookup_gathered_pallas(
    tables: jax.Array,
    codes: jax.Array,
    *,
    interpret: bool = False,
    query_block: int = 8,
    cand_tile: int = 128,
) -> jax.Array:
    """tables [B, m, 256] f32, codes [B, C, m] uint8/int -> [B, C] f32."""
    b, m, k = tables.shape
    c = codes.shape[1]
    codes = jnp.transpose(codes.astype(jnp.int32), (0, 2, 1))  # [B, m, C]

    bq = min(query_block, b)
    ct = min(cand_tile, c)
    pad_b = (-b) % bq
    pad_c = (-c) % ct
    if pad_b or pad_c:
        tables = jnp.pad(tables, ((0, pad_b), (0, 0), (0, 0)))
        codes = jnp.pad(codes, ((0, pad_b), (0, 0), (0, pad_c)))
    gb = (b + pad_b) // bq
    gc = (c + pad_c) // ct

    out = pl.pallas_call(
        _adc_kernel,
        grid=(gb, gc),
        in_specs=[
            pl.BlockSpec((bq, m, k), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((bq, m, ct), lambda i, j: (i, 0, j)),
        ],
        out_specs=pl.BlockSpec((bq, ct), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((b + pad_b, c + pad_c), jnp.float32),
        interpret=interpret,
    )(tables, codes)
    return out[:b, :c]
