"""Pallas TPU kernel for the quality-stats histogram.

XLA lowers the [B*L]-index scatter-add of ops.stats.accumulate to a
serialized scatter (~50x the cost of the rest of the fused pipeline).
Here the tally is a one-hot MATMUL on the MXU: for an 8-position block,
each lane's flat bin index (local_pos*654 + nuc*109 + qbin, 654 = 6 slots
x 109 quality bins) is compared against a bin iota to form a one-hot
matrix, and ones[1, TILE_B] @ onehot[TILE_B, 5232] accumulates all eight
positions' histograms in one product.  Grid = (L/8, B/TILE_B) with the
accumulator in VMEM scratch across the B tiles.

For FASTQ the per-(position, nuc, qval) histogram determines every other
statistic exactly — get_reads_count is always 1 for FASTQ (fastx.c:479-481)
so count = sum(hist), qsum = sum(v*hist), min/max = histogram support.
The host derives them (ops.stats.derive_from_hist).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.records import BaseCode
from ..ops.stats import MIN_Q, NBINS, NSLOTS

F = NSLOTS * NBINS  # 654 bins per position
POS_PER_STEP = 8
FP = POS_PER_STEP * F  # 5232


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _make_kernel(tile_b: int, n_btiles: int):
    def kernel(flat_ref, out_ref, acc):
        # flat_ref: [8, tile_b] int32 flat bin ids (FP = invalid/padded)
        # out_ref:  [8, F] int32 block of the [L_pad, F] output
        # acc:      [8, F] f32 scratch accumulated over B tiles
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _init():
            acc[:] = jnp.zeros((POS_PER_STEP, F), jnp.float32)

        bins = jax.lax.broadcasted_iota(jnp.int32, (tile_b, F), 1)
        flat = flat_ref[:]  # [8, tile_b]
        ones = jnp.ones((1, tile_b), jnp.float32)
        for p in range(POS_PER_STEP):
            onehot = (bins == flat[p, :][:, None]).astype(jnp.float32)
            part = jnp.dot(ones, onehot, preferred_element_type=jnp.float32)
            acc[p : p + 1, :] = acc[p : p + 1, :] + part

        @pl.when(t == n_btiles - 1)
        def _finish():
            out_ref[:] = acc[:].astype(jnp.int32)

    return kernel


@functools.partial(jax.jit, static_argnames=("tile_b", "interpret"))
def stats_hist_pallas(bases, quals, lengths, tile_b: int = 512,
                      interpret: bool = False):
    """Per-(position, nuc-slot, quality) histogram with weight 1.

    bases uint8 [B, L], quals int8 [B, L], lengths int32 [B] ->
    hist int32 [L, 6, 109] where slot s counts bases whose
    STATS_INDEX == s (slot 0 = unknown bytes, see ops.stats).
    B must be a multiple of tile_b (callers pad with length-0 rows).
    """
    B, L = bases.shape
    assert B % tile_b == 0, (B, tile_b)
    L_pad = _round_up(max(L, 1), POS_PER_STEP)

    # slot via compares, not a 256-LUT gather (XLA gathers serialize on
    # TPU and dominated this kernel's runtime)
    b = bases
    nuc = jnp.zeros(b.shape, jnp.int32)
    for i, pair in enumerate((b"Aa", b"Cc", b"Gg", b"Tt", b"Nn")):
        hit = (b == pair[0]) | (b == pair[1])
        nuc = jnp.where(hit, i + 1, nuc)
    qbin = jnp.clip(quals.astype(jnp.int32) - MIN_Q, 0, NBINS - 1)
    valid = jnp.arange(L, dtype=jnp.int32)[None, :] < lengths[:, None]
    flat = jnp.where(valid, nuc * NBINS + qbin, F)  # F = no bin matches
    flatT = flat.T  # [L, B]
    if L_pad != L:
        flatT = jnp.concatenate(
            [flatT, jnp.full((L_pad - L, B), F, jnp.int32)], axis=0
        )

    n_btiles = B // tile_b
    kernel = _make_kernel(tile_b, n_btiles)
    out = pl.pallas_call(
        kernel,
        grid=(L_pad // POS_PER_STEP, n_btiles),
        in_specs=[
            pl.BlockSpec((POS_PER_STEP, tile_b), lambda i, t: (i, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((POS_PER_STEP, F), lambda i, t: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L_pad, F), jnp.int32),
        scratch_shapes=[pltpu.VMEM((POS_PER_STEP, F), jnp.float32)],
        interpret=interpret,
    )(flatT)
    return out[:L].reshape(L, NSLOTS, NBINS)
