"""Pallas TPU kernel for the quality-stats histogram.

XLA lowers the [B*L]-index scatter-add of ops.stats.accumulate to a
serialized scatter (~50x the cost of the rest of the fused pipeline).
Here the tally is a FACTORED one-hot matmul on the MXU.  Each base's
flat bin id (nuc*109 + qbin, 654 = 6 slots x 109 quality bins) is split
``id = hi*128 + lo``; per position the kernel builds a tiny
``[8, TILE_B]`` hi one-hot (only rows 0-5 can fire) and a
``[TILE_B, 128]`` lo one-hot, and their product
``hi_onehot @ lo_onehot -> [8, 128]`` IS the position's histogram: each
batch column contributes exactly one (hi, lo) outer-product entry.  The
VPU constructs 8 sublane-rows + 128 lanes of compares per element
instead of a 654-wide one-hot row (which costs its full padded width in
vector issues), ~5x fewer vector ops; the combine rides the MXU.
Grid = (L_pad/POS_BLK, B/TILE_B) with the [POS_BLK*8, 128] accumulator
in VMEM scratch across the B tiles; POS_BLK is the whole (8-rounded)
read length when it fits 128 lanes — the overwhelmingly common case —
else 128-position blocks (lane-dim blocks must be 128-divisible).

The flat ids arrive in BOTH layouts — position-major ``[L_pad, B]`` for
the hi side (batch on lanes) and batch-major ``[B, L_pad]`` for the lo
side (batch on sublanes) — so neither one-hot needs an in-kernel
transpose; the duplicate HBM read is ~8 B/base, far below the VPU cost
it removes.  The invalid-lane sentinel ``F = 654`` lands at
(hi 5, lo 14), one past the last valid id 653, so it falls off the
``[:654]`` slice without any masking.

For FASTQ the per-(position, nuc, qval) histogram determines every
other statistic exactly — get_reads_count is always 1 for FASTQ
(fastx.c:479-481) so count = sum(hist), qsum = sum(v*hist), min/max =
histogram support.  The host derives them (ops.stats.derive_from_hist).
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
NHI = 8    # hi = id >> 7 in 0..5 (and 5 for the sentinel); rows 6-7 dead
NLO = 128  # lo = id & 127


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _make_kernel(pos_blk: int, tile_b: int, n_btiles: int):
    def kernel(hi_ref, lo_ref, out_ref, acc):
        # hi_ref: [pos_blk, tile_b] int16/int32 flat ids, position-major
        #         (batch on lanes)
        # lo_ref: [tile_b, pos_blk] int16/int32 flat ids, batch-major
        #         (batch on sublanes)
        # out_ref: [pos_blk*8, 128] int32 — per position (8 hi rows, 128 lo)
        # acc:     same shape, int32, accumulated across the B tiles
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _init():
            acc[:] = jnp.zeros((pos_blk * NHI, NLO), jnp.int32)

        hi_iota = jax.lax.broadcasted_iota(jnp.int32, (NHI, tile_b), 0)
        lo_iota = jax.lax.broadcasted_iota(jnp.int32, (tile_b, NLO), 1)
        for p in range(pos_blk):
            hi = hi_ref[p : p + 1, :].astype(jnp.int32) >> 7  # [1, tile_b]
            # int8 one-hots: 0/1 are exact, the v5e MXU runs int8 at 2x
            # the bf16 rate, and the [tile_b, NLO] construction — the
            # kernel's dominant VPU cost — moves a quarter of the f32
            # bytes (bf16 one-hots were measured perf-neutral; int8 is
            # the variant that moved the kernel)
            oh = (hi_iota == hi).astype(jnp.int8)  # [NHI, tile_b]
            lo = lo_ref[:, p : p + 1].astype(jnp.int32) & 127  # [tile_b, 1]
            ol = (lo_iota == lo).astype(jnp.int8)  # [tile_b, NLO]
            part = jnp.dot(oh, ol, preferred_element_type=jnp.int32)
            acc[p * NHI : (p + 1) * NHI, :] += part

        @pl.when(t == n_btiles - 1)
        def _finish():
            out_ref[:] = acc[:]

    return kernel


def _hist_from_flat(flat, L: int, L_pad: int, pos_blk: int, tile_b: int,
                    interpret: bool):
    """Shared tail: flat ids [B, L_pad] (sentinel-padded) -> histogram."""
    B = flat.shape[0]
    flatT = flat.T  # [L_pad, B]
    n_btiles = B // tile_b
    kernel = _make_kernel(pos_blk, tile_b, n_btiles)
    out = pl.pallas_call(
        kernel,
        grid=(L_pad // pos_blk, n_btiles),
        in_specs=[
            pl.BlockSpec((pos_blk, tile_b), lambda i, t: (i, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, pos_blk), lambda i, t: (t, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((pos_blk * NHI, NLO), lambda i, t: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L_pad * NHI, NLO), jnp.int32),
        scratch_shapes=[pltpu.VMEM((pos_blk * NHI, NLO), jnp.int32)],
        interpret=interpret,
    )(flatT, flat)
    return out.reshape(L_pad, NHI * NLO)[:L, :F].reshape(L, NSLOTS, NBINS)


def _pos_geometry(L: int):
    """(L_pad, pos_blk): the whole read as one position block when it
    fits the 128-lane block constraint, else 128-position blocks (tail
    positions padded with the sentinel — they tally into the sliced-off
    bin 654)."""
    L_pad = _round_up(max(L, 1), 8)
    pos_blk = L_pad if L_pad <= 128 else 128
    return _round_up(L_pad, pos_blk), pos_blk


def _pad_flat(flat, L: int, L_pad: int):
    B = flat.shape[0]
    if L_pad != L:
        flat = jnp.concatenate(
            [flat, jnp.full((B, L_pad - L), F, flat.dtype)], axis=1
        )
    return flat


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
    L_pad, pos_blk = _pos_geometry(L)

    # slot via compares, not a 256-LUT gather (XLA gathers serialize on
    # TPU and dominated this kernel's runtime); the build runs in int16
    # (bins < 655 fit) so the materialized flat ids and their transpose
    # move half the int32 bytes
    b = bases
    nuc = jnp.zeros(b.shape, jnp.int16)
    for i, pair in enumerate((b"Aa", b"Cc", b"Gg", b"Tt", b"Nn")):
        hit = (b == pair[0]) | (b == pair[1])
        nuc = jnp.where(hit, jnp.int16(i + 1), nuc)
    qbin = jnp.clip(quals.astype(jnp.int16) - MIN_Q, 0, NBINS - 1)
    valid = jnp.arange(L, dtype=jnp.int32)[None, :] < lengths[:, None]
    flat = jnp.where(valid, nuc * jnp.int16(NBINS) + qbin, jnp.int16(F))
    flat = _pad_flat(flat, L, L_pad)
    return _hist_from_flat(flat, L, L_pad, pos_blk, tile_b, interpret)


@functools.partial(jax.jit, static_argnames=("tile_b", "interpret"))
def stats_hist_pallas_b2(b2, quals, lengths, tile_b: int = 512,
                         interpret: bool = False):
    """stats_hist_pallas on the 2-bit packed upload directly (pure-ACGT
    batches, pack_batch2 byte layout: 4 codes/byte MSB-first).  The flat
    bin id is (code+1)*109 + qbin straight from the packed bytes — no
    ASCII round-trip and no 10-compare classify, which together were
    ~15% of the device step's XLA prep."""
    B, L = quals.shape
    assert B % tile_b == 0, (B, tile_b)
    L_pad, pos_blk = _pos_geometry(L)
    # the whole id build runs in int16 (bins < 655 fit): the materialized
    # flat array and its [B, L] -> [L, B] transpose — the only HBM-heavy
    # prep legs — move half the bytes of the int32 build, and the kernel
    # widens the ids per row/column read
    codes = jnp.stack(
        [(b2 >> 6) & 3, (b2 >> 4) & 3, (b2 >> 2) & 3, b2 & 3], axis=2
    ).reshape(B, -1)[:, :L].astype(jnp.int16)
    qbin = jnp.clip(quals.astype(jnp.int16) - MIN_Q, 0, NBINS - 1)
    valid = jnp.arange(L, dtype=jnp.int32)[None, :] < lengths[:, None]
    flat = jnp.where(valid, (codes + 1) * jnp.int16(NBINS) + qbin,
                     jnp.int16(F))
    flat = _pad_flat(flat, L, L_pad)
    return _hist_from_flat(flat, L, L_pad, pos_blk, tile_b, interpret)
