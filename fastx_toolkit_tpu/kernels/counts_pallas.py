"""Per-read base-composition counts on the 2-bit packed upload.

Serves fastx_artifacts_filter (max single-letter count,
/root/reference/src/fastx_artifacts_filter/fastx_artifacts_filter.c:56-112)
and the contains-N gates (fastq_to_fasta.c:81-82, fastx_clipper.cpp:311-314)
inside the packed decisions pipeline: operands are the same
[words, B] uint32 views the packed DP kernel reads
(kernels/align_pallas.py::align_batch_pallas_packed), lengths are
whatever the caller considers current (post-clip for the pipeline), and
the outputs are two [B] int32 vectors — the largest single-ACGT count
and the effective-N count within the length.  A masked position (its nm
bit set) counts as N, not as its underlying letter, exactly like the
unpacked chain where the masker rewrites the byte before the downstream
tools see it.

All compute is [tile_b]-row vector work (~10 ops per column), negligible
next to the DP planes; the kernel exists to avoid materializing any
unpacked [B, L] representation at all.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(tile_b: int, has_nm: bool):
    def kernel(*refs):
        if has_nm:
            (maxlen_ref, bases_ref, nmw_ref, lengths_ref,
             worst_ref, ncnt_ref, acc) = refs
        else:
            (maxlen_ref, bases_ref, lengths_ref,
             worst_ref, ncnt_ref, acc) = refs
            nmw_ref = None
        xg = pl.program_id(1)
        tile_maxlen = maxlen_ref[pl.program_id(0)]
        lengths = lengths_ref[:]

        @pl.when(xg == 0)
        def _init():
            acc[:] = jnp.zeros((8, tile_b), jnp.int32)

        @pl.when(xg * 32 < tile_maxlen)
        def _cols():
            cnt = [acc[c, :] for c in range(5)]
            if has_nm:
                wn = nmw_ref[xg, :].astype(jnp.int32)
            for j in range(32):
                x = xg * 32 + j
                valid = x < lengths
                wb = bases_ref[2 * xg + j // 16, :].astype(jnp.int32)
                shift = 8 * ((j // 4) % 4) + (6 - 2 * (j % 4))
                code = (wb >> shift) & 3
                if has_nm:
                    nshift = 8 * ((j // 8) % 4) + (7 - (j % 8))
                    is_n = ((wn >> nshift) & 1) == 1
                    letter_ok = valid & ~is_n
                    cnt[4] = cnt[4] + (valid & is_n).astype(jnp.int32)
                else:
                    letter_ok = valid
                for c in range(4):
                    cnt[c] = cnt[c] + (letter_ok & (code == c)).astype(jnp.int32)
            for c in range(5):
                acc[c, :] = cnt[c]

        @pl.when(xg == pl.num_programs(1) - 1)
        def _finish():
            worst = jnp.maximum(
                jnp.maximum(acc[0, :], acc[1, :]),
                jnp.maximum(acc[2, :], acc[3, :]),
            )
            worst_ref[:] = worst
            ncnt_ref[:] = acc[4, :]

    return kernel


@functools.partial(jax.jit, static_argnames=("tile_b", "interpret"))
def packed_counts_pallas(b2w, nmw, lengths, tile_b: int = 2048,
                         interpret: bool = False):
    """(worst_acgt_count, n_count) per read, counted over positions
    < lengths on the packed word views (see module docstring)."""
    W16, B = b2w.shape
    if B % tile_b != 0 or (not interpret and tile_b % 1024 != 0):
        raise ValueError("bad tile_b %d for B %d" % (tile_b, B))
    L_pad = W16 * 16
    if L_pad % 32 != 0:
        raise ValueError("b2w rows must cover whole 32-column steps")
    has_nm = nmw is not None
    lengths = lengths.astype(jnp.int32)
    tile_max = jnp.max(lengths.reshape(B // tile_b, tile_b), axis=1)

    grid = (B // tile_b, L_pad // 32)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((W16, tile_b), lambda i, x: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    operands = [tile_max, b2w]
    if has_nm:
        in_specs.append(
            pl.BlockSpec((W16 // 2, tile_b), lambda i, x: (0, i),
                         memory_space=pltpu.VMEM)
        )
        operands.append(nmw)
    in_specs.append(
        pl.BlockSpec((tile_b,), lambda i, x: (i,), memory_space=pltpu.VMEM)
    )
    operands.append(lengths)

    worst, ncnt = pl.pallas_call(
        _make_kernel(tile_b, has_nm),
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((tile_b,), lambda i, x: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b,), lambda i, x: (i,), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B,), jnp.int32),
            jax.ShapeDtypeStruct((B,), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((8, tile_b), jnp.int32)],
        interpret=interpret,
    )(*operands)
    return worst, ncnt
