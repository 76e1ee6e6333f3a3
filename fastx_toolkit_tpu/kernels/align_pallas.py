"""Pallas TPU kernel for the half-local adapter alignment DP.

Same contract as align.align_batch (see its docstring for the algorithm
and the tie-break derivation), but the whole DP runs on-chip: the grid is
(batch_tiles, L) — TPU grid steps execute sequentially, so the per-column
state (score + two bit-packed path-statistic planes, [H_pad, TILE_B]
int32) lives in VMEM scratch across all L column steps of a tile.  HBM
traffic is just the input bases column blocks (pipelined by Pallas) and
eight [TILE_B] output vectors; the XLA scan version round-trips its
carry through HBM every step, ~25x more traffic than the whole input.

Layout: bases are pre-transposed to [L, B] int32 so each grid step's
block is one [1, TILE_B] lane row; the batch rides the 128-wide lane
axis, the adapter dimension rides sublanes.  The in-column up-chain max
is a Hillis-Steele scan (log2(H_pad) shift+combine rounds) over three
planes: a key = 2*(gap-adjusted score) + winner-was-upper-left —
ordering exactly like the (score, UL) pair, reproducing the C's
UL > UP > LEFT tie priority (sequence_alignment.cpp:394-407) — plus two
packed payload planes carrying matches/mismatches/neutral/target_start
and query_start/gaps (pure selects in the scan, so packing them is
free; it cuts the kernel's vector-op count nearly in half vs one plane
per statistic).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .align import GAP, MATCH, MISMATCH, NEUTRAL, _N

NEG = -1000000

# rows of the best-state scratch
_BEST, _BP1, _BP2, _BX, _BY = range(5)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _h_pad(H: int) -> int:
    return max(8, _round_up(H, 8))


def pallas_bounds_ok(L: int, H: int) -> bool:
    """True iff the packed path-statistic field bounds hold for a read
    length L and adapter length H: matches/mismatches/neutral/target_start
    each fit 8 bits (H <= 255) and the biased gap field fits 15 bits
    (L + H + H_pad < 2^15).  Callers (ops/clipper._align_dispatch) fall
    back to the XLA engine otherwise; both bounds hold for the
    reference's limits (adapter <= 100, reads <= 25000:
    /root/reference/src/fastx_clipper/fastx_clipper.cpp:40,
    /root/reference/src/libfastx/fastx.h:33-35)."""
    return H <= 255 and L + H + _h_pad(H) < (1 << 15)


def _make_kernel(H: int, H_pad: int, L: int, tile_b: int):
    nscan = max(1, int(np.ceil(np.log2(H_pad))))

    def kernel(bases_ref, lengths_ref, t_ref,
               m_ref, mm_ref, g_ref, nm_ref, qs_ref, qe_ref, ts_ref, te_ref,
               col_scr, best_scr):
        # col_scr: [3, H_pad, tile_b] previous-column planes (sc, P1, P2)
        # with the path statistics bit-packed (they ride the scan as pure
        # select payloads, so packing four/two of them into one plane
        # nearly halves the kernel's vector-op count):
        #   P1 = matches | mismatches<<8 | neutral<<16 | target_start<<24
        #        (each <= H <= 255: a diagonal step advances the target
        #        row, so any path makes at most H of them)
        #   P2 = query_start | gaps<<16
        #        (query_start <= L < 2^15; gaps <= L + H, checked by the
        #        caller to fit the field with the scan bias added)
        # best_scr: [8, tile_b] (5 used)
        # each grid step handles COLS_PER_STEP=8 statically-unrolled
        # columns (Mosaic requires sublane-divisible blocks)
        xg = pl.program_id(1)
        tc = t_ref[:]  # [H_pad, 1]
        t_is_n = tc == _N
        ys = jax.lax.broadcasted_iota(jnp.int32, (H_pad, 1), 0)
        ysb = jnp.broadcast_to(ys, (H_pad, tile_b))
        row_valid = ys < H
        target_border = jnp.where(ys <= 3, 0, GAP * (ys - 3)).astype(jnp.int32)
        gap_y = GAP * ys
        key_gap2 = 2 * gap_y  # [H_pad, 1]
        # scan bias keeping P2's gap field positive while the up-chain
        # invariant (gaps - y) rides it: H_pad - ys >= 1
        bias_col = (H_pad - ys) << 16  # [H_pad, 1]
        ts_init = ysb << 24  # fresh-path target_start = current row
        lengths = lengths_ref[:]

        @pl.when(xg == 0)
        def _init():
            best_scr[_BEST, :] = jnp.full((tile_b,), -10000000, jnp.int32)
            for k in (_BP1, _BP2, _BX, _BY):
                best_scr[k, :] = jnp.zeros((tile_b,), jnp.int32)

        for j in range(8):
          x = xg * 8 + j
          if True:
            qc = bases_ref[j, :][None, :]  # [1, tile_b] int32
            q_is_n = qc == _N
            one_n = q_is_n | t_is_n
            eq = qc == tc
            delta = jnp.where(
                q_is_n & t_is_n, 0,
                jnp.where(one_n, NEUTRAL, jnp.where(eq, MATCH, MISMATCH)),
            )
            incP1 = (
                (~one_n & eq).astype(jnp.int32)
                + ((~one_n & ~eq).astype(jnp.int32) << 8)
                + (one_n.astype(jnp.int32) << 16)
            )

            first_col = x == 0
            tb_full = jnp.broadcast_to(target_border, (H_pad, tile_b))
            psc = col_scr[0]
            pP1 = col_scr[1]
            pP2 = col_scr[2]

            def shift_down(a):
                return jnp.concatenate(
                    [jnp.zeros((1, tile_b), a.dtype), a[:-1]], axis=0
                )

            # upper-left candidate (fresh paths restart: stats 0, qs=x,
            # ts=current row)
            fresh_ul = first_col | (ys == 0)
            ul_sc = jnp.where(first_col, shift_down(tb_full), shift_down(psc)) + delta
            ul_P1 = jnp.where(fresh_ul, ts_init, shift_down(pP1)) + incP1
            ul_P2 = jnp.where(fresh_ul, x, shift_down(pP2))

            # left candidate (with off-diagonal ban); gaps += 1
            ban = (ys > 3) & (ys - 3 > x)
            left_sc = jnp.where(ban, NEG, jnp.where(first_col, tb_full, psc) + GAP)
            left_P1 = jnp.where(first_col, ts_init, pP1)
            left_P2 = jnp.where(first_col, x, pP2) + (1 << 16)

            # resolve UL vs LEFT (UL wins ties: the C checks UL first).
            # The winner-was-upper-left flag is folded into the key's low
            # bit: key = 2*score + ul orders exactly like (score, ul).
            lw = left_sc > ul_sc
            e_key = jnp.where(lw, left_sc * 2, ul_sc * 2 + 1)
            e_P1 = jnp.where(lw, left_P1, ul_P1)
            e_P2 = jnp.where(lw, left_P2, ul_P2)

            # y==0 border-up candidate (priority UP: beats LEFT ties only;
            # in key space: 2*GAP >= e_key  <=>  GAP > e_sc, or
            # GAP == e_sc with e_ul == 0)
            row0 = ys == 0
            up0_better = row0 & (2 * GAP >= e_key)
            e_key = jnp.where(up0_better, 2 * GAP, e_key)
            e_P1 = jnp.where(up0_better, 0, e_P1)
            e_P2 = jnp.where(up0_better, x + (1 << 16), e_P2)

            # up-chain: Hillis-Steele max-scan down the column over THREE
            # planes: the gap-adjusted key and the two packed payloads
            # (P2's gap field rides as gaps - y + H_pad, invariant under
            # the shift, positive by construction)
            akey = e_key - key_gap2
            aP2 = e_P2 + bias_col
            state = (akey, e_P1, aP2)
            for i in range(nscan):
                sh = 1 << i
                if sh >= H_pad:
                    break
                shifted = tuple(
                    jnp.concatenate(
                        [jnp.full((sh, tile_b), 2 * NEG if k == 0 else 0, s.dtype),
                         s[:-sh]], axis=0,
                    )
                    for k, s in enumerate(state)
                )
                ka, kb = shifted[0], state[0]
                ywins = (kb > ka) | ((kb == ka) & ((kb & 1) == 1))
                state = tuple(
                    jnp.where(ywins, sb, sa) for sa, sb in zip(shifted, state)
                )
            ckey, cP1, cP2a = state
            cur = (ckey >> 1) + gap_y  # arithmetic shift floors: drops ul bit
            cP2 = cP2a - bias_col

            col_scr[0] = cur
            col_scr[1] = cP1
            col_scr[2] = cP2

            # column argmax (first y wins ties), rows >= H excluded
            curm = jnp.where(row_valid, cur, NEG)
            col_best = jnp.max(curm, axis=0)  # [tile_b]
            ymask = curm == col_best[None, :]
            col_by = jnp.min(jnp.where(ymask, ysb, H_pad), axis=0)
            sel = ysb == col_by[None, :]

            def pick(a):
                return jnp.sum(jnp.where(sel, a, 0), axis=0)

            improve = (x < lengths) & (col_best > best_scr[_BEST, :])

            def upd(k, new):
                best_scr[k, :] = jnp.where(improve, new, best_scr[k, :])

            upd(_BEST, col_best)
            upd(_BP1, pick(cP1))
            upd(_BP2, pick(cP2))
            upd(_BX, jnp.full((tile_b,), 1, jnp.int32) * x)
            upd(_BY, col_by)

        @pl.when(xg == pl.num_programs(1) - 1)
        def _finish():
            bp1 = best_scr[_BP1, :]
            bp2 = best_scr[_BP2, :]
            m_ref[:] = bp1 & 0xFF
            mm_ref[:] = (bp1 >> 8) & 0xFF
            nm_ref[:] = (bp1 >> 16) & 0xFF
            ts_ref[:] = (bp1 >> 24) & 0xFF
            qs_ref[:] = bp2 & 0xFFFF
            g_ref[:] = bp2 >> 16  # fields are non-negative: plain shift
            qe_ref[:] = best_scr[_BX, :]
            te_ref[:] = best_scr[_BY, :]

    return kernel


@functools.partial(jax.jit, static_argnames=("adapter", "tile_b", "interpret"))
def align_batch_pallas(bases, lengths, adapter: bytes, tile_b: int = 2048,
                       interpret: bool = False):
    """Pallas implementation of align_batch; B must be a multiple of
    tile_b (callers pad; padded rows have length 0 and are excluded from
    the argmax so their outputs are zeros).

    Field bounds for the packed path-statistic planes: adapter <= 255
    bases and L + H + H_pad < 2^15 (both hold for the reference's limits,
    adapter <= 100 / reads <= 25000; _align_dispatch falls back to the
    jnp engine otherwise)."""
    B, L = bases.shape
    H = len(adapter)
    if B % tile_b != 0:
        raise ValueError("batch %d not a multiple of tile_b %d" % (B, tile_b))
    if not pallas_bounds_ok(L, H):
        # ValueError (not assert): the bound must survive python -O — a
        # silent overflow would corrupt the packed path statistics
        raise ValueError(
            "packed path-stat field bounds exceeded (L=%d, adapter=%d); "
            "use the XLA engine (align_batch)" % (L, H)
        )
    H_pad = _h_pad(H)
    L_pad = _round_up(L, 8)
    basesT = bases.astype(jnp.int32).T  # [L, B] int32
    if L_pad != L:
        basesT = jnp.concatenate(
            [basesT, jnp.zeros((L_pad - L, B), jnp.int32)], axis=0
        )
    t_pad = np.zeros((H_pad, 1), np.int32)
    t_pad[:H, 0] = np.frombuffer(adapter, np.uint8)
    t_arr = jnp.asarray(t_pad)

    grid = (B // tile_b, L_pad // 8)
    out_shape = tuple(jax.ShapeDtypeStruct((B,), jnp.int32) for _ in range(8))
    kernel = _make_kernel(H, H_pad, L, tile_b)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, tile_b), lambda i, x: (x, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b,), lambda i, x: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((H_pad, 1), lambda i, x: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((tile_b,), lambda i, x: (i,), memory_space=pltpu.VMEM)
            for _ in range(8)
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((3, H_pad, tile_b), jnp.int32),
            pltpu.VMEM((8, tile_b), jnp.int32),
        ],
        interpret=interpret,
    )(basesT, lengths, t_arr)
    names = ("matches", "mismatches", "gaps", "neutral",
             "query_start", "query_end", "target_start", "target_end")
    return dict(zip(names, outs))
