"""Pallas TPU kernel for the half-local adapter alignment DP.

Same contract as align.align_batch (see its docstring for the algorithm
and the tie-break derivation), but the whole DP runs on-chip: the grid is
(batch_tiles, L) — TPU grid steps execute sequentially, so the per-column
state (score + six path-statistic planes, [H_pad, TILE_B] int32) lives in
VMEM scratch across all L column steps of a tile.  HBM traffic is just
the input bases column blocks (pipelined by Pallas) and eight [TILE_B]
output vectors; the XLA scan version round-trips its carry through HBM
every step, ~25x more traffic than the whole input.

Layout: bases are pre-transposed to [L, B] int32 so each grid step's
block is one [1, TILE_B] lane row; the batch rides the 128-wide lane
axis, the adapter dimension rides sublanes.  The in-column up-chain max
is a Hillis-Steele scan (log2(H_pad) shift+combine rounds) keyed by
(gap-adjusted score, winner-was-upper-left), reproducing the C's
UL > UP > LEFT tie priority (sequence_alignment.cpp:394-407).
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
_BEST, _BM, _BMM, _BG, _BNM, _BQS, _BTS, _BX, _BY = range(9)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _make_kernel(H: int, H_pad: int, L: int, tile_b: int):
    nscan = max(1, int(np.ceil(np.log2(H_pad))))

    def comb(a, b):
        # b[1] (winner-was-upper-left) is carried as int32 0/1: Mosaic
        # lacks some i1 vector ops
        ywins = (b[0] > a[0]) | ((b[0] == a[0]) & (b[1] != 0))
        return tuple(jnp.where(ywins, yb, ya) for ya, yb in zip(a, b))

    def kernel(bases_ref, lengths_ref, t_ref,
               m_ref, mm_ref, g_ref, nm_ref, qs_ref, qe_ref, ts_ref, te_ref,
               col_scr, best_scr):
        # col_scr: [7, H_pad, tile_b] previous-column planes
        #   (sc, m, mm, g, nm, qs, ts); best_scr: [16, tile_b] (9 used)
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
        lengths = lengths_ref[:]

        @pl.when(xg == 0)
        def _init():
            best_scr[_BEST, :] = jnp.full((tile_b,), -10000000, jnp.int32)
            for k in (_BM, _BMM, _BG, _BNM, _BQS, _BTS, _BX, _BY):
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
            inc_m = (~one_n & eq).astype(jnp.int32)
            inc_mm = (~one_n & ~eq).astype(jnp.int32)
            inc_nm = one_n.astype(jnp.int32)

            first_col = x == 0
            tb_full = jnp.broadcast_to(target_border, (H_pad, tile_b))
            psc = col_scr[0]
            pm = col_scr[1]
            pmm = col_scr[2]
            pg = col_scr[3]
            pnm = col_scr[4]
            pqs = col_scr[5]
            pts = col_scr[6]

            def shift_down(a):
                return jnp.concatenate(
                    [jnp.zeros((1, tile_b), a.dtype), a[:-1]], axis=0
                )

            # upper-left candidate
            ul_src = jnp.where(first_col, shift_down(tb_full), shift_down(psc))
            fresh_ul = first_col | (ys == 0)
            ul_sc = ul_src + delta
            ul_m = jnp.where(fresh_ul, 0, shift_down(pm)) + inc_m
            ul_mm = jnp.where(fresh_ul, 0, shift_down(pmm)) + inc_mm
            ul_nm = jnp.where(fresh_ul, 0, shift_down(pnm)) + inc_nm
            ul_g = jnp.where(fresh_ul, 0, shift_down(pg))
            ul_qs = jnp.where(fresh_ul, x, shift_down(pqs))
            ul_ts = jnp.where(fresh_ul, ysb, shift_down(pts))

            # left candidate (with off-diagonal ban)
            ban = (ys > 3) & (ys - 3 > x)
            left_sc = jnp.where(ban, NEG, jnp.where(first_col, tb_full, psc) + GAP)
            left_g = jnp.where(first_col, 1, pg + 1)
            left_m = jnp.where(first_col, 0, pm)
            left_mm = jnp.where(first_col, 0, pmm)
            left_nm = jnp.where(first_col, 0, pnm)
            left_qs = jnp.where(first_col, x, pqs)
            left_ts = jnp.where(first_col, ysb, pts)

            # resolve UL vs LEFT (UL wins ties: the C checks UL first)
            lw = left_sc > ul_sc
            e_sc = jnp.where(lw, left_sc, ul_sc)
            e_ul = jnp.where(lw, 0, 1)
            e_m = jnp.where(lw, left_m, ul_m)
            e_mm = jnp.where(lw, left_mm, ul_mm)
            e_g = jnp.where(lw, left_g, ul_g)
            e_nm = jnp.where(lw, left_nm, ul_nm)
            e_qs = jnp.where(lw, left_qs, ul_qs)
            e_ts = jnp.where(lw, left_ts, ul_ts)

            # y==0 border-up candidate (priority UP: beats LEFT ties only)
            row0 = ys == 0
            up0_better = row0 & ((GAP > e_sc) | ((GAP == e_sc) & (e_ul == 0)))
            e_sc = jnp.where(up0_better, GAP, e_sc)
            e_ul = jnp.where(up0_better, 0, e_ul)
            e_m = jnp.where(up0_better, 0, e_m)
            e_mm = jnp.where(up0_better, 0, e_mm)
            e_g = jnp.where(up0_better, 1, e_g)
            e_nm = jnp.where(up0_better, 0, e_nm)
            e_qs = jnp.where(up0_better, x, e_qs)
            e_ts = jnp.where(up0_better, 0, e_ts)

            # up-chain: Hillis-Steele max-scan down the column
            adj = e_sc - gap_y
            g_adj = e_g - ys
            state = (adj, e_ul, e_m, e_mm, g_adj, e_nm, e_qs, e_ts)
            for i in range(nscan):
                sh = 1 << i
                if sh >= H_pad:
                    break
                shifted = tuple(
                    jnp.concatenate(
                        [jnp.full((sh, tile_b), NEG if k == 0 else 0, s.dtype),
                         s[:-sh]], axis=0,
                    )
                    for k, s in enumerate(state)
                )
                state = comb(shifted, state)
            c_adj, _, c_m, c_mm, c_gadj, c_nm, c_qs, c_ts = state
            cur = c_adj + gap_y
            c_g = c_gadj + ys

            col_scr[0] = cur
            col_scr[1] = c_m
            col_scr[2] = c_mm
            col_scr[3] = c_g
            col_scr[4] = c_nm
            col_scr[5] = c_qs
            col_scr[6] = c_ts

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
            upd(_BM, pick(c_m))
            upd(_BMM, pick(c_mm))
            upd(_BG, pick(c_g))
            upd(_BNM, pick(c_nm))
            upd(_BQS, pick(c_qs))
            upd(_BTS, pick(c_ts))
            upd(_BX, jnp.full((tile_b,), 1, jnp.int32) * x)
            upd(_BY, col_by)

        @pl.when(xg == pl.num_programs(1) - 1)
        def _finish():
            m_ref[:] = best_scr[_BM, :]
            mm_ref[:] = best_scr[_BMM, :]
            g_ref[:] = best_scr[_BG, :]
            nm_ref[:] = best_scr[_BNM, :]
            qs_ref[:] = best_scr[_BQS, :]
            qe_ref[:] = best_scr[_BX, :]
            ts_ref[:] = best_scr[_BTS, :]
            te_ref[:] = best_scr[_BY, :]

    return kernel


@functools.partial(jax.jit, static_argnames=("adapter", "tile_b", "interpret"))
def align_batch_pallas(bases, lengths, adapter: bytes, tile_b: int = 2048,
                       interpret: bool = False):
    """Pallas implementation of align_batch; B must be a multiple of
    tile_b (callers pad; padded rows have length 0 and are excluded from
    the argmax so their outputs are zeros)."""
    B, L = bases.shape
    assert B % tile_b == 0, (B, tile_b)
    H = len(adapter)
    H_pad = max(8, _round_up(H, 8))
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
            pltpu.VMEM((7, H_pad, tile_b), jnp.int32),
            pltpu.VMEM((16, tile_b), jnp.int32),
        ],
        interpret=interpret,
    )(basesT, lengths, t_arr)
    names = ("matches", "mismatches", "gaps", "neutral",
             "query_start", "query_end", "target_start", "target_end")
    return dict(zip(names, outs))
