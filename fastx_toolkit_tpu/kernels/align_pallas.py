"""Pallas TPU kernel for the half-local adapter alignment DP.

Same contract as align.align_batch (see its docstring for the algorithm
and the tie-break derivation), but the whole DP runs on-chip: the grid is
(batch_tiles, L/8) — TPU grid steps execute sequentially, so the
per-column state (score + two bit-packed path-statistic planes,
[H_pad, TILE_B] int32) lives in VMEM scratch across all column steps of
a tile.  HBM traffic is just the input bases column blocks (pipelined by
Pallas) and eight [TILE_B] output vectors; the XLA scan version
round-trips its carry through HBM every step, ~25x more traffic than the
whole input.

Layout: bases are pre-transposed to [L, B] int32 so each grid step's
block is one [8, TILE_B] lane row; the batch rides the 128-wide lane
axis, the adapter dimension rides sublanes.  The in-column up-chain max
is a Hillis-Steele scan (log2(H_pad) shift+combine rounds) over three
planes: a key = 2*(gap-adjusted score) + winner-was-upper-left —
ordering exactly like the (score, UL) pair, reproducing the C's
UL > UP > LEFT tie priority (sequence_alignment.cpp:394-407) — plus two
packed payload planes carrying matches/mismatches/neutral/target_start
and query_start/gaps (pure selects in the scan, so packing them is
free; it cuts the kernel's vector-op count nearly in half vs one plane
per statistic).

Round-4 restructuring (VERDICT r3 item #1 — drive the kernel toward its
VPU roofline):

* **Uniform columns.**  The first-column special case is gone: the
  column-state scratch is initialized to a virtual column -1 holding the
  target border scores (reset_matrix, sequence_alignment.cpp:340-363)
  and border path stats, so every real column runs the same code.  (The
  LEFT candidate sourced from the border column can never win — it is
  strictly below the UL candidate from the same border for every row —
  so only the UL/diagonal view of the init state matters; the init
  encodes exactly that.)
* **Per-row running best.**  Instead of an argmax + payload pick per
  column (~20 vector ops), each row tracks its own first-strict-best
  (score, P1, P2, x) with one compare + four selects; a single
  lexicographic reduce at the last grid step recovers the C's
  first-(x, then y)-wins global max (populate_matrix tracks the max
  during the fill, sequence_alignment.cpp:419-426).
* **Column skipping.**  A per-tile max-length scalar gates the whole
  column body, so a tile of short reads stops issuing vector work at its
  own width instead of the batch-wide padded width.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .align import GAP, MATCH, MISMATCH, NEUTRAL, _N

NEG = -1000000
NEG_BEST = -10000000

# planes of the per-row best-state scratch
_BSC, _BP1, _BP2, _BX = range(4)


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


def tile_for(H: int) -> int | None:
    """Batch-tile width for an adapter, or None when the kernel would
    not fit VMEM and the caller must use the XLA engine.

    The kernel's VMEM footprint is dominated by the 7 [H_pad, tile_b]
    int32 scratch planes plus Mosaic stack temporaries of the same shape
    (measured ~2x the scratch on v5e); tiles below 1024 are off the menu
    because the rank-1 lengths/output operands carry an XLA layout tile
    of 1024 elements that Mosaic block shapes must be a multiple of."""
    H_pad = _h_pad(H)
    if H_pad <= 80:
        return 2048
    if H_pad <= 160:
        return 1024
    return None


def packed_tile_for(H: int, tie_flag: bool = False) -> int | None:
    """Batch-tile for the packed kernel, or None -> use the unpacked
    kernel.  Mosaic keeps ~28-40 live [H_pad, tile] stack planes for the
    unrolled body (more with the tie-flag compares), so H_pad*tile is
    budgeted to ~72K elements (measured: 104x1024 with flags = 20.2 MB,
    over the 16 MB limit; 104x1024 without = fits).

    The small-H (P12-kernel) tile is measured per variant on v5e: the
    flag-off body runs 11% faster at tile 1024 (16.45M vs 14.78M r/s —
    fewer live planes spill less), while the flag-on body's extra
    tie-compare temporaries prefer 2048 (11.3M vs 10.8M)."""
    H_pad = _h_pad(H)
    if H_pad <= 32:
        default = 2048 if tie_flag else 1024
    elif H_pad <= 72:
        default = 1024
    else:
        return None  # over the VMEM budget even at tile 1024
    ov = os.environ.get("FASTX_TPU_PACKED_TILE")
    if not ov:
        return default
    # the override only retunes adapters the kernel can fit; it must not
    # resurrect the None fallback's oversized cases, pick a tile Mosaic
    # rejects (non-multiple of 1024), or blow the ~72K-element budget
    tile = int(ov)
    if tile < 1024 or tile % 1024 or H_pad * tile > 72 * 1024:
        raise ValueError(
            "FASTX_TPU_PACKED_TILE=%s invalid for H_pad=%d: need a "
            "positive multiple of 1024 with H_pad*tile <= %d" %
            (ov, H_pad, 72 * 1024))
    return tile


def scan_window(H: int, H_pad: int) -> int:
    """Up-chain scan window: 1 + the longest gap run that can matter.

    Any path achieving the matrix max M satisfies
    ``50*gaps <= 10*matches + neutral - M <= 10*H + 10`` — the positive
    contribution is at most 10*H (matches+neutrals share the <= H
    diagonal steps) and M >= -10 because cell (0,0) is always a fresh
    diagonal with delta >= MISMATCH.  So every path that ties or sets the
    max carries at most (10*H+10)//50 gap moves TOTAL, which bounds every
    in-column up-run on such a path.  Truncating the Hillis-Steele scan
    to that window only *under*-estimates cells whose true value is
    below the max (their chains are longer than any max-achieving path's
    budget), and underestimates propagate downstream as further
    underestimates — the global argmax, its tie-breaks, and the winning
    path statistics are all exact.  For the reference's default adapters
    this cuts the scan from log2(H_pad) rounds to 1-3."""
    max_gaps = (10 * H + 10) // (-GAP)
    return min(H_pad, max_gaps + 1)


def _make_kernel(H: int, H_pad: int, L: int, tile_b: int,
                 tie_flag: bool = False):
    window = scan_window(H, H_pad)
    nscan = max(1, int(np.ceil(np.log2(window))))

    def kernel(maxlen_ref, bases_ref, lengths_ref, t_ref, *rest):
        if tie_flag:
            (m_ref, mm_ref, g_ref, nm_ref, qs_ref, qe_ref, ts_ref, te_ref,
             tf_ref, col_scr, best_scr) = rest
        else:
            (m_ref, mm_ref, g_ref, nm_ref, qs_ref, qe_ref, ts_ref, te_ref,
             col_scr, best_scr) = rest
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
        # best_scr: [4, H_pad, tile_b] per-row running best
        #   (score, P1, P2, x of first strict improvement)
        # each grid step handles COLS_PER_STEP=8 statically-unrolled
        # columns (Mosaic requires sublane-divisible blocks)
        xg = pl.program_id(1)
        tile_maxlen = maxlen_ref[pl.program_id(0)]
        tc = t_ref[:]  # [H_pad, 1]
        t_is_n = tc == _N
        ys = jax.lax.broadcasted_iota(jnp.int32, (H_pad, 1), 0)
        ysb = jnp.broadcast_to(ys, (H_pad, tile_b))
        row0 = ys == 0
        target_border = jnp.where(ys <= 3, 0, GAP * (ys - 3)).astype(jnp.int32)
        gap_y = GAP * ys
        key_gap2 = 2 * gap_y  # [H_pad, 1]
        # scan bias keeping P2's gap field positive while the up-chain
        # invariant (gaps - y) rides it: H_pad - ys >= 1
        bias_col = (H_pad - ys) << 16  # [H_pad, 1]
        lengths = lengths_ref[:]  # [tile_b]

        @pl.when(xg == 0)
        def _init():
            # virtual column -1: the target-border column.  Its UL view
            # (what column 0's diagonal/up moves read after shift_down)
            # must equal the border scores and fresh-path stats; its LEFT
            # view is irrelevant because a border-sourced LEFT candidate
            # strictly loses to the border-sourced UL candidate at every
            # row (see module docstring).
            col_scr[0] = jnp.broadcast_to(target_border, (H_pad, tile_b))
            # shift_down(pP1)[y] must read ts_init[y] = y<<24, so the
            # init plane holds (y+1)<<24 (row H_pad-1 is never read)
            col_scr[1] = jnp.broadcast_to((ys + 1) << 24, (H_pad, tile_b))
            col_scr[2] = jnp.zeros((H_pad, tile_b), jnp.int32)
            best_scr[_BSC] = jnp.full((H_pad, tile_b), NEG_BEST, jnp.int32)
            for k in (_BP1, _BP2, _BX):
                best_scr[k] = jnp.zeros((H_pad, tile_b), jnp.int32)

        @pl.when(xg * 8 < tile_maxlen)
        def _cols():
          # column/best state lives in values across the unrolled columns:
          # one scratch read + write per grid step instead of per column
          psc, pP1, pP2 = col_scr[0], col_scr[1], col_scr[2]
          bsc, bP1, bP2, bXx = (best_scr[_BSC], best_scr[_BP1],
                                best_scr[_BP2], best_scr[_BX])
          for j in range(8):
            x = xg * 8 + j
            qc = bases_ref[j, :][None, :]  # [1, tile_b] int32
            q_is_n = qc == _N
            one_n = q_is_n | t_is_n
            eq = qc == tc
            # exactly one of {neutral, match, mismatch} per cell; the
            # both-N cell scores 0 but still counts as a neutral
            # (match_value 'N', sequence_alignment.h:125-131)
            delta = jnp.where(
                q_is_n & t_is_n, 0,
                jnp.where(one_n, NEUTRAL, jnp.where(eq, MATCH, MISMATCH)),
            )
            incP1 = jnp.where(
                one_n, 1 << 16, jnp.where(eq, 1, 1 << 8)
            ).astype(jnp.int32)

            def shift_down(a):
                return jnp.concatenate(
                    [jnp.zeros((1, tile_b), a.dtype), a[:-1]], axis=0
                )

            # upper-left candidate; row 0's diagonal source is the query
            # border (score 0, fresh stats qs=x, ts=0) — the shift's
            # zero-fill provides the score and P1 parts for free
            ul_sc = shift_down(psc) + delta
            ul_P1 = shift_down(pP1) + incP1
            ul_P2 = jnp.where(row0, x, shift_down(pP2))

            # left candidate (with off-diagonal ban); gaps += 1
            ban = (ys > 3) & (ys - 3 > x)
            left_sc = jnp.where(ban, NEG, psc + GAP)
            left_P1 = pP1
            left_P2 = pP2 + (1 << 16)

            # resolve UL vs LEFT (UL wins ties: the C checks UL first).
            # The winner-was-upper-left flag is folded into the key's low
            # bit: key = 2*score + ul orders exactly like (score, ul).
            lw = left_sc > ul_sc
            e_key = jnp.where(lw, left_sc * 2, ul_sc * 2 + 1)
            e_P1 = jnp.where(lw, left_P1, ul_P1)
            e_P2 = jnp.where(lw, left_P2, ul_P2)
            if tie_flag:
                t1 = (left_sc == ul_sc) & (
                    (((ul_P1 | left_P1) & 0xFF0000) != 0)
                    | ((ul_P2 | left_P2) < 0)  # inherited fragile bits
                )

            # y==0 border-up candidate (priority UP: beats LEFT ties only;
            # in key space: 2*GAP >= e_key  <=>  GAP > e_sc, or
            # GAP == e_sc with e_ul == 0)
            up0_better = row0 & (2 * GAP >= e_key)
            if tie_flag:
                t2 = row0 & ((e_key | 1) == 2 * GAP + 1) & (
                    ((e_P1 & 0xFF0000) != 0) | (e_P2 < 0)
                )
            e_key = jnp.where(up0_better, 2 * GAP, e_key)
            e_P1 = jnp.where(up0_better, 0, e_P1)
            e_P2 = jnp.where(up0_better, x + (1 << 16), e_P2)
            if tie_flag:
                e_P2 = e_P2 | ((t1 | t2).astype(jnp.int32) << 31)

            # up-chain: Hillis-Steele max-scan down the column over THREE
            # planes: the gap-adjusted key and the two packed payloads
            # (P2's gap field rides as gaps - y + H_pad, invariant under
            # the shift, positive by construction)
            akey = e_key - key_gap2
            aP2 = e_P2 + bias_col
            state = (akey, e_P1, aP2)
            for i in range(nscan):
                sh = 1 << i
                if sh >= window:
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
                if tie_flag:
                    ts_tie = (((ka ^ kb) | 1) == 1) & (
                        (((shifted[1] | state[1]) & 0xFF0000) != 0)
                        | ((shifted[2] | state[2]) < 0)
                    )
                state = tuple(
                    jnp.where(ywins, sb, sa) for sa, sb in zip(shifted, state)
                )
                if tie_flag:
                    state = (state[0], state[1],
                             state[2] | (ts_tie.astype(jnp.int32) << 31))
            ckey, cP1, cP2a = state
            cur = (ckey >> 1) + gap_y  # arithmetic shift floors: drops ul bit
            cP2 = cP2a - bias_col
            psc, pP1, pP2 = cur, cP1, cP2

            # per-row running best: first strict improvement wins, and
            # columns at/beyond the read length never improve
            xv = (x < lengths)[None, :]
            improve = (cur > bsc) & xv
            if tie_flag:
                t4 = (cur == bsc) & xv & (
                    (((cP1 | bP1) & 0xFF0000) != 0) | ((cP2 | bP2) < 0)
                )
                bP2 = jnp.where(improve, cP2,
                                bP2 | (t4.astype(jnp.int32) << 31))
            else:
                bP2 = jnp.where(improve, cP2, bP2)
            bsc = jnp.where(improve, cur, bsc)
            bP1 = jnp.where(improve, cP1, bP1)
            bXx = jnp.where(improve, x, bXx)

          col_scr[0], col_scr[1], col_scr[2] = psc, pP1, pP2
          best_scr[_BSC], best_scr[_BP1] = bsc, bP1
          best_scr[_BP2], best_scr[_BX] = bP2, bXx

        @pl.when(xg == pl.num_programs(1) - 1)
        def _finish():
            # lexicographic global best: max score, then smallest x of
            # first attainment, then smallest row — exactly the C's
            # x-major-then-y fill-order "first strictly greater" winner
            sc = jnp.where(ys < H, best_scr[_BSC], NEG_BEST - 1)
            m = jnp.max(sc, axis=0)  # [tile_b]
            cand = sc == m[None, :]
            bx = best_scr[_BX]
            minbx = jnp.min(jnp.where(cand, bx, jnp.int32(1 << 30)), axis=0)
            cand &= bx == minbx[None, :]
            ymin = jnp.min(jnp.where(cand, ysb, H_pad), axis=0)
            sel = ysb == ymin[None, :]

            def pick(a):
                return jnp.sum(jnp.where(sel, a, 0), axis=0)

            bp1 = pick(best_scr[_BP1])
            bp2 = pick(best_scr[_BP2])
            m_ref[:] = bp1 & 0xFF
            mm_ref[:] = (bp1 >> 8) & 0xFF
            nm_ref[:] = (bp1 >> 16) & 0xFF
            ts_ref[:] = (bp1 >> 24) & 0xFF
            qs_ref[:] = bp2 & 0xFFFF
            g_ref[:] = (bp2 >> 16) & 0x7FFF
            qe_ref[:] = pick(bx)
            te_ref[:] = jnp.where(ymin == H_pad, 0, ymin)
            if tie_flag:
                cand0 = sc == m[None, :]
                multi = jnp.sum(cand0.astype(jnp.int32), axis=0) > 1
                nmrow = cand0 & (
                    ((best_scr[_BP1] & 0xFF0000) != 0)
                    | (best_scr[_BP2] < 0)
                )
                t5 = multi & (jnp.sum(nmrow.astype(jnp.int32), axis=0) > 0)
                tf_ref[:] = ((bp2 >> 31) & 1) | t5.astype(jnp.int32)

    return kernel


def packed12_ok(L: int, H: int) -> bool:
    """Bounds for the single-payload-plane kernel (_make_kernel_packed12):
    matches/mismatches/neutral each fit 5 bits (any path makes at most
    H <= 31 diagonal steps), query_start fits 9 bits (L <= 511) and
    target_start 5.  Covers the reference's default adapters (<= 23
    bases) and Illumina-era read lengths; longer inputs take the
    two-plane kernel."""
    return H <= 31 and L <= 511


# P12 lo-half field masks (see _make_kernel_packed12)
_P12_QS = 0x1FF          # bits 0-8: query_start
_P12_TS_SHIFT = 9        # bits 9-13: target_start
_P12_FLAG = 1 << 14      # tie-fragility bit
_P12_BU = 1 << 15        # path started with the row-0 border-up gap
_P12_M_SHIFT = 16        # bits 16-20: matches
_P12_MM_SHIFT = 21       # bits 21-25: mismatches
_P12_NM_SHIFT = 26       # bits 26-30: neutral
# a tie is float-fragile iff either tying candidate carries neutrals or
# an inherited flag: one AND + one compare tests both at once
_P12_TIEMASK = (0x1F << _P12_NM_SHIFT) | _P12_FLAG


def _make_kernel_packed12(H: int, H_pad: int, tile_b: int,
                          has_nm: bool, tie_flag: bool,
                          cols_per_step: int = 8):
    """Half-state variant of _make_kernel_packed (VERDICT r4 item #1).

    The two packed payload planes (P1: four 8-bit counters, P2:
    query_start + a 15-bit gap counter) merge into ONE int32 plane P12 —
    possible because

    * for H <= 31 the three path counters fit 5-bit fields (any path
      advances the target row at most H times, so each counter <= H),
    * gaps never need to ride the DP at all: along the winning path
      ``gaps = (te-ts+1) + (qe-qs+1) - 2*(m+mm+nm) - border_up`` (target
      rows consumed = diagonals + up-gaps, query columns consumed =
      diagonals + left-gaps + border_up), so the finish step derives it
      from fields already carried.  ``border_up`` is one lo-half bit set
      by the row-0 border-gap candidate.

    Payloads are select-only through the whole DP, and both halves share
    every select mask, so merging them halves the payload work AND the
    streamed column/best state drops from 6 planes to 4 ([H_pad, tile]
    int32 read+written per column) — the kernel's measured VMEM-state
    bound scales accordingly (BASELINE.md "The DP's true hardware
    bound").  The int16-plane alternative is blocked by the toolchain,
    demonstrated by probe: the `bench.py --vpuprobe` int16 cases (the
    [32, 2048] int16 plane shape such a kernel would get) fail to
    compile with a Mosaic INTERNAL error on this stack, and manual
    two-int16-per-int32 SWAR triples the op count of compare/select —
    a regression on a kernel the tournament experiment below shows is
    op-bound (BASELINE.md round 5)."""
    window = scan_window(H, H_pad)
    nscan = max(1, int(np.ceil(np.log2(window))))
    FLOOR = -(20 * H + 11)
    INIT_KEY = (FLOOR << 15) | 32767

    def kernel(*refs):
        if has_nm:
            (maxlen_ref, bases_ref, nmw_ref, lengths_ref, t_ref, *rest) = refs
        else:
            (maxlen_ref, bases_ref, lengths_ref, t_ref, *rest) = refs
            nmw_ref = None
        if tie_flag:
            (m_ref, mm_ref, g_ref, nm_ref, qs_ref, qe_ref, ts_ref, te_ref,
             tf_ref, col_scr, best_scr) = rest
        else:
            (m_ref, mm_ref, g_ref, nm_ref, qs_ref, qe_ref, ts_ref, te_ref,
             col_scr, best_scr) = rest
        xg = pl.program_id(1)
        tile_maxlen = maxlen_ref[pl.program_id(0)]
        tc = t_ref[:]  # [H_pad, 1] codes: A0 C1 G2 T3, N=4, pad=5
        t_is_n = tc == 4
        ys = jax.lax.broadcasted_iota(jnp.int32, (H_pad, 1), 0)
        ysb = jnp.broadcast_to(ys, (H_pad, tile_b))
        row0 = ys == 0
        target_border = jnp.where(ys <= 3, 0, GAP * (ys - 3)).astype(jnp.int32)
        gap_y = GAP * ys
        key_gap2 = 2 * gap_y
        lengths = lengths_ref[:]  # [tile_b]

        @pl.when(xg == 0)
        def _init():
            col_scr[0] = jnp.broadcast_to(
                jnp.maximum(target_border, FLOOR), (H_pad, tile_b)
            )
            # shift_down must read ts=y for a fresh start at row y, so the
            # init plane holds (y+1) in the ts field (row H_pad-1 is never
            # read; for H_pad=32 its value would touch the flag bit)
            col_scr[1] = jnp.broadcast_to((ys + 1) << _P12_TS_SHIFT,
                                          (H_pad, tile_b))
            best_scr[0] = jnp.full((H_pad, tile_b), INIT_KEY, jnp.int32)
            best_scr[1] = jnp.zeros((H_pad, tile_b), jnp.int32)

        @pl.when(xg * cols_per_step < tile_maxlen)
        def _cols():
              psc, pP12 = col_scr[0], col_scr[1]
              bkey, bP12 = best_scr[0], best_scr[1]
              for jj in range(cols_per_step):
                x = xg * cols_per_step + jj
                j4 = (x // 4) % 4
                wb = bases_ref[x // 16, :].astype(jnp.int32)
                shift = 8 * j4 + (6 - 2 * (x % 4))
                code = ((wb >> shift) & 3)[None, :]
                eq = code == tc
                if has_nm:
                    wn = nmw_ref[x // 32, :].astype(jnp.int32)
                    nshift = 8 * ((x // 8) % 4) + (7 - (x % 8))
                    q_is_n = (((wn >> nshift) & 1) == 1)[None, :]
                    one_n = q_is_n | t_is_n
                    delta = jnp.where(
                        q_is_n & t_is_n, 0,
                        jnp.where(one_n, NEUTRAL,
                                  jnp.where(eq, MATCH, MISMATCH)),
                    )
                    incP12 = jnp.where(
                        one_n, 1 << _P12_NM_SHIFT,
                        jnp.where(eq, 1 << _P12_M_SHIFT, 1 << _P12_MM_SHIFT),
                    ).astype(jnp.int32)
                else:
                    delta = jnp.where(
                        t_is_n, NEUTRAL, jnp.where(eq, MATCH, MISMATCH)
                    )
                    incP12 = jnp.where(
                        t_is_n, 1 << _P12_NM_SHIFT,
                        jnp.where(eq, 1 << _P12_M_SHIFT, 1 << _P12_MM_SHIFT),
                    ).astype(jnp.int32)

                def shift_down(a):
                    return jnp.concatenate(
                        [jnp.zeros((1, tile_b), a.dtype), a[:-1]], axis=0
                    )

                # upper-left candidate; row 0's diagonal source is the
                # query border (fresh stats qs=x, ts=0); the counter
                # increment lands in the hi half, which can never carry
                # into the lo fields
                ul_sc = shift_down(psc) + delta
                ul_P12 = jnp.where(row0, x, shift_down(pP12)) + incP12

                ban = (ys > 3) & (ys - 3 > x)
                left_sc = jnp.where(ban, NEG, psc + GAP)
                # LEFT adds only a gap, which is no longer carried: the
                # payload is pP12 unchanged

                lw = left_sc > ul_sc
                e_key = jnp.where(lw, left_sc * 2, ul_sc * 2 + 1)
                e_P12 = jnp.where(lw, pP12, ul_P12)
                if tie_flag:
                    t1 = (left_sc == ul_sc) & (
                        ((ul_P12 | pP12) & _P12_TIEMASK) != 0
                    )

                up0_better = row0 & (2 * GAP >= e_key)
                if tie_flag:
                    t2 = row0 & ((e_key | 1) == 2 * GAP + 1) & (
                        (e_P12 & _P12_TIEMASK) != 0
                    )
                e_key = jnp.where(up0_better, 2 * GAP, e_key)
                e_P12 = jnp.where(up0_better, x + _P12_BU, e_P12)
                if tie_flag:
                    e_P12 = jnp.where(t1 | t2, e_P12 | _P12_FLAG, e_P12)

                akey = e_key - key_gap2
                state = (akey, e_P12)
                for i in range(nscan):
                    sh = 1 << i
                    if sh >= window:
                        break
                    shifted = tuple(
                        jnp.concatenate(
                            [jnp.full((sh, tile_b),
                                      2 * NEG if k == 0 else 0, s.dtype),
                             s[:-sh]], axis=0,
                        )
                        for k, s in enumerate(state)
                    )
                    ka, kb = shifted[0], state[0]
                    ywins = (kb > ka) | ((kb == ka) & ((kb & 1) == 1))
                    if tie_flag:
                        ts_tie = (((ka ^ kb) | 1) == 1) & (
                            ((shifted[1] | state[1]) & _P12_TIEMASK) != 0
                        )
                    state = tuple(
                        jnp.where(ywins, sb, sa)
                        for sa, sb in zip(shifted, state)
                    )
                    if tie_flag:
                        state = (state[0],
                                 jnp.where(ts_tie, state[1] | _P12_FLAG,
                                           state[1]))
                ckey, cP12 = state
                cur = jnp.maximum((ckey >> 1) + gap_y, FLOOR)
                psc, pP12 = cur, cP12

                # per-column running best (a step-local tournament that
                # defers the best-plane update to once per grid step was
                # measured SLOWER — 13.0M vs 14.7M r/s — the extra
                # compare/selects cost more than the saved plane writes)
                xv = (x < lengths)[None, :]
                candkey = (cur << 15) | (32767 - x)
                improve = (candkey > bkey) & xv
                if tie_flag:
                    t4 = (cur == (bkey >> 15)) & xv & (
                        ((cP12 | bP12) & _P12_TIEMASK) != 0
                    )
                    bP12 = jnp.where(improve, cP12,
                                     jnp.where(t4, bP12 | _P12_FLAG, bP12))
                else:
                    bP12 = jnp.where(improve, cP12, bP12)
                bkey = jnp.where(improve, candkey, bkey)
              col_scr[0], col_scr[1] = psc, pP12
              best_scr[0], best_scr[1] = bkey, bP12

        @pl.when(xg == pl.num_programs(1) - 1)
        def _finish():
            kk = jnp.where(ys < H, best_scr[0],
                           jnp.int32((FLOOR - 1) << 15))
            m = jnp.max(kk, axis=0)
            cand = kk == m[None, :]
            ymin = jnp.min(jnp.where(cand, ysb, H_pad), axis=0)
            sel = ysb == ymin[None, :]
            bp12 = jnp.sum(jnp.where(sel, best_scr[1], 0), axis=0)

            mv = (bp12 >> _P12_M_SHIFT) & 0x1F
            mmv = (bp12 >> _P12_MM_SHIFT) & 0x1F
            nmv = (bp12 >> _P12_NM_SHIFT) & 0x1F
            qsv = bp12 & _P12_QS
            tsv = (bp12 >> _P12_TS_SHIFT) & 0x1F
            buv = (bp12 >> 15) & 1
            qev = jnp.where(ymin == H_pad, 0, 32767 - (m & 32767))
            tev = jnp.where(ymin == H_pad, 0, ymin)
            m_ref[:] = mv
            mm_ref[:] = mmv
            nm_ref[:] = nmv
            ts_ref[:] = tsv
            qs_ref[:] = qsv
            qe_ref[:] = qev
            te_ref[:] = tev
            # gaps from the span identity; zero when the best never left
            # its init (length-0 padded rows: every real read improves at
            # least once because cell (0,0) scores >= MISMATCH > FLOOR)
            valid = m > INIT_KEY
            g = (tev - tsv + 1) + (qev - qsv + 1) - 2 * (mv + mmv + nmv) - buv
            g_ref[:] = jnp.where(valid, g, 0)
            if tie_flag:
                sc_row = best_scr[0] >> 15
                msc = m >> 15
                cand0 = (ys < H) & (sc_row == msc[None, :])
                multi = jnp.sum(cand0.astype(jnp.int32), axis=0) > 1
                nmrow = cand0 & ((best_scr[1] & _P12_TIEMASK) != 0)
                t5 = multi & (jnp.sum(nmrow.astype(jnp.int32), axis=0) > 0)
                tf_ref[:] = ((bp12 >> 14) & 1) | t5.astype(jnp.int32)

    return kernel


def _make_kernel_packed(H: int, H_pad: int, L_pad: int, tile_b: int,
                        has_nm: bool, tie_flag: bool):
    """Packed-operand variant of _make_kernel: bases arrive as the 2-bit
    upload words (16 codes per uint32, the pack_batch2 byte layout seen
    little-endian) and the N/mask positions as 1-bit plane words (32
    positions per uint32).  The DP planes and scan are identical to the
    unpacked kernel; the differences are throughput:

    * per-column query fetch is a couple of [tile_b] row ops replacing
      an entire XLA unpack + int32-transpose materialization (~420
      B/read of HBM traffic);
    * every 8-column grid step is gated on the tile's max read length,
      so a 100-col dispatch in a padded grid skips the dead columns;
    * with ``tie_flag`` the float-fragility bit (see align.align_batch's
      tie_fragile) rides P2's bit 31 — free through every payload select
      and the scan (the biased gap field stops at bit 30), costing only
      the tie-detection compares themselves.

    (An int16 score-plane variant — clamping scores at -(20H+11), which
    provably preserves exactness and bounds every key into int16 — was
    prototyped but hits Mosaic relayout limitations when 16-bit-born
    masks select 32-bit payload planes; revisit when Mosaic supports
    those relayouts.)"""
    window = scan_window(H, H_pad)
    nscan = max(1, int(np.ceil(np.log2(window))))
    # exactness-preserving score clamp (see the int16 note above): a
    # clamped (raised) value can reach at most FLOOR + 10*H with every
    # future gain, strictly below every max-relevant cell's minimum
    # M - 10*H >= -(10*H + 10), so clamp-tainted values can never win nor
    # tie any cell that influences the result.  With the clamp, the
    # per-row best (score, first-x) packs into ONE int32 key:
    # score * 2^15 + (2^15 - 1 - x).  x < 2^15 always (reads <= 25000),
    # |key| <= (20*H + 11 + 10) * 2^15 < 2^31 for H <= 255; and since x
    # strictly increases, an equal-score later candidate compares BELOW
    # the held key — exactly the C's strict-greater first-wins rule.
    FLOOR = -(20 * H + 11)

    def kernel(*refs):
        if has_nm:
            (maxlen_ref, bases_ref, nmw_ref, lengths_ref, t_ref, *rest) = refs
        else:
            (maxlen_ref, bases_ref, lengths_ref, t_ref, *rest) = refs
            nmw_ref = None
        if tie_flag:
            (m_ref, mm_ref, g_ref, nm_ref, qs_ref, qe_ref, ts_ref, te_ref,
             tf_ref, col_scr, best_scr) = rest
        else:
            (m_ref, mm_ref, g_ref, nm_ref, qs_ref, qe_ref, ts_ref, te_ref,
             col_scr, best_scr) = rest
        xg = pl.program_id(1)
        tile_maxlen = maxlen_ref[pl.program_id(0)]
        tc = t_ref[:]  # [H_pad, 1] codes: A0 C1 G2 T3, N=4, pad=5
        t_is_n = tc == 4
        ys = jax.lax.broadcasted_iota(jnp.int32, (H_pad, 1), 0)
        ysb = jnp.broadcast_to(ys, (H_pad, tile_b))
        row0 = ys == 0
        target_border = jnp.where(ys <= 3, 0, GAP * (ys - 3)).astype(jnp.int32)
        gap_y = GAP * ys
        key_gap2 = 2 * gap_y
        bias_col = (H_pad - ys) << 16
        lengths = lengths_ref[:]  # [tile_b]

        @pl.when(xg == 0)
        def _init():
            col_scr[0] = jnp.broadcast_to(
                jnp.maximum(target_border, FLOOR), (H_pad, tile_b)
            )
            col_scr[1] = jnp.broadcast_to((ys + 1) << 24, (H_pad, tile_b))
            col_scr[2] = jnp.zeros((H_pad, tile_b), jnp.int32)
            # best key = FLOOR score at virtual x=0: no real max-relevant
            # cell can tie it (true max M >= -10 > FLOOR)
            best_scr[0] = jnp.full(
                (H_pad, tile_b), (FLOOR << 15) | 32767, jnp.int32
            )
            best_scr[1] = jnp.zeros((H_pad, tile_b), jnp.int32)
            best_scr[2] = jnp.zeros((H_pad, tile_b), jnp.int32)

        @pl.when(xg * 8 < tile_maxlen)
        def _cols():
              # 8 columns per grid step: enough unroll to amortize the
              # scratch round-trip, small enough that Mosaic's live
              # temporaries fit VMEM even for 100+-row adapters
              psc, pP1, pP2 = col_scr[0], col_scr[1], col_scr[2]
              bkey, bP1, bP2 = best_scr[0], best_scr[1], best_scr[2]
              for jj in range(8):
                x = xg * 8 + jj
                j4 = (x // 4) % 4      # byte within the bases word
                wb = bases_ref[x // 16, :].astype(jnp.int32)
                shift = 8 * j4 + (6 - 2 * (x % 4))
                code = ((wb >> shift) & 3)[None, :]
                eq = code == tc
                if has_nm:
                    wn = nmw_ref[x // 32, :].astype(jnp.int32)
                    nshift = 8 * ((x // 8) % 4) + (7 - (x % 8))
                    q_is_n = (((wn >> nshift) & 1) == 1)[None, :]
                    one_n = q_is_n | t_is_n
                    delta = jnp.where(
                        q_is_n & t_is_n, 0,
                        jnp.where(one_n, NEUTRAL,
                                  jnp.where(eq, MATCH, MISMATCH)),
                    )
                    incP1 = jnp.where(
                        one_n, 1 << 16, jnp.where(eq, 1, 1 << 8)
                    ).astype(jnp.int32)
                else:
                    # no query-side N source; adapter N rows are const
                    delta = jnp.where(
                        t_is_n, NEUTRAL, jnp.where(eq, MATCH, MISMATCH)
                    )
                    incP1 = jnp.where(
                        t_is_n, 1 << 16, jnp.where(eq, 1, 1 << 8)
                    ).astype(jnp.int32)

                def shift_down(a):
                    return jnp.concatenate(
                        [jnp.zeros((1, tile_b), a.dtype), a[:-1]], axis=0
                    )

                ul_sc = shift_down(psc) + delta
                ul_P1 = shift_down(pP1) + incP1
                ul_P2 = jnp.where(row0, x, shift_down(pP2))

                ban = (ys > 3) & (ys - 3 > x)
                left_sc = jnp.where(ban, NEG, psc + GAP)
                left_P1 = pP1
                left_P2 = pP2 + (1 << 16)

                lw = left_sc > ul_sc
                e_key = jnp.where(lw, left_sc * 2, ul_sc * 2 + 1)
                e_P1 = jnp.where(lw, left_P1, ul_P1)
                e_P2 = jnp.where(lw, left_P2, ul_P2)
                if tie_flag:
                    # exact UL/LEFT tie with a neutral on either path
                    t1 = (left_sc == ul_sc) & (
                        (((ul_P1 | left_P1) & 0xFF0000) != 0)
                        | ((ul_P2 | left_P2) < 0)  # inherited fragile bits
                    )

                up0_better = row0 & (2 * GAP >= e_key)
                if tie_flag:
                    # score tie vs the border-up candidate (no neutrals
                    # on its side; e's ul bit is irrelevant to the tie)
                    t2 = row0 & ((e_key | 1) == 2 * GAP + 1) & (
                        ((e_P1 & 0xFF0000) != 0) | (e_P2 < 0)
                    )
                e_key = jnp.where(up0_better, 2 * GAP, e_key)
                e_P1 = jnp.where(up0_better, 0, e_P1)
                e_P2 = jnp.where(up0_better, x + (1 << 16), e_P2)
                if tie_flag:
                    e_P2 = e_P2 | ((t1 | t2).astype(jnp.int32) << 31)

                akey = e_key - key_gap2
                aP2 = e_P2 + bias_col
                state = (akey, e_P1, aP2)
                for i in range(nscan):
                    sh = 1 << i
                    if sh >= window:
                        break
                    shifted = tuple(
                        jnp.concatenate(
                            [jnp.full((sh, tile_b),
                                      2 * NEG if k == 0 else 0, s.dtype),
                             s[:-sh]], axis=0,
                        )
                        for k, s in enumerate(state)
                    )
                    ka, kb = shifted[0], state[0]
                    ywins = (kb > ka) | ((kb == ka) & ((kb & 1) == 1))
                    if tie_flag:
                        # chain-candidate score tie (ul bits aside) with
                        # neutrals on either tying path — computed on the
                        # PRE-select payloads so the loser's neutrals count
                        ts_tie = (((ka ^ kb) | 1) == 1) & (
                            (((shifted[1] | state[1]) & 0xFF0000) != 0)
                            | ((shifted[2] | state[2]) < 0)
                        )
                    state = tuple(
                        jnp.where(ywins, sb, sa)
                        for sa, sb in zip(shifted, state)
                    )
                    if tie_flag:
                        state = (state[0], state[1],
                                 state[2] | (ts_tie.astype(jnp.int32) << 31))
                ckey, cP1, cP2a = state
                cur = jnp.maximum((ckey >> 1) + gap_y, FLOOR)
                cP2 = cP2a - bias_col
                psc, pP1, pP2 = cur, cP1, cP2

                xv = (x < lengths)[None, :]
                candkey = (cur << 15) | (32767 - x)
                improve = (candkey > bkey) & xv
                if tie_flag:
                    # tie vs the OLD running best (before this update)
                    t4 = (cur == (bkey >> 15)) & xv & (
                        (((cP1 | bP1) & 0xFF0000) != 0) | ((cP2 | bP2) < 0)
                    )
                    bP2 = jnp.where(improve, cP2,
                                    bP2 | (t4.astype(jnp.int32) << 31))
                else:
                    bP2 = jnp.where(improve, cP2, bP2)
                bkey = jnp.where(improve, candkey, bkey)
                bP1 = jnp.where(improve, cP1, bP1)
              col_scr[0], col_scr[1], col_scr[2] = psc, pP1, pP2
              best_scr[0], best_scr[1], best_scr[2] = bkey, bP1, bP2

        @pl.when(xg == pl.num_programs(1) - 1)
        def _finish():
            # the packed best key orders (score, first-x) at once: its
            # row-max IS the global max with the smallest attaining x
            kk = jnp.where(ys < H, best_scr[0],
                           jnp.int32((FLOOR - 1) << 15))
            m = jnp.max(kk, axis=0)
            cand = kk == m[None, :]
            ymin = jnp.min(jnp.where(cand, ysb, H_pad), axis=0)
            sel = ysb == ymin[None, :]

            def pick(a):
                return jnp.sum(jnp.where(sel, a, 0), axis=0)

            bp1 = pick(best_scr[1])
            bp2 = pick(best_scr[2])
            m_ref[:] = bp1 & 0xFF
            mm_ref[:] = (bp1 >> 8) & 0xFF
            nm_ref[:] = (bp1 >> 16) & 0xFF
            ts_ref[:] = (bp1 >> 24) & 0xFF
            qs_ref[:] = bp2 & 0xFFFF
            g_ref[:] = (bp2 >> 16) & 0x7FFF
            qe_ref[:] = jnp.where(ymin == H_pad, 0, 32767 - (m & 32767))
            te_ref[:] = jnp.where(ymin == H_pad, 0, ymin)
            if tie_flag:
                # cross-row SCORE tie at the global max with neutrals or
                # fragility on any tied row (first-(x,y) is float-fragile);
                # score-tie = key-tie ignoring the low 15 x bits
                sc_row = best_scr[0] >> 15
                msc = m >> 15
                cand0 = (ys < H) & (sc_row == msc[None, :])
                multi = jnp.sum(cand0.astype(jnp.int32), axis=0) > 1
                nmrow = cand0 & (
                    ((best_scr[1] & 0xFF0000) != 0)
                    | (best_scr[2] < 0)
                )
                t5 = multi & (jnp.sum(nmrow.astype(jnp.int32), axis=0) > 0)
                tf_ref[:] = ((bp2 >> 31) & 1) | t5.astype(jnp.int32)

    return kernel


_CODE_OF = {65: 0, 67: 1, 71: 2, 84: 3, 78: 4}  # A C G T N


def adapter_codes(adapter: bytes):
    """Adapter as 2-bit codes (N=4), or None if it contains a letter the
    packed path cannot represent (lowercase/U etc -> unpacked kernel)."""
    try:
        return [_CODE_OF[c] for c in adapter]
    except KeyError:
        return None


def align_batch_pallas_packed(b2w, nmw, lengths, adapter: bytes, L: int,
                              tile_b: int = 2048, interpret: bool = False,
                              tie_flag: bool = False):
    """Entry point: resolves the kernel choice (P12 vs two-plane) OUTSIDE
    the jit so FASTX_TPU_NO_P12 keys the executable cache properly, then
    dispatches to the jitted implementation below (its docstring has the
    operand layout)."""
    use_p12 = packed12_ok(L, len(adapter)) and not os.environ.get(
        "FASTX_TPU_NO_P12"
    )
    codes = adapter_codes(adapter)
    if (tie_flag and nmw is None and codes is not None
            and all(c < 4 for c in codes)):
        # no N source on either side: neutrals are impossible, every
        # score is a small integer exact in float32, so the float engine
        # decides every comparison identically and the fragility flag is
        # provably all-zero — run the flag-FREE kernel (the detection
        # compares are the flag's whole cost) and synthesize the flags
        tie_flag = False
        add_zero_flags = True
    else:
        add_zero_flags = False
    # the unroll is resolved HERE, outside the jit, so the env override
    # keys the executable cache like use_p12 does (measured per-variant
    # defaults: see _make_kernel_packed12's call site)
    p12_unroll = int(os.environ.get("FASTX_TPU_P12_UNROLL",
                                    8 if tie_flag else 4)) if use_p12 else 0
    if p12_unroll not in (0, 1, 2, 4, 8, 16, 32):
        # the grid is _round_up(L, U)//U steps of U columns; U > 32
        # can push x past the 32-code-aligned operand rows (OOB VMEM
        # reads), and non-powers-of-two defeat the x//16 row indexing
        raise ValueError("FASTX_TPU_P12_UNROLL must be one of "
                         "1/2/4/8/16/32, got %d" % p12_unroll)
    res = _align_batch_pallas_packed(
        b2w, nmw, lengths, adapter, L, tile_b=tile_b, interpret=interpret,
        tie_flag=tie_flag, use_p12=use_p12, p12_unroll=p12_unroll,
    )
    if add_zero_flags:
        res["tie_fragile"] = jnp.zeros(b2w.shape[1], bool)
    return res


@functools.partial(jax.jit,
                   static_argnames=("adapter", "L", "tile_b", "interpret",
                                    "tie_flag", "use_p12",
                                    "p12_unroll"))
def _align_batch_pallas_packed(b2w, nmw, lengths, adapter: bytes, L: int,
                               tile_b: int = 2048, interpret: bool = False,
                               tie_flag: bool = False,
                               use_p12: bool = False,
                               p12_unroll: int = 0):
    """align_batch on the 2-bit packed upload, no unpacking on or off
    chip.

    ``b2w``: [ceil(L/32)*2, B] uint32 — the pack_batch2 byte matrix
    (4 codes/byte, MSB-first within a byte) viewed little-endian as
    uint32 words and transposed; ``nmw``: [ceil(L/32), B] uint32 — the
    effective-N bit plane (input N OR masked positions; np.packbits
    MSB-first bytes, little-endian words, transposed), or None when the
    batch has no N source.  ``L`` is the true column count (words may
    cover more; the surplus is PAD and never committed)."""
    W16 = b2w.shape[0]
    B = b2w.shape[1]
    H = len(adapter)
    codes = adapter_codes(adapter)
    if codes is None:
        raise ValueError("adapter outside ACGTN; use align_batch_pallas")
    if not pallas_bounds_ok(L, H):
        raise ValueError(
            "packed path-stat field bounds exceeded (L=%d, adapter=%d)"
            % (L, H)
        )
    if B % tile_b != 0 or (not interpret and tile_b % 1024 != 0):
        raise ValueError("bad tile_b %d for B %d" % (tile_b, B))
    L_pad = W16 * 16
    if L_pad < L or L_pad % 32 != 0:
        raise ValueError("b2w rows %d do not cover L=%d" % (W16, L))
    has_nm = nmw is not None
    if has_nm and nmw.shape[0] * 32 != L_pad:
        raise ValueError("nmw rows %d mismatch b2w rows %d"
                         % (nmw.shape[0], W16))
    H_pad = _h_pad(H)
    t_pad = np.full((H_pad, 1), 5, np.int32)  # 5 = border: not a code, not N
    t_pad[:H, 0] = codes
    t_arr = jnp.asarray(t_pad)
    lengths = lengths.astype(jnp.int32)
    tile_max = jnp.max(lengths.reshape(B // tile_b, tile_b), axis=1)

    n_out = 9 if tie_flag else 8
    out_shape = tuple(
        jax.ShapeDtypeStruct((B,), jnp.int32) for _ in range(n_out)
    )
    if use_p12:
        # column unroll (resolved by the caller so FASTX_TPU_P12_UNROLL
        # keys the executable cache): columns per grid step; the scratch
        # round-trip amortizes over the unroll while Mosaic's live
        # temporaries grow with it.  Measured on v5e (262144 x 100 bp,
        # flag-off/flag-on M r/s): U=2 15.4/10.5, U=4 16.8/11.1, U=8
        # 16.1/11.4, U=16 15.3/10.6 — per-variant defaults pick the
        # winner
        U = p12_unroll or (8 if tie_flag else 4)
        grid = (B // tile_b, _round_up(L, U) // U)
        kernel = _make_kernel_packed12(H, H_pad, tile_b, has_nm, tie_flag,
                                       cols_per_step=U)
        n_state = 2  # single merged payload plane (see _make_kernel_packed12)
    else:
        grid = (B // tile_b, _round_up(L, 8) // 8)
        kernel = _make_kernel_packed(H, H_pad, L_pad, tile_b, has_nm,
                                     tie_flag)
        n_state = 3

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # [n_tiles] maxlens
        # full word column per tile (first dim equals the array dim, so
        # any W16 is legal); fetched once per tile, indexed per step
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
    in_specs += [
        pl.BlockSpec((tile_b,), lambda i, x: (i,), memory_space=pltpu.VMEM),
        pl.BlockSpec((H_pad, 1), lambda i, x: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands += [lengths, t_arr]

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(
            pl.BlockSpec((tile_b,), lambda i, x: (i,), memory_space=pltpu.VMEM)
            for _ in range(n_out)
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((n_state, H_pad, tile_b), jnp.int32),
            pltpu.VMEM((n_state, H_pad, tile_b), jnp.int32),
        ],
        interpret=interpret,
    )(*operands)
    names = ("matches", "mismatches", "gaps", "neutral",
             "query_start", "query_end", "target_start", "target_end")
    if tie_flag:
        names = names + ("tie_fragile",)
    res = dict(zip(names, outs))
    if tie_flag:
        res["tie_fragile"] = res["tie_fragile"].astype(bool)
    return res


@functools.partial(jax.jit, static_argnames=("adapter", "tile_b", "interpret",
                                             "tie_flag"))
def align_batch_pallas(bases, lengths, adapter: bytes, tile_b: int = 2048,
                       interpret: bool = False, tie_flag: bool = False):
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
    if not interpret and tile_b % 1024 != 0:
        # rank-1 [B] operands carry an XLA layout tile of 1024 elements
        # that Mosaic block shapes must be a multiple of (interpret mode
        # has no layout constraint; tests use small tiles there)
        raise ValueError("tile_b must be a multiple of 1024, got %d" % tile_b)
    lengths = lengths.astype(jnp.int32)
    # per-tile column bound: tiles of short reads stop early
    tile_max = jnp.max(lengths.reshape(B // tile_b, tile_b), axis=1)

    grid = (B // tile_b, L_pad // 8)
    n_out = 9 if tie_flag else 8
    out_shape = tuple(
        jax.ShapeDtypeStruct((B,), jnp.int32) for _ in range(n_out)
    )
    kernel = _make_kernel(H, H_pad, L, tile_b, tie_flag)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # [n_tiles] maxlens
            pl.BlockSpec((8, tile_b), lambda i, x: (x, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b,), lambda i, x: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((H_pad, 1), lambda i, x: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((tile_b,), lambda i, x: (i,), memory_space=pltpu.VMEM)
            for _ in range(n_out)
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((3, H_pad, tile_b), jnp.int32),
            pltpu.VMEM((4, H_pad, tile_b), jnp.int32),
        ],
        interpret=interpret,
    )(tile_max, basesT, lengths, t_arr)
    names = ("matches", "mismatches", "gaps", "neutral",
             "query_start", "query_end", "target_start", "target_end")
    if tie_flag:
        names = names + ("tie_fragile",)
    res = dict(zip(names, outs))
    if tie_flag:
        res["tie_fragile"] = res["tie_fragile"].astype(bool)
    return res
