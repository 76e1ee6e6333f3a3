"""Half-local adapter alignment: the clipper's DP engine, batched.

The reference engine (/root/reference/src/libfastx/sequence_alignment.cpp,
class HalfLocalSequenceAlignment) fills an |query| x |target| score matrix
with float penalties (gap -5, match +1, mismatch -1, neutral +0.1,
N-vs-N 0), borders query_border[x]=0 and target_border[y] = (y<=3) ? 0 :
gap*(y-3), a banned from-left move when target_index-3 > query_index,
then tracebacks from the global max cell (first in x-major scan order on
ties) counting matches/mismatches/gaps/neutral and recording
query/target start/end.  All of ``find_optimal_alignment``'s heuristic
branches assign that same traceback result (sequence_alignment.cpp:606-650),
so the observable contract is exactly: DP fill -> argmax -> traceback.

Two implementations:

* :func:`align_oracle` — per-read numpy transcription with float32
  arithmetic, used as the differential-test reference.
* :func:`align_batch` — vectorized jnp version over a whole read batch.
  Scores are scaled x10 to integers (match +10, mismatch -10, gap -50,
  neutral +1, N/N 0) making the DP exact int32 arithmetic; every decimal
  score level of the reference differs by >= 0.1 while float32 error is
  ~1e-5, so comparisons and the argmax agree with the float engine (tested
  differentially against the oracle).  The column dependency
  cur[y] = max(base[y], cur[y-1]+gap) is solved as a cumulative max of
  base[y]-gap*y (exact in integers), so each scan step over x is fully
  vectorized over [B, Lt].
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

GAP = -50
MATCH = 10
MISMATCH = -10
NEUTRAL = 1
_N = ord("N")

FROM_UPPER = 1
FROM_LEFT = 2
FROM_UPPER_LEFT = 3


# ---------------------------------------------------------------------------
# numpy oracle (float32, faithful transcription)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class AlignResult:
    query_size: int = 0
    query_start: int = 0
    query_end: int = 0
    target_size: int = 0
    target_start: int = 0
    target_end: int = 0
    gaps: int = 0
    neutral_matches: int = 0
    matches: int = 0
    mismatches: int = 0


def align_oracle(query: bytes, target: bytes, exact: bool = False) -> AlignResult:
    """Transcription of HalfLocalSequenceAlignment.

    With ``exact=False`` this uses float32 like the C (bit-faithful modulo
    FMA).  With ``exact=True`` scores are x10 integers — exact decimal
    arithmetic.  The two differ ONLY when reads contain N: the neutral
    +0.1 makes float sums inexact, so cells whose decimal scores tie can
    compare unequal in float and the argmax tie-break becomes accumulation
    noise (e.g. 4.3999996 vs 4.4).  That noise is not a semantic of the
    reference (it varies with compiler/FPU); the batched engine implements
    the exact-decimal semantics.
    """
    if exact:
        return _align_oracle_int(query, target)
    W, H = len(query), len(target)
    gap = np.float32(-5.0)
    q = np.frombuffer(query, np.uint8)
    t = np.frombuffer(target, np.uint8)

    target_border = np.where(
        np.arange(H) <= 3, np.float32(0), gap * (np.arange(H) - 3).astype(np.float32)
    ).astype(np.float32)

    score = np.zeros((W, H), np.float32)
    origin = np.zeros((W, H), np.int8)

    def delta(x, y):
        if q[x] == _N and t[y] == _N:
            return np.float32(0.0)
        if q[x] == _N or t[y] == _N:
            return np.float32(0.1)
        return np.float32(1.0) if q[x] == t[y] else np.float32(-1.0)

    best = np.float32(-1000000)
    bx = by = 0
    for x in range(W):
        for y in range(H):
            # safe_score(): query_index==-1 -> target_border[target_index],
            # target_index==-1 -> query_border[query_index]==0.  At (0,0)
            # the C reads target_border[-1], an out-of-bounds vector access
            # that in practice lands on heap metadata ~ 0 (denormal); we
            # model it as 0.
            up = (score[x, y - 1] if y > 0 else np.float32(0.0)) + gap
            left = (score[x - 1, y] if x > 0 else target_border[y]) + gap
            if x > 0 and y > 0:
                ul_src = score[x - 1, y - 1]
            elif x == 0 and y > 0:
                ul_src = target_border[y - 1]
            else:
                ul_src = np.float32(0.0)
            upleft = ul_src + delta(x, y)
            if y > 3 and y - 3 > x:
                left = np.float32(-100000)
            s = np.float32(-100000000)
            o = FROM_LEFT
            if upleft > s:
                s, o = upleft, FROM_UPPER_LEFT
            if up > s:
                s, o = up, FROM_UPPER
            if left > s:
                s, o = left, FROM_LEFT
            score[x, y] = s
            origin[x, y] = o
            if s > best:
                best, bx, by = s, x, y

    # NOTE on borders in the C: safe_score(x-1, y) with x==0 returns
    # target_border[y]; safe_score(x, y-1) with y==0 returns
    # query_border[x] == 0; safe_score(x-1, y-1) with either -1 returns the
    # corresponding border -- for x==0 that's target_border[y-1], for y==0
    # query_border[x-1] == 0, and for both it's target_border[-1]
    # (query_border? no: query_index==-1 checked first -> target_border[-1],
    # an out-of-bounds read of the vector; libstdc++ returns the element
    # before the data pointer...).  In practice target_border[-1] on x==0,
    # y==0 reads vector data minus one.  We model safe_score(-1,-1) as
    # query_border path value 0, which equals target_border[0..3]=0 region
    # anyway; divergence would need a negative index read to differ from 0.
    r = AlignResult()
    r.query_size, r.target_size = W, H
    r.query_end, r.target_end = bx, by
    x, y = bx, by
    while x >= 0 and y >= 0:
        o = origin[x, y]
        r.query_start, r.target_start = x, y
        if o == FROM_LEFT:
            r.gaps += 1
            x -= 1
        elif o == FROM_UPPER:
            r.gaps += 1
            y -= 1
        else:
            if q[x] == _N or t[y] == _N:
                r.neutral_matches += 1
            elif q[x] == t[y]:
                r.matches += 1
            else:
                r.mismatches += 1
            x -= 1
            y -= 1
    return r


def _align_oracle_int(query: bytes, target: bytes) -> AlignResult:
    """Exact-decimal (x10 integer) per-read reference implementation."""
    W, H = len(query), len(target)
    q = np.frombuffer(query, np.uint8)
    t = np.frombuffer(target, np.uint8)
    tb = np.where(np.arange(H) <= 3, 0, GAP * (np.arange(H) - 3))
    score = np.zeros((W, H), np.int64)
    origin = np.zeros((W, H), np.int8)

    def delta(x, y):
        if q[x] == _N and t[y] == _N:
            return 0
        if q[x] == _N or t[y] == _N:
            return NEUTRAL
        return MATCH if q[x] == t[y] else MISMATCH

    best = -(10**9)
    bx = by = 0
    for x in range(W):
        for y in range(H):
            up = (score[x, y - 1] if y > 0 else 0) + GAP
            left = (int(score[x - 1, y]) if x > 0 else int(tb[y])) + GAP
            if x > 0 and y > 0:
                ul = int(score[x - 1, y - 1])
            elif x == 0 and y > 0:
                ul = int(tb[y - 1])
            else:
                ul = 0
            ul += delta(x, y)
            if y > 3 and y - 3 > x:
                left = -1000000
            s, o = -(10**8), FROM_LEFT
            if ul > s:
                s, o = ul, FROM_UPPER_LEFT
            if up > s:
                s, o = up, FROM_UPPER
            if left > s:
                s, o = left, FROM_LEFT
            score[x, y] = s
            origin[x, y] = o
            if s > best:
                best, bx, by = s, x, y

    r = AlignResult()
    r.query_size, r.target_size = W, H
    r.query_end, r.target_end = bx, by
    x, y = bx, by
    while x >= 0 and y >= 0:
        o = origin[x, y]
        r.query_start, r.target_start = x, y
        if o == FROM_LEFT:
            r.gaps += 1
            x -= 1
        elif o == FROM_UPPER:
            r.gaps += 1
            y -= 1
        else:
            if q[x] == _N or t[y] == _N:
                r.neutral_matches += 1
            elif q[x] == t[y]:
                r.matches += 1
            else:
                r.mismatches += 1
            x -= 1
            y -= 1
    return r


# ---------------------------------------------------------------------------
# batched jnp engine (integer scores)
# ---------------------------------------------------------------------------

def _match_delta(qc, tc):
    """Integer-scaled nucleotide_match_score (sequence_alignment.h:157-169)."""
    both_n = (qc == _N) & (tc == _N)
    one_n = (qc == _N) | (tc == _N)
    return jnp.where(
        both_n, 0, jnp.where(one_n, NEUTRAL, jnp.where(qc == tc, MATCH, MISMATCH))
    ).astype(jnp.int32)


def align_batch(bases, lengths, adapter: bytes):
    """Batched half-local alignment of every read against one adapter.

    bases uint8 [B, L] (PAD=0 beyond lengths), adapter length H <= 100.
    Returns dict of int32 [B] arrays: matches, mismatches, gaps, neutral,
    query_start, query_end, target_start, target_end.

    Cells at x >= lengths[b] are excluded from the argmax so each read's
    matrix is exactly |read| x |adapter| like the reference's (the
    reference's grow-only matrix can scan stale heap bytes for
    mixed-length inputs -- undefined behavior we do not reproduce).
    """
    bases = jnp.asarray(bases)
    lengths = jnp.asarray(lengths)
    B, L = bases.shape
    t = jnp.asarray(np.frombuffer(adapter, np.uint8))
    H = len(adapter)
    ys = jnp.arange(H, dtype=jnp.int32)
    target_border = jnp.where(ys <= 3, 0, GAP * (ys - 3)).astype(jnp.int32)
    NEG = jnp.int32(-100000 * 10)

    gap_y = GAP * ys  # [H]

    def step(carry, x):
        prev, best, bx, by = carry  # prev: [B, H] previous column scores
        qc = bases[:, x].astype(jnp.int32)[:, None]  # [B, 1]
        delta = _match_delta(qc, t[None, :])  # [B, H]

        left_src = jnp.where(x > 0, prev, target_border[None, :])
        left = left_src + GAP
        # off-diagonal ban (sequence_alignment.cpp:385-389)
        ban = (ys > 3) & (ys - 3 > x)
        left = jnp.where(ban[None, :], NEG, left)

        upleft_src = jnp.where(
            x > 0,
            jnp.concatenate([jnp.zeros((B, 1), jnp.int32), prev[:, :-1]], axis=1),
            jnp.concatenate(
                [jnp.zeros((1,), jnp.int32), target_border[:-1]]
            )[None, :],
        )
        upleft = upleft_src + delta

        base = jnp.maximum(upleft, left)
        base_origin = jnp.where(left > upleft, FROM_LEFT, FROM_UPPER_LEFT).astype(jnp.int8)
        # up contribution at y=0 comes from query_border[x] == 0
        base0 = base.at[:, 0].max(0 + GAP)
        up0_wins = (0 + GAP) > base[:, 0]
        # cur[y] = max(base[y], cur[y-1] + GAP)  via cumulative max
        adj = base0 - gap_y[None, :]
        cm = jax.lax.cummax(adj, axis=1)
        cur = cm + gap_y[None, :]
        up_contrib = jnp.concatenate([jnp.full((B, 1), NEG), cur[:, :-1] + GAP], axis=1)
        up_wins = up_contrib > base
        up_wins = up_wins.at[:, 0].set(up0_wins)
        orig = jnp.where(up_wins, jnp.int8(FROM_UPPER), base_origin)

        # global max tracking: x-major, y-minor scan order, strict >
        valid = x < lengths  # [B]
        col_best = jnp.max(cur, axis=1)
        col_by = jnp.argmax(cur == col_best[:, None], axis=1).astype(jnp.int32)
        improve = valid & (col_best > best)
        best = jnp.where(improve, col_best, best)
        bx = jnp.where(improve, x, bx)
        by = jnp.where(improve, col_by, by)
        return (cur, best, bx, by), orig

    init = (
        jnp.zeros((B, H), jnp.int32),
        jnp.full((B,), -10000000, jnp.int32),
        jnp.zeros((B,), jnp.int32),
        jnp.zeros((B,), jnp.int32),
    )
    (final_col, best, bx, by), origins = jax.lax.scan(
        step, init, jnp.arange(L, dtype=jnp.int32)
    )
    # origins: [L, B, H] -> [B, L*H] for flat gathers
    origins = jnp.transpose(origins, (1, 0, 2)).reshape(B, L * H)

    # traceback (sequence_alignment.cpp:496-604), fixed trip count L+H
    def tb_step(carry, _):
        x, y, qs, ts, m, mm, g, nm = carry
        active = (x >= 0) & (y >= 0)
        xi = jnp.maximum(x, 0)
        yi = jnp.maximum(y, 0)
        o = jnp.take_along_axis(origins, (xi * H + yi)[:, None], axis=1)[:, 0]
        qc = jnp.take_along_axis(bases, xi[:, None], axis=1)[:, 0].astype(jnp.int32)
        tc = t[yi].astype(jnp.int32)

        qs = jnp.where(active, x, qs)
        ts = jnp.where(active, y, ts)

        is_left = active & (o == FROM_LEFT)
        is_up = active & (o == FROM_UPPER)
        is_ul = active & (o == FROM_UPPER_LEFT)
        both_n = (qc == _N) & (tc == _N)
        one_n = ((qc == _N) | (tc == _N))
        # match_value: 'N' if either is N (incl. both), else M/x
        g = g + (is_left | is_up)
        nm = nm + (is_ul & one_n)
        m = m + (is_ul & ~one_n & (qc == tc))
        mm = mm + (is_ul & ~one_n & (qc != tc))
        _ = both_n
        x = x - jnp.where(is_left | is_ul, 1, 0)
        y = y - jnp.where(is_up | is_ul, 1, 0)
        return (x, y, qs, ts, m, mm, g, nm), None

    zeros = jnp.zeros((B,), jnp.int32)
    (x, y, qs, ts, m, mm, g, nm), _ = jax.lax.scan(
        tb_step, (bx, by, zeros, zeros, zeros, zeros, zeros, zeros),
        None, length=L + H,
    )
    return {
        "matches": m,
        "mismatches": mm,
        "gaps": g,
        "neutral": nm,
        "query_start": qs,
        "query_end": bx,
        "target_start": ts,
        "target_end": by,
    }


align_batch_jit = jax.jit(align_batch, static_argnames=("adapter",))
