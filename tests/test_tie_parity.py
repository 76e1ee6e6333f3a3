"""Float-tie parity machinery (VERDICT r3 item #6).

The exact-decimal engines and the reference's float32 engine can
disagree only on exact decimal ties involving neutral (N) scores.  Three
pieces close the gap:

* align_batch_float32 — a vectorized float32 engine bit-faithful to the
  C's sequential fill (validated per read against align_oracle, itself
  differentially tested against the compiled C++);
* align_batch(tie_flag=True) — a conservative per-read fragility flag:
  every read where the two engines disagree MUST be flagged;
* callers re-run flagged reads through the float32 engine.
"""

import numpy as np
import pytest

from fastx_toolkit_tpu.kernels.align import (
    align_batch,
    align_batch_float32,
    align_oracle,
)

ADAPTER = b"CTGTAGGCACCATCAAT"
FIELDS = ("matches", "mismatches", "gaps", "neutral",
          "query_start", "query_end", "target_start", "target_end")


def _nlane(rng, B, L, n_rate=0.10):
    alpha = np.frombuffer(b"ACGTN", np.uint8)
    p = [(1 - n_rate) / 4] * 4 + [n_rate]
    bases = rng.choice(alpha, size=(B, L), p=p)
    pos = rng.integers(0, max(1, L - 5), B)
    for j, ch in enumerate(ADAPTER):
        m = (rng.random(B) < 0.5) & (pos + j < L)
        bases[m, (pos + j)[m]] = ch
    lengths = rng.integers(1, L + 1, B).astype(np.int32)
    return bases, lengths


def test_float32_batch_matches_oracle_per_read():
    rng = np.random.default_rng(17)
    B, L = 64, 60
    bases, lengths = _nlane(rng, B, L, n_rate=0.15)
    res = align_batch_float32(bases, lengths, ADAPTER)
    for i in range(B):
        q = bases[i, : lengths[i]].tobytes()
        o = align_oracle(q, ADAPTER)
        got = {
            "matches": o.matches, "mismatches": o.mismatches,
            "gaps": o.gaps, "neutral": o.neutral_matches,
            "query_start": o.query_start, "query_end": o.query_end,
            "target_start": o.target_start, "target_end": o.target_end,
        }
        for k in FIELDS:
            assert int(res[k][i]) == got[k], (i, k, q)


def test_float32_batch_matches_oracle_acgt_only():
    rng = np.random.default_rng(23)
    B, L = 48, 72
    bases, lengths = _nlane(rng, B, L, n_rate=0.0)
    res = align_batch_float32(bases, lengths, ADAPTER)
    resi = {k: np.asarray(v) for k, v in
            align_batch(bases, lengths, ADAPTER).items()}
    for i in range(B):
        q = bases[i, : lengths[i]].tobytes()
        o = align_oracle(q, ADAPTER)
        assert int(res["matches"][i]) == o.matches
        assert int(res["query_start"][i]) == o.query_start
    # N-free lanes: float and exact engines agree everywhere
    for k in FIELDS:
        np.testing.assert_array_equal(res[k], resi[k])


@pytest.mark.slow
def test_tie_flag_covers_every_divergence():
    """Every read where the exact engine differs from the float engine
    must carry tie_fragile; report the flag rate for the record."""
    rng = np.random.default_rng(31)
    B, L = 768, 80
    diverged = flagged = 0
    for trial in range(4):
        bases, lengths = _nlane(rng, B, L, n_rate=0.12 if trial % 2 else 0.04)
        ri = {k: np.asarray(v) for k, v in
              align_batch(bases, lengths, ADAPTER, tie_flag=True).items()}
        rf = align_batch_float32(bases, lengths, ADAPTER)
        flag = ri["tie_fragile"]
        differs = np.zeros(B, bool)
        for k in FIELDS:
            differs |= ri[k] != rf[k]
        assert not (differs & ~flag).any(), (
            "unflagged divergence at reads %s (trial %d)"
            % (np.nonzero(differs & ~flag)[0][:5], trial)
        )
        diverged += int(differs.sum())
        flagged += int(flag.sum())
    # sanity: the lanes above are N-heavy enough to produce real ties
    assert flagged > 0


def test_native_clip_float_matches_numpy():
    from fastx_toolkit_tpu.core import native

    if native.LIB is None:
        pytest.skip("native codec unavailable")
    rng = np.random.default_rng(47)
    B, L = 300, 90
    bases, lengths = _nlane(rng, B, L, n_rate=0.12)
    rn = native.clip_float(bases, lengths, ADAPTER)
    rp = align_batch_float32(bases, lengths, ADAPTER)
    for k in FIELDS:
        np.testing.assert_array_equal(np.asarray(rn[k]), np.asarray(rp[k]))


def test_cascades_agree_across_implementations():
    """The cutoff heuristics + discard cascade exist in three forms
    (ops/clipper jnp, engine/hostfix numpy, and inside clip_batch); on
    N-free inputs the float32 and exact engines coincide, so all three
    must produce identical (new_len, write, cat) — this pins them
    against drift."""
    import itertools

    from fastx_toolkit_tpu.engine import hostfix
    from fastx_toolkit_tpu.ops.clipper import (
        adapter_cutoff_index,
        clip_batch,
    )

    rng = np.random.default_rng(53)
    B, L = 128, 48
    bases, lengths = _nlane(rng, B, L, n_rate=0.0)
    quals = np.zeros((B, L), np.int8)
    for minlen, keep_n, dnc, dc, show, mal in itertools.product(
        (5, 15), (True, False), (False, True), (False,), (False, True), (0, 6)
    ):
        out = clip_batch(
            bases, quals, lengths, adapter=ADAPTER, min_length=minlen,
            keep_delta=0, discard_non_clipped=dnc, discard_clipped=dc,
            keep_n=keep_n, show_adapter_only=show, min_adapter_len=mal,
        )
        _b, _q, nl_j, wr_j, cat_j = out
        nl_n, wr_n, cat_n = hostfix.clip_decide_np(
            bases, lengths, ADAPTER, min_length=minlen, keep_delta=0,
            discard_non_clipped=dnc, discard_clipped=dc, keep_n=keep_n,
            show_adapter_only=show, min_adapter_len=mal,
        )
        np.testing.assert_array_equal(np.asarray(nl_j), nl_n)
        np.testing.assert_array_equal(np.asarray(wr_j), wr_n)
        np.testing.assert_array_equal(np.asarray(cat_j), cat_n)
    # the standalone numpy cutoff equals the jnp one on arbitrary stats
    res = {
        "matches": rng.integers(0, 18, B), "mismatches": rng.integers(0, 4, B),
        "gaps": rng.integers(0, 3, B), "neutral": rng.integers(0, 3, B),
        "query_start": rng.integers(0, L, B),
        "query_end": rng.integers(0, L, B),
        "target_start": rng.integers(0, 17, B),
        "target_end": rng.integers(0, 17, B),
    }
    for mal in (0, 7):
        np.testing.assert_array_equal(
            np.asarray(adapter_cutoff_index(res, lengths, min_adapter_len=mal)),
            hostfix.cutoff_index_np(res, lengths, mal),
        )
