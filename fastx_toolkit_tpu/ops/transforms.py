"""Per-read tool transforms as pure, vectorized JAX functions.

Each of the reference's per-record C loops (one tool = one while-loop over
records with an inner scan over bases) becomes a single masked transform
over a padded batch ``bases uint8 [B, L]`` / ``quals int8 [B, L]`` /
``lengths int32 [B]``.  All functions are jit-compatible: tool parameters
are static Python ints, shapes are static, no data-dependent control flow.

Conventions:
* ``bases`` hold raw ASCII bytes, 0 beyond ``lengths`` (PAD).
* every transform returns new arrays plus a ``keep`` bool mask; discarded
  rows are filtered host-side so device shapes stay static.
* padding is always re-zeroed after a transform so downstream ops can rely
  on it.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.records import BaseCode

_N = ord("N")


def _iota(bases):
    return jnp.arange(bases.shape[1], dtype=jnp.int32)[None, :]


def _in_len(bases, lengths):
    return _iota(bases) < lengths[:, None]


def _zero_pad(bases, quals, lengths):
    m = _in_len(bases, lengths)
    return jnp.where(m, bases, 0).astype(jnp.uint8), jnp.where(m, quals, 0)


def contains_n(bases, lengths):
    """True per read iff an 'N' occurs within the read (strchr, e.g.
    fastq_to_fasta.c:81-82)."""
    return ((bases == _N) & _in_len(bases, lengths)).any(axis=1)


# ---------------------------------------------------------------------------
# fastq_to_fasta (fastq_to_fasta.c:69-103)
# ---------------------------------------------------------------------------

def fastq_to_fasta_keep(bases, lengths, *, discard_n: bool):
    if discard_n:
        return ~contains_n(bases, lengths)
    return jnp.ones(bases.shape[0], dtype=bool)


# ---------------------------------------------------------------------------
# fastx_trimmer (fastx_trimmer.c:105-148)
# ---------------------------------------------------------------------------

def trimmer(bases, quals, lengths, *, first: int = 1, last: int = 0,
            trim_end: int = 0, min_len: int = 0):
    """Positional trim (-f/-l) or end trim (-t/-m); exact C semantics:

    * ``last`` truncates to that base (1-based, fastx_trimmer.c:122-124)
    * ``first`` drops the first ``first-1`` bases, shifting quality too;
      reads shorter than ``first`` are dropped (fastx_trimmer.c:126-134)
    * ``trim_end`` drops that many 3' bases; empty results and results
      shorter than ``min_len`` are dropped (fastx_trimmer.c:136-144)
    """
    keep = jnp.ones(bases.shape[0], dtype=bool)
    if last != 0:
        lengths = jnp.minimum(lengths, last)
    if first != 1:
        keep &= lengths >= first
        bases = bases[:, first - 1:]
        quals = quals[:, first - 1:]
        lengths = lengths - (first - 1)
    if trim_end > 0:
        keep &= lengths > trim_end
        lengths = lengths - trim_end
        keep &= lengths >= min_len
    lengths = jnp.maximum(lengths, 0)
    bases, quals = _zero_pad(bases, quals, lengths)
    return bases, quals, lengths, keep


# ---------------------------------------------------------------------------
# fastq_quality_filter (fastq_quality_filter.c:78-129)
# ---------------------------------------------------------------------------

def quality_filter_keep(quals, lengths, *, min_quality: int, min_percent: int):
    """Keep iff the (len*(100-p)/100)-th smallest quality >= q.

    The reference builds a counting-sort histogram and walks it
    (get_index_of_nth_element); that is exactly "the n-th order statistic"
    with n = count*(100-p)/100 using integer division.  sorted[n] >= q is
    equivalent to |{quality < q}| <= n, so no sort is needed — one masked
    count per read."""
    below = (_in_len(quals, lengths) & (quals < min_quality)).sum(
        axis=1, dtype=jnp.int32
    )
    n = (lengths * (100 - min_percent)) // 100
    return below <= n


# ---------------------------------------------------------------------------
# fastq_quality_trimmer (fastq_quality_trimmer.c:91-102)
# ---------------------------------------------------------------------------

def quality_trimmer(bases, quals, lengths, *, threshold: int, min_len: int):
    """Truncate the 3' run of bases with quality < threshold; keep iff the
    result is non-empty and >= min_len."""
    passing = _in_len(bases, lengths) & (quals >= threshold)
    pos1 = jnp.where(passing, _iota(bases) + 1, 0)
    new_len = jnp.max(pos1, axis=1).astype(jnp.int32)
    keep = (new_len > 0) & (new_len >= min_len)
    bases, quals = _zero_pad(bases, quals, new_len)
    return bases, quals, new_len, keep


# ---------------------------------------------------------------------------
# fastq_masker (fastq_masker.c:92-108)
# ---------------------------------------------------------------------------

def masker(bases, quals, lengths, *, threshold: int, mask_char: int):
    """Replace bases with quality < threshold by mask_char; returns
    (bases, masked_per_read_bool, masked_nucleotide_count_per_read)."""
    m = _in_len(bases, lengths) & (quals < threshold)
    bases = jnp.where(m, jnp.uint8(mask_char), bases)
    return bases, m.any(axis=1), m.sum(axis=1, dtype=jnp.int32)


# ---------------------------------------------------------------------------
# fastx_artifacts_filter (fastx_artifacts_filter.c:56-112)
# ---------------------------------------------------------------------------

def artifacts_keep(bases, lengths):
    """Discard iff any single base letter covers all but <=3 positions."""
    m = _in_len(bases, lengths)
    total = lengths
    worst = jnp.zeros(bases.shape[0], dtype=jnp.int32)
    for ch in b"ACGT":
        cnt = ((bases == ch) & m).sum(axis=1, dtype=jnp.int32)
        worst = jnp.maximum(worst, cnt)
    artifact = worst >= (total - 3)
    return ~artifact


# ---------------------------------------------------------------------------
# fastx_reverse_complement (fastx_reverse_complement.c:74-104)
# ---------------------------------------------------------------------------

# numpy, not jnp: avoid XLA backend init at import (pod startup order)
_COMPLEMENT_LUT = np.asarray(BaseCode.COMPLEMENT)


def reverse_complement(bases, quals, lengths, *, is_fastq: bool):
    comp = jnp.asarray(_COMPLEMENT_LUT)[bases.astype(jnp.int32)]
    idx = jnp.where(_in_len(bases, lengths), lengths[:, None] - 1 - _iota(bases), _iota(bases))
    rb = jnp.take_along_axis(comp, idx, axis=1)
    rq = jnp.take_along_axis(quals, idx, axis=1) if is_fastq else quals
    rb, rq = _zero_pad(rb, rq, lengths)
    return rb, rq


# ---------------------------------------------------------------------------
# fasta_nucleotide_changer (fasta_nucleotide_changer.c:101-113)
# ---------------------------------------------------------------------------

def nucleotide_changer(bases, lengths, *, rna_mode: bool):
    """-r: T->U (DNA-to-RNA); -d: U->T.  Returns (bases, changes_per_read,
    first_forbidden_pos per read or L if none)."""
    src, dst = (ord("T"), ord("U")) if rna_mode else (ord("U"), ord("T"))
    m = _in_len(bases, lengths)
    forbidden = m & (bases == dst)
    L = bases.shape[1]
    first_bad = jnp.where(forbidden.any(axis=1), jnp.argmax(forbidden, axis=1), L)
    hit = m & (bases == src)
    bases = jnp.where(hit, jnp.uint8(dst), bases)
    return bases, hit.sum(axis=1, dtype=jnp.int32), first_bad


# ---------------------------------------------------------------------------
# fastx_barcode_splitter matching (fastx_barcode_splitter.pl:208-276)
# ---------------------------------------------------------------------------

def barcode_match(bases, lengths, barcodes, barcode_lens, penalties, *,
                  bol: bool, barcodes_length: int):
    """Vectorized barcode matching.

    ``barcodes uint8 [K, barcodes_length]`` (zero-padded; partial variants
    already expanded, in file order), ``barcode_lens int32 [K]``,
    ``penalties int32 [K]`` = barcodes_length - len(barcode).

    Replicates the Perl mismatch_count + partial penalty: the fragment is
    the barcode-length prefix (bol) or suffix (eol) of the read; mismatches
    = fragment length - positional matches with the (possibly shorter)
    barcode, + penalty.  First best (strict <) wins, starting from
    best = barcodes_length (fastx_barcode_splitter.pl:227-254).

    Returns (best_index int32 [B], best_mm int32 [B]); best_index == -1
    means no barcode beat the initial best (Perl leaves ident undef and the
    read goes to 'unmatched').  Requires L >= barcodes_length (caller pads).
    """
    B, L = bases.shape
    cols = jnp.arange(barcodes_length, dtype=jnp.int32)[None, :]
    if bol:
        frag = bases[:, :barcodes_length]
    else:
        start = jnp.maximum(lengths - barcodes_length, 0)
        idx = jnp.minimum(start[:, None] + cols, jnp.maximum(L - 1, 0))
        frag = jnp.take_along_axis(bases, idx, axis=1)
    # perl substr just takes what exists; shorter reads yield a shorter
    # fragment -> missing positions never match
    frag_valid = cols < jnp.minimum(lengths, barcodes_length)[:, None]
    frag = jnp.where(frag_valid, frag, 0)
    frag_len = jnp.minimum(lengths, barcodes_length)

    # mismatches[b, k] = frag_len - sum_j(frag[b,j] == barcode[k,j] and
    # j < len(barcode[k]))  (perl xor-with-\0-padding semantics)
    bc_valid = jnp.arange(barcodes_length)[None, :] < barcode_lens[:, None]
    eq = (frag[:, None, :] == barcodes[None, :, :]) & bc_valid[None, :, :] & frag_valid[:, None, :]
    matches = eq.sum(axis=2, dtype=jnp.int32)
    mm = frag_len[:, None] - matches + penalties[None, :]

    # perl scans barcodes in file order keeping strict improvements over an
    # initial best of barcodes_length -> the winner is the FIRST occurrence
    # of the global minimum (jnp.argmin's tie rule), if it beats the start
    best0 = jnp.int32(barcodes_length)
    best_mm = jnp.min(mm, axis=1)
    best_idx = jnp.argmin(mm, axis=1).astype(jnp.int32)
    matched = best_mm < best0
    return jnp.where(matched, best_idx, -1), jnp.where(matched, best_mm, best0)
