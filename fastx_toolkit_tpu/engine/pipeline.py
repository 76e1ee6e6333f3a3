"""Host<->device batch plumbing + the fused preprocessing pipeline.

Keeps jit recompiles bounded by padding every batch to bucketed static
shapes: B to the next power of two (>=16), L to a multiple of 32.  Padding
rows have length 0 (all-PAD) and count 0 so masked transforms and
reductions ignore them by construction.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.records import ReadBatch
from ..ops import stats as stats_ops
from ..ops import transforms
from ..ops.clipper import clip_batch


def bucket_shape(b: int, l: int) -> tuple[int, int]:  # noqa: E741
    bb = 16
    while bb < b:
        bb *= 2
    ll = max(32, -(-l // 32) * 32)
    return bb, ll


def to_device(batch: ReadBatch, *, pad: bool = True):
    """ReadBatch -> (bases, quals, lengths, counts) padded numpy arrays
    ready for jnp; returns (arrays, real_B)."""
    b, l = batch.bases.shape  # noqa: E741
    if pad:
        bb, ll = bucket_shape(max(b, 1), max(l, 1))
    else:
        bb, ll = b, l
    bases = np.zeros((bb, ll), dtype=np.uint8)
    quals = np.zeros((bb, ll), dtype=np.int8)
    bases[:b, :l] = batch.bases
    quals[:b, :l] = batch.quals
    lengths = np.zeros(bb, dtype=np.int32)
    lengths[:b] = batch.lengths
    counts = np.zeros(bb, dtype=np.int32)
    counts[:b] = batch.counts
    return (bases, quals, lengths, counts), b


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Parameters of the flagship fused preprocessing step (the
    BASELINE.json headline config: trim + quality filter/trim/mask +
    adapter clip + artifacts filter + stats reduction)."""

    adapter: bytes = b"CTGTAGGCACCATCAAT"
    trim_last: int = 0
    filter_q: int = 20
    filter_p: int = 50
    trim_q: int = 20
    trim_minlen: int = 0
    mask_q: int = 20
    clip_minlen: int = 5
    # include the per-cycle stats reduction in the fused step (the
    # reference's headline chain has no stats stage; scatter-adds are the
    # most expensive non-DP op, so bench parity keeps this off)
    with_stats: bool = False
    # stage toggles: BASELINE.json's configs 1/2/4 are subsets of the
    # headline chain; disabling a quality stage also removes its
    # threshold bit-plane from the packed upload (see _thresholds)
    with_filter: bool = True
    with_qtrim: bool = True
    with_mask: bool = True
    with_clip: bool = True
    with_artifacts: bool = True
    # fastx_clipper -n (keep reads with N); the headline chain runs the
    # clipper after the masker, whose output the reference pipes with -n
    clip_keep_n: bool = True
    # trailing fastq_to_fasta stage: default-discard reads containing N
    # (fastq_to_fasta.c:81-82); rendering as FASTA is the caller's job
    to_fasta_discard_n: bool = False


def pipeline_body(bases, quals, lengths, counts, cfg: PipelineConfig,
                  psum_axis: Optional[str] = None, tie_flag: bool = False):
    """One fused device step over a read batch: every per-read tool of the
    reference applied back-to-back with no host round-trips, plus the
    per-cycle count reduction (psum'd over ``psum_axis`` when running
    under shard_map)."""
    b, q, l, c = bases, quals, lengths, counts  # noqa: E741
    b, q, l, keep = transforms.trimmer(b, q, l, last=cfg.trim_last)  # noqa: E741
    if cfg.with_filter:
        keep &= transforms.quality_filter_keep(
            q, l, min_quality=cfg.filter_q, min_percent=cfg.filter_p
        )
    if cfg.with_qtrim:
        b, q, l, k2 = transforms.quality_trimmer(  # noqa: E741
            b, q, l, threshold=cfg.trim_q, min_len=cfg.trim_minlen
        )
        keep &= k2
    if cfg.with_mask:
        b, _, _ = transforms.masker(b, q, l, threshold=cfg.mask_q, mask_char=ord("N"))
    fragile = jnp.zeros(b.shape[0], bool)
    if cfg.with_clip:
        out = clip_batch(
            b, q, l, adapter=cfg.adapter, min_length=cfg.clip_minlen, keep_delta=0,
            discard_non_clipped=False, discard_clipped=False, keep_n=cfg.clip_keep_n,
            show_adapter_only=False, min_adapter_len=0, tie_flag=tie_flag,
        )
        if tie_flag:
            b, q, l, wrote, _cat, fragile = out  # noqa: E741
        else:
            b, q, l, wrote, _cat = out  # noqa: E741
        keep &= wrote
    if cfg.with_artifacts:
        keep &= transforms.artifacts_keep(b, l)
    if cfg.to_fasta_discard_n:
        keep &= ~transforms.contains_n(b, l)
    l = jnp.where(keep, l, 0)  # noqa: E741
    if cfg.with_stats:
        count = stats_ops.counts_only(b, l, c)
    else:
        count = jnp.zeros((b.shape[1], stats_ops.NSLOTS), jnp.int32)
    if psum_axis is not None:
        count = jax.lax.psum(count, psum_axis)
    if tie_flag:
        return b, q, l, keep, count, fragile
    return b, q, l, keep, count


def fused_pipeline(cfg: PipelineConfig):
    """Single-device jitted pipeline step."""

    def step(bases, quals, lengths, counts):
        return pipeline_body(bases, quals, lengths, counts, cfg)

    return jax.jit(step)


# ---------------------------------------------------------------------------
# Packed upload path: 4-bit base codes + 1-bit quality planes
# ---------------------------------------------------------------------------
#
# On a host whose device link is thin (PCIe, or a network tunnel), the
# upload of the raw batch (1 byte/base + 1 byte/qual) dominates the whole
# pipeline — the fused step itself runs at HBM speed.  But the decisions
# pipeline never needs raw quality values on device:
#
# * quality_filter: "the n-th smallest quality >= q" is equivalent to
#   "|{qual < q}| <= n" (see quality_filter_keep), so a `qual < q` bit
#   suffices;
# * quality_trimmer / masker compare against a static threshold — again
#   one bit per base;
# * bases draw from the reference's allowed alphabet (ACGTN + optional
#   U/lowercase, fastx.c:56-84) — at most 12 letters + PAD = 4 bits.
#
# So the host ships 4 bits/base + one bit-plane per distinct threshold
# (~0.5+0.125*t bytes/base instead of 2), and the device unpacks with a
# few VPU shift/mask ops.  Byte-level edits (masking) are re-applied on
# host during rendering exactly as in the unpacked decisions path.

_ALPHABET = b"ACGTNUacgtnu"
_CODE_LUT = np.zeros(256, np.uint8)
for _i, _ch in enumerate(_ALPHABET, start=1):
    _CODE_LUT[_ch] = _i
_ASCII_LUT = np.zeros(16, np.uint8)
_ASCII_LUT[1 : len(_ALPHABET) + 1] = np.frombuffer(_ALPHABET, np.uint8)


def _thresholds(cfg: PipelineConfig) -> tuple[int, ...]:
    ts = []
    if cfg.with_filter:
        ts.append(cfg.filter_q)
    if cfg.with_qtrim:
        ts.append(cfg.trim_q)
    if cfg.with_mask:
        ts.append(cfg.mask_q)
    return tuple(dict.fromkeys(ts))


# 2-bit variant: when a chunk is pure uppercase ACGTN (codes 0..5 — the
# overwhelmingly common case for sequencer output), bases fit in 2 bits
# with Ns carried as one extra bit-plane alongside the quality planes.
_IS_ACGTN = np.zeros(256, bool)
for _ch in b"\0ACGTN":
    _IS_ACGTN[_ch] = True


def chunk_is_acgtn(bases: np.ndarray) -> bool:
    """True iff every byte is PAD/A/C/G/T/N (the 2-bit pack domain)."""
    return scan_alphabet(bases)[0]


def scan_alphabet(bases: np.ndarray) -> tuple[bool, bool]:
    """(pure_acgtn, has_n) for a chunk, one pass (native when available)."""
    if _native_ok(bases):
        from ..core import native

        return native.scan_alphabet(bases)
    return bool(_IS_ACGTN[bases].all()), bool((bases == ord("N")).any())


def pack_batch2(bases: np.ndarray, quals: np.ndarray, cfg: PipelineConfig,
                n_plane: bool = True):
    """2-bit pack for pure-ACGTN chunks: bases -> [B, ceil(L/4)] uint8
    (A=0 C=1 G=2 T=3; N/PAD positions carry garbage), planes ->
    [B, 1+T, ceil(L/8)] with plane 0 = `base == N` and planes 1.. the
    `qual < t` thresholds of pack_batch.  With ``n_plane=False`` (chunk
    verified N-free) the N plane is omitted entirely.  Uses the fused
    one-pass C++ kernel when available (fx_pack2); the numpy fallback is
    layout-identical."""
    if _native_ok(bases, quals):
        from ..core import native

        return native.pack2(bases, quals, _thresholds(cfg), n_plane)
    B, L = bases.shape  # noqa: E741
    codes = np.clip(_CODE_LUT[bases].astype(np.int16) - 1, 0, 3).astype(np.uint8)
    rem = (-L) % 4
    if rem:
        codes = np.concatenate([codes, np.zeros((B, rem), np.uint8)], axis=1)
    b2 = (
        (codes[:, 0::4] << 6) | (codes[:, 1::4] << 4)
        | (codes[:, 2::4] << 2) | codes[:, 3::4]
    )
    head = [np.packbits(bases == ord("N"), axis=1)] if n_plane else []
    planes = np.stack(
        head + [np.packbits(quals < t, axis=1) for t in _thresholds(cfg)],
        axis=1,
    )
    return b2, planes


def _unpack2(b2, planes, has_n_plane: bool = True):
    """Invert pack_batch2 -> (ascii bases [B, Le], q_lt [B, T, Le]) with
    Le = 4*b2.shape[1]; positions beyond the true L hold garbage letters
    that every consumer masks out via lengths."""
    B = b2.shape[0]
    le = b2.shape[1] * 4
    codes = jnp.stack(
        [(b2 >> 6) & 3, (b2 >> 4) & 3, (b2 >> 2) & 3, b2 & 3], axis=2
    ).reshape(B, le).astype(jnp.int32)
    # letter via selects, not a table gather (XLA gathers serialize on TPU)
    bases = jnp.where(
        codes < 2,
        jnp.where(codes == 0, ord("A"), ord("C")),
        jnp.where(codes == 2, ord("G"), ord("T")),
    ).astype(jnp.uint8)
    if planes.shape[1] == 0:  # no thresholds and no N plane shipped
        return bases, jnp.zeros((B, 0, le), bool)
    shifts = jnp.arange(7, -1, -1, dtype=planes.dtype)
    bits = (planes[:, :, :, None] >> shifts) & 1
    all_planes = bits.reshape(B, planes.shape[1], -1)[:, :, :le].astype(bool)
    if has_n_plane:
        bases = jnp.where(all_planes[:, 0], jnp.uint8(ord("N")), bases)
        return bases, all_planes[:, 1:]
    return bases, all_planes


def _native_ok(*arrays) -> bool:
    from ..core import native

    return native.LIB is not None and all(
        a.flags["C_CONTIGUOUS"] for a in arrays
    )


def pack_batch(bases: np.ndarray, quals: np.ndarray, cfg: PipelineConfig):
    """Host side: bases -> 4-bit codes [B, ceil(L/2)] uint8, quals -> one
    `qual < t` bit-plane per distinct threshold [B, T, ceil(L/8)] uint8
    (MSB-first).  Uses the fused one-pass C++ kernel when available
    (native/fastx_codec.cpp fx_pack4); the numpy fallback is
    layout-identical (tests/test_packed.py)."""
    if _native_ok(bases, quals):
        from ..core import native

        return native.pack4(bases, quals, _thresholds(cfg))
    B, L = bases.shape  # noqa: E741
    codes = _CODE_LUT[bases]
    if L % 2:
        codes = np.concatenate([codes, np.zeros((B, 1), np.uint8)], axis=1)
    b4 = (codes[:, 0::2] << 4) | codes[:, 1::2]
    planes = np.stack(
        [np.packbits(quals < t, axis=1) for t in _thresholds(cfg)], axis=1
    )
    return b4, planes


def _unpack4(b4, planes):
    """Device side: invert pack_batch -> (ascii bases [B, Le], q_lt bool
    [B, T, Le]) with Le = 2*b4.shape[1] (>= true L; the surplus column is
    PAD and masked out by lengths everywhere)."""
    B = b4.shape[0]
    le = b4.shape[1] * 2
    hi = (b4 >> 4) & 0xF
    lo = b4 & 0xF
    codes = jnp.stack([hi, lo], axis=2).reshape(B, le).astype(jnp.int32)
    # 16-entry LUT via a select tree, not a gather
    lut = _ASCII_LUT
    bases = jnp.full(codes.shape, lut[0], jnp.uint8)
    for ci in range(1, 16):
        if lut[ci]:
            bases = jnp.where(codes == ci, jnp.uint8(lut[ci]), bases)
    if planes.shape[1] == 0:  # no thresholds shipped
        return bases, jnp.zeros((B, 0, le), bool)
    shifts = jnp.arange(7, -1, -1, dtype=planes.dtype)
    bits = (planes[:, :, :, None] >> shifts) & 1
    q_lt = bits.reshape(B, planes.shape[1], -1)[:, :, :le].astype(bool)
    return bases, q_lt


def packed_pipeline_body(b4, planes, lengths, counts, cfg: PipelineConfig,
                         psum_axis: Optional[str] = None,
                         seq_len: Optional[int] = None,
                         two_bit: bool = False,
                         has_n_plane: Optional[bool] = None,
                         tie_flag: bool = False):
    """pipeline_body on the packed representation; decisions-identical to
    the unpacked version (tests/test_packed.py).  ``seq_len`` is the true
    (pre-packing) L — only needed when L is not a multiple of the pack
    width, to shape the per-cycle count output like the unpacked
    pipeline.  ``two_bit`` selects the pack_batch2 layout;
    ``has_n_plane=False`` (2-bit only) means the chunk was verified
    N-free and the N plane was not shipped.  ``counts=None`` is allowed
    when ``cfg.with_stats`` is off (they are only read by the stats
    reduction; not shipping them saves 4 bytes/read)."""
    if has_n_plane is None:
        has_n_plane = two_bit
    lengths = lengths.astype(jnp.int32)
    b, q_lt = (
        _unpack2(b4, planes, has_n_plane) if two_bit else _unpack4(b4, planes)
    )
    if seq_len is not None and seq_len < b.shape[1]:
        b = b[:, :seq_len]
        q_lt = q_lt[:, :, :seq_len]
    thr = {t: i for i, t in enumerate(_thresholds(cfg))}
    l = lengths  # noqa: E741
    iota = jnp.arange(b.shape[1], dtype=jnp.int32)[None, :]
    keep = jnp.ones(b.shape[0], dtype=bool)

    if cfg.trim_last != 0:  # fastx_trimmer -l (positional; quals untouched)
        l = jnp.minimum(l, cfg.trim_last)  # noqa: E741
    in_len = iota < l[:, None]

    if cfg.with_filter:
        # fastq_quality_filter: |{qual < q}| <= len*(100-p)/100
        below = (in_len & q_lt[:, thr[cfg.filter_q]]).sum(axis=1, dtype=jnp.int32)
        keep &= below <= (l * (100 - cfg.filter_p)) // 100

    if cfg.with_qtrim:
        # fastq_quality_trimmer: drop the 3' run of qual < t
        passing = in_len & ~q_lt[:, thr[cfg.trim_q]]
        new_len = jnp.max(jnp.where(passing, iota + 1, 0), axis=1).astype(jnp.int32)
        keep &= (new_len > 0) & (new_len >= cfg.trim_minlen)
        l = new_len  # noqa: E741
        in_len = iota < l[:, None]

    if cfg.with_mask:
        # fastq_masker: the clipper/artifacts stages see the masked bases
        masked = in_len & q_lt[:, thr[cfg.mask_q]]
        b = jnp.where(masked, jnp.uint8(ord("N")), b)
    b = jnp.where(in_len, b, 0).astype(jnp.uint8)

    fragile = jnp.zeros(b.shape[0], bool)
    if cfg.with_clip:
        dummy_q = jnp.zeros(b.shape, jnp.int8)  # decisions never read quals
        out = clip_batch(
            b, dummy_q, l, adapter=cfg.adapter, min_length=cfg.clip_minlen,
            keep_delta=0, discard_non_clipped=False, discard_clipped=False,
            keep_n=cfg.clip_keep_n, show_adapter_only=False, min_adapter_len=0,
            tie_flag=tie_flag,
        )
        if tie_flag:
            b, _, l, wrote, _cat, fragile = out  # noqa: E741
        else:
            b, _, l, wrote, _cat = out  # noqa: E741
        keep &= wrote
    if cfg.with_artifacts:
        keep &= transforms.artifacts_keep(b, l)
    if cfg.to_fasta_discard_n:
        keep &= ~transforms.contains_n(b, l)
    l = jnp.where(keep, l, 0)  # noqa: E741
    if cfg.with_stats:
        assert counts is not None, "with_stats needs the counts column"
        count = stats_ops.counts_only(b, l, counts)
    else:
        count = jnp.zeros((b.shape[1], stats_ops.NSLOTS), jnp.int32)
    if psum_axis is not None:
        count = jax.lax.psum(count, psum_axis)
    if tie_flag:
        return l, keep, count, fragile
    return l, keep, count


# ---------------------------------------------------------------------------
# Fully-packed decisions path: no unpacked [B, L] representation anywhere
# ---------------------------------------------------------------------------
#
# The round-3 packed pipeline still unpacked everything ON DEVICE: bool
# [B, T, L] quality planes, ASCII bases, and an int32 [L, B] transpose
# feeding the DP kernel — ~2 KB of HBM round-trips per 100 bp read for a
# decisions output of 5 bytes.  This path keeps every operand packed:
#
# * quality filter  — popcount over the `qual < q` plane bytes;
# * quality trimmer — last passing position via lowest-set-bit tricks on
#   the plane bytes (the 3' run boundary), no bit unpack;
# * masker          — its only decision-path effect is "masked positions
#   look like N downstream"; that is one byte-OR into the N plane;
# * clipper DP      — kernels/align_pallas.py::align_batch_pallas_packed
#   reads the 2-bit words + the N|mask plane words directly;
# * artifacts/N     — kernels/counts_pallas.py::packed_counts_pallas.
#
# Decisions are bit-identical to packed_pipeline_body (tests/
# test_packed_fast.py); FASTX_TPU_NO_PACKED_DECIDE=1 forces the old
# body for differential debugging.


def _valid_bits_mask(l, nb: int):  # noqa: E741
    """[B] lengths -> [B, nb] uint8: the MSB-first valid-bit mask of each
    plane byte (bit k of byte b covers position 8*b + (7-k))."""
    bi = jnp.arange(nb, dtype=jnp.int32)[None, :]
    nvalid = jnp.clip(l[:, None].astype(jnp.int32) - 8 * bi, 0, 8)
    return ((jnp.int32(0xFF00) >> nvalid) & 0xFF).astype(jnp.uint8)


def _words_T(bytes2d, need_bytes: int):
    """[B, nb] uint8 -> [need_bytes//4, B] uint32 (little-endian words,
    zero-padded columns, transposed for the packed kernels)."""
    B, nb = bytes2d.shape
    if nb < need_bytes:
        bytes2d = jnp.concatenate(
            [bytes2d, jnp.zeros((B, need_bytes - nb), jnp.uint8)], axis=1
        )
    elif nb > need_bytes:
        bytes2d = bytes2d[:, :need_bytes]
    w = jax.lax.bitcast_convert_type(
        bytes2d.reshape(B, need_bytes // 4, 4), jnp.uint32
    )
    return w.T


def _pad_rows(a, Bp: int):
    if a.shape[-1] == Bp:
        return a
    pad = [(0, 0)] * (a.ndim - 1) + [(0, Bp - a.shape[-1])]
    return jnp.pad(a, pad)


def packed_fast_ok(cfg: PipelineConfig, two_bit: bool, B: int, Le: int) -> bool:
    """Static (trace-time) gate for the fully-packed decisions body."""
    import os

    from ..kernels.align_pallas import (
        adapter_codes,
        packed_tile_for,
        pallas_bounds_ok,
    )

    if not two_bit or cfg.with_stats:
        return False
    if os.environ.get("FASTX_TPU_NO_PACKED_DECIDE"):
        return False
    force = os.environ.get("FASTX_TPU_PACKED_DECIDE") == "force"
    platform = jax.devices()[0].platform
    if platform not in ("tpu", "axon") and not force:
        return False
    if B < 1024 and not force:
        return False
    if B % 1024 != 0:
        return False
    if Le > 2048:  # full word columns live in VMEM (align_pallas specs)
        return False
    if cfg.with_clip:
        H = len(cfg.adapter)
        if adapter_codes(cfg.adapter) is None:
            return False
        if not pallas_bounds_ok(Le, H) or packed_tile_for(H) is None:
            return False
    return True


def packed_fast_body(b2, planes, lengths, cfg: PipelineConfig,
                     has_n_plane: bool, tie_flag: bool = False):
    """The fully-packed decisions step (see block comment above).
    Returns (l, keep, count) exactly like packed_pipeline_body."""
    import os

    from ..kernels.align_pallas import (
        align_batch_pallas_packed,
        packed_tile_for,
    )
    from ..kernels.counts_pallas import packed_counts_pallas
    from ..ops.clipper import (
        adapter_cutoff_index,
        clip_cut_lengths,
        clip_write_mask,
    )

    interp = jax.devices()[0].platform not in ("tpu", "axon")
    B, nb4 = b2.shape
    Le = nb4 * 4
    nb8 = planes.shape[2]
    thr = {t: i for i, t in enumerate(_thresholds(cfg))}
    base = 1 if has_n_plane else 0
    l = lengths.astype(jnp.int32)  # noqa: E741
    keep = jnp.ones(B, dtype=bool)

    if cfg.trim_last != 0:  # fastx_trimmer -l
        l = jnp.minimum(l, cfg.trim_last)  # noqa: E741
    vmask = _valid_bits_mask(l, nb8)

    if cfg.with_filter:
        pf = planes[:, base + thr[cfg.filter_q]] & vmask
        below = jax.lax.population_count(pf).sum(axis=1).astype(jnp.int32)
        keep &= below <= (l * (100 - cfg.filter_p)) // 100

    if cfg.with_qtrim:
        # last position with `qual >= t` within l: per byte, the lowest
        # set bit of the masked pass-bits is the highest such position
        pt = planes[:, base + thr[cfg.trim_q]]
        v = ((~pt) & vmask).astype(jnp.int32)
        low = v & -v
        tz = jax.lax.population_count(low - 1)  # log2(low) when v != 0
        bi = jnp.arange(nb8, dtype=jnp.int32)[None, :]
        cand = jnp.where(v > 0, 8 * bi + 8 - tz, 0)
        new_l = jnp.max(cand, axis=1).astype(jnp.int32)
        keep &= (new_l > 0) & (new_l >= cfg.trim_minlen)
        l = new_l  # noqa: E741

    # effective-N plane: input Ns OR masked positions (the masker's only
    # decision-path effect); positions beyond the read are 0 by packing
    parts = []
    if has_n_plane:
        parts.append(planes[:, 0])
    if cfg.with_mask:
        parts.append(planes[:, base + thr[cfg.mask_q]])
    nmb = None
    for p in parts:
        nmb = p if nmb is None else (nmb | p)

    need_counts = (
        cfg.with_artifacts
        or cfg.to_fasta_discard_n
        or (cfg.with_clip and not cfg.clip_keep_n)
    )
    i_cut = None
    if cfg.with_clip or need_counts:
        L32 = -(-Le // 32) * 32
        # an N-free batch with an ACGT adapter runs the flag-free kernel
        # even under tie_flag (align_batch_pallas_packed's provably-zero
        # shortcut), so the tile choice must match that variant
        from ..kernels.align_pallas import adapter_codes

        acodes = adapter_codes(cfg.adapter)
        eff_tie = tie_flag and (
            nmb is not None or acodes is None or any(c >= 4 for c in acodes)
        )
        tile = (packed_tile_for(len(cfg.adapter), eff_tie)
                if cfg.with_clip else 2048)
        Bp = -(-B // tile) * tile
        b2w = _pad_rows(_words_T(b2, L32 // 4), Bp)
        nmw = None if nmb is None else _pad_rows(_words_T(nmb, L32 // 8), Bp)
        l_p = _pad_rows(l, Bp)

    if cfg.with_clip:
        res = align_batch_pallas_packed(
            b2w, nmw, l_p, cfg.adapter, L=Le, tile_b=tile, interpret=interp,
            tie_flag=tie_flag,
        )
        if Bp != B:
            res = {k: v[:B] for k, v in res.items()}
        i_cut = adapter_cutoff_index(res, l, min_adapter_len=0)
        new_len = clip_cut_lengths(i_cut, l, 0)
    else:
        new_len = l

    has_n = jnp.zeros(B, dtype=bool)
    worst = None
    if need_counts:
        worst, ncnt = packed_counts_pallas(
            b2w, nmw, _pad_rows(new_len, Bp), tile_b=tile, interpret=interp
        )
        worst, ncnt = worst[:B], ncnt[:B]
        has_n = ncnt > 0

    if cfg.with_clip:
        keep &= clip_write_mask(
            i_cut, new_len, has_n, min_length=cfg.clip_minlen,
            keep_n=cfg.clip_keep_n,
        )
        l = new_len  # noqa: E741
    if cfg.with_artifacts:
        keep &= ~(worst >= l - 3)
    if cfg.to_fasta_discard_n:
        keep &= ~has_n
    l = jnp.where(keep, l, 0)  # noqa: E741
    count = jnp.zeros((Le, stats_ops.NSLOTS), jnp.int32)
    if tie_flag:
        fragile = (res["tie_fragile"][:B] if cfg.with_clip
                   else jnp.zeros(B, bool))
        return l, keep, count, fragile
    return l, keep, count


def packed_decisions_pipeline(cfg: PipelineConfig,
                              seq_len: Optional[int] = None,
                              two_bit: bool = False,
                              has_n_plane: Optional[bool] = None,
                              tie_flag: bool = False):
    """decisions_pipeline over the packed upload (see pack_batch /
    pack_batch2).  When ``cfg.with_stats`` is off the step takes no
    counts argument (it would be dead weight on the device link).

    2-bit batches of TPU-worthy size take the fully-packed body
    (packed_fast_body) — no unpacked [B, L] representation is ever
    materialized; other shapes take the original unpack body.  Both are
    decision-identical (tests/test_packed_fast.py)."""

    hnp = two_bit if has_n_plane is None else has_n_plane

    if cfg.with_stats:
        def step(b4, planes, lengths, counts):
            return packed_pipeline_body(b4, planes, lengths, counts, cfg,
                                        seq_len=seq_len, two_bit=two_bit,
                                        has_n_plane=has_n_plane)
    else:
        def step(b4, planes, lengths):
            if packed_fast_ok(cfg, two_bit, b4.shape[0], b4.shape[1] * 4):
                return packed_fast_body(b4, planes, lengths, cfg, hnp,
                                        tie_flag=tie_flag)
            return packed_pipeline_body(b4, planes, lengths, None, cfg,
                                        seq_len=seq_len, two_bit=two_bit,
                                        has_n_plane=has_n_plane,
                                        tie_flag=tie_flag)

    return jax.jit(step)


def decisions_pipeline(cfg: PipelineConfig, tie_flag: bool = False):
    """Ship decisions, not data: same fused step but returning ONLY small
    per-read scalars (final length, keep mask, per-cycle counts).

    Rationale: every byte-level edit of this pipeline (the masker's
    N-substitutions) is recomputable on host in one vectorized pass from
    data the host already holds, while the expensive decisions (alignment
    cutoff, filters, trim lengths) need the device.  Returning 5 bytes per
    read instead of the 2 x L transformed tensors makes the device->host
    link (PCIe, or worse a tunnel) a non-factor.  The host renderer
    applies ``quals < mask_q`` masking itself (see render path in bench.py
    and the CLI masker).
    """

    def step(bases, quals, lengths, counts):
        out = pipeline_body(bases, quals, lengths, counts, cfg,
                            tie_flag=tie_flag)
        if tie_flag:
            _b, _q, l, keep, count, fragile = out  # noqa: E741
            return l, keep, count, fragile
        _b, _q, l, keep, count = out  # noqa: E741
        return l, keep, count

    return jax.jit(step)
