"""ctypes loader for the native codec hot loops (native/fastx_codec.cpp).

Builds the shared library on first use if a compiler is available and the
.so is missing/stale; every caller must handle ``LIB is None`` with the
numpy fallback, so environments without a toolchain still work.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_ROOT, "native", "fastx_codec.cpp")
_SO = os.path.join(_ROOT, "native", "libfastx_codec.so")

_i64p = ctypes.POINTER(ctypes.c_int64)
_i32p = ctypes.POINTER(ctypes.c_int32)
_u8p = ctypes.POINTER(ctypes.c_uint8)
_i8p = ctypes.POINTER(ctypes.c_int8)

# native hot-loop thread count: 0 = auto (hardware_concurrency); set
# FASTX_NATIVE_THREADS=1 when running several cooperating processes on
# one machine (e.g. fastx_pod scaling runs) so they don't oversubscribe
_NT = int(os.environ.get("FASTX_NATIVE_THREADS", "0"))


_CXXFLAGS = ["-O3", "-march=native", "-shared", "-fPIC", "-pthread"]
_META = _SO + ".meta"


def _build_key() -> str:
    """Content+toolchain+microarchitecture key for the built artifact.

    The library compiles with -march=native, so a binary built on one
    host can be illegal instructions on another; keying the rebuild on
    (source sha256, flags, machine, g++ version, -march=native target
    flags) instead of file mtimes means a stale or foreign .so is always
    rebuilt, never loaded (VERDICT r3 item #7)."""
    import hashlib
    import platform

    h = hashlib.sha256()
    with open(_SRC, "rb") as fh:
        h.update(fh.read())
    h.update(" ".join(_CXXFLAGS).encode())
    h.update(platform.machine().encode())
    try:
        probe = subprocess.run(
            ["g++", "-march=native", "-E", "-v", "-x", "c++", "/dev/null"],
            capture_output=True, timeout=30,
        )
        # the cc1plus invocation line carries the resolved -march/-mtune
        # and feature flags for THIS host's microarchitecture
        for line in probe.stderr.decode(errors="replace").splitlines():
            if "cc1plus" in line or line.startswith("gcc version"):
                h.update(line.encode())
    except Exception:
        h.update(b"no-g++-probe")
    return h.hexdigest()


def _build(key: str) -> bool:
    try:
        subprocess.run(
            ["g++", *_CXXFLAGS, "-o", _SO, _SRC],
            check=True, capture_output=True, timeout=120,
        )
        with open(_META, "w") as fh:
            fh.write(key + "\n" + _fast_sig())
        return True
    except Exception:
        return False


def _fast_sig() -> str:
    """Cheap per-import signature: source (mtime, size) + machine.  Used
    to skip the full hash + g++ probe on the overwhelmingly common case
    (nothing changed since the artifact was built)."""
    import platform

    st = os.stat(_SRC)
    return "%d:%d:%s" % (st.st_mtime_ns, st.st_size, platform.machine())


def _load():
    if not os.path.exists(_SRC):
        return None
    # fast path: the meta's second line caches the (mtime, size, machine)
    # signature observed when the artifact was built/validated; a match
    # skips the sha256 + 'g++ -march=native' probe entirely (~50 ms of
    # CLI startup)
    try:
        fast = _fast_sig()
    except OSError:
        return None
    stale = True
    key = None
    if os.path.exists(_SO) and os.path.exists(_META):
        try:
            with open(_META) as fh:
                lines = fh.read().splitlines()
            if len(lines) >= 2 and lines[1] == fast:
                stale = False
            else:
                key = _build_key()
                stale = lines[:1] != [key]
        except OSError:
            stale = True
    if stale:
        if key is None:
            try:
                key = _build_key()
            except OSError:
                return None
        if not _build(key):
            return None
    elif key is not None:
        # content matched but the fast signature didn't (e.g. a touch):
        # refresh the cached signature
        with open(_META, "w") as fh:
            fh.write(key + "\n" + fast)
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.fx_gather_rows.argtypes = [_u8p, _i64p, _i64p, ctypes.c_int64,
                                   ctypes.c_int64, _u8p, ctypes.c_int]
    lib.fx_validate_rows.argtypes = [_u8p, _i64p, _i64p, ctypes.c_int64, _u8p]
    lib.fx_validate_rows.restype = ctypes.c_int64
    lib.fx_quals_from_ascii.argtypes = [_u8p, _i64p, _i64p, ctypes.c_int64,
                                        ctypes.c_int64, ctypes.c_int, _i8p,
                                        ctypes.c_int]
    lib.fx_quals_from_ascii.restype = ctypes.c_int64
    lib.fx_fastq_sizes.argtypes = [_i64p, _i64p, _i32p, ctypes.c_int64, _i64p]
    lib.fx_fasta_sizes.argtypes = [_i64p, _i32p, ctypes.c_int64, _i64p]
    lib.fx_render_fastq.argtypes = [_u8p, _i8p, _i32p, ctypes.c_int64,
                                    ctypes.c_int64, _u8p, _i64p, _u8p, _i64p,
                                    _i64p, ctypes.c_int, _u8p, _u8p,
                                    ctypes.c_int, ctypes.c_int, ctypes.c_uint8,
                                    ctypes.c_int]
    lib.fx_render_fasta.argtypes = [_u8p, _i32p, ctypes.c_int64, ctypes.c_int64,
                                    _u8p, _i64p, _i64p, _u8p, _u8p,
                                    ctypes.c_int]
    lib.fx_index_lines.argtypes = [_u8p, ctypes.c_int64, _i64p,
                                   ctypes.POINTER(ctypes.c_int32)]
    lib.fx_index_lines.restype = ctypes.c_int64
    lib.fx_gather_flat.argtypes = [_u8p, _i64p, _i64p, _i64p, ctypes.c_int64,
                                   _u8p, ctypes.c_int]
    lib.fx_scan_alphabet.argtypes = [_u8p, ctypes.c_int64]
    lib.fx_scan_alphabet.restype = ctypes.c_int32
    lib.fx_pack2.argtypes = [_u8p, _i8p, ctypes.c_int64, ctypes.c_int64,
                             _i8p, ctypes.c_int, ctypes.c_int, _u8p, _u8p,
                             ctypes.c_int]
    lib.fx_pack4.argtypes = [_u8p, _i8p, ctypes.c_int64, ctypes.c_int64,
                             _i8p, ctypes.c_int, _u8p, _u8p, ctypes.c_int]
    lib.fx_stats_hist_q.argtypes = [_u8p, _i8p, _i32p, ctypes.c_int64,
                                    ctypes.c_int64, _i64p, ctypes.c_int]
    lib.fx_stats_counts.argtypes = [_u8p, _i32p, _i32p, ctypes.c_int64,
                                    ctypes.c_int64, _i64p, ctypes.c_int]
    lib.fx_dedup_new.argtypes = [ctypes.c_int]
    lib.fx_dedup_new.restype = ctypes.c_void_p
    lib.fx_dedup_free.argtypes = [ctypes.c_void_p]
    lib.fx_dedup_insert.argtypes = [ctypes.c_void_p, _u8p, ctypes.c_int64,
                                    ctypes.c_int64, _i32p, _i32p,
                                    ctypes.c_int64, ctypes.c_int]
    lib.fx_dedup_count.argtypes = [ctypes.c_void_p]
    lib.fx_dedup_count.restype = ctypes.c_int64
    lib.fx_dedup_key_bytes.argtypes = [ctypes.c_void_p]
    lib.fx_dedup_key_bytes.restype = ctypes.c_int64
    lib.fx_dedup_extract.argtypes = [ctypes.c_void_p, _i64p, _i32p, _i64p,
                                     _i64p, _u8p]
    lib.fx_validate_records.argtypes = [_u8p, _i64p, _i64p, _i64p,
                                        ctypes.c_int64, _u8p, ctypes.c_int,
                                        ctypes.c_int, ctypes.c_int]
    lib.fx_validate_records.restype = ctypes.c_int64
    lib.fx_stats_lines_q.argtypes = [_u8p, _i64p, _i64p, _i64p,
                                     ctypes.c_int64, ctypes.c_int64,
                                     ctypes.c_int, _i64p, ctypes.c_int]
    lib.fx_dedup_insert_lines.argtypes = [ctypes.c_void_p, _u8p, _i64p,
                                          _i64p, _i32p, ctypes.c_int64,
                                          ctypes.c_int64, ctypes.c_int]
    lib.fx_counts_from_names.argtypes = [_u8p, _i64p, _i64p,
                                         ctypes.c_int64, _i32p,
                                         ctypes.c_int]
    lib.fx_scan_lines.argtypes = [_u8p, _i64p, _i64p, ctypes.c_int64]
    lib.fx_scan_lines.restype = ctypes.c_int32
    lib.fx_pack2_lines.argtypes = [_u8p, _i64p, _i64p, _i64p,
                                   ctypes.c_int64, ctypes.c_int64, _i32p,
                                   ctypes.c_int, ctypes.c_int, _u8p, _u8p,
                                   ctypes.c_int]
    lib.fx_render_fastq_lines.argtypes = [_u8p, _i64p, _i64p, _i64p, _i64p,
                                          _i64p, _i64p, _i32p,
                                          ctypes.c_int64, _i64p, _u8p, _u8p,
                                          ctypes.c_int, ctypes.c_int,
                                          ctypes.c_uint8, ctypes.c_int]
    lib.fx_render_fasta_lines.argtypes = [_u8p, _i64p, _i64p, _i64p, _i64p,
                                          _i32p, ctypes.c_int64, _i64p,
                                          _u8p, _u8p, ctypes.c_int,
                                          ctypes.c_int, ctypes.c_uint8,
                                          ctypes.c_int]
    lib.fx_quality_decide.argtypes = [_u8p, _i64p, _i64p, ctypes.c_int64,
                                      ctypes.c_int, ctypes.c_int,
                                      ctypes.c_int, ctypes.c_int,
                                      ctypes.c_int, ctypes.c_int64,
                                      ctypes.c_int, _i32p, _u8p, _i64p,
                                      ctypes.c_int]
    lib.fx_rows_with_n.argtypes = [_u8p, _i64p, _i64p, ctypes.c_int64,
                                   _u8p, ctypes.c_int]
    lib.fx_artifacts_rows.argtypes = [_u8p, _i64p, _i64p, ctypes.c_int64,
                                      _u8p, ctypes.c_int]
    lib.fx_clip_float.argtypes = [_u8p, _i32p, ctypes.c_int64,
                                  ctypes.c_int64, _u8p, ctypes.c_int64,
                                  _i32p, ctypes.c_int]
    return lib


LIB = _load()


def ptr(a: np.ndarray, t):
    return a.ctypes.data_as(t)


def gather_rows(buf: np.ndarray, starts: np.ndarray, lens: np.ndarray,
                width: int) -> np.ndarray:
    n = len(starts)
    out = np.empty((n, width), np.uint8)
    LIB.fx_gather_rows(
        ptr(buf, _u8p), ptr(starts, _i64p), ptr(lens, _i64p), n, width,
        ptr(out, _u8p), _NT,
    )
    return out


def validate_rows(buf, starts, lens, allowed_u8) -> int:
    return int(
        LIB.fx_validate_rows(
            ptr(buf, _u8p), ptr(starts, _i64p), ptr(lens, _i64p), len(starts),
            ptr(allowed_u8, _u8p),
        )
    )


def quals_from_ascii(buf, starts, lens, width, q_offset):
    n = len(starts)
    out = np.empty((n, width), np.int8)
    bad = LIB.fx_quals_from_ascii(
        ptr(buf, _u8p), ptr(starts, _i64p), ptr(lens, _i64p), n, width,
        q_offset, ptr(out, _i8p), _NT,
    )
    return out, int(bad)


def _out_span(total, out, out_off):
    """Destination pointer for a render: a fresh array, or a span of a
    caller-provided uint8 arena (zero-copy streaming output)."""
    if out is None:
        buf = np.empty(total, np.uint8)
        return buf, ptr(buf, _u8p)
    if out.dtype != np.uint8 or not out.flags["C_CONTIGUOUS"]:
        raise ValueError("render arena must be a C-contiguous uint8 array")
    if out_off < 0:
        raise ValueError("render arena offset must be >= 0")
    if out_off + total > out.nbytes:
        raise ValueError("render arena too small")
    return None, ctypes.cast(out.ctypes.data + out_off, _u8p)


def render_fastq(bases, quals, lens, name_buf, name_offs, name2_buf,
                 name2_offs, q_offset, keep=None, mask_thr=None,
                 mask_char=ord("N"), out=None, out_off=0):
    """Assemble FASTQ bytes; optionally skip records where keep is
    False, and apply quality masking (quals < mask_thr -> mask_char)
    during the copy.

    Returns bytes, or — when ``out`` (a preallocated 1-D uint8 arena) is
    given — writes at ``out[out_off:]`` and returns the byte count, so a
    whole multi-block stream renders into one buffer with no copies.
    """
    n = bases.shape[0]
    width = bases.shape[1]
    name_lens = np.diff(name_offs)
    name2_lens = np.diff(name2_offs)
    sizes = 6 + name_lens + name2_lens + 2 * lens.astype(np.int64)
    keep_arr = None
    if keep is not None:
        keep_arr = np.ascontiguousarray(keep, dtype=np.uint8)
        sizes = np.where(keep_arr != 0, sizes, 0)
    rec_offs = np.zeros(n + 1, np.int64)
    np.cumsum(sizes, out=rec_offs[1:])
    total = int(rec_offs[-1])
    buf, dst = _out_span(total, out, out_off)
    LIB.fx_render_fastq(
        ptr(bases, _u8p), ptr(quals, _i8p), ptr(lens, _i32p), n, width,
        ptr(name_buf, _u8p), ptr(name_offs, _i64p),
        ptr(name2_buf, _u8p), ptr(name2_offs, _i64p),
        ptr(rec_offs, _i64p), q_offset, dst,
        ptr(keep_arr, _u8p) if keep_arr is not None else None,
        0 if mask_thr is None else 1,
        0 if mask_thr is None else int(mask_thr), mask_char, _NT,
    )
    return buf.tobytes() if out is None else total


def render_fasta(bases, lens, name_buf, name_offs, keep=None,
                 out=None, out_off=0):
    n = bases.shape[0]
    width = bases.shape[1]
    name_lens = np.diff(name_offs)
    sizes = 3 + name_lens + lens.astype(np.int64)
    keep_arr = None
    if keep is not None:
        keep_arr = np.ascontiguousarray(keep, dtype=np.uint8)
        sizes = np.where(keep_arr != 0, sizes, 0)
    rec_offs = np.zeros(n + 1, np.int64)
    np.cumsum(sizes, out=rec_offs[1:])
    total = int(rec_offs[-1])
    buf, dst = _out_span(total, out, out_off)
    LIB.fx_render_fasta(
        ptr(bases, _u8p), ptr(lens, _i32p), n, width,
        ptr(name_buf, _u8p), ptr(name_offs, _i64p), ptr(rec_offs, _i64p),
        dst,
        ptr(keep_arr, _u8p) if keep_arr is not None else None, _NT,
    )
    return buf.tobytes() if out is None else total


def index_lines(buf: np.ndarray):
    """One-pass line indexing: (starts int64 [nlines], has_cr bool)."""
    n = len(buf)
    starts = np.empty(n // 2 + 2, np.int64)
    has_cr = ctypes.c_int32(0)
    count = LIB.fx_index_lines(ptr(buf, _u8p), n, ptr(starts, _i64p),
                               ctypes.byref(has_cr))
    return starts[:count], bool(has_cr.value)


def scan_alphabet(bases: np.ndarray) -> tuple[bool, bool]:
    """(pure_acgtn, has_n) over a [B, L] uint8 base matrix, one pass."""
    flags = int(LIB.fx_scan_alphabet(ptr(bases, _u8p), bases.size))
    return bool(flags & 1), bool(flags & 2)


def pack2(bases, quals, thresholds, include_nplane: bool):
    """Fused 2-bit pack: -> (b2 [B, ceil(L/4)], planes [B, P, ceil(L/8)]);
    bit/byte layout identical to the numpy path in engine/pipeline.py."""
    n, L = bases.shape
    thr = np.asarray(thresholds, np.int8)
    n_planes = len(thr) + (1 if include_nplane else 0)
    b2 = np.empty((n, (L + 3) // 4), np.uint8)
    planes = np.empty((n, n_planes, (L + 7) // 8), np.uint8)
    LIB.fx_pack2(ptr(bases, _u8p), ptr(quals, _i8p), n, L, ptr(thr, _i8p),
                 len(thr), 1 if include_nplane else 0, ptr(b2, _u8p),
                 ptr(planes, _u8p), _NT)
    return b2, planes


def pack4(bases, quals, thresholds):
    """Fused 4-bit pack: -> (b4 [B, ceil(L/2)], planes [B, T, ceil(L/8)])."""
    n, L = bases.shape
    thr = np.asarray(thresholds, np.int8)
    b4 = np.empty((n, (L + 1) // 2), np.uint8)
    planes = np.empty((n, len(thr), (L + 7) // 8), np.uint8)
    LIB.fx_pack4(ptr(bases, _u8p), ptr(quals, _i8p), n, L, ptr(thr, _i8p),
                 len(thr), ptr(b4, _u8p), ptr(planes, _u8p), _NT)
    return b4, planes


def stats_hist_q(bases, quals, lens):
    """FASTQ per-(cycle, nucleotide, quality) histogram, one int64
    increment per base: -> [W, 6, 109] int64 with only the nucleotide
    slots (1..5, plus 0 for unknown bytes) populated — the ALL slot and
    count/sum/min/max derive from it (ops/stats.py derive_from_hist;
    FASTQ multiplicity is always 1, fastx.c:479-481)."""
    n, width = bases.shape
    out = np.zeros((width, 6, 109), np.int64)
    LIB.fx_stats_hist_q(
        ptr(bases, _u8p), ptr(quals, _i8p), ptr(lens, _i32p), n, width,
        ptr(out, _i64p), _NT,
    )
    return out


def stats_counts(bases, lens, counts):
    """FASTA per-(cycle, nucleotide) counts weighted by collapsed
    multiplicity: -> [W, 6] int64, nucleotide slots only (ALL derived)."""
    n, width = bases.shape
    out = np.zeros((width, 6), np.int64)
    LIB.fx_stats_counts(
        ptr(bases, _u8p), ptr(lens, _i32p), ptr(counts, _i32p), n, width,
        ptr(out, _i64p), _NT,
    )
    return out


def counts_from_names(buf, name_starts, name_lens) -> np.ndarray:
    """Collapsed multiplicities from FASTA id spans (get_reads_count,
    fastx.c:475-495; exact codec.parse_counts_from_names semantics)."""
    n = len(name_starts)
    out = np.empty(n, np.int32)
    LIB.fx_counts_from_names(ptr(buf, _u8p), ptr(name_starts, _i64p),
                             ptr(name_lens, _i64p), n, ptr(out, _i32p), _NT)
    return out


def validate_records(buf, seq_starts, lens, qual_starts, allowed_u8,
                     q_offset: int) -> int:
    """First invalid record index (empty/bad sequence byte, or — when
    qual_starts is given — ASCII quality byte out of the reference's
    [-15, 93] value range), or -1.  Raw-line spans, no matrix build."""
    n = len(seq_starts)
    qptr = ptr(qual_starts, _i64p) if qual_starts is not None else None
    return int(LIB.fx_validate_records(
        ptr(buf, _u8p), ptr(seq_starts, _i64p), ptr(lens, _i64p), qptr, n,
        ptr(allowed_u8, _u8p), q_offset - 15, q_offset + 93, _NT,
    ))


def stats_lines_q(buf, seq_starts, qual_starts, lens, width: int,
                  q_offset: int):
    """FASTQ per-(cycle, nucleotide, quality) histogram straight from raw
    line spans (validated records): -> [width, 6, 109] int64."""
    n = len(seq_starts)
    out = np.zeros((width, 6, 109), np.int64)
    LIB.fx_stats_lines_q(
        ptr(buf, _u8p), ptr(seq_starts, _i64p), ptr(qual_starts, _i64p),
        ptr(lens, _i64p), n, width, q_offset, ptr(out, _i64p), _NT,
    )
    return out


def scan_lines(buf, seq_starts, lens) -> tuple:
    """(pure_acgtn, has_n) over raw sequence line spans, one pass."""
    flags = int(LIB.fx_scan_lines(ptr(buf, _u8p), ptr(seq_starts, _i64p),
                                  ptr(lens, _i64p), len(seq_starts)))
    return bool(flags & 1), bool(flags & 2)


def pack2_lines(buf, seq_starts, qual_starts, lens, L: int, q_offset: int,
                thresholds, include_nplane: bool,
                b2_out=None, planes_out=None, row0: int = 0):
    """Fused 2-bit pack straight from line spans — layout-identical to
    pack2 over the zero-padded [n, L] matrix of the same records.
    Quality bits compare ASCII bytes against thr + q_offset cutoffs.
    ``b2_out``/``planes_out``/``row0`` let chunk assemblers pack several
    span segments into one larger dispatch array."""
    n = len(seq_starts)
    thr_bytes = np.asarray([int(t) + q_offset for t in thresholds], np.int32)
    n_planes = len(thr_bytes) + (1 if include_nplane else 0)
    w2 = (L + 3) // 4
    w8 = (L + 7) // 8
    if b2_out is None:
        b2_out = np.empty((n, w2), np.uint8)
        planes_out = np.empty((n, n_planes, w8), np.uint8)
        row0 = 0
    b2v = b2_out[row0:row0 + n]
    pv = planes_out[row0:row0 + n]
    LIB.fx_pack2_lines(
        ptr(buf, _u8p), ptr(seq_starts, _i64p), ptr(qual_starts, _i64p),
        ptr(lens, _i64p), n, L, ptr(thr_bytes, _i32p), len(thr_bytes),
        1 if include_nplane else 0, ptr(b2v, _u8p), ptr(pv, _u8p), _NT,
    )
    return b2_out, planes_out


def render_lines(buf, name_starts, name_lens, seq_starts, qual_starts,
                 name2_starts, name2_lens, new_lens, keep, *,
                 out_fastq: bool, q_offset: int, mask_thr=None,
                 mask_char=ord("N"), out=None, out_off=0):
    """Render FASTA/FASTQ bytes straight from line spans + device
    decisions (new lengths / keep mask), with the masker's byte edit
    fused in.  Returns bytes, or the byte count when ``out`` is given."""
    n = len(seq_starts)
    new_lens = np.ascontiguousarray(new_lens, np.int32)
    keep_arr = None
    nl64 = new_lens.astype(np.int64)
    if out_fastq:
        sizes = 6 + name_lens + name2_lens + 2 * nl64
    else:
        sizes = 3 + name_lens + nl64
    if keep is not None:
        keep_arr = np.ascontiguousarray(keep, np.uint8)
        sizes = np.where(keep_arr != 0, sizes, 0)
    rec_offs = np.zeros(n + 1, np.int64)
    np.cumsum(sizes, out=rec_offs[1:])
    total = int(rec_offs[-1])
    bufout, dst = _out_span(total, out, out_off)
    kp = ptr(keep_arr, _u8p) if keep_arr is not None else None
    men = 0 if mask_thr is None else 1
    mthr = 0 if mask_thr is None else int(mask_thr) + q_offset
    if out_fastq:
        LIB.fx_render_fastq_lines(
            ptr(buf, _u8p), ptr(name_starts, _i64p), ptr(name_lens, _i64p),
            ptr(seq_starts, _i64p), ptr(qual_starts, _i64p),
            ptr(name2_starts, _i64p), ptr(name2_lens, _i64p),
            ptr(new_lens, _i32p), n, ptr(rec_offs, _i64p), dst, kp,
            men, mthr, mask_char, _NT,
        )
    else:
        LIB.fx_render_fasta_lines(
            ptr(buf, _u8p), ptr(name_starts, _i64p), ptr(name_lens, _i64p),
            ptr(seq_starts, _i64p), ptr(qual_starts, _i64p),
            ptr(new_lens, _i32p), n, ptr(rec_offs, _i64p), dst, kp,
            men, mthr, mask_char, _NT,
        )
    return bufout.tobytes() if out is None else total


def quality_decide(buf, qual_starts, lens, q_offset: int, *,
                   filter_q=None, filter_p=None, trim_q=None,
                   trim_minlen=0, mask_q=None):
    """Quality-family decisions from raw ASCII quality spans:
    -> (new_lens int32, keep uint8, masked int64 or None)."""
    n = len(qual_starts)
    new_lens = np.empty(n, np.int32)
    keep = np.empty(n, np.uint8)
    masked = np.empty(n, np.int64) if mask_q is not None else None
    LIB.fx_quality_decide(
        ptr(buf, _u8p), ptr(qual_starts, _i64p), ptr(lens, _i64p), n,
        1 if filter_q is not None else 0,
        (int(filter_q) + q_offset) if filter_q is not None else 0,
        int(filter_p) if filter_p is not None else 0,
        1 if trim_q is not None else 0,
        (int(trim_q) + q_offset) if trim_q is not None else 0,
        int(trim_minlen),
        (int(mask_q) + q_offset) if mask_q is not None else 0,
        ptr(new_lens, _i32p), ptr(keep, _u8p),
        ptr(masked, _i64p) if masked is not None else None, _NT,
    )
    return new_lens, keep, masked


def rows_with_n(buf, seq_starts, lens) -> np.ndarray:
    n = len(seq_starts)
    out = np.empty(n, np.uint8)
    LIB.fx_rows_with_n(ptr(buf, _u8p), ptr(seq_starts, _i64p),
                       ptr(lens, _i64p), n, ptr(out, _u8p), _NT)
    return out


def artifacts_rows(buf, seq_starts, lens) -> np.ndarray:
    n = len(seq_starts)
    out = np.empty(n, np.uint8)
    LIB.fx_artifacts_rows(ptr(buf, _u8p), ptr(seq_starts, _i64p),
                          ptr(lens, _i64p), n, ptr(out, _u8p), _NT)
    return out


class DedupTable:
    """Persistent host-native sequence->count hash table (the collapser's
    link-aware engine; see native/fastx_codec.cpp fx_dedup_*).  Keys are
    raw sequence bytes; values are (count sum, min first-appearance)."""

    def __init__(self, nshards_log2: int = 2):
        if LIB is None:
            raise RuntimeError("native codec library unavailable")
        self._h = LIB.fx_dedup_new(nshards_log2)

    def insert(self, bases: np.ndarray, lens: np.ndarray,
               counts, first_base: int) -> None:
        n, width = bases.shape
        bases = np.ascontiguousarray(bases, np.uint8)
        lens = np.ascontiguousarray(lens, np.int32)
        cptr = None
        if counts is not None:
            counts = np.ascontiguousarray(counts, np.int32)
            cptr = ptr(counts, _i32p)
        LIB.fx_dedup_insert(self._h, ptr(bases, _u8p), n, width,
                            ptr(lens, _i32p), cptr, first_base, _NT)

    def insert_lines(self, buf: np.ndarray, seq_starts: np.ndarray,
                     lens: np.ndarray, first_base: int,
                     counts=None) -> None:
        """Insert validated records straight from raw line spans;
        ``counts`` None means multiplicity 1 (the FASTQ case,
        fastx.c:479-481), else per-record collapsed counts."""
        cptr = None
        if counts is not None:
            counts = np.ascontiguousarray(counts, np.int32)
            cptr = ptr(counts, _i32p)
        LIB.fx_dedup_insert_lines(
            self._h, ptr(buf, _u8p), ptr(seq_starts, _i64p),
            ptr(lens, _i64p), cptr, len(seq_starts), first_base, _NT,
        )

    def extract(self):
        """-> (key_offs int64 [U+1], key_bytes uint8, counts int64 [U],
        firsts int64 [U]); arbitrary order — callers sort."""
        u = int(LIB.fx_dedup_count(self._h))
        nbytes = int(LIB.fx_dedup_key_bytes(self._h))
        key_offs = np.zeros(u + 1, np.int64)
        key_lens = np.zeros(u, np.int32)
        counts = np.zeros(u, np.int64)
        firsts = np.zeros(u, np.int64)
        keys = np.zeros(max(nbytes, 1), np.uint8)[:nbytes]
        if u:
            LIB.fx_dedup_extract(self._h, ptr(key_offs, _i64p),
                                 ptr(key_lens, _i32p), ptr(counts, _i64p),
                                 ptr(firsts, _i64p), ptr(keys, _u8p))
        return key_offs, keys, counts, firsts

    def close(self):
        if self._h is not None:
            LIB.fx_dedup_free(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def gather_flat(buf, starts, lens):
    """Concatenate variable slices -> (flat uint8, offs int64 [n+1])."""
    n = len(starts)
    offs = np.zeros(n + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    out = np.empty(offs[-1], np.uint8)
    LIB.fx_gather_flat(ptr(buf, _u8p), ptr(starts, _i64p), ptr(lens, _i64p),
                       ptr(offs, _i64p), n, ptr(out, _u8p), _NT)
    return out, offs


def clip_float(bases: np.ndarray, dp_lens: np.ndarray, adapter: bytes):
    """Float32 clipper DP (fx_clip_float): bit-faithful to the reference
    engine, for tie-fragile subsets.  Returns the align_batch result
    dict (kernels/align.py field names)."""
    bases = np.ascontiguousarray(bases, np.uint8)
    dp_lens = np.ascontiguousarray(dp_lens, np.int32)
    n, W = bases.shape
    ad = np.frombuffer(adapter, np.uint8)
    out = np.empty((n, 8), np.int32)
    LIB.fx_clip_float(ptr(bases, _u8p), ptr(dp_lens, _i32p), n, W,
                      ptr(np.ascontiguousarray(ad), _u8p), len(adapter),
                      ptr(out, _i32p), _NT)
    return {
        "matches": out[:, 0], "mismatches": out[:, 1], "gaps": out[:, 2],
        "neutral": out[:, 3], "query_start": out[:, 4],
        "query_end": out[:, 5], "target_start": out[:, 6],
        "target_end": out[:, 7],
    }
