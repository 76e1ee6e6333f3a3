"""Codec round-trip + validation-error parity tests."""

import numpy as np
import pytest

from fastx_toolkit_tpu.core import codec
from fastx_toolkit_tpu.core.errors import FastxError

from util import fixture


def test_fastq_ascii_roundtrip():
    data = fixture("fastq_stats1.fastq")
    b = codec.parse(data, filetype=codec.FASTQ_ONLY, q_offset=64)
    assert b.is_fastq and b.qual_ascii.all()
    out = codec.render(b, out_fastq=True, ascii_qual=b.qual_ascii, q_offset=64)
    assert out == data


def test_fasta_roundtrip_and_counts():
    data = fixture("fasta_collapser1.fasta")
    b = codec.parse(data)
    assert not b.is_fastq
    assert codec.render(b, out_fastq=False) == data
    # collapsed ids in the uncollapser fixture
    d2 = fixture("fasta_uncollapser1.fasta")
    b2 = codec.parse(d2)
    assert b2.counts.sum() > len(b2)


def test_numeric_qual_roundtrip():
    data = fixture("fastq_qual_conv2.fastq")
    b = codec.parse(data, filetype=codec.FASTQ_ONLY, q_offset=64)
    assert (~b.qual_ascii).all()
    out = codec.render(b, out_fastq=True, ascii_qual=False, q_offset=64)
    assert out == data


def test_empty_input_error():
    with pytest.raises(FastxError, match=r"Premature End-Of-File \(filename ='-'\)"):
        codec.parse(b"", input_name="-")


def test_unknown_format_error():
    with pytest.raises(FastxError, match=r"unknown file format"):
        codec.parse(b"xyz\n")


def test_fasta_only_rejects_fastq():
    with pytest.raises(FastxError, match=r"only FASTA input is allowed"):
        codec.parse(b"@x\nACGT\n+\n!!!!\n", filetype=codec.FASTA_ONLY)


def test_multiline_fasta_friendly_error():
    data = b">a\nACGT\nACGT\n"
    with pytest.raises(FastxError, match=r"multi-line FASTA"):
        codec.parse(data)


def test_invalid_nucleotides_error():
    with pytest.raises(
        FastxError, match=r"found invalid nucleotide sequence \(ACXT\) on line 2"
    ):
        codec.parse(b">a\nACXT\n")


def test_empty_sequence_error():
    with pytest.raises(FastxError, match=r"found empty nucleotide sequence on line 2"):
        codec.parse(b">a\n\n>b\nACGT\n")


def test_missing_lines_errors():
    with pytest.raises(FastxError, match=r"missing 2nd line \(nucleotides\), on line 4"):
        codec.parse(b">a\nACGT\n>b\n")
    with pytest.raises(FastxError, match=r"missing 4th line \(quality\), on line 4"):
        codec.parse(b"@a\nACGT\n+\n")


def test_error_order_earlier_record_wins():
    # bad nucleotides in record 1 must win over truncation at the end
    with pytest.raises(FastxError, match=r"on line 2"):
        codec.parse(b">a\nACZT\n>b\n")


def test_quality_out_of_range():
    with pytest.raises(
        FastxError, match=r"Invalid quality score value \(char ' ' ord 32"
    ):
        codec.parse(b"@a\nACGT\n+\n    \n", q_offset=64)


def test_numeric_quality_count_mismatch():
    with pytest.raises(FastxError, match=r"number of quality values \(3\)"):
        codec.parse(b"@a\nACGT\n+\n10 20 30\n")


def test_chomp_cr():
    b = codec.parse(b">a\r\nACGT\r\n")
    assert b.names.get(0) == b"a"
    assert bytes(b.bases[0, :4]) == b"ACGT"


def test_counts_atoi_semantics():
    b = codec.parse(b">x-12\nAC\n>y-\nAC\n>z-3abc\nAC\n>w-0\nAC\n>v\nAC\n")
    assert list(b.counts) == [12, 1, 3, 1, 1]


# ---------------------------------------------------------------------------
# out=/out_off arena rendering parity (native path)


def _native_batch():
    if codec.native.LIB is None:
        pytest.skip("native codec not built")
    data = fixture("fastq_stats1.fastq")
    return codec.parse(data, filetype=codec.FASTQ_ONLY, q_offset=64), data


def test_render_arena_matches_bytes_path():
    batch, _ = _native_batch()
    n = len(batch)
    keep = np.arange(n) % 3 != 1
    for kw in (
        {},
        {"keep": keep},
        {"mask_thr": 20},
        {"keep": keep, "mask_thr": 25, "mask_char": ord("x")},
    ):
        expect = codec.render(
            batch, out_fastq=True, ascii_qual=True, q_offset=64, **kw
        )
        arena = np.full(len(expect) + 13, 0xEE, np.uint8)
        nbytes = codec.render(
            batch, out_fastq=True, ascii_qual=True, q_offset=64,
            out=arena, out_off=13, **kw,
        )
        assert nbytes == len(expect)
        assert arena[13:13 + nbytes].tobytes() == expect
        assert (arena[:13] == 0xEE).all()  # offset prefix untouched
    # FASTA path too
    expect = codec.render(batch, out_fastq=False)
    arena = np.zeros(len(expect), np.uint8)
    nbytes = codec.render(batch, out_fastq=False, out=arena)
    assert arena[:nbytes].tobytes() == expect


def test_render_arena_multi_batch_offsets():
    batch, _ = _native_batch()
    one = codec.render(batch, out_fastq=True, ascii_qual=True, q_offset=64)
    arena = np.zeros(2 * len(one), np.uint8)
    n1 = codec.render(batch, out_fastq=True, ascii_qual=True, q_offset=64,
                      out=arena, out_off=0)
    n2 = codec.render(batch, out_fastq=True, ascii_qual=True, q_offset=64,
                      out=arena, out_off=n1)
    assert arena[: n1 + n2].tobytes() == one + one


def test_render_arena_errors():
    batch, _ = _native_batch()
    with pytest.raises(ValueError, match="arena too small"):
        codec.render(batch, out_fastq=True, ascii_qual=True, q_offset=64,
                     out=np.zeros(3, np.uint8))
    with pytest.raises(ValueError, match="C-contiguous uint8"):
        codec.render(batch, out_fastq=True, ascii_qual=True, q_offset=64,
                     out=np.zeros(1 << 20, np.uint8)[::2])
    with pytest.raises(ValueError, match="C-contiguous uint8"):
        codec.render(batch, out_fastq=True, ascii_qual=True, q_offset=64,
                     out=np.zeros(1 << 20, np.int16))
    with pytest.raises(ValueError, match="offset must be"):
        codec.render(batch, out_fastq=True, ascii_qual=True, q_offset=64,
                     out=np.zeros(1 << 20, np.uint8), out_off=-1)
    # unsupported configurations fail even for empty batches
    empty = batch.select(np.zeros(len(batch), bool))
    with pytest.raises(ValueError, match="ASCII-quality"):
        codec.render(empty, out_fastq=True, ascii_qual=False, q_offset=64,
                     out=np.zeros(16, np.uint8))
