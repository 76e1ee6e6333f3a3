"""Golden tests for collapser/uncollapser/formatter/barcode splitter."""

import io
import os

import numpy as np
import pytest

from util import fixture, run_tool, TEST_DATA

from fastx_toolkit_tpu.cli.tools import (
    fasta_formatter,
    fastx_collapser,
    fastx_uncollapser,
)
from fastx_toolkit_tpu.scripts import barcode_splitter


def _parse_collapsed(data: bytes):
    """[(rank, count, seq)] from >rank-count FASTA."""
    lines = data.decode().splitlines()
    out = []
    for i in range(0, len(lines), 2):
        rank, count = lines[i][1:].split("-")
        out.append((int(rank), int(count), lines[i + 1]))
    return out


class TestCollapser:
    def test_golden_group_insensitive(self):
        """The reference's tie order among equal counts is libstdc++
        hash-iteration order; compare counts/ranks exactly and equal-count
        groups as sets (SURVEY §3.4 parity contract)."""
        r = run_tool(fastx_collapser, ["-v"], fixture("fasta_collapser1.fasta"))
        assert r.status == 0
        got = _parse_collapsed(r.stdout)
        want = _parse_collapsed(fixture("fasta_collapser1.out"))
        assert [(g[0], g[1]) for g in got] == [(w[0], w[1]) for w in want]
        from collections import defaultdict

        gg, ww = defaultdict(set), defaultdict(set)
        for _, c, s in got:
            gg[c].add(s)
        for _, c, s in want:
            ww[c].add(s)
        assert gg == ww

    def test_verbose(self):
        r = run_tool(fastx_collapser, ["-v"], fixture("fasta_collapser1.fasta"))
        assert "Input: " in r.stderr and "sequences (representing" in r.stderr

    def test_fastq_input_weighted(self):
        r = run_tool(fastx_collapser, [], b">a-5\nACGT\n>b-2\nACGT\n>c\nTTTT\n")
        assert r.stdout == b">1-7\nACGT\n>2-1\nTTTT\n"


class TestUncollapser:
    def test_fasta_golden(self):
        r = run_tool(fastx_uncollapser, ["-v"], fixture("fasta_uncollapser1.fasta"))
        assert r.status == 0
        assert r.stdout == fixture("fasta_uncollapser1.out")

    def test_tabular_golden(self):
        r = run_tool(
            fastx_uncollapser, ["-c", "10", "-v"], fixture("fastx_seqid_uncollapse1.psl")
        )
        assert r.status == 0
        assert r.stdout == fixture("fastx_seqid_uncollapse1.out")


class TestFormatter:
    def test_single_line(self):
        r = run_tool(fasta_formatter, ["-w", "0"], fixture("fasta_formatter1.fasta"))
        assert r.status == 0
        assert r.stdout == fixture("fasta_formatter1.out")

    def test_wrap_60(self):
        r = run_tool(fasta_formatter, ["-w", "60"], fixture("fasta_formatter1.fasta"))
        assert r.status == 0
        assert r.stdout == fixture("fasta_formatter2.out")

    def test_tabular(self):
        r = run_tool(fasta_formatter, ["-t"], b">id1\nAAA\nCCC\n>id2\n>id3\nTT\n")
        assert r.stdout == b"id1\tAAACCC\nid3\tTT\n"

    def test_empty_kept(self):
        r = run_tool(fasta_formatter, ["-e"], b">id1\nAAA\n>id2\n>id3\nTT\n")
        assert r.stdout == b">id1\nAAA\n>id2\n>id3\nTT\n"


def run_splitter(argv, stdin: bytes):
    out, err = io.StringIO(), io.StringIO()
    from fastx_toolkit_tpu.core.errors import FastxError

    try:
        status = barcode_splitter.main_io(argv, io.BytesIO(stdin), out, err)
    except FastxError as e:
        err.write(str(e))
        status = e.status
    return status, out.getvalue(), err.getvalue()


class TestBarcodeSplitter:
    def test_golden_counts(self, tmp_path):
        prefix = str(tmp_path) + "/split_"
        status, out, err = run_splitter(
            ["--bcfile", os.path.join(TEST_DATA, "fastx_barcode_splitter1.txt"),
             "--bol", "--mismatches", "2", "--prefix", prefix, "--suffix", ".txt"],
            fixture("fastx_barcode_splitter1.fastq"),
        )
        assert status == 0, err
        # counts from the reference golden HTML (fastx_barcode_splitter1.out)
        lines = out.splitlines()
        assert lines[0] == "Barcode\tCount\tLocation"
        table = {l.split("\t")[0]: l.split("\t")[1] for l in lines[1:]}
        assert table == {
            "BC1": "11", "BC2": "12", "BC3": "9", "BC4": "1",
            "unmatched": "9", "total": "42",
        }
        # output files: each record intact, 4 lines per record
        bc2 = open(prefix + "BC2.txt", "rb").read()
        assert bc2.count(b"\n") == 12 * 4
        # every written record must carry its barcode prefix within 2 mm
        recs = bc2.split(b"\n")
        seqs = [recs[i] for i in range(1, len(recs), 4) if recs[i]]
        for s in seqs:
            mm = sum(1 for a, b in zip(s[:5], b"ATCGT") if a != b)
            assert mm <= 2

    def test_unmatched_file_created(self, tmp_path):
        prefix = str(tmp_path) + "/x_"
        status, out, err = run_splitter(
            ["--bcfile", os.path.join(TEST_DATA, "fastx_barcode_splitter1.txt"),
             "--eol", "--exact", "--prefix", prefix],
            fixture("fastx_barcode_splitter1.fastq"),
        )
        assert status == 0
        assert os.path.exists(prefix + "unmatched")

    def test_missing_bcfile_arg(self):
        status, out, err = run_splitter(["--bol", "--prefix", "/tmp/x_"], b"")
        assert status == 255
        assert "barcode file not specified" in err

    def test_partial(self, tmp_path):
        bc = tmp_path / "bc.txt"
        bc.write_bytes(b"BC1\tGATCT\nBC2\tATCGT\n")
        prefix = str(tmp_path) + "/p_"
        # Perl doc example: ATTTA... vs GATCT with partial 1 -> BC1 at mm 3
        # (xor counts the padding position too, then +1 penalty)
        status, out, err = run_splitter(
            ["--bcfile", str(bc), "--bol", "--partial", "1", "--mismatches", "3",
             "--prefix", prefix],
            b"@r1\nATTTACTATGTAAAG\n+\naaaaaaaaaaaaaaa\n",
        )
        assert status == 0
        assert "BC1\t1" in out
