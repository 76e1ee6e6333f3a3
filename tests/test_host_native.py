"""Equivalence tests for the host-native (C++) stats/collapse engines.

The link-aware dispatch (ops/stats.py stats_path, cli/tools/
fastx_collapser.py collapse_path) means either engine may serve a given
run; these tests pin that both produce identical observable output, and
that the fused raw-line fast paths fall back to the full parser for the
reference's exact error text.
"""

import numpy as np
import pytest

from fastx_toolkit_tpu.core import codec, native
from fastx_toolkit_tpu.ops import stats as stats_ops

pytestmark = pytest.mark.skipif(
    native.LIB is None, reason="native codec library unavailable"
)


def _rand_batch(rng, B, L, alphabet=b"ACGTN"):
    bases = rng.choice(np.frombuffer(alphabet, np.uint8), size=(B, L))
    quals = rng.integers(-15, 94, size=(B, L)).astype(np.int8)
    lengths = rng.integers(1, L + 1, B).astype(np.int32)
    col = np.arange(L)
    m = col[None] < lengths[:, None]
    return (
        np.where(m, bases, 0).astype(np.uint8),
        np.where(m, quals, 0).astype(np.int8),
        lengths,
    )


def test_host_accumulate_matches_jit_fastq():
    rng = np.random.default_rng(1)
    bases, quals, lengths = _rand_batch(rng, 3000, 61)
    counts = np.ones(3000, np.int32)
    ref = stats_ops.accumulate_jit(bases, quals, lengths, counts, is_fastq=True)
    got = stats_ops.host_accumulate(bases, quals, lengths, counts, is_fastq=True)
    for r, g in zip(ref, got):
        assert np.array_equal(np.asarray(r, np.int64), np.asarray(g, np.int64))


def test_host_accumulate_matches_jit_fasta_weighted():
    rng = np.random.default_rng(2)
    bases, quals, lengths = _rand_batch(rng, 2000, 40)
    counts = rng.integers(1, 50, 2000).astype(np.int32)
    ref = stats_ops.accumulate_jit(bases, quals, lengths, counts, is_fastq=False)
    got = stats_ops.host_accumulate(bases, quals, lengths, counts, is_fastq=False)
    for r, g in zip(ref, got):
        assert np.array_equal(np.asarray(r, np.int64), np.asarray(g, np.int64))


def _fastq_bytes(rng, n, L=30):
    recs = []
    for i in range(n):
        ln = int(rng.integers(1, L))
        seq = rng.choice(np.frombuffer(b"ACGTN", np.uint8), size=ln)
        q = rng.integers(0, 41, ln) + 33
        recs.append(
            b"@r%d\n%s\n+\n%s\n"
            % (i, seq.tobytes(), q.astype(np.uint8).tobytes())
        )
    return b"".join(recs)


def test_frame_fastq_fast_and_stats_lines():
    rng = np.random.default_rng(3)
    data = _fastq_bytes(rng, 500)
    fr = codec.frame_fastq_fast(data)
    assert fr is not None
    buf, ss, sl, qs = fr
    assert len(ss) == 500
    allowed = codec.allowed_table_u8()
    assert native.validate_records(buf, ss, sl, qs, allowed, 33) == -1
    width = int(sl.max())
    pernuc = native.stats_lines_q(buf, ss, qs, sl, width, 33)
    got = stats_ops.derive_from_hist(pernuc)
    batch = codec.parse(data, q_offset=33)
    ref = stats_ops.accumulate_jit(
        batch.bases, batch.quals, batch.lengths, batch.counts, is_fastq=True
    )
    for r, g in zip(ref, got):
        g64 = np.asarray(g, np.int64)
        r64 = np.asarray(r, np.int64)
        assert np.array_equal(r64, g64[: r64.shape[0]])


def test_frame_fastq_fast_rejects_anomalies():
    # numeric quality line (length != seq length) -> full-parser fallback
    assert codec.frame_fastq_fast(b"@r\nACGT\n+\n33 34 35 36\n") is None
    # partial record
    assert codec.frame_fastq_fast(b"@r\nACGT\n+\n") is None
    # bad header prefix
    assert codec.frame_fastq_fast(b">r\nACGT\n+\nIIII\n") is None
    assert codec.frame_fastq_fast(b"") is None
    # clean chunk with CRLF endings still frames (chomp semantics)
    fr = codec.frame_fastq_fast(b"@r\r\nACGT\r\n+\r\nIIII\r\n")
    assert fr is not None
    _, ss, sl, _ = fr
    assert sl[0] == 4


def test_validate_records_catches_each_class():
    allowed = codec.allowed_table_u8()

    def check(data):
        fr = codec.frame_fastq_fast(data)
        assert fr is not None
        buf, ss, sl, qs = fr
        return native.validate_records(buf, ss, sl, qs, allowed, 33)

    assert check(b"@a\nACGT\n+\nIIII\n") == -1
    assert check(b"@a\nACXT\n+\nIIII\n") == 0  # bad base byte
    assert check(b"@a\nACGT\n+\nII\x05I\n") == 0  # quality below -15
    assert check(b"@a\nACGT\n+\nIIII\n@b\nAC\x01T\n+\nIIII\n") == 1


@pytest.mark.parametrize("tool,var", [
    ("fastx_quality_stats", "FASTX_STATS_PATH"),
    ("fastx_collapser", "FASTX_COLLAPSE_PATH"),
])
def test_cli_paths_identical_and_error_parity(tool, var, monkeypatch):
    import importlib

    import util

    mod = importlib.import_module("fastx_toolkit_tpu.cli.tools." + tool)
    rng = np.random.default_rng(7)
    # duplicates so the collapser has real work
    base = _fastq_bytes(rng, 120)
    data = base + base[: len(base) // 2 * 2]
    results = {}
    for path in ("host", "device"):
        monkeypatch.setenv(var, path)
        results[path] = util.run_tool(mod, ["-Q", "33", "-v"], stdin=data)
    assert results["host"].status == 0
    assert results["host"].stdout == results["device"].stdout
    assert results["host"].report == results["device"].report
    # exact error parity through the fused fast path's fallback
    bad = data + b"@x\nAC!T\n+\nIIII\n"
    errs = {}
    for path in ("host", "device"):
        monkeypatch.setenv(var, path)
        errs[path] = util.run_tool(mod, ["-Q", "33"], stdin=bad)
    assert errs["host"].status != 0
    assert errs["host"].status == errs["device"].status
    assert errs["host"].stderr == errs["device"].stderr
    assert "found invalid nucleotide sequence" in errs["host"].stderr


def test_dedup_table_matches_dict():
    rng = np.random.default_rng(11)
    B, L = 5000, 24
    seqs = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=(B, L))
    seqs[B // 2:] = seqs[: B - B // 2]
    lens = rng.integers(1, L + 1, B).astype(np.int32)
    cnts = rng.integers(1, 5, B).astype(np.int32)
    tbl = native.DedupTable()
    tbl.insert(seqs[: B // 2], lens[: B // 2], cnts[: B // 2], 0)
    tbl.insert(seqs[B // 2:], lens[B // 2:], cnts[B // 2:], B // 2)
    offs, keys, uc, uf = tbl.extract()
    got = {
        keys[offs[i]:offs[i + 1]].tobytes(): (int(uc[i]), int(uf[i]))
        for i in range(len(uc))
    }
    want = {}
    for i in range(B):
        k = seqs[i, : lens[i]].tobytes()
        if k in want:
            want[k] = (want[k][0] + int(cnts[i]), want[k][1])
        else:
            want[k] = (int(cnts[i]), i)
    assert got == want
    tbl.close()


def test_dedup_insert_lines_matches_matrix_insert():
    rng = np.random.default_rng(13)
    data = _fastq_bytes(rng, 400) * 2
    fr = codec.frame_fastq_fast(data)
    buf, ss, sl, qs = fr
    t1 = native.DedupTable()
    t1.insert_lines(buf, ss, sl, 0)
    batch = codec.parse(data, q_offset=33)
    t2 = native.DedupTable()
    t2.insert(batch.bases, batch.lengths, None, 0)

    def as_dict(t):
        offs, keys, uc, uf = t.extract()
        return {
            keys[offs[i]:offs[i + 1]].tobytes(): (int(uc[i]), int(uf[i]))
            for i in range(len(uc))
        }

    assert as_dict(t1) == as_dict(t2)
    t1.close()
    t2.close()


def test_rank_count_column_matches_python():
    from fastx_toolkit_tpu.ops.collapse import rank_count_column

    rng = np.random.default_rng(17)
    for counts in (
        rng.integers(1, 10 ** 6, 257).astype(np.int64),
        np.array([1], np.int64),
        np.array([], np.int64),
        np.array([1, 10, 100, 999, 1000, 123456789], np.int64),
    ):
        flat, offs = rank_count_column(counts)
        want = b"".join(
            b"%d-%d" % (r + 1, c) for r, c in enumerate(counts.tolist())
        )
        assert flat.tobytes() == want
        lens = [len(b"%d-%d" % (r + 1, c)) for r, c in enumerate(counts.tolist())]
        assert np.array_equal(np.diff(offs), np.array(lens, np.int64))


@pytest.mark.parametrize("tool,flags", [
    ("fastq_quality_filter", ["-q", "20", "-p", "50"]),
    ("fastq_quality_filter", ["-q", "35", "-p", "100"]),
    ("fastq_quality_trimmer", ["-t", "20"]),
    ("fastq_quality_trimmer", ["-t", "30", "-l", "16"]),
    ("fastq_masker", ["-q", "25"]),
    ("fastq_masker", ["-q", "25", "-r", "x"]),
    ("fastx_trimmer", ["-l", "20"]),
    ("fastx_trimmer", ["-f", "5", "-l", "18"]),
    ("fastx_trimmer", ["-t", "3", "-m", "10"]),
    ("fastq_to_fasta", []),
    ("fastq_to_fasta", ["-n"]),
    ("fastx_artifacts_filter", []),
])
def test_cli_line_fast_path_matches_classic(tool, flags, monkeypatch):
    """Every converted per-read tool must produce byte-identical output
    and -v report on the raw-line fast path and the classic parser."""
    import importlib

    import util

    mod = importlib.import_module("fastx_toolkit_tpu.cli.tools." + tool)
    rng = np.random.default_rng(int(np.sum([ord(c) for c in tool])) + len(flags))
    data = _fastq_bytes(rng, 300, L=28)
    # spike an artifact-ish homopolymer read and an N-heavy read
    data += b"@art\n" + b"A" * 25 + b"CG\n+\n" + b"I" * 27 + b"\n"
    data += b"@enn\nNNNNANNNN\n+\nIIIIIIIII\n"
    monkeypatch.delenv("FASTX_TPU_NO_LINEPATH", raising=False)
    fastr = util.run_tool(mod, ["-Q", "33", "-v", *flags], stdin=data)
    monkeypatch.setenv("FASTX_TPU_NO_LINEPATH", "1")
    classic = util.run_tool(mod, ["-Q", "33", "-v", *flags], stdin=data)
    assert fastr.status == classic.status == 0, (fastr.stderr, classic.stderr)
    assert fastr.stdout == classic.stdout
    assert fastr.report == classic.report
    assert fastr.stderr == classic.stderr


def test_prefetch_iter_full_and_early_exit():
    import threading

    from fastx_toolkit_tpu.cli.tools._shared import prefetch_iter

    n0 = threading.active_count()
    assert list(prefetch_iter(iter(range(50)), depth=2)) == list(range(50))
    # early consumer exit must cancel and join the producer thread
    it = prefetch_iter(iter(range(10 ** 6)), depth=2)
    for i, x in enumerate(it):
        if i == 3:
            break
    it.close()
    assert threading.active_count() == n0
    # producer exceptions surface in the consumer
    def boom():
        yield 1
        raise RuntimeError("producer failed")

    out = []
    with pytest.raises(RuntimeError, match="producer failed"):
        for x in prefetch_iter(boom()):
            out.append(x)
    assert out == [1]


def test_counts_from_names_matches_codec():
    from fastx_toolkit_tpu.core.records import StringColumn

    names = [b"seq1", b"a-5", b"x-0", b"y--3", b"z- +7", b"w-+12", b"v-  9",
             b"q-12abc", b"r-", b"t-99999999999999", b"u-3-4", b"-8"]
    col = StringColumn.from_list(names)
    want = codec.parse_counts_from_names(col)
    flat = col.buf
    offs = col.offs
    starts = np.ascontiguousarray(offs[:-1])
    lens = np.ascontiguousarray(np.diff(offs))
    got = native.counts_from_names(flat, starts, lens)
    assert np.array_equal(want, got), (want, got)


def test_collapser_fasta_fast_path_matches_classic(monkeypatch):
    import importlib

    import util

    mod = importlib.import_module("fastx_toolkit_tpu.cli.tools.fastx_collapser")
    rng = np.random.default_rng(101)
    recs = []
    for i in range(200):
        ln = int(rng.integers(4, 25))
        seq = rng.choice(np.frombuffer(b"ACGTN", np.uint8), size=ln)
        cnt = int(rng.integers(1, 9))
        recs.append(b">c%d-%d\n%s\n" % (i, cnt, seq.tobytes()))
    data = b"".join(recs) * 2  # duplicates across the stream
    monkeypatch.delenv("FASTX_TPU_NO_LINEPATH", raising=False)
    monkeypatch.setenv("FASTX_COLLAPSE_PATH", "host")
    fastr = util.run_tool(mod, ["-Q", "33", "-v"], stdin=data)
    monkeypatch.setenv("FASTX_TPU_NO_LINEPATH", "1")
    classic = util.run_tool(mod, ["-Q", "33", "-v"], stdin=data)
    assert fastr.status == classic.status == 0, (fastr.stderr, classic.stderr)
    assert fastr.stdout == classic.stdout
    assert fastr.report == classic.report
    # multi-line FASTA still gets the reference's friendly error
    bad = b">a\nACGT\nACGT\n"
    monkeypatch.delenv("FASTX_TPU_NO_LINEPATH", raising=False)
    e = util.run_tool(mod, ["-Q", "33"], stdin=bad)
    assert e.status != 0
    assert "multi-line FASTA" in e.stderr


@pytest.mark.parametrize("tool,flags", [
    ("fastx_trimmer", ["-f", "3", "-l", "15"]),
    ("fastx_trimmer", ["-t", "2", "-m", "8"]),
    ("fastx_artifacts_filter", []),
])
def test_cli_fasta_line_fast_path_matches_classic(tool, flags, monkeypatch):
    """FASTA streams through the raw-line fast paths (collapsed-count
    weighted reports, span renders) must match the classic parser."""
    import importlib

    import util

    mod = importlib.import_module("fastx_toolkit_tpu.cli.tools." + tool)
    rng = np.random.default_rng(103)
    recs = []
    for i in range(250):
        ln = int(rng.integers(1, 30))
        seq = rng.choice(np.frombuffer(b"ACGTN", np.uint8), size=ln)
        name = b"f%d-%d" % (i, rng.integers(1, 7)) if i % 2 else b"plain%d" % i
        recs.append(b">%s\n%s\n" % (name, seq.tobytes()))
    # a homopolymer artifact
    recs.append(b">art-3\n" + b"G" * 30 + b"AT\n")
    data = b"".join(recs)
    monkeypatch.delenv("FASTX_TPU_NO_LINEPATH", raising=False)
    fastr = util.run_tool(mod, ["-Q", "33", "-v", *flags], stdin=data)
    monkeypatch.setenv("FASTX_TPU_NO_LINEPATH", "1")
    classic = util.run_tool(mod, ["-Q", "33", "-v", *flags], stdin=data)
    assert fastr.status == classic.status == 0, (fastr.stderr, classic.stderr)
    assert fastr.stdout == classic.stdout
    assert fastr.report == classic.report
    # multi-line FASTA falls back to the parser's friendly error
    monkeypatch.delenv("FASTX_TPU_NO_LINEPATH", raising=False)
    e = util.run_tool(mod, ["-Q", "33", *flags], stdin=b">a\nAC\nGT\n")
    assert e.status != 0 and "multi-line FASTA" in e.stderr


def test_ordinal_column_matches_python():
    from fastx_toolkit_tpu.ops.collapse import ordinal_column

    for start, n in ((0, 1), (0, 1234), (998, 10), (10 ** 7 - 3, 7), (5, 0)):
        flat, offs = ordinal_column(start, n)
        want = b"".join(b"%d" % (start + i + 1) for i in range(n))
        assert flat.tobytes() == want
        lens = [len(b"%d" % (start + i + 1)) for i in range(n)]
        assert np.array_equal(np.diff(offs), np.array(lens, np.int64))
