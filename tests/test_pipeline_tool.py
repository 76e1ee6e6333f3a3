"""fastx_pipeline (fused multi-stage device program) must produce the
same bytes as chaining the individual tools."""

import os

import numpy as np
import pytest

from fastx_toolkit_tpu.cli.tools import (
    fastq_masker,
    fastq_quality_filter,
    fastq_quality_trimmer,
    fastq_to_fasta,
    fastx_artifacts_filter,
    fastx_clipper,
    fastx_pipeline,
    fastx_reverse_complement,
    fastx_trimmer,
)

from util import run_tool


def synth_fastq(n, lmin, lmax, seed):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        L = int(rng.integers(lmin, lmax + 1))
        seq = bytes(rng.choice(np.frombuffer(b"ACGTN", np.uint8), size=L,
                               p=[0.24, 0.24, 0.24, 0.24, 0.04]))
        qual = bytes((rng.integers(0, 41, L) + 33).astype(np.uint8))
        out.append(b"@r%d\n%s\n+\n%s\n" % (i, seq, qual))
    return b"".join(out)


def chain_tools(data, stages):
    """Run (module, argv) stages sequentially like a shell pipeline."""
    for mod, argv in stages:
        r = run_tool(mod, ["-Q", "33"] + argv, data)
        assert r.status == 0, r.stderr
        data = r.stdout
    return data


def fused(data, spec, extra=()):
    r = run_tool(fastx_pipeline, ["-Q", "33", *extra, spec], data)
    assert r.status == 0, r.stderr
    return r


def test_headline_chain_matches_sequential_tools():
    # the clipper's standalone CLI emulates the reference's grow-only
    # stale-matrix buffers across records; the fused pipeline documents
    # independent-read semantics, so compare against the clean CLI mode
    os.environ["FASTX_TPU_CLIPPER_CLEAN"] = "1"
    try:
        data = synth_fastq(400, 20, 60, seed=11)
        ref = chain_tools(data, [
            (fastx_trimmer, ["-l", "50"]),
            (fastq_quality_filter, ["-q", "20", "-p", "50"]),
            (fastq_quality_trimmer, ["-t", "20"]),
            (fastq_masker, ["-q", "20"]),
            (fastx_clipper, ["-a", "CTGTAGGCACC", "-l", "5", "-n"]),
            (fastx_artifacts_filter, []),
        ])
        got = fused(
            data,
            "fastx_trimmer -l 50 | fastq_quality_filter -q 20 -p 50 | "
            "fastq_quality_trimmer -t 20 | fastq_masker -q 20 | "
            "fastx_clipper -a CTGTAGGCACC -l 5 -n | fastx_artifacts_filter",
        )
        assert got.stdout == ref
    finally:
        del os.environ["FASTX_TPU_CLIPPER_CLEAN"]


def test_revcomp_and_fasta_stages():
    data = synth_fastq(150, 10, 40, seed=5)
    ref = chain_tools(data, [
        (fastq_quality_trimmer, ["-t", "15"]),
        (fastx_reverse_complement, []),
        (fastq_to_fasta, ["-r"]),
    ])
    got = fused(
        data,
        "fastq_quality_trimmer -t 15 | fastx_reverse_complement | fastq_to_fasta -r",
    )
    assert got.stdout == ref


def test_verbose_stage_counts():
    data = synth_fastq(100, 25, 25, seed=7)
    got = fused(data, "fastx_trimmer -l 20 | fastq_quality_filter -q 39 -p 90",
                extra=("-v",))
    rep = got.stderr  # no -o: the report goes to stderr (fastx_args.c:87)
    assert "Fused pipeline: 2 stages" in rep
    assert "Input: 100 reads." in rep
    # the q39/p90 filter is harsh: output must be < input and consistent
    # with the byte output
    n_out = got.stdout.count(b"@r")
    assert ("-> %d reads." % n_out) in rep


def test_rejects_quality_stage_after_fasta():
    data = synth_fastq(10, 20, 20, seed=1)
    r = run_tool(
        fastx_pipeline,
        ["-Q", "33", "fastq_to_fasta | fastq_masker -q 10"],
        data,
    )
    assert r.status != 0


def test_rejects_unknown_stage():
    r = run_tool(fastx_pipeline, ["-Q", "33", "fastx_collapser"], b"@a\nA\n+\n!\n")
    assert r.status != 0


def test_pipeline_engine_path_matches_classic(monkeypatch):
    """The raw-line streaming engine (chain_to_config + engine.lines)
    must match the classic per-batch loop byte for byte, including an
    engine-ineligible (numeric-quality) chunk mid-stream."""
    import numpy as np

    from fastx_toolkit_tpu.core import native

    if native.LIB is None:
        pytest.skip("native codec unavailable")
    rng = np.random.default_rng(91)
    recs = []
    for i in range(400):
        ln = int(rng.integers(5, 60))
        seq = rng.choice(np.frombuffer(b"ACGTN" if i % 6 else b"ACGT", np.uint8),
                         size=ln)
        q = (rng.integers(0, 41, ln) + 33).astype(np.uint8)
        recs.append(b"@p%d\n%s\n+\n%s\n" % (i, seq.tobytes(), q.tobytes()))
    # a numeric-quality record forces its chunk onto the classic fallback
    recs.insert(200, b"@nq\nACGT\n+\n30 31 32 33\n")
    data = b"".join(recs)
    chain = ("fastx_trimmer -l 50 | fastq_quality_filter -q 12 -p 40 | "
             "fastq_quality_trimmer -t 10 | fastq_masker -q 8 | "
             "fastx_clipper -a CCTTAAGGACCA -n -l 5 | fastx_artifacts_filter")
    monkeypatch.delenv("FASTX_TPU_NO_LINEPATH", raising=False)
    fastr = run_tool(fastx_pipeline, ["-Q", "33", chain], stdin=data)
    monkeypatch.setenv("FASTX_TPU_NO_LINEPATH", "1")
    classic = run_tool(fastx_pipeline, ["-Q", "33", chain], stdin=data)
    assert fastr.status == classic.status == 0, (fastr.stderr, classic.stderr)
    assert fastr.stdout == classic.stdout
    # a to_fasta-terminated chain renders FASTA from the engine too
    chain2 = "fastq_quality_trimmer -t 10 | fastq_to_fasta"
    monkeypatch.delenv("FASTX_TPU_NO_LINEPATH", raising=False)
    f2 = run_tool(fastx_pipeline, ["-Q", "33", chain2], stdin=data)
    monkeypatch.setenv("FASTX_TPU_NO_LINEPATH", "1")
    c2 = run_tool(fastx_pipeline, ["-Q", "33", chain2], stdin=data)
    assert f2.status == c2.status == 0
    assert f2.stdout == c2.stdout


def test_pipeline_engine_preserves_numeric_qualities(monkeypatch):
    """A numeric-quality FASTQ stream through a fused-supported chain
    must keep its numeric representation (the engine's classic fallback
    renders with per-record qual_ascii, fastx.c:382-390)."""
    import numpy as np

    from fastx_toolkit_tpu.core import native

    if native.LIB is None:
        pytest.skip("native codec unavailable")
    rng = np.random.default_rng(93)
    recs = []
    for i in range(50):
        ln = int(rng.integers(8, 30))
        seq = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=ln)
        q = rng.integers(20, 41, ln)
        if i % 3 == 0:  # numeric-quality records interleaved with ASCII
            qline = b" ".join(b"%d" % v for v in q)
        else:
            qline = (q + 33).astype(np.uint8).tobytes()
        recs.append(b"@m%d\n%s\n+\n%s\n" % (i, seq.tobytes(), qline))
    data = b"".join(recs)
    chain = "fastq_quality_trimmer -t 5"
    monkeypatch.delenv("FASTX_TPU_NO_LINEPATH", raising=False)
    fastr = run_tool(fastx_pipeline, ["-Q", "33", chain], stdin=data)
    monkeypatch.setenv("FASTX_TPU_NO_LINEPATH", "1")
    classic = run_tool(fastx_pipeline, ["-Q", "33", chain], stdin=data)
    assert fastr.status == classic.status == 0, (fastr.stderr, classic.stderr)
    assert fastr.stdout == classic.stdout
    assert b"@m0\n" in fastr.stdout and b" " in fastr.stdout.split(b"\n")[3]


def test_pipeline_engine_long_reads_take_classic_path(monkeypatch):
    """Reads beyond the reference's 25,000-base cap must route to the
    classic int32 path (the packed dispatch carries int16 lengths)."""
    import numpy as np

    from fastx_toolkit_tpu.core import native

    if native.LIB is None:
        pytest.skip("native codec unavailable")
    rng = np.random.default_rng(95)
    big = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=30000)
    q = (rng.integers(20, 41, 30000) + 33).astype(np.uint8)
    small = b"@s\nACGTACGTACGT\n+\nIIIIIIIIIIII\n"
    data = small + b"@big\n%s\n+\n%s\n" % (big.tobytes(), q.tobytes()) + small
    chain = "fastq_quality_trimmer -t 5"
    monkeypatch.delenv("FASTX_TPU_NO_LINEPATH", raising=False)
    fastr = run_tool(fastx_pipeline, ["-Q", "33", chain], stdin=data)
    monkeypatch.setenv("FASTX_TPU_NO_LINEPATH", "1")
    classic = run_tool(fastx_pipeline, ["-Q", "33", chain], stdin=data)
    assert fastr.status == classic.status == 0
    assert fastr.stdout == classic.stdout
    assert b"@big\n" in fastr.stdout
