"""Differential parity vs the actual reference Perl barcode splitter.

Runs /root/reference/scripts/fastx_barcode_splitter.pl (perl is on this
box) and our fastx_toolkit_tpu.scripts.barcode_splitter on identical
randomized reads + barcode files, sweeping --bol/--eol, --mismatches,
--exact and --partial, and byte-compares the summary table and every
output file.  Both runs use the same RELATIVE --prefix from different
working directories so the summary's Location column is byte-identical.

Reference semantics exercised (fastx_barcode_splitter.pl):
* XOR-hamming mismatch count (:271-276)
* first-strict-improvement tie break over barcode-file order (:250)
* partial-barcode expansion with (length-difference) penalty (:176-181,
  :244-248)
* unmatched routing (:252-257) and the summary table (:280-289)
"""

import io
import os
import shutil
import subprocess

import numpy as np
import pytest

PERL = shutil.which("perl")
SCRIPT = "/root/reference/scripts/fastx_barcode_splitter.pl"

pytestmark = pytest.mark.skipif(
    not (PERL and os.path.exists(SCRIPT)),
    reason="perl or the reference splitter unavailable",
)

BASES = np.frombuffer(b"ACGT", np.uint8)


def synth_input(seed: int, n: int, barcodes, *, bol: bool, fastq: bool,
                bc_len: int) -> bytes:
    """Reads that carry a (randomly mutated) barcode at the 5'/3' end,
    plus some pure-random reads, plus short reads (< barcode length) and
    occasional N bases to hit every code path."""
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        L = int(rng.integers(4, 40))
        body = bytearray(rng.choice(BASES, size=L))
        if rng.random() < 0.75 and L >= bc_len:
            bc = bytearray(barcodes[int(rng.integers(0, len(barcodes)))])
            n_mut = int(rng.integers(0, 4))
            for _ in range(n_mut):
                bc[int(rng.integers(0, bc_len))] = int(rng.choice(BASES))
            if bol:
                body[:bc_len] = bc
            else:
                body[-bc_len:] = bc
        if rng.random() < 0.05:
            body[int(rng.integers(0, len(body)))] = ord("N")
        seq = bytes(body)
        if fastq:
            qual = bytes((rng.integers(0, 41, len(seq)) + 33).astype(np.uint8))
            out.append(b"@r%d\n%s\n+r%d\n%s\n" % (i, seq, i, qual))
        else:
            out.append(b">r%d\n%s\n" % (i, seq))
    return b"".join(out)


def make_barcodes(seed: int, n_bc: int, bc_len: int):
    rng = np.random.default_rng(seed)
    bcs = []
    while len(bcs) < n_bc:
        b = bytes(rng.choice(BASES, size=bc_len))
        if b not in bcs:
            bcs.append(b)
    return bcs


def bcfile_bytes(bcs) -> bytes:
    lines = [b"#ident\tbarcode (comment line)\n"]
    for i, b in enumerate(bcs):
        lines.append(b"BC%02d\t%s\n" % (i + 1, b))
    return b"".join(lines)


def run_perl(workdir, bcfile, data: bytes, argv):
    p = subprocess.run(
        [PERL, SCRIPT, "--bcfile", bcfile, "--prefix", "out/", *argv],
        input=data, capture_output=True, cwd=workdir, timeout=300,
    )
    return p.returncode, p.stdout, p.stderr


def run_ours(workdir, bcfile, data: bytes, argv):
    from fastx_toolkit_tpu.core.errors import FastxError
    from fastx_toolkit_tpu.scripts import barcode_splitter

    old = os.getcwd()
    out, err = io.StringIO(), io.StringIO()
    os.chdir(workdir)
    try:
        rc = barcode_splitter.main_io(
            ["--bcfile", bcfile, "--prefix", "out/", *argv],
            io.BytesIO(data), out, err,
        )
    except SystemExit as e:  # argument errors exit like the Perl's die
        rc = e.code if isinstance(e.code, int) else 1
    except FastxError as e:  # what main() turns into stderr + exit status
        err.write(str(e))
        rc = e.status
    finally:
        os.chdir(old)
    return rc, out.getvalue().encode(), err.getvalue()


def compare_runs(tmp_path, bcs, data, argv):
    bcfile = tmp_path / "bc.txt"
    bcfile.write_bytes(bcfile_bytes(bcs))
    pdir = tmp_path / "perl"
    odir = tmp_path / "ours"
    (pdir / "out").mkdir(parents=True)
    (odir / "out").mkdir(parents=True)
    prc, pout, perr = run_perl(str(pdir), str(bcfile), data, argv)
    orc, oout, oerr = run_ours(str(odir), str(bcfile), data, argv)
    assert orc == prc, (oerr, perr)
    assert oout == pout  # summary table (counts + locations)
    pfiles = sorted(os.listdir(pdir / "out"))
    ofiles = sorted(os.listdir(odir / "out"))
    assert ofiles == pfiles
    for f in pfiles:
        assert (odir / "out" / f).read_bytes() == (pdir / "out" / f).read_bytes(), f


SWEEP = [
    # (bol, fastq, mismatches, exact, partial, suffix)
    (True, True, 1, False, 0, [".txt"]),
    (True, False, 2, False, 0, []),
    (False, True, 2, False, 0, [".fq"]),
    (False, False, 0, False, 0, []),
    (True, True, 0, True, 0, []),
    (True, True, 2, False, 2, []),
    (False, True, 1, False, 1, []),
    (False, False, 3, False, 2, [".txt"]),
]


@pytest.mark.parametrize("bol,fastq,mm,exact,partial,suffix", SWEEP)
def test_splitter_differential(tmp_path, bol, fastq, mm, exact, partial, suffix):
    seed = hash((bol, fastq, mm, exact, partial)) % 2**31
    bc_len = int(np.random.default_rng(seed).integers(5, 9))
    bcs = make_barcodes(seed + 1, 6, bc_len)
    data = synth_input(seed + 2, 400, bcs, bol=bol, fastq=fastq, bc_len=bc_len)
    argv = ["--bol" if bol else "--eol", "--mismatches", str(mm)]
    if exact:
        argv.append("--exact")
    if partial:
        argv += ["--partial", str(partial)]
    if suffix:
        argv += ["--suffix", suffix[0]]
    compare_runs(tmp_path, bcs, data, argv)


def test_splitter_tie_cases(tmp_path):
    """Reads exactly equidistant between two barcodes: the Perl takes the
    FIRST barcode (strict < improvement, :250); ours must match."""
    bcs = [b"AAAAAA", b"AAAATT", b"TTTTTT", b"AAATTA"]
    reads = [
        b"AAAATA" + b"CGCGCGCG",  # 1 mm to BC1? no: 2 mm BC1, 1 mm BC2
        b"AAAAAT" + b"GGGGGGGG",  # 1 mm BC1, 1 mm BC2 -> tie, first wins
        b"TTTTAA" + b"ACACACAC",  # 2 mm BC3, ...
        b"AATTTA" + b"CACACACA",  # ties across BC2/BC4
        b"AAAAAA" + b"TTTTTTTT",  # exact BC1
    ]
    data = b"".join(b">t%d\n%s\n" % (i, r) for i, r in enumerate(reads))
    compare_runs(tmp_path, bcs, data, ["--bol", "--mismatches", "2"])


def test_splitter_error_messages(tmp_path):
    """Malformed barcode files: byte-identical error text + exit code."""
    cases = [
        b"BC1\tAAAA\nBC2\tAAAAAA\n",  # differing lengths
        b"BC1\tAAXA\n",  # invalid character
        b"justoneword\n",
        b"",
    ]
    data = b">r0\nACGTACGT\n"
    for payload in cases:
        bcfile = tmp_path / "bad.txt"
        bcfile.write_bytes(payload)
        pdir = tmp_path / "p"
        odir = tmp_path / "o"
        (pdir / "out").mkdir(parents=True, exist_ok=True)
        (odir / "out").mkdir(parents=True, exist_ok=True)
        prc, pout, perr = run_perl(str(pdir), str(bcfile), data, ["--bol"])
        orc, oout, oerr = run_ours(str(odir), str(bcfile), data, ["--bol"])
        # Perl's die exits with whatever errno happens to be set (here an
        # inherited ENOTTY) — environment noise, not semantics; compare
        # success/failure only, but the error TEXT byte-exactly
        assert (orc == 0) == (prc == 0), (payload, orc, prc, oerr, perr)
        assert oout == pout, payload
        # drop interpreter warnings ("Use of uninitialized value ... at
        # <script path> line N") that embed the reference's file path
        perr_clean = b"".join(
            l for l in perr.splitlines(keepends=True)
            if not l.startswith(b"Use of uninitialized value")
        )
        assert oerr == perr_clean.decode(), payload
        if prc == 0:  # the empty-bcfile case writes an unmatched file
            pfiles = sorted(os.listdir(pdir / "out"))
            assert sorted(os.listdir(odir / "out")) == pfiles
            for f in pfiles:
                assert (odir / "out" / f).read_bytes() == \
                    (pdir / "out" / f).read_bytes(), f
