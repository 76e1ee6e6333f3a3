"""Golden-file parity suite: the reference's Galaxy functional tests
(/root/reference/galaxy/tools/fastx_toolkit/*.xml <tests> blocks) run
against our CLI tools, byte-compared with galaxy/test-data fixtures."""

from util import fixture, run_tool

from fastx_toolkit_tpu.cli.tools import fastq_to_fasta


class TestFastqToFasta:
    def test_discard_n_no_rename(self):
        r = run_tool(fastq_to_fasta, ["-Q", "64", "-v"], fixture("fastq_to_fasta1.fastq"))
        assert r.status == 0
        assert r.stdout == fixture("fastq_to_fasta1a.out")

    def test_keep_n_rename(self):
        r = run_tool(
            fastq_to_fasta, ["-Q", "64", "-n", "-r", "-v"], fixture("fastq_to_fasta1.fastq")
        )
        assert r.status == 0
        assert r.stdout == fixture("fastq_to_fasta1b.out")

    def test_verbose_report(self):
        r = run_tool(fastq_to_fasta, ["-Q", "64", "-v"], fixture("fastq_to_fasta1.fastq"))
        assert "Input: " in r.stderr and "discarded" in r.stderr
