"""Golden-file parity suite: the reference's Galaxy functional tests
(/root/reference/galaxy/tools/fastx_toolkit/*.xml <tests> blocks) run
against our CLI tools, byte-compared with galaxy/test-data fixtures."""

from util import fixture, run_tool

from fastx_toolkit_tpu.cli.tools import (
    fasta_nucleotide_changer,
    fastq_masker,
    fastq_quality_converter,
    fastq_quality_filter,
    fastq_quality_trimmer,
    fastq_to_fasta,
    fastx_artifacts_filter,
    fastx_quality_stats,
    fastx_renamer,
    fastx_reverse_complement,
    fastx_trimmer,
)


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


class TestFastxTrimmer:
    def test_fasta_f5_l36(self):
        r = run_tool(fastx_trimmer, ["-v", "-f", "5", "-l", "36"], fixture("fastx_trimmer1.fasta"))
        assert r.status == 0
        assert r.stdout == fixture("fastx_trimmer1.out")

    def test_fastq_f1_l27(self):
        r = run_tool(fastx_trimmer, ["-Q", "64", "-v", "-f", "1", "-l", "27"], fixture("fastx_trimmer2.fastq"))
        assert r.status == 0
        assert r.stdout == fixture("fastx_trimmer2.out")

    def test_from_end_t2_m16(self):
        r = run_tool(fastx_trimmer, ["-v", "-t", "2", "-m", "16"], fixture("fastx_trimmer_from_end1.fasta"))
        assert r.status == 0
        assert r.stdout == fixture("fastx_trimmer_from_end1.out")

    def test_t_with_f_rejected(self):
        r = run_tool(fastx_trimmer, ["-t", "2", "-f", "3"], b">a\nACGT\n")
        assert r.status == 1
        assert "can not be used together" in r.stderr


class TestFastqQualityFilter:
    def test_q33_p100(self):
        r = run_tool(fastq_quality_filter, ["-Q", "64", "-q", "33", "-p", "100", "-v"], fixture("fastq_qual_filter1.fastq"))
        assert r.status == 0
        assert r.stdout == fixture("fastq_qual_filter1a.out")

    def test_q20_p80(self):
        r = run_tool(fastq_quality_filter, ["-Q", "64", "-q", "20", "-p", "80", "-v"], fixture("fastq_qual_filter1b_input_same.fastq") if False else fixture("fastq_qual_filter1.fastq"))
        assert r.status == 0
        assert r.stdout == fixture("fastq_qual_filter1b.out")


class TestFastqQualityTrimmer:
    def test_t30_l16(self):
        r = run_tool(fastq_quality_trimmer, ["-Q", "64", "-v", "-t", "30", "-l", "16"], fixture("fastq_quality_trimmer.fastq"))
        assert r.status == 0
        assert r.stdout == fixture("fastq_quality_trimmer.out")

    def test_t_required(self):
        r = run_tool(fastq_quality_trimmer, [], b"@a\nAC\n+\n!!\n")
        assert r.status == 1
        assert "Missing minimum quality threshold" in r.stderr


class TestFastqMasker:
    def test_cutoff29_mask_x(self):
        r = run_tool(fastq_masker, ["-Q", "64", "-v", "-q", "29", "-r", "x"], fixture("fastq_masker.fastq"))
        assert r.status == 0
        assert r.stdout == fixture("fastq_masker.out")


class TestFastqQualityConverter:
    def test_ascii_to_numeric(self):
        r = run_tool(fastq_quality_converter, ["-n", "-Q", "64"], fixture("fastq_qual_conv1.fastq"))
        assert r.status == 0
        assert r.stdout == fixture("fastq_qual_conv1.out")

    def test_ascii_to_ascii(self):
        r = run_tool(fastq_quality_converter, ["-a", "-Q", "64"], fixture("fastq_qual_conv1.fastq"))
        assert r.status == 0
        assert r.stdout == fixture("fastq_qual_conv1a.out")

    def test_numeric_to_ascii(self):
        r = run_tool(fastq_quality_converter, ["-a", "-Q", "64"], fixture("fastq_qual_conv2.fastq"))
        assert r.status == 0
        assert r.stdout == fixture("fastq_qual_conv2.out")

    def test_numeric_to_numeric(self):
        r = run_tool(fastq_quality_converter, ["-n", "-Q", "64"], fixture("fastq_qual_conv2.fastq"))
        assert r.status == 0
        assert r.stdout == fixture("fastq_qual_conv2n.out")


class TestArtifactsFilter:
    def test_fasta(self):
        r = run_tool(fastx_artifacts_filter, ["-v"], fixture("fastx_artifacts1.fasta"))
        assert r.status == 0
        assert r.stdout == fixture("fastx_artifacts1.out")

    def test_fastq(self):
        r = run_tool(fastx_artifacts_filter, ["-Q", "33", "-v"], fixture("fastx_artifacts2.fastq"))
        assert r.status == 0
        assert r.stdout == fixture("fastx_artifacts2.out")


class TestReverseComplement:
    def test_fasta(self):
        r = run_tool(fastx_reverse_complement, ["-v"], fixture("fastx_rev_comp1.fasta"))
        assert r.status == 0
        assert r.stdout == fixture("fastx_reverse_complement1.out")

    def test_fastq(self):
        r = run_tool(fastx_reverse_complement, ["-Q", "64", "-v"], fixture("fastx_rev_comp2.fastq"))
        assert r.status == 0
        assert r.stdout == fixture("fastx_reverse_complement2.out")


class TestRenamer:
    def test_seq(self):
        r = run_tool(fastx_renamer, ["-Q", "64", "-n", "SEQ", "-v"], fixture("fastx_renamer1.fastq"))
        assert r.status == 0
        assert r.stdout == fixture("fastx_renamer1.out")


class TestNucleotideChanger:
    def test_dna_to_rna(self):
        r = run_tool(fasta_nucleotide_changer, ["-r", "-v"], fixture("fasta_nuc_changer1.fasta"))
        assert r.status == 0
        assert r.stdout == fixture("fasta_nuc_changer1.out")

    def test_rna_to_dna(self):
        r = run_tool(fasta_nucleotide_changer, ["-d", "-v"], fixture("fasta_nuc_changer2.fasta"))
        assert r.status == 0
        assert r.stdout == fixture("fasta_nuc_changer2.out")

    def test_mode_required(self):
        r = run_tool(fasta_nucleotide_changer, [], b">a\nACGT\n")
        assert r.status == 1
        assert "Please specify either RNA mode" in r.stderr


class TestQualityStats:
    def test_old_format(self):
        r = run_tool(fastx_quality_stats, ["-Q", "64"], fixture("fastq_stats1.fastq"))
        assert r.status == 0
        assert r.stdout == fixture("fastq_stats1.out")

    def test_new_format_runs(self):
        r = run_tool(fastx_quality_stats, ["-Q", "64", "-N"], fixture("fastq_stats1.fastq"))
        assert r.status == 0
        assert r.stdout.startswith(b"cycle\tmax_count\tALL_count")


class TestClipper:
    def test_golden_1a(self):
        from fastx_toolkit_tpu.cli.tools import fastx_clipper
        r = run_tool(
            fastx_clipper,
            ["-Q", "64", "-l", "15", "-a", "CAATTGGTTAATCCCCCTATATA", "-d", "0", "-v", "-c", "-n"],
            fixture("fastx_clipper1.fastq"),
        )
        assert r.status == 0
        assert r.stdout == fixture("fastx_clipper1a.out")
