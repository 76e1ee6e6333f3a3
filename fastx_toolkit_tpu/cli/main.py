"""`fastx-tpu` dispatcher: one binary, all tools (plus per-tool entry
points named exactly like the reference binaries)."""

from __future__ import annotations

import sys

TOOLS = {
    "fastq_to_fasta": "fastx_toolkit_tpu.cli.tools.fastq_to_fasta",
    "fastq_quality_converter": "fastx_toolkit_tpu.cli.tools.fastq_quality_converter",
    "fastq_quality_filter": "fastx_toolkit_tpu.cli.tools.fastq_quality_filter",
    "fastq_quality_trimmer": "fastx_toolkit_tpu.cli.tools.fastq_quality_trimmer",
    "fastq_masker": "fastx_toolkit_tpu.cli.tools.fastq_masker",
    "fastx_trimmer": "fastx_toolkit_tpu.cli.tools.fastx_trimmer",
    "fastx_clipper": "fastx_toolkit_tpu.cli.tools.fastx_clipper",
    "fastx_artifacts_filter": "fastx_toolkit_tpu.cli.tools.fastx_artifacts_filter",
    "fastx_reverse_complement": "fastx_toolkit_tpu.cli.tools.fastx_reverse_complement",
    "fastx_collapser": "fastx_toolkit_tpu.cli.tools.fastx_collapser",
    "fastx_uncollapser": "fastx_toolkit_tpu.cli.tools.fastx_uncollapser",
    "fastx_renamer": "fastx_toolkit_tpu.cli.tools.fastx_renamer",
    "fasta_nucleotide_changer": "fastx_toolkit_tpu.cli.tools.fasta_nucleotide_changer",
    "fasta_formatter": "fastx_toolkit_tpu.cli.tools.fasta_formatter",
    "fastx_quality_stats": "fastx_toolkit_tpu.cli.tools.fastx_quality_stats",
    "fastx_pipeline": "fastx_toolkit_tpu.cli.tools.fastx_pipeline",
    "seqalign_test": "fastx_toolkit_tpu.cli.tools.seqalign_test",
    "fastx_barcode_splitter": "fastx_toolkit_tpu.scripts.barcode_splitter",
    "fastq_quality_boxplot_graph": "fastx_toolkit_tpu.scripts.quality_boxplot",
    "fastx_nucleotide_distribution_graph": "fastx_toolkit_tpu.scripts.nucleotide_distribution",
    "fasta_clipping_histogram": "fastx_toolkit_tpu.scripts.clipping_histogram",
}


def main():
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help"):
        print("usage: fastx-tpu TOOL [ARGS...]\n\ntools:")
        for t in sorted(TOOLS):
            print("  " + t)
        sys.exit(0 if len(sys.argv) >= 2 else 1)
    tool = sys.argv[1]
    name = tool.removesuffix(".pl").removesuffix(".sh")
    if name == "fastx_nucleotide_distribution_line_graph":
        import importlib

        mod = importlib.import_module(TOOLS["fastx_nucleotide_distribution_graph"])
        sys.argv = [tool] + sys.argv[2:]
        mod.main_line()
        return
    if name not in TOOLS:
        print("fastx-tpu: unknown tool '%s'" % tool, file=sys.stderr)
        sys.exit(1)
    import importlib

    mod = importlib.import_module(TOOLS[name])
    sys.argv = [tool] + sys.argv[2:]
    mod.main()


if __name__ == "__main__":
    main()
