"""fastx_collapser — collapse identical sequences to >rank-count records.

Reference: /root/reference/src/fastx_collapser/fastx_collapser.cpp
Tie order among equal counts: the reference exposes libstdc++ hash-table
iteration order (implementation-defined); we use first-appearance order
(documented deterministic choice, see ops/collapse.py).
"""

from __future__ import annotations

import sys

import numpy as np

from ...core import codec
from ...core.records import ReadBatch, StringColumn
from ...engine.pipeline import to_device
from ...ops import collapse
from .. import common
from ..common import CliContext
from . import _shared

USAGE = (
    "usage: fastx_collapser [-h] [-v] [-i INFILE] [-o OUTFILE]\n"
    "Part of " + common.PACKAGE_STRING + " by A. Gordon (assafgordon@gmail.com)\n"
    "\n"
    "   [-h]         = This helpful help screen.\n"
    "   [-v]         = verbose: print short summary of input/output counts\n"
    "   [-i INFILE]  = FASTA/Q input file. default is STDIN.\n"
    "   [-o OUTFILE] = FASTA/Q output file. default is STDOUT.\n"
    "\n"
)


def tool_main(ctx: CliContext, argv) -> int:
    args = common.parse_cmdline(ctx, argv, "", None, USAGE)
    batch = _shared.load_batch(ctx, args, filetype=codec.FASTA_OR_FASTQ)

    (bases, quals, lengths, counts), nb = to_device(batch)
    # padding rows are all-PAD sequences; give them count 0 and drop after
    uniq_idx, uniq_counts, uniq_first = collapse.collapse_batch(
        np.asarray(bases), np.asarray(counts)
    )
    # drop the padding segment (its representative row is >= nb or count 0)
    real = (uniq_idx < nb) & (uniq_counts > 0)
    uniq_idx, uniq_counts, uniq_first = (
        uniq_idx[real], uniq_counts[real], uniq_first[real]
    )
    order = collapse.final_order(uniq_counts, uniq_first)
    uniq_idx, uniq_counts = uniq_idx[order], uniq_counts[order]

    out = ReadBatch(
        bases=np.asarray(batch.bases)[uniq_idx],
        quals=np.zeros((len(uniq_idx), batch.width), np.int8),
        lengths=np.asarray(batch.lengths)[uniq_idx],
        counts=uniq_counts.astype(np.int32),
        names=StringColumn.from_list(
            [b"%d-%d" % (r + 1, c) for r, c in enumerate(uniq_counts)]
        ),
        names2=None,
        is_fastq=False,
    )
    writer = common.OutputWriter(ctx, args)
    writer.write(codec.render(out, out_fastq=False))
    writer.close()

    if args.verbose:
        rep = common.report_stream(ctx, args)
        rep.write(
            "Input: %d sequences (representing %d reads)\n"
            % (len(batch), int(batch.counts.sum()))
        )
        rep.write(
            "Output: %d sequences (representing %d reads)\n"
            % (len(uniq_idx), int(uniq_counts.sum()))
        )
    return 0


def main():
    sys.exit(common.run_tool_main(tool_main))


if __name__ == "__main__":
    main()
