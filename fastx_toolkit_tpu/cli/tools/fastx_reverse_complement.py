"""fastx_reverse_complement.

Reference: /root/reference/src/fastx_reverse_complement/fastx_reverse_complement.c
"""

from __future__ import annotations

import sys

import jax
import numpy as np

from ...core import codec
from ...engine.pipeline import to_device
from ...ops import transforms
from ...parallel import multihost
from .. import common
from ..common import CliContext
from . import _shared

USAGE = (
    "usage: fastx_reverse_complement [-h] [-r] [-z] [-v] [-i INFILE] [-o OUTFILE]\n"
    "Part of " + common.PACKAGE_STRING + " by A. Gordon (assafgordon@gmail.com)\n"
    "\n"
    "   [-h]         = This helpful help screen.\n"
    "   [-z]         = Compress output with GZIP.\n"
    "   [-i INFILE]  = FASTA/Q input file. default is STDIN.\n"
    "   [-o OUTFILE] = FASTA/Q output file. default is STDOUT.\n"
    "\n"
)

_rc_jit = jax.jit(transforms.reverse_complement, static_argnames=("is_fastq",))


def tool_main(ctx: CliContext, argv) -> int:
    args = common.parse_cmdline(ctx, argv, "", None, USAGE)
    reader = _shared.BatchReader(ctx, args, filetype=codec.FASTA_OR_FASTQ)
    writer = common.OutputWriter(ctx, args)
    n = 0
    for batch in reader:
        (bases, quals, lengths, counts), nb = to_device(batch)
        b2, q2 = _rc_jit(bases, quals, lengths, is_fastq=batch.is_fastq)
        batch.bases = np.asarray(b2)[:nb]
        batch.quals = np.asarray(q2)[:nb]
        n += int(batch.counts.sum())
        writer.write(_shared.render_same_as_input(args, batch))
    writer.close()

    if args.verbose:
        (n,) = multihost.allsum(n)
        rep = common.report_stream(ctx, args)
        rep.write("Printing Reverse-Complement Sequences.\n")
        _shared.in_out_report(rep, n, n)
    return 0


def main():
    sys.exit(common.run_tool_main(tool_main))


if __name__ == "__main__":
    main()
