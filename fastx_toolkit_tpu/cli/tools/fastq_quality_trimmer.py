"""fastq_quality_trimmer — 3' low-quality run trimming.

Reference: /root/reference/src/fastq_quality_trimmer/fastq_quality_trimmer.c
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
from ..common import CliContext, errx
from . import _shared

USAGE = (
    "usage: fastq_quality_trimmer [-h] [-v] [-t N] [-l N] [-z] [-i INFILE] [-o OUTFILE]\n"
    "Part of " + common.PACKAGE_STRING + " by A. Gordon (assafgordon@gmail.com)\n"
    "\n"
    "   [-h]         = This helpful help screen.\n"
    "   [-t N]       = Quality threshold - nucleotides with lower \n"
    "                  quality will be trimmed (from the end of the sequence).\n"
    "   [-l N]       = Minimum length - sequences shorter than this (after trimming)\n"
    "                  will be discarded. Default = 0 = no minimum length. \n"
    "   [-z]         = Compress output with GZIP.\n"
    "   [-i INFILE]  = FASTQ input file. default is STDIN.\n"
    "   [-o OUTFILE] = FASTQ output file. default is STDOUT.\n"
    "   [-v]         = Verbose - report number of sequences.\n"
    "                  If [-o] is specified,  report will be printed to STDOUT.\n"
    "                  If [-o] is not specified (and output goes to STDOUT),\n"
    "                  report will be printed to STDERR.\n"
    "\n"
)

_trim_jit = jax.jit(
    transforms.quality_trimmer, static_argnames=("threshold", "min_len")
)


def tool_main(ctx: CliContext, argv) -> int:
    st = {"t": 0, "l": 0}

    def cb(args, opt, arg):
        if opt == "l":
            st["l"] = common.c_strtoul(arg)
        elif opt == "t":
            st["t"] = common.c_atoi(arg)

    args = common.parse_cmdline(ctx, argv, "t:l:", cb, USAGE)
    if st["t"] == 0:
        errx(ctx, "Missing minimum quality threshold value (-t)")

    reader = _shared.BatchReader(ctx, args, filetype=codec.FASTQ_ONLY)
    writer = common.OutputWriter(ctx, args)
    n_in = n_out = 0
    fast = _shared.line_fast_path(reader, args)
    for chunk, line_base in reader.iter_chunks():
        fr = fast(chunk) if fast is not None else None
        if fr is not None:
            from ...core import native

            new_lens, keep, _m = native.quality_decide(
                fr.buf, fr.qual_starts, fr.seq_lens, args.q_offset,
                trim_q=st["t"], trim_minlen=st["l"],
            )
            n_in += len(fr)
            n_out += int(keep.sum())
            writer.write(native.render_lines(
                fr.buf, fr.name_starts, fr.name_lens, fr.seq_starts,
                fr.qual_starts, fr.name2_starts, fr.name2_lens,
                new_lens, keep, out_fastq=True, q_offset=args.q_offset,
            ))
            continue
        batch = reader.parse_chunk(chunk, line_base)
        (bases, quals, lengths, counts), nb = to_device(batch)
        b2, q2, l2, keep = _trim_jit(
            bases, quals, lengths, threshold=st["t"], min_len=st["l"]
        )
        n_in += int(batch.counts.sum())
        batch.bases = np.asarray(b2)[:nb]
        batch.quals = np.asarray(q2)[:nb]
        batch.lengths = np.asarray(l2)[:nb]
        out = batch.select(np.asarray(keep)[:nb])
        n_out += int(out.counts.sum())
        writer.write(_shared.render_same_as_input(args, out))
    writer.close()

    if args.verbose:
        n_in, n_out = multihost.allsum(n_in, n_out)
        rep = common.report_stream(ctx, args)
        rep.write("Minimum Quality Threshold: %d\n" % st["t"])
        if st["l"] > 0:
            rep.write("Minimum Length: %d\n" % st["l"])
        else:
            rep.write("No minimum Length\n")
        _shared.in_out_report(rep, n_in, n_out)
        discarded = n_in - n_out
        rep.write(
            "discarded %d (%d%%) too-short reads.\n"
            % (discarded, (discarded * 100) // n_in if n_in else 0)
        )
    return 0


def main():
    sys.exit(common.run_tool_main(tool_main))


if __name__ == "__main__":
    main()
