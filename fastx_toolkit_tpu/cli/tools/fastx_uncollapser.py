"""fastx_uncollapser — expand collapsed records / tabular lines by count.

Reference: /root/reference/src/fastx_uncollapser/fastx_uncollapser.cpp
"""

from __future__ import annotations

import re
import sys

import numpy as np

from ...core import codec
from ...core.records import StringColumn
from .. import common
from ..common import CliContext, ExitWithStatus, errx
from . import _shared

USAGE = (
    "usage: fasta_uncollapser [-c N] [-h] [-v] [-i INFILE] [-o OUTFILE]\n"
    "Part of " + common.PACKAGE_STRING + " by A. Gordon (assafgordon@gmail.com)\n"
    "\n"
    "   [-h]         = This helpful help screen.\n"
    "   [-v]         = verbose: print short summary of input/output counts\n"
    "   [-c N]       = Assume input is a tabular file (not FASTA file),\n"
    "                  And the collapsed identifier (e.g. '1-1000') is on column N.\n"
    "   [-i INFILE]  = FASTA/Tabular input file. default is STDIN.\n"
    "   [-o OUTFILE] = FASTA/Tabular output file. default is STDOUT.\n"
    "\n"
)

_STRTOUL_RE = re.compile(rb"^[ \t\n\v\f\r]*\+?([0-9]+)")


def extract_collapsed_read_count(text: bytes) -> int:
    """fastx_uncollapser.cpp:101-123."""
    value = text
    dash = text.find(b"-")
    if dash != -1:
        if dash + 1 < len(text):
            value = text[dash + 1 :]
        else:
            return 1
    # strtoul then require the whole string consumed (*endptr == 0)
    m = _STRTOUL_RE.match(value)
    if m and m.end() == len(value):
        count = int(m.group(1))
        if count > 0:
            return count
    return 1


def _uncollapse_fasta(ctx, args):
    reader = _shared.BatchReader(ctx, args, filetype=codec.FASTA_ONLY)
    writer = common.OutputWriter(ctx, args)
    n_in_seq = n_reads = n_out = 0
    for batch in reader:
        counts = np.asarray(batch.counts, dtype=np.int64)
        idx = np.repeat(np.arange(len(batch)), counts)
        out = batch.take(idx)
        out.counts = np.ones(len(idx), np.int32)
        out.names = StringColumn.from_list(
            [b"%d" % (n_out + i + 1) for i in range(len(idx))]
        )
        n_in_seq += len(batch)
        n_reads += int(counts.sum())
        n_out += len(idx)
        writer.write(codec.render(out, out_fastq=False))
    writer.close()

    if args.verbose:
        rep = common.report_stream(ctx, args)
        rep.write(
            "Input: %d sequences (representing %d reads)\n" % (n_in_seq, n_reads)
        )
        rep.write(
            "Output: %d sequences (representing %d reads)\n" % (n_out, n_reads)
        )


def _uncollapse_tabular(ctx, args, column: int):
    data = common.read_input(ctx, args)
    lines = data.split(b"\n")
    if lines and lines[-1] == b"":
        lines.pop()
    out = []
    input_count = 0
    output_count = 0
    for lineno, line in enumerate(lines, 1):
        input_count += 1
        tokens = line.split(b"\t")
        if len(tokens) < column:
            print(
                "Input error in file '%s' line %d: got only %d columns, "
                "but collapsed identifier column (-c) is %d"
                % (args.input_filename, lineno, len(tokens), column),
                file=ctx.stderr,
            )
            raise ExitWithStatus(1)
        count = extract_collapsed_read_count(tokens[column - 1])
        output_count += count
        out.extend([line] * count)
    writer = common.OutputWriter(ctx, args)
    writer.write(b"".join(x + b"\n" for x in out))
    writer.close()

    if args.verbose:
        rep = common.report_stream(ctx, args)
        rep.write("Input: %d lines (with collapsed sequence identifiers)\n" % input_count)
        rep.write("Output: %d lines\n" % output_count)


def tool_main(ctx: CliContext, argv) -> int:
    st = {"column": 0}

    def cb(args, opt, arg):
        if opt == "c":
            st["column"] = common.c_strtoul(arg)
            if st["column"] <= 0:
                errx(ctx, "Invalid column number (-c %s)" % arg)

    args = common.parse_cmdline(ctx, argv, "c:", cb, USAGE)
    if st["column"] == 0:
        _uncollapse_fasta(ctx, args)
    else:
        _uncollapse_tabular(ctx, args, st["column"])
    return 0


def main():
    sys.exit(common.run_tool_main(tool_main))


if __name__ == "__main__":
    main()
