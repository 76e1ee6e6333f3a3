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
from ...parallel import multihost
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
    reader = _shared.BatchReader(ctx, args, filetype=codec.FASTA_OR_FASTQ)

    # streaming accumulation: per-chunk device dedup (sort+segment-reduce)
    # shrinks each chunk to its unique sequences; a host table merges
    # chunks (count sum, min first-appearance)
    table: dict = {}
    n_in_seq = 0
    n_in_reads = 0
    rec_base = 0
    for batch in reader:
        (bases, quals, lengths, counts), nb = to_device(batch)
        uniq_idx, uniq_counts, uniq_first = collapse.collapse_batch(
            np.asarray(bases), np.asarray(counts)
        )
        real = (uniq_idx < nb) & (uniq_counts > 0)
        uniq_idx, uniq_counts, uniq_first = (
            uniq_idx[real], uniq_counts[real], uniq_first[real]
        )
        bmat = np.asarray(batch.bases)
        blens = np.asarray(batch.lengths)
        for ridx, c, f in zip(uniq_idx, uniq_counts, uniq_first):
            seq = bmat[ridx, : blens[ridx]].tobytes()
            ent = table.get(seq)
            if ent is None:
                table[seq] = [int(c), rec_base + int(f)]
            else:
                ent[0] += int(c)
        n_in_seq += nb
        n_in_reads += int(batch.counts.sum())
        rec_base += nb

    # multi-host: each process collapsed its own byte-range shard; shift
    # first-appearance indices by the global record offset (shards are
    # file-ordered), allgather the (seq -> count, first) tables and merge
    # associatively — every process ends with the identical global table,
    # so the rank/count/tie-break order matches a single-process run.
    info = multihost.shard_info()
    if info.active and info.collective:
        offset = multihost.global_record_offset(rec_base)
        local = [(s, c, f + offset) for s, (c, f) in table.items()]
        table = {}
        for part in multihost.allgather_object(local):
            for s, c, f in part:
                ent = table.get(s)
                if ent is None:
                    table[s] = [c, f]
                else:
                    ent[0] += c
                    ent[1] = min(ent[1], f)
        n_in_seq, n_in_reads = multihost.allsum(n_in_seq, n_in_reads)

    seqs = list(table.keys())
    uniq_counts = np.array([table[s][0] for s in seqs], np.int64)
    uniq_first = np.array([table[s][1] for s in seqs], np.int64)
    order = collapse.final_order(uniq_counts, uniq_first)

    width = max((len(s) for s in seqs), default=0)
    out_bases = np.zeros((len(seqs), width), np.uint8)
    out_lens = np.zeros(len(seqs), np.int32)
    for r, oi in enumerate(order):
        s = seqs[oi]
        out_bases[r, : len(s)] = np.frombuffer(s, np.uint8)
        out_lens[r] = len(s)
    uniq_counts = uniq_counts[order]

    out = ReadBatch(
        bases=out_bases,
        quals=np.zeros((len(seqs), width), np.int8),
        lengths=out_lens,
        counts=uniq_counts.astype(np.int32),
        names=StringColumn.from_list(
            [b"%d-%d" % (r + 1, c) for r, c in enumerate(uniq_counts)]
        ),
        names2=None,
        is_fastq=False,
    )
    writer = common.OutputWriter(ctx, args, role="merged")
    writer.write(codec.render(out, out_fastq=False))
    writer.close()

    if args.verbose:
        rep = common.report_stream(ctx, args)
        rep.write(
            "Input: %d sequences (representing %d reads)\n"
            % (n_in_seq, n_in_reads)
        )
        rep.write(
            "Output: %d sequences (representing %d reads)\n"
            % (len(seqs), int(uniq_counts.sum()))
        )
    return 0


def main():
    sys.exit(common.run_tool_main(tool_main))


if __name__ == "__main__":
    main()
