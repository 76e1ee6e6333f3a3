"""Shared glue for tool front-ends."""

from __future__ import annotations

from ...core import codec
from ...core.records import ReadBatch
from .. import common


def load_batch(ctx, args, *, filetype, allow_n=True, allow_u=False):
    data = common.read_input(ctx, args)
    return codec.parse(
        data,
        filetype=filetype,
        allow_n=allow_n,
        allow_u=allow_u,
        q_offset=args.q_offset,
        input_name=args.input_filename,
    )


def write_same_as_input(ctx, args, batch: ReadBatch):
    """OUTPUT_SAME_AS_INPUT rendering (fastx.c:296-306): FASTA in -> FASTA
    out; FASTQ in -> FASTQ out with each record keeping its own
    ASCII/numeric quality encoding."""
    writer = common.OutputWriter(ctx, args)
    writer.write(
        codec.render(
            batch,
            out_fastq=batch.is_fastq,
            ascii_qual=batch.qual_ascii if batch.is_fastq else True,
            q_offset=args.q_offset,
        )
    )
    writer.close()


def write_fasta(ctx, args, batch: ReadBatch):
    writer = common.OutputWriter(ctx, args)
    writer.write(codec.render(batch, out_fastq=False))
    writer.close()


def in_out_report(rep, n_in: int, n_out: int):
    rep.write("Input: %d reads.\n" % n_in)
    rep.write("Output: %d reads.\n" % n_out)
