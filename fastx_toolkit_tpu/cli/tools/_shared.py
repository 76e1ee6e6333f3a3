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


def render_same_as_input(args, batch: ReadBatch) -> bytes:
    """OUTPUT_SAME_AS_INPUT rendering to bytes (streaming-friendly)."""
    return codec.render(
        batch,
        out_fastq=batch.is_fastq,
        ascii_qual=batch.qual_ascii if batch.is_fastq else True,
        q_offset=args.q_offset,
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


class BatchReader:
    """Chunked streaming reader: yields ReadBatch objects of complete
    records so tools run in constant memory on arbitrarily large inputs.

    Format is detected from the first block (fastx.c:86-116 semantics);
    per-chunk parses carry absolute line numbers so validation errors
    match the reference byte for byte regardless of chunking.
    """

    def __init__(self, ctx, args, *, filetype, allow_n=True, allow_u=False,
                 block_bytes=None, stream=None):
        import os as _os

        from ...core import codec as _codec

        self._codec = _codec
        self.ctx = ctx
        self.args = args
        self.filetype = filetype
        self.allow_n = allow_n
        self.allow_u = allow_u
        self.block_bytes = block_bytes or int(
            _os.environ.get("FASTX_TPU_BLOCK_BYTES", 64 * 1024 * 1024)
        )
        if stream is not None:
            self._stream = stream
        elif args.input_filename == "-" or args.input_filename.startswith("-"):
            self._stream = ctx.stdin
        else:
            try:
                self._stream = open(args.input_filename, "rb")
            except OSError as e:
                print(
                    "%s: failed to open input file '%s': %s"
                    % (ctx.prog, args.input_filename, e.strerror),
                    file=ctx.stderr,
                )
                from ..common import ExitWithStatus

                raise ExitWithStatus(1)
        self.is_fastq = None

    def __iter__(self):
        import numpy as _np

        codec = self._codec
        carry = b""
        line_base = 0
        first = True
        while True:
            block = self._stream.read(self.block_bytes)
            data = carry + block if carry else block
            if first:
                if not data:
                    # empty input: reproduce the premature-EOF error
                    codec.detect_format(b"", self.args.input_filename, self.filetype)
                self.is_fastq = codec.detect_format(
                    data, self.args.input_filename, self.filetype
                )
                first = False
            if not block:
                # EOF: parse everything that remains
                if data:
                    yield codec.parse(
                        data,
                        filetype=self.filetype,
                        allow_n=self.allow_n,
                        allow_u=self.allow_u,
                        q_offset=self.args.q_offset,
                        input_name=self.args.input_filename,
                        line_number_base=line_base,
                        is_fastq=self.is_fastq,
                    )
                return
            lpr = 4 if self.is_fastq else 2
            # cut at the last whole-record boundary
            buf = _np.frombuffer(data, _np.uint8)
            nl = _np.flatnonzero(buf == 0x0A)
            nrec = len(nl) // lpr
            if nrec == 0:
                carry = data
                continue
            cut = int(nl[nrec * lpr - 1]) + 1
            chunk, carry = data[:cut], data[cut:]
            yield codec.parse(
                chunk,
                filetype=self.filetype,
                allow_n=self.allow_n,
                allow_u=self.allow_u,
                q_offset=self.args.q_offset,
                input_name=self.args.input_filename,
                line_number_base=line_base,
                is_fastq=self.is_fastq,
            )
            line_base += nrec * lpr
