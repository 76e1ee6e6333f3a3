"""Shared glue for tool front-ends."""

from __future__ import annotations

from ...core import codec
from ...core.records import ReadBatch
from .. import common


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


def line_fast_path(reader, args):
    """Raw-line fast-path gate for a per-read FASTQ tool: returns a
    callable ``attempt(chunk)`` -> FastqFrame or None (fall back to the
    full parser), or None when the environment can't support the fast
    path at all (no native library, or FASTX_TPU_NO_LINEPATH=1).

    A frame (codec.FastqFrame, or codec.FastaFrame for FASTA streams —
    only reachable for tools whose reader accepts FASTA) is returned only
    for clean chunks whose bytes pass the reference's validation —
    anything else (numeric qualities, multi-line FASTA, framing or byte
    errors) must go through ``reader.parse_chunk`` so the error text
    matches the reference byte for byte (fastx.c:314-404).

    Whether the fast path is used at all is the shared engine policy's
    call (engine.policy, kind 'per-read'); FASTX_TPU_NO_LINEPATH=1 or
    FASTX_LINEPATH=off force the classic parse -> device path."""
    import os as _os

    from ...core import codec as _codec
    from ...core import native as _native
    from ...engine import policy as _policy

    override = _os.environ.get("FASTX_LINEPATH")
    if _os.environ.get("FASTX_TPU_NO_LINEPATH"):
        override = "off"
    if override == "off":
        override = "device"
    elif override == "on":
        override = "host"
    try:
        if _policy.resolve("per-read", override) != "host":
            return None
    except RuntimeError:
        # FASTX_LINEPATH=on without the native library: degrade to the
        # classic path rather than failing the tool
        return None
    allowed = _codec.allowed_table_u8(reader.allow_n, reader.allow_u, False)

    def attempt(chunk):
        fr = (
            _codec.frame_fastq_fast(chunk)
            if reader.is_fastq
            else _codec.frame_fasta_fast(chunk)
        )
        if fr is None:
            return None
        if _native.validate_records(
            fr.buf, fr.seq_starts, fr.seq_lens,
            getattr(fr, "qual_starts", None), allowed, args.q_offset,
        ) != -1:
            return None
        return fr

    return attempt


def write_fasta_frame(writer, args, fr, new_lens, keep, *, seq_starts=None,
                      counts=None):
    """Render a FastaFrame's surviving records via the span renderer and
    return ``(in_reads, out_reads)`` — weighted by the collapsed
    multiplicities when ``counts`` is given (FASTA reports,
    fastx.c:475-495), else plain record counts."""
    import numpy as _np

    from ...core import native as _native

    ss = fr.seq_starts if seq_starts is None else seq_starts
    kb = _np.asarray(keep, bool) if keep is not None else None
    if counts is None:
        n_in = len(fr)
        n_out = int(kb.sum()) if kb is not None else len(fr)
    else:
        counts = _np.asarray(counts, _np.int64)
        n_in = int(counts.sum())
        n_out = int(counts[kb].sum()) if kb is not None else n_in
    writer.write(_native.render_lines(
        fr.buf, fr.name_starts, fr.name_lens, ss, ss, None, None,
        new_lens, None if kb is None else kb.astype(_np.uint8),
        out_fastq=False, q_offset=args.q_offset,
    ))
    return n_in, n_out


def prefetch_iter(it, depth: int = 2):
    """Run a generator on a background thread with a bounded queue so the
    producer (chunk framing / parsing) overlaps the consumer's native
    kernels.  Exceptions re-raise in the consumer; if the consumer
    abandons the loop early (break / exception), the producer is
    cancelled and joined instead of leaking a thread blocked on the
    bounded queue."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    err = []
    done = object()
    stop = threading.Event()

    def run():
        try:
            for x in it:
                while not stop.is_set():
                    try:
                        q.put(x, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # surfaced in the consuming thread
            err.append(e)
        finally:
            while True:  # deliver the sentinel unless the consumer left
                try:
                    q.put(done, timeout=0.1)
                    break
                except queue.Full:
                    if stop.is_set():
                        break

    t = threading.Thread(target=run, daemon=True)
    t.start()
    try:
        while True:
            x = q.get()
            if x is done:
                break
            yield x
    finally:
        stop.set()
        while True:  # unblock a producer waiting on a full queue
            try:
                q.get_nowait()
            except queue.Empty:
                break
        t.join(timeout=10)
    if err:
        raise err[0]


class BatchReader:
    """Chunked streaming reader: yields ReadBatch objects of complete
    records so tools run in constant memory on arbitrarily large inputs.

    Format is detected from the first block (fastx.c:86-116 semantics);
    per-chunk parses carry absolute line numbers so validation errors
    match the reference byte for byte regardless of chunking.

    Multi-host/sharded runs (parallel.multihost active): the input file
    is split by byte ranges — this reader owns
    ``[resync(k*size/N), resync((k+1)*size/N))``, resynced to record
    boundaries, so every record belongs to exactly one process and the
    shards concatenate in file order.  Requires a seekable input file;
    format is detected once from the file head so all shards agree.
    Validation-error line numbers are shard-local in this mode.
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
        from ...parallel import multihost as _mh

        self._shard = _mh.shard_info()
        self._shard_start = self._shard_end = None
        if self._shard.active:
            self._init_shard_range(_mh)

    def _init_shard_range(self, mh):
        import os as _os

        from ...core.errors import FastxError

        f = self._stream
        if (
            f is self.ctx.stdin
            or not (hasattr(f, "seekable") and f.seekable())
            or not hasattr(f, "fileno")
        ):
            raise FastxError(
                "sharded/multi-host input requires a seekable input file "
                "(-i FILE), not STDIN or a pipe"
            )
        size = _os.fstat(f.fileno()).st_size
        f.seek(0)
        head = f.read(min(size, 1 << 16))
        # format decided from the file head so every shard agrees; an
        # empty file raises the reference's premature-EOF error here
        self.is_fastq = self._codec.detect_format(
            head, self.args.input_filename, self.filetype
        )
        self._shard_start, self._shard_end = mh.shard_byte_range(
            f, size, self.is_fastq, self._shard
        )
        f.seek(self._shard_start)

    def iter_chunks(self):
        """Yield raw ``(chunk_bytes, line_number_base)`` pairs cut at
        whole-record boundaries (the framing half of __iter__, exposed so
        the fused host fast paths can consume line spans directly)."""
        import numpy as _np

        codec = self._codec
        carry = b""
        line_base = 0
        first = True
        remaining = None
        if self._shard.active:
            first = False  # format already detected from the file head
            remaining = self._shard_end - self._shard_start
            if remaining <= 0:
                return
        while True:
            want = (
                self.block_bytes
                if remaining is None
                else min(self.block_bytes, remaining)
            )
            block = self._stream.read(want) if want > 0 else b""
            if remaining is not None:
                remaining -= len(block)
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
                # EOF: everything that remains is the final chunk
                if data:
                    yield data, line_base
                return
            lpr = 4 if self.is_fastq else 2
            # cut at the last whole-record boundary: SIMD newline count,
            # then walk the few trailing partial lines backward with
            # rfind (no O(n) index materialization)
            count = int(_np.count_nonzero(_np.frombuffer(data, _np.uint8) == 0x0A))
            nrec = count // lpr
            if nrec == 0:
                carry = data
                continue
            pos = len(data)
            for _ in range(count - nrec * lpr):
                pos = data.rfind(b"\n", 0, pos)
            cut = data.rfind(b"\n", 0, pos) + 1
            chunk, carry = data[:cut], data[cut:]
            yield chunk, line_base
            line_base += nrec * lpr

    def parse_chunk(self, chunk: bytes, line_base: int):
        return self._codec.parse(
            chunk,
            filetype=self.filetype,
            allow_n=self.allow_n,
            allow_u=self.allow_u,
            q_offset=self.args.q_offset,
            input_name=self.args.input_filename,
            line_number_base=line_base,
            is_fastq=self.is_fastq,
        )

    def __iter__(self):
        for chunk, line_base in self.iter_chunks():
            yield self.parse_chunk(chunk, line_base)
