"""Streaming engine spill/boundary machinery (engine/lines.py).

VERDICT r3 item #5: the multi-dispatch spill, partial-segment flushes,
the N-free -> N-bearing layout flush, classic/fast interleaving, and
drainer error propagation previously only executed on 1M-read bench
lanes.  These tests force all of them deterministically with tiny
dispatch chunks and tiny reader blocks, byte-comparing against a
one-flush run of the same stream."""

import io
from types import SimpleNamespace

import numpy as np
import pytest

from fastx_toolkit_tpu.core import codec, native
from fastx_toolkit_tpu.engine.lines import LineEngines, stream_pipeline_lines
from fastx_toolkit_tpu.engine.pipeline import PipelineConfig

pytestmark = pytest.mark.skipif(
    native.LIB is None, reason="native codec unavailable"
)

CFG = PipelineConfig(adapter=b"CCTTAAGGACCA", clip_minlen=5)


def _lane(n, seed=11, with_n_after=None, numeric_at=(), lens=(5, 60)):
    rng = np.random.default_rng(seed)
    recs = []
    for i in range(n):
        ln = int(rng.integers(*lens))
        alpha = b"ACGT"
        if with_n_after is not None and i >= with_n_after:
            alpha = b"ACGTN"
        seq = rng.choice(np.frombuffer(alpha, np.uint8), size=ln)
        if i in numeric_at:
            q = rng.integers(2, 41, ln)
            qline = b" ".join(b"%d" % v for v in q)
        else:
            qline = (rng.integers(0, 41, ln) + 33).astype(np.uint8).tobytes()
        recs.append(b"@r%d\n%s\n+\n%s\n" % (i, seq.tobytes(), qline))
    return b"".join(recs)


def _run(data, *, chunk_rows, block_bytes=1 << 20, engines=None, cfg=CFG):
    args = SimpleNamespace(input_filename="<test>", q_offset=33)
    from fastx_toolkit_tpu.cli.tools._shared import BatchReader

    reader = BatchReader(None, args, filetype=codec.FASTQ_ONLY,
                         block_bytes=block_bytes, stream=io.BytesIO(data))
    out = []
    n_in, n_out, nbytes = stream_pipeline_lines(
        reader, cfg, out_fastq=True, q_offset=33, write=out.append,
        chunk_rows=chunk_rows, engines=engines or LineEngines(cfg),
    )
    return n_in, n_out, b"".join(out)


def test_spill_and_partial_flush_boundaries():
    """chunk_rows far below the block record count forces multi-dispatch
    spills (one decisions future spans several render blocks and the
    remainder spills); tiny blocks force segment splits mid-chunk."""
    data = _lane(700, seed=5)
    ref_in, ref_out, ref_bytes = _run(data, chunk_rows=4096)
    for chunk_rows, block_bytes in ((64, 4096), (37, 2048), (128, 1 << 20)):
        n_in, n_out, got = _run(data, chunk_rows=chunk_rows,
                                block_bytes=block_bytes)
        assert n_in == ref_in == 700
        assert n_out == ref_out
        assert got == ref_bytes, (chunk_rows, block_bytes)


def test_nfree_to_nbearing_layout_flush():
    """An N-bearing chunk arriving while N-free spans are pending forces
    the pending flush (lines.py layout transition) — outputs must still
    be byte-identical and in order."""
    data = _lane(600, seed=6, with_n_after=300)
    ref = _run(data, chunk_rows=4096)
    got = _run(data, chunk_rows=50, block_bytes=4096)
    assert got == ref


def test_classic_chunks_interleave_with_fast_spans():
    """Numeric-quality records force their blocks onto the classic
    parser mid-stream, interleaved with fast spans, under spill-sized
    chunks."""
    data = _lane(500, seed=7, numeric_at={120, 121, 300})
    ref = _run(data, chunk_rows=4096)
    got = _run(data, chunk_rows=48, block_bytes=4096)
    assert got == ref
    # numeric-quality records keep their representation
    assert b" " in ref[2].split(b"@r120\n", 1)[1].split(b"\n")[2]


def test_single_record_chunks():
    """chunk_rows=1: every record is its own dispatch; maximal flush and
    spill churn."""
    data = _lane(40, seed=8)
    ref = _run(data, chunk_rows=4096)
    got = _run(data, chunk_rows=1)
    assert got == ref


def test_drainer_error_propagates_without_deadlock():
    """A device failure mid-stream must re-raise in the caller (not hang
    the bounded queues) — engine/lines.py drain()'s failure path."""
    data = _lane(300, seed=9)

    class BoomEngines(LineEngines):
        def __init__(self, cfg):
            super().__init__(cfg)
            self.calls = 0

        def fn2(self, has_n):
            inner = super().fn2(has_n)

            def wrapped(*a):
                self.calls += 1
                if self.calls >= 3:
                    raise RuntimeError("device exploded")
                return inner(*a)

            return wrapped

    with pytest.raises(RuntimeError, match="device exploded"):
        _run(data, chunk_rows=32, engines=BoomEngines(CFG))


def test_env_knob_change_invalidates_memoized_programs(monkeypatch):
    """Trace-time env knobs (kernel selection/tuning) are baked into the
    jitted programs LineEngines memoizes; toggling one mid-process must
    rebuild them (round-5 review finding: a cached executable silently
    ignored FASTX_TPU_NO_P12 set after the first call)."""
    monkeypatch.delenv("FASTX_TPU_NO_PACKED_DECIDE", raising=False)
    eng = LineEngines(CFG)
    a = eng.fn2(has_n=False)
    assert eng.fn2(has_n=False) is a  # memo stable while env is stable
    monkeypatch.setenv("FASTX_TPU_NO_PACKED_DECIDE", "1")
    b = eng.fn2(has_n=False)
    assert b is not a  # knob change -> fresh trace
    monkeypatch.delenv("FASTX_TPU_NO_PACKED_DECIDE")
    c = eng.fn2(has_n=False)
    assert c is not b
    # the tie default is re-derived too
    assert eng.tie == (bool(CFG.with_clip))


def test_packed_tile_override_validated(monkeypatch):
    """FASTX_TPU_PACKED_TILE must not resurrect broken configurations:
    0 (div-by-zero downstream), non-multiples of 1024 (Mosaic rejects
    only on the real chip), or tiles past the VMEM budget."""
    from fastx_toolkit_tpu.kernels.align_pallas import packed_tile_for

    for bad in ("0", "512", "1000", "4096"):  # 4096 * H_pad 72 > 72K
        monkeypatch.setenv("FASTX_TPU_PACKED_TILE", bad)
        with pytest.raises(ValueError, match="FASTX_TPU_PACKED_TILE"):
            packed_tile_for(72)
    monkeypatch.setenv("FASTX_TPU_PACKED_TILE", "2048")
    assert packed_tile_for(8) == 2048  # valid override honored
    monkeypatch.delenv("FASTX_TPU_PACKED_TILE")
    assert packed_tile_for(8) == 1024  # per-variant default restored


def test_p12_unroll_override_validated(monkeypatch):
    """FASTX_TPU_P12_UNROLL outside 1/2/4/8/16/32 would index the packed
    operand rows out of bounds on-chip; reject it at dispatch."""
    from fastx_toolkit_tpu.kernels.align_pallas import (
        align_batch_pallas_packed,
        packed12_ok,
    )
    import jax.numpy as jnp

    adapter = b"CCTTAAGG"
    L = 64
    assert packed12_ok(L, len(adapter))
    b2w = jnp.zeros((4, 8), jnp.int32)
    lengths = jnp.full(8, L, jnp.int32)
    monkeypatch.setenv("FASTX_TPU_P12_UNROLL", "256")
    with pytest.raises(ValueError, match="FASTX_TPU_P12_UNROLL"):
        align_batch_pallas_packed(b2w, None, lengths, adapter, L=L,
                                  tile_b=8, interpret=True)
