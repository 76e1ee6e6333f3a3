"""Benchmark harness: reads/sec on the trim+filter+clip pipeline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "reads/sec", "vs_baseline": N}

The workload is BASELINE.json's headline config: the full fused
preprocessing chain (fastx_trimmer -> fastq_quality_filter ->
fastq_quality_trimmer -> fastq_masker -> fastx_clipper ->
fastx_artifacts_filter + per-cycle stats), end to end: FASTQ bytes are
parsed on the host, the fused step runs on device, surviving records are
rendered back to FASTQ bytes.

vs_baseline compares against the reference C tools compiled -O3 and run
as a 6-process shell pipeline on this machine (measured 2026-08-17, see
BASELINE.md "Local reference measurement"): 1,000,000 reads x 100bp in
17.83 s = 56,085 reads/sec.
"""

import json
import os
import sys
import time

import numpy as np

C_BASELINE_READS_PER_SEC = 56085.0

N_READS = int(os.environ.get("FASTX_BENCH_READS", 1_000_000))
READ_LEN = int(os.environ.get("FASTX_BENCH_LEN", 100))
CHUNK = int(os.environ.get("FASTX_BENCH_CHUNK", 262144))
ADAPTER = b"CTGTAGGCACCATCAAT"


def synth_lane_bytes(n, read_len, seed=42) -> bytes:
    """Same generator as the C-baseline lane (seeded, adapter spiked)."""
    rng = np.random.default_rng(seed)
    bases = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=(n, read_len))
    has_ad = rng.random(n) < 0.3
    pos = rng.integers(30, read_len - 5, n)
    for j, ch in enumerate(ADAPTER):
        m = has_ad & (pos + j < read_len)
        bases[m, (pos + j)[m]] = ch
    cols = np.arange(read_len)
    quals = np.clip(rng.normal(36, 4, (n, read_len)) - (cols[None, :] / read_len) * 12, 2, 40)
    qual_ascii = (quals + 33).astype(np.uint8)

    # vectorized FASTQ assembly
    from fastx_toolkit_tpu.core.records import ReadBatch, StringColumn
    from fastx_toolkit_tpu.core import codec

    names = StringColumn.from_list([b"r%d" % i for i in range(n)])
    batch = ReadBatch(
        bases=bases.astype(np.uint8),
        quals=(qual_ascii.astype(np.int16) - 33).astype(np.int8),
        lengths=np.full(n, read_len, np.int32),
        counts=np.ones(n, np.int32),
        names=names,
        names2=StringColumn.from_list([b""] * n),
        is_fastq=True,
        qual_ascii=np.ones(n, bool),
    )
    return codec.render(batch, out_fastq=True, ascii_qual=True, q_offset=33)


def run_once(data: bytes, fn, cfg) -> tuple[int, bytes]:
    """Parse -> device pipeline (chunked, decisions only) -> host render.

    The device returns only (final_length, keep, stats) per read; the
    masker's byte edits are re-applied on host in one vectorized pass
    (see decisions_pipeline docstring)."""
    from fastx_toolkit_tpu.core import codec

    prof = os.environ.get("FASTX_BENCH_PROFILE")
    t0 = time.perf_counter()
    batch = codec.parse(data, filetype=codec.FASTQ_ONLY, q_offset=33)
    if prof:
        print("  parse %.3fs" % (time.perf_counter() - t0), file=sys.stderr)
        t0 = time.perf_counter()
    n = len(batch)
    new_len = np.empty(n, np.int32)
    keep = np.empty(n, bool)
    # dispatch every chunk before fetching any result: jax dispatch is
    # async, so device compute overlaps the host-side chunk prep
    pending = []
    for s in range(0, n, CHUNK):
        e = min(s + CHUNK, n)
        bases = np.asarray(batch.bases[s:e])
        quals = np.asarray(batch.quals[s:e])
        lengths = np.asarray(batch.lengths[s:e])
        counts = np.asarray(batch.counts[s:e])
        if bases.shape[0] < CHUNK:
            pad = CHUNK - bases.shape[0]
            bases = np.pad(bases, ((0, pad), (0, 0)))
            quals = np.pad(quals, ((0, pad), (0, 0)))
            lengths = np.pad(lengths, (0, pad))
            counts = np.pad(counts, (0, pad))
        pending.append((s, e, fn(bases, quals, lengths, counts)))
    if prof:
        t1 = time.perf_counter()
        print("  dispatch %.3fs" % (t1 - t0), file=sys.stderr)
    for s, e, (l, k, _count) in pending:
        nb = e - s
        new_len[s:e] = np.asarray(l)[:nb]
        keep[s:e] = np.asarray(k)[:nb]
    if prof:
        t2 = time.perf_counter()
        print("  collect %.3fs" % (t2 - t1), file=sys.stderr)

    # the masker's byte edits and the keep-filter are fused into the
    # native render loop (zero extra passes)
    batch.lengths = new_len
    if prof:
        t3 = time.perf_counter()
    payload = codec.render(
        batch, out_fastq=True, ascii_qual=True, q_offset=33,
        keep=keep, mask_thr=cfg.mask_q,
    )
    if prof:
        print("  render %.3fs" % (time.perf_counter() - t3), file=sys.stderr)
    return n, payload


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    from fastx_toolkit_tpu.engine.pipeline import PipelineConfig, decisions_pipeline

    dev = jax.devices()[0]
    print("bench device: %s" % dev, file=sys.stderr)

    data = synth_lane_bytes(N_READS, READ_LEN)
    print("lane: %d reads, %d bytes" % (N_READS, len(data)), file=sys.stderr)

    cfg = PipelineConfig(adapter=ADAPTER)
    fn = decisions_pipeline(cfg)

    # warmup (compile) on a small lane; padding makes the device shape
    # identical to the timed runs so the executable is reused
    t0 = time.perf_counter()
    run_once(synth_lane_bytes(2048, READ_LEN, seed=7), fn, cfg)
    print("warmup %.1fs" % (time.perf_counter() - t0), file=sys.stderr)

    times = []
    for it in range(3):
        t0 = time.perf_counter()
        n, payload = run_once(data, fn, cfg)
        dt = time.perf_counter() - t0
        times.append(dt)
        print(
            "iter %d: %.3fs  (%.0f reads/s, %d bytes out)"
            % (it, dt, n / dt, len(payload)),
            file=sys.stderr,
        )
    best = min(times)
    rps = N_READS / best
    print(
        json.dumps(
            {
                "metric": "reads_per_sec_trim_filter_clip_pipeline",
                "value": round(rps, 1),
                "unit": "reads/sec",
                "vs_baseline": round(rps / C_BASELINE_READS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
