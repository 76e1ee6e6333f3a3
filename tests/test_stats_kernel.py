"""Pallas stats histogram kernel vs the XLA scatter-add accumulate."""

import numpy as np

from fastx_toolkit_tpu.kernels.stats_pallas import stats_hist_pallas
from fastx_toolkit_tpu.ops import stats as S


def test_hist_kernel_interpret_matches_accumulate():
    rng = np.random.default_rng(9)
    B, L = 512, 24
    bases = rng.choice(np.frombuffer(b"ACGTN", np.uint8), size=(B, L))
    quals = rng.integers(-5, 41, size=(B, L)).astype(np.int8)
    lengths = rng.integers(0, L + 1, B).astype(np.int32)
    counts = np.ones(B, np.int32)

    want = S.accumulate(bases, quals, lengths, counts, is_fastq=True)
    pernuc = np.asarray(
        stats_hist_pallas(bases, quals, lengths, tile_b=128, interpret=True)
    )
    got = S.derive_from_hist(pernuc)
    names = ("count", "hist", "qsum", "qmin", "qmax")
    for name, w, g in zip(names, want, got):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g), err_msg=name)


def test_counts_only_matches_accumulate():
    import jax.numpy as jnp

    rng = np.random.default_rng(10)
    B, L = 64, 40
    bases = rng.choice(np.frombuffer(b"ACGTN", np.uint8), size=(B, L))
    quals = rng.integers(0, 41, size=(B, L)).astype(np.int8)
    lengths = rng.integers(0, L + 1, B).astype(np.int32)
    counts = rng.integers(1, 7, B).astype(np.int32)
    want = S.accumulate(bases, quals, lengths, counts, is_fastq=True)[0]
    got = S.counts_only(jnp.asarray(bases), jnp.asarray(lengths), jnp.asarray(counts))
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_hist_kernel_b2_matches_ascii():
    """The packed-codes entry (stats_hist_pallas_b2) must tally exactly
    like the ASCII entry on pure-ACGT batches."""
    import numpy as np

    from fastx_toolkit_tpu.engine.pipeline import PipelineConfig, pack_batch2
    from fastx_toolkit_tpu.kernels.stats_pallas import (
        stats_hist_pallas,
        stats_hist_pallas_b2,
    )

    rng = np.random.default_rng(13)
    B, L = 256, 21
    bases = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=(B, L))
    quals = rng.integers(-5, 41, size=(B, L)).astype(np.int8)
    lengths = rng.integers(0, L + 1, B).astype(np.int32)
    cfg0 = PipelineConfig(with_filter=False, with_qtrim=False, with_mask=False)
    b2, _ = pack_batch2(bases, quals, cfg0, n_plane=False)
    want = np.asarray(
        stats_hist_pallas(bases, quals, lengths, tile_b=128, interpret=True)
    )
    got = np.asarray(
        stats_hist_pallas_b2(b2, quals, lengths, tile_b=128, interpret=True)
    )
    np.testing.assert_array_equal(want, got)


def test_hist_kernel_long_reads_multi_posblock():
    """L > 128 exercises the 128-position block path (grid dim over L,
    sentinel-padded tail positions tallying into the sliced-off bin)."""
    rng = np.random.default_rng(14)
    B, L = 128, 200
    bases = rng.choice(np.frombuffer(b"ACGTN", np.uint8), size=(B, L))
    quals = rng.integers(-10, 60, size=(B, L)).astype(np.int8)
    lengths = rng.integers(0, L + 1, B).astype(np.int32)
    counts = np.ones(B, np.int32)
    want = S.accumulate(bases, quals, lengths, counts, is_fastq=True)
    pernuc = np.asarray(
        stats_hist_pallas(bases, quals, lengths, tile_b=64, interpret=True)
    )
    got = S.derive_from_hist(pernuc)
    for name, w, g in zip(("count", "hist", "qsum", "qmin", "qmax"), want, got):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g), err_msg=name)


def test_hist_kernel_long_reads_multi_posblock_compiled():
    """The L > 128 geometry through the REAL Mosaic lowering (advisor
    item: the interpret tests never compile the pos_blk=128 unrolled
    kernel).  Under FASTX_TPU_TEST_REAL this compiles on the chip at the
    production tile (512); the CPU suite necessarily falls back to
    interpret mode (Pallas has no non-interpret CPU lowering), so the
    compiled coverage comes from the real-chip suite run logged in
    HARDWARE_VERIFICATION.md."""
    import os

    import jax

    interpret = jax.devices()[0].platform not in ("tpu", "axon")
    if interpret and os.environ.get("FASTX_TPU_TEST_REAL"):
        raise AssertionError("FASTX_TPU_TEST_REAL set but no TPU device")
    rng = np.random.default_rng(15)
    B, L = 512, 200
    bases = rng.choice(np.frombuffer(b"ACGTN", np.uint8), size=(B, L))
    quals = rng.integers(-10, 60, size=(B, L)).astype(np.int8)
    lengths = rng.integers(0, L + 1, B).astype(np.int32)
    counts = np.ones(B, np.int32)
    want = S.accumulate(bases, quals, lengths, counts, is_fastq=True)
    pernuc = np.asarray(
        stats_hist_pallas(bases, quals, lengths, tile_b=512,
                          interpret=interpret)
    )
    got = S.derive_from_hist(pernuc)
    for name, w, g in zip(("count", "hist", "qsum", "qmin", "qmax"), want, got):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g), err_msg=name)
