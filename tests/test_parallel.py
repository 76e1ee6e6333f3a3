"""Multi-device tests on the virtual 8-device CPU mesh: sharded pipeline
and collective stats merges must match single-device results exactly."""

import jax
import numpy as np
import pytest

from fastx_toolkit_tpu.core import codec
from fastx_toolkit_tpu.engine.pipeline import to_device
from fastx_toolkit_tpu.ops import stats as stats_ops
from fastx_toolkit_tpu.parallel import data_mesh, shard_batch, sharded_pipeline, sharded_stats

from util import fixture


def _batch(n_copies=8):
    data = fixture("fastq_stats1.fastq") * n_copies
    b = codec.parse(data, filetype=codec.FASTQ_ONLY, q_offset=64)
    (bases, quals, lengths, counts), nb = to_device(b, pad=False)
    # pad rows to a multiple of 8 for even sharding
    B = bases.shape[0]
    Bp = -(-B // 8) * 8
    pad = Bp - B
    bases = np.pad(bases, ((0, pad), (0, 0)))
    quals = np.pad(quals, ((0, pad), (0, 0)))
    lengths = np.pad(lengths, (0, pad))
    counts = np.pad(counts, (0, pad))
    return bases, quals, lengths, counts


def test_devices():
    assert len(jax.devices()) >= 8


def test_sharded_stats_match_single():
    bases, quals, lengths, counts = _batch()
    mesh = data_mesh(8)
    sb = shard_batch(mesh, bases, quals, lengths, counts)
    merged = sharded_stats(mesh, *sb, is_fastq=True)
    single = stats_ops.accumulate(bases, quals, lengths, counts, is_fastq=True)
    for m, s in zip(merged, single):
        np.testing.assert_array_equal(np.asarray(m), np.asarray(s))


def test_sharded_pipeline_runs_and_matches():
    bases, quals, lengths, counts = _batch()
    mesh = data_mesh(8)
    fn = sharded_pipeline(
        mesh, adapter=b"CCTTAAGG", trim_last=30, filter_q=10, filter_p=50,
        trim_q=5, trim_minlen=10, mask_q=3, clip_minlen=5,
    )
    sb = shard_batch(mesh, bases, quals, lengths, counts)
    b, q, l, keep, stat = fn(*sb)
    assert np.asarray(keep).shape == (bases.shape[0],)

    mesh1 = data_mesh(1)
    fn1 = sharded_pipeline(
        mesh1, adapter=b"CCTTAAGG", trim_last=30, filter_q=10, filter_p=50,
        trim_q=5, trim_minlen=10, mask_q=3, clip_minlen=5,
    )
    sb1 = shard_batch(mesh1, bases, quals, lengths, counts)
    b1, q1, l1, keep1, stat1 = fn1(*sb1)
    np.testing.assert_array_equal(np.asarray(keep), np.asarray(keep1))
    np.testing.assert_array_equal(np.asarray(b), np.asarray(b1))
    np.testing.assert_array_equal(np.asarray(stat), np.asarray(stat1))
