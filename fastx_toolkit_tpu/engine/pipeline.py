"""Host<->device batch plumbing.

Keeps jit recompiles bounded by padding every batch to bucketed static
shapes: B to the next power of two (>=16), L to a multiple of 32.  Padding
rows have length 0 (all-PAD) and count 0 so masked transforms and
reductions ignore them by construction.
"""

from __future__ import annotations

import numpy as np

from ..core.records import ReadBatch


def bucket_shape(b: int, l: int) -> tuple[int, int]:  # noqa: E741
    bb = 16
    while bb < b:
        bb *= 2
    ll = max(32, -(-l // 32) * 32)
    return bb, ll


def to_device(batch: ReadBatch, *, pad: bool = True):
    """ReadBatch -> (bases, quals, lengths, counts) padded numpy arrays
    ready for jnp; returns (arrays, real_B)."""
    b, l = batch.bases.shape  # noqa: E741
    if pad:
        bb, ll = bucket_shape(max(b, 1), max(l, 1))
    else:
        bb, ll = b, l
    bases = np.zeros((bb, ll), dtype=np.uint8)
    quals = np.zeros((bb, ll), dtype=np.int8)
    bases[:b, :l] = batch.bases
    quals[:b, :l] = batch.quals
    lengths = np.zeros(bb, dtype=np.int32)
    lengths[:b] = batch.lengths
    counts = np.zeros(bb, dtype=np.int32)
    counts[:b] = batch.counts
    return (bases, quals, lengths, counts), b
