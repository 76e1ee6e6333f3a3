"""Host<->device batch plumbing + the fused preprocessing pipeline.

Keeps jit recompiles bounded by padding every batch to bucketed static
shapes: B to the next power of two (>=16), L to a multiple of 32.  Padding
rows have length 0 (all-PAD) and count 0 so masked transforms and
reductions ignore them by construction.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.records import ReadBatch
from ..ops import stats as stats_ops
from ..ops import transforms
from ..ops.clipper import clip_batch


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


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Parameters of the flagship fused preprocessing step (the
    BASELINE.json headline config: trim + quality filter/trim/mask +
    adapter clip + artifacts filter + stats reduction)."""

    adapter: bytes = b"CTGTAGGCACCATCAAT"
    trim_last: int = 0
    filter_q: int = 20
    filter_p: int = 50
    trim_q: int = 20
    trim_minlen: int = 0
    mask_q: int = 20
    clip_minlen: int = 5
    # include the per-cycle stats reduction in the fused step (the
    # reference's headline chain has no stats stage; scatter-adds are the
    # most expensive non-DP op, so bench parity keeps this off)
    with_stats: bool = False


def pipeline_body(bases, quals, lengths, counts, cfg: PipelineConfig,
                  psum_axis: Optional[str] = None):
    """One fused device step over a read batch: every per-read tool of the
    reference applied back-to-back with no host round-trips, plus the
    per-cycle count reduction (psum'd over ``psum_axis`` when running
    under shard_map)."""
    b, q, l, c = bases, quals, lengths, counts  # noqa: E741
    b, q, l, keep = transforms.trimmer(b, q, l, last=cfg.trim_last)  # noqa: E741
    keep &= transforms.quality_filter_keep(
        q, l, min_quality=cfg.filter_q, min_percent=cfg.filter_p
    )
    b, q, l, k2 = transforms.quality_trimmer(  # noqa: E741
        b, q, l, threshold=cfg.trim_q, min_len=cfg.trim_minlen
    )
    keep &= k2
    b, _, _ = transforms.masker(b, q, l, threshold=cfg.mask_q, mask_char=ord("N"))
    b, q, l, wrote, _cat = clip_batch(  # noqa: E741
        b, q, l, adapter=cfg.adapter, min_length=cfg.clip_minlen, keep_delta=0,
        discard_non_clipped=False, discard_clipped=False, keep_n=True,
        show_adapter_only=False, min_adapter_len=0,
    )
    keep &= wrote
    keep &= transforms.artifacts_keep(b, l)
    l = jnp.where(keep, l, 0)  # noqa: E741
    if cfg.with_stats:
        count = stats_ops.counts_only(b, l, c)
    else:
        count = jnp.zeros((b.shape[1], stats_ops.NSLOTS), jnp.int32)
    if psum_axis is not None:
        count = jax.lax.psum(count, psum_axis)
    return b, q, l, keep, count


def fused_pipeline(cfg: PipelineConfig):
    """Single-device jitted pipeline step."""

    def step(bases, quals, lengths, counts):
        return pipeline_body(bases, quals, lengths, counts, cfg)

    return jax.jit(step)


def decisions_pipeline(cfg: PipelineConfig):
    """Ship decisions, not data: same fused step but returning ONLY small
    per-read scalars (final length, keep mask, per-cycle counts).

    Rationale: every byte-level edit of this pipeline (the masker's
    N-substitutions) is recomputable on host in one vectorized pass from
    data the host already holds, while the expensive decisions (alignment
    cutoff, filters, trim lengths) need the device.  Returning 5 bytes per
    read instead of the 2 x L transformed tensors makes the device->host
    link (PCIe, or worse a tunnel) a non-factor.  The host renderer
    applies ``quals < mask_q`` masking itself (see render path in bench.py
    and the CLI masker).
    """

    def step(bases, quals, lengths, counts):
        _b, _q, l, keep, count = pipeline_body(bases, quals, lengths, counts, cfg)  # noqa: E741
        return l, keep, count

    return jax.jit(step)
