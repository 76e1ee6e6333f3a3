"""fastx_clipper decision logic, vectorized.

adapter_cutoff_index heuristics (/root/reference/src/fastx_clipper/
fastx_clipper.cpp:159-241) + the clip/discard cascade (:282-319).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..kernels.align import align_batch
from ..kernels.align_pallas import align_batch_pallas
from . import transforms


def _align_dispatch(bases, quals_unused, lengths, adapter: bytes):
    """Pick the Pallas kernel on TPU-class backends (3x the XLA scan
    version); fall back to the jnp engine on CPU or for batches too small
    to tile (results are bit-identical either way)."""
    B = bases.shape[0]
    platform = jax.devices()[0].platform
    use_pallas = (
        platform in ("tpu", "axon")
        and not os.environ.get("FASTX_TPU_NO_PALLAS")
        and B % 1024 == 0
    )
    if use_pallas:
        tile = 2048 if B % 2048 == 0 else 1024
        return align_batch_pallas(bases, lengths, adapter, tile_b=tile)
    return align_batch(bases, lengths, adapter)


def adapter_cutoff_index(res, lengths, *, min_adapter_len: int):
    """Vectorized adapter_cutoff_index: -1 = no acceptable alignment,
    else the query index to cut at (== query_start of the alignment)."""
    size = res["neutral"] + res["matches"] + res["mismatches"] + res["gaps"]
    m = res["matches"]
    pct = jnp.where(size > 0, (m * 100) // jnp.maximum(size, 1), 0)
    qsize = lengths
    ok = size != 0
    if min_adapter_len > 0:
        ok &= size >= min_adapter_len
    r1 = (res["query_end"] == qsize - 1) & (res["mismatches"] == 0)
    r2 = (size > 5) & (res["target_start"] == 0) & (pct >= 75)
    r3 = (size > 11) & (pct >= 80)
    r4 = (res["query_end"] >= qsize - 2) & (size <= 5) & (m >= 3)
    accept = ok & (r1 | r2 | r3 | r4)
    return jnp.where(accept, res["query_start"], -1)


def clip_batch(bases, quals, lengths, *, adapter: bytes, min_length: int,
               keep_delta: int, discard_non_clipped: bool,
               discard_clipped: bool, keep_n: bool,
               show_adapter_only: bool, min_adapter_len: int):
    """Full clipper pipeline on device.

    Returns (bases, quals, new_lengths, write_mask, category) where
    category codes the discard class for the verbose report:
    0=written, 1=adapter-at-zero, 2=too-short, 3=non-clipped(-c),
    4=clipped(-C), 5=contains-N.  With -k, adapter-at-zero reads are
    written instead of the normal survivors (fastx_clipper.cpp:288-319).
    """
    res = _align_dispatch(bases, quals, lengths, adapter)
    i = adapter_cutoff_index(res, lengths, min_adapter_len=min_adapter_len)

    # keep_delta already includes len(adapter) when > 0 (parse_commandline,
    # fastx_clipper.cpp:153-155)
    cut = jnp.where(i > 0, i + keep_delta, i)
    new_len = jnp.where(cut > 0, jnp.minimum(lengths, cut), lengths).astype(jnp.int32)

    has_n = transforms.contains_n(bases, new_len)

    cat = jnp.zeros(bases.shape[0], jnp.int32)
    # cascade order matters; first matching class wins
    c_zero = i == 0
    c_short = ~c_zero & (new_len < min_length)
    c_nonclip = ~c_zero & ~c_short & (i == -1) & discard_non_clipped
    c_clip = ~c_zero & ~c_short & ~c_nonclip & (i > 0) & discard_clipped
    c_n = ~c_zero & ~c_short & ~c_nonclip & ~c_clip & has_n & (not keep_n)
    cat = jnp.where(c_zero, 1, cat)
    cat = jnp.where(c_short, 2, cat)
    cat = jnp.where(c_nonclip, 3, cat)
    cat = jnp.where(c_clip, 4, cat)
    cat = jnp.where(c_n, 5, cat)

    if show_adapter_only:
        write = c_zero
    else:
        write = cat == 0

    bases, quals = transforms._zero_pad(bases, quals, new_len)
    return bases, quals, new_len, write, cat


clip_batch_jit = jax.jit(
    clip_batch,
    static_argnames=(
        "adapter", "min_length", "keep_delta", "discard_non_clipped",
        "discard_clipped", "keep_n", "show_adapter_only", "min_adapter_len",
    ),
)
