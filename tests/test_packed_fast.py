"""Fully-packed decisions body vs the unpack body: decision parity.

packed_fast_body (engine/pipeline.py) computes the fused chain without
materializing any unpacked [B, L] representation — popcount filters,
bit-trick quality trim, the packed-operand DP kernel and the packed
counts kernel.  Every (l, keep) it returns must equal the original
packed_pipeline_body bit for bit, on N-free and N-bearing chunks, for
every BASELINE config shape."""

import dataclasses

import numpy as np
import pytest

from fastx_toolkit_tpu.engine.pipeline import (
    PipelineConfig,
    pack_batch2,
    packed_decisions_pipeline,
)

ADAPTER = b"CTGTAGGCACCATCAAT"


def _chunk(rng, B, L, with_n: bool, adapter=ADAPTER):
    p = [0.24, 0.24, 0.24, 0.24, 0.04] if with_n else [0.25, 0.25, 0.25, 0.25]
    alpha = np.frombuffer(b"ACGTN" if with_n else b"ACGT", np.uint8)
    bases = rng.choice(alpha, size=(B, L), p=p)
    pos = rng.integers(0, max(1, L - 5), B)
    for j, ch in enumerate(adapter):
        m = (rng.random(B) < 0.35) & (pos + j < L)
        bases[m, (pos + j)[m]] = ch
    quals = rng.integers(2, 41, size=(B, L)).astype(np.int8)
    lengths = rng.integers(0, L + 1, B).astype(np.int16)
    # zero out beyond-length (what the packer guarantees for planes)
    cols = np.arange(L)[None, :]
    quals[cols >= lengths[:, None].astype(np.int32)] = 0
    bases[cols >= lengths[:, None].astype(np.int32)] = ord("A")
    return bases, quals, lengths


CONFIGS = {
    "headline": PipelineConfig(adapter=ADAPTER),
    "config1": PipelineConfig(
        adapter=ADAPTER, trim_last=80, with_filter=False, with_qtrim=False,
        with_mask=False, with_clip=False, with_artifacts=False,
        to_fasta_discard_n=True,
    ),
    "config2": PipelineConfig(adapter=ADAPTER, with_clip=False,
                              with_artifacts=False),
    "config4": PipelineConfig(
        adapter=ADAPTER, with_filter=False, with_qtrim=False,
        with_mask=False, clip_keep_n=False, clip_minlen=15,
    ),
    "artifacts_only": PipelineConfig(
        adapter=ADAPTER, with_filter=False, with_qtrim=False,
        with_mask=False, with_clip=False,
    ),
}


@pytest.mark.parametrize("cfg_name", sorted(CONFIGS))
@pytest.mark.parametrize("with_n", [False, True])
def test_fast_body_matches_unpack_body(cfg_name, with_n, monkeypatch):
    cfg = CONFIGS[cfg_name]
    rng = np.random.default_rng(hash((cfg_name, with_n)) % (2**32))
    B, L = 256, 72
    bases, quals, lengths = _chunk(rng, B, L, with_n)
    b2, planes = pack_batch2(bases, quals, cfg, n_plane=with_n)

    monkeypatch.setenv("FASTX_TPU_PACKED_DECIDE", "force")
    monkeypatch.delenv("FASTX_TPU_NO_PACKED_DECIDE", raising=False)
    fast = packed_decisions_pipeline(cfg, two_bit=True, has_n_plane=with_n)
    lf, kf, _ = fast(b2, planes, lengths)

    monkeypatch.setenv("FASTX_TPU_NO_PACKED_DECIDE", "1")
    slow_fn = packed_decisions_pipeline(
        dataclasses.replace(cfg), two_bit=True, has_n_plane=with_n
    )
    ls, ks, _ = slow_fn(b2, planes, lengths)

    np.testing.assert_array_equal(np.asarray(kf), np.asarray(ks))
    np.testing.assert_array_equal(np.asarray(lf), np.asarray(ls))


def test_fast_body_respects_trim_boundaries(monkeypatch):
    """Odd lengths around byte boundaries (8/16) through the bit-trick
    quality trimmer."""
    cfg = CONFIGS["config2"]
    rng = np.random.default_rng(7)
    B, L = 256, 24
    bases, quals, lengths = _chunk(rng, B, L, False)
    lengths[:] = np.tile([0, 1, 7, 8, 9, 15, 16, 17, 23, 24, 3, 20, 24, 24, 24, 24],
                         B // 16).astype(np.int16)
    cols = np.arange(L)[None, :]
    quals[cols >= lengths[:, None].astype(np.int32)] = 0
    b2, planes = pack_batch2(bases, quals, cfg, n_plane=False)

    monkeypatch.setenv("FASTX_TPU_PACKED_DECIDE", "force")
    fast = packed_decisions_pipeline(cfg, two_bit=True, has_n_plane=False)
    lf, kf, _ = fast(b2, planes, lengths)
    monkeypatch.setenv("FASTX_TPU_NO_PACKED_DECIDE", "1")
    slow_fn = packed_decisions_pipeline(
        dataclasses.replace(cfg), two_bit=True, has_n_plane=False
    )
    ls, ks, _ = slow_fn(b2, planes, lengths)
    np.testing.assert_array_equal(np.asarray(kf), np.asarray(ks))
    np.testing.assert_array_equal(np.asarray(lf), np.asarray(ls))
