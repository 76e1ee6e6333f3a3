"""One link-aware engine-dispatch policy for every dual-engine surface.

Several tools have two byte-identical engines — a fused host-native C++
pass and a device (XLA/Pallas) kernel — and the right default depends on
the *link* between host and chip, not on the tool:

* ``stats``      — fastx_quality_stats histogram accumulation
                   (ops/stats.py: fx_stats_lines_q vs the MXU one-hot
                   histogram; reference loop
                   /root/reference/src/fastx_quality_stats/fastx_quality_stats.c:166-216)
* ``collapse``   — fastx_collapser dedup (native sharded hash fx_dedup_*
                   vs the device lexsort+segment-sum; reference
                   /root/reference/src/fastx_collapser/fastx_collapser.cpp:112-122)
* ``per-read``   — the six per-read CLI tools' raw-line fast path
                   (native decide+render from line spans) vs the classic
                   parse -> device-transform path.

Policy (the auto mode):

* **cpu / tunnel-attached TPU** -> ``host`` whenever the native library
  is available.  Shipping the raw operands over a ~20 MB/s tunnel was
  the round-2 loss (BASELINE.md round-2 table); the host engines run at
  ~1M+ reads/sec.
* **PCIe-local TPU** -> ``device`` for the reductions (stats, collapse):
  their operand uploads are ~10 ms at PCIe bandwidth and the device
  kernels run millions of reads/sec (BASELINE.md --device table).
* **per-read tools** -> ``host`` on every rig, backed by the PER-TOOL
  measured table (``python bench.py --pertool``, 2026-08-21, recorded in
  BASELINE.md round 5): each of the six raw-line tools runs 2.9-10x
  faster through the host path startup-adjusted, and 4.4-10x+ under the
  fair steady-state accounting (each mode's own trace+compile fixed
  cost subtracted; outputs byte-identical).  The local-PCIe
  extrapolation holds tool-by-tool because both paths pay the same
  render/IO legs (~85% of the host wall) while the classic path adds
  the padded parse+pack on top (measured floor ~1.0M r/s); even with a
  FREE chip and link the classic path cannot come out ahead for any of
  the six.  The device only wins when many stages fuse into one
  program — that is the fastx_pipeline CLI, which always rides the
  device.  ``FASTX_LINEPATH=off`` forces the classic device path for
  differential testing.

Every surface keeps its historical env override (FASTX_STATS_PATH,
FASTX_COLLAPSE_PATH, FASTX_TPU_NO_LINEPATH) on top of this shared auto.
"""

from __future__ import annotations

import os

_KINDS = ("stats", "collapse", "per-read")


def backend_kind() -> str:
    """'cpu' | 'tpu-local' | 'tpu-tunnel' for the default jax backend.

    The axon tunnel used on development rigs registers its platform as
    'axon' (or as 'tpu' with tunnel env markers set); a production
    PCIe/DMA-attached chip is platform 'tpu' with none of the markers.
    """
    import jax

    try:
        plat = jax.devices()[0].platform
    except Exception:
        return "cpu"
    if plat not in ("tpu", "axon"):
        return "cpu"
    if os.environ.get("FASTX_FORCE_LOCAL"):
        # test hook: treat the chip as PCIe-local so the tpu-local
        # device-auto branches run on tunnel rigs too (the real-chip
        # smoke in HARDWARE_VERIFICATION.md exercises them this way)
        return "tpu-local"
    tunnel = plat == "axon" or bool(
        os.environ.get("PALLAS_AXON_POOL_IPS")
        or "axon" in os.environ.get("JAX_PLATFORMS", "")
    )
    return "tpu-tunnel" if tunnel else "tpu-local"


def engine_auto(kind: str) -> str:
    """'host' or 'device' for a dual-engine surface (the shared auto
    policy; see module docstring for the rationale and measurements)."""
    from ..core import native

    if kind not in _KINDS:
        raise ValueError("unknown engine kind %r" % (kind,))
    if native.LIB is None:
        return "device"
    if kind == "per-read":
        # host raw-line decide outruns the classic device path on every
        # rig (module docstring); FASTX_LINEPATH=off overrides
        return "host"
    return "device" if backend_kind() == "tpu-local" else "host"


def resolve(kind: str, override: str | None) -> str:
    """Apply an explicit override ('host'/'device') over the auto policy.

    Unrecognized override strings fall back to auto (matching the
    historical FASTX_STATS_PATH/FASTX_COLLAPSE_PATH tolerance — a typo'd
    env var must not crash a streaming tool); a forced host engine
    without the native library is the one hard error, as before."""
    from ..core import native

    if override == "host":
        if native.LIB is None:
            raise RuntimeError(
                "engine override 'host' for %s requires the native codec "
                "library" % kind
            )
        return "host"
    if override == "device":
        return "device"
    return engine_auto(kind)
