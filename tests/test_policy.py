"""The shared link-aware engine-dispatch policy (engine/policy.py).

VERDICT r3 item #3: one policy function governs stats, collapser, and
the per-read raw-line fast path, with per-mode tests and docs matching
code."""

import io
import os
from types import SimpleNamespace

import pytest

from fastx_toolkit_tpu.core import native
from fastx_toolkit_tpu.engine import policy

needs_native = pytest.mark.skipif(
    native.LIB is None, reason="native codec library unavailable"
)


def test_backend_kind_cpu():
    if os.environ.get("FASTX_TPU_TEST_REAL"):
        # real-chip runs reach the TPU through the axon tunnel
        assert policy.backend_kind() == "tpu-tunnel"
    else:
        # the test harness runs on the CPU backend (conftest)
        assert policy.backend_kind() == "cpu"


@needs_native
def test_auto_reductions_host_on_cpu_and_tunnel(monkeypatch):
    for kind in ("stats", "collapse"):
        assert policy.engine_auto(kind) == "host"
    monkeypatch.setattr(policy, "backend_kind", lambda: "tpu-tunnel")
    for kind in ("stats", "collapse"):
        assert policy.engine_auto(kind) == "host"


@needs_native
def test_auto_reductions_device_on_local_tpu(monkeypatch):
    monkeypatch.setattr(policy, "backend_kind", lambda: "tpu-local")
    assert policy.engine_auto("stats") == "device"
    assert policy.engine_auto("collapse") == "device"
    # per-read stays host even on a local link (measured call — see
    # policy module docstring)
    assert policy.engine_auto("per-read") == "host"


def test_force_local_hook(monkeypatch):
    """FASTX_FORCE_LOCAL makes a tunnel-attached (or any TPU-backed)
    rig report tpu-local, so the device-auto branches are exercisable
    on the real chip (HARDWARE_VERIFICATION.md smoke)."""
    if policy.backend_kind() == "cpu":
        # no TPU in the CPU suite: the hook must not invent one
        monkeypatch.setenv("FASTX_FORCE_LOCAL", "1")
        assert policy.backend_kind() == "cpu"
    else:
        monkeypatch.setenv("FASTX_FORCE_LOCAL", "1")
        assert policy.backend_kind() == "tpu-local"
        if native.LIB is not None:
            assert policy.engine_auto("stats") == "device"
            assert policy.engine_auto("collapse") == "device"


def test_auto_device_without_native(monkeypatch):
    monkeypatch.setattr(native, "LIB", None)
    for kind in ("stats", "collapse", "per-read"):
        assert policy.engine_auto(kind) == "device"


def test_resolve_overrides(monkeypatch):
    assert policy.resolve("stats", "device") == "device"
    if native.LIB is not None:
        assert policy.resolve("collapse", "host") == "host"
    monkeypatch.setattr(native, "LIB", None)
    with pytest.raises(RuntimeError):
        policy.resolve("stats", "host")
    # unrecognized override strings (typo'd env vars) fall back to auto
    assert policy.resolve("stats", "bogus") == policy.engine_auto("stats")
    with pytest.raises(ValueError):
        policy.engine_auto("bogus")


@needs_native
def test_stats_and_collapse_paths_follow_policy(monkeypatch):
    from fastx_toolkit_tpu.cli.tools.fastx_collapser import collapse_path
    from fastx_toolkit_tpu.ops.stats import stats_path

    monkeypatch.delenv("FASTX_STATS_PATH", raising=False)
    monkeypatch.delenv("FASTX_COLLAPSE_PATH", raising=False)
    assert stats_path() == "host"  # CPU backend
    assert collapse_path() == "host"
    monkeypatch.setattr(policy, "backend_kind", lambda: "tpu-local")
    assert stats_path() == "device"
    assert collapse_path() == "device"
    monkeypatch.setenv("FASTX_STATS_PATH", "host")
    monkeypatch.setenv("FASTX_COLLAPSE_PATH", "host")
    assert stats_path() == "host"
    assert collapse_path() == "host"
    monkeypatch.setattr(policy, "backend_kind", lambda: "cpu")
    monkeypatch.setenv("FASTX_STATS_PATH", "device")
    monkeypatch.setenv("FASTX_COLLAPSE_PATH", "device")
    assert stats_path() == "device"
    assert collapse_path() == "device"


def _mk_reader(data: bytes):
    from fastx_toolkit_tpu.cli.tools._shared import BatchReader
    from fastx_toolkit_tpu.core import codec

    args = SimpleNamespace(input_filename="<test>", q_offset=33)
    return BatchReader(None, args, filetype=codec.FASTQ_ONLY,
                       stream=io.BytesIO(data))


@needs_native
def test_line_fast_path_follows_policy(monkeypatch):
    from fastx_toolkit_tpu.cli.tools import _shared

    data = b"@r1\nACGT\n+\nIIII\n"
    args = SimpleNamespace(input_filename="<test>", q_offset=33)
    monkeypatch.delenv("FASTX_LINEPATH", raising=False)
    monkeypatch.delenv("FASTX_TPU_NO_LINEPATH", raising=False)
    assert _shared.line_fast_path(_mk_reader(data), args) is not None
    # both historical and new off-switches force the classic path
    monkeypatch.setenv("FASTX_TPU_NO_LINEPATH", "1")
    assert _shared.line_fast_path(_mk_reader(data), args) is None
    monkeypatch.delenv("FASTX_TPU_NO_LINEPATH")
    monkeypatch.setenv("FASTX_LINEPATH", "off")
    assert _shared.line_fast_path(_mk_reader(data), args) is None
    monkeypatch.setenv("FASTX_LINEPATH", "on")
    assert _shared.line_fast_path(_mk_reader(data), args) is not None
