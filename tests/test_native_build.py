"""Native library rebuild keying (core/native.py).

The .so compiles with -march=native and must never be loaded on a host
it wasn't built for: the rebuild is keyed on source hash + toolchain +
microarchitecture (VERDICT r3 item #7), not on file mtimes."""

import os

import pytest

from fastx_toolkit_tpu.core import native

needs_native = pytest.mark.skipif(
    native.LIB is None, reason="native codec library unavailable"
)


@needs_native
def test_build_key_is_stable():
    assert native._build_key() == native._build_key()
    with open(native._META) as fh:
        lines = fh.read().splitlines()
    assert lines[0] == native._build_key()
    # second line: the fast (mtime, size, machine) signature that lets
    # _load skip the hash + g++ probe on unchanged sources
    assert lines[1] == native._fast_sig()


@needs_native
def test_stale_binary_triggers_rebuild():
    # simulate a clone carrying a foreign-host artifact: the meta key
    # doesn't match this host's, so _load() must rebuild, not trust it
    with open(native._META, "w") as fh:
        fh.write("built-on-some-other-microarchitecture")
    mtime_before = os.path.getmtime(native._SO)
    lib = native._load()
    assert lib is not None
    assert os.path.getmtime(native._SO) >= mtime_before
    with open(native._META) as fh:
        assert fh.read().splitlines()[0] == native._build_key()


@needs_native
def test_missing_meta_triggers_rebuild():
    os.remove(native._META)
    assert native._load() is not None
    assert os.path.exists(native._META)
