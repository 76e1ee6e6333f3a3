"""True multi-process jax.distributed test: two OS processes, each
holding its own data shard, merge quality-stats with psum over the
process mesh — the actual multi-host pod execution model, simulated with
CPU devices."""

import os
import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent(
    """
    import os, sys, functools
    rank = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                               num_processes=nproc, process_id=rank)
    import numpy as np
    from jax.sharding import Mesh, PartitionSpec as P
    from jax.experimental import multihost_utils
    sys.path.insert(0, "/root/repo")
    from fastx_toolkit_tpu.ops import stats as S

    devs = jax.devices()
    assert len(devs) == nproc
    mesh = Mesh(np.array(devs), ("data",))
    rng = np.random.default_rng(100 + rank)
    B, L = 32, 16
    bases = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=(B, L))
    quals = rng.integers(0, 41, size=(B, L)).astype(np.int8)
    lengths = np.full(B, L, np.int32)
    counts = np.ones(B, np.int32)
    gb = multihost_utils.host_local_array_to_global_array(
        (bases, quals, lengths, counts), mesh,
        (P("data", None), P("data", None), P("data"), P("data")))

    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(P("data"), P("data"), P("data"), P("data")),
                       out_specs=P(), check_vma=False)
    def go(b, q, l, c):
        count, *_ = S.accumulate(b, q, l, c, is_fastq=True)
        return jax.lax.psum(count, "data")

    out = jax.jit(go)(*gb)
    total = int(np.asarray(out)[0, 0])
    assert total == B * nproc, total
    print("OK rank", rank)
    """
)


@pytest.mark.skipif(sys.platform != "linux", reason="linux only")
def test_two_process_psum(tmp_path):
    w = tmp_path / "worker.py"
    w.write_text(WORKER)
    env = dict(
        os.environ,
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        PYTHONPATH="/root/.axon_site:/root/repo",
    )
    env.pop("XLA_FLAGS", None)
    port = "19841"
    procs = [
        subprocess.Popen(
            [sys.executable, str(w), str(r), "2", port],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for r in range(2)
    ]
    outs = [p.communicate(timeout=240)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o
        assert "OK rank" in o
