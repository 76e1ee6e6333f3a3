"""fastx_pod — launch a tool across N worker processes (one per host
slice) with the multi-host environment wired up.

The multi-host execution model (see parallel.multihost) is activated by
environment variables so every tool keeps its reference-identical flag
surface; on a real pod each host runs the same command with its own
FASTX_TPU_PROCESS_ID.  This launcher covers the single-machine case —
functional testing, CPU scaling runs, and multi-chip hosts — by spawning
N local worker processes itself:

    fastx_pod -n 4 [--cpu] [--coordinator HOST:PORT] -- \
        fastx_quality_stats -i lane.fastq -o stats.txt

Each worker streams its own record-aligned byte range of the input;
per-read tools write FILE.shard-<k>-of-<n> outputs (in-order concat ==
single-process output), global tools (stats/collapser) write the merged
result from process 0 only, and -v reports print once with global
counters.
"""

from __future__ import annotations

import os
import subprocess
import sys

USAGE = """usage: fastx_pod [-n N] [--cpu] [--coordinator HOST:PORT] -- TOOL [ARGS...]

Run TOOL as N cooperating worker processes (multi-host execution model).

   -n N                 = number of worker processes (default 2).
   --cpu                = force the CPU backend in the workers (testing).
   --pin-cores          = pin worker K to CPU core K via taskset
                          (single-machine scaling measurements).
   --coordinator H:P    = jax.distributed coordinator address
                          (default 127.0.0.1:19873).
   --                   = everything after this is the tool command line.
"""


def main(argv=None) -> int:
    args = list(sys.argv[1:] if argv is None else argv)
    n = 2
    cpu = False
    pin_cores = False
    coordinator = "127.0.0.1:19873"
    tool_cmd = None
    i = 0
    while i < len(args):
        a = args[i]
        if a == "-n":
            i += 1
            n = int(args[i])
        elif a == "--cpu":
            cpu = True
        elif a == "--pin-cores":
            pin_cores = True
        elif a == "--coordinator":
            i += 1
            coordinator = args[i]
        elif a == "--":
            tool_cmd = args[i + 1 :]
            break
        elif a in ("-h", "--help"):
            sys.stdout.write(USAGE)
            return 1
        else:
            sys.stderr.write("fastx_pod: unknown option '%s'\n" % a)
            sys.stdout.write(USAGE)
            return 1
        i += 1
    if not tool_cmd:
        sys.stdout.write(USAGE)
        return 1
    if n < 1:
        sys.stderr.write("fastx_pod: -n must be >= 1\n")
        return 1

    # resolve a bare tool name against this package's bin/ shims when it
    # is not already on PATH (so `fastx_pod -- fastx_quality_stats ...`
    # works from a source checkout)
    import shutil

    if "/" not in tool_cmd[0] and shutil.which(tool_cmd[0]) is None:
        bindir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), "bin")
        cand = os.path.join(bindir, tool_cmd[0])
        if os.path.exists(cand):
            tool_cmd[0] = cand

    procs = []
    for rank in range(n):
        env = dict(
            os.environ,
            FASTX_TPU_COORDINATOR=coordinator,
            FASTX_TPU_NUM_PROCESSES=str(n),
            FASTX_TPU_PROCESS_ID=str(rank),
        )
        if cpu:
            env["JAX_PLATFORMS"] = "cpu"
            # neutralize accelerator plugins that override JAX_PLATFORMS
            # from sitecustomize (e.g. the axon tunnel on test boxes)
            env["PALLAS_AXON_POOL_IPS"] = ""
            env.pop("XLA_FLAGS", None)
        env.pop("FASTX_TPU_NUM_SHARDS", None)
        env.pop("FASTX_TPU_SHARD_ID", None)
        cmd = tool_cmd
        if pin_cores:
            ncpu = os.cpu_count() or 1
            cmd = ["taskset", "-c", str(rank % ncpu), *tool_cmd]
        procs.append(subprocess.Popen(cmd, env=env))
    status = 0
    for p in procs:
        rc = p.wait()
        if rc != 0:
            status = rc
    return status


if __name__ == "__main__":
    sys.exit(main())
