import time, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
from fastx_toolkit_tpu.kernels.stats_pallas import stats_hist_pallas
from fastx_toolkit_tpu.ops import stats as S
rng = np.random.default_rng(1)
B, L = 131072, 100
bases = rng.choice(np.frombuffer(b"ACGTN", np.uint8), size=(B, L))
quals = rng.integers(0, 41, size=(B, L)).astype(np.int8)
lengths = np.full(B, L, np.int32)
counts = np.ones(B, np.int32)
# pallas
r = stats_hist_pallas(bases, quals, lengths, tile_b=512); jax.block_until_ready(r)
ts=[]
for _ in range(3):
    t0=time.perf_counter(); r = stats_hist_pallas(bases, quals, lengths, tile_b=512); jax.block_until_ready(r); ts.append(time.perf_counter()-t0)
print("pallas hist: %.3fs (%.2fM reads/s)"%(min(ts), B/min(ts)/1e6))
# correctness vs scatter (on device)
want = S.accumulate_jit(bases, quals, lengths, counts, is_fastq=True)
got = S.derive_from_hist(np.asarray(r))
for name, w, g in zip(("count","hist","qsum","qmin","qmax"), want, got):
    np.testing.assert_array_equal(np.asarray(w), np.asarray(g), err_msg=name)
print("MATCH vs scatter accumulate")
ts=[]
for _ in range(3):
    t0=time.perf_counter(); w = S.accumulate_jit(bases, quals, lengths, counts, is_fastq=True); jax.block_until_ready(w); ts.append(time.perf_counter()-t0)
print("xla scatter: %.3fs (%.2fM reads/s)"%(min(ts), B/min(ts)/1e6))
