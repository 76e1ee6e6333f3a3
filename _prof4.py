import time, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import bench
from fastx_toolkit_tpu.core import codec
from fastx_toolkit_tpu.engine.pipeline import PipelineConfig, decisions_pipeline
N = 1_000_000; L=100; CH=262144
t0=time.perf_counter(); data = bench.synth_lane_bytes(N, L); print("synth %.1fs"%(time.perf_counter()-t0), flush=True)
cfg = PipelineConfig(adapter=bench.ADAPTER)
fn = decisions_pipeline(cfg)
bench.run_once(bench.synth_lane_bytes(2048, L, seed=7), fn, cfg)
# piecewise
t0=time.perf_counter(); batch = codec.parse(data, filetype=codec.FASTQ_ONLY, q_offset=33); t1=time.perf_counter()
print("parse %.3fs"%(t1-t0), flush=True)
pending=[]
t0=time.perf_counter()
for s in range(0, N, CH):
    e=min(s+CH,N)
    pending.append((s,e,fn(np.asarray(batch.bases[s:e]), np.asarray(batch.quals[s:e]), np.asarray(batch.lengths[s:e]), np.asarray(batch.counts[s:e]))))
t1=time.perf_counter(); print("dispatch %.3fs"%(t1-t0), flush=True)
new_len=np.empty(N,np.int32); keep=np.empty(N,bool)
for s,e,(l,k,_) in pending:
    new_len[s:e]=np.asarray(l); keep[s:e]=np.asarray(k)
t2=time.perf_counter(); print("collect %.3fs"%(t2-t1), flush=True)
batch.lengths=new_len
payload = codec.render(batch, out_fastq=True, ascii_qual=True, q_offset=33, keep=keep, mask_thr=cfg.mask_q)
t3=time.perf_counter(); print("render %.3fs, total %.3fs (%.0f r/s)"%(t3-t2, t3-(t1-(t1-t0))- (t0 - t0) + (t3 - t0) - (t3-t0) + (t3 - (t0)), N/((t3-t0)+(t1-t0)*0+ (t1-t0)*0 + (t1-t0)*0 + (t1-t0)*0 + (0))))
print("end2end pieces: parse+dispatch+collect+render = %.3f"% (t3 - t0 + (t1-t0)*0), flush=True)
