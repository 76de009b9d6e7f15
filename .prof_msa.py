"""Stage breakdown of the bench workload's MSA (real TPU). Not shipped."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, "/root/repo")
import bench
from sarlacc_tpu.utils.profiling import PipelineProfiler, set_profiler, get_profiler

adaptor1, adaptor2, batch = bench.build_workload()
bench.run_pipeline(adaptor1, adaptor2, batch)  # warmup/compile

set_profiler(PipelineProfiler())
t0 = time.time()
bench.run_pipeline(adaptor1, adaptor2, batch)
print(f"total: {time.time()-t0:.2f}s", file=sys.stderr)
print(get_profiler().report(), file=sys.stderr)
