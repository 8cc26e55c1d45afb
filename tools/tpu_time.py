"""Ground-truth device timing via the TPU profiler.

The axon execution relay can cache or elide repeated executions (see
CLAUDE.md "Benchmarking on the axon relay"), so wall-clock loops lie.
`device_ms(fn, argsets)` runs fn under jax.profiler.start_trace and sums
the per-module device time from the xplane proto — immune to every relay
trick.
"""
import glob
import os
import shutil
import tempfile
from collections import defaultdict

os.environ.setdefault('PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION', 'python')


def module_ms(trace_dir: str, iters: int):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    files = sorted(glob.glob(os.path.join(trace_dir, '**', '*.xplane.pb'),
                             recursive=True))
    assert files, f'no xplane.pb under {trace_dir}'
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(files[-1], 'rb').read())
    per = defaultdict(float)
    for plane in xs.planes:
        if 'TPU' not in plane.name:
            continue
        md = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name != 'XLA Modules':
                continue
            for ev in line.events:
                per[md.get(ev.metadata_id, '?')] += ev.duration_ps / 1e9
    return {k: v / iters for k, v in per.items()}


def device_ms(fn, argsets, iters: int = 6) -> float:
    """Total TPU device ms per call of fn (compiled, profiler-verified).

    argsets: list of argument tuples; cycled across `iters` calls.
    """
    import jax
    jax.block_until_ready(fn(*argsets[0]))  # compile outside the trace
    tdir = tempfile.mkdtemp(prefix='tputime_')
    try:
        jax.profiler.start_trace(tdir)
        for i in range(iters):
            jax.block_until_ready(fn(*argsets[i % len(argsets)]))
        jax.profiler.stop_trace()
        return sum(module_ms(tdir, iters).values())
    finally:
        shutil.rmtree(tdir, ignore_errors=True)
