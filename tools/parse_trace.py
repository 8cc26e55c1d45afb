"""Parse a jax.profiler xplane trace into per-op device times.

The tensorboard-plugin-profile converters are broken in this image; this
reads the xplane proto directly (see CLAUDE.md).

  python tools/parse_trace.py /tmp/jaxprof [--iters 3] [--top 25]
"""
import argparse
import glob
import os
import re
import sys
from collections import defaultdict

os.environ.setdefault('PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION', 'python')


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('trace_dir')
    parser.add_argument('--iters', type=int, default=1,
                        help='divide totals by the traced iteration count')
    parser.add_argument('--top', type=int, default=25)
    args = parser.parse_args()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = sorted(glob.glob(os.path.join(args.trace_dir, '**', '*.xplane.pb'),
                             recursive=True))
    assert files, f'no xplane.pb under {args.trace_dir}'
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(files[-1], 'rb').read())

    for plane in xs.planes:
        if 'TPU' not in plane.name:
            continue
        md = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name not in ('XLA Ops', 'XLA Modules'):
                continue
            per = defaultdict(float)
            cat = defaultdict(float)
            for ev in line.events:
                name = md.get(ev.metadata_id, '?')
                ms = ev.duration_ps / 1e9 / args.iters
                per[name] += ms
                m = re.match(r'%?([a-zA-Z\-_]+)', name)
                cat[m.group(1) if m else '?'] += ms
            print(f'=== {plane.name} / {line.name}')
            if line.name == 'XLA Ops':
                print('--- by category:')
                for k, v in sorted(cat.items(), key=lambda kv: -kv[1])[:12]:
                    print(f'{v:9.3f} ms  {k}')
                print('--- top ops:')
            for name, ms in sorted(per.items(), key=lambda kv: -kv[1])[:args.top]:
                print(f'{ms:9.3f} ms  {name[:110]}')


if __name__ == '__main__':
    main()
