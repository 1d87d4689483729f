"""Decode a jax.profiler xplane trace without TensorFlow.

The baked environment has no xplane_pb2 (TF's profiler protos are absent and
tensorboard_plugin_profile ships without them), so ``xplane.proto`` here
mirrors the public tsl schema and protoc compiles it at build time
(``protoc --python_out=. xplane.proto`` — xplane_pb2.py is committed).

    python benchmarks/xplane/parse_trace.py /tmp/hlhgat_trace

Prints per-plane line/event summaries and, for TPU device planes, the
op-duration ranking (self time by event name) — the evidence base for the
roofline verdict in benchmarks/RESULTS.md.
"""

from __future__ import annotations

import collections
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import xplane_pb2  # noqa: E402


def load_spaces(logdir: str):
    files = glob.glob(logdir + "/**/*.xplane.pb", recursive=True)
    for f in files:
        space = xplane_pb2.XSpace()
        with open(f, "rb") as fh:
            space.ParseFromString(fh.read())
        yield f, space


def summarize(space, top: int = 30, plane_filter: str | None = None):
    for plane in space.planes:
        if plane_filter and plane_filter not in plane.name.lower():
            continue
        meta = plane.event_metadata
        totals: dict[str, float] = collections.defaultdict(float)
        counts: dict[str, int] = collections.defaultdict(int)
        line_span = 0.0
        for line in plane.lines:
            span = 0
            for ev in line.events:
                name = meta[ev.metadata_id].name if ev.metadata_id in meta \
                    else str(ev.metadata_id)
                totals[name] += ev.duration_ps / 1e12
                counts[name] += 1
                span = max(span, ev.offset_ps + ev.duration_ps)
            line_span = max(line_span, span / 1e12)
        if not totals:
            continue
        print(f"\n== plane {plane.name!r}: {len(plane.lines)} lines, "
              f"span {line_span:.4f} s")
        ranked = sorted(totals.items(), key=lambda kv: -kv[1])[:top]
        total = sum(totals.values())
        for name, t in ranked:
            print(f"  {t:9.4f}s {100*t/total:5.1f}% x{counts[name]:<6d} "
                  f"{name[:110]}")


def main():
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hlhgat_trace"
    plane_filter = sys.argv[2] if len(sys.argv) > 2 else None
    found = False
    for f, space in load_spaces(logdir):
        found = True
        print(f"# {f}: {len(space.planes)} planes "
              f"({[p.name for p in space.planes]})")
        summarize(space, plane_filter=plane_filter)
    if not found:
        print(f"no .xplane.pb files under {logdir}")


if __name__ == "__main__":
    main()
