"""Per-op-signature diff of two device traces (VERDICT r4 item 5: explain
the swap-dW sign flip on TSP/brain with trace evidence).

Ops are aggregated by (class, output-shape signature) — HLO fusion
NUMBERS differ between two compiles of different programs, but the
dominant ops keep their output shapes, so signature-level totals line up.

    python benchmarks/xplane/trace_diff.py DIR_A DIR_B --steps 100 \
        [--classes convolution,fusion]

Prints the signatures whose A→B time delta is largest (both signs).
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import xplane_pb2  # noqa: E402
from floor_rollup import classify  # noqa: E402

_SIG = re.compile(r"= (\w+\[[\d,]*\])")


def load(logdir: str, steps: int):
    files = glob.glob(logdir + "/**/*.xplane.pb", recursive=True)
    if not files:
        raise SystemExit(f"no .xplane.pb under {logdir}")
    space = xplane_pb2.XSpace()
    with open(files[0], "rb") as fh:
        space.ParseFromString(fh.read())
    plane = next(p for p in space.planes if "TPU" in p.name)
    smd = {k: v.name for k, v in plane.stat_metadata.items()}
    info = {}
    for mid, meta in plane.event_metadata.items():
        category = ""
        flops = 0
        for st in meta.stats:
            nm = smd.get(st.metadata_id, "")
            if nm == "hlo_category":
                category = st.str_value or (
                    st.bytes_value.decode() if st.bytes_value else "")
            elif nm == "flops":
                flops = st.int64_value or st.uint64_value
        info[mid] = (meta.name, category, int(flops))
    line = next(ln for ln in plane.lines if ln.name == "XLA Ops")
    agg = collections.defaultdict(lambda: [0, 0.0, 0])
    total = 0.0
    for ev in line.events:
        name, category, fl = info.get(ev.metadata_id, ("?", "", 0))
        if category == "while":
            continue
        c = classify(name, category)
        m = _SIG.search(name)
        sig = f"{c} :: {m.group(1) if m else name.split(' = ')[0]}"
        dur = ev.duration_ps / 1e12 / steps
        rec = agg[sig]
        rec[0] += 1
        rec[1] += dur
        rec[2] += fl
        total += dur
    return agg, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dir_a")
    ap.add_argument("dir_b")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--top", type=int, default=18)
    ap.add_argument("--classes", default="",
                    help="comma list; keep only signatures containing one")
    args = ap.parse_args()
    a, ta = load(args.dir_a, args.steps)
    b, tb = load(args.dir_b, args.steps)
    keys = set(a) | set(b)
    if args.classes:
        kinds = args.classes.split(",")
        keys = {k for k in keys if any(c in k for c in kinds)}
    rows = []
    for k in keys:
        rows.append((b.get(k, [0, 0, 0])[1] - a.get(k, [0, 0, 0])[1], k))
    rows.sort()
    print(f"total busy: A {ta*1e6:.0f} us/step -> B {tb*1e6:.0f} us/step "
          f"({(tb-ta)*1e6:+.0f})")
    print(f"\n{'delta us/step':>14}  {'A us':>8} {'B us':>8}  signature")
    shown = rows[: args.top // 2] + rows[-args.top // 2:]
    for d, k in shown:
        print(f"{d*1e6:>14.1f}  {a.get(k, [0,0,0])[1]*1e6:>8.1f} "
              f"{b.get(k, [0,0,0])[1]*1e6:>8.1f}  {k[:110]}")


if __name__ == "__main__":
    main()
