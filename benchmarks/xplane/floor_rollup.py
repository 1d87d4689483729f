"""Per-op-class bandwidth/MXU floor rollup from a device xplane trace.

The round-2/3 roofline work (benchmarks/roofline.py, RESULTS.md) measured
this chip's achievable stream bandwidth and bf16 MXU rate; the scan-200
trace gives every compiled op's measured self time.  This tool joins the
two: each XLA op's event metadata carries the compiled cost model's
``bytes_accessed`` (with a per-memory-space breakdown) and ``flops``, so
for every op class we can compute the time the class's bytes/flops WOULD
take at achievable rates — its speed-of-light floor — and compare with the
measured time.  The class with the worst measured/floor ratio is the next
layout target; if every class is near its floor, the step is provably
bound and the composite floor is the honest headline anchor.

    python benchmarks/xplane/floor_rollup.py /tmp/hlhgat_trace_flagship \
        [--steps 200] [--bw 509.5] [--tflops 153.7] [--top 12]

Floors use the MEASURED peaks (roofline.py: 509.5 GB/s stream, 153.7 bf16
TFLOP/s), not datasheet numbers.  ``--steps`` divides totals into per-step
figures (the profiled region is one jit call of a scan of N steps).
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import xplane_pb2  # noqa: E402


def _varint(buf: bytes, i: int) -> tuple[int, int]:
    val, shift = 0, 0
    while True:
        b = buf[i]
        val |= (b & 0x7F) << shift
        i += 1
        if not b & 0x80:
            return val, i
        shift += 7


def decode_memory_breakdown(raw: bytes):
    """Decode the MemoryAccessBreakdown proto by hand (repeated message of
    {is_read:1, memory_space:2, bytes_accessed:3}); the tsl proto is not in
    the committed schema and the fields are all varints."""
    out = []
    i = 0
    while i < len(raw):
        tag, i = _varint(raw, i)
        if tag >> 3 != 1 or (tag & 7) != 2:  # not a length-delimited field-1
            break
        ln, i = _varint(raw, i)
        sub = raw[i:i + ln]
        i += ln
        j = 0
        entry = {"is_read": 0, "memory_space": 0, "bytes": 0}
        while j < len(sub):
            t, j = _varint(sub, j)
            v, j = _varint(sub, j)
            f = t >> 3
            if f == 1:
                entry["is_read"] = v
            elif f == 2:
                entry["memory_space"] = v
            elif f == 3:
                entry["bytes"] = v
        out.append(entry)
    return out


def classify(name: str, category: str) -> str:
    """Op class for the rollup: the hlo_category, with fusions split by what
    they are doing (the 55%-of-step 'fusion' bucket is too coarse to aim a
    layout fix at)."""
    if category != "loop fusion":
        return category or "uncategorized"
    # loop-fusion kinds by HLO name ("%fusion.123" tells nothing; the
    # expression text in the metadata name usually leads with the fused ops)
    n = name.split(" = ")[0].lower()
    if "transpose" in n:
        return "fusion:transpose"
    if "scatter" in n:
        return "fusion:scatter"
    if "gather" in n:
        return "fusion:gather"
    if "reduce" in n:
        return "fusion:reduce"
    if "dynamic-update-slice" in n or "dynamic_update" in n or "dynamic-slice" in n:
        return "fusion:dus"
    if "concatenate" in n:
        return "fusion:concat"
    if "convert" in n:
        return "fusion:convert"
    return "fusion:other"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("logdir")
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--bw", type=float, default=509.5,
                    help="measured stream GB/s (roofline.py)")
    ap.add_argument("--tflops", type=float, default=153.7,
                    help="measured bf16 TFLOP/s (roofline.py)")
    ap.add_argument("--top", type=int, default=14)
    ap.add_argument("--ops", type=int, default=0,
                    help="also print the N worst single ops by time-above-floor")
    args = ap.parse_args()

    files = glob.glob(args.logdir + "/**/*.xplane.pb", recursive=True)
    if not files:
        raise SystemExit(f"no .xplane.pb under {args.logdir}")
    space = xplane_pb2.XSpace()
    with open(files[0], "rb") as fh:
        space.ParseFromString(fh.read())
    plane = next(p for p in space.planes if "TPU" in p.name)
    smd = {k: v.name for k, v in plane.stat_metadata.items()}

    # per-metadata static info (shared by all occurrences of the op)
    info = {}
    for mid, meta in plane.event_metadata.items():
        bytes_all = flops = 0
        hbm_bytes = None
        category = ""
        for st in meta.stats:
            nm = smd.get(st.metadata_id, "")
            if nm == "bytes_accessed":
                bytes_all = st.int64_value or st.uint64_value
            elif nm == "flops":
                flops = st.int64_value or st.uint64_value
            elif nm == "hlo_category":
                category = st.str_value or (
                    st.bytes_value.decode() if st.bytes_value else "")
            elif nm == "memory_access_breakdown" and st.bytes_value:
                bd = decode_memory_breakdown(st.bytes_value)
                # space 1 = HBM (default layout), 3 = on-chip S(1)/VMEM —
                # verified against ops with known placements: an HBM->VMEM
                # convert fusion reads space 1 / writes space 3, while the
                # VMEM-resident GEMMs access only space 3
                hbm_bytes = sum(e["bytes"] for e in bd
                                if e["memory_space"] == 1)
        info[mid] = (meta.name, category, int(bytes_all),
                     int(hbm_bytes if hbm_bytes is not None else bytes_all),
                     int(flops))

    # roll up the XLA Ops line.  Container ops ('while' — the scan loop —
    # and the module event) span their children on the same line; keeping
    # them would double-count the whole step, so they are excluded and
    # reported as loop overhead instead.
    line = next(ln for ln in plane.lines if ln.name == "XLA Ops")
    cls = collections.defaultdict(lambda: [0, 0.0, 0, 0, 0])
    per_op = collections.defaultdict(lambda: [0, 0.0, 0, 0])
    container_t = 0.0
    for ev in line.events:
        name, category, b_all, b_hbm, fl = info.get(
            ev.metadata_id, ("?", "", 0, 0, 0))
        if category == "while":
            container_t += ev.duration_ps / 1e12
            continue
        c = classify(name, category)
        dur = ev.duration_ps / 1e12
        rec = cls[c]
        rec[0] += 1
        rec[1] += dur
        rec[2] += b_all
        rec[3] += b_hbm
        rec[4] += fl
        if args.ops:
            r = per_op[name]
            r[0] += 1
            r[1] += dur
            r[2] += b_hbm
            r[3] += fl

    bw = args.bw * 1e9
    mxu = args.tflops * 1e12
    n = args.steps
    rows = []
    for c, (cnt, t, b_all, b_hbm, fl) in cls.items():
        t_bw = b_hbm / bw
        t_fl = fl / mxu
        floor = max(t_bw, t_fl)
        rows.append((c, cnt / n, t / n, b_hbm / n, fl / n, t_bw / n,
                     t_fl / n, floor / n, t / floor if floor else float("inf")))
    rows.sort(key=lambda r: -r[2])

    tot_t = sum(r[2] for r in rows)
    tot_floor = sum(r[7] for r in rows)
    print(f"{'class':<24}{'n/step':>8}{'us/step':>10}{'MB/step':>9}"
          f"{'GFLOP':>8}{'bw-floor':>10}{'mxu-floor':>10}{'x-floor':>9}")
    for c, cnt, t, b, fl, tbw, tfl, floor, ratio in rows[:args.top]:
        print(f"{c:<24}{cnt:>8.0f}{t*1e6:>10.1f}{b/1e6:>9.2f}"
              f"{fl/1e9:>8.2f}{tbw*1e6:>10.1f}{tfl*1e6:>10.1f}{ratio:>9.2f}")
    print(f"{'TOTAL':<24}{'':>8}{tot_t*1e6:>10.1f}"
          f"{sum(r[3] for r in rows)/1e6:>9.2f}"
          f"{sum(r[4] for r in rows)/1e9:>8.2f}"
          f"{sum(r[5] for r in rows)*1e6:>10.1f}"
          f"{sum(r[6] for r in rows)*1e6:>10.1f}"
          f"{tot_t/tot_floor:>9.2f}")
    print(f"\nmeasured busy {tot_t*1e6:.0f} us/step vs composite floor "
          f"{tot_floor*1e6:.0f} us/step -> {tot_t/tot_floor:.2f}x above; "
          f"peaks used: {args.bw} GB/s, {args.tflops} TFLOP/s")
    if container_t:
        print(f"loop/container overhead (while span - children): "
              f"{(container_t - tot_t)/n*1e6:.1f} us/step")

    if args.ops:
        ops = []
        for name, (cnt, t, b, fl) in per_op.items():
            floor = max(b / bw, fl / mxu)
            ops.append((t - floor, t, floor, cnt, name))
        ops.sort(reverse=True)
        print(f"\nworst single ops by time-above-floor (us/step):")
        for gap, t, floor, cnt, name in ops[:args.ops]:
            print(f"  {gap/n*1e6:>8.1f} (t {t/n*1e6:>8.1f} floor "
                  f"{floor/n*1e6:>7.1f} x{cnt//n:<4d}) {name[:110]}")


if __name__ == "__main__":
    main()
