"""Summarize idle-gated ``bench.py --scaling`` trial batches.

Reads the JSONL written by ``scripts/scaling_batch.py``, drops trials where
either child saw material hypervisor steal (the dominant noise source on this
shared host — see BASELINE.md methodology), and prints:

- per-trial table (efficiency, walls, steal%)
- clean-trial median + band
- per-stage wall/speedup table averaged over the clean trials

Usage: python scripts/scaling_summary.py [--in /tmp/scaling_r3.jsonl]
       [--max-steal 1.0] [--markdown]
"""

from __future__ import annotations

import argparse
import json
import statistics


def load(path: str):
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            if "result" in rec:
                out.append(rec["result"])
    return out


STAGES = [
    "dictionary",
    "encode_sort",
    "finalize",
    "length_luts",
    "front_coded",
    "write_triples",
    "adjacency",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="inp", default="/tmp/scaling_r3.jsonl")
    ap.add_argument("--max-steal", type=float, default=1.0)
    ap.add_argument("--markdown", action="store_true")
    args = ap.parse_args()

    trials = load(args.inp)
    if not trials:
        print("no trials")
        return 1
    for t in trials:  # nodes-mode results name the walls sec_lo/sec_hi
        if "sec_8" not in t and "sec_lo" in t:
            t["sec_8"], t["sec_32"] = t["sec_lo"], t["sec_hi"]

    sep = " | " if args.markdown else "  "
    hdr = ["trial", "eff", "T_narrow", "T_wide", "steal_n%", "steal_w%",
           "cores_n", "cores_w", "pin", "clean"]
    rows = []
    clean = []
    for i, t in enumerate(trials):
        sn, sw = t.get("steal_pct", [99, 99])
        ok = sn <= args.max_steal and sw <= args.max_steal
        if ok:
            clean.append(t)
        bc = t.get("busy_cores_avg") or [None, None]
        pin = t.get("pin_dataplane") or [None, None]
        rows.append(
            [i, f"{t['value']:.3f}", f"{t['sec_8']:.1f}", f"{t['sec_32']:.1f}",
             f"{sn:.2f}", f"{sw:.2f}",
             "-" if bc[0] is None else f"{bc[0]:.2f}",
             "-" if bc[1] is None else f"{bc[1]:.2f}",
             "yes" if pin[0] else "no",
             "yes" if ok else "no"]
        )
    if args.markdown:
        print("| " + " | ".join(hdr) + " |")
        print("|" + "---|" * len(hdr))
        for r in rows:
            print("| " + " | ".join(str(x) for x in r) + " |")
    else:
        print(sep.join(hdr))
        for r in rows:
            print(sep.join(str(x) for x in r))

    if clean:
        effs = sorted(t["value"] for t in clean)
        print(
            f"\nclean trials (both children steal% <= {args.max_steal}): {len(clean)}"
            f"  median eff {statistics.median(effs):.3f}  band {effs[0]:.3f}-{effs[-1]:.3f}"
        )
        cpus = clean[0].get("num_cpus")
        nodes = clean[0].get("cluster_nodes")
        print(f"cpu pair: {cpus}" + (f"  node pair: {nodes}" if nodes else ""))
        # per-stage means across clean trials; store_timings = [narrow, wide]
        ok_trials = [t for t in clean if t.get("store_timings") and len(t["store_timings"]) == 2]
        if ok_trials:
            print("\nper-stage mean walls over clean trials (store build):")
            hdr2 = ["stage", "T_narrow", "T_wide", "speedup"]
            lines = []
            tot_n = tot_w = 0.0
            for s in STAGES:
                n = statistics.mean(t["store_timings"][0].get(s, 0.0) for t in ok_trials)
                w = statistics.mean(t["store_timings"][1].get(s, 0.0) for t in ok_trials)
                tot_n += n
                tot_w += w
                lines.append([s, f"{n:.2f}", f"{w:.2f}", f"{n / w:.2f}x" if w else "-"])
            dn = statistics.mean(
                t["store_timings"][0]["dictionary_detail"]["driver_final"] for t in ok_trials
            )
            dw = statistics.mean(
                t["store_timings"][1]["dictionary_detail"]["driver_final"] for t in ok_trials
            )
            lines.append(["  of which driver_final (serial)", f"{dn:.2f}", f"{dw:.2f}", "~1x"])
            wn = statistics.mean(t["sec_8"] for t in ok_trials)
            ww = statistics.mean(t["sec_32"] for t in ok_trials)
            lines.append(["extract→link (wall minus store)", f"{wn - tot_n:.2f}", f"{ww - tot_w:.2f}",
                          f"{(wn - tot_n) / (ww - tot_w):.2f}x" if ww > tot_w else "-"])
            lines.append(["TOTAL wall", f"{wn:.2f}", f"{ww:.2f}", f"{wn / ww:.2f}x"])
            serial = dw
            print(f"(serial share of wide wall ~= {serial:.2f}s / {ww:.2f}s = {serial / ww:.1%})")
            if args.markdown:
                print("| " + " | ".join(hdr2) + " |")
                print("|" + "---|" * len(hdr2))
                for r in lines:
                    print("| " + " | ".join(r) + " |")
            else:
                for r in lines:
                    print(sep.join(r))
    else:
        print("\nNO clean trials — rerun in a quieter window")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
