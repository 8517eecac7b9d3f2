#!/usr/bin/env python
"""Merge per-object ("SO") BOP result CSVs into one submission file.

Reference: tools/merge_bop_single_obj_results.py — the single-object
training workflow produces one poses.csv per object config
(configs/gdrn/<ds>SO/*); BOP scoring wants one CSV. Also re-normalizes the
per-image time column to the max across merged rows of the same image
(BOP rule: all estimates of an image must report the same time), which the
reference leaves to a separate pass (tools/process_results_time.py).

    python tools/merge_so_results.py out/*/inference/*/poses.csv \
        --out merged/gdrn_ycbv-test.csv
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def merge_csvs(paths, out_path, normalize_time=True):
    from collections import defaultdict
    header = None
    rows = []
    for p in paths:
        with open(p) as f:
            lines = [l.rstrip("\r\n") for l in f if l.strip()]
        if not lines:
            continue
        if header is None:
            header = lines[0]
        elif lines[0] != header:
            raise ValueError(f"{p}: header mismatch: {lines[0]!r} vs {header!r}")
        rows.extend(lines[1:])
    if header is None:
        raise ValueError("no input rows")

    if normalize_time:
        cols = header.split(",")
        i_scene, i_im = cols.index("scene_id"), cols.index("im_id")
        i_time = cols.index("time")
        parsed = [r.split(",") for r in rows]
        t_max = defaultdict(float)
        for r in parsed:
            key = (r[i_scene], r[i_im])
            t_max[key] = max(t_max[key], float(r[i_time]))
        for r in parsed:
            r[i_time] = f"{t_max[(r[i_scene], r[i_im])]:.6f}"
        rows = [",".join(r) for r in parsed]

    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "w") as f:
        f.write(header + "\n")
        for r in rows:
            f.write(r + "\n")
    return len(rows)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("paths", nargs="+")
    ap.add_argument("--out", required=True)
    ap.add_argument("--no-time-normalize", action="store_true")
    args = ap.parse_args()
    n = merge_csvs(args.paths, args.out,
                   normalize_time=not args.no_time_normalize)
    print(f"merged {len(args.paths)} files, {n} rows -> {args.out}")


if __name__ == "__main__":
    main()
