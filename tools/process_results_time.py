#!/usr/bin/env python
"""Normalize per-image times across BOP result CSVs and merge result files.

Reference: tools/process_bop_results_time.py (per-image time = max over
instances, consistent across merged files) and
tools/merge_bop_single_obj_results.py (combine per-object CSVs).

    python tools/process_results_time.py merged.csv in1.csv in2.csv ...
"""

from __future__ import annotations

import sys
import os
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from gdrnpp_bop2022_tpu.bop.inout import load_bop_results, save_bop_results


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(1)
    out_path = sys.argv[1]
    rows = []
    for p in sys.argv[2:]:
        rows.extend(load_bop_results(p))
    by_image = defaultdict(list)
    for r in rows:
        by_image[(r["scene_id"], r["im_id"])].append(r)
    for group in by_image.values():
        t = max(r["time"] for r in group)
        for r in group:
            r["time"] = t
    save_bop_results(out_path, rows)
    print(f"wrote {len(rows)} rows -> {out_path}")


if __name__ == "__main__":
    main()
