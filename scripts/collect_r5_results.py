#!/usr/bin/env python
"""Aggregate committed eval artifacts into the RESULTS.md tables.

Scans evals/<exp>/ for metrics/{psnrs,ssims}.csv and chamfer_log.txt and
prints per-experiment means — every number traceable to an artifact
(VERDICT r4 weak #3).

    python scripts/collect_r5_results.py [--glob 'dtu_shaped_*'] [--json out]
"""
from __future__ import annotations

import argparse
import fnmatch
import json
import os


def read_csv_mean(path, views=None):
    """Mean of the per-view metric CSV, optionally over a view-id subset —
    lets cells evaluated at all 49 views be compared on the same subset as
    cells evaluated at 13 (the CSV's first column is the view id)."""
    if not os.path.exists(path):
        return None, 0
    vals = []
    for line in open(path):
        parts = line.strip().split(",")
        if len(parts) >= 2:
            try:
                vid, v = int(float(parts[0])), float(parts[1])
            except ValueError:
                continue
            if views is None or vid in views:
                vals.append(v)
    return (sum(vals) / len(vals), len(vals)) if vals else (None, 0)


def read_chamfer(path):
    if not os.path.exists(path):
        return None
    last = None
    for line in open(path):
        line = line.strip()
        if line:
            last = line
    try:
        d = json.loads(last)
        return {"d2s": d["mean_d2s"], "s2d": d["mean_s2d"],
                "overall": d["over_all"], "mesh": os.path.basename(d["data"])}
    except Exception:
        return None


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--glob", default="*")
    p.add_argument("--evals", default="evals")
    p.add_argument("--json", default=None)
    p.add_argument("--views", type=int, nargs="+", default=None,
                   help="restrict means to these view ids")
    args = p.parse_args()
    views = set(args.views) if args.views else None

    rows = []
    for exp in sorted(os.listdir(args.evals)):
        if not fnmatch.fnmatch(exp, args.glob):
            continue
        d = os.path.join(args.evals, exp)
        if not os.path.isdir(d):
            continue
        psnr, n = read_csv_mean(os.path.join(d, "metrics", "psnrs.csv"), views)
        ssim, _ = read_csv_mean(os.path.join(d, "metrics", "ssims.csv"), views)
        ch = read_chamfer(os.path.join(d, "chamfer_log.txt"))
        rows.append({"exp": exp, "views": n, "psnr": psnr, "ssim": ssim,
                     "chamfer": ch})

    w = max((len(r["exp"]) for r in rows), default=10)
    print(f"{'experiment':<{w}}  views  PSNR    SSIM    d2s      s2d      overall  mesh")
    for r in rows:
        psnr = f"{r['psnr']:.2f}" if r["psnr"] is not None else "  -  "
        ssim = f"{r['ssim']:.4f}" if r["ssim"] is not None else "  -   "
        if r["chamfer"]:
            c = r["chamfer"]
            ch = f"{c['d2s']:.4f}   {c['s2d']:.4f}   {c['overall']:.4f}   {c['mesh']}"
        else:
            ch = "-"
        print(f"{r['exp']:<{w}}  {r['views']:>5}  {psnr}  {ssim}  {ch}")

    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)
            f.write("\n")


if __name__ == "__main__":
    main()
