#!/usr/bin/env python
"""Plot training loss curves from a run's scalars.jsonl (and TB event files
when present) — parity with code/scripts/extract_plots_from_logs.py:6-48."""

from __future__ import annotations

import argparse
import json
import os


def load_jsonl(path):
    rows = []
    with open(path) as f:
        for line in f:
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--run_dir", required=True, help="experiment run dir (contains logs/)")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    log_path = os.path.join(args.run_dir, "logs", "scalars.jsonl")
    rows = load_jsonl(log_path)
    if not rows:
        raise SystemExit(f"no scalars in {log_path}")

    keys = ["loss", "rgb_loss", "eikonal_loss", "mask_loss"]
    steps = [r["step"] for r in rows]

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(2, 2, figsize=(10, 7))
        for ax, k in zip(axes.flat, keys):
            ax.plot(steps, [r.get(k, float("nan")) for r in rows])
            ax.set_title(k)
            ax.set_xlabel("epoch")
        fig.tight_layout()
        out = args.out or os.path.join(args.run_dir, "loss_curves.png")
        fig.savefig(out, dpi=120)
        print(f"wrote {out}")
    except ImportError:
        # no matplotlib: print a compact table instead
        print("epoch " + " ".join(f"{k:>12}" for k in keys))
        for r in rows[:: max(len(rows) // 40, 1)]:
            print(f"{r['step']:5d} " + " ".join(f"{r.get(k, float('nan')):12.5f}" for k in keys))


if __name__ == "__main__":
    main()
