"""Experiment log miner (the reference's smilelogging collector,
`/root/reference/smilelogging/option.py:13-74` + `slutils.py:97-160`).

Scans experiment directories for log lines matching a regex, extracts
named float metrics (``name value`` pairs or ``name=value``), and prints a
per-experiment summary table (last / best / mean).

Usage:
  python tools/collect_experiments.py --exps_dir Experiments \
      --name 'lego*' --pattern '\\[TEST\\]' --metric TestPSNRv2 --mode max
"""
from __future__ import annotations

import argparse
import glob
import os
import re


# 'PSNR 25.3', 'PSNR=25.3', 'PSNR = 25.3', aligned multi-space — all
# appear in reference-style logs (smilelogging 'name = value').
METRIC_RE = re.compile(
    r"([A-Za-z_][A-Za-z0-9_]*)\s*[= ]\s*"
    r"([-+]?\d*\.?\d+(?:[eE][-+]?\d+)?)")


def parse_log(path: str, line_pattern: str) -> list[dict[str, float]]:
    pat = re.compile(line_pattern)
    rows = []
    with open(path, errors="replace") as f:
        for line in f:
            if not pat.search(line):
                continue
            metrics = {m.group(1): float(m.group(2))
                       for m in METRIC_RE.finditer(line)}
            if metrics:
                rows.append(metrics)
    return rows


def collect(exps_dir: str, name_glob: str, line_pattern: str,
            metric: str, mode: str = "last") -> list[tuple[str, float, int]]:
    out = []
    for exp in sorted(glob.glob(os.path.join(exps_dir, name_glob))):
        log = os.path.join(exp, "log", "log.txt")
        if not os.path.exists(log):
            continue
        rows = parse_log(log, line_pattern)
        vals = [r[metric] for r in rows if metric in r]
        if not vals:
            continue
        if mode == "max":
            v = max(vals)
        elif mode == "min":
            v = min(vals)
        elif mode == "mean":
            v = sum(vals) / len(vals)
        else:
            v = vals[-1]
        out.append((os.path.basename(exp), v, len(vals)))
    return out


def main() -> None:
    p = argparse.ArgumentParser("collect_experiments")
    p.add_argument("--exps_dir", type=str, default="Experiments")
    p.add_argument("--name", type=str, default="*",
                   help="experiment-dir glob")
    p.add_argument("--pattern", type=str, default=r"\[eval\]",
                   help="regex selecting metric lines")
    p.add_argument("--metric", type=str, default="PSNR")
    p.add_argument("--mode", type=str, default="last",
                   choices=["last", "max", "min", "mean"])
    args = p.parse_args()

    rows = collect(args.exps_dir, args.name, args.pattern, args.metric,
                   args.mode)
    if not rows:
        print("no matching experiments/metrics")
        return
    width = max(len(r[0]) for r in rows)
    print(f"{'experiment':<{width}}  {args.metric}({args.mode})  #lines")
    for name, v, n in rows:
        print(f"{name:<{width}}  {v:.6f}  {n}")


if __name__ == "__main__":
    main()
