"""Training-log analysis (counterpart of tools/analysis_tools/analyze_logs.py).

Parses the runner's log lines (``epoch E iter I/N S s/it {json}``) and prints
per-epoch loss averages and iteration-time statistics.

Usage: python -m rcbevdet_tpu.tools.analyze_logs <logfile> [--key loss]
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from collections import defaultdict

import numpy as np

LINE_RE = re.compile(
    r"epoch (\d+) iter (\d+)/(\d+) ([\d.]+)s/it (\{.*\})"
)


def parse_log(path):
    records = []
    with open(path) as f:
        for line in f:
            m = LINE_RE.search(line)
            if m:
                records.append(
                    dict(
                        epoch=int(m.group(1)),
                        iter=int(m.group(2)),
                        sec_per_iter=float(m.group(4)),
                        **json.loads(m.group(5)),
                    )
                )
    return records


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("logfile")
    p.add_argument("--key", default="loss")
    args = p.parse_args(argv)
    records = parse_log(args.logfile)
    if not records:
        print("no training records found")
        return 1
    by_epoch = defaultdict(list)
    times = []
    for r in records:
        if args.key in r:
            by_epoch[r["epoch"]].append(r[args.key])
        times.append(r["sec_per_iter"])
    for e in sorted(by_epoch):
        v = np.asarray(by_epoch[e])
        print(f"epoch {e}: {args.key} mean={v.mean():.4f} last={v[-1]:.4f}")
    t = np.asarray(times)
    print(
        f"iter time: mean={t.mean():.3f}s p50={np.percentile(t, 50):.3f}s "
        f"p90={np.percentile(t, 90):.3f}s"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
