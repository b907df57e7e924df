"""Input-pipeline throughput benchmark.

SURVEY.md hard-part #7: the CPU-side preprocessing (6 cams x 9 frames of
jpeg decode + resize + radar sweep assembly + target rendering) is the
likely wall for training throughput.  This tool measures:

- samples/sec of raw ``dataset[i]`` calls (single-threaded),
- batches/sec of the PrefetchLoader at each thread count,

so the loader headroom can be compared against the device step time from
``tools/benchmark``/``bench.py``.  Counterpart: the reference has no such
tool (its DataLoader worker count is tuned blind, apis/train.py
workers_per_gpu).

Usage:
  python -m rcbevdet_tpu.tools.benchmark_pipeline [--config C] [--synthetic]
      [--samples N] [--batch-size B] [--threads 1 2 4]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser(description="Benchmark the input pipeline")
    p.add_argument("--config", default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--samples", type=int, default=32)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--threads", type=int, nargs="*", default=[1, 2, 4])
    p.add_argument("--num-adj", type=int, default=8)
    args = p.parse_args(argv)

    import numpy as np

    from ..data.loader import PrefetchLoader

    if args.synthetic or args.config is None:
        from ..data.synthetic import synthetic_sample

        _, dataset = synthetic_sample(
            num_adj=args.num_adj, num_samples=max(args.samples, 8),
            correlated_radar=True,
        )
    else:
        from ..builder import build_dataset
        from ..config import Config

        dataset = build_dataset(Config.fromfile(args.config), "train")

    n = min(args.samples, len(dataset))

    # warm one sample (lazy caches)
    dataset[0]

    t0 = time.perf_counter()
    for i in range(n):
        dataset[i % len(dataset)]
    single = (time.perf_counter() - t0) / n

    loader_rates = {}
    for nt in args.threads:
        loader = PrefetchLoader(
            dataset, batch_size=args.batch_size, num_threads=nt,
            shuffle=False,
        )
        t0 = time.perf_counter()
        nb = 0
        for _ in loader:
            nb += 1
        dt = time.perf_counter() - t0
        loader_rates[str(nt)] = round(nb * args.batch_size / dt, 2)

    out = {
        "metric": "input_pipeline_throughput",
        "samples_per_sec_single": round(1.0 / single, 2),
        "ms_per_sample_single": round(single * 1e3, 2),
        "loader_samples_per_sec_by_threads": loader_rates,
        "batch_size": args.batch_size,
        "num_adj": args.num_adj,
        "n_samples": n,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
