"""Interleaved A/B microbenchmark through the noop sink (guide §1.4).

Early r14 measurements showed up to 40% JIT-warmup bias when variants
ran back-to-back in blocks; interleaving rounds (A B C, A B C, ...)
gives every variant the same box/JIT state. Median of the per-round
times is reported.

Usage (from an experiment script):

    from tools.ab_bench import ab
    ab(spark, {"current": lambda: build_a(), "variant": lambda: build_b()},
       rounds=5)

Each builder returns a DataFrame; one warm-up round runs first and is
discarded.
"""

from __future__ import annotations

import statistics
import time


def _run(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def ab(spark, builders: dict, rounds: int = 5, warmup: int = 1) -> dict[str, float]:
    times: dict[str, list[float]] = {k: [] for k in builders}
    for r in range(warmup + rounds):
        for name, build in builders.items():
            spark.sparkContext.setJobDescription(f"ab:{name}:r{r}")
            dt = _run(build())
            if r >= warmup:
                times[name].append(dt)
    out = {}
    for name, ts in times.items():
        med = statistics.median(ts)
        out[name] = med
        print(f"  {name}: median {med:.3f}s  (runs: {' '.join(f'{t:.3f}' for t in ts)})")
    return out
