"""Regression guards for the beyond-reference eval/serving perf claims.

bench.py guards the train step; this guards the OTHER committed headline
numbers in BASELINE.md (VERDICT r4 #5), which were previously one-off
script measurements that could regress silently:

  * full-corpus eval at MGSV-EC scale (53k videos x 4k tracks) on one
    chip — scripts/bench_corpus_53k_tpu.py (committed: 4.24-4.43 s total,
    1.04-1.08 s rect similarity at ~75 TFLOP/s);
  * serving-path latency/throughput against the 4,096-track index —
    scripts/bench_serving_tpu.py (committed: ~114 ms p50 at B=1,
    ~181 qps at B=32, ~140 qps sustained under 32 concurrent clients).

Bounds are keyed per device kind like bench.py's floor dict.  Throughput
floors follow bench.py's 95% discipline; WALL-TIME ceilings get ~20-25%
headroom instead — they include remote-tunnel host round-trips whose
day-to-day jitter exceeds 5% (measured: total_eval_s moved 4.24 -> 4.43 s
between rounds with no code change), while the regressions the guard
exists to catch are multiples (losing the device-side ranking path alone
is 70x on metrics_s).

Prints one JSON line per section plus a final verdict line; exits nonzero
if any bound is violated, so a regression cannot land silently.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

# (direction, bound): "max" = measured value must be <= bound (wall times,
# latencies), "min" = measured value must be >= bound (throughputs).
GUARDS = {
    "TPU v5 lite": {
        "corpus.total_eval_s": ("max", 5.5),
        "corpus.rect_sim_s": ("max", 1.3),
        "corpus.metrics_s": ("max", 2.8),
        "serving.query_b1_p50_ms": ("max", 140.0),
        "serving.query_b32_qps": ("min", 165.0),
        "serving.concurrent_qps": ("min", 115.0),
    },
}


def main():
    import jax

    kind = jax.devices()[0].device_kind
    guards = GUARDS.get(kind)
    if guards is None:
        print(json.dumps({"metric": "eval_serving_guard", "device_kind": kind,
                          "status": "no guards for this device kind"}))
        return

    import bench_corpus_53k_tpu
    import bench_serving_tpu

    flat = {}
    for prefix, mod in (("corpus", bench_corpus_53k_tpu),
                        ("serving", bench_serving_tpu)):
        for k, v in mod.main().items():
            flat[f"{prefix}.{k}"] = v

    violations = []
    for key, (direction, bound) in guards.items():
        value = flat.get(key)
        if value is None:
            violations.append(f"{key}: metric missing from run")
        elif direction == "max" and value > bound:
            violations.append(f"{key}: {value} exceeds ceiling {bound}")
        elif direction == "min" and value < bound:
            violations.append(f"{key}: {value} below floor {bound}")

    record = {
        "metric": "eval_serving_guard",
        "device_kind": kind,
        "guarded": {k: flat.get(k) for k in guards},
        "violations": violations,
    }
    print(json.dumps(record))
    if violations:
        print("PERF REGRESSION (eval/serving): " + "; ".join(violations),
              file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
