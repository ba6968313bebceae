"""Warm-session wall timing for the late-round-5 operators at one sf dir.

Usage: python tools/bench_late.py /root/repo/data/sf3.0
Prints one JSON line {"sf_dir": ..., "walls": {query: seconds}} — the
numbers behind BENCH/BASELINE.md's "Late-round-5 operators" table.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eventflux_engine_spark.session import get_spark  # noqa: E402

NAMES = [
    "events_hll_distinct",
    "multimodal_png_palette",
    "multimodal_png_interlaced",
    "events_cms_topk",
    "dedup_substring_spans",
    "events_bloom_prune_join",
    "events_quantile_histogram",
    "dedup_incremental_probe",
    "curation_pipeline_e2e",
    "events_gapfill_locf",
    "events_pivot_type_matrix",
    "events_unpivot_metrics",
    "events_zorder_layout",
    "curation_exact_k_sample",
]


def main() -> None:
    from __spark_entry__ import queries

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="bench_late")
    qs = queries()
    qs["group_agg_all"](spark, sf_dir).count()  # warm
    walls = {}
    for n in NAMES:
        t0 = time.time()
        qs[n](spark, sf_dir).count()
        walls[n] = round(time.time() - t0, 2)
    print(json.dumps({"sf_dir": sf_dir, "walls": walls}))


if __name__ == "__main__":
    main()
