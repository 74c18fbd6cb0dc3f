"""Adversarial boilerplate probe for the LSH band-bucket cap (VERDICT r8
"What's wrong" #2 / "Next round" #3).

Builds corpora where a growing fraction is ONE boilerplate template (the
100 TB failure mode: identical ToS/footer documents all landing in the
same band buckets) and measures, at 1x and ``factor``x flood size:

- uncapped candidate pairs: grows ~quadratically in the flood
  (f*(f-1)/2 per band bucket),
- capped candidate pairs (max_bucket=100): the flooded buckets are
  dropped, so candidates stay bounded by the organic corpus — ~constant,
- wall time of the full capped pipeline: ~linear in corpus size.

Writes LSH_ADVERSARIAL.json. Candidate counts are computed from the
banded frame directly (the join input that drives cost), so the probe is
exact and cheap; the uncapped count at 5x is derived without executing
the quadratic join itself (sum over bucket sizes of c*(c-1)/2 — what the
join WOULD emit pre-distinct), because actually running it is the
explosion this cap exists to prevent.

Usage: python tools/lsh_adversarial_probe.py [--factor 5]
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from faers_datalakehouse_spark.operators.dedup import (  # noqa: E402
    minhash_lsh_pairs,
    signature_bands,
)
from faers_datalakehouse_spark.session import get_spark  # noqa: E402

BOILER = (
    "terms of service apply to all users of this website please read "
    "carefully before continuing to browse these pages thank you kindly "
    "all rights reserved contact the webmaster for further information"
)


def corpus(spark, flood: int, organic_src: str):
    docs = spark.read.parquet(organic_src).select("doc_id", "text")
    max_id = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    floodf = spark.range(flood).select(
        (F.col("id") + max_id).alias("doc_id"), F.lit(BOILER).alias("text")
    )
    return docs.unionByName(floodf).repartition(32).persist()


def bucket_pair_sum(banded, cap: int | None) -> int:
    """Sum over band buckets of c*(c-1)/2 — the exact pre-distinct pair
    count the band self-join emits (with the cap's buckets excluded)."""
    sizes = banded.groupBy("band", "band_hash").agg(
        F.count(F.lit(1)).alias("c")
    )
    if cap is not None:
        sizes = sizes.filter(F.col("c") <= cap)
    row = sizes.agg(
        F.sum(F.expr("c * (c - 1) div 2")).alias("pairs")
    ).collect()[0]
    return int(row["pairs"] or 0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=5)
    ap.add_argument("--flood", type=int, default=2000)
    ap.add_argument(
        "--src", default="/root/testdata/sf0.01/documents.parquet"
    )
    args = ap.parse_args()

    spark = get_spark("lsh_adversarial")
    out = {"factor": args.factor, "cap": 100, "points": {}}
    for label, flood in (("1x", args.flood), (f"{args.factor}x", args.flood * args.factor)):
        df = corpus(spark, flood, args.src)
        _, banded = signature_bands(df, materialize=False)
        banded = banded.persist()
        uncapped = bucket_pair_sum(banded, None)
        capped = bucket_pair_sum(banded, 100)
        t0 = time.time()
        n_out = minhash_lsh_pairs(
            df, threshold=0.5, max_bucket=100
        ).count()
        wall = time.time() - t0
        out["points"][label] = {
            "flood_docs": flood,
            "uncapped_join_pairs": uncapped,
            "capped_join_pairs": capped,
            "capped_pipeline_sec": round(wall, 2),
            "capped_output_pairs": n_out,
        }
        print(label, out["points"][label])
        banded.unpersist()
        df.unpersist()
        spark.catalog.clearCache()

    p1 = out["points"]["1x"]
    pf = out["points"][f"{args.factor}x"]
    out["uncapped_pair_exponent"] = round(
        math.log(max(pf["uncapped_join_pairs"], 1) / max(p1["uncapped_join_pairs"], 1))
        / math.log(args.factor),
        2,
    )
    out["capped_pair_exponent"] = round(
        math.log(max(pf["capped_join_pairs"], 1) / max(p1["capped_join_pairs"], 1))
        / math.log(args.factor),
        2,
    )
    out["capped_wall_exponent"] = round(
        math.log(pf["capped_pipeline_sec"] / p1["capped_pipeline_sec"])
        / math.log(args.factor),
        2,
    )
    Path(__file__).resolve().parent.parent.joinpath(
        "LSH_ADVERSARIAL.json"
    ).write_text(json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
