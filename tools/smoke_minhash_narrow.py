"""Scale smoke for the minhash pair-grain switch (round 18): on a
multi-million-row near-dup flood, the NARROW pair shape (candidate join
+ pair-dedup over (band, bucket, _id), signatures re-attached at
unique-pair grain) must (a) be results-identical to the wide shape,
(b) WIN on wall-clock, and (c) be what ``pair_grain="auto"`` picks for
an input this size — while auto stays "wide" at bench SF (pinned by
``test_minhash_pair_grain_narrow_matches_wide`` and the unchanged q11
plan).

A/B methodology: interleaved wide/narrow/wide/narrow noop-sink runs
(min-of-2 each) on the same session, so box drift cannot fake a win.
Equality: exact pair count + an order-insensitive xxhash64 fold over
(id_a, id_b, jaccard_est) — collect-free at any scale.

Usage: python tools/smoke_minhash_narrow.py [multiplier] [sf_dir]
Default multiplier 200 -> ~1M docs from the sf0.1 corpus (5k base docs
x 200 near-dup copies: every base doc becomes a 200-member flood, the
regime max_bucket_size exists for).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.dedup import (
        _pair_grain_decision,
        _plan_size_bytes,
        minhash_lsh_pairs,
    )
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.session import get_spark, load

    spark = get_spark("smoke-minhash-narrow")
    base = load(spark, sf_dir, "documents")

    # mult near-dup copies, written UNCOMPRESSED so the file-size
    # estimate Catalyst feeds the auto switch reflects the text volume
    # (the flood corpus is pathologically compressible; a production
    # corpus is not).
    docs_path = f"/tmp/smoke_minhash_narrow_{mult}x"
    if not os.path.exists(docs_path):
        copies = [
            base.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                F.concat(F.col("text"), F.lit(f" copymark{i}")).alias("text"),
            )
            for i in range(mult)
        ]
        d = copies[0]
        for c in copies[1:]:
            d = d.unionByName(c)
        d.repartition(64).write.mode("overwrite").option(
            "compression", "none"
        ).parquet(docs_path)
    docs = spark.read.parquet(docs_path)
    n_docs = docs.count()

    est = _plan_size_bytes(docs)
    auto = _pair_grain_decision(docs, "auto", 256 << 20)
    print(
        f"n_docs={n_docs} est_bytes={est} "
        f"auto_decision_at_default_threshold={auto}",
        file=sys.stderr,
    )

    kw = dict(
        num_hashes=64, bands=16, threshold=0.5, max_bucket_size=64,
    )

    def run(grain: str) -> float:
        spark.sparkContext.setJobDescription(f"minhash pairs [{grain}]")
        t0 = time.time()
        minhash_lsh_pairs(
            docs, "doc_id", "text", pair_grain=grain, **kw
        ).write.format("noop").mode("overwrite").save()
        spark.sparkContext.setJobDescription(None)
        return round(time.time() - t0, 2)

    # warm both paths once (worker pools, code paths) before timing
    tiny = docs.limit(2000).localCheckpoint()
    for g in ("wide", "narrow"):
        minhash_lsh_pairs(tiny, "doc_id", "text", pair_grain=g, **kw).write.format(
            "noop"
        ).mode("overwrite").save()

    times: dict[str, list[float]] = {"wide": [], "narrow": []}
    for _ in range(2):  # interleaved A/B, min-of-2
        times["wide"].append(run("wide"))
        times["narrow"].append(run("narrow"))

    def digest(grain: str):
        p = minhash_lsh_pairs(docs, "doc_id", "text", pair_grain=grain, **kw)
        row = p.agg(
            F.count("*").alias("n"),
            F.sum(
                F.xxhash64(
                    F.col("id_a"),
                    F.col("id_b"),
                    F.format_number(F.col("jaccard_est"), 6),
                )
            ).alias("h"),
        ).head()
        return (row["n"], row["h"])

    dw, dn = digest("wide"), digest("narrow")
    out = {
        "n_docs": n_docs,
        "est_input_bytes": est,
        "auto_decision": auto,
        "wide_sec": min(times["wide"]),
        "narrow_sec": min(times["narrow"]),
        "samples": times,
        "speedup": round(min(times["wide"]) / max(min(times["narrow"]), 1e-9), 2),
        "pairs_wide": {"n": dw[0], "hash": dw[1]},
        "pairs_narrow": {"n": dn[0], "hash": dn[1]},
        "identical": dw == dn,
    }
    print(json.dumps(out))
    assert dw == dn, "narrow output diverged from wide"


if __name__ == "__main__":
    main()
