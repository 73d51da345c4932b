#!/usr/bin/env python
"""Generate a 10x scaling-rehearsal dataset at .benchdata/sf1 from the
driver's sf0.1 tables (round-5 verdict #7).

This data exists ONLY to measure how query wall-time scales with input
size (sf0.1 -> sf1 should be ~linear for scale-correct plans); it is
NOT oracle-verified and never feeds CORRECTNESS. Ten replicas of each
fact table with key offsets keep join relationships intact within a
replica; dimension tables (nation, region) stay single-copy, mirroring
how TPC-H scales.

Per-replica perturbations keep the data shape honest instead of
manufacturing pathologies the operators would rightly choke on:

- documents: replica r rotates the text's vowels r times (translate —
  token sizes and counts unchanged) so replicas are NOT near-duplicates
  of each other; otherwise every dedup/overlap query would see 10-deep
  duplicate groups and the pair fan-out would grow quadratically — a
  data artifact, not an operator regression.
- embeddings: replica r cyclically rotates the component order by r —
  norms and the component distribution are EXACTLY preserved while
  cross-replica cosine decorrelates (an epsilon shift, tried first,
  left replicas cosine~1 near-duplicates of each other and inflated
  every near-dup/kNN measurement ~10-deep).
- events/orders/lineitem/customer/supplier/part: key columns offset by
  r * 10^9 (ids stay bigint-safe and join-consistent); value columns
  untouched so aggregates keep their distributions.

Usage: python scripts/make_sf1.py  (writes ~6M lineitem rows, ~1 min)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cig_etl_s3_to_sql_data_ingestor_spark.session import get_spark

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".benchdata",
    "sf1",
)
N_REPLICAS = 10
OFF = 1_000_000_000

KEY_COLS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["nation", "region"]

VOWELS = "aeiou"
CONSONANTS = "nrtls"  # high-frequency consonants: second rotation axis


def _rotate_vowels(col, r: int):
    """Distinct per-replica letter substitution for all r in 1..9: the
    vowel rotation alone has period 5 (replica 5 would be byte-identical
    to replica 0 — exactly the cross-replica duplicate artifact this
    script exists to avoid), so replicas 5+ additionally rotate a
    consonant set (period 5 x 2 covers N_REPLICAS=10)."""
    rv = r % 5
    out = F.translate(
        col,
        VOWELS + VOWELS.upper(),
        VOWELS[rv:] + VOWELS[:rv] + (VOWELS[rv:] + VOWELS[:rv]).upper(),
    )
    rc = (r // 5) % 5
    if rc:
        out = F.translate(
            out,
            CONSONANTS + CONSONANTS.upper(),
            CONSONANTS[rc:] + CONSONANTS[:rc]
            + (CONSONANTS[rc:] + CONSONANTS[:rc]).upper(),
        )
    return out


def main() -> None:
    spark = get_spark(app_name="make-sf1")
    os.makedirs(OUT, exist_ok=True)
    for t in DIMS:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{OUT}/{t}.parquet")
        print(f"{t}: copied")
    for t, keys in KEY_COLS.items():
        base = spark.read.parquet(f"{SRC}/{t}.parquet")
        parts = []
        for r in range(N_REPLICAS):
            rep = base
            for k in keys:
                rep = rep.withColumn(k, F.col(k) + F.lit(r * OFF))
            if t == "documents" and r:
                rep = rep.withColumn("text", _rotate_vowels(F.col("text"), r))
            if t == "embeddings" and r:
                rep = rep.withColumn(
                    "embedding",
                    F.concat(
                        F.slice(F.col("embedding"), r + 1, 10_000),
                        F.slice(F.col("embedding"), 1, r),
                    ),
                )
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{OUT}/{t}.parquet")
        print(f"{t}: x{N_REPLICAS}")
    print(f"sf1 rehearsal data at {OUT}")


if __name__ == "__main__":
    main()
