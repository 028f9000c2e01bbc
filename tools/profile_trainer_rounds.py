#!/usr/bin/env python
"""Trainer-round cost profile at REALISTIC dictionary sizes (r16-verdict
"Next round" item 5): the sf0.1 corpus normalizes to a 31-type word
dictionary, which makes wordpiece_train_merges / bpe_train_merges pure
job-overhead benchmarks — per-round wall is driver round-trip latency,
not row work. This tool synthesizes corpora whose NORMALIZED dictionary
is N distinct types (deterministic md5-derived a-z words, zipf-ish
frequency via id-ranges) and times the actual trainer loops over them,
so round 18 can see where a real dictionary spends its time:

- per-round wall at |dict| ∈ {31-native, 10k, 100k} (3 rounds each);
- the bounded collect's row count per round (must stay |symbols|²-ish,
  NOT dictionary-proportional — the design's driver-safety claim);
- total wall split into "first round" (plan + JIT) vs later rounds.

Writes one JSON line; redirect into plans/r17/.
Usage: python tools/profile_trainer_rounds.py [sizes...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from awscommunityday_2025_iceberg_snowfalke_spark.session import get_spark  # noqa: E402


def synth_docs(spark, n_types: int, out_dir: str, occ_per_type: int = 10):
    """documents table whose normalized dictionary is exactly n_types
    distinct lowercase words: word k = 8 md5 hex chars of k mapped to
    a-p (deterministic, no RNG state); each doc holds 20 words drawn so
    low ids repeat more (zipf-ish head)."""
    n_docs = n_types * occ_per_type // 20
    i = F.col("id")
    words = []
    for j in range(20):
        # skewed type pick: (id*20+j) hashed, squared-fraction → head-heavy
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"w{j}_"), i.cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("double") / float(0xFFFFFFFF)
        # uniform type pick: ~20 expected draws per type, so essentially
        # every type is sampled (P(miss) ≈ e^-20) and the dictionary hits
        # its target size; a zipf head would just undersample the tail
        t = (h * n_types).cast("long")
        words.append(
            F.translate(
                F.substring(F.md5(t.cast("string")), 1, 8),
                "0123456789abcdef",
                "abcdefghijklmnop",
            )
        )
    df = spark.range(0, max(n_docs, 1), 1, 32).select(
        i.alias("doc_id"),
        F.lit("en").alias("lang"),
        F.lit("synth").alias("source"),
        F.concat_ws(" ", *words).alias("text"),
        F.lit(0).alias("n_chars"),
    )
    df.write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))


def profile(spark, sf_dir: str, rounds: int = 3) -> dict:
    from awscommunityday_2025_iceberg_snowfalke_spark.operators import textstats as T

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_types = docs.select(
        F.explode(
            F.filter(
                F.split(
                    F.regexp_replace(F.lower(F.col("text")), "[^a-z ]", " "),
                    " ",
                ),
                lambda w: w != F.lit(""),
            )
        ).alias("w")
    ).agg(F.countDistinct("w")).collect()[0][0]

    t0 = time.perf_counter()
    merges = T._wp_train(spark, sf_dir, rounds)
    wall = time.perf_counter() - t0
    return {
        "n_types": int(n_types),
        "rounds": rounds,
        "n_merges": len(merges),
        "wall_sec": round(wall, 2),
        "sec_per_round": round(wall / max(rounds, 1), 2),
    }


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [10_000, 100_000]
    spark = get_spark(app_name="trainer_profile")
    out = {"sf01_native": None, "synthetic": []}

    from awscommunityday_2025_iceberg_snowfalke_spark.operators import textstats as T

    # session warmup (JIT/codegen) so the first measured row isn't cold
    T._wp_train(spark, "/root/testdata/sf0.1", 1)

    # native sf0.1 (31-type dictionary) for the comparison row
    t0 = time.perf_counter()
    m = T._wp_train(spark, "/root/testdata/sf0.1", 3)
    out["sf01_native"] = {
        "n_types": 31,
        "rounds": 3,
        "wall_sec": round(time.perf_counter() - t0, 2),
        "sec_per_round": round((time.perf_counter() - t0) / 3, 2),
        "n_merges": len(m),
    }

    for n in sizes:
        d = tempfile.mkdtemp(prefix=f"trainerprof_{n}_")
        try:
            synth_docs(spark, n, d)
            out["synthetic"].append(profile(spark, d, rounds=3))
        finally:
            shutil.rmtree(d, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
