"""Dump .explain("formatted") for the bench's query DataFrames to
plans/r06/<query>_<tag>.txt (judge evidence for OPTIMIZATION_r06.md).

Usage: python tools/dump_plans.py before [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import bench
from pyspark.sql import functions as F


def query_frames(spark, transcripts):
    """name -> DataFrame mirroring bench.headline_queries bodies (the
    frames the thunks count), for plan capture only."""
    from pdf_ocr_api_spark import conversation, fixtures, pipeline
    from pdf_ocr_api_spark.ops import classify, dedup, domains, repetition, similarity
    from pdf_ocr_api_spark.ops import substrings, textstats, training
    from pdf_ocr_api_spark.ops.training import portable_hash

    SF_DIR = bench.SF_DIR
    frames = {}
    frames["extract"] = lambda: pipeline.extract_transcripts(transcripts)
    frames["extract_text_only"] = lambda: pipeline.extract_transcripts(
        transcripts, with_services=False
    )

    def conv():
        ext = pipeline.extract_transcripts(transcripts).select(
            "conv_id", "turn_idx", "kind", "doc_text", "services"
        )
        tipo = conversation.tipo_dim_df(spark, fixtures.DEPARA_RAW["tipoCertidao"])
        return conversation.conversation_records(ext, tipo)

    frames["conversation"] = conv

    def minhash():
        d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        return dedup.minhash_lsh_pairs(d, num_hashes=32, bands=8, parallelism=4 * bench.CPUS)

    frames["minhash_lsh"] = minhash

    def simhash():
        d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        return dedup.simhash_near_pairs(dedup.simhash64(d), max_hamming=3)

    frames["simhash"] = simhash

    def quality():
        d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        return textstats.quality_features(d)

    frames["quality"] = quality

    def repet():
        d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        return repetition.repetition_filter(d)

    frames["repetition"] = repet

    def substr():
        t2 = transcripts.withColumn(
            "tid", F.concat_ws("#", "conv_id", F.col("turn_idx").cast("string"))
        )
        return substrings.dedup_substrings(t2, text_col="text", id_col="tid", width=25)

    frames["substring_dedup"] = substr

    def train_q():
        t = transcripts.withColumn(
            "n_tok", F.size(F.split(F.coalesce(F.col("text"), F.lit("")), r"\s+"))
        )
        tr = training.assign_splits(t, {"train": 0.95, "val": 0.05}, key_col="conv_id")
        return training.pack_sequences(
            tr.filter(F.col("split") == "train"),
            "n_tok", budget=2048, key_cols=["conv_id", "turn_idx"],
        )

    frames["training_assembly"] = train_q

    def domain_q():
        t = transcripts.select(
            F.concat_ws("#", "conv_id", F.col("turn_idx").cast("string")).alias("tid"),
            F.concat(
                F.lit("site"),
                (portable_hash(F.col("conv_id"), "dom") % 500).cast("string"),
            ).alias("source"),
            "text",
        )
        seed = t.filter(portable_hash(F.col("tid"), "seed") % 29 == 0).select(
            F.when(F.length("text") > 200, "good").otherwise("bad").alias("label"),
            "text",
        )
        model = classify.train_nb(seed)
        capped = domains.cap_per_domain(t, 100, key_col="tid")
        return classify.classify_filter(capped, model, "good", id_col="tid")

    frames["domain_quality"] = domain_q
    return frames


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    spark = bench.build_session(bench.CPUS)
    transcripts = bench.bench_transcripts(spark, bench.BENCH_CONVS)
    out_dir = REPO / "plans" / "r06"
    out_dir.mkdir(parents=True, exist_ok=True)
    for name, thunk in query_frames(spark, transcripts).items():
        if only and name not in only:
            continue
        df = thunk()
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{tag}.txt").write_text(plan)
        print(f"wrote {name}_{tag}.txt ({plan.count('Exchange')} Exchange)")
    spark.stop()


if __name__ == "__main__":
    main()
