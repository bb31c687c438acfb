"""Structured Streaming ingest: micro-batch extraction == batch bytes."""

import pytest
from pyspark.sql import functions as F

from pdf_ocr_api_spark import fixtures, pipeline
from pdf_ocr_api_spark.streaming import stream as S


def test_stream_drain_matches_batch(spark, depara, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    pdf = fixtures.fixture_frame(10)
    sdf = spark.createDataFrame(pdf).withColumn("turn_idx", F.col("turn_idx").cast("int"))
    sdf.repartition(4).write.parquet(src)

    q = S.start_extraction_stream(spark, src, out, ckpt, depara, available_now=True)
    q.awaitTermination(300)

    got = (
        spark.read.parquet(out)
        .select("conv_id", "turn_idx", "kind", "clean_text")
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    want = (
        pipeline.extract_transcripts(spark.read.parquet(src), depara)
        .select("conv_id", "turn_idx", "kind", "clean_text")
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    assert got.equals(want)
    assert len(got) == len(pdf)


def test_stream_resume_is_exactly_once(spark, depara, tmp_path):
    """Second drain with the same checkpoint must add no rows; new files
    are picked up incrementally."""
    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame(fixtures.fixture_frame(5)).withColumn(
        "turn_idx", F.col("turn_idx").cast("int")
    ).write.parquet(str(src))
    q = S.start_extraction_stream(spark, str(src), out, ckpt, depara, available_now=True)
    q.awaitTermination(300)
    n1 = spark.read.parquet(out).count()

    # drain again — no new input, no new rows
    q = S.start_extraction_stream(spark, str(src), out, ckpt, depara, available_now=True)
    q.awaitTermination(300)
    assert spark.read.parquet(out).count() == n1

    # add files → only the delta is processed
    extra = fixtures.fixture_frame(8)
    extra = extra[extra.conv_id > "conv-000004"]
    spark.createDataFrame(extra).withColumn(
        "turn_idx", F.col("turn_idx").cast("int")
    ).write.mode("append").parquet(str(src))
    q = S.start_extraction_stream(spark, str(src), out, ckpt, depara, available_now=True)
    q.awaitTermination(300)
    n2 = spark.read.parquet(out).count()
    assert n2 == n1 + len(extra)


def _drain(df_stream, spark, name):
    q = (
        df_stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.sql(f"SELECT * FROM {name}")


def test_stateful_sessionize_stream_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionization must equal the batch
    lag+running-sum window, with state carried ACROSS micro-batches
    (maxFilesPerTrigger=1 forces one batch per file)."""
    import pandas as pd

    from pdf_ocr_api_spark.streaming import stateful

    src = tmp_path / "sess_src"
    rows = []
    base = pd.Timestamp("2025-01-01 00:00:00")
    for conv in ("a", "b"):
        t = base
        for i in range(30):
            # gaps > 30 min every 7th turn open a new session
            t = t + pd.Timedelta(minutes=45 if i % 7 == 0 and i else 3)
            rows.append((conv, i, t))
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "ts"])
    ddl = "conv_id STRING, turn_idx INT, ts TIMESTAMP"
    sdf = spark.createDataFrame(pdf, ddl)
    # 3 files in turn order → 3 micro-batches crossing session boundaries
    for k in range(3):
        part = pdf[(pdf.turn_idx >= k * 10) & (pdf.turn_idx < (k + 1) * 10)]
        spark.createDataFrame(part, ddl).coalesce(1).write.mode("append").parquet(str(src))

    stream = (
        spark.readStream.schema("conv_id STRING, turn_idx INT, ts TIMESTAMP")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    got = (
        _drain(stateful.sessionize_stream(stream), spark, "sess_out")
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )

    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    prev = F.lag("ts").over(w)
    flag = F.when(prev.isNull() | (F.col("ts") > prev + F.expr("INTERVAL 30 MINUTES")), 1).otherwise(0)
    sess = F.sum(flag).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    want = (
        sdf.select("conv_id", "turn_idx", sess.cast("int").alias("session_id"))
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    assert got[["conv_id", "turn_idx", "session_id"]].equals(want)
    assert got.session_id.max() >= 4  # sessions actually split


def test_stateful_category_inheritance_matches_twin(spark, tmp_path):
    """Streaming A4 inheritance must equal the byte-parity Python twin
    (preencher_categoria) over the ordered rows, with the carried
    category crossing micro-batch boundaries."""
    import pandas as pd

    from pdf_ocr_api_spark.extract.document import preencher_categoria
    from pdf_ocr_api_spark.streaming import stateful

    src = tmp_path / "cat_src"
    svcs = []
    for conv in ("c1", "c2"):
        for i in range(24):
            if i % 8 == 0:
                svcs.append((conv, i, 0, None, None, f"CATEGORIA {conv}-{i} - obras", None, None))
            else:
                svcs.append((conv, i, 0, str(i), None, f"servico {i}", 1, f"{i},0"))
    cols = ["conv_id", "turn_idx", "svc_idx", "Item", "Categoria", "Descricao", "Unidade", "Quantidade"]
    pdf = pd.DataFrame(svcs, columns=cols)
    ddl = ("conv_id STRING, turn_idx INT, svc_idx INT, Item STRING, Categoria STRING, "
           "Descricao STRING, Unidade INT, Quantidade STRING")
    for k in range(3):  # batch boundary at turns 8/16 — mothers carried across
        part = pdf[(pdf.turn_idx >= k * 8) & (pdf.turn_idx < (k + 1) * 8)]
        spark.createDataFrame(part, ddl).coalesce(1).write.mode("append").parquet(str(src))

    stream = (
        spark.readStream.schema(ddl).option("maxFilesPerTrigger", 1).parquet(str(src))
    )
    got = (
        _drain(stateful.inherit_category_stream(stream), spark, "cat_out")
        .orderBy("conv_id", "turn_idx", "svc_idx")
        .toPandas()
    )

    for conv in ("c1", "c2"):
        ordered = pdf[pdf.conv_id == conv].sort_values(["turn_idx", "svc_idx"])
        twin_rows = [
            {"Item": r.Item, "Categoria": r.Categoria, "Descricao": r.Descricao,
             "Unidade": r.Unidade, "Quantidade": r.Quantidade}
            for r in ordered.itertuples()
        ]
        want = [s["Categoria"] for s in preencher_categoria(twin_rows)]
        g = got[got.conv_id == conv]
        assert [c if c == c else None for c in g.Categoria] == want, conv
        # qty counter is the A6 running count of quantity-bearing rows
        has_qty = ordered.Quantidade.notna().to_numpy()
        assert g.qty_counter.tolist() == list(has_qty.cumsum())


def test_throughput_monitor_windows(spark, tmp_path):
    """Watermarked 1-minute windowed rollup over the stream: turn counts
    per window match the batch groupBy, late rows within the watermark
    are still aggregated (append mode emits closed windows)."""
    import pandas as pd

    src = tmp_path / "mon_src"
    rows = []
    base = pd.Timestamp("2025-03-01 08:00:00")
    for i in range(120):
        rows.append(("m0", i, "user", f"texto {i}", None, base + pd.Timedelta(seconds=30 * i)))
    ddl = "conv_id STRING, turn_idx INT, role STRING, text STRING, tool STRING, ts TIMESTAMP"
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    spark.createDataFrame(pdf, ddl).coalesce(1).write.parquet(str(src))

    stream = (
        spark.readStream.schema(ddl).option("maxFilesPerTrigger", 1).parquet(str(src))
    )
    q = (
        S.throughput_monitor(stream)
        .writeStream.format("memory")
        .queryName("mon_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        r.window_start: r.turns
        for r in spark.sql("SELECT * FROM mon_out").collect()
    }
    want = {
        r.ws: r.n
        for r in spark.read.parquet(str(src))
        .groupBy(F.window("ts", "1 minute").alias("win"))
        .agg(F.count("*").alias("n"))
        .select(F.col("win.start").alias("ws"), "n")
        .collect()
    }
    # append mode withholds windows still inside the watermark — every
    # EMITTED window must match the batch rollup, and most must emit
    assert got, "no windows emitted"
    for ws, n in got.items():
        assert want[ws] == n, ws
    assert len(got) >= len(want) - 11  # 10-min watermark holds back the tail


def test_gated_corpus_stream_matches_batch(spark, depara, tmp_path):
    """The corpus quality/lang/token gates are stateless and must
    produce identical rows streamed vs batch (the streaming half of
    clean_corpus; dedup stays the batch compaction stage)."""
    src = str(tmp_path / "gsrc")
    out = str(tmp_path / "gout")
    ckpt = str(tmp_path / "gckpt")

    pdf = fixtures.fixture_frame(10)
    sdf = spark.createDataFrame(pdf).withColumn("turn_idx", F.col("turn_idx").cast("int"))
    sdf.repartition(4).write.parquet(src)

    stream = S.gate_stream(
        S.extract_stream(S.read_transcript_stream(spark, src), depara),
        min_quality=0.3, min_tokens=3,
    ).select("conv_id", "turn_idx", "clean_text", "lang", "n_tokens", "quality_score")
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = spark.read.parquet(out).orderBy("conv_id", "turn_idx").toPandas()
    want = (
        S.gate_stream(
            pipeline.extract_transcripts(spark.read.parquet(src), depara),
            min_quality=0.3, min_tokens=3,
        )
        .select("conv_id", "turn_idx", "clean_text", "lang", "n_tokens", "quality_score")
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    assert got.equals(want)
    assert 0 < len(got) <= len(pdf)


def test_stateful_sessionize_null_ts(spark, tmp_path):
    """NULL ts rows must not open spurious sessions nor poison carried
    state — mirroring the batch lag semantics (null comparison → no
    split)."""
    import pandas as pd

    from pdf_ocr_api_spark.streaming import stateful

    base = pd.Timestamp("2025-01-01 00:00:00")
    rows = [
        ("c", 0, base),
        ("c", 1, pd.NaT),                              # null ts mid-stream
        ("c", 2, base + pd.Timedelta(minutes=3)),
        ("c", 3, base + pd.Timedelta(minutes=45)),     # real gap -> new session
        ("c", 4, pd.NaT),
        ("c", 5, base + pd.Timedelta(minutes=48)),
    ]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "ts"])
    src = str(tmp_path / "nats")
    spark.createDataFrame(pdf, "conv_id STRING, turn_idx INT, ts TIMESTAMP").coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("conv_id STRING, turn_idx INT, ts TIMESTAMP").parquet(src)
    out = str(tmp_path / "nat_out")
    q = (
        stateful.sessionize_stream(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "nat_ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {r.turn_idx: r.session_id for r in spark.read.parquet(out).collect()}
    # turn 0 opens session 1; NaT turns never split; 45-min gap at turn 3
    # opens session 2; turn 5 follows a NaT (null comparison -> no split)
    assert got == {0: 1, 1: 1, 2: 1, 3: 2, 4: 2, 5: 2}, got


def test_incremental_corpus_stream_matches_full(spark, tmp_path):
    """Two drained micro-batch rounds of the incremental-corpus stream
    must leave the stored corpus equal to a full clean_corpus over all
    input — cross-batch near-dup and exact-dup turns planted — and the
    signature index row-consistent with the corpus."""
    from pdf_ocr_api_spark.ops import corpus

    base = ("the quick brown fox jumps over the lazy dog and runs across the river "
            "bank to find the other animals in the quiet green forest of the north")
    uniq = ("the cat and the dog of the house are in the garden near the "
            "old stone wall where the birds sing in the morning light")
    schema = ("conv_id STRING, turn_idx INT, role STRING, text STRING, "
              "tool STRING, ts TIMESTAMP")
    b1 = spark.createDataFrame(
        [("a0", 0, "user", base, None, None),
         ("a0", 1, "user", base.replace("green", "dark"), None, None),
         ("a1", 0, "user", uniq, None, None)], schema)
    b2 = spark.createDataFrame(
        [("b0", 0, "user", base.replace("quick", "swift"), None, None),
         ("b0", 1, "user", uniq, None, None),
         ("b1", 0, "user", "entirely new unique content about deep sea creatures and "
                            "their glowing light organs in the dark water", None, None)], schema)

    src = str(tmp_path / "src")
    root = str(tmp_path / "corpus_root")
    ckpt = str(tmp_path / "ckpt")
    kw = dict(min_quality=0.3, min_tokens=5, dedup_threshold=0.6, parallelism=4)

    b1.write.parquet(src)
    q = S.start_incremental_corpus_stream(spark, src, root, ckpt, available_now=True, **kw)
    q.awaitTermination(300)
    b2.write.mode("append").parquet(src)
    q = S.start_incremental_corpus_stream(spark, src, root, ckpt, available_now=True, **kw)
    q.awaitTermination(300)

    stored = spark.read.parquet(f"{root}/corpus")
    full = corpus.clean_corpus(b1.unionByName(b2).drop("ts"), **kw)
    key = lambda rows: sorted((r.conv_id, r.turn_idx, r.clean_text) for r in rows)
    assert key(stored.collect()) == key(full.collect())
    got = {(r.conv_id, r.turn_idx) for r in stored.collect()}
    assert ("b0", 0) not in got and ("b0", 1) not in got  # cross-batch dups dropped
    assert ("b1", 0) in got
    sigs = spark.read.parquet(f"{root}/signatures")
    assert sigs.count() == stored.count()
    runs = spark.read.parquet(f"{root}/runs").collect()
    assert sorted(r.mode for r in runs) == ["stream_bootstrap", "stream_incremental"]
