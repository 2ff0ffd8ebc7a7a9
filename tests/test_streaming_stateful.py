"""Custom stateful streaming operator gate (§2.8): the per-host token
bucket's state survives micro-batch boundaries, and the cumulative stream
output equals the batch operator run over the union of all batches."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from delphi_crawler_spark.datagen import seed_urls_df
from delphi_crawler_spark.functions.canonicalize import canonicalize_url, with_url_keys
from delphi_crawler_spark.operators.politeness import assign_emission_slots
from delphi_crawler_spark.streaming.frontier_stream import SEED_SCHEMA
from delphi_crawler_spark.streaming.stateful import stateful_emission_slots


def _candidates(spark, n=600):
    cand = seed_urls_df(spark, n=n).withColumn("url", canonicalize_url("url")).filter(
        F.col("url").isNotNull()
    )
    # stream batches split on seq, so the per-host scheduling order must be
    # monotone in seq for the batch twin to apply (arrival order == schedule
    # order): pin priority and derive ts from seq
    cand = with_url_keys(cand).withColumn("priority", F.lit(0)).withColumn(
        "discovery_ts",
        F.lit("2024-01-01 00:00:00").cast("timestamp")
        + F.make_interval(secs=F.col("seq").cast("double")),
    )
    return cand.select("host", "url", "priority", "discovery_ts", "seq")


def test_stateful_bucket_continues_across_batches(spark, tmp_path):
    cand = _candidates(spark).orderBy("seq").persist()
    half = cand.count() // 2

    # two micro-batches in arrival (seq) order, one parquet FILE each (the
    # file source admits files, not spark part-directories)
    drop = tmp_path / "drop"
    os.makedirs(drop)
    pdf = cand.toPandas()
    pdf[pdf["seq"] < half].to_parquet(str(drop / "b0.parquet"), coerce_timestamps="us")
    pdf[pdf["seq"] >= half].to_parquet(str(drop / "b1.parquet"), coerce_timestamps="us")

    stream = (
        spark.readStream.schema(cand.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(drop))
    )
    q = (
        stateful_emission_slots(stream)
        .writeStream.format("memory")
        .queryName("bucket_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r.host, r.url): (r.host_rank, r.emit_ms)
        for r in spark.sql("SELECT * FROM bucket_out").collect()
    }
    # batch twin over the union: identical ranks + slots
    want = {
        (r.host, r.url): (r.host_rank, r.emit_ms)
        for r in assign_emission_slots(cand, politeness=None)
        .select("host", "url", "host_rank", "emit_ms")
        .collect()
    }
    cand.unpersist()
    assert got == want
    # state really crossed the boundary: some host present in both batches
    # must have a rank > its batch-0 count (i.e. continuation, not restart)
    assert len(got) == len(want) and max(r for r, _ in got.values()) > 1


def test_streaming_heavy_hitter_candidates(spark, tmp_path):
    """Bounded-state streaming MG sketch: across micro-batches, every true
    heavy hitter (count >= n/k) survives in the merged candidate set, no
    lower_bound exceeds the true count, and per-bucket state stays <= k."""
    import pandas as pd

    from delphi_crawler_spark.streaming.stateful import (
        streaming_heavy_hitter_candidates,
    )

    # deterministic skew: 2 hot keys at ~1/6 of rows each, ~200 cold keys
    rows = []
    for i in range(1200):
        key = f"hot{i % 2}" if i % 3 == 0 else f"cold{i % 199}"
        rows.append({"seq": i, "key": key})
    pdf = pd.DataFrame(rows)
    drop = tmp_path / "hhdrop"
    os.makedirs(drop)
    pdf[pdf["seq"] < 600].to_parquet(str(drop / "b0.parquet"))
    pdf[pdf["seq"] >= 600].to_parquet(str(drop / "b1.parquet"))

    stream = (
        spark.readStream.schema("seq long, key string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(drop))
    )
    k = 10
    q = (
        streaming_heavy_hitter_candidates(stream, "key", k=k, buckets=8)
        .writeStream.format("memory")
        .queryName("hh_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "hhckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    # final summaries = last update per (bucket, key): the memory sink keeps
    # every update row, so dedupe to the max lower_bound per key
    got = (
        spark.sql("SELECT key, max(lower_bound) AS lb FROM hh_out GROUP BY key")
        .toPandas()
        .set_index("key")["lb"]
        .to_dict()
    )
    true = pdf["key"].value_counts().to_dict()
    n = len(pdf)
    # every true heavy hitter present
    for key, cnt in true.items():
        if cnt * k >= n:
            assert key in got, key
    # no lower bound overshoots the true count
    for key, lb in got.items():
        assert lb <= true[key], key
    # bounded state: per bucket at most k counters in the final trigger
    per_bucket = spark.sql(
        "SELECT bucket, count(DISTINCT key) AS nk FROM hh_out GROUP BY bucket"
    ).collect()
    assert all(r["nk"] <= 2 * k for r in per_bucket)  # across-trigger union


def test_streaming_hist_segments_parity_with_batch(spark, tmp_path):
    """Streaming quantile-histogram sketch: after any prefix of micro-batches
    a group's state equals the batch segment over that prefix, and the final
    quantile read matches the batch pipeline exactly."""
    import pandas as pd

    from delphi_crawler_spark.operators.histsketch import (
        hist_quantiles,
        hist_segments,
    )
    from delphi_crawler_spark.streaming.stateful import streaming_hist_segments

    rows = []
    for i in range(4000):
        v = (i * 2654435761) % 123457
        rows.append(("g%d" % (i % 5), v, i))
    pdf = pd.DataFrame(rows, columns=["grp_in", "v", "seq"])

    drop = tmp_path / "hsdrop"
    os.makedirs(drop)
    half = 2000
    pdf[pdf["seq"] < half].to_parquet(str(drop / "b0.parquet"))
    pdf[pdf["seq"] >= half].to_parquet(str(drop / "b1.parquet"))

    stream = (
        spark.readStream.schema("grp_in string, v long, seq long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(drop))
    )
    q = (
        streaming_hist_segments(stream, "v", by="grp_in")
        .writeStream.format("memory")
        .queryName("hs_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "hsckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    out = spark.sql("SELECT * FROM hs_out")

    full = spark.createDataFrame(pdf)
    # final stream state (max-ver rows per group) == batch segment over all
    latest = spark.sql(
        """SELECT a.grp, a.bucket, a.cnt FROM hs_out a
           JOIN (SELECT grp AS g2, max(ver) AS mv FROM hs_out GROUP BY grp) b
             ON a.grp = b.g2 AND a.ver = b.mv"""
    )
    want = {
        tuple(r)
        for r in hist_segments(full, "v", by="grp_in").collect()
    }
    got = {tuple(r) for r in latest.collect()}
    assert got == want and len(got) > 10

    # prefix property: ver-1 rows of batch-0 groups == batch segment of b0
    b0 = spark.createDataFrame(pdf[pdf["seq"] < half])
    b0_grps = {r["grp_in"] for r in b0.select("grp_in").distinct().collect()}
    ver1 = {
        tuple(r)
        for r in out.where((F.col("ver") == 1) & F.col("grp").isin(b0_grps))
        .select("grp", "bucket", "cnt")
        .collect()
    }
    want0 = {tuple(r) for r in hist_segments(b0, "v", by="grp_in").collect()}
    assert ver1 == want0

    # quantile read off the stream's final segment == batch read
    sq = {
        tuple(r)
        for r in hist_quantiles(latest, [0.5, 0.99], by="grp_in").collect()
    }
    bq = {
        tuple(r)
        for r in hist_quantiles(
            hist_segments(full, "v", by="grp_in"), [0.5, 0.99], by="grp_in"
        ).collect()
    }
    assert sq == bq


def test_streaming_group_sample_parity_with_batch(spark, tmp_path):
    """Deterministic bottom-k reservoir: the cumulative streaming sample
    after 3 micro-batches equals the batch bottom-k over the union —
    byte-equal seqs per key — and state never exceeds k per key."""
    import pandas as pd

    from delphi_crawler_spark.streaming.stateful import (
        _gs_rank,
        streaming_group_sample,
    )

    rows = [{"seq": i, "key": f"g{i % 5}"} for i in range(900)]
    pdf = pd.DataFrame(rows)
    drop = tmp_path / "gsdrop"
    os.makedirs(drop)
    for b in range(3):
        pdf[(pdf["seq"] >= 300 * b) & (pdf["seq"] < 300 * (b + 1))].to_parquet(
            str(drop / f"b{b}.parquet")
        )

    stream = (
        spark.readStream.schema("seq long, key string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(drop))
    )
    k = 7
    q = (
        streaming_group_sample(stream, k=k)
        .writeStream.format("memory")
        .queryName("gs_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "gsckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got_rows = spark.sql(
        "SELECT key, seq, n_seen FROM gs_out"
    ).collect()
    # final snapshot per key = rows at that key's max n_seen
    max_seen: dict[str, int] = {}
    for r in got_rows:
        max_seen[r["key"]] = max(max_seen.get(r["key"], 0), r["n_seen"])
    final: dict[str, list[int]] = {}
    for r in got_rows:
        if r["n_seen"] == max_seen[r["key"]]:
            final.setdefault(r["key"], []).append(r["seq"])

    # batch twin: k smallest (md5(key|seq), seq) per key over the union
    expect: dict[str, list[int]] = {}
    for key in sorted({r["key"] for r in rows}):
        seqs = [r["seq"] for r in rows if r["key"] == key]
        ranked = sorted(seqs, key=lambda s: (_gs_rank(key, s), s))[:k]
        expect[key] = sorted(ranked)
    for key in expect:
        assert sorted(final[key]) == expect[key], key
        assert max_seen[key] == 180  # 900 rows / 5 keys
        assert len(final[key]) == k
