"""The crawl round — the reference's discovery pipeline as one DataFrame DAG.

Reference plan (MavenDiscoveryProcess.scala:64-103, the live semantics):

    source -> dedup-filter -> exists-filter -> throttle -> [take]
           -> alsoTo(store) -> mapAsync(download) -> successFilter
           -> mapAsync(analyze) -> successFilter -> alsoTo(store) -> Sink

Ours is the same dataflow as **iterated batch over snapshot tables**
(SURVEY.md §7.0): each round is

    pending frontier -> politeness slots (P1/P6) -> round admission
      -> schedule table append (the emitted fetch ordering, P3)
      -> frontier MERGE state='fetched' (the seen set, S4)
      -> fetch (deterministic URL->doc join over the docs corpus — the
         sandbox stand-in for the HTTP fetch UDF, S3)
      -> link extraction in span order (the POM-dependency analogue)
      -> canonicalize -> robots gate -> F1 dedup -> bloom-prefiltered
         anti-join vs frontier (F2/J1) -> frontier append state='pending'
      -> per-partition metrics append (A5) -> checkpoint row (LAST)

Every emitted ordering is a total order with the ``seq`` tiebreak, so the
output is byte-identical at any parallelism level; every sink is a keyed
snapshot commit, and the checkpoint row is written last, so a killed run
resumes exactly (reference restart semantics, IndexProcessing.scala:36-41,
upgraded from lossy to exact).

Scale notes (100 TB / 10^10 URLs):
- the frontier table is partitioned by host buckets; politeness windows
  shuffle once on host; the hot-host fan-out for per-row compute goes
  through ``salting.salted_repartition`` while final emission order is
  re-established by explicit sort keys;
- the seen-set anti-join is bloom-prefiltered: steady-state discovered
  links are mostly bloom-negative (no shuffle) or true-seen (dropped);
- the fetch join is an equi-join on the doc key — at production scale the
  docs side is the fetched-content store, bucketed on the same key, so the
  join is shuffle-free on one side; in sandbox it broadcast-joins.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from delphi_crawler_spark.functions.canonicalize import canonicalize_url, with_url_keys
from delphi_crawler_spark.operators.aggs import partition_metrics
from delphi_crawler_spark.operators.dedup import first_occurrence_dedup
from delphi_crawler_spark.operators.links import extract_links
from delphi_crawler_spark.operators.politeness import (
    admit_round,
    assign_emission_slots,
    emission_order,
)
from delphi_crawler_spark.operators.robots import robots_filter
from delphi_crawler_spark.operators.seen import build_bloom, seen_anti_join
from delphi_crawler_spark.storage.tablestore import TableStore

FRONTIER = "frontier"
SCHEDULE = "schedule"
METRICS = "metrics"


@dataclass
class CrawlConfig:
    round_ms: int = 10_000
    limit: int = 0  # P2: 0 = unlimited (reference Configuration.scala:79)
    bloom_fpp: float = 0.01
    n_docs: int | None = None  # size of the synthetic fetch corpus
    use_bloom: bool = True


class CrawlEngine:
    """Driver-side round loop (the ProcessScheduler analogue, P4 — plain
    orchestration; all data-parallel work happens in Spark)."""

    def __init__(
        self,
        spark: SparkSession,
        store_root: str,
        politeness: DataFrame | None = None,
        robots: DataFrame | None = None,
        config: CrawlConfig | None = None,
    ):
        self.spark = spark
        self.store = TableStore(spark, store_root)
        self.politeness = politeness
        self.robots = robots
        self.cfg = config or CrawlConfig()

    # ------------------------------------------------------------ bootstrap
    def bootstrap(self, seeds: DataFrame) -> None:
        """Seed the frontier: canonicalize -> robots -> F1 dedup. Idempotent
        (skipped when a frontier snapshot already exists — resume path)."""
        if self.store.exists(FRONTIER):
            return
        cand = seeds.withColumn("url", canonicalize_url("url")).filter(
            F.col("url").isNotNull()
        )
        cand = with_url_keys(cand)
        cand = robots_filter(cand, self.robots)
        cand = first_occurrence_dedup(cand, key="url", order=["seq"])
        frontier = cand.select(
            "url", "url_hash", "url_hash64", "host", "host_rev",
            "priority", "discovery_ts", "seq",
            F.lit("pending").alias("state"),
            F.lit(-1).alias("round"),
        )
        snap = self.store.write_snapshot(FRONTIER, frontier)
        # round -1 checkpoint anchors exact resume of round 0
        self.store.checkpoint(-1, {"emitted_total": 0, "frontier_snap": snap})

    # -------------------------------------------------------------- a round
    def run_round(self, round_no: int, docs: DataFrame | None = None) -> dict:
        """Execute one crawl round; returns round stats. Idempotent: if the
        checkpoint for ``round_no`` exists the round is skipped (resume)."""
        last = self.store.last_checkpoint()
        if last is not None and last["round"] >= round_no:
            return {"round": round_no, "skipped": True}
        # exact resume: a killed round may have left partial (but snapshot-
        # complete) mutations — roll the frontier back to the last committed
        # checkpoint and drop the killed round's schedule/metrics rows, then
        # recompute deterministically (resume-equivalence, SURVEY.md §5d)
        if last is not None and last.get("frontier_snap"):
            if self.store.current_snapshot(FRONTIER) != last["frontier_snap"]:
                self.store.restore(FRONTIER, last["frontier_snap"])

        frontier = self.store.read(FRONTIER)
        pending = frontier.filter(F.col("state") == "pending")

        slotted = assign_emission_slots(pending, self.politeness)
        admitted = admit_round(slotted, self.cfg.round_ms)
        if self.cfg.limit and self.cfg.limit > 0:
            already = 0
            if last is not None:
                already = last.get("emitted_total", 0)
            from delphi_crawler_spark.operators.politeness import global_limit

            admitted = global_limit(admitted, max(0, self.cfg.limit - already))

        schedule = emission_order(admitted).select(
            F.lit(round_no).alias("round"),
            "emit_ms", "host", "priority", "discovery_ts", "seq", "url",
        )
        # S7 alsoTo: materialize once, feed both the schedule sink and the
        # fetch stage (write-then-read instead of recompute); replace-by-round
        # keeps re-runs of a killed round idempotent
        self._replace_round(SCHEDULE, schedule, round_no)
        scheduled = self.store.read(SCHEDULE).filter(F.col("round") == round_no)
        n_admitted = scheduled.count()

        # S4/S5: seen-set transition — admitted rows become 'fetched'
        fetched_keys = scheduled.select("url").withColumn(
            "state", F.lit("fetched")
        ).withColumn("round", F.lit(round_no))
        self.store.merge_upsert(
            FRONTIER, fetched_keys, key="url",
            update_cols=["state", "round"], insert=False,
        )

        n_new_links = 0
        if docs is not None and n_admitted > 0:
            n_new_links = self._discover(round_no, scheduled, docs)

        # A5 per-partition lineage + metrics
        self._replace_round(
            METRICS,
            partition_metrics(scheduled).withColumn("round", F.lit(round_no)),
            round_no,
        )
        stats = {
            "emitted": n_admitted,
            "new_links": n_new_links,
            "emitted_total": (last.get("emitted_total", 0) if last else 0) + n_admitted,
            "frontier_snap": self.store.current_snapshot(FRONTIER),
        }
        self.store.checkpoint(round_no, stats)  # commit point — written LAST
        return {"round": round_no, **stats}

    def _replace_round(self, table: str, df: DataFrame, round_no: int) -> None:
        """Idempotent per-round append: drop any partial rows a killed run
        left for this round, then add the recomputed ones."""
        if self.store.exists(table):
            kept = self.store.read(table).filter(F.col("round") != round_no)
            df = kept.unionByName(df)
        self.store.write_snapshot(table, df)

    # ------------------------------------------------------------- discover
    def _discover(self, round_no: int, scheduled: DataFrame, docs: DataFrame) -> int:
        """Fetch + extract + admit new links into the frontier."""
        n_docs = self.cfg.n_docs or docs.count()
        # S3 fetch: deterministic URL -> doc mapping (crc32, reproducible in
        # the pure-Python oracle); production swaps this join for the
        # vectorized HTTP-fetch UDF.
        targets = scheduled.select(
            "url", "discovery_ts", "seq",
            F.format_string(
                "doc-%08d", F.pmod(F.crc32(F.col("url")), F.lit(n_docs))
            ).alias("doc_id"),
        )
        links = extract_links(docs)  # (doc_id, span_pos, raw_url) in span order
        raw = targets.join(links, "doc_id", "inner").select(
            F.col("raw_url").alias("url"),
            F.lit(0).alias("priority"),
            F.col("discovery_ts"),
            F.col("seq").alias("parent_seq"),
            "span_pos",
        )

        cand = raw.withColumn("url", canonicalize_url("url")).filter(
            F.col("url").isNotNull()
        )
        cand = with_url_keys(cand)
        cand = robots_filter(cand, self.robots)
        # F1: first occurrence in discovery order (parent emission, span pos)
        cand = first_occurrence_dedup(cand, key="url", order=["parent_seq", "span_pos"])

        frontier = self.store.read(FRONTIER)
        seen = frontier.select("url", "url_hash64")
        bloom = None
        if self.cfg.use_bloom:
            bloom = build_bloom(
                seen, expected_items=max(64, frontier.count()), fpp=self.cfg.bloom_fpp
            )
        fresh = seen_anti_join(cand, seen, bloom)

        # deterministic new seq over the SURVIVORS, continuing the global
        # monotonic sequence in (parent_seq, span_pos) discovery order (S1).
        # The unpartitioned window is a single-task sort over one round's
        # survivors (bounded by admitted x links/doc); at 10^10-URL scale
        # this becomes zipWithIndex-style per-partition offsets.
        max_seq = frontier.agg(F.max("seq")).collect()[0][0] or 0
        w = Window.orderBy("parent_seq", "span_pos")
        fresh = fresh.withColumn("seq", F.row_number().over(w) + F.lit(max_seq))

        new_rows = fresh.select(
            "url", "url_hash", "url_hash64", "host", "host_rev",
            "priority", "discovery_ts", "seq",
            F.lit("pending").alias("state"),
            F.lit(round_no).alias("round"),
        )
        n_new = new_rows.count()
        if n_new:
            self.store.append(FRONTIER, new_rows)
        return n_new

    # ------------------------------------------------------------ accessors
    def schedule_rows(self) -> list[tuple]:
        """(round, emit_ms, host, priority, seq, url) in emission order."""
        df = self.store.read(SCHEDULE).orderBy(
            "round", "emit_ms", F.col("priority").desc(), "discovery_ts", "seq"
        )
        return [
            (r.round, r.emit_ms, r.host, r.priority, r.seq, r.url)
            for r in df.select("round", "emit_ms", "host", "priority", "seq", "url").collect()
        ]

    def seen_set(self) -> set[str]:
        return {
            r.url
            for r in self.store.read(FRONTIER)
            .filter(F.col("state") == "fetched")
            .select("url")
            .collect()
        }
