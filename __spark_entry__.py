"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one entry per implemented operator from SURVEY.md
§2 (plus the training-pipeline extras); ``oracle_sql()`` gives the
DuckDB-equivalent ANSI SQL over the same parquet tables. Operators whose
primitives DuckDB lacks (xxhash64-based MinHash/SimHash/LSH, the pandas
grok backend) are rows-only checks — noted inline.

Column-name discipline: every computed column is aliased identically in
the Spark query and the oracle SQL (the driver sorts columns by name
before value-hashing). Doubles are rounded and cast to DOUBLE on both
sides; sums that feed hashes aggregate DECIMAL to avoid float
summation-order noise.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from logstash_filter_aggregate_spark.config import AggSpec, CorrelationRule, PipelineConfig
from logstash_filter_aggregate_spark.operators import dedup, similarity, textstats, multimodal
from logstash_filter_aggregate_spark.plans.pipeline import run_pipeline
from logstash_filter_aggregate_spark.sources.transcripts import events_as_transcripts

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# the per-user event order used everywhere (engine ORDER_BY analog);
# a function because Window specs need an active session
def _w_user():
    return W.partitionBy("user_id").orderBy("ts", "event_id")

GAP_S = 21_600.0        # 6h inactivity gap for the sessionization queries
AGE_S = 86_400.0        # 24h absolute age cap
BIG_TIMEOUT = 1e9       # effectively disables a timeout dimension

# deterministic query vector for similarity queries: embedding of vec_id 0
_QVEC_CACHE: dict[str, list[float]] = {}


def _query_vec(spark: SparkSession, sf_dir: str) -> list[float]:
    if sf_dir not in _QVEC_CACHE:
        _QVEC_CACHE[sf_dir] = [
            float(x) for x in _emb(spark, sf_dir).where("vec_id = 0").first()["embedding"]
        ]
    return _QVEC_CACHE[sf_dir]


# ---------------------------------------------------------------------------
# the full-engine pipeline configs used by the pipe_* queries
# ---------------------------------------------------------------------------

def _start_end_config() -> PipelineConfig:
    """signup=start(create) / click=update / purchase=end over the events
    stream rendered as transcript text (example #1 shape)."""
    return PipelineConfig(
        task_id="%{taskid}",
        rules=(
            CorrelationRule("start", "etype = 'signup'", map_action="create"),
            CorrelationRule(
                "update", "etype = 'click'", map_action="update",
                aggs=(
                    AggSpec("clicks", "count"),
                    AggSpec("click_total", "sum", "val"),
                ),
            ),
            CorrelationRule("end", "etype = 'purchase'", map_action="update", end_of_task=True),
        ),
        timeout=BIG_TIMEOUT,
    )


def _gap_config() -> PipelineConfig:
    return PipelineConfig(
        task_id="%{taskid}",
        rules=(
            CorrelationRule(
                "any", "etype is not null",
                aggs=(AggSpec("n_ev", "count"), AggSpec("val_total", "sum", "val")),
            ),
        ),
        timeout=BIG_TIMEOUT,
        inactivity_timeout=GAP_S,
        push_map_as_event_on_timeout=True,
        timeout_task_id_field="uid",
        timeout_code={"several": "n_ev > 1"},
    )


EVENT_GROK = [(
    "event",
    r"%{LOGLEVEL:loglevel} - %{NOTSPACE:taskid} - EVENT - %{WORD:etype} - %{INT:val:int}",
)]


def _pipe_start_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logstash_filter_aggregate_spark.plans.pipeline import compile_groks

    t = events_as_transcripts(spark, sf_dir)
    out = run_pipeline(spark, t, _start_end_config(), groks=compile_groks(EVENT_GROK))
    return out.completed.select(
        "task_id", "clicks",
        F.coalesce(F.col("click_total"), F.lit(0)).cast("long").alias("click_total"),
        "nevents", "creation_ts", "lastevent_ts",
    )


def _pipe_gap_timeout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logstash_filter_aggregate_spark.plans.pipeline import compile_groks

    t = events_as_transcripts(spark, sf_dir)
    out = run_pipeline(spark, t, _gap_config(), groks=compile_groks(EVENT_GROK))
    return out.timeout.select(
        "uid", "n_ev",
        F.col("val_total").cast("long").alias("val_total"),
        "creation_ts", "lastevent_ts", "several",
    )


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # --- O2: task-id extraction + unresolved-skip (aggregate.rb:182-183)
    def o02(spark, sf):
        ev = _events(spark, sf)
        return (
            ev.select(F.format_string("conv-%d", "user_id").alias("task_id"))
            .where(F.col("task_id").isNotNull())
            .groupBy("task_id")
            .agg(F.count(F.lit(1)).alias("n"))
        )
    q["o02_task_id_extract"] = o02

    # --- O4/O5: map creation + last-event tracking (aggregate.rb:211-221)
    def o04(spark, sf):
        return (
            _events(spark, sf)
            .groupBy("user_id")
            .agg(
                F.min("ts").alias("creation_ts"),
                F.max("ts").alias("lastevent_ts"),
                F.count(F.lit(1)).alias("nevents"),
            )
        )
    q["o04_map_lifecycle_meta"] = o04

    # --- O6: the aggregation dictionary (sum/count/min/max/first/last)
    def o06(spark, sf):
        ev = _events(spark, sf)
        dec = F.col("value").cast("decimal(18,6)")
        return ev.groupBy("user_id").agg(
            F.sum(F.when(F.col("event_type") == "click", dec)).cast("double").alias("click_value_sum"),
            F.count(F.when(F.col("event_type") == "click", 1)).alias("clicks"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.min(F.when(F.col("value").isNotNull(), F.struct("event_id", "event_type")))["event_type"].alias("first_type"),
            F.max(F.struct("event_id", "event_type"))["event_type"].alias("last_type"),
        )
    q["o06_agg_dictionary"] = o06

    # --- O7: end-event enrichment — running aggregate evaluated at end rows
    def o07(spark, sf):
        ev = _events(spark, sf)
        run = F.sum(
            F.when(F.col("event_type") == "click", F.col("value").cast("decimal(18,6)"))
        ).over(_w_user().rowsBetween(W.unboundedPreceding, -1))
        return (
            ev.withColumn("sql_duration", F.coalesce(run, F.lit(0)).cast("double"))
            .where(F.col("event_type") == "purchase")
            .select("user_id", "event_id", "sql_duration")
        )
    q["o07_end_enrichment"] = o07

    # --- O8: end-of-task instance split (running count of prior end markers)
    def o08(spark, sf):
        ev = _events(spark, sf)
        seg = F.coalesce(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).over(
                _w_user().rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        )
        return (
            ev.withColumn("instance", seg.cast("long"))
            .groupBy("user_id", "instance")
            .agg(F.count(F.lit(1)).alias("nevents"), F.min("ts").alias("creation_ts"))
        )
    q["o08_end_of_task_split"] = o08

    # --- O9: absolute-age expiry flags (aggregate.rb:396)
    def o09(spark, sf):
        ev = _events(spark, sf)
        ts_d = F.col("ts").cast("timestamp").cast("double")
        creation = F.min(ts_d).over(W.partitionBy("user_id"))
        flagged = ev.select(
            "user_id", F.when(ts_d - creation > AGE_S, 1).otherwise(0).alias("flag")
        )
        return flagged.groupBy("user_id").agg(F.sum("flag").alias("n_past_age_cap"))
    q["o09_age_cap_flags"] = o09

    # --- O10/O12: inactivity-gap sessionization (lag/ts-delta flags)
    def o10(spark, sf):
        ev = _events(spark, sf)
        ts_d = F.col("ts").cast("timestamp").cast("double")
        gap = F.when(ts_d - F.lag(ts_d).over(_w_user()) > GAP_S, 1).otherwise(0)
        sess = F.sum(gap).over(_w_user().rowsBetween(W.unboundedPreceding, 0))
        return (
            ev.withColumn("session_idx", sess.cast("long"))
            .groupBy("user_id", "session_idx")
            .agg(
                F.count(F.lit(1)).alias("nevents"),
                F.min("ts").alias("creation_ts"),
                F.max("ts").alias("lastevent_ts"),
            )
        )
    q["o10_gap_sessionize"] = o10

    # --- O13/O14: timeout-event construction + timeout_code
    def o13(spark, sf):
        sess = o10(spark, sf)
        return sess.select(
            F.format_string("conv-%d", "user_id").alias("timeout_task_id"),
            "nevents",
            (F.col("nevents") > 1).alias("several_events"),
            F.lit("_aggregatetimeout").alias("tag"),
            "creation_ts",
        )
    q["o13_timeout_projection"] = o13

    # --- O16: push-previous contiguous runs over global order
    def o16(spark, sf):
        ev = _events(spark, sf)
        w_all = W.orderBy("ts", "event_id")
        chg = F.when(F.lag("user_id").over(w_all).isNull(), 1).when(
            F.lag("user_id").over(w_all) != F.col("user_id"), 1
        ).otherwise(0)
        run = F.sum(chg).over(w_all.rowsBetween(W.unboundedPreceding, 0))
        return (
            ev.withColumn("run_id", run.cast("long"))
            .groupBy("run_id")
            .agg(
                F.min("user_id").alias("user_id"),
                F.count(F.lit(1)).alias("run_len"),
            )
        )
    q["o16_push_previous_runs"] = o16

    # --- U2: conditional routing / event-kind classification
    def u02(spark, sf):
        ev = _events(spark, sf)
        kind = (
            F.when(F.col("event_type") == "signup", "start")
            .when(F.col("event_type") == "purchase", "end")
            .when(F.col("event_type").isin("click", "view"), "update")
            .otherwise("other")
        )
        return ev.groupBy(kind.alias("kind")).agg(F.count(F.lit(1)).alias("n"))
    q["u02_classify_route_counts"] = u02

    # --- U4: broadcast dimension enrichment
    def u04(spark, sf):
        ev = _events(spark, sf)
        dim = spark.createDataFrame(
            [("click", "engagement"), ("view", "engagement"),
             ("purchase", "revenue"), ("signup", "acquisition"), ("error", "ops")],
            ["event_type", "family"],
        )
        return (
            ev.join(F.broadcast(dim), "event_type", "left")
            .groupBy("family")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("value_total"),
            )
        )
    q["u04_broadcast_enrich"] = u04

    # --- O19: exception capture + tagging analog
    def o19(spark, sf):
        ev = _events(spark, sf)
        bad = F.col("value").isNull() | (F.col("value") < 0)
        return ev.groupBy("event_type").agg(
            F.sum(F.when(bad, 1).otherwise(0)).alias("n_tagged"),
            F.count(F.lit(1)).alias("n_total"),
        )
    q["o19_exception_tags"] = o19

    # --- O23: live-map count gauge (exact for the oracle)
    def o23(spark, sf):
        return _events(spark, sf).agg(
            F.count_distinct("user_id").alias("live_maps"),
            (F.count_distinct("user_id") >= 50).alias("above_warning_threshold"),
        )
    q["o23_map_count_gauge"] = o23

    # --- O24: multi-pattern isolation — same events, two patterns
    def o24(spark, sf):
        ev = _events(spark, sf)
        a = ev.groupBy(F.lit("by_user").alias("pattern_id"), F.col("user_id").cast("string").alias("task_id")).agg(
            F.count(F.lit(1)).alias("n")
        )
        b = ev.groupBy(F.lit("by_type").alias("pattern_id"), F.col("event_type").alias("task_id")).agg(
            F.count(F.lit(1)).alias("n")
        )
        return a.unionByName(b)
    q["o24_multi_pattern_isolation"] = o24

    # --- full-engine pipelines (grok parse -> correlate -> route)
    q["pipe_start_end_correlation"] = _pipe_start_end
    q["pipe_gap_timeout_push"] = _pipe_gap_timeout

    # --- U1: grok/regex parse (JVM backend; pandas backend is rows-only)
    def u01(spark, sf):
        t = events_as_transcripts(spark, sf)
        return t.select(
            F.regexp_extract("text", r"^(\w+) - (\d+) - EVENT - (\w+) - (-?\d+)$", 3).alias("etype"),
            F.regexp_extract("text", r"^(\w+) - (\d+) - EVENT - (\w+) - (-?\d+)$", 4).cast("long").alias("val"),
        ).groupBy("etype").agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("val_sum"))
    q["u01_regex_parse"] = u01

    # --- dedup family
    def dd_exact(spark, sf):
        return dedup.exact_dedup(_docs(spark, sf))
    q["dd_exact_dedup"] = dd_exact

    def dd_jaccard(spark, sf):
        d = _docs(spark, sf).where("doc_id < 80")
        return dedup.ngram_jaccard_pairs(d, k=3, min_jaccard=0.01).select(
            "id_a", "id_b", F.round("jaccard", 6).cast("double").alias("jaccard")
        )
    q["dd_ngram_jaccard"] = dd_jaccard

    def dd_minhash(spark, sf):  # rows-only: DuckDB lacks xxhash64
        return dedup.minhash_lsh_candidates(_docs(spark, sf), k=3, num_hashes=16, bands=8).select(
            "id_a", "id_b", F.round("est_jaccard", 6).cast("double").alias("est_jaccard")
        )
    q["dd_minhash_lsh"] = dd_minhash

    def dd_simhash(spark, sf):  # rows-only: DuckDB lacks xxhash64
        return dedup.simhash_near_dups(_docs(spark, sf), max_hamming=10)
    q["dd_simhash"] = dd_simhash

    # --- similarity family
    def sim_brute(spark, sf):
        out = similarity.brute_force_topk(_emb(spark, sf), _query_vec(spark, sf), k=10)
        return out.select("vec_id", F.round("cos_sim", 4).cast("double").alias("cos_sim"))
    q["sim_bruteforce_topk"] = sim_brute

    def sim_lsh(spark, sf):  # rows-only: xxhash64 hyperplanes
        out = similarity.lsh_topk(_emb(spark, sf), _query_vec(spark, sf), k=10, max_hamming=6)
        return out.select("vec_id", F.round("cos_sim", 4).cast("double").alias("cos_sim"))
    q["sim_lsh_topk"] = sim_lsh

    def sim_neardup(spark, sf):  # rows-only: xxhash64 hyperplanes
        return similarity.embedding_near_dup_pairs(_emb(spark, sf), num_planes=8, min_cosine=0.3).select(
            "id_a", "id_b", F.round("cos_sim", 4).cast("double").alias("cos_sim")
        )
    q["sim_embedding_near_dup"] = sim_neardup

    # --- text analysis family
    def ts_tokens(spark, sf):
        d = _docs(spark, sf)
        return textstats.quality_features(d).groupBy("lang").agg(
            F.sum("n_tokens").alias("tokens_total"),
            F.round(F.avg("punct_ratio"), 6).cast("double").alias("avg_punct_ratio"),
            F.sum("stopword_hits").alias("stopword_total"),
            F.round(F.avg("quality_score"), 6).cast("double").alias("avg_quality"),
        )
    q["ts_token_quality"] = ts_tokens

    def ts_lang(spark, sf):
        d = _docs(spark, sf)
        return d.select(
            textstats.lang_id("text").alias("lang_guess"),
            textstats.fingerprint("text").alias("fp"),
        ).groupBy("lang_guess").agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("fp").alias("n_fingerprints"),
        )
    q["ts_lang_fingerprint"] = ts_lang

    def ts_bpe(spark, sf):  # rows-only companion metric for token estimate
        d = _docs(spark, sf)
        return d.select("doc_id", textstats.bpe_token_estimate("text").alias("bpe_tokens"))
    q["ts_bpe_estimate"] = ts_bpe

    # --- multimodal plumbing (payload bytes are SQL-checkable; features rows-only)
    def mm_meta(spark, sf):
        m = multimodal.synth_media(_docs(spark, sf))
        return m.groupBy("meta.kind").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("payload")).alias("payload_bytes"),
        ).withColumnRenamed("kind", "kind")
    q["mm_binary_meta"] = mm_meta

    def mm_features(spark, sf):  # rows-only: mapInPandas fake decoder
        m = multimodal.synth_media(_docs(spark, sf).limit(200))
        f = multimodal.extract_features(m, dim=8)
        return f.select(
            "media_id", "n_bytes",
            F.round(F.aggregate("feature", F.lit(0.0), lambda a, x: a + x.cast("double")), 4).alias("feature_sum"),
        )
    q["mm_feature_extract"] = mm_features

    return q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full parse -> correlate -> route pipeline (example #1
    shape) on the sf0.001 events stream rendered as transcripts."""
    return _pipe_start_end(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# oracles
# ---------------------------------------------------------------------------

_PIPE_START_END_SQL = f"""
WITH e AS (
  SELECT user_id, ts, event_id, event_type,
         CAST(floor(value) AS BIGINT) AS val,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         COALESCE(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS seg
  FROM events
),
g AS (
  SELECT *, min(CASE WHEN event_type = 'signup' THEN rn END)
              OVER (PARTITION BY user_id, seg) AS creator
  FROM e
),
inc AS (
  SELECT * FROM g
  WHERE creator IS NOT NULL AND rn >= creator
    AND NOT (event_type = 'signup' AND rn > creator)
    AND event_type IN ('signup', 'click', 'purchase')
)
SELECT CAST(user_id AS VARCHAR) AS task_id,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
       CAST(COALESCE(sum(CASE WHEN event_type = 'click' THEN val END), 0) AS BIGINT) AS click_total,
       count(*) AS nevents,
       min(ts) AS creation_ts,
       max(ts) AS lastevent_ts
FROM inc
GROUP BY user_id, seg
HAVING bool_or(event_type = 'purchase')
"""

_PIPE_GAP_SQL = f"""
WITH t AS (
  SELECT user_id, ts, event_id, CAST(floor(value) AS BIGINT) AS val,
         CASE WHEN extract(epoch FROM ts) - lag(extract(epoch FROM ts)) OVER w > {GAP_S}
              THEN 1 ELSE 0 END AS gap_flag
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT *, sum(gap_flag) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
  FROM t
),
agg AS (
  SELECT CAST(user_id AS VARCHAR) AS uid, user_id, sess,
         count(*) AS n_ev, CAST(sum(val) AS BIGINT) AS val_total,
         min(ts) AS creation_ts, max(ts) AS lastevent_ts
  FROM s GROUP BY user_id, sess
),
wm AS (SELECT max(lastevent_ts) AS w FROM agg)
SELECT uid, n_ev, val_total, creation_ts, lastevent_ts, n_ev > 1 AS several
FROM agg, wm
WHERE sess < (SELECT max(sess) FROM agg a2 WHERE a2.user_id = agg.user_id)
   OR extract(epoch FROM wm.w) - extract(epoch FROM lastevent_ts) > {GAP_S}
"""


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}
    o["o02_task_id_extract"] = (
        "SELECT format('conv-{}', user_id) AS task_id, count(*) AS n "
        "FROM events WHERE user_id IS NOT NULL GROUP BY user_id"
    )
    o["o04_map_lifecycle_meta"] = (
        "SELECT user_id, min(ts) AS creation_ts, max(ts) AS lastevent_ts, "
        "count(*) AS nevents FROM events GROUP BY user_id"
    )
    o["o06_agg_dictionary"] = """
        SELECT user_id,
               CAST(sum(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS click_value_sum,
               count(CASE WHEN event_type = 'click' THEN 1 END) AS clicks,
               min(value) AS min_value,
               max(value) AS max_value,
               min_by(event_type, event_id) FILTER (WHERE value IS NOT NULL) AS first_type,
               max_by(event_type, event_id) AS last_type
        FROM events GROUP BY user_id
    """
    o["o07_end_enrichment"] = """
        WITH r AS (
          SELECT user_id, event_id, event_type,
                 COALESCE(sum(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(18,6)) END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS run
          FROM events
        )
        SELECT user_id, event_id, CAST(run AS DOUBLE) AS sql_duration
        FROM r WHERE event_type = 'purchase'
    """
    o["o08_end_of_task_split"] = """
        WITH e AS (
          SELECT user_id, ts,
                 COALESCE(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS instance
          FROM events
        )
        SELECT user_id, CAST(instance AS BIGINT) AS instance, count(*) AS nevents, min(ts) AS creation_ts
        FROM e GROUP BY user_id, instance
    """
    o["o09_age_cap_flags"] = f"""
        WITH e AS (
          SELECT user_id, extract(epoch FROM ts) AS tsec,
                 min(extract(epoch FROM ts)) OVER (PARTITION BY user_id) AS creation
          FROM events
        )
        SELECT user_id, CAST(sum(CASE WHEN tsec - creation > {AGE_S} THEN 1 ELSE 0 END) AS BIGINT) AS n_past_age_cap
        FROM e GROUP BY user_id
    """
    o["o10_gap_sessionize"] = f"""
        WITH t AS (
          SELECT user_id, ts,
                 CASE WHEN extract(epoch FROM ts) - lag(extract(epoch FROM ts))
                        OVER (PARTITION BY user_id ORDER BY ts, event_id) > {GAP_S}
                      THEN 1 ELSE 0 END AS gap_flag,
                 event_id
          FROM events
        ),
        s AS (
          SELECT *, sum(gap_flag) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
          FROM t
        )
        SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx, count(*) AS nevents,
               min(ts) AS creation_ts, max(ts) AS lastevent_ts
        FROM s GROUP BY user_id, session_idx
    """
    o["o13_timeout_projection"] = f"""
        WITH t AS (
          SELECT user_id, ts,
                 CASE WHEN extract(epoch FROM ts) - lag(extract(epoch FROM ts))
                        OVER (PARTITION BY user_id ORDER BY ts, event_id) > {GAP_S}
                      THEN 1 ELSE 0 END AS gap_flag,
                 event_id
          FROM events
        ),
        s AS (
          SELECT *, sum(gap_flag) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
          FROM t
        ),
        agg AS (
          SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx, count(*) AS nevents, min(ts) AS creation_ts
          FROM s GROUP BY user_id, session_idx
        )
        SELECT format('conv-{{}}', user_id) AS timeout_task_id, nevents,
               nevents > 1 AS several_events,
               '_aggregatetimeout' AS tag, creation_ts
        FROM agg
    """
    o["o16_push_previous_runs"] = """
        WITH c AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN lag(user_id) OVER (ORDER BY ts, event_id) IS NULL THEN 1
                      WHEN lag(user_id) OVER (ORDER BY ts, event_id) <> user_id THEN 1
                      ELSE 0 END AS chg
          FROM events
        ),
        r AS (
          SELECT *, sum(chg) OVER (ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
          FROM c
        )
        SELECT CAST(run_id AS BIGINT) AS run_id, min(user_id) AS user_id, count(*) AS run_len
        FROM r GROUP BY run_id
    """
    o["u02_classify_route_counts"] = """
        SELECT CASE WHEN event_type = 'signup' THEN 'start'
                    WHEN event_type = 'purchase' THEN 'end'
                    WHEN event_type IN ('click', 'view') THEN 'update'
                    ELSE 'other' END AS kind,
               count(*) AS n
        FROM events GROUP BY 1
    """
    o["u04_broadcast_enrich"] = """
        WITH dim(event_type, family) AS (VALUES
          ('click', 'engagement'), ('view', 'engagement'), ('purchase', 'revenue'),
          ('signup', 'acquisition'), ('error', 'ops'))
        SELECT family, count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_total
        FROM events LEFT JOIN dim USING (event_type)
        GROUP BY family
    """
    o["o19_exception_tags"] = """
        SELECT event_type,
               CAST(sum(CASE WHEN value IS NULL OR value < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_tagged,
               count(*) AS n_total
        FROM events GROUP BY event_type
    """
    o["o23_map_count_gauge"] = (
        "SELECT count(DISTINCT user_id) AS live_maps, "
        "count(DISTINCT user_id) >= 50 AS above_warning_threshold FROM events"
    )
    o["o24_multi_pattern_isolation"] = """
        SELECT 'by_user' AS pattern_id, CAST(user_id AS VARCHAR) AS task_id, count(*) AS n
        FROM events GROUP BY user_id
        UNION ALL
        SELECT 'by_type' AS pattern_id, event_type AS task_id, count(*) AS n
        FROM events GROUP BY event_type
    """
    o["pipe_start_end_correlation"] = _PIPE_START_END_SQL
    o["pipe_gap_timeout_push"] = _PIPE_GAP_SQL
    o["u01_regex_parse"] = """
        WITH t AS (
          SELECT format('INFO - {} - EVENT - {} - {}', user_id, event_type,
                        CAST(floor(value) AS BIGINT)) AS text
          FROM events
        )
        SELECT regexp_extract(text, '^(\\w+) - (\\d+) - EVENT - (\\w+) - (-?\\d+)$', 3) AS etype,
               count(*) AS n,
               CAST(sum(CAST(regexp_extract(text, '^(\\w+) - (\\d+) - EVENT - (\\w+) - (-?\\d+)$', 4) AS BIGINT)) AS BIGINT) AS val_sum
        FROM t GROUP BY 1
    """
    o["dd_exact_dedup"] = """
        SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS content_hash,
               min(doc_id) AS canonical_id, count(*) AS n_copies
        FROM documents GROUP BY 1
    """
    o["dd_ngram_jaccard"] = """
        WITH toks AS (
          SELECT doc_id, regexp_split_to_array(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\\s+') AS t
          FROM documents WHERE doc_id < 80
        ),
        -- shingles joined with '|' (absent from normalized tokens), so tuple
        -- identity matches the engine's hash-chain shingles exactly
        sh AS (
          SELECT doc_id,
                 list_distinct(CASE WHEN len(t) >= 3
                   THEN list_transform(generate_series(1, len(t) - 2),
                        i -> concat_ws('|', t[i], t[i+1], t[i+2]))
                   ELSE [] END) AS sh
          FROM toks
        ),
        ex AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM sh),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n_sh AS n_a, b.n_sh AS n_b,
                 count(*) AS n_inter
          FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2, 3, 4
        )
        SELECT id_a, id_b,
               CAST(round(n_inter * 1.0 / (n_a + n_b - n_inter), 6) AS DOUBLE) AS jaccard
        FROM inter
        WHERE n_inter * 1.0 / (n_a + n_b - n_inter) >= 0.01
    """
    o["sim_bruteforce_topk"] = """
        WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        SELECT vec_id,
               CAST(round(
                 list_dot_product(CAST(embedding AS DOUBLE[]), CAST(qv AS DOUBLE[]))
                 / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
                    * sqrt(list_dot_product(CAST(qv AS DOUBLE[]), CAST(qv AS DOUBLE[])))), 4) AS DOUBLE) AS cos_sim
        FROM embeddings, q
        ORDER BY list_dot_product(CAST(embedding AS DOUBLE[]), CAST(qv AS DOUBLE[]))
                 / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
                    * sqrt(list_dot_product(CAST(qv AS DOUBLE[]), CAST(qv AS DOUBLE[])))) DESC, vec_id
        LIMIT 10
    """
    o["ts_token_quality"] = """
        WITH n AS (
          SELECT lang, text, trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm
          FROM documents
        ),
        f AS (
          SELECT lang,
                 length(text) AS n_chars2,
                 CASE WHEN length(norm) = 0 THEN 0 ELSE len(regexp_split_to_array(norm, '\\s+')) END AS n_tokens,
                 len(regexp_extract_all(text, '[^\\w\\s]')) AS punct,
                 len(regexp_extract_all(' ' || norm || ' ', '\\s(?:the|and|of|to|a|in|is|it)\\s')) AS stopword_hits
          FROM n
        ),
        sc AS (
          SELECT lang, n_tokens, stopword_hits,
                 round(punct * 1.0 / greatest(n_chars2, 1), 6) AS punct_ratio,
                 round((CASE WHEN n_tokens >= 5 THEN 0.4 ELSE 0.0 END)
                 + (CASE WHEN n_tokens > 0
                          AND n_chars2 * 1.0 / n_tokens >= 3
                          AND n_chars2 * 1.0 / n_tokens <= 12 THEN 0.3 ELSE 0.0 END)
                 + (CASE WHEN punct * 1.0 < 0.2 * greatest(n_chars2, 1) THEN 0.2 ELSE 0.0 END)
                 + (CASE WHEN stopword_hits > 0 THEN 0.1 ELSE 0.0 END), 2) AS quality_score
          FROM f
        )
        SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS tokens_total,
               CAST(round(avg(punct_ratio), 6) AS DOUBLE) AS avg_punct_ratio,
               CAST(sum(stopword_hits) AS BIGINT) AS stopword_total,
               CAST(round(avg(quality_score), 6) AS DOUBLE) AS avg_quality
        FROM sc GROUP BY lang
    """
    o["ts_lang_fingerprint"] = """
        WITH n AS (
          SELECT ' ' || trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) || ' ' AS norm,
                 md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
          FROM documents
        ),
        s AS (
          SELECT fp,
                 len(regexp_extract_all(norm, '\\s(?:the|and|of|to|a|in|is|it)\\s')) AS s_en,
                 len(regexp_extract_all(norm, '\\s(?:der|die|und|das|ist|nicht|ein)\\s')) AS s_de,
                 len(regexp_extract_all(norm, '\\s(?:le|la|et|les|des|est|une)\\s')) AS s_fr,
                 len(regexp_extract_all(norm, '\\s(?:el|la|de|que|los|es|una)\\s')) AS s_es
          FROM n
        ),
        lg AS (
          SELECT fp, CASE
            WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
            WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
            WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
            WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
            ELSE 'es' END AS lang_guess
          FROM s
        )
        SELECT lang_guess, count(*) AS n, count(DISTINCT fp) AS n_fingerprints
        FROM lg GROUP BY lang_guess
    """
    o["mm_binary_meta"] = """
        SELECT CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
               count(*) AS n,
               CAST(sum(octet_length(unhex(md5(text) || md5(text || 'x')))) AS BIGINT) AS payload_bytes
        FROM documents GROUP BY 1
    """
    return o
