"""Hot-conversation skew pre-reduction (operators/skew.py)."""

import pytest
from pyspark.sql import functions as F

from logstash_filter_aggregate_spark.config import ConfigurationError
from logstash_filter_aggregate_spark.operators.skew import hot_task_counts, prereduce, prereduce_eligible
from logstash_filter_aggregate_spark.plans.pipeline import (
    example1_config,
    example3_config,
    example5_config,
    run_pipeline,
)
from logstash_filter_aggregate_spark.sources.transcripts import generate_transcripts


def _fp(df):
    cols = sorted(df.columns)
    return sorted(map(str, df.select(*cols).collect()))


def test_eligibility():
    assert prereduce_eligible(example3_config())        # clicks, no end
    assert prereduce_eligible(example5_config())        # sums, no end
    assert not prereduce_eligible(example1_config())    # create/update/end guards


def test_prereduced_pipeline_matches_plain(spark):
    # gap-split exactness when bucket <= inactivity (hot conv included)
    cfg = example3_config(timeout=100_000.0, inactivity_timeout=120.0)
    t = generate_transcripts(spark, n_convs=24, hot_convs=1, hot_turns=500)
    plain = run_pipeline(spark, t, cfg)
    red = run_pipeline(spark, t, cfg, prereduce_s=120.0)
    assert _fp(plain.sessions) == _fp(red.sessions)
    assert _fp(plain.timeout) == _fp(red.timeout)


def test_prereduce_shrinks_hot_task(spark):
    cfg = example3_config(timeout=100_000.0, inactivity_timeout=120.0)
    t = generate_transcripts(spark, n_convs=4, hot_convs=1, hot_turns=2000)
    from logstash_filter_aggregate_spark.operators.classify import classify
    from logstash_filter_aggregate_spark.plans.pipeline import parse

    classified = classify(parse(t), cfg)
    reduced = prereduce(classified, cfg, bucket_s=120.0, allow_age_approx=True)
    hot_rows = reduced.where("conv_id = 'hot-0000'").count()
    # 2000 turns at 1s spacing / 120s buckets -> ~17 partial rows
    assert hot_rows <= 20
    # and the pipeline result over partials is identical on the hot conv
    plain = run_pipeline(spark, t, cfg).sessions.where("task_id = '900000'")
    red = run_pipeline(spark, t, cfg, prereduce_s=120.0).sessions.where("task_id = '900000'")
    assert _fp(plain) == _fp(red)


def test_prereduce_guards(spark):
    with pytest.raises(ConfigurationError, match="create_or_update-only"):
        prereduce(None, example1_config())
    cfg = example3_config()
    with pytest.raises(ConfigurationError, match="bucket_s"):
        prereduce(None, cfg, bucket_s=10_000.0, allow_age_approx=True)
    with pytest.raises(ConfigurationError, match="allow_age_approx"):
        prereduce(None, cfg, bucket_s=60.0)


def test_hot_task_counts(spark):
    cfg = example3_config()
    t = generate_transcripts(spark, n_convs=12, hot_convs=1, hot_turns=400)
    from logstash_filter_aggregate_spark.operators.classify import classify
    from logstash_filter_aggregate_spark.plans.pipeline import parse

    classified = classify(parse(t), cfg)
    hot = hot_task_counts(classified, threshold=300).collect()
    assert [r._task_id for r in hot] == ["900000"]
