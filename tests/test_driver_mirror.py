"""Driver-harness mirror: the grading harness builds its OWN SparkSession
without this repo's DEFAULT_CONF. Any query that silently depends on a
session-build-time conf (round 1: spark.sql.legacy.parquet.nanosAsLong for
the TIMESTAMP(NANOS) events table) passes the repo's tests yet fails in
the driver. This test strips the conf the way the driver's vanilla session
lacks it and runs every events-touching query."""

import pytest

from c4_5decisiontreebasedonmapreduce_spark import registry

EVENTS_QUERIES = [
    "asof_join",
    "json_funcs",
    "event_windows",
    "sessionize",
    "session_window_agg",
    "streaming_tumbling",
    "streaming_stateful",
    "profile_skew",  # r9 second wave: profiles events.user_id/event_type
    "funnel_conversion",  # r10 second wave: per-stage ts minima
    "retention_cohorts",  # r11: cohort dates from the events ts column
]


@pytest.mark.parametrize("name", EVENTS_QUERIES)
def test_events_queries_survive_vanilla_session(spark, sf_small, name):
    # simulate the driver's session: the conf is absent until a read
    # re-establishes it
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    try:
        df = registry.queries()[name](spark, sf_small)
        assert df.count() > 0
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
