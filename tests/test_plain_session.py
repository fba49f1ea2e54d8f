"""Driver-session parity: the correctness driver builds a PLAIN
``SparkSession.builder`` session — none of ``get_session``'s confs, in
particular NO ``spark.sql.execution.arrow.pyspark.enabled``.  r4's one
red CORRECTNESS row (orders_schema_profile) was an artifact-only
failure of exactly this drift: ``createDataFrame`` from a pandas frame
with NaN-promoted int columns succeeds under Arrow and crashes without
it.  This module re-runs every registered query with the Arrow
conversion confs forced OFF so a session-config-dependent query can
never again be green in pytest but red in the driver artifact.

(Arrow-optimized *UDF execution* — pandas_udf / mapInArrow — is
independent of these conversion confs and stays on, as it does in the
driver's session.)
"""

import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"

_ARROW_CONFS = [
    "spark.sql.execution.arrow.pyspark.enabled",
    "spark.sql.execution.arrow.pyspark.fallback.enabled",
]


@pytest.fixture(scope="module")
def plain_spark(spark):
    saved = {c: spark.conf.get(c, None) for c in _ARROW_CONFS}
    for c in _ARROW_CONFS:
        spark.conf.set(c, "false")
    yield spark
    for c, v in saved.items():
        if v is None:
            spark.conf.unset(c)
        else:
            spark.conf.set(c, v)


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_runs_without_arrow_conversion(plain_spark, name):
    df = entry_mod.queries()[name](plain_spark, SF_DIR)
    assert df.columns
    assert df.count() >= 0


def test_entry_runs_without_arrow_conversion(plain_spark):
    df = entry_mod.entry(plain_spark)
    assert df.count() >= 0
