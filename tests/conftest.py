import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMALL = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from svdmovie_lens_parallel_apache_spark_spark import get_spark

    spark = get_spark(
        app_name="svdml-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "4g", "spark.sql.warehouse.dir": "/tmp/svdml-warehouse"},
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMALL


@pytest.fixture(scope="session")
def catalog_fingerprints(spark, sf_dir):
    """ONE whole-catalog plan build shared by the three catalog-wide
    plan gates (fingerprint snapshot, cartesian guard, JVM-only guard).

    Building all 224 queries executes the harness queries' imperative
    setup (~3 min at sf0.001); each of those three tests used to pay it
    separately — the single biggest block of suite wall time and the
    reason the round-13 driver verify window timed out at ~72%
    (VERDICT item 2). The assertions themselves are unchanged: every
    field they check (cartesian, python_udf, the full fingerprint) is
    computed by the same plan_fingerprint pass."""
    from tools.plan_fingerprints import compute_fingerprints

    return compute_fingerprints(spark, sf_dir)
