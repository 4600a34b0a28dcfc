import pytest


@pytest.fixture(scope="session")
def spark():
    from datasketches_rust_spark.plans.session import get_spark

    s = get_spark(
        master="local[4]",
        shuffle_partitions=8,
        app_name="dsrs-tests",
        extra_conf={"spark.sql.execution.arrow.maxRecordsPerBatch": "512"},
    )
    yield s
    s.stop()
