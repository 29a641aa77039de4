from __future__ import annotations

import pytest

try:
    from hypothesis import settings as _hyp_settings

    # Reproducible property tests (round-8 verdict #2): with the default
    # randomized search, the suite's verdict depended on which examples
    # hypothesis happened to try that run (the session-window boundary
    # bug was found by one run and missed by another). derandomize=True
    # makes example generation deterministic, so builder, driver and
    # judge all see the same suite verdict; per-test @settings(...)
    # decorators inherit it because they derive from the loaded profile.
    _hyp_settings.register_profile("repo-deterministic", derandomize=True)
    _hyp_settings.load_profile("repo-deterministic")
except ImportError:  # pragma: no cover - hypothesis is baked in
    pass

from pyspark_data_engineering_assignment_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    # REPO_TEST_SHUFFLE_PARTITIONS varies the shuffle layout without
    # code changes: the round-10 "flaky green" class (window results
    # over EQUAL order keys depend on physical row order) only
    # surfaces under some partitionings, so the corrupt gates are
    # swept at 1 / 8 / 32 to shake out order-dependent passes.
    import os

    n = os.environ.get("REPO_TEST_SHUFFLE_PARTITIONS", "8")
    spark = get_spark(app_name="tests", extra_conf={"spark.sql.shuffle.partitions": n})
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE


def pytest_configure(config):
    # Two lanes (round-13 verdict task #5):
    #   FAST (core-correctness, target <10 min):
    #       python -m pytest tests/ -m "not slow and not axis"
    #     oracle parity, goldens, state merge, plan hygiene, operator
    #     units - the signal to run after every change.
    #   FULL (close-out gate): python -m pytest tests/
    # "slow"  = heavy-runtime suites (soak, multi-process, sf-scale,
    #           distributed feeder, cache pruning).
    # "axis"  = degenerate-input hazard sweeps (corrupt/unicode/extreme
    #           values/calendar/codec/...). They re-verify pinned
    #           contracts; run them when touching readers, parsers, the
    #           oracle conventions, or before a round close.
    config.addinivalue_line(
        "markers", "slow: heavy-runtime tests (soak, multiprocess, sf-scale)"
    )
    config.addinivalue_line(
        "markers", "axis: degenerate-input hazard-axis sweeps (pinned contracts)"
    )
