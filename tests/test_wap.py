"""Write-audit-publish: a failing audit never publishes; a passing one
publishes atomically and the published bytes equal the frame."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from pyspark_data_engineering_assignment_spark.sources.tables import load_table
from pyspark_data_engineering_assignment_spark.sources.writers import (
    write_audit_publish,
)

SF = "/root/testdata/sf0.001"


def test_failing_audit_blocks_publish(spark, tmp_path):
    e = load_table(spark, SF, "events").select("event_id", "user_id", "value")
    target = str(tmp_path / "published")
    report = write_audit_publish(
        e,
        target,
        rules=[("positive", "event_id")],  # event ids start at 0: fails
    )
    assert any(r["passed"] == 0 for r in report)
    assert not os.path.exists(target)  # nothing published
    assert os.path.exists(target + "._staging")  # staged for inspection


def test_passing_audit_publishes_exact_rows(spark, tmp_path):
    e = load_table(spark, SF, "events").select("event_id", "user_id", "value")
    target = str(tmp_path / "published_ok")
    report = write_audit_publish(
        e,
        target,
        rules=[("not_null", "user_id"), ("unique", "event_id")],
    )
    assert report and all(r["passed"] == 1 for r in report)
    assert os.path.exists(target)
    assert not os.path.exists(target + "._staging")  # renamed, not copied
    back = spark.read.parquet(target)
    assert back.count() == e.count()
    assert back.agg(F.sum("event_id")).collect()[0][0] == (
        e.agg(F.sum("event_id")).collect()[0][0]
    )


def test_publish_refuses_to_clobber(spark, tmp_path):
    e = load_table(spark, SF, "events").select("event_id")
    target = str(tmp_path / "existing")
    os.makedirs(target)
    with pytest.raises(ValueError):
        write_audit_publish(e, target)
