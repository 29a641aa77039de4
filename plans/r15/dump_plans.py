"""Dump .explain('formatted') for named registry queries to
plans/r15/<query>_<tag>.txt (judge-checkable plan evidence).

Usage: python plans/r15/dump_plans.py <tag> <query> [<query> ...]
"""
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from pyspark_data_engineering_assignment_spark.plans import QUERIES
from pyspark_data_engineering_assignment_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark(app_name="plan_dump")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name].fn(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        out = f"/root/repo/plans/r15/{name}_{tag}.txt"
        with open(out, "w") as fh:
            fh.write(buf.getvalue())
        print("wrote", out)


if __name__ == "__main__":
    main()
