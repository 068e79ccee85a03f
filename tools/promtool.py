"""promtool-style CLI: validate rule files and run rule unit tests.

Mirrors the reference's ``promtool check rules`` (cmd/promtool/main.go
CheckRules) and ``promtool test rules`` (cmd/promtool/unittest.go) over
the Spark engine.

Usage::

    python tools/promtool.py check rules rules1.yml [rules2.yml ...]
    python tools/promtool.py test rules tests.yml [more.yml ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def check_rules(files: list[str]) -> int:
    from prometheus_spark.streaming.rulefmt import RuleError, load_rule_file

    rc = 0
    for f in files:
        try:
            groups = load_rule_file(f)
        except (RuleError, OSError) as e:
            print(f"  FAILED: {f}: {e}")
            rc = 1
            continue
        n = sum(len(g.rules) for g in groups)
        print(f"  SUCCESS: {f}: {n} rules found")
    return rc


def test_rules(files: list[str]) -> int:
    from pyspark.sql import SparkSession

    from prometheus_spark.testing.rule_unittest import run_rule_test_file

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    rc = 0
    for f in files:
        errs = run_rule_test_file(spark, f)
        if errs:
            print(f"  FAILED: {f}")
            for e in errs:
                print(e)
            rc = 1
        else:
            print(f"  SUCCESS: {f}")
    return rc


def main(argv: list[str]) -> int:
    if len(argv) >= 3 and argv[0] == "check" and argv[1] == "rules":
        return check_rules(argv[2:])
    if len(argv) >= 3 and argv[0] == "test" and argv[1] == "rules":
        return test_rules(argv[2:])
    print(__doc__)
    return 2


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
