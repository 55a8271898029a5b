"""Type-inference parity with the reference's YAML tag semantics
(reference yaml_test.go:26-181 over test/yaml-cases/various_value.yaml).
Tests both the Python resolver and the Catalyst column twin.
"""

import pytest
from pyspark.sql import functions as F

from invalid_spark import yamlmeta

# (spelling, quoted, expected $type) — each case cites the reference
# assertion it ports.
CASES = [
    # ints: negatives, octal 014, hex 0xC (yaml_test.go:77-88)
    ("12345", False, "$int"),
    ("-12345", False, "$int"),
    ("014", False, "$int"),
    ("0o14", False, "$int"),
    ("0xC", False, "$int"),
    # floats incl 1.23015e+3, -.inf, .NaN (yaml_test.go:90-130)
    ("1.23015e+3", False, "$float"),
    ("12e03", False, "$float"),
    ("-.inf", False, "$float"),
    (".NaN", False, "$float"),
    ("1.5", False, "$float"),
    ("1e2", False, "$float"),  # valid.yaml floatVal passes $float
    # null forms (yaml_test.go:133-137)
    ("~", False, "$nil"),
    ("null", False, "$nil"),
    ("", False, "$nil"),
    # YAML 1.1 bools are STRINGS; only true/false are bool
    # (yaml_test.go:140-165)
    ("y", False, "$str"),
    ("n", False, "$str"),
    ("yes", False, "$str"),
    ("no", False, "$str"),
    ("True", False, "$bool"),
    ("true", False, "$bool"),
    ("FALSE", False, "$bool"),
    # comma/sexagesimal forms are strings (yaml_test.go:63-75,105-116)
    ("+12,345", False, "$str"),
    ("3:25:45", False, "$str"),
    ("1,230.15", False, "$str"),
    # quoted scalars stay strings (yaml_test.go:154-158)
    ("12345", True, "$str"),
    ("true", True, "$str"),
]


@pytest.mark.parametrize("spelling,quoted,expected", CASES)
def test_infer_type_python(spelling, quoted, expected):
    assert yamlmeta.infer_type(spelling, quoted) == expected


def test_infer_type_col_matches_python(spark):
    """The Catalyst expression and the Python resolver agree on every
    unquoted case (quoting is resolved at parse time, before Spark)."""
    plain = [(s, e) for s, e, q in [(s, e, q) for s, q, e in CASES] if not q]
    plain = [(s, e) for s, q, e in CASES if not q]
    df = spark.createDataFrame(plain, "spelling string, expected string")
    got = (
        df.select(
            "spelling",
            "expected",
            yamlmeta.infer_type_col(F.col("spelling")).alias("got"),
        )
        .collect()
    )
    for r in got:
        assert r.got == r.expected, f"{r.spelling!r}: {r.got} != {r.expected}"


def test_sql_null_is_nil(spark):
    df = spark.createDataFrame([(None,)], "spelling string")
    assert (
        df.select(yamlmeta.infer_type_col(F.col("spelling")).alias("t")).first().t
        == "$nil"
    )
