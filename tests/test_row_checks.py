"""Golden parity: the reference's end-to-end fixture pairs ported to
tabular form (FIXTURES.md "Ported reference goldens"). Exact counts,
error types, messages, and walk order from valid_test.go.
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from invalid_spark import report
from invalid_spark.checks.rows import compile_row_checks, run_row_checks
from invalid_spark.dsl import load_rules


def _violations(spark, df, rules_text, row_key="rid"):
    rs = load_rules(rules_text)
    return run_row_checks(df, rs, row_key=row_key)


# ---------------------------------------------------------------------------
# type_mismatch golden — 8 typeMismatch, exact messages in rule order
# (valid_test.go:140-171 over test/yaml-cases/type_mismatch.yaml)


def test_type_mismatch_eight(spark):
    df = spark.createDataFrame(
        [("r1", "1234", "something wrong", "yes", "12345", "some string",
          ["aaa", "bbb", "ccc"])],
        "rid string, stringVal string, intVal string, booVal string, "
        "floatVal string, nullVal string, list array<string>",
    )
    rules = """
stringVal: {$type: $str, $dynamic: true}
intVal: {$type: $int, $dynamic: true}
booVal: {$type: $bool, $dynamic: true}
floatVal: {$type: $float, $dynamic: true}
nullVal: {$type: $null, $dynamic: true}
list:
  $type: $arr
  $constraint: $int
  $dynamic: true
"""
    v = _violations(spark, df, rules).collect()
    assert len(v) == 8
    assert all(r.error_type == "typeMismatch" for r in v)
    msgs = [r.message for r in v]
    assert msgs == [
        "type for [stringVal] must be [$str]",
        "type for [intVal] must be [$int]",
        "type for [booVal] must be [$bool]",     # YAML 1.1 'yes' is str
        "type for [floatVal] must be [$float]",  # int 12345 is NOT $float
        "type for [nullVal] must be [$null]",
        "type for [list.0] must be [$int]",
        "type for [list.1] must be [$int]",
        "type for [list.2] must be [$int]",
    ]


# ---------------------------------------------------------------------------
# key_missing golden — 1 keyMissing, fail-fast (valid_test.go:173-193)


def test_key_missing_fail_fast(spark):
    schema = T.StructType(
        [
            T.StructField("rid", T.StringType()),
            T.StructField(
                "map",
                T.StructType(
                    [
                        T.StructField(
                            "map2",
                            T.StructType(
                                [
                                    T.StructField(
                                        "map3",
                                        T.StructType(
                                            [
                                                T.StructField("foo", T.StringType()),
                                                T.StructField("bar", T.StringType()),
                                            ]
                                        ),
                                    )
                                ]
                            ),
                        )
                    ]
                ),
            ),
        ]
    )
    df = spark.createDataFrame(
        [("r1", Row(map2=Row(map3=Row(foo="abcd", bar="1111"))))], schema
    )
    rules = """
map:
  $type: $obj
  map2:
    $type: $obj
    map3:
      $type: $obj
      foo:
        $type: $str
      bar1:
        $type: $null
"""
    v = _violations(spark, df, rules).collect()
    assert len(v) == 1
    assert v[0].error_type == "keyMissing"
    assert v[0].message == "key [bar1] is expected here"
    assert v[0].row_key is None  # schema-level


def test_key_missing_fail_fast_suppresses_later_and_earlier_row_checks(spark):
    """Reference aborts the whole walk on a missing required key
    (rule.go:159-165): earlier accumulated results are kept, later
    checks never run. Schema-level missing key → only the keyMissing
    survives (the walk stops before any row is evaluated ... the
    reference walk would have kept earlier results; we document the
    schema-level case as all-or-nothing)."""
    df = spark.createDataFrame(
        [("r1", "notanint")], "rid string, a string"
    )
    rules = """
a: {$type: $int, $dynamic: true}
gone: {$type: $str}
b: {$type: $str}
"""
    v = _violations(spark, df, rules).collect()
    # 'gone' absent → fail-fast → only keyMissing reported
    assert len(v) == 1 and v[0].error_type == "keyMissing"
    assert v[0].message == "key [gone] is expected here"


def test_row_level_key_missing_stops_row(spark):
    """Per-row analog: NULL in a required dynamic column stops that
    row's remaining checks; other rows unaffected."""
    df = spark.createDataFrame(
        [("r1", None, "zzz"), ("r2", "ok", "zzz")],
        "rid string, a string, b string",
    )
    rules = """
a: {$type: $str, $dynamic: true}
b: {$type: $str, $dynamic: true, $of: [yyy]}
"""
    v = {(r.row_key, r.error_type) for r in _violations(spark, df, rules).collect()}
    assert v == {("r1", "keyMissing"), ("r2", "ofMismatch")}


# ---------------------------------------------------------------------------
# constraint_of goldens (valid_test.go:77-117)


OF_DATA_SCHEMA = (
    "rid string, strVal string, intVal string, floatVal string, "
    "boolVal string, nullVal string"
)


def _of_rules(str_of, int_of, float_of, bool_of, null_of):
    return f"""
strVal: {{$type: $str, $dynamic: true, $of: {str_of}}}
intVal: {{$type: $int, $dynamic: true, $of: {int_of}}}
floatVal: {{$type: $float, $dynamic: true, $of: {float_of}}}
boolVal: {{$type: $bool, $dynamic: true, $of: {bool_of}}}
nullVal: {{$type: $null, $dynamic: true{null_of}}}
"""


def test_of_not_contain_four(spark):
    df = spark.createDataFrame(
        [("r1", "abcd", "1234", "1.23", "true", "null")], OF_DATA_SCHEMA
    )
    rules = _of_rules("[abc, efgh]", "[123, 5678]", "[1.2, 2.23]", "[false]", "")
    v = _violations(spark, df, rules).collect()
    assert len(v) == 4
    assert all(r.error_type == "ofMismatch" for r in v)
    # message parity spot-check (Go %v slice rendering, single-elem)
    bool_msg = [r.message for r in v if r.column == "boolVal"][0]
    assert bool_msg == "value of boolVal must be one of [[false]]"


def test_of_contain_zero(spark):
    df = spark.createDataFrame(
        [("r1", "abcd", "1234", "1.23", "true", "null")], OF_DATA_SCHEMA
    )
    rules = _of_rules(
        "[abcd, efgh]", "[1234, 5678]", "[1.23, 2.23]", "[true]", ", $of: [null]"
    )
    v = _violations(spark, df, rules)
    assert report.overall_pass(v)


# ---------------------------------------------------------------------------
# valid golden — 0 violations (valid_test.go:56-75)


def test_valid_zero(spark):
    df = spark.createDataFrame(
        [("r1", "53minute", "true", "1e2", "null", ["1", "2", "3"])],
        "rid string, strVal string, boolVal string, floatVal string, "
        "nilVal string, list array<string>",
    )
    rules = """
strVal:
  $type: $str
  $dynamic: true
  $reg: ".*"
  $length: {$max: 20, $min: 2}
boolVal: {$type: $bool, $dynamic: true}
floatVal: {$type: $float, $dynamic: true}
nilVal: {$type: $null, $dynamic: true}
list:
  $type: $arr
  $constraint: $str
"""
    # note: the reference data's list elements are QUOTED ("1","2","3")
    # → !!str at parse time. Quoting doesn't survive into a table, so
    # the tabular port checks the static array<string> element type
    # (no $dynamic) — same pass outcome.
    v = run_row_checks(df, load_rules(rules), row_key="rid")
    assert report.overall_pass(v)


# ---------------------------------------------------------------------------
# regex golden — 2 regxMismatch (openapi analog, valid_test.go:120-138)


def test_regex_two(spark):
    df = spark.createDataFrame(
        [
            ("r1", "Description-alpha"),
            ("r2", "wrong one"),
            ("r3", "Description-beta"),
            ("r4", "also wrong"),
        ],
        "rid string, description string",
    )
    rules = 'description:\n  $type: $str\n  $reg: "Description-[.]*"\n'
    v = _violations(spark, df, rules).collect()
    assert len(v) == 2
    assert all(r.error_type == "regxMismatch" for r in v)
    assert {r.row_key for r in v} == {"r2", "r4"}
    assert v[0].message == "value for [description] must match regexp : Description-[.]*"


# ---------------------------------------------------------------------------
# length — byte semantics, min and max independently


def test_length_min_max(spark):
    df = spark.createDataFrame(
        [("r1", "short"), ("r2", "x" * 25), ("r3", "just right"), ("r4", "héllo")],
        "rid string, caption string",
    )
    # 'héllo' is 5 chars but 6 BYTES (Go len) — with $min 6 it passes
    rules = "caption:\n  $type: $str\n  $length: {$min: 6, $max: 20}\n"
    v = _violations(spark, df, rules).collect()
    got = {(r.row_key, r.message) for r in v}
    assert got == {
        ("r1", "length of value in [caption] must < 6"),
        ("r2", "length of value in [caption] must > 20"),
    }


# ---------------------------------------------------------------------------
# $key-reg enforced (divergence: reference parses but never enforces)


def test_key_reg_enforced_on_map(spark):
    df = spark.createDataFrame(
        [
            ("r1", {"x-a": "1", "x-b": "2"}),
            ("r2", {"x-a": "1", "bad": "2"}),
        ],
        "rid string, meta map<string,string>",
    )
    rules = 'meta:\n  $type: $obj\n  $key-reg: "^x-"\n'
    v = _violations(spark, df, rules).collect()
    assert len(v) == 1
    assert v[0].row_key == "r2" and v[0].error_type == "keyNameMismatch"


# ---------------------------------------------------------------------------
# static mode basics: range + static type + arrays of objects


def test_static_range_and_required(spark):
    df = spark.createDataFrame(
        [("r1", 50, "png"), ("r2", 0, "bmp"), ("r3", None, "jpeg")],
        "rid string, w int, fmt string",
    )
    rules = """
w:
  $type: $int
  $range: {$min: 1, $max: 100000}
fmt:
  $type: $str
  $of: [png, jpeg, webp]
"""
    v = _violations(spark, df, rules).collect()
    got = {(r.row_key, r.error_type) for r in v}
    assert got == {
        ("r2", "rangeMismatch"),
        ("r2", "ofMismatch"),
        ("r3", "keyMissing"),
    }


def test_static_schema_type_mismatch(spark):
    df = spark.createDataFrame([("r1", 5)], "rid string, name int")
    v = _violations(spark, df, "name: {$type: $str}\n").collect()
    assert len(v) == 1
    assert v[0].error_type == "typeMismatch" and v[0].row_key is None


def test_array_of_objects(spark):
    df = spark.createDataFrame(
        [
            ("r1", [Row(name="a", tag="ok"), Row(name="b", tag="ok")]),
            ("r2", [Row(name=None, tag="bad!")]),
        ],
        T.StructType(
            [
                T.StructField("rid", T.StringType()),
                T.StructField(
                    "items",
                    T.ArrayType(
                        T.StructType(
                            [
                                T.StructField("name", T.StringType()),
                                T.StructField("tag", T.StringType()),
                            ]
                        )
                    ),
                ),
            ]
        ),
    )
    rules = """
items:
  $type: $arr
  $constraint:
    name:
      $type: $str
    tag:
      $type: $str
      $of: [ok]
"""
    v = _violations(spark, df, rules).collect()
    got = {(r.row_key, r.error_type) for r in v}
    assert got == {("r2", "keyMissing"), ("r2", "ofMismatch")}


# ---------------------------------------------------------------------------
# verdicts (per-partition pass/fail, SURVEY.md §2.3)


def test_partition_verdicts(spark):
    df = spark.createDataFrame(
        [("r%d" % i, "ok" if i % 10 else "bad") for i in range(100)],
        "rid string, v string",
    ).repartition(4)
    rules = "v: {$type: $str, $of: [ok]}\n"
    viol = run_row_checks(df, load_rules(rules), row_key="rid")
    verd = report.partition_verdicts(df, viol).collect()
    assert len(verd) == 4
    assert sum(r.n_rows for r in verd) == 100
    assert sum(r.n_violations for r in verd) == 10
    mets = report.rule_metrics(viol).collect()
    assert mets[0].n_violations == 10 and mets[0].error_type == "ofMismatch"


def test_strict_mode_flags_uncovered_columns(spark):
    from invalid_spark.checks.rows import compile_row_checks, run_row_checks
    from invalid_spark.dsl import load_rules

    df = spark.createDataFrame([(1, "a", 2.0)], "id long, name string, x double")
    rules = load_rules("id: {$type: $int}\nname: {$type: $str}\n")
    # default: permissive (reference rule.go:152-157)
    assert run_row_checks(df, rules, "id").count() == 0
    plan = compile_row_checks(df, rules, strict=True)
    extras = [sv for sv in plan.schema_violations if sv["error_type"] == "extraKey"]
    assert [sv["column"] for sv in extras] == ["x"]
    v = run_row_checks(df, rules, "id", plan=plan)
    got = v.filter("error_type = 'extraKey'").collect()
    assert len(got) == 1 and got[0]["message"] == "key [x] is not covered by any rule"


def test_violation_samples_bounded(spark):
    from invalid_spark import report
    from invalid_spark.checks.rows import run_row_checks
    from invalid_spark.dsl import load_rules
    from pyspark.sql import functions as F

    df = spark.range(100).select(
        F.col("id"), F.lit("zz").alias("flag")
    )
    rules = load_rules("flag: {$type: $str, $of: [ok]}\n")
    v = run_row_checks(df, rules, "id")
    s = report.violation_samples(v, k=7)
    assert s.count() == 7
    assert [r["row_key"] for r in s.orderBy("sample_rank").collect()] == [
        "0", "1", "10", "11", "12", "13", "14"
    ]


def test_seq_any_table_mode(spark):
    """$seq types a heterogeneous array column (elements unchecked);
    $any accepts every static type and every dynamic spelling."""
    from invalid_spark.checks import rows as rc
    from invalid_spark.dsl import load_rules

    df = spark.createDataFrame(
        [(1, ["1", "a", "true"], "0x1F", 5),
         (2, None, "hello", 6)],
        "id long, mixed array<string>, dyn string, n long",
    )
    rules = load_rules(
        "mixed: {$type: $seq, $optional: true}\n"
        "dyn: {$type: $any, $dynamic: true}\n"
        "n: {$type: $any}\n"
    )
    v = rc.run_row_checks(df, rules, "id")
    assert v.count() == 0
    # $seq on a non-array column is a schema-level typeMismatch
    bad = load_rules("n: {$type: $seq}\n")
    vb = rc.run_row_checks(df, bad, "id")
    rows_ = vb.collect()
    assert len(rows_) == 1 and rows_[0]["error_type"] == "typeMismatch"
    assert "[$seq]" in rows_[0]["message"]


def test_pii_rule_gate(spark):
    """$pii as a first-class row check: counts evaluate inside the
    row-check projection; max bounds the allowed matches; kinds
    restrict which patterns fire; bad kinds fail at compile."""
    df = spark.createDataFrame(
        [
            (1, "email me a@b.io and c@d.org"),
            (2, "server 10.0.0.1"),
            (3, "clean text"),
            (4, None),
        ],
        "rid long, text string",
    )
    v = _violations(
        spark, df, "text: {$type: $str, $optional: true, $pii: {}}\n"
    ).collect()
    got = {int(r["row_key"]): r for r in v}
    assert set(got) == {1, 2}
    assert got[1]["error_type"] == "piiFound" and got[1]["observed"] == "2"
    assert got[2]["observed"] == "1"
    # max: 1 tolerates a single match
    v2 = _violations(
        spark, df, "text: {$type: $str, $optional: true, $pii: {max: 1}}\n"
    ).collect()
    assert [int(r["row_key"]) for r in v2] == [1]
    # kinds: only emails fire
    v3 = _violations(
        spark, df,
        "text: {$type: $str, $optional: true, $pii: {kinds: [email]}}\n",
    ).collect()
    assert [int(r["row_key"]) for r in v3] == [1]
    with pytest.raises(ValueError, match="kinds"):
        _violations(
            spark, df,
            "text: {$type: $str, $optional: true, $pii: {kinds: [dna]}}\n",
        ).collect()
    # still one codegen projection, no shuffle
    import contextlib
    import io as _io

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        _violations(
            spark, df, "text: {$type: $str, $optional: true, $pii: {}}\n"
        ).explain()
    assert "Exchange" not in buf.getvalue()


def test_expr_rule_cross_column(spark):
    """$expr: cross-column row predicate (deequ `satisfies` analog)
    evaluated inside the row-check projection: FALSE or NULL fails;
    bad SQL and non-boolean expressions fail at compile; the plan
    stays one shuffle-free codegen projection."""
    df = spark.createDataFrame(
        [
            (1, 10, 5),       # 10 <= 5*10 → pass
            (2, 100, 5),      # 100 > 50  → fail
            (3, None, 5),     # NULL predicate → fail (not satisfied)
            (4, 10, None),    # NULL predicate → fail
        ],
        "rid long, w int, h int",
    )
    v = _violations(
        spark, df,
        "w: {$type: $int, $optional: true, "
        "$expr: {sql: 'w <= h * 10'}}\n",
    )
    got = {int(r["row_key"]): r for r in v.filter(
        "error_type = 'exprMismatch'").collect()}
    assert set(got) == {2, 3, 4}
    assert got[2]["observed"] == "100"
    assert "must satisfy [w <= h * 10]" in got[2]["message"]
    # plan: no shuffle, no Python — the predicate rides the projection
    plan = v._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan
    # compile-time validation (no job): unresolvable / non-boolean SQL
    with pytest.raises(ValueError, match="does not compile"):
        compile_row_checks(
            df, load_rules("w: {$type: $int, $expr: {sql: 'ghost > 1'}}\n")
        )
    with pytest.raises(ValueError, match="BOOLEAN"):
        compile_row_checks(
            df, load_rules("w: {$type: $int, $expr: {sql: 'w + 1'}}\n")
        )
    with pytest.raises(ValueError, match="needs sql"):
        compile_row_checks(
            df, load_rules("w: {$type: $int, $expr: {name: x}}\n")
        )


# ---------------------------------------------------------------------------
# $when row-scope predicate (deequ .where() analog)


def test_when_scopes_rule_to_matching_rows(spark):
    df = spark.createDataFrame(
        [("r1", "s1", "xx"), ("r2", "s2", "xx"), ("r3", "s1", "en"),
         ("r4", None, "xx")],
        "rid string, source string, lang string",
    )
    rules = """
lang: {$type: $str, $of: [en], $when: {sql: "source = 's1'"}}
"""
    rows = _violations(spark, df, rules).collect()
    # only the in-scope failing row; s2 and NULL-predicate rows are
    # out of scope, r3 passes
    assert [(r.row_key, r.error_type) for r in rows] == [("r1", "ofMismatch")]


def test_when_failfast_restores_out_of_scope(spark):
    """A required-key miss inside a $when scope kills later checks
    only for in-scope rows; out-of-scope rows keep validating."""
    df = spark.createDataFrame(
        [("r1", "s1", None, "xx"), ("r2", "s2", None, "xx")],
        "rid string, source string, a string, lang string",
    )
    rules = """
a: {$type: $str, $when: {sql: "source = 's1'"}}
lang: {$type: $str, $of: [en]}
"""
    rows = {(r.row_key, r.error_type) for r in
            _violations(spark, df, rules).collect()}
    # r1: in scope → keyMissing on a, lang suppressed (fail-fast)
    # r2: out of scope → no keyMissing, lang check still applies
    assert rows == {("r1", "keyMissing"), ("r2", "ofMismatch")}


def test_when_wraps_array_element_checks(spark):
    df = spark.createDataFrame(
        [("r1", "s1", ["1", "x"]), ("r2", "s2", ["1", "x"])],
        "rid string, source string, nums array<string>",
    )
    rules = """
nums:
  $type: $arr
  $constraint: $int
  $dynamic: true
  $when: {sql: "source = 's1'"}
"""
    rows = _violations(spark, df, rules).collect()
    assert [(r.row_key, r.error_type) for r in rows] == [
        ("r1", "typeMismatch")
    ]


def test_when_compile_errors(spark):
    df = spark.createDataFrame([("r1", "s1", "en")],
                               "rid string, source string, lang string")
    from invalid_spark.checks.rows import compile_row_checks as crc

    with pytest.raises(ValueError, match=r"\$unique.*\$when"):
        crc(df, load_rules(
            'lang: {$type: $str, $unique: true, $when: {sql: "source = \'s1\'"}}'
        ))
    with pytest.raises(ValueError, match=r"\$when on \[lang\] needs sql"):
        crc(df, load_rules("lang: {$type: $str, $when: {threshold: 1}}"))
    with pytest.raises(ValueError, match="BOOLEAN"):
        crc(df, load_rules('lang: {$type: $str, $when: {sql: "length(lang)"}}'))
    with pytest.raises(ValueError, match="does not compile"):
        crc(df, load_rules('lang: {$type: $str, $when: {sql: "nope = 1"}}'))


def test_when_plan_stays_shuffle_free(spark):
    df = spark.createDataFrame(
        [("r%d" % i, "s%d" % (i % 3), "xx") for i in range(50)],
        "rid string, source string, lang string",
    )
    rules = 'lang: {$type: $str, $of: [en], $when: {sql: "source = \'s1\'"}}'
    v = _violations(spark, df, rules)
    plan = v._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_format_directive(spark):
    df = spark.createDataFrame(
        [("r1", "bob@example.com", "https://x.io/a", "2024-01-31"),
         ("r2", "not-an-email", "ftp://x.io", "2024-13-99x"),
         ("r3", None, None, None)],
        "rid string, em string, u string, d string",
    )
    rules = """
em: {$type: $str, $optional: true, $format: email}
u: {$type: $str, $optional: true, $format: url}
d: {$type: $str, $optional: true, $format: date}
"""
    rows = {(r.row_key, r.column, r.error_type)
            for r in _violations(spark, df, rules).collect()}
    assert rows == {
        ("r2", "em", "formatMismatch"),
        ("r2", "u", "formatMismatch"),
        ("r2", "d", "formatMismatch"),
    }, rows
    from invalid_spark.dsl import DSLError
    with pytest.raises(DSLError, match="unknown \\$format"):
        load_rules("em: {$type: $str, $format: zipcode}")


def test_format_uuid_ipv4_datetime(spark):
    df = spark.createDataFrame(
        [("r1", "123e4567-e89b-12d3-a456-426614174000", "10.0.0.1",
          "2024-01-31T23:59:59.123"),
         ("r2", "123e4567e89b12d3a456426614174000", "999.0.0.1",
          "2024-01-31 25:00:00")],
        "rid string, id string, ip string, ts string",
    )
    rules = """
id: {$type: $str, $format: uuid}
ip: {$type: $str, $format: ipv4}
ts: {$type: $str, $format: datetime}
"""
    rows = {(r.row_key, r.column) for r in
            _violations(spark, df, rules).collect()}
    # ts "25:00:00" still matches the shape pattern (format checks are
    # syntactic, not semantic) — only uuid and ip flag on r2
    assert ("r2", "id") in rows and ("r2", "ip") in rows
    assert not any(rk == "r1" for rk, _ in rows)
