"""Document-mode YAML validation vs the reference's OWN golden
fixture pairs (vendored verbatim under tests/fixtures/reference/):
exact violation counts, error types, messages, and depth-first order
as asserted by the reference's valid_test.go:56-193."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from invalid_spark import docs
from invalid_spark.dsl import load_rules_file

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "reference")


def _run(spark, data_name: str, rule_name: str):
    v = docs.validate_yaml_files(
        spark,
        os.path.join(FIX, *data_name.split("/")),
        os.path.join(FIX, *rule_name.split("/")),
    )
    return v.orderBy("ord").collect()


def test_valid_pair_zero_results(spark):
    # valid_test.go:56-75 — exam/valid.yaml rules × yaml-cases/valid.yaml
    rows = _run(spark, "yaml-cases/valid.yaml", "exam/valid.yaml")
    assert rows == []


def test_type_mismatch_eight_exact_ordered(spark):
    # valid_test.go:140-171 — 8 typeMismatch results in rule order,
    # incl. the array elements keyed list.0..2
    rows = _run(spark, "yaml-cases/type_mismatch.yaml", "exam/type_mismatch.yaml")
    assert len(rows) == 8
    assert all(r["error_type"] == "typeMismatch" for r in rows)
    expected = [
        ("stringVal", "type for [stringVal] must be [$str]"),
        ("intVal", "type for [intVal] must be [$int]"),
        ("booVal", "type for [booVal] must be [$bool]"),
        ("floatVal", "type for [floatVal] must be [$float]"),
        ("nullVal", "type for [nullVal] must be [$null]"),
        ("list.0", "type for [list.0] must be [$int]"),
        ("list.1", "type for [list.1] must be [$int]"),
        ("list.2", "type for [list.2] must be [$int]"),
    ]
    assert [(r["key"], r["message"]) for r in rows] == expected


def test_key_missing_fail_fast_single_result(spark):
    # valid_test.go:173-193 — exactly one keyMissing(bar1); the
    # passing sibling check before it emits nothing, everything after
    # is cancelled
    rows = _run(spark, "yaml-cases/key_missing.yaml", "exam/key_missing.yaml")
    assert len(rows) == 1
    assert rows[0]["error_type"] == "keyMissing"
    assert rows[0]["message"] == "key [bar1] is expected here"


def test_constraint_of_not_contain_four(spark):
    # valid_test.go:77-96 (inverted fixture naming: data in exam/,
    # rules in yaml-cases/)
    rows = _run(
        spark, "exam/constraint_of.yaml", "yaml-cases/constraint_of_not_contain.yaml"
    )
    assert len(rows) == 4
    assert all(r["error_type"] == "ofMismatch" for r in rows)
    assert [r["key"] for r in rows] == ["strVal", "intVal", "floatVal", "boolVal"]


def test_constraint_of_contain_zero(spark):
    # valid_test.go:98-117
    rows = _run(
        spark, "exam/constraint_of.yaml", "yaml-cases/constraint_of_contain.yaml"
    )
    assert rows == []


def test_openapi_two_regex_mismatches(spark):
    # valid_test.go:120-138 — the 2 errors are the $reg
    # "Description-[.]*" mismatches on tags[*].externalDocs.description
    # (rule exam/openapi.yaml:34-36); tags[1] has no externalDocs and
    # the rule marks it $optional → skipped
    rows = _run(spark, "yaml-cases/openapi.yaml", "exam/openapi.yaml")
    assert len(rows) == 2
    assert all(r["error_type"] == "regxMismatch" for r in rows)
    assert {r["path"] for r in rows} == {
        "tags.0.externalDocs.description",
        "tags.2.externalDocs.description",
    }
    assert all(
        r["message"]
        == "value for [description] must match regexp : Description-[.]*"
        for r in rows
    )


def test_multi_doc_corpus_one_pass(spark):
    """All golden pairs as one corpus: per-doc verdicts from a single
    joined plan — the table-scale shape of document validation."""
    fields = docs.yaml_docs_df(
        spark,
        [
            os.path.join(FIX, "yaml-cases", "valid.yaml"),
            os.path.join(FIX, "yaml-cases", "type_mismatch.yaml"),
            os.path.join(FIX, "yaml-cases", "key_missing.yaml"),
        ],
    )
    # one shared rule file validates only matching docs' paths; use
    # the type_mismatch ruleset (others' fields are extra → tolerated)
    rules = load_rules_file(os.path.join(FIX, "exam", "type_mismatch.yaml"))
    v = docs.validate_yaml_docs(fields, rules)
    per_doc = {
        r["doc_id"]: r["n"]
        for r in v.groupBy("doc_id").count().withColumnRenamed("count", "n").collect()
    }
    assert per_doc["type_mismatch.yaml"] == 8
    # valid.yaml under the type_mismatch rules: map.stringVal etc.
    # missing → fail-fast keyMissing (1)
    assert per_doc.get("valid.yaml", 0) == 1
    assert per_doc.get("key_missing.yaml", 0) == 1


def test_seq_any_declared_semantics(spark, tmp_path):
    """$seq/$any are declared by the reference (rule.go:31,38) but
    unimplemented TODOs (rule.go:662-663); the engine implements the
    declared semantics: $seq = sequence with elements of any type,
    $any = any value type (documented as exceeding the reference)."""
    data = tmp_path / "het.yaml"
    data.write_text(
        "mixed: [1, a, true, ~]\n"
        "anything: 0x1F\n"
        "anything2: hello\n"
        "notalist: scalar\n"
    )
    rules = tmp_path / "rules.yaml"
    rules.write_text(
        "mixed: {$type: $seq}\n"
        "anything: {$type: $any}\n"
        "anything2: {$type: $any, $of: [hello, 5]}\n"
        "notalist: {$type: $seq}\n"
    )
    from invalid_spark import docs

    rows = docs.validate_yaml_files(spark, str(data), str(rules)).collect()
    # only the non-sequence under $seq fails; heterogeneous elements
    # and both $any values (int spelling + enum member) pass
    assert [(r["key"], r["error_type"], r["message"]) for r in rows] == [
        ("notalist", "typeMismatch", "type for [notalist] must be [$seq]")
    ]


def test_any_of_mismatch(spark, tmp_path):
    data = tmp_path / "d.yaml"
    data.write_text("v: nope\n")
    rules = tmp_path / "r.yaml"
    rules.write_text("v: {$type: $any, $of: [yes, 5]}\n")
    from invalid_spark import docs

    rows = docs.validate_yaml_files(spark, str(data), str(rules)).collect()
    assert len(rows) == 1 and rows[0]["error_type"] == "ofMismatch"


def test_various_value_inference_parity(spark):
    """Document-mode flattening reproduces the reference's asserted
    scalar type inference (yaml_test.go:26-181 over
    test/yaml-cases/various_value.yaml): YAML 1.2 core schema by
    spelling — octal/hex are ints, dot-less exponents are floats,
    y/n/yes are STRINGS, quoted numbers stay strings."""
    fields = docs.yaml_docs_df(
        spark, [os.path.join(FIX, "yaml-cases", "various_value.yaml")]
    )
    vt = {r["key"]: r["vtype"] for r in fields.collect() if r["path"]}
    expected = {
        "negative": "$int", "zero": "$int", "positive": "$int",
        "canonical": "$int", "octal": "$int", "hexadecimal": "$int",
        "decimal": "$str", "sexagesimal": "$str", "sexagesimal2": "$str",
        "fixed": "$str",
        "canonical2": "$float", "exponential": "$float",
        "negativeInfinity": "$float", "not a number": "$float",
        "null": "$nil",
        "true": "$str",   # y  — YAML 1.1 bool, 1.2 string
        "false": "$str",  # n
        "true2": "$str",  # yes
        "true3": "$bool", "true4": "$bool",
        "string": "$str",  # quoted '12345'
    }
    got = {k: vt[k] for k in expected}
    assert got == expected


def test_yaml_docs_from_table_distributed_parse(spark):
    """Corpus-scale ingest: YAML strings in a table column parse on
    the executors (mapInPandas) into the same node table the
    file-based path produces; malformed docs get a sentinel row and
    fail validation instead of killing the job."""
    rows = [
        (1, "a: 1\nb: hello\n"),
        (2, "a: nope\nb: world\n"),          # a fails $int
        (3, "a: [unclosed\n"),                # malformed YAML
        (4, "b: only\n"),                     # a missing (required)
    ]
    src = spark.createDataFrame(rows, "doc_id long, yaml string")
    fields = docs.yaml_docs_from_table(src, text_col="yaml")
    # parity with the driver-side flattener on a well-formed doc
    drv = docs.flatten_document(rows[0][1], "1")
    dist = sorted(
        tuple(r) for r in fields.filter("doc_id = '1'").collect()
    )
    assert sorted(tuple(d) for d in drv) == dist
    errs = docs.parse_errors(fields).collect()
    assert [e["doc_id"] for e in errs] == ["3"]
    from invalid_spark.dsl import load_rules

    v = docs.validate_yaml_docs(
        fields, load_rules("a: {$type: $int}\nb: {$type: $str}\n")
    )
    by_doc = {r["doc_id"]: (r["error_type"], r["key"]) for r in v.collect()}
    assert by_doc["2"] == ("typeMismatch", "a")
    assert by_doc["4"] == ("keyMissing", "a")
    assert by_doc["3"] == ("keyMissing", "a")  # sentinel doc: no fields
    assert "1" not in by_doc


def test_docs_vs_table_dynamic_agree(spark):
    """Cross-surface consistency: document-mode type checking and
    table-mode `$dynamic` (the Catalyst CASE/regex chain) must agree
    on every plain-scalar spelling × rule-type combination — the two
    surfaces implement ONE semantics (yamlmeta core-schema), so a
    divergence is a bug in one of them."""
    from invalid_spark.checks import rows as rc
    from invalid_spark.dsl import load_rules

    spellings = [
        "1", "-12", "0xC", "014", "1e2", "1.5", "-.inf", ".NaN",
        "true", "False", "yes", "n", "~", "null", "hello", "12345",
        "+12,345", "3:25:45", "0b101",
    ]
    rtypes = ["$int", "$float", "$bool", "$null", "$str"]
    # docs surface: one document per (spelling, rtype) pair
    rows_tbl, yaml_rows = [], []
    for i, sp in enumerate(spellings):
        for j, rt in enumerate(rtypes):
            did = i * 10 + j
            yaml_rows.extend(
                docs.flatten_document(f"v: {sp}\n", str(did))
            )
            rows_tbl.append((did, sp, rt))
    fields = spark.createDataFrame(yaml_rows, docs.FIELD_SCHEMA)
    doc_viol = set()
    for rt in rtypes:
        rules = load_rules(f"v: {{$type: {rt}}}\n")
        v = docs.validate_yaml_docs(
            fields.filter(
                F.col("doc_id").cast("long") % 10 == rtypes.index(rt)
            ),
            rules,
        )
        doc_viol |= {
            (int(r["doc_id"]), r["error_type"]) for r in v.collect()
        }
    # table surface: same pairs through the $dynamic CASE chain
    tab_viol = set()
    for rt in rtypes:
        rules = load_rules(f"v: {{$type: {rt}, $dynamic: true}}\n")
        sub = spark.createDataFrame(
            [(d, s) for d, s, r in rows_tbl if r == rt],
            "doc_id long, v string",
        )
        v = rc.run_row_checks(sub, rules, "doc_id")
        tab_viol |= {
            (int(r["row_key"]), r["error_type"]) for r in v.collect()
        }
    assert doc_viol == tab_viol


def test_container_rule_on_scalar_parity(spark, tmp_path):
    """Reference parity: a container rule meeting a scalar emits NO
    typeMismatch — ObjRule only recurses (required children go
    keyMissing, rule.go:169-171) and ArrRule iterates the node's
    children, which a scalar has none of (rule.go:175-192)."""
    data = tmp_path / "d.yaml"
    data.write_text("m: 42\nl: hello\n")
    rules = tmp_path / "r.yaml"
    rules.write_text(
        "m:\n  $type: $obj\n  foo: {$type: $str, $optional: true}\n"
        "l: {$type: $arr, $constraint: $int}\n"
    )
    rows = docs.validate_yaml_files(spark, str(data), str(rules)).collect()
    assert rows == []
    # but a REQUIRED child under the scalar-valued obj is keyMissing
    rules2 = tmp_path / "r2.yaml"
    rules2.write_text(
        "m:\n  $type: $obj\n  foo: {$type: $str}\n"
    )
    rows2 = docs.validate_yaml_files(spark, str(data), str(rules2)).collect()
    assert [(r["key"], r["error_type"]) for r in rows2] == [
        ("foo", "keyMissing")
    ]


def test_constraint_null_and_any_elements(spark, tmp_path):
    """$constraint: $null accepts null-spelled elements ($null rule ↔
    $nil value type) and $constraint: $any accepts everything — the
    reference compiles neither (scalarTypes excludes them,
    rule.go:43-44); declared-semantics extension."""
    data = tmp_path / "d.yaml"
    data.write_text("nulls: [~, null]\nmixed: [1, a, true]\nbad: [1, ~]\n")
    rules = tmp_path / "r.yaml"
    rules.write_text(
        "nulls: {$type: $arr, $constraint: $null}\n"
        "mixed: {$type: $arr, $constraint: $any}\n"
        "bad: {$type: $arr, $constraint: $null}\n"
    )
    rows = docs.validate_yaml_files(spark, str(data), str(rules)).collect()
    assert [(r["key"], r["error_type"]) for r in rows] == [
        ("bad.0", "typeMismatch")
    ]


def test_source_ranges_type_mismatch_golden(spark):
    """Violation rows carry the reference's source Range
    (result.go:18-22, range.go:14-30): 1-based line/column of the
    anchoring node, end = start + value length (+2 when quoted;
    containers count 0). Scalar checks anchor to the VALUE node;
    array-element checks to the ARRAY node (rule.go:178 uses the
    array field's getValueRange). Expected values read off the
    type_mismatch fixture by hand."""
    v = docs.validate_yaml_files(
        spark,
        os.path.join(FIX, "yaml-cases", "type_mismatch.yaml"),
        os.path.join(FIX, "exam", "type_mismatch.yaml"),
    )
    got = [
        (r["key"], r["line"], r["col_start"], r["col_end"])
        for r in v.orderBy("ord").collect()
    ]
    assert got == [
        ("stringVal", 3, 14, 18),   # 1234
        ("intVal", 4, 11, 26),      # something wrong
        ("booVal", 5, 11, 14),      # yes
        ("floatVal", 6, 13, 18),    # 12345
        ("nullVal", 7, 12, 23),     # some string
        # list.0..2 all anchor to the flow-sequence "[" (container,
        # zero-width end)
        ("list.0", 8, 9, 9),
        ("list.1", 8, 9, 9),
        ("list.2", 8, 9, 9),
    ]


def test_range_expend_reference_goldens():
    """_expend replays the reference's Range.expend and NewRange
    (range_test.go:29-193) value-for-value. NewRange(l1, l2) is
    _expend of the two point-ranges — same-line merge included."""
    point = lambda l: (l, l)  # noqa: E731
    l1 = (2, 3, 14)  # NewLineByYAMLNode(testNode): "who are you" @2:3
    # testRange1 / testRangeExpend
    r1 = docs._expend(point(l1), point((5, 10, 15)))
    assert r1 == ((2, 3, 14), (5, 10, 15))
    r2 = docs._expend(point((1, 1, 10)), point((10, 50, 100)))
    assert docs._expend(r1, r2) == ((1, 1, 10), (10, 50, 100))
    # testRangeCross
    r1 = docs._expend(point(l1), point((50, 100, 150)))
    r2 = docs._expend(point((5, 1, 100)), point((100, 50, 100)))
    assert docs._expend(r1, r2) == ((2, 3, 14), (100, 50, 100))
    # testSingleLineRange1: same-line NewRange merges min/max cols
    r1 = docs._expend(point(l1), point((2, 5, 150)))
    assert r1 == ((2, 3, 150), (2, 3, 150))
    r2 = docs._expend(point((5, 1, 100)), point((100, 50, 100)))
    assert docs._expend(r1, r2) == ((2, 3, 150), (100, 50, 100))
    # testSingleLineRange2
    r2 = docs._expend(point((2, 1, 100)), point((2, 50, 100)))
    assert docs._expend(r1, r2) == ((2, 1, 150), (2, 1, 150))


def test_source_range_end_container_expansion(spark):
    """Range.End on violation rows (reference expend applied at
    yaml.go:392-395/449-451): scalar anchors have End == Start; the
    list.0..2 violations anchor to the ARRAY node, whose range
    expands over its children — start stays at the '[' (8,9,9), end
    reaches the last element "ccc" (11,5,10: col 5, len 3 + 2 quotes).
    The node table's container rows carry the same expanded ranges
    (the map node spans stringVal's line 3 through the list's last
    element)."""
    v = docs.validate_yaml_files(
        spark,
        os.path.join(FIX, "yaml-cases", "type_mismatch.yaml"),
        os.path.join(FIX, "exam", "type_mismatch.yaml"),
    )
    got = [
        (r["key"], r["line"], r["col_start"], r["col_end"],
         r["eline"], r["ecol_start"], r["ecol_end"])
        for r in v.orderBy("ord").collect()
    ]
    scalars = got[:5]
    for k, sl, sc, se, el, ec, ee in scalars:
        assert (sl, sc, se) == (el, ec, ee), k  # scalar: End == Start
    assert got[5:] == [
        ("list.0", 8, 9, 9, 11, 5, 10),
        ("list.1", 8, 9, 9, 11, 5, 10),
        ("list.2", 8, 9, 9, 11, 5, 10),
    ]
    # the node table: expanded container ranges
    nodes = docs.yaml_docs_df(
        spark, [os.path.join(FIX, "yaml-cases", "type_mismatch.yaml")]
    )
    m = {r["path"]: r for r in nodes.collect()}
    lst = m["map.list"]
    assert (lst["line"], lst["col_start"], lst["col_end"]) == (8, 9, 9)
    assert (lst["eline"], lst["ecol_start"], lst["ecol_end"]) == (11, 5, 10)
    mp = m["map"]
    # start: the mapping's own mark (3,3) merged with stringVal's
    # value on the same line (14..18) → (3, 3, 18); end: the list's
    # expanded end
    assert (mp["line"], mp["col_start"], mp["col_end"]) == (3, 3, 18)
    assert (mp["eline"], mp["ecol_start"], mp["ecol_end"]) == (11, 5, 10)


def test_source_ranges_key_missing_and_quoted(spark, tmp_path):
    """keyMissing anchors to the parent's rule_idx-th existing child
    (reference field.Fields()[i], rule.go:161) — for the key_missing
    fixture, missing bar1 (rule_idx 1) → the range of [bar: 1111]'s
    value. Quoted scalars count +2 columns (range.go:20-23)."""
    v = docs.validate_yaml_files(
        spark,
        os.path.join(FIX, "yaml-cases", "key_missing.yaml"),
        os.path.join(FIX, "exam", "key_missing.yaml"),
    )
    rows = v.collect()
    assert [(r["key"], r["error_type"]) for r in rows] == [
        ("bar1", "keyMissing")
    ]
    assert (rows[0]["line"], rows[0]["col_start"], rows[0]["col_end"]) == (
        6, 12, 16
    )
    # quoted-style +2: a double-quoted value failing a regex
    data = tmp_path / "d.yaml"
    data.write_text('v: "abc"\n')
    rules = tmp_path / "r.yaml"
    rules.write_text("v: {$type: $str, $reg: '^z'}\n")
    r = docs.validate_yaml_files(spark, str(data), str(rules)).collect()
    assert [(x["line"], x["col_start"], x["col_end"]) for x in r] == [
        (1, 4, 9)  # col 4, len("abc")+2 quotes = 5 → end 9
    ]


def test_json_document_mode(spark):
    """JSON documents flatten into the same node table and validate
    through the same rule engine as YAML (the reference's planned
    NewJSON): type discrimination incl. bool-vs-int, required keys,
    nested objects/arrays, malformed-input sentinel."""
    from invalid_spark.dsl import load_rules

    src = spark.createDataFrame(
        [
            (1, '{"a": 5, "b": {"c": "x"}, "l": [1, 2]}'),   # clean
            (2, '{"a": true, "b": {"c": "x"}, "l": [1]}'),   # a bool≠int
            (3, '{"a": 5, "b": {}, "l": []}'),               # c missing
            (4, 'not json at all {{{'),                      # sentinel
        ],
        "doc_id long, json string",
    )
    fields = docs.json_docs_from_table(src)
    assert [e["doc_id"] for e in docs.parse_errors(fields).collect()] == ["4"]
    rules = load_rules(
        "a: {$type: $int}\n"
        "b:\n  $type: $obj\n  c: {$type: $str}\n"
        "l: {$type: $arr, $constraint: $int}\n"
    )
    v = docs.validate_yaml_docs(fields, rules)
    got = sorted(
        (r["doc_id"], r["key"], r["error_type"]) for r in v.collect()
        if r["doc_id"] != "4"
    )
    assert got == [
        ("2", "a", "typeMismatch"),       # JSON true is $bool, not $int
        ("3", "c", "keyMissing"),
    ]
    # YAML and JSON spellings of the same document validate identically
    y = docs.flatten_document("a: 5\nb:\n  c: x\nl: [1, 2]\n", "d")
    j = docs.flatten_json_document('{"a": 5, "b": {"c": "x"}, "l": [1, 2]}', "d")
    y_core = sorted((r[1], r[5], r[6], r[7]) for r in y)  # path, key, vtype, value
    j_core = sorted((r[1], r[5], r[6], r[7]) for r in j)
    assert y_core == j_core
