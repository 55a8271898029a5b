"""Rule-DSL loading + compile-error parity (reference rule_test.go)."""

import pytest

from invalid_spark.dsl import DSLError, load_rules

SIMPLE = """
map:
  $type: "$obj"
  $required: true
  $key-reg: ".*"
  map2:
    $type: "$obj"
    strVal:
      $type: "$str"
      $reg: ".*"
      $length:
        $max: 20
        $min: 10
    list:
      $type: "$arr"
      $constraint: "$str"
    list2:
      $type: "$arr"
      $constraint:
        name:
          $type: "$str"
        description:
          $type: "$str"
          $reg: ".*"
  map5:
    $optional: true
    $type: "$obj"
    strVal2:
      $type: "$str"
"""


def test_rule_tree_structure():
    """Ports rule_test.go:52-139 structure assertions to the new model."""
    rs = load_rules(SIMPLE)
    m = rs.get("map")
    assert m.rule_type == "$obj" and m.required and m.key_reg == ".*"
    m2 = m.get("map2")
    assert m2.rule_type == "$obj" and m2.required  # default required
    sv = m2.get("strVal")
    assert sv.rule_type == "$str"
    assert sv.length_min == 10 and sv.length_max == 20 and sv.reg == ".*"
    lst = m2.get("list")
    assert lst.rule_type == "$arr" and lst.constraint == "$str"
    l2 = m2.get("list2")
    assert l2.rule_type == "$arr"
    assert l2.constraint.get("description").reg == ".*"
    m5 = m.get("map5")
    assert m5.required is False
    # children preserve document order (rule order drives walk order)
    assert [c.key for c in m2.children] == ["strVal", "list", "list2"]


def test_of_wrong_elem_type():
    """rule_test.go:17-27 / OfTypeError rule.go:527-531: enum element
    tag must equal the field's own type tag."""
    bad = """
foo:
  $type: $str
  $of:
    - 1
    - 2
"""
    with pytest.raises(DSLError, match=r"which is same with field"):
        load_rules(bad)


def test_of_not_a_list():
    """rule_test.go:29-39 / ConstraintTypeError rule.go:524-525."""
    bad = """
foo:
  $type: $str
  $of: 12345
"""
    with pytest.raises(DSLError, match=r"the type of of \[foo\] must be"):
        load_rules(bad)


def test_arr_without_constraint():
    """rule.go:505 — $arr requires $constraint."""
    with pytest.raises(DSLError, match="constraint not found"):
        load_rules("foo:\n  $type: $arr\n")


def test_missing_type():
    """rule.go:649-652 — every non-document rule needs $type."""
    with pytest.raises(DSLError, match=r"type not found : \[foo\]"):
        load_rules("foo:\n  $required: true\n")


def test_unknown_type():
    with pytest.raises(DSLError, match=r"type not match : \[foo\]"):
        load_rules("foo:\n  $type: $wat\n")


def test_rule_value_must_be_map():
    with pytest.raises(DSLError, match=r"value node must be map : \[foo\]"):
        load_rules("foo: 12\n")


def test_optional_must_be_bool_true():
    """rule.go:399-409."""
    with pytest.raises(DSLError, match="value for required must be true"):
        load_rules("foo:\n  $type: $str\n  $optional: false\n")
    with pytest.raises(DSLError, match="value node must be boolean"):
        load_rules("foo:\n  $type: $str\n  $optional: banana\n")


def test_of_keeps_full_list():
    """Documented divergence: reference keeps only the first enum value
    (rule.go:533-535 bug); we implement declared semantics."""
    rs = load_rules("foo:\n  $type: $str\n  $of: [a, b, c]\n")
    assert rs.get("foo").of == ["a", "b", "c"]


def test_quoted_of_elements_are_strings():
    """'12345' in a $str enum is fine (quoted → !!str); unquoted fails."""
    rs = load_rules("foo:\n  $type: $str\n  $of: ['12345']\n")
    assert rs.get("foo").of == ["12345"]
    with pytest.raises(DSLError):
        load_rules("foo:\n  $type: $str\n  $of: [12345]\n")


def test_engine_extensions_parse():
    rs = load_rules(
        """
image_id:
  $type: $str
  $unique: true
  $reg: "^img-"
phash:
  $type: $int
  $unique: true
license_id:
  $type: $str
  $ref: {table: licenses, key: license_id}
w:
  $type: $int
  $range: {$min: 1, $max: 100000}
  $stats: [null_rate, min, max, ndv]
bytes:
  $type: $str
  $pixel: {psnr_min: 40.0}
"""
    )
    assert rs.get("image_id").unique
    assert rs.get("license_id").ref == {"table": "licenses", "key": "license_id"}
    assert rs.get("w").range == {"$min": 1, "$max": 100000}
    assert rs.get("w").stats == ["null_rate", "min", "max", "ndv"]
    assert rs.get("bytes").pixel == {"psnr_min": 40.0}
