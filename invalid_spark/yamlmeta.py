"""YAML 1.2 core-schema scalar type inference.

Reproduces the reference's tag-based value typing (reference
yaml.go:256-276 dispatching on util.go:102-135 tag predicates), with
the semantics its tests assert (yaml_test.go:26-181):

- ints include negatives, legacy octal ``014``, ``0o``/``0x`` forms;
- floats include ``1.23015e+3`` and dot-less exponent forms like
  ``1e2``, plus ``-.inf`` / ``.NaN``;
- only ``true/false`` (any case-style of the 1.2 core set) are bool;
  YAML 1.1 booleans ``y/n/yes/no`` are strings;
- ``~``/``null``/empty plain scalar are null;
- ``+12,345``, ``3:25:45``, ``1,230.15`` are strings (no sexagesimal);
- quoted scalars are always strings.

Provided in two equivalent forms:

- :func:`infer_tag` — driver-side Python, used when parsing rule files
  and in document-mode validation;
- :func:`infer_type_col` — a Catalyst ``Column`` expression (anchored
  ``rlike`` chain, JVM-side, codegen'd) for dynamic type checks over
  stringly-typed table columns at scale. No Python runs per row.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# value-type names as the reference spells them (yaml.go:23-35)
T_NIL = "$nil"
T_BOOL = "$bool"
T_INT = "$int"
T_FLOAT = "$float"
T_STR = "$str"
T_OBJ = "$obj"
T_ARR = "$arr"
T_SEQ = "$seq"
T_ANY = "$any"

# YAML 1.2 core schema resolution patterns (public spec), matching the
# go-yaml v3 resolver behavior the reference inherits.
_RE_NULL = r"(~|null|Null|NULL|)"
_RE_BOOL = r"(true|True|TRUE|false|False|FALSE)"
_RE_INT = r"([-+]?[0-9]+|[-+]?0[0-7_]+|0o[0-7]+|[-+]?0x[0-9a-fA-F_]+|0b[01_]+)"
# float: needs a dot OR an exponent (so "1e2" is float, "12" is int)
_RE_FLOAT = (
    r"([-+]?(\.[0-9]+|[0-9]+(\.[0-9]*)?)([eE][-+]?[0-9]+)?"
    r"|[-+]?\.(inf|Inf|INF)|\.(nan|NaN|NAN))"
)

_null_re = re.compile(rf"^{_RE_NULL}$")
_bool_re = re.compile(rf"^{_RE_BOOL}$")
_int_re = re.compile(rf"^{_RE_INT}$")
_float_re = re.compile(rf"^{_RE_FLOAT}$")

# YAML tags, for parity with reference rule.go:73-80 (getYAMLNodeTag)
TAG_BY_TYPE = {
    T_NIL: "!!null",
    "$null": "!!null",  # rule-type spelling (rule.go:29) vs value-type "$nil"
    T_BOOL: "!!bool",
    T_INT: "!!int",
    T_FLOAT: "!!float",
    T_STR: "!!str",
    T_OBJ: "!!map",
    T_ARR: "!!seq",
    T_SEQ: "!!seq",
}
TYPE_BY_TAG = {
    "!!null": T_NIL,
    "!!bool": T_BOOL,
    "!!int": T_INT,
    "!!float": T_FLOAT,
    "!!str": T_STR,
    "!!map": T_OBJ,
    "!!seq": T_ARR,
}


def infer_tag(value: str, quoted: bool = False) -> str:
    """Return the YAML core-schema tag for a plain scalar spelling.

    ``quoted=True`` (any non-plain style) always yields ``!!str``
    (yaml_test.go:154-158: quoted '12345' stays string).
    """
    if quoted:
        return "!!str"
    if _null_re.match(value):
        return "!!null"
    if _bool_re.match(value):
        return "!!bool"
    # int before float: "12" matches both patterns, resolves int
    if _int_re.match(value):
        return "!!int"
    if _float_re.match(value):
        return "!!float"
    return "!!str"


def infer_type(value: str, quoted: bool = False) -> str:
    """Reference ``ValueType()`` name for a plain scalar spelling."""
    return TYPE_BY_TAG[infer_tag(value, quoted)]


def infer_type_col(col: Column) -> Column:
    """Catalyst expression yielding the ``$``-type name of a string
    column's raw spelling — the vectorized twin of :func:`infer_type`.

    SQL NULL maps to ``$nil`` (tabular analog of an absent/null YAML
    scalar). Evaluation order matches the resolver: null → bool →
    int → float → str. Java regex and RE2 agree on these patterns.
    """
    return (
        F.when(col.isNull() | col.rlike(rf"^{_RE_NULL}$"), F.lit(T_NIL))
        .when(col.rlike(rf"^{_RE_BOOL}$"), F.lit(T_BOOL))
        .when(col.rlike(rf"^{_RE_INT}$"), F.lit(T_INT))
        .when(col.rlike(rf"^{_RE_FLOAT}$"), F.lit(T_FLOAT))
        .otherwise(F.lit(T_STR))
    )
