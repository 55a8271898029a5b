"""Rule DSL: model, YAML loader, compile-time validation.

The DSL is the reference's rule language (SURVEY.md §1.3) — a YAML
document whose keys mirror the data's keys and whose ``$``-prefixed
keys are constraint directives — extended with table-scale directives
for the generalized engine. Rule *compilation* errors are raised at
load time (:class:`DSLError`), distinct from validation results,
mirroring ``NewRule`` (reference rule.go:93-120, rule_test.go:17-39).

Exact reference compile errors replicated (same trigger, same text):

- ``value node must be map : [k]``          (rule.go:636-638)
- ``type not found : [k]``                  (rule.go:649-652)
- ``type not match : [k]``                  (rule.go:718)
- ``value node must be boolean : [k]`` / ``value for required must be
  true``                                    (rule.go:399-409)
- ``compile regexp error : [k]``            (rule.go:590-592)
- ``the type of of [k] must be [t]``        (ConstraintTypeError, rule.go:721-723)
- ``the type of [k] must be [t],which is same with field`` (OfTypeError,
  rule.go:725-727)

Documented divergences from the reference (SURVEY.md §5 quirk list):

- ``$of`` stores the FULL enum (reference keeps only the first
  element, rule.go:533-535 bug); declared semantics implemented.
- ``$key-reg`` is enforced at validation time (reference parses but
  never enforces it).

Engine extensions (all optional, ignored by reference-parity tests):

- ``$unique: true``                — uniqueness check on the column
- ``$ref: {table: t, key: k}``     — referential check vs a dimension
  (optional ``mode: bloom`` with ``bits``/``hashes`` switches to the
  Bloom screen: fact side never shuffles, reported violations exact,
  misses bounded by the Bloom fpp — for dims too big to broadcast)
- ``$when: {sql: "<boolean SQL>"}`` — row-scope predicate (deequ
  ``.where()`` analog): the rule's row checks apply only to rows
  satisfying the predicate; table-level directives cannot be
  row-scoped and are rejected at compile time
- ``$range: {$min: x, $max: y}``   — numeric bounds
- ``$stats: [null_rate, min, max, ndv, quantiles]`` — profile metrics
- ``$drift: {test: ks|chi2|psi|wasserstein, threshold: p, clip: [qlo, qhi]}`` —
  (``psi`` = Population Stability Index: threshold bounds the index
  itself, default 0.25; ``eps`` floors the proportions;
  ``wasserstein`` = normalized earth-mover distance on the shared KS
  histogram state: threshold bounds the [0,1] statistic, default 0.1) —
  distribution drift; optional ``clip`` bounds the histogram grid by
  quantiles instead of min/max (outlier-proof, applied to both the
  comparison and the persisted state). On an ARRAY column the runner
  expands the rule into per-plane KS specs over md5-hyperplane
  projections (``planes:`` count, default 4; pass ``dim:`` to keep
  the stage action-free) — embedding-distribution drift with
  persistable per-plane state
- ``$fd: {dep: col}``              — functional dependency: this column
  determines ``dep`` (one determinant value → one dependent value)
- ``$monotonic: {per: key, order: seq, strict: false}`` — this column
  must never decrease (``strict``: must increase) per ``per`` key in
  ``order``-column order
- ``$reconcile: {table: t, key: k, value: v, term: "<sql>", order: o,
  tol: 0.01}`` — this column (the fact key) groups fact ``term``
  values whose canonical-order sum must match the dimension's ``v``
  within ``tol``
- ``$magic: {fmt: col, w: col, h: col}`` — container magic bytes (and
  header dims for PNG-family containers) must match the declared
  format / width / height columns; pure Catalyst hex ops, zero decode
- ``$pixel: {psnr_min: 40.0}``     — decoded-pixel invariant (binary col)
- ``$vector: {dim: d, no_nan: true, no_zero: true,
  norm: {min: lo, max: hi}}`` — embedding-column invariants:
  dimension, NaN/null/±Inf elements, all-zero vectors, and an L2-norm
  band (the "normalized embeddings" contract); own projection stage
  over the pruned (key, vector) scan
  (:func:`invalid_spark.checks.vector.vector_violations`)
- ``$align: {with: other_vec_col, min_cos: x}`` — paired-embedding
  alignment gate (the CLIP-score filter): cosine between this vector
  column and ``with`` must clear ``min_cos``; null / dim-mismatch /
  zero-norm pairs flag as unscorable
  (:func:`invalid_spark.checks.vector.alignment_violations`)
- ``$pii: {kinds: [email, ipv4, ssn, phone], max: 0}`` — PII scrub
  gate (violation when total matches exceed ``max``; kinds default to
  every pattern in ``pipeline.text.PII_PATTERNS``)
- ``$expr: {sql: "<boolean SQL>"}`` — cross-column row predicate
  (deequ ``satisfies`` analog): the row fails when the expression is
  FALSE or NULL; compiles into the same codegen projection as every
  other row check (zero extra scans), validated against the table
  schema at compile time
- ``$anomaly: {metric: violation_rate|null_rate|mean|row_count|
  stddev|min|max|distinct,
  min: lo, max: hi, max_rel_change: r, z_max: z, last_k: k}`` — the
  current run's metric vs the ``metrics_history`` sink (absolute
  bounds, relative change vs the mean of the last k runs, and/or a
  z-score band of ``z_max`` sample standard deviations over that
  window); verdicts land in the ``anomalies`` sink
  (:mod:`invalid_spark.checks.anomaly`)
- ``$dist: {expected: {cat: weight, ...}, alpha: a}`` — chi² goodness-
  of-fit of the column against a DECLARED distribution (class-balance
  gate; weights normalized, unexpected categories fail on their own);
  verdicts land in the ``distribution`` sink
  (:func:`invalid_spark.checks.drift.chi2_vs_expected`)
- ``$dupspan: {n: g, max_coverage: f, min_df: d}`` — cross-document
  duplicated n-gram span gate on a text column (substring-dedup
  signal): a row fails when duplicated-gram spans cover ≥ f of its
  tokens; runs as a resumable global unit like ``$unique``
  (:func:`invalid_spark.pipeline.dedup.dup_span_stats`)
- ``$assert: {stat: null_rate|min|max|mean|ndv, min: lo, max: hi}`` —
  table-level constraint on a column statistic (deequ-style); runner
  evaluates every $assert in one aggregation and writes the verdicts
  to the ``assertions`` sink
- ``$caption-eq: {table: t, key: k, column: c}`` — byte equality vs ref
- ``$dynamic: true``               — column holds stringly scalars;
  type-check by YAML core-schema spelling (reference semantics) rather
  than the table's static type.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Union

import yaml

from invalid_spark import yamlmeta

# rule-type names (reference rule.go:29-39)
SCALAR_TYPES = ("$null", "$any", "$bool", "$int", "$float", "$str")
COLLECTION_TYPES = ("$obj", "$seq", "$arr")
# engine extension: $bin types a binary payload column (the reference
# is YAML-only and has no binary concept); carries no scalar checks —
# it exists so $pixel/$required can attach to a BinaryType column.
EXT_TYPES = ("$bin",)
ALL_TYPES = SCALAR_TYPES + COLLECTION_TYPES + EXT_TYPES

_DIRECTIVES = {
    "$type", "$required", "$optional", "$length", "$min", "$max",
    "$reg", "$key-reg", "$constraint", "$of",
    # engine extensions
    "$unique", "$ref", "$range", "$stats", "$drift", "$pixel",
    "$caption-eq", "$dynamic", "$vector", "$pii", "$assert",
    "$anomaly", "$expr", "$fd", "$monotonic", "$reconcile", "$magic",
    "$when", "$format", "$dist", "$dupspan", "$align",
}

# $format named whole-value patterns (anchored — a format check is
# whole-value, unlike $reg's unanchored reference semantics). Kept
# RE2-safe so any engine (and the DuckDB oracle) evaluates them
# identically.
FORMAT_PATTERNS = {
    "email": r"^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$",
    "uuid": (r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}"
             r"-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"),
    "url": r"^https?://[^ \t\r\n]+$",
    "ipv4": (r"^((25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\.){3}"
             r"(25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])$"),
    "date": r"^[0-9]{4}-[0-9]{2}-[0-9]{2}$",
    "datetime": (r"^[0-9]{4}-[0-9]{2}-[0-9]{2}[T ]"
                 r"[0-9]{2}:[0-9]{2}:[0-9]{2}(\.[0-9]+)?$"),
}


class DSLError(ValueError):
    """Rule-compilation error (reference: error return from NewRule)."""


@dataclass
class Rule:
    """One field rule; a tree node (reference Rule struct rule.go:122-129)."""

    key: str
    rule_type: str
    required: bool = True
    children: list["Rule"] = field(default_factory=list)  # $obj, doc order
    key_reg: Optional[str] = None  # $obj
    constraint: Union[str, "Rule", None] = None  # $arr element
    length_min: Optional[int] = None  # $str ($length.$min)
    length_max: Optional[int] = None  # $str ($length.$max)
    reg: Optional[str] = None  # $str
    of: Optional[list[str]] = None  # scalars: raw string spellings
    # engine extensions
    unique: bool = False
    # $unique: {with: [cols]} — composite-key uniqueness (this column
    # + the listed ones form the natural key)
    unique_with: Optional[list[str]] = None
    ref: Optional[dict] = None
    range: Optional[dict] = None
    stats: Optional[list[str]] = None
    drift: Optional[dict] = None
    pixel: Optional[dict] = None
    caption_eq: Optional[dict] = None
    vector: Optional[dict] = None  # $vector: {dim, no_nan, no_zero, norm}
    # $align: {with: other_vec_col, min_cos: x} — paired-embedding
    # cosine gate (CLIP-score filter; checks/vector.alignment_violations)
    align: Optional[dict] = None
    pii: Optional[dict] = None  # $str: {kinds: [...], max: n}
    assert_: Optional[dict] = None  # $assert: {stat, min, max}
    # $anomaly: {metric, min, max, max_rel_change, last_k} — current
    # run's metric vs the metrics_history sink (checks/anomaly.py)
    anomaly: Optional[dict] = None
    # $dist: {expected: {cat: weight, ...}, alpha} — chi² goodness-of-
    # fit of the column vs a DECLARED distribution (drift.chi2_vs_expected)
    dist: Optional[dict] = None
    # $dupspan: {n, max_coverage, min_df} — cross-document duplicated
    # n-gram span coverage gate on a text column (the substring-dedup
    # signal, pipeline/dedup.dup_span_stats); runs as a resumable
    # global unit like $unique
    dupspan: Optional[dict] = None
    # $expr: {sql: "<boolean SQL over any columns>"} — cross-column
    # row predicate (deequ `satisfies` analog), compiled to a Catalyst
    # expression inside the row-check projection
    expr_: Optional[dict] = None
    # $fd: {dep: col} — functional dependency this-column → dep
    # (checks/relations.py two-stage aggregate)
    fd: Optional[dict] = None
    # $monotonic: {per: keycol, order: seqcol, strict: bool} — this
    # column must never decrease per key in sequence order
    monotonic: Optional[dict] = None
    # $reconcile: {table, key, value, term: "<sql>", order, tol} —
    # this column (the fact key) groups fact terms that must match
    # the dimension's value column within tol
    reconcile: Optional[dict] = None
    # $magic: {fmt: col, w: col, h: col} — container magic bytes (and
    # header dims where cheaply parseable) vs declared metadata, as
    # pure Catalyst hex ops inside the row-check projection
    magic: Optional[dict] = None
    # $when: {sql: "<boolean SQL>"} — row-scope predicate (deequ
    # `.where()` analog): the rule's ROW checks apply only to rows
    # satisfying the predicate (FALSE/NULL = out of scope); rides the
    # same projection, so scoping costs zero extra scans
    when: Optional[dict] = None
    # $format: email|uuid|url|ipv4|date|datetime — named whole-value
    # format (anchored FORMAT_PATTERNS), sugar over hand-rolled $reg
    format_: Optional[str] = None
    dynamic: bool = False

    def get(self, key: str) -> Optional["Rule"]:
        for c in self.children:
            if c.key == key:
                return c
        return None

    def path_iter(self, prefix: str = ""):
        """Yield (dotted_path, rule) depth-first in document order."""
        p = f"{prefix}.{self.key}" if prefix else self.key
        yield p, self
        for c in self.children:
            yield from c.path_iter(p)


@dataclass
class RuleSet:
    """Compiled rule document: the implicit ``$obj`` root
    (reference rule.go:640-647)."""

    root: Rule

    @property
    def columns(self) -> list[Rule]:
        return self.root.children

    def get(self, key: str) -> Optional[Rule]:
        return self.root.get(key)

    def fingerprint(self) -> str:
        """Deterministic md5 of the compiled rule tree — the runner
        pins it in the checkpoint manifest so a resume under a
        DIFFERENT ruleset is refused (units validated under different
        rules must never mix in one audit trail)."""
        import dataclasses
        import hashlib
        import json

        canon = json.dumps(
            dataclasses.asdict(self.root), sort_keys=True, default=str
        )
        return hashlib.md5(canon.encode()).hexdigest()


def _scalar_str(node) -> Optional[str]:
    if isinstance(node, yaml.ScalarNode):
        return node.value
    return None


def _node_tag(node) -> str:
    """Core-schema tag using our resolver (reference yaml semantics),
    not pyyaml's YAML 1.1 resolver."""
    if isinstance(node, yaml.MappingNode):
        return "!!map"
    if isinstance(node, yaml.SequenceNode):
        return "!!seq"
    quoted = node.style is not None
    return yamlmeta.infer_tag(node.value, quoted)


def _mapping_get(node: yaml.MappingNode, key: str):
    for k, v in node.value:
        if isinstance(k, yaml.ScalarNode) and k.value == key:
            return v
    return None


def _is_rule_node(node) -> bool:
    """A mapping value carrying ``$type`` is a child RULE, not a
    directive — the reference builds obj children from every key
    except the four spec keys (specKeyInObj, rule.go:59,429-443), so
    data keys that start with ``$`` (e.g. OpenAPI's ``$ref``) are
    legal rule names. Engine-extension directives (``$ref: {table:…}``
    etc.) never contain ``$type``, which disambiguates."""
    return isinstance(node, yaml.MappingNode) and _mapping_get(node, "$type") is not None


def _parse_int_directive(container: yaml.MappingNode, key: str) -> int:
    v = _mapping_get(container, key)
    if v is None:
        # reference: GetIntValue error when $min/$max absent (util.go:62-77)
        raise DSLError(f"key not found : [{key}]")
    if _node_tag(v) != "!!int":
        raise DSLError(f"value node must be integer : [{key}]")
    return int(v.value, 0)


def _parse_rule(key: str, value: yaml.Node, document: bool = False) -> Rule:
    """Mirror of newRuler + restructure (rule.go:635-719, 396-412)."""
    if not isinstance(value, yaml.MappingNode):
        raise DSLError(f"value node must be map : [{key}]")

    if document:
        rule = Rule(key=key, rule_type="$obj")
    else:
        tnode = _mapping_get(value, "$type")
        if tnode is None:
            raise DSLError(f"type not found : [{key}]")
        rtype = _scalar_str(tnode)
        if rtype not in ALL_TYPES:
            raise DSLError(f"type not match : [{key}]")
        # $seq/$any are declared by the reference (rule.go:31,38) but
        # unimplemented TODOs there (rule.go:662-663). This engine
        # implements the DECLARED semantics — $seq: a sequence with
        # elements of any type; $any: any value type — documented as
        # exceeding the reference (like $key-reg enforcement).
        rule = Rule(key=key, rule_type=rtype)

    # presence: default required; $optional must be boolean true
    # (rule.go:396-412)
    opt = _mapping_get(value, "$optional")
    if opt is not None:
        if _node_tag(opt) != "!!bool":
            raise DSLError(f"value node must be boolean : [$optional]")
        if opt.value not in ("true", "True", "TRUE"):
            raise DSLError("value for required must be true")
        rule.required = False
    req = _mapping_get(value, "$required")
    if req is not None:
        if _node_tag(req) != "!!bool":
            raise DSLError(f"value node must be boolean : [$required]")
        rule.required = req.value in ("true", "True", "TRUE")

    # $length {$min,$max} (rule.go:570-584)
    ln = _mapping_get(value, "$length")
    if ln is not None and _is_rule_node(ln):
        ln = None  # "$length" used as a data-key rule name
    if ln is not None:
        if not isinstance(ln, yaml.MappingNode):
            raise DSLError("value node must be map : [$length]")
        rule.length_min = _parse_int_directive(ln, "$min")
        rule.length_max = _parse_int_directive(ln, "$max")

    # $reg (rule.go:587-594) — compiled once here for fail-fast parity
    rg = _mapping_get(value, "$reg")
    if rg is not None and _node_tag(rg) == "!!str":
        import re as _re

        try:
            _re.compile(rg.value)
        except _re.error:
            raise DSLError(f"compile regexp error : [$reg]")
        rule.reg = rg.value

    # $key-reg (rule.go:446-456)
    kr = _mapping_get(value, "$key-reg")
    if kr is not None and _node_tag(kr) == "!!str":
        import re as _re

        try:
            _re.compile(kr.value)
        except _re.error:
            raise DSLError(f"compile regexp error : [$key-reg]")
        rule.key_reg = kr.value

    # $of (rule.go:522-538): must be a sequence; every element's tag
    # must equal the field's own type tag, else OfTypeError.
    of = _mapping_get(value, "$of")
    if of is not None and _is_rule_node(of):
        of = None  # "$of" used as a data-key rule name
    if of is not None:
        if not isinstance(of, yaml.SequenceNode):
            raise DSLError(
                f"the type of of [{key}] must be [$seq]"
            )  # ConstraintTypeError rule.go:721-723
        want_tag = yamlmeta.TAG_BY_TYPE.get(rule.rule_type)
        vals: list[str] = []
        for i, el in enumerate(of.value):
            # $any accepts enum elements of any scalar type
            if rule.rule_type != "$any" and _node_tag(el) != want_tag:
                raise DSLError(
                    f"the type of [{key}.{i}] must be [{rule.rule_type}]"
                    ",which is same with field"
                )  # OfTypeError rule.go:725-727
            vals.append(el.value)
        # divergence: store ALL values (reference bug keeps first only,
        # rule.go:533-535)
        rule.of = vals

    # $constraint for $arr (rule.go:480-506)
    if rule.rule_type == "$arr":
        cn = _mapping_get(value, "$constraint")
        if cn is None:
            raise DSLError(f"constraint not found : [{key}]")
        if isinstance(cn, yaml.MappingNode):
            rule.constraint = _parse_rule(key, cn, document=True)
        else:
            cname = _scalar_str(cn)
            if cname not in SCALAR_TYPES:
                raise DSLError(f"the type of of [{key}] must be [$map]")
            rule.constraint = cname

    # engine extensions
    dyn = _mapping_get(value, "$dynamic")
    rule.dynamic = dyn is not None and dyn.value in ("true", "True", "TRUE")
    fmt = _mapping_get(value, "$format")
    if fmt is not None and not _is_rule_node(fmt):
        fname = _scalar_str(fmt)
        if fname not in FORMAT_PATTERNS:
            raise DSLError(
                f"unknown $format [{fname}] : [{key}] (choose from "
                f"{sorted(FORMAT_PATTERNS)})"
            )
        rule.format_ = fname

    uq = _mapping_get(value, "$unique")
    if uq is not None and isinstance(uq, yaml.MappingNode):
        # $unique: {with: [col, ...]} — composite natural key
        w = None
        for k, v in uq.value:
            if k.value == "with" and isinstance(v, yaml.SequenceNode):
                w = [e.value for e in v.value]
        if not w:
            raise DSLError(
                f"$unique map form needs with: [columns] : [{key}]"
            )
        rule.unique_with = w
    else:
        rule.unique = uq is not None and uq.value in ("true", "True", "TRUE")
    for dname, attr in (
        ("$ref", "ref"),
        ("$range", "range"),
        ("$drift", "drift"),
        ("$pii", "pii"),
        ("$assert", "assert_"),
        ("$anomaly", "anomaly"),
        ("$dist", "dist"),
        ("$dupspan", "dupspan"),
        ("$expr", "expr_"),
        ("$fd", "fd"),
        ("$monotonic", "monotonic"),
        ("$reconcile", "reconcile"),
        ("$magic", "magic"),
        ("$when", "when"),
        ("$pixel", "pixel"),
        ("$caption-eq", "caption_eq"),
        ("$vector", "vector"),
        ("$align", "align"),
    ):
        dn = _mapping_get(value, dname)
        if dn is not None and _is_rule_node(dn):
            dn = None  # a child rule named like the directive
        if dn is not None:
            if not isinstance(dn, yaml.MappingNode):
                raise DSLError(f"value node must be map : [{dname}]")
            d = {}
            def _plain(v):
                # sequences (e.g. $drift clip: [0.05, 0.95]) convert
                # element-wise, nested maps (e.g. $dist expected:)
                # key-wise; scalars by their resolved tag
                if isinstance(v, yaml.SequenceNode):
                    return [_plain(e) for e in v.value]
                if isinstance(v, yaml.MappingNode):
                    return {k.value: _plain(e) for k, e in v.value}
                sv = v.value
                tag = _node_tag(v)
                if tag == "!!int":
                    return int(sv, 0)
                if tag == "!!float":
                    return float(sv)
                if tag == "!!bool":
                    return sv in ("true", "True", "TRUE")
                return sv

            for k, v in dn.value:
                d[k.value] = _plain(v)
            setattr(rule, attr, d)
    st = _mapping_get(value, "$stats")
    if st is not None and _is_rule_node(st):
        st = None  # "$stats" used as a data-key rule name
    if st is not None:
        if not isinstance(st, yaml.SequenceNode):
            raise DSLError("the type of of [$stats] must be [$seq]")
        rule.stats = [e.value for e in st.value]

    # children: non-$ keys in document order (rule.go:429-443), plus
    # $-keys that are themselves rules (carry $type) — the reference
    # excludes only the four spec keys from child construction
    for k, v in value.value:
        kname = k.value if isinstance(k, yaml.ScalarNode) else None
        if kname is None:
            continue
        if kname.startswith("$"):
            is_spec = kname in ("$type", "$required", "$optional", "$key-reg")
            if kname == "$constraint" and rule.rule_type == "$arr":
                continue  # already consumed as the element constraint
            if not is_spec and _is_rule_node(v):
                rule.children.append(_parse_rule(kname, v))
                continue
            if kname not in _DIRECTIVES:
                raise DSLError(f"unknown directive : [{kname}]")
            continue
        rule.children.append(_parse_rule(kname, v))

    return rule


def load_rules(text: str) -> RuleSet:
    """Parse a rule document → :class:`RuleSet`.

    Reference lifecycle B (``NewRule``, rule.go:93-120): unmarshal,
    root must be a mapping, two-phase construct+restructure. All DSL
    errors surface here, never at validation time.
    """
    node = yaml.compose(text, Loader=yaml.SafeLoader)
    if node is None:
        raise DSLError("empty rule document")
    if not isinstance(node, yaml.MappingNode):
        raise DSLError("value node must be map : []")
    root = _parse_rule("", node, document=True)
    return RuleSet(root=root)


def load_rules_file(path: str) -> RuleSet:
    with open(path, "r", encoding="utf-8") as f:
        return load_rules(f.read())
