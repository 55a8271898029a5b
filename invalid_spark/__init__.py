"""invalid_spark — a from-scratch PySpark-native schema + constraint
validation engine.

Generalizes the rule semantics of the reference YAML validator
(xuchangeu/invalid, Go — see SURVEY.md) to DataFrame scale:

- rules are metadata, compiled once on the driver into Catalyst
  ``Column`` predicates (mirrors compile-once regexes at
  reference rule.go:451,589);
- one table scan evaluates all row-local checks in a single
  whole-stage-codegen projection;
- aggregate checks (stats, uniqueness), join checks (referential),
  drift checks (KS / chi-square across snapshots) and vectorized
  Arrow UDF checks (pixel decode / PSNR / caption equality) run as
  separate stages over column-pruned reads;
- violations, per-partition verdicts and metrics land in result
  tables; runs are resumable from a checkpoint manifest.

No code is ported from the reference; architecture is Spark-first.
"""

__version__ = "0.1.0"

from invalid_spark.dsl import DSLError, Rule, RuleSet, load_rules  # noqa: F401
from invalid_spark.model import ErrorType, VIOLATION_SCHEMA  # noqa: F401
