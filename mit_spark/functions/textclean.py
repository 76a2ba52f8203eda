"""Boilerplate/mask-strip stage for kind='text' spans (north rule).

The reference has no string functions (image-only engine, SURVEY.md §2.7);
this stage is defined by the north rule's HTML boilerplate strip. ONE
pattern list drives three implementations that must agree exactly:
  * clean_text_col — Spark Catalyst expressions (JVM, whole-stage codegen;
    the pipeline's text branch never touches Python),
  * clean_text_py  — python re (the single-process oracle),
  * clean_text_sql — ANSI/DuckDB SQL (the driver's correctness oracle).
All three engines (Java regex, python re, RE2) support the constructs used
here: (?s) dotall, non-greedy .*?, alternation, non-capturing groups —
deliberately NO backreferences (RE2 has none).

Fused to TWO passes (was five): each regexp_replace scans the whole span,
so pass count is the text branch's cost multiplier at 10^12 docs.
  pass 1: the three boilerplate blocks as one alternation — leftmost-first
          matching across alternatives replaces the old sequential
          per-pattern order (identical on well-formed markup; the single
          shared pattern list keeps all three engines agreeing on ANY
          input, which is what oracle equality needs);
  pass 2: ``(?:<[^>]*>|[ \t\n\r])+ -> " "`` — a maximal run of tags and
          whitespace collapses to one space, provably equal to the old
          tag->space pass followed by whitespace-collapse (non-tag,
          non-ws characters are untouched by both).
"""

from __future__ import annotations

import re

# (pattern, replacement) applied in order, then trim
BOILERPLATE_PATTERNS: list[tuple[str, str]] = [
    (r"(?s)<nav>.*?</nav>|<script>.*?</script>|<footer>.*?</footer>", " "),
    (r"(?:<[^>]*>|[ \t\n\r])+", " "),
]


def clean_text_py(s: str) -> str:
    for pat, rep in BOILERPLATE_PATTERNS:
        s = re.sub(pat, rep, s)
    return s.strip()


def clean_text_col(col):
    """Spark Column expression pipeline (built-ins only — no UDF)."""
    from pyspark.sql import functions as F

    out = col
    for pat, rep in BOILERPLATE_PATTERNS:
        out = F.regexp_replace(out, pat, rep)
    return F.trim(out)


def clean_text_sql(expr: str) -> str:
    """DuckDB SQL expression computing the same cleaning over ``expr``."""
    out = expr
    for pat, rep in BOILERPLATE_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{rep}', 'g')"
    return f"trim({out})"
