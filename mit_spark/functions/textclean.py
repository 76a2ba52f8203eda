"""Boilerplate/mask-strip stage for kind='text' spans (north rule).

The reference has no string functions (image-only engine, SURVEY.md §2.7);
this stage is defined by the north rule's HTML boilerplate strip. ONE
pattern list drives three implementations that must agree exactly:
  * clean_text_col — Spark Catalyst expressions (JVM, whole-stage codegen;
    the pipeline's text branch never touches Python),
  * clean_text_py  — python re (the single-process oracle),
  * clean_text_sql — ANSI/DuckDB SQL (the driver's correctness oracle).
All three engines (Java regex, python re, RE2) support the constructs used
here: (?s) dotall, non-greedy .*?, character classes.
"""

from __future__ import annotations

import re

# (pattern, replacement) applied in order, then whitespace-collapse + trim
BOILERPLATE_PATTERNS: list[tuple[str, str]] = [
    (r"(?s)<nav>.*?</nav>", " "),
    (r"(?s)<script>.*?</script>", " "),
    (r"(?s)<footer>.*?</footer>", " "),
    (r"<[^>]*>", " "),
]
_WS = (r"[ \t\n\r]+", " ")


def clean_text_py(s: str) -> str:
    for pat, rep in BOILERPLATE_PATTERNS:
        s = re.sub(pat, rep, s)
    s = re.sub(_WS[0], _WS[1], s)
    return s.strip()


def clean_text_col(col):
    """Spark Column expression pipeline (built-ins only — no UDF)."""
    from pyspark.sql import functions as F

    out = col
    for pat, rep in BOILERPLATE_PATTERNS:
        out = F.regexp_replace(out, pat, rep)
    out = F.regexp_replace(out, _WS[0], _WS[1])
    return F.trim(out)


def clean_text_sql(expr: str) -> str:
    """DuckDB SQL expression computing the same cleaning over ``expr``."""
    out = expr
    for pat, rep in BOILERPLATE_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{rep}', 'g')"
    out = f"regexp_replace({out}, '{_WS[0]}', '{_WS[1]}', 'g')"
    return f"trim({out})"
