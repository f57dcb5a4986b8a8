"""HTML -> text extraction as pure JVM expressions.

Web-crawl corpora arrive as HTML; the extraction step (strip
script/style, drop tags, decode entities, normalize whitespace) is
usually delegated to a Python library per document — a 100 TB
scale-killer.  This is the expression-only formulation: one chain of
``regexp_replace`` calls that runs inside whole-stage codegen, scans
each document a constant number of times, and uses only RE2-safe
syntax (no backreferences, no lookaround) so the DuckDB oracle runs the
IDENTICAL patterns.

This is extraction, not rendering: a trafilatura-grade boilerplate
model (DOM weights, link density) is out of scope — downstream quality
operators (`functions/text.quality_features`, `corpus.repetition_stats`,
`corpus.compression_ratio`) are the boilerplate gate in this pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tags whose removal should break the line (block-level)
_BLOCK = (
    "p|div|br|li|tr|td|th|h1|h2|h3|h4|h5|h6|table|ul|ol|blockquote|"
    "section|article|header|footer|pre|hr"
)

#: (pattern, replacement) applied in order — all RE2-and-Java-safe
HTML_STEPS: list[tuple[str, str]] = [
    # script/style/noscript payloads vanish entirely
    (r"(?is)<script\b[^>]*>.*?</script>", " "),
    (r"(?is)<style\b[^>]*>.*?</style>", " "),
    (r"(?is)<noscript\b[^>]*>.*?</noscript>", " "),
    (r"(?s)<!--.*?-->", " "),
    # block-level tags become newlines, every other tag a space
    (rf"(?i)</?(?:{_BLOCK})\b[^>]*>", "\n"),
    (r"<[^>]*>", " "),
    # the five XML entities + nbsp (RE2 has no computed replacements,
    # so named entities are enumerated, not generic).  `&amp;` decodes
    # LAST: decoding it first would turn `&amp;lt;` into `&lt;` and then
    # into `<`, double-decoding escaped markup into real markup.
    (r"&nbsp;", " "),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", "\""),
    (r"&#39;", "'"),
    (r"&amp;", "&"),
    # whitespace: runs containing a newline collapse to one newline,
    # other runs to one space; trim
    (r"[ \t\r]+", " "),
    (r" ?\n[ \n]*", "\n"),
    (r"^\n+|\n+$", ""),
]


def html_to_text(col: Column) -> Column:
    """Visible text of an HTML document (see module doc)."""
    out = col
    for pattern, repl in HTML_STEPS:
        out = F.regexp_replace(out, pattern, repl)
    return F.trim(out)


def html_to_text_sql(expr: str) -> str:
    """The DuckDB twin: the same steps over ``expr`` as a SQL string.
    DuckDB's plain ``''`` literals keep backslashes raw (matching the
    Python pattern strings verbatim), and a replacement newline is
    embedded as an actual newline character — RE2 rewrite strings have
    no ``\\n`` escape."""
    out = expr
    for pattern, repl in HTML_STEPS:
        p = pattern.replace("'", "''")
        r = repl.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{r}', 'g')"
    return f"trim({out})"
