"""Differential fuzzer for the text repetition/layout signal family
(the Gopher rules: functions/text.py sorted_run_stats / line_array /
SYMBOL_PATTERN, as carried by the ``text_profile`` query): random
documents assembled from repetition-heavy parts are profiled by the
REAL carrier (through a temp parquet ``documents`` table, exactly the
driver's path) and by a pure-Python reference of the documented
definitions.  Every ratio is a single IEEE division of exact integers,
so comparison is bit-exact — no epsilon.

Generator notes: whitespace is restricted to space/tab/LF/CRLF — Java
``\\s`` includes \\x0B where RE2's does not, and Python's is
Unicode-wide; the tokenizer contract (text.py header) is defined over
ASCII whitespace corpora.
"""

from __future__ import annotations

import random
import re
import shutil
import tempfile
from collections import Counter

_WORDS = ["the", "foo", "bar", "baz", "qux", "α", "β", "统计", "a", "bb", "#tag"]
_BULLETS = ["- ", "-", "* ", "• ", "*"]
_TAILS = ["...", "…", " ...", ".", ""]


def _line(rng: random.Random) -> str:
    words = [rng.choice(_WORDS) for _ in range(rng.randint(1, 6))]
    sep = rng.choice([" ", " ", "\t", "  "])
    body = sep.join(words)
    if rng.random() < 0.3:
        body = rng.choice(_BULLETS) + body
    if rng.random() < 0.3:
        body += rng.choice(_TAILS)
    if rng.random() < 0.2:
        body = " " * rng.randint(1, 3) + body + " " * rng.randint(0, 2)
    return body


def _doc(rng: random.Random) -> str:
    r = rng.random()
    if r < 0.04:
        return rng.choice(["", " ", "   ", "\n", "\n\n", "...", "…", "#", "🜁"])
    lines: list[str] = []
    for _ in range(rng.randint(1, 8)):
        if lines and rng.random() < 0.35:
            lines.append(rng.choice(lines))  # duplicate a prior line
        elif rng.random() < 0.15:
            lines.append(rng.choice(["", "  "]))  # blank line
        else:
            lines.append(_line(rng))
    if rng.random() < 0.3:  # degenerate n-gram repetition block
        phrase = " ".join(rng.choice(_WORDS) for _ in range(rng.randint(2, 6)))
        lines.append(" ".join([phrase] * rng.randint(2, 5)))
    joiner = "\r\n" if rng.random() < 0.2 else "\n"
    return joiner.join(lines)


# -- pure-Python reference of the documented definitions ---------------------

_JAVA_WS = r"[ \t\n\x0B\f\r]+"


def _ref(text: str) -> dict:
    toks = [t for t in re.split(_JAVA_WS, text) if t]
    lines = [
        s
        for s in (l.strip(" ") for l in re.split(r"\r?\n", text))
        if s != ""
    ]

    def grams(n: int) -> list[str]:
        if len(toks) < n:
            return []
        return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]

    g2, g5 = Counter(grams(2)), Counter(grams(5))
    ng2, nd2 = sum(g2.values()), len(g2)
    top2 = max(g2.values(), default=0)
    top2_chars = max((c * len(g) for g, c in g2.items()), default=0)
    dup5_chars = sum(c * len(g) for g, c in g5.items() if c > 1)
    lc = Counter(lines)
    tot_l = sum(len(l) for l in lines)
    dup_l = sum(c * len(l) for l, c in lc.items() if c > 1)
    n_chars, n_tok, n_lines = len(text), len(toks), len(lines)
    n_bul = sum(1 for l in lines if re.search(r"^[-*•]", l))
    n_ell = sum(1 for l in lines if re.search(r"(\.\.\.|…)\Z", l))
    n_sym = len(re.findall(r"#|\.\.\.|…", text))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tok,
        "n_lines": n_lines,
        "dup_frac": 1.0 - nd2 / ng2 if ng2 else 0.0,
        "top_frac": top2 / ng2 if ng2 else 0.0,
        "top_gram_char_frac": top2_chars / n_chars if n_chars else 0.0,
        "dup_gram_char_frac": dup5_chars / n_chars if n_chars else 0.0,
        "dup_line_frac": 1.0 - len(lc) / n_lines if n_lines else 0.0,
        "dup_line_char_frac": dup_l / tot_l if tot_l else 0.0,
        "bullet_line_frac": n_bul / n_lines if n_lines else 0.0,
        "ellipsis_line_frac": n_ell / n_lines if n_lines else 0.0,
        "symbol_word_ratio": n_sym / n_tok if n_tok else 0.0,
    }


def test_text_profile_matches_reference(spark):
    import __spark_entry__ as entry

    rng = random.Random(0x7E87)
    docs = [(i, _doc(rng)) for i in range(150)]
    tmp = tempfile.mkdtemp(prefix="textfuzz_")
    try:
        spark.createDataFrame(docs, "doc_id long, text string").write.mode(
            "overwrite"
        ).parquet(f"{tmp}/documents.parquet")
        got = {
            r["doc_id"]: r.asDict()
            for r in entry.queries()["text_profile"](spark, tmp).collect()
        }
        assert len(got) == len(docs)
        failures = []
        for doc_id, text in docs:
            want = _ref(text)
            have = got[doc_id]
            for col, w in want.items():
                if have[col] != w:
                    failures.append(
                        f"doc {doc_id} {col}: spark={have[col]!r} "
                        f"ref={w!r} text={text!r}"
                    )
        assert not failures, "\n".join(failures[:20])
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
