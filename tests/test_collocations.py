"""Operator semantics for corpus.collocations (word2vec phrase score in
staged integer arithmetic). Cross-engine value parity lives in
tests/test_oracle_parity.py / test_oracle_edge.py ("collocations"); these
tests pin the staged-division definition against a pure-Python replay —
the staging (DIV c_a first, then * N DIV c_b) is the operator's exact
definition, NOT an approximation of the single-expression form."""

from __future__ import annotations

from collections import Counter

from samu_ocr_extraction_poc_spark.operators import corpus as C


def _py_collocations(texts, n_tokens, delta=5, min_count=5, scale=10**4):
    uni, pairs = Counter(), Counter()
    for t in texts:
        ws = [w for w in "".join(
            ch if ch.isalnum() else " " for ch in t.lower()).split() if w]
        uni.update(ws)
        pairs.update(zip(ws, ws[1:]))
    out = []
    for (a, b), c_ab in pairs.items():
        if c_ab < min_count:
            continue
        # staged integer form — trunc toward zero matches Spark DIV /
        # DuckDB // (all operands non-negative here)
        t = ((c_ab - delta) * scale) // uni[a]
        out.append((a, b, c_ab, uni[a], uni[b], (t * n_tokens) // uni[b]))
    return sorted(out, key=lambda r: (-r[5], r[0], r[1]))


def test_collocations_match_python_replay(spark):
    texts = [
        "new york new york city hall",
        "new york is not old york",
        "the city hall of new york",
        "city hall city hall city hall",
        "new york new york new york",
    ] * 3
    n_tokens = sum(len(t.split()) for t in texts)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [tuple(r) for r in
           C.collocations(df, n_tokens=n_tokens, top_k=100).collect()]
    assert got == _py_collocations(texts, n_tokens)
    # the discriminative pair must outrank the ubiquitous-word pair
    names = [(r[0], r[1]) for r in got]
    assert names.index(("city", "hall")) < names.index(("new", "york"))


def test_collocations_staging_differs_from_naive_form(spark):
    # pin that the STAGED form is what both engines compute: with these
    # counts the naive single-expression score would differ by rounding.
    texts = ["a b a b a b a b a b c c c"]
    n = 13
    df = spark.createDataFrame([(0, texts[0])], "doc_id long, text string")
    rows = {(r.w1, r.w2): r.score for r in
            C.collocations(df, n_tokens=n, delta=1, min_count=2).collect()}
    # c_ab(a,b)=5, c_a=5, c_b=5: t=(4*10000)//5=8000; score=8000*13//5=20800
    assert rows[("a", "b")] == 20800
    # naive ((4*13*10000)//(5*5)) would give 20800 here but t truncation
    # bites for (b,a): c_ab=4, c_a=5 -> t=(3*10000)//5=6000 -> 6000*13//5
    assert rows[("b", "a")] == (((3 * 10**4) // 5) * 13) // 5
