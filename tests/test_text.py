"""Text-analysis functions vs python oracles."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from app_dupfind_spark.functions import text as T

SAMPLES = [
    "",
    "The quick brown fox, and the lazy dog!",
    "der hund und die katze, das ist nicht gut",
    "le chat est dans la maison pour les vacances et le chien",
    "el gato y los perros es una historia que por con",
    "word " * 50,
    "123 456 #!? abc",
    "  spaced   out\t\ttabs\nnewlines  ",
]


def _norm(s: str) -> str:
    return re.sub(r"\s+", " ", s.lower()).strip()


def _toks(s: str) -> list[str]:
    n = _norm(s)
    return [t for t in n.split(" ") if t]


def test_tokens_and_normalize(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], "t string")
    rows = df.select("t", T.tokens(F.col("t")).alias("tok")).collect()
    for r in rows:
        assert list(r["tok"]) == _toks(r["t"]), r["t"]


def test_word_shingles_oracle(spark):
    k = 3
    df = spark.createDataFrame([(s,) for s in SAMPLES], "t string")
    rows = df.select(
        "t", T.word_shingles(T.tokens(F.col("t")), k).alias("sh")
    ).collect()
    for r in rows:
        toks = _toks(r["t"])
        want = []
        seen = set()
        for i in range(len(toks) - k + 1):
            s = " ".join(toks[i : i + k])
            if s not in seen:
                seen.add(s)
                want.append(s)
        if len(toks) < k:
            want = []
        assert list(r["sh"]) == want, r["t"]


def test_lang_id_on_marker_sentences(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], "t string")
    rows = {r["t"]: r["l"] for r in df.select("t", T.lang_id(F.col("t")).alias("l")).collect()}
    assert rows["The quick brown fox, and the lazy dog!"] == "en"
    assert rows["der hund und die katze, das ist nicht gut"] == "de"
    assert rows["le chat est dans la maison pour les vacances et le chien"] == "fr"
    assert rows["el gato y los perros es una historia que por con"] == "es"
    assert rows[""] == "und"
    assert rows["word " * 50] == "und"


def test_fingerprint_matches_python_fold(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], "t string")
    rows = {r["t"]: r["f"] for r in df.select("t", T.fingerprint(F.col("t")).alias("f")).collect()}
    for s in SAMPLES:
        h = 0
        # Spark split('','') yields [''] with ascii('')=0 — same as h=0
        for c in s:
            h = (h * 31 + ord(c)) % T.FINGERPRINT_MOD
        assert rows[s] == h, repr(s)


def test_fingerprint_udf_matches_expression(spark):
    """The vectorized kernel must equal the reference expression for
    every input: ASCII, BMP unicode, ASTRAL codepoints (split('')
    keeps surrogate pairs together and ascii() yields the full
    codepoint value — ADVICE r4: a UTF-16 code-unit fold diverges
    here), empty, null, and chunk-boundary-sized batches."""
    texts = SAMPLES + [
        "",
        "naïve café — π≈3.14159",
        "tab\tnew\nline",
        "x" * 5000,
        None,
        "😀a",                       # the ADVICE r4 counterexample
        "emoji 🎉 mid 😀😀 text 🚀",   # several astral chars, mixed
        "𝕄athematical 𝔸lphanumerics",  # astral letters inside words
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, t string")
    both = df.select(
        "i",
        T.fingerprint(F.col("t")).alias("ref"),
        T.make_fingerprint_udf()(F.col("t")).alias("fast"),
    ).collect()
    for r in both:
        assert r["fast"] == r["ref"], texts[r["i"]]


def test_token_counts(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], "t string")
    rows = df.select(
        "t",
        T.token_count_ws(F.col("t")).alias("ws"),
        T.token_count_subword(F.col("t")).alias("sub"),
    ).collect()
    pat = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
    for r in rows:
        assert r["ws"] == len(_toks(r["t"]))
        assert r["sub"] == len(pat.findall(r["t"]))


def test_quality_score_bounds_and_monotonicity(spark):
    texts = ["", "ok text " * 3, "clean readable words " * 40, "!!!! ???? ####" * 10]
    df = spark.createDataFrame([(s,) for s in texts], "t string")
    rows = {r["t"]: r["q"] for r in df.select("t", T.quality_score(F.col("t")).alias("q")).collect()}
    for v in rows.values():
        assert 0.0 <= v <= 1.0
    assert rows["clean readable words " * 40] > rows["!!!! ???? ####" * 10]
