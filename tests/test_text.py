from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from kafi_spark.functions import text
from tests.conftest import rows


@pytest.fixture(scope="module")
def docs(spark):
    data = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "der Hund und die Katze ist da"),
        (3, ""),
        (4, "12345 67890"),
    ]
    return spark.createDataFrame(data, "doc_id long, text string")


def test_token_count(docs):
    out = docs.select("doc_id", text.token_count(F.col("text")).alias("n"))
    assert rows(out) == [(1, 9), (2, 7), (3, 0), (4, 2)]


def test_char_count(docs):
    out = docs.select("doc_id", text.char_count(F.col("text")).alias("n"))
    got = dict(rows(out))
    assert got[1] == len("the quick brown fox jumps over the lazy dog")
    assert got[3] == 0


def test_fingerprint_md5(docs):
    out = dict(rows(docs.select("doc_id", text.fingerprint_md5(F.col("text")).alias("f"))))
    expected = hashlib.md5(b"the quick brown fox jumps over the lazy dog").hexdigest()
    assert out[1] == expected


def test_quality_features(docs, spark):
    f = text.quality_features(F.col("text"))
    r = {x["doc_id"]: x for x in docs.select(
        "doc_id", f["n_words"].alias("n_words"), f["stopword_ratio"].alias("sr"),
        f["digit_ratio"].alias("dr")).collect()}
    assert r[1]["n_words"] == 9
    assert r[1]["sr"] == pytest.approx(2 / 9)  # 'the' x2 over 9 words
    assert r[4]["dr"] == pytest.approx(10 / 11)


def test_quality_score_range(docs):
    out = docs.select(text.quality_score(F.col("text")).alias("q")).collect()
    for r in out:
        assert 0.0 <= r.q <= 1.0


def test_langid(docs):
    out = dict(rows(docs.select("doc_id", text.langid(F.col("text")).alias("lang"))))
    assert out[1] == "en"
    assert out[2] == "de"
    assert out[3] == "und"


def test_bpe_token_estimate_monotonic(spark):
    df = spark.createDataFrame([(1, "hi"), (2, "internationalization token")],
                               "id long, text string")
    got = dict(rows(df.select("id", text.bpe_token_estimate(F.col("text")).alias("n"))))
    assert got[2] > got[1] > 0


def test_text_stats_shape(docs):
    out = text.text_stats(docs)
    assert out.count() == 4
    assert set(out.columns) == {
        "doc_id", "n_tokens", "n_chars", "fingerprint", "avg_word_len",
        "punct_ratio", "stopword_ratio", "quality", "lang_guess",
    }


def test_redact_pii_all_kinds(spark):
    from kafi_spark.functions.text import redact_pii

    df = spark.createDataFrame(
        [
            ("mail me at jo.doe+x@example.co.uk please",),
            ("card 4111 1111 1111 1111 expires soon",),
            ("call +1 (555) 123-4567 or 030-1234-5678",),
            ("server at 192.168.0.1 port 80",),
            ("clean text stays clean",),
        ],
        "text string",
    )
    out = [r[0] for r in df.select(redact_pii(F.col("text"))).collect()]
    assert out[0] == "mail me at <EMAIL> please"
    assert out[1] == "card <CC> expires soon"
    assert "<PHONE>" in out[2] and "555" not in out[2]
    assert out[3] == "server at <IP> port 80"
    assert out[4] == "clean text stays clean"


def test_redact_pii_subset_and_validation(spark):
    import pytest as _pytest

    from kafi_spark.functions.text import redact_pii

    df = spark.createDataFrame([("a@b.com at 10.0.0.1",)], "text string")
    only_email = df.select(redact_pii(F.col("text"), kinds=["email"])).first()[0]
    assert only_email == "<EMAIL> at 10.0.0.1"
    with _pytest.raises(ValueError):
        redact_pii(F.col("text"), kinds=["ssn"])


def test_normalize_text(spark):
    from kafi_spark.functions.text import normalize_text

    df = spark.createDataFrame(
        [("  Hello,   WORLD!  \n\tbye ",), ("same text",)], "text string"
    )
    out = [r[0] for r in df.select(normalize_text(F.col("text"))).collect()]
    assert out == ["hello, world! bye", "same text"]
    stripped = [
        r[0]
        for r in df.select(
            normalize_text(F.col("text"), strip_punct=True)
        ).collect()
    ]
    assert stripped == ["hello world bye", "same text"]


def test_normalize_then_exact_dedup_merges_variants(spark):
    from kafi_spark.functions.dedup import dedup_exact
    from kafi_spark.functions.text import normalize_text

    df = spark.createDataFrame(
        [(1, "The  Cat"), (2, "the cat"), (3, "a dog")], "doc_id long, text string"
    )
    norm = df.withColumn("text", normalize_text(F.col("text")))
    groups = dedup_exact(norm, "text", "doc_id")
    assert groups.count() == 2  # both cat variants share one fingerprint


def test_repetition_stats_fixed(spark):
    """Hand-computed repetition fractions on a crafted doc."""
    from kafi_spark.functions.text import repetition_stats

    # "a b a b a b": 2-grams at positions 1..5 = [a b, b a, a b, b a, a b]
    # counts: "a b" x3, "b a" x2; chars = 11
    df = spark.createDataFrame([(1, "a b a b a b")], "doc_id long, text string")
    out = {
        (r.doc_id, r.n): (r.top_ngram_char_frac, r.dup_ngram_char_frac)
        for r in repetition_stats(df, ns=(2,)).collect()
    }
    top, dup = out[(1, 2)]
    assert top == pytest.approx(3 * 3 / 11)          # "a b" covers 9 chars
    assert dup == pytest.approx((3 * 3 + 2 * 3) / 11)  # both grams repeat


def test_repetition_stats_no_repeats_and_short_docs(spark):
    from kafi_spark.functions.text import repetition_stats

    df = spark.createDataFrame(
        [(1, "all words are different here"), (2, "x")],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.n): (r.top_ngram_char_frac, r.dup_ngram_char_frac)
        for r in repetition_stats(df, ns=(2, 3)).collect()
    }
    for n in (2, 3):
        assert got[(1, n)][1] == 0.0          # nothing duplicated
        assert 0 < got[(1, n)][0] < 1
        # doc shorter than n words: its full text is the single gram
        assert got[(2, n)] == (1.0, 0.0)


def test_repetition_stats_matches_duckdb(spark, sf_dir):
    import duckdb

    from kafi_spark.functions.text import repetition_stats
    from kafi_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents")
    got = sorted(
        (r.doc_id, r.n, round(r.top_ngram_char_frac, 12),
         round(r.dup_ngram_char_frac, 12))
        for r in repetition_stats(docs, ns=(2, 3)).collect()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = sorted(
        (d, n, round(t, 12), round(u, 12))
        for d, n, t, u in con.sql(
            r"""
            WITH w AS (
              SELECT doc_id, regexp_extract_all(text, '\S+') AS ws,
                     length(trim(text)) AS chars
              FROM documents
            ),
            nn AS (SELECT * FROM w, (SELECT unnest([2, 3]) AS n)),
            g AS (
              SELECT doc_id, n, chars,
                     unnest(list_transform(
                       range(0, greatest(len(ws) - n, 0) + 1),
                       i -> array_to_string(ws[i+1:i+n], ' '))) AS gram
              FROM nn
            ),
            c AS (
              SELECT doc_id, n, chars, gram, count(*) AS cnt
              FROM g GROUP BY ALL
            )
            SELECT doc_id, CAST(n AS BIGINT) AS n,
                   CAST(max(cnt * length(gram)) AS DOUBLE)
                     / greatest(chars, 1) AS top_ngram_char_frac,
                   CAST(sum(CASE WHEN cnt > 1 THEN cnt * length(gram)
                            ELSE 0 END) AS DOUBLE)
                     / greatest(chars, 1) AS dup_ngram_char_frac
            FROM c GROUP BY doc_id, n, chars
            """
        ).fetchall()
    )
    assert got == want


def test_rolling_hash_fingerprint_matches_python_oracle(spark):
    """Byte-faithful polynomial hash: matches a pure-Python fold over the
    UTF-8 bytes, including multi-byte characters (the earlier ascii()-
    based reader was lossy there) and the empty string."""
    from kafi_spark.functions.text import rolling_hash_fingerprint

    def py_roll(s: str, base: int = 257, mod: int = (1 << 61) - 1) -> int:
        h = 0
        for b in s.encode("utf-8"):
            h = (h * base + b) % mod
        return h

    samples = ["", "a", "hello world", "é漢字🙂", "the same", "the same",
               "\t spaced \n", "ASCII only 123"]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(samples)] + [(99, None)],
        "i long, text string",
    )
    got = dict(
        rows(df.select("i", rolling_hash_fingerprint(F.col("text")).alias("h")))
    )
    assert got.pop(99) is None  # null text -> null, NOT the empty hash
    assert got == {i: py_roll(s) for i, s in enumerate(samples)}


def test_repetition_stats_null_text_rows_drop(spark):
    """Null texts produce no gram rows (explode of null) and therefore no
    output rows — documented degradation, not an error."""
    from kafi_spark.functions.text import repetition_stats

    df = spark.createDataFrame(
        [(1, None), (2, "a a a")], "doc_id long, text string"
    )
    got = {(r.doc_id, r.n) for r in repetition_stats(df, ns=(2,)).collect()}
    assert got == {(2, 2)}


def test_strip_html(spark):
    from kafi_spark.functions.text import strip_html

    df = spark.createDataFrame(
        [("<html><head><style>p{color:red}</style>"
          "<script>var x=1;</script></head>"
          "<body><h1>Title</h1><!-- nav -->"
          "<p>Hello &amp; welcome to <b>the</b>&nbsp;page</p></body></html>",),
         ("plain text, no markup",),
         ("a &lt;tag&gt; literal",)],
        "html string")
    got = [r.t for r in df.select(strip_html(F.col("html")).alias("t")).collect()]
    assert got[0] == "Title Hello & welcome to the page"
    assert got[1] == "plain text, no markup"
    assert got[2] == "a <tag> literal"


def test_strip_html_matches_duckdb(spark, sf_dir):
    """The regex chain replays in DuckDB: same tags out, same entities
    decoded — differential over synthesized markup wrapping real docs."""
    import duckdb

    from kafi_spark.functions.text import strip_html

    df = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50).select(
        "doc_id",
        F.concat(F.lit("<p>"), "text", F.lit(" &amp; more</p>")).alias("html"))
    got = {r.doc_id: r.t
           for r in df.select("doc_id", strip_html(F.col("html")).alias("t")).collect()}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    want = {r[0]: r[1] for r in con.sql("""
        SELECT doc_id, trim(regexp_replace(
                 regexp_replace(
                   regexp_replace('<p>' || text || ' &amp; more</p>',
                                  '<[^>]+>', ' ', 'gs'),
                   '&amp;', '&', 'g'),
                 '\\s+', ' ', 'g'))
        FROM documents LIMIT 50
    """).fetchall()}
    assert got == want


def test_url_extraction_and_domains(spark):
    from kafi_spark.functions.text import (
        domain_stats, extract_urls, filter_blocklisted_domains, url_domain)

    df = spark.createDataFrame(
        [(1, "see https://WWW.Example.com:8080/p?q=1 and http://a.b.org/x."),
         (2, "no links here"),
         (3, "bad https://spam.example.com/page plus https://ok.net, done")],
        "doc_id long, text string")
    urls = {r.doc_id: r.u for r in df.select(
        "doc_id", extract_urls(F.col("text")).alias("u")).collect()}
    # trailing sentence punctuation stripped, port/case kept in raw URL
    assert urls[1] == ["https://WWW.Example.com:8080/p?q=1", "http://a.b.org/x"]
    assert urls[2] == []
    assert urls[3] == ["https://spam.example.com/page", "https://ok.net"]

    d = df.select(url_domain(F.lit("https://User@WWW.Ex.com:8080/p")).alias("d")).first()
    assert d.d == "www.ex.com"
    assert df.select(url_domain(F.lit("not a url")).alias("d")).first().d is None

    stats = {r.domain: (r.n_urls, r.n_docs) for r in domain_stats(df).collect()}
    assert stats == {"www.example.com": (1, 1), "a.b.org": (1, 1),
                     "spam.example.com": (1, 1), "ok.net": (1, 1)}

    # suffix blocklisting drops doc 1 (exact) and doc 3 (subdomain)
    kept = sorted(r.doc_id for r in
                  filter_blocklisted_domains(df, ["example.com"]).collect())
    assert kept == [2]


def test_gopher_rules_and_filter(spark):
    from kafi_spark.functions.text import gopher_filter

    good = ("the quick brown fox jumps over the lazy dog and it is a fine day "
            "in the park to walk and see the sights of it all ") * 3  # >50 words
    short = "too short to pass"
    bullets = "\n".join(f"- item {i} of the list and it is here" for i in range(10))
    symbols = " ".join(["@#$% 123 !!!"] * 30)
    df = spark.createDataFrame(
        [(1, good), (2, short), (3, bullets), (4, symbols)],
        "doc_id long, text string")
    kept = sorted(r.doc_id for r in gopher_filter(df).collect())
    assert 1 in kept
    assert 2 not in kept          # word-count floor
    assert 4 not in kept          # alphabetic-word floor
    flags = {r.doc_id: r for r in gopher_filter(df, keep_flags=True).collect()}
    assert flags[2].word_count_ok is False
    assert flags[4].alpha_ok is False
    assert flags[1].stopwords_ok is True
    # bullet doc: every line starts with a bullet -> bullet_ok False
    assert flags[3].bullet_ok is False


def test_redact_pii_ip_not_phone_and_stopwords_case(spark):
    """Round-6 review: (1) the phone pattern consumed dotted quads with
    3-digit tail octets before the ipv4 pattern saw them; (2) stopwords
    count case-insensitively (sentence-initial The/It)."""
    from kafi_spark.functions.text import quality_features, redact_pii

    df = spark.createDataFrame(
        [("reach 10.234.156.189 now",)], "t string")
    out = df.select(redact_pii(F.col("t")).alias("r")).first()["r"]
    assert out == "reach <IP> now"
    qf = quality_features(F.col("t"))
    got = spark.createDataFrame(
        [("The cat and The dog. It is fine.",)], "t string"
    ).select(qf["stopword_ratio"].alias("s")).first()["s"]
    assert got == 5 / 8  # The, and, The, It, is


def test_words_of_token_count_equal_python_split(spark):
    """Round-9 unification pin: the COUNTING tokenizer (words_of /
    token_count) now frames through ws_tokens, so it must equal Python's
    str.split() — which splits on every whitespace class and drops empty
    edge tokens — for any ASCII-whitespace input, including the \n/\t-
    edged docs the old F.trim-based form miscounted by one (the retired
    phantom-token quirk). Known boundary, NOT under test: Java and
    DuckDB-RE2 both treat \s as ASCII-only, so the engine and its
    oracles agree with each other but split U+3000-style unicode spaces
    differently from Python's unicode-aware str.split(). Nulls:
    words_of → [], token_count → 0."""
    data = [
        (1, "alpha beta gamma"),
        (2, "alpha beta gamma\n"),
        (3, "\t alpha  beta\r\ngamma \n"),   # every ASCII ws class + runs
        (4, ""),
        (5, "   \n\t  "),
        (6, None),
        (7, "one"),
    ]
    df = spark.createDataFrame(data, "doc_id long, text string")
    out = {r.doc_id: (r.w, r.n, r.wl) for r in df.select(
        "doc_id",
        text.words_of(F.col("text")).alias("w"),
        text.token_count(F.col("text")).alias("n"),
        text.words_of(F.col("text"), lowercase=True).alias("wl"),
    ).collect()}
    for doc_id, t in data:
        expect = t.split() if t is not None else []
        got_w, got_n, got_wl = out[doc_id]
        assert got_w == expect, (doc_id, got_w, expect)
        assert got_n == len(expect), (doc_id, got_n)
        assert got_wl == [w.lower() for w in expect], (doc_id, got_wl)


def test_text_stats_n_tokens_matches_token_count_on_edge_whitespace(spark):
    """Round-9 self-review: text_stats kept the trim-based "\\s+ runs
    + 1" n_tokens after the oracles moved to the ws_tokens definition —
    'alpha beta\\n' counted 3, '\\n' counted 2. n_tokens (which also
    feeds avg_word_len/stopword_ratio/quality) must equal token_count
    (= ws_tokens size = Python str.split length) on every shape."""
    df = spark.createDataFrame(
        [(1, "alpha beta\n"), (2, "\n"), (3, "\t a  b \r\n"), (4, ""),
         (5, None), (6, "plain text")],
        "doc_id long, text string")
    out = {r.doc_id: (r.n_tokens, r.tc) for r in text.text_stats(df)
           .join(df.select("doc_id", text.token_count(F.col("text"))
                           .alias("tc")), "doc_id").collect()}
    data = {1: "alpha beta\n", 2: "\n", 3: "\t a  b \r\n", 4: "",
            5: None, 6: "plain text"}
    for doc_id, (nt, tc) in out.items():
        expect = len(data[doc_id].split()) if data[doc_id] else 0
        assert nt == tc == expect, (doc_id, nt, tc, expect)


def test_gram_concat_equals_join_slice_all_widths(spark):
    """r12 expression diet: the whole gram/shingle family moved from
    ``array_join(slice(words, i+1, k), " ")`` to
    ``gram_concat(words, i, k)`` (k 0-based ``get`` loads + one
    ``concat_ws``). Pin bit-equality of the two forms over every k the
    engine uses (1..8) on adversarial token shapes: doc shorter than k,
    doc length == k, multi-whitespace edges, unicode, single token,
    empty and null text. A divergence here would silently shift every
    dedup/DSIR/span fingerprint."""
    docs = [
        (1, "a b c d e f g h i j"),
        (2, "a"),
        (3, "a b"),
        (4, "  padded   with\tmixed\n whitespace  "),
        (5, "uni код 中文 mixé tokens"),
        (6, ""),
        (8, "x " * 50),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    # null text excluded here: over a NULL words array the two forms
    # deliberately diverge (slice→null gram, concat_ws→''), and every
    # caller filters null/zero-token docs before gram construction —
    # pinned separately below
    bound = df.select(
        "doc_id", text.ws_tokens(F.col("text")).alias("__words"))
    # factory keeps each transform lambda UNARY — a `lambda i, k=k:`
    # default raises transform's arity to 2 and the element INDEX is
    # passed as k (the exact trap importance.gram_expr documents)
    def forms(k):
        seq = F.sequence(
            F.lit(0), F.greatest(F.size("__words") - k, F.lit(0)))
        old = F.transform(
            seq, lambda i: F.array_join(F.slice("__words", i + 1, k), " "))
        new = F.transform(seq, lambda i: text.gram_concat("__words", i, k))
        return old, new

    for k in range(1, 9):
        old, new = forms(k)
        rows = bound.select("doc_id", old.alias("o"), new.alias("n")).collect()
        for r in rows:
            assert r.o == r.n, (k, r.doc_id, r.o, r.n)


def test_gram_concat_null_array_divergence_is_guarded(spark):
    """The one shape where gram_concat diverges from join(slice) — a
    NULL token array — must yield '' (concat_ws semantics), and the
    gram-family entry points must keep filtering null-text docs out
    BEFORE gram construction so the divergence never reaches data."""
    from kafi_spark.functions.dedup import shingles
    from kafi_spark.functions.spans import text_spans

    df = spark.createDataFrame(
        [(1, None), (2, "a b c")], "doc_id long, text string")
    row = df.select(
        text.gram_concat(text.ws_tokens(F.col("text")), F.lit(0), 3)
        .alias("g")).filter(F.col("doc_id").isNull() if False else
                            F.col("text").isNull()).collect()
    assert [r.g for r in row] == [""]
    # null docs emit NO grams from the guarded entry points
    assert shingles(df, "text", "doc_id", k=3).filter(
        F.col("doc_id") == 1).count() == 0
    assert text_spans(df, "text", "doc_id").filter(
        F.col("doc_id") == 1).count() == 0
