"""Text-analysis and vector functions."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from rds_to_snowflake_etl_a_lakehouse_pipeline_spark import functions as lf


def test_token_count_edges(spark):
    df = spark.createDataFrame(
        [("a b c",), ("  a   b  ",), ("",), ("   ",), (None,)], ["text"]
    )
    out = df.select(lf.token_count("text").alias("n")).collect()
    assert [r["n"] for r in out] == [3, 2, 0, 0, None]


def test_language_id_markers(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog is here",),
            ("der hund und das ist gut",),
            ("xyzzy qwerty",),
        ],
        ["text"],
    )
    out = df.select(lf.language_id("text").alias("lang")).collect()
    assert [r["lang"] for r in out] == ["en", "de", "und"]


def test_quality_score_bounds(spark):
    df = spark.createDataFrame([("Pure words only here",), ("",), (None,)], ["text"])
    out = df.select(lf.quality_score("text").alias("q")).collect()
    assert 0.0 <= out[0]["q"] <= 1.0
    assert out[1]["q"] == 0.0
    assert out[2]["q"] == 0.0


def test_doc_fingerprint_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame(
        [("Hello  World",), ("hello world",), ("different",)], ["text"]
    )
    fps = [r["fp"] for r in df.select(lf.doc_fingerprint("text").alias("fp")).collect()]
    assert fps[0] == fps[1]
    assert fps[0] != fps[2]


def test_vector_math_known_values(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0, 2.0], [2.0, 0.0, 1.0])], "a array<float>, b array<float>"
    )
    row = df.select(
        lf.dot_product("a", "b").alias("dot"),
        lf.l2_norm("a").alias("na"),
        lf.cosine_similarity("a", "b").alias("cos"),
    ).first()
    assert row["dot"] == 4.0
    assert row["na"] == 3.0
    assert math.isclose(row["cos"], 4.0 / (3.0 * math.sqrt(5.0)), rel_tol=1e-12)


def test_cosine_zero_vector_null(spark):
    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 1.0])], "a array<float>, b array<float>"
    )
    assert df.select(lf.cosine_similarity("a", "b").alias("c")).first()["c"] is None


def test_repetition_ratio_known_values(spark):
    df = spark.createDataFrame(
        [
            ("a b a b a b",),  # bigrams: ab ba ab ba ab -> 2 distinct / 5
            ("all words differ here",),  # 3 distinct bigrams / 3
            ("one",),  # no bigrams
            ("",),
            (None,),
        ],
        ["text"],
    )
    out = [r["r"] for r in df.select(lf.repetition_ratio("text").alias("r")).collect()]
    assert out[0] == 0.6
    assert out[1] == 0.0
    assert out[2] == 0.0
    assert out[3] == 0.0
    assert out[4] is None


def test_hash_split_deterministic_and_complete(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    out = df.select(
        lf.hash_bucket("k").alias("b"), lf.hash_split("k").alias("s")
    )
    rows = out.collect()
    assert all(0 <= r["b"] < 100 for r in rows)
    assert {r["s"] for r in rows} == {"train", "val", "test"}
    # stable across evaluations (hash, not rand)
    assert rows == out.collect()
    frac_train = sum(r["s"] == "train" for r in rows) / len(rows)
    assert 0.7 < frac_train < 0.9


def test_chunk_documents_covers_all_tokens_with_overlap(spark):
    text = " ".join(f"t{i}" for i in range(75))
    df = spark.createDataFrame([(1, text), (2, "short doc")], ["doc_id", "text"])
    out = lf.chunk_documents(df, "text", chunk_tokens=32, overlap=8)
    rows = {(r["doc_id"], r["chunk_id"]): r for r in out.collect()}
    # doc 1: 75 tokens, step 24 -> ceil((75-32)/24)+1 = 3 chunks
    assert {k for k in rows} == {(1, 0), (1, 1), (1, 2), (2, 0)}
    c0, c1, c2 = (rows[(1, i)]["chunk_text"].split(" ") for i in range(3))
    assert c0 == [f"t{i}" for i in range(32)]
    assert c1 == [f"t{i}" for i in range(24, 56)]
    assert c2 == [f"t{i}" for i in range(48, 75)]  # short tail chunk
    assert c0[24:] == c1[:8]  # 8-token overlap
    assert rows[(1, 2)]["chunk_n_tokens"] == 27
    assert rows[(2, 0)]["chunk_text"] == "short doc"


def test_scrub_pii_patterns(spark):
    df = spark.createDataFrame(
        [
            ("mail me at jo.bloggs+x@my-site.co.uk today",),
            ("see https://a.b/c?d=e&f=g now",),
            ("call 5551234567 not 123456",),
            ("clean text stays",),
        ],
        ["text"],
    )
    out = [r["t"] for r in df.select(lf.scrub_pii("text").alias("t")).collect()]
    assert out[0] == "mail me at <EMAIL> today"
    assert out[1] == "see <URL> now"
    assert out[2] == "call <NUM> not 123456"  # short digit runs kept
    assert out[3] == "clean text stays"


def test_gopher_quality_flags(spark):
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.functions.text import (
        gopher_quality_flags,
    )

    good = (
        "the quick brown fox and the lazy dog have agreed to cooperate "
        "with all of the animals that live near the old farm in peace"
    )
    bullets = "- one\n- two\n- three\n- four"
    dots = "wait...\nmore...\nstill..."
    rows = [(1, good), (2, bullets), (3, dots), (4, "x y z")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in gopher_quality_flags(df, "text", min_words=10).collect()}
    assert out[1]["pass_gopher"] is True
    assert out[2]["bullet_line_ratio"] == 1.0 and out[2]["pass_gopher"] is False
    assert out[3]["ellipsis_line_ratio"] == 1.0 and out[3]["pass_gopher"] is False
    assert out[4]["pass_gopher"] is False  # too few words, no stopwords
    assert out[1]["stopword_hits"] >= 5


def test_stopword_ratio_counts_consecutive_stopwords(spark):
    """'the the the cat' = 3 stopword tokens of 4 — the replace-based
    count this replaced saw only 2 (shared spaces)."""
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.functions.text import (
        stopword_ratio,
    )

    df = spark.createDataFrame(
        [(1, "the the the cat"), (2, "no stop words here at all"),
         (3, ""), (4, None)],
        "id bigint, text string",
    )
    got = {r["id"]: r["r"] for r in
           df.select("id", stopword_ratio("text").alias("r")).collect()}
    assert got[1] == 0.75
    assert got[2] == 0.0
    assert got[3] == 0.0


# --- trained quality classifier (functions/quality_model.py) -------------


def _quality_corpus(spark, n=60, seed=7):
    """Synthetic clean-English vs garbage docs with disjoint doc_ids."""
    import random

    rng = random.Random(seed)
    clean_words = (
        "the quick brown fox jumps over a lazy dog and then runs to "
        "the old mill where it finds some food for the long winter"
    ).split()
    rows = []
    for i in range(n):
        words = [rng.choice(clean_words) for _ in range(rng.randint(30, 60))]
        rows.append((i, " ".join(words), 1))
    for i in range(n):
        junk = "".join(
            rng.choice("#@$%&*0123456789XYZQWK") for _ in range(rng.randint(80, 160))
        )
        rows.append((1000 + i, junk, 0))
    return spark.createDataFrame(rows, "doc_id int, text string, label int")


def test_quality_classifier_separates_holdout(spark):
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.functions.quality_model import (
        fit_quality_classifier,
        score_quality,
    )

    corpus = _quality_corpus(spark)
    train = corpus.filter(F.col("doc_id") % 3 != 0)
    test = corpus.filter(F.col("doc_id") % 3 == 0)
    model = fit_quality_classifier(train, "text", "label")
    scored = score_quality(test, model, "text")
    means = (
        scored.groupBy("label")
        .agg(F.avg("quality_prob").alias("p"))
        .collect()
    )
    by_label = {r["label"]: r["p"] for r in means}
    assert by_label[1] > 0.8 and by_label[0] < 0.2
    # holdout accuracy at tau=0.5
    acc = scored.withColumn(
        "_ok",
        ((F.col("quality_prob") >= 0.5) == (F.col("label") == 1)).cast("int"),
    ).agg(F.avg("_ok")).collect()[0][0]
    assert acc >= 0.95


def test_quality_scoring_is_deterministic_and_jvm_side(spark):
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.functions.quality_model import (
        fit_quality_classifier,
        score_quality,
    )

    corpus = _quality_corpus(spark, n=30)
    model = fit_quality_classifier(corpus, "text", "label")
    a = {r["doc_id"]: r["quality_prob"] for r in score_quality(corpus, model, "text").collect()}
    b = {r["doc_id"]: r["quality_prob"] for r in score_quality(corpus, model, "text").collect()}
    assert a == b
    plan = (
        score_quality(corpus, model, "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan  # featurization stays in Catalyst


def test_quality_centroids_separate_holdout_and_are_partition_invariant(spark):
    """The deterministic nearest-centroid tier must (a) separate the
    same synthetic clean-vs-garbage corpus the LBFGS test uses, and
    (b) train to BIT-IDENTICAL centroids under any physical
    partitioning — the property its DuckDB oracle rests on (exact
    integer feature sums)."""
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.functions.quality_model import (
        fit_quality_centroids,
        score_quality_centroids,
    )

    corpus = _quality_corpus(spark)
    train = corpus.filter(F.col("doc_id") % 3 != 0)
    test = corpus.filter(F.col("doc_id") % 3 == 0)
    c1 = fit_quality_centroids(train.repartition(1), "text", "label")
    c32 = fit_quality_centroids(train.repartition(32, "text"), "text", "label")
    assert c1 == c32  # bit-identical, not approximately equal

    scored = score_quality_centroids(test, c1, "text")
    acc = scored.withColumn(
        "_ok", (F.col("keep") == (F.col("label") == 1)).cast("int")
    ).agg(F.avg("_ok")).collect()[0][0]
    assert acc >= 0.95
    # scoring is pure Catalyst: no Python in the scan
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# --- learned BPE tokenizer (functions/bpe.py) ----------------------------


def test_learn_bpe_learns_frequent_pairs_deterministically(spark):
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.functions.bpe import (
        learn_bpe,
    )

    rows = [(i, "the theme there then the other lather") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    m1 = learn_bpe(df, "text", num_merges=30)
    m2 = learn_bpe(df, "text", num_merges=30)
    assert m1 == m2  # deterministic
    # the dominant word fully merges into one token
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.functions.bpe import (
        segment_word,
    )

    ranks = {tuple(m): i for i, m in enumerate(m1)}
    assert segment_word("the", ranks) == ["the</w>"]
    assert ("h", "e") in m1[:3]  # lexicographic tie-break is stable


def test_bpe_tokens_roundtrip_and_count(spark):
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.functions.bpe import (
        bpe_token_count,
        bpe_tokens,
        learn_bpe,
        segment_word,
    )

    rows = [
        (0, "spark merge merge spark"),
        (1, "the merge of spark streams"),
        (2, None),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    merges = learn_bpe(df, "text", num_merges=50)
    got = df.select(
        "doc_id",
        bpe_tokens("text", merges).alias("toks"),
        bpe_token_count("text", merges).alias("n"),
    ).collect()
    by_id = {r["doc_id"]: r for r in got}
    # count column == len(tokens); NULL text -> 0 tokens
    for r in got:
        assert r["n"] == len(r["toks"])
    assert by_id[2]["n"] == 0
    # lossless: stripping </w> and concatenating reconstructs the text
    recon = "".join(by_id[1]["toks"]).replace("</w>", " ").strip()
    assert recon == "the merge of spark streams"
    # distributed segmentation matches the driver-side reference
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    want = []
    for w in "the merge of spark streams".split():
        want.extend(segment_word(w, ranks))
    assert list(by_id[1]["toks"]) == want
    # a fully-merged frequent word becomes ONE token
    assert by_id[0]["n"] < len("spark merge merge spark".replace(" ", "")) + 4


def test_dedupe_lines_keeps_first_occurrence_order(spark):
    from pyspark.sql import functions as F

    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.functions.text import (
        dedupe_lines,
    )

    df = spark.createDataFrame(
        [("nav\nbody one\nnav\nbody two\nnav",), ("single",)], "t string"
    )
    got = [r.d for r in df.select(dedupe_lines("t").alias("d")).collect()]
    assert got[0] == "nav\nbody one\nbody two"
    assert got[1] == "single"
    # no Python in the plan
    plan = df.select(dedupe_lines("t"))._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_int8_quantize_roundtrip_error_bound(spark):
    from pyspark.sql import functions as F

    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.functions.vectors import (
        int8_dequantize,
        int8_quantize,
    )

    rows = [
        (1, [1.0, -2.0, 0.5, 127.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),      # all-zero: scale 0, codes 0
        (3, [-0.003, 0.001, 0.002, -0.001]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = df.select(
        "vec_id",
        int8_quantize("embedding").alias("qs"),
    ).select(
        "vec_id",
        F.col("qs.scale").alias("scale"),
        F.col("qs.q").alias("q"),
        int8_dequantize(F.col("qs")).alias("recon"),
        "qs",
    ).collect()
    by_id = {r.vec_id: r for r in out}
    # codes bounded by +-127, max-|x| component hits exactly +-127
    assert by_id[1].q[3] == 127 and max(map(abs, by_id[1].q)) == 127
    assert by_id[2].scale == 0.0 and by_id[2].q == [0, 0, 0, 0]
    # reconstruction error per component <= scale/2 (+eps)
    src = dict(rows)
    for vid in (1, 3):
        s = by_id[vid].scale
        for got, want in zip(by_id[vid].recon, src[vid]):
            assert abs(got - want) <= s / 2 + 1e-12


def test_sign_project_deterministic_and_jl_distortion(spark):
    """The projection is literal-deterministic (same seed → identical
    components across plans), seed-sensitive, and preserves pairwise
    cosine structure within JL distortion at out_dim=32."""
    import itertools
    import random

    rng = random.Random(7)
    vecs = [[rng.gauss(0, 1) for _ in range(64)] for _ in range(20)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id int, embedding array<float>"
    )
    p32 = df.select("vec_id", lf.sign_project("embedding", 64, 32).alias("p"))
    a = {r.vec_id: r.p for r in p32.collect()}
    b = {r.vec_id: r.p for r in p32.collect()}
    assert a == b  # replayable
    other = {
        r.vec_id: r.p
        for r in df.select(
            "vec_id", lf.sign_project("embedding", 64, 32, seed=1).alias("p")
        ).collect()
    }
    assert other != a  # seed-sensitive

    def cos(u, v):
        d = sum(x * y for x, y in zip(u, v))
        return d / (math.sqrt(sum(x * x for x in u)) * math.sqrt(sum(y * y for y in v)))

    errs = [
        abs(cos(vecs[i], vecs[j]) - cos(a[i], a[j]))
        for i, j in itertools.combinations(range(20), 2)
    ]
    # JL distortion ~1/sqrt(32) ≈ 0.18; mean error well inside it
    assert sum(errs) / len(errs) < 0.2
    assert max(errs) < 0.6


def test_normalize_text(spark):
    """Round 12: NFC composes combining sequences (e+U+0301 == \u00e9
    byte keys), NFKC additionally folds compatibility forms (the fi
    ligature), all four forms match stdlib unicodedata on mixed
    fixtures, lowercase/whitespace options run AFTER normalization,
    NULLs pass through, and an unknown form is refused."""
    import unicodedata

    import pytest

    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.functions.text import (
        normalize_text,
    )

    rows = [
        (1, "Cafe\u0301"), (2, "Caf\u00e9"), (3, "\ufb01le"),
        (4, "  A\u0301B\tC  "), (5, None), (6, "ascii only"),
    ]
    df = spark.createDataFrame(rows, "id int, t string")
    nfc = {r["id"]: r["n"] for r in df.select(
        "id", normalize_text("t").alias("n")).collect()}
    assert nfc[1] == nfc[2] == "Caf\u00e9"
    assert nfc[3] == "\ufb01le"  # NFC keeps the ligature
    assert nfc[5] is None
    nfkc = {r["id"]: r["n"] for r in df.select(
        "id", normalize_text("t", form="NFKC").alias("n")).collect()}
    assert nfkc[3] == "file"  # NFKC folds the ligature
    # all four forms == unicodedata on every fixture
    for form in ("NFC", "NFKC", "NFD", "NFKD"):
        got = {r["id"]: r["n"] for r in df.select(
            "id", normalize_text("t", form=form).alias("n")).collect()}
        for i, t in rows:
            assert got[i] == (
                unicodedata.normalize(form, t) if t is not None else None
            )
    # options compose AFTER normalization: the combining mark joins its
    # base BEFORE lowercasing, whitespace collapses + trims
    full = {r["id"]: r["n"] for r in df.select(
        "id",
        normalize_text("t", lowercase=True, collapse_whitespace=True)
        .alias("n")).collect()}
    assert full[4] == "\u00e1b c"
    assert full[1] == "caf\u00e9"
    with pytest.raises(ValueError, match="normalization form"):
        normalize_text("t", form="NFX")


def test_canonicalize_url(spark):
    """Crawl-grade URL canonicalization: tracking params stripped,
    params sorted, scheme/host lowercased, default ports and fragments
    and trailing slashes dropped — and equivalent fetches collapse to
    byte-identical strings for exact dedup."""
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.functions.text import (
        canonicalize_url,
    )

    pairs = [
        # (messy, clean-equivalent)
        ("HTTP://Ex.com:80/a/?utm_source=x&b=1&a=2#frag", "http://ex.com/a?a=2&b=1"),
        ("https://Host.com:443/", "https://host.com/"),
        ("https://host.com/p/q/?fbclid=zz&gclid=7", "https://host.com/p/q"),
        ("http://h.com", "http://h.com/"),
        ("http://h.com/path?", "http://h.com/path"),
        ("not a url at all", "not a url at all"),
        # '?' before any '/': the query must not be absorbed by host
        ("http://h.com?b=2&a=1", "http://h.com/?a=1&b=2"),
        ("http://h.com:80?a=1", "http://h.com/?a=1"),
        # tracking keys match case-insensitively; values keep case
        ("http://h.com/a?UTM_Source=x&B=1", "http://h.com/a?B=1"),
        # 'ref' left alone by default (semantic on some sites);
        # refid/refresh are real resources either way
        ("http://shop.com/i?refid=1", "http://shop.com/i?refid=1"),
        ("http://h.com/a?refresh=true", "http://h.com/a?refresh=true"),
        ("http://shop.com/i?ref=aff", "http://shop.com/i?ref=aff"),
        # ALL trailing slashes collapse (idempotence incl. '//')
        ("http://h.com/a//", "http://h.com/a"),
    ]
    df = spark.createDataFrame(pairs, "messy string, want string")
    rows = df.select(
        canonicalize_url("messy").alias("got"), "want"
    ).collect()
    for r in rows:
        assert r["got"] == r["want"], r
    # idempotent: canonicalizing a canonical URL is a no-op
    again = df.select(
        canonicalize_url(canonicalize_url("messy")).alias("g2"),
        canonicalize_url("messy").alias("g1"),
    ).collect()
    assert all(r["g1"] == r["g2"] for r in again)
    # per-corpus tuning: opt 'ref' back into the strip set, or run
    # with no tracking stripping at all
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.functions.text import (
        TRACKING_PARAM_KEYS,
    )

    tuned = spark.createDataFrame(
        [("http://shop.com/i?ref=aff&gclid=1",)], "u string"
    ).select(
        canonicalize_url(
            "u", tracking_keys=(*TRACKING_PARAM_KEYS, "ref")
        ).alias("strip_ref"),
        canonicalize_url("u", tracking_keys=(), tracking_prefixes=()).alias(
            "keep_all"
        ),
    ).first()
    assert tuned["strip_ref"] == "http://shop.com/i"
    assert tuned["keep_all"] == "http://shop.com/i?gclid=1&ref=aff"


def test_html_to_text(spark):
    """Web-corpus extraction: script/style contents never leak, block
    structure becomes newlines, tags strip, entities decode (double-
    escapes preserved), whitespace collapses; non-HTML passes through."""
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.functions.text import (
        html_to_text,
    )

    html = (
        '<html><head><style>p { x: 1; }</style>'
        '<script>var s = "<p>fake</p>";</script></head>'
        "<body><h1>Head</h1><p>alpha &amp; beta</p><!-- no -->"
        "<div>gamma</div><ul><li>one</li><li>two</li></ul>"
        "A&amp;lt;B &nbsp; end</body></html>"
    )
    rows = spark.createDataFrame(
        [(1, html), (2, "plain text"), (3, None), (4, "<p>x<br>y</p>")],
        "i int, h string",
    ).select("i", html_to_text("h").alias("t")).collect()
    got = {r["i"]: r["t"] for r in rows}
    assert got[1] == "Head\nalpha & beta\ngamma\none\ntwo\nA&lt;B end"
    assert "fake" not in got[1] and "color" not in got[1]
    assert got[2] == "plain text"
    assert got[3] is None
    assert got[4] == "x\ny"


def test_html_to_text_truncated_script_never_leaks(spark):
    """A crawl-truncated page ending mid-script/style must not leak
    code into training text (the unterminated-block fallback pass)."""
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.functions.text import (
        html_to_text,
    )

    rows = spark.createDataFrame(
        [
            (1, "<p>hi</p><script>var secret = 1;"),
            (2, "<p>ok</p><style>.x{color:red}"),
        ],
        "i int, h string",
    ).select("i", html_to_text("h").alias("t")).collect()
    got = {r["i"]: r["t"] for r in rows}
    assert got[1] == "hi" and "secret" not in got[1]
    assert got[2] == "ok" and "color" not in got[2]
