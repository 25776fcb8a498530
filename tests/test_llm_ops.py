"""LLM-pipeline operator tests: text functions, fuzzy dedup,
similarity search, multimodal plumbing, event streaming."""

import pyspark.sql.functions as F
import pytest

from jodie_spark.functions.text import (
    doc_fingerprint,
    language_id,
    quality_score,
    token_count,
)
from jodie_spark.operators.multimodal import (
    decode_images,
    extract_features,
    sample_frames,
    with_media_metadata,
)
from jodie_spark.operators.similarity import ann_topk, brute_force_topk
from jodie_spark.operators.text_dedup import (
    exact_dedup,
    embedding_dedup,
    minhash_candidate_pairs,
    minhash_dedup,
    ngram_jaccard_pairs,
    simhash,
    simhash_dedup,
)
from jodie_spark.streaming import sessionize, windowed_event_counts


def test_token_count_edge_cases(spark):
    df = spark.createDataFrame(
        [("hello world",), ("  a  b   c ",), ("",), ("   ",), ("one",)], ["text"]
    )
    got = [r[0] for r in df.select(token_count(F.col("text"))).collect()]
    assert got == [2, 3, 0, 0, 1]


def test_language_id(spark):
    df = spark.createDataFrame(
        [
            ("the cat sat on the mat and it was happy",),
            ("der Hund ist nicht mit der Katze und auch nicht",),
            ("le chat est dans la maison et il ne sort pas",),
            ("xyzzy qwerty zzz",),
        ],
        ["text"],
    )
    got = [r[0] for r in df.select(language_id(F.col("text"))).collect()]
    assert got == ["en", "de", "fr", "und"]


def test_fingerprint_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame(
        [("Hello   World",), ("hello world",), ("different",)], ["text"]
    )
    got = [r[0] for r in df.select(doc_fingerprint(F.col("text"))).collect()]
    assert got[0] == got[1]
    assert got[0] != got[2]


def test_quality_score_bounds(spark):
    df = spark.createDataFrame(
        [("A proper sentence that has reasonable length and ends well. " * 3,), ("x",)],
        ["text"],
    )
    got = [r[0] for r in df.select(quality_score(F.col("text"))).collect()]
    assert got[0] == 1.0
    assert got[1] < 0.5


def _doc_df(spark):
    base = "the quick brown fox jumps over the lazy dog again and again in the field"
    near = base + " tonight"
    return spark.createDataFrame(
        [(1, base), (2, near), (3, base), (4, "completely different text about spark engines at scale")],
        ["doc_id", "text"],
    )


def test_exact_dedup_keeps_min_id(spark):
    out = exact_dedup(_doc_df(spark), "text", "doc_id")
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 2, 4]


def test_minhash_finds_near_duplicates(spark):
    pairs = minhash_candidate_pairs(_doc_df(spark), "text", "doc_id")
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 3) in got  # identical docs always bucket together
    assert (1, 2) in got  # near-dup should share a band
    deduped = minhash_dedup(_doc_df(spark), "text", "doc_id")
    ids = sorted(r["doc_id"] for r in deduped.collect())
    assert 1 in ids and 4 in ids and 3 not in ids


def test_ngram_jaccard_verification(spark):
    pairs = ngram_jaccard_pairs(_doc_df(spark), "text", "doc_id", threshold=0.5)
    rows = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
    assert rows[(1, 3)] == 1.0
    assert 0.5 <= rows[(1, 2)] < 1.0


def test_simhash_properties(spark):
    df = _doc_df(spark).select("doc_id", simhash(F.col("text")).alias("sh"))
    vals = {r["doc_id"]: r["sh"] for r in df.collect()}
    assert vals[1] == vals[3]  # identical text, identical hash
    assert vals[1] != vals[4]
    out = simhash_dedup(_doc_df(spark), "text", "doc_id")
    ids = sorted(r["doc_id"] for r in out.collect())
    assert 3 not in ids and 4 in ids


def _emb_df(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    rows = []
    for i in range(50):
        v = rng.standard_normal(8)
        rows.append((i, (v / np.linalg.norm(v)).astype(float).tolist()))
    # vec 50 = near-copy of vec 0
    base = np.array(rows[0][1])
    near = base + 0.01 * rng.standard_normal(8)
    rows.append((50, (near / np.linalg.norm(near)).tolist()))
    return spark.createDataFrame(rows, "vec_id int, embedding array<double>")


def test_brute_force_topk(spark):
    df = _emb_df(spark)
    q = df.filter("vec_id = 0").take(1)[0]["embedding"]
    top = brute_force_topk(df, "embedding", "vec_id", q, 3).collect()
    assert top[0]["vec_id"] == 0 and top[0]["similarity"] == pytest.approx(1.0)
    assert top[1]["vec_id"] == 50  # the near-copy ranks second


def test_ann_topk_finds_near_copy(spark):
    df = _emb_df(spark)
    q = df.filter("vec_id = 0").take(1)[0]["embedding"]
    got = ann_topk(df, "embedding", "vec_id", q, 8, 3, n_planes=8, n_tables=3).collect()
    ids = [r["vec_id"] for r in got]
    assert 0 in ids and 50 in ids


def test_ivf_topk_finds_near_copy(spark):
    from jodie_spark.operators.ivf import ivf_topk, train_centroids, with_ivf_assignments

    df = _emb_df(spark)
    q = df.filter("vec_id = 0").take(1)[0]["embedding"]
    got = ivf_topk(df, "embedding", "vec_id", q, k=3, n_centroids=4, n_probe=2).collect()
    ids = [r["vec_id"] for r in got]
    assert 0 in ids and 50 in ids  # query vector and its near-copy recalled
    # precomputed-index path
    cent = train_centroids(df, "embedding", n_centroids=4)
    indexed = with_ivf_assignments(df, "embedding", cent)
    got2 = ivf_topk(
        indexed, "embedding", "vec_id", q, k=3, centroids=cent
    ).collect()
    assert [r["vec_id"] for r in got2] == ids


def test_embedding_dedup_drops_near_copy(spark):
    out = embedding_dedup(_emb_df(spark), "embedding", "vec_id", 8, threshold=0.99)
    ids = sorted(r["vec_id"] for r in out.collect())
    assert 0 in ids and 50 not in ids


def test_multimodal_pipeline(spark):
    df = spark.createDataFrame([(1, b"imgbytes-1"), (2, b"imgbytes-2")], "id int, data binary")
    meta = with_media_metadata(df)
    assert meta.filter("n_bytes = 10").count() == 2
    decoded = decode_images(meta)
    rows = decoded.collect()
    assert all(r["n_pixels"] == r["width"] * r["height"] for r in rows)
    # deterministic across invocations
    again = decode_images(meta).collect()
    assert sorted((r["id"], r["width"]) for r in rows) == sorted(
        (r["id"], r["width"]) for r in again
    )
    feats = extract_features(df, dim=4).collect()
    assert all(len(r["features"]) == 4 for r in feats)
    frames = sample_frames(df)
    assert frames.count() >= 2
    # real-mode decode of undecodable bytes: NULL dims by default (the
    # job-survival contract), loud failure only under on_error='raise'
    null_dims = decode_images(df, mode="real").collect()
    assert all(r["width"] is None and r["n_pixels"] is None for r in null_dims)
    with pytest.raises(Exception):
        decode_images(df, mode="real", on_error="raise").collect()


def test_windowed_event_counts_and_sessionize(spark):
    import datetime

    t0 = datetime.datetime(2024, 1, 1, 10, 0)
    rows = [
        (1, t0, 100, "click", 1.0),
        (2, t0 + datetime.timedelta(minutes=10), 100, "click", 1.0),
        (3, t0 + datetime.timedelta(minutes=90), 100, "click", 1.0),
        (4, t0, 200, "view", 2.0),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    wc = windowed_event_counts(events, "1 hour")
    got = {(r["event_type"], r["n_events"]) for r in wc.collect()}
    assert ("click", 2) in got and ("click", 1) in got and ("view", 1) in got

    s = sessionize(events, "30 minutes")
    n = s.filter("user_id = 100").select("session_seq").agg(F.max("session_seq")).collect()[0][0]
    assert n == 2  # 90-min gap splits user 100 into two sessions


def test_connected_component_reps_chain(spark):
    from jodie_spark.operators.text_dedup import connected_component_reps

    # two components: a 4-chain 1-2-3-4 (diameter 3) and a pair 10-11
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["id_a", "id_b"]
    )
    reps = {r["id"]: r["rep"] for r in connected_component_reps(pairs).collect()}
    assert reps == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_minhash_dedup_transitive_chain(spark):
    # A~B and B~C near-dups, A and C farther apart: component election
    # must keep exactly A regardless of which buckets collide
    words = "the quick brown fox jumps over the lazy dog again and again in the field tonight".split()
    a = " ".join(words)
    b = " ".join(words + ["extra"])
    c = " ".join(words + ["extra", "words", "appended", "here"])
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c), (9, "completely different text about spark engines at scale")],
        ["doc_id", "text"],
    )
    out = minhash_dedup(df, "text", "doc_id", verify_threshold=0.5, transitive=True)
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 9]


def test_minhash_dedup_verified_drops_false_buckets(spark):
    # verify_threshold must protect docs whose only link is a bucket
    # collision below the Jaccard bar: non-transitive verified mode
    # drops exactly the true near-dups
    out = minhash_dedup(_doc_df(spark), "text", "doc_id", verify_threshold=0.5)
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 4]


def test_connected_component_reps_distributed_path(spark):
    from jodie_spark.operators.text_dedup import connected_component_reps

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["id_a", "id_b"]
    )
    reps = {
        r["id"]: r["rep"]
        for r in connected_component_reps(pairs, driver_threshold=0).collect()
    }
    assert reps == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_pii_scrub_and_counts(spark):
    from jodie_spark.functions.text import pii_counts, pii_scrub

    df = spark.createDataFrame(
        [(1, "mail me at jo.doe+x@corp.io or call 555-123-4567 from 192.168.0.1"),
         (2, "no pii here at all")],
        ["id", "text"],
    )
    out = df.select(
        "id",
        pii_scrub(F.col("text")).alias("clean"),
        pii_counts(F.col("text")).alias("c"),
    ).collect()
    by_id = {r["id"]: r for r in out}
    assert by_id[1]["clean"] == "mail me at <EMAIL> or call <PHONE> from <IP>"
    assert by_id[1]["c"].asDict() == {"email": 1, "phone": 1, "ip": 1}
    assert by_id[2]["clean"] == "no pii here at all"
    assert by_id[2]["c"].asDict() == {"email": 0, "phone": 0, "ip": 0}


def test_bpe_token_count(spark):
    from jodie_spark.functions.text import bpe_token_count

    df = spark.createDataFrame(
        [(1, "foo, bar!"), (2, "abc123 x-y"), (3, ""), (4, "   ")], ["id", "t"]
    )
    got = {r["id"]: r["n"] for r in df.select("id", bpe_token_count(F.col("t")).alias("n")).collect()}
    # foo , bar !  /  abc 123 x - y
    assert got == {1: 4, 2: 5, 3: 0, 4: 0}


def test_connected_components_driver_and_distributed_agree(spark):
    """The adaptive component election's two implementations (driver
    union-find, distributed label propagation) must produce identical
    representative maps on random graphs."""
    import random

    from jodie_spark.operators.text_dedup import connected_component_reps

    for seed in (7, 21, 99):
        rng = random.Random(seed)
        n = 40
        pairs = sorted({
            tuple(sorted(rng.sample(range(n), 2))) for _ in range(30)
        })
        df = spark.createDataFrame(pairs, ["id_a", "id_b"])
        drv = {r["id"]: r["rep"] for r in connected_component_reps(df).collect()}
        dist = {
            r["id"]: r["rep"]
            for r in connected_component_reps(df, driver_threshold=0).collect()
        }
        assert drv == dist, f"seed={seed}"


def test_word_ngrams_and_repetition(spark):
    from jodie_spark.functions.text import dup_ngram_fraction, word_ngrams

    df = spark.createDataFrame(
        [("a b c d",), ("x x x x",), ("one",), ("",)], ["text"]
    )
    grams = [r[0] for r in df.select(word_ngrams(F.col("text"), 2)).collect()]
    assert grams[0] == ["a b", "b c", "c d"]
    assert grams[1] == ["x x", "x x", "x x"]
    assert grams[2] == []  # shorter than n
    assert grams[3] == []
    dup = [r[0] for r in df.select(dup_ngram_fraction(F.col("text"), 2)).collect()]
    assert dup[0] == 0.0
    assert dup[1] == pytest.approx(2 / 3, abs=1e-6)  # 3 bigrams, 1 distinct
    assert dup[2] == 0.0 and dup[3] == 0.0


def test_contamination_check_and_decontaminate(spark):
    from jodie_spark.operators.contamination import (
        contamination_check,
        decontaminate,
    )

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated text about spark engines"),
            (3, "another doc with quick brown fox inside it"),
        ],
        ["doc_id", "text"],
    )
    eval_df = spark.createDataFrame(
        [(100, "quick brown fox benchmarks")], ["doc_id", "text"]
    )
    flagged = contamination_check(corpus, eval_df, n=3)
    rows = {r["doc_id"]: r["n_shared_ngrams"] for r in flagged.collect()}
    assert set(rows) == {1, 3}  # both contain "quick brown fox"
    assert all(v >= 1 for v in rows.values())
    survivors = {r["doc_id"] for r in decontaminate(corpus, eval_df, n=3).collect()}
    assert survivors == {2}


def test_stratified_sample_deterministic(spark):
    from jodie_spark.operators.sampling import (
        deterministic_sample,
        stratified_sample,
    )

    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(2000)],
        ["doc_id", "source"],
    )
    s1 = stratified_sample(df, "source", {"a": 1.0, "b": 0.0})
    got = s1.groupBy("source").count().collect()
    assert {r["source"]: r["count"] for r in got} == {"a": 1000}

    # half-rate sample is ~50% and identical across invocations
    h1 = {r["doc_id"] for r in deterministic_sample(df, 0.5).collect()}
    h2 = {r["doc_id"] for r in deterministic_sample(df, 0.5).collect()}
    assert h1 == h2
    assert 800 < len(h1) < 1200
    # a different salt draws a different (but still deterministic) sample
    h3 = {r["doc_id"] for r in deterministic_sample(df, 0.5, salt=7).collect()}
    assert h3 != h1
    # xxhash method also works and is deterministic
    x1 = {r["doc_id"] for r in deterministic_sample(df, 0.5, method="xxhash").collect()}
    x2 = {r["doc_id"] for r in deterministic_sample(df, 0.5, method="xxhash").collect()}
    assert x1 == x2

    with pytest.raises(ValueError):
        deterministic_sample(df, 1.5)
    with pytest.raises(ValueError):
        stratified_sample(df, "source", {"a": -0.1})


def test_chunk_documents(spark):
    from jodie_spark.operators.chunking import chunk_documents

    text = " ".join(f"w{i}" for i in range(25))
    df = spark.createDataFrame([(1, text), (2, "short doc"), (3, "")], ["doc_id", "text"])
    chunks = chunk_documents(df, max_tokens=10, overlap=2).collect()
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: stride 8 → starts 1,9,17,25 → 4 chunks; last has 1 token
    assert [c["n_chunk_tokens"] for c in sorted(by_doc[1], key=lambda c: c["chunk_id"])] == [10, 10, 9, 1]
    # consecutive chunks overlap by 2 tokens
    c0, c1 = by_doc[1][0]["chunk_text"].split(), by_doc[1][1]["chunk_text"].split()
    assert c0[-2:] == c1[:2]
    assert [c["n_chunk_tokens"] for c in by_doc[2]] == [2]
    assert 3 not in by_doc  # blank doc yields no chunks
    with pytest.raises(ValueError):
        chunk_documents(df, max_tokens=5, overlap=5)


def test_l2_normalize_and_int8_quantize(spark):
    from jodie_spark.functions.vectors import int8_quantize, l2_normalize

    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0]), (3, [-1.0, 0.5])],
        ["id", "v"],
    )
    nrm = {r["id"]: r["n"] for r in df.select("id", l2_normalize(F.col("v")).alias("n")).collect()}
    assert nrm[1] == pytest.approx([0.6, 0.8])
    assert nrm[2] == [0.0, 0.0]  # zero vector unchanged, no NaN
    qz = {r["id"]: r["q"] for r in df.select("id", int8_quantize(F.col("v")).alias("q")).collect()}
    assert list(qz[1]["q"]) == [95, 127]  # round(3/4*127)=95
    assert qz[1]["max_abs"] == pytest.approx(4.0)
    assert list(qz[2]["q"]) == [0, 0]
    assert list(qz[3]["q"]) == [-127, 64]  # round(0.5*127)=63.5→64 (half-up)


def test_gopher_quality_signals(spark):
    from jodie_spark.functions.text import gopher_quality

    good = " ".join(["the quick brown fox and that dog have fun with it"] * 6)
    rows = [
        (1, good),                                  # passes every rule
        (2, "short text"),                          # too few words
        (3, "\n".join(["- bullet point here"] * 10)),  # all-bullet lines
        (4, ("### " * 60)),                         # symbol-heavy, no stops
    ]
    df = gopher_quality(spark.createDataFrame(rows, "doc_id int, text string"))
    got = {r["doc_id"]: r for r in df.collect()}
    assert got[1]["gopher_passes"] is True
    assert got[1]["gopher"]["n_stop_words"] >= 2
    assert got[2]["gopher_passes"] is False
    assert got[2]["gopher"]["n_words"] == 2
    assert got[3]["gopher"]["bullet_line_frac"] == 1.0
    assert got[3]["gopher_passes"] is False
    assert got[4]["gopher"]["symbol_word_ratio"] > 0.1
    assert got[4]["gopher_passes"] is False
    # pure Catalyst: no python workers in the plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan


def test_distributed_kmeans_matches_local(spark):
    """kmeans_fit's distributed Lloyd's iterations must match a local
    numpy reference given the same init (spherical convention: cosine
    assignment, renormalized mean update, ties to lowest id)."""
    import numpy as np

    from jodie_spark.operators.kmeans import kmeans_assign, kmeans_fit

    rng = np.random.default_rng(11)
    base = rng.standard_normal((4, 8))
    vecs = []
    for i in range(80):
        v = base[i % 4] + 0.1 * rng.standard_normal(8)
        vecs.append((i, v.tolist()))
    df = spark.createDataFrame(vecs, "vec_id int, embedding array<double>")
    cent = kmeans_fit(df, "embedding", k=4, n_iter=3, id_col="vec_id")

    # local reference with identical arithmetic
    x = np.stack([np.asarray(v) for _, v in vecs])
    xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    c = xn[:4].copy()
    for _ in range(3):
        assign = (xn @ c.T).argmax(axis=1)
        for k in range(4):
            m = xn[assign == k]
            if len(m):
                mm = m.mean(axis=0)
                c[k] = mm / max(np.linalg.norm(mm), 1e-12)
    assert np.allclose(cent, c, atol=1e-9)

    got = {r["vec_id"]: r["cluster"] for r in kmeans_assign(df, "embedding", cent).collect()}
    ref = (xn @ c.T).argmax(axis=1)
    assert all(got[i] == ref[i] for i in range(80))
    # planted structure recovered: one cluster per base direction
    assert len({got[i] for i in range(4)}) == 4


def test_quality_aware_dedup_election(spark):
    """quality_col switches the survivor election to highest-quality
    (ties -> lowest id), per exact-fingerprint group and per MinHash
    duplicate cluster (FineWeb-style canonical-copy retention)."""
    from jodie_spark.operators.text_dedup import exact_dedup, minhash_dedup

    rows = [
        (1, "the quick brown fox jumps over the lazy dog again", 0.2),
        (2, "THE QUICK  brown fox jumps over the lazy dog again", 0.9),  # exact clone, best q
        (3, "the quick brown fox jumps over the lazy dog again ", 0.9),  # exact clone, tie q
        (4, "an entirely different document about spark engines", 0.5),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, q double")
    kept = sorted(r["doc_id"] for r in exact_dedup(df, "text", "doc_id", quality_col="q").collect())
    assert kept == [2, 4]  # highest quality wins; tie broke to id 2 < 3

    # near-dup chain A~B~C (one word changed per step): component
    # election keeps the highest-quality member
    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet " * 3
    chain = [
        (10, base, 0.1),
        (11, base.replace("echo", "ECHO2", 1), 0.8),
        (12, base.replace("india", "INDIA2", 1), 0.4),
        (13, "unrelated corpus text with nothing shared at all " * 5, 0.0),
    ]
    cdf = spark.createDataFrame(chain, "doc_id long, text string, q double")
    kept2 = sorted(
        r["doc_id"]
        for r in minhash_dedup(
            cdf, "text", "doc_id", verify_threshold=0.5, quality_col="q"
        ).collect()
    )
    assert kept2 == [11, 13]
    # without quality_col the same input keeps the min id
    kept3 = sorted(
        r["doc_id"]
        for r in minhash_dedup(
            cdf, "text", "doc_id", verify_threshold=0.5, transitive=True
        ).collect()
    )
    assert kept3 == [10, 13]


def test_quality_election_string_ids(spark):
    """Regression (round-8 advice): the quality tie-break used -id,
    which a STRING doc id silently casts to double NULL (non-ANSI,
    nondeterministic ties) or errors on under ANSI mode. The election
    must order by (quality desc, id asc) for any orderable id type."""
    from jodie_spark.operators.text_dedup import exact_dedup, minhash_dedup

    rows = [
        ("doc-b", "the quick brown fox jumps over the lazy dog again", 0.9),
        ("doc-a", "THE QUICK  brown fox jumps over the lazy dog again", 0.9),
        ("doc-c", "the quick brown fox jumps over the lazy dog again ", 0.2),
        ("doc-z", "an entirely different document about spark engines", 0.5),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string, q double")
    kept = sorted(
        r["doc_id"] for r in exact_dedup(df, "text", "doc_id", quality_col="q").collect()
    )
    # tie at q=0.9 breaks to the LEXICALLY lowest id, deterministically
    assert kept == ["doc-a", "doc-z"]

    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet " * 3
    chain = [
        ("m2", base, 0.1),
        ("m1", base.replace("echo", "ECHO2", 1), 0.8),
        ("m3", base.replace("india", "INDIA2", 1), 0.8),
        ("m9", "unrelated corpus text with nothing shared at all " * 5, 0.0),
    ]
    cdf = spark.createDataFrame(chain, "doc_id string, text string, q double")
    kept2 = sorted(
        r["doc_id"]
        for r in minhash_dedup(
            cdf, "text", "doc_id", verify_threshold=0.5, quality_col="q"
        ).collect()
    )
    assert kept2 == ["m1", "m9"]


def test_quality_election_null_quality(spark):
    """Regression (round-9 advice): min_by over struct(-q, id) flips
    NULL ordering — -NULL is NULL, which sorts smallest in struct
    comparison, so an UNSCORED duplicate would beat every scored one.
    NULL-quality copies must lose to any scored copy (and tie-break
    among themselves by lowest id)."""
    from jodie_spark.operators.text_dedup import exact_dedup, minhash_dedup

    rows = [
        (1, "the quick brown fox jumps over the lazy dog again", None),
        (2, "THE QUICK  brown fox jumps over the lazy dog again", 0.3),
        (3, "the quick brown fox jumps over the lazy dog again ", None),
        (4, "an entirely different document about spark engines", None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, q double")
    kept = sorted(
        r["doc_id"] for r in exact_dedup(df, "text", "doc_id", quality_col="q").collect()
    )
    # id 2 is the only SCORED copy — it must win over the NULL-q clones;
    # id 4's singleton group keeps its NULL-q row untouched
    assert kept == [2, 4]

    # all-NULL group: election still deterministic (lowest id)
    rows2 = [
        (7, "some identical page body repeated verbatim here", None),
        (5, "SOME IDENTICAL page body repeated verbatim here", None),
    ]
    df2 = spark.createDataFrame(rows2, "doc_id long, text string, q double")
    kept2 = [r["doc_id"] for r in exact_dedup(df2, "text", "doc_id", quality_col="q").collect()]
    assert kept2 == [5]

    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet " * 3
    chain = [
        (10, base, None),
        (11, base.replace("echo", "ECHO2", 1), 0.2),
        (12, base.replace("india", "INDIA2", 1), None),
        (13, "unrelated corpus text with nothing shared at all " * 5, None),
    ]
    cdf = spark.createDataFrame(chain, "doc_id long, text string, q double")
    kept3 = sorted(
        r["doc_id"]
        for r in minhash_dedup(
            cdf, "text", "doc_id", verify_threshold=0.5, quality_col="q"
        ).collect()
    )
    assert kept3 == [11, 13]


def test_cap_per_domain(spark):
    """Frequency capping keeps at most k docs per registrable domain —
    best-quality first (ties -> lowest id), un-parseable URLs always
    survive; exactness holds through the two-stage salted election."""
    from jodie_spark.functions.urls import cap_per_domain

    rows = []
    # 10 docs on hot.com with quality = doc_id % 7, 3 on cold.org, 2 junk
    for i in range(10):
        rows.append((i, f"https://www.hot.com/p/{i}", float(i % 7)))
    for i in range(10, 13):
        rows.append((i, f"https://sub{i}.cold.org/x", float(i)))
    rows += [(20, "not a url", 9.9), (21, "also:junk", 0.0)]
    df = spark.createDataFrame(rows, "doc_id long, url string, q double")

    out = cap_per_domain(df, "url", k=3, id_col="doc_id", quality_col="q")
    kept = sorted(r["doc_id"] for r in out.collect())
    # hot.com: qualities [0,1,2,3,4,5,6,0,1,2] for ids 0..9 -> top3 = ids 6,5,4
    # cold.org: all 3 fit; junk rows always kept
    assert kept == [4, 5, 6, 10, 11, 12, 20, 21]

    # without quality: lowest ids win
    out2 = cap_per_domain(df, "url", k=2, id_col="doc_id")
    kept2 = sorted(r["doc_id"] for r in out2.collect())
    assert kept2 == [0, 1, 10, 11, 20, 21]

    # exactness vs a single-stage window at several salt counts
    from pyspark.sql import Window

    from jodie_spark.functions.urls import url_domain

    expect = sorted(
        r["doc_id"]
        for r in df.withColumn("__dom__", url_domain(F.col("url")))
        .withColumn(
            "__rn__",
            F.row_number().over(
                Window.partitionBy("__dom__").orderBy(
                    F.col("q").desc_nulls_last(), F.col("doc_id")
                )
            ),
        )
        .filter(F.col("__dom__").isNull() | (F.col("__rn__") <= 3))
        .collect()
    )
    for s in (1, 2, 7, 64):
        got = sorted(
            r["doc_id"]
            for r in cap_per_domain(
                df, "url", k=3, id_col="doc_id", quality_col="q", salt_partitions=s
            ).collect()
        )
        assert got == expect, f"salt_partitions={s}"


def test_dsir_weights_and_resample(spark):
    """DSIR importance log-weights rank target-like documents above
    off-target ones, empty docs weigh 0, and Gumbel-top-k resampling
    is deterministic in (data, salt) and shifts with the salt."""
    from jodie_spark.operators.dsir import dsir_log_weights, dsir_resample

    raw = spark.createDataFrame(
        [
            (1, "spark sql engine tuning and shuffle partitions"),
            (2, "cats and dogs play in the yard all day"),
            (3, "spark shuffle partitions and sql engine internals"),
            (4, "dogs bark loud in the yard"),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    tgt = spark.createDataFrame(
        [(100, "spark sql shuffle engine"), (101, "spark engine partitions sql")],
        "doc_id long, text string",
    )
    w = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_log_weights(raw, tgt, n_buckets=512).collect()
    }
    assert set(w) == {1, 2, 3, 4, 5}
    assert w[1] > w[2] and w[3] > w[4]
    assert w[5] == 0.0

    sel1 = sorted(
        r["doc_id"] for r in dsir_resample(raw, tgt, 2, n_buckets=512).collect()
    )
    sel1b = sorted(
        r["doc_id"] for r in dsir_resample(raw, tgt, 2, n_buckets=512).collect()
    )
    assert sel1 == sel1b  # reproducible
    # selected rows carry log_weight and original columns
    cols = dsir_resample(raw, tgt, 2, n_buckets=512).columns
    assert set(cols) == {"doc_id", "text", "log_weight"}
    # salting redraws the noise: across salts the union of selections
    # should eventually include a spark-y doc
    seen = set()
    for s in range(4):
        seen |= {
            r["doc_id"]
            for r in dsir_resample(raw, tgt, 2, n_buckets=512, salt=s).collect()
        }
    assert seen & {1, 3}


def test_kmv_sketches(spark):
    """Bottom-k sketches: exact below k, ~1/sqrt(k) above, salt-count
    invariant (two-stage election is exact), and the union-membership
    intersection estimator lands near truth."""
    from pyspark.sql import functions as F

    from jodie_spark.operators.sketches import (
        kmv_estimate,
        kmv_overlap,
        kmv_sketch,
    )

    small = spark.range(50).select(F.concat(F.lit("s"), F.col("id")).alias("v"))
    e = kmv_sketch(small, "v", k=256).select(
        kmv_estimate(F.col("kmv"), 256).alias("e")
    ).collect()[0]["e"]
    assert e == 50.0  # exact below k

    big = spark.range(10_000).select(F.concat(F.lit("val"), F.col("id")).alias("v"))
    sk = kmv_sketch(big, "v", k=256)
    ref = sk.collect()[0]["kmv"]
    est = sk.select(kmv_estimate(F.col("kmv"), 256).alias("e")).collect()[0]["e"]
    assert abs(est - 10_000) / 10_000 < 0.2
    for s in (1, 8, 64):
        got = kmv_sketch(big, "v", k=256, salt_partitions=s).collect()[0]["kmv"]
        assert got == ref, f"salt_partitions={s} changed the sketch"

    # grouped sketches: per-group estimates
    grouped = spark.range(3_000).select(
        (F.col("id") % 3).alias("g"),
        F.concat(F.lit("x"), F.col("id")).alias("v"),
    )
    ests = {
        r["g"]: r["e"]
        for r in kmv_sketch(grouped, "v", group_cols=["g"], k=256)
        .select("g", kmv_estimate(F.col("kmv"), 256).alias("e"))
        .collect()
    }
    assert set(ests) == {0, 1, 2}
    assert all(abs(v - 1000) / 1000 < 0.25 for v in ests.values())

    # overlap: |A|=10k, |B|=10k, |A∩B|=5k → jaccard 1/3
    A = big
    B = spark.range(5_000, 15_000).select(
        F.concat(F.lit("val"), F.col("id")).alias("v")
    )
    ov = kmv_overlap(kmv_sketch(A, "v", k=256), kmv_sketch(B, "v", k=256), 256)
    row = ov.collect()[0]
    assert abs(row["jaccard"] - 1 / 3) < 0.08
    assert abs(row["n_intersect"] - 5_000) / 5_000 < 0.25


def test_select_token_budget(spark):
    """Exact budget selection vs brute force: quality-desc/id-asc
    greedy with the straddler kept."""
    from jodie_spark.operators.corpus import select_token_budget

    rows = [
        (1, 0.9, 40), (2, 0.9, 30), (3, 0.7, 50), (4, 0.5, 100), (5, 1.0, 25),
    ]
    df = spark.createDataFrame(rows, "doc_id long, quality double, n_tokens int")
    got = sorted(
        r["doc_id"] for r in select_token_budget(df, budget=100).collect()
    )
    # order: 5(25) -> 1(40, off 25) -> 2(30, off 65) -> 3(off 95 < 100,
    # STRADDLER kept) -> 4(off 145, out)
    assert got == [1, 2, 3, 5]
    # tight budget keeps only the first document
    assert sorted(
        r["doc_id"] for r in select_token_budget(df, budget=1).collect()
    ) == [5]
    # equal-quality tiebreak is id-asc (deterministic)
    df2 = spark.createDataFrame(
        [(10, 0.5, 60), (11, 0.5, 60)], "doc_id long, quality double, n_tokens int"
    )
    assert sorted(
        r["doc_id"] for r in select_token_budget(df2, budget=60).collect()
    ) == [10]
    with pytest.raises(ValueError, match="budget"):
        select_token_budget(df, budget=0)
    # NULL-quality docs sort LAST: they must never consume the budget
    # ahead of scored documents
    df3 = spark.createDataFrame(
        [(1, 0.9, 40), (2, None, 30), (3, 0.7, 50)],
        "doc_id long, quality double, n_tokens int",
    )
    assert sorted(
        r["doc_id"] for r in select_token_budget(df3, budget=40).collect()
    ) == [1]
