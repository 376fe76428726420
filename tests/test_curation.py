"""Corpus-curation operators: decontamination, chunking, sampling, packing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta", "bench"),
        (1, "alpha beta gamma delta epsilon zeta eta theta", "train"),  # exact copy
        (2, "iota kappa lambda mu nu xi omicron pi rho sigma", "train"),  # disjoint
        (3, "alpha beta gamma delta epsilon unrelated words here now", "train"),
        (4, "tiny", "train"),  # < n tokens -> no shingles
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_ngram_overlap_ratios(spark, corpus):
    from biocache_store_spark.operators.curation import ngram_overlap

    bench = corpus.filter(F.col("source") == "bench")
    train = corpus.filter(F.col("source") == "train")
    out = {r["doc_id"]: r for r in ngram_overlap(train, bench, n=5).collect()}
    assert out[1]["overlap_ratio"] == 1.0  # exact copy: fully contaminated
    assert out[2]["n_overlap"] == 0 and out[2]["overlap_ratio"] == 0.0
    # doc 3 shares exactly the one 5-gram "alpha beta gamma delta epsilon"
    assert out[3]["n_overlap"] == 1
    assert 4 not in out  # too short to shingle


def test_chunk_documents_boundaries(spark):
    from biocache_store_spark.operators.curation import chunk_documents

    toks = lambda k: " ".join(f"t{i}" for i in range(k))
    rows = [(0, toks(4)), (1, toks(5)), (2, toks(14)), (3, toks(15)), (4, "")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(docs, window=5, stride=5)
    chunks = {}
    for r in out.collect():
        chunks.setdefault(r["doc_id"], []).append(r)
    # shorter than one window -> single partial chunk
    assert [c["n_tok"] for c in chunks[0]] == [4]
    # exactly one window
    assert [c["n_tok"] for c in chunks[1]] == [5]
    # 14 tokens at window=stride=5 -> two full windows, trailing 4 dropped
    assert sorted(c["chunk_idx"] for c in chunks[2]) == [0, 1]
    # 15 tokens -> three full windows
    assert sorted(c["chunk_idx"] for c in chunks[3]) == [0, 1, 2]
    assert 4 not in chunks  # empty text yields nothing
    assert chunks[3][0]["chunk"].split() == [f"t{i}" for i in range(5)]


def test_chunk_documents_stride_overlap(spark):
    from biocache_store_spark.operators.curation import chunk_documents

    docs = spark.createDataFrame(
        [(0, " ".join(f"t{i}" for i in range(10)))], "doc_id long, text string"
    )
    out = sorted(
        chunk_documents(docs, window=6, stride=2).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # starts 1,3,5 (last full-window start = 10-6+1 = 5)
    assert [r["chunk"].split()[0] for r in out] == ["t0", "t2", "t4"]
    assert all(r["n_tok"] == 6 for r in out)


def test_stratified_sample_deterministic(spark):
    from biocache_store_spark.operators.curation import stratified_sample

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("src"),
    )
    kept = stratified_sample(df, "src", {"a": "80", "b": "00"})
    rows = kept.collect()
    assert all(r["src"] == "a" for r in rows)  # '00' keeps nothing
    n = len(rows)
    assert 200 < n < 300  # ~50% of 500
    # deterministic: same result on re-run
    again = stratified_sample(df, "src", {"a": "80", "b": "00"}).collect()
    assert sorted(r["doc_id"] for r in rows) == sorted(r["doc_id"] for r in again)


def test_pack_sequences_offsets(spark):
    from biocache_store_spark.operators.curation import pack_sequences

    # 4 docs of 3 tokens each, budget 6 -> bins of 2 docs
    rows = [(i, "a b c", "s") for i in range(4)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["bin"]: r for r in pack_sequences(docs, budget=6).collect()}
    assert out[0]["n_docs"] == 2 and out[0]["n_tokens"] == 6
    assert out[1]["n_docs"] == 2 and out[1]["n_tokens"] == 6


def test_salted_join_matches_plain_join(spark):
    from biocache_store_spark.operators.skew import salted_join

    left = spark.range(2000).select(
        (F.col("id") % 3).cast("string").alias("k"), F.col("id").alias("v")
    )
    right = spark.createDataFrame(
        [("0", "zero"), ("1", "one"), ("5", "five")], "k string, label string"
    )
    for how in ("inner", "left"):
        got = sorted(
            (r["k"], r["v"], r["label"])
            for r in salted_join(left, right, "k", how=how, salt=4).collect()
        )
        want = sorted(
            (r["k"], r["v"], r["label"])
            for r in left.join(right, "k", how).collect()
        )
        assert got == want, how


def test_salted_join_rejects_right_joins(spark):
    import pytest as _pytest

    from biocache_store_spark.operators.skew import salted_join

    df = spark.range(3).select(F.col("id").cast("string").alias("k"))
    with _pytest.raises(ValueError):
        salted_join(df, df, "k", how="right")


def test_text_shingles_adversarial_corpus(spark):
    """Regex shingler vs lambda shingler vs an independent pure-Python
    reference over a seeded adversarial corpus (unicode whitespace, mixed
    case, repeats, punctuation-only, long runs)."""
    import random
    import re

    from biocache_store_spark.functions.text import (
        text_shingles,
        word_shingles,
        words,
    )

    rng = random.Random(42)
    vocab = ["alpha", "Beta", "GAMMA", "d-e", "x.y,z", "@@", "1234", "a"]
    ws = [" ", "  ", "\t", "\n", " \t ", " "]  # incl. non-breaking space
    corpus = []
    for i in range(300):
        k = rng.randint(0, 12)
        toks = [rng.choice(vocab) for _ in range(k)]
        s = ""
        for t in toks:
            s += t + rng.choice(ws)
        if rng.random() < 0.3:
            s = rng.choice(ws) + s
        corpus.append((i, s))
    corpus += [(1000, ""), (1001, "   "), (1002, "\t\n"), (1003, "one")]

    def py_shingles(text, n):
        # the ENGINE convention: Java-regex \s (ASCII whitespace only —
        # U+00A0 etc. stay inside tokens, matching DuckDB's RE2) and
        # space-only trim. Python's unicode-aware strip()/\s would
        # silently disagree.
        collapsed = re.sub(r"[ \t\n\x0b\f\r]+", " ", text.lower()).strip(" ")
        toks = collapsed.split(" ")
        if len(toks) < n:
            return []
        seen, out = set(), []
        for i in range(len(toks) - n + 1):
            sh = " ".join(toks[i : i + n])
            if sh not in seen:
                seen.add(sh)
                out.append(sh)
        return sorted(out)

    df = spark.createDataFrame(corpus, "doc_id long, text string")
    for n in (2, 3):
        got = {
            r["doc_id"]: (sorted(r["a"]), sorted(r["b"]))
            for r in df.select(
                "doc_id",
                text_shingles(F.col("text"), n).alias("a"),
                word_shingles(words(F.col("text")), n).alias("b"),
            ).collect()
        }
        for doc_id, text in corpus:
            ref = py_shingles(text, n)
            a, b = got[doc_id]
            assert a == ref, (n, doc_id, repr(text), a, ref)
            assert b == ref, (n, doc_id, repr(text), b, ref)


def test_unpack_associated_media_reference_cases(spark):
    """Every case from the reference's AssociatedMediaTest.scala."""
    from biocache_store_spark.operators.multimodal import unpack_associated_media

    cases = [
        # (input, expected list)
        ("http://s/p/140018/medium.JPG, http://s/p/140019/medium.JPG",
         ["http://s/p/140018/medium.JPG", "http://s/p/140019/medium.JPG"]),
        ("http://s/p/20812/medium.jpg; http://s/p/20813/medium.jpg",
         ["http://s/p/20812/medium.jpg", "http://s/p/20813/medium.jpg"]),
        ("http://a.jpg | https://b.jpg | ftp://c.jpg | ftps://d.jpg |",
         ["http://a.jpg", "https://b.jpg", "ftp://c.jpg", "ftps://d.jpg"]),
        ("medium1.jpg, medium2.jpg", ["medium1.jpg", "medium2.jpg"]),
        ("medium1.jpg; medium2.jpg", ["medium1.jpg", "medium2.jpg"]),
        # a comma INSIDE a single URL: mixed url/non-url parts -> kept whole
        ("http://s/p/20812/med,ium.jpg", ["http://s/p/20812/med,ium.jpg"]),
        ("", []),
        ("   ", []),
        (None, []),
        ("single.jpg", ["single.jpg"]),
    ]
    df = spark.createDataFrame(
        [(i, c[0]) for i, c in enumerate(cases)], "i long, am string"
    )
    got = {
        r["i"]: r["urls"]
        for r in df.select(
            "i", unpack_associated_media(F.col("am")).alias("urls")
        ).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, cases[i][0], got[i], want)


def test_bpe_tokens_cross_engine_parity(spark):
    """functions/text.py bpe_tokens: the Spark (Java regex) and DuckDB
    (RE2) evaluations of BPE_TOKEN_PATTERN produce identical token lists
    on adversarial inputs — the property every oracle built on it needs."""
    import duckdb

    from biocache_store_spark.functions.text import (
        BPE_TOKEN_PATTERN,
        bpe_token_count,
        bpe_tokens,
    )

    cases = [
        "Hello world",
        "it's Tom's 42nd try",
        "  leading and   multi  spaces ",
        "mixed123runs and CamelCase Words",
        "punct!!! ... --- (nested) [ok]",
        "tabs\tand\nnewlines\r\nhere",
        "Ünïcöde létters überall",
        "digits 007 42.5 1,000",
        "",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "text string")
    got = {
        r["text"]: (r["toks"], r["n"])
        for r in df.select(
            "text",
            bpe_tokens(F.col("text")).alias("toks"),
            bpe_token_count(F.col("text")).alias("n"),
        ).collect()
    }
    con = duckdb.connect()
    for c in cases:
        expected = con.execute(
            "SELECT regexp_extract_all(?, ?)", [c, BPE_TOKEN_PATTERN]
        ).fetchone()[0]
        assert got[c][0] == expected, c
        assert got[c][1] == len(expected), c
    # sanity on the semantics themselves
    assert got["Hello world"][0] == ["Hello", " world"]
    assert got["it's Tom's 42nd try"][0] == [
        "it", "'s", " Tom", "'s", " 42", "nd", " try",
    ]


def test_domain_curation_blocklist_and_cap(spark):
    """URL-domain curation: extract_domain strips www. and lowercases;
    filter_blocked_domains drops blocklisted domains; cap_per_domain
    keeps the first K docs per domain by id — under-cap domains pass
    wholesale, over-cap domains truncate deterministically."""
    from biocache_store_spark.operators.curation import (
        cap_per_domain,
        extract_domain,
        filter_blocked_domains,
    )

    docs = spark.createDataFrame(
        [
            (1, "http://www.Spam.example/x"),
            (2, "http://spam.example/y"),
            (3, "http://a.example/1"),
            (4, "http://a.example/2"),
            (5, "http://www.a.example/3"),
            (6, "http://b.example/1"),
            (7, "not a url"),
        ],
        "doc_id long, url string",
    )
    doms = {
        r["doc_id"]: r["d"]
        for r in docs.select("doc_id", extract_domain("url").alias("d")).collect()
    }
    assert doms[1] == "spam.example" and doms[5] == "a.example"
    assert doms[7] is None
    block = spark.createDataFrame([("spam.example",)], "domain string")
    unblocked = filter_blocked_domains(docs, block)
    assert {r["doc_id"] for r in unblocked.collect()} == {3, 4, 5, 6, 7}
    capped = cap_per_domain(unblocked, 2)
    assert {r["doc_id"] for r in capped.collect()} == {3, 4, 6, 7}
    # www-prefixed BLOCKLIST entries normalize like the document side
    block_www = spark.createDataFrame([("www.spam.example",)], "domain string")
    assert {
        r["doc_id"] for r in filter_blocked_domains(docs, block_www).collect()
    } == {3, 4, 5, 6, 7}
    # junk URLs pass the cap untouched even when BOTH domain and id are
    # NULL (the sentinel key falls back to a per-row monotonic id)
    junk = spark.createDataFrame(
        [(None, "no url 1"), (None, "no url 2"), (None, "no url 3"),
         (8, "http://c.example/1")],
        "doc_id long, url string",
    )
    assert cap_per_domain(junk, 1).count() == 4
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_docs"):
        cap_per_domain(docs, 0)


def test_cap_per_domain_dirty_input_determinism(spark):
    """The 'first K by id, deterministically' contract on dirty input:
    NULL-id rows must NOT win cap slots ahead of real ids (ASC NULLS
    FIRST would), ties among NULL-id rows resolve deterministically by
    content, and NULL-domain rows sharing one id value all pass through
    (the sentinel is per-row, never pooled by id)."""
    from biocache_store_spark.operators.curation import cap_per_domain

    rows = [
        (1, "http://d.example/1", "a"),
        (2, "http://d.example/2", "b"),
        (None, "http://d.example/3", "c"),
        (None, "http://d.example/4", "d"),
        (None, "http://d.example/5", "e"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, url string, text string")
    # cap 2: both real ids survive, no NULL-id row sneaks in
    got = cap_per_domain(docs, 2).collect()
    assert sorted(r["doc_id"] for r in got) == [1, 2]
    # cap 3: the one surviving NULL-id row is the same under repeated
    # runs and different partitionings (content-hash tiebreak)
    survivors = set()
    for n_parts in (1, 7):
        out = cap_per_domain(docs.repartition(n_parts), 3).collect()
        ids = sorted((r["doc_id"] is None, r["text"]) for r in out)
        survivors.add(tuple(ids))
    assert len(survivors) == 1
    assert sum(1 for isnull, _ in next(iter(survivors)) if isnull) == 1

    # NULL-domain rows POOLING one id value: all pass through, cap or no
    junk = spark.createDataFrame(
        [(9, "junk one"), (9, "junk two"), (9, "junk three"),
         (9, "http://ok.example/a"), (9, "http://ok.example/b")],
        "doc_id long, url string",
    )
    out = cap_per_domain(junk, 1).collect()
    # 3 junk rows pass through + 1 of the 2 ok.example rows
    assert len(out) == 4
    assert sum(1 for r in out if r["url"].startswith("junk")) == 3


def test_plan_training_shards_layout(spark):
    """plan_training_shards: deterministic across partitionings, dense
    0-based positions per shard, token_offset = prefix sum of sizes."""
    from biocache_store_spark.operators.curation import plan_training_shards

    docs = spark.range(0, 200).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7 + 1).alias("n_tok")
    )
    a = plan_training_shards(docs, 4, token_col="n_tok").collect()
    b = plan_training_shards(docs.repartition(13), 4, token_col="n_tok").collect()
    assert sorted(map(str, a)) == sorted(map(str, b))
    by_shard = {}
    for r in a:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) <= set(range(4)) and len(by_shard) == 4
    for rows in by_shard.values():
        rows.sort(key=lambda r: r["pos"])
        assert [r["pos"] for r in rows] == list(range(len(rows)))
        off = 0
        for r in rows:
            assert r["token_offset"] == off
            off += r["n_tok"]


def test_plan_training_shards_wide_shard_count(spark):
    """Shard id draws on 4 md5 bytes, so n_shards > 256 populates shards
    above 255 (a single-byte hash would leave them permanently empty)."""
    from biocache_store_spark.operators.curation import plan_training_shards

    docs = spark.range(0, 400).select(F.col("id").alias("doc_id"))
    shards = {
        r["shard"] for r in plan_training_shards(docs, 512).select("shard").collect()
    }
    assert max(shards) >= 256
    assert min(shards) >= 0 and max(shards) < 512


def test_dsir_importance_ranks_target_like_docs(spark):
    """DSIR importance (operators/curation.py dsir_importance): a raw
    document built from the target corpus's vocabulary must outscore one
    from a disjoint vocabulary; weights are partitioning-independent and
    docs with no tokens are omitted."""
    from biocache_store_spark.operators.curation import (
        dsir_importance,
        dsir_select,
    )

    target = spark.createDataFrame(
        [(100 + i, "the quick brown fox jumps over the lazy dog") for i in range(4)],
        "doc_id int, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps high"),   # target-like
            (2, "zzz qqq vvv kkk www yyy"),          # disjoint vocab
            (3, ""),                                  # no features -> omitted
        ],
        "doc_id int, text string",
    )
    w = {r["doc_id"]: r for r in dsir_importance(train, target).collect()}
    assert set(w) == {1, 2}
    assert w[1]["importance"] > w[2]["importance"]
    # partitioning independence (the integer-sum discipline)
    w7 = {
        r["doc_id"]: r["importance"]
        for r in dsir_importance(train.repartition(7), target.repartition(5)).collect()
    }
    assert w7 == {k: r["importance"] for k, r in w.items()}
    # threshold regime: pure filter, no rank column
    sel = dsir_select(
        dsir_importance(train, target), threshold=w[1]["importance"]
    )
    picked = {r["doc_id"] for r in sel.collect() if r["selected"]}
    assert picked == {1}
    assert "rank" not in sel.columns
    # exactly one of the two regimes must be given
    import pytest as _pytest

    with _pytest.raises(ValueError):
        dsir_select(dsir_importance(train, target))
    with _pytest.raises(ValueError):
        dsir_select(dsir_importance(train, target), top_fraction=0.5, threshold=1.0)


def test_dsir_log_ratio_mode_matches_python_reference(spark):
    """mode='log_ratio' computes the PUBLISHED DSIR estimator
    Σ_f c_f·(log p̂_f − log q̂_f) with add-one smoothing over 16^n_hex
    buckets — verified feature-for-feature against a pure-Python replica
    (same md5 bucketing, same smoothing); both modes rank a separable
    corpus identically; an unknown mode raises."""
    import hashlib
    import math
    from collections import Counter

    import pytest as _pytest

    from biocache_store_spark.operators.curation import dsir_importance

    target_rows = [(100, "the quick brown fox"), (101, "the lazy dog sleeps")]
    train_rows = [
        (1, "the quick brown fox jumps"),  # target-like
        (2, "qqq vvv kkk www"),            # disjoint
        (3, "the dog sleeps"),             # target-like
    ]
    target = spark.createDataFrame(target_rows, "doc_id int, text string")
    train = spark.createDataFrame(train_rows, "doc_id int, text string")
    n_hex, b_total = 3, 16**3

    def buckets(text):
        toks = text.lower().split()
        feats = ["u|" + t for t in toks] + [
            "b|" + toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1)
        ]
        return [
            hashlib.md5(f.encode()).hexdigest()[:n_hex] for f in feats
        ]

    cp = Counter(b for _, t in target_rows for b in buckets(t))
    cq = Counter(b for _, t in train_rows for b in buckets(t))
    np_, nq = sum(cp.values()), sum(cq.values())

    def py_score(text):
        bs = buckets(text)
        return sum(
            math.log((cp[b] + 1) / (np_ + b_total))
            - math.log((cq[b] + 1) / (nq + b_total))
            for b in bs
        )

    got = {
        r["doc_id"]: r["importance"]
        for r in dsir_importance(train, target, mode="log_ratio").collect()
    }
    for doc_id, text in train_rows:
        assert got[doc_id] == _pytest.approx(py_score(text), abs=1e-6)

    # ranking parity with the rational default on a separable corpus
    rational = {
        r["doc_id"]: r["importance"]
        for r in dsir_importance(train, target).collect()
    }
    rank = lambda d: sorted(d, key=d.get)  # noqa: E731
    assert rank(got) == rank(rational)

    with _pytest.raises(ValueError, match="mode"):
        dsir_importance(train, target, mode="geometric")


def test_dsir_importance_featureless_target_raises(spark):
    """A target corpus with no features (empty or all-blank text) has no
    evidence to weight against — the operator must raise, not emit NULL
    importances that downstream selection would silently rank by id."""
    import pytest as _pytest

    from biocache_store_spark.operators.curation import dsir_importance

    target = spark.createDataFrame([(1, "   ")], "doc_id int, text string")
    train = spark.createDataFrame(
        [(2, "hello world")], "doc_id int, text string"
    )
    with _pytest.raises(Exception, match="no features"):
        dsir_importance(train, target).collect()


def test_write_dsir_stats_rebuild_clears_old_folds(spark, tmp_path):
    """Rebuilding the DSIR stats must DELETE prior cq/part=* folds:
    probing after a rebuild scores against the fresh corpus only, never
    a mix of old-run counts (the silent-corruption case)."""
    from pyspark.sql import functions as F

    from biocache_store_spark.operators.curation import (
        append_dsir_stats,
        dsir_importance,
        probe_dsir_stats,
        write_dsir_stats,
    )

    target = spark.createDataFrame(
        [(100, "the quick brown fox")], "doc_id long, text string"
    )
    seed = spark.createDataFrame(
        [(1, "the quick fox"), (2, "zzz qqq www")], "doc_id long, text string"
    )
    stats = str(tmp_path / "stats")
    write_dsir_stats(target, seed, stats)
    append_dsir_stats(
        spark.createDataFrame([(3, "ppp rrr sss")], "doc_id long, text string"),
        stats,
        part="old",
    )
    # rebuild on a different corpus: old folds must vanish
    seed2 = spark.createDataFrame(
        [(4, "the lazy dog"), (5, "aaa bbb ccc")], "doc_id long, text string"
    )
    write_dsir_stats(target, seed2, stats)
    parts = {
        r["part"]
        for r in spark.read.parquet(stats + "/cq").select("part").distinct().collect()
    }
    assert parts == {"seed"}
    probe = {
        r["doc_id"]: r["importance"]
        for r in probe_dsir_stats(spark, stats, seed2).collect()
    }
    batch = {
        r["doc_id"]: r["importance"]
        for r in dsir_importance(seed2, target).collect()
    }
    assert probe == batch
    # part labels that would break partition-dir parsing are rejected
    import pytest as _pytest

    with _pytest.raises(ValueError, match="plain label"):
        append_dsir_stats(seed2, stats, part="a=b")


def test_cap_per_domain_map_column_survives(spark):
    """A MapType metadata column must not make the cap throw: the
    deterministic tiebreak hashes only hashable columns."""
    from pyspark.sql import functions as F

    from biocache_store_spark.operators.curation import cap_per_domain

    docs = spark.createDataFrame(
        [(1, "http://a.example/1"), (2, "http://a.example/2"),
         (3, "http://a.example/3")],
        "doc_id long, url string",
    ).withColumn("meta", F.create_map(F.lit("k"), F.col("doc_id").cast("string")))
    got = cap_per_domain(docs, 2).collect()
    assert sorted(r["doc_id"] for r in got) == [1, 2]
