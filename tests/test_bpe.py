"""BPE merge training / encoding vs an independent pure-Python
reference implementation (Sennrich et al. 2016 semantics)."""

from __future__ import annotations

import collections
import re

import pytest

from biocache_store_spark.operators.bpe import (
    END_OF_WORD,
    apply_bpe,
    train_bpe_merges,
    word_freq_table,
)


def _ref_train(word_freq: dict[str, int], n_merges: int, min_count: int = 2):
    """Independent reference trainer: dict-of-tuples implementation,
    deliberately structured nothing like the DataFrame version."""
    vocab = {tuple(w) + (END_OF_WORD,): c for w, c in word_freq.items()}
    merges = []
    for _ in range(n_merges):
        pairs: collections.Counter = collections.Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[syms[i], syms[i + 1]] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_count:
            break
        (left, right), cnt = best
        merges.append((left, right, left + right, cnt))
        new_vocab = {}
        for syms, c in vocab.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = left + right
                else:
                    out.append(s)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def _corpus(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_train_matches_reference_on_classic_example(spark):
    texts = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    docs = _corpus(spark, texts)
    got = [
        (r["left"], r["right"], r["merged"], r["pair_count"])
        for r in train_bpe_merges(docs, 6).orderBy("rank").collect()
    ]
    wf = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    assert got == _ref_train(wf, 6)
    # the classic first merges: (e,s) 9 then (es,t) 9 then (est,</w>) 9
    assert got[0] == ("e", "s", "es", 9)
    assert got[1] == ("es", "t", "est", 9)
    assert got[2] == ("est", END_OF_WORD, "est" + END_OF_WORD, 9)


def test_train_matches_reference_on_testdata(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = [
        (r["left"], r["right"], r["merged"], r["pair_count"])
        for r in train_bpe_merges(docs, 10).orderBy("rank").collect()
    ]
    wf: collections.Counter = collections.Counter()
    for row in docs.select("text").collect():
        wf.update(re.findall("[a-z]+", (row["text"] or "").lower()))
    assert got == _ref_train(dict(wf), 10)
    assert len(got) == 10


def test_greedy_nonoverlap_merge(spark):
    # 'aaa': merging (a,a) must give [aa, a], never [aa, aa]
    docs = _corpus(spark, ["aaa aaa aaa"])
    merges = train_bpe_merges(docs, 1, min_pair_count=1)
    enc = apply_bpe(docs, merges)
    row = enc.collect()[0]
    assert row["bpe_tokens"] == ["aa", "a", END_OF_WORD] * 3
    assert row["bpe_tokens_count"] == 9


def test_apply_bpe_encodes_like_reference_ranks(spark):
    texts = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    docs = _corpus(spark, texts)
    merges = train_bpe_merges(docs, 8)
    out = apply_bpe(_corpus(spark, ["newest lowest", ""]), merges)
    rows = {r["doc_id"]: r for r in out.collect()}
    # tokens losslessly reconstruct the normalized text, and the trained
    # rules actually fire ('est</w>' is rank 2, so 'newest' ends with it)
    toks = rows[0]["bpe_tokens"]
    assert "".join(toks) == "newest" + END_OF_WORD + "lowest" + END_OF_WORD
    assert "est" + END_OF_WORD in toks
    # unseen word still encodes (falls back to finer symbols), empty text -> []
    assert rows[1]["bpe_tokens"] == [] and rows[1]["bpe_tokens_count"] == 0
    # every token is either a base char, </w>, or a learned merged symbol
    learned = {r["merged"] for r in merges.collect()}
    for t in rows[0]["bpe_tokens"]:
        assert t in learned or len(t) == 1 or t == END_OF_WORD


def test_early_stop_on_min_count(spark):
    docs = _corpus(spark, ["ab cd"])  # every pair count = 1
    merges = train_bpe_merges(docs, 5)  # min_pair_count=2
    assert merges.count() == 0


def test_word_freq_max_words_bound(spark):
    docs = _corpus(spark, ["aa bb aa cc aa bb"])
    top = word_freq_table(docs, max_words=2).collect()
    assert {(r["word"], r["freq"]) for r in top} == {("aa", 3), ("bb", 2)}


@pytest.fixture(scope="module")
def sf_dir():
    return "/root/testdata/sf0.001"


def test_cli_train_bpe_and_export_shards(spark, tmp_path):
    """train-bpe -> export-shards round trip: shards partition the
    corpus, positions are dense per shard, and the token cursor is the
    running sum of the previous documents' BPE token counts."""
    from biocache_store_spark.cli import main

    store = str(tmp_path / "docs")
    texts = ["low lower newest"] * 4 + ["widest newest low"] * 4
    _corpus(spark, texts).write.parquet(store)

    merges_path = str(tmp_path / "merges")
    assert main(
        ["train-bpe", "--in", store, "--n-merges", "6", "--out", merges_path]
    ) == 0
    assert spark.read.parquet(merges_path).count() == 6

    shards = str(tmp_path / "shards")
    assert main([
        "export-shards", "--in", store, "--n-shards", "2",
        "--merges", merges_path, "--out", shards,
    ]) == 0
    out = spark.read.parquet(shards)
    assert out.count() == 8
    rows = sorted(
        out.select("shard", "pos", "n_tok", "token_offset").collect(),
        key=lambda r: (r["shard"], r["pos"]),
    )
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) <= {0, 1}
    for shard_rows in by_shard.values():
        cursor = 0
        for i, r in enumerate(shard_rows):
            assert r["pos"] == i
            assert r["token_offset"] == cursor
            cursor += r["n_tok"]
