"""WordPiece tokenizer tests: greedy longest-match semantics, UNK rules,
vocab construction, and a randomized Python cross-check."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from convml_data_spark.operators import wordpiece as WP


def _vocab_df(spark, pieces):
    return spark.createDataFrame([(p,) for p in pieces], "piece string")


def test_wordpiece_encode_hand_example(spark):
    # BERT's canonical example shape: 'abcd' -> ab + ##cd
    docs = spark.createDataFrame(
        [(0, "abcd ab xq"), (1, "a")], "doc_id long, text string"
    )
    v = _vocab_df(spark, ["ab", "##cd", "a", "b", "##b", "##c", "##d"])
    out = {r["doc_id"]: r for r in WP.wordpiece_encode(docs, v).collect()}
    # 'abcd' = ab+##cd (2), 'ab' = ab (1), 'xq' = UNK
    assert (out[0]["n_words"], out[0]["n_pieces"], out[0]["n_unk_words"]) == (3, 3, 1)
    assert (out[1]["n_words"], out[1]["n_pieces"], out[1]["n_unk_words"]) == (1, 1, 0)


def test_wordpiece_greedy_is_longest_match_not_optimal(spark):
    # greedy takes 'abc' then fails on 'd' if only ##d missing — while a
    # segmentation ab + ##cd exists. WordPiece is DEFINED greedy: UNK.
    docs = spark.createDataFrame([(0, "abcd")], "doc_id long, text string")
    v = _vocab_df(spark, ["abc", "ab", "##cd", "a"])
    r = WP.wordpiece_encode(docs, v).collect()[0]
    assert (r["n_pieces"], r["n_unk_words"]) == (0, 1)


def test_wordpiece_unk_rules(spark):
    docs = spark.createDataFrame(
        [(0, "verylongwordxx ok")], "doc_id long, text string"
    )
    v = _vocab_df(spark, ["ok", "v", "##e"])
    # word longer than word_max_len=10 -> UNK by fiat
    r = WP.wordpiece_encode(docs, v, word_max_len=10).collect()[0]
    assert (r["n_words"], r["n_pieces"], r["n_unk_words"]) == (2, 1, 1)


def test_wordpiece_vocab_positional_forms_and_cap(spark):
    docs = spark.createDataFrame(
        [(0, "abab abab cdcd")], "doc_id long, text string"
    )
    v = {r["piece"] for r in WP.wordpiece_vocab(docs, vocab_top=4).collect()}
    # single chars present in both positional forms
    assert {"a", "##b", "##a", "c", "##d", "##c"} <= v
    # word-initial multigram raw, internal multigram ##-prefixed
    assert "ab" in v and "##ab" in v or "##ba" in v
    assert not any(p.startswith("##") and len(p) == 2 for p in v)  # '##' alone never


def _py_wordpiece(word, vocab, L, K):
    if len(word) > L:
        return None
    pos, n = 0, 0
    while pos < len(word):
        k = None
        for kk in range(min(K, len(word) - pos), 0, -1):
            form = word[pos : pos + kk] if pos == 0 else "##" + word[pos : pos + kk]
            if form in vocab:
                k = kk
                break
        if k is None:
            return None
        pos += k
        n += 1
    return n


def test_wordpiece_matches_python_reference_randomized(spark):
    rng = random.Random(7)
    words = [
        "".join(rng.choice("abcde") for _ in range(rng.randint(1, 9)))
        for _ in range(120)
    ]
    docs = spark.createDataFrame(
        [(i, " ".join(words[i * 4 : i * 4 + 4])) for i in range(30)],
        "doc_id long, text string",
    )
    vocab = WP.wordpiece_vocab(docs, vocab_top=12, piece_max_len=3)
    pieces = {r["piece"] for r in vocab.collect()}
    got = {r["doc_id"]: r for r in WP.wordpiece_encode(docs, vocab, piece_max_len=3).collect()}
    for i in range(30):
        ws = words[i * 4 : i * 4 + 4]
        exp_np = sum(_py_wordpiece(w, pieces, 10, 3) or 0 for w in ws)
        exp_unk = sum(1 for w in ws if _py_wordpiece(w, pieces, 10, 3) is None)
        r = got[i]
        assert (r["n_words"], r["n_pieces"], r["n_unk_words"]) == (
            len(ws), exp_np, exp_unk,
        ), (i, ws)


def test_wordpiece_partitioning_independent(spark):
    docs = spark.createDataFrame(
        [(i, f"alpha bet{i % 5} gamma") for i in range(40)],
        "doc_id long, text string",
    )
    v = WP.wordpiece_vocab(docs)
    a = sorted(tuple(r) for r in WP.wordpiece_encode(docs, v).collect())
    b = sorted(
        tuple(r) for r in WP.wordpiece_encode(docs.repartition(7), v).collect()
    )
    assert a == b


def test_wordpiece_hash_words_are_unk_and_excluded_from_vocab(spark):
    # '#'-containing corpus words can't be represented by the positional
    # '##' encoding: excluded from vocab, UNK at encode (review finding)
    docs = spark.createDataFrame(
        [(0, "##a ok ok ok")], "doc_id long, text string"
    )
    v = WP.wordpiece_vocab(docs, vocab_top=8)
    assert not any("#" in r["piece"].replace("##", "", 1) for r in v.collect())
    r = WP.wordpiece_encode(docs, v).collect()[0]
    assert r["n_unk_words"] == 1 and r["n_words"] == 4
