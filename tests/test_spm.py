"""Unigram-LM (SentencePiece) tokenizer tests: hand-computed EM, a pure
Python reference mirror over randomized corpora (same spec: hard EM,
micro-nat integer scores, smallest-k tie-break), and the UNK paths."""

from __future__ import annotations

import math
import random
from collections import Counter

from pyspark.sql import functions as F

from convml_data_spark.operators import spm


# ------------------------------------------------------------ python mirror
def _py_viterbi(w: str, units: dict[str, int], K: int):
    L = len(w)
    b: list = [0] + [None] * L
    bp: list = [None] * (L + 1)
    for i in range(1, L + 1):
        best, bk = None, None
        for k in range(1, min(K, i) + 1):  # ascending: smallest k wins ties
            if b[i - k] is None:
                continue
            u = units.get(w[i - k : i])
            if u is None:
                continue
            s = b[i - k] + u
            if best is None or s > best:
                best, bk = s, k
        b[i], bp[i] = best, bk
    if b[L] is None:
        return None
    pieces, pos = [], L
    while pos > 0:
        k = bp[pos]
        pieces.append(w[pos - k : pos])
        pos -= k
    return pieces


def _py_units(counts: dict[str, int]) -> dict[str, int]:
    tot = float(sum(counts.values()))
    return {
        p: math.floor(math.log(n / tot) * 1e6 + 0.5) for p, n in counts.items()
    }


def _py_train(texts, vocab_top, K, R, L):
    words = Counter(
        w for t in texts for w in t.lower().split() if w and len(w) <= L
    )
    seeds: Counter = Counter()
    for w, c in words.items():
        for i in range(len(w)):
            for k in range(1, min(K, len(w) - i) + 1):
                seeds[w[i : i + k]] += c
    vocab = {p: n for p, n in seeds.items() if len(p) == 1}
    multis = sorted(
        ((p, n) for p, n in seeds.items() if len(p) >= 2),
        key=lambda x: (-x[1], x[0]),
    )[: vocab_top]
    vocab.update(dict(multis))
    for _ in range(R):
        units = _py_units(vocab)
        counts: Counter = Counter()
        for w, c in words.items():
            for p in _py_viterbi(w, units, K):
                counts[p] += c
        vocab = dict(counts)
    units = _py_units(vocab)
    return {p: (n, units[p] / 1e6) for p, n in vocab.items()}


def _py_encode(texts, vocab_logp, K, L):
    units = {p: math.floor(lp * 1e6 + 0.5) for p, lp in vocab_logp.items()}
    out = []
    for t in texts:
        ws = [w for w in t.lower().split() if w]
        n_chars = sum(len(w) for w in ws)
        n_pieces = n_unk = 0
        for w in ws:
            seg = _py_viterbi(w, units, K) if len(w) <= L else None
            if seg is None:
                n_unk += 1
            else:
                n_pieces += len(seg)
        out.append((len(ws), n_chars, n_pieces, n_unk))
    return out


# ------------------------------------------------------------------- tests
def test_unigram_train_hand_computed(spark):
    """corpus 'ab ab b': seed vocab {a:2, b:3, ab:2}; round-1 Viterbi
    segments 'ab' as [ab] (one ln(2/7) beats ln(2/7)+ln(3/7)), so 'a'
    drops out; final counts ab:2, b:1 with ln(2/3)/ln(1/3) quantized."""
    docs = spark.createDataFrame([(0, "ab ab b")], "doc_id long, text string")
    got = {
        r["piece"]: (r["n"], r["logp"])
        for r in spm.unigram_train(
            docs, vocab_top=2, piece_max_len=2, em_rounds=2, word_max_len=8
        ).collect()
    }
    assert got == {
        "ab": (2, math.floor(math.log(2 / 3) * 1e6 + 0.5) / 1e6),
        "b": (1, math.floor(math.log(1 / 3) * 1e6 + 0.5) / 1e6),
    }
    enc = spm.unigram_encode(
        docs,
        spm.unigram_train(
            docs, vocab_top=2, piece_max_len=2, em_rounds=2, word_max_len=8
        ),
        word_max_len=8,
        piece_max_len=2,
    ).collect()
    assert [tuple(r) for r in enc] == [(0, 3, 5, 3, 0)]


def test_viterbi_tie_breaks_to_smallest_last_piece(spark):
    """Equal-score lattice paths pick the smallest last-piece length at
    every position — 'ab' under units {a:-100, b:-100, ab:-200} ties
    [a,b] against [ab] and must segment as [a,b] in engine and mirror."""
    df = (
        spark.createDataFrame([("ab",)], "w string")
        .withColumn("_ps", F.array(F.lit("a"), F.lit("ab"), F.lit("b")))
        .withColumn(
            "_us",
            F.array(
                F.lit(-100).cast("bigint"),
                F.lit(-200).cast("bigint"),
                F.lit(-100).cast("bigint"),
            ),
        )
    )
    row = spm.viterbi_segment(df, "w", 4, 2).collect()[0]
    assert row["_score"] == -200
    assert sorted(row["_pieces"]) == ["a", "b"]
    # mirror agrees (its backtrace emits last-piece-first)
    assert _py_viterbi("ab", {"a": -100, "b": -100, "ab": -200}, 2) == ["b", "a"]


def test_unigram_matches_python_reference_randomized(spark):
    """Randomized corpora: engine train AND encode equal the pure-python
    mirror of the spec (same seeds, quantization, tie-breaks)."""
    rng = random.Random(1303)
    for trial in range(3):
        alpha = "abcd"
        vocab_words = [
            "".join(rng.choice(alpha) for _ in range(rng.randint(1, 8)))
            for _ in range(rng.randint(5, 14))
        ]
        texts = [
            " ".join(rng.choice(vocab_words) for _ in range(rng.randint(1, 12)))
            for _ in range(10)
        ]
        docs = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        expect = _py_train(texts, vocab_top=6, K=3, R=2, L=8)
        vocab = spm.unigram_train(
            docs, vocab_top=6, piece_max_len=3, em_rounds=2, word_max_len=8
        )
        got = {r["piece"]: (r["n"], r["logp"]) for r in vocab.collect()}
        assert got == expect, (trial, texts)
        enc = {
            r["doc_id"]: (
                r["n_words"],
                r["n_chars"],
                r["n_pieces"],
                r["n_unk_words"],
            )
            for r in spm.unigram_encode(
                docs, vocab, word_max_len=8, piece_max_len=3
            ).collect()
        }
        expect_enc = dict(
            enumerate(_py_encode(texts, {p: lp for p, (_, lp) in expect.items()}, 3, 8))
        )
        assert enc == expect_enc, (trial, texts)


def test_unigram_encode_unk_paths(spark):
    """Words longer than word_max_len and words with characters the
    vocabulary never saw both count as UNK (0 pieces), everything else
    still segments."""
    train = spark.createDataFrame([(0, "ab ab b")], "doc_id long, text string")
    vocab = spm.unigram_train(
        train, vocab_top=2, piece_max_len=2, em_rounds=1, word_max_len=8
    )
    docs = spark.createDataFrame(
        [(1, "ab zzz b"), (2, "abababababab ab")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_words"], r["n_chars"], r["n_pieces"], r["n_unk_words"])
        for r in spm.unigram_encode(
            docs, vocab, word_max_len=8, piece_max_len=2
        ).collect()
    }
    # doc 1: 'zzz' unsegmentable; doc 2: 12-char word exceeds L=8
    assert got[1] == (3, 6, 2, 1)
    assert got[2] == (2, 14, 1, 1)


def test_viterbi_arrow_engine_equals_expression_engine(spark):
    """The r15 Arrow fast path and the original expression DP are the
    SAME algorithm: randomized vocab/word sets (ties, UNK chars,
    unsegmentable words, overlong words, single chars) must produce
    identical (_score, _pieces) — array ORDER included (both emit
    backtrace order). The expr form stays the oracle-shaped reference;
    this pins that swapping the default engine changed nothing."""
    import random

    rng = random.Random(77)
    alpha = "abcd"
    vocab = {}
    for ch in alpha[:3]:  # 'd' deliberately missing -> UNK paths
        vocab[ch] = -rng.randrange(50, 300)
    for _ in range(12):
        ln = rng.randrange(2, 5)
        p = "".join(rng.choice(alpha[:3]) for _ in range(ln))
        vocab[p] = -rng.randrange(50, 900)
    # force exact ties: a two-char piece costing exactly its chars' sum
    vocab["aa"] = 2 * vocab["a"]
    words = list(
        {
            "".join(rng.choice(alpha) for _ in range(rng.randrange(1, 13)))
            for _ in range(300)
        }
    )
    ps = sorted(vocab)
    df = (
        spark.createDataFrame([(w,) for w in words], "w string")
        .withColumn("_ps", F.array(*[F.lit(p) for p in ps]))
        .withColumn(
            "_us",
            F.array(*[F.lit(vocab[p]).cast("bigint") for p in ps]),
        )
    )
    L, K = 10, 4
    got_a = {
        r["w"]: (r["_score"], tuple(r["_pieces"]) if r["_pieces"] is not None else None)
        for r in spm.viterbi_segment(df, "w", L, K, engine="arrow").collect()
    }
    got_e = {
        r["w"]: (r["_score"], tuple(r["_pieces"]) if r["_pieces"] is not None else None)
        for r in spm.viterbi_segment(df, "w", L, K, engine="expr").collect()
    }
    assert got_a == got_e
    # the interesting paths actually occurred
    assert any(v[0] is None for v in got_a.values())  # UNK/overlong
    assert any(v[0] is not None for v in got_a.values())


def test_viterbi_arrow_engine_null_word_matches_expr(spark):
    """A NULL word must score (NULL, NULL) in BOTH engines — the arrow
    path used to raise TypeError on len(None) where the expr path
    returned NULL (r15 ADVICE), and arrow is the default engine."""
    df = (
        spark.createDataFrame([("ab",), (None,)], "w string")
        .withColumn("_ps", F.array(F.lit("a"), F.lit("b")))
        .withColumn(
            "_us", F.array(F.lit(-10).cast("bigint"), F.lit(-20).cast("bigint"))
        )
    )
    for eng in ("arrow", "expr"):
        rows = {
            r["w"]: (r["_score"], r["_pieces"])
            for r in spm.viterbi_segment(df, "w", 5, 2, engine=eng).collect()
        }
        assert rows[None] == (None, None), eng
        assert rows["ab"][0] == -30, eng


def test_unigram_train_validates_params(spark):
    import pytest

    docs = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        spm.unigram_train(docs, em_rounds=0)
    with pytest.raises(ValueError):
        spm.unigram_train(docs, piece_max_len=1)
