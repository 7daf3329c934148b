"""BPE vocabulary induction (operators/bpe.py) pinned against an
independent pure-Python reference implementation of Sennrich-style
BPE (most-frequent adjacent pair, deterministic tie-break, leftmost
non-overlapping replacement)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from batch_processing_new_spark.operators.bpe import (
    N_MERGES,
    _EOW,
    learn_bpe,
    q169_bpe_vocab,
    segment,
)
from tests.conftest import SF_SMOKE


def _ref_apply(syms: tuple[str, ...], left: str, right: str) -> tuple[str, ...]:
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _ref_bpe(word_counts: dict[str, int], n_merges: int):
    """Independent reference: dict-of-tuples state, Counter pair stats."""
    state: dict[tuple[str, ...], int] = {}
    for w, c in word_counts.items():
        state[tuple(w) + (_EOW,)] = state.get(tuple(w) + (_EOW,), 0) + c
    merges = []
    for rank in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for syms, c in state.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        (l, r), pc = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, l, r, pc))
        nxt: dict[tuple[str, ...], int] = {}
        for syms, c in state.items():
            ns = _ref_apply(syms, l, r)
            nxt[ns] = nxt.get(ns, 0) + c
        state = nxt
    return merges


def _word_counts(spark, sf_dir):
    from batch_processing_new_spark.functions.text_funcs import tokens
    from batch_processing_new_spark.sources.readers import load_table

    d = load_table(spark, sf_dir, "documents")
    rows = (
        d.select(F.explode(tokens(F.col("text"))).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .collect()
    )
    return {r["word"]: r["cnt"] for r in rows}


def test_merge_list_matches_reference(spark):
    wc = _word_counts(spark, SF_SMOKE)
    expected = _ref_bpe(wc, N_MERGES)
    got = [
        (r["merge_rank"], r["left"], r["right"], r["pair_count"])
        for r in q169_bpe_vocab(spark, SF_SMOKE).collect()
    ]
    assert got == expected


def test_segmentation_matches_reference(spark):
    words = spark.createDataFrame(
        [("slow",), ("slower",), ("slowest",), ("low",), ("lowest",)],
        "word STRING",
    ).withColumn("cnt", F.lit(1) * (6 - F.length("word")))
    wc = {r["word"]: r["cnt"] for r in words.collect()}
    merges = learn_bpe(words, 6)
    assert merges == _ref_bpe(wc, 6)
    seg = {
        r["word"]: tuple(r["pieces"])
        for r in segment(words, merges).collect()
    }
    ref_state = {w: tuple(w) + (_EOW,) for w in wc}
    for _, l, r, _ in merges:
        ref_state = {w: _ref_apply(s, l, r) for w, s in ref_state.items()}
    assert seg == ref_state
    # pieces always reassemble the word exactly
    for w, pieces in seg.items():
        assert "".join(pieces) == w + _EOW


def test_overlapping_replacement_is_leftmost_nonoverlapping(spark):
    words = spark.createDataFrame([("aaa",), ("aa",)], "word STRING").withColumn(
        "cnt", F.lit(10)
    )
    merges = learn_bpe(words, 1)
    assert merges[0][1:3] == ("a", "a")
    seg = {
        r["word"]: tuple(r["pieces"])
        for r in segment(words, merges).collect()
    }
    assert seg["aaa"] == ("aa", "a", _EOW)
    assert seg["aa"] == ("aa", _EOW)


def test_corpus_piece_counts_match_reference(spark):
    from pyspark.sql import functions as F

    from batch_processing_new_spark.operators.bpe import (
        q180_bpe_tokenize_corpus,
    )

    wc = _word_counts(spark, SF_SMOKE)
    merges = _ref_bpe(wc, N_MERGES)
    counts: dict[str, int] = {}
    for w, c in wc.items():
        syms = tuple(w) + (_EOW,)
        for _, l, r, _ in merges:
            syms = _ref_apply(syms, l, r)
        for s in syms:
            counts[s] = counts.get(s, 0) + c
    tot = sum(counts.values())
    expected = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = q180_bpe_tokenize_corpus(spark, SF_SMOKE).collect()
    assert [(r["piece"], r["n"]) for r in got] == expected
    for r in got:
        assert abs(r["frac"] - round(r["n"] / tot, 6)) < 1e-9
