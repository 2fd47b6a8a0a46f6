"""Unit tests for llm_ops/lm_ops.py — BPE training loop, segmentation,
bigram-LM scoring, char diversity, drift audit, hashed classifier."""

from __future__ import annotations

from collections import Counter

import pyspark.sql.functions as F

from tests.conftest import SF_DIR


def _py_bpe(word_freqs: dict, rounds: int):
    """Reference greedy BPE: returns (merge list, final segmentation)."""
    segs = {w: list(w) for w in word_freqs}
    merges = []
    for _ in range(rounds):
        pairs = Counter()
        for w, f in word_freqs.items():
            s = segs[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += f
        if not pairs:
            break
        best_count = max(pairs.values())
        pair = min(k for k, v in pairs.items() if v == best_count)
        merges.append((pair[0], pair[1], best_count))
        for w in segs:
            s, out, i = segs[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and (s[i], s[i + 1]) == pair:
                    out.append(s[i] + s[i + 1])
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = out
    return merges, segs


def test_bpe_merges_match_python_reference(spark, duck):
    """The in-plan merge loop must reproduce the reference greedy BPE
    trainer (same argmax tiebreak, same left-to-right merge semantics)
    on the shipped corpus."""
    from callio_etl_spark.llm_ops.lm_ops import BPE_ROUNDS, bpe_train_merges

    word_freqs = Counter()
    for (txt,) in duck.execute("SELECT text FROM documents").fetchall():
        for w in txt.split(" "):
            if w:
                word_freqs[w] += 1
    expected, _ = _py_bpe(word_freqs, BPE_ROUNDS)

    rows = bpe_train_merges(spark, SF_DIR).orderBy("round").collect()
    got = [(r["left_sym"], r["right_sym"], r["pair_count"]) for r in rows]
    assert got == expected


def test_bpe_merge_overlap_is_greedy_left_to_right(spark, tmp_path):
    """The double-space replace encoding must merge overlapping pair
    runs exactly like greedy BPE: 'aaaa' under (a,a) -> [aa, aa], then
    (aa, aa) -> [aaaa]."""
    from callio_etl_spark.llm_ops.lm_ops import _bpe_train

    df = spark.createDataFrame(
        [(i, "aaaa aaaa b", "en", "src0", 11) for i in range(4)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    vocab, merges = _bpe_train(spark, str(tmp_path), 2)
    m = [(r["l"], r["r"]) for t in merges for r in t.collect()]
    assert m == [("a", "a"), ("aa", "aa")]
    reprs = {r["word"]: r["repr"] for r in vocab.collect()}
    assert reprs["aaaa"] == "  aaaa  "
    assert reprs["b"] == "  b  "


def test_bpe_segment_token_conservation(spark):
    """Per doc: merges only shorten — n_words <= n_tokens <= n_chars;
    fertility in (0, 1]."""
    from callio_etl_spark.llm_ops.lm_ops import bpe_segment_docs

    rows = bpe_segment_docs(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_words"] <= r["n_tokens"] <= r["n_chars"]
        assert 0.0 < r["tokens_per_char"] <= 1.0


def test_bigram_lm_flags_gibberish(spark, tmp_path):
    """A document of unique never-repeated bigrams must score strictly
    below documents made of corpus-frequent bigrams; probabilities stay
    in (0, 1]."""
    from callio_etl_spark.llm_ops.lm_ops import bigram_lm_score

    fluent = [(i, "the cat sat on the mat", "en", "src0", 22) for i in range(9)]
    rows = fluent + [(9, "zq xv jk wp qz vx", "en", "src0", 17)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {r["doc_id"]: r for r in bigram_lm_score(spark, str(tmp_path)).collect()}
    assert len(out) == 10
    for r in out.values():
        assert 0.0 < r["min_bigram_p"] <= r["avg_bigram_p"] <= 1.0
    assert all(
        out[9]["avg_bigram_p"] < out[i]["avg_bigram_p"] for i in range(9)
    )


def test_char_diversity_hand_computed(spark, tmp_path):
    """gini = 1 - sum(c^2)/n^2 on a 4-char doc: 'aaab' -> 0.375."""
    from callio_etl_spark.llm_ops.lm_ops import char_diversity

    spark.createDataFrame(
        [(0, "aaab", "en", "src0", 4)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    r = char_diversity(spark, str(tmp_path)).first()
    assert r["distinct_chars"] == 2
    assert r["n_chars"] == 4
    assert abs(r["gini_diversity"] - 0.375) < 1e-12
    assert abs(r["top_char_frac"] - 0.75) < 1e-12


def test_hashed_classifier_is_shuffle_free(spark):
    """The scoring pass must plan as one scan + projection: no Exchange
    anywhere (the hashing-trick dot product stays in-row)."""
    from callio_etl_spark.llm_ops.lm_ops import hashed_classifier_score

    df = hashed_classifier_score(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    rows = df.collect()
    assert rows and all(-1.0 <= r["margin"] <= 1.0 for r in rows)


def test_token_dist_drift_bounds_and_order(spark):
    """TV in [0, 1], chi-square >= 0, ranks contiguous, abs_diff
    non-increasing in rank."""
    from callio_etl_spark.llm_ops.lm_ops import token_dist_drift

    rows = token_dist_drift(spark, SF_DIR).orderBy("rank").collect()
    assert rows
    tv = rows[0]["tv_total"]
    assert 0.0 <= tv <= 1.0
    assert rows[0]["chi2_total"] >= 0.0
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    diffs = [r["abs_diff"] for r in rows]
    assert diffs == sorted(diffs, reverse=True)
    for r in rows:
        assert 0.0 <= r["p_a"] <= 1.0 and 0.0 <= r["p_b"] <= 1.0
