"""Curation operators: repetition signals, decontamination, PII scrub."""

import pytest
from pyspark.sql import functions as F

from yckg_spark.operators.curation import (
    decontaminate,
    line_dedup,
    pii_scrub,
    repetition_signals,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_repetition_signals_known_values(spark):
    df = _docs(spark, ["a a a a", "a b c d", "x", "a b a b a"])
    rows = {r["doc_id"]: r for r in repetition_signals(df, grams=(2, 3)).collect()}

    assert rows[0]["dup_word_frac"] == 0.75  # 1 - 1/4
    assert rows[0]["top2gram_frac"] == 1.0  # "a a" x3 of 3
    assert rows[0]["top3gram_frac"] == 1.0

    assert rows[1]["dup_word_frac"] == 0.0
    assert rows[1]["top2gram_frac"] == pytest.approx(1 / 3, abs=1e-4)
    assert rows[1]["top3gram_frac"] == 0.5

    # under n tokens: shingles() falls back to [norm] -> a single gram
    assert rows[2]["dup_word_frac"] == 0.0
    assert rows[2]["top2gram_frac"] == 1.0

    assert rows[3]["dup_word_frac"] == 0.6  # 1 - 2/5
    assert rows[3]["top2gram_frac"] == 0.5  # "a b" 2 of 4
    assert rows[3]["top3gram_frac"] == pytest.approx(2 / 3, abs=1e-4)


def test_repetition_filterable(spark):
    df = _docs(spark, ["spam spam spam spam spam", "the quick brown fox jumps over it"])
    kept = repetition_signals(df).filter(F.col("top2gram_frac") < 0.9)
    assert [r["doc_id"] for r in kept.collect()] == [1]


def test_decontaminate_flags_benchmark_overlap(spark):
    bench = _docs(spark, ["q1 q2 q3 q4 q5 q6 q7 q8"])
    train = spark.createDataFrame(
        [
            (10, "intro q1 q2 q3 q4 q5 q6 q7 q8 outro"),  # contains the bench 8-gram
            (11, "clean text with eight tokens here now ok"),  # 8 tokens, no overlap
            (12, "short doc under eight"),  # excluded: < 8 tokens
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["n_hit_grams"] for r in decontaminate(train, bench, n=8).collect()}
    assert out == {10: 1}


def test_decontaminate_counts_distinct_hits(spark):
    bench = _docs(spark, ["a b c d e f g h i"])  # grams: a..h, b..i
    train = spark.createDataFrame(
        [(20, "a b c d e f g h i j")], "doc_id long, text string"
    )
    out = decontaminate(train, bench, n=8).collect()
    assert out[0]["n_hit_grams"] == 2


def test_pii_scrub_all_types(spark):
    df = _docs(spark, ["mail bob@foo.org and 1.2.3.4 call +44-123-4567 end"])
    r = pii_scrub(df).collect()[0]
    assert (r["n_email"], r["n_ipv4"], r["n_phone"]) == (1, 1, 1)
    assert r["text_scrubbed"] == "mail [EMAIL] and [IP] call [PHONE] end"


def test_pii_scrub_multiple_and_none(spark):
    df = _docs(spark, ["a@b.co c@d.org", "no pii here at all"])
    rows = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert rows[0]["n_email"] == 2
    assert rows[0]["text_scrubbed"] == "[EMAIL] [EMAIL]"
    assert rows[1]["n_email"] == rows[1]["n_ipv4"] == rows[1]["n_phone"] == 0
    assert rows[1]["text_scrubbed"] == "no pii here at all"


def test_pii_scrub_email_consumed_before_ip_pass(spark):
    # the host part of an address never double-counts as an IP: emails are
    # replaced first (PII_PATTERNS order), and counts run on the raw text
    df = _docs(spark, ["x 10.0.0.1@example.com y"])
    r = pii_scrub(df).collect()[0]
    assert r["n_email"] == 1
    assert r["text_scrubbed"] == "x [EMAIL] y"


def test_curation_tolerates_null_and_empty_text(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "ok text here")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    assert len(rows) == 3
    assert rows[2]["dup_word_frac"] == 0.0  # [''] -> 1 distinct of 1
    scrub = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert scrub[1]["text_scrubbed"] is None and scrub[1]["n_email"] is None
    # null/short texts never participate in decontamination
    bench = spark.createDataFrame([(9, "a b c d e f g h")], "doc_id long, text string")
    assert decontaminate(df, bench, n=8).count() == 0


def test_line_dedup_drops_shared_keeps_unique(spark):
    df = _docs(
        spark,
        [
            "unique one alpha\nshared footer\nunique one beta",
            "shared footer\nunique two alpha\nshared footer",
            "unique three alpha\nshared footer",
        ],
    )
    rows = {r["doc_id"]: r for r in line_dedup(df).collect()}
    assert rows[0]["text_deduped"] == "unique one alpha\nunique one beta"
    assert (rows[0]["n_lines"], rows[0]["n_kept"]) == (3, 2)
    # both copies of the shared line drop from doc 1
    assert rows[1]["text_deduped"] == "unique two alpha"
    assert (rows[1]["n_lines"], rows[1]["n_kept"]) == (3, 1)
    assert rows[2]["text_deduped"] == "unique three alpha"


def test_line_dedup_within_doc_repeat_counts_once(spark):
    df = _docs(spark, ["only here\nonly here", "other text line"])
    rows = {r["doc_id"]: r for r in line_dedup(df).collect()}
    # repeated within ONE doc -> distinct-doc count 1 -> kept, order intact
    assert rows[0]["text_deduped"] == "only here\nonly here"
    assert rows[0]["n_kept"] == 2


def test_line_dedup_all_boilerplate_survives_empty(spark):
    df = _docs(spark, ["footer", "footer", "footer\nreal content line"])
    rows = {r["doc_id"]: r for r in line_dedup(df).collect()}
    assert len(rows) == 3  # fully-deduped docs still present
    assert rows[0]["text_deduped"] == "" and rows[0]["n_kept"] == 0
    assert rows[2]["text_deduped"] == "real content line"


def test_line_dedup_min_docs_threshold(spark):
    df = _docs(spark, ["pair line\na", "pair line\nb", "c"])
    # at min_docs=3 a line in only 2 docs is kept
    rows = {r["doc_id"]: r for r in line_dedup(df, min_docs=3).collect()}
    assert rows[0]["text_deduped"] == "pair line\na"
    rows = {r["doc_id"]: r for r in line_dedup(df, min_docs=2).collect()}
    assert rows[0]["text_deduped"] == "a"


def test_line_dedup_null_and_empty_text(spark):
    df = _docs(spark, [None, "", "x\ny"])
    rows = {r["doc_id"]: r for r in line_dedup(df).collect()}
    # null coalesces to "" -> one empty line; two docs share it -> dropped
    assert rows[0]["n_lines"] == 1 and rows[0]["n_kept"] == 0
    assert rows[1]["n_lines"] == 1 and rows[1]["n_kept"] == 0
    assert rows[2]["text_deduped"] == "x\ny"


def test_line_dedup_order_preserved_across_drops(spark):
    df = _docs(spark, ["z last\ncommon\na first", "common\nmiddle own"])
    rows = {r["doc_id"]: r for r in line_dedup(df).collect()}
    assert rows[0]["text_deduped"] == "z last\na first"  # original order, not sorted


def test_line_dedup_shuffle_join_path_matches_broadcast(spark):
    df = _docs(
        spark,
        [
            "unique one alpha\nshared footer\nunique one beta",
            "shared footer\nunique two alpha\nshared footer",
            "unique three alpha\nshared footer",
            None,
            "",
        ],
    )
    a = sorted(line_dedup(df, broadcast_freq=True).collect())
    b = sorted(line_dedup(df, broadcast_freq=False).collect())
    assert a == b


def test_dup_span_stats_known_values(spark):
    """Hand-computed 3-gram span stats: the shared sentence's grams are
    dup in both carriers, the unique tails are not, and a short doc
    scores zero over zero grams."""
    from yckg_spark.operators.curation import dup_span_stats

    shared = "the quick brown fox"
    df = _docs(spark, [
        shared + " went home today",        # 0: 7 toks -> 5 grams
        shared + " ate something else",     # 1: 7 toks -> 5 grams
        "completely different text here",   # 2: 4 toks -> 2 grams, unique
        "too short",                        # 3: 2 toks -> 0 grams
    ])
    rows = {r["doc_id"]: r for r in dup_span_stats(df, k=3).collect()}
    assert len(rows) == 4
    # grams of doc 0: [the quick brown, quick brown fox, brown fox went,
    # fox went home, went home today] — first two shared with doc 1
    assert rows[0]["n_grams"] == 5 and rows[0]["n_dup_grams"] == 2
    assert rows[0]["dup_span_frac"] == pytest.approx(0.4)
    assert rows[1]["n_grams"] == 5 and rows[1]["n_dup_grams"] == 2
    assert rows[2]["n_grams"] == 2 and rows[2]["n_dup_grams"] == 0
    assert rows[3]["n_grams"] == 0 and rows[3]["n_dup_grams"] == 0
    assert rows[3]["dup_span_frac"] == 0.0


def test_dup_span_stats_counts_positions_not_classes(spark):
    """A frequent gram repeated within one doc counts every position, and
    within-doc-only repetition is NOT cross-document duplication."""
    from yckg_spark.operators.curation import dup_span_stats

    df = _docs(spark, [
        "a b c a b c",   # 0: grams [a b c, b c a, c a b, a b c]
        "x a b c y",     # 1: carries "a b c" too -> cross-doc dup
        "q q q q q",     # 2: "q q q" x3 within one doc only
    ])
    rows = {r["doc_id"]: r for r in dup_span_stats(df, k=3).collect()}
    # both "a b c" positions in doc 0 are flagged
    assert rows[0]["n_grams"] == 4 and rows[0]["n_dup_grams"] == 2
    assert rows[1]["n_dup_grams"] == 1
    # min_docs counts distinct docs: doc 2's repeats stay unflagged
    assert rows[2]["n_grams"] == 3 and rows[2]["n_dup_grams"] == 0


def test_dup_span_stats_broadcast_flag_equivalent(spark):
    from yckg_spark.operators.curation import dup_span_stats

    df = _docs(spark, [
        "one two three four five six", "zero two three four five seven",
        "unrelated words entirely here now",
    ])
    a = {(r["doc_id"], r["n_grams"], r["n_dup_grams"])
         for r in dup_span_stats(df, k=4, broadcast_freq=True).collect()}
    b = {(r["doc_id"], r["n_grams"], r["n_dup_grams"])
         for r in dup_span_stats(df, k=4, broadcast_freq=False).collect()}
    assert a == b


def test_span_dedup_removes_shared_spans_keeps_unique(spark):
    """The shared 4-token run is excised from both carriers (overlapping
    dup grams merge into one removed span), unique tails survive in
    order, short docs pass through whole."""
    from yckg_spark.operators.curation import span_dedup

    shared = "the quick brown fox"
    df = _docs(spark, [
        "intro words " + shared + " tail one here",
        shared + " going elsewhere instead",
        "nothing shared in this document at all",
        "too short",
    ])
    rows = {r["doc_id"]: r for r in span_dedup(df, k=3).collect()}
    assert len(rows) == 4
    # the only shared 3-grams are (the quick brown) and (quick brown fox)
    # — no token after "fox" recurs — so covered tokens in doc 0 are
    # exactly the 4 of the shared run (overlapping grams merged)
    assert rows[0]["n_tokens"] == 9 and rows[0]["n_kept"] == 5
    assert rows[0]["text_deduped"] == "intro words tail one here"
    assert rows[1]["text_deduped"] == "going elsewhere instead"
    assert rows[2]["n_kept"] == rows[2]["n_tokens"] == 7
    assert rows[3]["n_kept"] == 2 and rows[3]["text_deduped"] == "too short"


def test_span_dedup_all_duplicate_doc_survives_empty(spark):
    from yckg_spark.operators.curation import span_dedup

    df = _docs(spark, ["a b c d", "a b c d", "x y z w"])
    rows = {r["doc_id"]: r for r in span_dedup(df, k=4).collect()}
    assert rows[0]["n_kept"] == 0 and rows[0]["text_deduped"] == ""
    assert rows[1]["n_kept"] == 0
    assert rows[2]["n_kept"] == 4 and rows[2]["text_deduped"] == "x y z w"


def test_span_dedup_within_doc_repeat_is_kept(spark):
    """A span repeated only inside one document is not cross-document
    duplication — nothing is removed."""
    from yckg_spark.operators.curation import span_dedup

    df = _docs(spark, ["p q r p q r p q r", "different words here entirely"])
    rows = {r["doc_id"]: r for r in span_dedup(df, k=3).collect()}
    assert rows[0]["n_kept"] == rows[0]["n_tokens"] == 9


def test_span_dedup_broadcast_flag_equivalent(spark):
    from yckg_spark.operators.curation import span_dedup

    df = _docs(spark, [
        "one two three four five six", "zero two three four five seven",
        "unrelated words entirely here now",
    ])
    a = {(r["doc_id"], r["n_kept"], r["text_deduped"])
         for r in span_dedup(df, k=4, broadcast_freq=True).collect()}
    b = {(r["doc_id"], r["n_kept"], r["text_deduped"])
         for r in span_dedup(df, k=4, broadcast_freq=False).collect()}
    assert a == b
