"""Property-based tests (hypothesis) for operator semantics.

Pins the R6–R9 array-operator contracts (FIXTURES.md §3.4) and the
exactness of the prefix-filter similarity join against brute force on
arbitrary inputs — not just the fixtures we thought of.
"""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bigdata_foundation_spark.operators import relational as R
from bigdata_foundation_spark.operators.dedup import (
    jaccard,
    ngram_jaccard_pairs,
    normalize_text,
    word_ngrams,
)

_settings = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(xs=st.lists(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), max_size=12))
@_settings
def test_array_reduce_sum_matches_python(spark, xs):
    df = spark.createDataFrame([(xs,)], "arr array<double>")
    got = df.select(R.array_reduce_sum("arr").alias("s")).first()["s"]
    assert math.isclose(got, sum(xs), rel_tol=1e-9, abs_tol=1e-9)


@given(
    xs=st.lists(st.integers(min_value=-100, max_value=100), max_size=10),
    start=st.integers(min_value=0, max_value=10),
    length=st.integers(min_value=0, max_value=10),
)
@_settings
def test_array_slice_is_cypher_halfopen(spark, xs, start, length):
    """R7: Cypher [a..b] is 0-based half-open → slice(a, b-a)."""
    df = spark.createDataFrame([(xs,)], "arr array<int>")
    got = df.select(R.array_slice("arr", start, length).alias("s")).first()["s"]
    assert got == xs[start : start + length]


@given(
    texts=st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=30),
        min_size=2,
        max_size=6,
    )
)
@_settings
def test_prefix_filter_join_is_exact(spark, texts):
    """The PPJoin-style candidate generation must lose nothing: its
    output equals brute-force all-pairs Jaccard on word 2-grams.
    Zero-token (empty/whitespace) docs are outside the operator's
    contract — they carry no n-grams and are excluded by design (r5
    guard) — so the brute side applies the same filter."""
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    t = 0.4
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, n=2, threshold=t).collect()
    }
    has_tokens = (
        F.size(F.filter(F.split(normalize_text("text"), " "), lambda x: x != "")) > 0
    )
    g = df.filter(has_tokens).select("doc_id", word_ngrams("text", 2).alias("g"))
    a = g.withColumnsRenamed({"doc_id": "ia", "g": "ga"})
    b = g.withColumnsRenamed({"doc_id": "ib", "g": "gb"})
    brute = {
        (r["ia"], r["ib"]): r["j"]
        for r in a.crossJoin(b)
        .filter(F.col("ia") < F.col("ib"))
        .withColumn("j", F.round(jaccard(F.col("ga"), F.col("gb")), 6))
        .filter(F.col("j") >= t)
        .collect()
    }
    assert got == brute


@given(
    group_vals=st.lists(
        st.tuples(st.integers(0, 3), st.integers(-50, 50)), min_size=1, max_size=20
    )
)
@_settings
def test_ordered_collect_deterministic(spark, group_vals):
    """R6: collect order must be explicit and deterministic regardless
    of input partitioning."""
    rows = [(g, i, v) for i, (g, v) in enumerate(group_vals)]
    df = spark.createDataFrame(rows, "grp int, ord int, val int")
    one = R.ordered_collect(df.repartition(1), ["grp"], "ord", "val").collect()
    many = R.ordered_collect(df.repartition(7), ["grp"], "ord", "val").collect()
    assert {r["grp"]: r["val_list"] for r in one} == {r["grp"]: r["val_list"] for r in many}


@given(
    left=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=15
    ),
    right=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)), max_size=15, unique_by=lambda t: (t[0], t[1])
    ),
    strict=st.booleans(),
)
@_settings
def test_asof_join_matches_bruteforce(spark, left, right, strict):
    """asof_join == per-row brute-force: for each left row, the right
    row with the greatest ts <= (or <) left ts within the key."""
    ldf = spark.createDataFrame([(k, float(t)) for k, t in left], "k int, t double")
    rdf = spark.createDataFrame(
        [(k, float(t), f"v{k}_{t}") for k, t in right], "k int, t double, v string"
    )
    out = R.asof_join(ldf, rdf, on=["k"], left_ts="t", right_ts="t",
                      payload={"v": "v"}, strict=strict)
    got = {}
    for r in out.collect():
        got.setdefault((r["k"], r["t"]), []).append(r["v"])
    for k, t in left:
        t = float(t)
        cands = [(rt, v) for rk, rt, v in ((x[0], float(x[1]), f"v{x[0]}_{x[1]}") for x in right)
                 if rk == k and (rt < t if strict else rt <= t)]
        want = max(cands)[1] if cands else None
        assert want in got[(k, t)], (k, t, want, got)


@given(
    docs=st.lists(
        st.lists(st.sampled_from(["alpha", "beta", "gamma", "", "delta d"]), min_size=0, max_size=6),
        min_size=1,
        max_size=8,
    ),
    min_count=st.integers(min_value=2, max_value=3),
)
@_settings
def test_line_dedup_matches_reference_model(spark, docs, min_count):
    """line_dedup == an independent pure-Python model of its contract
    on arbitrary small corpora: repeated (non-blank) lines survive only
    at their canonical (min doc_id, pos) occurrence; unique and blank
    lines survive everywhere; row count is preserved."""
    from bigdata_foundation_spark.operators.text import line_dedup

    rows = [(i, "\n".join(lines)) for i, lines in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["text"] for r in line_dedup(df, min_count=min_count).collect()}

    # reference model
    occurrences: dict[str, int] = {}
    first: dict[str, tuple[int, int]] = {}
    for i, lines in enumerate(rows):
        for pos, ln in enumerate(lines[1].split("\n")):
            occurrences[ln] = occurrences.get(ln, 0) + 1
            first.setdefault(ln, (i, pos))
    want = {}
    for i, text in rows:
        kept = [
            ln
            for pos, ln in enumerate(text.split("\n"))
            if ln == "" or occurrences[ln] < min_count or first[ln] == (i, pos)
        ]
        want[i] = "\n".join(kept)
    assert got == want


@given(
    toks=st.lists(st.integers(min_value=0, max_value=700), min_size=1, max_size=40),
    budget=st.sampled_from([64, 512]),
)
@_settings
def test_pack_sequences_invariants(spark, toks, budget):
    """Every document is packed exactly once, and no pack exceeds the
    budget unless it holds a single over-budget document."""
    from bigdata_foundation_spark.operators.packing import pack_sequences

    rows = [(i, " ".join("w" for _ in range(n)) if n else "") for i, n in enumerate(toks)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = pack_sequences(df, budget=budget).collect()
    assert sorted(r["doc_id"] for r in got) == list(range(len(toks)))
    packs: dict[int, list[int]] = {}
    for r in got:
        packs.setdefault(r["pack_id"], []).append(r["n_tokens"])
    for members in packs.values():
        assert sum(members) <= budget or len(members) == 1


@given(
    a=st.text(alphabet="abc d", max_size=60),
    b=st.text(alphabet="abc d", max_size=60),
    shared=st.text(alphabet="xyzw", min_size=10, max_size=30),
)
@_settings
def test_winnow_guarantee_property(a, b, shared):
    """The winnowing theorem (Schleimer 2003 §3), on the pure-Python
    replay: two documents sharing any substring of length >= w + k - 1
    share at least one fingerprint. Pure Python — the replay equals
    the engine by test_winnow_engine_matches_replay, so the property
    transfers. The planted passage's alphabet is disjoint from the
    fillers' and whitespace-free, so it survives normalization intact
    and any shared fingerprint provably has to come from somewhere."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from gen_pipeline_goldens import winnow

    k, w = 5, 4
    assert len(shared) >= w + k - 1
    fa = set(winnow(a + shared + a, k, w))
    fb = set(winnow(b + shared + b, k, w))
    assert fa & fb
