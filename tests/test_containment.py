"""Near-containment (operators/containment.py) against a brute-force
python replica: shingling, the df-cap, the directional size/id rule,
and the ratio threshold must all match on the real corpus sample and
on crafted edges (short docs, exact subsumption, boilerplate cap)."""

from __future__ import annotations

from eth_options_data_pipeline_spark.operators.containment import (
    containment_pairs,
    shingle_table,
)

N = 3
CAP = 20
MIN_C = 0.5


def _py_shingles(text: str, n: int = N) -> set:
    ws = [w for w in text.strip().split(" ") if w]
    return {" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)}


def _py_pairs(texts: dict, n: int = N, cap: int = CAP, min_c: float = MIN_C):
    sh = {d: _py_shingles(t, n) for d, t in texts.items() if t is not None}
    df: dict = {}
    for s in sh.values():
        for g in s:
            df[g] = df.get(g, 0) + 1
    kept = {d: {g for g in s if df[g] <= cap} for d, s in sh.items()}
    out = set()
    for a, sa in kept.items():
        for b, sb in kept.items():
            if a == b or not sa:
                continue
            if len(sa) < len(sb) or (len(sa) == len(sb) and a < b):
                shared = len(sa & sb)
                c = round(shared / len(sa), 6)
                if c >= min_c:
                    out.add((a, b, shared, len(sa), len(sb), c))
    return out


def test_matches_bruteforce_on_corpus_sample(spark, sf_small):
    # sort before limit: LIMIT without ordering may pick different
    # rows across the two jobs below (collect vs containment_pairs)
    docs = (spark.read.parquet(f"{sf_small}/documents.parquet")
            .select("doc_id", "text").orderBy("doc_id").limit(120))
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    got = {tuple(r) for r in
           containment_pairs(docs, df_cap=CAP,
                             min_containment=MIN_C).collect()}
    assert got == _py_pairs(texts)
    assert got, "sample produced no containment pairs — widen the limit"


def test_exact_subsumption_and_short_docs(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),   # container
        (2, "beta gamma delta"),                      # one shingle, inside 1
        (3, "one two"),                               # < n words: no shingles
        (4, None),                                    # null text
        (5, "totally different words here indeed"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["doc_id"], r["contained_in"], r["containment"])
           for r in containment_pairs(docs).collect()}
    assert (2, 1, 1.0) in got
    assert all(d not in (3, 4) and c not in (3, 4) for d, c, _ in got)


def test_df_cap_drops_boilerplate_shingle(spark):
    """A shingle shared by MORE than df_cap docs must not create
    pairs: 25 otherwise-disjoint docs sharing one boilerplate line
    produce zero output under cap 20."""
    boiler = "subscribe to our newsletter"
    rows = [(i, f"{boiler} unique{i} tail{i} end{i}") for i in range(25)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    assert containment_pairs(docs, df_cap=CAP).count() == 0


def test_shingle_table_is_distinct_per_doc(spark):
    docs = spark.createDataFrame(
        [(1, "a b c a b c a b c")], "doc_id long, text string")
    got = sorted(r["shingle"] for r in shingle_table(docs).collect())
    # 7 positions but only 3 distinct shingles
    assert got == ["a b c", "b c a", "c a b"]


def test_expansion_spread_gated_on_upstream_parallelism(spark, sf_small):
    """r17: the cap**2 pair expansion must not run on AQE's coalesced
    single partition when the shingle relation arrives unspread (the
    streaming index serve path). The fix is a keyless repartition of
    the bucket table, gated on upstream parallelism: an UNSPREAD input
    gets the spread exchange, an already-spread input does not pay it.
    Results are partitioning-invariant (the equality test above covers
    the corpus; this pins the plan gate both ways)."""
    from eth_options_data_pipeline_spark.operators.containment import (
        pairs_from_shingles,
    )

    def formatted(df) -> str:
        jvm = df.sparkSession._jvm
        mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted")
        return df._jdf.queryExecution().explainString(mode)

    docs = (spark.read.parquet(f"{sf_small}/documents.parquet")
            .select("doc_id", "text").orderBy("doc_id").limit(50))
    par = spark.sparkContext.defaultParallelism

    narrow = shingle_table(docs).coalesce(1)
    assert narrow.rdd.getNumPartitions() < par
    narrow_plan = formatted(pairs_from_shingles(narrow))
    n_narrow = narrow_plan.count("REPARTITION_BY_NUM")
    assert n_narrow >= 1, \
        "unspread input must get the expansion-spread repartition"

    # an already-spread input must NOT gain an extra bucket exchange:
    # the caller's own repartition(par) carries the only
    # REPARTITION_BY_NUM tags, appearing once per bucket-subtree copy
    # — the same multiplicity the operator's own spread has on the
    # narrow path, so equal counts == nothing was added
    wide = shingle_table(docs).repartition(par)
    assert wide.rdd.getNumPartitions() >= par
    wide_plan = formatted(pairs_from_shingles(wide))
    assert wide_plan.count("REPARTITION_BY_NUM") == n_narrow, \
        "already-spread input must not pay the extra bucket exchange"

    # and the two shapes agree on the data
    assert sorted(map(tuple, pairs_from_shingles(narrow).collect())) == \
        sorted(map(tuple, pairs_from_shingles(wide).collect()))


def test_pairs_from_shingles_equals_explode_path(spark, sf_small):
    """The streaming serve path (pairs_from_shingles over a
    materialized, pre-deduped shingle relation) must equal the batch
    explode path bit for bit — guards the r10 refactor that split
    containment_pairs in two."""
    from eth_options_data_pipeline_spark.operators.containment import (
        pairs_from_shingles,
    )
    docs = (spark.read.parquet(f"{sf_small}/documents.parquet")
            .select("doc_id", "text").orderBy("doc_id").limit(150))
    via_table = pairs_from_shingles(shingle_table(docs),
                                    min_containment=MIN_C, df_cap=CAP)
    direct = containment_pairs(docs, min_containment=MIN_C, df_cap=CAP)
    assert sorted(map(tuple, via_table.collect())) == \
        sorted(map(tuple, direct.collect()))
