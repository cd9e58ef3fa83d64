"""Sketch operators: Count-Min guarantees, HLL bound, int8 quantization."""

from __future__ import annotations

import pyspark.sql.functions as F

from health_data_transformation_spark.operators.sketch import (
    count_min_build,
    count_min_estimate,
    hll_distinct_bounded,
)
from health_data_transformation_spark.functions.vector import int8_quantize, int_dot


def _keyed(spark, counts: dict[str, int]):
    rows = [(k,) for k, n in counts.items() for _ in range(n)]
    return spark.createDataFrame(rows, "k string")


def test_cms_never_underestimates(spark):
    counts = {f"key{i}": (i % 7) + 1 for i in range(200)}
    df = _keyed(spark, counts)
    sketch = count_min_build(df, "k", width=32, depth=3)  # tiny width -> collisions
    probes = df.select("k").distinct()
    est = {
        r["k"]: r["cms_estimate"]
        for r in count_min_estimate(sketch, probes, "k", width=32, depth=3).collect()
    }
    assert len(est) == len(counts)
    assert all(est[k] >= n for k, n in counts.items())


def test_cms_exact_without_collisions(spark):
    counts = {"a": 3, "b": 5, "c": 1}
    df = _keyed(spark, counts)
    sketch = count_min_build(df, "k", width=4096, depth=3)
    probes = df.select("k").distinct()
    est = {
        r["k"]: r["cms_estimate"]
        for r in count_min_estimate(sketch, probes, "k", width=4096, depth=3).collect()
    }
    assert est == counts


def test_cms_cells_are_mergeable(spark):
    """Sketch of (A union A) == per-cell sum of two sketches of A —
    the property that makes the build map-side combinable."""
    counts = {f"k{i}": i + 1 for i in range(20)}
    df = _keyed(spark, counts)
    single = count_min_build(df, "k", width=64, depth=2)
    doubled = count_min_build(df.union(df), "k", width=64, depth=2)
    joined = single.alias("s").join(doubled.alias("d"), ["row", "bucket"], "full")
    bad = joined.filter(F.col("d.cnt") != F.col("s.cnt") * 2).count()
    assert bad == 0


def test_hll_bound_holds(spark):
    df = spark.range(0, 5000).select(
        (F.col("id") % 5).cast("string").alias("g"), (F.col("id") % 997).alias("k")
    )
    out = hll_distinct_bounded(df, "k", "g").collect()
    assert len(out) == 5
    assert all(r["hll_within_bound"] for r in out)
    assert all(r["exact_distinct"] > 0 for r in out)


def test_int8_quantize_range_and_dot(spark):
    df = spark.createDataFrame(
        [([1.0, -0.5, 0.25],), ([0.1, 0.2, -0.4],)], "v array<double>"
    )
    q = df.select(int8_quantize("v").alias("q")).collect()
    # max-|x| element maps to +/-127 (floor may land one below for negatives)
    assert q[0]["q"] == [127, -64, 31]
    assert q[1]["q"] == [31, 63, -127]
    two = df.select(int8_quantize("v").alias("q")).limit(1)
    paired = two.crossJoin(two.select(F.col("q").alias("p")))
    dot = paired.select(int_dot("q", "p").alias("d")).collect()[0]["d"]
    assert dot == 127 * 127 + 64 * 64 + 31 * 31


def test_weighted_hash_sample_prefers_heavy_rows(spark):
    from health_data_transformation_spark.operators.sampling import (
        weighted_hash_sample,
    )

    light = spark.range(0, 1000).select(F.col("id"), F.lit(1).alias("w"))
    heavy = spark.range(1000, 2000).select(F.col("id"), F.lit(100).alias("w"))
    df = light.union(heavy)
    picked = weighted_hash_sample(df, "id", "w", k=200)
    n_heavy = picked.filter(F.col("id") >= 1000).count()
    assert picked.count() == 200
    assert n_heavy > 150  # 100x weight dominates the sample
    # deterministic: same call -> same rows
    again = weighted_hash_sample(df, "id", "w", k=200)
    assert picked.exceptAll(again).count() == 0


def test_grouped_median_odd_even(spark):
    from health_data_transformation_spark.operators.profile import grouped_median

    df = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 30), (2, 5), (2, 7)] + [(3, 4)],
        "k long, v long",
    )
    out = {r["k"]: (r["n"], r["med2"]) for r in grouped_median(df, "k", "v").collect()}
    assert out[1] == (3, 40)   # odd: 2*20
    assert out[2] == (2, 12)   # even: 5+7
    assert out[3] == (1, 8)    # singleton: 2*4


def test_stream_count_min_equals_batch(spark):
    from health_data_transformation_spark.operators.sketch import count_min_build
    from health_data_transformation_spark.sources.tables import load_table
    from health_data_transformation_spark.streaming.sketch import (
        stream_count_min_cells,
    )

    sf = "/root/testdata/sf0.001"
    streamed = stream_count_min_cells(spark, sf, "user_id", width=64, depth=2, n_chunks=3)
    batch = count_min_build(
        load_table(spark, sf, "events").select("user_id"), "user_id", 64, 2
    )
    assert streamed.count() == batch.count()
    assert streamed.exceptAll(batch).count() == 0


def test_pagerank_integer_star_graph(spark):
    from health_data_transformation_spark.operators.graph import (
        pagerank_integer,
        symmetrize,
    )

    # star: hub h connected to 3 leaves -> hub outranks leaves, exact ints
    pairs = spark.createDataFrame(
        [("h", "a"), ("h", "b"), ("h", "c")], "x string, y string"
    )
    edges = symmetrize(pairs, "x", "y")
    ranks = {r["node"]: r["rank_ppm"] for r in pagerank_integer(edges, 3).collect()}
    assert set(ranks) == {"h", "a", "b", "c"}
    assert ranks["a"] == ranks["b"] == ranks["c"]
    assert ranks["h"] > ranks["a"]
    # deterministic: exact same integers on rerun
    again = {r["node"]: r["rank_ppm"] for r in pagerank_integer(edges, 3).collect()}
    assert ranks == again


def test_exact_vector_prepass_unsaturates_sig_buckets(spark):
    """§8.10 (the §8.9 contract on the embedding family): a
    byte-identical vector cluster bigger than ``max_bucket`` saturates
    its one signature bucket and the cap drops the WHOLE cluster —
    zero pairs, the r7-measured failure mode; with
    ``pre_dedup_exact=True`` the cluster collapses to its min-id
    representative, the cap stops firing, and pairs to the genuinely
    distinct same-direction variants are found (a positive scaling
    preserves every hyperplane sign AND the per-vector-scaled int8
    quantization, so variants share the keeper's bucket by
    construction).  The groups table holds the C(g,2) exact-copy
    membership compactly."""
    from health_data_transformation_spark.operators.similarity import (
        embedding_lsh_pairs,
        exact_vector_prepass,
    )

    v = [1.0, -2.0, 3.0, -4.0, 5.0, -6.0, 7.0, -8.0]
    rows = [(i, v) for i in range(12)]  # 12 exact copies
    rows.append((100, [x * 1.5 for x in v]))  # distinct bytes, same direction
    rows.append((101, [x * 2.0 for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    kw = dict(n_planes=4, dim=8, max_bucket=6)
    capped = embedding_lsh_pairs(df, **kw).collect()
    assert capped == []  # the 14-member bucket is dropped wholesale

    reps_pairs = {
        (r["id_a"], r["id_b"])
        for r in embedding_lsh_pairs(df, pre_dedup_exact=True, **kw).collect()
    }
    assert reps_pairs == {(0, 100), (0, 101), (100, 101)}

    reps, groups = exact_vector_prepass(df)
    g = {r["keeper_id"]: r["n_copies"] for r in groups.collect()}
    assert g[0] == 12  # C(12,2) pairs held compactly by membership
    assert g[100] == 1 and g[101] == 1
    assert sorted(r["vec_id"] for r in reps.select("vec_id").collect()) == (
        [0, 100, 101]
    )


def test_embedding_lsh_recall_on_tight_clusters(spark):
    """Angularly tight clusters collide in signature; near-orthogonal
    clusters do not (random-hyperplane LSH approximates cosine)."""
    from health_data_transformation_spark.operators.similarity import (
        embedding_lsh_pairs,
    )

    # two orthogonal directions in 64-d, small deterministic jitter
    rows = []
    for c, base_axis in [(0, 0), (1, 32)]:
        for i in range(20):
            v = [0.0] * 64
            v[base_axis] = 10.0
            v[(base_axis + 1 + i % 8) % 64] = 0.5  # jitter << base
            rows.append((c * 100 + i, c, v))
    df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<double>")
    pairs = embedding_lsh_pairs(df, n_planes=8).collect()
    assert pairs, "tight clusters must produce LSH collisions"
    cross = [p for p in pairs if (p["id_a"] < 100) != (p["id_b"] < 100)]
    same = [p for p in pairs if (p["id_a"] < 100) == (p["id_b"] < 100)]
    assert len(same) > 0 and len(cross) == 0
    # signatures are deterministic integers
    again = embedding_lsh_pairs(df, n_planes=8).collect()
    assert sorted(map(tuple, pairs)) == sorted(map(tuple, again))


def test_floor6_portable_where_round_diverges(spark):
    """Regression for the q48 sf0.001 divergence: Spark round(x, 6)
    rounds the double's shortest decimal rendering, DuckDB rounds the
    binary value — on digit-7 ties they disagree.  floor6 must agree
    with DuckDB's floor-based quantization bit-for-bit on the exact
    moment values that triggered the original mismatch."""
    import duckdb

    from health_data_transformation_spark.functions.deterministic import floor6

    # the exact decimal moments from lineitem 'A' at sf0.001
    s1, s2, n = 101703024.69, 7096786968835.8685, 1962
    var = (s2 - s1 * s1 / n) / (n - 1)
    [got] = spark.createDataFrame([(var,)], "v double").select(floor6("v")).collect()
    want = duckdb.sql(
        f"SELECT floor(CAST({var!r} AS DOUBLE) * 1000000.0) / 1000000.0"
    ).fetchone()[0]
    assert got[0] == want


def test_weighted_sample_equal_weights_is_hash_topk(spark):
    """With uniform weights the priority order degenerates to the plain
    hash order, so the weighted sample equals deterministic hash top-k."""
    from health_data_transformation_spark.functions.text import hex_hash64
    from health_data_transformation_spark.operators.sampling import (
        UNIFORM_BITS,
        weighted_hash_sample,
    )

    df = spark.range(0, 500).select(F.col("id"), F.lit(7).alias("w"))
    picked = {r["id"] for r in weighted_hash_sample(df, "id", "w", k=50).collect()}
    by_hash = {
        r["id"]
        for r in df.select(
            "id", F.pmod(hex_hash64(F.col("id").cast("string")), F.lit(UNIFORM_BITS)).alias("u")
        )
        .orderBy("u", "id")
        .limit(50)
        .collect()
    }
    assert picked == by_hash


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    from health_data_transformation_spark.operators.sketch import (
        bloom_build,
        bloom_probe,
    )

    members = spark.createDataFrame([(i,) for i in range(200)], "k long")
    bits = bloom_build(members, "k", n_bits=8192, k=3)
    # every word fits 32 bits (portable shifts) and the table is tiny
    assert bits.count() <= 8192 // 32
    probes = spark.createDataFrame([(i,) for i in range(400)], "k long")
    got = {r["k"]: r["bloom_member"] for r in bloom_probe(bits, probes, "k", 8192, 3).collect()}
    assert all(got[i] for i in range(200))          # one-sided: no false negatives
    fp = sum(1 for i in range(200, 400) if got[i])
    assert fp <= 40                                  # ~(1-e^-0.073)^3 << 10%
