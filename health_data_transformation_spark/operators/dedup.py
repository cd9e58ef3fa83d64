"""Deduplication operator family (SURVEY.md §2.3 D1-D4 + LLM-pipeline
near-dup extensions).

Exact dedup generalizes the reference's per-row duplicate probes
(/root/reference/load_hhs.py:8-32, load_quality.py:13-31) into
set-based anti-joins and first-wins key dedup.  Near-dup (MinHash/LSH,
SimHash, n-gram Jaccard, embedding cosine) is the 100 TB extension: the
all-pairs O(N^2) comparison is replaced by banding/bucketing so the
shuffle key is the bucket id and comparisons happen only within
buckets.

All hashes are md5-derived (functions.text.hex_hash64) — portable, so
the DuckDB oracle reproduces signatures exactly.

Scale notes:
- ``dedup_first_wins`` is a single hash-aggregate (map-side combined).
- ``anti_join_new`` prunes the probe to touched partitions when the
  target is partitioned on the key's date component, and Spark/AQE
  broadcasts the smaller side automatically.
- MinHash banding: r rows x b bands; a pair agreeing on any band
  collides.  The band-bucket groupBy shuffles the *signatures* (tiny),
  never the documents.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F

from ..functions.deterministic import floor6
from pyspark.sql import DataFrame, Window

from ..functions.text import distinct_tokens, hex_hash64


# ---------------------------------------------------------------------------
# exact dedup (D1-D4)
# ---------------------------------------------------------------------------

def dedup_first_wins(df: DataFrame, keys: Sequence[str], order_by: Sequence[str]) -> DataFrame:
    """Keep exactly one row per key, deterministically.

    The reference's first-wins semantics (insert-if-absent inside a file,
    /root/reference/load_hhs.py:75-82) depend on CSV row order; the
    deterministic Spark equivalent orders by an explicit tiebreak and
    takes row_number()==1.
    """
    w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order_by])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def anti_join_new(batch: DataFrame, target: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Rows of ``batch`` whose key is absent from ``target`` (D4 upsert
    probe: replaces one SELECT round-trip per row in the reference)."""
    return batch.join(target.select(*keys), list(keys), "left_anti")


def semi_join_existing(batch: DataFrame, target: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Rows of ``batch`` already present in ``target`` (the reference's
    'duplicate' bucket, load_quality.py:122-126)."""
    return batch.join(target.select(*keys), list(keys), "left_semi")


def exact_content_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact-content dedup groups: md5 fingerprint -> (keeper, count)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("keeper_id"), F.count("*").alias("n_copies"))
    )


def exact_prepass(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame]:
    """The §8.9 production contract as a composition: linear exact-hash
    dedup owns byte-identical content BEFORE banded LSH ever sees it.

    Returns ``(reps, groups)``: ``reps`` is one representative row per
    distinct content (min-``id_col`` keeper, full original schema);
    ``groups`` is ``exact_content_groups``'s (fingerprint, keeper_id,
    n_copies) table.  A g-copy exact group contributes its C(g,2)
    "pairs" COMPACTLY through ``groups`` (group membership, linear to
    compute and to store) instead of as a quadratic pair list — the r7
    §8.9 wave measured why that matters: 819 exact-copy groups on the
    40%-duplicate corpus held 39.4M analytic-truth pairs, which the
    capped LSH path recovered at 0.009% (the cap protects the
    quadratic verifier by dropping saturated buckets wholesale).
    Running LSH on ``reps`` only, every byte-identical cluster
    collapses to one bucket member, so the cap stops burning recall on
    content the exact pass already owns.

    Callers needing that full coverage pass ``return_groups=True`` (only
    valid with ``pre_dedup_exact``) and get ``(pairs, groups)`` — the
    prepass fingerprint groupBy and semi join run ONCE instead of the
    caller re-running ``exact_prepass`` beside this function.

    Scale shape: one groupBy on the 16-byte fingerprint (map-side
    combinable) + one semi join on ``id_col`` — both linear, both on
    compact keys; the text column never re-shuffles.
    """
    groups = exact_content_groups(df, text_col, id_col)
    reps = df.join(
        groups.select(F.col("keeper_id").alias(id_col)), id_col, "left_semi"
    )
    return reps, groups


# ---------------------------------------------------------------------------
# near-dup: MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", num_hashes: int = 8,
    shingle_k: int | None = None, widen: bool = True,
) -> DataFrame:
    """MinHash signature per document over its distinct-token set (or,
    with ``shingle_k``, its distinct k-token-shingle set — the
    high-cardinality unit that keeps downstream similarity joins off
    hot keys when the raw vocabulary is small).

    sig_i = min over tokens of hex_hash64(token, salt=i).  Computed as a
    per-row array expression (no explode, no shuffle).

    ``widen`` gates the task-granularity guard: widen_coarse_scan's
    ``df.rdd`` split probe is only safe on SCAN-ROOTED frames (on an
    exchange-bearing plan AQE materializes every upstream stage just to
    count partitions).  Callers handed an *arbitrary* user frame —
    lsh_incremental_matches's corpus/batch inputs — must pass
    ``widen=False``; the registry's own scan-rooted paths keep the
    default.
    """
    from ..functions.text import token_shingles

    if widen:
        # signature compute is the heavy per-row stage — make sure it is
        # not serialized into one task by an unsplittable small scan
        from .skew import widen_coarse_scan

        df = widen_coarse_scan(df, id_col)
    toks = (
        F.array_distinct(token_shingles(text_col, shingle_k))
        if shingle_k
        else distinct_tokens(text_col)
    )

    def hasher(salt: str):
        # single-arg closure: a two-arg lambda would be (element, index)
        # to F.transform and silently shadow the salt
        return lambda t: hex_hash64(t, salt=salt)

    cols = [F.col(id_col)]
    for i in range(num_hashes):
        sig = F.array_min(F.transform(toks, hasher(f"mh{i}")))
        cols.append(sig.alias(f"sig{i}"))
    return df.select(*cols)


def _band_explode(
    signatures: DataFrame,
    id_col: str,
    band_size: int,
    num_hashes: int,
    out_id: str | None = None,
    band_in_hash: bool = True,
) -> DataFrame:
    """One-pass band fanout: (id, band, bucket) rows, one per (doc, band),
    via explode(array(struct...)) — the signature subtree executes ONCE.

    The previous shape — one select per band, unioned — physically
    executed the signature plan once per branch (the q315
    double-execution class): minhash is an O(num_hashes x tokens)
    expression per row, so B band branches re-hashed every document B
    times before the bucket groupBy/join even started.  The explode
    evaluates sig0..sigN once per row and fans out map-side in the same
    stage; bucket hash formulas are preserved exactly (``band_in_hash``
    keeps the two historical variants bit-identical so the DuckDB
    oracles still reproduce them).
    """
    assert num_hashes % band_size == 0
    structs = []
    for b in range(num_hashes // band_size):
        sig_cols = [F.col(f"sig{b * band_size + j}") for j in range(band_size)]
        parts = [c.cast("string") for c in sig_cols]
        if band_in_hash:
            parts = [F.lit(b)] + parts
        structs.append(
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws(",", *parts)).alias("bucket"),
            )
        )
    out = out_id or id_col
    return signatures.select(
        F.col(id_col).alias(out), F.explode(F.array(*structs)).alias("_bb")
    ).select(out, F.col("_bb.band").alias("band"), F.col("_bb.bucket").alias("bucket"))


def _cap_buckets(
    exploded: DataFrame,
    max_bucket: int | None,
    pair_budget: int | None = None,
) -> DataFrame:
    """Drop oversized buckets BEFORE pair expansion (shared by the
    batch and incremental candidate generators so the cap semantics
    cannot drift).  A windowed count beats a groupBy+join-back: one
    shuffle on the same key, one pass over the banded rows.

    ``pair_budget`` (§8.10b, mutually exclusive with ``max_bucket``):
    derive the bucket-size threshold from a total candidate-pair
    budget instead of an absolute constant — §8.10a measured the
    absolute form going vacuous under corpus growth (every bucket
    outgrows a fixed constant at 2x)."""
    if max_bucket is not None and pair_budget is not None:
        raise ValueError("pass max_bucket or pair_budget, not both")
    if pair_budget is not None:
        from .similarity import apply_pair_budget

        return apply_pair_budget(exploded, "bucket", pair_budget)
    if max_bucket is None:
        return exploded
    sizes = Window.partitionBy("bucket")
    return (
        exploded.withColumn("_bn", F.count("*").over(sizes))
        .filter(F.col("_bn") <= max_bucket)
        .drop("_bn")
    )


def lsh_band_buckets(
    signatures: DataFrame, id_col: str = "doc_id", band_size: int = 2, num_hashes: int = 8
) -> DataFrame:
    """Band the signature and emit (band_id, bucket_hash, doc ids...).

    Docs sharing any band bucket are near-dup *candidates*; downstream
    verification (exact Jaccard) runs only within buckets.
    """
    all_bands = _band_explode(
        signatures, id_col, band_size, num_hashes, band_in_hash=False
    )
    return (
        all_bands.groupBy("band", "bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("min_doc"),
            F.max(id_col).alias("max_doc"),
        )
        .filter(F.col("n_docs") >= 2)
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    band_size: int = 2,
    num_hashes: int = 8,
    max_bucket: int | None = None,
    pair_budget: int | None = None,
) -> DataFrame:
    """Distinct candidate pairs (a < b) colliding on >= 1 LSH band.

    Self-join is on the band bucket (tiny shuffle key), not on content.

    ``max_bucket`` drops buckets larger than the cap before the pair
    expansion — the standard guard at scale: a bucket of size n emits
    n(n-1)/2 pairs, and oversized buckets come from low-information
    shingle sets (boilerplate), so capping bounds the quadratic term
    without losing real near-dups.  ``pair_budget`` is the §8.10b
    budget-derived alternative (threshold sized from total candidate
    volume; stays non-vacuous under corpus growth); exclusive with
    ``max_bucket``.
    """
    exploded = _cap_buckets(
        _band_explode(signatures, id_col, band_size, num_hashes).drop("band"),
        max_bucket,
        pair_budget,
    )
    # Self-join over IDENTICAL aliased subtrees (rename only AFTER the
    # join): the old shape projected id -> id_a / id_b BELOW the
    # exchange, which broke plan canonicalization, so no ReusedExchange
    # fired and the minhash subtree executed once per side.  With both
    # sides canonically equal, the bucket shuffle is computed once and
    # reused; pair expansion stays distributed across bucket partitions.
    # (A collect_list + nested-transform expansion was measured 2.2x
    # SLOWER at sf0.1: the per-row slice copies serialize quadratic
    # work into single tasks — the join is the right fanout engine.)
    # shuffle-hash, never broadcast: a corpus-scale band table must not
    # be broadcast at 100 TB, and locally the broadcast plan runs the
    # whole pair expansion inside the (often single, unsplittable-
    # parquet) stream-side scan task — the shuffle IS the parallelism
    xa = exploded.alias("_xa").hint("shuffle_hash")
    xb = exploded.alias("_xb").hint("shuffle_hash")
    return (
        xa.join(xb, "bucket")
        .filter(F.col(f"_xa.{id_col}") < F.col(f"_xb.{id_col}"))
        .select(
            F.col(f"_xa.{id_col}").alias("id_a"),
            F.col(f"_xb.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def lsh_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    band_size: int = 2,
    num_hashes: int = 8,
    min_jaccard: float = 0.5,
    max_bucket: int | None = None,
    shingle_k: int | None = None,
    widen: bool = True,
    pre_dedup_exact: bool = False,
    pair_budget: int | None = None,
    return_groups: bool = False,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """End-to-end MinHash-LSH near-dup detection:
    shingle -> minhash -> band -> bucket-join candidates -> exact-Jaccard
    verify -> threshold.

    Scale shape: the only joins are (a) the bucket self-join, whose key
    cardinality ~= corpus size x bands / avg-bucket-size (tiny rows:
    id + 32-byte bucket) and whose quadratic term is bounded by
    ``max_bucket``, and (b) two id-equi joins rehydrating token
    sets for the *candidate* pairs only — never a quadratic pass over
    the corpus.  Output: (id_a, id_b, jaccard), id_a < id_b.

    ``pre_dedup_exact`` (the §8.9 contract, operationalized): collapse
    byte-identical contents to their min-id representative FIRST via
    ``exact_prepass``, run the banded pipeline on representatives only,
    and return representative-level pairs.  Exact-copy clusters then
    never saturate band buckets, so ``max_bucket`` is the fallback for
    genuinely distinct near-dup content rather than the default path
    burning recall on boilerplate (r7 measured 0.009% pair recall on
    saturated clusters without the prepass).  Full-corpus coverage =
    these pairs + ``exact_prepass``'s groups table (compact C(g,2)).
    """
    if return_groups and not pre_dedup_exact:
        raise ValueError("return_groups requires pre_dedup_exact=True")
    groups = None
    if pre_dedup_exact:
        df, groups = exact_prepass(df, text_col, id_col)
        # the semi join above roots the frame on an exchange, so the
        # minhash task-granularity probe must not run (see is_scan_rooted)
        widen = False
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_k, widen=widen)
    cands = lsh_candidate_pairs(
        sigs, id_col, band_size, num_hashes, max_bucket, pair_budget
    )
    from ..functions.text import token_shingles

    set_expr = (
        F.array_distinct(token_shingles(text_col, shingle_k))
        if shingle_k
        else distinct_tokens(text_col)
    )
    toks = df.select(F.col(id_col), set_expr.alias("toks"))
    a = toks.select(F.col(id_col).alias("id_a"), F.col("toks").alias("toks_a"))
    b = toks.select(F.col(id_col).alias("id_b"), F.col("toks").alias("toks_b"))
    joined = cands.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("toks_a", "toks_b")).cast("double")
    union = (F.size("toks_a") + F.size("toks_b")).cast("double") - inter
    jac = floor6(inter / union)
    pairs = joined.select("id_a", "id_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= min_jaccard
    )
    if return_groups:
        return pairs, groups
    return pairs


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Dedup clusters from near-dup pairs: connected components by
    iterative min-label propagation.

    The last stage of the dedup pipeline (pairs are not enough — A~B and
    B~C must collapse to ONE keeper).  Each iteration: every node takes
    the min label among itself and its neighbors; converges in
    O(component diameter) rounds, and near-dup components are shallow by
    construction (they share content).  Each round is one shuffle on the
    node id; the frontier is checkpointed so the plan stays flat.

    Returns (node, component) with component = min node id reachable —
    the deterministic canonical "keeper" for the cluster.
    """
    from .graph import symmetrize

    # one-pass explode symmetrization: a two-branch union would run
    # the (often expensive — banded-join) pair builder once per
    # branch before the checkpoint lands.  eager=False: the seed
    # label aggregation below is the first consumer and its map side
    # computes (and persists) every edge partition — eager's count()
    # was one more full blocking pass over the pair builder's output.
    edges = symmetrize(pairs, id_a, id_b).localCheckpoint(eager=False)
    # seed = the first propagation round for free: from identity labels,
    # round 1's neighbor-min is just min(dst) per src (no join needed),
    # so start from least(node, min neighbor).  Near-dup components are
    # mostly 2-3 node stars, which this seed already solves — the loop
    # then usually runs a single confirming round.
    labels = (
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.min("dst").alias("_nbr0"))
        .select(
            "node", F.least(F.col("node"), F.col("_nbr0")).alias("component")
        )
        # eager=False (r13): the convergence-sum collect right below
        # materializes the checkpoint (its map side computes every
        # partition), so eager's separate count() job was one redundant
        # blocking round-trip per CC round
        .localCheckpoint(eager=False)
    )
    # labels only ever decrease, so sum(component) is a monotone
    # convergence signal: one cheap aggregate per round instead of a
    # self-join diff
    prev_sum = labels.agg(F.sum("component")).collect()[0][0]
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.src == labels.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("component").alias("nbr_min"))
        )
        propagated = labels.join(neighbor_min, "node", "left").select(
            "node",
            F.least(
                F.col("component"), F.coalesce("nbr_min", "component")
            ).alias("component"),
        )
        # pointer jumping: follow component -> that node's component, so
        # label distance doubles per round (O(log diameter) convergence
        # instead of O(diameter))
        roots = propagated.select(
            F.col("node").alias("component"), F.col("component").alias("root")
        )
        labels = (
            propagated.join(roots, "component", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("root", "component")
                ).alias("component"),
            )
            # eager=False: materialized by the convergence-sum collect
            # (see the seed checkpoint above)
            .localCheckpoint(eager=False)
        )
        cur_sum = labels.agg(F.sum("component")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


# ---------------------------------------------------------------------------
# near-dup: SimHash
# ---------------------------------------------------------------------------

def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 16,
    set_col: str | None = None, pre_dedup_exact: bool = False,
) -> DataFrame:
    """SimHash over a document's feature set: per-bit majority vote of
    feature hashes.  Features default to distinct whitespace tokens;
    pass ``set_col`` (a pre-built distinct array column, e.g. shingles)
    when tokens are too common to discriminate.

    Expressed as explode -> conditional sums -> bit pack.  The groupBy key
    is the document id, so partial aggregation combines map-side; token
    rows never hit the shuffle at full width (two long columns only).

    ``pre_dedup_exact`` (§8.9 contract; text-feature mode only):
    collapse byte-identical texts to their min-id representative via
    ``exact_prepass`` before voting — downstream banded pairing then
    sees each distinct content once, so exact-copy clusters cannot
    saturate (band, value) buckets, and the vote explode itself runs
    once per distinct content instead of once per copy.
    """
    if pre_dedup_exact:
        if set_col is not None:
            # the prepass fingerprints text_col; deduping by text while
            # features come from set_col would collapse rows whose texts
            # match but feature sets differ (and asserts vanish under -O)
            raise ValueError("pre_dedup_exact fingerprints text_col; not valid with set_col")
        df, _ = exact_prepass(df, text_col, id_col)
    feats = F.col(set_col) if set_col else distinct_tokens(text_col)
    toks = (
        df.select(F.col(id_col), F.explode(feats).alias("tok"))
        .withColumn("h", hex_hash64(F.col("tok")))
    )
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(bits)
    ]
    voted = toks.groupBy(id_col).agg(*votes)
    packed = None
    for j in range(bits):
        term = F.when(F.col(f"v{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        packed = term if packed is None else packed + term
    return voted.select(F.col(id_col), packed.cast("long").alias("simhash"))


def simhash_near_pairs(sim: DataFrame, id_col: str = "doc_id", max_hamming: int = 3) -> DataFrame:
    """Pairs within a Hamming radius. Bucketed by the top byte to avoid a
    full cross join (docs differing in the top byte by > radius can still
    collide — this is the standard multi-probe tradeoff; exact variant
    would use bit-permutation tables)."""
    a = sim.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"))
    b = sim.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"))
    joined = a.join(b, F.col("id_a") < F.col("id_b"))
    dist = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return joined.select("id_a", "id_b", dist.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


def simhash_banded_pairs(
    sim: DataFrame,
    id_col: str = "doc_id",
    bits: int = 16,
    max_hamming: int = 3,
    max_bucket: int | None = None,
    pair_budget: int | None = None,
) -> DataFrame:
    """ALL pairs within a Hamming radius — exact, by pigeonhole banding.

    Split the b-bit signature into ``max_hamming + 1`` equal bands: two
    signatures differing in at most ``max_hamming`` bits must agree
    EXACTLY on at least one whole band (pigeonhole), so candidates =
    pairs colliding on any (band index, band value) key, and the
    verification xor/popcount prunes false positives.  Zero false
    negatives — the exact variant ``simhash_near_pairs``'s top-byte
    blocking trades away; same LSH shape as MinHash banding (the
    shuffle key is the tiny band value, never the document).  The
    corpus-sized self-join is on band keys whose expected bucket size
    is n / 2^(bits/(r+1)) per band — tune bits upward at larger n.

    ``max_bucket`` (parity with ``lsh_candidate_pairs``): drop
    (band, value) buckets larger than the cap BEFORE pair expansion.
    On a duplicate-saturated corpus the TRUE answer is quadratic — a
    g-doc boilerplate cluster has identical signatures, so all C(g,2)
    pairs are within any radius and the exact statement itself
    explodes (the r7 §8.9 wave measured 133M output rows from a ~50k
    corpus with 40% template copies).  The cap trades those
    boilerplate-cluster pairs (which exact-hash dedup should own —
    they are byte-identical or near-identical content) for bounded
    compute; pairs whose every shared band is oversized are lost,
    exactly like the MinHash cap.
    """
    n_bands = max_hamming + 1
    assert bits % n_bands == 0, "bits must divide into max_hamming+1 bands"
    w = bits // n_bands
    mask = (1 << w) - 1
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("simhash"), b * w)
                .bitwiseAND(F.lit(mask))
                .alias("val"),
            )
            for b in range(n_bands)
        ]
    )
    exploded = sim.select(
        F.col(id_col), F.col("simhash"), F.explode(bands).alias("bv")
    ).select(id_col, "simhash", "bv.band", "bv.val")
    if max_bucket is not None and pair_budget is not None:
        raise ValueError("pass max_bucket or pair_budget, not both")
    if pair_budget is not None:
        # §8.10b: threshold derived from total candidate volume over
        # the composite (band, val) key — non-vacuous under growth
        from .similarity import apply_pair_budget

        exploded = apply_pair_budget(exploded, ["band", "val"], pair_budget)
    if max_bucket is not None:
        sizes = Window.partitionBy("band", "val")
        exploded = (
            exploded.withColumn("_bn", F.count("*").over(sizes))
            .filter(F.col("_bn") <= max_bucket)
            .drop("_bn")
        )
    # rename AFTER the self-join: identical aliased subtrees keep the
    # (band, val) exchange canonically equal on both sides, so the
    # corpus-wide simhash vote aggregate is shuffled once and reused
    # instead of executing once per side
    xa, xb = exploded.alias("_sa"), exploded.alias("_sb")
    cand = (
        xa.join(xb, ["band", "val"])
        .filter(F.col(f"_sa.{id_col}") < F.col(f"_sb.{id_col}"))
        .select(
            F.col(f"_sa.{id_col}").alias("id_a"),
            F.col(f"_sb.{id_col}").alias("id_b"),
            F.col("_sa.simhash").alias("sh_a"),
            F.col("_sb.simhash").alias("sh_b"),
        )
        .distinct()
    )
    dist = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select(
        "id_a", "id_b", dist.cast("int").alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


# ---------------------------------------------------------------------------
# near-dup: n-gram / token Jaccard
# ---------------------------------------------------------------------------

def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str | None = None,
    min_jaccard: float = 0.0,
) -> DataFrame:
    """Exact token-set Jaccard for pairs within a blocking key.

    Blocking bounds the quadratic blowup: at 100 TB the block would be an
    LSH bucket (see lsh_candidate_pairs); here any low-cardinality column
    works.  Output: (id_a, id_b, jaccard) with id_a < id_b.
    """
    base = df.select(
        F.col(id_col), distinct_tokens(text_col).alias("toks"),
        *([F.col(block_col)] if block_col else []),
    )
    # rename AFTER the self-join (identical aliased subtrees -> the
    # block exchange is computed once and reused; renames below the
    # join break plan canonicalization and re-tokenize per side)
    ja, jb = base.alias("_ja"), base.alias("_jb")
    joined = ja.join(jb, [block_col]) if block_col else ja.crossJoin(jb)
    joined = joined.filter(F.col(f"_ja.{id_col}") < F.col(f"_jb.{id_col}"))
    inter = F.size(
        F.array_intersect(F.col("_ja.toks"), F.col("_jb.toks"))
    ).cast("double")
    union = (
        F.size(F.col("_ja.toks")) + F.size(F.col("_jb.toks"))
    ).cast("double") - inter
    jac = floor6(inter / union)
    return joined.select(
        F.col(f"_ja.{id_col}").alias("id_a"),
        F.col(f"_jb.{id_col}").alias("id_b"),
        jac.alias("jaccard"),
    ).filter(F.col("jaccard") >= min_jaccard)


def prefix_filter_jaccard_pairs(
    df: DataFrame,
    set_col: str,
    id_col: str = "doc_id",
    threshold_pct: int = 50,
) -> DataFrame:
    """All pairs with token-set Jaccard >= threshold, via prefix filtering
    (the PPJoin family, Xiao et al.) — no blocking key required.\n\n    ``set_col`` must hold each element exactly once (build it with\n    array_distinct over tokens/shingles).

    Candidate generation: order every document's distinct tokens by
    GLOBAL ascending frequency (rarest first, total order on (freq,
    token)); a pair with Jaccard >= t must share at least one token in
    each side's first ``|s| - ceil(t*|s|) + 1`` tokens (the prefix
    lemma), so joining on prefix tokens only is complete.  Rare-first
    ordering makes prefixes low-frequency join keys — the candidate
    count stays near the true-pair count instead of exploding on
    stopwords, and the hottest key is bounded by the rarest-token
    frequencies, not the corpus size.

    Verification is exact integer arithmetic: inter*100 >= t_pct*union.
    Complements the probabilistic MinHash-LSH path (lsh_near_dup_pairs):
    same output contract, zero false negatives, at the cost of a
    frequency ranking over the token stream.

    Plan: token explode -> frequency agg (map-combinable) -> per-doc
    row_number window (one shuffle on id) -> prefix self-join on token
    -> distinct candidate pairs -> one verification join against the
    per-doc token arrays.  Returns (id_a, id_b, inter, union,
    jaccard_pct) with id_a < id_b.
    """
    # The set build feeds three consumers (prefix index twice via the
    # self-join, verification once).  Deliberately NOT materialized: the
    # prefix self-join's two branches share one shuffle via AQE's
    # ReusedExchange, and the remaining recompute is a column-pruned
    # scan + tokenize — cheaper than writing a corpus-sized shadow copy
    # to executor-local storage (a localCheckpoint here measured ~2x
    # the wall of the recompute at sf0.1: barriers serialize the DAG
    # and kill whole-stage pipelining).  The freq groupBy+join below is
    # also measured-optimal: a windowed count-over-tok (q194's rewrite)
    # re-measured ~25% SLOWER on q141/q261 at sf0.1 — WindowExec sorts
    # the whole token stream, while hash-agg + hash join (exchanges
    # reused at runtime) never sort, and unlike q194 the window here
    # only annotates, it doesn't shrink the stream.
    sets = df.select(
        F.col(id_col).alias("id"), F.col(set_col).alias("toks")
    )
    # |s| comes from the array BEFORE the explode — a free projection,
    # not a second window aggregate over the exploded stream
    toks = sets.select(
        "id", F.size("toks").alias("sz"), F.explode("toks").alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count("*").alias("n"))
    w = Window.partitionBy("id").orderBy("n", "tok")
    ranked = toks.join(freq, "tok").select(
        "id", "tok", "sz", F.row_number().over(w).alias("rn")
    )
    # prefix length |s| - ceil(t*|s|) + 1, all-integer ceil
    pref_len = (
        F.col("sz") - F.expr(f"(sz * {threshold_pct} + 99) div 100") + 1
    )
    prefixes = ranked.filter(F.col("rn") <= pref_len).select(
        "id", "tok", "sz", "rn"
    )
    # length filter (PPJoin): J >= t forces min(|A|,|B|)/max(|A|,|B|) >= t,
    # so size-mismatched collisions die before the distinct/verify stages.
    #
    # positional filter (PPJoin+): a shared token at positions (rn_a,
    # rn_b) bounds the intersection by 1 + min(sz_a - rn_a, sz_b - rn_b)
    # (everything after it, plus itself) — valid at a pair's FIRST
    # common token, which the prefix lemma guarantees lies inside both
    # prefixes, so a true pair always survives via that row; rows where
    # the bound falls below the required overlap
    # alpha = ceil(t*(|A|+|B|)/(1+t)) are dropped before the distinct.
    # All-integer: (1+min(...))*(100+t_pct) >= t_pct*(sz_a+sz_b).
    pos_bound = 1 + F.least(
        F.col("pa.sz") - F.col("pa.rn"), F.col("pb.sz") - F.col("pb.rn")
    )
    cand = (
        prefixes.alias("pa")
        .join(prefixes.alias("pb"), "tok")
        .filter(
            (F.col("pa.id") < F.col("pb.id"))
            & (F.col("pa.sz") * 100 >= threshold_pct * F.col("pb.sz"))
            & (F.col("pb.sz") * 100 >= threshold_pct * F.col("pa.sz"))
            & (
                pos_bound * (100 + threshold_pct)
                >= threshold_pct * (F.col("pa.sz") + F.col("pb.sz"))
            )
        )
        .select(F.col("pa.id").alias("id_a"), F.col("pb.id").alias("id_b"))
        .distinct()
    )
    # r13 (VERDICT r12 task #3): the exact-verify projection below is
    # the CPU-dense stage (array_intersect over full shingle arrays,
    # profiled ~7 s CPU on q141 at sf0.1) but its shuffle BYTES are
    # tiny, so AQE coalesces it to single-digit tasks in the local
    # regime.  When the INPUT scan is coarse (the same guard as
    # widen_coarse_scan, probed on the cheap scan-rooted input frame),
    # spread the pairs to the session reduce width with an explicit
    # REPARTITION_BY_NUM (AQE respects user-specified counts).  The
    # repartition lands on the ID-ONLY pair frame BEFORE the token
    # arrays attach — the attach joins broadcast the (tiny in this
    # regime) sets side, preserving the pairs' partitioning into the
    # verify projection, so only two longs per pair ever cross the
    # exchange.  The first r13 shape repartitioned AFTER the attach
    # and shipped both full shingle arrays per pair through the new
    # exchange: interleaved A/B measured it neutral-to-worse (q141
    # 0.98 / q261 1.02 / q250 1.13, label r13resume-core) — the array
    # serialization ate the spread.  Scale-safety: at production scale
    # the scan has more splits than reducers, coarse_scan_width
    # returns 0, and neither the exchange nor the broadcast hint is
    # added — the plain shuffle joins below are the scale shape.
    from .skew import coarse_scan_width

    verify_width = coarse_scan_width(df)
    if verify_width > 0:
        # hash repartition on the (high-cardinality) pair key: a
        # keyless repartition(n) would pay a local sort of its input
        # (spark.sql.execution.sortBeforeRepartition) for nothing
        cand = cand.repartition(verify_width, F.col("id_a"), F.col("id_b"))
        attach_a = F.broadcast(
            sets.select(F.col("id").alias("id_a"), F.col("toks").alias("toks_a"))
        )
        attach_b = F.broadcast(
            sets.select(F.col("id").alias("id_b"), F.col("toks").alias("toks_b"))
        )
    else:
        attach_a = sets.select(
            F.col("id").alias("id_a"), F.col("toks").alias("toks_a")
        )
        attach_b = sets.select(
            F.col("id").alias("id_b"), F.col("toks").alias("toks_b")
        )
    paired = cand.join(attach_a, "id_a").join(attach_b, "id_b")
    verified = paired.select(
        "id_a", "id_b",
        F.size(F.array_intersect("toks_a", "toks_b")).cast("long").alias("inter"),
        (F.size("toks_a") + F.size("toks_b")
         - F.size(F.array_intersect("toks_a", "toks_b"))).cast("long").alias("un"),
    )
    return verified.filter(F.col("inter") * 100 >= threshold_pct * F.col("un"))


# ---------------------------------------------------------------------------
# near-dup: embedding cosine
# ---------------------------------------------------------------------------

def embedding_near_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_col: str | None = None,
    min_cosine: float = 0.99,
    max_block: int | None = None,
    pair_budget: int | None = None,
) -> DataFrame:
    """Embedding near-duplicates: cosine >= threshold within a block.

    Blocked (e.g. by an IVF/LSH bucket) to avoid all-pairs; with no
    block this is the exact quadratic baseline for small N.

    ``max_block`` (§8.10, parity with the LSH bucket caps): blocks
    holding more than ``max_block`` rows are dropped BEFORE the pair
    join — this operator is the exact quadratic verifier, so one hot
    block (a skewed IVF cell, a boilerplate-saturated LSH bucket) is a
    C(g,2) output blowup no plan fixes.  The §8.10 contract: exact-
    vector dedup (similarity.exact_vector_prepass) owns byte-identical
    vectors first; the cap bounds what is genuinely distinct-but-dense.

    ``pair_budget`` (§8.10a) derives the block-size threshold from the
    total verify-pair volume instead — an absolute ``max_block`` goes
    vacuous when every block outgrows it under corpus growth (measured
    at 2x in §8.10a); the budget form keeps the largest set of
    smallest blocks whose summed C(g,2) fits.  Requires ``block_col``;
    mutually exclusive with ``max_block``.
    """
    from ..functions.vector import dot, norm
    from .similarity import apply_pair_budget

    if max_block is not None and pair_budget is not None:
        raise ValueError("pass max_block or pair_budget, not both")
    if block_col is None and (max_block is not None or pair_budget is not None):
        # both caps bound per-BLOCK quadratic work; with no blocking the
        # join is the unbounded all-pairs baseline and the cap would
        # silently no-op — refuse instead
        raise ValueError("max_block/pair_budget require block_col")

    cols = [F.col(id_col), F.col(vec_col)] + ([F.col(block_col)] if block_col else [])
    # precompute each row's norm BEFORE the pair join: O(n) higher-order
    # folds instead of O(pairs); dot/(na*nb) is bit-identical to the
    # recomputed-cosine expression (same float ops, same order)
    base = df.select(*cols).withColumn("_norm", norm(vec_col))
    if block_col and max_block is not None:
        # applied BEFORE the two-sided alias so the capped subtree stays
        # canonically equal on both join sides (one exchange, reused)
        sizes = Window.partitionBy(block_col)
        base = (
            base.withColumn("_bn", F.count("*").over(sizes))
            .filter(F.col("_bn") <= max_block)
            .drop("_bn")
        )
    if block_col and pair_budget is not None:
        base = apply_pair_budget(base, block_col, pair_budget)
    # rename AFTER the self-join so the norm-precompute subtree stays
    # canonically equal on both sides (one exchange, reused)
    ea, eb = base.alias("_ea"), base.alias("_eb")
    joined = ea.join(eb, [block_col]) if block_col else ea.crossJoin(eb)
    joined = joined.filter(F.col(f"_ea.{id_col}") < F.col(f"_eb.{id_col}"))
    sim = floor6(
        dot(F.col(f"_ea.{vec_col}"), F.col(f"_eb.{vec_col}"))
        / (F.col("_ea._norm") * F.col("_eb._norm"))
    )
    return joined.select(
        F.col(f"_ea.{id_col}").alias("id_a"),
        F.col(f"_eb.{id_col}").alias("id_b"),
        sim.alias("cos_sim"),
    ).filter(F.col("cos_sim") >= min_cosine)


def embedding_incremental_matches(
    corpus: DataFrame,
    batch: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    dim: int = 64,
    min_cosine: float = 0.99,
    max_bucket: int | None = None,
    pair_budget: int | None = None,
) -> DataFrame:
    """Ingest-time near-dup admission for VECTORS — the embedding
    sibling of :func:`lsh_incremental_matches` (q178 class), i.e.
    SemDeDup-at-ingest: an incoming embedding batch is gated against
    the stored corpus before landing.

    Candidates come from random-hyperplane LSH signatures
    (``similarity.embedding_lsh_signature`` — integer-exact, oracle-
    portable) on BOTH sides, joined batch-signature to CORPUS-signature
    only — no batch x batch and no corpus x corpus pair ever forms.
    ``max_bucket`` caps the corpus side per signature bucket;
    ``pair_budget`` (mutually exclusive) sizes the bucket keep-set from
    the total corpus-rows x batch-rows verify volume via
    ``similarity.apply_join_pair_budget`` — the §8.11b-measured reason
    an ingest gate must prefer the budget form (an absolute cap's
    dropped saturated buckets ADMIT their near-dups).  Verification is
    the exact float cosine (sequential-fold double accumulation,
    ``floor6``-quantized — bit-identical to the DuckDB oracle), on
    candidates only.

    Returns one row per batch vector: (id, n_matches, admitted).
    """
    buckets, vectors = build_embedding_lsh_store(
        corpus, vec_col=vec_col, id_col=id_col, n_planes=n_planes, dim=dim
    )
    return embedding_incremental_matches_stored(
        buckets, vectors, batch,
        vec_col=vec_col, id_col=id_col, n_planes=n_planes, dim=dim,
        min_cosine=min_cosine, max_bucket=max_bucket,
        pair_budget=pair_budget,
    )


#: Above this many collected keys, ``probe_pushdown`` stops building a
#: literal ``IN`` filter and switches to a broadcast hash semi-join
#: against the (already localCheckpointed) probe frame.  The collected
#: list is bounded by construction either way; what the limit bounds is
#: the DRIVER-SIDE EXPRESSION TREE — at production batch sizes a
#: 100k-literal ``Column.isin`` is slow to plan and memory-heavy on the
#: driver (ADVICE r9).  Below the limit the ``In`` filter pushes into
#: the parquet scan and prunes row groups on a sorted store; above it
#: that storage-level pruning is traded for a broadcast semi-join,
#: which keeps the store scan a streaming probe with no giant
#: expression (same pruning intent, executor-side).
PUSHDOWN_IN_LIMIT = 10_000


def _pushdown_filter(
    store: DataFrame, key: str, probe: DataFrame
) -> DataFrame:
    """Filter ``store`` to rows whose ``key`` appears in ``probe[key]``
    — literal IN below :data:`PUSHDOWN_IN_LIMIT`, broadcast semi-join
    above it.

    The path is decided BEFORE materializing the key list (ADVICE r10
    #3): the probing ``limit(LIMIT+1).collect()`` is bounded by the
    limit regardless of probe size — when it comes back with <= LIMIT
    rows it IS the complete distinct key set (the limit was not
    reached) and becomes the literal IN; when it hits LIMIT+1 the full
    list is never pulled to the driver and the semi-join branch runs.
    Callers pass an already-localCheckpointed probe, so the probing
    scan re-reads checkpointed blocks, not the signature stage.
    """
    distinct_keys = probe.select(key).distinct()
    head = distinct_keys.limit(PUSHDOWN_IN_LIMIT + 1).collect()
    if len(head) <= PUSHDOWN_IN_LIMIT:
        return store.filter(F.col(key).isin([r[key] for r in head]))
    return store.join(F.broadcast(distinct_keys), key, "semi")


#: Sentinel default for the ``max_bucket`` parameter of the ``*_stored``
#: probes: use the admission cap STAMPED IN THE STORE's footer metadata
#: (``hdt_admission_cap``, written by the builders when ``cap_budget``
#: is passed), falling back to None (no cap) on unstamped stores.
#: VERDICT r10 wrong #3: the streaming admission gates hard-coded
#: ``max_bucket=50`` — §8.11b is this repo's own measurement that
#: absolute caps fail OPEN (falsely admit) as buckets outgrow the
#: constant, and streaming is the highest-frequency admission path.
STORED = "stored"

#: Default per-PROBE-ROW candidate budget for the derived admission cap.
#: A probe row lands in ``n_bands`` buckets and each kept bucket
#: contributes up to ``cap`` corpus candidates, so
#: ``cap = cap_budget // n_bands`` bounds one probe row's verify work by
#: ``cap_budget`` pairs.  The derived cap is
#: ``min(cap_budget // n_bands, max corpus bucket size)``: on any corpus
#: whose largest bucket fits the budget NO bucket is dropped (the gate
#: cannot fail open — the §8.11b constant-cap failure), and on a
#: pathologically saturated corpus the budget states the ceiling instead
#: of hiding it.  Batch-independent by construction (corpus-side only),
#: which is the streaming requirement: the union of per-microbatch
#: verdicts must equal the one-shot batch result at any arrival
#: granularity.
ADMISSION_CAP_BUDGET = 200_000

#: Staleness bound on the stamped admission cap (VERDICT r11 wrong #2).
#: ``hdt_admission_cap`` is exactly right at ``build_*_store`` time,
#: but nothing in the protocol rebuilds it as the corpus grows through
#: subsequent deliveries — and §8.11b/§8.11c is this repo's own proof
#: that a frozen absolute number eventually fails OPEN.  The builders
#: therefore stamp the store's row count beside the cap
#: (``hdt_cap_rows``), and the stored-cap probes fail CLOSED when the
#: live store has grown past this factor since derivation (time to
#: rebuild and restamp).  2x: bucket maxima grow sublinearly on
#: healthy corpora, so a doubled store keeps the stamped cap
#: conservative (it can only under-admit, never falsely admit); past
#: that the derivation's premise is gone.  The live-size check is one
#: ``count()`` per store FRAME OBJECT (memoized on the frame): on a
#: parquet-backed store that is footer-metadata work; a hand-built
#: frame pays one materialization of its lineage.
CAP_STALENESS_FACTOR = 2.0


def derive_admission_cap_stats(
    buckets: DataFrame, n_bands: int, cap_budget: int
) -> tuple[int, int]:
    """The corpus-side derived admission cap plus the store row count
    it was derived from, in ONE aggregation (see
    :data:`ADMISSION_CAP_BUDGET` and :data:`CAP_STALENESS_FACTOR`):
    ``(min(cap_budget // n_bands, max bucket size), total rows)`` over
    the store's bucket column (first column is the bucket key by
    builder convention).  Builders call it on a localCheckpointed
    frame so the signature stage is not re-executed."""
    key = buckets.columns[0]
    row = (
        buckets.groupBy(key)
        .count()
        .agg(
            F.max("count").alias("mx"),
            F.sum("count").alias("n_rows"),
        )
        .first()
    )
    max_size = int(row["mx"]) if row and row["mx"] is not None else 0
    n_rows = int(row["n_rows"]) if row and row["n_rows"] is not None else 0
    return min(cap_budget // max(1, n_bands), max_size), n_rows


def derive_admission_cap(
    buckets: DataFrame, n_bands: int, cap_budget: int
) -> int:
    """Cap-only form of :func:`derive_admission_cap_stats` (the q181/
    q338 oracles mirror THIS derivation; the row count is provenance
    for the staleness guard, not part of the cap)."""
    return derive_admission_cap_stats(buckets, n_bands, cap_budget)[0]


def _resolve_stored_cap(
    buckets: DataFrame, col_name: str, max_bucket, pair_budget
):
    """Turn the :data:`STORED` sentinel into the stamped admission cap
    (or None when the store is unstamped / a pair_budget was passed —
    the budget form supersedes the cap, and the sentinel is a default,
    not an explicit request, so it must not trip the mutual-exclusion
    guard)."""
    if max_bucket is not STORED:
        return max_bucket
    if pair_budget is not None or col_name not in buckets.columns:
        return None  # missing column: the probe's own check raises next
    meta = buckets.schema[col_name].metadata or {}
    cap = meta.get("hdt_admission_cap")
    if cap is None:
        return None
    # VERDICT r11 wrong #2: bound the stamp's staleness.  The cap was
    # derived from the corpus bucket distribution at build time; once
    # the live store outgrows the stamped row count by
    # CAP_STALENESS_FACTOR the derivation's premise is gone, and a
    # silently-kept cap is §8.11b's frozen constant reborn.  Fail
    # CLOSED with the rebuild instruction.  Pre-guard stores (no
    # hdt_cap_rows stamp) keep their old behavior.
    stamped_rows = meta.get("hdt_cap_rows")
    if stamped_rows is not None:
        # memoized per frame OBJECT: a streaming caller probes the same
        # store frame every microbatch, and on a parquet-backed store
        # the count is footer-metadata work but still a scheduled job —
        # one per frame is enough (the frame is immutable; a REOPENED
        # store is a new object and re-counts)
        live = getattr(buckets, "_hdt_cap_live_rows", None)
        if live is None:
            live = buckets.count()
            try:
                buckets._hdt_cap_live_rows = live
            except Exception:
                pass
        if live > CAP_STALENESS_FACTOR * int(stamped_rows):
            raise ValueError(
                f"stale admission cap: the store has grown to {live} "
                f"rows since the cap was derived at {int(stamped_rows)} "
                f"rows (> {CAP_STALENESS_FACTOR}x) — rebuild the store "
                "(build_*_store with cap_budget) to re-derive and "
                "restamp hdt_admission_cap; probing with the stale cap "
                "risks failing open on the grown bucket distribution"
            )
    return int(cap)


def _check_store_params(
    frame: DataFrame, col_name: str, expected: dict, builder: str
) -> None:
    """Fail CLOSED on a store/probe build-parameter mismatch.

    The ``build_*_store`` functions stamp their parameters as column
    metadata (persisted in parquet footers); a probe whose parameters
    differ would silently produce empty collisions — which on the
    ingest-admission path means admitting every near-dup (fail open).
    Hand-built frames without the metadata are accepted as-is (the
    documented keep-params-with-the-store convention applies).
    """
    meta = frame.schema[col_name].metadata or {}
    for key, want in expected.items():
        if key in meta and int(meta[key]) != int(want):
            raise ValueError(
                f"store param mismatch: the store was built with "
                f"{key.removeprefix('hdt_')}={int(meta[key])} "
                f"({builder}) but the probe passed {int(want)} — a "
                "mismatched probe yields empty collisions and fails "
                "the admission gate OPEN"
            )


def build_embedding_lsh_store(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    dim: int = 64,
    cap_budget: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """The persistable probe-side index for embedding admission — the
    vector analogue of :func:`build_lsh_store`, written once per corpus
    delivery (parquet, sorted on the leading column for probe-time
    row-group pruning):

      * ``buckets``: ``(lsh_sig long, id_c)`` — the corpus's
        random-hyperplane signatures (integer-exact, so the stored
        signatures never drift from a recompute);
      * ``vectors``: ``(id_c, vec_c, norm_c)`` — the raw vectors plus
        their precomputed norms, so candidate verification reads the
        store instead of re-folding norms over the full corpus every
        batch (norms are O(dim) folds — precomputing them at build
        time is the q43 O(n)-not-O(pairs) rule applied across
        deliveries).
    """
    from .similarity import embedding_lsh_signature
    from ..functions.vector import norm

    sigs = embedding_lsh_signature(corpus, n_planes, vec_col, dim)
    buckets = sigs.select(F.col("lsh_sig"), F.col(id_col).alias("id_c"))
    # build params persisted with the store (parquet footer metadata)
    # so the stored probe fails closed on mismatch — see
    # _check_store_params
    meta: dict = {"hdt_n_planes": n_planes, "hdt_dim": dim}
    if cap_budget is not None:
        # persist-path opt-in (VERDICT r10 wrong #3): derive the
        # corpus-side admission cap and stamp it so probes default to
        # it.  One signature per vector => n_bands = 1.  The checkpoint
        # bounds the extra cost: the derivation and the caller's
        # immediate parquet write both consume it.  eager=False (r13):
        # the derivation's first() materializes it — no separate
        # count() round-trip.
        buckets = buckets.localCheckpoint(eager=False)
        cap, cap_rows = derive_admission_cap_stats(
            buckets.select("lsh_sig", "id_c"), 1, cap_budget
        )
        meta["hdt_admission_cap"] = cap
        meta["hdt_cap_budget"] = cap_budget
        # derivation-time store size: the probes' staleness guard
        # (CAP_STALENESS_FACTOR) compares the live store against it
        meta["hdt_cap_rows"] = cap_rows
    buckets = buckets.withMetadata("lsh_sig", meta)
    vectors = corpus.select(
        F.col(id_col).alias("id_c"), F.col(vec_col).alias("vec_c")
    ).withColumn("norm_c", norm("vec_c"))
    return buckets, vectors


def embedding_incremental_matches_stored(
    buckets: DataFrame,
    vectors: DataFrame,
    batch: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    dim: int = 64,
    min_cosine: float = 0.99,
    max_bucket: int | None | str = STORED,
    pair_budget: int | None = None,
    probe_pushdown: bool = False,
) -> DataFrame:
    """``embedding_incremental_matches`` probing a PRE-BUILT store —
    the vector analogue of :func:`lsh_incremental_matches_stored`.

    ``max_bucket`` defaults to :data:`STORED` — the admission cap
    stamped by ``build_embedding_lsh_store(cap_budget=...)``; see
    :func:`lsh_incremental_matches_stored`.

    ``buckets``/``vectors`` are ``build_embedding_lsh_store``'s frames
    (typically read back from parquet); only the BATCH is signed per
    call.  ``n_planes``/``dim`` must match the store's build
    parameters; stores built by ``build_embedding_lsh_store`` carry
    them as column metadata (persisted in parquet footers) and a
    mismatched probe raises — without the check a mismatch silently
    yields empty collisions, failing the admission gate OPEN
    (``_check_store_params``).  ``probe_pushdown=True`` collects the
    batch's distinct signatures (bounded by |batch|) as an IN filter
    on ``buckets`` and the surviving candidates' corpus ids as an IN
    filter on ``vectors`` — bounded by probe signatures x
    ``max_bucket`` or by ``pair_budget`` (kept volume >= corpus rows
    per shared bucket), so pushdown REQUIRES one of them; on sig-/id-
    sorted stores both pushed filters prune parquet row groups
    (§8.12's index-READ shape).  Semantics identical to the recompute
    path for every knob: per-bucket counts and the budget derivation
    see only buckets shared with the probe side, so pre-filtering to
    probe signatures changes nothing — pinned by
    test_embedding_store_path_equals_recompute.
    """
    from ..functions.vector import dot, norm

    max_bucket = _resolve_stored_cap(
        buckets, "lsh_sig", max_bucket, pair_budget
    )
    if max_bucket is not None and pair_budget is not None:
        raise ValueError("pass max_bucket or pair_budget, not both")
    for frame, need, name in (
        (buckets, {"lsh_sig", "id_c"}, "buckets"),
        (vectors, {"id_c", "vec_c", "norm_c"}, "vectors"),
    ):
        missing = need - set(frame.columns)
        if missing:
            raise ValueError(
                f"store frame '{name}' lacks column(s) {sorted(missing)}; "
                "build it with build_embedding_lsh_store"
            )
    if probe_pushdown and max_bucket is None and pair_budget is None:
        raise ValueError(
            "probe_pushdown requires max_bucket or pair_budget — they "
            "bound the collected candidate-id list"
        )
    _check_store_params(
        buckets,
        "lsh_sig",
        {"hdt_n_planes": n_planes, "hdt_dim": dim},
        "build_embedding_lsh_store",
    )
    from .similarity import embedding_lsh_signature

    bs = embedding_lsh_signature(batch, n_planes, vec_col, dim).select(
        F.col("lsh_sig"), F.col(id_col).alias("id_b")
    )
    if probe_pushdown:
        # one bounded materialization feeds both the driver IN-list and
        # the bucket join (the q315 double-execution lesson, §8.8).
        # eager=False (r13, VERDICT r12 task #1): the checkpoint is
        # materialized BY _pushdown_filter's bounded collect (its map
        # side computes every partition), so the separate count() job
        # an eager checkpoint runs first is a redundant blocking
        # round-trip — same protocol, one fewer driver-blocking action.
        bs = bs.localCheckpoint(eager=False)
        buckets = _pushdown_filter(buckets, "lsh_sig", bs)
    cb = buckets
    if max_bucket is not None:
        sizes = Window.partitionBy("lsh_sig")
        cb = (
            cb.withColumn("_bn", F.count("*").over(sizes))
            .filter(F.col("_bn") <= max_bucket)
            .drop("_bn")
        )
    if pair_budget is not None:
        from .similarity import apply_join_pair_budget

        cb = apply_join_pair_budget(cb, bs, "lsh_sig", pair_budget)
    cands = bs.join(cb, "lsh_sig").select("id_b", "id_c").distinct()
    if probe_pushdown:
        # eager=False: materialized by the collect inside
        # _pushdown_filter (see the bs checkpoint above)
        cands = cands.localCheckpoint(eager=False)
        vectors = _pushdown_filter(vectors, "id_c", cands)

    vb = batch.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb")
    ).withColumn("_nb", norm("_vb"))
    sim = floor6(
        dot(F.col("_vb"), F.col("vec_c")) / (F.col("_nb") * F.col("norm_c"))
    )
    verified = (
        cands.join(vb, "id_b")
        .join(vectors, "id_c")
        .select("id_b", "id_c", sim.alias("cos_sim"))
        .filter(F.col("cos_sim") >= min_cosine)
    )
    matches = verified.groupBy("id_b").agg(
        F.countDistinct("id_c").alias("n_matches")
    )
    return (
        batch.select(F.col(id_col).alias("id_b"))
        .join(matches, "id_b", "left")
        .select(
            F.col("id_b").alias(id_col),
            F.coalesce(F.col("n_matches"), F.lit(0))
            .cast("long")
            .alias("n_matches"),
            F.col("n_matches").isNull().alias("admitted"),
        )
    )


def lsh_incremental_matches(
    corpus: DataFrame,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    band_size: int = 4,
    num_hashes: int = 8,
    min_jaccard: float = 0.4,
    max_bucket: int | None = None,
    widen: bool | None = None,
    pair_budget: int | None = None,
) -> DataFrame:
    """Near-dup matches of an INCREMENT against an existing corpus.

    The production ingest-time shape: a new batch is admitted only where
    it does not near-duplicate the corpus already stored.  Candidates
    come from banding BOTH sides and joining batch buckets to CORPUS
    buckets only — no batch x batch and no corpus x corpus pair ever
    forms, so the per-ingest cost is O(batch x collision rate), not
    O(corpus^2): at 100 TB the corpus signatures are computed once at
    their own ingest time and stored; each new batch probes them like an
    index.  ``max_bucket`` caps the CORPUS side per bucket (oversized
    buckets are boilerplate shingle sets, same guard as
    lsh_candidate_pairs).

    ``pair_budget`` (§8.11, mutually exclusive with ``max_bucket``)
    is the budget-derived form for THIS two-sided shape: the verify
    volume of a bucket is corpus-rows x batch-rows (a product, not
    C(g,2)), so the threshold comes from
    ``similarity.apply_join_pair_budget`` — cheapest shared buckets
    kept until the summed product volume spends the budget, the
    corpus side filtered to them.  The same §8.10a reasoning applies
    at ingest time: an absolute corpus-side cap goes vacuous as the
    stored corpus grows, while the budget states the quadratic work
    one ingest batch is allowed to cost.

    Returns one row per batch doc: (id, n_matches, admitted) where
    ``n_matches`` counts distinct corpus docs with verified exact
    Jaccard >= threshold and ``admitted`` marks batch docs with none.
    A dropped bucket yields NO candidates from that bucket, so docs
    whose only collisions are in dropped buckets come out ``admitted``
    — same failure direction as ``max_bucket``, sized by budget.
    """
    buckets, tokens = build_lsh_store(
        corpus, text_col, id_col, band_size, num_hashes, widen=widen
    )
    return lsh_incremental_matches_stored(
        buckets, tokens, batch,
        text_col=text_col, id_col=id_col, band_size=band_size,
        num_hashes=num_hashes, min_jaccard=min_jaccard,
        max_bucket=max_bucket, widen=widen, pair_budget=pair_budget,
    )


def build_lsh_store(
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    band_size: int = 4,
    num_hashes: int = 8,
    widen: bool | None = None,
    cap_budget: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """The persistable probe-side LSH index of a stored corpus.

    ``lsh_incremental_matches`` always claimed "corpus signatures are
    computed once at their own ingest time and stored" — this is that
    store, as two frames the caller persists ONCE per corpus delivery
    (parquet, ideally sorted on the leading column so probe-time IN
    filters prune row groups — see q332):

      * ``buckets``: ``(bucket string, id_c)`` — one row per (band,
        doc) collision key, exactly ``_band_explode``'s output.
      * ``tokens``:  ``(id_c, toks_c array<string>)`` — the distinct
        token sets exact-Jaccard verification needs, materialized so a
        probe never re-tokenizes history.  This is the classic index
        space/time trade, stated: the store carries the token arrays
        (≈ corpus text size) so per-batch verification reads only the
        candidates' rows instead of recomputing ``distinct_tokens``
        over the full corpus on every ingest.

    ``widen=None`` auto-detects scan-rootedness per frame — the same
    task-granularity contract as ``lsh_incremental_matches`` (VERDICT
    r7 wrong #2: the blanket ``widen=False`` default serialized the
    signature stage on single-split scans, measured 1.7x at sf0.1).
    """
    from .skew import is_scan_rooted

    widen_c = is_scan_rooted(corpus) if widen is None else widen
    sig_c = minhash_signatures(
        corpus, text_col, id_col, num_hashes, widen=widen_c
    )
    buckets = _band_explode(
        sig_c, id_col, band_size, num_hashes, out_id="id_c"
    ).drop("band")
    # Build params travel WITH the store as column metadata — Spark
    # persists field metadata in the parquet footer schema, so a store
    # read back from disk still carries them and the *_stored probes
    # fail closed on a band_size/num_hashes mismatch instead of
    # silently yielding empty collisions (ADVICE r9: a param mismatch
    # makes the ingest admission gate fail OPEN).
    meta: dict = {"hdt_band_size": band_size, "hdt_num_hashes": num_hashes}
    if cap_budget is not None:
        # persist-path opt-in (VERDICT r10 wrong #3): derive the
        # corpus-side admission cap and stamp it so probes default to
        # it.  The checkpoint bounds the extra cost: the derivation and
        # the caller's immediate parquet write both consume it.
        # eager=False (r13): the derivation's first() materializes it —
        # no separate count() round-trip.
        buckets = buckets.localCheckpoint(eager=False)
        cap, cap_rows = derive_admission_cap_stats(
            buckets.select("bucket", "id_c"),
            num_hashes // band_size,
            cap_budget,
        )
        meta["hdt_admission_cap"] = cap
        meta["hdt_cap_budget"] = cap_budget
        # derivation-time store size: the probes' staleness guard
        # (CAP_STALENESS_FACTOR) compares the live store against it
        meta["hdt_cap_rows"] = cap_rows
    buckets = buckets.withMetadata("bucket", meta)
    tokens = corpus.select(
        F.col(id_col).alias("id_c"), distinct_tokens(text_col).alias("toks_c")
    )
    return buckets, tokens


def lsh_incremental_matches_stored(
    buckets: DataFrame,
    tokens: DataFrame,
    batch: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    band_size: int = 4,
    num_hashes: int = 8,
    min_jaccard: float = 0.4,
    max_bucket: int | None | str = STORED,
    widen: bool | None = None,
    pair_budget: int | None = None,
    probe_pushdown: bool = False,
) -> DataFrame:
    """``lsh_incremental_matches`` probing a PRE-BUILT store.

    ``max_bucket`` defaults to :data:`STORED`: the admission cap the
    store was built with (``build_lsh_store(cap_budget=...)`` stamps
    ``hdt_admission_cap`` in the footer metadata) — derived corpus-side
    so admission stays batch-independent, sized by a budget instead of
    a constant (VERDICT r10 wrong #3).  Unstamped stores resolve to
    None (no cap); an explicit int or None always wins.

    ``buckets``/``tokens`` are ``build_lsh_store``'s frames (typically
    read back from parquet).  Per-batch work is then genuinely
    O(batch x collision rate): only the batch is signed and banded;
    the corpus side is scanned, never recomputed.  Band/bucket
    parameters must match the ones the store was built with; stores
    built by ``build_lsh_store`` carry them as column metadata
    (persisted in parquet footers) and a mismatched probe raises —
    without the check a mismatch silently yields empty collisions,
    failing the admission gate OPEN (``_check_store_params``).

    ``probe_pushdown=True`` turns the store scan into an index READ:
    the batch's distinct band buckets (bounded by |batch| x n_bands)
    are collected and applied as an IN filter on ``buckets``, and the
    surviving candidates' corpus ids as an IN filter on ``tokens`` —
    on a store sorted by (bucket) / (id_c) both pushed filters prune
    parquet row groups, so probe IO is O(collisions), not O(store).
    Above :data:`PUSHDOWN_IN_LIMIT` collected keys the literal IN
    filter gives way to a broadcast semi-join (ADVICE r9: a 100k-term
    ``isin`` is a pathological driver-side expression tree) — the
    trade is stated on the constant.
    The candidate-id list is driver state, so pushdown REQUIRES a
    bound: ``max_bucket`` (ids <= probe_buckets x cap) or
    ``pair_budget`` (kept volume sums corpus-rows x batch-rows >=
    corpus-rows per shared bucket, so ids <= budget).  Both collected
    lists are therefore bounded by construction — the same O(driver)
    contract as the repo's other collect sites.

    Semantics are IDENTICAL to the recompute path for every knob:
    ``max_bucket`` counts rows within a bucket (unchanged by dropping
    non-probed buckets) and ``apply_join_pair_budget`` derives its
    threshold from buckets SHARED with the probe side only (non-shared
    buckets never enter the volume sum), so pre-filtering the store to
    probe buckets is a pure IO optimization — pinned by
    test_lsh_store_path_equals_recompute.
    """
    max_bucket = _resolve_stored_cap(buckets, "bucket", max_bucket, pair_budget)
    if max_bucket is not None and pair_budget is not None:
        raise ValueError("pass max_bucket or pair_budget, not both")
    for frame, need, name in (
        (buckets, {"bucket", "id_c"}, "buckets"),
        (tokens, {"id_c", "toks_c"}, "tokens"),
    ):
        missing = need - set(frame.columns)
        if missing:
            raise ValueError(
                f"store frame '{name}' lacks column(s) {sorted(missing)}; "
                "build it with build_lsh_store"
            )
    if probe_pushdown and max_bucket is None and pair_budget is None:
        raise ValueError(
            "probe_pushdown requires max_bucket or pair_budget — they "
            "bound the collected candidate-id list"
        )
    _check_store_params(
        buckets,
        "bucket",
        {"hdt_band_size": band_size, "hdt_num_hashes": num_hashes},
        "build_lsh_store",
    )
    from .skew import is_scan_rooted

    widen_b = is_scan_rooted(batch) if widen is None else widen
    sig_b = minhash_signatures(
        batch, text_col, id_col, num_hashes, widen=widen_b
    )
    bb = _band_explode(
        sig_b, id_col, band_size, num_hashes, out_id="id_b"
    ).drop("band")
    if probe_pushdown:
        # one bounded materialization (O(batch x bands)) feeds both the
        # driver IN-list and the bucket join — never two executions of
        # the signature stage (the q315 checkpoint lesson, §8.8).
        # eager=False (r13, VERDICT r12 task #1): _pushdown_filter's
        # bounded collect materializes the checkpoint (its map side
        # computes every partition), so eager's separate count() job
        # was a redundant blocking round-trip.
        bb = bb.localCheckpoint(eager=False)
        buckets = _pushdown_filter(buckets, "bucket", bb)
    cb = _cap_buckets(buckets, max_bucket)
    if pair_budget is not None:
        from .similarity import apply_join_pair_budget

        cb = apply_join_pair_budget(cb, bb, "bucket", pair_budget)
    cands = bb.join(cb, "bucket").select("id_b", "id_c").distinct()
    if probe_pushdown:
        # eager=False: materialized by the collect inside
        # _pushdown_filter (see the bb checkpoint above)
        cands = cands.localCheckpoint(eager=False)
        tokens = _pushdown_filter(tokens, "id_c", cands)

    toks_b = batch.select(
        F.col(id_col).alias("id_b"), distinct_tokens(text_col).alias("toks_b")
    )
    inter = F.size(F.array_intersect("toks_b", "toks_c")).cast("double")
    union = (F.size("toks_b") + F.size("toks_c")).cast("double") - inter
    verified = (
        cands.join(toks_b, "id_b")
        .join(tokens, "id_c")
        .select("id_b", "id_c", floor6(inter / union).alias("jaccard"))
        .filter(F.col("jaccard") >= min_jaccard)
    )
    matches = verified.groupBy("id_b").agg(
        F.countDistinct("id_c").alias("n_matches")
    )
    return (
        batch.select(F.col(id_col).alias("id_b"))
        .join(matches, "id_b", "left")
        .select(
            F.col("id_b").alias(id_col),
            F.coalesce(F.col("n_matches"), F.lit(0))
            .cast("long")
            .alias("n_matches"),
            F.col("n_matches").isNull().alias("admitted"),
        )
    )


def deletion_neighborhood_keys(
    df: DataFrame, str_col: str, id_col: str, out_key: str = "dnk"
) -> DataFrame:
    """Explode each string into its FastSS k=1 blocking keys.

    Key set of ``s`` = {s} U {s with the i-th char deleted}.  Two
    strings with Levenshtein distance <= 1 ALWAYS share at least one
    key (substitution: delete the differing position in both;
    insert/delete: the shorter string is itself a deletion variant of
    the longer; equality: the string itself) — so an equi-join on the
    key is a complete candidate generator for distance-1 matching with
    NO cross join anywhere.  Key fan-out is len(s)+1 rows per string:
    linear in data size, and the join key is short and high-cardinality
    (no hot buckets), so this scales as an ordinary shuffle join.
    """
    pos = F.sequence(F.lit(0), F.length(str_col))
    # _i == len(s) encodes "no deletion" (the string itself); otherwise
    # drop the 0-based _i-th character
    variant = F.when(
        F.col("_i") == F.length(str_col), F.col(str_col)
    ).otherwise(
        F.concat(
            F.expr(f"substr({str_col}, 1, _i)"),
            F.expr(f"substr({str_col}, _i + 2)"),
        )
    )
    return (
        df.select(F.col(id_col), F.col(str_col), F.explode(pos).alias("_i"))
        .select(
            F.col(id_col),
            F.col(str_col),
            variant.alias(out_key),
        )
        .drop("_i")
    )


def fuzzy_best_match(
    dirty: DataFrame,
    clean: DataFrame,
    str_col: str = "name",
    id_col: str = "id",
    max_dist: int = 1,
) -> DataFrame:
    """Best distance-<=1 match per dirty record via FastSS blocking.

    Candidates come from the deletion-neighborhood equi-join (complete
    for distance 1 — see deletion_neighborhood_keys), are verified with
    the exact Levenshtein distance, and the winner per dirty id is the
    argmin on (distance, clean id) via one commutative min_by over a
    STRUCT ordering key — structs compare lexicographically field by
    field, so the tiebreak is exact for ANY id magnitude (an
    integer-packed composite like dist*1e9+id silently misranks once
    ids reach 1e9: TPC-H custkeys cross that around sf7000).  No
    window, fully map-side combinable.  The quadratic all-pairs scan
    the naive form needs never happens: cost is O(avg_len x N) keys on
    each side plus the bucket-bounded verify joins.
    """
    if max_dist != 1:
        # deletion_neighborhood_keys generates k=1 deletion variants,
        # which is a COMPLETE candidate generator only for distance<=1;
        # a larger max_dist would silently drop true matches.
        raise ValueError(
            "fuzzy_best_match supports max_dist=1 only (FastSS k=1 "
            f"blocking is complete only for distance<=1); got {max_dist}"
        )
    dk = deletion_neighborhood_keys(
        dirty.select(
            F.col(id_col).alias("dirty_id"), F.col(str_col).alias("dirty_s")
        ),
        "dirty_s",
        "dirty_id",
    )
    ck = deletion_neighborhood_keys(
        clean.select(
            F.col(id_col).alias("clean_id"), F.col(str_col).alias("clean_s")
        ),
        "clean_s",
        "clean_id",
    )
    cand = (
        dk.join(ck, "dnk")
        .select("dirty_id", "dirty_s", "clean_id", "clean_s")
        .distinct()
        .withColumn("dist", F.levenshtein("dirty_s", "clean_s"))
        .filter(F.col("dist") <= max_dist)
    )
    # argmin by (dist, clean_id): struct ordering key compares
    # lexicographically — exact for any clean_id magnitude
    composite = F.struct(F.col("dist"), F.col("clean_id"))
    return cand.groupBy("dirty_id").agg(
        F.min_by(F.col("clean_id"), composite).alias("matched_id"),
        F.min("dist").alias("dist"),
        F.count("*").alias("n_candidates"),
    )
