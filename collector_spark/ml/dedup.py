"""Deduplication operators over the documents table (training-data pipeline
extensions; BASELINE.json north star).

  exact        — hash-groupBy on normalized text; canonical = min(doc_id)
  minhash LSH  — word-shingle -> k=16 minhash signature -> 4x4 banding ->
                 bucket self-join for candidate pairs
  simhash      — 16-bit sign-aggregated fingerprint
  ngram-jaccard— exact Jaccard on shingle sets for LSH candidates (verify
                 stage of the classic pipeline)

Scale design: every step is a shuffle-bounded DataFrame op — explode
shingles (map), groupBy doc (one shuffle), band explode (map), groupBy band
(one shuffle), pair join within buckets only (bucket sizes are the skew
knob; AQE splits hot buckets). No driver-side loops, no O(n^2) cross join.

Hashing is md5-prefix (portable across Spark/DuckDB; engine hashes differ).
All minhash arithmetic stays below 2^62 so BIGINT math is exact in both
engines: h' = h % P31, sig_i = min((a_i * h' + b_i) % P31).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

P31 = 2_147_483_647  # 2^31 - 1 (Mersenne prime)
# Single tuning knobs: both the Spark plan AND the generated DuckDB oracle
# derive from these constants, so changing them re-parameterizes both sides
# consistently. K=64 x 8 bands (8 rows/band) is a production-shaped
# configuration — the (1/b)^(1/r) similarity knee sits near 0.77, so band
# buckets stay selective at scale; widening further (K=128, 16 bands) is a
# two-number change with the same plan shape. BIGINT math stays exact:
# h' < 2^31 and A[i] < 2^31, so h'*A[i] + B[i] < 2^62 in both engines.
K = 64               # minhash permutations
BANDS = 8            # 8 bands x 8 rows
SHINGLE = 3          # word-trigram shingles

# Hard per-bucket bound for LSH candidate generation (batch AND streaming):
# a band bucket with more than this many member docs is dropped before pair
# expansion, bounding the worst-case expansion at CAP^2 pairs per bucket IN
# THE PLAN — the same stop-element practice as winnowing's WINNOW_BUCKET_CAP
# and the truth-side TRUTH_BUCKET_CAP below. Candidate generation is also
# canonical-first (signatures only for each exact-dup group's min-doc_id
# member), so the two degenerate blowup sources at 100 TB — exact-duplicate
# floods putting whole groups into every shared bucket, and boilerplate
# band collisions — are each bounded by construction, not by run-book
# tuning. A dropped bucket loses no recall that matters: >CAP canonicals
# agreeing on a band key is boilerplate-grade content whose pairs the
# verify stage would score near-zero anyway, and genuinely similar pairs
# co-occur in multiple independent bands. At evaluation SFs no bucket
# comes near the cap, so small-scale results equal the uncapped plan.
LSH_BUCKET_CAP = 64

# Deterministic permutation parameters: successive powers of the classic
# Lehmer/minstd multipliers mod P31 — scattered across the field, no
# arithmetic structure. The original (2i+1)*40503 progression was NOT
# min-wise usable: consecutive A[i] differ by a constant step, so a
# single shared shingle whose (step * h) mod P31 lands small wins the min
# in a long run of components — E81 (minhash_estimate_quality) measured
# 44/64 signature agreement on a pair with true Jaccard 0.007. With the
# Lehmer powers the estimator sits inside its binomial error bound
# (test-pinned in test_dedup_properties).
A = [pow(16807, i + 1, P31) for i in range(K)]
B = [pow(48271, i + 1, P31) for i in range(K)]


def _hash60(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _sql_hash60(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def _words(col: Column) -> Column:
    return F.split(F.lower(col), " ")


# Exact-dup content identity: md5 over whitespace-normalized lowered text.
# ONE definition feeds exact_dup_groups, the span stage, and the span
# candidate generator (plus all three oracles via _SQL_NORM_HASH /
# _SQL_CANON) so the keep filter cannot drift between consumers.

_SQL_NORM_HASH = "md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))"


def _norm_hash() -> Column:
    return F.md5(F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")))


def _exact_canonicals(docs: DataFrame) -> DataFrame:
    """`docs` filtered to each exact-duplicate group's canonical member
    (min doc_id per content hash) — the E1 keep set. All original columns
    survive.

    r12 shape: decide on a NARROW proxy, attach the payload once (the
    guide's §8.4 rule). The former form ran the min-doc_id window over the
    FULL document rows — text bytes crossed the content-hash exchange and
    were sorted inside the window just to compute a per-group min of
    doc_id. Now the window runs over (doc_id, content_hash) only (24 B/row
    vs whole documents) and the keep set comes back as a LEFT SEMI join on
    doc_id — at fixture scale AQE broadcasts the id set and the document
    payload is never shuffled at all; at 100 TB the payload crosses the
    network once either way (semi join on doc_id vs the old full-row hash
    exchange), but the window's shuffle+sort handles 24-byte rows instead
    of documents. Measured (noop, min-of-4, one session, sf0.1):
    ngram_span_dedup 3.40 -> 1.79 s; outputs collected identical."""
    w = Window.partitionBy("content_hash")
    keep = (
        docs.select("doc_id", _norm_hash().alias("content_hash"))
        .withColumn("_canon", F.col("doc_id") == F.min("doc_id").over(w))
        .filter("_canon")
        .select("doc_id")
    )
    return docs.join(keep, "doc_id", "semi")


_SQL_CANON = f"""
SELECT * EXCLUDE (__canon) FROM (
  SELECT d.*, d.doc_id = MIN(d.doc_id) OVER (
           PARTITION BY {_SQL_NORM_HASH}
         ) AS __canon
  FROM documents d
) k WHERE __canon
"""


def exact_dup_groups(spark: SparkSession) -> DataFrame:
    """Exact dedup decision list: md5 over whitespace-normalized lowered
    text, one row per document with its group's canonical doc (min doc_id),
    group size, and whether this doc survives dedup — the keep/drop list a
    training pipeline consumes directly (singletons included, so the result
    is total over the corpus).

    One shuffle on content_hash; the per-group aggregate rides the same
    exchange as the decision join via a window, so scale cost is a single
    hash partitioning of (doc_id, hash).
    """
    return _exact_groups_unsorted(spark.table("documents")).orderBy("doc_id")


def _exact_groups_unsorted(docs: DataFrame) -> DataFrame:
    """The E1 decision relation without the oracle-determinism sort —
    the form compositions consume (dedup_keep_list checkpoints it and
    derives the span stage's canonical set from its keep flag, so the
    content-hash window runs ONCE per composition)."""
    hashed = docs.select(F.col("doc_id"), _norm_hash().alias("content_hash"))
    w = Window.partitionBy("content_hash")
    return (
        hashed.withColumn("canonical_doc_id", F.min("doc_id").over(w))
        .withColumn("group_size", F.count("*").over(w).cast("long"))
        .select(
            "doc_id",
            "content_hash",
            "canonical_doc_id",
            "group_size",
            (F.col("doc_id") == F.col("canonical_doc_id")).alias("keep"),
        )
    )


def oracle_exact_dup_groups() -> str:
    return f"""
WITH hashed AS (
  SELECT doc_id, {_SQL_NORM_HASH} AS content_hash
  FROM documents
)
SELECT doc_id, content_hash,
       MIN(doc_id) OVER (PARTITION BY content_hash) AS canonical_doc_id,
       CAST(COUNT(*) OVER (PARTITION BY content_hash) AS BIGINT) AS group_size,
       doc_id = MIN(doc_id) OVER (PARTITION BY content_hash) AS keep
FROM hashed
ORDER BY doc_id
"""


def _shingle_hashes(docs: DataFrame, carry: tuple[str, ...] = ()) -> DataFrame:
    """doc_id -> exploded distinct shingle hash h' (already reduced mod
    P31). `carry` names extra row-local columns to keep alongside (e.g.
    ``source`` for the E120 duplication report / its streaming twin,
    where a join-back would be a stream-stream self-join)."""
    words = _words(F.col("text"))
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - SHINGLE, F.lit(0)))
    shingles = F.transform(
        idx, lambda i: F.array_join(F.slice(words, i + 1, SHINGLE), " ")
    )
    # per-doc dedup happens in array_distinct BEFORE hashing — exactly the
    # oracle's list_distinct semantics (hash collisions preserved); a
    # post-hash global distinct would re-shuffle the largest relation in
    # the pipeline for nothing
    return docs.select(
        "doc_id", *carry, F.explode(F.array_distinct(shingles)).alias("shingle")
    ).select("doc_id", *carry, (_hash60(F.col("shingle")) % P31).alias("h"))


_SQL_SHINGLES = f"""
SELECT doc_id, ({_sql_hash60('shingle')}) % {P31} AS h
FROM (
  SELECT DISTINCT doc_id, unnest(list_distinct(list_transform(
    generate_series(0, greatest(len(string_split(lower(text), ' ')) - {SHINGLE}, 0)),
    i -> array_to_string(list_slice(string_split(lower(text), ' '), i + 1, i + {SHINGLE}), ' ')
  ))) AS shingle
  FROM documents
) s
"""

# shingles restricted to exact-dedup canonicals — the relation every
# candidate-generation and truth-evaluation oracle runs on (per-doc shingle
# sets are unchanged by the filter; whole non-canonical docs drop out)
_SQL_SHINGLES_CANON = _SQL_SHINGLES.replace(
    "FROM documents", f"FROM ({_SQL_CANON}) canon_docs"
)


def _signatures_from(sh: DataFrame) -> DataFrame:
    aggs = [
        F.min((F.col("h") * A[i] + B[i]) % P31).alias(f"mh{i}") for i in range(K)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_signatures(spark: SparkSession) -> DataFrame:
    """K minhash values per doc (one explode + one groupBy)."""
    sh = _shingle_hashes(spark.table("documents"))
    return _signatures_from(sh).orderBy("doc_id")


def oracle_minhash_signatures() -> str:
    mins = ", ".join(
        f"MIN((h * CAST({A[i]} AS BIGINT) + {B[i]}) % {P31}) AS mh{i}" for i in range(K)
    )
    return f"""
WITH sh AS ({_SQL_SHINGLES})
SELECT doc_id, {mins} FROM sh GROUP BY doc_id ORDER BY doc_id
"""


def _band_cols(rows: int | None = None) -> list[tuple[str, list[str]]]:
    rows = K // BANDS if rows is None else rows
    bands = K // rows
    return [
        (f"band{b}", [f"mh{b * rows + r}" for r in range(rows)]) for b in range(bands)
    ]


def _band_buckets(sig: DataFrame, rows_per_band: int | None = None) -> DataFrame:
    # one band-key array exploded per row — the signature aggregate is
    # computed once, not once per band branch (a UNION of 8 projections
    # leans on exchange reuse; the explode makes single-pass structural)
    keys = [
        F.md5(
            F.concat_ws(",", F.lit(str(b)), *[F.col(c).cast("string") for c in cols])
        )
        for b, (name, cols) in enumerate(_band_cols(rows_per_band))
    ]
    return sig.select("doc_id", F.explode(F.array(*keys)).alias("bucket"))


def _pairs_from_buckets(buckets: DataFrame) -> DataFrame:
    # pair generation by per-bucket expansion instead of a bucket self-join:
    # a self-join recomputes the whole signature subtree per branch (no
    # exchange reuse across build/probe sides), while groupBy(bucket) +
    # inline pair transform computes it once and shuffles each (doc, band
    # key) exactly once. Bucket size stays the skew/blowup knob either way.
    return (
        buckets.groupBy("bucket")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter((F.size("ids") > 1) & (F.size("ids") <= LSH_BUCKET_CAP))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (a, i) -> "
                    "transform(slice(ids, i + 2, size(ids) - i - 1), "
                    "b -> struct(a AS doc_a, b AS doc_b))))"
                )
            ).alias("p")
        )
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )


def _candidate_pairs_from(sig: DataFrame, rows_per_band: int | None = None) -> DataFrame:
    return _pairs_from_buckets(_band_buckets(sig, rows_per_band))


def minhash_candidate_pairs(spark: SparkSession) -> DataFrame:
    """LSH banding: canonical docs sharing any band bucket become a
    candidate pair. Canonical-first (the same `_exact_canonicals`
    composition as the span stage): exact-duplicate groups would otherwise
    place ALL members into identical buckets and expand quadratically in
    the group size — the E1 stage already owns identical-content drops, so
    the LSH stage signatures only each group's canonical. Combined with
    the LSH_BUCKET_CAP bound in `_candidate_pairs_from`, pair expansion is
    linear in true near-dup structure at any corpus scale."""
    sig = _signatures_from(_shingle_hashes(_exact_canonicals(spark.table("documents"))))
    return _candidate_pairs_from(sig).orderBy("doc_a", "doc_b")


def oracle_minhash_candidate_pairs() -> str:
    mins = ", ".join(
        f"MIN((h * CAST({A[i]} AS BIGINT) + {B[i]}) % {P31}) AS mh{i}" for i in range(K)
    )
    band_selects = []
    for b, (name, cols) in enumerate(_band_cols()):
        concat = " || ',' || ".join([f"'{b}'"] + [f"CAST({c} AS VARCHAR)" for c in cols])
        band_selects.append(f"SELECT doc_id, md5({concat}) AS bucket FROM sig")
    buckets = " UNION ALL ".join(band_selects)
    return f"""
WITH sh AS ({_SQL_SHINGLES_CANON}),
sig AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
buckets AS ({buckets}),
ok AS (
  SELECT bucket FROM buckets
  GROUP BY bucket HAVING COUNT(*) > 1 AND COUNT(*) <= {LSH_BUCKET_CAP}
)
SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
FROM buckets l
JOIN ok o ON o.bucket = l.bucket
JOIN buckets r ON l.bucket = r.bucket AND l.doc_id < r.doc_id
ORDER BY doc_a, doc_b
"""


# at most ONE pinned shingle relation per session: re-invoking the verify
# stage (driver sweep, bench loops, notebooks) unpersists the previous copy
# before caching the new one, so repeated runs can't accumulate storage
_SHINGLE_CACHE: dict[int, DataFrame] = {}


def _persisted_shingles(
    spark: SparkSession, canon: DataFrame | None = None
) -> DataFrame:
    """Canonical-doc shingle relation, persisted once per session. Every
    consumer (verify-stage Jaccard, containment sizes, recall/tuning truth)
    operates on the exact-dedup keep set — per-doc shingle sets are
    identical to the unfiltered relation for surviving docs, and dropped
    exact-dup siblings are the E1 stage's responsibility, not LSH's.

    ``canon``: a composition that has already derived the E1 keep set
    (dedup_keep_list / export) passes it so the cached relation builds
    from the shared checkpointed decision instead of re-running the
    content-hash window + md5 pass inside a private `_exact_canonicals`
    subtree (r12 carry item; value-identical by the E1 keep contract)."""
    prev = _SHINGLE_CACHE.pop(id(spark), None)
    if prev is not None:
        prev.unpersist()
    if canon is None:
        canon = _exact_canonicals(spark.table("documents"))
    sh = _shingle_hashes(canon).persist()
    _SHINGLE_CACHE[id(spark)] = sh
    return sh


def ngram_jaccard_pairs(
    spark: SparkSession,
    threshold: float = 0.5,
    cand: DataFrame | None = None,
    canon: DataFrame | None = None,
) -> DataFrame:
    """Verify stage: exact shingle Jaccard for LSH candidate pairs.

    intersection via join on (h), sizes via per-doc counts; similarity =
    |A∩B| / (|A| + |B| - |A∩B|). All integer counts — exact.

    The shingle relation feeds four consumers (signatures, intersection x2,
    sizes); persisting it once keeps the dominant explode+distinct from
    being recomputed through live lineage at scale. The cache is scoped via
    ``_persisted_shingles`` — one live copy per session, not one per call.
    """
    sh = _persisted_shingles(spark, canon)
    if cand is None:
        cand = _candidate_pairs_from(_signatures_from(sh))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (
        cand.join(sh.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(
            sh.alias("sb"),
            (F.col("doc_b") == F.col("sb.doc_id")) & (F.col("sa.h") == F.col("sb.h")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.alias("na"), F.col("doc_a") == F.col("na.doc_id"))
        .join(sizes.alias("nb"), F.col("doc_b") == F.col("nb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("inter").cast("double")
                / (F.col("na.n") + F.col("nb.n") - F.col("inter")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .orderBy("doc_a", "doc_b")
    )
    return out


def oracle_ngram_jaccard_pairs(threshold: float = 0.5) -> str:
    pairs = oracle_minhash_candidate_pairs()
    # strip trailing ORDER BY from the pairs SQL for embedding
    pairs_inner = pairs.rsplit("ORDER BY", 1)[0]
    return f"""
WITH cand AS ({pairs_inner}),
sh AS ({_SQL_SHINGLES_CANON}),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.doc_a
  JOIN sh sb ON sb.doc_id = c.doc_b AND sa.h = sb.h
  GROUP BY c.doc_a, c.doc_b
)
SELECT i.doc_a, i.doc_b,
  CAST(i.inter AS DOUBLE) / CAST(na.n + nb.n - i.inter AS DOUBLE) AS jaccard
FROM inter i
JOIN sizes na ON na.doc_id = i.doc_a
JOIN sizes nb ON nb.doc_id = i.doc_b
WHERE CAST(i.inter AS DOUBLE) / CAST(na.n + nb.n - i.inter AS DOUBLE) >= {threshold}
ORDER BY i.doc_a, i.doc_b
"""


def connected_components(pairs: DataFrame, max_rounds: int = 20) -> DataFrame:
    """Min-label propagation over an undirected pair graph: label(v) starts
    at v; each round takes the min of a node's label and its neighbors'
    labels until a fixed point. Rounds are one join + one groupBy each, all
    distributed; ``localCheckpoint`` truncates lineage so the plan doesn't
    deepen per round. Convergence needs O(diameter) rounds and the cap
    asserts rather than silently emitting a partial labeling. For
    adversarially long chain graphs swap the body for alternating
    large-star/small-star (same per-round shuffle shape, O(log n) rounds).

    Input: (doc_a, doc_b) pairs. Output: (node, label) with label = the
    minimum node id reachable.
    """
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    label_t = dict(labels.dtypes)["label"]
    for _ in range(max_rounds):
        nbr = edges.join(
            labels.withColumnRenamed("node", "src"), "src"
        ).select(F.col("dst").alias("node"), "label")
        # the node's previous label rides the SAME fold (every node has
        # exactly one labels row, so min(_old) recovers it): the changed
        # check then filters the freshly checkpointed rows instead of
        # paying a join job per round (r12 optimization — at toy/fixture
        # graph sizes the loop is pure per-round job latency, and this
        # removes one shuffle join from every round; labels per round are
        # unchanged, min over the same multiset)
        new_labels = (
            labels.select("node", "label", F.col("label").alias("_old"))
            .unionByName(
                nbr.select(
                    "node", "label", F.lit(None).cast(label_t).alias("_old")
                )
            )
            .groupBy("node")
            .agg(F.min("label").alias("label"), F.min("_old").alias("_old"))
            .localCheckpoint()
        )
        changed = (
            new_labels.filter(F.col("label") != F.col("_old")).limit(1).count()
        )
        labels = new_labels.select("node", "label")
        if changed == 0:
            break
    else:
        raise RuntimeError("connected_components: label propagation did not converge")
    return labels


def dup_clusters(
    spark: SparkSession,
    threshold: float = 0.5,
    cand: DataFrame | None = None,
    canon: DataFrame | None = None,
) -> DataFrame:
    """Duplicate clusters: connected components over the verified near-dup
    pair graph, labeling every member with the minimum doc_id reachable
    (the canonical document a training pipeline keeps).

    Output: one row per doc participating in >=1 verified pair —
    (doc_id, cluster_id = min reachable doc_id, cluster_size, is_canonical).

    ``canon`` threads a composition-level E1 keep set down to the shingle
    cache build (see _persisted_shingles)."""
    pairs = ngram_jaccard_pairs(spark, threshold, cand, canon).select(
        "doc_a", "doc_b"
    )
    labels = connected_components(pairs)
    sizes = labels.groupBy("label").agg(F.count("*").cast("long").alias("cluster_size"))
    # plain key join, NOT broadcast: cluster count is data-scaled (on a
    # web-crawl corpus a large fraction of docs participate in clusters), so
    # a forced broadcast would collect a billion-row relation to the driver
    # at 100 TB. Both sides hash-partition on `label`; AQE may still choose
    # broadcast at toy scale where it is actually safe.
    return (
        labels.join(sizes, "label")
        .select(
            F.col("node").alias("doc_id"),
            F.col("label").alias("cluster_id"),
            "cluster_size",
            (F.col("node") == F.col("label")).alias("is_canonical"),
        )
        .orderBy("doc_id")
    )


def oracle_dup_clusters(threshold: float = 0.5) -> str:
    pairs = oracle_ngram_jaccard_pairs(threshold)
    pairs_inner = pairs.rsplit("ORDER BY", 1)[0]
    # reachability closure: walk(node, r) holds every doc r that reaches
    # node; cluster id = min over reachable (exact CC, fine at oracle scale)
    return f"""
WITH RECURSIVE verified AS ({pairs_inner}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM verified
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM verified
),
walk(node, r) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.dst, w.r FROM walk w JOIN edges e ON e.src = w.node
),
cc AS (SELECT node, MIN(r) AS cluster_id FROM walk GROUP BY node),
sizes AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size FROM cc GROUP BY cluster_id)
SELECT cc.node AS doc_id, cc.cluster_id, sizes.cluster_size,
       cc.node = cc.cluster_id AS is_canonical
FROM cc JOIN sizes USING (cluster_id)
ORDER BY doc_id
"""


def _simhash_from(docs: DataFrame, bits: int = 16) -> DataFrame:
    """Unsorted (doc_id, simhash) core shared by the registered E5 query
    and the Hamming candidate generator (E69)."""
    exploded = docs.select(
        "doc_id", F.explode(_words(F.col("text"))).alias("w")
    ).select("doc_id", _hash60(F.col("w")).alias("h"))
    bit_sums = exploded.groupBy("doc_id").agg(
        *[
            F.sum(
                F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) * 2 - 1
            ).alias(f"s{j}")
            for j in range(bits)
        ]
    )
    sim = None
    for j in range(bits):
        term = F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sim = term if sim is None else (sim + term)
    return bit_sums.select("doc_id", sim.cast("long").alias("simhash"))


def simhash(spark: SparkSession, bits: int = 16) -> DataFrame:
    """16-bit SimHash over word hashes: bit j set iff sum over words of
    (2*bit_j(h) - 1) > 0."""
    return _simhash_from(spark.table("documents"), bits).orderBy("doc_id")


def oracle_simhash(bits: int = 16) -> str:
    sums = ", ".join(
        f"SUM(((h >> {j}) & 1) * 2 - 1) AS s{j}" for j in range(bits)
    )
    sim = " + ".join(
        f"CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(bits)
    )
    return f"""
WITH ex AS (
  SELECT doc_id, {_sql_hash60('w')} AS h
  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents) t
),
bs AS (SELECT doc_id, {sums} FROM ex GROUP BY doc_id)
SELECT doc_id, CAST({sim} AS BIGINT) AS simhash FROM bs ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Exact-substring span dedup (Lee et al. 2022, "Deduplicating Training Data
# Makes Language Models Better"): fixed-width word windows hashed and matched
# across documents; a document whose text is mostly covered by windows that
# also appear in OTHER documents is dropped. Catches partial/embedded
# duplication that whole-document hashing (E1) misses and MinHash (E2-E4)
# only scores approximately.
# ---------------------------------------------------------------------------

SPAN_W = 16              # words per window (the paper uses 50 BPE tokens)
SPAN_DROP_FRACTION = 0.5  # drop when >= half the windows are cross-doc dups


def _span_gram_hashes(docs: DataFrame, distinct: bool = False) -> DataFrame:
    """doc_id -> hashed overlapping SPAN_W-word windows (md5-60bit). With
    distinct=True, per-doc window dedup happens in the array BEFORE the
    explode, so repeated windows never hit the shuffle."""
    words = _words(F.col("text"))
    n = F.size(words)
    idx = F.when(
        n >= SPAN_W, F.sequence(F.lit(1), n - SPAN_W + 1)
    ).otherwise(F.array().cast("array<int>"))
    arr = F.transform(idx, lambda i: F.array_join(F.slice(words, i, SPAN_W), " "))
    if distinct:
        arr = F.array_distinct(arr)
    return docs.select("doc_id", F.explode(arr).alias("gram")).select(
        "doc_id", _hash60(F.col("gram")).alias("h")
    )


def ngram_span_dedup(
    spark: SparkSession, canon: DataFrame | None = None
) -> DataFrame:
    """Per-document span-duplication decision, scoped to exact-dedup
    canonicals: windows are generated ONLY for each exact-dup group's
    canonical (E1's keep set — identical-content siblings are E1's drop,
    not span duplication; pass ``canon`` when a composition has already
    derived that set so the content-hash window is not recomputed — see
    dedup_keep_list), every overlapping SPAN_W-word window is hashed
    (portable md5-60bit), and a window position counts as duplicated only
    when the same hash also occurs in a canonical with SMALLER doc_id. The
    asymmetry guarantees one representative of any span-duplicated content
    survives: the minimum-doc_id holder of a window is never flagged by it
    (Lee et al. 2022 keep-one-occurrence; the paper's sequential greedy is
    approximated one-pass — 'surviving' means exact-canonical, not
    span-surviving, so A<B<C chains can over-drop C, exactly like the
    paper's parallel variant).

    Scale shape: one content-hash shuffle for the canonical filter, then
    explode -> ONE shuffle on the 8-byte window hash (the min-doc_id window
    rides that exchange; no countDistinct, no self-join, grams never
    shuffled as strings) -> ONE groupBy(doc_id) reduce; both aggregations
    map-side combinable. Docs shorter than W words and non-canonical
    siblings re-enter via the left join with zero windows (keep).

    The window form is the measured winner (r7 A/B at sf0.1, local[32],
    median of 3 x2): window 2.6-2.8 s vs groupBy(h).agg(min)+rejoin 2.9-3.2
    s (SHUFFLE_HASH hint) / 4.8-4.9 s (sort-merge) — the per-partition sort
    is cheaper than a second pass over the gram relation for the join.
    """
    docs = spark.table("documents")
    grams = _span_gram_hashes(_exact_canonicals(docs) if canon is None else canon)
    w = Window.partitionBy("h")
    flagged = grams.withColumn(
        "shared", F.min("doc_id").over(w) < F.col("doc_id")
    )
    per_doc = flagged.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_windows"),
        F.sum(F.when(F.col("shared"), 1).otherwise(0)).cast("long").alias(
            "dup_windows"
        ),
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_windows", F.lit(0)).alias("n_windows"),
            F.coalesce("dup_windows", F.lit(0)).alias("dup_windows"),
            F.when(
                F.coalesce("n_windows", F.lit(0)) > 0,
                F.col("dup_windows").cast("double") / F.col("n_windows"),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_fraction"),
        )
        .withColumn("keep", F.col("dup_fraction") < SPAN_DROP_FRACTION)
        .orderBy("doc_id")
    )


def oracle_ngram_span_dedup() -> str:
    return f"""
WITH canon AS ({_SQL_CANON}),
w AS (
  SELECT doc_id, string_split(lower(text), ' ') AS wl FROM canon
),
grams AS (
  SELECT doc_id,
         {_sql_hash60(f"array_to_string(wl[gs.i : gs.i + {SPAN_W} - 1], ' ')")} AS h
  FROM w, LATERAL (SELECT unnest(generate_series(1, len(wl) - {SPAN_W} + 1)) AS i) gs
  WHERE len(wl) >= {SPAN_W}
),
flagged AS (
  SELECT doc_id,
         MIN(doc_id) OVER (PARTITION BY h) < doc_id AS shared
  FROM grams
),
per_doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows,
         CAST(SUM(CASE WHEN shared THEN 1 ELSE 0 END) AS BIGINT) AS dup_windows
  FROM flagged GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(p.n_windows, 0) AS n_windows,
       COALESCE(p.dup_windows, 0) AS dup_windows,
       CASE WHEN COALESCE(p.n_windows, 0) > 0
            THEN CAST(p.dup_windows AS DOUBLE) / p.n_windows ELSE 0.0 END AS dup_fraction,
       CASE WHEN COALESCE(p.n_windows, 0) > 0
            THEN CAST(p.dup_windows AS DOUBLE) / p.n_windows ELSE 0.0 END
         < {SPAN_DROP_FRACTION} AS keep
FROM documents d LEFT JOIN per_doc p USING (doc_id)
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# End-to-end dedup decision (the composition a training pipeline actually
# consumes — the full Lee et al. 2022 recipe): exact dedup (E1) -> MinHash
# LSH candidates (E3) -> Jaccard verify (E4) -> connected components (E6)
# -> exact-substring span dedup (E28) -> one keep/drop row per document
# with the reason. Drop priority: exact duplicates first, then near-dup
# cluster non-canonicals, then span-duplicated documents.
# ---------------------------------------------------------------------------


def dedup_keep_list(
    spark: SparkSession,
    exact: DataFrame | None = None,
    near: DataFrame | None = None,
) -> DataFrame:
    """Total over the corpus: every doc gets (keep, reason). Composes the
    already-bucketed stages with two plain left joins on doc_id — NOT
    broadcast: near-dup membership is one row per doc in any verified pair
    (20-50% of a web-crawl corpus → billions of rows at 100 TB) and the
    span decision is total over the corpus, so both sides must stay
    distributed. All three relations hash-partition on doc_id; AQE decides
    the physical join at runtime.

    The span stage is canonical-first and asymmetric (see
    ngram_span_dedup): exact-dup siblings never flag their canonical's
    windows, and the min-doc_id holder of duplicated content is never
    span-dropped — so exactly one representative of any duplicated content
    survives the composition (Lee et al. 2022 keep-one-occurrence), rather
    than symmetric span-drop removing every copy."""
    canon = None
    if exact is None:
        # the E1 decision is computed ONCE per composition (lazy
        # localCheckpoint of the narrow (doc_id, hash, keep) relation) and
        # the span stage's canonical set is derived from its keep flag as
        # a semi join — without this the content-hash window and the md5
        # pass over the corpus text ran a second time inside
        # ngram_span_dedup's own _exact_canonicals subtree (r12 A/B at
        # sf0.1, noop min-of-4: 13.4 -> 9.8 s for the full composition;
        # collected outputs identical)
        exact = _exact_groups_unsorted(spark.table("documents")).localCheckpoint(
            eager=False
        )
        canon = spark.table("documents").join(
            exact.filter("keep").select("doc_id"), "doc_id", "semi"
        )
    exact = exact.select("doc_id", F.col("keep").alias("exact_keep"))
    # canon rides down to the shingle-cache build too (r13, the r12 carry
    # item): without it the cached shingle relation re-derived the
    # content-hash window + md5 pass inside its own _exact_canonicals
    # subtree — the LAST duplicate E1 computation in this composition
    near = (dup_clusters(spark, canon=canon) if near is None else near).select(
        "doc_id", "cluster_id", "is_canonical"
    )
    span = ngram_span_dedup(spark, canon=canon).select(
        "doc_id", F.col("keep").alias("span_keep"), "dup_fraction"
    )
    j = exact.join(near, "doc_id", "left").join(span, "doc_id", "left")
    near_drop = ~F.coalesce(F.col("is_canonical"), F.lit(True))
    span_drop = ~F.coalesce(F.col("span_keep"), F.lit(True))
    return j.select(
        "doc_id",
        (F.col("exact_keep") & ~near_drop & ~span_drop).alias("keep"),
        F.when(~F.col("exact_keep"), F.lit("exact_duplicate"))
        .when(near_drop, F.lit("near_duplicate"))
        .when(span_drop, F.lit("span_duplicate"))
        .alias("drop_reason"),
        F.col("cluster_id").alias("near_dup_cluster_id"),
        F.col("dup_fraction").alias("span_dup_fraction"),
    ).orderBy("doc_id")


def oracle_dedup_keep_list() -> str:
    exact = oracle_exact_dup_groups().rsplit("ORDER BY", 1)[0]
    near = oracle_dup_clusters().rsplit("ORDER BY", 1)[0]
    span = oracle_ngram_span_dedup().rsplit("ORDER BY", 1)[0]
    return f"""
WITH exact AS ({exact}),
near AS ({near}),
span AS ({span})
SELECT e.doc_id,
  e.keep AND NOT COALESCE(NOT n.is_canonical, FALSE)
         AND NOT COALESCE(NOT s.keep, FALSE) AS keep,
  CASE WHEN NOT e.keep THEN 'exact_duplicate'
       WHEN COALESCE(NOT n.is_canonical, FALSE) THEN 'near_duplicate'
       WHEN COALESCE(NOT s.keep, FALSE) THEN 'span_duplicate'
  END AS drop_reason,
  n.cluster_id AS near_dup_cluster_id,
  s.dup_fraction AS span_dup_fraction
FROM exact e
LEFT JOIN near n USING (doc_id)
LEFT JOIN span s ON s.doc_id = e.doc_id
ORDER BY e.doc_id
"""


# ---------------------------------------------------------------------------
# Asymmetric containment verify: |A∩B| / min(|A|, |B|) on the same LSH
# candidate pairs. Jaccard under-scores subset duplication (a paragraph
# embedded in a much longer document); containment flags it — the pair of
# metrics is what a dedup pipeline reviews before choosing drop rules.
# ---------------------------------------------------------------------------

CONTAINMENT_THRESHOLD = 0.8


def _span_candidate_pairs(spark: SparkSession) -> DataFrame:
    """Candidate pairs sharing at least one SPAN_W-word window hash — the
    candidate generator subset duplication NEEDS: symmetric MinHash LSH
    cannot surface a short doc embedded in a long one (their Jaccard is
    ~|A|/|B|, far below any banding knee), but a verbatim-embedded span
    guarantees shared window hashes.

    Canonical-first: exact-duplicate groups share EVERY window, so scoring
    raw documents would emit ~n^2 pairs inside each identical-content group.
    The exact-dedup keep filter (E1, the shared _exact_canonicals helper) is
    composed in here — only group canonicals generate grams — making pair
    counts linear in true near-dup structure. Pair generation is the same
    groupBy-bucket expansion as the LSH path (one shuffle on the 8-byte
    hash, no self-join recompute); window-hash group size stays the skew
    knob for AQE."""
    docs = spark.table("documents")
    grams = _span_gram_hashes(_exact_canonicals(docs), distinct=True)
    return (
        grams.groupBy("h")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (a, i) -> "
                    "transform(slice(ids, i + 2, size(ids) - i - 1), "
                    "b -> struct(a AS doc_a, b AS doc_b))))"
                )
            ).alias("p")
        )
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )


def ngram_containment_pairs(
    spark: SparkSession, threshold: float = CONTAINMENT_THRESHOLD
) -> DataFrame:
    """Scoring shape of the Jaccard verify (shingle-set intersection over
    the scoped cache) with the containment denominator min(|A|, |B|) and
    canonical-first window-hash candidates (exact-dedup keep filter composed
    into the generator — see _span_candidate_pairs), plus a flag for pairs
    containment catches that Jaccard (at its 0.5 gate) would miss."""
    sh = _persisted_shingles(spark)
    cand = _span_candidate_pairs(spark)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (
        cand.join(sh.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(
            sh.alias("sb"),
            (F.col("doc_b") == F.col("sb.doc_id")) & (F.col("sa.h") == F.col("sb.h")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    jac = (
        F.col("inter").cast("double")
        / (F.col("na.n") + F.col("nb.n") - F.col("inter")).cast("double")
    )
    cont = F.col("inter").cast("double") / F.least(
        F.col("na.n"), F.col("nb.n")
    ).cast("double")
    return (
        inter.join(sizes.alias("na"), F.col("doc_a") == F.col("na.doc_id"))
        .join(sizes.alias("nb"), F.col("doc_b") == F.col("nb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            cont.alias("containment"),
            jac.alias("jaccard"),
            (cont >= F.lit(threshold)).alias("contained"),
            ((cont >= F.lit(threshold)) & (jac < F.lit(0.5))).alias(
                "subset_only"
            ),
        )
        .filter(F.col("containment") >= threshold)
        .orderBy("doc_a", "doc_b")
    )


def oracle_ngram_containment_pairs(
    threshold: float = CONTAINMENT_THRESHOLD,
) -> str:
    span_grams = f"""
  SELECT doc_id,
         {_sql_hash60(f"array_to_string(wl[gs.i : gs.i + {SPAN_W} - 1], ' ')")} AS h
  FROM (SELECT doc_id, string_split(lower(text), ' ') AS wl FROM canon) w,
  LATERAL (SELECT unnest(generate_series(1, len(wl) - {SPAN_W} + 1)) AS i) gs
  WHERE len(wl) >= {SPAN_W}
"""
    return f"""
WITH canon AS ({_SQL_CANON}),
grams AS (SELECT DISTINCT doc_id, h FROM ({span_grams}) g),
cand AS (
  SELECT DISTINCT ga.doc_id AS doc_a, gb.doc_id AS doc_b
  FROM grams ga JOIN grams gb ON ga.h = gb.h AND ga.doc_id < gb.doc_id
),
sh AS ({_SQL_SHINGLES_CANON}),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.doc_a
  JOIN sh sb ON sb.doc_id = c.doc_b AND sa.h = sb.h
  GROUP BY c.doc_a, c.doc_b
),
scored AS (
  SELECT i.doc_a, i.doc_b,
    CAST(i.inter AS DOUBLE) / CAST(LEAST(na.n, nb.n) AS DOUBLE) AS containment,
    CAST(i.inter AS DOUBLE) / CAST(na.n + nb.n - i.inter AS DOUBLE) AS jaccard
  FROM inter i
  JOIN sizes na ON na.doc_id = i.doc_a
  JOIN sizes nb ON nb.doc_id = i.doc_b
)
SELECT doc_a, doc_b, containment, jaccard,
  containment >= {threshold} AS contained,
  containment >= {threshold} AND jaccard < 0.5 AS subset_only
FROM scored
WHERE containment >= {threshold}
ORDER BY doc_a, doc_b
"""


# ---------------------------------------------------------------------------
# E39 — cross-source n-gram containment matrix: for every ordered source
# pair, the fraction of source A's distinct shingle hashes that also occur
# in source B — the corpus-level duplication diagnostic a curation pipeline
# reads before deciding which sources to dedup against which (e.g. "is
# this crawl mostly a re-crawl of that one"). Asymmetric by design:
# containment(A in B) != containment(B in A) when sizes differ.
#
# Scale shape: the shingle relation reduces to DISTINCT (source, h) before
# anything else (map-side combinable), pairs come from the same
# groupBy-bucket expansion as the LSH path (one shuffle on the 8-byte
# hash, never an all-pairs source join), and the per-pair intersection is
# a counting aggregate over that exchange. Source count is small, gram
# count is the data-scaled side.
# ---------------------------------------------------------------------------


def source_overlap(spark: SparkSession) -> DataFrame:
    docs = spark.table("documents")
    grams = (
        _shingle_hashes(docs.select(F.col("source").alias("doc_id"), "text"))
        .withColumnRenamed("doc_id", "source")
        .distinct()
    )
    sizes = grams.groupBy("source").agg(F.count("*").cast("long").alias("n_grams"))
    pairs = (
        grams.groupBy("h")
        .agg(F.sort_array(F.collect_set("source")).alias("ss"))
        .filter(F.size("ss") > 1)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ss, (a, i) -> "
                    "transform(slice(ss, i + 2, size(ss) - i - 1), "
                    "b -> struct(a AS s_a, b AS s_b))))"
                )
            ).alias("p")
        )
        .groupBy("p.s_a", "p.s_b")
        .agg(F.count("*").cast("long").alias("shared"))
    )
    # emit both directions: containment is asymmetric
    both = pairs.unionByName(
        pairs.select(
            F.col("s_b").alias("s_a"), F.col("s_a").alias("s_b"), "shared"
        )
    )
    return (
        both.join(sizes.withColumnRenamed("source", "s_a"), on="s_a")
        .select(
            F.col("s_a").alias("source"),
            F.col("s_b").alias("other_source"),
            "shared",
            F.col("n_grams").alias("source_grams"),
            (F.col("shared").cast("double") / F.col("n_grams").cast("double")).alias(
                "containment"
            ),
        )
        .orderBy("source", "other_source")
    )


def oracle_source_overlap() -> str:
    return f"""
WITH grams AS (
  SELECT DISTINCT source, h FROM (
    SELECT doc_id AS source, h FROM (
      {_SQL_SHINGLES.replace("FROM documents", "FROM (SELECT source AS doc_id, text FROM documents) src_docs")}
    ) g
  ) s
),
sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_grams FROM grams GROUP BY source),
pairs AS (
  SELECT ga.source AS s_a, gb.source AS s_b, CAST(COUNT(*) AS BIGINT) AS shared
  FROM grams ga JOIN grams gb ON ga.h = gb.h AND ga.source < gb.source
  GROUP BY ga.source, gb.source
),
directed AS (
  SELECT s_a, s_b, shared FROM pairs
  UNION ALL
  SELECT s_b AS s_a, s_a AS s_b, shared FROM pairs
)
SELECT b.s_a AS source, b.s_b AS other_source, b.shared,
  z.n_grams AS source_grams,
  CAST(b.shared AS DOUBLE) / CAST(z.n_grams AS DOUBLE) AS containment
FROM directed b
JOIN sizes z ON z.source = b.s_a
ORDER BY source, other_source
"""


# ---------------------------------------------------------------------------
# E47 — alternating large-star/small-star connected components (Kiveris et
# al. 2014, "Connected Components in MapReduce and Beyond"): the
# O(log n)-round scale path the min-label docstring promises for
# adversarially deep graphs (a 10^6-long duplicate chain needs 10^6
# min-label rounds but ~20 star rounds). Per round: one groupBy(u) for
# m(u) = min(Γ(u) ∪ {u}), one join back, a union, a distinct — the same
# bounded shuffle shape as one min-label round.
# ---------------------------------------------------------------------------


def connected_components_star(pairs: DataFrame, max_rounds: int = 16) -> DataFrame:
    """Same contract as connected_components: input (doc_a, doc_b) pairs,
    output (node, label) with label = min reachable node id."""

    def sym(e: DataFrame) -> DataFrame:
        return (
            e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def norm(e: DataFrame) -> DataFrame:
        return e.select(
            F.greatest("u", "v").alias("hi"), F.least("u", "v").alias("lo")
        ).distinct()

    edges = sym(
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    ).localCheckpoint()
    # node set from the RAW pairs: a pure self-loop node has no surviving
    # symmetric edge but is still its own (singleton) component
    nodes = (
        pairs.select(F.col("doc_a").alias("u"))
        .unionByName(pairs.select(F.col("doc_b").alias("u")))
        .distinct()
        .localCheckpoint()
    )
    prev_norm = None
    for r in range(max_rounds):
        m = (
            edges.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least(F.col("u"), F.col("mv")).alias("m"))
        )
        if r % 2 == 0:
            # large-star: strictly larger neighbors attach to m(u)
            out = (
                edges.filter(F.col("v") > F.col("u"))
                .join(m, "u")
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
            )
        else:
            # small-star: u and its smaller neighbors attach to m(u)
            nbrs = (
                edges.filter(F.col("v") < F.col("u"))
                .join(m, "u")
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
            )
            out = nbrs.unionByName(m.select("u", F.col("m").alias("v")))
        edges = sym(out).localCheckpoint()
        if r % 2 == 1:
            cur_norm = norm(edges).localCheckpoint()
            if prev_norm is not None:
                changed = (
                    cur_norm.exceptAll(prev_norm)
                    .unionByName(prev_norm.exceptAll(cur_norm))
                    .limit(1)
                    .count()
                )
                if changed == 0:
                    break
            prev_norm = cur_norm
    else:
        raise RuntimeError("connected_components_star: did not converge")
    # fixed point is a star forest centered at each component's min: every
    # node's label is min(self, neighbors)
    final_m = (
        edges.groupBy("u")
        .agg(F.min("v").alias("mv"))
        .select("u", F.least(F.col("u"), F.col("mv")).alias("label"))
    )
    return nodes.join(final_m, "u", "left").select(
        F.col("u").alias("node"),
        F.coalesce("label", F.col("u")).alias("label"),
    )


def dup_clusters_star(spark: SparkSession, threshold: float = 0.5) -> DataFrame:
    """dup_clusters through the star-contraction CC — identical output
    (same verified pair graph, same labels), so the SAME recursive-closure
    oracle verifies it; registered to pin the log-round path end to end."""
    pairs = ngram_jaccard_pairs(spark, threshold).select("doc_a", "doc_b")
    labels = connected_components_star(pairs)
    sizes = labels.groupBy("label").agg(
        F.count("*").cast("long").alias("cluster_size")
    )
    return (
        labels.join(sizes, "label")
        .select(
            F.col("node").alias("doc_id"),
            F.col("label").alias("cluster_id"),
            "cluster_size",
            (F.col("node") == F.col("label")).alias("is_canonical"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# E54 — LSH dedup recall: the candidate-generation quality diagnostic for
# the MinHash-LSH dedup path (the E32 ann_recall analog for dedup). Ground
# truth is the EXACT Jaccard pair set — every (doc_a < doc_b) pair sharing
# at least one shingle, scored by integer intersection/union counts (a
# pair with Jaccard >= 0.5 necessarily shares shingles, so the
# shingle-share join is exhaustive for every threshold here). Recall per
# threshold = fraction of true pairs the 8-band LSH banding surfaces as
# candidates — the measurement that justifies (or re-tunes) K/BANDS before
# a production dedup run.
#
# Scale: ground truth is pair-quadratic PER SHINGLE HASH, so the truth
# join is bounded IN-PLAN: shingle hashes occurring in more than
# TRUTH_BUCKET_CAP documents (boilerplate n-grams shared by everything)
# are anti-joined out of BOTH the intersection join and the per-doc size
# denominators before any pair is generated — truth Jaccard is computed
# over the informative-shingle universe, the same stop-element practice
# as winnowing's WINNOW_BUCKET_CAP (textstats.py). Worst-case expansion
# is CAP^2 rows per hash, a constant — the bound lives in the plan, not
# in run-book prose. Still an EVALUATION query (the exhaustive truth side
# is not a production-path operator); the candidate side reuses the
# production banding unchanged.
# ---------------------------------------------------------------------------

RECALL_THRESHOLDS = (0.5, 0.7, 0.9)
# shingle hashes in more docs than this are dropped from truth Jaccard:
# the in-plan blowup bound for the exact-truth self-join (see block
# comment above). At evaluation SFs no hash comes near it (max df at
# sf0.01 is 7), so small-scale results are bit-identical to uncapped.
TRUTH_BUCKET_CAP = 64


def _truth_shingles(sh: DataFrame) -> DataFrame:
    """The informative-shingle relation the exact-Jaccard truth is computed
    over: doc-frequency > TRUTH_BUCKET_CAP hashes removed (tiny hot set;
    AQE broadcasts the anti-join build side)."""
    hot = (
        sh.groupBy("h")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > TRUTH_BUCKET_CAP)
        .select("h")
    )
    return sh.join(hot, "h", "left_anti")


# oracle twin of _truth_shingles: consumes a CTE named sh, yields sh_t
_SQL_TRUTH_SH = f"""
SELECT sh.doc_id, sh.h FROM sh
WHERE sh.h NOT IN (
  SELECT h FROM sh GROUP BY h HAVING COUNT(*) > {TRUTH_BUCKET_CAP}
)
"""


def lsh_dedup_recall(spark: SparkSession) -> DataFrame:
    # truth Jaccard over informative canonical shingles (TRUTH_BUCKET_CAP
    # anti-joined), materialized ONCE per session (localCheckpoint) — the
    # candidate side is the production banding (canonical-first +
    # LSH_BUCKET_CAP) being measured, over the same keep-set universe
    truth = _checkpointed_truth(spark)
    cand = _candidate_pairs_from(_signatures_from(_persisted_shingles(spark))).withColumn(
        "c", F.lit(1)
    )
    flagged = truth.join(cand, on=["doc_a", "doc_b"], how="left")
    exploded = flagged.select(
        "jaccard",
        "c",
        F.explode(
            F.array(*[F.lit(float(t)) for t in RECALL_THRESHOLDS])
        ).alias("threshold"),
    ).filter(F.col("jaccard") >= F.col("threshold"))
    return (
        exploded.groupBy("threshold")
        .agg(
            F.count("*").cast("long").alias("truth_pairs"),
            F.count("c").cast("long").alias("caught_pairs"),
        )
        .select(
            "threshold",
            "truth_pairs",
            "caught_pairs",
            (
                F.col("caught_pairs").cast("double")
                / F.col("truth_pairs").cast("double")
            ).alias("recall"),
        )
        .orderBy("threshold")
    )


def oracle_lsh_dedup_recall() -> str:
    pairs = oracle_minhash_candidate_pairs()
    pairs_inner = pairs.rsplit("ORDER BY", 1)[0]
    tlist = ", ".join(str(t) for t in RECALL_THRESHOLDS)
    return f"""
WITH sh AS ({_SQL_SHINGLES_CANON}),
sh_t AS ({_SQL_TRUTH_SH}),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh_t GROUP BY doc_id),
truth_inter AS (
  SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b, COUNT(*) AS inter
  FROM sh_t sa JOIN sh_t sb ON sa.h = sb.h AND sa.doc_id < sb.doc_id
  GROUP BY sa.doc_id, sb.doc_id
),
truth AS (
  SELECT i.doc_a, i.doc_b,
    CAST(i.inter AS DOUBLE) / CAST(na.n + nb.n - i.inter AS DOUBLE) AS jaccard
  FROM truth_inter i
  JOIN sizes na ON na.doc_id = i.doc_a
  JOIN sizes nb ON nb.doc_id = i.doc_b
),
cand AS ({pairs_inner}),
flagged AS (
  SELECT t.jaccard, CASE WHEN c.doc_a IS NOT NULL THEN 1 END AS c
  FROM truth t LEFT JOIN cand c USING (doc_a, doc_b)
),
exploded AS (
  SELECT jaccard, c, CAST(g.threshold AS DOUBLE) AS threshold
  FROM flagged, LATERAL (SELECT unnest([{tlist}]) AS threshold) g
  WHERE jaccard >= CAST(g.threshold AS DOUBLE)
)
SELECT threshold, CAST(COUNT(*) AS BIGINT) AS truth_pairs,
  CAST(COUNT(c) AS BIGINT) AS caught_pairs,
  CAST(COUNT(c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS recall
FROM exploded
GROUP BY threshold
ORDER BY threshold
"""


# ---------------------------------------------------------------------------
# E61 — LSH tuning curve: the (rows-per-band x bands) parameter sweep over
# the SAME 64 minhash values, reporting for each configuration and Jaccard
# threshold the empirical candidate recall against exact-Jaccard truth
# NEXT TO the theoretical S-curve capture probability
# 1 - (1 - t^r)^b. This is the table that sizes LSH before a 100 TB dedup
# run: more, narrower bands push the S-curve left (higher recall, bigger
# buckets); fewer, wider bands push it right (fewer candidates, misses
# borderline pairs). The theory value is computed once at plan-build time
# and embedded as the SAME literal in both engines, so no cross-engine
# pow() determinism is at stake; the empirical side shares one signature
# aggregate across all configurations (the banding is a projection).
#
# Scale: same evaluation framing as E54 — truth is pair-quadratic on a
# bounded sample; the per-config candidate builds are the production
# banding shape unchanged.
# ---------------------------------------------------------------------------

LSH_TUNING_ROWS = (4, 8, 16)


def _jaccard_truth(sh: DataFrame) -> DataFrame:
    """Exact-Jaccard truth pairs over the informative-shingle universe —
    the TRUTH_BUCKET_CAP anti-join bounds the per-hash pair expansion
    in-plan (see the E54 block comment)."""
    sh = _truth_shingles(sh)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (
        sh.alias("sa")
        .join(
            sh.alias("sb"),
            (F.col("sa.h") == F.col("sb.h"))
            & (F.col("sa.doc_id") < F.col("sb.doc_id")),
        )
        .groupBy(
            F.col("sa.doc_id").alias("doc_a"), F.col("sb.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.alias("na"), F.col("doc_a") == F.col("na.doc_id"))
        .join(sizes.alias("nb"), F.col("doc_b") == F.col("nb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("inter").cast("double")
                / (F.col("na.n") + F.col("nb.n") - F.col("inter")).cast("double")
            ).alias("jaccard"),
        )
    )


def _checkpointed_truth(spark: SparkSession) -> DataFrame:
    """The exact-Jaccard truth relation, materialized (localCheckpoint) so
    every consumer — the recall diagnostic once, the tuning sweep once per
    (rows, bands) configuration — scans the checkpointed pairs instead of
    re-deriving the quadratic self-join per plan branch. Recomputed per
    call (the `documents` view can be re-registered between query builds);
    the sharing that matters is one call feeding many plan branches."""
    return _jaccard_truth(_persisted_shingles(spark)).localCheckpoint()


def _scurve(rows: int, t: float) -> float:
    bands = K // rows
    return 1.0 - (1.0 - t**rows) ** bands


def lsh_tuning(spark: SparkSession) -> DataFrame:
    # ONE signature relation and ONE truth relation feed all sweep
    # configurations: both are localCheckpointed so the nine (config x
    # threshold) branches scan materialized data — without this, Spark
    # re-derives the signature aggregate AND the quadratic truth join per
    # unionByName branch (no cross-branch subtree sharing in Catalyst)
    sig = _signatures_from(_persisted_shingles(spark)).localCheckpoint()
    truth = _checkpointed_truth(spark)
    out = None
    for r in LSH_TUNING_ROWS:
        cand = _candidate_pairs_from(sig, r).withColumn("c", F.lit(1))
        flagged = truth.join(cand, on=["doc_a", "doc_b"], how="left")
        theory = None
        for t in RECALL_THRESHOLDS:
            lit_t = F.lit(float(t))
            branch = F.when(
                F.col("threshold") == lit_t, F.lit(_scurve(r, float(t)))
            )
            theory = branch if theory is None else theory.when(
                F.col("threshold") == lit_t, F.lit(_scurve(r, float(t)))
            )
        agg = (
            flagged.select(
                "jaccard",
                "c",
                F.explode(
                    F.array(*[F.lit(float(t)) for t in RECALL_THRESHOLDS])
                ).alias("threshold"),
            )
            .filter(F.col("jaccard") >= F.col("threshold"))
            .groupBy("threshold")
            .agg(
                F.count("*").cast("long").alias("truth_pairs"),
                F.count("c").cast("long").alias("caught_pairs"),
            )
            .select(
                F.lit(r).cast("int").alias("rows_per_band"),
                F.lit(K // r).cast("int").alias("n_bands"),
                "threshold",
                "truth_pairs",
                "caught_pairs",
                (
                    F.col("caught_pairs").cast("double")
                    / F.col("truth_pairs").cast("double")
                ).alias("recall"),
                theory.alias("theory_capture"),
            )
        )
        out = agg if out is None else out.unionByName(agg)
    return out.orderBy("rows_per_band", "threshold")


def _oracle_banded_pairs(r: int) -> str:
    """Candidate-pair SQL body over the shared sig CTE for a given
    rows-per-band (mirrors _candidate_pairs_from's banding, including the
    LSH_BUCKET_CAP bucket-size bound)."""
    band_selects = []
    for b, (name, cols) in enumerate(_band_cols(r)):
        concat = " || ',' || ".join(
            [f"'{b}'"] + [f"CAST({c} AS VARCHAR)" for c in cols]
        )
        band_selects.append(f"SELECT doc_id, md5({concat}) AS bucket FROM sig")
    buckets = " UNION ALL ".join(band_selects)
    return (
        f"WITH bk AS ({buckets}), "
        f"ok AS (SELECT bucket FROM bk GROUP BY bucket "
        f"HAVING COUNT(*) > 1 AND COUNT(*) <= {LSH_BUCKET_CAP}) "
        f"SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b "
        f"FROM bk l JOIN ok o ON o.bucket = l.bucket JOIN bk r "
        f"ON l.bucket = r.bucket AND l.doc_id < r.doc_id"
    )


def oracle_lsh_tuning() -> str:
    mins = ", ".join(
        f"MIN((h * CAST({A[i]} AS BIGINT) + {B[i]}) % {P31}) AS mh{i}"
        for i in range(K)
    )
    tlist = ", ".join(str(t) for t in RECALL_THRESHOLDS)
    per_config = []
    for r in LSH_TUNING_ROWS:
        theory_case = " ".join(
            f"WHEN g.threshold = {t} THEN {_scurve(r, float(t))!r}"
            for t in RECALL_THRESHOLDS
        )
        per_config.append(f"""
SELECT CAST({r} AS INT) AS rows_per_band, CAST({K // r} AS INT) AS n_bands,
  CAST(g.threshold AS DOUBLE) AS threshold,
  CAST(COUNT(*) AS BIGINT) AS truth_pairs,
  CAST(COUNT(c.doc_a) AS BIGINT) AS caught_pairs,
  CAST(COUNT(c.doc_a) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS recall,
  CAST(CASE {theory_case} END AS DOUBLE) AS theory_capture
FROM truth t
LEFT JOIN ({_oracle_banded_pairs(r)}) c
  ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b
CROSS JOIN LATERAL (SELECT unnest([{tlist}]) AS threshold) g
WHERE t.jaccard >= CAST(g.threshold AS DOUBLE)
GROUP BY g.threshold""")
    union = " UNION ALL ".join(per_config)
    return f"""
WITH sh AS ({_SQL_SHINGLES_CANON}),
sig AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
sh_t AS ({_SQL_TRUTH_SH}),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh_t GROUP BY doc_id),
truth_inter AS (
  SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b, COUNT(*) AS inter
  FROM sh_t sa JOIN sh_t sb ON sa.h = sb.h AND sa.doc_id < sb.doc_id
  GROUP BY sa.doc_id, sb.doc_id
),
truth AS (
  SELECT i.doc_a, i.doc_b,
    CAST(i.inter AS DOUBLE) / CAST(na.n + nb.n - i.inter AS DOUBLE) AS jaccard
  FROM truth_inter i
  JOIN sizes na ON na.doc_id = i.doc_a
  JOIN sizes nb ON nb.doc_id = i.doc_b
)
SELECT * FROM ({union}) u
ORDER BY rows_per_band, threshold
"""


# ---------------------------------------------------------------------------
# E68 — incremental cross-batch dedup: a NEW arrival batch deduplicated
# against the EXISTING corpus (the production shape of dedup at 100 TB —
# nobody re-deduplicates the whole corpus per crawl; each ingest batch is
# screened against what is already kept). Two screens, mirroring the batch
# pipeline's stage order: (1) exact — the incoming content hash hits the
# existing corpus's (content_hash -> min doc_id) dimension; (2) near —
# MinHash-LSH candidates restricted to CROSS-side (existing x incoming)
# bucket-mates, canonical-first per side, capped per bucket, then
# Jaccard-verified. Output is total over the incoming batch: keep /
# drop_reason / matched existing doc.
#
# The batch boundary is doc_id % INC_BATCH_MOD (arrival batches ARE
# id/time-ordered — unlike E42's train/test split, where content keying
# prevents leakage, an ingest boundary is positional by nature).
#
# Scale: the existing side never re-pairs with itself — per-bucket
# expansion emits existing x incoming pairs only, so steady-state cost is
# O(batch) not O(corpus); the exact screen joins the incoming batch
# against a (hash -> id) dimension that a production layout keeps
# bucketed on the hash; LSH_BUCKET_CAP bounds the worst bucket exactly as
# in the batch stage. The streaming twins (st_ml_stream_dedup /
# st_ml_stream_lsh) hold the same state incrementally; this operator is
# their batch-mode contract over an explicit two-batch split.
# ---------------------------------------------------------------------------

INC_BATCH_MOD = 5
INC_BATCH_REM = 4  # doc_id % 5 == 4 -> the incoming batch (20%)
INC_JACCARD_THRESHOLD = 0.5


def _inc_is_incoming() -> Column:
    return (F.col("doc_id") % INC_BATCH_MOD) == INC_BATCH_REM


def incremental_dedup(
    spark: SparkSession,
    docs: DataFrame | None = None,
    materialize: bool | None = None,
) -> DataFrame:
    docs = spark.table("documents") if docs is None else docs
    existing = docs.filter(~_inc_is_incoming())
    incoming = docs.filter(_inc_is_incoming())
    if materialize is None:
        # default ON: the scale-correct shape (one corpus read + one
        # canonical-batch checkpoint) must be what an unconfigured
        # production call gets — a wrong-at-scale default is a footgun
        # (r9 verdict item 5). Since r10 the registered bench/oracle
        # form is the default too: repeated idle runs put the
        # checkpointed shape consistently ahead even at fixture scale
        # (4.8-5.2 s vs 5.9-9.6 s at sf0.1).
        materialize = (
            spark.conf.get("collector_spark.incremental.materialize", "true")
            == "true"
        )

    # exact screen: existing corpus collapses to one row per content hash
    ex_hash = (
        existing.select(_norm_hash().alias("h"), "doc_id")
        .groupBy("h")
        .agg(F.min("doc_id").alias("ex_exact"))
    )
    inc_hashed = incoming.select("doc_id", _norm_hash().alias("h"))
    # in-batch canonical carrier for the near screen: same-content incoming
    # docs inherit their canonical's verdict (identical shingle sets)
    inc_canon_ids = inc_hashed.groupBy("h").agg(F.min("doc_id").alias("canon_id"))

    # near screen: canonical-first signatures per side, cross-side pairs only
    # `materialize` pins the canonical union once for its three consumers
    # (band buckets via signatures, both sides of the intersection join,
    # per-doc sizes), which otherwise each re-derive the exact-canonical
    # window from the source scan — the unmaterialized plan reads the
    # corpus 46 times with zero exchange reuse (tests/test_curation_plans
    # pins both shapes). The DEFAULT is materialize=True (the cluster
    # shape), and the registered bench/oracle form takes it too — the
    # checkpointed shape measured consistently faster than recompute
    # even at fixture scale once re-run idle (r10).
    # The checkpoint sits AFTER the shingle explode+hash (r12 optimization;
    # it previously sat before): `sh` has ~n_words rows per doc but each is
    # two longs (16 bytes) — FEWER bytes than the doc rows with their full
    # text — and checkpointing `sh` instead of the canonical docs removes
    # three of the four explode+md5 passes (signatures, both intersection
    # sides, sizes each re-ran the shingle derivation from the doc-level
    # checkpoint; plan showed 7 Generate nodes). Interleaved A/B at sf0.1:
    # 7.82 -> 5.63 s min-of-4 (collected outputs bit-identical). The
    # scan-collapse plan pins still hold.
    union_canon = (
        _exact_canonicals(existing)
        .select("doc_id", "text")
        .unionByName(_exact_canonicals(incoming).select("doc_id", "text"))
    )
    sh = _shingle_hashes(union_canon)
    if materialize:
        sh = sh.localCheckpoint(eager=False)
    buckets = _band_buckets(_signatures_from(sh)).withColumn(
        "inc", _inc_is_incoming()
    )
    grouped = buckets.groupBy("bucket").agg(
        F.sort_array(
            F.collect_list(F.when(~F.col("inc"), F.col("doc_id")))
        ).alias("ex_ids"),
        F.sort_array(
            F.collect_list(F.when(F.col("inc"), F.col("doc_id")))
        ).alias("inc_ids"),
    )
    pairs = (
        grouped.filter(
            (F.size("ex_ids") > 0)
            & (F.size("inc_ids") > 0)
            & (F.size("ex_ids") + F.size("inc_ids") <= LSH_BUCKET_CAP)
        )
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ex_ids, a -> transform(inc_ids, "
                    "b -> struct(a AS ex_id, b AS inc_id))))"
                )
            ).alias("p")
        )
        .select("p.ex_id", "p.inc_id")
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (
        pairs.join(sh.alias("sa"), F.col("ex_id") == F.col("sa.doc_id"))
        .join(
            sh.alias("sb"),
            (F.col("inc_id") == F.col("sb.doc_id"))
            & (F.col("sa.h") == F.col("sb.h")),
        )
        .groupBy("ex_id", "inc_id")
        .agg(F.count("*").alias("inter"))
    )
    jaccard = F.col("inter").cast("double") / (
        F.col("na.n") + F.col("nb.n") - F.col("inter")
    ).cast("double")
    verified = (
        inter.join(sizes.alias("na"), F.col("ex_id") == F.col("na.doc_id"))
        .join(sizes.alias("nb"), F.col("inc_id") == F.col("nb.doc_id"))
        .select("ex_id", "inc_id", jaccard.alias("jaccard"))
        .filter(F.col("jaccard") >= INC_JACCARD_THRESHOLD)
    )
    near = verified.groupBy("inc_id").agg(
        F.min("ex_id").alias("ex_near"),
        F.max("jaccard").alias("best_jaccard"),
    )

    out = (
        inc_hashed.join(ex_hash, "h", "left")
        .join(inc_canon_ids, "h")
        .join(near, F.col("canon_id") == F.col("inc_id"), "left")
    )
    return out.select(
        "doc_id",
        (F.col("ex_exact").isNull() & F.col("ex_near").isNull()).alias("keep"),
        F.when(F.col("ex_exact").isNotNull(), F.lit("exact_duplicate"))
        .when(F.col("ex_near").isNotNull(), F.lit("near_duplicate"))
        .alias("drop_reason"),
        F.coalesce(F.col("ex_exact"), F.col("ex_near")).alias("matched_doc_id"),
        "best_jaccard",
    ).orderBy("doc_id")


def dedup_index_write(
    spark: SparkSession, out_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """Persist the EXISTING corpus's dedup screen as the four parquet
    relations it IS — the exact-screen hash map (h, ex_exact), the
    pre-grouped LSH band buckets (bucket, ex_ids sorted array), the
    canonical shingle relation (doc_id, h), and the per-doc shingle
    counts — and return the read-back audit. An ACTION (the
    ivf_index_write / neardup_index_write discipline), never registered:
    build once over the corpus, then every crawl batch is screened by
    incremental_dedup_from_index with NO corpus-side work in the plan —
    the canonicalization window, the K-aggregate signature fold, and the
    bucket grouping over the corpus run only here.

    Scale (100 TB): buckets are written bucket-clustered (the serve join
    is an equi-join on bucket; a catalog deployment would BUCKET BY
    bucket), shingles and sizes doc_id-clustered for the verify joins.
    The pre-grouped ex_ids arrays are bounded by LSH_BUCKET_CAP-scale
    bucket occupancy in practice and make the serve-side pair expansion
    one row per (bucket, batch) instead of a per-member join."""
    docs = spark.table("documents") if docs is None else docs
    existing = docs.filter(~_inc_is_incoming())
    par = spark.sparkContext.defaultParallelism
    ex_hash = (
        existing.select(_norm_hash().alias("h"), "doc_id")
        .groupBy("h")
        .agg(F.min("doc_id").alias("ex_exact"))
    )
    # checkpoint AFTER the explode+hash (r12, the incremental_dedup
    # optimization): sh feeds the signature fold, the sizes aggregate, and
    # its own parquet write — three consumers that each re-ran the shingle
    # derivation from the doc-level checkpoint, and (doc_id, h) rows are
    # fewer bytes than the docs' text
    canon = _exact_canonicals(existing).select("doc_id", "text")
    sh = _shingle_hashes(canon).localCheckpoint(eager=False)
    buckets = (
        _band_buckets(_signatures_from(sh))
        .groupBy("bucket")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ex_ids"))
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    ex_hash.repartition(par, "h").write.mode("overwrite").parquet(
        f"{out_dir}/exact"
    )
    buckets.repartition(par, "bucket").write.mode("overwrite").parquet(
        f"{out_dir}/buckets"
    )
    sh.repartition(par, "doc_id").sortWithinPartitions("doc_id").write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/shingles")
    sizes.repartition(par, "doc_id").write.mode("overwrite").parquet(
        f"{out_dir}/sizes"
    )
    rows = [
        (rel, spark.read.parquet(f"{out_dir}/{rel}").count())
        for rel in ("exact", "buckets", "shingles", "sizes")
    ]
    return spark.createDataFrame(rows, "relation string, n_rows long")


def incremental_dedup_from_index(spark: SparkSession, index_dir: str) -> DataFrame:
    """Screen the incoming batch against a RELOADED dedup index: the
    exact screen joins the persisted hash map, the near screen joins the
    batch's band buckets against the persisted pre-grouped buckets, and
    Jaccard verification joins persisted corpus shingles/sizes — every
    per-corpus stage (canonicalization window, signature fold, bucket
    grouping) appears NOWHERE here; all plan work is O(batch). Decision
    rows are pinned bit-identical to incremental_dedup's in-plan form:
    signatures are per-doc (side-independent), the pre-grouped ex_ids
    arrays equal the in-plan collect_list split, and the cap filter,
    integer intersection counts, and the jaccard double all derive from
    the same exact values."""
    docs = spark.table("documents")
    incoming = docs.filter(_inc_is_incoming())
    ex_hash = spark.read.parquet(f"{index_dir}/exact")
    inc_hashed = incoming.select("doc_id", _norm_hash().alias("h"))
    inc_canon_ids = inc_hashed.groupBy("h").agg(F.min("doc_id").alias("canon_id"))

    inc_canon = (
        _exact_canonicals(incoming)
        .select("doc_id", "text")
        .localCheckpoint(eager=False)
    )
    sh_inc = _shingle_hashes(inc_canon)
    inc_grouped = (
        _band_buckets(_signatures_from(sh_inc))
        .groupBy("bucket")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("inc_ids"))
    )
    pairs = (
        inc_grouped.join(spark.read.parquet(f"{index_dir}/buckets"), "bucket")
        .filter(F.size("ex_ids") + F.size("inc_ids") <= LSH_BUCKET_CAP)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ex_ids, a -> transform(inc_ids, "
                    "b -> struct(a AS ex_id, b AS inc_id))))"
                )
            ).alias("p")
        )
        .select("p.ex_id", "p.inc_id")
        .distinct()
    )
    sh_ex = spark.read.parquet(f"{index_dir}/shingles")
    inter = (
        pairs.join(sh_ex.alias("sa"), F.col("ex_id") == F.col("sa.doc_id"))
        .join(
            sh_inc.alias("sb"),
            (F.col("inc_id") == F.col("sb.doc_id"))
            & (F.col("sa.h") == F.col("sb.h")),
        )
        .groupBy("ex_id", "inc_id")
        .agg(F.count("*").alias("inter"))
    )
    sizes_ex = spark.read.parquet(f"{index_dir}/sizes")
    sizes_inc = sh_inc.groupBy("doc_id").agg(F.count("*").alias("n"))
    jaccard = F.col("inter").cast("double") / (
        F.col("na.n") + F.col("nb.n") - F.col("inter")
    ).cast("double")
    verified = (
        inter.join(sizes_ex.alias("na"), F.col("ex_id") == F.col("na.doc_id"))
        .join(sizes_inc.alias("nb"), F.col("inc_id") == F.col("nb.doc_id"))
        .select("ex_id", "inc_id", jaccard.alias("jaccard"))
        .filter(F.col("jaccard") >= INC_JACCARD_THRESHOLD)
    )
    near = verified.groupBy("inc_id").agg(
        F.min("ex_id").alias("ex_near"),
        F.max("jaccard").alias("best_jaccard"),
    )
    out = (
        inc_hashed.join(ex_hash, "h", "left")
        .join(inc_canon_ids, "h")
        .join(near, F.col("canon_id") == F.col("inc_id"), "left")
    )
    return out.select(
        "doc_id",
        (F.col("ex_exact").isNull() & F.col("ex_near").isNull()).alias("keep"),
        F.when(F.col("ex_exact").isNotNull(), F.lit("exact_duplicate"))
        .when(F.col("ex_near").isNotNull(), F.lit("near_duplicate"))
        .alias("drop_reason"),
        F.coalesce(F.col("ex_exact"), F.col("ex_near")).alias("matched_doc_id"),
        "best_jaccard",
    ).orderBy("doc_id")


def oracle_incremental_dedup() -> str:
    mins = ", ".join(
        f"MIN((h * CAST({A[i]} AS BIGINT) + {B[i]}) % {P31}) AS mh{i}"
        for i in range(K)
    )
    band_selects = []
    for b, (name, cols) in enumerate(_band_cols()):
        concat = " || ',' || ".join(
            [f"'{b}'"] + [f"CAST({c} AS VARCHAR)" for c in cols]
        )
        band_selects.append(
            f"SELECT doc_id, md5({concat}) AS bucket, "
            f"doc_id % {INC_BATCH_MOD} = {INC_BATCH_REM} AS inc FROM sig"
        )
    buckets = " UNION ALL ".join(band_selects)
    canon_ex = _SQL_CANON.replace("FROM documents d", "FROM existing d")
    canon_inc = _SQL_CANON.replace("FROM documents d", "FROM incoming d")
    shingles = _SQL_SHINGLES.replace("FROM documents", "FROM union_canon")
    return f"""
WITH existing AS (
  SELECT * FROM documents WHERE doc_id % {INC_BATCH_MOD} <> {INC_BATCH_REM}
),
incoming AS (
  SELECT * FROM documents WHERE doc_id % {INC_BATCH_MOD} = {INC_BATCH_REM}
),
ex_hash AS (
  SELECT {_SQL_NORM_HASH} AS h, MIN(doc_id) AS ex_exact
  FROM existing GROUP BY 1
),
inc_hashed AS (SELECT doc_id, {_SQL_NORM_HASH} AS h FROM incoming),
inc_canon_ids AS (SELECT h, MIN(doc_id) AS canon_id FROM inc_hashed GROUP BY h),
union_canon AS (
  SELECT doc_id, text FROM ({canon_ex}) ec
  UNION ALL
  SELECT doc_id, text FROM ({canon_inc}) ic
),
sh AS ({shingles}),
sig AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
buckets AS ({buckets}),
ok AS (
  SELECT bucket FROM buckets
  GROUP BY bucket
  HAVING COUNT(*) <= {LSH_BUCKET_CAP}
     AND SUM(CASE WHEN inc THEN 1 ELSE 0 END) >= 1
     AND SUM(CASE WHEN inc THEN 0 ELSE 1 END) >= 1
),
pairs AS (
  SELECT DISTINCT e.doc_id AS ex_id, i.doc_id AS inc_id
  FROM buckets e
  JOIN ok o ON o.bucket = e.bucket
  JOIN buckets i ON i.bucket = e.bucket AND i.inc AND NOT e.inc
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT p.ex_id, p.inc_id, COUNT(*) AS inter
  FROM pairs p
  JOIN sh sa ON sa.doc_id = p.ex_id
  JOIN sh sb ON sb.doc_id = p.inc_id AND sa.h = sb.h
  GROUP BY p.ex_id, p.inc_id
),
verified AS (
  SELECT i.ex_id, i.inc_id,
    CAST(i.inter AS DOUBLE) / CAST(na.n + nb.n - i.inter AS DOUBLE) AS jaccard
  FROM inter i
  JOIN sizes na ON na.doc_id = i.ex_id
  JOIN sizes nb ON nb.doc_id = i.inc_id
  WHERE CAST(i.inter AS DOUBLE) / CAST(na.n + nb.n - i.inter AS DOUBLE)
        >= {INC_JACCARD_THRESHOLD}
),
near AS (
  SELECT inc_id, MIN(ex_id) AS ex_near, MAX(jaccard) AS best_jaccard
  FROM verified GROUP BY inc_id
)
SELECT ih.doc_id,
  e.ex_exact IS NULL AND n.ex_near IS NULL AS keep,
  CASE WHEN e.ex_exact IS NOT NULL THEN 'exact_duplicate'
       WHEN n.ex_near IS NOT NULL THEN 'near_duplicate'
  END AS drop_reason,
  COALESCE(e.ex_exact, n.ex_near) AS matched_doc_id,
  n.best_jaccard
FROM inc_hashed ih
LEFT JOIN ex_hash e ON e.h = ih.h
JOIN inc_canon_ids c ON c.h = ih.h
LEFT JOIN near n ON n.inc_id = c.canon_id
ORDER BY ih.doc_id
"""


# ---------------------------------------------------------------------------
# E69 — SimHash Hamming near-dup pairs (Manku, Jain & Das Sarma, "Detecting
# Near-Duplicates for Web Crawling", WWW 2007): the pigeonhole-banded form
# of Hamming-distance search. Split the SIMHASH_BITS fingerprint into
# SIMHASH_BANDS contiguous blocks; any pair within Hamming distance
# <= SIMHASH_BANDS - 1 agrees EXACTLY on at least one whole block
# (pigeonhole), so block-equality buckets are a lossless candidate
# generator for the <= HAMMING_MAX ball — unlike MinHash banding, which
# is probabilistic. Verification is one bit_count(xor) per candidate.
#
# Canonical-first + LSH_BUCKET_CAP, same as MinHash banding and for the
# same reason: identical docs have identical fingerprints in every block.
#
# Scale: fingerprints are one combinable groupBy(doc_id) over the word
# explode; blocks explode to SIMHASH_BANDS rows/doc; pair expansion runs
# through the same capped per-bucket transform as E3. Width: 48 bits /
# 12-bit blocks — wide enough that no sf0.01 block bucket reaches the
# cap, so the pigeonhole guarantee is EXACT there and test-pinned
# (candidates == the brute-force <=HAMMING_MAX ball); Manku's production
# config (64-bit fingerprints, 16-bit blocks) is the same plan with
# different constants — 64 is avoided here only because bit 63 overflows
# a signed BIGINT identically on neither engine. The registered E5
# 16-bit simhash is unchanged.
# ---------------------------------------------------------------------------

SIMHASH_BITS = 48
SIMHASH_BANDS = 4
SIMHASH_HAMMING_MAX = SIMHASH_BANDS - 1  # pigeonhole-covered radius
_SIM_BLOCK = SIMHASH_BITS // SIMHASH_BANDS


def simhash_candidate_pairs(spark: SparkSession) -> DataFrame:
    sim = _simhash_from(_exact_canonicals(spark.table("documents")), SIMHASH_BITS)
    mask = (1 << _SIM_BLOCK) - 1
    # integer bucket key: block index in the high bits, block value low
    keys = [
        (
            F.lit(b * (1 << _SIM_BLOCK))
            + F.shiftright(F.col("simhash"), b * _SIM_BLOCK).bitwiseAND(
                F.lit(mask)
            )
        ).cast("string")
        for b in range(SIMHASH_BANDS)
    ]
    buckets = sim.select("doc_id", F.explode(F.array(*keys)).alias("bucket"))
    pairs = _pairs_from_buckets(buckets)
    hamming = F.bit_count(
        F.col("sa.simhash").bitwiseXOR(F.col("sb.simhash"))
    ).cast("int")
    return (
        pairs.join(sim.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sim.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= SIMHASH_HAMMING_MAX)
        .orderBy("doc_a", "doc_b")
    )


def oracle_simhash_candidate_pairs() -> str:
    sums = ", ".join(
        f"SUM(((h >> {j}) & 1) * 2 - 1) AS s{j}" for j in range(SIMHASH_BITS)
    )
    simexpr = " + ".join(
        f"CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END"
        for j in range(SIMHASH_BITS)
    )
    mask = (1 << _SIM_BLOCK) - 1
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, CAST({b * (1 << _SIM_BLOCK)} + ((simhash >> "
        f"{b * _SIM_BLOCK}) & {mask}) AS VARCHAR) AS bucket FROM sim"
        for b in range(SIMHASH_BANDS)
    )
    return f"""
WITH canon AS ({_SQL_CANON}),
ex AS (
  SELECT doc_id, {_sql_hash60('w')} AS h
  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM canon) t
),
bs AS (SELECT doc_id, {sums} FROM ex GROUP BY doc_id),
sim AS (SELECT doc_id, CAST({simexpr} AS BIGINT) AS simhash FROM bs),
buckets AS ({band_selects}),
ok AS (
  SELECT bucket FROM buckets
  GROUP BY bucket HAVING COUNT(*) > 1 AND COUNT(*) <= {LSH_BUCKET_CAP}
),
pairs AS (
  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
  FROM buckets l
  JOIN ok o ON o.bucket = l.bucket
  JOIN buckets r ON l.bucket = r.bucket AND l.doc_id < r.doc_id
)
SELECT p.doc_a, p.doc_b,
  CAST(bit_count(xor(sa.simhash, sb.simhash)) AS INT) AS hamming
FROM pairs p
JOIN sim sa ON sa.doc_id = p.doc_a
JOIN sim sb ON sb.doc_id = p.doc_b
WHERE bit_count(xor(sa.simhash, sb.simhash)) <= {SIMHASH_HAMMING_MAX}
ORDER BY p.doc_a, p.doc_b
"""


# ---------------------------------------------------------------------------
# E77 — Bloom-filter dedup pre-screen (the Dolma/CCNet production shape:
# a compact bitset screens each arrival batch BEFORE any expensive join;
# "definitely new" docs skip the exact/near stages entirely). The filter
# is a plain relation: BLOOM_K salted positions per existing-corpus
# content hash, OR-folded into BLOOM_WORDS 32-bit words by a combinable
# bit_or groupBy. Probing is a broadcast join of that (<= BLOOM_WORDS)-row
# bitset against the incoming batch's positions. Everything is integer
# arithmetic (md5-derived positions, pow-of-two masks exact in doubles
# below 2^53) — bit-identical across engines, no RNG.
#
# The screen's contract — NO false negatives (every true duplicate is
# flagged maybe) — is structural: a true dup shares the content hash, so
# all K positions are already set. Test-pinned, plus the observed
# false-positive rate is emitted per doc for audit.
#
# Scale: the bitset relation is O(M/32) rows regardless of corpus size
# (size M to the corpus: m = -n ln p / ln2^2); building it is one
# map-side-combinable bit_or over K rows per existing doc; the probe
# touches only the arrival batch. At 100 TB the filter is still MBs —
# THE asymmetric screen.
# ---------------------------------------------------------------------------

BLOOM_K = 4
BLOOM_BITS = 1 << 16
BLOOM_WORD = 32
BLOOM_WORDS = BLOOM_BITS // BLOOM_WORD


def _bloom_positions(salt_prefix: str = "bloom") -> Column:
    """Array of BLOOM_K bit positions for the current row's normalized
    content."""
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    return F.array(
        *[
            (_hash60(F.concat(F.lit(f"{salt_prefix}{j}:"), norm)) % BLOOM_BITS)
            for j in range(BLOOM_K)
        ]
    )


def _bloom_mask() -> Column:
    return F.pow(F.lit(2.0), (F.col("pos") % BLOOM_WORD).cast("double")).cast("long")


def bloom_bits(existing: DataFrame) -> DataFrame:
    """The filter itself: (w_idx, bits) rows OR-folded from the existing
    corpus — a combinable (and streaming-safe: bit_or is a monotone fold)
    aggregation."""
    return (
        existing.select(F.explode(_bloom_positions()).alias("pos"))
        .select(F.floor(F.col("pos") / BLOOM_WORD).alias("w_idx"), _bloom_mask().alias("m"))
        .groupBy("w_idx")
        .agg(F.bit_or("m").alias("bits"))
    )


def bloom_screen_from_bits(
    bits: DataFrame, existing: DataFrame, incoming: DataFrame
) -> DataFrame:
    """Probe + truth stages over a prebuilt filter relation — shared by
    the batch operator and the streaming twin (whose bits arrive from the
    streaming bit_or state)."""
    mask = _bloom_mask()
    probes = incoming.select(
        "doc_id", F.explode(_bloom_positions()).alias("pos")
    ).select(
        "doc_id",
        F.floor(F.col("pos") / BLOOM_WORD).alias("w_idx"),
        mask.alias("m"),
    )
    present = (
        F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("m")) == F.col("m")
    ).cast("int")
    screened = (
        probes.join(F.broadcast(bits), "w_idx", "left")
        .groupBy("doc_id")
        .agg((F.min(present) == 1).alias("maybe_duplicate"))
    )
    ex_hash = existing.select(_norm_hash().alias("h")).distinct()
    truth = (
        incoming.select("doc_id", _norm_hash().alias("h"))
        .join(ex_hash.withColumn("hit", F.lit(1)), "h", "left")
        .select("doc_id", (F.col("hit") == 1).alias("is_true_duplicate"))
        .na.fill({"is_true_duplicate": False})
    )
    return (
        screened.join(truth, "doc_id")
        .select(
            "doc_id",
            "maybe_duplicate",
            "is_true_duplicate",
            (F.col("maybe_duplicate") & ~F.col("is_true_duplicate")).alias(
                "is_false_positive"
            ),
        )
        .orderBy("doc_id")
    )


def bloom_screen(spark: SparkSession) -> DataFrame:
    docs = spark.table("documents")
    existing = docs.filter(~_inc_is_incoming())
    incoming = docs.filter(_inc_is_incoming())
    return bloom_screen_from_bits(bloom_bits(existing), existing, incoming)


def oracle_bloom_screen() -> str:
    norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    pos_rows = " UNION ALL ".join(
        "SELECT doc_id, ({h}) % {m} AS pos FROM {{side}}".format(
            h=_sql_hash60("'bloom" + str(j) + ":' || " + norm), m=BLOOM_BITS
        )
        for j in range(BLOOM_K)
    )
    return f"""
WITH existing AS (
  SELECT * FROM documents WHERE doc_id % {INC_BATCH_MOD} <> {INC_BATCH_REM}
),
incoming AS (
  SELECT * FROM documents WHERE doc_id % {INC_BATCH_MOD} = {INC_BATCH_REM}
),
ex_pos AS ({pos_rows.format(side='existing')}),
bits AS (
  SELECT CAST(FLOOR(pos / {BLOOM_WORD}.0) AS BIGINT) AS w_idx,
         bit_or(CAST(2 ** (pos % {BLOOM_WORD}) AS BIGINT)) AS bits
  FROM ex_pos GROUP BY 1
),
inc_pos AS ({pos_rows.format(side='incoming')}),
screened AS (
  SELECT p.doc_id,
    MIN(CASE WHEN (COALESCE(b.bits, 0) & CAST(2 ** (p.pos % {BLOOM_WORD}) AS BIGINT))
               = CAST(2 ** (p.pos % {BLOOM_WORD}) AS BIGINT)
         THEN 1 ELSE 0 END) = 1 AS maybe_duplicate
  FROM inc_pos p
  LEFT JOIN bits b ON b.w_idx = CAST(FLOOR(p.pos / {BLOOM_WORD}.0) AS BIGINT)
  GROUP BY p.doc_id
),
truth AS (
  SELECT i.doc_id,
    COALESCE(md5({norm.replace('text', 'i.text')}) IN (
      SELECT md5({norm.replace('text', 'e.text')}) FROM existing e
    ), FALSE) AS is_true_duplicate
  FROM incoming i
)
SELECT s.doc_id, s.maybe_duplicate, t.is_true_duplicate,
  s.maybe_duplicate AND NOT t.is_true_duplicate AS is_false_positive
FROM screened s JOIN truth t USING (doc_id)
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# E78 — novelty curve over arrival batches: what fraction of each crawl
# batch's content has never been seen before it? Grams are the E2 word
# trigrams; a gram's first owner is the earliest batch containing it.
# Per batch: distinct grams appearing, grams appearing for the FIRST
# time, their ratio (the marginal-value curve of continued crawling — the
# number every data-acquisition owner wants before buying the next crawl)
# and the cumulative distinct-gram universe after the batch.
#
# Scale: two combinable aggregates over the exploded gram stream (global
# min-batch per gram, per-batch distinct counts); the cumulative window
# runs over ONE ROW PER BATCH — a bounded gauge relation, so its
# single-partition window is O(#batches), never data-sized.
# ---------------------------------------------------------------------------

NOVELTY_BATCH_SPAN = 100  # doc_ids per arrival batch


def novelty_curve(spark: SparkSession) -> DataFrame:
    from pyspark.sql import Window

    sh = _shingle_hashes(spark.table("documents")).select(
        F.floor(F.col("doc_id") / NOVELTY_BATCH_SPAN).alias("batch"), "h"
    )
    batch_grams = sh.distinct()
    first = batch_grams.groupBy("h").agg(F.min("batch").alias("first_batch"))
    per_batch = batch_grams.groupBy("batch").agg(
        F.count("*").cast("long").alias("n_grams")
    )
    novel = first.groupBy(F.col("first_batch").alias("batch")).agg(
        F.count("*").cast("long").alias("n_novel")
    )
    return _novelty_report(per_batch, novel)


def _novelty_report(per_batch: DataFrame, novel: DataFrame) -> DataFrame:
    """Join + rate + cumulative stage over the two bounded per-batch
    aggregates — shared by the batch operator and the streaming twin."""
    from pyspark.sql import Window

    w = Window.orderBy("batch").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_batch.join(novel, "batch", "left")
        .select(
            "batch",
            "n_grams",
            F.coalesce("n_novel", F.lit(0)).cast("long").alias("n_novel"),
        )
        .withColumn(
            "novelty_rate",
            F.col("n_novel").cast("double") / F.col("n_grams").cast("double"),
        )
        .withColumn("cum_distinct_grams", F.sum("n_novel").over(w).cast("long"))
        .orderBy("batch")
    )


def novelty_from_state(rel: DataFrame) -> DataFrame:
    """E78 report from a streamed (h, first_batch, batch) incidence
    relation (min first-owner fold + per-gram batch set)."""
    per_batch = (
        rel.select("batch", "h")
        .distinct()
        .groupBy("batch")
        .agg(F.count("*").cast("long").alias("n_grams"))
    )
    novel = (
        rel.select("h", "first_batch")
        .distinct()
        .groupBy(F.col("first_batch").alias("batch"))
        .agg(F.count("*").cast("long").alias("n_novel"))
    )
    return _novelty_report(per_batch, novel)


def oracle_novelty_curve() -> str:
    return f"""
WITH sh AS ({_SQL_SHINGLES}),
batch_grams AS (
  SELECT DISTINCT CAST(FLOOR(doc_id / {NOVELTY_BATCH_SPAN}.0) AS BIGINT) AS batch, h
  FROM sh
),
first AS (SELECT h, MIN(batch) AS first_batch FROM batch_grams GROUP BY h),
per_batch AS (
  SELECT batch, CAST(COUNT(*) AS BIGINT) AS n_grams FROM batch_grams GROUP BY batch
),
novel AS (
  SELECT first_batch AS batch, CAST(COUNT(*) AS BIGINT) AS n_novel
  FROM first GROUP BY first_batch
)
SELECT p.batch, p.n_grams,
  CAST(COALESCE(n.n_novel, 0) AS BIGINT) AS n_novel,
  CAST(COALESCE(n.n_novel, 0) AS DOUBLE) / CAST(p.n_grams AS DOUBLE) AS novelty_rate,
  CAST(SUM(COALESCE(n.n_novel, 0)) OVER (ORDER BY p.batch
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_distinct_grams
FROM per_batch p LEFT JOIN novel n USING (batch)
ORDER BY batch
"""


# ---------------------------------------------------------------------------
# E79 — HyperLogLog distinct-gram estimate, built RELATIONALLY (Flajolet
# et al. 2007): bucket = low b bits of the 60-bit gram hash, rho = rank of
# the first set bit in the remaining bits, register = max rho per bucket,
# E = alpha_m * m^2 / sum(2^-reg) with the small-range linear-counting
# correction. No engine sketch object is used (Spark's
# approx_count_distinct and DuckDB's approx sketches differ internally) —
# the registers ARE rows, so both engines compute the identical estimate
# and the oracle is exact. Emitted next to the true distinct count and
# the relative error, which the HLL theory bounds at ~1.04/sqrt(m).
#
# Determinism of the harmonic sum: registers are capped at HLL_RHO_CAP so
# sum(2^(CAP - reg)) is an exact BIGINT fold (max m * 2^CAP < 2^63) — the
# float division happens once, outside any aggregation order.
#
# Scale: the gram stream folds into m=256 register rows via one
# combinable max groupBy — constant state regardless of corpus size; this
# is the sketch a 100 TB pipeline uses to size dedup before running it.
# ---------------------------------------------------------------------------

HLL_B = 8
HLL_M = 1 << HLL_B          # 256 registers
HLL_HASH_BITS = 31          # the gram hashes are h % P31 — 31 usable bits
HLL_RHO_CAP = HLL_HASH_BITS - HLL_B + 1   # 24: w == 0 sentinel rank
# alpha for m >= 128 (Flajolet et al., fig. 3)
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def hll_distinct(spark: SparkSession) -> DataFrame:
    sh = _shingle_hashes(spark.table("documents")).select("h")
    bucket = (F.col("h") % HLL_M).cast("long")
    w = F.floor(F.col("h") / HLL_M).cast("long")
    # rank of the first set bit of w within the top (31 - HLL_B) bits:
    # rho = (31 - b) - floor(log2(w)) for w > 0 (1..23), else the w == 0
    # sentinel rank 24. floor/log2 over exact integers < 2^52 is the same
    # double on both engines.
    rho = F.when(
        F.col("w") > 0,
        F.lit(HLL_HASH_BITS - HLL_B) - F.floor(F.log2(F.col("w").cast("double"))),
    ).otherwise(F.lit(HLL_RHO_CAP)).cast("long")
    regs = (
        sh.select(bucket.alias("bucket"), w.alias("w"))
        .select("bucket", rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("reg"))
    )
    return hll_from_regs(spark, regs)


def hll_from_regs(spark: SparkSession, regs: DataFrame) -> DataFrame:
    """Estimate stage over a (bucket, reg) register relation — shared by
    the batch operator and the streaming twin (max is a monotone fold, so
    streamed registers equal the batch registers)."""
    sh = _shingle_hashes(spark.table("documents")).select("h")
    # exact integer harmonic fold: empty buckets contribute 2^CAP each
    folded = regs.agg(
        F.sum(F.pow(F.lit(2.0), (F.lit(HLL_RHO_CAP) - F.col("reg")).cast("double")).cast("long")).alias("s_nonempty"),
        F.count("*").cast("long").alias("m_nonempty"),
    ).select(
        (
            F.col("s_nonempty")
            + (F.lit(HLL_M) - F.col("m_nonempty")) * F.lit(1 << HLL_RHO_CAP).cast("long")
        ).alias("s_int"),
        (F.lit(HLL_M) - F.col("m_nonempty")).alias("zeros"),
    )
    exact = (
        sh.distinct()
        .agg(F.count("*").cast("long").alias("exact_distinct"))
    )
    raw_e = (
        F.lit(HLL_ALPHA)
        * F.lit(float(HLL_M * HLL_M))
        * F.lit(float(1 << HLL_RHO_CAP))
        / F.col("s_int").cast("double")
    )
    # small-range correction: linear counting when E <= 2.5m and zeros > 0
    lc = F.lit(float(HLL_M)) * F.log(
        F.lit(float(HLL_M)) / F.col("zeros").cast("double")
    )
    est = F.when((raw_e <= 2.5 * HLL_M) & (F.col("zeros") > 0), lc).otherwise(raw_e)
    return (
        folded.crossJoin(F.broadcast(exact))
        .select(
            est.alias("hll_estimate"),
            "exact_distinct",
            (
                (est - F.col("exact_distinct").cast("double"))
                / F.col("exact_distinct").cast("double")
            ).alias("rel_error"),
            F.col("zeros").alias("empty_registers"),
        )
    )


def oracle_hll_distinct() -> str:
    cap2 = 1 << HLL_RHO_CAP
    return f"""
WITH sh AS ({_SQL_SHINGLES}),
ws AS (
  SELECT h % {HLL_M} AS bucket, CAST(FLOOR(h / {HLL_M}.0) AS BIGINT) AS w
  FROM sh
),
rhos AS (
  SELECT bucket,
    CASE WHEN w > 0
      THEN {HLL_HASH_BITS - HLL_B} - CAST(FLOOR(log2(CAST(w AS DOUBLE))) AS BIGINT)
      ELSE {HLL_RHO_CAP} END AS rho
  FROM ws
),
regs AS (SELECT bucket, MAX(rho) AS reg FROM rhos GROUP BY bucket),
folded AS (
  SELECT
    CAST(SUM(CAST(2 ** ({HLL_RHO_CAP} - reg) AS BIGINT)) AS BIGINT)
      + ({HLL_M} - CAST(COUNT(*) AS BIGINT)) * {cap2} AS s_int,
    {HLL_M} - CAST(COUNT(*) AS BIGINT) AS zeros
  FROM regs
),
exact AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_distinct FROM (SELECT DISTINCT h FROM sh)),
est AS (
  SELECT
    CASE WHEN (CAST({HLL_ALPHA} AS DOUBLE) * CAST({float(HLL_M * HLL_M)} AS DOUBLE) * CAST({float(cap2)} AS DOUBLE) / CAST(s_int AS DOUBLE)) <= CAST({2.5 * HLL_M} AS DOUBLE)
          AND zeros > 0
      THEN CAST({float(HLL_M)} AS DOUBLE) * ln(CAST({float(HLL_M)} AS DOUBLE) / CAST(zeros AS DOUBLE))
      ELSE CAST({HLL_ALPHA} AS DOUBLE) * CAST({float(HLL_M * HLL_M)} AS DOUBLE) * CAST({float(cap2)} AS DOUBLE) / CAST(s_int AS DOUBLE)
    END AS hll_estimate,
    zeros
  FROM folded
)
SELECT e.hll_estimate, x.exact_distinct,
  (e.hll_estimate - CAST(x.exact_distinct AS DOUBLE)) / CAST(x.exact_distinct AS DOUBLE) AS rel_error,
  e.zeros AS empty_registers
FROM est e CROSS JOIN exact x
"""


# ---------------------------------------------------------------------------
# E80 — Count-Min sketch heavy hitters (Cormode & Muthukrishnan 2005):
# CMS_D salted hash rows x CMS_W counters fold from the word stream via
# one combinable groupBy (the sketch IS a (row, col, count) relation);
# a word's point estimate is the MIN across its CMS_D counters. The
# sketch's one-sided guarantee — estimate >= true count, overshoot
# bounded by (e/CMS_W) * total mass per row w.h.p. — is test-pinned.
# Emitted for the exact top CMS_TOP_N words so the overshoot is auditable
# next to ground truth.
#
# Scale: sketch state is CMS_D * CMS_W counters regardless of vocabulary
# (the whole point at web scale — heavy-hitter tracking without a
# data-sized groupBy); here the exact side exists only as the audit
# column, computed once over the same stream.
# ---------------------------------------------------------------------------

CMS_D = 4
CMS_W = 1024
CMS_TOP_N = 20


def cms_heavy_hitters(spark: SparkSession) -> DataFrame:
    words = spark.table("documents").select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w")
    )
    rows = []
    for d in range(CMS_D):
        rows.append(
            words.select(
                F.lit(d).alias("d"),
                (_hash60(F.concat(F.lit(f"cms{d}:"), F.col("w"))) % CMS_W).alias("col"),
            )
        )
    pos = rows[0]
    for r in rows[1:]:
        pos = pos.unionByName(r)
    sketch = pos.groupBy("d", "col").agg(F.count("*").cast("long").alias("cnt"))
    return cms_report_from_sketch(spark, sketch)


def cms_report_from_sketch(spark: SparkSession, sketch: DataFrame) -> DataFrame:
    """Point-estimate report over a (d, col, cnt) counter relation —
    shared by the batch operator and the streaming twin (counts are
    additive folds)."""
    words = spark.table("documents").select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w")
    )
    exact = words.groupBy("w").agg(F.count("*").cast("long").alias("true_count"))
    top = exact.orderBy(F.desc("true_count"), F.asc("w")).limit(CMS_TOP_N)
    probes = top.select(
        "w",
        "true_count",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        (
                            _hash60(F.concat(F.lit(f"cms{d}:"), F.col("w"))) % CMS_W
                        ).alias("col"),
                    )
                    for d in range(CMS_D)
                ]
            )
        ).alias("p"),
    ).select("w", "true_count", "p.d", "p.col")
    return (
        probes.join(F.broadcast(sketch), ["d", "col"])
        .groupBy("w", "true_count")
        .agg(F.min("cnt").alias("cms_estimate"))
        .select(
            "w",
            "true_count",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("true_count")).alias("overshoot"),
        )
        .orderBy(F.desc("true_count"), F.asc("w"))
    )


def oracle_cms_heavy_hitters() -> str:
    pos_rows = " UNION ALL ".join(
        "SELECT {d} AS d, ({h}) % {w} AS col FROM words".format(
            d=d, h=_sql_hash60("'cms" + str(d) + ":' || w"), w=CMS_W
        )
        for d in range(CMS_D)
    )
    probe_rows = " UNION ALL ".join(
        "SELECT w, true_count, {d} AS d, ({h}) % {wd} AS col FROM top".format(
            d=d, h=_sql_hash60("'cms" + str(d) + ":' || w"), wd=CMS_W
        )
        for d in range(CMS_D)
    )
    return rf"""
WITH words AS (
  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
  FROM documents
),
pos AS ({pos_rows}),
sketch AS (
  SELECT d, col, CAST(COUNT(*) AS BIGINT) AS cnt FROM pos GROUP BY d, col
),
exact AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS true_count FROM words GROUP BY w),
top AS (
  SELECT w, true_count FROM exact ORDER BY true_count DESC, w ASC LIMIT {CMS_TOP_N}
),
probes AS ({probe_rows})
SELECT p.w, p.true_count, MIN(s.cnt) AS cms_estimate,
  MIN(s.cnt) - p.true_count AS overshoot
FROM probes p JOIN sketch s USING (d, col)
GROUP BY p.w, p.true_count
ORDER BY true_count DESC, w ASC
"""


# ---------------------------------------------------------------------------
# E81 — minhash estimator quality: for every LSH candidate pair, the
# signature-agreement estimate (matching components / K — the unbiased
# minhash Jaccard estimator, Broder 1997) NEXT TO the exact shingle
# Jaccard and the absolute error. This is the table that justifies K=64:
# the estimator's per-pair std is sqrt(J(1-J)/K) <= 1/(2 sqrt(K)), and the
# observed errors should sit inside it (test-pinned) — if K were too
# small, the tuning curve (E61) would be built on noise.
#
# Scale: signatures and candidates ride the shared canonical-first plan;
# the agreement join touches only candidate pairs (bucket-capped), K
# equality checks fold per pair in one projection.
# ---------------------------------------------------------------------------


def minhash_estimate_quality(spark: SparkSession) -> DataFrame:
    sh = _persisted_shingles(spark)
    sig = _signatures_from(sh)
    cand = _candidate_pairs_from(sig)
    exact = ngram_jaccard_pairs(spark, threshold=0.0, cand=cand).select(
        "doc_a", "doc_b", "jaccard"
    )
    matches = sum(
        F.when(F.col(f"a.mh{i}") == F.col(f"b.mh{i}"), 1).otherwise(0)
        for i in range(K)
    )
    est = (
        cand.join(sig.alias("a"), F.col("doc_a") == F.col("a.doc_id"))
        .join(sig.alias("b"), F.col("doc_b") == F.col("b.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            matches.cast("long").alias("matching_components"),
        )
    )
    return (
        est.join(exact, ["doc_a", "doc_b"])
        .select(
            "doc_a",
            "doc_b",
            "matching_components",
            (F.col("matching_components").cast("double") / F.lit(float(K))).alias(
                "est_jaccard"
            ),
            "jaccard",
            F.abs(
                F.col("matching_components").cast("double") / F.lit(float(K))
                - F.col("jaccard")
            ).alias("abs_error"),
        )
        .orderBy("doc_a", "doc_b")
    )


def oracle_minhash_estimate_quality() -> str:
    mins = ", ".join(
        f"MIN((h * CAST({A[i]} AS BIGINT) + {B[i]}) % {P31}) AS mh{i}"
        for i in range(K)
    )
    pairs_inner = oracle_minhash_candidate_pairs().rsplit("ORDER BY", 1)[0]
    match_sum = " + ".join(
        f"CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END" for i in range(K)
    )
    return f"""
WITH cand AS ({pairs_inner}),
sh AS ({_SQL_SHINGLES_CANON}),
sig AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.doc_a
  JOIN sh sb ON sb.doc_id = c.doc_b AND sa.h = sb.h
  GROUP BY c.doc_a, c.doc_b
),
exact AS (
  SELECT i.doc_a, i.doc_b,
    CAST(i.inter AS DOUBLE) / CAST(na.n + nb.n - i.inter AS DOUBLE) AS jaccard
  FROM inter i
  JOIN sizes na ON na.doc_id = i.doc_a
  JOIN sizes nb ON nb.doc_id = i.doc_b
),
est AS (
  SELECT c.doc_a, c.doc_b,
    CAST({match_sum} AS BIGINT) AS matching_components
  FROM cand c
  JOIN sig a ON a.doc_id = c.doc_a
  JOIN sig b ON b.doc_id = c.doc_b
)
SELECT e.doc_a, e.doc_b, e.matching_components,
  CAST(e.matching_components AS DOUBLE) / {float(K)} AS est_jaccard,
  x.jaccard,
  ABS(CAST(e.matching_components AS DOUBLE) / {float(K)} - x.jaccard) AS abs_error
FROM est e JOIN exact x USING (doc_a, doc_b)
ORDER BY doc_a, doc_b
"""


# ---------------------------------------------------------------------------
# E88 — corpus LINE-level exact dedup (the C4/Dolma intra- and inter-doc
# form — Raffel et al. 2020 drop repeated three-sentence spans; Dolma's
# para/line dedup keeps the FIRST occurrence corpus-wide): over the F27
# doc_lines fixture, every line keeps only its earliest occurrence in the
# (doc_id, line_no) total order; later copies are dropped and attributed
# as intra-doc (an earlier line of the SAME document) or cross-doc (an
# earlier document). Complements E28's window-hash span dedup
# (ngram_span_dedup above), which catches near-boundary overlaps this
# exact-line form cannot. Emits the per-doc retained-span audit a
# curation owner reads before shipping the cut.
#
# Scale: ONE shuffle keyed on the line text (the min-over-window is a
# partition-local fold after it), then one doc_id-keyed aggregate. At
# 100 TB the window keys on a 128-bit line hash instead of the raw text
# (narrow shuffle rows); the first-owner rule is the same canonical-first
# discipline the minhash family uses — a flood of identical lines still
# produces exactly one keeper and N-1 attributed drops, never pairs.
# ---------------------------------------------------------------------------

# line_no is 1..8 per doc (F27), so a stride of 1024 makes
# doc_id * stride + line_no a collision-free total-order key.
LINE_POS_STRIDE = 1024


def line_dedup(spark: SparkSession) -> DataFrame:
    pos_key = (F.col("doc_id") * LINE_POS_STRIDE + F.col("line_no")).cast("long")
    keyed = spark.table("doc_lines").select(
        "doc_id",
        "line_no",
        F.length("line_text").cast("long").alias("n_chars"),
        pos_key.alias("pos_key"),
        F.min(pos_key)
        .over(Window.partitionBy("line_text"))
        .alias("first_key"),
    )
    return _line_dedup_report(keyed).orderBy("doc_id")


def line_dedup_from_first_keys(
    spark: SparkSession, first_keys: DataFrame
) -> DataFrame:
    """E88's report stage driven by an externally-folded first-owner state
    (line_text -> MIN pos_key). MIN is a monotone fold, so a streaming
    groupBy state equals the batch window for ANY arrival batching — the
    streaming twin (streaming/doc_stream.py stream_line_dedup) feeds its
    final state through here and shares the batch oracle. Plain key join
    on the line text (the state is O(distinct lines) — corpus-scaled, so
    never force-broadcast; at 100 TB both sides key on a 128-bit line
    hash)."""
    pos_key = (F.col("doc_id") * LINE_POS_STRIDE + F.col("line_no")).cast("long")
    keyed = (
        spark.table("doc_lines")
        .join(first_keys, "line_text")
        .select(
            "doc_id",
            "line_no",
            F.length("line_text").cast("long").alias("n_chars"),
            pos_key.alias("pos_key"),
            "first_key",
        )
    )
    return _line_dedup_report(keyed).orderBy("doc_id")


def _line_dedup_report(keyed: DataFrame) -> DataFrame:
    kept = F.col("pos_key") == F.col("first_key")
    first_doc = F.floor(F.col("first_key") / LINE_POS_STRIDE)
    return (
        keyed.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.sum(F.when(kept, 1).otherwise(0)).cast("long").alias("n_kept"),
            F.sum(F.when(~kept & (first_doc == F.col("doc_id")), 1).otherwise(0))
            .cast("long")
            .alias("n_dropped_intra"),
            F.sum(F.when(~kept & (first_doc != F.col("doc_id")), 1).otherwise(0))
            .cast("long")
            .alias("n_dropped_cross"),
            F.sum(F.when(kept, F.col("n_chars")).otherwise(F.lit(0)))
            .cast("long")
            .alias("kept_chars"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .select(
            "doc_id",
            "n_lines",
            "n_kept",
            "n_dropped_intra",
            "n_dropped_cross",
            "kept_chars",
            "total_chars",
            (F.col("kept_chars").cast("double") / F.col("total_chars")).alias(
                "kept_char_frac"
            ),
        )
    )


def oracle_line_dedup() -> str:
    return f"""
WITH keyed AS (
  SELECT doc_id, line_no,
    CAST(length(line_text) AS BIGINT) AS n_chars,
    CAST(doc_id * {LINE_POS_STRIDE} + line_no AS BIGINT) AS pos_key,
    MIN(CAST(doc_id * {LINE_POS_STRIDE} + line_no AS BIGINT))
      OVER (PARTITION BY line_text) AS first_key
  FROM doc_lines
)
SELECT doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_lines,
  CAST(SUM(CASE WHEN pos_key = first_key THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
  CAST(SUM(CASE WHEN pos_key <> first_key
                 AND CAST(first_key // {LINE_POS_STRIDE} AS BIGINT) = doc_id
            THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped_intra,
  CAST(SUM(CASE WHEN pos_key <> first_key
                 AND CAST(first_key // {LINE_POS_STRIDE} AS BIGINT) <> doc_id
            THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped_cross,
  CAST(SUM(CASE WHEN pos_key = first_key THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars,
  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
  CAST(SUM(CASE WHEN pos_key = first_key THEN n_chars ELSE 0 END) AS DOUBLE)
    / SUM(n_chars) AS kept_char_frac
FROM keyed
GROUP BY doc_id
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# E96 — per-source dedup run report: the summary table every production
# dedup run emits before anyone signs off on dropping 30% of a crawl —
# docs/chars kept per source with the drop-reason breakdown from the E30
# keep-list composition. One extra join (keep-list is keyed on doc_id,
# documents re-partitions onto it) and one groupBy on the low-cardinality
# source key; every upstream stage reuses the already-bucketed E30 plan.
# ---------------------------------------------------------------------------


def dedup_stats(spark: SparkSession) -> DataFrame:
    kl = dedup_keep_list(spark).select("doc_id", "keep", "drop_reason")
    docs = spark.table("documents").select("doc_id", "source", "n_chars")
    j = docs.join(kl, "doc_id")
    b = lambda c: c.cast("long")  # noqa: E731
    agg = j.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        b(F.sum(F.col("keep").cast("long"))).alias("n_kept"),
        b(
            F.sum(F.when(F.col("drop_reason") == "exact_duplicate", 1).otherwise(0))
        ).alias("n_exact_dropped"),
        b(
            F.sum(F.when(F.col("drop_reason") == "near_duplicate", 1).otherwise(0))
        ).alias("n_near_dropped"),
        b(
            F.sum(F.when(F.col("drop_reason") == "span_duplicate", 1).otherwise(0))
        ).alias("n_span_dropped"),
        b(F.sum("n_chars")).alias("total_chars"),
        b(F.sum(F.when(F.col("keep"), F.col("n_chars")).otherwise(0))).alias(
            "kept_chars"
        ),
    )
    return agg.select(
        "source",
        "n_docs",
        "n_kept",
        "n_exact_dropped",
        "n_near_dropped",
        "n_span_dropped",
        "total_chars",
        "kept_chars",
        (F.col("n_kept").cast("double") / F.col("n_docs").cast("double")).alias(
            "keep_rate"
        ),
        (
            F.col("kept_chars").cast("double") / F.col("total_chars").cast("double")
        ).alias("char_keep_rate"),
    ).orderBy("source")


def oracle_dedup_stats() -> str:
    kl = oracle_dedup_keep_list().rsplit("ORDER BY", 1)[0]
    return f"""
WITH kl AS ({kl})
SELECT d.source,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(CASE WHEN kl.keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
  CAST(SUM(CASE WHEN kl.drop_reason = 'exact_duplicate' THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dropped,
  CAST(SUM(CASE WHEN kl.drop_reason = 'near_duplicate' THEN 1 ELSE 0 END) AS BIGINT) AS n_near_dropped,
  CAST(SUM(CASE WHEN kl.drop_reason = 'span_duplicate' THEN 1 ELSE 0 END) AS BIGINT) AS n_span_dropped,
  CAST(SUM(d.n_chars) AS BIGINT) AS total_chars,
  CAST(SUM(CASE WHEN kl.keep THEN d.n_chars ELSE 0 END) AS BIGINT) AS kept_chars,
  CAST(SUM(CASE WHEN kl.keep THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS keep_rate,
  CAST(SUM(CASE WHEN kl.keep THEN d.n_chars ELSE 0 END) AS DOUBLE) / SUM(d.n_chars) AS char_keep_rate
FROM documents d JOIN kl ON kl.doc_id = d.doc_id
GROUP BY d.source
ORDER BY d.source
"""


# ---------------------------------------------------------------------------
# E97 — duplicate-cluster size histogram: the distribution review that
# decides whether a dedup threshold is too loose (a giant snowball cluster)
# or too tight (nothing but 2-cliques). Exact groups come from E1 (one row
# per canonical carries group_size), near-dup clusters from E6 (one row per
# canonical carries cluster_size); both reduce to a bounded (method, size)
# key before the final groupBy, so the histogram aggregation is over at most
# O(distinct sizes) keys regardless of corpus scale.
# ---------------------------------------------------------------------------


def cluster_size_histogram(spark: SparkSession) -> DataFrame:
    exact = (
        exact_dup_groups(spark)
        .filter(F.col("keep") & (F.col("group_size") > 1))
        .select(F.lit("exact").alias("method"), F.col("group_size").alias("size"))
    )
    near = (
        dup_clusters(spark)
        .filter(F.col("is_canonical"))
        .select(F.lit("near").alias("method"), F.col("cluster_size").alias("size"))
    )
    return (
        exact.unionByName(near)
        .groupBy("method", "size")
        .agg(F.count("*").cast("long").alias("n_clusters"))
        .select(
            "method",
            "size",
            "n_clusters",
            (F.col("size") * F.col("n_clusters")).cast("long").alias("docs_covered"),
        )
        .orderBy("method", "size")
    )


def oracle_cluster_size_histogram() -> str:
    exact = oracle_exact_dup_groups().rsplit("ORDER BY", 1)[0]
    near = oracle_dup_clusters().rsplit("ORDER BY", 1)[0]
    return f"""
WITH e AS ({exact}),
n AS ({near}),
sized AS (
  SELECT 'exact' AS method, group_size AS size FROM e
  WHERE keep AND group_size > 1
  UNION ALL
  SELECT 'near' AS method, cluster_size AS size FROM n WHERE is_canonical
)
SELECT method, size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(size * COUNT(*) AS BIGINT) AS docs_covered
FROM sized GROUP BY method, size
ORDER BY method, size
"""


# ---------------------------------------------------------------------------
# E98 — dedup method-agreement matrix: the audit that picks a near-dup
# detector before a 100 TB run. Three pair generators over the SAME
# canonical corpus — MinHash-LSH + exact-Jaccard verify (E4, >=0.5),
# SimHash Hamming pigeonhole (E69, <=3/16 bits), and window-hash
# containment (E31, >=0.8) — are reduced to their flagged pair sets and
# compared pairwise by set-Jaccard. Each generator is already
# bucket-bounded; the comparison itself is one groupBy on (doc_a, doc_b)
# followed by a single global fold to one row, so the matrix adds no
# quadratic stage on top of the generators it audits.
# ---------------------------------------------------------------------------


def dedup_method_agreement(spark: SparkSession) -> DataFrame:
    def tagged(df: DataFrame, m: int) -> DataFrame:
        return df.select(
            "doc_a",
            "doc_b",
            F.lit(1 if m == 0 else 0).alias("mh"),
            F.lit(1 if m == 1 else 0).alias("sh"),
            F.lit(1 if m == 2 else 0).alias("ct"),
        )

    pairs = (
        tagged(ngram_jaccard_pairs(spark), 0)
        .unionByName(tagged(simhash_candidate_pairs(spark), 1))
        .unionByName(
            tagged(ngram_containment_pairs(spark).filter("contained"), 2)
        )
        .groupBy("doc_a", "doc_b")
        .agg(
            F.max("mh").alias("mh"),
            F.max("sh").alias("sh"),
            F.max("ct").alias("ct"),
        )
    )
    folded = pairs.agg(
        F.sum("mh").cast("long").alias("n_minhash"),
        F.sum("sh").cast("long").alias("n_simhash"),
        F.sum("ct").cast("long").alias("n_containment"),
        F.sum(F.col("mh") * F.col("sh")).cast("long").alias("n_mh_sh"),
        F.sum(F.col("mh") * F.col("ct")).cast("long").alias("n_mh_ct"),
        F.sum(F.col("sh") * F.col("ct")).cast("long").alias("n_sh_ct"),
    )

    def agree(both: str, a: str, b: str) -> Column:
        return F.col(both).cast("double") / F.nullif(
            (F.col(a) + F.col(b) - F.col(both)).cast("double"), F.lit(0.0)
        )

    return folded.select(
        "n_minhash",
        "n_simhash",
        "n_containment",
        "n_mh_sh",
        "n_mh_ct",
        "n_sh_ct",
        agree("n_mh_sh", "n_minhash", "n_simhash").alias("agree_mh_sh"),
        agree("n_mh_ct", "n_minhash", "n_containment").alias("agree_mh_ct"),
        agree("n_sh_ct", "n_simhash", "n_containment").alias("agree_sh_ct"),
    )


def oracle_dedup_method_agreement() -> str:
    mh = oracle_ngram_jaccard_pairs().rsplit("ORDER BY", 1)[0]
    sh = oracle_simhash_candidate_pairs().rsplit("ORDER BY", 1)[0]
    ct = oracle_ngram_containment_pairs().rsplit("ORDER BY", 1)[0]
    return f"""
WITH mhp AS ({mh}),
shp AS ({sh}),
ctp AS ({ct}),
tagged AS (
  SELECT doc_a, doc_b, 1 AS mh, 0 AS sh, 0 AS ct FROM mhp
  UNION ALL
  SELECT doc_a, doc_b, 0, 1, 0 FROM shp
  UNION ALL
  SELECT doc_a, doc_b, 0, 0, 1 FROM ctp WHERE contained
),
pairs AS (
  SELECT doc_a, doc_b, MAX(mh) AS mh, MAX(sh) AS sh, MAX(ct) AS ct
  FROM tagged GROUP BY doc_a, doc_b
),
folded AS (
  SELECT CAST(SUM(mh) AS BIGINT) AS n_minhash,
         CAST(SUM(sh) AS BIGINT) AS n_simhash,
         CAST(SUM(ct) AS BIGINT) AS n_containment,
         CAST(SUM(mh * sh) AS BIGINT) AS n_mh_sh,
         CAST(SUM(mh * ct) AS BIGINT) AS n_mh_ct,
         CAST(SUM(sh * ct) AS BIGINT) AS n_sh_ct
  FROM pairs
)
SELECT n_minhash, n_simhash, n_containment, n_mh_sh, n_mh_ct, n_sh_ct,
  CAST(n_mh_sh AS DOUBLE) / nullif(CAST(n_minhash + n_simhash - n_mh_sh AS DOUBLE), 0.0) AS agree_mh_sh,
  CAST(n_mh_ct AS DOUBLE) / nullif(CAST(n_minhash + n_containment - n_mh_ct AS DOUBLE), 0.0) AS agree_mh_ct,
  CAST(n_sh_ct AS DOUBLE) / nullif(CAST(n_simhash + n_containment - n_sh_ct AS DOUBLE), 0.0) AS agree_sh_ct
FROM folded
"""


# ---------------------------------------------------------------------------
# E111 — near-dup THRESHOLD sensitivity sweep: the table a curation owner
# reads before fixing the Jaccard cut for a corpus-scale dedup run ("0.8
# drops 4% of docs, 0.7 drops 11% — which do we ship?"). One unfiltered
# verify pass computes integer (intersection, union) per LSH candidate
# pair; a 5-row threshold dimension then grades every threshold from the
# SAME relation — pair count, docs touched, docs dropped under the greedy
# first-owner rule (a doc drops when it pairs with ANY smaller doc_id —
# the scalable per-threshold proxy; the exact connected-component drop is
# E5's job and would cost one CC run PER threshold), and chars dropped.
#
# Engine exactness: the threshold compare is integer cross-multiplied
# (10 * inter >= t10 * union) — no float boundary; equivalent to
# jaccard >= t10/10 exactly (proof: 0.5-grid doubles are exact).
#
# Scale: the candidate verify is the bucketed E3 plan unchanged; the
# sweep adds one 5x fan-out of the BOUNDED pair relation (|candidates|,
# not |corpus|) and three groupBys on the 5-value threshold key. The
# flagged relation is checkpointed once for its three aggregate
# consumers. All monotone in t by construction (property-pinned).
# ---------------------------------------------------------------------------

SWEEP_T10 = [5, 6, 7, 8, 9]


def dedup_threshold_sweep(spark: SparkSession) -> DataFrame:
    sh = _persisted_shingles(spark)
    cand = _candidate_pairs_from(_signatures_from(sh))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    pc = (
        cand.join(sh.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(
            sh.alias("sb"),
            (F.col("doc_b") == F.col("sb.doc_id")) & (F.col("sa.h") == F.col("sb.h")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("inter"))
        .join(sizes.alias("na"), F.col("doc_a") == F.col("na.doc_id"))
        .join(sizes.alias("nb"), F.col("doc_b") == F.col("nb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            "inter",
            (F.col("na.n") + F.col("nb.n") - F.col("inter")).cast("long").alias("uni"),
        )
    )
    flagged = (
        pc.select(
            "doc_a",
            "doc_b",
            "inter",
            "uni",
            F.explode(F.array(*[F.lit(t) for t in SWEEP_T10])).alias("t10"),
        )
        .filter(10 * F.col("inter") >= F.col("t10") * F.col("uni"))
        .localCheckpoint(eager=False)  # feeds the three threshold aggregates
    )
    base = spark.range(1).select(
        F.explode(F.array(*[F.lit(t) for t in SWEEP_T10])).alias("t10")
    )
    n_pairs = flagged.groupBy("t10").agg(F.count("*").cast("long").alias("n_pairs"))
    docs_flagged = (
        flagged.select("t10", F.explode(F.array("doc_a", "doc_b")).alias("d"))
        .distinct()
        .groupBy("t10")
        .agg(F.count("*").cast("long").alias("n_docs_flagged"))
    )
    dropped = (
        flagged.select("t10", F.col("doc_b").alias("d"))
        .distinct()
        .join(
            spark.table("documents").select(F.col("doc_id").alias("d"), "n_chars"),
            "d",
        )
        .groupBy("t10")
        .agg(
            F.count("*").cast("long").alias("n_docs_dropped"),
            F.sum("n_chars").cast("long").alias("chars_dropped"),
        )
    )
    return (
        base.join(n_pairs, "t10", "left")
        .join(docs_flagged, "t10", "left")
        .join(dropped, "t10", "left")
        .fillna(0, subset=["n_pairs", "n_docs_flagged", "n_docs_dropped", "chars_dropped"])
        .select(
            (F.col("t10").cast("double") / 10.0).alias("threshold"),
            "n_pairs",
            "n_docs_flagged",
            "n_docs_dropped",
            "chars_dropped",
        )
        .orderBy("threshold")
    )


def oracle_dedup_threshold_sweep() -> str:
    pairs_inner = oracle_minhash_candidate_pairs().rsplit("ORDER BY", 1)[0]
    t10_list = ", ".join(str(t) for t in SWEEP_T10)
    return f"""
WITH cand AS ({pairs_inner}),
sh AS ({_SQL_SHINGLES_CANON}),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.doc_a
  JOIN sh sb ON sb.doc_id = c.doc_b AND sa.h = sb.h
  GROUP BY c.doc_a, c.doc_b
),
pc AS (
  SELECT i.doc_a, i.doc_b, CAST(i.inter AS BIGINT) AS inter,
    CAST(na.n + nb.n - i.inter AS BIGINT) AS uni
  FROM inter i
  JOIN sizes na ON na.doc_id = i.doc_a
  JOIN sizes nb ON nb.doc_id = i.doc_b
),
th AS (SELECT unnest([{t10_list}]) AS t10),
flagged AS (
  SELECT t.t10, p.doc_a, p.doc_b, p.inter, p.uni
  FROM pc p CROSS JOIN th t
  WHERE 10 * p.inter >= t.t10 * p.uni
),
np AS (SELECT t10, CAST(COUNT(*) AS BIGINT) AS n_pairs FROM flagged GROUP BY t10),
dfl AS (
  SELECT t10, CAST(COUNT(*) AS BIGINT) AS n_docs_flagged
  FROM (
    SELECT DISTINCT t10, d FROM (
      SELECT t10, doc_a AS d FROM flagged
      UNION ALL SELECT t10, doc_b AS d FROM flagged
    )
  ) GROUP BY t10
),
dr AS (
  SELECT f.t10, CAST(COUNT(*) AS BIGINT) AS n_docs_dropped,
    CAST(SUM(d.n_chars) AS BIGINT) AS chars_dropped
  FROM (SELECT DISTINCT t10, doc_b FROM flagged) f
  JOIN documents d ON d.doc_id = f.doc_b
  GROUP BY f.t10
)
SELECT CAST(t.t10 AS DOUBLE) / 10.0 AS threshold,
  COALESCE(np.n_pairs, 0) AS n_pairs,
  COALESCE(dfl.n_docs_flagged, 0) AS n_docs_flagged,
  COALESCE(dr.n_docs_dropped, 0) AS n_docs_dropped,
  COALESCE(dr.chars_dropped, 0) AS chars_dropped
FROM th t
LEFT JOIN np ON np.t10 = t.t10
LEFT JOIN dfl ON dfl.t10 = t.t10
LEFT JOIN dr ON dr.t10 = t.t10
ORDER BY threshold
"""


# ---------------------------------------------------------------------------
# E120 — duplicate n-gram fraction (the Dolma/RefinedWeb corpus-health
# metric read BEFORE deciding how aggressive span/line dedup must be: what
# fraction of each source's n-gram mass is text shared with at least one
# other document). Rides the exact shared shingle machinery (per-doc
# DISTINCT SHINGLE-gram (word trigram) hashes — _shingle_hashes /
# _SQL_SHINGLES, the same
# relation MinHash and the span stages consume), so "incidence" means a
# (doc, distinct-ngram) pair and nd = number of documents carrying the
# ngram corpus-wide. Computed on the RAW corpus (exact-dup floods included
# on purpose — this is the pre-dedup audit number; the post-dedup rerun is
# one `docs=` argument away).
#
# Scale: one explode + one groupBy(source, h) on the shingle relation, a
# second (much smaller) groupBy(h) over that fold, one co-partitioned join
# on h, and a bounded groupBy(source). Everything is linear in the corpus
# shingle count — no pair expansion at any duplication level (the x1000
# stress flood just makes nd large for its shingles).
# ---------------------------------------------------------------------------


def dup_ngram_fraction(spark: SparkSession, docs: DataFrame | None = None) -> DataFrame:
    docs = spark.table("documents") if docs is None else docs
    # checkpoint the folded counts (r12 optimization): the report stage
    # consumes this relation twice (the corpus-wide margin and the join
    # back onto it), which re-ran the shingle explode per consumer; the
    # streaming twin's memory-sink state is already materialized
    per_src_h = (
        _shingle_hashes(docs, carry=("source",))
        .groupBy("source", "h")
        .agg(F.count("*").cast("long").alias("n_inc"))
        .localCheckpoint(eager=False)
    )
    return dup_ngram_from_counts(per_src_h)


def dup_ngram_from_counts(per_src_h: DataFrame) -> DataFrame:
    """Report stage over the additive (source, h, n_inc) fold — shared by
    the batch form and the ST31 streaming twin. The corpus-wide margin is
    a derivation of the SAME relation joined back onto it, so it carries
    renamed columns (the memory-sink self-join discipline — a bare
    self-join of a streaming memory sink fails analysis)."""
    per_h = (
        per_src_h.select(F.col("h").alias("ph_h"), F.col("n_inc").alias("ph_inc"))
        .groupBy("ph_h")
        .agg(F.sum("ph_inc").cast("long").alias("nd"))
    )
    dup_inc = F.sum(F.when(F.col("nd") >= 2, F.col("n_inc")).otherwise(0)).cast(
        "long"
    )
    return (
        per_src_h.join(per_h, F.col("h") == F.col("ph_h"))
        .groupBy("source")
        .agg(
            F.sum("n_inc").cast("long").alias("n_incidences"),
            dup_inc.alias("n_dup_incidences"),
            F.count("*").cast("long").alias("n_distinct_ngrams"),
        )
        .select(
            "source",
            "n_incidences",
            "n_dup_incidences",
            "n_distinct_ngrams",
            (
                F.col("n_dup_incidences").cast("double")
                / F.col("n_incidences").cast("double")
            ).alias("dup_frac"),
        )
        .orderBy("source")
    )


def oracle_dup_ngram_fraction() -> str:
    return f"""
WITH sh AS ({_SQL_SHINGLES}),
incid AS (
  SELECT s.doc_id, d.source, s.h
  FROM sh s JOIN documents d USING (doc_id)
),
psh AS (
  SELECT source, h, CAST(COUNT(*) AS BIGINT) AS n_inc
  FROM incid GROUP BY source, h
),
ph AS (SELECT h, CAST(SUM(n_inc) AS BIGINT) AS nd FROM psh GROUP BY h)
SELECT p.source,
  CAST(SUM(p.n_inc) AS BIGINT) AS n_incidences,
  CAST(SUM(CASE WHEN ph.nd >= 2 THEN p.n_inc ELSE 0 END) AS BIGINT)
    AS n_dup_incidences,
  CAST(COUNT(*) AS BIGINT) AS n_distinct_ngrams,
  CAST(SUM(CASE WHEN ph.nd >= 2 THEN p.n_inc ELSE 0 END) AS DOUBLE)
    / CAST(SUM(p.n_inc) AS DOUBLE) AS dup_frac
FROM psh p JOIN ph USING (h)
GROUP BY p.source
ORDER BY p.source
"""


# ---------------------------------------------------------------------------
# E132 — recall gate for the INCREMENTAL near screen (the E105/E131
# discipline applied to E68's cross-side LSH blocking): exact Jaccard
# truth for a bounded probe set of INCOMING canonicals against every
# EXISTING canonical, vs the pairs the banded cross-side bucket stage
# (with its LSH_BUCKET_CAP) actually reaches, at the E73 thresholds.
# Truth and reached are both over canonical pairs — non-canonical
# incoming docs inherit their canonical's verdict in E68, so canonical
# recall IS the screen's recall. The number read before trusting the
# arrival screen's banding at a new scale; the bucket cap and the
# incoming batch's band collisions are what it prices.
# ---------------------------------------------------------------------------


def incremental_dedup_recall(
    spark: SparkSession, docs: DataFrame | None = None
) -> DataFrame:
    from collector_spark.ml.vectors import RECALL_PROBE_N

    docs = spark.table("documents") if docs is None else docs
    existing = docs.filter(~_inc_is_incoming())
    incoming = docs.filter(_inc_is_incoming())
    union_canon = (
        _exact_canonicals(existing)
        .select("doc_id", "text")
        .unionByName(_exact_canonicals(incoming).select("doc_id", "text"))
        .localCheckpoint(eager=False)
    )
    sh = _shingle_hashes(union_canon).localCheckpoint(eager=False)

    probe_ids = (
        sh.filter(_inc_is_incoming())
        .select("doc_id")
        .distinct()
        .orderBy("doc_id")
        .limit(RECALL_PROBE_N)
    )
    ptf = sh.join(F.broadcast(probe_ids), "doc_id").select(
        F.col("doc_id").alias("inc_id"), "h"
    )
    inter = (
        sh.filter(~_inc_is_incoming())
        .join(F.broadcast(ptf), "h")
        .groupBy(F.col("doc_id").alias("ex_id"), "inc_id")
        .agg(F.count("*").cast("long").alias("inter"))
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").cast("long").alias("n"))

    # reached: the SAME cross-side banded bucket stage E68 runs
    buckets = _band_buckets(_signatures_from(sh)).withColumn(
        "inc", _inc_is_incoming()
    )
    grouped = buckets.groupBy("bucket").agg(
        F.sort_array(
            F.collect_list(F.when(~F.col("inc"), F.col("doc_id")))
        ).alias("ex_ids"),
        F.sort_array(
            F.collect_list(F.when(F.col("inc"), F.col("doc_id")))
        ).alias("inc_ids"),
    )
    reached = (
        grouped.filter(
            (F.size("ex_ids") > 0)
            & (F.size("inc_ids") > 0)
            & (F.size("ex_ids") + F.size("inc_ids") <= LSH_BUCKET_CAP)
        )
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ex_ids, a -> transform(inc_ids, "
                    "b -> struct(a AS ex_id, b AS inc_id))))"
                )
            ).alias("p")
        )
        .select("p.ex_id", "p.inc_id")
        .distinct()
        .withColumn("reached", F.lit(1))
    )

    jac = F.col("inter").cast("double") / (
        F.col("na.n") + F.col("nb.n") - F.col("inter")
    ).cast("double")
    flagged = (
        inter.join(sizes.alias("na"), F.col("ex_id") == F.col("na.doc_id"))
        .join(sizes.alias("nb"), F.col("inc_id") == F.col("nb.doc_id"))
        .select("ex_id", "inc_id", jac.alias("jaccard"))
        .join(reached, ["ex_id", "inc_id"], "left")
        .select(
            "jaccard", F.coalesce(F.col("reached"), F.lit(0)).alias("reached")
        )
        .localCheckpoint(eager=False)
    )
    rows = []
    for t in RECALL_THRESHOLDS:
        rows.append(
            flagged.filter(F.col("jaccard") >= t)
            .agg(
                F.count("*").cast("long").alias("n_truth"),
                F.sum("reached").cast("long").alias("n_reached"),
            )
            .select(
                F.lit(t).alias("threshold"),
                "n_truth",
                "n_reached",
                (
                    F.col("n_reached").cast("double")
                    / F.col("n_truth").cast("double")
                ).alias("recall"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("threshold")


def oracle_incremental_dedup_recall() -> str:
    from collector_spark.ml.vectors import RECALL_PROBE_N

    mins = ", ".join(
        f"MIN((h * CAST({A[i]} AS BIGINT) + {B[i]}) % {P31}) AS mh{i}"
        for i in range(K)
    )
    band_selects = []
    for b, (name, cols) in enumerate(_band_cols()):
        concat = " || ',' || ".join(
            [f"'{b}'"] + [f"CAST({c} AS VARCHAR)" for c in cols]
        )
        band_selects.append(
            f"SELECT doc_id, md5({concat}) AS bucket, "
            f"doc_id % {INC_BATCH_MOD} = {INC_BATCH_REM} AS inc FROM sig"
        )
    buckets = " UNION ALL ".join(band_selects)
    canon_ex = _SQL_CANON.replace("FROM documents d", "FROM existing d")
    canon_inc = _SQL_CANON.replace("FROM documents d", "FROM incoming d")
    shingles = _SQL_SHINGLES.replace("FROM documents", "FROM union_canon")
    branches = []
    for t in RECALL_THRESHOLDS:
        branches.append(f"""
SELECT {t} AS threshold,
  CAST(COUNT(*) AS BIGINT) AS n_truth,
  CAST(SUM(reached) AS BIGINT) AS n_reached,
  CAST(SUM(reached) AS DOUBLE) / COUNT(*) AS recall
FROM flagged WHERE jaccard >= {t}""")
    union = " UNION ALL ".join(branches)
    return f"""
WITH existing AS (
  SELECT * FROM documents WHERE doc_id % {INC_BATCH_MOD} <> {INC_BATCH_REM}
),
incoming AS (
  SELECT * FROM documents WHERE doc_id % {INC_BATCH_MOD} = {INC_BATCH_REM}
),
union_canon AS (
  SELECT doc_id, text FROM ({canon_ex}) ec
  UNION ALL
  SELECT doc_id, text FROM ({canon_inc}) ic
),
sh AS ({shingles}),
probes AS (
  SELECT DISTINCT doc_id FROM sh
  WHERE doc_id % {INC_BATCH_MOD} = {INC_BATCH_REM}
  ORDER BY doc_id LIMIT {RECALL_PROBE_N}
),
inter AS (
  SELECT e.doc_id AS ex_id, i.doc_id AS inc_id, CAST(COUNT(*) AS BIGINT) AS inter
  FROM sh e
  JOIN sh i ON i.h = e.h AND i.doc_id % {INC_BATCH_MOD} = {INC_BATCH_REM}
  JOIN probes p ON p.doc_id = i.doc_id
  WHERE e.doc_id % {INC_BATCH_MOD} <> {INC_BATCH_REM}
  GROUP BY e.doc_id, i.doc_id
),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
sig AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
buckets AS ({buckets}),
ok AS (
  SELECT bucket FROM buckets
  GROUP BY bucket
  HAVING COUNT(*) <= {LSH_BUCKET_CAP}
     AND SUM(CASE WHEN inc THEN 1 ELSE 0 END) >= 1
     AND SUM(CASE WHEN inc THEN 0 ELSE 1 END) >= 1
),
pairs AS (
  SELECT DISTINCT e.doc_id AS ex_id, i.doc_id AS inc_id
  FROM buckets e
  JOIN ok o ON o.bucket = e.bucket
  JOIN buckets i ON i.bucket = e.bucket AND i.inc AND NOT e.inc
),
flagged AS (
  SELECT CAST(x.inter AS DOUBLE) / CAST(na.n + nb.n - x.inter AS DOUBLE) AS jaccard,
    CASE WHEN pr.ex_id IS NOT NULL THEN 1 ELSE 0 END AS reached
  FROM inter x
  JOIN sizes na ON na.doc_id = x.ex_id
  JOIN sizes nb ON nb.doc_id = x.inc_id
  LEFT JOIN pairs pr ON pr.ex_id = x.ex_id AND pr.inc_id = x.inc_id
)
{union}
ORDER BY threshold
"""
