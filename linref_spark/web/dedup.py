"""Deduplication operators for web-scale document tables.

Each dedup family is a pure DataFrame transform over (doc_id, text):

- exact:       hash-groupBy on md5(text), keep lowest doc_id;
- minhash LSH: word-shingle -> k min-hashes -> band buckets -> bucket
  self-join -> candidate pairs (verify with true Jaccard);
- simhash:     64-bit sign-aggregated token hashes; near-dups share the
  same value in >= 1 of 4 16-bit bands (hamming <= 3 guarantee);
- ngram Jaccard: exact similarity join via shared-shingle inverted index
  (|intersection| from a groupBy, |union| from token counts);
- embedding near-dup: cosine >= threshold via the ANN module.

Scale notes: every stage is explode -> groupBy/join on a hash key — the
classic shuffle-bound pipeline. Band buckets bound candidate-pair fan-out;
a `max_bucket` guard drops degenerate buckets (all-identical boilerplate)
the way production CC pipelines do. The caps make results APPROXIMATE on
degenerate content: recall loss is auditable via the companion
``*_drop_metrics`` functions (pairs functions stay pure transforms; the
metrics run the same bucket/posting aggregation and report what the cap
would drop).

Hashing: ``hash_name="xxhash64"`` (default — Spark built-in, seedable,
64-bit, the fast production path) or ``hash_name="md5long"`` — the top 60
bits of ``md5(f"{seed}:{value}")`` as a positive long. md5long costs more
CPU but is reproducible on ANY engine with an md5 function (DuckDB:
``CAST('0x' || substr(md5(seed || ':' || v), 1, 15) AS BIGINT)``), which
is what lets the driver's correctness gate value-hash the minhash/simhash
queries against a SQL oracle instead of a rows-only check.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HASH_NAMES = ("xxhash64", "md5long")


def _hash64(col: Column, seed: int, hash_name: str) -> Column:
    """Seeded 64-bit (60-bit for md5long) integer hash of a string column."""
    if hash_name == "xxhash64":
        return F.xxhash64(col, F.lit(seed))
    if hash_name == "md5long":
        h = F.md5(F.concat_ws(":", F.lit(str(seed)), col))
        return F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
    raise ValueError(f"hash_name must be one of {HASH_NAMES}")


def _derived_hashes(col: Column, n: int, hash_name: str) -> list[Column]:
    """n seeded 64-bit hashes of a string column.

    xxhash64: ONE hash of the (variable-length) string + (n-1) seeded
    xxhash64 hashes of that fixed 8-byte long — the standard minhash
    construction (one universal hash, derived family). The derived hashes
    cost a constant handful of multiplies each instead of a full pass
    over the string, so the hot explode does ~n-times less hashing work.
    (Raw splitmix-style long arithmetic would be cheaper still but
    overflows under ANSI mode; xxhash64-over-long wraps internally.)
    md5long keeps the per-seed md5 (the oracle replays it verbatim).
    """
    if hash_name != "xxhash64":
        return [_hash64(col, i, hash_name) for i in range(n)]
    base = F.xxhash64(col)
    return [base if i == 0 else F.xxhash64(base, F.lit(i)) for i in range(n)]


def dedup_exact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one row per distinct text (lowest id wins) — hash-groupBy dedup."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def exact_dup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, canonical_id, text_hash): canonical = lowest id with same text."""
    h = F.md5(F.col(text_col))
    w = Window.partitionBy(h)
    return df.select(
        F.col(id_col),
        h.alias("text_hash"),
        F.min(F.col(id_col)).over(w).alias("canonical_id"),
    )


def _shingles(text_col: str, k: int = 3) -> Column:
    """Word k-gram shingle array (distinct), whitespace tokenized."""
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(n - k, F.lit(0))),
        lambda i: F.concat_ws(
            " ", *[F.get(toks, i + j) for j in range(k)]
        ),
    )
    return F.array_distinct(F.when(n >= k, grams).otherwise(F.array(F.col(text_col))))


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_k: int = 3,
    hash_name: str = "xxhash64",
) -> DataFrame:
    """(id, sig: array<bigint>) — min over shingles of hash(shingle, seed_i).

    One explode + one groupBy; the per-seed mins are a single aggregation
    pass (no per-hash shuffle). ``hash_name="md5long"`` swaps the hash
    family for the cross-engine-reproducible one (module docstring).
    """
    if hash_name == "xxhash64":
        # fast path: hash each token ONCE, derive gram hashes from the
        # token-hash triples (no gram-string construction on the hot
        # explode), then num_hashes cheap long-hash derivations. Same
        # minhash guarantees, different (still uniform) hash family.
        toks = F.split(F.col(text_col), " ")
        tok_h = F.transform(toks, lambda t: F.xxhash64(t))
        n = F.size(toks)
        grams = F.transform(
            F.sequence(F.lit(0), F.greatest(n - shingle_k, F.lit(0))),
            lambda i: F.xxhash64(
                *[F.get(tok_h, i + j) for j in range(shingle_k)]
            ),
        )
        gram_h = F.when(n >= shingle_k, grams).otherwise(
            F.array(F.xxhash64(F.col(text_col)))
        )
        ex = df.select(
            F.col(id_col).alias("_id"),
            F.explode(F.array_distinct(gram_h)).alias("_gh"),
        )
        aggs = [
            F.min(
                F.col("_gh") if i == 0 else F.xxhash64(F.col("_gh"), F.lit(i))
            ).alias(f"_h{i}")
            for i in range(num_hashes)
        ]
    else:
        ex = df.select(
            F.col(id_col).alias("_id"),
            F.explode(_shingles(text_col, shingle_k)).alias("_sh"),
        )
        hashes = _derived_hashes(F.col("_sh"), num_hashes, hash_name)
        aggs = [F.min(h).alias(f"_h{i}") for i, h in enumerate(hashes)]
    sig = ex.groupBy("_id").agg(*aggs)
    return sig.select(
        F.col("_id").alias(id_col),
        F.array(*[F.col(f"_h{i}") for i in range(num_hashes)]).alias("sig"),
    )


def _minhash_buckets(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int,
    bands: int,
    shingle_k: int,
    hash_name: str = "xxhash64",
) -> DataFrame:
    """(_id, _band, _bucket) rows: one per doc per band."""
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    rows = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, num_hashes, shingle_k, hash_name)
    band_arr = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        ",", *[F.col("sig")[b * rows + r].cast("string") for r in range(rows)]
                    )
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    buckets = sig.select(F.col(id_col).alias("_id"), F.explode(band_arr).alias("_b"))
    return buckets.select(
        "_id", F.col("_b.band").alias("_band"), F.col("_b.bucket").alias("_bucket")
    )


def bucket_drop_metrics(
    buckets: DataFrame, max_bucket: int, band_col: str = "_band",
    bucket_col: str = "_bucket",
) -> DataFrame:
    """Per-band audit of a bucket cap: (band, n_buckets, n_dropped_buckets,
    n_dropped_rows). Shared by the minhash and simhash metrics."""
    sizes = buckets.groupBy(band_col, bucket_col).agg(F.count("*").alias("_n"))
    return sizes.groupBy(band_col).agg(
        F.count("*").alias("n_buckets"),
        F.sum((F.col("_n") > max_bucket).cast("long")).alias("n_dropped_buckets"),
        F.sum(
            F.when(F.col("_n") > max_bucket, F.col("_n")).otherwise(F.lit(0))
        ).alias("n_dropped_rows"),
    ).withColumnRenamed(band_col, "band")


def minhash_drop_metrics(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    max_bucket: int = 1000,
    hash_name: str = "xxhash64",
) -> DataFrame:
    """What :func:`minhash_lsh_pairs` drops under the same parameters."""
    b = _minhash_buckets(df, text_col, id_col, num_hashes, bands, shingle_k, hash_name)
    return bucket_drop_metrics(b, max_bucket)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    max_bucket: int = 1000,
    hash_name: str = "xxhash64",
) -> DataFrame:
    """Candidate near-duplicate pairs (a < b) via banded minhash LSH.

    rows = num_hashes / bands per band; docs agreeing on any full band
    bucket together. Buckets larger than ``max_bucket`` are dropped (guard
    against boilerplate floods); at 100 TB this guard is what keeps the
    bucket self-join from going quadratic on degenerate content. Audit the
    recall cost with :func:`minhash_drop_metrics` (same parameters).
    """
    from linref_spark.events.frame import materialize

    # One (id, band, bucket) row per doc per band — tiny next to the
    # shingle-explode signature pipeline that produces it. The plan uses it
    # FOUR times (sizes, pruned, and both sides of the self-join), and the
    # subtrees canonicalize differently (pushed filters), so without
    # pinning, the whole explode + groupBy signature pass runs 4x.
    buckets = materialize(
        _minhash_buckets(
            df, text_col, id_col, num_hashes, bands, shingle_k, hash_name
        )
    )
    sizes = buckets.groupBy("_band", "_bucket").agg(F.count("*").alias("_n"))
    ok = sizes.where(F.col("_n") <= max_bucket).drop("_n")
    pruned = buckets.join(F.broadcast(ok), on=["_band", "_bucket"], how="inner")
    left = pruned.select("_band", "_bucket", F.col("_id").alias("a"))
    right = pruned.select("_band", "_bucket", F.col("_id").alias("b"))
    pairs = left.join(right, on=["_band", "_bucket"]).where(F.col("a") < F.col("b"))
    return pairs.select("a", "b").distinct()


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.8,
    max_posting: int = 2000,
) -> DataFrame:
    """N-gram Jaccard similarity join: pairs (a, b, jaccard >= t).

    Inverted-index pattern: explode distinct shingles, self-join on shingle
    (posting lists capped at ``max_posting``), count shared shingles per
    pair, then jaccard = shared / (|A| + |B| - shared).

    EXACT up to the posting cap: shingles appearing in more than
    ``max_posting`` docs are excluded from the intersection count (but
    still count toward |A|/|B|), so jaccard is *underestimated* for pairs
    sharing very popular shingles. Audit the number of capped shingles and
    affected rows with :func:`ngram_posting_drop_metrics`.
    """
    from linref_spark.events.frame import materialize

    # the exploded posting table feeds FOUR consumers (doc sizes, posting
    # sizes, both self-join sides) — pin it so the shingle explode runs once
    sh = materialize(
        df.select(
            F.col(id_col).alias("_id"),
            F.explode(_shingles(text_col, shingle_k)).alias("_sh"),
        )
    )
    sizes = sh.groupBy("_id").agg(F.count("*").alias("_sz"))
    posting_sz = sh.groupBy("_sh").agg(F.count("*").alias("_p"))
    sh2 = sh.join(
        F.broadcast(posting_sz.where(F.col("_p") <= max_posting).drop("_p")),
        on="_sh", how="inner",
    )
    pairs = (
        sh2.alias("x")
        .join(sh2.alias("y"), on="_sh")
        .where(F.col("x._id") < F.col("y._id"))
        .groupBy(F.col("x._id").alias("a"), F.col("y._id").alias("b"))
        .agg(F.count("*").alias("_shared"))
    )
    sa = sizes.select(F.col("_id").alias("a"), F.col("_sz").alias("_sa"))
    sb = sizes.select(F.col("_id").alias("b"), F.col("_sz").alias("_sb"))
    # NOTE: capped shingles were removed from sh2 (intersection counts) but
    # remain in sizes (|A|, |B|) — jaccard is a lower bound for docs
    # containing >max_posting-popular shingles; ngram_posting_drop_metrics
    # reports the capped shingle count
    out = (
        pairs.join(sa, on="a").join(sb, on="b")
        .withColumn(
            "jaccard",
            F.col("_shared").cast("double")
            / (F.col("_sa") + F.col("_sb") - F.col("_shared")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )
    return out


def ngram_posting_drop_metrics(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    max_posting: int = 2000,
) -> DataFrame:
    """What :func:`ngram_jaccard_pairs` excludes under the same posting cap:
    one row — (n_shingles, n_capped_shingles, n_capped_postings)."""
    sh = df.select(
        F.col(id_col).alias("_id"),
        F.explode(_shingles(text_col, shingle_k)).alias("_sh"),
    )
    posting_sz = sh.groupBy("_sh").agg(F.count("*").alias("_p"))
    return posting_sz.agg(
        F.count("*").alias("n_shingles"),
        F.sum((F.col("_p") > max_posting).cast("long")).alias("n_capped_shingles"),
        F.sum(
            F.when(F.col("_p") > max_posting, F.col("_p")).otherwise(F.lit(0))
        ).alias("n_capped_postings"),
    )


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    hash_name: str = "xxhash64",
) -> DataFrame:
    """64-bit SimHash over whitespace tokens (sign of per-bit vote sums).

    Pure expressions: explode tokens, per-bit +1/-1 votes from the token
    hash bits, sum, sign -> packed bigint. One explode + one groupBy.
    ``hash_name="md5long"`` uses the cross-engine hash (60 usable bits, so
    the simhash is 60-bit; pass the same ``hash_name`` to
    :func:`simhash_band_pairs` / :func:`simhash_drop_metrics` so band
    derivation matches — they default to xxhash64 like this function).
    """
    n_bits = 64 if hash_name == "xxhash64" else 60
    ex = df.select(
        F.col(id_col).alias("_id"), F.explode(F.split(F.col(text_col), " ")).alias("_t")
    )
    h = _hash64(F.col("_t"), 0, hash_name) if hash_name != "xxhash64" else F.xxhash64(F.col("_t"))
    aggs = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"_b{i}")
        for i in range(n_bits)
    ]
    votes = ex.groupBy("_id").agg(*aggs)
    packed = F.lit(0).cast("long")
    for i in range(n_bits):
        bit = F.when(F.col(f"_b{i}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        packed = packed.bitwiseOR(F.shiftleft(bit, i))
    return votes.select(F.col("_id").alias(id_col), packed.alias("simhash"))


def _simhash_buckets(
    df: DataFrame, text_col: str, id_col: str, hash_name: str = "xxhash64"
) -> DataFrame:
    # Band width follows the signature width: 4x16 bits for the 64-bit
    # xxhash64 family, 4x15 bits for the 60-bit cross-engine md5long family,
    # so hamming<=3 pigeonhole coverage holds for either signature.
    sh = simhash(df, text_col, id_col, hash_name)
    n_bits = 64 if hash_name == "xxhash64" else 60
    width = n_bits // 4
    mask = (1 << width) - 1
    band_arr = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("simhash"), width * b)
                .bitwiseAND(F.lit(mask))
                .alias("bucket"),
            )
            for b in range(4)
        ]
    )
    buckets = sh.select(F.col(id_col).alias("_id"), F.explode(band_arr).alias("_b"))
    return buckets.select(
        "_id", F.col("_b.band").alias("_band"), F.col("_b.bucket").alias("_bucket")
    )


def simhash_drop_metrics(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    max_bucket: int = 1000, hash_name: str = "xxhash64",
) -> DataFrame:
    """What :func:`simhash_band_pairs` drops under the same cap."""
    return bucket_drop_metrics(
        _simhash_buckets(df, text_col, id_col, hash_name), max_bucket
    )


def simhash_band_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    max_bucket: int = 1000, hash_name: str = "xxhash64",
) -> DataFrame:
    """Near-dup candidates: docs sharing any simhash band (4 bands of
    16 bits for xxhash64, 15 bits for md5long — catches all pairs with
    hamming distance <= 3 by pigeonhole). Buckets above ``max_bucket`` are
    dropped — audit with :func:`simhash_drop_metrics` (same ``hash_name``)."""
    from linref_spark.events.frame import materialize

    # pinned for the same reason as minhash_lsh_pairs: the 64-vote simhash
    # aggregation would otherwise re-run for sizes and both self-join sides
    buckets = materialize(_simhash_buckets(df, text_col, id_col, hash_name))
    sizes = buckets.groupBy("_band", "_bucket").agg(F.count("*").alias("_n"))
    ok = sizes.where(F.col("_n") <= max_bucket).drop("_n")
    pruned = buckets.join(F.broadcast(ok), on=["_band", "_bucket"], how="inner")
    pairs = (
        pruned.select("_band", "_bucket", F.col("_id").alias("a"))
        .join(pruned.select("_band", "_bucket", F.col("_id").alias("b")),
              on=["_band", "_bucket"])
        .where(F.col("a") < F.col("b"))
    )
    return pairs.select("a", "b").distinct()


def near_dup_labels(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    max_bucket: int = 1000,
    jaccard_threshold: float | None = None,
    hash_name: str = "xxhash64",
    out_col: str = "canonical_id",
) -> DataFrame:
    """Bare near-dup label table (id_col, out_col): minhash-LSH candidates
    (optionally verified by true n-gram Jaccard >= ``jaccard_threshold``)
    -> connected components -> each doc id mapped to its cluster's lowest
    doc id. Use :func:`near_dup_groups` for the labeled full frame.

    Scale: candidate generation is the capped banded self-join
    (:func:`minhash_lsh_pairs`); components run in the DataFrame-native
    iterative CC (:func:`linref_spark.spatial.cluster.connected_components`,
    O(log n) rounds over the pair edges, lineage truncated per round).
    """
    from linref_spark.spatial.cluster import connected_components

    pairs = minhash_lsh_pairs(
        df, text_col, id_col, num_hashes, bands, shingle_k, max_bucket,
        hash_name,
    )
    if jaccard_threshold is not None:
        verified = ngram_jaccard_pairs(
            df, text_col, id_col, shingle_k, threshold=jaccard_threshold,
        ).select("a", "b")
        pairs = pairs.join(verified, on=["a", "b"], how="inner")
    nodes = df.select(F.col(id_col))
    labeled = connected_components(
        pairs, nodes, node_col=id_col, src_col="a", dst_col="b",
        out_col=out_col,
    )
    return labeled


def near_dup_groups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    max_bucket: int = 1000,
    jaccard_threshold: float | None = None,
    hash_name: str = "xxhash64",
    out_col: str = "canonical_id",
) -> DataFrame:
    """Near-duplicate CLUSTERS, not just pairs: the input frame with
    ``out_col`` appended — each row labeled with its cluster's lowest doc
    id. The standard training-data dedup shape: keep rows where
    ``doc_id == canonical_id`` to retain one representative per near-dup
    cluster (transitively — A~B~C collapses even when A and C never
    bucket together). One shape everywhere: the facade method is a plain
    passthrough of this function; :func:`near_dup_labels` returns the
    bare (id, label) table when only the mapping is needed.
    """
    labels = near_dup_labels(
        df, text_col, id_col, num_hashes, bands, shingle_k, max_bucket,
        jaccard_threshold, hash_name, out_col,
    )
    return df.join(labels, on=id_col, how="left")
