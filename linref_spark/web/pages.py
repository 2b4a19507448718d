"""Common-Crawl-style ``pages`` table: deterministic synthesis, extraction,
and geocoding into linear-referenced events.

Input shape per BASELINE.json input_hint:
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.

- :func:`generate_pages` synthesizes the table deterministically at any
  scale (seeded, row content a pure function of the row index) — the
  sandbox stand-in for the 10^12-doc Iceberg table. Generation is
  distributed: ``spark.range`` partitions the id space; every derived
  column is a pure expression of ``id``.
- :func:`extract_text` is the deterministic html->text extractor; the
  north-rule invariant is *byte-identical extracted text per url*, so the
  extractor is a pure string pipeline (strip script/style blocks, strip
  tags, collapse whitespace) with no environment dependence. It doubles as
  the oracle for the synthesized html (html is built around the text, and
  extraction recovers it byte-for-byte).
- :func:`geocode_pages` deterministically assigns each page a point on a
  synthetic route network — ``(route_id, loc_mp)`` point events and
  ``(route_id, beg_mp, end_mp)`` linear events — feeding the linref-style
  operators and the tiling pipeline.

Everything is JVM-side expressions; no UDFs, no RNG state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_WORDS = [
    "data", "road", "crawl", "spark", "route", "event", "miles", "index",
    "query", "table", "point", "graph", "tile", "join", "merge", "shuffle",
]
LANGS = ["en", "es", "fr", "de"]


def _word(expr: Column) -> Column:
    """Pick a word deterministically from a long expression."""
    idx = F.pmod(expr, F.lit(len(_WORDS))).cast("int")
    arr = F.array(*[F.lit(w) for w in _WORDS])
    return F.get(arr, idx)


def generate_pages(
    spark: SparkSession,
    n_rows: int,
    seed: int = 42,
    n_partitions: int = 32,
) -> DataFrame:
    """Deterministic pages table; every column is a pure function of id."""
    df = spark.range(0, n_rows, 1, n_partitions)
    i = F.col("id")
    h = F.xxhash64(i, F.lit(seed))
    n_words = (F.pmod(h, 40) + 5).cast("int")
    words = F.transform(
        F.sequence(F.lit(0), n_words - 1),
        lambda j: _word(F.xxhash64(i, j, F.lit(seed))),
    )
    body = F.concat_ws(" ", words)
    lang_idx = F.pmod(F.xxhash64(i, F.lit(seed + 1)), F.lit(len(LANGS))).cast("int")
    lang = F.get(F.array(*[F.lit(x) for x in LANGS]), lang_idx)
    title = _word(F.xxhash64(i, F.lit(seed + 2)))
    # the title is text content too: `text` is exactly what extract_text
    # recovers from `html`, making the byte-identity invariant testable
    text = F.concat_ws(" ", title, body)
    html = F.concat(
        F.lit("<html><head><title>"), title,
        F.lit('</title><script>var x=1;</script></head><body><p>'),
        body,
        F.lit("</p><style>.a{color:red}</style></body></html>"),
    )
    url = F.concat(
        F.lit("https://example.org/"), lang, F.lit("/page-"), i.cast("string")
    )
    warc_ts = F.timestamp_seconds(F.lit(1600000000) + F.pmod(h, 86400 * 365))
    return df.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.cast("binary").alias("html"),
        text.alias("text"),
        lang.alias("lang"),
    )


def extract_text(html: Column) -> Column:
    """Deterministic html -> text: drop script/style blocks, strip tags,
    decode the five basic entities, collapse whitespace runs, trim.

    A pure regexp pipeline — the same bytes in always produce the same
    bytes out, satisfying the per-url byte-identity invariant.
    """
    s = html.cast("string")
    s = F.regexp_replace(s, r"(?is)<script\b[^>]*>.*?</script>", " ")
    s = F.regexp_replace(s, r"(?is)<style\b[^>]*>.*?</style>", " ")
    s = F.regexp_replace(s, r"(?s)<[^>]*>", " ")
    for ent, ch in [
        ("&lt;", "<"), ("&gt;", ">"), ("&amp;", "&"), ("&quot;", '"'), ("&#39;", "'"),
    ]:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    s = F.regexp_replace(s, r"\s+", " ")
    return F.trim(s)


def with_extracted_text(df: DataFrame, html_col: str = "html") -> DataFrame:
    return df.withColumn("extracted_text", extract_text(F.col(html_col)))


def geocode_pages(
    df: DataFrame,
    n_routes: int = 100,
    route_length: float = 100.0,
    seed: int = 42,
) -> DataFrame:
    """Deterministically geocode pages onto a synthetic route network.

    Each url hashes to a route and a milepost; pages also get a linear
    span (interval events) sized by their text length. Output adds:
    route_id (string), loc_mp, beg_mp, end_mp (double).
    """
    h = F.xxhash64(F.col("url"), F.lit(seed))
    route_num = F.pmod(h, F.lit(n_routes))
    loc = (
        F.pmod(F.xxhash64(F.col("url"), F.lit(seed + 1)), F.lit(1_000_000))
        / 1_000_000.0
        * route_length
    )
    span = F.least(
        F.length(F.col("text")).cast("double") / 100.0, F.lit(route_length / 20.0)
    )
    beg = F.greatest(loc - span / 2.0, F.lit(0.0))
    end = F.least(loc + span / 2.0, F.lit(route_length))
    return (
        df.withColumn(
            "route_id", F.concat(F.lit("R"), F.lpad(route_num.cast("string"), 4, "0"))
        )
        .withColumn("loc_mp", loc)
        .withColumn("beg_mp", beg)
        .withColumn("end_mp", end)
    )
