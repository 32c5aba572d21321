"""Multimodal-column operators (SURVEY.md §2.9: L5).

Design: non-relational payloads (text blobs, embeddings, JSON props, and
binary image/audio/video) ride in typed columns of ordinary rows —
Spark's nested types (binary / array / map / struct) cover the schema, so
every relational operator composes with them unchanged.

The decode/feature-extraction path is the real Spark plumbing
(``mapInPandas`` over Arrow record batches with an explicit output
schema); the codec itself is STUBBED with a deterministic fake — the
image/audio libraries are not in this container. The stub's shape is the
contract: swap ``_fake_decode`` for a real PIL/ffmpeg call and nothing
else changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark_for_ebook_classification_spark.functions.vectors import spark_dot, sql_dot
from pyspark_for_ebook_classification_spark.plans.registry import query
from pyspark_for_ebook_classification_spark.sources.io import load


@query(
    "multimodal_row_transport",
    survey_ref="L5,J1,F6",
    doc="Text + vector + JSON-ish payloads traveling through one relational plan.",
    oracle=f"""
        SELECT
            d.doc_id,
            d.lang,
            d.n_chars,
            CAST(e.label AS INT) AS label,
            round(sqrt({sql_dot('e.embedding', 'e.embedding')}), 6) AS embedding_norm,
            length(d.text) AS text_len
        FROM documents d
        JOIN embeddings e ON d.doc_id = e.vec_id
        WHERE d.doc_id % 10 = 0
    """,
)
def multimodal_row_transport(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row carrying a text blob AND a 64-dim vector through a join +
    projection — proving the multimodal row model needs no special engine
    support. Only derived scalars are emitted (the hash gate can't compare
    raw float arrays portably)."""
    d = load(spark, sf_dir, "documents")
    e = load(spark, sf_dir, "embeddings")
    return (
        d.filter(F.col("doc_id") % 10 == 0)
        .join(e, d.doc_id == e.vec_id)
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.col("label").cast("int").alias("label"),
            F.round(F.sqrt(spark_dot("embedding", "embedding")), 6).alias(
                "embedding_norm"
            ),
            F.length("text").alias("text_len"),
        )
    )


# ------------------------------------------------------- decode stub (UF4)

DECODE_SCHEMA = (
    "doc_id long, media_type string, byte_len int, width int, height int, "
    "n_frames int, checksum string"
)


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for an image/video codec.

    Real deployment: replace with PIL.Image.open / av.open — the
    surrounding Arrow plumbing (batch iterator, schema, partitioning) is
    production-shaped already. Raises on empty payloads the way a codec
    raises on truncated files.
    """
    if not payload:
        raise ValueError("empty media payload")
    # pseudo-dimensions derived from the decoded text's first/last CODE
    # POINTS (not raw bytes): DuckDB's ascii() returns code points, so this
    # stays engine-portable even if testdata ever ships non-ASCII text.
    # Undecodable bytes (real media magic numbers like \xff\xd8) are a
    # corrupt "file" to this codec: surface them through the same
    # ValueError path a truncated payload takes, never an unhandled
    # UnicodeDecodeError inside the Python worker.
    try:
        text = payload.decode("utf-8")
    except UnicodeDecodeError as exc:
        raise ValueError(f"undecodable media payload: {exc}") from exc
    width = 64 + ord(text[0]) % 192
    height = 64 + ord(text[-1]) % 192
    n_frames = 1 + len(payload) % 7  # byte length, = DuckDB strlen()
    return width, height, n_frames


def _make_decode_kernel():
    """Build the mapInPandas kernel as a CLOSURE so cloudpickle serializes
    it by value: Python workers must not need this package importable on
    their sys.path (the driver's harness may run from any cwd). One Arrow
    batch in, one decoded batch out — per-batch, never per-row, Python."""

    def fake_decode(payload: bytes):
        # by-value copy of _fake_decode (kept in sync; unit-tested there)
        if not payload:
            raise ValueError("empty media payload")
        try:
            t = payload.decode("utf-8")
        except UnicodeDecodeError as exc:
            raise ValueError(f"undecodable media payload: {exc}") from exc
        return 64 + ord(t[0]) % 192, 64 + ord(t[-1]) % 192, 1 + len(payload) % 7

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as pd  # noqa: F811  (worker-side import)

        for pdf in batches:
            out = {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "byte_len": pdf["payload"].map(len),
            }
            dims = pdf["payload"].map(fake_decode)
            out["width"] = dims.map(lambda d: d[0])
            out["height"] = dims.map(lambda d: d[1])
            out["n_frames"] = dims.map(lambda d: d[2])
            out["checksum"] = pdf["payload"].map(lambda b: hashlib.md5(b).hexdigest())
            yield pd.DataFrame(out)

    return decode_batches


@query(
    "multimodal_decode_stub",
    survey_ref="L5,UF4",
    # The fake codec is deterministic arithmetic over the decoded text's
    # code points + byte length — portable to DuckDB's ascii()/strlen()
    # for ANY UTF-8 text — so the Python-worker path gets a REAL value
    # oracle, not just a rows-only check: a real codec swap would revert
    # this to oracle=None.
    oracle="""
        SELECT
            doc_id,
            CASE WHEN doc_id % 20 = 0 THEN 'image' ELSE 'audio' END
                AS media_type,
            CAST(strlen(text) AS INT) AS byte_len,
            CAST(64 + ascii(substring(text, 1, 1)) % 192 AS INT) AS width,
            CAST(64 + ascii(substring(text, length(text), 1)) % 192 AS INT)
                AS height,
            CAST(1 + strlen(text) % 7 AS INT) AS n_frames,
            md5(text) AS checksum
        FROM documents
        WHERE doc_id % 10 = 0
    """,
    doc="Binary media column → mapInPandas(Arrow) decode → typed metadata rows.",
)
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal decode pipeline with a deterministic fake codec:
    documents.text is re-encoded as a binary payload column (standing in
    for image/audio bytes), shipped through mapInPandas in Arrow batches,
    and decoded into typed metadata. At 100 TB: repartition upstream so
    batches are ~64-128 MB, and the decode parallelism is the executor
    count — no driver involvement."""
    d = load(spark, sf_dir, "documents")
    media = d.filter(F.col("doc_id") % 10 == 0).select(
        "doc_id",
        F.when(F.col("doc_id") % 20 == 0, "image").otherwise("audio").alias(
            "media_type"
        ),
        F.encode("text", "utf-8").alias("payload"),
    )
    return media.mapInPandas(_make_decode_kernel(), schema=DECODE_SCHEMA)


# ------------------------------------------- frame-sample + resize (UF4)

FRAME_SCHEMA = (
    "doc_id long, frame_idx int, width int, height int, "
    "out_w int, out_h int, frame_checksum string"
)


def _make_frame_kernel():
    """mapInPandas kernel: fake video payload → every-2nd-frame sample
    rows, each with fit-to-64-wide integer resize dims and a per-frame
    checksum. Row-expanding (one input → ⌈n_frames/2⌉ outputs) — the
    Arrow batch shape a real ffmpeg frame sampler would use. Closure, so
    cloudpickle ships it by value (workers never import this package)."""

    def sample_batches(batches):
        import hashlib

        import pandas as pd  # noqa: F811  (worker-side import)

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                # same deterministic fake codec as the decode stub:
                # code-point math on decoded text (ascii()-portable),
                # byte length for frame count (strlen()-portable)
                try:
                    t = payload.decode("utf-8")
                except UnicodeDecodeError as exc:
                    raise ValueError(
                        f"undecodable media payload: {exc}"
                    ) from exc
                width = 64 + ord(t[0]) % 192
                height = 64 + ord(t[-1]) % 192
                n_frames = 1 + len(payload) % 7
                out_h = max(1, (height * 64) // width)
                for i in range(0, n_frames, 2):
                    rows.append(
                        (
                            doc_id,
                            i,
                            width,
                            height,
                            64,
                            out_h,
                            hashlib.md5(payload + b"#" + str(i).encode()).hexdigest(),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "frame_idx",
                    "width",
                    "height",
                    "out_w",
                    "out_h",
                    "frame_checksum",
                ],
            )

    return sample_batches


@query(
    "multimodal_frame_sample",
    survey_ref="L5,UF4",
    # Deterministic fake codec again ⇒ full value oracle: frame dims are
    # integer arithmetic over payload bytes, the checksum is md5 of
    # payload + '#' + index. A real ffmpeg swap reverts this to rows-only.
    oracle="""
        WITH media AS (
            SELECT
                doc_id,
                text,
                64 + ascii(substring(text, 1, 1)) % 192 AS width,
                64 + ascii(substring(text, length(text), 1)) % 192 AS height,
                1 + strlen(text) % 7 AS n_frames
            FROM documents
            WHERE doc_id % 10 = 5
        )
        SELECT
            doc_id,
            CAST(f.frame_idx AS INT) AS frame_idx,
            CAST(width AS INT) AS width,
            CAST(height AS INT) AS height,
            CAST(64 AS INT) AS out_w,
            CAST(GREATEST(1, (height * 64) // width) AS INT) AS out_h,
            md5(text || '#' || CAST(f.frame_idx AS VARCHAR)) AS frame_checksum
        FROM media
        CROSS JOIN unnest(generate_series(0, n_frames - 1, 2)) AS f(frame_idx)
    """,
    doc="Video frame-sampling + resize: row-expanding mapInPandas over binary payloads.",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sample + resize over fake video payloads: every 2nd frame of
    each media row becomes an output row with fit-to-width-64 integer
    resize dimensions. At 100 TB the input is repartitioned so each Arrow
    batch holds ~64-128 MB of payloads and expansion happens executor-side
    with zero driver involvement; sampled frames land partitioned by
    doc_id for the downstream feature-extract join."""
    d = load(spark, sf_dir, "documents")
    media = d.filter(F.col("doc_id") % 10 == 5).select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return media.mapInPandas(_make_frame_kernel(), schema=FRAME_SCHEMA)


# -------------------------------------------- CDC chunk-level storage dedup

#: rolling-hash boundary divisor: a byte position ends a chunk when the
#: 3-byte weighted hash is ≡ 0 (mod this) → expected chunk ≈ 16 bytes.
_CDC_DIVISOR = 16

#: chunk-start positions: 1 plus every boundary position ≥ 4 (the window
#: needs 3 trailing bytes). Pure integer arithmetic on ascii codes, no
#: libm — positions are engine-identical even though each engine uses its
#: fastest spelling: Spark pre-computes a per-byte codes array and guards
#: the short-payload case with CASE instead of a per-element bound check
#: (measured at sf0.1, same session, identical output: substring-per-
#: element 4.2 s → codes array 3.0 s → codes + CASE guard 0.59 s; the
#: in-lambda `i <= length(text)` and the 3 substring calls per position
#: were the cost, 7× together), while the DuckDB oracle keeps the direct
#: substring form — parity is on VALUES, not spelling.
_CDC_CODES_SPARK = "transform(split(text, ''), c -> ascii(c))"
_CDC_STARTS_SPARK = (
    "concat(array(1), CASE WHEN length(text) >= 4 THEN "
    "filter(sequence(4, length(text)), i -> "
    "(element_at(codes, i-2) * 961 + element_at(codes, i-1) * 31 "
    f"+ element_at(codes, i)) % {_CDC_DIVISOR} = 0) "
    "ELSE CAST(array() AS array<int>) END)"
)
_CDC_STARTS_SQL = (
    "list_concat([1], list_filter(range(1, strlen(text) + 1), i -> i >= 4 AND "
    "(ascii(substring(text, i-2, 1)) * 961 + ascii(substring(text, i-1, 1)) * 31 "
    f"+ ascii(substring(text, i, 1))) % {_CDC_DIVISOR} = 0))"
)


def cdc_starts(df: DataFrame) -> DataFrame:
    """(source?, text) → + bpos: the chunk-start positions column. Two
    projections because the boundary lambda references the materialized
    per-byte codes array."""
    keep = list(df.columns)
    assert "codes" not in keep and "bpos" not in keep, keep
    return df.selectExpr(*keep, f"{_CDC_CODES_SPARK} AS codes").selectExpr(
        *keep, f"{_CDC_STARTS_SPARK} AS bpos"
    )


@query(
    "multimodal_cdc_chunk_dedup",
    survey_ref="L5,L1,A1,F1",
    doc="Storage-level dedup for opaque payloads: content-defined chunking "
    "(rolling-hash boundaries), then per-source chunk-duplication and "
    "byte-savings accounting.",
    oracle=f"""
        WITH starts AS (
            SELECT doc_id, source, text, {_CDC_STARTS_SQL} AS bpos
            FROM documents WHERE strlen(text) >= 1
        ),
        chunks AS (
            SELECT source,
                   unnest(list_transform(range(1, length(bpos) + 1),
                       j -> substring(text, bpos[j],
                                      coalesce(bpos[j + 1], strlen(text) + 1)
                                          - bpos[j]))) AS chunk
            FROM starts
        ),
        per_chunk AS (
            SELECT source, COUNT(*) AS cnt, strlen(chunk) AS len
            FROM chunks WHERE chunk <> '' GROUP BY source, chunk
        )
        SELECT source,
               CAST(SUM(cnt) AS BIGINT) AS n_chunks,
               CAST(COUNT(*) AS BIGINT) AS n_unique_chunks,
               CAST(SUM(cnt * len) AS BIGINT) AS total_bytes,
               CAST(SUM(len) AS BIGINT) AS unique_bytes,
               round(1 - CAST(SUM(len) AS DOUBLE) / SUM(cnt * len), 6)
                   AS dedup_ratio
        FROM per_chunk
        GROUP BY source
    """,
)
def multimodal_cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined-chunking dedup — the storage-layer pass (LBFS/
    FastCDC lineage) that deduplicates OPAQUE payloads no text or
    embedding pass can touch: chunk boundaries are chosen by a rolling
    hash of the content itself, so an insertion early in a payload
    shifts only the chunk it lands in while every later chunk re-aligns
    — unlike fixed-offset chunking, where one inserted byte re-keys the
    whole tail. Per source it reports chunk counts, unique-chunk counts,
    and the byte-level dedup ratio — the number a 100 TB media lake's
    capacity planning runs on. The payload here is the documents text
    byte-stream (the container has no media libs; same stand-in as
    multimodal_decode_stub, whose strlen()=byte-length equivalence note
    applies — ASCII corpus, asserted identical in both engines by the
    oracle equality itself).

    Scale shape: the boundary scan is a per-row JVM expression (integer
    ascii arithmetic, ~L ops per doc, no Python, no shuffle); chunks
    explode from a transform computed INSIDE the Generate argument
    (evaluated once per input row — the Generate-recompute lint's
    approved shape), and the only shuffles are the two partial-combining
    aggregations, (source, chunk) then source. Chunk keys are short
    strings (~16 bytes expected) so the first shuffle carries roughly
    the corpus byte volume once — the same cost profile as the shingle
    pipelines, with the same hot-key property: a boilerplate chunk
    appearing in every doc combines map-side to one row per partition.
    At rest you'd persist (chunk_hash → refcount) bucketed by hash and
    MERGE daily increments into it.

    Analytical ceiling (r7 verdict item 5, the 3.22× SCALING tail):
    chunking PARTITIONS the corpus bytes — Σ total_bytes == corpus
    bytes exactly and chunk rows ≤ bytes, so shuffle amplification is
    exactly 1×; pinned byte-for-byte by
    tests/test_scaling_bounds.py::test_cdc_chunk_dedup_byte_conservation
    (the measured ratio is fixed-cost amortization, not growth)."""
    d = load(spark, sf_dir, "documents").filter(F.length("text") >= 1)
    starts = cdc_starts(d.select("source", "text"))
    chunk_expr = F.expr(
        "transform(sequence(1, size(bpos)), j -> substring(text, "
        "element_at(bpos, j), "
        "coalesce(try_element_at(bpos, j + 1), length(text) + 1) "
        "- element_at(bpos, j)))"
    )
    chunks = starts.select("source", F.explode(chunk_expr).alias("chunk")).filter(
        F.col("chunk") != ""
    )
    per_chunk = (
        chunks.groupBy("source", "chunk")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("len", F.length("chunk"))
    )
    total_bytes = F.sum(F.col("cnt") * F.col("len"))
    unique_bytes = F.sum("len")
    return per_chunk.groupBy("source").agg(
        F.sum("cnt").cast("bigint").alias("n_chunks"),
        F.count(F.lit(1)).cast("bigint").alias("n_unique_chunks"),
        total_bytes.cast("bigint").alias("total_bytes"),
        unique_bytes.cast("bigint").alias("unique_bytes"),
        F.round(
            F.lit(1) - unique_bytes.cast("double") / total_bytes, 6
        ).alias("dedup_ratio"),
    )


# ------------------------------------------ perceptual-hash near-dup (aHash)

#: 64-bit average-hash banded into 4 × 16 bits: by pigeonhole, any pair at
#: Hamming distance ≤ 3 agrees on at least one full band, so the band join
#: is LOSSLESS for the radius below.
PHASH_BANDS = 4
PHASH_BITS_PER_BAND = 16
# the output schema (b0..b3), the oracle's MAX CASE pivot, and the 64-way
# pixel downsample are written against exactly this geometry — changing
# the banding means changing those in lockstep, which this assert forces
# a reader to notice
assert PHASH_BANDS * PHASH_BITS_PER_BAND == 64
PHASH_HAMMING_MAX = 3
#: a band value shared by this many media rows is a degenerate plane
#: (blank thumbnails), not near-dup signal — same cap design as SimHash.
PHASH_MAX_BUCKET = 64

_PHASH_SCHEMA = "doc_id bigint, b0 int, b1 int, b2 int, b3 int"


def _make_phash_kernel():
    """mapInPandas kernel: media payload → 64-bit average-hash as 4
    16-bit band integers. Closure (cloudpickle by value) like the other
    media kernels. The per-payload math is the REAL aHash algorithm —
    downsample to 64 intensities, threshold each against the mean —
    applied to the deterministic fake decode (intensity i = code point
    of the char at the 64-way-downsampled position). Swap the two
    marked lines for a PIL grayscale 8×8 thumbnail and the banding,
    bucket join and Hamming verify below are production-ready as-is.
    The mean threshold is the INTEGER comparison 64·p ≥ Σp — no float
    crosses the kernel/oracle boundary."""
    # bound as a factory LOCAL so the closure captures the value itself —
    # referencing the module global from the worker would require the
    # package on the executor's sys.path, which by-value pickling avoids
    n_bands = PHASH_BANDS

    def phash_row(payload: bytes):
        if not payload:
            raise ValueError("empty media payload")
        try:
            t = payload.decode("utf-8")  # real codec: Image.open(...)
        except UnicodeDecodeError as exc:
            raise ValueError(f"undecodable media payload: {exc}") from exc
        n = len(t)
        pix = [ord(t[(i * n) // 64]) for i in range(64)]  # real: 8×8 resize
        total = sum(pix)
        bits = [1 if 64 * p >= total else 0 for p in pix]
        return tuple(
            sum(b << (15 - j) for j, b in enumerate(bits[16 * k : 16 * k + 16]))
            for k in range(n_bands)
        )

    def phash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd  # noqa: F811  (worker-side import)

        for pdf in batches:
            bands = pdf["payload"].map(phash_row)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "b0": bands.map(lambda b: b[0]),
                    "b1": bands.map(lambda b: b[1]),
                    "b2": bands.map(lambda b: b[2]),
                    "b3": bands.map(lambda b: b[3]),
                }
            )

    return phash_batches


@query(
    "multimodal_phash_neardup",
    survey_ref="L5,L2,UF4,F7",
    # The fake decode is deterministic integer arithmetic, so the oracle
    # mirrors the whole pipeline relationally: same media universe, same
    # pixels, same integer mean threshold, same banding, same bucket
    # cap, same Hamming verify. A real-PIL swap reverts this to
    # rows-only (like the other L5 ops).
    oracle=f"""
        WITH media AS (
            SELECT doc_id * 2 AS media_id, text
            FROM documents WHERE length(text) >= 1
            UNION ALL
            SELECT doc_id * 2 + 1, 'Z' || substring(text, 2)
            FROM documents WHERE doc_id % 7 = 0 AND length(text) >= 1
        ),
        m2 AS (SELECT media_id, text, length(text) AS n FROM media),
        pix AS (
            SELECT media_id, i,
                   ascii(substring(text, 1 + (i * n) // 64, 1)) AS p
            FROM m2, LATERAL unnest(range(0, 64)) AS r(i)
        ),
        tot AS (SELECT media_id, SUM(p) AS total FROM pix GROUP BY media_id),
        bits AS (
            SELECT pix.media_id, i,
                   CASE WHEN 64 * p >= total THEN 1 ELSE 0 END AS b
            FROM pix JOIN tot USING (media_id)
        ),
        bands AS (
            SELECT media_id, CAST(i // {PHASH_BITS_PER_BAND} AS INT) AS band_id,
                   CAST(SUM(b * (1 << CAST({PHASH_BITS_PER_BAND} - 1
                        - i % {PHASH_BITS_PER_BAND} AS INT))) AS INT) AS band_val
            FROM bits GROUP BY media_id, i // {PHASH_BITS_PER_BAND}
        ),
        sig AS (
            SELECT media_id,
                   MAX(CASE WHEN band_id = 0 THEN band_val END) AS b0,
                   MAX(CASE WHEN band_id = 1 THEN band_val END) AS b1,
                   MAX(CASE WHEN band_id = 2 THEN band_val END) AS b2,
                   MAX(CASE WHEN band_id = 3 THEN band_val END) AS b3
            FROM bands GROUP BY media_id
        ),
        buckets AS (
            SELECT band_id, band_val FROM bands
            GROUP BY band_id, band_val
            HAVING COUNT(*) BETWEEN 2 AND {PHASH_MAX_BUCKET}
        ),
        cand AS (
            SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b
            FROM bands a
            JOIN bands b USING (band_id, band_val)
            JOIN buckets USING (band_id, band_val)
            WHERE a.media_id < b.media_id
        )
        SELECT media_a, media_b,
               CAST(bit_count(xor(sa.b0, sb.b0))
                  + bit_count(xor(sa.b1, sb.b1))
                  + bit_count(xor(sa.b2, sb.b2))
                  + bit_count(xor(sa.b3, sb.b3)) AS INT) AS hamming
        FROM cand
        JOIN sig sa ON sa.media_id = cand.media_a
        JOIN sig sb ON sb.media_id = cand.media_b
        WHERE bit_count(xor(sa.b0, sb.b0)) + bit_count(xor(sa.b1, sb.b1))
            + bit_count(xor(sa.b2, sb.b2)) + bit_count(xor(sa.b3, sb.b3))
            <= {PHASH_HAMMING_MAX}
    """,
    doc="Perceptual-hash (aHash) near-dup over binary media payloads: "
    "Arrow kernel computes banded 64-bit hashes, LSH band join + exact "
    "Hamming verify finds visually-identical media.",
)
def multimodal_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media near-dup — the image-dedup pass of a multimodal curation
    stack (re-encoded/resized copies of one image share a perceptual
    hash even though their BYTES differ, so exact/CDC chunk dedup never
    sees them). The media universe is the documents corpus standing in
    for an image store, with controlled duplication shaped like a real
    crawl: every doc is an original upload (media_id = 2·doc_id), and
    every 7th doc also exists as a "re-encoded" copy (media_id =
    2·doc_id+1, first byte perturbed — the compression-artifact case
    pHash exists for). Measured at sf0.01: the re-encode pairs land at
    Hamming 0–2 and the nearest DISTINCT media pair sits at 5, so the
    ≤ {PHASH_HAMMING_MAX} radius recovers exactly the true-duplicate
    set with zero false positives — the separation a recall-acceptance
    report would sign off.

    Pipeline: (1) the Arrow kernel turns each payload into a 64-bit
    average-hash, carried as 4 × 16-bit band ints — the decode + hash is
    the only Python, one mapInPandas pass, no shuffle; (2) band rows
    explode 4× and group into (band_id, band_val) buckets — the one
    corpus-scale shuffle, 8-byte keys; (3) in-bucket triangular
    expansion emits each candidate pair once (media_a < media_b, same
    shape as dedup_simhash_hamming_pairs), with the PHASH_MAX_BUCKET cap
    bounding any bucket's pair count — blank/degenerate thumbnails
    produce mega-buckets at corpus scale and are noise by definition;
    (4) exact Hamming ≤ {PHASH_HAMMING_MAX} verifies candidates via four
    XOR+bit_count ops on the re-joined signatures (pigeonhole: banding
    is lossless at this radius, so capped buckets aside, the output IS
    the exact Hamming-ball pair set). The signature table is
    localCheckpoint'd once: it feeds the band explode and both verify
    joins, and re-running the Python kernel three times is the
    alternative."""
    d = load(spark, sf_dir, "documents").filter(F.length("text") >= 1)
    originals = d.select(
        (F.col("doc_id") * 2).alias("doc_id"),
        F.encode("text", "utf-8").alias("payload"),
    )
    reencoded = d.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") * 2 + 1).alias("doc_id"),
        F.encode(
            F.concat(F.lit("Z"), F.expr("substring(text, 2)")), "utf-8"
        ).alias("payload"),
    )
    media = originals.unionByName(reencoded)
    sig = media.mapInPandas(
        _make_phash_kernel(), schema=_PHASH_SCHEMA
    ).localCheckpoint(eager=True)
    band_vals = F.array("b0", "b1", "b2", "b3")
    bands = sig.select(
        "doc_id", F.posexplode(band_vals).alias("band_id", "band_val")
    )
    buckets = (
        bands.groupBy("band_id", "band_val")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("docs"))
        .filter((F.size("docs") >= 2) & (F.size("docs") <= PHASH_MAX_BUCKET))
    )
    pair_expr = F.expr(
        "flatten(transform(sequence(1, size(docs) - 1), "
        "i -> transform(sequence(i + 1, size(docs)), "
        "j -> struct(element_at(docs, i) AS media_a, element_at(docs, j) AS media_b))))"
    )
    cand = (
        buckets.select(F.explode(pair_expr).alias("p"))
        .select("p.media_a", "p.media_b")
        .distinct()
    )
    sa = sig.select(
        F.col("doc_id").alias("media_a"),
        *[F.col(c).alias(f"{c}_a") for c in ("b0", "b1", "b2", "b3")],
    )
    sb = sig.select(
        F.col("doc_id").alias("media_b"),
        *[F.col(c).alias(f"{c}_b") for c in ("b0", "b1", "b2", "b3")],
    )
    hamming = sum(
        F.expr(f"bit_count({c}_a ^ {c}_b)") for c in ("b0", "b1", "b2", "b3")
    )
    return (
        cand.join(sa, "media_a")
        .join(sb, "media_b")
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= PHASH_HAMMING_MAX)
        .select(
            "media_a", "media_b", F.col("hamming").cast("int").alias("hamming")
        )
    )


# ---------------------------------------------------------------------------
# Vision/audio token accounting — the multimodal leg of the budget planners.

_TILE = 448  # ViT tile edge
_TOK_PER_TILE = 256
_TOK_IMG_BASE = 85  # global-view tokens per image
_TOK_PER_FRAME = 85  # low-res per-frame tokens for sampled video
_TOK_AUDIO_PER_SEC = 25

_MM_BUDGET_ORACLE = f"""
    WITH media AS (
        SELECT
            doc_id,
            n_chars,
            CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'video'
                 ELSE 'audio' END AS modality,
            64 + ascii(substring(text, 1, 1)) % 192 AS w,
            64 + ascii(substring(text, length(text), 1)) % 192 AS h,
            1 + length(text) % 7 AS n_frames,
            10 + length(text) % 300 AS dur_s
        FROM documents
    ), toks AS (
        SELECT modality, n_chars,
               CASE modality
                   WHEN 'image' THEN
                       ((w + {_TILE - 1}) // {_TILE})
                       * ((h + {_TILE - 1}) // {_TILE})
                       * {_TOK_PER_TILE} + {_TOK_IMG_BASE}
                   WHEN 'video' THEN
                       ((n_frames + 1) // 2) * {_TOK_PER_FRAME}
                   ELSE dur_s * {_TOK_AUDIO_PER_SEC}
               END AS media_tokens,
               (n_chars + 3) // 4 AS text_tokens
        FROM media
    ), agg AS (
        SELECT modality,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(media_tokens) AS BIGINT) AS media_tokens,
               CAST(SUM(text_tokens) AS BIGINT) AS text_tokens,
               CAST(SUM(media_tokens + text_tokens) AS BIGINT) AS total_tokens
        FROM toks GROUP BY modality
    )
    SELECT modality, n_items, media_tokens, text_tokens, total_tokens,
           round(CAST(total_tokens AS DOUBLE)
                 / SUM(total_tokens) OVER (), 6) AS budget_share
    FROM agg
"""


@query(
    "multimodal_token_budget",
    survey_ref="L5,L7,A1,F3",
    doc="Per-modality vision/audio/text token accounting — the multimodal "
    "leg of the training-budget planners (tiles×256+85 for images, "
    "sampled frames×85 for video, 25 tok/s for audio).",
    oracle=_MM_BUDGET_ORACLE,
)
def multimodal_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What a multimodal mixture planner actually needs: each media row's
    token-equivalent cost under the standard encoder accounting — images
    pay ceil(w/448)·ceil(h/448) tiles × 256 tokens + an 85-token global
    view, videos pay their sampled frames (every 2nd) × 85, audio pays
    25 tokens/second, and the caption/text side pays the same
    4-chars-per-token proxy the text planners use. The per-modality
    totals and budget shares plug straight into data_mixture_budget_plan
    / data_epoch_allocation, turning their char budgets into modality-
    aware token budgets. Metadata (dims, frame count, duration) comes
    from the same deterministic fake codec as the other L5 ops — swap a
    real probe in and the accounting is unchanged.

    All ceil divisions are integer ((x+d−1) DIV d) — exact on both
    engines; the only double is the final share (exact-BIGINT quotient,
    rounded). One map-side projection + a 3-group aggregate; the share
    window runs over 3 rows."""
    d = load(spark, sf_dir, "documents")
    first_c = F.ascii(F.substring("text", 1, 1))
    last_c = F.ascii(F.expr("substring(text, length(text), 1)"))
    media = d.select(
        "n_chars",
        F.expr(
            "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'video'"
            " ELSE 'audio' END"
        ).alias("modality"),
        (64 + first_c % 192).alias("w"),
        (64 + last_c % 192).alias("h"),
        (1 + F.length("text") % 7).alias("n_frames"),
        (10 + F.length("text") % 300).alias("dur_s"),
    )
    media_tokens = (
        F.when(
            F.col("modality") == "image",
            F.expr(
                f"((w + {_TILE - 1}) DIV {_TILE})"
                f" * ((h + {_TILE - 1}) DIV {_TILE})"
                f" * {_TOK_PER_TILE} + {_TOK_IMG_BASE}"
            ),
        )
        .when(
            F.col("modality") == "video",
            F.expr(f"((n_frames + 1) DIV 2) * {_TOK_PER_FRAME}"),
        )
        .otherwise(F.col("dur_s") * _TOK_AUDIO_PER_SEC)
    )
    toks = media.select(
        "modality",
        media_tokens.alias("media_tokens"),
        F.expr("(n_chars + 3) DIV 4").alias("text_tokens"),
    )
    agg = toks.groupBy("modality").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.sum("media_tokens").cast("bigint").alias("media_tokens"),
        F.sum("text_tokens").cast("bigint").alias("text_tokens"),
        F.sum(F.col("media_tokens") + F.col("text_tokens"))
        .cast("bigint")
        .alias("total_tokens"),
    )
    wall = Window.partitionBy()
    return agg.select(
        "modality",
        "n_items",
        "media_tokens",
        "text_tokens",
        "total_tokens",
        F.round(
            F.col("total_tokens").cast("double")
            / F.sum("total_tokens").over(wall),
            6,
        ).alias("budget_share"),
    )
