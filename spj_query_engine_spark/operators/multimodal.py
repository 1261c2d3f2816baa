"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Beyond-reference capability.  The pattern for image/audio/video at 100 TB:

* the payload is an opaque ``binary`` column (or a (path, offset, length)
  pointer into an object store for very large assets);
* typed metadata (byte size, content hash, modality tag) rides alongside in
  a struct so filtering/routing never touches the bytes;
* decode / feature-extraction / frame-sampling run as Arrow-batched
  ``mapInPandas`` stages — the ONLY place Python touches data, sized by
  ``spark.sql.execution.arrow.maxRecordsPerBatch``;
* batches stay balanced by repartitioning on a hash of the id, not by file
  layout (decode cost is per-byte, file layout is per-document count).

The real decoders (PIL / torchaudio / ffmpeg) are NOT in this container, so
``decode_features`` STUBS them: if the library import fails it falls back to
a DETERMINISTIC fake feature extractor (md5-seeded) whose values the DuckDB
oracle reproduces — the Spark-side plumbing (schema, Arrow batching, UDF
signature, partitioning) is real and oracle-tested end-to-end; only the
pixel math is fake.  The documents table's text bytes stand in for payloads.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spj_query_engine_spark.functions.hashing import h32_sql

FEAT_DIM = 8
FRAME_COUNT = 4
CHECKSUM_MOD = 2147483647


def attach_payload(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Wrap a source column as a multimodal (payload, metadata) pair.  With
    real assets this is the ingestion boundary (read bytes / object-store
    pointers); here the UTF-8 text bytes stand in."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).alias("n_bytes"),
            F.md5(F.col(text_col)).alias("content_hash"),
            F.lit("text/utf-8").alias("mime"),
        ).alias("meta"),
    )


#: opt-in switch for a real decoder.  Real image decode is an EXPLICIT
#: config decision, never an import probe: a library appearing on the
#: cluster must not silently change (or break) committed pipeline output.
#: Set to a callable ``bytes -> list[float]`` (e.g. a PIL/torchvision
#: featurizer) to route ``decode_features`` through it.
REAL_DECODER = None


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for an image/audio feature extractor: FEAT_DIM
    md5-derived floats in [0, 1).  Plug a real model in via ``REAL_DECODER``;
    the surrounding plumbing (Arrow batching, schema, partitioning) does not
    change.  Whether PIL/torchaudio happen to be importable is irrelevant —
    decode behavior only changes when the deployment opts in."""
    out = []
    for k in range(FEAT_DIM):
        h = hashlib.md5(str(k).encode() + payload).hexdigest()
        out.append(int(h[:8], 16) / 4294967296.0)
    return out


def decode_features(mm: DataFrame) -> DataFrame:
    """Arrow-batched decode + feature extraction over (payload, meta) rows —
    the mapInPandas stage a real image pipeline would use.  Output: id,
    byte stats, FEAT_DIM-dim feature vector.

    The featurizer is resolved ONCE on the driver (``REAL_DECODER`` if the
    deployment opted in, else the deterministic stub) and closed over, so
    the chosen callable ships inside the serialized task — executor-side
    module state or library availability cannot change the answer."""
    featurize = REAL_DECODER if REAL_DECODER is not None else _fake_features

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len),
                    "checksum": payloads.map(lambda b: sum(b) % CHECKSUM_MOD),
                    "feat": payloads.map(featurize),
                }
            )

    return mm.mapInPandas(
        decode, schema="doc_id long, n_bytes int, checksum long, feat array<double>"
    )


def decode_features_sql(table: str = "documents") -> str:
    """Oracle twin of the fake extractor (documents text is plain ASCII, so
    UTF-8 payload bytes == ascii codes)."""
    feats = ", ".join(
        f"(('0x' || substr(md5({k}::VARCHAR || text), 1, 8))::BIGINT::DOUBLE / 4294967296.0)"
        for k in range(FEAT_DIM)
    )
    return f"""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           list_reduce(list_prepend(0::BIGINT,
                       list_transform(string_split(text, ''), c -> ascii(c)::BIGINT)),
                       (a, x) -> a + x) % {CHECKSUM_MOD} AS checksum,
           [{feats}] AS feat
    FROM {table}
    """


def decode_features_wide(mm: DataFrame) -> DataFrame:
    """m01's gate shape: ``decode_features`` with the FEAT_DIM feature vector
    flattened to scalar columns ``feat_0..feat_{FEAT_DIM-1}``.  The driver's
    correctness gate canonicalizes results with a pandas sort over every
    column, and array cells arrive as numpy.ndarray (unhashable) — see the
    CORRECTNESS_r02 m01/u01 errors — so the registered entry exposes atomic
    columns; the array-valued operator stays for pipeline use."""
    return decode_features(mm).select(
        "doc_id",
        "n_bytes",
        "checksum",
        *[F.col("feat")[k].alias(f"feat_{k}") for k in range(FEAT_DIM)],
    )


def decode_features_wide_sql(table: str = "documents") -> str:
    feats = ", ".join(
        f"(('0x' || substr(md5({k}::VARCHAR || text), 1, 8))::BIGINT::DOUBLE / 4294967296.0)"
        f" AS feat_{k}"
        for k in range(FEAT_DIM)
    )
    return f"""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           list_reduce(list_prepend(0::BIGINT,
                       list_transform(string_split(text, ''), c -> ascii(c)::BIGINT)),
                       (a, x) -> a + x) % {CHECKSUM_MOD} AS checksum,
           {feats}
    FROM {table}
    """


def frame_sample(mm: DataFrame, n_frames: int = FRAME_COUNT) -> DataFrame:
    """Frame sampling for video-like payloads: split the byte stream into
    ``n_frames`` contiguous chunks and fingerprint each — the shape of a
    keyframe extractor (seek offsets + per-frame decode) with the codec
    stubbed to md5.  mapInPandas keeps per-frame work Arrow-batched."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                for f in range(n_frames):
                    lo = (n * f) // n_frames
                    hi = (n * (f + 1)) // n_frames
                    chunk = payload[lo:hi]
                    rows.append(
                        (
                            doc_id,
                            f,
                            len(chunk),
                            int(hashlib.md5(chunk).hexdigest()[:8], 16),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_no", "frame_bytes", "frame_fp"]
            )

    return mm.mapInPandas(
        sample, schema="doc_id long, frame_no int, frame_bytes int, frame_fp long"
    )


def frame_sample_sql(table: str = "documents", n_frames: int = FRAME_COUNT) -> str:
    """Oracle twin: same integer chunk boundaries via substr (ASCII text →
    byte offsets == char offsets)."""
    selects = []
    for f in range(n_frames):
        lo = f"(length(text) * {f}) // {n_frames}"
        hi = f"(length(text) * {f + 1}) // {n_frames}"
        chunk = f"substr(text, ({lo}) + 1, ({hi}) - ({lo}))"
        selects.append(
            f"SELECT doc_id, {f} AS frame_no, length({chunk}) AS frame_bytes, "
            f"{h32_sql(chunk)} AS frame_fp FROM {table}"
        )
    return " UNION ALL ".join(selects)


RESIZE_TARGET = 64  # resized payload length in bytes


def resize_payload(mm: DataFrame, target: int = RESIZE_TARGET) -> DataFrame:
    """Resize for image-like payloads: nearest-neighbor resampling of the
    byte stream to ``target`` bytes — the shape of an image resize (decode →
    sample grid → re-encode) with the pixel codec stubbed to byte indexing.
    Output keeps the resized payload (as ASCII-safe string) plus refreshed
    metadata, so downstream stages chain on the new payload exactly as they
    would after a real thumbnail pass."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                if n:
                    out = bytes(payload[(n * i) // target] for i in range(target))
                else:
                    out = b""
                rows.append(
                    (
                        doc_id,
                        out.decode("latin-1"),
                        len(out),
                        int(hashlib.md5(out).hexdigest()[:8], 16),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "resized", "r_bytes", "r_fp"]
            )

    return mm.mapInPandas(
        resize, schema="doc_id long, resized string, r_bytes int, r_fp long"
    )


AUDIO_WIN = 32  # analysis window length in samples (bytes)
AUDIO_HOP = 16  # hop between window starts (50% overlap)


def audio_windows(mm: DataFrame, win: int = AUDIO_WIN, hop: int = AUDIO_HOP) -> DataFrame:
    """Audio-shaped analysis: treat the payload byte stream as PCM samples
    and emit overlapping (``win``, ``hop``) analysis windows with per-window
    energy (Σ sample²) and peak — the shape of an STFT/VAD front-end with
    the codec stubbed to byte values.  Window count varies per document
    (unlike :func:`frame_sample`'s fixed grid), so this exercises the
    fan-out mapInPandas shape: one input row → ceil(n/hop) output rows,
    Arrow-batched, partitioned by doc hash so decode cost stays balanced
    regardless of file layout."""

    def analyze(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                for i in range((n + hop - 1) // hop):
                    chunk = payload[i * hop : i * hop + win]
                    rows.append(
                        (
                            doc_id,
                            i,
                            len(chunk),
                            sum(b * b for b in chunk),
                            max(chunk),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "win_no", "n_samples", "energy", "peak"]
            )

    return mm.mapInPandas(
        analyze,
        schema="doc_id long, win_no int, n_samples int, energy long, peak long",
    )


def audio_windows_sql(
    table: str = "documents", win: int = AUDIO_WIN, hop: int = AUDIO_HOP
) -> str:
    """Oracle twin: same window grid over ascii codes (ASCII text ⇒ byte
    values == char codes); unnest(range(...)) reproduces the variable
    per-document fan-out."""
    chunk = f"list_slice(s, i*{hop} + 1, i*{hop} + {win})"
    return f"""
    WITH base AS (
      SELECT doc_id,
             list_transform(string_split(text, ''), c -> ascii(c)::BIGINT) AS s
      FROM {table} WHERE length(text) > 0
    ),
    wins AS (
      SELECT doc_id, s, unnest(range((len(s) + {hop - 1}) // {hop})) AS i FROM base
    )
    SELECT doc_id, i::INT AS win_no, len({chunk})::INT AS n_samples,
           list_reduce(list_prepend(0::BIGINT,
               list_transform({chunk}, x -> x*x)), (a, b) -> a + b) AS energy,
           list_max({chunk}) AS peak
    FROM wins
    """


def resize_payload_sql(table: str = "documents", target: int = RESIZE_TARGET) -> str:
    """Oracle twin: same nearest-neighbor indices via substr (ASCII text, so
    byte indexing == char indexing)."""
    resized = (
        f"CASE WHEN length(text) = 0 THEN '' ELSE "
        f"array_to_string(list_transform(range({target}), "
        f"i -> substr(text, ((length(text) * i) // {target}) + 1, 1)), '') END"
    )
    return f"""
    SELECT doc_id, {resized} AS resized,
           length({resized})::INT AS r_bytes,
           {h32_sql(resized)} AS r_fp
    FROM {table}
    """


MODALITIES = ("text", "image", "audio")
LAKE_DIR = "/tmp/spj_mm_lake"


def modality_of(id_col: Column) -> Column:
    """Deterministic modality tag (doc_id % 3 → text/image/audio) — the
    stand-in for real ingestion's content-type detection."""
    return F.element_at(F.array(*[F.lit(m) for m in MODALITIES]), (id_col % 3 + 1).cast("int"))


def write_modality_lake(mm: DataFrame, path: str = LAKE_DIR, id_col: str = "doc_id") -> None:
    """Materialize the multimodal frame as a modality-PARTITIONED parquet
    lake (`partitionBy` → one directory per modality).  At 100 TB this
    layout is what makes single-modality pipelines cheap: a reader filtering
    on modality prunes entire partitions at planning time (PartitionFilters
    in the scan) and never opens the other modalities' files."""
    mm.withColumn("modality", modality_of(F.col(id_col))).write.mode(
        "overwrite"
    ).partitionBy("modality").parquet(path)


def modality_lake_stats(
    spark, mm: DataFrame, modality: str = "image", path: str = LAKE_DIR
) -> DataFrame:
    """Write the partitioned lake, read ONE modality back (partition-pruned
    scan), and aggregate its asset count + byte volume.  The read carries the
    writer's explicit schema: a zero-row partitioned write leaves no data
    files, and schema inference on it would throw instead of returning the
    well-defined empty aggregate."""
    write_modality_lake(mm, path)
    lake_schema = mm.withColumn("modality", F.lit("x")).schema
    back = spark.read.schema(lake_schema).parquet(path).filter(
        F.col("modality") == modality
    )
    return back.agg(
        F.lit(modality).alias("modality"),
        F.count(F.lit(1)).alias("n_assets"),
        F.sum(F.col("meta.n_bytes")).alias("total_bytes"),
    )


def modality_lake_stats_sql(table: str = "documents", modality: str = "image") -> str:
    idx = MODALITIES.index(modality)
    return f"""
    SELECT '{modality}' AS modality,
           count(*) AS n_assets,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes
    FROM {table} WHERE doc_id % 3 = {idx}
    """


def payload_dedup(mm: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Binary-payload exact dedup (m06): group assets by md5 of the RAW
    BYTES — the multimodal twin of the text path d01 (which hashes the
    decoded string).  An asset lake dedups on payload bytes before any
    decode: identical files under different ids are one storage object
    and one training example.  Output one row per distinct payload:
    keeper id (min), copy count, byte size.

    Scale shape: the digest is a projection; the rollup shuffles 16-byte
    digests + two longs, never payloads."""
    return (
        mm.select(
            F.col(id_col),
            F.md5(F.col("payload")).alias("digest"),
            F.octet_length(F.col("payload")).alias("n_bytes"),
        )
        .groupBy("digest")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
            F.min("n_bytes").cast("long").alias("n_bytes"),
        )
        .select("digest", "keep_id", "n_copies", "n_bytes")
    )


def payload_dedup_sql(table: str = "documents") -> str:
    """Oracle: payloads are UTF-8 text bytes here, so md5(text) replays the
    byte digest exactly."""
    return f"""
    SELECT md5(text) AS digest,
           min(doc_id) AS keep_id,
           count(*) AS n_copies,
           CAST(min(strlen(text)) AS BIGINT) AS n_bytes
    FROM {table}
    GROUP BY md5(text)
    """


FRAME_DUP_MIN_SHARED = 2  # frames two assets must share to pair
FRAME_DF_CAP = 100  # frames shared by more assets than this are boilerplate


def frame_dup_pairs(
    mm: DataFrame,
    min_shared: int = FRAME_DUP_MIN_SHARED,
    df_cap: int = FRAME_DF_CAP,
) -> DataFrame:
    """Perceptual near-duplicate pairs for video-like assets (m07): two
    assets pair when ≥ ``min_shared`` of their sampled frames carry the
    same fingerprint at the same frame position — the keyframe-overlap
    dedup a video lake runs (with the codec+pHash stubbed to the m02
    chunk-md5, so the Spark plumbing — frame explode, inverted index,
    banded self-join — is the real design and the oracle replays it).

    Scale shape: the self-join keys on (frame_no, frame_fp) — an inverted
    index over fingerprints, same anatomy as d05's shingle index — so
    only same-fingerprint assets ever meet; fingerprints shared by more
    than ``df_cap`` assets are dropped as boilerplate before pairing (the
    stop-shingle skew lever: a hot intro/outro frame would otherwise grow
    pairs quadratically).  Payload bytes never enter the join — frames
    reduce to 8-byte fingerprints at the mapInPandas boundary.

    Corpus note: the shipped synthetic documents are bag-of-words
    resamples (no byte-aligned duplicate runs), so this yields 0 pairs at
    the test SFs — the planted-asset unit test
    (tests/test_streaming_multimodal.py::test_frame_dup_pairs_planted)
    proves the pairing on frame-aligned copies and the boilerplate cap."""
    frames = frame_sample(mm).select("doc_id", "frame_no", "frame_fp")
    df = frames.groupBy("frame_no", "frame_fp").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    kept = frames.join(
        df.filter(F.col("n_docs") <= df_cap), ["frame_no", "frame_fp"]
    ).select("doc_id", "frame_no", "frame_fp")
    a = kept.select(
        F.col("doc_id").alias("doc_a"), "frame_no", "frame_fp"
    )
    b = kept.select(
        F.col("doc_id").alias("doc_b"), "frame_no", "frame_fp"
    )
    return (
        a.join(b, ["frame_no", "frame_fp"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def frame_dup_pairs_sql(
    table: str = "documents",
    min_shared: int = FRAME_DUP_MIN_SHARED,
    df_cap: int = FRAME_DF_CAP,
) -> str:
    return f"""
    WITH frames AS (
      SELECT doc_id, frame_no, frame_fp FROM ({frame_sample_sql(table)})
    ),
    df AS (
      SELECT frame_no, frame_fp, count(*) AS n_docs
      FROM frames GROUP BY 1, 2
    ),
    kept AS (
      SELECT f.doc_id, f.frame_no, f.frame_fp
      FROM frames f JOIN df ON df.frame_no = f.frame_no
                           AND df.frame_fp = f.frame_fp
      WHERE df.n_docs <= {df_cap}
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
    FROM kept a
    JOIN kept b ON b.frame_no = a.frame_no AND b.frame_fp = a.frame_fp
               AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING count(*) >= {min_shared}
    """


# ---------------------------------------------------------------------------
# Payload integrity audit (m08) — trust-but-verify on the asset lake
# ---------------------------------------------------------------------------

TAMPER_MOD = 83  # deterministic stale-metadata plant: doc_id % this == 0


def integrity_audit(mm: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Asset-lake integrity audit (m08): re-derive every asset's size and
    content hash FROM THE PAYLOAD BYTES and compare against the stored
    metadata — the trust-but-verify pass an asset lake runs before a
    training export, catching stale metadata, truncated uploads and
    bit-rot.  To make the audit itself testable, records with
    ``doc_id % TAMPER_MOD == 0`` get a deterministically staled byte count
    planted before checking; the audit must flag exactly those.

    Pure projection + filter over the lake scan (one md5 per payload,
    no shuffle at all until the tiny flagged set) — scan-speed at 100 TB,
    and the flagged output is the work list for re-ingestion."""
    staled = mm.select(
        F.col(id_col),
        F.col("payload"),
        F.struct(
            (
                F.col("meta.n_bytes")
                + F.when(F.col(id_col) % TAMPER_MOD == 0, F.lit(1)).otherwise(F.lit(0))
            ).alias("n_bytes"),
            F.col("meta.content_hash").alias("content_hash"),
            F.col("meta.mime").alias("mime"),
        ).alias("meta"),
    )
    n_bytes_ok = F.col("meta.n_bytes") == F.octet_length(F.col("payload"))
    hash_ok = F.col("meta.content_hash") == F.md5(F.col("payload"))
    return (
        staled.select(
            F.col(id_col),
            n_bytes_ok.alias("n_bytes_ok"),
            hash_ok.alias("hash_ok"),
        )
        .filter(~(F.col("n_bytes_ok") & F.col("hash_ok")))
    )


def integrity_audit_sql(table: str = "documents", tamper_mod: int = TAMPER_MOD) -> str:
    """Oracle: only the planted stale-size records violate (hash always
    re-derives equal on untampered payload bytes)."""
    return f"""
    SELECT doc_id, false AS n_bytes_ok, true AS hash_ok
    FROM {table}
    WHERE doc_id % {tamper_mod} = 0 AND text IS NOT NULL
    """


# ---------------------------------------------------------------------------
# Payload format sniffing (m09) — magic numbers vs declared mime
# ---------------------------------------------------------------------------

SNIFF_MOD = 9  # doc_id % SNIFF_MOD == 0 → planted PNG header (mislabeled asset)

_PNG_MAGIC = bytes([0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A])


def format_sniff_audit(mm: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Content-type SNIFFING audit (m08's sibling): derive each asset's
    real format from its MAGIC NUMBER (leading payload bytes) and flag
    rows whose declared mime disagrees — the mislabeled-asset catch
    (an image uploaded as ``text/plain`` crashes the decode stage of
    every downstream consumer; the lake must quarantine it at ingest).
    To prove the audit, records with ``doc_id % SNIFF_MOD == 0`` get a
    PNG header deterministically prepended; the audit must flag exactly
    those as declared-text/sniffed-png.

    Pure projection + filter (an 8-byte prefix compare per row, no
    shuffle until the tiny flagged set) — scan-speed at 100 TB, the same
    contract as m08."""
    planted = mm.select(
        F.col(id_col),
        F.when(
            F.col(id_col) % SNIFF_MOD == 0,
            F.concat(F.lit(_PNG_MAGIC), F.col("payload")),
        )
        .otherwise(F.col("payload"))
        .alias("payload"),
        F.col("meta.mime").alias("declared"),
    )
    prefix = F.hex(F.expr("substring(payload, 1, 8)"))
    sniffed = (
        F.when(prefix == F.lit("89504E470D0A1A0A"), F.lit("image/png"))
        .when(prefix.startswith("FFD8"), F.lit("image/jpeg"))
        .when(prefix.startswith("25504446"), F.lit("application/pdf"))
        .otherwise(F.lit("text/utf-8"))
    )
    return (
        planted.select(F.col(id_col), "declared", sniffed.alias("sniffed"))
        .filter(F.col("declared") != F.col("sniffed"))
    )


def format_sniff_audit_sql(table: str = "documents", mod: int = SNIFF_MOD) -> str:
    """Oracle: exactly the planted rows are flagged (untampered payloads
    are UTF-8 text whose leading bytes can never spell a magic number
    from the sniff list — '%' (0x25) and 0x89/0xFF are the only openers
    and text here never starts with '%PDF')."""
    return f"""
    SELECT doc_id, 'text/utf-8' AS declared, 'image/png' AS sniffed
    FROM {table}
    WHERE doc_id % {mod} = 0 AND text IS NOT NULL
    """


# ---------------------------------------------------------------------------
# Content-defined chunking (m10) — variable-boundary blob dedup
# ---------------------------------------------------------------------------

CDC_W = 8  # rolling-hash window (bytes)
CDC_B = 257  # polynomial base
CDC_P = 1_000_003  # hash modulus (prime)
CDC_D = 64  # boundary divisor → ~64-byte average chunks
_CDC_PW = [pow(CDC_B, j, CDC_P) for j in range(CDC_W)]


def cdc_chunks(mm: DataFrame, d: int = CDC_D) -> DataFrame:
    """CONTENT-DEFINED chunking (the LBFS/rsync/casync boundary rule):
    split each payload where a ``CDC_W``-byte polynomial rolling hash is
    ≡ 0 mod ``CDC_D``, so boundaries move WITH the content — insert one
    byte and only the chunk containing the edit changes, where d13's
    fixed-offset blocks would shift-invalidate every block after it.
    This is how binary/blob corpora (model checkpoints, video, crawl
    WARCs) dedup at scale.  Each chunk carries its fingerprint and the
    corpus-wide copy count of identical content.

    The byte loop is inherently per-byte work → Arrow-batched
    ``mapInPandas`` with a vectorized numpy fold (the real-codec slot, as
    m01-m04); the hash uses reduced powers B^j mod P so every term stays
    far inside int64 and the DuckDB oracle replays boundaries exactly
    over the ASCII codes (payload == UTF-8 text here).  Scale shape: the
    fan-out is rows→chunks (bounded by bytes/D), the census is one
    groupBy on the 8-hex fingerprint — d01's digest-only shuffle, never
    bodies."""

    def chunk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                bs = bytes(payload)
                n = len(bs)
                if n == 0:
                    continue
                starts = [0]
                if n >= CDC_W:
                    a = np.frombuffer(bs, dtype=np.uint8).astype(np.int64)
                    h = np.zeros(n - CDC_W + 1, dtype=np.int64)
                    for j in range(CDC_W):
                        h += a[j : n - CDC_W + 1 + j] * _CDC_PW[j]
                    h %= CDC_P
                    for i in np.nonzero(h % d == 0)[0] + (CDC_W - 1):
                        if i < n - 1:
                            starts.append(int(i) + 1)
                ends = starts[1:] + [n]
                for cno, (s, e) in enumerate(zip(starts, ends)):
                    fp = int(hashlib.md5(bs[s:e]).hexdigest()[:8], 16)
                    rows.append((doc_id, cno, s, e - s, fp))
            yield pd.DataFrame(
                rows, columns=["doc_id", "chunk_no", "start", "n_bytes", "fp"]
            )

    chunks = mm.mapInPandas(
        chunk,
        schema="doc_id long, chunk_no int, start int, n_bytes int, fp long",
    )
    from pyspark.sql import Window

    return chunks.withColumn(
        "n_copies", F.count(F.lit(1)).over(Window.partitionBy("fp")).cast("long")
    )


def cdc_chunks_sql(table: str = "documents", d: int = CDC_D) -> str:
    # term j of the window ending at 0-based position i reads 1-based list
    # index (i - CDC_W + 1 + j) + 1 = i - (CDC_W - 2) + j
    hash_terms = " + ".join(
        f"cs[i - {CDC_W - 2 - j}] * {_CDC_PW[j]}" for j in range(CDC_W)
    )
    return f"""
    WITH base AS MATERIALIZED (
      SELECT doc_id, text,
             list_transform(string_split(text, ''), c -> ascii(c)::BIGINT) AS cs,
             octet_length(encode(text)) AS n
      FROM {table} WHERE octet_length(encode(text)) > 0
    ),
    bounds AS (
      SELECT doc_id, i
      FROM base, unnest(range({CDC_W - 1}, n)) AS u(i)
      WHERE (({hash_terms}) % {CDC_P}) % {d} = 0 AND i < n - 1
    ),
    starts AS (
      SELECT doc_id, 0 AS s FROM base
      UNION ALL
      SELECT doc_id, i + 1 AS s FROM bounds
    ),
    chunks AS (
      SELECT st.doc_id, st.s,
             lead(st.s, 1, b.n) OVER (PARTITION BY st.doc_id ORDER BY st.s) AS e,
             row_number() OVER (PARTITION BY st.doc_id ORDER BY st.s) - 1
               AS chunk_no
      FROM starts st JOIN base b USING (doc_id)
    ),
    fps AS (
      SELECT doc_id,
             CAST(chunk_no AS INTEGER) AS chunk_no,
             CAST(s AS INTEGER) AS start,
             CAST(e - s AS INTEGER) AS n_bytes,
             ('0x' || substr(md5(substr(text, s + 1, e - s)), 1, 8))::BIGINT AS fp
      FROM chunks JOIN base USING (doc_id)
    )
    SELECT doc_id, chunk_no, start, n_bytes, fp,
           CAST(count(*) OVER (PARTITION BY fp) AS BIGINT) AS n_copies
    FROM fps
    """


# ---------------------------------------------------------------------------
# Shot-boundary detection (m11) — frame-difference cuts over the frame stream
# ---------------------------------------------------------------------------

SHOT_FRAMES = 16  # frames sampled per payload
SHOT_DELTA_PPM = 80_000  # mean-intensity jump (ppm of the 0-255 range) → cut


def shot_boundaries(mm: DataFrame, n_frames: int = SHOT_FRAMES) -> DataFrame:
    """SHOT-BOUNDARY detection, the video-curation primitive (scene-level
    dedup/sampling keys on shots, not raw frames): sample ``n_frames``
    contiguous byte ranges per payload (m02's keyframe anatomy), reduce
    each to an exact integer intensity profile, and flag a CUT wherever
    the mean intensity jumps by more than ``SHOT_DELTA_PPM`` between
    consecutive frames — the classic frame-difference detector with the
    pixel decode stubbed to byte values (the mapInPandas slot a real
    ffmpeg/PIL decoder drops into).

    Exactness: per-frame mean rides as mean_ppm = (sum·10⁶) div (255·len)
    — pure BIGINT — and the cut test compares |Δmean_ppm| to the
    threshold, so both engines flag identical frames.  Scale shape: frame
    extraction is Arrow-batched per-byte work; the consecutive-frame
    compare is ONE lag window partitioned by doc (frames-per-doc bounded,
    never corpus-wide); output one row per frame with its cut flag."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                bs = bytes(payload)
                n = len(bs)
                for f in range(n_frames):
                    lo = (n * f) // n_frames
                    hi = (n * (f + 1)) // n_frames
                    chunk = bs[lo:hi]
                    if not chunk:
                        continue
                    mean_ppm = (sum(chunk) * 1_000_000) // (255 * len(chunk))
                    rows.append((doc_id, f, len(chunk), mean_ppm))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_no", "frame_bytes", "mean_ppm"]
            )

    frames = mm.mapInPandas(
        stats,
        schema="doc_id long, frame_no int, frame_bytes int, mean_ppm long",
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("frame_no")
    delta = F.col("mean_ppm") - F.lag("mean_ppm").over(w)
    return frames.select(
        "doc_id",
        "frame_no",
        "frame_bytes",
        "mean_ppm",
        F.coalesce(F.abs(delta), F.lit(0)).cast("long").alias("delta_ppm"),
        (F.coalesce(F.abs(delta), F.lit(0)) > SHOT_DELTA_PPM)
        .cast("long")
        .alias("is_cut"),
    )


def shot_boundaries_sql(
    table: str = "documents", n_frames: int = SHOT_FRAMES
) -> str:
    """Oracle twin over ASCII codes: same integer frame boundaries, byte
    sums and ppm means, same lag compare."""
    selects = []
    for f in range(n_frames):
        lo = f"(octet_length(encode(text)) * {f}) // {n_frames}"
        hi = f"(octet_length(encode(text)) * {f + 1}) // {n_frames}"
        chunk = f"substr(text, ({lo}) + 1, ({hi}) - ({lo}))"
        selects.append(
            f"""SELECT doc_id, {f} AS frame_no,
                length({chunk}) AS frame_bytes,
                (list_reduce(list_prepend(0::BIGINT,
                   list_transform(string_split({chunk}, ''), c -> ascii(c)::BIGINT)),
                   (a, x) -> a + x) * 1000000) // (255 * length({chunk}))
                  AS mean_ppm
             FROM {table} WHERE length({chunk}) > 0"""
        )
    frames = " UNION ALL ".join(selects)
    return f"""
    WITH frames AS MATERIALIZED ({frames}),
    lagged AS (
      SELECT doc_id, frame_no, frame_bytes, mean_ppm,
             COALESCE(abs(mean_ppm - lag(mean_ppm) OVER (
               PARTITION BY doc_id ORDER BY frame_no)), 0) AS delta_ppm
      FROM frames
    )
    SELECT doc_id,
           CAST(frame_no AS INTEGER) AS frame_no,
           CAST(frame_bytes AS INTEGER) AS frame_bytes,
           CAST(mean_ppm AS BIGINT) AS mean_ppm,
           CAST(delta_ppm AS BIGINT) AS delta_ppm,
           CAST(CASE WHEN delta_ppm > {SHOT_DELTA_PPM} THEN 1 ELSE 0 END
                AS BIGINT) AS is_cut
    FROM lagged
    """


# ---------------------------------------------------------------------------
# Active-segment extraction (m12) — VAD-shaped gaps-and-islands over windows
# ---------------------------------------------------------------------------


def active_segments(mm: DataFrame) -> DataFrame:
    """ACTIVE-SEGMENT extraction (the shape of voice-activity detection /
    silence trimming): m04's overlapping energy windows, a window flagged
    ACTIVE when its per-sample energy exceeds the payload's own average
    (cross-multiplied — ``energy·tot_samples > tot_energy·n_samples``,
    pure BIGINT, no ratio float), and consecutive active windows merged
    into segments by gaps-and-islands (island id = win_no − active-rank,
    the e29 interval trick).  Audio curation cuts on exactly these
    segments: train on speech, drop silence/noise floors.

    Shape: the Arrow-batched window stage is m04's; per-payload totals are
    ONE aggregate window over the doc partition; islands one ordered
    window + rollup — frames-per-doc bounded, never corpus-wide."""
    from pyspark.sql import Window

    wins = audio_windows(mm)
    doc_w = Window.partitionBy("doc_id")
    flagged = wins.select(
        "doc_id",
        "win_no",
        "energy",
        "n_samples",
        (
            F.col("energy") * F.sum("n_samples").over(doc_w)
            > F.sum("energy").over(doc_w) * F.col("n_samples")
        ).alias("active"),
    ).filter(F.col("active"))
    ordered = Window.partitionBy("doc_id").orderBy("win_no")
    islands = flagged.withColumn(
        "island", F.col("win_no") - F.row_number().over(ordered)
    )
    return (
        islands.groupBy("doc_id", "island")
        .agg(
            F.min("win_no").cast("long").alias("start_win"),
            F.count(F.lit(1)).cast("long").alias("n_windows"),
            F.sum("energy").cast("long").alias("seg_energy"),
        )
        .withColumn(
            "seg_no",
            F.row_number()
            .over(Window.partitionBy("doc_id").orderBy("start_win"))
            .cast("long"),
        )
        .select("doc_id", "seg_no", "start_win", "n_windows", "seg_energy")
    )


def active_segments_sql(
    table: str = "documents", win: int = AUDIO_WIN, hop: int = AUDIO_HOP
) -> str:
    return f"""
    WITH wins AS MATERIALIZED ({audio_windows_sql(table, win, hop)}),
    tot AS (
      SELECT doc_id, sum(energy) AS tot_energy, sum(n_samples) AS tot_samples
      FROM wins GROUP BY doc_id
    ),
    flagged AS (
      SELECT w.doc_id, w.win_no, w.energy
      FROM wins w JOIN tot t USING (doc_id)
      WHERE w.energy * t.tot_samples > t.tot_energy * w.n_samples
    ),
    islands AS (
      SELECT doc_id, win_no, energy,
             win_no - row_number() OVER (PARTITION BY doc_id ORDER BY win_no)
               AS island
      FROM flagged
    ),
    segs AS (
      SELECT doc_id, island,
             CAST(min(win_no) AS BIGINT) AS start_win,
             CAST(count(*) AS BIGINT) AS n_windows,
             CAST(sum(energy) AS BIGINT) AS seg_energy
      FROM islands GROUP BY doc_id, island
    )
    SELECT doc_id,
           CAST(row_number() OVER (PARTITION BY doc_id ORDER BY start_win)
                AS BIGINT) AS seg_no,
           start_win, n_windows, seg_energy
    FROM segs
    """


# ---------------------------------------------------------------------------
# Perceptual average-hash near-dup (m13)

AHASH_BITS = 60  # fits a non-negative BIGINT; 4 bands x 15 bits
AHASH_BANDS = 4
AHASH_BAND_BITS = AHASH_BITS // AHASH_BANDS
AHASH_MAX_HAMMING = 10
AHASH_DF_CAP = 64  # band values shared by more docs are boilerplate


def _ahash(payload: bytes) -> int | None:
    """aHash (average hash) over AHASH_BITS samples of the payload: sample
    i is the byte at floor(i*L/bits); bit i is set when the sample beats
    the sample mean (strict, via cross-multiplication - no float)."""
    if payload is None or len(payload) == 0:
        return None
    n = len(payload)
    samples = [payload[i * n // AHASH_BITS] for i in range(AHASH_BITS)]
    total = sum(samples)
    h = 0
    for i, s in enumerate(samples):
        if AHASH_BITS * s > total:
            h |= 1 << (AHASH_BITS - 1 - i)
    return h


def ahash_fingerprints(mm: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-asset perceptual average-hash: the image-dedup fingerprint
    (aHash: downsample to a fixed grid, threshold each cell at the mean)
    computed over payload BYTES at the Arrow mapInPandas boundary - the
    decode stage where a real pipeline would first rasterize with
    PIL/libvips and hash the pixel grid (m01's documented stub posture:
    codecs are absent here, the plumbing and banding are the real
    design).  Unlike m02/m07's chunk-md5 (exact bytes), aHash survives
    brightness-style monotone shifts in most cells and small local edits,
    because each bit only compares a sample to the asset's own mean."""

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "ahash": pdf["payload"].map(_ahash),
                }
            )
            yield out[out["ahash"].notna()]

    return mm.mapInPandas(hash_batch, schema=f"{id_col} long, ahash long")


def ahash_fingerprints_sql(table: str = "documents") -> str:
    b = AHASH_BITS
    return f"""
    SELECT doc_id,
           CAST((
             SELECT sum(CASE WHEN {b} * ascii(substr(t.text, (u.i * strlen(t.text)) // {b} + 1, 1)) >
                    (SELECT sum(ascii(substr(t.text, (v.i * strlen(t.text)) // {b} + 1, 1)))
                     FROM unnest(range(0, {b})) AS v(i))
               THEN (1::BIGINT << ({b} - 1 - u.i)) ELSE 0 END)
             FROM unnest(range(0, {b})) AS u(i)
           ) AS BIGINT) AS ahash
    FROM {table} t
    WHERE text IS NOT NULL AND strlen(text) > 0
    """


def ahash_pairs(
    mm: DataFrame,
    max_hamming: int = AHASH_MAX_HAMMING,
    df_cap: int = AHASH_DF_CAP,
) -> DataFrame:
    """Perceptual near-dup pairs by banded aHash: candidates share at
    least one exact {AHASH_BAND_BITS}-bit band (d04's SimHash banding on
    the visual fingerprint), verified by full Hamming distance
    (bit_count(xor)) <= ``max_hamming``.

    Scale anatomy: the corpus reduces to (doc_id, 8-byte hash) at the
    Arrow boundary - payloads never join; candidate generation is a
    (band_no, band_value) equi-join with a DF cap dropping boilerplate
    bands (flat assets hash to all-zeros; without the cap that band pairs
    quadratically - m07's stop-fingerprint lever); verification is a
    single integer instruction per candidate."""
    fp = ahash_fingerprints(mm)
    shift = [AHASH_BITS - AHASH_BAND_BITS * (j + 1) for j in range(AHASH_BANDS)]
    bands = fp.select(
        "doc_id",
        "ahash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band_no"),
                        F.expr(
                            f"(ahash div {1 << shift[j]}) % {1 << AHASH_BAND_BITS}"
                        ).alias("band_val"),
                    )
                    for j in range(AHASH_BANDS)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "ahash", F.col("b.band_no"), F.col("b.band_val"))
    df = bands.groupBy("band_no", "band_val").agg(F.count(F.lit(1)).alias("n_docs"))
    kept = bands.join(
        df.filter(F.col("n_docs") <= df_cap), ["band_no", "band_val"]
    )
    a = kept.select(
        "band_no", "band_val", F.col("doc_id").alias("doc_a"), F.col("ahash").alias("h_a")
    )
    b = kept.select(
        "band_no", "band_val", F.col("doc_id").alias("doc_b"), F.col("ahash").alias("h_b")
    )
    return (
        a.join(b, ["band_no", "band_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "h_a", "h_b")
        .distinct()
        .select(
            "doc_a",
            "doc_b",
            F.expr("bit_count(h_a ^ h_b)").cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def ahash_pairs_sql(
    table: str = "documents",
    max_hamming: int = AHASH_MAX_HAMMING,
    df_cap: int = AHASH_DF_CAP,
) -> str:
    shifts = [
        AHASH_BITS - AHASH_BAND_BITS * (j + 1) for j in range(AHASH_BANDS)
    ]
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, ahash, {j} AS band_no, "
        f"(ahash // {1 << shifts[j]}) % {1 << AHASH_BAND_BITS} AS band_val FROM fp"
        for j in range(AHASH_BANDS)
    )
    return f"""
    WITH fp AS MATERIALIZED ({ahash_fingerprints_sql(table)}),
    bands AS ({band_rows}),
    df AS (
      SELECT band_no, band_val, count(*) AS n_docs
      FROM bands GROUP BY 1, 2
    ),
    kept AS (
      SELECT b.* FROM bands b
      JOIN df USING (band_no, band_val)
      WHERE df.n_docs <= {df_cap}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                      a.ahash AS h_a, b.ahash AS h_b
      FROM kept a JOIN kept b USING (band_no, band_val)
      WHERE a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(h_a, h_b)) AS BIGINT) AS hamming
    FROM cand
    WHERE bit_count(xor(h_a, h_b)) <= {max_hamming}
    """


# ---------------------------------------------------------------------------
# Cross-modal alignment audit (m14)


def pair_alignment(docs: DataFrame, embeddings: DataFrame) -> DataFrame:
    """Cross-modal alignment audit: FULL OUTER join of the text corpus and
    the embedding store on id, classified into paired / text-only /
    embedding-only with ppm shares - the pre-flight integrity check
    before any contrastive or retrieval training run (every CLIP-style
    pair loader assumes alignment; this measures it instead).  m05
    inventories each modality lake separately; this is the join between
    them, and a nonzero text-only share is exactly the re-embedding
    backlog.

    Scale anatomy: both sides reduce to ID-ONLY frames before the join -
    payload bytes and float vectors never shuffle; the outer join keys on
    the id and the classification is a null-pattern projection folded to
    a 3-row rollup."""
    d = docs.select(F.col("doc_id").alias("d_id"))
    e = embeddings.select(F.col("vec_id").alias("v_id"))
    joined = d.join(e, F.col("d_id") == F.col("v_id"), "full_outer")
    classified = joined.select(
        F.when(F.col("d_id").isNotNull() & F.col("v_id").isNotNull(), "paired")
        .when(F.col("d_id").isNotNull(), "text_only")
        .otherwise("embedding_only")
        .alias("category")
    )
    counts = classified.groupBy("category").agg(F.count(F.lit(1)).alias("n_rows"))
    total = counts.agg(F.sum("n_rows").alias("total_rows")).filter(
        F.coalesce(F.col("total_rows"), F.lit(0)) > 0
    )
    return counts.crossJoin(F.broadcast(total)).select(
        "category",
        "n_rows",
        F.expr("(n_rows * 1000000) div total_rows").alias("share_ppm"),
    )


def pair_alignment_sql(
    doc_table: str = "documents", emb_table: str = "embeddings"
) -> str:
    return f"""
    WITH d AS (SELECT doc_id AS d_id FROM {doc_table}),
    e AS (SELECT vec_id AS v_id FROM {emb_table}),
    classified AS (
      SELECT CASE WHEN d_id IS NOT NULL AND v_id IS NOT NULL THEN 'paired'
                  WHEN d_id IS NOT NULL THEN 'text_only'
                  ELSE 'embedding_only' END AS category
      FROM d FULL OUTER JOIN e ON d_id = v_id
    ),
    counts AS (SELECT category, count(*) AS n_rows FROM classified GROUP BY category),
    total AS (
      SELECT CAST(sum(n_rows) AS BIGINT) AS total_rows FROM counts
      HAVING sum(n_rows) > 0
    )
    SELECT category, n_rows, (n_rows * 1000000) // total_rows AS share_ppm
    FROM counts, total
    """
