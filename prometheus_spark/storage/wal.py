"""Read the reference's write-ahead log (the head block's recent data)
into the canonical samples frame — together with storage.tsdb_block
this covers a complete live Prometheus data directory.

Format (tsdb/docs/format/wal.md + tsdb/wlog, tsdb/record/record.go):
segments of 32 KiB pages; each record fragment is
``type<1> len<2BE> crc32c<4BE> data``, where the type byte carries the
fragment kind (full/first/middle/last) in its low 3 bits and snappy /
zstd compression flags in bits 3-4.  Record payloads:
- Series (1): repeated ``ref<8BE>`` + uvarint-prefixed label strings.
- Samples (2): base ``ref<8BE> t<8BE>`` then rows of signed-varint
  ref/t deltas + float64 bits (record.go:346-356 — the doc says
  uvarint, the implementation is Varint64).
- Tombstones (3) and Exemplars (4) per their layouts.
- Histogram samples (7/8) and their custom-bucket variants (9/10):
  samples framing + EncodeHistogram payloads.
- V2 start-timestamp records (11/12/13): varint first-sample header
  and a per-sample ST marker byte (record.go:963-966).
Every sample-bearing record kind lands in the canonical samples frame;
metadata records (6) resolve through :func:`read_wal_metadata`, and
mmap-marker records (5) are skipped (they only coordinate head-chunk
truncation).

Scale: segments parse independently on executors (``mapInPandas`` over
the segment list); series→label resolution is a broadcast join of the
(tiny) series-record side against the sample rows, so WAL volume
scales with the cluster, not the driver.
"""

from __future__ import annotations

import json
import os
import struct
from typing import Iterator

WAL_PAGE = 32 * 1024

_FRAG_FULL, _FRAG_FIRST, _FRAG_MIDDLE, _FRAG_LAST = 1, 2, 3, 4
_SNAPPY_FLAG = 0x08
_ZSTD_FLAG = 0x10

REC_SERIES, REC_SAMPLES, REC_TOMBSTONES, REC_EXEMPLARS = 1, 2, 3, 4


def _uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    out = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7


def _varint(buf: bytes, pos: int) -> tuple[int, int]:
    u, pos = _uvarint(buf, pos)
    return (u >> 1) ^ -(u & 1), pos


def wal_records(segment_bytes: bytes) -> Iterator[bytes]:
    """Reassembled records from one segment (fragment framing +
    per-fragment crc + optional snappy decompression)."""
    pos = 0
    partial = bytearray()
    n = len(segment_bytes)
    while pos < n:
        page_end = min(pos - pos % WAL_PAGE + WAL_PAGE, n)
        while pos < page_end:
            t = segment_bytes[pos]
            if t == 0:  # rest of page empty
                pos = page_end
                break
            frag = t & 0x07
            compressed = t & _SNAPPY_FLAG
            if t & _ZSTD_FLAG:
                raise ValueError("zstd-compressed WAL is not supported")
            ln, crc = struct.unpack_from(">HI", segment_bytes, pos + 1)
            data = segment_bytes[pos + 7 : pos + 7 + ln]
            pos += 7 + ln
            if frag in (_FRAG_FULL, _FRAG_FIRST):
                partial = bytearray(data)
            else:
                partial += data
            if frag in (_FRAG_FULL, _FRAG_LAST):
                rec = bytes(partial)
                if compressed:
                    from prometheus_spark.sources.remote_write import (
                        snappy_decode,
                    )

                    rec = snappy_decode(rec)
                yield rec


def decode_series_record(rec: bytes) -> list[tuple[int, dict]]:
    out = []
    pos = 1
    while pos < len(rec):
        (ref,) = struct.unpack_from(">Q", rec, pos)
        pos += 8
        n, pos = _uvarint(rec, pos)
        labels = {}
        for _ in range(n):
            kl, pos = _uvarint(rec, pos)
            k = rec[pos : pos + kl].decode("utf-8")
            pos += kl
            vl, pos = _uvarint(rec, pos)
            v = rec[pos : pos + vl].decode("utf-8")
            pos += vl
            labels[k] = v
        out.append((ref, labels))
    return out


def decode_samples_record(rec: bytes) -> list[tuple[int, int, float]]:
    if len(rec) <= 17:
        return []
    base_ref, base_t = struct.unpack_from(">Qq", rec, 1)
    pos = 17
    out = []
    while pos < len(rec):
        dref, pos = _varint(rec, pos)
        dt, pos = _varint(rec, pos)
        (bits,) = struct.unpack_from(">Q", rec, pos)
        pos += 8
        out.append(
            (base_ref + dref, base_t + dt,
             struct.unpack(">d", struct.pack(">Q", bits))[0])
        )
    return out


def decode_tombstones_record(rec: bytes) -> list[tuple[int, int, int]]:
    out = []
    pos = 1
    while pos < len(rec):
        (ref,) = struct.unpack_from(">Q", rec, pos)
        pos += 8
        mint, pos = _varint(rec, pos)
        maxt, pos = _varint(rec, pos)
        out.append((ref, mint, maxt))
    return out


def wal_segments(data_dir: str) -> list[str]:
    """Segment files in replay order: checkpoint dirs first (oldest
    surviving state), then numbered live segments (wlog/wlog.go)."""
    wal_dir = os.path.join(data_dir, "wal")
    if not os.path.isdir(wal_dir):
        wal_dir = data_dir  # caller pointed directly at a wal dir
    segs = []
    for name in sorted(os.listdir(wal_dir)):
        path = os.path.join(wal_dir, name)
        if name.startswith("checkpoint.") and os.path.isdir(path):
            segs.extend(
                os.path.join(path, s)
                for s in sorted(os.listdir(path))
                if s.isdigit()
            )
    segs.extend(
        os.path.join(wal_dir, s)
        for s in sorted(os.listdir(wal_dir))
        if s.isdigit()
    )
    return segs


def read_wal(spark, data_dir: str):
    """The WAL as the canonical samples frame (sig, name, labels, t,
    value, hist, stale, st) — float, histogram, custom-bucket, and V2
    start-timestamp records included.  Tombstone records are applied as
    interval filters."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from prometheus_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    segs = wal_segments(data_dir)
    if not segs:
        raise FileNotFoundError(f"no WAL segments under {data_dir}")
    sdf = spark.createDataFrame([(s,) for s in segs], "path string")

    hist_fields = (
        "h_schema int, h_zt double, h_zc double, h_count double, "
        "h_sum double, h_pos_off array<int>, h_pos_len array<int>, "
        "h_pos_bkt array<double>, h_neg_off array<int>, "
        "h_neg_len array<int>, h_neg_bkt array<double>, "
        "h_custom array<double>, h_hint int"
    )
    out_schema = T._parse_datatype_string(
        "kind string, ref long, t long, value double, labels_json string, "
        "mint long, maxt long, " + hist_fields + ", st long"
    )

    def parse(batches: Iterator) -> Iterator:
        import pandas as pd

        from prometheus_spark.storage.wal import (
            REC_CB_FLOAT_HISTOGRAM_SAMPLES,
            REC_CB_HISTOGRAM_SAMPLES,
            REC_FLOAT_HISTOGRAM_SAMPLES,
            REC_HISTOGRAM_SAMPLES,
            REC_HISTOGRAM_SAMPLES_V2,
            REC_FLOAT_HISTOGRAM_SAMPLES_V2,
            REC_SAMPLES,
            REC_SAMPLES_V2,
            REC_SERIES,
            REC_TOMBSTONES,
            decode_histogram_samples_record,
            decode_histogram_samples_v2_record,
            decode_samples_record,
            decode_samples_v2_record,
            decode_series_record,
            decode_tombstones_record,
            wal_records,
        )

        for pdf in batches:
            rows = []
            for path in pdf["path"]:
                with open(path, "rb") as f:
                    seg = f.read()
                pad = (None,) * 13
                for rec in wal_records(seg):
                    rt = rec[0] if rec else 0
                    def hist_fields_of(h):
                        return (
                            int(h["schema"]),
                            float(h["zero_threshold"]),
                            float(h["zero_count"]), float(h["count"]),
                            float(h["sum"]),
                            [int(x["offset"]) for x in h["pos_spans"]],
                            [int(x["length"]) for x in h["pos_spans"]],
                            [float(x) for x in h["pos_buckets"]],
                            [int(x["offset"]) for x in h["neg_spans"]],
                            [int(x["length"]) for x in h["neg_spans"]],
                            [float(x) for x in h["neg_buckets"]],
                            [float(x) for x in h["custom_values"]],
                            int(h["counter_reset_hint"]),
                        )

                    if rt == REC_SERIES:
                        for ref, labels in decode_series_record(rec):
                            rows.append(
                                ("series", ref, None, None,
                                 json.dumps(labels, sort_keys=True),
                                 None, None) + pad + (None,)
                            )
                    elif rt == REC_SAMPLES:
                        for ref, t, v in decode_samples_record(rec):
                            rows.append(
                                ("sample", ref, t, v, None, None, None)
                                + pad + (None,)
                            )
                    elif rt == REC_SAMPLES_V2:
                        for ref, st, t, v in decode_samples_v2_record(rec):
                            rows.append(
                                ("sample", ref, t, v, None, None, None)
                                + pad + (st or None,)
                            )
                    elif rt in (REC_HISTOGRAM_SAMPLES,
                                REC_FLOAT_HISTOGRAM_SAMPLES,
                                REC_CB_HISTOGRAM_SAMPLES,
                                REC_CB_FLOAT_HISTOGRAM_SAMPLES):
                        for ref, t, h in decode_histogram_samples_record(rec):
                            rows.append(
                                ("hsample", ref, t, None, None, None, None)
                                + hist_fields_of(h) + (None,)
                            )
                    elif rt in (REC_HISTOGRAM_SAMPLES_V2,
                                REC_FLOAT_HISTOGRAM_SAMPLES_V2):
                        for ref, st, t, h in (
                            decode_histogram_samples_v2_record(rec)
                        ):
                            rows.append(
                                ("hsample", ref, t, None, None, None, None)
                                + hist_fields_of(h) + (st or None,)
                            )
                    elif rt == REC_TOMBSTONES:
                        for ref, mint, maxt in decode_tombstones_record(rec):
                            rows.append(
                                ("tomb", ref, None, None, None, mint, maxt)
                                + pad + (None,)
                            )
            yield pd.DataFrame(
                rows, columns=[f.name for f in out_schema.fields]
            ).astype(object)

    raw = sdf.mapInPandas(parse, out_schema).cache()

    series = (
        raw.filter("kind = 'series'")
        .select("ref", "labels_json")
        .dropDuplicates(["ref"])
    )
    tombs = raw.filter("kind = 'tomb'").select(
        F.col("ref").alias("tref"), "mint", "maxt"
    )
    samples = raw.filter("kind IN ('sample', 'hsample')").drop(
        "labels_json", "mint", "maxt"
    )
    joined = samples.join(F.broadcast(series), "ref").join(
        F.broadcast(tombs),
        (F.col("ref") == F.col("tref"))
        & (F.col("t") >= F.col("mint"))
        & (F.col("t") <= F.col("maxt")),
        "left_anti",
    )

    from prometheus_spark.model.labels import sig_sql
    from prometheus_spark.model.schema import HISTOGRAM_TYPE

    htype = HISTOGRAM_TYPE.simpleString()
    hist = (
        "CASE WHEN kind = 'hsample' THEN named_struct("
        "'schema', h_schema, 'zero_threshold', h_zt, 'zero_count', h_zc, "
        "'count', h_count, 'sum', h_sum, "
        "'pos_spans', arrays_zip(h_pos_off, h_pos_len), "
        "'pos_buckets', h_pos_bkt, "
        "'neg_spans', arrays_zip(h_neg_off, h_neg_len), "
        "'neg_buckets', h_neg_bkt, 'custom_values', h_custom, "
        "'counter_reset_hint', CAST(h_hint AS TINYINT)) END"
    )
    return (
        joined.withColumn(
            "labels",
            F.from_json(
                "labels_json", T.MapType(T.StringType(), T.StringType())
            ),
        )
        .selectExpr(
            f"{sig_sql('labels')} AS sig",
            "element_at(labels, '__name__') AS name",
            "labels",
            "t",
            "CAST(value AS DOUBLE) AS value",
            f"CAST({hist} AS {htype}) AS hist",
            "false AS stale",
            "CAST(st AS LONG) AS st",
        )
    )


# --- minimal segment writer (round-trip interop) ------------------------


def _enc_uvarint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _enc_varint(v: int) -> bytes:
    return _enc_uvarint((v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1)


def encode_series_record(series: list[tuple[int, dict]]) -> bytes:
    out = bytearray([REC_SERIES])
    for ref, labels in series:
        out += struct.pack(">Q", ref)
        out += _enc_uvarint(len(labels))
        for k in sorted(labels):
            kb, vb = k.encode(), labels[k].encode()
            out += _enc_uvarint(len(kb)) + kb
            out += _enc_uvarint(len(vb)) + vb
    return bytes(out)


def encode_samples_record(samples: list[tuple[int, int, float]]) -> bytes:
    """(ref, t_ms, value) rows → one Samples record (record.go Samples:
    8-byte base ref/time, then signed-varint deltas + float64 bits)."""
    if not samples:
        return bytes([REC_SAMPLES])
    base_ref, base_t, _ = samples[0]
    out = bytearray([REC_SAMPLES]) + struct.pack(">Qq", base_ref, base_t)
    for ref, t, v in samples:
        out += _enc_varint(ref - base_ref)
        out += _enc_varint(t - base_t)
        out += struct.pack(">Q", struct.unpack(">Q", struct.pack(">d", v))[0])
    return bytes(out)


def write_wal_segment(path: str, records: list[bytes]) -> None:
    """Page-structured segment: records split into fragments at 32 KiB
    page boundaries, zero padding when a page can't fit a header+byte."""
    from prometheus_spark.sources.remote_read import _crc32c

    buf = bytearray()

    def room() -> int:
        return WAL_PAGE - (len(buf) % WAL_PAGE)

    for rec in records:
        pos, first = 0, True
        while pos < len(rec) or first:
            if room() < 8:  # not enough for a header + any payload
                buf.extend(b"\0" * room())
            take = min(len(rec) - pos, room() - 7)
            frag = rec[pos : pos + take]
            pos += take
            last = pos >= len(rec)
            if first and last:
                kind = _FRAG_FULL
            elif first:
                kind = _FRAG_FIRST
            elif last:
                kind = _FRAG_LAST
            else:
                kind = _FRAG_MIDDLE
            buf.append(kind)
            buf += struct.pack(">HI", len(frag), _crc32c(frag))
            buf += frag
            first = False
    with open(path, "wb") as f:
        f.write(bytes(buf))


# --- head chunks (chunks_head/) -----------------------------------------
#
# tsdb/docs/format/head_chunks.md: same segment framing as block chunks
# but each chunk is self-describing (series ref + mint/maxt inline, no
# index); the encoding byte's top bit flags out-of-order chunks.

HEAD_CHUNKS_MAGIC = 0x0130BC91


def head_chunk_entries(seg: bytes) -> Iterator[tuple[int, int, int, int, bytes]]:
    """(series_ref, mint, maxt, encoding, data) per chunk in a
    chunks_head segment."""
    magic, _version = struct.unpack_from(">IB", seg, 0)
    if magic != HEAD_CHUNKS_MAGIC:
        raise ValueError(f"not a head-chunks segment: magic {magic:#x}")
    pos, n = 8, len(seg)
    while pos + 25 <= n:
        ref, mint, maxt = struct.unpack_from(">QQQ", seg, pos)
        if ref == 0 and mint == 0 and maxt == 0:
            break  # zero tail padding
        enc = seg[pos + 24]
        ln, dpos = _uvarint(seg, pos + 25)
        data = seg[dpos : dpos + ln]
        pos = dpos + ln + 4  # skip crc
        yield ref, int(mint), int(maxt), enc & 0x7F, data


def read_head_chunks(spark, data_dir: str, series_labels):
    """chunks_head/ segments as the canonical float samples frame.
    ``series_labels``: {series_ref: labels dict} (from the WAL's series
    records — the head has no index of its own)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from prometheus_spark.model.labels import sig_sql
    from prometheus_spark.model.schema import HISTOGRAM_TYPE
    from prometheus_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    head_dir = os.path.join(data_dir, "chunks_head")
    segs = sorted(
        os.path.join(head_dir, s)
        for s in os.listdir(head_dir)
        if s.isdigit()
    )
    sdf = spark.createDataFrame([(s,) for s in segs], "path string")
    labels_b = spark.sparkContext.broadcast(
        {int(k): json.dumps(v, sort_keys=True) for k, v in series_labels.items()}
    )
    out_schema = T._parse_datatype_string(
        "labels_json string, t long, value double"
    )

    def parse(batches: Iterator) -> Iterator:
        import pandas as pd

        from prometheus_spark.storage.tsdb_block import decode_chunk
        from prometheus_spark.storage.wal import head_chunk_entries

        lookup = labels_b.value
        for pdf in batches:
            rows = []
            for path in pdf["path"]:
                with open(path, "rb") as f:
                    seg = f.read()
                for ref, _mint, _maxt, enc, data in head_chunk_entries(seg):
                    lbl = lookup.get(int(ref))
                    if lbl is None:
                        continue  # series truncated out of the WAL
                    for t, v in decode_chunk(enc, data):
                        if not isinstance(v, dict):
                            rows.append((lbl, t, float(v)))
            yield pd.DataFrame(
                rows, columns=["labels_json", "t", "value"]
            ).astype(object)

    htype = HISTOGRAM_TYPE.simpleString()
    return (
        sdf.mapInPandas(parse, out_schema)
        .withColumn(
            "labels",
            F.from_json(
                "labels_json", T.MapType(T.StringType(), T.StringType())
            ),
        )
        .selectExpr(
            f"{sig_sql('labels')} AS sig",
            "element_at(labels, '__name__') AS name",
            "labels",
            "t",
            "CAST(value AS DOUBLE) AS value",
            f"CAST(NULL AS {htype}) AS hist",
            "false AS stale",
            "CAST(NULL AS LONG) AS st",
        )
    )


def wal_series_map(data_dir: str) -> dict[int, dict]:
    """Driver-side skim of the WAL for series records only (the head
    chunks' ref→labels index; sample records are skipped unscanned)."""
    out: dict[int, dict] = {}
    for path in wal_segments(data_dir):
        with open(path, "rb") as f:
            seg = f.read()
        for rec in wal_records(seg):
            if rec and rec[0] == REC_SERIES:
                out.update(decode_series_record(rec))
    return out


# --- exemplar records (type 4) ------------------------------------------


def decode_exemplars_record(rec: bytes) -> list[tuple[int, int, float, dict]]:
    """(series_ref, t_ms, value, exemplar_labels) rows (record.go
    ExemplarsFromBuffer: samples layout + a label set per row)."""
    if len(rec) <= 17:
        return []
    base_ref, base_t = struct.unpack_from(">Qq", rec, 1)
    pos = 17
    out = []
    while pos < len(rec):
        dref, pos = _varint(rec, pos)
        dt, pos = _varint(rec, pos)
        (bits,) = struct.unpack_from(">Q", rec, pos)
        pos += 8
        n, pos = _uvarint(rec, pos)
        labels = {}
        for _ in range(n):
            kl, pos = _uvarint(rec, pos)
            k = rec[pos : pos + kl].decode("utf-8")
            pos += kl
            vl, pos = _uvarint(rec, pos)
            labels[k] = rec[pos : pos + vl].decode("utf-8")
            pos += vl
        out.append(
            (base_ref + dref, base_t + dt,
             struct.unpack(">d", struct.pack(">Q", bits))[0], labels)
        )
    return out


def encode_exemplars_record(
    exemplars: list[tuple[int, int, float, dict]],
) -> bytes:
    if not exemplars:
        return bytes([REC_EXEMPLARS])
    base_ref, base_t, _, _ = exemplars[0]
    out = bytearray([REC_EXEMPLARS]) + struct.pack(">Qq", base_ref, base_t)
    for ref, t, v, labels in exemplars:
        out += _enc_varint(ref - base_ref) + _enc_varint(t - base_t)
        out += struct.pack(">Q", struct.unpack(">Q", struct.pack(">d", v))[0])
        out += _enc_uvarint(len(labels))
        for k in sorted(labels):
            kb, vb = k.encode(), labels[k].encode()
            out += _enc_uvarint(len(kb)) + kb + _enc_uvarint(len(vb)) + vb
    return bytes(out)


def read_wal_exemplars(spark, data_dir: str):
    """WAL exemplar records as the canonical exemplar frame
    (storage.exemplars.EXEMPLAR_SCHEMA) — series labels resolved
    through the WAL's series records, so /api/v1/query_exemplars can
    serve straight from a native data dir."""
    from prometheus_spark.storage.exemplars import exemplars_from_rows

    series = wal_series_map(data_dir)
    rows = []
    for path in wal_segments(data_dir):
        with open(path, "rb") as f:
            seg = f.read()
        for rec in wal_records(seg):
            if rec and rec[0] == REC_EXEMPLARS:
                for ref, t, v, exl in decode_exemplars_record(rec):
                    slabels = series.get(ref)
                    if slabels is not None:
                        rows.append((slabels, t, exl, v, t))
    return exemplars_from_rows(spark, rows)


# --- histogram sample records (types 7/8) --------------------------------

REC_HISTOGRAM_SAMPLES, REC_FLOAT_HISTOGRAM_SAMPLES = 7, 8
# record.go:57-60 — custom-bucket (NHCB) histograms travel in their own
# record types with the IDENTICAL payload layout; the reference's encoder
# splits a mixed batch into one exponential and one custom-buckets record
REC_CB_HISTOGRAM_SAMPLES, REC_CB_FLOAT_HISTOGRAM_SAMPLES = 9, 10

_NHCB_SCHEMA = -53  # histogram.IsCustomBucketsSchema


def _decode_hist_struct(rec: bytes, pos: int, as_float: bool):
    """record.go DecodeHistogram/DecodeFloatHistogram → (model-
    convention hist dict, new pos).  Integer buckets arrive as deltas
    and convert to the absolute float convention of the samples frame."""
    hint = rec[pos]
    pos += 1
    schema, pos = _varint(rec, pos)
    (zt_bits,) = struct.unpack_from(">Q", rec, pos)
    pos += 8
    zt = struct.unpack(">d", struct.pack(">Q", zt_bits))[0]

    def f64(p):
        (b,) = struct.unpack_from(">Q", rec, p)
        return struct.unpack(">d", struct.pack(">Q", b))[0], p + 8

    if as_float:
        zc, pos = f64(pos)
        cnt, pos = f64(pos)
    else:
        zc, pos = _uvarint(rec, pos)
        cnt, pos = _uvarint(rec, pos)
    s, pos = f64(pos)

    def spans(p):
        n, p = _uvarint(rec, p)
        out = []
        for _ in range(n):
            off, p = _varint(rec, p)
            ln, p = _uvarint(rec, p)
            out.append({"offset": off, "length": ln})
        return out, p

    pos_spans, pos = spans(pos)
    neg_spans, pos = spans(pos)

    def buckets(p):
        n, p = _uvarint(rec, p)
        out = []
        if as_float:
            for _ in range(n):
                v, p = f64(p)
                out.append(v)
        else:
            run = 0
            for _ in range(n):
                d, p = _varint(rec, p)
                run += d
                out.append(float(run))
        return out, p

    pos_b, pos = buckets(pos)
    neg_b, pos = buckets(pos)
    custom = []
    if schema == _NHCB_SCHEMA:
        n, pos = _uvarint(rec, pos)
        for _ in range(n):
            v, pos = f64(pos)
            custom.append(v)
    return {
        "schema": schema, "zero_threshold": zt, "zero_count": float(zc),
        "count": float(cnt), "sum": s, "pos_spans": pos_spans,
        "pos_buckets": pos_b, "neg_spans": neg_spans, "neg_buckets": neg_b,
        "custom_values": custom, "counter_reset_hint": hint,
    }, pos


def decode_histogram_samples_record(rec: bytes):
    """(ref, t_ms, hist-dict) rows for record types 7/9 (integer) and
    8/10 (float); V2 variants (11+) are not emitted by stable releases."""
    as_float = rec[0] in (
        REC_FLOAT_HISTOGRAM_SAMPLES, REC_CB_FLOAT_HISTOGRAM_SAMPLES
    )
    if len(rec) <= 17:
        return []
    base_ref, base_t = struct.unpack_from(">Qq", rec, 1)
    pos = 17
    out = []
    while pos < len(rec):
        dref, pos = _varint(rec, pos)
        dt, pos = _varint(rec, pos)
        h, pos = _decode_hist_struct(rec, pos, as_float)
        out.append((base_ref + dref, base_t + dt, h))
    return out


def encode_float_histogram_samples_record(
    samples: list[tuple[int, int, dict]],
    rec_type: int = REC_FLOAT_HISTOGRAM_SAMPLES,
) -> bytes:
    """record.go floatHistogramSamplesV1 / EncodeFloatHistogram — the
    type-8 record (type 10 with ``rec_type`` for custom-bucket layouts;
    identical payload, record.go:58-60).  Together with the type-7
    encoder this lets ``write_wal_segment`` round-trip every record kind
    the reader decodes."""
    if not samples:
        return bytes([rec_type])
    base_ref, base_t, _ = samples[0]
    out = bytearray([rec_type]) + struct.pack(
        ">Qq", base_ref, base_t
    )

    def f64(v):
        return struct.pack(">Q", struct.unpack(">Q", struct.pack(">d", v))[0])

    for ref, t, h in samples:
        out += _enc_varint(ref - base_ref) + _enc_varint(t - base_t)
        out += bytes([int(h.get("counter_reset_hint", 0))])
        out += _enc_varint(int(h["schema"]))
        out += f64(float(h["zero_threshold"]))
        out += f64(float(h["zero_count"])) + f64(float(h["count"]))
        out += f64(float(h["sum"]))
        for spans in (h["pos_spans"], h["neg_spans"]):
            out += _enc_uvarint(len(spans))
            for sp in spans:
                out += _enc_varint(int(sp["offset"]))
                out += _enc_uvarint(int(sp["length"]))
        for bkts in (h["pos_buckets"], h["neg_buckets"]):
            out += _enc_uvarint(len(bkts))
            for b in bkts:
                out += f64(float(b))
        if int(h["schema"]) == _NHCB_SCHEMA:
            out += _enc_uvarint(len(h["custom_values"]))
            for v in h["custom_values"]:
                out += f64(float(v))
    return bytes(out)


def encode_histogram_samples_record(
    samples: list[tuple[int, int, dict]],
    rec_type: int = REC_HISTOGRAM_SAMPLES,
) -> bytes:
    """record.go histogramSamplesV1 / EncodeHistogram — the INTEGER
    type-7 record (type 9 for custom-bucket layouts).  The hist dicts
    use the reader's canonical float-absolute bucket convention; the
    encoder converts back to the wire's integer-delta buckets and
    uvarint counts, so encode∘decode is the identity."""
    if not samples:
        return bytes([rec_type])
    base_ref, base_t, _ = samples[0]
    out = bytearray([rec_type]) + struct.pack(">Qq", base_ref, base_t)

    def f64(v):
        return struct.pack(">Q", struct.unpack(">Q", struct.pack(">d", v))[0])

    for ref, t, h in samples:
        out += _enc_varint(ref - base_ref) + _enc_varint(t - base_t)
        out += bytes([int(h.get("counter_reset_hint", 0))])
        out += _enc_varint(int(h["schema"]))
        out += f64(float(h["zero_threshold"]))
        out += _enc_uvarint(int(h["zero_count"]))
        out += _enc_uvarint(int(h["count"]))
        out += f64(float(h["sum"]))
        for spans in (h["pos_spans"], h["neg_spans"]):
            out += _enc_uvarint(len(spans))
            for sp in spans:
                out += _enc_varint(int(sp["offset"]))
                out += _enc_uvarint(int(sp["length"]))
        for bkts in (h["pos_buckets"], h["neg_buckets"]):
            out += _enc_uvarint(len(bkts))
            run = 0
            for b in bkts:  # absolute floats → integer deltas on the wire
                out += _enc_varint(int(b) - run)
                run = int(b)
        if int(h["schema"]) == _NHCB_SCHEMA:
            out += _enc_uvarint(len(h["custom_values"]))
            for v in h["custom_values"]:
                out += f64(float(v))
    return bytes(out)


def histogram_samples_records(
    samples: list[tuple[int, int, dict]], as_float: bool
) -> list[bytes]:
    """Split a mixed batch the way the reference's Encoder does
    (record.go HistogramSamples → leftover custom-bucket samples become
    a second record of type 9/10): returns 1-2 encoded records."""
    expo = [s for s in samples if int(s[2]["schema"]) != _NHCB_SCHEMA]
    custom = [s for s in samples if int(s[2]["schema"]) == _NHCB_SCHEMA]
    enc = (
        encode_float_histogram_samples_record
        if as_float
        else encode_histogram_samples_record
    )
    cb_type = (
        REC_CB_FLOAT_HISTOGRAM_SAMPLES if as_float else REC_CB_HISTOGRAM_SAMPLES
    )
    out = []
    if expo:
        out.append(enc(expo))
    if custom:
        out.append(enc(custom, rec_type=cb_type))
    return out


# --- V2 (start-timestamp) sample records, types 11/12/13 -------------------
#
# record.go:62-66 — written when the encoder runs with EnableSTStorage.
# Framing differs from V1: NO 8-byte base header; the first sample
# carries varint(ref), varint(firstT), varint(firstST), then each later
# sample varint(ref delta vs PREVIOUS), varint(t - firstT), and an ST
# marker byte (record.go:963-966 / readSTMarker): 0 = no ST (st=0),
# 1 = same as previous sample's ST, 2 = explicit varint(st - firstST).

REC_SAMPLES_V2 = 11
REC_HISTOGRAM_SAMPLES_V2 = 12
REC_FLOAT_HISTOGRAM_SAMPLES_V2 = 13

_NO_ST, _SAME_ST, _EXPLICIT_ST = 0, 1, 2


def _read_st_marker(rec: bytes, pos: int, prev_st: int, first_st: int):
    marker = rec[pos]
    pos += 1
    if marker == _NO_ST:
        return 0, pos
    if marker == _SAME_ST:
        return prev_st, pos
    delta, pos = _varint(rec, pos)
    return first_st + delta, pos


def _write_st_marker(out: bytearray, st: int, first_st: int, prev_st: int) -> None:
    if st == 0:
        out.append(_NO_ST)
    elif st == prev_st:
        out.append(_SAME_ST)
    else:
        out.append(_EXPLICIT_ST)
        out += _enc_varint(st - first_st)


def decode_samples_v2_record(rec: bytes) -> list[tuple[int, int, int, float]]:
    """(ref, st_ms, t_ms, value) rows for record type 11."""
    out: list[tuple[int, int, int, float]] = []
    pos = 1
    first_t = first_st = 0
    prev_ref = prev_st = 0
    while pos < len(rec):
        if not out:
            ref, pos = _varint(rec, pos)
            first_t, pos = _varint(rec, pos)
            t = first_t
            st, pos = _varint(rec, pos)
            first_st = st
        else:
            dref, pos = _varint(rec, pos)
            ref = prev_ref + dref
            dt, pos = _varint(rec, pos)
            t = first_t + dt
            st, pos = _read_st_marker(rec, pos, prev_st, first_st)
        (bits,) = struct.unpack_from(">Q", rec, pos)
        pos += 8
        out.append(
            (ref, st, t, struct.unpack(">d", struct.pack(">Q", bits))[0])
        )
        prev_ref, prev_st = ref, st
    return out


def encode_samples_v2_record(
    samples: list[tuple[int, int, int, float]],
) -> bytes:
    """Inverse of :func:`decode_samples_v2_record` (record.go samplesV2)."""
    out = bytearray([REC_SAMPLES_V2])
    if not samples:
        return bytes(out)
    first_ref, first_st, first_t, _ = samples[0]
    prev_ref, prev_st = first_ref, first_st
    for i, (ref, st, t, v) in enumerate(samples):
        if i == 0:
            out += _enc_varint(ref) + _enc_varint(t) + _enc_varint(st)
        else:
            out += _enc_varint(ref - prev_ref) + _enc_varint(t - first_t)
            _write_st_marker(out, st, first_st, prev_st)
            prev_ref, prev_st = ref, st
        out += struct.pack(">Q", struct.unpack(">Q", struct.pack(">d", v))[0])
    return bytes(out)


def decode_histogram_samples_v2_record(rec: bytes):
    """(ref, st_ms, t_ms, hist-dict) rows for record types 12 (integer)
    and 13 (float) — the V2 framing around EncodeHistogram payloads."""
    as_float = rec[0] == REC_FLOAT_HISTOGRAM_SAMPLES_V2
    out = []
    pos = 1
    first_t = first_st = 0
    prev_ref = prev_st = 0
    while pos < len(rec):
        if not out:
            ref, pos = _varint(rec, pos)
            first_t, pos = _varint(rec, pos)
            t = first_t
            st, pos = _varint(rec, pos)
            first_st = st
        else:
            dref, pos = _varint(rec, pos)
            ref = prev_ref + dref
            dt, pos = _varint(rec, pos)
            t = first_t + dt
            st, pos = _read_st_marker(rec, pos, prev_st, first_st)
        h, pos = _decode_hist_struct(rec, pos, as_float)
        out.append((ref, st, t, h))
        prev_ref, prev_st = ref, st
    return out


def encode_histogram_samples_v2_record(
    samples: list[tuple[int, int, int, dict]], as_float: bool
) -> bytes:
    """Inverse of :func:`decode_histogram_samples_v2_record`
    (record.go histogramSamplesV2 / floatHistogramSamplesV2)."""
    rec_type = (
        REC_FLOAT_HISTOGRAM_SAMPLES_V2 if as_float else REC_HISTOGRAM_SAMPLES_V2
    )
    out = bytearray([rec_type])
    if not samples:
        return bytes(out)

    def f64(v):
        return struct.pack(">Q", struct.unpack(">Q", struct.pack(">d", v))[0])

    def put_hist(h: dict) -> None:
        out.append(int(h.get("counter_reset_hint", 0)))
        out.extend(_enc_varint(int(h["schema"])))
        out.extend(f64(float(h["zero_threshold"])))
        if as_float:
            out.extend(f64(float(h["zero_count"])) + f64(float(h["count"])))
        else:
            out.extend(_enc_uvarint(int(h["zero_count"])))
            out.extend(_enc_uvarint(int(h["count"])))
        out.extend(f64(float(h["sum"])))
        for spans in (h["pos_spans"], h["neg_spans"]):
            out.extend(_enc_uvarint(len(spans)))
            for sp in spans:
                out.extend(_enc_varint(int(sp["offset"])))
                out.extend(_enc_uvarint(int(sp["length"])))
        for bkts in (h["pos_buckets"], h["neg_buckets"]):
            out.extend(_enc_uvarint(len(bkts)))
            if as_float:
                for b in bkts:
                    out.extend(f64(float(b)))
            else:
                run = 0
                for b in bkts:
                    out.extend(_enc_varint(int(b) - run))
                    run = int(b)
        if int(h["schema"]) == _NHCB_SCHEMA:
            out.extend(_enc_uvarint(len(h["custom_values"])))
            for v in h["custom_values"]:
                out.extend(f64(float(v)))

    first_ref, first_st, first_t, _ = samples[0]
    prev_ref, prev_st = first_ref, first_st
    for i, (ref, st, t, h) in enumerate(samples):
        if i == 0:
            out += _enc_varint(ref) + _enc_varint(t) + _enc_varint(st)
        else:
            out += _enc_varint(ref - prev_ref) + _enc_varint(t - first_t)
            _write_st_marker(out, st, first_st, prev_st)
            prev_ref, prev_st = ref, st
        put_hist(h)
    return bytes(out)


# --- metadata records (type 6) ----------------------------------------------

REC_METADATA = 6

#: record.go:106-113 MetricType ↔ the model's string names
_METRIC_TYPES = {
    0: "unknown", 1: "counter", 2: "gauge", 3: "histogram",
    4: "gaugehistogram", 5: "summary", 6: "info", 7: "stateset",
}
_METRIC_TYPE_IDS = {v: k for k, v in _METRIC_TYPES.items()}


def decode_metadata_record(rec: bytes) -> list[tuple[int, str, str, str]]:
    """(series_ref, type, unit, help) rows (record.go Decoder.Metadata).
    Unknown extra fields are decoded and skipped so alignment holds."""
    out = []
    pos = 1
    while pos < len(rec):
        ref, pos = _uvarint(rec, pos)
        typ = rec[pos]
        pos += 1
        num_fields, pos = _uvarint(rec, pos)
        unit = help_ = ""
        for _ in range(num_fields):
            nl, pos = _uvarint(rec, pos)
            fname = rec[pos : pos + nl].decode("utf-8")
            pos += nl
            vl, pos = _uvarint(rec, pos)
            fval = rec[pos : pos + vl].decode("utf-8")
            pos += vl
            if fname == "UNIT":
                unit = fval
            elif fname == "HELP":
                help_ = fval
        out.append((ref, _METRIC_TYPES.get(typ, "unknown"), unit, help_))
    return out


def encode_metadata_record(
    metadata: list[tuple[int, str, str, str]],
) -> bytes:
    """Inverse of :func:`decode_metadata_record` (record.go Encoder.Metadata)."""
    out = bytearray([REC_METADATA])
    for ref, typ, unit, help_ in metadata:
        out += _enc_uvarint(ref)
        out.append(_METRIC_TYPE_IDS.get(typ, 0))
        out += _enc_uvarint(2)
        for fname, fval in (("UNIT", unit), ("HELP", help_)):
            nb, vb = fname.encode(), fval.encode()
            out += _enc_uvarint(len(nb)) + nb + _enc_uvarint(len(vb)) + vb
    return bytes(out)


def read_wal_metadata(data_dir: str) -> dict[str, dict]:
    """Metric metadata from the WAL's type-6 records, resolved through
    the series records to metric names: {metric: {type, unit, help}} —
    the shape /api/v1/metadata serves.  Later records win (the
    reference's head keeps the latest metadata per series)."""
    series = wal_series_map(data_dir)
    out: dict[str, dict] = {}
    for path in wal_segments(data_dir):
        with open(path, "rb") as f:
            seg = f.read()
        for rec in wal_records(seg):
            if rec and rec[0] == REC_METADATA:
                for ref, typ, unit, help_ in decode_metadata_record(rec):
                    labels = series.get(ref)
                    if labels is None:
                        continue
                    name = labels.get("__name__")
                    if name:
                        out[name] = {"type": typ, "unit": unit, "help": help_}
    return out
