"""Read the reference's native TSDB block format directly into a samples
DataFrame — no migration step: point the engine at an existing data dir.

Formats implemented from the reference's on-disk specs:
- index (tsdb/docs/format/index.md): magic 0xBAAAD700, symbol table,
  16-byte-aligned series section with symbol-ref label pairs and
  delta-encoded chunk metas; versions 1 and 2.
- chunks segments (tsdb/docs/format/chunks.md): magic 0x85BD40DD,
  `len uvarint | encoding byte | data | crc32c`; refs are
  segment<<32 | offset.
- tombstones (tsdb/docs/format/tombstones.md): deleted (series, mint,
  maxt) intervals, applied as a post-decode filter.
- meta.json: ULID, time range, stats.

Chunk payload codecs (XOR / integer histogram / float histogram) are
shared with storage.chunkenc — the same bit-level readers the
remote-read client uses.

Scale design: the driver parses only the INDEX (series → chunk refs;
the small side — chunk data is never read on the driver) and builds a
chunk-task DataFrame; executors open the segment files themselves and
decode their chunk ranges in Arrow batches (``mapInPandas``), so the
heavy byte-level work scales with the cluster.  Segment files must be
on storage every executor can open (local in tests, shared FS/object
store via mounts in production).
"""

from __future__ import annotations

import json
import os
import struct
from typing import Iterator

INDEX_MAGIC = 0xBAAAD700
CHUNKS_MAGIC = 0x85BD40DD
TOMBSTONE_MAGIC = 0x0130BA30

# tsdb/chunkenc/chunk.go:29-35
ENC_XOR = 1
ENC_HISTOGRAM = 2
ENC_FLOAT_HISTOGRAM = 3
ENC_XOR2 = 4
ENC_HISTOGRAM_ST = 5
ENC_FLOAT_HISTOGRAM_ST = 6


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


def read_meta(block_dir: str) -> dict:
    with open(os.path.join(block_dir, "meta.json")) as f:
        return json.load(f)


def read_symbols(buf: bytes, off: int) -> tuple[list[str], dict[int, str]]:
    """Symbol table at ``off``: len<4b> #symbols<4b> entries crc.
    Returns both reference styles: the sequential list (format v2+:
    refs are indices) and a by-absolute-file-offset map (format v1:
    refs are byte offsets of the entry — index.go Symbols.Lookup
    ``d.Skip(int(o))`` over the whole file)."""
    length, count = struct.unpack_from(">II", buf, off)
    pos = off + 8
    seq: list[str] = []
    by_off: dict[int, str] = {}
    for _ in range(count):
        entry_off = pos
        n, pos = _uvarint(buf, pos)
        s = buf[pos : pos + n].decode("utf-8")
        pos += n
        seq.append(s)
        by_off[entry_off] = s
    return seq, by_off


def read_index_series(index_path: str) -> list[dict]:
    """Sequentially scan the series section: one dict per series with
    ``labels`` and ``chunks`` [(mint, maxt, ref)] plus the series ``id``
    the tombstones reference (offset/16 for v2, raw offset for v1)."""
    with open(index_path, "rb") as f:
        buf = f.read()
    magic, version = struct.unpack_from(">IB", buf, 0)
    if magic != INDEX_MAGIC:
        raise ValueError(f"not a TSDB index file: magic {magic:#x}")
    # TOC: 6 refs + crc at the tail
    toc_off = len(buf) - (6 * 8 + 4)
    (sym_ref, series_ref, label_idx_ref, _lot, postings_ref, _pot) = (
        struct.unpack_from(">6Q", buf, toc_off)
    )
    seq_symbols, symbols_by_off = read_symbols(buf, sym_ref)

    def sym(ref: int) -> str:
        if version == 1:
            return symbols_by_off[ref]
        return seq_symbols[ref]

    end = label_idx_ref or postings_ref or toc_off
    out = []
    pos = series_ref
    while pos < end:
        if buf[pos] == 0:  # zero padding between/after entries
            pos += 1
            continue
        entry_off = pos
        ln, pos = _uvarint(buf, pos)
        body_end = pos + ln
        nlabels, p = _uvarint(buf, pos)
        labels = {}
        for _ in range(nlabels):
            nref, p = _uvarint(buf, p)
            vref, p = _uvarint(buf, p)
            labels[sym(nref)] = sym(vref)
        nchunks, p = _uvarint(buf, p)
        chunks = []
        mint = maxt = ref = 0
        for i in range(nchunks):
            if i == 0:
                mint, p = _varint(buf, p)
                delta, p = _uvarint(buf, p)
                maxt = mint + delta
                ref, p = _uvarint(buf, p)
            else:
                dmint, p = _uvarint(buf, p)
                mint = maxt + dmint
                delta, p = _uvarint(buf, p)
                maxt = mint + delta
                dref, p = _varint(buf, p)
                ref += dref
            chunks.append((mint, maxt, ref))
        sid = entry_off // 16 if version >= 2 else entry_off
        out.append({"id": sid, "labels": labels, "chunks": chunks})
        pos = body_end + 4  # skip crc
    return out


def read_tombstones(block_dir: str) -> list[tuple[int, int, int]]:
    path = os.path.join(block_dir, "tombstones")
    if not os.path.exists(path):
        return []
    with open(path, "rb") as f:
        buf = f.read()
    if len(buf) < 9:
        return []
    magic, _version = struct.unpack_from(">IB", buf, 0)
    if magic != TOMBSTONE_MAGIC:
        raise ValueError(f"not a tombstones file: magic {magic:#x}")
    out = []
    pos, end = 5, len(buf) - 4  # trailing crc
    while pos < end:
        ref, pos = _uvarint(buf, pos)
        mint, pos = _varint(buf, pos)
        maxt, pos = _varint(buf, pos)
        out.append((ref, mint, maxt))
    return out


def read_chunk_at(seg: bytes, offset: int) -> tuple[int, bytes]:
    """One chunk at ``offset`` inside a loaded segment: (encoding, data)."""
    ln, pos = _uvarint(seg, offset)
    enc = seg[pos]
    return enc, seg[pos + 1 : pos + 1 + ln]


def decode_chunk(enc: int, data: bytes) -> list[tuple[int, object]]:
    """Decode a chunk payload to [(t_ms, float | hist-dict)]."""
    from prometheus_spark.storage import chunkenc

    if enc == ENC_XOR:
        return chunkenc.xor_decode(data)
    if enc == ENC_HISTOGRAM:
        return chunkenc.hist_int_decode(data)
    if enc == ENC_FLOAT_HISTOGRAM:
        return chunkenc.fh_decode(data)
    # newer reference servers' codecs (chunk.go:25-35); the optional
    # start-timestamp stream is decoded then dropped — samples carry
    # (t, v) in the engine's canonical shape either way
    if enc == ENC_XOR2:
        return chunkenc.xor2_decode(data)
    if enc == ENC_HISTOGRAM_ST:
        return [(t, h) for _st, t, h in chunkenc.hist_int_st_decode(data)]
    if enc == ENC_FLOAT_HISTOGRAM_ST:
        return [(t, h) for _st, t, h in chunkenc.fh_st_decode(data)]
    raise ValueError(f"unsupported chunk encoding {enc}")


def block_chunk_tasks(block_dir: str) -> list[tuple]:
    """Driver-side index scan → one task row per chunk:
    (labels_json, seg_path, offset, mint, maxt, series_id)."""
    series = read_index_series(os.path.join(block_dir, "index"))
    chunks_dir = os.path.join(block_dir, "chunks")
    out = []
    for s in series:
        lbl = json.dumps(s["labels"], sort_keys=True)
        for mint, maxt, ref in s["chunks"]:
            # refs index segments from 0; files are named from 000001
            # (chunks.go BlockChunkRef.Unpack + segmentFilename)
            seg = os.path.join(chunks_dir, f"{(ref >> 32) + 1:06d}")
            out.append((lbl, seg, int(ref & 0xFFFFFFFF), mint, maxt, s["id"]))
    return out


def read_block(spark, block_dir: str, apply_tombstones: bool = True):
    """A native TSDB block as the canonical samples frame
    (sig, name, labels, t, value, hist, stale, st).

    Float (XOR) chunks decode in executor Arrow batches; histogram
    chunks are collected per-task the same way — the decode loop is
    pure Python over the shared chunkenc bit readers either way, and
    every row leaves the executor as plain columns (labels as parallel
    key/value arrays folded to a map JVM-side, histograms re-assembled
    JVM-side from exploded fields — the Arrow map/nested-struct
    marshaling limits never apply)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from prometheus_spark.model.schema import HISTOGRAM_TYPE
    from prometheus_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    tasks = block_chunk_tasks(block_dir)
    stones = read_tombstones(block_dir) if apply_tombstones else []
    task_schema = (
        "labels_json string, seg string, offset long, mint long, "
        "maxt long, sid long"
    )
    tdf = spark.createDataFrame(tasks, task_schema)
    stones_b = spark.sparkContext.broadcast(stones)

    hist_fields = (
        "h_schema int, h_zt double, h_zc double, h_count double, "
        "h_sum double, h_pos_off array<int>, h_pos_len array<int>, "
        "h_pos_bkt array<double>, h_neg_off array<int>, "
        "h_neg_len array<int>, h_neg_bkt array<double>, "
        "h_custom array<double>, h_hint int"
    )
    out_schema = T._parse_datatype_string(
        "labels_json string, t long, value double, is_hist boolean, "
        + hist_fields
    )

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        from prometheus_spark.storage.tsdb_block import (
            decode_chunk,
            read_chunk_at,
        )

        seg_cache: dict[str, bytes] = {}
        dead = stones_b.value
        for pdf in batches:
            rows = []
            for lbl, seg, off, mint, maxt, sid in zip(
                pdf["labels_json"], pdf["seg"], pdf["offset"],
                pdf["mint"], pdf["maxt"], pdf["sid"],
            ):
                if seg not in seg_cache:
                    with open(seg, "rb") as f:
                        seg_cache[seg] = f.read()
                enc, data = read_chunk_at(seg_cache[seg], int(off))
                for t, v in decode_chunk(enc, data):
                    if any(
                        r == sid and lo <= t <= hi for r, lo, hi in dead
                    ):
                        continue
                    if isinstance(v, dict):
                        rows.append(
                            (lbl, t, None, True, int(v["schema"]),
                             float(v["zero_threshold"]),
                             float(v["zero_count"]), float(v["count"]),
                             float(v["sum"]),
                             [int(s["offset"]) for s in v["pos_spans"]],
                             [int(s["length"]) for s in v["pos_spans"]],
                             [float(x) for x in v["pos_buckets"]],
                             [int(s["offset"]) for s in v["neg_spans"]],
                             [int(s["length"]) for s in v["neg_spans"]],
                             [float(x) for x in v["neg_buckets"]],
                             [float(x) for x in v["custom_values"]],
                             int(v["counter_reset_hint"]))
                        )
                    else:
                        rows.append(
                            (lbl, t, float(v), False) + (None,) * 13
                        )
            yield pd.DataFrame(
                rows, columns=[f.name for f in out_schema.fields]
            ).astype(object)

    raw = tdf.mapInPandas(decode, out_schema)

    from prometheus_spark.model.labels import sig_sql

    hist = (
        "CASE WHEN is_hist THEN named_struct("
        "'schema', h_schema, 'zero_threshold', h_zt, 'zero_count', h_zc, "
        "'count', h_count, 'sum', h_sum, "
        "'pos_spans', arrays_zip(h_pos_off, h_pos_len), "
        "'pos_buckets', h_pos_bkt, "
        "'neg_spans', arrays_zip(h_neg_off, h_neg_len), "
        "'neg_buckets', h_neg_bkt, 'custom_values', h_custom, "
        "'counter_reset_hint', CAST(h_hint AS TINYINT)) END"
    )
    htype = HISTOGRAM_TYPE.simpleString()
    return (
        raw.withColumn(
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
            "CAST(NULL AS LONG) AS st",
        )
    )


# --- minimal block writer (round-trip interop) --------------------------


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


def write_block(
    block_dir: str,
    series_samples: list[tuple[dict, list[tuple[int, object]]]],
    ulid: str = "SPARKGRAFT0000000000000000",
) -> None:
    """Write a reference-format block: chunks segment + a v2 index with
    symbol table, 16-byte-aligned series section, and TOC.  The
    label-index/postings sections are left empty (zero TOC refs — the
    spec's "section does not exist" convention): enough for
    ``read_block`` round-trips and offline inspection; a reference
    instance additionally expects postings for serving.

    Values may be floats (XOR chunks) or histogram dicts (integer
    ``hist_int_encode`` layout when all counts are integral, float
    otherwise)."""
    from prometheus_spark.model.labels import sig_for
    from prometheus_spark.sources.remote_read import _crc32c
    from prometheus_spark.storage import chunkenc

    os.makedirs(os.path.join(block_dir, "chunks"), exist_ok=True)
    series_samples = sorted(
        series_samples, key=lambda s: sorted(s[0].items())
    )

    # chunks segment 000001 (refs index it as segment 0)
    seg = bytearray(struct.pack(">IB3x", CHUNKS_MAGIC, 1))
    entries = []  # (labels, [(mint, maxt, ref)])
    for labels, all_samples in series_samples:
        all_samples = sorted(all_samples)
        metas = []
        # cut chunks at 120 samples — the reference's head/compactor
        # target (tsdb/head_append.go samplesPerChunk); a single chunk
        # also hard-caps at 65535 samples, which sf10-scale series exceed
        for ci in range(0, len(all_samples), 120):
            samples = all_samples[ci:ci + 120]
            is_hist = samples and isinstance(samples[0][1], dict)
            if is_hist:
                ints = all(
                    float(s[1]["count"]).is_integer()
                    and all(float(b).is_integer() for b in s[1]["pos_buckets"])
                    and all(float(b).is_integer() for b in s[1]["neg_buckets"])
                    for s in samples
                )
                enc = ENC_HISTOGRAM if ints else ENC_FLOAT_HISTOGRAM
                if ints:
                    # hist_int_encode takes the integer model's DELTA-form
                    # buckets; the samples-frame convention is absolute
                    def _deltas(bkts):
                        out, prev = [], 0
                        for b in bkts:
                            out.append(int(b) - prev)
                            prev = int(b)
                        return out

                    data = chunkenc.hist_int_encode(
                        [
                            (
                                t,
                                dict(
                                    h,
                                    pos_buckets=_deltas(h["pos_buckets"]),
                                    neg_buckets=_deltas(h["neg_buckets"]),
                                ),
                            )
                            for t, h in samples
                        ]
                    )
                else:
                    data = chunkenc.fh_encode(samples)
            else:
                enc = ENC_XOR
                data = chunkenc.xor_encode(samples)
            ref = len(seg)
            body = bytes([enc]) + data
            seg += _enc_uvarint(len(data)) + body
            seg += struct.pack(">I", _crc32c(body))
            metas.append((samples[0][0], samples[-1][0], ref))
        if metas:
            entries.append((labels, metas))
    with open(os.path.join(block_dir, "chunks", "000001"), "wb") as f:
        f.write(seg)

    # index v2
    symbols = sorted(
        {s for labels, _ in entries for kv in labels.items() for s in kv}
    )
    sym_index = {s: i for i, s in enumerate(symbols)}
    idx = bytearray(struct.pack(">IB", INDEX_MAGIC, 2))
    sym_ref = len(idx)
    sym_body = bytearray(struct.pack(">I", len(symbols)))
    for s in symbols:
        b = s.encode("utf-8")
        sym_body += _enc_uvarint(len(b)) + b
    idx += struct.pack(">I", len(sym_body)) + sym_body
    idx += struct.pack(">I", _crc32c(bytes(sym_body)))

    series_ref = None
    for labels, chunks in entries:
        while len(idx) % 16:
            idx.append(0)
        if series_ref is None:
            series_ref = len(idx)
        body = bytearray(_enc_uvarint(len(labels)))
        for k in sorted(labels):
            body += _enc_uvarint(sym_index[k]) + _enc_uvarint(
                sym_index[labels[k]]
            )
        body += _enc_uvarint(len(chunks))
        mint, maxt, ref = chunks[0]
        body += _enc_varint(mint) + _enc_uvarint(maxt - mint)
        body += _enc_uvarint(ref)
        prev_maxt, prev_ref = maxt, ref
        for mint, maxt, ref in chunks[1:]:
            # subsequent metas are delta-coded against the previous chunk
            # (tsdb/index/index.go AddSeries)
            body += _enc_uvarint(mint - prev_maxt)
            body += _enc_uvarint(maxt - mint)
            body += _enc_varint(ref - prev_ref)
            prev_maxt, prev_ref = maxt, ref
        idx += _enc_uvarint(len(body)) + body
        idx += struct.pack(">I", _crc32c(bytes(body)))

    toc_body = struct.pack(
        ">6Q", sym_ref, series_ref or 0, 0, 0, 0, 0
    )
    idx += toc_body + struct.pack(">I", _crc32c(toc_body))
    with open(os.path.join(block_dir, "index"), "wb") as f:
        f.write(idx)

    mints = [c[0] for _, cs in entries for c in cs]
    maxts = [c[1] for _, cs in entries for c in cs]
    nsamples = sum(len(s) for _, s in series_samples)
    with open(os.path.join(block_dir, "meta.json"), "w") as f:
        json.dump(
            {
                "version": 1,
                "ulid": ulid,
                "minTime": min(mints) if mints else 0,
                "maxTime": (max(maxts) + 1) if maxts else 0,
                "stats": {
                    "numSamples": nsamples,
                    "numSeries": len(entries),
                    "numChunks": len(entries),
                },
                "compaction": {"level": 1, "sources": [ulid]},
            },
            f,
        )


def read_data_dir(spark, data_dir: str):
    """A complete live Prometheus data directory in one call: every
    ULID block (read_block) plus the WAL head (storage.wal.read_wal),
    merged and deduped with block data as the primary source
    (fanout merge semantics — the WAL re-covers the newest block's
    window until the next truncation)."""
    import glob as _glob

    from prometheus_spark.storage.fanout import merge_samples
    from prometheus_spark.storage.wal import (
        read_head_chunks,
        read_wal,
        wal_segments,
        wal_series_map,
    )

    frames = [
        read_block(spark, os.path.dirname(p))
        for p in sorted(_glob.glob(os.path.join(data_dir, "*", "index")))
    ]
    if wal_segments(data_dir):
        frames.append(read_wal(spark, data_dir))
        # chunks_head holds samples the WAL may have truncated past a
        # checkpoint; ref→labels comes from the WAL's series records
        if os.path.isdir(os.path.join(data_dir, "chunks_head")):
            frames.append(
                read_head_chunks(
                    spark, data_dir, wal_series_map(data_dir)
                )
            )
    if not frames:
        raise FileNotFoundError(f"no blocks or WAL under {data_dir}")
    if len(frames) == 1:
        return frames[0]
    return merge_samples(frames)
