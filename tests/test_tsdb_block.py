"""Native TSDB block format: read the reference's real on-disk fixture,
round-trip our writer through the distributed reader, tombstones.

Reference: tsdb/docs/format/{index,chunks,tombstones}.md, index v1
fixture tsdb/testdata/index_format_v1 (102 series / 102 samples).
"""

import pytest

FIXTURE = "/root/reference/tsdb/testdata/index_format_v1"

HIST = {
    "schema": 0, "zero_threshold": 0.0, "zero_count": 1.0, "count": 7.0,
    "sum": 13.5, "pos_spans": [{"offset": 0, "length": 2}],
    "pos_buckets": [2.0, 4.0], "neg_spans": [], "neg_buckets": [],
    "custom_values": [], "counter_reset_hint": 0,
}


def test_read_reference_v1_index():
    from prometheus_spark.storage.tsdb_block import (
        block_chunk_tasks,
        decode_chunk,
        read_chunk_at,
        read_index_series,
        read_meta,
    )

    meta = read_meta(FIXTURE)
    series = read_index_series(FIXTURE + "/index")
    assert len(series) == meta["stats"]["numSeries"] == 102
    # labels resolve through the v1 offset-keyed symbol table
    assert {"bar": "0"} in [s["labels"] for s in series]
    tasks = block_chunk_tasks(FIXTURE)
    seg = open(tasks[0][1], "rb").read()
    total = sum(
        len(decode_chunk(*read_chunk_at(seg, t[2]))) for t in tasks
    )
    assert total == meta["stats"]["numSamples"] == 102


def test_read_block_distributed_and_query(spark):
    from prometheus_spark.engine import PromQLEngine
    from prometheus_spark.storage import read_block

    df = read_block(spark, FIXTURE)
    assert df.count() == 102
    eng = PromQLEngine(spark, df)
    out = eng.instant_query('count({foo=~".+"})', 3).collect()
    assert out and out[0]["value"] == 2.0


def test_write_read_roundtrip_all_encodings(spark, tmp_path):
    from prometheus_spark.storage import read_block, write_block

    fhist = dict(HIST, count=7.5, sum=1.25, pos_buckets=[2.5, 5.0])
    block = str(tmp_path / "blk")
    write_block(block, [
        ({"__name__": "cpu", "host": "a"}, [(1000, 1.5), (2000, 2.5)]),
        ({"__name__": "lat", "host": "i"}, [(1000, HIST)]),
        ({"__name__": "lat", "host": "f"}, [(1000, fhist)]),
    ])
    rows = {
        (r["name"], r["labels"]["host"], r["t"]): r
        for r in read_block(spark, block).collect()
    }
    assert rows[("cpu", "a", 1000)]["value"] == 1.5
    assert rows[("cpu", "a", 2000)]["value"] == 2.5
    # integer histogram chunk (absolute buckets restored from deltas)
    ih = rows[("lat", "i", 1000)]["hist"]
    assert list(ih["pos_buckets"]) == [2.0, 4.0] and ih["count"] == 7.0
    # float histogram chunk
    fh = rows[("lat", "f", 1000)]["hist"]
    assert list(fh["pos_buckets"]) == [2.5, 5.0] and fh["sum"] == 1.25


def test_tombstones_filter_applies(spark, tmp_path):
    import struct as _struct

    from prometheus_spark.storage import read_block, write_block
    from prometheus_spark.storage.tsdb_block import (
        TOMBSTONE_MAGIC,
        read_index_series,
    )
    from prometheus_spark.storage.tsdb_block import _enc_uvarint, _enc_varint

    block = str(tmp_path / "blk_ts")
    write_block(block, [
        ({"__name__": "m", "k": "x"}, [(1000, 1.0), (2000, 2.0), (3000, 3.0)]),
        ({"__name__": "m", "k": "y"}, [(1000, 9.0)]),
    ])
    # delete [1500, 2500] on series x (v2 ids = offset/16)
    sx = next(
        s for s in read_index_series(block + "/index")
        if s["labels"]["k"] == "x"
    )
    body = _enc_uvarint(sx["id"]) + _enc_varint(1500) + _enc_varint(2500)
    with open(block + "/tombstones", "wb") as f:
        f.write(_struct.pack(">IB", TOMBSTONE_MAGIC, 1) + body + b"\0\0\0\0")

    vals = sorted(
        (r["labels"]["k"], r["t"])
        for r in read_block(spark, block).collect()
    )
    assert vals == [("x", 1000), ("x", 3000), ("y", 1000)]
    # and the raw view keeps everything
    assert read_block(spark, block, apply_tombstones=False).count() == 4


def test_promtool_native_block_listing(capsys):
    import sys

    sys.path.insert(0, "/root/repo/tools")
    import promtool

    assert promtool.tsdb_blocks(FIXTURE) == 0
    out = capsys.readouterr().out
    assert "01DXXFZDYD1MQW6079WK0K6EDQ" in out and "102" in out


def test_wal_roundtrip_with_fragmentation(spark, tmp_path):
    """A series record spanning multiple 32 KiB pages reassembles; the
    samples' signed-varint deltas and float bits decode exactly."""
    import os

    from prometheus_spark.storage import read_wal
    from prometheus_spark.storage.wal import (
        encode_samples_record,
        encode_series_record,
        write_wal_segment,
    )

    d = str(tmp_path / "data")
    os.makedirs(d + "/wal")
    series = [(i, {"__name__": "m", "idx": str(i)}) for i in range(3000)]
    write_wal_segment(d + "/wal/00000000", [encode_series_record(series)])
    samples = [(i, 1000 + i, float(i) / 7) for i in range(3000)]
    write_wal_segment(
        d + "/wal/00000001",
        [encode_samples_record(samples[:1500]),
         encode_samples_record(samples[1500:])],
    )
    rows = read_wal(spark, d).collect()
    assert len(rows) == 3000
    by_idx = {r["labels"]["idx"]: r for r in rows}
    assert by_idx["42"]["t"] == 1042 and by_idx["42"]["value"] == 6.0
    assert by_idx["2999"]["t"] == 3999


def test_wal_tombstones_and_checkpoint_order(spark, tmp_path):
    """Series defined inside a checkpoint dir resolve for samples in
    later live segments; WAL tombstone intervals drop their samples."""
    import os
    import struct as _struct

    from prometheus_spark.storage import read_wal
    from prometheus_spark.storage.wal import (
        REC_TOMBSTONES,
        _enc_varint,
        encode_samples_record,
        encode_series_record,
        write_wal_segment,
    )

    d = str(tmp_path / "data2")
    os.makedirs(d + "/wal/checkpoint.00000005")
    write_wal_segment(
        d + "/wal/checkpoint.00000005/00000000",
        [encode_series_record([(7, {"__name__": "cpu", "h": "a"})])],
    )
    tomb = (
        bytes([REC_TOMBSTONES])
        + _struct.pack(">Q", 7)
        + _enc_varint(150)
        + _enc_varint(250)
    )
    write_wal_segment(
        d + "/wal/00000006",
        [encode_samples_record([(7, 100, 1.0), (7, 200, 2.0), (7, 300, 3.0)]),
         tomb],
    )
    rows = sorted(r["t"] for r in read_wal(spark, d).collect())
    assert rows == [100, 300]  # t=200 deleted by the tombstone


def test_wal_snappy_compressed_record(spark, tmp_path):
    """A snappy-flagged fragment decompresses before decoding
    (wlog compression: type byte bit 3)."""
    import os
    import struct as _struct

    from prometheus_spark.sources.remote_read import _crc32c
    from prometheus_spark.sources.remote_write import snappy_encode
    from prometheus_spark.storage import read_wal
    from prometheus_spark.storage.wal import (
        encode_samples_record,
        encode_series_record,
        write_wal_segment,
    )

    d = str(tmp_path / "data3")
    os.makedirs(d + "/wal")
    write_wal_segment(
        d + "/wal/00000000",
        [encode_series_record([(1, {"__name__": "m"})])],
    )
    rec = encode_samples_record([(1, 500, 4.5)])
    comp = snappy_encode(rec)
    frag = bytes([0x08 | 1]) + _struct.pack(">HI", len(comp), _crc32c(comp)) + comp
    with open(d + "/wal/00000001", "wb") as f:
        f.write(frag)
    rows = read_wal(spark, d).collect()
    assert len(rows) == 1 and rows[0]["value"] == 4.5 and rows[0]["t"] == 500


def test_read_data_dir_blocks_plus_wal(spark, tmp_path):
    """One call over a live-style data dir: block samples + WAL head,
    deduped with the block as primary."""
    import os

    from prometheus_spark.storage import write_block
    from prometheus_spark.storage.tsdb_block import read_data_dir
    from prometheus_spark.storage.wal import (
        encode_samples_record,
        encode_series_record,
        write_wal_segment,
    )

    d = str(tmp_path / "datadir")
    write_block(
        d + "/01BLOCKULID000000000000000",
        [({"__name__": "m", "k": "a"}, [(1000, 1.0), (2000, 2.0)])],
    )
    os.makedirs(d + "/wal")
    write_wal_segment(
        d + "/wal/00000000",
        [encode_series_record([(5, {"__name__": "m", "k": "a"})]),
         # overlaps t=2000 (block wins) and extends to t=3000
         encode_samples_record([(5, 2000, 99.0), (5, 3000, 3.0)])],
    )
    rows = {r["t"]: r["value"] for r in read_data_dir(spark, d).collect()}
    assert rows == {1000: 1.0, 2000: 2.0, 3000: 3.0}


def test_head_chunks_read(spark, tmp_path):
    """chunks_head segments (self-describing chunks, no index) resolve
    series through the WAL's series records and join the data dir."""
    import os
    import struct as _struct

    from prometheus_spark.sources.remote_read import _crc32c
    from prometheus_spark.storage import chunkenc
    from prometheus_spark.storage.tsdb_block import read_data_dir
    from prometheus_spark.storage.wal import (
        HEAD_CHUNKS_MAGIC,
        encode_series_record,
        write_wal_segment,
    )

    d = str(tmp_path / "live")
    os.makedirs(d + "/wal")
    os.makedirs(d + "/chunks_head")
    write_wal_segment(
        d + "/wal/00000000",
        [encode_series_record([(9, {"__name__": "hm", "k": "h"})])],
    )
    data = chunkenc.xor_encode([(100, 5.0), (200, 6.0)])
    seg = bytearray(_struct.pack(">IB3x", HEAD_CHUNKS_MAGIC, 1))
    seg += _struct.pack(">QQQ", 9, 100, 200)
    seg.append(1)  # EncXOR, in-order
    from prometheus_spark.storage.wal import _enc_uvarint

    seg += _enc_uvarint(len(data)) + data
    seg += _struct.pack(">I", _crc32c(bytes([1]) + data))
    with open(d + "/chunks_head/000001", "wb") as f:
        f.write(bytes(seg))

    rows = sorted(
        (r["t"], r["value"]) for r in read_data_dir(spark, d).collect()
    )
    assert rows == [(100, 5.0), (200, 6.0)]


def test_wal_exemplars_roundtrip(spark, tmp_path):
    """Exemplar records resolve series labels and land in the canonical
    exemplar frame (query_exemplars-ready)."""
    import os

    from prometheus_spark.storage.wal import (
        encode_exemplars_record,
        encode_series_record,
        read_wal_exemplars,
        write_wal_segment,
    )

    d = str(tmp_path / "exdata")
    os.makedirs(d + "/wal")
    write_wal_segment(d + "/wal/00000000", [
        encode_series_record([(3, {"__name__": "req", "job": "api"})]),
        encode_exemplars_record([
            (3, 1000, 0.25, {"trace_id": "abc"}),
            (3, 2000, 0.75, {"trace_id": "def"}),
        ]),
    ])
    rows = sorted(read_wal_exemplars(spark, d).collect(), key=lambda r: r["t"])
    assert len(rows) == 2
    assert rows[0]["labels"]["job"] == "api"
    assert rows[0]["ex_labels"]["trace_id"] == "abc"
    assert rows[0]["value"] == 0.25
    assert rows[1]["ex_labels"]["trace_id"] == "def" and rows[1]["t"] == 2000


def test_wal_float_histogram_samples(spark, tmp_path):
    """Type-8 float-histogram WAL records decode into the samples
    frame's hist struct."""
    import os

    from prometheus_spark.storage import read_wal
    from prometheus_spark.storage.wal import (
        encode_float_histogram_samples_record,
        encode_series_record,
        write_wal_segment,
    )

    d = str(tmp_path / "hwal")
    os.makedirs(d + "/wal")
    h = dict(HIST, count=7.5, sum=2.25, pos_buckets=[1.5, 6.0])
    write_wal_segment(d + "/wal/00000000", [
        encode_series_record([(4, {"__name__": "lat", "k": "w"})]),
        encode_float_histogram_samples_record([(4, 1234, h)]),
    ])
    rows = read_wal(spark, d).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["t"] == 1234 and r["value"] is None
    assert r["hist"]["count"] == 7.5 and r["hist"]["sum"] == 2.25
    assert list(r["hist"]["pos_buckets"]) == [1.5, 6.0]
    assert [s["offset"] for s in r["hist"]["pos_spans"]] == [0]


def _mk_hist(i, custom=False):
    base = {
        "schema": -53 if custom else 0,
        "zero_threshold": 0.0 if custom else 2.938735877055719e-39,
        "zero_count": float(i % 3),
        "count": float(10 + i),
        "sum": 2.5 * i - 1,
        "pos_spans": [{"offset": 0, "length": 2}],
        "pos_buckets": [float(3 + i), float(7 + i)],  # absolute floats
        "neg_spans": [] if custom else [{"offset": 1, "length": 1}],
        "neg_buckets": [] if custom else [float(i % 5)],
        "custom_values": [0.5, 2.0] if custom else [],
        "counter_reset_hint": i % 3,
    }
    return base


def test_wal_mixed_record_stream_roundtrip(tmp_path):
    """write_wal_segment must round-trip every record kind the reader
    decodes: series, samples, exemplars, integer/float histogram samples
    (types 7/8), and their custom-bucket variants (types 9/10), mixed in
    one segment (record.go types 1-10 minus mmap/metadata)."""
    from prometheus_spark.storage.wal import (
        REC_CB_FLOAT_HISTOGRAM_SAMPLES,
        REC_CB_HISTOGRAM_SAMPLES,
        REC_EXEMPLARS,
        REC_FLOAT_HISTOGRAM_SAMPLES,
        REC_HISTOGRAM_SAMPLES,
        REC_SAMPLES,
        REC_SERIES,
        decode_exemplars_record,
        decode_histogram_samples_record,
        decode_samples_record,
        decode_series_record,
        encode_exemplars_record,
        encode_samples_record,
        encode_series_record,
        histogram_samples_records,
        wal_records,
        write_wal_segment,
    )

    series = [(1, {"__name__": "m", "job": "j"}), (2, {"__name__": "n"})]
    samples = [(1, 1000 + 15 * i, float(i)) for i in range(40)]
    exemplars = [
        (1, 1000 + 60 * i, 1.5 * i, {"trace_id": f"t{i}"}) for i in range(10)
    ]
    int_hists = [(2, 1000 + 30 * i, _mk_hist(i)) for i in range(12)]
    fl_hists = [(2, 2000 + 30 * i, _mk_hist(i)) for i in range(12)]
    mixed_int = int_hists + [(2, 5000 + 30 * i, _mk_hist(i, custom=True)) for i in range(5)]
    mixed_fl = fl_hists + [(2, 6000 + 30 * i, _mk_hist(i, custom=True)) for i in range(5)]

    int_recs = histogram_samples_records(mixed_int, as_float=False)
    fl_recs = histogram_samples_records(mixed_fl, as_float=True)
    assert len(int_recs) == 2 and len(fl_recs) == 2  # split on custom buckets
    assert int_recs[0][0] == REC_HISTOGRAM_SAMPLES
    assert int_recs[1][0] == REC_CB_HISTOGRAM_SAMPLES
    assert fl_recs[0][0] == REC_FLOAT_HISTOGRAM_SAMPLES
    assert fl_recs[1][0] == REC_CB_FLOAT_HISTOGRAM_SAMPLES

    path = str(tmp_path / "00000000")
    write_wal_segment(
        path,
        [
            encode_series_record(series),
            encode_samples_record(samples),
            encode_exemplars_record(exemplars),
            *int_recs,
            *fl_recs,
        ],
    )

    with open(path, "rb") as f:
        seg = f.read()
    got = {"series": [], "samples": [], "exemplars": [], "ih": [], "fh": []}
    for rec in wal_records(seg):
        rt = rec[0]
        if rt == REC_SERIES:
            got["series"] += decode_series_record(rec)
        elif rt == REC_SAMPLES:
            got["samples"] += decode_samples_record(rec)
        elif rt == REC_EXEMPLARS:
            got["exemplars"] += decode_exemplars_record(rec)
        elif rt in (REC_HISTOGRAM_SAMPLES, REC_CB_HISTOGRAM_SAMPLES):
            got["ih"] += decode_histogram_samples_record(rec)
        elif rt in (REC_FLOAT_HISTOGRAM_SAMPLES, REC_CB_FLOAT_HISTOGRAM_SAMPLES):
            got["fh"] += decode_histogram_samples_record(rec)

    assert got["series"] == series
    assert got["samples"] == samples
    assert got["exemplars"] == exemplars
    assert got["ih"] == mixed_int
    assert got["fh"] == mixed_fl


def test_wal_v2_records_roundtrip_and_read(spark, tmp_path):
    """Record types 11/12/13 (start-timestamp V2, record.go:62-66):
    encode/decode identity for the V2 framing (varint first-sample
    header, per-sample ST marker byte) and read_wal surfacing st into
    the canonical samples frame."""
    from prometheus_spark.storage.wal import (
        decode_histogram_samples_v2_record,
        decode_samples_v2_record,
        encode_samples_v2_record,
        encode_histogram_samples_v2_record,
        encode_series_record,
        read_wal,
        write_wal_segment,
    )

    samples = [
        (1, 0, 1000, 2.0),        # no ST
        (1, 900, 2000, 3.0),      # explicit ST
        (1, 900, 3000, 4.0),      # same as previous
        (2, 500, 3500, 5.0),      # explicit again, ref delta
    ]
    assert decode_samples_v2_record(encode_samples_v2_record(samples)) == samples

    hists = [
        (2, 800, 4000, _mk_hist(0)),
        (2, 800, 5000, _mk_hist(1)),
        (2, 0, 6000, _mk_hist(2, custom=True)),
    ]
    for as_float in (True, False):
        enc = encode_histogram_samples_v2_record(hists, as_float=as_float)
        assert decode_histogram_samples_v2_record(enc) == hists

    d = tmp_path / "data"
    (d / "wal").mkdir(parents=True)
    write_wal_segment(
        str(d / "wal" / "00000000"),
        [
            encode_series_record([(1, {"__name__": "m"}), (2, {"__name__": "h"})]),
            encode_samples_v2_record(samples),
            encode_histogram_samples_v2_record(hists, as_float=True),
        ],
    )
    df = read_wal(spark, str(d)).orderBy("t")
    rows = df.collect()
    assert len(rows) == 7
    # float V2 rows: st lands in the frame (0 -> NULL)
    by_t = {r["t"]: r for r in rows}
    assert by_t[1000]["st"] is None and by_t[1000]["value"] == 2.0
    assert by_t[2000]["st"] == 900
    assert by_t[3000]["st"] == 900
    assert by_t[3500]["st"] == 500
    # histogram V2 rows decode into the hist column with st
    assert by_t[4000]["st"] == 800 and by_t[4000]["hist"]["count"] == 10.0
    assert by_t[6000]["st"] is None and by_t[6000]["hist"]["schema"] == -53


def test_wal_metadata_records(tmp_path):
    """Type-6 metadata records (record.go Encoder.Metadata) round-trip
    and resolve through the series records to metric names."""
    from prometheus_spark.storage.wal import (
        decode_metadata_record,
        encode_metadata_record,
        encode_series_record,
        read_wal_metadata,
        write_wal_segment,
    )

    meta = [
        (1, "counter", "seconds", "Total request time"),
        (2, "gauge", "", "Current sessions"),
        (3, "histogram", "bytes", ""),
    ]
    assert decode_metadata_record(encode_metadata_record(meta)) == meta

    d = tmp_path / "data"
    (d / "wal").mkdir(parents=True)
    write_wal_segment(
        str(d / "wal" / "00000000"),
        [
            encode_series_record(
                [(1, {"__name__": "http_request_seconds_total"}),
                 (2, {"__name__": "sessions"})]
            ),
            encode_metadata_record(meta),
            # later record wins for the same series
            encode_metadata_record([(2, "gauge", "conns", "updated")]),
        ],
    )
    got = read_wal_metadata(str(d))
    assert got["http_request_seconds_total"] == {
        "type": "counter", "unit": "seconds", "help": "Total request time"
    }
    assert got["sessions"] == {"type": "gauge", "unit": "conns", "help": "updated"}
    assert len(got) == 2  # ref 3 has no series record -> dropped


def test_write_block_multi_chunk_series(tmp_path):
    """Series longer than one chunk split at 120 samples with
    delta-coded chunk metas (tsdb/index/index.go AddSeries;
    head_append.go samplesPerChunk) — sf10-scale series exceed the
    65535-sample single-chunk cap."""
    import os

    from prometheus_spark.storage.tsdb_block import (
        decode_chunk, read_chunk_at, read_index_series, write_block,
    )

    d = str(tmp_path / "block")
    os.makedirs(d)
    samples = [(i * 1000, float(i % 97)) for i in range(1000)]
    write_block(d, [({"__name__": "big"}, samples)])
    (entry,) = read_index_series(os.path.join(d, "index"))
    assert len(entry["chunks"]) == (1000 + 119) // 120
    with open(os.path.join(d, "chunks", "000001"), "rb") as f:
        seg = f.read()
    got = []
    for mint, maxt, ref in entry["chunks"]:
        enc, data = read_chunk_at(seg, ref & 0xFFFFFFFF)
        part = decode_chunk(enc, data)
        assert part[0][0] == mint and part[-1][0] == maxt
        got += part
    assert got == samples
