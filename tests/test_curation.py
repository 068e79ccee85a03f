"""Corpus-curation operators: PII redaction, chunking, sequence packing,
boilerplate removal (prometheus_spark/pipeline/curation.py)."""

import pytest

from prometheus_spark.pipeline import (
    boilerplate_lines,
    chunk_documents,
    pack_sequences,
    pii_redact,
    remove_boilerplate,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "contact bob@example.com or 10.0.0.1 call +1 (555) 123-4567 "
            "ssn 123-45-6789", "en"),
        (2, "header line\nunique body two\nfooter line", "en"),
        (3, "header line\nother text here\nfooter line", "fr"),
        (4, "", "en"),
        (5, "one two three four five six seven eight nine ten", "fr"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_pii_redact_all_categories(docs):
    rows = {r["doc_id"]: r for r in pii_redact(docs).collect()}
    r = rows[1]
    assert r["redacted"] == (
        "contact <EMAIL> or <IP> call <PHONE> ssn <SSN>"
    )
    assert (r["n_email"], r["n_ipv4"], r["n_ssn"], r["n_phone"]) == (1, 1, 1, 1)
    # untouched documents pass through byte-identical with zero counts
    assert rows[5]["redacted"] == "one two three four five six seven eight nine ten"
    assert rows[4]["redacted"] == ""
    assert all(
        rows[i][c] == 0
        for i in (2, 3, 4, 5)
        for c in ("n_email", "n_ipv4", "n_ssn", "n_phone")
    )


def test_pii_redact_cascade_order(spark):
    """An SSN must become <SSN>, not a <PHONE> — the cascade applies
    ssn before the (greedier) phone pattern, and replacements are
    digit-free so phone never re-matches them."""
    df = spark.createDataFrame(
        [(1, "id 123-45-6789 then 555 123 4567")], "doc_id long, text string"
    )
    r = pii_redact(df).collect()[0]
    assert r["redacted"] == "id <SSN> then <PHONE>"
    assert r["n_ssn"] == 1 and r["n_phone"] == 1


def test_chunk_documents_stride_and_tail(docs):
    out = chunk_documents(docs, max_tokens=4, overlap=1).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 5 has 10 tokens, stride 3 → starts 0,3,6,9
    c5 = sorted(by_doc[5], key=lambda r: r["chunk_id"])
    assert [c["chunk_text"] for c in c5] == [
        "one two three four",
        "four five six seven",
        "seven eight nine ten",
        "ten",
    ]
    assert [c["n_tokens"] for c in c5] == [4, 4, 4, 1]
    # empty document yields no chunks
    assert 4 not in by_doc
    # overlap: chunk i+1 starts stride tokens after chunk i
    assert c5[1]["chunk_text"].split()[0] == c5[0]["chunk_text"].split()[-1]


def test_chunk_documents_validates_overlap(docs):
    with pytest.raises(ValueError):
        chunk_documents(docs, max_tokens=4, overlap=4)


def test_pack_sequences_offsets(docs):
    rows = {
        r["doc_id"]: r
        for r in pack_sequences(docs, seq_len=8, shard_col="lang").collect()
    }
    # en stream: doc1 (10 tokens + EOS) then doc2 (7 + EOS) then doc4 (0 + EOS)
    assert (rows[1]["offset"], rows[1]["first_seq"], rows[1]["last_seq"]) == (0, 0, 1)
    assert (rows[2]["offset"], rows[2]["first_seq"], rows[2]["last_seq"]) == (11, 1, 2)
    assert rows[4]["n_tokens"] == 0 and rows[4]["offset"] == 19
    # fr stream restarts at 0
    assert (rows[3]["offset"], rows[3]["first_seq"]) == (0, 0)
    assert (rows[5]["offset"], rows[5]["first_seq"], rows[5]["last_seq"]) == (8, 1, 2)


def test_boilerplate_lines_and_removal(docs):
    bp = {r["line"]: r["n_docs"] for r in boilerplate_lines(docs).collect()}
    assert bp == {"header line": 2, "footer line": 2}
    out = {r["doc_id"]: r for r in remove_boilerplate(docs).collect()}
    assert out[2]["clean_text"] == "unique body two"
    assert out[2]["n_removed"] == 2
    assert out[3]["clean_text"] == "other text here"
    # docs without boilerplate keep their (trimmed-line) text, 0 removed
    assert out[5]["n_removed"] == 0
    assert out[4]["clean_text"] == "" and out[4]["n_removed"] == 0


def test_remove_boilerplate_all_boilerplate_doc(spark):
    df = spark.createDataFrame(
        [(1, "x\ny"), (2, "x\ny"), (3, "x\nkeep me")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in remove_boilerplate(df, min_docs=2).collect()}
    assert out[1]["clean_text"] == "" and out[1]["n_removed"] == 2
    assert out[3]["clean_text"] == "keep me" and out[3]["n_removed"] == 1
