"""WARC (Web ARChive, ISO 28500) record parsing — the container format
web-crawl training corpora (Common Crawl and friends) arrive in.

A WARC file is a sequence of records, each a ``WARC/1.0`` version line,
``Key: Value`` headers, a blank line, then exactly ``Content-Length``
payload octets and a ``\\r\\n\\r\\n`` separator. Parsing is LENGTH-
DRIVEN (never split-on-separator): payloads may legally contain the
separator bytes, so the only correct cursor advance is the declared
octet count — which this parser follows, making parse∘build = id
provable on arbitrary payload text (the gate query does exactly that).

Scale shape: one Arrow-batched ``mapInPandas`` pass over whole-file
binary contents (``binaryFile`` source / ``read_binary_files``) —
files parallelize across the cluster, records never shuffle. Plain
``.warc`` is not splittable mid-file; production crawls use
``.warc.gz`` with one gzip member per record, which splits by member —
the per-file loop below is the same either way. Python is justified:
header parsing + byte-cursor arithmetic per record is inherently
sequential within a file (the carve-out the UDF guide reserves).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame


WARC_SCHEMA = (
    "warc_type string, record_id string, target_uri string, "
    "warc_date string, content_length long, text string"
)


def parse_warc_bytes(data: bytes) -> list[tuple]:
    """Parse one WARC file image into record tuples (pure function —
    unit-testable without Spark)."""
    out = []
    pos = 0
    n_total = len(data)
    while pos < n_total:
        # tolerate inter-record padding
        while pos < n_total and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n_total:
            break
        end = data.find(b"\r\n\r\n", pos)
        if end < 0:
            break
        lines = data[pos:end].decode("utf-8", "replace").split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            break  # not a record boundary: stop rather than guess
        headers: dict[str, str] = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers.get("content-length", "0"))
        payload = data[end + 4 : end + 4 + length]
        out.append(
            (
                headers.get("warc-type"),
                headers.get("warc-record-id"),
                headers.get("warc-target-uri"),
                headers.get("warc-date"),
                length,
                payload.decode("utf-8", "replace"),
            )
        )
        pos = end + 4 + length
    return out


def warc_parse(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Explode WARC file images (one binary column per file) into
    records: (warc_type, record_id, target_uri, warc_date,
    content_length, text)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "warc_type", "record_id", "target_uri", "warc_date",
            "content_length", "text",
        ]
        for pdf in batches:
            rows: list[tuple] = []
            for blob in pdf[content_col]:
                if blob is None:
                    continue
                rows.extend(parse_warc_bytes(bytes(blob)))
            yield pd.DataFrame(rows, columns=cols)

    return df.select(content_col).mapInPandas(run, schema=WARC_SCHEMA)


def iter_gzip_members(data: bytes, chunk_size: int = 1 << 18):
    """Lazily split a multi-member gzip stream into its decompressed
    members (pure generator). ``.warc.gz`` as Common Crawl ships it is
    one gzip member PER RECORD concatenated into a file; the member
    boundary zlib reports after each stream's end is the only correct
    cursor advance (searching for magic bytes would false-positive on
    compressed payload bytes).

    Scale shape: the compressed input is consumed through a zero-copy
    ``memoryview`` in bounded chunks, so splitting a shard with tens of
    thousands of members is O(total bytes) — never
    O(members × file size), which a naive ``unused_data`` loop over the
    whole remainder would cost (each iteration re-copying the tail) —
    and only one decompressed member is held at a time."""
    import zlib

    mv = memoryview(data)
    n = len(data)
    offset = 0
    while offset < n:
        if bytes(mv[offset : offset + 2]) != b"\x1f\x8b":
            break  # trailing garbage: stop rather than guess
        d = zlib.decompressobj(wbits=31)  # 31 = gzip wrapper
        parts: list[bytes] = []
        pos = offset
        try:
            while pos < n and not d.eof:
                chunk = mv[pos : pos + chunk_size]
                parts.append(d.decompress(chunk))
                pos += len(chunk)
        except zlib.error:
            return  # corrupt member: keep what parsed so far
        if not d.eof:
            return  # truncated member (trailer/CRC unverified): drop it
        yield b"".join(parts)
        # unused_data is at most one chunk — the unconsumed tail of the
        # last chunk fed — so the back-off is bounded, not file-sized
        offset = pos - len(d.unused_data)


def split_gzip_members(data: bytes) -> list[bytes]:
    """Eager list form of :func:`iter_gzip_members` (tests/small files)."""
    return list(iter_gzip_members(data))


def warc_gz_parse(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Explode ``.warc.gz`` file images (one gzip member per record —
    the Common Crawl layout) into the same record schema as
    :func:`warc_parse`. Per file: split members at gzip boundaries,
    decompress each with stdlib zlib, then run the identical
    length-driven record parser. A corrupt/truncated member costs the
    members after it within THAT file only — files parallelize, so at
    100 TB the blast radius of one bad shard stays one shard."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "warc_type", "record_id", "target_uri", "warc_date",
            "content_length", "text",
        ]
        for pdf in batches:
            rows: list[tuple] = []
            for blob in pdf[content_col]:
                if blob is None:
                    continue
                for member in iter_gzip_members(bytes(blob)):
                    rows.extend(parse_warc_bytes(member))
            yield pd.DataFrame(rows, columns=cols)

    return df.select(content_col).mapInPandas(run, schema=WARC_SCHEMA)
