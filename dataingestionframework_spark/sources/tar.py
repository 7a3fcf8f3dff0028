"""POSIX tar (ustar) shard parsing — the WebDataset container layout
multimodal training corpora ship in (shards of ``.tar`` files whose
members ``{key}.{ext}`` group into samples by basename key).

A tar archive is a sequence of 512-byte header blocks, each followed by
the member payload padded to a 512-byte boundary; the archive ends with
two zero blocks. Sizes are octal ASCII; the header carries a byte-sum
checksum (computed with the checksum field as spaces) that this parser
VERIFIES — a flipped byte in a 100 TB scan surfaces as a per-member
skip (or, if the size field itself is hit, a truncated shard), never
silent corruption or a failed job. Parsing is
length-driven (the declared octal size advances the cursor), so member
payloads may contain anything, including tar headers.

Scale shape: identical to :mod:`sources.warc` — one Arrow-batched
``mapInPandas`` pass over whole-file binary contents (``binaryFile``
source); shards parallelize across the cluster, members never shuffle
until the caller groups them into samples (one hash shuffle on the
sample key). Python is justified: header arithmetic per member is
inherently sequential within a shard (the carve-out the UDF guide
reserves). Plain ``.tar`` is not splittable mid-file; WebDataset's
answer is many shards of bounded size — the sharding IS the
parallelism, which this source inherits per-file.

Capability extension beyond the reference surface (the reference
ingests structured files only — modules/auto_loader_steps.py:85-114);
format per POSIX.1-1988 ustar and the public WebDataset convention.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TAR_SCHEMA = (
    "shard string, member_name string, member_size long, payload binary"
)

_BLOCK = 512


def _octal(field: bytes) -> int | None:
    s = field.split(b"\x00", 1)[0].strip(b" \x00")
    try:
        return int(s or b"0", 8)
    except ValueError:
        return None  # corrupted numeric field


def parse_tar_bytes(data: bytes) -> list[tuple]:
    """Parse one tar shard image into (name, size, payload) tuples for
    regular-file members (pure function — unit-testable without
    Spark). A member with a bad header checksum but a parseable size
    field is skipped (its size still advances the cursor); if the SIZE
    field itself is corrupted the cursor position is unknowable, so
    parsing stops for the rest of that shard — members parsed so far
    are kept, and the blast radius stays one shard, never the job.
    Directory/link/pax members are skipped but their payloads still
    advance the cursor, so following members parse correctly."""
    out = []
    pos = 0
    n_total = len(data)
    while pos + _BLOCK <= n_total:
        header = data[pos : pos + _BLOCK]
        if header == b"\x00" * _BLOCK:
            break  # end-of-archive marker
        stored = _octal(header[148:156])
        actual = sum(header[:148]) + 8 * 0x20 + sum(header[156:])
        size = _octal(header[124:136])
        if size is None:
            break  # size unknowable: cannot advance safely
        payload_blocks = (size + _BLOCK - 1) // _BLOCK
        if stored is not None and actual == stored:
            name = header[:100].split(b"\x00", 1)[0].decode("utf-8", "replace")
            prefix = header[345:500].split(b"\x00", 1)[0].decode(
                "utf-8", "replace"
            )
            if prefix:
                name = prefix + "/" + name
            typeflag = header[156:157]
            if typeflag in (b"0", b"\x00"):  # regular file only
                payload = data[pos + _BLOCK : pos + _BLOCK + size]
                out.append((name, size, payload))
        # bad checksum or non-file member: skip header + payload blocks
        pos += _BLOCK * (1 + payload_blocks)
    return out


def tar_parse(
    df: DataFrame,
    content_col: str = "content",
    path_col: str | None = None,
) -> DataFrame:
    """Explode tar shard images (one binary column per shard) into
    regular-file members: (shard, member_name, member_size, payload).
    ``path_col`` (e.g. ``path`` from the binaryFile source) becomes the
    ``shard`` column; without one, shard is NULL — fine for a single
    archive, but pass it for multi-shard corpora so sample grouping
    can scope keys per shard (WebDataset keys are unique per shard,
    not globally)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["shard", "member_name", "member_size", "payload"]
        for pdf in batches:
            rows: list[tuple] = []
            shards = pdf[path_col] if path_col else [None] * len(pdf)
            for shard, blob in zip(shards, pdf[content_col]):
                if blob is None:
                    continue
                rows.extend(
                    (shard, *m) for m in parse_tar_bytes(bytes(blob))
                )
            yield pd.DataFrame(rows, columns=cols)

    sel = [content_col] + ([path_col] if path_col else [])
    return df.select(*sel).mapInPandas(run, schema=TAR_SCHEMA)


def webdataset_samples(
    members: DataFrame,
    name_col: str = "member_name",
) -> DataFrame:
    """Group parsed tar members into WebDataset samples: the sample key
    is the member basename up to the FIRST dot (the public WebDataset
    convention, so ``0001.seg.png`` has ext ``seg.png``), and each
    sample row carries its extensions and payloads as aligned,
    ext-sorted arrays — schema-free like WebDataset itself, but
    columnar so downstream decode stages select only the ext they
    need.

    Samples are scoped PER SHARD (group key = (shard, sample_key)):
    WebDataset keys are conventionally unique within a shard only, so
    two shards both containing ``000000.txt`` must yield two samples,
    not one merged corrupt one. One hash shuffle on the grouping key;
    everything else is scan-side expressions. Output: (shard,
    sample_key, n_members, exts, payloads, total_bytes).
    """
    base = F.element_at(F.split(F.col(name_col), "/"), -1)
    key = F.substring_index(base, ".", 1)
    ext = F.expr(
        f"substring(element_at(split({name_col}, '/'), -1), "
        "length(substring_index(element_at(split("
        f"{name_col}, '/'), -1), '.', 1)) + 2)"
    )
    pairs = members.select(
        F.col("shard"),
        key.alias("sample_key"),
        F.struct(ext.alias("ext"), F.col("payload").alias("payload")).alias(
            "m"
        ),
        F.col("member_size"),
    )
    return pairs.groupBy("shard", "sample_key").agg(
        F.count("*").alias("n_members"),
        F.transform(F.array_sort(F.collect_list("m")), lambda s: s["ext"]).alias(
            "exts"
        ),
        F.transform(
            F.array_sort(F.collect_list("m")), lambda s: s["payload"]
        ).alias("payloads"),
        F.sum("member_size").alias("total_bytes"),
    )
