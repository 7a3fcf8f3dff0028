"""Config-driven training-corpus preparation pipeline.

The reference's pattern is config-driven ingestion (spec → pipeline →
report). This applies the same pattern to LLM corpus prep: one spec
declares quality gating, language filtering, dedup strategy, and
chunking; ``CorpusPrep.run`` composes the operators into ONE lazy plan
per output and reports per-stage row counts from a single cached pass.

Scale shape: every stage is a narrow projection or a hash-agg/semi-join
the dedup operators already implement; nothing collects. At 100 TB the
near-dup stage dominates — it reuses the bucketed LSH funnels
(`operators/dedup.py`), so cost stays linear-ish in corpus size.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _recover_or_probe_parquet(spark, path: str) -> bool:
    """Parquet-sink analog of :func:`_recover_or_probe_index`: the
    staged swap has a crash window between rename(path → ``.__bak__``)
    and rename(``.__staged__`` → path) where the sink name is empty
    while a complete copy survives under a sibling name. Promote the
    best surviving copy — ``.__staged__`` (the completed post-forget
    image) over ``.__bak__`` (the pre-forget image) — so the next
    forget/read heals instead of failing on a missing path with the
    data stranded. Returns whether the path exists after recovery."""
    sc = spark.sparkContext
    jpath = sc._jvm.org.apache.hadoop.fs.Path
    fs = jpath(path).getFileSystem(sc._jsc.hadoopConfiguration())
    if fs.exists(jpath(path)):
        return True
    for cand in (path.rstrip("/") + ".__staged__", path.rstrip("/") + ".__bak__"):
        if fs.exists(jpath(cand)):
            if not fs.rename(jpath(cand), jpath(path)):
                raise IOError(f"staged-swap recovery: could not promote {cand} to {path}")
            return True
    return False


def _staged_parquet_swap(spark, df: DataFrame, path: str) -> int:
    """Rewrite ``path`` with ``df``'s rows without ever holding the only
    copy in memory: write to a sibling ``.__staged__`` dir (durable on
    disk), then swap via two FileSystem renames (old → ``.__bak__``,
    staged → path) and drop the backup. A crash at any point leaves a
    complete copy on disk — either the original (before the first
    rename) or the staged output — unlike an in-place
    ``mode('overwrite')`` on the path being read, which deletes the old
    files before the (checkpoint-backed) rewrite lands. Renames are
    atomic on HDFS/local; on object stores use the Delta path instead
    (documented in DEPLOY.md). Returns the kept-row count (read back
    from the durable staged files)."""
    sc = spark.sparkContext
    jpath = sc._jvm.org.apache.hadoop.fs.Path
    fs = jpath(path).getFileSystem(sc._jsc.hadoopConfiguration())
    tmp, bak = path.rstrip("/") + ".__staged__", path.rstrip("/") + ".__bak__"
    fs.delete(jpath(tmp), True)
    fs.delete(jpath(bak), True)
    df.write.mode("overwrite").parquet(tmp)
    kept = spark.read.parquet(tmp).count()
    if not fs.rename(jpath(path), jpath(bak)):
        raise IOError(f"staged swap: could not move {path} aside")
    if not fs.rename(jpath(tmp), jpath(path)):
        fs.rename(jpath(bak), jpath(path))  # roll back, original intact
        raise IOError(f"staged swap: could not promote {tmp} to {path}")
    fs.delete(jpath(bak), True)
    return kept


@dataclass
class CorpusPrepSpec:
    """Declarative corpus-prep config (the LLM twin of IngestionSpec)."""

    text_col: str = "text"
    id_col: str = "doc_id"
    min_quality: float | None = 0.5       # None = no quality gate
    lang_allow: list[str] | None = None   # None = all languages
    lang_col: str = "lang"
    dedup: str = "exact"                  # exact | minhash | simhash | none
    minhash_threshold: float = 0.7
    simhash_max_hamming: int = 3
    mix_alpha: float | None = None        # temperature mix (None = off)
    mix_target_total: int | None = None   # defaults to surviving count
    mix_seed: int = 42
    chunk_size: int = 0                   # 0 = no chunking output
    chunk_stride: int = 0                 # defaults to chunk_size if 0


    _DEDUP_MODES = ("exact", "minhash", "simhash", "none")

    @classmethod
    def from_json(cls, doc: dict) -> "CorpusPrepSpec":
        """Load from a JSON document (the reference's config-driven
        ethos applied to the LLM pipeline: corpus-prep jobs ship as
        data, not code). Unknown keys and mode typos fail loudly —
        a silently-ignored config field is a misconfigured 100 TB run.
        """
        from ..errors import SpecValidationError

        known = set(cls.__dataclass_fields__)
        unknown = set(doc) - known
        if unknown:
            raise SpecValidationError(
                f"corpus-prep config: unknown fields {sorted(unknown)}"
            )
        spec = cls(**doc)
        if spec.dedup not in cls._DEDUP_MODES:
            raise SpecValidationError(
                f"corpus-prep config: dedup={spec.dedup!r} not in "
                f"{cls._DEDUP_MODES}"
            )
        if spec.chunk_size < 0 or spec.chunk_stride < 0:
            raise SpecValidationError("corpus-prep config: negative chunking")
        if spec.mix_alpha is not None and spec.mix_alpha <= 0:
            raise SpecValidationError("corpus-prep config: mix_alpha must be > 0")
        return spec


@dataclass
class CorpusPrepResult:
    clean: DataFrame                      # surviving documents
    chunks: DataFrame | None              # chunked output (if configured)
    report: DataFrame                     # stage, rows_in, rows_out


def corpus_stream_clean(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    min_quality: float = 0.5,
    watermark: str = "1 hour",
    observe_prefix: str | None = None,
) -> DataFrame:
    """Streaming corpus intake: quality gate + exact-dedup within the
    watermark, as one incremental plan (the streaming twin of
    CorpusPrep's first two batch stages).

    Dedup state is bounded by the watermark: one md5 fingerprint per
    distinct document seen in the last ``watermark`` of event time —
    the standard trade for unbounded streams (cross-window dups are
    caught by the periodic batch near-dup sweep instead). Works on
    batch frames too (dropDuplicates on the fingerprint).

    With ``observe_prefix`` set, per-stage named metrics
    (``<prefix>_input``: rows + mean quality, ``<prefix>_gated``:
    surviving rows, ``<prefix>_out``: emitted rows) ride each
    micro-batch's StreamingQueryProgress.observedMetrics — the funnel
    report costs no extra pass or action at any scale (counters are
    folded into the batch's own execution, exactly like CorpusPrep's
    batch-side Observation taps).
    """
    from ..operators.text import fingerprint, quality_score

    q = quality_score(F.col(text_col))
    if observe_prefix:
        stream = stream.observe(
            f"{observe_prefix}_input",
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(q), 6).alias("mean_quality"),
        )
    gated = (
        stream.withColumn("_q", q)
        .filter(F.col("_q") >= min_quality)
        .drop("_q")
        .withColumn("_fp", fingerprint(F.col(text_col)))
    )
    if observe_prefix:
        gated = gated.observe(
            f"{observe_prefix}_gated", F.count(F.lit(1)).alias("n")
        )
    if stream.isStreaming:
        out = gated.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["_fp"]
        )
    else:
        out = gated.dropDuplicates(["_fp"])
    out = out.drop("_fp")
    if observe_prefix:
        out = out.observe(f"{observe_prefix}_out", F.count(F.lit(1)).alias("n"))
    return out


def corpus_stream_prep(
    stream: DataFrame,
    spec: CorpusPrepSpec,
    ts_col: str = "ts",
    watermark: str = "1 hour",
    observe_prefix: str | None = None,
) -> DataFrame:
    """FULL streaming CorpusPrep: the whole batch pipeline — language
    filter → quality gate → exact-dedup (within the watermark) →
    context-window chunking — as ONE incremental plan, with a per-stage
    ``observe()`` funnel riding every micro-batch's progress when
    ``observe_prefix`` is set (input/lang/gated/deduped/chunks counts,
    zero extra passes).

    Near-dup (LSH) and temperature-mix stages are deliberately batch-
    only: both need corpus-global state (band tables / group counts)
    that a watermark can't bound — at scale they run as the periodic
    batch sweep over the accumulated sink (``CorpusPrep.run`` /
    ``update_lsh_index``), the standard lambda split. Works on batch
    frames too (same plan minus the watermark).

    Returns the chunk stream ``(id, chunk_id, n_chunk_tokens, chunk)``
    (or clean docs if ``spec.chunk_size == 0``); append-mode safe.
    """
    from ..operators.text import chunk_documents, fingerprint, quality_score

    s = spec

    def obs(frame: DataFrame, stage: str, *extra) -> DataFrame:
        if not observe_prefix:
            return frame
        return frame.observe(
            f"{observe_prefix}_{stage}", F.count(F.lit(1)).alias("n"), *extra
        )

    q = quality_score(F.col(s.text_col))
    cur = obs(stream, "input", F.round(F.avg(q), 6).alias("mean_quality"))
    if s.lang_allow is not None:
        cur = obs(cur.filter(F.col(s.lang_col).isin(s.lang_allow)), "lang")
    if s.min_quality is not None:
        cur = obs(
            cur.withColumn("_q", q).filter(F.col("_q") >= s.min_quality).drop("_q"),
            "gated",
        )
    cur = cur.withColumn("_fp", fingerprint(F.col(s.text_col)))
    if stream.isStreaming:
        cur = cur.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["_fp"]
        )
    else:
        cur = cur.dropDuplicates(["_fp"])
    cur = obs(cur.drop("_fp"), "deduped")
    if s.chunk_size > 0:
        cur = obs(
            chunk_documents(
                cur,
                s.text_col,
                s.id_col,
                chunk_size=s.chunk_size,
                stride=s.chunk_stride or s.chunk_size,
            ),
            "chunks",
        )
    return cur


def corpus_incremental_intake(
    stream: DataFrame,
    sink_path: str,
    checkpoint: str,
    text_col: str = "text",
    min_quality: float | None = None,
):
    """Incremental corpus build with UNBOUNDED-horizon exact dedup:
    each micro-batch appends only fingerprint-new documents, anti-joined
    against the accumulated sink itself (vs the watermark-bounded state
    of :func:`corpus_stream_clean`).

    The fingerprint column ``_fp`` is persisted in the sink and IS the
    dedup index: the anti-join reads just that column (parquet column
    pruning), so each batch costs batch×sink-fingerprints, not
    batch×documents. The same shape makes epoch REPLAY idempotent —
    a crashed-and-replayed batch re-filters against what the failed
    attempt already wrote, so exactly-once lands for free without an
    epoch ledger. At 100 TB swap the append+anti-join for a Delta MERGE
    ``whenNotMatchedInsert`` on the same fingerprint key (one log scan
    instead of a footer listing), or bucket the sink by ``_fp`` prefix
    so the anti-join prunes to matching buckets.

    Returns the started StreamingQuery (caller awaits termination).
    """
    from ..operators.text import fingerprint, quality_score

    def handle(batch: DataFrame, _epoch: int) -> None:
        spark = batch.sparkSession
        b = batch
        if min_quality is not None:
            b = b.withColumn("_q", quality_score(F.col(text_col))).filter(
                F.col("_q") >= min_quality
            ).drop("_q")
        b = b.withColumn("_fp", fingerprint(F.col(text_col))).dropDuplicates(["_fp"])
        # existence probe, not a bare except: a transient sink-read
        # failure must fail the batch (foreachBatch retries), not skip
        # the anti-join and silently append duplicates
        from ..session import path_exists

        if path_exists(spark, sink_path):
            seen = spark.read.parquet(sink_path).select("_fp").distinct()
            b = b.join(seen, "_fp", "left_anti")
        b.write.mode("append").parquet(sink_path)

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def corpus_incremental_near_dup_intake(
    stream: DataFrame,
    sink_path: str,
    checkpoint: str,
    index_table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
):
    """Incremental corpus build with UNBOUNDED-horizon NEAR-dup dedup:
    the streaming composition of :func:`corpus_incremental_intake`
    (exact fingerprints) and the bucketed MinHash-LSH index.

    Each micro-batch: (1) replay-guard anti-join against sink AND
    dropped-store ids, (2) :func:`~..operators.dedup.
    update_lsh_index_bucketed` joins the batch's band rows against the
    PERSISTED bucketed index — cost is new×bucket, the index side never
    reshuffles — and appends them, (3) candidates exact-verify (n-gram
    Jaccard) against batch + sink + DROPPED texts, (4) batch docs that
    verify against an earlier id are dropped (their (id, text) persists
    to ``<sink_path>_dropped``), survivors append to the sink.

    Dropped docs stay BLOCKERS: their band rows are already in the
    index, and keeping their texts queryable in the companion dropped
    store means a later near-dup of a dropped doc is itself dropped —
    the same transitive-blocking contract within-batch verification
    already has (and the declarative oracle states: a doc survives iff
    NO smaller-id doc is ≥ threshold similar, dropped or not). Without
    the dropped store, a chain 1→5→9 with sim(1,5) ≥ t ≥ sim(1,9) and
    sim(5,9) ≥ t would keep 9 once 5's text is gone. The embedding
    intake (:func:`embedding_incremental_ann_intake`) gets this for
    free by indexing whole batches; this is the text-side mirror.

    Assumes intake ids are monotone over time (append-log ids), so the
    larger id of a verified pair is always the newer doc. Replay is
    idempotent: re-appended band rows only produce duplicate candidates
    (distinct-ed), and the id anti-join — over sink ∪ dropped, so both
    outcomes are remembered — stops double writes.

    Returns the started StreamingQuery (caller awaits termination).
    """
    from ..operators.dedup import (
        update_lsh_index_bucketed,
        verify_pairs_jaccard_arrays,
    )
    from ..session import release_checkpoint

    dropped_path = sink_path.rstrip("/") + "_dropped"

    def handle(batch: DataFrame, _epoch: int) -> None:
        import os as _os
        import sys as _sys
        import time as _time

        spark = batch.sparkSession
        _trace = _os.environ.get("DIF_PHASE_STDERR")
        _t0 = _time.perf_counter()

        def phase(name: str) -> None:
            # opt-in per-phase wall timings (stderr only): the per-batch
            # cost split the optimization rounds need without a UI
            nonlocal _t0
            if _trace:
                t1 = _time.perf_counter()
                print(
                    f"# near_dup batch={_epoch} {name}: {t1 - _t0:.3f}s",
                    file=_sys.stderr,
                )
                _t0 = t1

        def _read_or_none(path: str) -> DataFrame | None:
            # probe, not try/except: a transient read failure while the
            # store EXISTS must retry the batch, not skip the replay
            # guard and duplicate writes
            from ..session import path_exists

            if not path_exists(spark, path):
                return None
            return spark.read.parquet(path).select(id_col, text_col)

        b = batch.dropDuplicates([id_col])
        seen = _read_or_none(sink_path)
        gone = _read_or_none(dropped_path)
        blockers = None
        for part in (seen, gone):
            if part is not None:
                blockers = part if blockers is None else blockers.unionByName(part)
        if blockers is not None:
            b = b.join(blockers.select(id_col), id_col, "left_anti")
        # pin the batch image: b's lineage reads the sink/dropped stores
        # through the anti-join and this handler appends to both below;
        # the pin also stops the dropDuplicates shuffle re-running in
        # every downstream action (measured: skipping the pin on
        # blocker-less batches was a net LOSS — the recomputation costs
        # more than the pin job)
        b = b.localCheckpoint()
        phase("pin_batch")
        texts = b.select(id_col, text_col)
        if blockers is not None:
            texts = texts.unionByName(blockers)

        # per-batch candidate sets are O(batch), so the lazy array-shape
        # verify wins (see verify_pairs_jaccard_arrays); it fuses with
        # the drop-id projection into ONE action (sims are only ever
        # compared to the threshold here, never emitted) — and that
        # action doubles as the candidate materialization the index
        # update needs before its append (``consume``): one job per
        # batch instead of count-then-verify
        def _verify_drop(pairs: DataFrame) -> DataFrame:
            verified = verify_pairs_jaccard_arrays(
                pairs, texts, text_col, id_col, threshold=threshold
            )
            # localCheckpoint = full-scan action over the candidate
            # frame, satisfying consume's materialization contract;
            # the pin also feeds the two writes below
            return (
                verified.select(F.col("id_b").alias(id_col))
                .distinct()
                .localCheckpoint()
            )

        drop = update_lsh_index_bucketed(
            b, spark, index_table, text_col=text_col, id_col=id_col,
            num_hashes=num_hashes, bands=bands, consume=_verify_drop,
        )
        phase("lsh_update_verify")
        (
            b.join(drop, id_col, "left_semi")
            .select(id_col, text_col)
            .write.mode("append")
            .parquet(dropped_path)
        )
        b.join(drop, id_col, "left_anti").write.mode("append").parquet(sink_path)
        phase("writes")
        # superseded per-batch state: the sink/dropped appends are the
        # durable record, so the batch pins are never read again —
        # release them now instead of holding every batch's blocks
        # until the periodic GC (guide §5; the candidate cache is
        # released inside update_lsh_index_bucketed)
        release_checkpoint(drop)
        release_checkpoint(b)

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


class CorpusPrep:
    def __init__(self, spec: CorpusPrepSpec):
        self.spec = spec

    # -- dedup keep-list ----------------------------------------------------

    def _near_dup_drop_ids(self, df: DataFrame) -> DataFrame:
        """Ids to DROP under near-dup policy 'keep the earliest id':
        any doc appearing as id_b of a qualifying pair (id_a < id_b by
        construction in the pair operators)."""
        from ..operators.dedup import near_duplicates_minhash, simhash_pairs

        s = self.spec
        if s.dedup == "minhash":
            pairs = near_duplicates_minhash(
                df, s.text_col, s.id_col, threshold=s.minhash_threshold
            )
        elif s.dedup == "simhash":
            pairs = simhash_pairs(
                df, s.text_col, s.id_col, max_hamming=s.simhash_max_hamming
            )
        else:
            raise ValueError(f"unknown near-dup strategy {s.dedup!r}")
        return pairs.select(F.col("id_b").alias(s.id_col)).distinct()

    def run(self, df: DataFrame) -> CorpusPrepResult:
        from pyspark.sql import Observation

        from ..operators.dedup import drop_exact_duplicates
        from ..operators.text import chunk_documents, quality_score

        s = self.spec

        # Per-stage row counts for the report WITHOUT per-stage count()
        # jobs: the linear stages (input → lang → quality) are tapped
        # with the Observation API — counters collected as rows flow
        # through ONE execution, not one full-lineage re-scan per stage
        # (at 100 TB the old shape re-read the corpus once per report
        # line). The dedup stages branch the lineage (LSH self-joins),
        # where observed counters would double-fire, so the gated frame
        # is persisted once and the remaining counts scan the cache.
        taps: list[tuple[str, Observation]] = []

        def tap(name: str, frame: DataFrame) -> DataFrame:
            o = Observation()
            taps.append((name, o))
            return frame.observe(o, F.count(F.lit(1)).alias("n"))

        cur = tap("input", df)
        if s.lang_allow is not None:
            cur = tap("lang_filter", cur.filter(F.col(s.lang_col).isin(s.lang_allow)))

        if s.min_quality is not None:
            cur = tap(
                "quality_gate",
                cur.withColumn("_q", quality_score(F.col(s.text_col)))
                .filter(F.col("_q") >= s.min_quality)
                .drop("_q"),
            )

        cur = cur.persist()
        cur.count()  # single pass: fires every observation + fills the cache
        stages: list[tuple[str, int]] = [(name, int(o.get["n"])) for name, o in taps]

        if s.dedup == "exact":
            cur = drop_exact_duplicates(cur, s.text_col, s.id_col)
            stages.append(("dedup_exact", cur.count()))
        elif s.dedup in ("minhash", "simhash"):
            # exact dedup first (cheap, shrinks the LSH input), then
            # near-dup on the survivors
            cur = drop_exact_duplicates(cur, s.text_col, s.id_col).persist()
            stages.append(("dedup_exact", cur.count()))
            drops = self._near_dup_drop_ids(cur)
            cur = cur.join(drops, s.id_col, "left_anti")
            stages.append((f"dedup_{s.dedup}", cur.count()))
        elif s.dedup != "none":
            raise ValueError(f"unknown dedup strategy {self.spec.dedup!r}")

        if s.mix_alpha is not None:
            # temperature resampling AFTER dedup (so rates reflect the
            # clean corpus); deterministic portable-hash realization
            from ..operators.corpus import temperature_sample

            cur = temperature_sample(
                cur,
                alpha=s.mix_alpha,
                target_total=s.mix_target_total,
                group_col=s.lang_col,
                id_col=s.id_col,
                seed=s.mix_seed,
            )
            stages.append(("temperature_mix", cur.count()))

        chunks = None
        if s.chunk_size > 0:
            chunks = chunk_documents(
                cur,
                s.text_col,
                s.id_col,
                chunk_size=s.chunk_size,
                stride=s.chunk_stride or s.chunk_size,
            )

        spark = df.sparkSession
        report = spark.createDataFrame(
            [
                (name, stages[i - 1][1] if i else n, n)
                for i, (name, n) in enumerate(stages)
            ],
            "stage string, rows_in long, rows_out long",
        )
        return CorpusPrepResult(clean=cur, chunks=chunks, report=report)


def embedding_incremental_ann_intake(
    stream: DataFrame,
    sink_path: str,
    checkpoint: str,
    index_table: str,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
    nprobe: int | None = None,
):
    """Incremental EMBEDDING corpus build with unbounded-horizon
    semantic near-dup dedup — the vector twin of
    :func:`corpus_incremental_near_dup_intake`.

    Each micro-batch: (1) replay-guard anti-join against sink ids,
    (2) the batch joins the PERSISTED bucketed IVF index on the
    ivf_cell key — probe rows explode to their ``nprobe`` cells, the
    index side never reshuffles — plus the batch's own assignment (so
    within-batch dups resolve in the same pass), (3) a batch vector
    with ANY smaller-id neighbor at round(cosine, 6) ≥ ``threshold``
    is dropped, (4) ALL batch vectors append to the index (dropped
    vectors still block future near-dups of their neighborhood — the
    declarative survivor rule counts them), survivors append to the
    sink.

    ``nprobe=None`` probes every cell: the drop check is then EXACT
    (each index vector lives in exactly one cell, so summing over all
    probed cells enumerates each candidate pair once — batch×corpus
    worst case, which the gate uses for provable parity). Production
    sets nprobe ≪ n_cells for the standard IVF recall/cost trade.

    Assumes monotone intake ids (append-log), like the text intake.
    """
    from ..operators.similarity import ivf_assign
    from ..functions import vec_dot, vec_norm

    k = len(centroids)
    probe_cells = list(range(k)) if nprobe is None else None

    def handle(batch: DataFrame, _epoch: int) -> None:
        spark = batch.sparkSession
        b = batch.dropDuplicates([id_col])
        # probe, not try/except (see corpus_incremental_intake)
        from ..session import path_exists

        if path_exists(spark, sink_path):
            seen = spark.read.parquet(sink_path).select(id_col)
            b = b.join(seen, id_col, "left_anti")
        b = b.localCheckpoint()
        assigned, _ = ivf_assign(b, vec_col=vec_col, centroids=centroids)
        batch_index = assigned.select(
            F.col(id_col).alias("right_id"),
            F.col(vec_col).alias("rvec"),
            "ivf_cell",
        )
        blockers = batch_index
        if spark.catalog.tableExists(index_table):
            blockers = spark.table(index_table).unionByName(batch_index)
        if probe_cells is not None:
            cells = F.array(*[F.lit(c) for c in probe_cells])
        else:
            from ..operators.similarity import _probe_cells_expr

            cells = _probe_cells_expr(vec_col, centroids, nprobe)
        probe = b.select(
            F.col(id_col),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_pv"),
            vec_norm(F.col(vec_col)).alias("_pn"),
            F.explode(cells).alias("ivf_cell"),
        )
        rv = F.transform(F.col("rvec"), lambda x: x.cast("double"))
        denom = F.col("_pn") * vec_norm(F.col("rvec"))
        cos = F.when(denom > 0, vec_dot(F.col("_pv"), rv) / denom)
        drops = (
            probe.join(blockers, "ivf_cell")
            .filter(F.col("right_id") < F.col(id_col))
            .filter(F.round(cos, 6) >= F.lit(threshold))
            .select(id_col)
            .distinct()
        )
        surv = b.join(drops, id_col, "left_anti")
        # the WHOLE batch joins the index (dropped ids included); only
        # survivors reach the sink
        writer = (
            batch_index.write.mode("append")
            .bucketBy(8, "ivf_cell")
            .sortBy("ivf_cell")
        )
        if not spark.catalog.tableExists(index_table):
            writer = batch_index.write.mode("overwrite").bucketBy(
                8, "ivf_cell"
            ).sortBy("ivf_cell")
        writer.saveAsTable(index_table)
        surv.write.mode("append").parquet(sink_path)

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def _recover_or_probe_index(spark, index_table: str) -> bool:
    """The staged index swap has a tiny window (live table renamed
    aside, staged not yet promoted). If a crash left the name empty,
    promote the best surviving copy — ``__staged`` (the completed
    post-forget image) over ``__old`` (the pre-forget image) — so a
    retry heals instead of silently reporting removed=0 with index
    residue stranded under a sibling name. Returns tableExists after
    recovery."""
    if spark.catalog.tableExists(index_table):
        return True
    for cand in (f"{index_table}__staged", f"{index_table}__old"):
        if spark.catalog.tableExists(cand):
            spark.sql(f"ALTER TABLE {cand} RENAME TO {index_table}")
            return True
    return False


def forget_documents(
    spark,
    forget_ids,
    sink_path: str,
    index_table: str | None = None,
    id_col: str = "doc_id",
    n_buckets: int = 16,
) -> dict[str, int]:
    """Right-to-be-forgotten across every surface the intake pipeline
    persists a document to: the corpus sink, the companion
    ``<sink>_dropped`` blocker store, and the bucketed LSH band index.
    After this call the documents are gone AND stop acting as near-dup
    blockers — a re-submitted copy of a forgotten text is admitted,
    which the pytest proves (deletion that leaves index residue behind
    is a silent privacy leak).

    ``forget_ids`` is a list of ids or a 1-column DataFrame. Parquet
    surfaces rewrite via anti-join → staged sibling write → atomic
    rename swap (:func:`_staged_parquet_swap`) — a crash mid-forget
    always leaves a complete on-disk copy, never an empty sink; the
    index table rewrites through a staged ``saveAsTable`` + ``ALTER
    TABLE RENAME``, preserving the bucket spec so post-forget intake
    batches still join shuffle-free. At 100 TB swap the sink rewrites
    for Delta DELETE (file-level rewrite of only affected files); the
    index rewrite stays bucket-preserving either way.

    Returns per-surface removed-row counts.
    """
    from ..operators.bucketing import drop_table_and_location

    if isinstance(forget_ids, (list, tuple)):
        ids = spark.createDataFrame(
            [(int(i),) for i in forget_ids], f"{id_col} long"
        )
    else:
        ids = forget_ids.select(id_col)
    ids = ids.localCheckpoint()
    removed: dict[str, int] = {}

    for label, path in (("sink", sink_path), ("dropped", sink_path.rstrip("/") + "_dropped")):
        # recovery probe first (heals a crashed prior swap), then a
        # bare read so real errors propagate instead of reporting 0
        if not _recover_or_probe_parquet(spark, path):
            removed[label] = 0
            continue
        cur = spark.read.parquet(path)
        before = cur.count()
        kept = cur.join(ids, id_col, "left_anti")
        removed[label] = before - _staged_parquet_swap(spark, kept, path)

    if index_table and _recover_or_probe_index(spark, index_table):
        cur = spark.table(index_table)
        before = cur.count()
        kept = cur.join(ids, id_col, "left_anti")
        staged, old = f"{index_table}__staged", f"{index_table}__old"
        drop_table_and_location(spark, staged)
        drop_table_and_location(spark, old)
        (
            kept.write.mode("overwrite")
            .bucketBy(n_buckets, "bucket_key")
            .sortBy("bucket_key")
            .saveAsTable(staged)
        )
        # rename-aside swap: at every instant a complete copy exists
        # under SOME name, and _recover_or_probe_index heals the
        # rename1->rename2 window on the next call
        spark.sql(f"ALTER TABLE {index_table} RENAME TO {old}")
        spark.sql(f"ALTER TABLE {staged} RENAME TO {index_table}")
        drop_table_and_location(spark, old)
        removed["index"] = before - spark.table(index_table).count()
    else:
        removed["index"] = 0
    return removed


def forget_vectors(
    spark,
    forget_ids,
    sink_path: str,
    index_table: str | None = None,
    id_col: str = "vec_id",
    n_buckets: int = 8,
) -> dict[str, int]:
    """Right-to-be-forgotten for the EMBEDDING intake — the vector twin
    of :func:`forget_documents`: removes ids from the corpus sink and
    from the persisted bucketed IVF index (where every intake vector,
    dropped or not, lives as a blocker). After the call the vectors are
    gone AND stop vetoing semantic near-dups, so a re-submitted copy of
    a forgotten embedding is admitted — index residue that still blocks
    would leak that the vector once existed.

    The sink rewrites via staged write + atomic rename
    (:func:`_staged_parquet_swap`); the index through a staged
    ``saveAsTable`` + rename, preserving ``bucketBy(n_buckets,
    ivf_cell)`` so post-forget intake batches keep their shuffle-free
    probe join. Returns per-surface removed-row counts.
    """
    from ..operators.bucketing import drop_table_and_location

    if isinstance(forget_ids, (list, tuple)):
        ids = spark.createDataFrame(
            [(int(i),) for i in forget_ids], f"{id_col} long"
        )
    else:
        ids = forget_ids.select(id_col)
    ids = ids.localCheckpoint()
    removed: dict[str, int] = {}

    if not _recover_or_probe_parquet(spark, sink_path):
        removed["sink"] = 0
    else:
        cur = spark.read.parquet(sink_path)
        before = cur.count()
        kept = cur.join(ids, id_col, "left_anti")
        removed["sink"] = before - _staged_parquet_swap(spark, kept, sink_path)

    if index_table and _recover_or_probe_index(spark, index_table):
        cur = spark.table(index_table)
        before = cur.count()
        kept = cur.join(
            ids.select(F.col(id_col).alias("right_id")), "right_id", "left_anti"
        )
        staged, old = f"{index_table}__staged", f"{index_table}__old"
        drop_table_and_location(spark, staged)
        drop_table_and_location(spark, old)
        (
            kept.write.mode("overwrite")
            .bucketBy(n_buckets, "ivf_cell")
            .sortBy("ivf_cell")
            .saveAsTable(staged)
        )
        spark.sql(f"ALTER TABLE {index_table} RENAME TO {old}")
        spark.sql(f"ALTER TABLE {staged} RENAME TO {index_table}")
        drop_table_and_location(spark, old)
        removed["index"] = before - spark.table(index_table).count()
    else:
        removed["index"] = 0
    return removed


def corpus_stream_warc_intake(
    stream: DataFrame,
    sink_path: str,
    checkpoint: str,
    min_content_length: int = 100,
):
    """Continuous crawl ingestion: a ``binaryFile`` STREAM of
    ``.warc.gz`` shards → per-batch gzip-member split + length-driven
    record parse (sources/warc.py) → cheap content-length gate →
    append to the corpus sink. The shard-arrival cadence IS the
    micro-batch cadence, and a corrupt shard costs only its own
    records — the properties a 100 TB continuous crawl feed needs.

    Exactly-once: ``foreachBatch`` is at-least-once (a batch that
    wrote but crashed before its epoch committed is REPLAYED), so the
    append is guarded by a ``record_id`` anti-join against the sink —
    the same replay-idempotence shape as
    :func:`corpus_incremental_intake`'s fingerprint guard. The guard
    reads one pruned column of the sink per batch; at 100 TB swap it
    for a Delta MERGE whenNotMatchedInsert on record_id.

    Downstream composition point: swap the append for
    :func:`corpus_incremental_near_dup_intake`'s foreachBatch body to
    get streaming near-dup dedup on top of the parsed records.
    """
    from ..sources.warc import warc_gz_parse

    def handle(batch_df: DataFrame, _epoch: int) -> None:
        spark = batch_df.sparkSession
        recs = warc_gz_parse(batch_df).filter(
            F.col("content_length") >= min_content_length
        )
        # existence probe, not a bare except: a transient sink-read
        # failure must fail the batch (foreachBatch retries it), not
        # silently skip the anti-join and degrade the replay-idempotence
        # guarantee from exactly-once to at-least-once
        from ..session import path_exists

        if path_exists(spark, sink_path):
            seen = spark.read.parquet(sink_path).select("record_id").distinct()
            recs = recs.join(seen, "record_id", "left_anti")
        recs.write.mode("append").parquet(sink_path)

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
