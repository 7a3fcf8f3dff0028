"""Property-based tests (hypothesis): asof_join and ManagedTable.merge
against pure-Python reference implementations."""

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

BASE = datetime(2024, 1, 1)

pair_lists = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 1000)), min_size=0, max_size=12
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(left=pair_lists, right=pair_lists)
def test_asof_join_matches_python_reference(spark, left, right):
    from dataingestionframework_spark.operators.joins import asof_join

    ldf = spark.createDataFrame(
        [(k, BASE + timedelta(seconds=s), i) for i, (k, s) in enumerate(left)] or
        [(0, BASE, -1)], "k long, ts timestamp, lid long",
    )
    # de-dup right (k, ts) so the asof match is unambiguous
    rseen = {}
    for j, (k, s) in enumerate(right):
        rseen[(k, s)] = j
    rrows = [(k, BASE + timedelta(seconds=s), j) for (k, s), j in rseen.items()]
    rdf = spark.createDataFrame(rrows or [(99, BASE, -1)], "k long, ts timestamp, rid long")

    got = {
        r.lid: r.rid_right
        for r in asof_join(ldf, rdf, "k", "ts", "ts", ["rid"]).collect()
    }

    for i, (k, s) in enumerate(left or [(0, 0)]):
        cands = [(ts, j) for (kk, ts2), j in rseen.items()
                 for ts in [ts2] if kk == k and ts2 <= s]
        expected = max(cands)[1] if cands else None
        lid = i if left else -1
        assert got.get(lid, None) == expected, (k, s, cands)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    target=st.dictionaries(st.integers(0, 5), st.integers(0, 100), max_size=6),
    source=st.dictionaries(st.integers(0, 5), st.integers(0, 100), max_size=6),
)
def test_merge_matches_dict_semantics(spark, tmp_root, target, source):
    """merge(update-all, insert, soft-delete) == dict union with a
    'current' flag for keys the source dropped."""
    import uuid

    from dataingestionframework_spark.catalog.table import ManagedTable

    t = ManagedTable(spark, f"{tmp_root}/m-{uuid.uuid4().hex[:8]}")
    tdf = spark.createDataFrame(
        [(k, v, 1) for k, v in target.items()] or [(-1, 0, 1)], "id long, v long, cur int"
    )
    t.overwrite(tdf)
    sdf = spark.createDataFrame(
        [(k, v, 1) for k, v in source.items()] or [(-2, 0, 1)], "id long, v long, cur int"
    )
    t.merge(
        sdf, on=["id"], when_matched_update="all", when_not_matched_insert=True,
        when_not_matched_by_source_update={"cur": F.lit(0)},
    )
    got = {r.id: (r.v, r.cur) for r in t.read().collect()}

    tgt = dict(target) if target else {-1: 0}
    src = dict(source) if source else {-2: 0}
    expected = {}
    for k, v in tgt.items():
        expected[k] = (src[k], 1) if k in src else (v, 0)
    for k, v in src.items():
        if k not in tgt:
            expected[k] = (v, 1)
    assert got == expected


texts = st.lists(
    st.text(alphabet="ab c", min_size=0, max_size=60), min_size=1, max_size=6
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=texts, chunk_size=st.integers(1, 8), stride=st.integers(1, 8))
def test_chunking_matches_python_reference(spark, docs, chunk_size, stride):
    """chunk_documents == the obvious Python chunker for every
    (chunk_size, stride), including empty docs, stride>chunk_size gaps
    (sampling) and stride<chunk_size overlap."""
    from dataingestionframework_spark.operators.text import chunk_documents

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        (r.doc_id, r.chunk_id): (r.n_chunk_tokens, r.chunk)
        for r in chunk_documents(df, chunk_size=chunk_size, stride=stride).collect()
    }
    expected = {}
    for i, t in enumerate(docs):
        toks = t.split()
        for ci, s in enumerate(range(0, max(len(toks), 1), stride)):
            part = toks[s : s + chunk_size]
            if part:
                expected[(i, ci)] = (len(part), " ".join(part))
    assert got == expected


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=st.lists(st.text(alphabet="abc d", min_size=12, max_size=40),
                     min_size=2, max_size=5))
def test_simhash_pigeonhole_blocking_equals_all_pairs(spark, docs):
    """The pigeonhole-blocked simhash join returns EXACTLY the pairs an
    unblocked all-pairs hamming comparison would — the blocking is an
    optimization, never a semantics change."""
    from dataingestionframework_spark.operators.dedup import simhash_pairs
    from dataingestionframework_spark.operators.text import simhash64_df

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_pairs(df, max_hamming=20, portable=True).collect()
    }
    sketches = {r.doc_id: r.sh for r in simhash64_df(df, portable=True).collect()}
    expected = {}
    ids = sorted(sketches)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            h = bin(sketches[ids[i]] ^ sketches[ids[j]]).count("1")
            if h <= 20:
                expected[(ids[i], ids[j])] = h
    assert got == expected


@given(
    old=st.dictionaries(st.integers(0, 30), st.text("ab", max_size=3), max_size=20),
    new=st.dictionaries(st.integers(0, 30), st.text("ab", max_size=3), max_size=20),
)
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_corpus_diff_matches_dict_diff(spark, old, new):
    from dataingestionframework_spark.operators.corpus import corpus_diff

    schema = "doc_id long, text string"
    old_df = spark.createDataFrame(list(old.items()) or [(None, None)], schema).filter(
        "doc_id IS NOT NULL"
    )
    new_df = spark.createDataFrame(list(new.items()) or [(None, None)], schema).filter(
        "doc_id IS NOT NULL"
    )
    got = {r.doc_id: r.status for r in corpus_diff(old_df, new_df).collect()}
    expected = {}
    for k in set(old) | set(new):
        if k not in old:
            expected[k] = "added"
        elif k not in new:
            expected[k] = "removed"
        elif old[k] == new[k]:
            expected[k] = "unchanged"
        else:
            expected[k] = "changed"
    assert got == expected


@given(ids=st.lists(st.integers(0, 10_000), unique=True, min_size=1, max_size=60),
       seed=st.integers(0, 5))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_seeded_shuffle_matches_hash_sort(spark, ids, seed):
    import hashlib

    from dataingestionframework_spark.operators.corpus import seeded_shuffle

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {r.doc_id: r.shuffle_rank for r in seeded_shuffle(df, seed=seed).collect()}
    order = sorted(ids, key=lambda i: hashlib.md5(f"{seed}:{i}".encode()).hexdigest())
    assert got == {i: pos for pos, i in enumerate(order)}


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    counts=st.dictionaries(
        st.sampled_from(["en", "es", "fr", "de", "zh"]),
        st.integers(1, 40), min_size=1, max_size=5,
    ),
    alpha=st.floats(0.0, 1.0),
    target=st.integers(1, 60),
)
def test_temperature_mix_properties(spark, counts, alpha, target):
    """For ANY corpus profile: weights sum to 1, expected docs sum to
    min(target-capped-by-rates, …) per definition, rates ∈ (0, 1], and
    the realized sample is a subset with per-group size ≤ ceil cap."""
    from dataingestionframework_spark.operators.corpus import (
        temperature_mix_rates,
        temperature_sample,
    )

    rows = [
        (lang, i + 1000 * li)
        for li, (lang, n) in enumerate(sorted(counts.items()))
        for i in range(n)
    ]
    df = spark.createDataFrame(
        [(doc_id, lang) for lang, doc_id in rows], "doc_id long, lang string"
    )
    rates = temperature_mix_rates(df, alpha=alpha, target_total=target).collect()
    assert abs(sum(r.mix_weight for r in rates) - 1.0) < 1e-6
    assert all(0 < r.sample_rate <= 1.0 + 1e-9 for r in rates)
    by_group = {r.group: r for r in rates}
    sampled = temperature_sample(df, alpha=alpha, target_total=target).collect()
    all_ids = {r.doc_id for r in df.collect()}
    assert {r.doc_id for r in sampled} <= all_ids
    # per-group realized count never exceeds the group's population
    from collections import Counter

    got = Counter(r.lang for r in sampled)
    for g, n in got.items():
        assert n <= by_group[g].n_docs


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    chunks=st.lists(
        st.sampled_from([
            "plain words here",
            "mail me at a.b-c_d@ex-ample.org thanks",
            "call 212-555-0143 now",
            "host 10.0.0.1 up",
            "x@y.io 99-1234-5678",
        ]),
        min_size=1, max_size=5,
    )
)
def test_scrub_pii_idempotent_and_clean(spark, chunks):
    """Scrubbing is idempotent (placeholders contain no PII patterns)
    and the scrubbed text never matches any pattern again."""
    from dataingestionframework_spark.operators.text import PII_PATTERNS, scrub_pii

    text = " ".join(chunks)
    df = spark.createDataFrame([(1, text)], "id long, text string")
    once = scrub_pii(df, "text")
    twice = scrub_pii(once.select("id", "text"), "text")
    r1 = once.first()
    r2 = twice.first()
    assert r2.text == r1.text            # idempotent
    assert r2.n_redactions == 0          # nothing left to find
    import re

    for pat in PII_PATTERNS.values():
        assert not re.search(pat, r1.text)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    weights=st.lists(st.integers(1, 1000), min_size=1, max_size=30),
    k=st.integers(1, 10),
    seed=st.integers(0, 3),
)
def test_weighted_sample_matches_python_reference(spark, weights, k, seed):
    """A-ES sampling is a pure function of (data, seed): the Spark
    result must equal a python re-derivation of key = u^(1/w) top-k."""
    import hashlib

    from dataingestionframework_spark.operators.corpus import weighted_sample

    rows = [(i, float(w)) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    got = sorted(
        r.doc_id for r in weighted_sample(df, "w", k, seed=seed).collect()
    )

    def unit(i):
        h = hashlib.md5(f"aes:{seed}:{i}".encode()).hexdigest()
        return int(h[:15], 16) / float(1 << 60)

    keys = [(unit(i) ** (1.0 / w), -i) for i, w in rows]
    expect = sorted(
        sorted(range(len(rows)), key=lambda i: (-keys[i][0], i))[: min(k, len(rows))]
    )
    assert got == expect


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "spark"]), min_size=1, max_size=8),
        min_size=1,
        max_size=8,
    )
)
def test_bm25_matches_python_reference(spark, docs):
    """BM25 scores equal the closed-form python computation."""
    import math

    from dataingestionframework_spark.operators.retrieval import bm25_topk

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r.score for r in bm25_topk(df, ["spark"], k=len(rows)).collect()}

    n = len(docs)
    avgdl = sum(len(d) for d in docs) / n
    dfc = sum(1 for d in docs if "spark" in d)
    idf = math.log((n - dfc + 0.5) / (dfc + 0.5) + 1.0)
    for i, d in enumerate(docs):
        tf = float(d.count("spark"))
        expect = idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(d) / avgdl))
        if i in got:
            assert abs(got[i] - round(expect, 4)) <= 1e-4


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    left=pair_lists,
    right=pair_lists,
    how=st.sampled_from(["inner", "left_outer", "full_outer"]),
)
def test_interval_join_matches_python_reference(spark, left, right, how):
    """stream_interval_join on batch frames == a python reference for
    inner/left_outer/full_outer (right event at-or-before left, within
    1000 ms)."""
    from dataingestionframework_spark.streaming.joins import stream_interval_join

    ldf = spark.createDataFrame(
        [(k, BASE + timedelta(milliseconds=ms), i) for i, (k, ms) in enumerate(left)],
        "user_id long, ts timestamp, lid long",
    )
    rdf = spark.createDataFrame(
        [(k, BASE + timedelta(milliseconds=ms), i) for i, (k, ms) in enumerate(right)],
        "user_id long, ts timestamp, rid long",
    )
    got = {
        (r.user_id, r.lid, r.r_rid)
        for r in stream_interval_join(
            ldf, rdf, on="user_id", within="1 seconds", how=how
        ).collect()
    }

    matches = {
        (lk, li, ri)
        for li, (lk, lms) in enumerate(left)
        for ri, (rk, rms) in enumerate(right)
        if lk == rk and rms <= lms and rms >= lms - 1000
    }
    expect = set(matches)
    if how in ("left_outer", "full_outer"):
        matched_l = {li for _, li, _ in matches}
        expect |= {
            (lk, li, None) for li, (lk, _) in enumerate(left) if li not in matched_l
        }
    if how == "full_outer":
        matched_r = {ri for _, _, ri in matches}
        expect |= {
            (rk, None, ri) for ri, (rk, _) in enumerate(right) if ri not in matched_r
        }
    assert got == expect


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=st.lists(st.text(alphabet="ab c", min_size=0, max_size=50),
                     min_size=1, max_size=6),
       k=st.integers(2, 4))
def test_substring_dedup_matches_python_reference(spark, docs, k):
    """remove_duplicate_spans == the obvious Python implementation for
    every (corpus, k): same covered positions, same survivor counts,
    same reassembled text — including empty docs, docs shorter than k,
    and repeats at arbitrary offsets. (The tiny 'ab c' alphabet makes
    cross-doc window collisions common, which is the interesting case.)"""
    from collections import defaultdict

    from dataingestionframework_spark.operators.text import (
        remove_duplicate_spans,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        r.id: (r.n_tokens, r.n_removed, r.clean_text)
        for r in remove_duplicate_spans(df, k=k, min_docs=2).collect()
    }

    toks = {i: t.split() for i, t in enumerate(docs)}
    owners = defaultdict(set)
    for i, ts in toks.items():
        for p in range(len(ts) - k + 1):
            owners[tuple(ts[p : p + k])].add(i)
    dup = {g for g, o in owners.items() if len(o) >= 2}
    expected = {}
    for i, ts in toks.items():
        cov = set()
        for p in range(len(ts) - k + 1):
            if tuple(ts[p : p + k]) in dup:
                cov.update(range(p, p + k))
        kept = [t for j, t in enumerate(ts) if j not in cov]
        expected[i] = (len(ts), len(ts) - len(kept), " ".join(kept))
    assert got == expected


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pts=st.lists(
    st.tuples(st.integers(0, 40), st.integers(0, 40)),
    min_size=0, max_size=25, unique=True,
))
def test_radius_join_matches_python_reference(spark, pts):
    """Grid-blocked radius join == brute-force all-pairs on arbitrary
    integer point sets (boundary-exact: dist² and r² are integral)."""
    from dataingestionframework_spark.operators.spatial import radius_self_join

    rows = [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows or [(0, 0.0, 0.0)],
                               "id long, x double, y double")
    got = {(r.id_a, r.id_b) for r in radius_self_join(df, radius=7.0).collect()}
    want = set()
    for i, (xa, ya) in enumerate(pts):
        for j, (xb, yb) in enumerate(pts):
            if i < j and (xa - xb) ** 2 + (ya - yb) ** 2 <= 49:
                want.add((i, j))
    if not pts:
        want = set()
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=st.lists(st.integers(0, 1000), min_size=1, max_size=20))
def test_ewma_is_convex_combination(spark, vals):
    """Finite-window EWMA is a weighted mean of present values: always
    within [min, max] of the last `window` values, and equal to the
    value itself on the first row of a partition."""
    from dataingestionframework_spark.operators.windows import ewma_finite

    df = spark.createDataFrame(
        [(1, i, float(v)) for i, v in enumerate(vals)],
        "k long, seq long, value double",
    )
    out = sorted(
        ewma_finite(df, "value", ["k"], ["seq"], alpha=0.4, window=6).collect(),
        key=lambda r: r.seq,
    )
    assert out[0].ewma == out[0].value
    for i, r in enumerate(out):
        lo = min(vals[max(0, i - 5): i + 1])
        hi = max(vals[max(0, i - 5): i + 1])
        assert lo - 1e-9 <= r.ewma <= hi + 1e-9


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    texts=st.lists(
        st.text(alphabet="ab c.!-\n\t0", min_size=0, max_size=40),
        min_size=1, max_size=8,
    ),
    phrases=st.lists(
        st.text(alphabet="abc0", min_size=1, max_size=3).filter(str.strip),
        min_size=1, max_size=3,
    ),
)
def test_blocklist_filter_matches_python_reference(spark, texts, phrases):
    """The replace-count contract == a token-scan reference: normalize
    on [^a-z0-9]+, count leftmost non-overlapping phrase occurrences
    over the token sequence."""
    import re

    from dataingestionframework_spark.operators.text import blocklist_filter

    def ref_hits(text: str) -> int:
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        total = 0
        for p in phrases:
            ptoks = [t for t in re.split(r"[^a-z0-9]+", p.lower()) if t]
            i, n = 0, 0
            while i + len(ptoks) <= len(toks):
                if toks[i : i + len(ptoks)] == ptoks:
                    n += 1
                    i += len(ptoks)
                else:
                    i += 1
            total += n
        return total

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    got = {
        r.id: r.n_blocked_hits
        for r in blocklist_filter(df, phrases).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == ref_hits(t), (t, phrases)


@settings(max_examples=15, deadline=None)
@given(
    members=st.lists(
        st.tuples(
            st.text(alphabet="abcdef01._-", min_size=1, max_size=20),
            st.binary(min_size=0, max_size=1200),
        ),
        min_size=0, max_size=6,
        unique_by=lambda m: m[0],
    )
)
def test_tar_parse_roundtrips_tarfile(members):
    """parse_tar_bytes recovers exactly what CPython's tarfile wrote,
    for arbitrary names and binary payloads (incl. payloads spanning
    multiple 512-byte blocks and zero-length members)."""
    import io
    import tarfile

    from dataingestionframework_spark.sources.tar import parse_tar_bytes

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, data in members:
            ti = tarfile.TarInfo(name)
            ti.size = len(data)
            tf.addfile(ti, io.BytesIO(data))
    got = parse_tar_bytes(buf.getvalue())
    assert [(n, s, p) for n, s, p in got] == [
        (n, len(d), d) for n, d in members
    ]


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    scores=st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 20)),  # (prompt, score*0.05)
        min_size=0, max_size=24,
    )
)
def test_preference_pairs_matches_python_reference(spark, scores):
    """chosen = argmax (score, ties lowest id), rejected = argmin
    (score, ties highest id), pair emitted iff margin > 0 — against a
    brute-force dict reference."""
    from dataingestionframework_spark.operators.corpus import preference_pairs

    rows = [(f"p{p}", i, s * 0.05) for i, (p, s) in enumerate(scores)]
    df = spark.createDataFrame(
        rows or [("px", 0, 0.0)], "prompt string, doc_id long, score double"
    )
    got = {r.prompt: (r.chosen_id, r.rejected_id, r.margin)
           for r in preference_pairs(df).collect()}

    byp = {}
    for prompt, i, s in rows:
        byp.setdefault(prompt, []).append((s, i))
    for prompt, members in byp.items():
        best = max(members, key=lambda t: (t[0], -t[1]))
        worst = min(members, key=lambda t: (t[0], -t[1]))
        if best[0] - worst[0] > 0:
            assert got[prompt][:2] == (best[1], worst[1])
            assert abs(got[prompt][2] - (best[0] - worst[0])) < 1e-9
        else:
            assert prompt not in got
    assert set(got) <= set(byp)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    prev=st.dictionaries(st.integers(0, 9), st.integers(0, 3), max_size=10),
    cur=st.dictionaries(st.integers(0, 9), st.integers(0, 3), max_size=10),
)
def test_table_diff_matches_dict_diff(spark, prev, cur):
    """Status partition == dict comparison; diff(x, x) is all
    unchanged; added+changed+unchanged keys == cur keys."""
    from dataingestionframework_spark.operators.profile import table_diff

    pdf = spark.createDataFrame(
        [(k, v) for k, v in prev.items()] or [(-1, 0)], "k long, v int"
    )
    cdf = spark.createDataFrame(
        [(k, v) for k, v in cur.items()] or [(-1, 0)], "k long, v int"
    )
    pd_, cd_ = (prev or {-1: 0}), (cur or {-1: 0})
    got = {r.k: r.diff_status for r in table_diff(cdf, pdf, ["k"]).collect()}
    exp = {}
    for k in set(pd_) | set(cd_):
        if k not in pd_:
            exp[k] = "added"
        elif k not in cd_:
            exp[k] = "removed"
        elif pd_[k] != cd_[k]:
            exp[k] = "changed"
        else:
            exp[k] = "unchanged"
    assert got == exp
    self_diff = {r.diff_status for r in table_diff(cdf, cdf, ["k"]).collect()}
    assert self_diff == {"unchanged"}


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    # per-element filter (not a whole-list filter): rejecting an entire
    # 16-tuple list on one bad element trips FailedHealthCheck
    # (filter_too_much) on unlucky seeds — seen with seed 2836786…138
    vecs=st.lists(
        st.tuples(st.floats(-1, 1, allow_nan=False, width=32),
                  st.floats(-1, 1, allow_nan=False, width=32))
        .filter(lambda t: abs(t[0]) + abs(t[1]) > 0.05),
        min_size=2, max_size=16,
    )
)
def test_kmeans_lloyd_matches_python_reference(spark, vecs):
    """The full deterministic trajectory (init, rounded-cosine argmax
    with lower-cid ties, rounded mean update, empty-cluster drop)
    replayed in pure python must give identical assignments."""
    import math

    from dataingestionframework_spark.operators.similarity import kmeans_lloyd

    rows = [(i, [float(a), float(b)]) for i, (a, b) in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    assigned, cents, counts = kmeans_lloyd(df, k=2, iters=2)
    got = {r.vec_id: r.cluster_id for r in assigned.collect()}

    import struct
    def f32(x):  # python float -> float32 value as double (Spark reads float32)
        return struct.unpack("f", struct.pack("f", x))[0]

    pts = {i: [f32(a), f32(b)] for i, (a, b) in enumerate(vecs)}
    cs = {j: [round(x, 6) for x in pts[j]] for j in (0, 1)}

    def cos(u, v):
        d = sum(a * b for a, b in zip(u, v))
        nu = math.sqrt(sum(a * a for a in u)) * math.sqrt(sum(b * b for b in v))
        return None if nu == 0 else d / nu

    def assign(c):
        out = {}
        for i, v in pts.items():
            scored = sorted(
                ((-(round(s, 6) if (s := cos(v, cv)) is not None else float("-inf")), cid)
                 for cid, cv in c.items())
            )
            out[i] = scored[0][1]
        return out

    for _ in range(2):
        a = assign(cs)
        nxt = {}
        for cid in set(a.values()):
            members = [pts[i] for i, c in a.items() if c == cid]
            nxt[cid] = [round(sum(m[d] for m in members) / len(members), 6)
                        for d in (0, 1)]
        cs = nxt
    exp = assign(cs)
    assert got == exp


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    turns=st.lists(
        st.tuples(st.integers(0, 1),            # conv
                  st.booleans(),                 # assistant?
                  st.text(alphabet="ab c", max_size=6)),
        min_size=1, max_size=10,
    )
)
def test_chat_transcript_spans_slice_back_to_turn_text(spark, turns):
    """The 1-based [start,end) mask spans, applied to the transcript,
    must recover exactly the assistant turns' texts in turn order —
    for arbitrary (including empty and spacey) turn texts."""
    from dataingestionframework_spark.operators.corpus import chat_transcripts

    rows = [
        (f"c{c}", i, "assistant" if a else "user", txt)
        for i, (c, a, txt) in enumerate(turns)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn long, role string, text string"
    )
    out = {r.conv_id: r for r in chat_transcripts(df).collect()}
    by_conv = {}
    for conv, i, role, txt in rows:
        by_conv.setdefault(conv, []).append((i, role, txt))
    for conv, members in by_conv.items():
        r = out[conv]
        expected = "".join(f"<|{role}|>{txt}\n" for _, role, txt in sorted(members))
        assert r.transcript == expected
        got_slices = [r.transcript[s - 1 : e - 1]
                      for s, e in zip(r.mask_starts, r.mask_ends)]
        assert got_slices == [txt for _, role, txt in sorted(members)
                              if role == "assistant"]


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(perm_seed=st.integers(0, 5))
def test_dsir_importance_invariant_to_row_order(spark, perm_seed):
    """Weights depend on the token distributions only — shuffling the
    input rows (and repartitioning) must not change any weight."""
    import random

    from dataingestionframework_spark.operators.corpus import dsir_importance

    rows = [(i, ["aa", "bb", "cc", "dd"][i % 4] * (1 + i % 3) + " aa")
            for i in range(12)]
    rows = [(i, t) for i, t in rows]
    shuffled = rows[:]
    random.Random(perm_seed).shuffle(shuffled)

    def run(data, parts):
        df = spark.createDataFrame(data, "doc_id long, text string").repartition(parts)
        tgt = df.filter(F.col("doc_id") % 2 == 0)
        return {r.doc_id: (r.n_tokens, r.dsir_weight)
                for r in dsir_importance(df, tgt, buckets=32, alpha=0.1).collect()}

    assert run(rows, 2) == run(shuffled, 5)


@settings(max_examples=25, deadline=None)
@given(
    timescale=st.integers(1, 2**32 - 1),
    duration=st.integers(0, 2**32 - 1),
    n_tracks=st.integers(0, 6),
    version=st.integers(0, 1),
    largesize=st.booleans(),
    mutate_at=st.one_of(st.none(), st.integers(0, 200)),
    mutate_to=st.integers(0, 255),
)
def test_mp4_walk_roundtrip_and_never_raises(
    timescale, duration, n_tracks, version, largesize, mutate_at, mutate_to
):
    """parse(build(params)) == params over the whole parameter space
    (v1 additionally covers 64-bit durations); and a single-byte
    mutation anywhere may flip the result to None or other values but
    must never raise — one corrupt file cannot kill a 100 TB scan."""
    from dataingestionframework_spark.operators.multimodal import (
        build_mp4_bytes,
        parse_mp4_boxes,
    )

    if version == 1:
        duration = duration * 2  # exercise > 32-bit range sometimes
    b = build_mp4_bytes(timescale, duration, n_tracks, version, largesize)
    got = parse_mp4_boxes(b)
    assert got["timescale"] == timescale and got["duration"] == duration
    assert got["n_tracks"] == n_tracks and got["major_brand"] == "isom"
    if mutate_at is not None and mutate_at < len(b):
        mutated = bytearray(b)
        mutated[mutate_at] = mutate_to
        parse_mp4_boxes(bytes(mutated))  # any outcome, no exception


# ---------------------------------------------------------------------------
# Round-6 operator properties
# ---------------------------------------------------------------------------

_token_docs = st.lists(
    st.lists(st.integers(0, 12), min_size=0, max_size=10),
    min_size=2, max_size=10,
)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=_token_docs)
def test_containment_join_matches_python_reference(spark, docs):
    """Asymmetric prefix-filter candidates + join verify must equal
    exact all-pairs containment on arbitrary tiny corpora (n=1 grams
    so hypothesis controls the set structure directly)."""
    from dataingestionframework_spark.operators.dedup import containment_join

    rows = [(i, " ".join(f"t{v}" for v in toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.id_a, r.id_b): r.containment
           for r in containment_join(df, n=1, threshold=0.5).collect()}
    sets = {i: {f"t{v}" for v in toks} for i, toks in enumerate(docs)}
    expect = {}
    for a in sets:
        for b in sets:
            if a != b and sets[a]:
                c = round(len(sets[a] & sets[b]) / len(sets[a]), 4)
                if c >= 0.5:
                    expect[(a, b)] = c
    assert got == expect


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vecs=st.lists(
    st.lists(st.floats(-100, 100, allow_nan=False, width=32),
             min_size=1, max_size=6),
    min_size=1, max_size=8,
))
def test_sq8_quantize_error_bound_property(spark, vecs):
    """For ANY float vector: codes bounded by ±127, reconstruction
    error ≤ scale/2 (+ rounding eps), zero vectors stay zero."""
    from dataingestionframework_spark.operators.similarity import sq8_quantize

    dim = max(len(v) for v in vecs)
    rows = [(i, [float(x) for x in (v + [0.0] * (dim - len(v)))])
            for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    import struct

    def f32(x):  # Spark stores float32 — compare against what it stored
        return struct.unpack("f", struct.pack("f", x))[0]

    by_id = {r.vec_id: r for r in sq8_quantize(df).collect()}
    for i, (_, vec) in enumerate(rows):
        r = by_id[i]
        assert all(abs(c) <= 127 for c in r.sq_codes)
        # bound vs the TRUE stored scale (the reported one is 9dp-rounded)
        true_scale = max(abs(f32(x)) for x in vec) / 127.0
        assert r.max_abs_err <= true_scale / 2 + 1e-9
        if true_scale == 0.0:
            assert set(r.sq_codes) == {0} and r.max_abs_err == 0.0


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(events=st.lists(
    st.tuples(st.integers(0, 3),        # user
              st.integers(0, 50),       # second offset
              st.integers(0, 2)),       # step index into [s0, s1, s2]
    min_size=1, max_size=25,
))
def test_funnel_counts_monotone_and_order_invariant(spark, events):
    """Funnel counts never increase along steps, and input ROW order
    cannot matter (min-aggregates are order-free)."""
    from dataingestionframework_spark.operators.behavior import (
        funnel_conversions,
    )

    def run(rows):
        # millis must be a pure function of the EVENT (not the row
        # position): an i-based fraction makes same-second timestamps
        # depend on list order, so reversing the input legitimately
        # changes a strictly-after funnel (hypothesis found the minimal
        # case [(0,0,0),(0,0,1)]) — that was a test bug, not an
        # operator one
        df = spark.createDataFrame(
            [(i, f"2024-01-01 00:00:{s:02d}.{(u * 211 + s * 17 + k * 3) % 1000:03d}", u, f"s{k}")
             for i, (u, s, k) in enumerate(rows)],
            "event_id long, ts string, user_id long, event_type string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        return {r.step_idx: r.n_users
                for r in funnel_conversions(df, ["s0", "s1", "s2"]).collect()}

    fwd = run(events)
    assert fwd[1] >= fwd[2] >= fwd[3]
    assert run(list(reversed(events))) == fwd


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=st.lists(st.integers(-1000, 1000), min_size=3, max_size=15),
       shift=st.integers(-5, 5))
def test_ks_statistic_properties(spark, vals, shift):
    """0 ≤ D ≤ 1, D(x, x) = 0, and D is symmetric in the two groups."""
    from dataingestionframework_spark.operators.profile import ks_statistic

    a = [(float(v), "a") for v in vals]
    b = [(float(v + shift), "b") for v in vals]
    df = spark.createDataFrame(a + b, "v double, g string")
    d_ab = ks_statistic(df, "v", "g", "a", "b").first().ks_stat
    d_ba = ks_statistic(df, "v", "g", "b", "a").first().ks_stat
    assert 0.0 <= d_ab <= 1.0 and d_ab == d_ba
    same = spark.createDataFrame(
        a + [(v, "b") for v, _ in a], "v double, g string"
    )
    assert ks_statistic(same, "v", "g", "a", "b").first().ks_stat == 0.0


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(weights=st.lists(st.integers(1, 50), min_size=2, max_size=10),
       k=st.integers(2, 5))
def test_gini_bounds_and_scale_invariance(spark, weights, k):
    """0 ≤ G < 1 and G is invariant under scaling every weight by k."""
    from dataingestionframework_spark.operators.profile import (
        gini_concentration,
    )

    def run(ws):
        rows = [(f"g{i}", int(w)) for i, w in enumerate(ws)]
        df = spark.createDataFrame(rows, "source string, w long")
        return gini_concentration(df, "source", weight_col="w").first().gini

    g1 = run(weights)
    gk = run([w * k for w in weights])
    assert 0.0 <= g1 < 1.0
    assert abs(g1 - gk) < 1e-9


def _winnow_py(toks, k, w):
    """Pure-Python winnowing reference: md5-prefix 40-bit gram hashes,
    leftmost-min (hash<<20 | pos) per full window, distinct."""
    import hashlib

    grams = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    keys = [
        (int(hashlib.md5(g.encode()).hexdigest()[:10], 16) << 20) | i
        for i, g in enumerate(grams)
    ]
    sel = {min(keys[i:i + w]) for i in range(len(keys) - w + 1)}
    return {(s >> 20, s & ((1 << 20) - 1)) for s in sel}


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "dd", "e"]), min_size=0,
             max_size=30),
    min_size=1, max_size=4))
def test_winnowing_matches_python_reference(spark, docs):
    """winnowing_fingerprints == the obvious Python winnower for every
    doc shape: below-window docs vanish, ties resolve leftmost, and the
    (hash, pos) pairs agree exactly — the same integer-key contract the
    DuckDB oracle replays."""
    from dataingestionframework_spark.operators.dedup import (
        winnowing_fingerprints,
    )

    k, w = 3, 4
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {}
    for r in winnowing_fingerprints(df, k=k, w=w).collect():
        got.setdefault(r.doc_id, set()).add((r.fp_hash, r.fp_pos))
    expected = {}
    for i, toks in enumerate(docs):
        fps = _winnow_py(toks, k, w)
        if fps:
            expected[i] = fps
    assert got == expected
