"""Hypothesis property tests over the operator library (batched: each
example evaluates a whole generated table in one Spark job)."""

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from big_data_hdfs_ray_vs_spark_spark.functions import bucketize
from big_data_hdfs_ray_vs_spark_spark.operators import packing
from big_data_hdfs_ray_vs_spark_spark.operators.relational import salted_collect_set

CUTS = [(10.0, "a"), (50.0, "b"), (100.0, "c")]


def _py_bucket(v):
    if v is None:
        return "z"
    for cut, label in CUTS:
        if v < cut:
            return label
    return "z"


@settings(max_examples=8, deadline=None)
@given(st.lists(st.one_of(st.none(), st.floats(-1e6, 1e6)), min_size=1, max_size=40))
def test_bucketize_matches_python(spark, vals):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, v double")
    got = {r["i"]: r["b"] for r in df.select("i", bucketize(F.col("v"), CUTS, "z").alias("b")).collect()}
    assert got == {i: _py_bucket(v) for i, v in enumerate(vals)}


@settings(max_examples=8, deadline=None)
@given(st.lists(st.integers(1, 30), min_size=1, max_size=40), st.integers(8, 64))
def test_greedy_packing_invariants(spark, counts, cap):
    rows = [(i, " ".join(["t"] * n), "s") for i, n in enumerate(counts)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = sorted(
        ((r["doc_id"], r["bin_id"], r["n_tokens"]) for r in
         packing.greedy_packing(df, capacity=cap).collect())
    )
    # bins are contiguous, non-decreasing in doc order, start at 0
    bins = [b for _, b, _ in out]
    assert bins[0] == 0
    assert all(b2 - b1 in (0, 1) for b1, b2 in zip(bins, bins[1:]))
    # no bin exceeds capacity unless it holds a single oversized doc
    from collections import defaultdict
    per = defaultdict(list)
    for _i, b, n in out:
        per[b].append(n)
    for ns in per.values():
        assert sum(ns) <= cap or len(ns) == 1


@settings(max_examples=6, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 5), st.integers(0, 20)), min_size=1, max_size=60))
def test_salted_collect_set_equals_plain(spark, pairs):
    df = spark.createDataFrame(pairs, "k int, v int")
    plain = {
        r["k"]: frozenset(r["s"])
        for r in df.groupBy("k").agg(F.collect_set("v").alias("s")).collect()
    }
    salted = {
        r["k"]: frozenset(r["values"])
        for r in salted_collect_set(df, "k", "v", n_salts=4).collect()
    }
    assert salted == plain
    # salted output has no duplicate elements
    for r in salted_collect_set(df, "k", "v", n_salts=4).collect():
        assert len(r["values"]) == len(set(r["values"]))


def test_salted_join_equals_plain_join(spark):
    from big_data_hdfs_ray_vs_spark_spark.operators.relational import salted_join
    import pyspark.sql.functions as F

    # 90% of fact rows hit one hot key.
    fact = spark.createDataFrame(
        [(1 if i % 10 else i % 7, i) for i in range(1000)], "k long, payload long"
    )
    dim = spark.createDataFrame([(i, f"d{i}") for i in range(7)], "k long, attr string")
    plain = sorted(map(tuple, fact.join(dim, "k").collect()))
    salted = sorted(map(tuple, salted_join(fact, dim, on="k", n_salts=4).collect()))
    assert salted == plain
    assert salted_join(fact, dim, on="k").columns == ["k", "payload", "attr"]


def test_salted_join_left_keeps_unmatched(spark):
    from big_data_hdfs_ray_vs_spark_spark.operators.relational import salted_join
    import pytest

    fact = spark.createDataFrame([(1, "a"), (99, "b")], "k long, v string")
    dim = spark.createDataFrame([(1, "d")], "k long, attr string")
    rows = {tuple(r) for r in salted_join(fact, dim, on="k", how="left").collect()}
    assert rows == {(1, "a", "d"), (99, "b", None)}
    with pytest.raises(ValueError):
        salted_join(fact, dim, on="k", how="right")


@settings(max_examples=8, deadline=None)
@given(
    st.lists(  # left: (key, ts, id)
        st.tuples(st.integers(0, 3), st.integers(0, 30)), min_size=1, max_size=40
    ),
    st.lists(  # right: (key, ts)
        st.tuples(st.integers(0, 3), st.integers(0, 30)), min_size=0, max_size=40
    ),
)
def test_asof_join_matches_bruteforce(spark, lefts, rights):
    from big_data_hdfs_ray_vs_spark_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lefts)], "k int, ts int, lid int"
    )
    right = spark.createDataFrame(
        [(k, t, i, float(i)) for i, (k, t) in enumerate(rights)],
        "k int, ts int, rid int, rv double",
    )
    got = {
        r["lid"]: r["rv"]
        for r in asof_join(
            left, right.select("k", "ts", "rid", "rv"), on="k", tiebreak="rid"
        ).collect()
    }
    for i, (k, t) in enumerate(lefts):
        # brute force: max (ts, rid) among right rows with same key, ts <= t
        cand = [
            (rt, j) for j, (rk, rt) in enumerate(rights) if rk == k and rt <= t
        ]
        want = float(max(cand)[1]) if cand else None
        assert got[i] == want, (i, k, t)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 99), st.floats(-100, 100)),
        min_size=1,
        max_size=40,
    ),
    st.integers(5, 20),
)
def test_resample_ffill_matches_python(spark, obs, step):
    from big_data_hdfs_ray_vs_spark_spark.operators.temporal import resample_ffill

    rows = [(k, t, i, v) for i, (k, t, v) in enumerate(obs)]
    df = spark.createDataFrame(rows, "k long, t long, eid long, v double")
    got = {
        (r["k"], r["grid_ts"]): (r["v"], r["obs_ts"])
        for r in resample_ffill(df, key="k", ts="t", value="v", step=step, tiebreak="eid").collect()
    }
    # Brute force: per key, ticks over [floor(min/step), floor(max/step)];
    # fill = obs with max (t, eid) among t <= tick.
    want = {}
    bykey = {}
    for k, t, i, v in rows:
        bykey.setdefault(k, []).append((t, i, v))
    for k, o in bykey.items():
        lo = min(t for t, _i, _v in o) // step * step
        hi = max(t for t, _i, _v in o) // step * step
        for tick in range(lo, hi + step, step):
            cand = [(t, i, v) for t, i, v in o if t <= tick]
            if cand:
                t, _i, v = max(cand)
                want[(k, tick)] = (v, t)
            else:
                want[(k, tick)] = (None, None)
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 30), st.sampled_from("abc")),
        min_size=1,
        max_size=30,
        unique_by=lambda x: (x[0], x[1]),  # unique (key, ts): tie rule tested elsewhere
    )
)
def test_scd2_history_matches_python(spark, changes):
    from big_data_hdfs_ray_vs_spark_spark.operators.temporal import scd2_history

    rows = [(k, t, i, s) for i, (k, t, s) in enumerate(changes)]
    df = spark.createDataFrame(rows, "k long, t long, cid long, s string")
    out = scd2_history(df, key="k", ts="t", value_cols=["s"], tiebreak="cid")
    got = sorted(
        (r["k"], r["version"], r["s"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in out.collect()
    )
    want = []
    bykey = {}
    for k, t, _i, s in rows:
        bykey.setdefault(k, []).append((t, s))
    for k, o in bykey.items():
        o.sort()
        versions = []
        for t, s in o:
            if not versions or versions[-1][1] != s:
                versions.append((t, s))
        for n, (t, s) in enumerate(versions):
            nxt = versions[n + 1][0] if n + 1 < len(versions) else None
            want.append((k, n + 1, s, t, nxt, nxt is None))
    assert got == sorted(want)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=1, max_size=40),
    st.integers(0, 9),
)
def test_bfs_layers_matches_python_bfs(spark, edges, src):
    """Distributed BFS ≡ a queue-based Python BFS on random directed
    graphs (self-loops and duplicate edges included)."""
    from collections import deque

    from big_data_hdfs_ray_vs_spark_spark.plans.graph import bfs_layers

    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    expect, dq = {src: 0}, deque([src])
    while dq:
        u = dq.popleft()
        for v in sorted(adj.get(u, ())):
            if v not in expect:
                expect[v] = expect[u] + 1
                dq.append(v)
    e_df = spark.createDataFrame(edges, "src long, dst long")
    s_df = spark.createDataFrame([(src,)], "node long")
    got = {r["node"]: r["dist"] for r in bfs_layers(e_df, s_df, max_depth=15).collect()}
    assert got == expect


@settings(max_examples=6, deadline=None)
@given(
    st.dictionaries(st.integers(0, 15), st.integers(0, 99), min_size=0, max_size=10),
    st.lists(
        st.tuples(
            st.integers(0, 15),
            st.sampled_from(["U", "D"]),
            st.one_of(st.none(), st.integers(0, 99)),
        ),
        min_size=0,
        max_size=12,
        unique_by=lambda t: t[0],
    ),
)
def test_apply_changes_matches_dict_model(spark, base, changes):
    """MERGE ≡ the obvious dict model: delete removes, update/insert
    sets (null change value keeps the base value)."""
    from big_data_hdfs_ray_vs_spark_spark.operators.relational import apply_changes

    model = dict(base)
    for k, op, v in changes:
        if op == "D":
            model.pop(k, None)
        else:
            if v is None:
                model.setdefault(k, None)  # insert-with-null keeps absent base as null
            else:
                model[k] = v
            if v is None and k in base:
                model[k] = base[k]  # null change coalesces to base
    b_df = spark.createDataFrame(
        list(base.items()) or [], "k long, val int"
    ) if base else spark.createDataFrame([], "k long, val int")
    c_df = spark.createDataFrame(
        changes or [], "k long, op string, val int"
    ) if changes else spark.createDataFrame([], "k long, op string, val int")
    got = {r["k"]: r["val"] for r in apply_changes(b_df, c_df, key="k").collect()}
    assert got == model


# ---- portable-hash cross-engine pinning -----------------------------------
# The two-slots-per-md5-digest scheme (operators/dedup.py:minhash_bands,
# operators/relational.py:_bloom_positions) must agree bit-for-bit with an
# independent hashlib replay — this is the invariant every DuckDB oracle
# that replays `substr(md5(...), k, n)` rests on.

import hashlib


def _md5_hex(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


@settings(max_examples=6, deadline=None)
@given(st.lists(st.text(min_size=1, max_size=24), min_size=1, max_size=12, unique=True))
def test_minhash_slots_match_hashlib(spark, shingles):
    """Signature slot s = min over shingles of the digest half
    substr(md5('s{s//2}:'||x), 1+16*(s%2), 16)."""
    from big_data_hdfs_ray_vs_spark_spark.operators.dedup import minhash_bands

    df = spark.createDataFrame([(1, "ignored")], "doc_id long, text string")
    sets = spark.createDataFrame([(1, shingles)], "doc_id long, __sh array<string>")
    got = {
        (r["band"], r["band_key"])
        for r in minhash_bands(df, sets=sets, num_hashes=4, rows_per_band=2).collect()
    }
    slots = []
    for s in range(4):
        digests = [_md5_hex(f"s{s // 2}:{x}") for x in shingles]
        half = [d[16 * (s % 2): 16 * (s % 2) + 16] for d in digests]
        slots.append(min(half))
    want = {(0, f"{slots[0]}|{slots[1]}"), (1, f"{slots[2]}|{slots[3]}")}
    assert got == want


@settings(max_examples=6, deadline=None)
@given(st.lists(st.integers(0, 10**9), min_size=1, max_size=16, unique=True))
def test_bloom_positions_match_hashlib(spark, keys):
    """Bloom position i of key k = int(md5('b{i//2}:k')[15-hex half]) % bits,
    and the built filter admits every true key (no false negatives)."""
    from big_data_hdfs_ray_vs_spark_spark.operators.relational import (
        bloom_build,
        bloom_might_contain,
    )

    bits = 256
    dim = spark.createDataFrame([(k,) for k in keys], "k long")
    words = bloom_build(dim, "k", num_bits=bits, num_hashes=4, portable=True)
    # independent replay: set the same bits from hashlib
    expect = [0] * (bits // 64)
    for k in keys:
        for i in range(4):
            d, off = divmod(i, 2)
            h = int(_md5_hex(f"b{d}:{k}")[15 * off: 15 * off + 15], 16) % bits
            expect[h // 64] |= 1 << (h % 64)
    # Spark's bit_or returns signed longs; normalize both to unsigned
    assert [w & (2**64 - 1) for w in words] == expect
    probe = bloom_might_contain(F.col("k"), words, num_hashes=4, portable=True)
    assert dim.select(probe.alias("p")).filter("NOT p").count() == 0


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=30), min_size=1, max_size=25
    )
)
def test_ngram_novelty_invariants(spark, texts):
    from big_data_hdfs_ray_vs_spark_spark.operators.dedup import ngram_novelty

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = ngram_novelty(df, n=2).collect()
    assert len(rows) == len(texts)  # every input doc comes back
    for r in rows:
        assert 0 <= r.n_duplicated <= r.n_shingles
        assert 0.0 <= r.dup_rate <= 1.0
        if r.n_shingles == 0:
            assert (r.n_duplicated, r.dup_rate, r.is_memorized) == (0, 0.0, False)
    # duplication is symmetric: identical non-empty docs flag together
    by_text = {}
    for i, t in enumerate(texts):
        by_text.setdefault(t.strip(), []).append(i)
    got = {r.doc_id: r.dup_rate for r in rows}
    for t, ids in by_text.items():
        if t and len(ids) >= 2:
            assert all(got[i] == 1.0 for i in ids)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.one_of(st.none(), st.integers(0, 8)), min_size=1, max_size=30),
    st.lists(st.integers(0, 8), min_size=0, max_size=10),
)
def test_fk_audit_matches_python(spark, child_keys, parent_keys):
    from big_data_hdfs_ray_vs_spark_spark.operators.validate import fk_audit

    child = spark.createDataFrame([(k,) for k in child_keys], "k bigint")
    parent_rows = [(k,) for k in parent_keys]
    parent = (
        spark.createDataFrame(parent_rows, "p bigint")
        if parent_rows
        else child.select(F.col("k").alias("p")).filter("p < 0")
    )
    r = fk_audit([("rel", child, "k", parent, "p")]).first()
    nn = [k for k in child_keys if k is not None]
    orphans = [k for k in nn if k not in set(parent_keys)]
    assert (r.n_child, r.n_orphans) == (len(nn), len(orphans))
    assert r.orphan_rate == (round(len(orphans) / len(nn), 6) if nn else 0.0)


def _py_exact_substring(docs, k):
    """Python reference of exact_substring_dedup's semantics: every
    k-token window hashes (here: the run text itself), first (doc, p)
    occurrence per run wins, later occurrences' windows mark their
    covered tokens for removal."""
    toks = {d: (t or "").split() for d, t in docs}
    occ = {}
    for d, t in sorted(docs):
        ws = toks[d]
        for p in range(len(ws) - k + 1):
            occ.setdefault(" ".join(ws[p : p + k]), []).append((d, p))
    removed = {d: set() for d, _ in docs}
    for sites in occ.values():
        sites.sort()
        for d, p in sites[1:]:
            removed[d].update(range(p, p + k))
    out = {}
    for d, _ in docs:
        ws = toks[d]
        kept = [w for i, w in enumerate(ws) if i not in removed[d]]
        out[d] = (len(ws), len(ws) - len(kept), " ".join(kept))
    return out


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc"]), min_size=0, max_size=12),
        min_size=1,
        max_size=8,
    )
)
def test_exact_substring_dedup_matches_python(spark, corpora):
    # 3-word vocab + short docs force heavy k-gram collisions, the
    # worst case for election/coverage logic (overlapping duplicate
    # windows, within-doc repeats, whole-doc duplicates)
    from big_data_hdfs_ray_vs_spark_spark.operators.dedup import (
        exact_substring_dedup,
    )

    k = 3
    docs = [(i, " ".join(ws)) for i, ws in enumerate(corpora)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.clean_text)
        for r in exact_substring_dedup(df, min_run=k).collect()
    }
    assert got == _py_exact_substring(docs, k)
