"""Dedup family: exact, precedence, MinHash-LSH vs exact Jaccard, SimHash."""

import pandas as pd
import pyspark.sql.functions as F

from darkbo_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    precedence_dedup,
    simhash,
    token_jaccard_pairs,
)


def _docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base + " extra"),  # near dup of 0
        (3, "completely different content about spark partitions and shuffles"),
        (4, "completely different content about spark partitions and shuffles ok"),
        (5, "nothing shared with anyone else in this tiny corpus at all"),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_exact_dedup_keeps_min_id(spark):
    out = exact_dedup(_docs(spark), "text", "doc_id").select("doc_id").collect()
    kept = {r.doc_id for r in out}
    assert 0 in kept and 1 not in kept
    assert kept == {0, 2, 3, 4, 5}


def test_precedence_dedup_not_drop_duplicates(spark):
    rows = [("a", 1, "x1"), ("a", 0, "x2"), ("b", 2, "x3")]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["id", "pri", "val"]))
    out = {r.id: r.val for r in precedence_dedup(df, "id", "pri", ["val"]).collect()}
    assert out == {"a": "x2", "b": "x3"}  # lowest pri wins, not first-seen


def test_minhash_lsh_finds_near_dups(spark):
    docs = _docs(spark)
    pairs = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(docs, "text", "doc_id", k=16, bands=8).collect()
    }
    assert (0, 1) in pairs  # exact dups always collide in every band
    assert (0, 2) in pairs or (1, 2) in pairs  # near dup caught
    assert (0, 5) not in pairs and (3, 5) not in pairs


def test_minhash_signature_deterministic(spark):
    docs = _docs(spark)
    s1 = {r.doc_id: r.sig for r in minhash_signatures(docs, "text", "doc_id").collect()}
    s2 = {
        r.doc_id: r.sig
        for r in minhash_signatures(
            docs.repartition(7), "text", "doc_id"
        ).collect()
    }
    assert s1 == s2
    assert s1[0] == s1[1]  # identical text → identical signature


def test_lsh_pairs_contain_high_jaccard_pairs(spark):
    docs = _docs(spark)
    exact = {
        (r.id_a, r.id_b)
        for r in token_jaccard_pairs(docs, "text", "doc_id", min_jaccard=0.8).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(docs, "text", "doc_id", k=16, bands=8).collect()
    }
    assert exact <= lsh  # high-sim pairs must all surface as LSH candidates


def test_simhash_properties(spark):
    docs = _docs(spark)
    h1 = {r.doc_id: r.simhash for r in simhash(docs, "text", "doc_id").collect()}
    h2 = {
        r.doc_id: r.simhash
        for r in simhash(docs.repartition(5), "text", "doc_id").collect()
    }
    assert h1 == h2  # partition-invariant
    assert h1[0] == h1[1]  # identical docs → identical simhash

    def hamming(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert hamming(h1[0], h1[2]) < hamming(h1[0], h1[5])  # near-dup closer


def test_cosine_neardup_pairs(spark):
    """Embedding near-dup: identical direction → 1.0; orthogonal → dropped."""
    import pandas as pd
    import pyspark.sql.functions as F
    from darkbo_spark.operators.dedup import cosine_neardup_pairs

    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [2.0, 0.0, 0.0]),   # same direction as 0 → cosine 1.0
        (2, [0.0, 1.0, 0.0]),   # orthogonal to 0/1
        (3, [1.0, 1.0, 0.0]),   # 45° to 0/1 and 2 → cosine ≈ 0.7071
    ]
    df = spark.createDataFrame(pd.DataFrame(vecs, columns=["vec_id", "embedding"]))
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in cosine_neardup_pairs(df, min_cosine=0.5).collect()
    }
    assert got[(0, 1)] == 1.0
    assert abs(got[(0, 3)] - 0.707107) < 1e-6
    assert abs(got[(1, 3)] - 0.707107) < 1e-6
    assert abs(got[(2, 3)] - 0.707107) < 1e-6
    assert (0, 2) not in got and (1, 2) not in got


def test_simhash_banded_pairs_equal_brute_force(spark):
    """Pigeonhole banding is EXACT for hamming <= k (any pair within k
    differing bits agrees on >=1 of k+1 disjoint bands): the banded join
    must find precisely the brute-force pair set."""
    import itertools

    import pyspark.sql.functions as F
    from darkbo_spark.operators.dedup import simhash, simhash_neardup_pairs

    # build a corpus with real near-dups: repeated sentences with tiny edits
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [(i, base + f" variant {i % 4}") for i in range(40)]
    rows += [(100 + i, f"totally different document number {i} about spark") for i in range(10)]
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    sigs = {r.doc_id: r.simhash for r in simhash(df, "text", "doc_id").collect()}
    want = set()
    for a, b in itertools.combinations(sorted(sigs), 2):
        if bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1") <= 3:
            want.add((a, b))
    got = {
        (r.id_a, r.id_b)
        for r in simhash_neardup_pairs(df, "text", "doc_id", max_hamming=3,
                                       max_bucket=10_000).collect()
    }
    assert got == want and len(want) > 0


def _cluster_corpus(spark):
    """Three explicit near-dup families + singletons: A≈B≈C chained (A,C
    may never share a bucket — transitivity must connect them), D≈E, and
    two unrelated docs."""
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (0, base),
        (1, base + " extra"),
        (2, base + " extra more"),
        (10, "completely different words about spark shuffles and joins here"),
        (11, "completely different words about spark shuffles and joins there"),
        (20, "an unrelated singleton document speaking of nothing in particular"),
        (21, "another lonely text with its own vocabulary entirely separate"),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_neardup_clusters_transitive_and_total(spark):
    from darkbo_spark.operators.dedup import minhash_lsh_pairs, neardup_clusters

    docs = _cluster_corpus(spark)
    clusters = neardup_clusters(docs, "text", "doc_id", k=16, bands=8, persist=False)
    got = {r.doc_id: r.rep_id for r in clusters.collect()}
    # total: every doc mapped exactly once
    assert set(got) == {0, 1, 2, 10, 11, 20, 21}
    # transitive closure over whatever pairs LSH emitted: reps must equal
    # a driver-side union-find over the same pairs
    pairs = [
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(
            docs, "text", "doc_id", k=16, bands=8, persist=False
        ).collect()
    ]
    parent = {d: d for d in got}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {d: find(d) for d in got}
    assert got == want
    # the intended families actually cluster (near-identical text)
    assert got[0] == got[1] == got[2] == 0
    assert got[10] == got[11] == 10
    assert got[20] == 20 and got[21] == 21


def test_dedup_keep_best_picks_argmax_per_cluster(spark):
    from darkbo_spark.operators.dedup import dedup_keep_best, neardup_clusters

    docs = _cluster_corpus(spark)
    clusters = neardup_clusters(docs, "text", "doc_id", k=16, bands=8, persist=False)
    scored = docs.select(
        "doc_id", (F.col("doc_id") % 7).cast("double").alias("score")
    )
    kept = {
        r.rep_id: (r.kept_doc_id, r.n_members, r.best_score)
        for r in dedup_keep_best(scored, clusters).collect()
    }
    cl = {r.doc_id: r.rep_id for r in clusters.collect()}
    members = {}
    for d, rep in cl.items():
        members.setdefault(rep, []).append(d)
    assert set(kept) == set(members)
    for rep, (kd, n, best) in kept.items():
        ms = members[rep]
        assert n == len(ms)
        want = max(ms, key=lambda d: (d % 7, -d))
        assert kd == want and best == float(want % 7)


def test_shingles_ignore_boundary_whitespace(spark):
    """split(' +') keeps '' at string boundaries; shingles must drop them
    BEFORE windowing or whitespace-padded docs get shifted windows (and
    diverge from every SQL twin's list_filter)."""
    from darkbo_spark.operators.dedup import shingles

    df = spark.createDataFrame(pd.DataFrame(
        [(0, "alpha beta gamma delta"), (1, "  alpha beta gamma delta  ")],
        columns=["doc_id", "text"],
    ))
    out = shingles(df, "text", "doc_id", n=3)
    per = {}
    for r in out.collect():
        per.setdefault(r.doc_id, set()).add(r.shingle)
    assert per[0] == per[1] == {"alpha beta gamma", "beta gamma delta"}


def test_contamination_matches_planted_and_clean(spark):
    from darkbo_spark.operators.dedup import contamination_matches

    docs = spark.createDataFrame(pd.DataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (1, "totally different words with no overlap at all here now"),
            # doc 2 contains bench item 100's 8-gram mid-text
            (2, "prefix words then alpha beta gamma delta epsilon zeta eta theta and more"),
        ],
        columns=["doc_id", "text"],
    ))
    bench = spark.createDataFrame(pd.DataFrame(
        [
            (100, "alpha beta gamma delta epsilon zeta eta theta"),  # 8 tokens = 1 shingle
            (101, "nothing from this benchmark appears in any training doc x"),
        ],
        columns=["bench_id", "text"],
    ))
    got = {
        (r.doc_id, r.bench_id): r.n_shared
        for r in contamination_matches(docs, bench, n=8).collect()
    }
    # docs 0 and 2 both contain bench 100's single 8-gram; doc 1 and bench
    # 101 match nothing
    assert got == {(0, 100): 1, (2, 100): 1}
