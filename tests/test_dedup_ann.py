"""Dedup + ANN + text-stats operator correctness (beyond the SQL oracle)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from entity_matching_in_online_retail_spark.functions import textstats as TS
from entity_matching_in_online_retail_spark.functions import text as TX
from entity_matching_in_online_retail_spark.operators import ann
from entity_matching_in_online_retail_spark.operators import dedup as DD


def test_exact_dedup_keeps_min_id(spark):
    df = spark.createDataFrame(
        [(3, "same text"), (1, "same text"), (2, "other"), (7, "same text")],
        "doc_id long, text string",
    )
    kept = sorted(r["doc_id"] for r in DD.exact_dedup(df).collect())
    assert kept == [1, 2]
    groups = DD.exact_dup_groups(df).collect()
    assert len(groups) == 1 and groups[0]["n_dups"] == 3 and groups[0]["keep_id"] == 1


def test_minhash_near_dups_finds_planted_pair(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    far = "one two three four five six seven eight nine ten"
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string"
    )
    got = {(r["id_l"], r["id_r"]) for r in DD.minhash_near_dups(df, threshold=0.7).collect()}
    assert (1, 2) in got
    assert (1, 3) not in got and (2, 3) not in got


def test_simhash_identical_and_near(spark):
    t = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame([(1, t), (2, t)], "doc_id long, text string")
    got = DD.simhash_near_dups(df, max_hamming=0).collect()
    assert len(got) == 1 and got[0]["hamming"] == 0


def test_simhash_candidates_full_recall_at_requested_distance(spark):
    """Pigeonhole guarantee: with chunks = max_hamming + 1, EVERY pair within
    the requested Hamming distance is found (round-1 bug: 4 fixed chunks only
    guaranteed distance <= 3 while the query asked for more)."""
    rng = np.random.default_rng(7)

    def signed64(v: int) -> int:
        return v - 2**64 if v >= 2**63 else v

    def flip_bits(v: int, n: int) -> int:
        for bit in rng.choice(64, size=n, replace=False):
            v ^= 1 << int(bit)
        return v

    rows, expected, beyond = [], set(), set()
    nid = 0
    for b in range(40):
        base = int(rng.integers(0, 2**63, dtype=np.int64))
        base_id = nid
        rows.append((nid, base))
        nid += 1
        rows.append((nid, signed64(flip_bits(base, b % 5))))  # distance 0..4
        expected.add((base_id, nid))
        nid += 1
        # a partner beyond the threshold (distance 10) must NOT be reported
        rows.append((nid, signed64(flip_bits(base, 10))))
        beyond.add((base_id, nid))
        nid += 1
    sig = spark.createDataFrame(rows, "_id long, _sh long")
    got = {(r["id_l"], r["id_r"]) for r in DD.simhash_candidates(sig, 4).collect()}
    assert expected <= got, f"missed planted pairs: {sorted(expected - got)[:5]}"
    assert not (beyond & got)


def test_simhash_max_hamming_capped():
    """Radii past MAX_SIMHASH_HAMMING mean even 3-subset keys fall under
    ~12 bits and buckets go quadratic — the operator must refuse, not
    degrade. Radii 5..12 are served by the m-subset pigeonhole (round 4)."""
    import pytest

    with pytest.raises(ValueError, match="quadratic"):
        DD.simhash_candidates(None, max_hamming=13)
    with pytest.raises(ValueError):
        DD.simhash_candidates(None, max_hamming=-1)
    assert DD._simhash_subset_m(4) == 1
    assert DD._simhash_subset_m(8) == 2
    assert DD._simhash_subset_m(12) == 3


def test_simhash_radius8_subset_pigeonhole_full_recall(spark):
    """Generalized pigeonhole at max_hamming=8 (c=10 chunks, 2-subset keys):
    every planted pair within distance 8 is found (exact recall by the
    2-clean-chunks argument), none beyond, and key amplification is exactly
    C(10,2)=45 rows per doc — the documented volume trade."""
    rng = np.random.default_rng(17)

    def signed64(v: int) -> int:
        return v - 2**64 if v >= 2**63 else v

    def flip_bits(v: int, n: int) -> int:
        for bit in rng.choice(64, size=n, replace=False):
            v ^= 1 << int(bit)
        return v

    rows, expected, beyond = [], set(), set()
    nid = 0
    for b in range(40):
        base = int(rng.integers(0, 2**63, dtype=np.int64))
        base_id = nid
        rows.append((nid, base))
        nid += 1
        rows.append((nid, signed64(flip_bits(base, b % 9))))  # distance 0..8
        expected.add((base_id, nid))
        nid += 1
        rows.append((nid, signed64(flip_bits(base, 20))))  # far partner
        beyond.add((base_id, nid))
        nid += 1
    sig = spark.createDataFrame(rows, "_id long, _sh long")
    got = {(r["id_l"], r["id_r"]) for r in DD.simhash_candidates(sig, 8).collect()}
    assert expected <= got, f"missed planted pairs: {sorted(expected - got)[:5]}"
    assert not (got & beyond)

    keys = DD.simhash_subset_keys(sig, 8, 2)
    n_docs = sig.count()
    assert keys.count() == n_docs * 45  # C(10, 2) keys per doc, no more


def test_simhash_candidate_volume_bounded_under_skew(spark):
    """Scale contract: candidate volume == sum over chunk buckets of C(sz,2),
    driven by the planted hot bucket, NOT by n^2. 1000 near-uniform random
    signatures + 60 docs sharing one chunk value stay ~5 orders below C(n,2)."""
    rng = np.random.default_rng(11)

    def signed64(v: int) -> int:
        return v - 2**64 if v >= 2**63 else v

    n, hot = 1000, 60
    rows = [
        (i, signed64(int(rng.integers(0, 2**64, dtype=np.uint64)))) for i in range(n)
    ]
    # plant skew: `hot` docs agree on chunk position 0 (low 13 bits for
    # max_hamming=4) but are random elsewhere — a hot shingle/boilerplate
    # bucket, the classic web-corpus skew shape
    for i in range(hot):
        v = rows[i][1]
        rows[i] = (i, signed64(((v >> 13) << 13) | 0x1ABC))
    sig = spark.createDataFrame(rows, "_id long, _sh long")

    keys = DD.simhash_chunk_keys(sig, 4)
    from pyspark.sql import functions as F

    bucket_pairs = (
        keys.groupBy("chunk")
        .agg(F.count(F.lit(1)).alias("sz"))
        .agg(F.sum(F.col("sz") * (F.col("sz") - 1) / 2).alias("cand"))
        .first()["cand"]
    )
    # hot bucket contributes C(60,2)=1770; random collisions in 12-13 bit
    # buckets add ~5 * C(1000,2)/2^12 ~ 600. Assert the volume is bucket-
    # structured (< 4000), i.e. ~125x below the all-pairs C(1000,2)=499500.
    assert bucket_pairs >= hot * (hot - 1) / 2
    assert bucket_pairs < 4000, bucket_pairs


def test_embedding_near_dups_recall_vs_bruteforce(spark):
    """Multi-table OR-construction recall >= 0.95 at threshold 0.9 against an
    exact numpy all-pairs oracle (round-1 bug: single 12-plane table missed
    ~70% of qualifying pairs)."""
    rng = np.random.default_rng(3)
    vecs = {}
    nid = 0
    for _ in range(50):
        base = rng.standard_normal(64)
        vecs[nid] = base
        nid += 1
        for scale in (0.15, 0.3):  # cosine ~0.99 / ~0.96
            vecs[nid] = base + scale * rng.standard_normal(64)
            nid += 1
    for _ in range(100):
        vecs[nid] = rng.standard_normal(64)
        nid += 1
    mat = np.stack([vecs[i] for i in range(nid)])
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cos = unit @ unit.T
    truth = {
        (i, j)
        for i in range(nid)
        for j in range(i + 1, nid)
        if cos[i, j] >= 0.9
    }
    assert len(truth) >= 100  # the fixture must actually exercise recall
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(nid)],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r["id_l"], r["id_r"])
        for r in DD.embedding_near_dups(df, threshold=0.9).collect()
    }
    recall = len(truth & got) / len(truth)
    assert recall >= 0.95, f"embedding near-dup recall {recall:.3f}"
    # precision is exact by construction (cosine verify), no false positives
    assert got <= truth or all(
        cos[i, j] >= 0.9 - 1e-6 for (i, j) in got - truth
    )


def test_ngram_jaccard_known(spark):
    df = spark.createDataFrame([("abcd", "bcde")], "a string, b string")
    # 3-grams: {abc,bcd} vs {bcd,cde} → 1/3
    got = df.select(DD.ngram_jaccard(F.col("a"), F.col("b"), 3).alias("j")).first()["j"]
    assert got == pytest.approx(1 / 3)


def test_char_shingles(spark):
    df = spark.createDataFrame([("abca",), ("ab",)], "s string")
    got = [r["g"] for r in df.select(DD.char_shingles(F.col("s"), 3).alias("g")).collect()]
    assert got[0] == ["abc", "bca"]
    assert got[1] == ["ab"]  # shorter than n → whole string


def test_ann_lsh_recall_vs_bruteforce(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in ann.brute_force_topk(queries, emb, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ann.lsh_topk(queries, emb, k=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"ANN recall {recall}"


def test_near_dup_groups_transitive_and_one_keep(spark):
    """A~B and B~C (but A!~C directly) must land in ONE group via transitive
    closure; exactly one keep per group; group_id = min member id."""
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu"
    b = a.replace("kappa", "kappa2")          # ~0.85 jaccard vs a
    c = b.replace("alpha", "alpha2").replace("beta", "beta2")  # near b, farther from a
    far = "one two three four five six seven eight nine ten eleven twelve"
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c), (4, far), (5, far + " thirteen")],
        "doc_id long, text string",
    )
    pairs = {
        (r["id_l"], r["id_r"])
        for r in DD.minhash_near_dups(df, threshold=0.6).collect()
    }
    assert (1, 2) in pairs and (2, 3) in pairs
    out = {r["doc_id"]: (r["group_id"], r["keep"]) for r in DD.near_dup_groups(df, threshold=0.6).collect()}
    assert len(out) == 5
    # union-find oracle over the emitted pairs defines the expected partition
    from entity_matching_in_online_retail_spark.operators.cluster import union_find_oracle

    comp = union_find_oracle(list(pairs))
    groups: dict[int, set] = {}
    for doc in out:
        root = comp.get(doc, doc)
        groups.setdefault(root, set()).add(doc)
    for members in groups.values():
        gids = {out[m][0] for m in members}
        assert gids == {min(members)}, (members, gids)
        assert sum(1 for m in members if out[m][1]) == 1  # exactly one keep


def test_ann_ivf_recall_vs_bruteforce(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in ann.brute_force_topk(queries, emb, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ann.ivf_topk(queries, emb, k=5, n_cells=16, nprobe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall {recall}"


def test_ann_ivf_planted_near_dups(spark):
    """A near-exact copy must land in the same (or probed) cell and be
    returned as the top neighbor."""
    rng = np.random.default_rng(5)
    rows = []
    for i in range(60):
        v = rng.standard_normal(64)
        rows.append((i, [float(x) for x in v]))
        rows.append((1000 + i, [float(x) for x in v + 0.05 * rng.standard_normal(64)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = df.where(F.col("vec_id") < 60)
    got = {
        r["query_id"]: r["neighbor_id"]
        for r in ann.ivf_topk(queries, df, k=1, n_cells=8, nprobe=2).collect()
    }
    hits = sum(1 for qid, nid in got.items() if nid == qid + 1000)
    assert hits >= 54, f"only {hits}/60 planted copies found as top-1"


def test_ann_ivf_indexed_partition_pruning(spark, tmp_path):
    """The materialized IVF index (corpus parquet-partitioned by cell) must
    (a) return exactly what the in-memory ivf_topk returns for the same
    trained quantizer, and (b) PRUNE: the probed scan's plan carries a
    PartitionFilters predicate on `cell` and reads only the probed cells'
    files, not the whole index."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 3)
    path = str(tmp_path / "ivf_index")
    centroids = ann.ivf_write_index(emb, path, n_cells=16)

    got = ann.ivf_topk_indexed(spark, queries, path, k=5, nprobe=2)
    want = ann.ivf_topk(
        queries, emb, k=5, n_cells=16, nprobe=2, centroids=centroids
    )
    tup = lambda df: {  # noqa: E731
        (r["query_id"], r["neighbor_id"], round(r["cosine"], 9), r["rank"])
        for r in df.collect()
    }
    assert tup(got) == tup(want)

    # plan-golden: partition pruning fired on the probed-cell predicate.
    # The FileScan's PartitionFilters are applied to the partition-dir index
    # at scan planning — a literal `cell IN (...)` there IS the pruning
    # (DataFrame.inputFiles() reports the unpruned relation, so the filter
    # string, not inputFiles, is the evidence).
    plan = got._jdf.queryExecution().executedPlan().toString()
    scan = [
        seg for seg in plan.split("FileScan parquet")
        if "ivf_index" in seg.split("ReadSchema")[0]
    ]
    assert scan and "PartitionFilters" in scan[0]
    pf = scan[0].split("PartitionFilters: [")[1].split("]")[0]
    assert "cell#" in pf and " IN " in pf, pf
    probed = {int(x) for x in pf.split("(")[1].split(")")[0].split(",")}
    assert 0 < len(probed) < 16  # strictly fewer cells than exist


def test_embedding_near_dups_planted(spark):
    rng = np.random.default_rng(0)
    v = rng.standard_normal(64)
    rows = [
        (1, [float(x) for x in v]),
        (2, [float(x) for x in (v + 0.01 * rng.standard_normal(64))]),
        (3, [float(x) for x in rng.standard_normal(64)]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {(r["id_l"], r["id_r"]) for r in DD.embedding_near_dups(df, threshold=0.99).collect()}
    assert got == {(1, 2)}


def test_lang_id_heuristic(spark):
    df = spark.createDataFrame(
        [
            ("the cat is in the house and it is warm",),
            ("der hund ist nicht mit der katze und",),
            ("le chat est dans la maison et les arbres",),
            ("xyzzy plugh qwerty",),
        ],
        "text string",
    )
    toks = TX.tokens(F.lower(F.col("text")))
    got = [r["l"] for r in df.select(TS.lang_id(toks).alias("l")).collect()]
    assert got == ["en", "de", "fr", "und"]


def test_quality_score_ordering(spark):
    df = spark.createDataFrame(
        [
            ("good", "a clean well formed sentence with normal words present here " * 4),
            ("bad", "!!! ### $$$ %%% ^^^ &&& *** ((()))"),
        ],
        "tag string, text string",
    )
    toks = TX.tokens(TX.normalize_text(F.col("text"), with_nfkc=False))
    got = {r["tag"]: r["q"] for r in df.select("tag", TS.quality_score(F.col("text"), toks).alias("q")).collect()}
    assert got["good"] > 0.8 > got["bad"]
    assert 0.0 <= got["bad"] <= 1.0


def test_token_counts(spark):
    df = spark.createDataFrame([("hello world 42 x-y",), ("",)], "text string")
    rows = df.select(
        TS.token_count_ws(F.col("text")).alias("ws"),
        TS.token_count_bpe_ish(F.col("text")).alias("bpe"),
    ).collect()
    assert rows[0]["ws"] == 4
    # bpe-ish: hello, world, 42, x, -, y
    assert rows[0]["bpe"] == 6
    assert rows[1]["ws"] == 0 and rows[1]["bpe"] == 0


def test_doc_fingerprint_stability(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "delta gamma beta alpha")],
        "doc_id long, text string",
    )
    toks = TX.tokens(F.lower(F.col("text")))
    got = [r["fp"] for r in df.select(TS.doc_fingerprint(toks, 4).alias("fp")).collect()]
    assert got[0] == got[1]  # order-insensitive
