"""Tests for the training-data pipeline operators (ops/)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pdf_ocr_api_spark.ops import dedup, multimodal, similarity, textstats


@pytest.fixture(scope="module")
def docs(spark):
    base = [
        (0, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (1, "the quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 0
        (2, "the quick brown fox jumps over the lazy cat near the river bank today"),  # near dup of 0
        (3, "spark processes distributed data with resilient datasets and catalyst optimizer"),
        (4, "completely different content about cooking pasta with tomato sauce and basil"),
        (5, "El rápido zorro marrón salta sobre el perro perezoso cerca de la orilla"),
        (6, "THE QUICK  BROWN fox jumps over the lazy dog near the river bank today"),  # case/ws dup of 0
    ]
    return spark.createDataFrame(base, "doc_id LONG, text STRING")


def test_exact_duplicates(docs):
    groups = dedup.exact_duplicates(docs).collect()
    assert len(groups) == 1
    g = groups[0]
    assert g.dup_count == 3  # 0, 1, 6 (case/whitespace-normalized)
    assert g.keep_id == 0
    assert list(g.member_ids) == [0, 1, 6]


def test_exact_duplicates_member_cap(spark):
    """max_members bounds member_ids BEFORE the collect (a 10^8-member
    template family must never materialize one giant array row);
    dup_count still carries the true size and keep_id the true min."""
    rows = [(i, "the very same template text repeated") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    g = dedup.exact_duplicates(df, max_members=5).collect()
    assert len(g) == 1
    assert g[0].dup_count == 20 and g[0].keep_id == 0
    assert list(g[0].member_ids) == [0, 1, 2, 3, 4]
    # the bounding window must ride the groupBy's hash partitioning —
    # exactly one exchange in the plan, same as the uncapped form
    from pdf_ocr_api_spark.plans import inspect as PI

    capped = PI.exchange_count(dedup.exact_duplicates(df, max_members=5))
    uncapped = PI.exchange_count(dedup.exact_duplicates(df, max_members=None))
    assert capped == uncapped


def test_minhash_lsh_finds_near_dups(docs):
    # bands=16 (r=2): P(collide) = 1-(1-j^2)^16 ≈ 0.9998 at j=0.65 — the
    # recall-tuned banding for near-dup candidates
    pairs = dedup.minhash_lsh_pairs(docs, num_hashes=32, bands=16)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (0, 1) in got and (0, 6) in got and (1, 6) in got  # exact dups always collide
    assert (0, 2) in got  # one-token change shares most shingles
    assert (0, 4) not in got and (3, 4) not in got  # unrelated never pair


def test_jaccard_verify(docs):
    pairs = dedup.minhash_lsh_pairs(docs, num_hashes=32, bands=16)
    verified = dedup.jaccard_verify(docs, pairs, threshold=0.5).collect()
    jac = {(r.id_a, r.id_b): r.jaccard for r in verified}
    assert jac[(0, 1)] == 1.0
    assert 0.5 <= jac[(0, 2)] < 1.0
    assert (0, 4) not in jac


def test_simhash_near_pairs(docs):
    sim = dedup.simhash64(docs)
    pairs = dedup.simhash_near_pairs(sim, max_hamming=10)
    got = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    assert got.get((0, 1)) == 0 and got.get((0, 6)) == 0
    # near-dup has small but possibly nonzero hamming
    if (0, 2) in got:
        assert got[(0, 2)] <= 10
    assert (0, 4) not in got


def test_simhash_vectorized_matches_explode(spark, docs):
    """The vectorized (transform+xxhash64 → numpy bit-vote) build must be
    BYTE-IDENTICAL to the r1-r3 explode/aggregate twin — same xxhash64
    token values (seed 42 both paths), same strict-majority vote — and
    both must drop null-text docs the same way."""
    withnull = docs.union(
        spark.createDataFrame([(99, None)], "doc_id LONG, text STRING")
    )
    fast = sorted((r.id, r.simhash) for r in dedup.simhash64(withnull).collect())
    slow = sorted((r.id, r.simhash) for r in dedup.simhash64_explode(withnull).collect())
    assert fast == slow
    assert all(i != 99 for i, _ in fast)  # null text dropped, like explode
    # empty text still gets a signature (split("") -> [""], one token)
    empty = spark.createDataFrame([(7, "")], "doc_id LONG, text STRING")
    assert dedup.simhash64(empty).count() == 1


def test_simhash_banding_full_recall(spark):
    """Manku banding must have FULL recall at hamming ≤ k — including
    pairs whose differing bits all fall in the TOP bits (the pairs the
    old single-prefix blocking silently missed), and across random
    placements, verified against an exact O(n²) oracle."""
    import random

    rng = random.Random(1234)

    def _signed(v):  # 64-bit two's complement for Spark LONG
        return v - (1 << 64) if v >= (1 << 63) else v

    base = rng.getrandbits(63)
    rows = [(0, base)]
    nid = 1
    # plant pairs at hamming 1..3 with differing bits in the top 16 bits
    # (the old prefix block), the bottom bits, and straddling block edges
    for bits in ([63], [63, 62], [63, 47, 31], [0, 1], [15, 16, 17], [20, 41, 62]):
        v = base
        for b in bits:
            v ^= 1 << b
        rows.append((nid, _signed(v)))
        nid += 1
    # unrelated noise
    for _ in range(40):
        rows.append((nid, _signed(rng.getrandbits(64))))
        nid += 1

    def _h(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    want = {(a, b) for (a, va) in rows for (b, vb) in rows if a < b and _h(va, vb) <= 3}

    sim = spark.createDataFrame(rows, "id LONG, simhash LONG")
    got = {(r.id_a, r.id_b) for r in dedup.simhash_near_pairs(sim, max_hamming=3).collect()}
    assert got == want, (sorted(want - got), sorted(got - want))


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((50, 16)).astype(np.float32)
    vecs[1] = vecs[0] + 0.01 * rng.standard_normal(16).astype(np.float32)  # near neighbor of 0
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(50)]
    return spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>"), vecs


def test_brute_force_topk_matches_numpy(emb):
    df, vecs = emb
    q = [float(x) for x in vecs[0]]
    got = similarity.brute_force_topk(df.filter(F.col("vec_id") != 0), q, k=5).collect()
    v = vecs.astype(np.float64)
    cos = v @ v[0] / (np.linalg.norm(v, axis=1) * np.linalg.norm(v[0]))
    want = sorted(((round(c, 6), i) for i, c in enumerate(cos) if i != 0), key=lambda t: (-t[0], t[1]))[:5]
    assert [r.id for r in got] == [i for _, i in want]
    assert got[0].id == 1  # the planted near neighbor wins


def test_lsh_topk_recall(emb):
    df, vecs = emb
    q = [float(x) for x in vecs[0]]
    brute = {r.id for r in similarity.brute_force_topk(df.filter(F.col("vec_id") != 0), q, k=5).collect()}
    approx = {r.id for r in similarity.lsh_topk(df.filter(F.col("vec_id") != 0), q, k=5, n_planes=8).collect()}
    # multiprobe SRP on 50 vectors must at least find the planted near-dup
    assert 1 in approx
    assert len(brute & approx) >= 2


def test_token_counts(docs):
    rows = {r.doc_id: (r.ws, r.bpe) for r in docs.select(
        "doc_id",
        textstats.token_count(F.col("text")).alias("ws"),
        textstats.bpe_ish_token_count(F.col("text")).alias("bpe"),
    ).collect()}
    assert rows[0][0] == 14
    assert rows[6][0] == 14  # whitespace-normalized count
    assert rows[0][1] >= rows[0][0]  # BPE-ish ≥ whitespace tokens


def test_lang_id(spark):
    rows = [
        (0, "the cat and the dog of the house is in the garden"),
        (1, "el perro y la casa de los vecinos que viven cerca"),
        (2, "der hund und die katze ist nicht im haus"),
        (3, "xyzzy qwerty asdf"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {r.doc_id: r.lang for r in df.select("doc_id", textstats.lang_id(F.col("text")).alias("lang")).collect()}
    assert got[0] == "en" and got[1] == "es" and got[2] == "de" and got[3] == "und"


def test_quality_features(docs, spark):
    q = {r.id: r for r in textstats.quality_features(docs).collect()}
    assert 0 < q[0].quality_score <= 1
    junk = spark.createDataFrame([(99, "1 2 3 4 5 , , , . . . 9 9 9")], "doc_id LONG, text STRING")
    jq = textstats.quality_features(junk).collect()[0]
    assert jq.quality_score < q[0].quality_score


def test_fingerprint_stability(docs):
    a = {r.doc_id: r.fp for r in docs.select("doc_id", F.concat_ws(",", textstats.fingerprint(F.col("text")).cast("array<string>")).alias("fp")).collect()}
    assert a[0] == a[1] == a[6]  # dups share the fingerprint
    assert a[0] != a[4]


def test_multimodal_features_deterministic(spark):
    media = multimodal.synthesize_media(spark, 30)
    f1 = multimodal.media_features(media.repartition(1)).orderBy("media_id").toPandas()
    f2 = multimodal.media_features(media.repartition(7)).orderBy("media_id").toPandas()
    assert f1.feature.map(tuple).tolist() == f2.feature.map(tuple).tolist()
    assert (f1.n_bytes > 0).all()


def test_multimodal_decode_is_stub():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"not an image")


def test_ivf_ann(emb, spark):
    df, vecs = emb
    indexed, centroids = similarity.ivf_index(df, n_lists=4)
    assert len(centroids) == 4
    # deterministic mode: identical centroids/assignments for ANY input
    # partitioning (value-hash sample + driver-side Lloyd's)
    a1 = indexed.orderBy("vec_id").select("ivf_list").toPandas().ivf_list.tolist()
    a2 = similarity.ivf_index(df.repartition(7), n_lists=4)[0].orderBy("vec_id").select("ivf_list").toPandas().ivf_list.tolist()
    assert a1 == a2
    assert set(a1) <= {0, 1, 2, 3}

    q = [float(x) for x in vecs[0]]
    got = similarity.ivf_topk(indexed.filter(F.col("vec_id") != 0), centroids, q, k=5, nprobe=2)
    ids = [r.id for r in got.collect()]
    assert 1 in ids  # the planted near neighbor lives in the probed list
    brute = {r.id for r in similarity.brute_force_topk(df.filter(F.col("vec_id") != 0), q, k=5).collect()}
    assert len(brute & set(ids)) >= 2


def test_embedding_near_dup(emb, spark):
    df, vecs = emb
    exact = similarity.embedding_near_pairs_exact(df, threshold=0.95)
    pairs = {(r.id_a, r.id_b): r.cosine for r in exact.collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] > 0.99  # the planted near-dup
    blocked = similarity.embedding_near_pairs(df, threshold=0.95)
    bp = {(r.id_a, r.id_b) for r in blocked.collect()}
    assert (0, 1) in bp            # near-identical vectors share the bucket
    assert bp <= set(pairs)        # blocking never invents pairs


@pytest.fixture(scope="module")
def near_dup_corpus(spark):
    """200 base vectors + 40 planted near-dups AT the 0.9 threshold
    (noise factors 0.40/0.48 → cosine ≈ 0.93/0.90) — the regime where a
    single 12-plane signature keeps only ~16 % of true pairs."""
    rng = np.random.default_rng(99)
    vecs = rng.standard_normal((200, 16))
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(200)]
    nid = 200
    for i in range(40):
        src = vecs[i]
        g = rng.standard_normal(16)
        g = g / np.linalg.norm(g) * np.linalg.norm(src)
        factor = 0.40 if i % 2 == 0 else 0.48
        dup = src + factor * g
        rows.append((nid, [float(x) for x in dup]))
        nid += 1
    # a 12-neighbor cluster around vector 0 so its brute-force top-10 is
    # entirely in the cosine ≈ 0.88-0.95 regime (the lsh_topk recall test)
    for j in range(12):
        g = rng.standard_normal(16)
        g = g / np.linalg.norm(g) * np.linalg.norm(vecs[0])
        dup = vecs[0] + (0.33 + 0.015 * j) * g
        rows.append((nid, [float(x) for x in dup]))
        nid += 1
    return spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")


def test_embedding_near_pairs_recall_at_threshold(near_dup_corpus):
    """Banded SRP (8 bands × 4 planes) must keep ≥ 0.95 of the TRUE
    pairs at threshold 0.9 — the regime the old single-signature
    blocking lost ~84 % of."""
    exact = {(r.id_a, r.id_b) for r in
             similarity.embedding_near_pairs_exact(near_dup_corpus, threshold=0.9).collect()}
    assert len(exact) >= 30  # the plant worked; the test is meaningful
    blocked = {(r.id_a, r.id_b) for r in
               similarity.embedding_near_pairs(near_dup_corpus, threshold=0.9).collect()}
    assert blocked <= exact
    recall = len(blocked & exact) / len(exact)
    assert recall >= 0.95, f"recall={recall:.3f} ({len(blocked)}/{len(exact)})"


def test_lsh_topk_multi_table_recall(near_dup_corpus):
    """OR-construction over independent SRP tables (defaults: 10 planes
    × 6 tables): recall@10 vs brute force ≥ 0.9 for a query whose true
    neighbors sit near cosine 0.9."""
    q = [float(x) for x in near_dup_corpus.filter(F.col("vec_id") == 0)
         .select("embedding").collect()[0][0]]
    cand = near_dup_corpus.filter(F.col("vec_id") != 0)
    brute = [r.id for r in similarity.brute_force_topk(cand, q, k=10).collect()]
    approx = {r.id for r in similarity.lsh_topk(cand, q, k=10).collect()}
    recall = len(set(brute) & approx) / 10
    assert recall >= 0.9, f"recall@10={recall} brute={brute} approx={sorted(approx)}"


def test_multimodal_resize_and_frame_sample(spark):
    media = multimodal.synthesize_media(spark, 12)
    rs = multimodal.resize_media(media, 32, 32).orderBy("media_id").toPandas()
    assert len(rs) == 12 and (rs.width == 32).all()
    rs2 = multimodal.resize_media(media.repartition(5), 32, 32).orderBy("media_id").toPandas()
    assert rs.payload.map(bytes).tolist() == rs2.payload.map(bytes).tolist()

    fr = multimodal.frame_sample(media.filter("kind = 'video'"), n_frames=3)
    pdf = fr.orderBy("media_id", "frame_idx").toPandas()
    n_videos = media.filter("kind = 'video'").count()
    assert len(pdf) == 3 * n_videos
    # frames differ across frame_idx but are deterministic per (media, idx)
    g = pdf[pdf.media_id == pdf.media_id.iloc[0]]
    assert len({tuple(f) for f in g.frame}) == 3

    with pytest.raises(NotImplementedError):
        multimodal.resize_image(b"x", 8, 8)


def test_minhash_band_divisibility_guard(docs):
    with pytest.raises(ValueError, match="divisible"):
        dedup.minhash_lsh_pairs(docs, num_hashes=32, bands=5)


def test_embedding_near_pairs_empty_input(spark):
    empty = spark.createDataFrame([], "vec_id LONG, embedding ARRAY<FLOAT>")
    assert similarity.embedding_near_pairs(empty).count() == 0


def test_quality_features_null_text(spark):
    df = spark.createDataFrame([(1, None), (2, "texto normal aqui presente")], "doc_id LONG, text STRING")
    q = {r.id: r for r in textstats.quality_features(df).collect()}
    assert q[1].n_tokens == 0 and q[1].n_chars == 0
    assert q[1].quality_score == 0.1 + 0.1  # only the punct/digit bonuses
    assert q[2].n_tokens == 4


def test_connected_components_vs_union_find(spark):
    """Min-label propagation + pointer jumping must equal a Python
    union-find oracle on a graph with long chains (deep propagation),
    stars, singleton pairs, and a cycle."""
    import random

    rng = random.Random(7)
    edges = []
    # a 40-node chain (depth stress for the pointer jumping)
    chain = [1000 + i for i in range(40)]
    edges += list(zip(chain, chain[1:]))
    # a star
    edges += [(2000, 2000 + i) for i in range(1, 8)]
    # a cycle
    edges += [(3000, 3001), (3001, 3002), (3002, 3000)]
    # random pairs
    for _ in range(30):
        a, b = rng.sample(range(4000, 4060), 2)
        edges.append((a, b))

    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for a, b in edges:
        union(a, b)
    want = {x: find(x) for x in parent}

    pairs = spark.createDataFrame(edges, "id_a LONG, id_b LONG")
    got = {r.id: r.comp for r in dedup.connected_components(pairs).collect()}
    assert got == want


def test_ivf_index_save_load_roundtrip(emb, spark, tmp_path):
    """Persisted IVF index must reload to identical assignments and
    centroids (never refit), and queries over the loaded index must
    equal queries over the in-memory one. The vectors table is
    partitioned by ivf_list so a probe prunes whole partitions."""
    df, vecs = emb
    indexed, centroids = similarity.ivf_index(df, n_lists=4)
    target = str(tmp_path / "ivf_idx")
    similarity.save_ivf_index(spark, indexed, centroids, target)
    loaded, c2 = similarity.load_ivf_index(spark, target)
    assert c2 == [[float(x) for x in c] for c in centroids]
    a = indexed.orderBy("vec_id").select("vec_id", "ivf_list").toPandas()
    b = loaded.orderBy("vec_id").select("vec_id", "ivf_list").toPandas()
    assert a.vec_id.tolist() == b.vec_id.tolist()
    assert a.ivf_list.tolist() == b.ivf_list.tolist()

    q = [float(x) for x in vecs[0]]
    got1 = [r.id for r in similarity.ivf_topk(indexed.filter(F.col("vec_id") != 0), centroids, q, k=5, nprobe=2).collect()]
    got2 = [r.id for r in similarity.ivf_topk(loaded.filter(F.col("vec_id") != 0), c2, q, k=5, nprobe=2).collect()]
    assert got1 == got2

    # partition pruning: the probe filter must reach the scan
    import os
    parts = [p for p in os.listdir(f"{target}_vectors") if p.startswith("ivf_list=")]
    assert len(parts) == 4


def test_near_dup_groups_end_to_end(docs):
    """LSH -> Jaccard verify -> components: the exact/near dups of doc 0
    form one group with keeper 0; unrelated docs form no group."""
    groups = {r.id: r.comp for r in dedup.near_dup_groups(docs, threshold=0.5, bands=16).collect()}
    assert groups.get(0) == 0 and groups.get(1) == 0 and groups.get(6) == 0
    assert groups.get(2) == 0  # one-token change passes jaccard 0.5 and links in
    assert 3 not in groups and 4 not in groups and 5 not in groups
    # dedup keep-list semantics: drop everything whose comp != id
    drop = {i for i, c in groups.items() if i != c}
    assert drop == {1, 2, 6}


def test_pq_index_deterministic_and_recall(near_dup_corpus, spark):
    """PQ codes are partitioning-invariant (value-hash sample fit +
    pure encode); LUT-scored top-k with exact rerank reaches
    recall@10 >= 0.8 vs brute force."""
    df = near_dup_corpus
    codes1, cb1 = similarity.pq_index(df, m=4)
    codes2, cb2 = similarity.pq_index(df.repartition(7), m=4)
    assert cb1 == cb2
    a = codes1.orderBy("id").toPandas()
    b = codes2.orderBy("id").toPandas()
    assert a.codes.map(tuple).tolist() == b.codes.map(tuple).tolist()

    q = [float(x) for x in df.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]]
    cand = df.filter(F.col("vec_id") != 0)
    cand_codes = codes1.filter(F.col("id") != 0)
    brute = [r.id for r in similarity.brute_force_topk(cand, q, k=10).collect()]
    approx = {r.id for r in similarity.pq_topk(cand_codes, cb1, q, k=10, emb=cand).collect()}
    recall = len(set(brute) & approx) / 10
    assert recall >= 0.8, f"recall@10={recall}"
    # LUT-only path (no rerank) still returns a full result set
    lut_only = {r.id for r in similarity.pq_topk(cand_codes, cb1, q, k=10).collect()}
    assert len(lut_only) == 10


def test_pq_dim_guard(emb):
    df, _ = emb
    with pytest.raises(ValueError, match="divide"):
        similarity.pq_index(df, m=5)  # dim 16 % 5 != 0


def test_pq_index_save_load_roundtrip(near_dup_corpus, spark, tmp_path):
    df = near_dup_corpus
    codes, cb = similarity.pq_index(df, m=4)
    target = str(tmp_path / "pq_idx")
    similarity.save_pq_index(spark, codes, cb, target)
    codes2, cb2 = similarity.load_pq_index(spark, target)
    assert cb2 == cb
    q = [float(x) for x in df.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]]
    a = [r.id for r in similarity.pq_topk(codes.filter(F.col("id") != 0), cb, q, k=5).collect()]
    b = [r.id for r in similarity.pq_topk(codes2.filter(F.col("id") != 0), cb2, q, k=5).collect()]
    assert a == b


def test_clean_corpus_end_to_end(spark, depara):
    """The corpus-cleaning composition: junk, too-short, wrong-language
    and near-duplicate turns are dropped; good prose survives with its
    language and quality attached."""
    from pdf_ocr_api_spark.ops import corpus

    good_en = ("the quick brown fox jumps over the lazy dog and runs across the river "
               "bank to find the other animals in the quiet green forest of the north")
    near_dup = good_en.replace("quiet green", "quiet dark")
    rows = [
        ("c0", 0, "user", good_en, None),
        ("c0", 1, "user", near_dup, None),                       # near-dup of turn 0
        ("c0", 2, "user", "1 2 3 , , , . . . 9 9 9 8 7", None),  # junk
        ("c0", 3, "user", "too short", None),                    # < 5 tokens
        ("c1", 0, "user", "el perro y la casa de los vecinos que viven cerca de la "
                           "plaza mayor donde los ninos juegan cada tarde de verano", None),  # es
        ("c1", 1, "user", "the cat and the dog of the house are in the garden near the "
                           "old stone wall where the birds sing in the morning light", None),
    ]
    sdf = spark.createDataFrame(rows, "conv_id STRING, turn_idx INT, role STRING, text STRING, tool STRING")
    out = corpus.clean_corpus(sdf, min_quality=0.5, langs=["en"], dedup_threshold=0.6,
                              depara=depara, parallelism=4).collect()
    kept = {(r.conv_id, r.turn_idx): r for r in out}

    assert ("c1", 1) in kept and kept[("c1", 1)].lang == "en"
    assert ("c0", 2) not in kept          # junk quality
    assert ("c0", 3) not in kept          # token floor
    assert ("c1", 0) not in kept          # language gate
    # exactly ONE of the near-dup pair survives (keeper = smallest
    # surrogate hash — deterministic, not order-dependent)
    pair = [(c, t) for (c, t) in kept if c == "c0" and t in (0, 1)]
    assert len(pair) == 1, pair
    assert all(r.quality_score >= 0.5 and r.n_tokens >= 5 for r in out)


def _inc_corpus(spark):
    a = "the quick brown fox jumps over the lazy dog near the river bank in the north"
    b = "spark processes distributed data with resilient datasets and the catalyst optimizer engine"
    c = "cooking pasta with fresh tomato sauce and basil is a simple joy of summer evenings"
    d = "mountains rise steeply above the quiet valley where the cold streams run all year"
    f = "libraries hold thousands of old books about science history art and forgotten trades"
    batch1 = [
        (0, a),
        (1, a.replace("north", "south")),  # near-dup of 0 → intra-batch1 loser
        (2, b),
        (3, c),
        (4, d),
    ]
    batch2 = [
        (10, a.replace("quick", "swift")),  # cross-batch near-dup of 0 → dropped
        (11, b),                            # exact copy of kept 2 → dropped
        (12, f),
        (13, f.replace("forgotten", "ancient")),  # intra-batch2 near-dup → keep 12
        (14, "entirely new unique content about deep sea creatures and their glowing light organs"),
    ]
    schema = "doc_id LONG, text STRING"
    return (
        spark.createDataFrame(batch1, schema),
        spark.createDataFrame(batch2, schema),
    )


def test_incremental_keep_equals_full_recompute(spark):
    """incremental(batch1) + incremental(batch2 | kept1) must keep
    EXACTLY the ids the full near_dup_groups recompute over the union
    keeps — cross-batch near-dups planted in both directions (vs a kept
    doc, vs an exact copy of a kept doc, and intra-batch-2)."""
    b1, b2 = _inc_corpus(spark)
    kw = dict(threshold=0.5, num_hashes=32, bands=16)

    empty = b1.limit(0)
    kept1 = dedup.incremental_keep(empty, b1, **kw)
    got1 = {r.doc_id for r in kept1.collect()}
    assert got1 == {0, 2, 3, 4}

    kept2 = dedup.incremental_keep(kept1, b2, **kw)
    got2 = {r.doc_id for r in kept2.collect()}
    assert got2 == {12, 14}

    union = b1.unionByName(b2)
    groups = dedup.near_dup_groups(union, **kw)
    losers = {r.id for r in groups.collect() if r.id != r.comp}
    full_kept = {r.doc_id for r in union.collect()} - losers
    assert got1 | got2 == full_kept

    # the signature table IS the index: passing persisted kept signatures
    # must change nothing
    sigs1 = dedup.minhash_signatures(kept1, num_hashes=32)
    kept2b = dedup.incremental_keep(kept1, b2, kept_sigs=sigs1, **kw)
    assert {r.doc_id for r in kept2b.collect()} == got2


def test_clean_corpus_incremental_equals_full(spark, depara):
    """clean_corpus(b1 ∪ b2) == clean_corpus(b1) ∪
    clean_corpus_incremental(kept1, b2), byte-equal — with cross-batch
    near-dup AND cross-batch exact-dup turns planted. Batch-2 conv ids
    sort after batch-1's (the append contract)."""
    from pdf_ocr_api_spark.ops import corpus

    base = ("the quick brown fox jumps over the lazy dog and runs across the river "
            "bank to find the other animals in the quiet green forest of the north")
    uniq = ("the cat and the dog of the house are in the garden near the "
            "old stone wall where the birds sing in the morning light")
    b1_rows = [
        ("a0", 0, "user", base, None),
        ("a0", 1, "user", base.replace("green", "dark"), None),  # intra-b1 near-dup
        ("a1", 0, "user", uniq, None),
    ]
    b2_rows = [
        ("b0", 0, "user", base.replace("quick", "swift"), None),  # cross-batch near-dup
        ("b0", 1, "user", uniq, None),                            # cross-batch exact dup
        ("b1", 0, "user", "entirely new unique content about deep sea creatures and "
                           "their glowing light organs in the dark water", None),
    ]
    schema = "conv_id STRING, turn_idx INT, role STRING, text STRING, tool STRING"
    b1 = spark.createDataFrame(b1_rows, schema)
    b2 = spark.createDataFrame(b2_rows, schema)
    kw = dict(min_quality=0.3, min_tokens=5, dedup_threshold=0.6, depara=depara,
              parallelism=4)

    full = corpus.clean_corpus(b1.unionByName(b2), **kw).collect()
    kept1 = corpus.clean_corpus(b1, **kw)
    inc2 = corpus.clean_corpus_incremental(kept1, b2, **kw).collect()

    def key(rows):
        return sorted((r.conv_id, r.turn_idx, r.clean_text, r.lang, r.n_tokens,
                       r.quality_score) for r in rows)

    assert key(full) == key(list(kept1.collect()) + list(inc2))
    # the planted drops actually happened
    got = {(r.conv_id, r.turn_idx) for r in inc2}
    assert ("b0", 0) not in got and ("b0", 1) not in got
    assert ("b1", 0) in got

    # the persisted-signature-table path (the production shape: never
    # re-hash history) must change nothing
    sigs1 = corpus.corpus_signatures(kept1)
    inc2b = corpus.clean_corpus_incremental(kept1, b2, kept_sigs=sigs1, **kw).collect()
    assert key(inc2b) == key(inc2)


def test_runner_clean_corpus_cycle(spark, tmp_path):
    """The spark-submit corpus-job surface: --clean-corpus writes
    corpus + signature index; --clean-incremental appends only the new
    batch's survivors (deduped against the STORED pair) — the chained
    store equals the full recompute, and the signature index stays
    row-consistent with the corpus."""
    from pdf_ocr_api_spark import runner
    from pdf_ocr_api_spark.ops import corpus

    base = ("the quick brown fox jumps over the lazy dog and runs across the river "
            "bank to find the other animals in the quiet green forest of the north")
    uniq = ("the cat and the dog of the house are in the garden near the "
            "old stone wall where the birds sing in the morning light")
    schema = "conv_id STRING, turn_idx INT, role STRING, text STRING, tool STRING"
    b1 = spark.createDataFrame(
        [("a0", 0, "user", base, None), ("a1", 0, "user", uniq, None)], schema)
    b2 = spark.createDataFrame(
        [("b0", 0, "user", base.replace("quick", "swift"), None),  # near-dup of history
         ("b1", 0, "user", "entirely new unique content about deep sea creatures and "
                            "their glowing light organs in the dark water", None)], schema)
    in1, in2 = str(tmp_path / "b1"), str(tmp_path / "b2")
    b1.write.parquet(in1)
    b2.write.parquet(in2)
    root = str(tmp_path / "run")
    knobs = ["--min-quality", "0.3", "--min-tokens", "5",
             "--dedup-threshold", "0.6", "--buckets", "8"]

    # incremental before any corpus exists must fail cleanly
    assert runner.main(["--clean-incremental", "--input", in2, "--output", root] + knobs) == 1

    assert runner.main(["--clean-corpus", "--input", in1, "--output", root] + knobs) == 0
    assert runner.main(["--clean-incremental", "--input", in2, "--output", root] + knobs) == 0

    stored = spark.read.parquet(f"{root}/corpus")
    full = corpus.clean_corpus(
        b1.unionByName(b2), min_quality=0.3, min_tokens=5, dedup_threshold=0.6, parallelism=8
    )
    key = lambda rows: sorted((r.conv_id, r.turn_idx, r.clean_text) for r in rows)
    assert key(stored.collect()) == key(full.collect())
    assert ("b0", 0) not in {(r.conv_id, r.turn_idx) for r in stored.collect()}
    sigs = spark.read.parquet(f"{root}/signatures")
    assert sigs.count() == stored.count()
    # the run log persists one summary row per job, with the recall-loss
    # accounting, next to the store
    runs = spark.read.parquet(f"{root}/runs").collect()
    assert sorted(r.mode for r in runs) == ["clean_corpus", "clean_incremental"]
    assert all(r.dropped_buckets == 0 for r in runs)


def test_runner_scrub_and_decontam_flags(spark, tmp_path):
    """r5 CLI surface: --scrub-pii redacts before the store is written,
    and --decontam-probes drops benchmark-overlapping turns in BOTH
    modes — the flags reach ops/corpus with the right plumbing."""
    from pdf_ocr_api_spark import runner

    bench = ("what is the capital of france and which river flows through "
             "the city on its way to the northern sea coast")
    keep = ("the cat and the dog of the house are in the garden near the "
            "old stone wall where the birds sing in the morning light")
    pii = ("please send the signed contract to maria.silva@example.com "
           "before the end of the week so the team can file it properly")
    schema = "conv_id STRING, turn_idx INT, role STRING, text STRING, tool STRING"
    b1 = spark.createDataFrame([("a0", 0, "user", keep, None),
                                ("a1", 0, "user", pii, None)], schema)
    b2 = spark.createDataFrame([("b0", 0, "user", bench, None),
                                ("b1", 0, "user", "entirely new unique content about deep "
                                 "sea creatures and their glowing light organs", None)], schema)
    in1, in2 = str(tmp_path / "b1"), str(tmp_path / "b2")
    b1.write.parquet(in1)
    b2.write.parquet(in2)
    probes_path = str(tmp_path / "probes")
    spark.createDataFrame([(bench,)], "text STRING").write.parquet(probes_path)
    root = str(tmp_path / "run")
    knobs = ["--min-quality", "0.3", "--min-tokens", "5", "--dedup-threshold", "0.6",
             "--buckets", "8", "--scrub-pii",
             "--decontam-probes", probes_path, "--decontam-n", "4"]

    assert runner.main(["--clean-corpus", "--input", in1, "--output", root] + knobs) == 0
    assert runner.main(["--clean-incremental", "--input", in2, "--output", root] + knobs) == 0

    stored = spark.read.parquet(f"{root}/corpus").collect()
    ids = {(r.conv_id, r.turn_idx) for r in stored}
    assert ("b0", 0) not in ids            # benchmark turn decontaminated
    assert ("b1", 0) in ids                # clean new content survives
    a1 = next(r.clean_text for r in stored if r.conv_id == "a1")
    assert "<EMAIL>" in a1 and "maria.silva@example.com" not in a1
    # signature index stays row-consistent through the gated path
    assert spark.read.parquet(f"{root}/signatures").count() == len(stored)


def test_runner_splits_flag(spark, tmp_path):
    """r5 CLI surface: --splits stores a leakage-safe hash split column;
    the assignment is hash-stable, so the incremental batch's rows agree
    with what a full rebuild would assign — and the run log still
    carries the dedup metrics (the split projection must not drop the
    metrics attribute)."""
    from pdf_ocr_api_spark import runner
    from pdf_ocr_api_spark.ops import training

    texts = [
        (f"c{i}", 0, "user",
         f"document number {i} about the {w} in the old town near the river "
         "where the market opens early and the stalls sell bread and fruit", None)
        for i, w in enumerate(["library", "station", "harbor", "school", "garden",
                               "museum", "bridge", "mill", "bakery", "tower"])
    ]
    schema = "conv_id STRING, turn_idx INT, role STRING, text STRING, tool STRING"
    b1 = spark.createDataFrame(texts[:6], schema)
    b2 = spark.createDataFrame(texts[6:], schema)
    in1, in2 = str(tmp_path / "b1"), str(tmp_path / "b2")
    b1.write.parquet(in1)
    b2.write.parquet(in2)
    root = str(tmp_path / "run")
    knobs = ["--min-quality", "0.3", "--min-tokens", "5", "--dedup-threshold", "0.6",
             "--buckets", "8", "--splits", "train=0.6,val=0.4", "--split-salt", "s9"]

    assert runner.main(["--clean-corpus", "--input", in1, "--output", root] + knobs) == 0
    assert runner.main(["--clean-incremental", "--input", in2, "--output", root] + knobs) == 0

    stored = spark.read.parquet(f"{root}/corpus")
    assert "split" in stored.columns
    # stored assignment == fresh assignment of the same keys (stability)
    want = {
        r.conv_id: r.split
        for r in training.assign_splits(
            stored.select("conv_id").distinct(), {"train": 0.6, "val": 0.4},
            key_col="conv_id", salt="s9",
        ).collect()
    }
    assert all(r.split == want[r.conv_id] for r in stored.collect())
    assert set(want.values()) == {"train", "val"}
    # metrics survived the split projection into the runs table
    runs = spark.read.parquet(f"{root}/runs").collect()
    assert all(r.dropped_buckets is not None for r in runs)


def test_incremental_kept_set_is_independent(spark):
    """Property over random corpora + planted near-dups: after
    incremental(b1) + incremental(b2 | kept1), NO verified near-dup pair
    exists WITHIN the final kept set (keepers are one per component, and
    batch-2 keepers must have no verified link to history). This is the
    semantic guarantee that survives even the documented divergence
    cases (bridges / chains-through-dropped), where set equality with
    the full recompute does not. Deterministic (seeded corpora + seeded
    engine hashes), three corpus draws."""
    import random

    words = ("alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
             "lima mike november oscar papa quebec romeo sierra tango uniform victor "
             "whiskey xray yankee zulu amber birch cedar dune ember fjord grove "
             "harbor inlet jetty knoll ledge mesa notch oxbow").split()
    for seed in (1, 2, 3):
        rng = random.Random(seed)
        docs = []
        base_texts = []
        for i in range(14):
            t = " ".join(rng.choice(words) for _ in range(12))
            base_texts.append(t)
            docs.append((i, t))
        nid = 20
        for _ in range(6):  # near-dups of random bases, split across batches
            src = base_texts[rng.randrange(len(base_texts))].split()
            src[rng.randrange(len(src))] = rng.choice(words)
            docs.append((nid, " ".join(src)))
            nid += 1
        df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
        b1 = df.filter(F.col("doc_id") < 17)
        b2 = df.filter(F.col("doc_id") >= 17)
        kw = dict(threshold=0.6, num_hashes=32, bands=16)
        kept1 = dedup.incremental_keep(b1.limit(0), b1, **kw)
        kept2 = dedup.incremental_keep(kept1, b2, **kw)
        final = kept1.unionByName(kept2)
        fin = sorted(r.doc_id for r in final.select("doc_id").collect())
        pairs = [(a, b) for i, a in enumerate(fin) for b in fin[i + 1 :]]
        ver = dedup.jaccard_verify(
            final, spark.createDataFrame(pairs, "id_a LONG, id_b LONG"), threshold=0.6
        )
        assert ver.count() == 0, (seed, ver.collect())


def test_sync_signatures_self_heals(spark, tmp_path):
    """The corpus/signature store reconciler: creates a missing index,
    backfills rows the index lacks (the crash-between-appends window),
    and is a no-op when consistent."""
    from pdf_ocr_api_spark.ops import corpus

    rows = [("c%d" % i, 0, "text number %d with several distinct words here" % i,
             "en", 7, 0.9) for i in range(4)]
    df = spark.createDataFrame(
        rows,
        "conv_id STRING, turn_idx INT, clean_text STRING, lang STRING, "
        "n_tokens INT, quality_score DOUBLE",
    )
    ct = str(tmp_path / "corpus")
    st = str(tmp_path / "sigs")
    df.write.parquet(ct)

    assert corpus.sync_signatures(spark, ct, st) == 4  # create
    assert corpus.sync_signatures(spark, ct, st) == 0  # consistent

    st2 = str(tmp_path / "sigs_partial")
    spark.read.parquet(st).limit(2).write.parquet(st2)  # simulated half-append
    assert corpus.sync_signatures(spark, ct, st2) == 2  # backfill
    assert spark.read.parquet(st2).count() == 4


def test_clean_corpus_metrics_observable(spark, depara):
    """The LSH bucket-cap recall-loss accounting must be readable off the
    clean_corpus RESULT (dedup_metrics), not just executor logs."""
    from pdf_ocr_api_spark.ops import corpus

    fam = "the same exact sentence repeated for the template family test again and again"
    # distinct near-identical texts (exact dedup must NOT collapse them)
    rows = [("c%d" % i, 0, "user", fam + " variant %d" % i, None) for i in range(12)]
    sdf = spark.createDataFrame(
        rows, "conv_id STRING, turn_idx INT, role STRING, text STRING, tool STRING"
    )
    out = corpus.clean_corpus(sdf, min_quality=0.0, min_tokens=3, dedup_threshold=0.5,
                              depara=depara, max_bucket_size=4)
    out.collect()
    m = corpus.dedup_metrics(out)
    assert m["dropped_buckets"] > 0 and m["max_bucket"] >= 12
    # uncapped run reports zeros
    out2 = corpus.clean_corpus(sdf, min_quality=0.0, min_tokens=3, dedup_threshold=0.5,
                               depara=depara, max_bucket_size=None)
    out2.collect()
    assert corpus.dedup_metrics(out2)["dropped_buckets"] == 0
    # a DERIVED frame has no metrics — None ("metrics lost"), never zeros
    assert corpus.dedup_metrics(out.limit(1)) is None


def test_incremental_keep_bucket_cap_and_metrics(spark):
    """incremental_keep must carry the same quadratic-skew backstop as
    the full pipeline: a template family in the batch (or a mega-bucket
    in the stored index) is dropped with OBSERVABLE accounting."""
    from pdf_ocr_api_spark.ops import corpus

    fam = [(i, "the same exact template sentence repeated again and again") for i in range(12)]
    uniq = [(100, "completely different content about cooking pasta with fresh tomato sauce")]
    batch = spark.createDataFrame(fam + uniq, "doc_id LONG, text STRING")
    empty = batch.limit(0)
    out = dedup.incremental_keep(empty, batch, threshold=0.5, bands=16, max_bucket_size=4)
    kept = {r.doc_id for r in out.collect()}
    # every family bucket over cap -> no intra candidates -> all kept
    assert kept == {i for i, _ in fam} | {100}
    m = corpus.dedup_metrics(out)
    assert m is not None and m["dropped_buckets"] > 0 and m["max_bucket"] >= 12
    # uncapped: family collapses to its min id
    out2 = dedup.incremental_keep(empty, batch, threshold=0.5, bands=16)
    assert {r.doc_id for r in out2.collect()} == {0, 100}
    assert corpus.dedup_metrics(out2) == {"dropped_buckets": 0, "max_bucket": None}


def test_connected_components_reliable_checkpoint(spark, tmp_path):
    """The reliable-checkpoint path (storage-backed checkpoint() instead
    of executor-local blocks) must produce identical components and must
    actually write checkpoint data under the given dir."""
    edges = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)]
    pairs = spark.createDataFrame(edges, "id_a LONG, id_b LONG")
    ckpt = str(tmp_path / "reliable_ckpt")
    got_local = {r.id: r.comp for r in dedup.connected_components(pairs).collect()}
    got_rel = {
        r.id: r.comp
        for r in dedup.connected_components(
            pairs, reliable_checkpoint_dir=ckpt
        ).collect()
    }
    assert got_rel == got_local
    import pathlib

    written = list(pathlib.Path(ckpt).rglob("*"))
    assert written, "reliable checkpoint dir is empty — checkpoint() never wrote"


def test_near_dup_groups_reliable_checkpoint(docs, tmp_path):
    """near_dup_groups must thread the reliable knob through all three
    cuts and return the same groups."""
    a = dedup.near_dup_groups(docs, threshold=0.5).collect()
    b = dedup.near_dup_groups(
        docs, threshold=0.5, reliable_checkpoint_dir=str(tmp_path / "ck2")
    ).collect()
    assert sorted((r.id, r.comp) for r in a) == sorted((r.id, r.comp) for r in b)


def test_connected_components_nonconvergence_raises(spark):
    """Exhausting max_iter must raise, never silently return split
    groups (a chain of depth 3 cannot converge in one round)."""
    edges = [(i, i + 1) for i in range(1, 9)]
    pairs = spark.createDataFrame(edges, "id_a LONG, id_b LONG")
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(pairs, max_iter=1)


def test_bucket_cap_drop_is_observable(spark):
    """When the bucket cap drops a band bucket, warn_dropped_buckets must
    report a nonzero count (recall loss is never silent)."""
    # 12 identical docs -> every band bucket holds all 12 members
    rows = [(i, "the same exact sentence repeated for the template family test") for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    raw = dedup.minhash_lsh_pairs(df, max_bucket_size=4)
    out = raw.select("id_a", "id_b").localCheckpoint(eager=True)
    assert out.count() == 0  # all buckets over cap -> no candidates
    assert dedup.warn_dropped_buckets(raw) > 0

    raw2 = dedup.minhash_lsh_pairs(df, max_bucket_size=100)
    raw2.select("id_a", "id_b").localCheckpoint(eager=True)
    assert dedup.warn_dropped_buckets(raw2) == 0


def test_ivfpq_recall_and_roundtrip(near_dup_corpus, spark, tmp_path):
    """IVF×PQ composition: probe + LUT-score + exact rerank reaches
    recall@10 >= 0.8 vs brute force; persisted index reloads to
    identical results (never refits)."""
    df = near_dup_corpus
    codes, cents, cbs = similarity.ivfpq_index(df, n_lists=8, m=4)
    q = [float(x) for x in df.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]]
    cand = df.filter(F.col("vec_id") != 0)
    cand_codes = codes.filter(F.col("id") != 0)
    brute = [r.id for r in similarity.brute_force_topk(cand, q, k=10).collect()]
    approx = {
        r.id
        for r in similarity.ivfpq_topk(
            cand_codes, cents, cbs, q, k=10, nprobe=4, emb=cand
        ).collect()
    }
    recall = len(set(brute) & approx) / 10
    assert recall >= 0.8, f"recall@10={recall}"
    # LUT-only (no rerank) still returns a full result set
    lut_only = similarity.ivfpq_topk(cand_codes, cents, cbs, q, k=10, nprobe=4).collect()
    assert len(lut_only) == 10

    target = str(tmp_path / "ivfpq_idx")
    similarity.save_ivfpq_index(spark, codes, cents, cbs, target)
    codes2, cents2, cbs2, props = similarity.load_ivfpq_index(spark, target)
    assert cents2 == cents and cbs2 == cbs and props["residual"] is False
    a = [r.id for r in similarity.ivfpq_topk(
        codes.filter(F.col("id") != 0), cents, cbs, q, k=5, nprobe=4).collect()]
    b = [r.id for r in similarity.ivfpq_topk(
        codes2.filter(F.col("id") != 0), cents2, cbs2, q, k=5, nprobe=4).collect()]
    assert a == b


def test_ivfpq_topk_batch_equals_single_query(near_dup_corpus, spark):
    """Batched index-backed ANN must reproduce the single-query path
    EXACTLY, per query: raw LUT-only, raw + rerank, and residual
    (IVFADC) + rerank — broadcast LUT-table scoring vs literal-LUT
    plans, probe selection mirrored per mode."""
    df = near_dup_corpus
    queries = df.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    qvecs = {
        r.query_id: [float(x) for x in r.query_vec] for r in queries.collect()
    }

    for residual in (False, True):
        codes, cents, cbs = similarity.ivfpq_index(df, n_lists=8, m=4, residual=residual)
        for emb in (None, df):
            batch = similarity.ivfpq_topk_batch(
                codes, cents, cbs, queries, k=5, nprobe=3, emb=emb, residual=residual
            ).collect()
            for qid, q in qvecs.items():
                single = similarity.ivfpq_topk(
                    codes, cents, cbs, q, k=5, nprobe=3, emb=emb, residual=residual
                ).collect()
                got = [r for r in batch if r.query_id == qid]
                if emb is None:
                    assert [(r.id, r.pq_dist) for r in got] == [
                        (r.id, r.pq_dist) for r in single
                    ], (residual, qid)
                else:
                    assert [(r.id, r.cosine) for r in got] == [
                        (r.id, r.cosine) for r in single
                    ], (residual, qid)


def test_batch_cosine_zero_query_guard(near_dup_corpus, spark):
    """An all-zero query must score 0.0 rows (the single-query path's
    driver-side `or 1.0` guard), NOT NULL out the cosine column and rank
    arbitrary ties — batch == single-query even on this edge."""
    df = near_dup_corpus
    indexed, cents = similarity.ivf_index(df, n_lists=8)
    zq = spark.createDataFrame(
        [(99, [0.0] * 16)], "query_id LONG, query_vec ARRAY<FLOAT>"
    )
    batch = similarity.ivf_topk_batch(indexed, cents, zq, k=5, nprobe=3).collect()
    single = similarity.ivf_topk(indexed, cents, [0.0] * 16, k=5, nprobe=3).collect()
    assert [(r.id, r.cosine) for r in batch] == [(r.id, r.cosine) for r in single]
    assert all(r.cosine == 0.0 for r in batch)


def test_ivf_topk_batch_equals_single_query(near_dup_corpus, spark):
    df = near_dup_corpus
    indexed, cents = similarity.ivf_index(df, n_lists=8)
    queries = df.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    batch = similarity.ivf_topk_batch(indexed, cents, queries, k=5, nprobe=3).collect()
    for r in queries.collect():
        q = [float(x) for x in r.query_vec]
        single = similarity.ivf_topk(indexed, cents, q, k=5, nprobe=3).collect()
        got = [(x.id, x.cosine) for x in batch if x.query_id == r.query_id]
        assert got == [(x.id, x.cosine) for x in single], r.query_id


def test_script_id_routing(spark):
    """Script detection (r4): dominant-writing-system routing for
    multilingual corpora — char-class counts (engine-portable, unlike \\b
    on non-ASCII), 'und' for unscripted/null text, scalar == sweep."""
    from pdf_ocr_api_spark.ops import textstats

    rows = [
        (0, "hello world this is clearly latin text"),
        (1, "привет мир это текст на кириллице"),
        (2, "γειά σου κόσμε ελληνικά"),
        (3, "مرحبا بالعالم هذا نص عربي"),
        (4, "नमस्ते दुनिया यह हिंदी है"),
        (5, "你好世界 こんにちは 안녕하세요"),
        (6, "1234 ... !!! 555"),
        (7, None),
        (8, "mixed привет but mostly русская кириллица здесь"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    want = {0: "latin", 1: "cyrillic", 2: "greek", 3: "arabic",
            4: "devanagari", 5: "cjk", 6: "und", 7: "und", 8: "cyrillic"}
    got = {r.doc_id: r.s for r in
           df.select("doc_id", textstats.script_id(F.col("text")).alias("s")).collect()}
    assert got == want
    got2 = {r.doc_id: r.script for r in
            textstats.with_script_id(df, "text").select("doc_id", "script").collect()}
    assert got2 == want
    # the count struct agrees with the argmax inputs; ×/÷ are NOT latin
    counts = df.filter(F.col("doc_id") == 6).select(
        textstats.script_counts(F.lit("5 × 4 ÷ 2")).alias("c")
    ).collect()[0].c
    assert counts.latin == 0


def test_lang_id_da_sv_banks(spark):
    """r4 widening: Danish vs Swedish — the classic confusion pair —
    resolve through mutually disjoint markers (ikke/hvad/af/til vs
    inte/vad/av/till), including accented Swedish through the fold, and
    the German/Dutch neighbors stay unaffected."""
    from pdf_ocr_api_spark.ops import textstats

    rows = [
        (0, "jeg ved ikke hvad der sker og hvor vi skal hen til byen af den grund"),
        (1, "jag vet inte vad som sker och vi ska resa till staden av samma skal att se"),
        (2, "het huis van de buren is niet groot maar een tuin zijn er wel"),   # nl
        (3, "der hund ist nicht im haus und die katze"),                        # de
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {r.doc_id: r.lang for r in
           textstats.with_lang_id(df, "text").select("doc_id", "lang").collect()}
    assert got == {0: "da", 1: "sv", 2: "nl", 3: "de"}
    # per-lang scalar form agrees with the fused sweep
    got2 = {r.doc_id: r.l for r in
            df.select("doc_id", textstats.lang_id(F.col("text")).alias("l")).collect()}
    assert got2 == got


def test_lang_id_widened_bank_and_confusion(spark):
    """r3 widened banks (it/nl/pl) classify correctly, and the CONFUSION
    cases that motivated careful word choices resolve right: Italian
    'di/che' vs pt 'de/que', Dutch 'van/het' vs de 'und/der', Polish
    ASCII markers vs de 'nie'(never), plus accented inputs through the
    fold."""
    rows = [
        (0, "il gatto e il cane sono nella casa che anche la nonna ama di piu"),
        (1, "het huis van de buren is niet groot maar een tuin zijn er wel"),
        (2, "to jest dom przez ktory czy dla nas jak oraz dla was jest dobry"),
        (3, "la casa del perro que esta cerca de los arboles y las flores"),
        (4, "não é uma casa de que os vizinhos gostam"),   # accents fold -> pt
        (5, "der hund ist nicht im haus und die katze"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {r.doc_id: r.lang for r in df.select(
        "doc_id", textstats.lang_id(F.col("text")).alias("lang")).collect()}
    assert got == {0: "it", 1: "nl", 2: "pl", 3: "es", 4: "pt", 5: "de"}


def test_with_lang_id_fused_equals_per_lang(spark, docs):
    """The fused single-pass sweep form must equal the per-lang
    expression form on every row — including marker-free, null, empty
    and cross-lang-overlap texts ('de' appears in es/pt/fr banks)."""
    extra = [
        (1000, None),
        (1001, ""),
        (1002, "de de de de"),                       # overlap-only text
        (1003, "the la le der o il het jest"),       # one hit per bank
    ]
    df = docs.select("doc_id", "text").unionByName(
        spark.createDataFrame(extra, "doc_id LONG, text STRING")
    )
    per_lang = {
        r.doc_id: r.lang
        for r in df.select("doc_id", textstats.lang_id(F.col("text")).alias("lang")).collect()
    }
    fused = {
        r.doc_id: r.lang
        for r in textstats.with_lang_id(df, "text").select("doc_id", "lang").collect()
    }
    assert fused == per_lang


def test_codecs_roundtrip():
    """Pure-numpy codecs: encode→decode identity for BMP (incl. rows
    needing padding), WAV (mono + stereo), Y4M (multi-frame)."""
    from pdf_ocr_api_spark.ops import codecs

    rng = np.random.default_rng(5)
    for w, h in [(7, 5), (16, 12), (3, 9)]:  # 7*3=21 → 3 pad bytes
        rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert (codecs.decode_bmp(codecs.encode_bmp(rgb)) == rgb).all()
    mono = (rng.standard_normal(500) * 10000).astype(np.int16)
    got, rate = codecs.decode_wav(codecs.encode_wav(mono, 8000))
    assert rate == 8000 and (got[:, 0] == mono).all()
    stereo = (rng.standard_normal((300, 2)) * 10000).astype(np.int16)
    got2, _ = codecs.decode_wav(codecs.encode_wav(stereo, 44100))
    assert (got2 == stereo).all()
    frames = rng.integers(0, 256, (3, 8, 10), dtype=np.uint8)
    fy, fps = codecs.decode_y4m(codecs.encode_y4m(frames, fps=30))
    assert fps == 30 and (fy == frames).all()


def test_codecs_roundtrip_ppm_au():
    """r4 codecs: PPM (P6) and Sun AU encode→decode identity, header
    comment/whitespace handling, unsupported-flavor rejection, and
    format-preserving resize routing."""
    from pdf_ocr_api_spark.ops import codecs

    rng = np.random.default_rng(9)
    rgb = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
    assert (codecs.decode_ppm(codecs.encode_ppm(rgb)) == rgb).all()
    # Netpbm comment + mixed whitespace in the header
    commented = b"P6 # a comment\n# another\n 7\t5\n255\n" + rgb.tobytes()
    assert (codecs.decode_ppm(commented) == rgb).all()
    with pytest.raises(ValueError):  # 16-bit maxval flavor
        codecs.decode_ppm(b"P6\n2 2\n65535\n" + b"\x00" * 24)

    mono = (rng.standard_normal(400) * 9000).astype(np.int16)
    got, rate = codecs.decode_au(codecs.encode_au(mono, 22050))
    assert rate == 22050 and (got[:, 0] == mono).all()
    stereo = (rng.standard_normal((150, 2)) * 9000).astype(np.int16)
    got2, _ = codecs.decode_au(codecs.encode_au(stereo, 8000))
    assert (got2 == stereo).all()
    # unknown-size (0xFFFFFFFF) reads to end-of-payload, per the format
    enc = bytearray(codecs.encode_au(mono, 8000))
    enc[8:12] = b"\xff\xff\xff\xff"
    got3, _ = codecs.decode_au(bytes(enc))
    assert (got3[:, 0] == mono).all()

    assert codecs.sniff_codec(codecs.encode_ppm(rgb)) == "ppm"
    assert codecs.sniff_codec(codecs.encode_au(mono)) == "au"
    assert codecs.sniff_codec(b"P6x not ppm") is None  # magic needs whitespace next
    assert codecs.sniff_codec(b"P6") is None  # bare magic (empty-slice trap)
    with pytest.raises(ValueError):  # maxval not followed by whitespace
        codecs.decode_ppm(b"P6\n2 2\n255x" + b"\x00" * 12)
    # spec-valid sub-255 maxval rescales to the 0..255 basis
    scaled = codecs.decode_ppm(b"P6\n1 1\n100\n" + bytes([100, 50, 0]))
    assert scaled.tolist() == [[[255, 128, 0]]]

    # resize re-encodes in the SOURCE format
    from pdf_ocr_api_spark.ops import multimodal

    small = codecs.decode_ppm(multimodal.resize_image(codecs.encode_ppm(rgb), 3, 2))
    assert small.shape == (2, 3, 3)
    # feature router: real image/audio features, not the fake fallback
    pv = multimodal.media_feature_vector(codecs.encode_ppm(rgb))
    assert abs(pv[0] - rgb[:, :, 0].mean() / 255.0) < 0.01
    av = multimodal.media_feature_vector(codecs.encode_au(mono, 8000))
    rms = float(np.sqrt(np.mean((mono / 32768.0) ** 2)))
    assert abs(av[0] - rms) < 0.02  # feature[0] IS the RMS, tightly


def test_codecs_reject_garbage():
    from pdf_ocr_api_spark.ops import codecs

    for fn in (codecs.decode_bmp, codecs.decode_wav, codecs.decode_y4m,
               codecs.decode_ppm, codecs.decode_au):
        with pytest.raises(ValueError):
            fn(b"garbage bytes that are no media at all")
    assert codecs.sniff_codec(b"garbage") is None
    assert codecs.sniff_codec(None) is None


def test_real_decode_resize_and_features(spark):
    """REAL media paths: BMP resize is an actual nearest-neighbor
    downsample (checkerboard preserved), WAV features reflect the
    signal (RMS of a tone), Y4M frame sampling returns features of the
    ACTUAL decoded frames — all through the distributed mapInPandas
    path, deterministic across partitionings."""
    from pdf_ocr_api_spark.ops import codecs

    # image: 2x2 checkerboard blown up to 8x8 then resized back
    board = np.zeros((2, 2, 3), np.uint8)
    board[0, 1] = board[1, 0] = 255
    big = codecs.resize_nearest(board, 8, 8)
    payload = codecs.encode_bmp(big)
    back = codecs.decode_bmp(multimodal.resize_image(payload, 2, 2))
    assert (back == board).all()

    media = multimodal.synthesize_real_media(spark, 12)
    f1 = multimodal.media_features(media.repartition(1)).orderBy("media_id").toPandas()
    f2 = multimodal.media_features(media.repartition(5)).orderBy("media_id").toPandas()
    assert f1.feature.map(tuple).tolist() == f2.feature.map(tuple).tolist()

    rows = {r.media_id: r for r in media.collect()}
    # audio features are REAL: a pure tone at amplitude 12000/32768 has
    # RMS ~ 0.37/sqrt(2) ~ 0.26
    audio_feats = f1[f1.kind == "audio"].iloc[0].feature
    assert 0.2 < audio_feats[0] < 0.32
    # image features are REAL: mean of the red gradient channel ~ 0.5
    img_feats = f1[f1.kind == "image"].iloc[0].feature
    assert 0.35 < img_feats[0] < 0.65

    # frame sampling decodes the actual Y4M frames
    vid = media.filter("kind = 'video'")
    fr = multimodal.frame_sample(vid, n_frames=2).orderBy("media_id", "frame_idx").toPandas()
    first = next(r for r in rows.values() if r.kind == "video")
    frames_y, _ = codecs.decode_y4m(bytes(first.payload))
    want = multimodal.image_features(np.repeat(frames_y[0][:, :, None], 3, axis=2)).tolist()
    got = fr[(fr.media_id == first.media_id) & (fr.frame_idx == 0)].iloc[0].frame
    assert np.allclose(got, want, atol=1e-6)

    # resize through the distributed path round-trips for BMP media
    rs = multimodal.resize_media(media.filter("kind = 'image'"), 4, 4).toPandas()
    for p in rs.payload:
        dec = codecs.decode_bmp(bytes(p))
        assert dec.shape == (4, 4, 3)


def test_corrupt_sniffed_payloads_degrade_not_crash(spark):
    """Payloads whose magic bytes sniff as decodable but fail to parse
    (corrupt files, text starting 'BM…') must fall back to the fake
    stand-ins — one bad row must never kill a corpus job."""
    bad = [
        (0, "image", bytearray(b"BMW sales figures for the quarter are up")),
        (1, "image", bytearray(b"BM" + b"\x00" * 60)),           # BM + junk header
        (2, "audio", bytearray(b"RIFF\x00\x00\x00\x00WAVEjunk")),  # no fmt/data
        (3, "video", bytearray(b"YUV4MPEG2 W16 H12 F25:1\nFRAME\ntrunc")),
        (4, "image", None),
    ]
    from pyspark.sql import types as T
    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ])
    media = spark.createDataFrame(bad, schema)
    feats = multimodal.media_features(media).orderBy("media_id").collect()
    assert len(feats) == 5 and all(len(r.feature) == 16 for r in feats)
    # scalar router agrees with the fake stand-in for each corrupt payload
    for mid, _k, p in bad[:4]:
        pb = bytes(p)
        assert (multimodal.media_feature_vector(pb) == multimodal.fake_features(pb)).all()
    rs = multimodal.resize_media(media, 8, 8).collect()
    assert len(rs) == 5
    fr = multimodal.frame_sample(media.filter("media_id = 3"), n_frames=2).collect()
    assert len(fr) == 2


def test_sniff_kind_bmp_validation(spark):
    """sniff_kind must not classify arbitrary 'BM…' bytes as bmp — only
    payloads with a known BITMAPINFOHEADER size byte at offset 14."""
    from pdf_ocr_api_spark.ops import codecs
    from pdf_ocr_api_spark.sources.binary import sniff_kind

    real = codecs.encode_bmp(np.zeros((4, 4, 3), np.uint8))
    rows = [
        (0, bytearray(real)),
        (1, bytearray(b"BMW sales figures, a text document")),
        (2, bytearray(b"RIFF\x00\x00\x00\x00WAVEdata")),
        (3, bytearray(b"YUV4MPEG2 W2 H2 F25:1\n")),
    ]
    df = spark.createDataFrame(rows, "i LONG, payload BINARY")
    got = {r.i: r.kind for r in df.select("i", sniff_kind(F.col("payload")).alias("kind")).collect()}
    assert got == {0: "bmp", 1: "unknown", 2: "riff", 3: "y4m"}


def test_brute_force_topk_batch_matches_per_query(emb):
    """One-scan batched ANN must equal per-query brute force for every
    query (modulo the shared rounded-cosine tie-break)."""
    df, _rows = emb
    queries = df.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    cand = df.filter(F.col("vec_id") >= 3)
    got = similarity.brute_force_topk_batch(cand, queries, k=5)
    grouped = {}
    for r in got.collect():
        grouped.setdefault(r.query_id, []).append((r.id, r.cosine))
    assert set(grouped) == {0, 1, 2}
    for qid in (0, 1, 2):
        qv = [float(x) for x in df.filter(F.col("vec_id") == qid).collect()[0].embedding]
        want = [(r.id, r.cosine) for r in similarity.brute_force_topk(cand, qv, k=5).collect()]
        assert grouped[qid] == want, (qid, grouped[qid], want)


def test_ivfpq_residual_encoding(near_dup_corpus, spark, tmp_path):
    """True-IVFADC residual mode: codes quantize v - centroid[list];
    recall@10 (with rerank) >= 0.8, and LUT-only ranking is at least as
    good as raw-vector PQ at the same code budget on this corpus. The
    persisted props table round-trips the scoring scheme."""
    df = near_dup_corpus
    q = [float(x) for x in df.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]]
    cand = df.filter(F.col("vec_id") != 0)
    brute = [r.id for r in similarity.brute_force_topk(cand, q, k=10).collect()]

    def recall(codes, cents, cbs, residual, rerank):
        got = {
            r.id
            for r in similarity.ivfpq_topk(
                codes.filter(F.col("id") != 0), cents, cbs, q, k=10, nprobe=4,
                emb=cand if rerank else None, residual=residual,
            ).collect()
        }
        return len(set(brute) & got) / 10

    codes_r, cents_r, cbs_r = similarity.ivfpq_index(df, n_lists=8, m=4, residual=True)
    codes_p, cents_p, cbs_p = similarity.ivfpq_index(df, n_lists=8, m=4, residual=False)

    assert recall(codes_r, cents_r, cbs_r, True, rerank=True) >= 0.8
    lut_res = recall(codes_r, cents_r, cbs_r, True, rerank=False)
    lut_raw = recall(codes_p, cents_p, cbs_p, False, rerank=False)
    assert lut_res >= lut_raw, (lut_res, lut_raw)

    # determinism across partitionings
    codes_r2, cents_r2, cbs_r2 = similarity.ivfpq_index(df.repartition(7), n_lists=8, m=4, residual=True)
    assert cents_r2 == cents_r and cbs_r2 == cbs_r
    a = codes_r.orderBy("id").toPandas()
    b = codes_r2.orderBy("id").toPandas()
    assert a.ivf_list.tolist() == b.ivf_list.tolist()
    assert a.codes.map(tuple).tolist() == b.codes.map(tuple).tolist()

    target = str(tmp_path / "ivfpq_res")
    similarity.save_ivfpq_index(spark, codes_r, cents_r, cbs_r, target, residual=True)
    codes3, cents3, cbs3, props = similarity.load_ivfpq_index(spark, target)
    assert props["residual"] is True and cents3 == cents_r and cbs3 == cbs_r


def test_with_lang_id_script_route(spark):
    """r5 wiring: script_route=True tags non-Latin-dominant rows
    'und-<script>' and leaves latin/'und'-script rows EXACTLY as the
    unrouted sweep (same banks, same argmax)."""
    rows = [
        (0, "the cat and the dog of the house are in the garden near the wall"),
        (1, "der hund ist nicht im haus und die katze"),
        (2, "привет мир это текст на кириллице и он довольно длинный"),
        (3, "你好世界这是一段中文文本没有空格"),
        (4, "مرحبا بالعالم هذا نص عربي طويل"),
        (5, "1234 ... !!! 555"),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    routed = {r.doc_id: r.lang for r in
              textstats.with_lang_id(df, "text", script_route=True).collect()}
    plain = {r.doc_id: r.lang for r in
             textstats.with_lang_id(df, "text").collect()}
    assert routed[2] == "und-cyrillic"
    assert routed[3] == "und-cjk"
    assert routed[4] == "und-arabic"
    for i in (0, 1, 5, 6):  # latin / unscripted rows: byte-identical
        assert routed[i] == plain[i], i
    assert routed[0] == "en" and routed[1] == "de"


def test_clean_corpus_script_routing(spark, depara):
    """clean_corpus gates a multilingual corpus through script routing:
    a langs allow-list can KEEP a CJK corpus by its script tag while the
    Latin banks still gate Latin text — Cyrillic (not listed) drops."""
    from pdf_ocr_api_spark.ops import corpus

    en = ("the quick brown fox jumps over the lazy dog and runs across the "
          "river bank to find the other animals in the quiet forest")
    cjk = "你好 世界 这是 一段 中文 文本 关于 大海 和 山脉 的 故事"
    cyr = "привет мир это длинный текст на кириллице о горах и море"
    rows = [
        ("c0", 0, "user", en, None),
        ("c0", 1, "user", cjk, None),
        ("c0", 2, "user", cyr, None),
    ]
    sdf = spark.createDataFrame(
        rows, "conv_id STRING, turn_idx INT, role STRING, text STRING, tool STRING"
    )
    out = corpus.clean_corpus(
        sdf, min_quality=0.0, langs=["en", "und-cjk"], min_tokens=3,
        depara=depara, parallelism=4,
    ).collect()
    kept = {(r.conv_id, r.turn_idx): r.lang for r in out}
    assert kept.get(("c0", 0)) == "en"
    assert kept.get(("c0", 1)) == "und-cjk"
    assert ("c0", 2) not in kept


def test_incremental_keep_sig_width_guard(spark):
    """r5 advice: a stored signature table built with a different
    num_hashes silently collapses band hashes (NULL-dropping concat_ws)
    — incremental_keep must refuse it loudly."""
    b1, b2 = _inc_corpus(spark)
    sigs_16 = dedup.minhash_signatures(b1, num_hashes=16)
    with pytest.raises(ValueError, match="num_hashes=16"):
        dedup.incremental_keep(b1, b2, num_hashes=32, bands=16, kept_sigs=sigs_16)


def test_sync_signatures_props_guard(spark, tmp_path):
    """r5 advice: sync_signatures persists num_hashes/k next to the
    index and refuses a mismatched re-sync; pre-props indexes (r4
    stores) are validated by observed signature width and stamped."""
    from pdf_ocr_api_spark.ops import corpus
    from pdf_ocr_api_spark.sources.io import read_table, table_exists

    rows = [("c0", i, f"some stored corpus turn number {i} with plenty of words", "en", 8, 0.9)
            for i in range(4)]
    ct = str(tmp_path / "corpus")
    spark.createDataFrame(
        rows, "conv_id STRING, turn_idx INT, clean_text STRING, lang STRING, n_tokens INT, quality_score DOUBLE"
    ).write.parquet(ct)
    st = str(tmp_path / "sigs")
    assert corpus.sync_signatures(spark, ct, st, num_hashes=32, k=3) == 4
    assert table_exists(spark, f"{st}_props")
    props = {r.key: r.value for r in read_table(spark, f"{st}_props").collect()}
    assert props == {"num_hashes": "32", "k": "3"}
    with pytest.raises(ValueError, match="num_hashes"):
        corpus.sync_signatures(spark, ct, st, num_hashes=16, k=3)
    with pytest.raises(ValueError, match="k: stored=3"):
        corpus.sync_signatures(spark, ct, st, num_hashes=32, k=5)
    # pre-props store (props dir removed): width probe still guards, and
    # a matching sync backfills the props stamp
    import shutil

    shutil.rmtree(f"{st}_props")
    with pytest.raises(ValueError, match="32-hash"):
        corpus.sync_signatures(spark, ct, st, num_hashes=16, k=3)
    assert corpus.sync_signatures(spark, ct, st, num_hashes=32, k=3) == 0
    assert table_exists(spark, f"{st}_props")


def test_exact_duplicates_truncated_column(spark):
    """r5 advice: truncation is visible IN-SCHEMA via the boolean
    'truncated' column, not only by size-vs-count convention."""
    rows = [(i, "same text for everyone") for i in range(10)] + [
        (100, "a different pair of text"), (101, "a different pair of text")]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    g = {r.dup_count: r for r in dedup.exact_duplicates(df, max_members=5).collect()}
    assert g[10].truncated and len(g[10].member_ids) == 5
    assert not g[2].truncated and len(g[2].member_ids) == 2
    unc = dedup.exact_duplicates(df, max_members=None).collect()
    assert all(not r.truncated for r in unc)


def _ref_png_filter(img, ftypes):
    """Delegates to the shared spec-reference filterer (tests/png_ref.py
    — one reference implementation, used by both this file and
    test_properties, so a spec correction cannot leave one stale)."""
    from .png_ref import ref_png_stream

    return ref_png_stream(img, ftypes, include_ancillary=True)


def test_png_roundtrip_and_filters():
    """r5 codec: PNG encode→decode round-trips RGB and RGBA exactly,
    and the decoder reverses every spec filter type (0-4) against an
    independent reference filterer."""
    from pdf_ocr_api_spark.ops import codecs

    rng = np.random.default_rng(7)
    for shape in [(12, 16, 3), (5, 3, 4), (1, 1, 3), (33, 7, 4)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        b = codecs.encode_png(img)
        assert codecs.sniff_codec(b) == "png"
        back = codecs.decode_png(b)
        assert back.shape == shape and (back == img).all()

    for ch in (3, 4):
        img = rng.integers(0, 256, (6, 8, ch), dtype=np.uint8)
        png = _ref_png_filter(img, [0, 1, 2, 3, 4, 4])
        assert (codecs.decode_png(png) == img).all()
    # gradient image: smooth data exercises nontrivial filter payoffs
    grad = np.arange(24 * 24 * 3, dtype=np.int64).reshape(24, 24, 3) % 256
    png = _ref_png_filter(grad.astype(np.uint8), [1, 2, 3, 4] * 6)
    assert (codecs.decode_png(png) == grad).all()


def test_png_reject_corrupt():
    """r5 codec: bad magic, truncated stream, CRC corruption, chunk-tag
    corruption and unsupported flavors all raise ValueError — and the
    feature router degrades to fake_features instead of raising."""
    from pdf_ocr_api_spark.ops import codecs

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (6, 8, 3), dtype=np.uint8)
    png = codecs.encode_png(img)
    bads = [
        b"\x89PNG\r\n\x1a\x00" + png[8:],   # wrong magic byte
        png[: len(png) - 12],               # IEND cut off
        png[:40],                           # mid-chunk truncation
        png.replace(b"IDAT", b"IDAt", 1),   # tag corruption → CRC fail
    ]
    crc = bytearray(png)
    crc[-5] ^= 0xFF                          # IEND CRC corruption
    bads.append(bytes(crc))
    for bad in bads:
        with pytest.raises(ValueError):
            codecs.decode_png(bad)
    # interlaced / paletted flavors refused loudly
    import struct as _s
    import zlib as _z

    def chunk(tag, body):
        return _s.pack(">I", len(body)) + tag + body + _s.pack(
            ">I", _z.crc32(tag + body) & 0xFFFFFFFF
        )

    for ihdr in (
        _s.pack(">IIBBBBB", 8, 6, 8, 2, 0, 0, 1),   # Adam7
        _s.pack(">IIBBBBB", 8, 6, 8, 3, 0, 0, 0),   # palette
        _s.pack(">IIBBBBB", 8, 6, 16, 2, 0, 0, 0),  # 16-bit
    ):
        bad = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(
            b"IDAT", _z.compress(b"\x00" * 10)
        ) + chunk(b"IEND", b"")
        with pytest.raises(ValueError):
            codecs.decode_png(bad)
    # router: corrupt PNG bytes degrade to the deterministic stand-in
    f = multimodal.media_feature_vector(png[:40])
    assert np.allclose(f, multimodal.fake_features(png[:40]))


def test_png_real_feature_path(spark):
    """r5: PNG payloads flow through the REAL decode path end-to-end —
    decode_image drops alpha to the (H, W, 3) feature contract, and the
    distributed media_features output equals local image_features."""
    from pdf_ocr_api_spark.ops import codecs

    rng = np.random.default_rng(11)
    rgb = rng.integers(0, 256, (9, 12, 3), dtype=np.uint8)
    rgba = rng.integers(0, 256, (9, 12, 4), dtype=np.uint8)
    assert multimodal.decode_image(codecs.encode_png(rgb)).shape == (9, 12, 3)
    assert (multimodal.decode_image(codecs.encode_png(rgba)) == rgba[:, :, :3]).all()

    rows = [(0, "image", bytearray(codecs.encode_png(rgb))),
            (1, "image", bytearray(codecs.encode_png(rgba)))]
    df = spark.createDataFrame(rows, "media_id LONG, kind STRING, payload BINARY")
    got = {r.media_id: np.array(r.feature, np.float32)
           for r in multimodal.media_features(df).collect()}
    assert np.allclose(got[0], multimodal.image_features(rgb), atol=1e-6)
    assert np.allclose(got[1], multimodal.image_features(rgba[:, :, :3]), atol=1e-6)


@pytest.mark.parametrize("residual", [True, False])
def test_ivfpq_append_matches_build(near_dup_corpus, spark, tmp_path, residual):
    """r5 incremental index maintenance: vectors appended to a persisted
    IVF×PQ index (existing centroids/codebooks, no refit) must carry
    EXACTLY the codes a build with those quantizers would have given
    them, land in the partitioned layout, and probe identically."""
    df = near_dup_corpus
    old = df.filter(F.col("vec_id") < 200)
    new = df.filter(F.col("vec_id") >= 200)

    # full-corpus build = ground truth codes for the new rows UNDER THE
    # OLD QUANTIZERS: fit both quantizers on the old rows only, then
    # encode everything with them (the shared fixed-quantizer encoder)
    codes_old, cents, cbs = similarity.ivfpq_index(old, n_lists=8, m=4, residual=residual)
    want_new = similarity._ivfpq_encode(
        new, cents, cbs, True, residual, "vec_id", "embedding"
    ).orderBy("id").collect()

    target = str(tmp_path / f"ivfpq_app_{int(residual)}")
    similarity.save_ivfpq_index(
        spark, codes_old, cents, cbs, target, residual=residual, emb=old
    )
    out = similarity.ivfpq_append(spark, target, new, batch="b1")
    assert out["appended"] == new.count()
    assert out["build_mean_dist"] is not None and out["drift_ratio"] is not None
    # same-distribution batch: assignment drift stays near the baseline
    assert 0.5 < out["drift_ratio"] < 1.5, out

    codes2, cents2, cbs2, props = similarity.load_ivfpq_index(spark, target)
    assert cents2 == cents and cbs2 == cbs and props["residual"] is residual
    got_new = codes2.filter(F.col("id") >= 200).orderBy("id").collect()
    assert [(r.id, r.ivf_list, list(r.codes)) for r in got_new] == [
        (r.id, r.ivf_list, list(r.codes)) for r in want_new
    ]
    # probing the appended index == probing a frame built with the same
    # quantizers over the union
    q = [float(x) for x in df.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]]
    union_codes = codes_old.unionByName(
        similarity._ivfpq_encode(new, cents, cbs, True, residual, "vec_id", "embedding")
    )
    a = [r.id for r in similarity.ivfpq_topk(
        codes2.filter(F.col("id") != 0), cents2, cbs2, q, k=10, nprobe=4,
        residual=residual).collect()]
    b = [r.id for r in similarity.ivfpq_topk(
        union_codes.filter(F.col("id") != 0), cents, cbs, q, k=10, nprobe=4,
        residual=residual).collect()]
    assert a == b

    # drift table accumulates one row per batch next to the build row
    from pdf_ocr_api_spark.sources.io import read_table

    drift = {r.batch: r for r in read_table(spark, f"{target}_drift").collect()}
    assert set(drift) == {"build", "b1"}
    assert drift["b1"].n_vectors == out["appended"]


def test_ivfpq_append_without_baseline(near_dup_corpus, spark, tmp_path):
    """Pre-r5 indexes saved without vectors have no drift baseline: the
    append still lands and records ITS row, but drift_ratio is None
    (unknown ≠ 1.0 — the operator must know the baseline is missing)."""
    df = near_dup_corpus
    old = df.filter(F.col("vec_id") < 200)
    codes_old, cents, cbs = similarity.ivfpq_index(old, n_lists=8, m=4)
    target = str(tmp_path / "ivfpq_nobase")
    similarity.save_ivfpq_index(spark, codes_old, cents, cbs, target)
    out = similarity.ivfpq_append(
        spark, target, df.filter(F.col("vec_id") >= 200), batch="b1"
    )
    assert out["appended"] > 0 and out["mean_dist"] > 0
    assert out["build_mean_dist"] is None and out["drift_ratio"] is None


def test_runner_show_runs(spark, tmp_path, capsys):
    """r5: --show-runs is the operator's one-call alert surface — JSON
    per-mode summary of the persisted runs table, with the
    dropped-bucket recall-loss totals and the alert bit."""
    import json as _json

    from pdf_ocr_api_spark import runner

    text = ("the quick brown fox jumps over the lazy dog and runs across the "
            "river bank to find the other animals in the quiet forest")
    schema = "conv_id STRING, turn_idx INT, role STRING, text STRING, tool STRING"
    b1 = spark.createDataFrame([("a0", 0, "user", text, None)], schema)
    in1 = str(tmp_path / "b1")
    b1.write.parquet(in1)
    root = str(tmp_path / "run")
    knobs = ["--min-quality", "0.3", "--min-tokens", "5", "--buckets", "4"]

    # no store yet → clean error, nonzero exit
    assert runner.main(["--show-runs", "--output", root]) == 1
    capsys.readouterr()

    assert runner.main(["--clean-corpus", "--input", in1, "--output", root] + knobs) == 0
    capsys.readouterr()
    assert runner.main(["--show-runs", "--output", root]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["modes"] and out["modes"][0]["mode"] == "clean_corpus"
    assert out["modes"][0]["runs"] == 1 and out["modes"][0]["rows_kept"] == 1
    assert out["dropped_buckets_total"] == 0 and out["recall_loss_alert"] is False


def test_jpeg_roundtrip_psnr():
    """r5 JPEG codec: encode→decode is faithful (PSNR-bounded — JPEG is
    lossy by design) across 4:4:4 / 4:2:0, restart intervals, grayscale
    and odd shapes; deterministic byte-for-byte."""
    from pdf_ocr_api_spark.ops import codecs

    def psnr(a, b):
        mse = ((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean()
        return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)

    x = np.linspace(0, 255, 64)[None, :] * np.ones((48, 1))
    img = np.stack([x, x[::-1] * 0.7 + 30, np.full((48, 64), 128.0)], axis=2).astype(np.uint8)

    for sub in ("444", "420", "422"):
        for ri in (0, 3):
            b = codecs.encode_jpeg(img, quality=90, subsample=sub, restart_interval=ri)
            assert codecs.sniff_codec(b) == "jpeg"
            back = codecs.decode_jpeg(b)
            assert back.shape == img.shape
            assert psnr(img, back) > 40, (sub, ri)
    # determinism
    assert codecs.encode_jpeg(img, 90) == codecs.encode_jpeg(img, 90)

    # grayscale replicates to 3 channels
    g = x.astype(np.uint8)
    backg = codecs.decode_jpeg(codecs.encode_jpeg(g, quality=90))
    assert backg.shape == (48, 64, 3)
    assert psnr(np.repeat(g[:, :, None], 3, 2), backg) > 40

    # odd shapes, noisy content, both layouts with restarts. 4:2:0 on
    # NOISE loses chroma by design (2×2 decimation), so its fidelity is
    # judged against the chroma-decimated reference, not the original.
    def decimated_ref(im):
        f = im.astype(np.float64)
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b
        h, w = y.shape
        out = []
        for p in (cb, cr):
            pp = np.pad(p, ((0, (-h) % 2), (0, (-w) % 2)), mode="edge")
            d = pp.reshape(pp.shape[0] // 2, 2, pp.shape[1] // 2, 2).mean(axis=(1, 3))
            out.append(np.repeat(np.repeat(d, 2, 0), 2, 1)[:h, :w])
        cb, cr = out
        return np.clip(np.stack(
            [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb], axis=2
        ), 0, 255)

    rng = np.random.default_rng(5)
    for shape in [(1, 1, 3), (7, 9, 3), (17, 23, 3), (16, 16, 3)]:
        im = rng.integers(0, 256, shape, dtype=np.uint8)
        for sub in ("444", "420"):
            back = codecs.decode_jpeg(codecs.encode_jpeg(im, 95, sub, 2))
            assert back.shape == shape
            ref = im if sub == "444" else decimated_ref(im)
            assert psnr(ref, back) > 25, (shape, sub)


def test_jpeg_reject_corrupt_and_unsupported():
    """r5 JPEG codec: progressive streams, truncation anywhere, and
    garbage all raise ValueError; the feature router degrades."""
    from pdf_ocr_api_spark.ops import codecs, multimodal

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    good = codecs.encode_jpeg(img, 90)

    # progressive: flip SOF0 (FFC0) to SOF2 (FFC2)
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError):
        codecs.decode_jpeg(prog)
    # truncations at several depths: header, mid-segment, mid-scan
    for cut in (2, 10, len(good) // 2, len(good) - 3):
        with pytest.raises(ValueError):
            codecs.decode_jpeg(good[:cut])
    with pytest.raises(ValueError):
        codecs.decode_jpeg(b"\x00\x01\x02")
    with pytest.raises(ValueError):
        codecs.decode_jpeg(b"\xff\xd8\xff\xd9")  # EOI, no image
    # router: corrupt JPEG-prefixed bytes → deterministic stand-in
    bad = good[: len(good) // 2]
    assert np.allclose(multimodal.media_feature_vector(bad), multimodal.fake_features(bad))


def test_jpeg_real_feature_path(spark):
    """r5: JPEG payloads flow through the REAL decode path in the
    distributed feature UDF, and the features approximate the source
    image's (JPEG is lossy: compare against the decoded image exactly,
    the original loosely)."""
    from pdf_ocr_api_spark.ops import codecs, multimodal

    x = np.linspace(0, 255, 32)[None, :] * np.ones((24, 1))
    img = np.stack([x, x * 0.5, x[::-1]], axis=2).astype(np.uint8)
    payload = codecs.encode_jpeg(img, quality=95)
    decoded = codecs.decode_jpeg(payload)

    df = spark.createDataFrame(
        [(0, "image", bytearray(payload))], "media_id LONG, kind STRING, payload BINARY"
    )
    got = np.array(multimodal.media_features(df).collect()[0].feature, np.float32)
    assert np.allclose(got, multimodal.image_features(decoded), atol=1e-6)
    assert np.allclose(got[:6], multimodal.image_features(img)[:6], atol=0.02)
    assert multimodal.decode_image(payload).shape == img.shape


def test_ivfpq_encode_matches_build_exactly(near_dup_corpus, spark):
    """r5 review: the shared fixed-quantizer encoder must reproduce the
    BUILD's own codes bit-for-bit on the build's input — including the
    raw path, whose list assignment must ride the same codegen
    expression as ivf_index (a numpy reimplementation can flip
    near-tie assignments)."""
    df = near_dup_corpus
    for residual in (True, False):
        codes, cents, cbs = similarity.ivfpq_index(df, n_lists=8, m=4, residual=residual)
        want = sorted((r.id, r.ivf_list, tuple(r.codes)) for r in codes.collect())
        got = sorted(
            (r.id, r.ivf_list, tuple(r.codes))
            for r in similarity._ivfpq_encode(
                df, cents, cbs, True, residual, "vec_id", "embedding"
            ).collect()
        )
        assert got == want, f"residual={residual}"


def test_ivfpq_append_empty_batch_and_normalize_props(near_dup_corpus, spark, tmp_path):
    """r5 review: an empty batch appends zero rows without crashing
    (drift_ratio None — no batch mean exists), and the index's
    normalize flag is persisted + honored by append (a mismatched
    normalize would silently emit divergent codes)."""
    df = near_dup_corpus
    old = df.filter(F.col("vec_id") < 200)

    # normalize=False build: props must round-trip and drive the append
    codes, cents, cbs = similarity.ivfpq_index(
        old, n_lists=8, m=4, residual=True, normalize=False
    )
    target = str(tmp_path / "ivfpq_nonorm")
    similarity.save_ivfpq_index(
        spark, codes, cents, cbs, target, residual=True, emb=old, normalize=False
    )
    _, _, _, props = similarity.load_ivfpq_index(spark, target)
    assert props["normalize"] is False and props["residual"] is True

    new = df.filter(F.col("vec_id") >= 200)
    similarity.ivfpq_append(spark, target, new, batch="b1")
    got = similarity.load_ivfpq_index(spark, target)[0].filter(F.col("id") >= 200)
    want = similarity._ivfpq_encode(
        new, cents, cbs, False, True, "vec_id", "embedding"
    )
    assert sorted((r.id, r.ivf_list, tuple(r.codes)) for r in got.collect()) == sorted(
        (r.id, r.ivf_list, tuple(r.codes)) for r in want.collect()
    )

    # empty batch: no crash, zero appended, drift_ratio None
    out = similarity.ivfpq_append(
        spark, target, new.filter(F.col("vec_id") < 0), batch="b2"
    )
    assert out["appended"] == 0 and out["drift_ratio"] is None


def test_jpeg_hostile_streams_raise_valueerror():
    """r5 review: sampling factor 0 (ZeroDivisionError bait) and
    implausible SOF dimensions (32 GiB allocation bait) must be
    ValueError — the router's only degrade path."""
    import struct as _s

    from pdf_ocr_api_spark.ops import codecs

    rng = np.random.default_rng(1)
    good = codecs.encode_jpeg(rng.integers(0, 256, (8, 8, 3), dtype=np.uint8), 90)

    # locate SOF0 and patch a component's sampling byte to h=1,v=0
    i = good.index(b"\xff\xc0")
    b = bytearray(good)
    b[i + 11] = 0x10  # first component hv byte (after len/prec/h/w/nc + id)
    with pytest.raises(ValueError):
        codecs.decode_jpeg(bytes(b))
    # implausible dimensions: patch SOF h/w to 65535x65535
    b = bytearray(good)
    _s.pack_into(">HH", b, i + 5, 65535, 65535)
    with pytest.raises(ValueError):
        codecs.decode_jpeg(bytes(b))


def test_png_hostile_streams_raise_valueerror():
    """r5 review: CRC-valid wrong-length IHDR (struct.error bait),
    implausible dimensions, and a DEFLATE bomb whose inflation exceeds
    the declared raster must all be ValueError, with the inflate
    BOUNDED (the bomb must not materialize)."""
    import struct as _s
    import zlib as _z

    from pdf_ocr_api_spark.ops import codecs

    def chunk(tag, body):
        return _s.pack(">I", len(body)) + tag + body + _s.pack(
            ">I", _z.crc32(tag + body) & 0xFFFFFFFF
        )

    magic = b"\x89PNG\r\n\x1a\n"
    # 12-byte IHDR with a valid CRC
    bad_ihdr = magic + chunk(b"IHDR", b"\x00" * 12) + chunk(b"IEND", b"")
    with pytest.raises(ValueError):
        codecs.decode_png(bad_ihdr)
    # implausible dimensions
    huge = _s.pack(">IIBBBBB", 1 << 16, 1 << 16, 8, 2, 0, 0, 0)
    with pytest.raises(ValueError):
        codecs.decode_png(
            magic + chunk(b"IHDR", huge) + chunk(b"IDAT", _z.compress(b"\x00" * 64))
            + chunk(b"IEND", b"")
        )
    # DEFLATE bomb: 2x2 image declared, megabytes of zeros compressed
    ihdr = _s.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    bomb = magic + chunk(b"IHDR", ihdr) + chunk(
        b"IDAT", _z.compress(b"\x00" * (8 << 20))
    ) + chunk(b"IEND", b"")
    with pytest.raises(ValueError):
        codecs.decode_png(bomb)


def _mk_box(typ, body):
    import struct as _s

    return _s.pack(">I", len(body) + 8) + typ + body


def _mk_mp4(timescale=1000, duration=7500, w=640, h=360, fourcc=b"avc1", v1=False):
    """Minimal ISO BMFF stream carrying exactly the boxes probe_mp4
    reads — the crafted ground truth the prober is judged against."""
    import struct as _s

    if v1:
        mvhd = b"\x01" + b"\x00" * 3 + b"\x00" * 16 + _s.pack(">IQ", timescale, duration) + b"\x00" * 80
        tkhd = b"\x01" + b"\x00" * 3 + b"\x00" * 84 + _s.pack(">II", w << 16, h << 16)
    else:
        mvhd = b"\x00" * 12 + _s.pack(">II", timescale, duration) + b"\x00" * 80
        tkhd = b"\x00" * 76 + _s.pack(">II", w << 16, h << 16)
    stsd = b"\x00" * 8 + _s.pack(">I", 16) + fourcc + b"\x00" * 8
    stbl = _mk_box(b"stsd", stsd)
    minf = _mk_box(b"stbl", stbl)
    mdia = _mk_box(b"minf", minf)
    trak = _mk_box(b"tkhd", tkhd) + _mk_box(b"mdia", mdia)
    moov = _mk_box(b"mvhd", mvhd) + _mk_box(b"trak", trak)
    return (
        _mk_box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
        + _mk_box(b"moov", moov)
        + _mk_box(b"mdat", b"\x00" * 32)
    )


def _mk_mp3(n_frames=38, id3=False):
    """MPEG-1 Layer III 128 kbps 44.1 kHz CBR frames (417/418 bytes with
    padding alternating off) — 1152 samples each."""
    frames = bytearray()
    if id3:
        frames += b"ID3" + b"\x04\x00\x00" + b"\x00\x00\x00\x0a" + b"\x00" * 10
    for _ in range(n_frames):
        hdr = bytes([0xFF, 0xFB, 0x90, 0x00])  # V1 L3 128k 44100 no-pad stereo
        frames += hdr + b"\x00" * (417 - 4)
    return bytes(frames)


def test_probe_mp4_and_mp3():
    """r5: container/frame-header metadata probing WITHOUT decode —
    MP4 box walk (v0 + v1 headers) and MP3 frame walk (exact VBR-safe
    duration) against crafted ground truth."""
    from pdf_ocr_api_spark.ops import mediameta

    for v1 in (False, True):
        p = mediameta.probe_mp4(_mk_mp4(timescale=1000, duration=7500, v1=v1))
        assert p["duration_ms"] == 7500 and (p["width"], p["height"]) == (640, 360)
        assert p["n_tracks"] == 1 and p["codecs"] == ["avc1"]

    m = mediameta.probe_mp3(_mk_mp3(38))
    assert m["sample_rate"] == 44100 and m["layer"] == 3 and m["n_frames"] == 38
    assert m["duration_ms"] == int(38 * 1152 * 1000 / 44100)
    assert m["bitrate_kbps"] == 128
    # ID3v2 prefix skipped
    m2 = mediameta.probe_mp3(_mk_mp3(10, id3=True))
    assert m2["n_frames"] == 10

    # malformed: truncated box, lost sync, empty
    with pytest.raises(ValueError):
        mediameta.probe_mp4(_mk_mp4()[:40])
    with pytest.raises(ValueError):
        mediameta.probe_mp3(_mk_mp3(3)[:-100] + b"\x12\x34")
    with pytest.raises(ValueError):
        mediameta.probe_media(b"")


def test_media_metadata_distributed(spark):
    """r5: media_metadata fills the MEDIA_SCHEMA meta fields for ALL
    nine formats in one shuffle-free mapInPandas pass; unknown bytes
    degrade to nulls."""
    from pdf_ocr_api_spark.ops import codecs, mediameta, multimodal

    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (12, 16, 3), dtype=np.uint8)
    pcm = (np.sin(np.linspace(0, 440 * 2 * np.pi, 8000)) * 20000).astype(np.int16)
    frames = rng.integers(0, 256, (10, 16, 16), dtype=np.uint8)
    payloads = {
        0: ("image", codecs.encode_bmp(img)),
        1: ("image", codecs.encode_ppm(img)),
        2: ("image", codecs.encode_png(img)),
        3: ("image", codecs.encode_jpeg(img, 90)),
        4: ("audio", codecs.encode_wav(pcm, 16000)),
        5: ("audio", codecs.encode_au(pcm, 8000)),
        6: ("video", codecs.encode_y4m(frames, fps=5)),
        7: ("video", _mk_mp4(timescale=600, duration=1800)),
        8: ("audio", _mk_mp3(19)),
        9: ("unknown", b"\x00\x01 not media"),
    }
    df = spark.createDataFrame(
        [(i, k, bytearray(p)) for i, (k, p) in payloads.items()],
        "media_id LONG, kind STRING, payload BINARY",
    )
    got = {r.media_id: r for r in multimodal.media_metadata(df).collect()}
    for i in (0, 1, 2, 3):
        assert (got[i].width, got[i].height) == (16, 12), i
        assert got[i].mime.startswith("image/")
    assert got[4].duration_ms == 500 and got[4].mime == "audio/wav"
    assert got[5].duration_ms == 1000 and got[5].mime == "audio/basic"
    assert (got[6].width, got[6].height) == (16, 16) and got[6].duration_ms == 2000
    assert got[7].duration_ms == 3000 and got[7].mime == "video/mp4"
    assert got[8].duration_ms == int(19 * 1152 * 1000 / 44100)
    assert got[9].mime is None and got[9].width is None
    # local probe agrees with the distributed pass
    local = mediameta.probe_media(payloads[7][1])
    assert local["duration_ms"] == got[7].duration_ms


def test_probe_hardening_review_fixes(spark):
    """r5 review batch 2: truncated container bodies are ValueError (not
    struct.error/IndexError), unknown-duration sentinels are None, ID3v2.4
    footers are skipped, JPEG fill bytes tolerated, mixed-samplerate MP3
    durations correct, Y4M probed without materializing frames, and
    out-of-schema header values become nulls instead of killing the UDF."""
    import struct as _s

    from pdf_ocr_api_spark.ops import codecs, mediameta, multimodal

    # truncated tkhd body inside a valid box structure → ValueError
    short_tkhd = _mk_box(b"tkhd", b"\x00" * 52)
    moov = _mk_box(b"mvhd", b"\x00" * 12 + _s.pack(">II", 1000, 5000) + b"\x00" * 80)
    moov += _mk_box(b"trak", short_tkhd)
    bad = _mk_box(b"ftyp", b"isom\x00\x00\x02\x00") + _mk_box(b"moov", moov)
    with pytest.raises(ValueError):
        mediameta.probe_mp4(bad)
    with pytest.raises(ValueError):
        mediameta.probe_media(bad)
    # empty mvhd body → ValueError, not IndexError
    with pytest.raises(ValueError):
        mediameta.probe_mp4(
            _mk_box(b"ftyp", b"isom\x00\x00\x02\x00")
            + _mk_box(b"moov", _mk_box(b"mvhd", b""))
        )

    # mvhd all-ones duration = "unknown" sentinel → None
    mvhd_unk = b"\x00" * 12 + _s.pack(">II", 600, 0xFFFFFFFF) + b"\x00" * 80
    p = mediameta.probe_mp4(
        _mk_box(b"ftyp", b"isom\x00\x00\x02\x00") + _mk_box(b"moov", _mk_box(b"mvhd", mvhd_unk))
    )
    assert p["duration_ms"] is None

    # ID3v2.4 footer flag: 10 extra bytes before the first frame
    frames = _mk_mp3(5)
    tagged = b"ID3" + b"\x04\x00\x10" + b"\x00\x00\x00\x0a" + b"\x00" * 20 + frames
    assert mediameta.probe_mp3(tagged)["n_frames"] == 5

    # mixed sample rates: 22.05k MPEG2 frames + 44.1k MPEG1 frames
    # V2 L3 80kbps 22050Hz: flen = 72*80000//22050 = 261, 576 samples
    f2 = bytes([0xFF, 0xF3, 0x90, 0x00]) + b"\x00" * (261 - 4)
    m2 = mediameta.probe_mp3(f2 * 4)
    mixed = f2 * 4 + _mk_mp3(6)
    m1 = mediameta.probe_mp3(_mk_mp3(6))
    got = mediameta.probe_mp3(mixed)
    # ±1 ms: the parts are floored independently of the whole
    assert abs(got["duration_ms"] - (m2["duration_ms"] + m1["duration_ms"])) <= 1

    # JPEG fill bytes before a marker still probe
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (8, 10, 3), dtype=np.uint8)
    good = codecs.encode_jpeg(img, 90)
    i = good.index(b"\xff\xc0")
    filled = good[:i] + b"\xff" + good[i:]  # extra 0xFF fill byte
    m = mediameta.probe_media(filled)
    assert (m["width"], m["height"]) == (10, 8)

    # Y4M walk equals the decoder's frame count without materializing
    y4m = codecs.encode_y4m(rng.integers(0, 256, (7, 12, 12), dtype=np.uint8), fps=5)
    w, h, fps, n = mediameta._y4m_meta(y4m)
    assert (w, h, fps, n) == (12, 12, 5, 7)
    assert mediameta.probe_media(y4m)["duration_ms"] == int(7 * 1000 / 5)

    # hostile header values become NULLs in the distributed pass
    hostile_png = bytearray(codecs.encode_png(img))
    _s.pack_into(">I", hostile_png, 16, 1 << 31)  # width = 2^31 in IHDR
    df = spark.createDataFrame(
        [(0, "image", bytes(hostile_png))], "media_id LONG, kind STRING, payload BINARY"
    )
    row = multimodal.media_metadata(df).collect()[0]
    assert row.width is None


# ---------------------------------------------------------------------------
# decontamination (r5)
# ---------------------------------------------------------------------------


def test_contamination_known_overlap(spark):
    """Planted 3-gram overlaps: an exact probe copy scores ratio 1.0, a
    doc sharing exactly one trigram scores 1/n_ngrams, a disjoint doc is
    absent from the report."""
    from pdf_ocr_api_spark.ops import decontam

    probes = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "doc_id LONG, text STRING"
    )
    corpus = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon"),  # identical → ratio 1.0
            (1, "zero one alpha beta gamma nine eight"),  # shares trigrams
            (2, "totally disjoint words everywhere here"),  # no overlap
        ],
        "doc_id LONG, text STRING",
    )
    got = {
        r["doc_id"]: r
        for r in decontam.contamination(corpus, probes, n=3).collect()
    }
    assert set(got) == {0, 1}
    assert got[0]["n_hits"] == got[0]["n_ngrams"] == 3
    assert got[0]["contamination_ratio"] == 1.0
    # doc 1 has 5 distinct trigrams; exactly one ('alpha beta gamma') is
    # in the probe set
    assert got[1]["n_hits"] == 1 and got[1]["n_ngrams"] == 5
    assert got[1]["contamination_ratio"] == round(1 / 5, 6)


def test_contamination_hashed_equals_string(docs, spark):
    """The production xxhash64 join and the oracle-portable string join
    flag identical (doc_id, n_hits, n_ngrams) rows."""
    from pdf_ocr_api_spark.ops import decontam

    probes = docs.filter(F.col("doc_id") % 3 == 0)
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    key = lambda rows: sorted((r["doc_id"], r["n_hits"], r["n_ngrams"]) for r in rows)
    s = decontam.contamination(corpus, probes, n=2, hashed=False).collect()
    h = decontam.contamination(corpus, probes, n=2, hashed=True).collect()
    assert key(s) == key(h) and len(s) > 0


def test_decontaminate_policies(spark):
    """Strict policy (max_ratio=0) drops any overlap; a loose ratio
    threshold keeps lightly-contaminated docs; max_hits caps absolute
    overlap regardless of ratio."""
    from pdf_ocr_api_spark.ops import decontam

    probes = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "doc_id LONG, text STRING"
    )
    corpus = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon"),  # ratio 1.0
            (1, "zero one alpha beta gamma nine eight two six five"),  # ratio 1/8
            (2, "totally disjoint words everywhere here"),  # clean
        ],
        "doc_id LONG, text STRING",
    )
    strict = decontam.decontaminate(corpus, probes, n=3, max_ratio=0.0)
    assert sorted(r["doc_id"] for r in strict.collect()) == [2]
    loose = decontam.decontaminate(corpus, probes, n=3, max_ratio=0.5)
    assert sorted(r["doc_id"] for r in loose.collect()) == [1, 2]
    capped = decontam.decontaminate(corpus, probes, n=3, max_ratio=1.0, max_hits=2)
    assert sorted(r["doc_id"] for r in capped.collect()) == [1, 2]


def test_contamination_broadcast_plan(docs):
    """Scale shape: the probe join must be a broadcast hash join (the
    corpus side never shuffles for the probe), with no nested-loop
    fallback anywhere in the plan."""
    from pdf_ocr_api_spark.ops import decontam
    from pdf_ocr_api_spark.plans import inspect as PI

    probes = docs.filter(F.col("doc_id") % 3 == 0)
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    out = decontam.contamination(corpus, probes, n=2, hashed=True)
    plan = PI.executed_plan(out)
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# one-pass text profile (r5 consolidation)
# ---------------------------------------------------------------------------


def test_text_profile_matches_components(docs):
    """text_profile's shared columns must equal the standalone
    quality_features / token-count operators row-for-row (the entry
    consolidation must not drift from the oracled components)."""
    prof = {r["id"]: r for r in textstats.text_profile(docs).collect()}
    qual = {r["id"]: r for r in textstats.quality_features(docs).collect()}
    toks = {
        r["doc_id"]: r
        for r in docs.select(
            "doc_id",
            textstats.token_count(F.col("text")).alias("ws"),
            textstats.bpe_ish_token_count(F.col("text")).alias("bpe"),
        ).collect()
    }
    assert set(prof) == set(qual)
    for i, p in prof.items():
        q = qual[i]
        for c in ("n_chars", "n_tokens", "punct_ratio", "stop_ratio", "digit_ratio", "quality_score"):
            assert p[c] == q[c], (i, c, p[c], q[c])
        assert p["n_tokens"] == toks[i]["ws"]
        assert p["bpe_tokens"] == toks[i]["bpe"]
        assert 0.0 <= p["dup_word_frac"] <= 1.0
        assert 0.0 <= p["dup_2gram_frac"] <= 1.0


def test_text_profile_repetition_signals(spark):
    """Gopher-style repetition: 'spam spam spam spam' has dup_word_frac
    3/4 and dup_2gram_frac 2/3; a no-repeat doc scores 0 on both; empty
    and single-token docs are well-defined."""
    df = spark.createDataFrame(
        [
            (0, "spam spam spam spam"),
            (1, "all words here are unique tokens"),
            (2, ""),
            (3, "solo"),
        ],
        "doc_id LONG, text STRING",
    )
    got = {r["id"]: r for r in textstats.text_profile(df).collect()}
    assert got[0]["dup_word_frac"] == 0.75
    assert got[0]["dup_2gram_frac"] == round(2 / 3, 6)
    assert got[1]["dup_word_frac"] == 0.0 and got[1]["dup_2gram_frac"] == 0.0
    assert got[2]["n_tokens"] == 0 and got[2]["dup_word_frac"] == 0.0
    assert got[3]["n_tokens"] == 1 and got[3]["dup_2gram_frac"] == 0.0


# ---------------------------------------------------------------------------
# MP4 sample demux (r5): container-layer frame extraction without a codec
# ---------------------------------------------------------------------------


def _mp4_fixture():
    from pdf_ocr_api_spark.ops import mediameta

    rng = np.random.default_rng(42)
    vid = [rng.integers(0, 256, size=20 + 7 * i, dtype=np.uint8).tobytes() for i in range(9)]
    aud = [rng.integers(0, 256, size=32, dtype=np.uint8).tobytes() for _ in range(6)]
    tracks = [
        {
            "handler": "vide", "codec": "avc1", "timescale": 30,
            "samples": vid, "deltas": [1] * 9,
            # varying samples-per-chunk exercises the stsc run expansion
            "samples_per_chunk": [2, 3, 3, 1],
            "width": 64, "height": 48,
        },
        {
            "handler": "soun", "codec": "mp4a", "timescale": 8000,
            "samples": aud, "deltas": [1024] * 6,
            "samples_per_chunk": [4, 2],
        },
    ]
    return mediameta.mux_mp4(tracks), vid, aud


def test_mp4_mux_demux_roundtrip():
    """Demuxed samples must be byte-identical to what was muxed, with
    stts decode times and track metadata intact — across multi-chunk
    stsc runs and both uniform and per-sample stsz forms."""
    from pdf_ocr_api_spark.ops import mediameta

    payload, vid, aud = _mp4_fixture()
    tracks = mediameta.demux_mp4(payload)
    assert [t["handler"] for t in tracks] == ["vide", "soun"]
    v, a = tracks
    assert v["codec"] == "avc1" and a["codec"] == "mp4a"
    assert [s["data"] for s in v["samples"]] == vid
    assert [s["data"] for s in a["samples"]] == aud
    assert [s["time"] for s in v["samples"]] == list(range(9))
    assert [s["time"] for s in a["samples"]] == [1024 * i for i in range(6)]
    assert v["samples"][3]["time_ms"] == 3 * 1000 // 30
    # container probe agrees with the mux parameters
    p = mediameta.probe_mp4(payload)
    assert (p["width"], p["height"]) == (64, 48)
    assert p["n_tracks"] == 2 and p["codecs"] == ["avc1", "mp4a"]
    assert p["duration_ms"] == 6 * 1024 * 1000 // 8000  # audio is the longest track


def test_mp4_demux_hostile_streams():
    """Truncations and byte flips either demux consistently or raise
    ValueError — never any other exception (the mapInPandas routers
    catch only ValueError; anything else kills a corpus job)."""
    from pdf_ocr_api_spark.ops import mediameta

    payload, _, _ = _mp4_fixture()
    for cut in range(0, len(payload), 37):
        try:
            mediameta.demux_mp4(payload[:cut])
        except ValueError:
            pass
    rng = np.random.default_rng(7)
    buf = bytearray(payload)
    for _ in range(300):
        i = int(rng.integers(0, len(buf)))
        old = buf[i]
        buf[i] = int(rng.integers(0, 256))
        try:
            tracks = mediameta.demux_mp4(bytes(buf))
            for t in tracks:
                for s in t["samples"]:
                    assert len(s["data"]) == s["size"]
        except ValueError:
            pass
        buf[i] = old


def test_byte_features_shape_and_determinism():
    from pdf_ocr_api_spark.ops import multimodal

    f1 = multimodal.byte_features(b"abcabc\x00\xff")
    f2 = multimodal.byte_features(b"abcabc\x00\xff")
    assert f1.shape == (16,) and f1.dtype == np.float32
    assert np.array_equal(f1, f2)
    assert f1[0] == 8.0  # size
    e = multimodal.byte_features(b"")
    assert e.shape == (16,)
    # constant byte → zero entropy; uniform-ish bytes → high entropy
    assert multimodal.byte_features(b"\x41" * 100)[3] == 0.0
    assert multimodal.byte_features(bytes(range(256)))[3] == 1.0


def test_frame_sample_mp4_real(spark):
    """frame_sample on an MP4 row returns byte_features of the ACTUAL
    demuxed video samples at the evenly-spaced indices — proving the
    container path is real, not the fake fallback."""
    from pdf_ocr_api_spark.ops import mediameta, multimodal

    payload, vid, _ = _mp4_fixture()
    df = spark.createDataFrame(
        [(1, "video", bytearray(payload))], "media_id LONG, kind STRING, payload BINARY"
    )
    rows = multimodal.frame_sample(df, n_frames=4).orderBy("frame_idx").collect()
    assert len(rows) == 4
    idx = np.linspace(0, len(vid) - 1, 4).astype(int)
    for r, j in zip(rows, idx):
        expect = multimodal.byte_features(vid[j])
        assert np.allclose(np.array(r["frame"], np.float32), expect)
    # corrupt MP4 degrades to the deterministic fake path, job survives
    bad = payload[:40]
    df2 = spark.createDataFrame(
        [(2, "video", bytearray(bad))], "media_id LONG, kind STRING, payload BINARY"
    )
    rows2 = multimodal.frame_sample(df2, n_frames=3).collect()
    assert len(rows2) == 3


# ---------------------------------------------------------------------------
# GIF codec (r5): LZW is an algorithm, not a codec library
# ---------------------------------------------------------------------------


def test_gif_roundtrip_lossless():
    """GIF is lossless for palette-bounded images: encode→decode must be
    byte-exact — across gradients, few-color logos, single pixels, and
    an image large enough to overflow the 4096-entry LZW table (forcing
    the mid-stream CLEAR/reset path)."""
    from pdf_ocr_api_spark.ops import codecs

    rng = np.random.default_rng(5)
    cases = []
    # 2-color checkerboard
    cb = np.indices((9, 13)).sum(axis=0) % 2
    cases.append(np.stack([cb * 255] * 3, axis=2).astype(np.uint8))
    # 256-gray gradient
    g = np.linspace(0, 255, 64, dtype=np.uint8)[None, :].repeat(48, 0)
    cases.append(np.repeat(g[:, :, None], 3, axis=2))
    # random 200-color noise, large enough to overflow the code table
    pal = rng.integers(0, 256, (200, 3), dtype=np.uint8)
    idx = rng.integers(0, 200, (120, 160))
    cases.append(pal[idx])
    # single pixel
    cases.append(np.array([[[7, 80, 201]]], np.uint8))
    for rgb in cases:
        payload = codecs.encode_gif(rgb)
        assert codecs.sniff_codec(payload) == "gif"
        out = codecs.decode_gif(payload)
        assert out.shape == rgb.shape
        assert np.array_equal(out, rgb)


def test_gif_reject_invalid():
    from pdf_ocr_api_spark.ops import codecs

    rng = np.random.default_rng(11)
    # >256 distinct colors cannot be a GIF without quantization
    many = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    assert len(np.unique(many.reshape(-1, 3), axis=0)) > 256
    with pytest.raises(ValueError):
        codecs.encode_gif(many)
    with pytest.raises(ValueError):
        codecs.decode_gif(b"GIF89a")  # truncated header
    with pytest.raises(ValueError):
        codecs.decode_gif(b"NOTGIF" + b"\x00" * 20)
    # interlace flag set → explicit unsupported
    good = codecs.encode_gif(np.zeros((4, 4, 3), np.uint8))
    desc = good.index(b"\x2c")
    bad = bytearray(good)
    bad[desc + 9] |= 0x40
    with pytest.raises(ValueError):
        codecs.decode_gif(bytes(bad))


def test_gif_hostile_streams_raise_valueerror():
    """Truncations and byte flips must decode consistently or raise
    ValueError — never any other exception and never an allocation
    bigger than the declared raster (LZW-bomb guard)."""
    from pdf_ocr_api_spark.ops import codecs

    rng = np.random.default_rng(3)
    pal = rng.integers(0, 256, (32, 3), dtype=np.uint8)
    payload = codecs.encode_gif(pal[rng.integers(0, 32, (24, 31))])
    for cut in range(0, len(payload), 11):
        try:
            codecs.decode_gif(payload[:cut])
        except ValueError:
            pass
    buf = bytearray(payload)
    for _ in range(600):
        i = int(rng.integers(0, len(buf)))
        old = buf[i]
        buf[i] = int(rng.integers(0, 256))
        try:
            out = codecs.decode_gif(bytes(buf))
            assert out.ndim == 3 and out.shape[2] == 3
        except ValueError:
            pass
        buf[i] = old


def test_gif_feature_and_probe_paths(spark):
    """GIF payloads ride the REAL decode path end-to-end: sniff →
    decode_gif → image_features (not the fake fallback), and the
    metadata probe reads dimensions from the logical-screen descriptor
    alone."""
    from pdf_ocr_api_spark.ops import codecs, mediameta, multimodal

    rng = np.random.default_rng(21)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    rgb = pal[rng.integers(0, 16, (20, 28))]
    payload = codecs.encode_gif(rgb)
    feat = multimodal.media_feature_vector(payload)
    assert np.allclose(feat, multimodal.image_features(rgb))
    assert not np.allclose(feat, multimodal.fake_features(payload))
    meta = mediameta.probe_media(payload)
    assert meta == {"mime": "image/gif", "width": 28, "height": 20, "duration_ms": None}
    # distributed: media_metadata fills the GIF row for real
    df = spark.createDataFrame(
        [(1, "image", bytearray(payload))], "media_id LONG, kind STRING, payload BINARY"
    )
    row = multimodal.media_metadata(df).collect()[0]
    assert (row["mime"], row["width"], row["height"]) == ("image/gif", 28, 20)


# ---------------------------------------------------------------------------
# PII scrubbing + corpus wiring (r5)
# ---------------------------------------------------------------------------


def test_scrub_pii_ground_truths(spark):
    """Each category redacts with its typed tag; structured ids that are
    NOT PII (plain digit runs, versions) survive; chain order keeps the
    card pattern from being eaten as two phone halves."""
    cases = [
        ("contact me at a.user+tag@mail-host.com today", "contact me at <EMAIL> today"),
        ("cpf 123.456.789-01 on file", "cpf <CPF> on file"),
        ("card 4111 1111 1111 1111 declined", "card <CARD> declined"),
        ("host 10.0.255.1 unreachable", "host <IP> unreachable"),
        ("call +55 11 91234-5678 now", "call <PHONE> now"),
        ("call (11) 91234-5678 now", "call <PHONE> now"),
        ("protocol 2023123456789 unchanged", "protocol 2023123456789 unchanged"),
        ("version 1.2.3 released", "version 1.2.3 released"),
        ("", ""),
        (None, ""),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(cases)], "i LONG, text STRING"
    )
    got = {r["i"]: r["out"] for r in df.select("i", textstats.scrub_pii(F.col("text")).alias("out")).collect()}
    for i, (_t, want) in enumerate(cases):
        assert got[i] == want, (i, cases[i][0], got[i])


def test_pii_counts_no_double_count(spark):
    """pii_counts categories are disjoint: an email's digits never also
    count as a phone; totals match what scrub_pii redacts."""
    text = "mail a@b.co or b@c.org, cpf 123.456.789-01, call (11) 91234-5678"
    df = spark.createDataFrame([(text,)], "text STRING")
    row = df.select(textstats.pii_counts(F.col("text")).alias("c")).collect()[0]["c"]
    assert row["email"] == 2 and row["cpf"] == 1 and row["phone"] == 1
    assert row["card"] == 0 and row["ipv4"] == 0


def test_clean_corpus_scrub_and_decontam(spark, depara):
    """clean_corpus with scrub_pii redacts emails in the kept text; with
    decontam_probes, turns overlapping the benchmark probe are dropped
    while clean turns survive."""
    from pdf_ocr_api_spark.ops import corpus

    leaky = ("please send the signed contract to maria.silva@example.com before the "
             "end of the week so the team can begin the review process on time")
    clean = ("the cat and the dog of the house are in the garden near the "
             "old stone wall where the birds sing in the morning light")
    rows = [
        ("c0", 0, "user", leaky, None),
        ("c1", 0, "user", clean, None),
    ]
    sdf = spark.createDataFrame(
        rows, "conv_id STRING, turn_idx INT, role STRING, text STRING, tool STRING"
    )
    out = corpus.clean_corpus(
        sdf, min_quality=0.3, min_tokens=3, depara=depara, parallelism=4, scrub_pii=True
    ).collect()
    texts = {r.conv_id: r.clean_text for r in out}
    assert "<EMAIL>" in texts["c0"] and "example.com" not in texts["c0"]

    probes = spark.createDataFrame([(0, clean)], "doc_id LONG, text STRING")
    out2 = corpus.clean_corpus(
        sdf, min_quality=0.3, min_tokens=3, depara=depara, parallelism=4,
        decontam_probes=probes, decontam_n=3,
    ).collect()
    assert sorted(r.conv_id for r in out2) == ["c0"]
