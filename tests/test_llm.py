"""LLM-operator tests beyond the oracle: LSH recall vs the exact
inverted-index pairs, MinHash determinism, ANN-vs-brute-force agreement,
and the multimodal mapInPandas decode path.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from okera_trino_spark.llm.dedup import (
    _embed_planes,
    embed_all_pairs,
    embed_near_dups,
    lsh_candidate_pairs,
    minhash_signatures,
)
from okera_trino_spark.llm.multimodal import _decode_one, decode_media, make_media_frame
from okera_trino_spark.registry import load_all_queries
from okera_trino_spark.sources.catalog import load_table

SPECS = load_all_queries()


def test_lsh_recall_matches_exact_pairs(spark, sf_dir):
    """Verified LSH pairs must equal the exact shingle-index pairs —
    at fixture scale the planted near-dups are far above threshold, so
    banding (8x4 over 32 hashes) should not lose any."""
    exact = {
        (r.doc_a, r.doc_b)
        for r in SPECS["q_llm_dedup_ngram"].fn(spark, sf_dir).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b)
        for r in SPECS["q_llm_dedup_near"].fn(spark, sf_dir).collect()
    }
    assert lsh == exact


def test_verify_prune_high_dup_corpus_no_forced_broadcast(spark):
    """r12-verdict contract on the verify-prune (llm/dedup.py): the
    candidate-doc semi-join must carry NO broadcast hint, because on a
    high-duplication web corpus (30-70% near-dup is the CCNet/
    RefinedWeb regime) the candidate set is corpus-sized and a forced
    broadcast is a driver OOM. Two assertions: (a) with broadcast
    joins fully DISABLED (both thresholds -1 — a forced hint would
    still broadcast, so a regression re-adding the hint fails the plan
    check), the pruned-index join plans as a shuffle semi-join with no
    BroadcastExchange; (b) the full pipeline completes broadcast-free
    on a >=50%-near-dup synthetic corpus and returns exactly the
    planted pairs."""
    from okera_trino_spark.llm.dedup import (
        _prune_index_to_candidates,
        minhash_verified_pairs,
        shingle_index,
    )

    rows, did = [], 0
    for i in range(25):  # 50 near-dup docs (>= 50% of the corpus)
        base = " ".join(f"tok{i}w{j}" for j in range(12))
        rows.append((did, base))
        rows.append((did + 1, base + f" extra{i}"))
        did += 2
    for i in range(20):  # 20 unique docs
        rows.append((did, " ".join(f"uniq{i}x{j}" for j in range(12))))
        did += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    saved = {
        k: spark.conf.get(k, None)
        for k in ("spark.sql.autoBroadcastJoinThreshold",
                  "spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        # (a) plan shape of the prune join itself
        sh = shingle_index(docs, 3)
        cand = docs.select("doc_id").limit(30)
        pruned = _prune_index_to_candidates(sh, cand)
        pruned.collect()
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastExchange" not in plan, plan
        assert "LeftSemi" in plan, plan
        # (b) end-to-end on the high-dup corpus, broadcast-free
        got = {(r.doc_a, r.doc_b)
               for r in minhash_verified_pairs(docs).collect()}
        assert got == {(2 * i, 2 * i + 1) for i in range(25)}
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_embed_dedup_precision_and_fixture_recall(spark):
    """Banded-LSH embed dedup vs the brute-force threshold join at
    sf0.1 (the only fixture with qualifying pairs): precision is 100% by
    construction (exact re-score); recall is 100% on this fixture by
    plane-seed choice — both asserted, so a fixture regen that breaks
    recall fails HERE rather than at the driver."""
    import os

    from tests.conftest import SF_DIR
    sf = os.path.join(os.path.dirname(SF_DIR.rstrip(os.sep)), "sf0.1")
    if not os.path.isdir(sf):
        pytest.skip(f"sf0.1 fixture not present under {os.path.dirname(sf)}")
    e = load_table(spark, sf, "embeddings")
    brute = {(r.vec_a, r.vec_b): r.cos_sim for r in embed_all_pairs(e).collect()}
    lsh = {(r.vec_a, r.vec_b): r.cos_sim for r in embed_near_dups(e).collect()}
    assert set(lsh) == set(brute)  # 100% precision AND recall here
    for k, v in lsh.items():
        assert abs(v - brute[k]) < 1e-9


def test_embed_dedup_recalls_planted_near_dups(spark, sf_dir):
    """The property banded LSH actually guarantees: true near-dups
    (cos ≥ ~0.98) collide in some band with overwhelming probability.
    Plant perturbed copies of 20 fixture vectors and require 100%
    recall of the planted pairs."""
    import numpy as np
    e = load_table(spark, sf_dir, "embeddings")
    base = e.orderBy("vec_id").limit(20).collect()
    rng = np.random.default_rng(0)
    planted = []
    for r in base:
        v = np.asarray(r.embedding, dtype=float)
        noise = rng.standard_normal(v.shape) * 0.02 * np.linalg.norm(v) / np.sqrt(len(v))
        planted.append((int(r.vec_id) + 1_000_000, [float(x) for x in v + noise], 0))
    aug = e.select("vec_id", "embedding", "label").unionByName(
        spark.createDataFrame(planted, schema="vec_id long, embedding array<float>, label int")
    )
    got = {(r.vec_a, r.vec_b) for r in embed_near_dups(aug, threshold=0.9).collect()}
    for r in base:
        vid = int(r.vec_id)
        assert (vid, vid + 1_000_000) in got, f"planted near-dup of {vid} missed"


def test_embed_bucket_sign_margins(spark, sf_dir):
    """Cross-engine guard: DuckDB computes list_dot_product in float32
    (~1e-6 abs error) while Spark folds in float64. Bucket bits agree as
    long as no |dot(v, plane)| is near zero — assert a 10× margin on
    every fixture SF."""
    import numpy as np
    P = np.array(_embed_planes())
    for sf in ("0.001", "0.01", "0.1"):
        E = np.array([list(r.embedding) for r in
                      load_table(spark, f"/root/testdata/sf{sf}", "embeddings").collect()])
        assert np.abs(E @ P.T).min() > 1e-5, f"sign margin too small at sf{sf}"


def test_shingles_handle_short_docs(spark):
    """Docs with fewer than k words must yield an EMPTY shingle set (the
    oracle's convention), not crash — an unguarded sequence(1, n-(k-1))
    descends for n<k and slice(words, 0, k) throws."""
    from okera_trino_spark.llm.dedup import _shingles
    df = spark.createDataFrame(
        [(1, "one"), (2, "two words"), (3, "three word doc"),
         (4, "now four word doc")],
        schema="doc_id int, text string",
    )
    got = {r.doc_id: r.sh for r in
           df.select("doc_id", _shingles(F.col("text")).alias("sh")).collect()}
    assert got[1] == [] and got[2] == []
    assert got[3] == ["three word doc"]
    assert got[4] == ["now four word", "four word doc"]


def test_minhash_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    s1 = sorted(map(tuple, minhash_signatures(docs, 8).collect()))
    s2 = sorted(map(tuple, minhash_signatures(docs, 8).collect()))
    assert s1 == s2


def test_ann_lsh_scores_agree_with_bruteforce(spark, sf_dir):
    """Every ANN hit must carry the same cosine the brute-force path
    computes (LSH changes the candidate set, never the scores)."""
    brute = {r.vec_id: r.cos_sim for r in SPECS["q_llm_similarity"].fn(spark, sf_dir).collect()}
    ann = SPECS["q_llm_ann_lsh"].fn(spark, sf_dir).collect()
    assert len(ann) > 0
    for r in ann:
        if r.vec_id in brute:
            assert abs(r.cos_sim - brute[r.vec_id]) < 1e-9


def test_ann_ivf_scores_agree_with_bruteforce(spark, sf_dir):
    """IVF narrows the candidate set (nprobe cells), never the scores;
    require meaningful recall of the brute-force top-10 too."""
    brute = {r.vec_id: r.cos_sim for r in SPECS["q_llm_similarity"].fn(spark, sf_dir).collect()}
    ann = SPECS["q_llm_ann_ivf"].fn(spark, sf_dir).collect()
    assert len(ann) > 0
    hits = 0
    for r in ann:
        if r.vec_id in brute:
            assert abs(r.cos_sim - brute[r.vec_id]) < 1e-9
            hits += 1
    assert hits >= 3  # nprobe=2 of k=8 cells must still find a fair share


def test_multimodal_decode_pipeline(spark, sf_dir):
    media = make_media_frame(load_table(spark, sf_dir, "documents"))
    decoded = decode_media(media)
    rows = decoded.collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs  # 1:1, no shuffle
    for r in rows[:20]:
        assert r.width * r.height <= r.n_bytes
        assert 0.0 <= r.mean_intensity <= 255.0
        assert r.modality == "image"


def test_multimodal_real_codec_is_stubbed():
    with pytest.raises(NotImplementedError, match="jpeg"):
        _decode_one(b"\xff\xd8\xff", "jpeg")


def test_connected_components_transitive_closure(spark):
    """A~B and B~C must cluster A,B,C together even though A~C is not an
    edge; isolated nodes stay their own singleton component."""
    from okera_trino_spark.llm.clusters import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id long")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "doc_a long, doc_b long")
    got = {r.doc_id: r.cluster_id
           for r in connected_components(nodes, edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5, 7: 7}


def test_connected_components_iteration_cap_fails_loudly(spark):
    """r10 (verdict): a pathological fixture (a long chain needs
    diameter-many rounds) must raise at the max_iter cap instead of
    silently reporting half-merged clusters."""
    import pytest as _pytest

    from okera_trino_spark.llm.clusters import connected_components

    n = 12
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long")
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(nodes, chain, max_iter=2).collect()
    # and with enough rounds the same chain converges to one component
    got = {r.cluster_id
           for r in connected_components(nodes, chain, max_iter=n).collect()}
    assert got == {0}


def test_dup_clusters_consistent_with_pair_graph(spark, sf_dir):
    """Every near-dup pair's endpoints must land in the same cluster,
    and every reported cluster must be > 1 doc (singletons filtered)."""
    from okera_trino_spark.llm.clusters import connected_components, ngram_pairs

    comp = {r.doc_id: r.cluster_id
            for r in connected_components(
                load_table(spark, sf_dir, "documents").select("doc_id"),
                ngram_pairs(spark, sf_dir)).collect()}
    pairs = ngram_pairs(spark, sf_dir).collect()
    assert pairs, "fixture should contain near-dup pairs"
    for r in pairs:
        assert comp[r.doc_a] == comp[r.doc_b]
    sizes = SPECS["q_llm_dup_clusters"].fn(spark, sf_dir).collect()
    assert all(r.cluster_size > 1 for r in sizes)
    assert all(r.canonical_doc_id == r.cluster_id for r in sizes)


def test_dup_clusters_lsh_equals_exact_edge_clusters(spark, sf_dir):
    """The LSH-edge cluster resolver (r12) must report the IDENTICAL
    cluster set as the exact inverted-index edge source: at Jaccard
    ≥ 0.5 the band scheme's recall makes the verified pair set equal
    the exact pair set, so only the COST curve may differ — never the
    clusters. (The scale divergence is measured in SCALE.md r12:
    exact edges go quadratic on df-inflated corpora, LSH stays
    linear.)"""
    exact = {(r.cluster_id, r.cluster_size, r.canonical_doc_id)
             for r in SPECS["q_llm_dup_clusters"].fn(spark, sf_dir).collect()}
    lsh = {(r.cluster_id, r.cluster_size, r.canonical_doc_id)
           for r in SPECS["q_llm_dup_clusters_lsh"].fn(spark, sf_dir).collect()}
    assert exact == lsh
    assert lsh, "fixture should contain duplicate clusters"
    # same invariant for the kept-set APPLY pair: identical survivors
    kept_exact = {(r.doc_id, r.lang, r.source, r.cluster_size)
                  for r in SPECS["q_llm_dedup_apply"].fn(
                      spark, sf_dir).collect()}
    kept_lsh = {(r.doc_id, r.lang, r.source, r.cluster_size)
                for r in SPECS["q_llm_dedup_apply_lsh"].fn(
                    spark, sf_dir).collect()}
    assert kept_exact == kept_lsh


def test_decontaminate_broadcasts_benchmark_side(spark, sf_dir):
    """The benchmark shingle index must broadcast — the corpus side of
    the probe join must not shuffle (no nested-loop join either)."""
    from okera_trino_spark.plans.explain import assert_plan_contains, plan_string

    df = SPECS["q_llm_decontaminate"].fn(spark, sf_dir)
    assert_plan_contains(df, "BroadcastHashJoin")
    assert "BroadcastNestedLoopJoin" not in plan_string(df)


def test_resize_media_deterministic_shape(spark, sf_dir):
    """Resize plumbing: 1:1 rows, exact target byte count, deterministic
    payload bytes across runs."""
    from okera_trino_spark.llm.multimodal import make_media_frame, resize_media

    media = make_media_frame(load_table(spark, sf_dir, "documents")).limit(20)
    out = resize_media(media, 8, 8).collect()
    assert len(out) == 20
    assert all(len(bytes(r.payload)) == 64 for r in out)
    assert all((r.width, r.height) == (8, 8) for r in out)
    again = {r.doc_id: bytes(r.payload) for r in resize_media(media, 8, 8).collect()}
    assert {r.doc_id: bytes(r.payload) for r in out} == again


def test_ngram_hot_shingle_cap(spark):
    """Shingles above the DF cap must be excluded from BOTH the pair
    join and the per-doc shingle counts — the hot-key d² fan-out guard.
    Construct a corpus where a boilerplate shingle is shared by every
    doc: with the cap it contributes nothing, so two docs whose only
    overlap is boilerplate are NOT a pair, while true near-dups still
    score on their remaining shingles."""
    from okera_trino_spark.llm.dedup import ngram_jaccard_pairs

    boiler = "terms of service apply"
    rows = (
        [(i, f"{boiler} unique words {i} alpha beta gamma") for i in range(10)]
        + [(100, f"{boiler} identical tail one two three"),
           (101, f"{boiler} identical tail one two three")]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.doc_a, r.doc_b): r.jaccard
           for r in ngram_jaccard_pairs(docs, max_df=5).collect()}
    # Every capped-out shingle came from the shared boilerplate prefix
    # (12 docs > cap 5); docs 0..9 share ONLY boilerplate → no pairs.
    assert all(p == (100, 101) for p in got), got
    # 100/101 are identical → Jaccard 1.0 over their surviving shingles.
    assert got[(100, 101)] == 1.0
    # Sanity: uncapped, the boilerplate shingles alone cross no 0.5
    # threshold either, but the capped run must also not UNDERCOUNT the
    # true pair (cap applies to |A|,|B| and |∩| symmetrically).
    uncapped = {(r.doc_a, r.doc_b): r.jaccard
                for r in ngram_jaccard_pairs(docs, max_df=10**9).collect()}
    assert (100, 101) in uncapped


def test_media_feature_extraction_contract(spark):
    """The Arrow featurizer handles empty payloads, preserves row
    cardinality 1:1, and its byte stats equal a straight Python
    reference on hand-built payloads."""
    from okera_trino_spark.llm.multimodal import extract_media_features

    rows = [(1, b"abcABC"), (2, b""), (3, bytes([0, 255, 128, 32]))]
    media = spark.createDataFrame(
        [(i, bytearray(p), {"modality": "image", "codec": "raw-fake",
                            "n_bytes": len(p)}) for i, p in rows],
        "doc_id long, payload binary, "
        "media_meta struct<modality:string,codec:string,n_bytes:int>")
    out = {r.doc_id: r for r in extract_media_features(media).collect()}
    assert len(out) == 3
    for doc_id, payload in rows:
        r = out[doc_id]
        assert r.n_bytes == len(payload)
        if payload:
            assert abs(r.mean_byte - sum(payload) / len(payload)) < 1e-9
            assert abs(r.printable_ratio
                       - sum(32 <= b < 127 for b in payload) / len(payload)) < 1e-9
        else:
            assert r.mean_byte == 0.0 and r.std_byte == 0.0


def test_bpe_learn_matches_python_reference(spark, sf_dir):
    """bpe_learn's merge table must equal a standalone pure-Python BPE
    (greedy left-to-right merge, frequency-weighted, lexicographic
    tie-break) on the same word-frequency vocabulary."""
    from collections import Counter

    from okera_trino_spark.llm.text import bpe_learn
    from okera_trino_spark.sources.catalog import load_table

    got = [(r.step, r.left, r.right, r.weight)
           for r in bpe_learn(load_table(spark, sf_dir, "documents"),
                              n_merges=10).collect()]

    words = Counter()
    for row in load_table(spark, sf_dir, "documents").select("text").collect():
        for w in row.text.strip().split():
            words[w] += 1
    vocab = {tuple(w): f for w, f in words.items()}
    want = []
    for step in range(1, 11):
        counts = Counter()
        for seq, f in vocab.items():
            for a, b in zip(seq, seq[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        (left, right), weight = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        want.append((step, left, right, weight))
        nv = {}
        for seq, f in vocab.items():
            out = []
            for x in seq:
                if out and out[-1] == left and x == right:
                    out[-1] = left + right
                else:
                    out.append(x)
            nv[tuple(out)] = nv.get(tuple(out), 0) + f
        vocab = nv
    assert got == want and len(got) == 10


def test_jl_projection_preserves_cosine_structure(spark, sf_dir):
    """The r8 JL projection must preserve pairwise cosine STRUCTURE:
    across sampled pairs the 32-dim cosine correlates with the 64-dim
    cosine and the mean absolute distortion stays inside the JL
    envelope for k=32 (measured 0.54 / 0.14; asserted with margin).
    Exactness is the oracle's job (tests/test_oracle_parity) — this
    pins the operator's USEFULNESS, which a bit-exact oracle alone
    would not."""
    import itertools

    import numpy as np

    from okera_trino_spark.llm.similarity import jl_matrix

    e = load_table(spark, sf_dir, "embeddings")
    rows = (e.filter(F.col("vec_id") < 40)
            .select("vec_id", "embedding").collect())
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=float) for r in rows}
    mat = np.asarray(jl_matrix())
    his, los = [], []
    for a, b in itertools.combinations(sorted(vecs), 2):
        va, vb = vecs[a], vecs[b]
        his.append(float(va @ vb
                         / (np.linalg.norm(va) * np.linalg.norm(vb))))
        pa, pb = mat @ va, mat @ vb
        los.append(float(pa @ pb
                         / (np.linalg.norm(pa) * np.linalg.norm(pb))))
    his, los = np.array(his), np.array(los)
    corr = float(np.corrcoef(his, los)[0, 1])
    mean_d = float(np.mean(np.abs(his - los)))
    assert corr > 0.35 and mean_d < 0.25, (corr, mean_d)


def test_winnow_shared_substring_guarantee(spark, tmp_path):
    """Winnowing's defining property (the MOSS guarantee): any two
    documents sharing a substring of length >= k + w - 1 = 10
    normalized characters share at least one selected fingerprint —
    and documents over disjoint alphabets share none."""
    import random

    import pandas as pd

    rng = random.Random(11)

    def blob(alpha, n):
        return "".join(rng.choice(alpha) for _ in range(n))

    docs, want_pairs = [], []
    for i in range(10):
        shared = blob("abcdefgh", rng.randint(12, 40))
        a = blob("abcdefgh", 30) + shared + blob("abcdefgh", 30)
        b = blob("abcdefgh", 25) + shared + blob("abcdefgh", 25)
        docs.append((2 * i, a))
        docs.append((2 * i + 1, b))
        want_pairs.append((2 * i, 2 * i + 1))
    # disjoint-alphabet controls: no shared 7-gram can even exist
    docs.append((100, blob("qrstuv", 80)))
    docs.append((101, blob("wxyz01", 80)))
    pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
    sf = str(tmp_path / "winnow_fixture")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{sf}/documents.parquet")
    SPECS = load_all_queries()
    out = SPECS["q_llm_winnow"].fn(spark, sf).collect()
    fps: dict = {}
    for r in out:
        fps.setdefault(r.doc_id, set()).add(r.fingerprint)
    for a, b in want_pairs:
        assert fps[a] & fps[b], (a, b)
    assert not (fps[100] & fps[101])


def test_ann_pq_adc_bounds_true_distance(spark, sf_dir):
    """PQ-ADC sanity: every returned approximate distance must be
    non-negative, the list must come back sorted ascending, and the
    ADC distance of each hit must be within the quantization error
    bound of its true squared distance to the probe: |adc - d²| ≤
    Σ_m (2·||q_m − c_m||·e_m + e_m²) is data-dependent, so the test
    checks the cheap invariant instead — ADC equals the TRUE squared
    distance computed against the RECONSTRUCTED (codeword) vector,
    exactly (that is what ADC computes by definition)."""
    import numpy as np

    from okera_trino_spark.llm.similarity import PQ_K, PQ_M, PQ_SUB
    from okera_trino_spark.registry import load_all_queries

    qs = load_all_queries()
    rows = qs["q_llm_ann_pq"].fn(spark, sf_dir).collect()
    assert len(rows) == 10
    dists = [r.adc_dist for r in rows]
    assert all(d >= 0 for d in dists)
    assert dists == sorted(dists)

    # Reconstruction identity: ADC(v) = ||q - recon(v)||² where
    # recon(v) concatenates v's chosen codewords.
    emb = {r.vec_id: np.asarray(r.embedding, dtype=np.float64)
           for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .select("vec_id", "embedding").collect()}
    q = emb[0]
    cw = [emb[i] for i in range(PQ_K)]
    for r in rows[:3]:
        v = emb[r.vec_id]
        adc = 0.0
        for m in range(PQ_M):
            lo, hi = m * PQ_SUB, (m + 1) * PQ_SUB
            ds = [round(float(((v[lo:hi] - c[lo:hi]) ** 2).sum()), 6)
                  for c in cw]
            code = ds.index(min(ds))
            adc += round(float(((q[lo:hi] - cw[code][lo:hi]) ** 2).sum()), 6)
        assert abs(round(adc, 4) - r.adc_dist) < 1e-9


def test_bpe_apply_matches_python_reference(spark, sf_dir):
    """bpe_apply's per-doc tokenization must equal a standalone
    pure-Python application of the same learned merges (greedy
    left-to-right fold per word, words joined in document order)."""
    import hashlib

    from okera_trino_spark.llm.text import bpe_apply, bpe_learn
    from okera_trino_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    merges = [(r.left, r.right)
              for r in bpe_learn(docs, n_merges=10).collect()]
    got = {r.doc_id: (r.n_tokens, r.tok_sig)
           for r in bpe_apply(docs, merges).collect()}

    def tokenize(word: str) -> list[str]:
        seq = list(word)
        for left, right in merges:
            out = []
            for x in seq:
                if out and out[-1] == left and x == right:
                    out[-1] = left + right
                else:
                    out.append(x)
            seq = out
        return seq

    for row in docs.select("doc_id", "text").collect():
        toks = []
        for w in row.text.strip().split():
            toks.extend(tokenize(w))
        sig = hashlib.md5(" ".join(toks).encode()).hexdigest()
        assert got[row.doc_id] == (len(toks), sig), row.doc_id


def test_dsir_weights_separate_target_language(spark, sf_dir):
    """DSIR semantics: with the en slice as target, en documents must
    average a HIGHER importance weight than every non-target language,
    and the en mean must be positive (more target-like than the
    corpus-average mixture). Also locks the plan contract: both model
    aggregates collapse to <= DSIR_BUCKETS rows, so scoring joins a
    broadcast — no model-side shuffle."""
    from okera_trino_spark.llm.text import DSIR_BUCKETS, q_llm_dsir

    out = q_llm_dsir(spark, sf_dir)
    means = {r["lang"]: r["m"] for r in
             out.groupBy("lang").agg(F.avg("dsir_w").alias("m")).collect()}
    assert means["en"] > 0
    for lang, m in means.items():
        if lang != "en":
            assert means["en"] > m, (lang, m, means["en"])
    # the selected gate is consistent with the weight sign
    bad = out.filter((F.col("selected") & (F.col("dsir_w") <= 0))
                     | (~F.col("selected") & (F.col("dsir_w") > 0))).count()
    assert bad == 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_star_components_equal_propagation_clusters(spark, sf_dir):
    """r13: the alternating-star resolver must produce exactly the
    clusters the min-label propagation resolver produces over the same
    LSH-verified edge set (both label components by their minimum)."""
    prop = {(r.cluster_id, r.cluster_size, r.canonical_doc_id)
            for r in SPECS["q_llm_dup_clusters_lsh"].fn(spark, sf_dir).collect()}
    star = {(r.cluster_id, r.cluster_size, r.canonical_doc_id)
            for r in SPECS["q_llm_dup_clusters_star"].fn(spark, sf_dir).collect()}
    assert star == prop
    assert star, "fixture should contain duplicate clusters"


def test_star_components_chain_is_logarithmic(spark):
    """The reason star_components exists: a 512-link chain (the shape
    overlap dedup produces) must resolve in O(log n) rounds — label
    propagation would need ~512 sequential shuffle rounds. Also checks
    the labels themselves: every chain node joins component 0, plus an
    untouched separate pair stays its own component.

    r14: also pins the ONE-action-per-round fixpoint contract (the r13
    count()+exceptAll() pair spent two): with AQE off (AQE splits one
    query into per-stage jobs, so job counts aren't 1:1 with actions),
    the whole resolve must cost exactly rounds jobs — one symmetric-
    difference count each — plus one job for the final collect."""
    from okera_trino_spark.llm.clusters import star_components

    n = 512
    rows = [(i, i + 1) for i in range(n)]          # 0-1-2-...-512
    rows += [(10_000, 10_001)]                      # separate 2-node comp
    edges = spark.createDataFrame(rows, "doc_a long, doc_b long")
    stats: dict = {}
    sc = spark.sparkContext
    aqe_prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        sc.setJobGroup("star-fixpoint-jobs", "job-count pin")
        labels = {r.doc_id: r.cluster_id
                  for r in star_components(edges, stats=stats).collect()}
        jobs = sc.statusTracker().getJobIdsForGroup("star-fixpoint-jobs")
    finally:
        sc.setJobGroup("", "")
        spark.conf.set("spark.sql.adaptive.enabled", aqe_prev)
    assert stats["rounds"] <= 11, stats
    assert len(jobs) == stats["rounds"] + 1, (len(jobs), stats)
    assert all(labels[i] == 0 for i in range(n + 1))
    assert labels[10_000] == 10_000 and labels[10_001] == 10_000
    assert len(labels) == n + 3


def test_kmeans_matches_numpy_lloyd(spark, sf_dir):
    """q_llm_kmeans (r13) against an independent single-process Lloyd
    replay: same deterministic init (lowest vec_ids), same 6dp centroid
    AND distance rounding (distances round 6dp BEFORE the argmin since
    r14 — the cross-engine tie-domain fix), same lowest-id tie rule —
    assignments and 4dp distances must agree exactly."""
    import math

    import numpy as np

    from okera_trino_spark.llm.similarity import KMEANS_ITERS, KMEANS_K

    e = load_table(spark, sf_dir, "embeddings").collect()
    X = {int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
         for r in e}
    cent = {i: X[i].copy() for i in range(KMEANS_K)}

    def half_up(x, dp):  # Spark/DuckDB round, not Python's banker's
        s = 10 ** dp
        return math.floor(x * s + 0.5) / s

    def assign(c):
        out = {}
        for vid, v in X.items():
            best = min(((half_up(float(np.sum((v - cv) ** 2)), 6), cid)
                        for cid, cv in sorted(c.items())))
            out[vid] = best
        return out

    for _ in range(KMEANS_ITERS):
        a = assign(cent)
        new = {}
        for cid in cent:
            members = [X[vid] for vid, (_, c) in a.items() if c == cid]
            if members:
                new[cid] = np.round(np.mean(members, axis=0), 6)
        cent = new
    expect = {vid: (c, half_up(d, 4))
              for vid, (d, c) in assign(cent).items()}

    got = {int(r.vec_id): (int(r.cluster_id), float(r.dist2))
           for r in SPECS["q_llm_kmeans"].fn(spark, sf_dir).collect()}
    assert {v: c for v, (c, _) in got.items()} == \
           {v: c for v, (c, _) in expect.items()}
    for vid, (c, d) in expect.items():
        assert abs(got[vid][1] - d) <= 1e-9, (vid, got[vid], (c, d))


def test_kmeans_vectorized_assign_matches_fold(spark, sf_dir, monkeypatch):
    """r14: the large-k Arrow/BLAS assignment path must produce the
    same clustering as the codegen fold on identical input — same
    init, same 6dp rounding grid, same lowest-id tie rule. Clusters
    must match exactly; distances may differ by one 6dp grid step
    (|x|^2+|c|^2-2x.c vs the fold's sum-of-squares, ~1e-13 raw)."""
    import okera_trino_spark.llm.similarity as sim

    e = load_table(spark, sf_dir, "embeddings")
    fold = {int(r.vec_id): (int(r.cluster_id), float(r.dist2))
            for r in sim.kmeans_assignments(e).collect()}
    monkeypatch.setattr(sim, "KMEANS_FOLD_MAX", 0)
    vec = {int(r.vec_id): (int(r.cluster_id), float(r.dist2))
           for r in sim.kmeans_assignments(e).collect()}
    assert {v: c for v, (c, _) in vec.items()} == \
           {v: c for v, (c, _) in fold.items()}
    for vid, (_, d) in fold.items():
        assert abs(vec[vid][1] - d) <= 1.1e-6, (vid, vec[vid], d)


def test_kmeans_input_contract_enforced(spark):
    """r14 (r13 verdict #4 + ADVICE): kmeans_assignments' two input
    contracts are now CODE, not docstring — embeddings not exactly DIM
    wide, or vec_ids sparse below k (fewer than k init centroids),
    must raise at the init collect instead of silently truncating the
    update step / clustering with fewer centroids."""
    from okera_trino_spark.llm.similarity import DIM, kmeans_assignments

    wide = spark.createDataFrame(
        [(i, [float(i)] * (DIM + 1)) for i in range(6)],
        "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match=f"exactly {DIM} "):
        kmeans_assignments(wide, k=2)

    sparse = spark.createDataFrame(
        [(i * 10, [float(i)] * DIM) for i in range(1, 5)],
        "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="init expects"):
        kmeans_assignments(sparse, k=2)


def test_kmeans_assign_path_pinned_from_initial_k(spark):
    """r15 ADVICE: the fold-vs-BLAS assignment choice is made ONCE from
    the initial k, not re-picked per iteration on the live centroid
    count — a k > KMEANS_FOLD_MAX run whose empty clusters shrink the
    live set to <= KMEANS_FOLD_MAX must NOT flip to the fold engine
    mid-loop (the two paths' 6dp-rounded distances are only bounded
    within one grid step; a half-boundary near-tie could assign
    differently across a flip). Input: k=6 init centroids but only two
    real point masses, so after round 1 at most 2 clusters survive —
    the final plan must still be the Arrow/BLAS pandas_udf."""
    from okera_trino_spark.llm.similarity import DIM, kmeans_assignments

    rows = []
    for i in range(6):  # init ids 0..5: 0-2 COINCIDENT at mass A,
        # 3-5 coincident at mass B — every point ties to the lowest
        # id (0 or 3), so rounds 1+ have exactly 2 live centroids
        rows.append((i, [0.0 if i < 3 else 10.0] * DIM))
    for i in range(6, 40):  # the corpus: two tight masses
        rows.append((i, [(0.0 if i % 2 else 10.0) + (i % 5) * 1e-3] * DIM))
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    out = kmeans_assignments(e, k=6)
    assert len({r.cluster_id for r in out.collect()}) <= 2
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan or "EvalPython" in plan, plan

    # negative control: an initial k at the fold boundary never touches
    # Python — the oracle-replayable codegen path end to end
    out_small = kmeans_assignments(e, k=2)
    plan_small = out_small._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan_small, plan_small


def test_semdedup_k_oracle_coupling(sf_dir):
    """r15 ADVICE: q_llm_semdedup_kmeans' corpus-scaled k and its
    fixed-k DuckDB oracle are coupled only while semdedup_k(n) ==
    KMEANS_K. Pin the boundary arithmetic AND that every oracle-graded
    fixture tier (sf0.001 local, sf0.01 driver) sits below it — a
    fixture-size change that silently breaks the coupling fails here,
    not as an inexplicable driver hash-red."""
    import pyarrow.parquet as pq

    from okera_trino_spark.llm.dedup import (
        SEMDEDUP_CELL_TARGET,
        semdedup_k,
    )
    from okera_trino_spark.llm.similarity import KMEANS_K

    bound = (KMEANS_K + 1) * SEMDEDUP_CELL_TARGET
    assert semdedup_k(0) == KMEANS_K
    assert semdedup_k(bound - 1) == KMEANS_K
    assert semdedup_k(bound) == KMEANS_K + 1  # first non-replayable n

    for tier in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        n = pq.read_metadata(f"{tier}/embeddings.parquet").num_rows
        assert semdedup_k(n) == KMEANS_K, (tier, n, bound)


def test_star_and_propagation_agree_on_random_graphs(spark):
    """Resolver equivalence on adversarial shapes the fixture doesn't
    have: seeded random graphs mixing chains, cliques, hub-and-leaf
    stars and guaranteed isolated-pair components — both resolvers
    must produce the same (node -> component-min) labeling. (Stars are
    the shape the large-star/small-star passes treat asymmetrically;
    isolated pairs are the smallest fixpoint.)"""
    import random

    from okera_trino_spark.llm.clusters import (
        connected_components,
        star_components,
    )

    for seed in (7, 23):
        rng = random.Random(seed)
        edges = set()
        base = 0
        for _ in range(6):  # chains
            n = rng.randint(2, 40)
            edges |= {(base + i, base + i + 1) for i in range(n - 1)}
            base += n
        for _ in range(4):  # cliques
            ids = [base + i for i in range(rng.randint(3, 8))]
            edges |= {(a, b) for a in ids for b in ids if a < b}
            base += len(ids)
        for _ in range(3):  # hub-and-leaf stars (hub HIGHER than leaves
            n = rng.randint(4, 12)     # in one case, lower in another)
            hub = base + (0 if rng.random() < 0.5 else n - 1)
            edges |= {(min(hub, base + i), max(hub, base + i))
                      for i in range(n) if base + i != hub}
            base += n
        for _ in range(30):  # random cross edges
            a, b = rng.randrange(base), rng.randrange(base)
            if a != b:
                edges.add((min(a, b), max(a, b)))
        # guaranteed isolated 2-node components, outside cross-edge range
        edges |= {(base + 1000, base + 1001), (base + 2000, base + 2001)}
        df = spark.createDataFrame(sorted(edges), "doc_a long, doc_b long")
        star = {r.doc_id: r.cluster_id
                for r in star_components(df).collect()}
        nodes = df.selectExpr("doc_a AS doc_id").union(
            df.selectExpr("doc_b AS doc_id")).distinct()
        prop = {r.doc_id: r.cluster_id
                for r in connected_components(
                    nodes, df, max_iter=200,
                    include_isolated=False).collect()}
        assert star == prop, f"seed {seed}: resolvers disagree"


def test_bpe_learn_driver_and_distributed_paths_equal(spark, sf_dir):
    """bpe_learn_tok dispatches on vocabulary size (r15): at or below
    BPE_DRIVER_VOCAB_MAX the greedy loop runs driver-side over one
    bounded collect; above it, the distributed per-round loop runs.
    Both paths must produce the identical merge table AND the identical
    re-tokenized vocabulary — monkeypatching the budget to 0 forces the
    distributed path on the same input."""
    import okera_trino_spark.llm.text as txt
    from okera_trino_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    m_drv, v_drv = txt.bpe_learn_tok(docs)
    assert len(m_drv) == 10          # fixture vocab is under the budget
    old = txt.BPE_DRIVER_VOCAB_MAX
    try:
        txt.BPE_DRIVER_VOCAB_MAX = 0
        m_dist, v_dist = txt.bpe_learn_tok(docs)
    finally:
        txt.BPE_DRIVER_VOCAB_MAX = old
    assert [tuple(m) for m in m_drv] == [tuple(m) for m in m_dist]
    canon = lambda v: sorted(  # noqa: E731
        (r["word"], tuple(r["seq"]), int(r["freq"])) for r in v.collect())
    assert canon(v_drv) == canon(v_dist)


def test_apply_merge_py_matches_sql_fold(spark):
    """_apply_merge_py must equal the _apply_merge SQL fold on the
    overlap-sensitive shapes (greedy left-to-right, non-overlapping:
    'aaa' + (a,a) -> [aa, a]; refolding across a fused symbol does not
    re-trigger)."""
    from pyspark.sql import functions as F

    from okera_trino_spark.llm.text import _apply_merge, _apply_merge_py

    cases = [(list("aaa"), "a", "a"),
             (list("aaaa"), "a", "a"),
             (list("abab"), "a", "b"),
             (["ab", "a", "b"], "a", "b"),
             (list("xyzzy"), "z", "z"),
             ([], "a", "b"),
             (["q"], "a", "b")]
    df = spark.createDataFrame(
        [(i, seq) for i, (seq, _, _) in enumerate(cases)],
        "i int, seq array<string>")
    for i, (seq, left, right) in enumerate(cases):
        got_sql = (df.filter(F.col("i") == i)
                   .select(_apply_merge(F.col("seq"), left, right)
                           .alias("out")).collect()[0]["out"])
        assert list(got_sql) == _apply_merge_py(seq, left, right), (
            seq, left, right)
