"""Training-pipeline operators: dedup, quality, language-ID, fingerprints
(tested on small in-line corpora with hand-computable expectations)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def tiny_docs(spark, tmp_path_factory):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en"),
        (1, "the quick brown fox jumps over the lazy dog", "en"),   # exact dup of 0
        (2, "the quick brown fox jumps over the lazy cat", "en"),   # near dup
        (3, "completely different text about spark engines here", "en"),
        (4, "der schnelle braune fuchs springt", "de"),
    ]
    path = str(tmp_path_factory.mktemp("tiny") / "docs.parquet")
    spark.createDataFrame(rows, "doc_id BIGINT, text STRING, lang STRING") \
        .write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def test_exact_duplicates(tiny_docs):
    from bright_spark.text.dedup import exact_duplicates
    out = {r["doc_id"]: (r["canonical_id"], r["group_size"])
           for r in exact_duplicates(tiny_docs).collect()}
    assert out[0] == (0, 2)
    assert out[1] == (0, 2)
    assert out[2] == (2, 1)


def test_minhash_near_duplicates(tiny_docs):
    from bright_spark.text.dedup import near_duplicates_minhash
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in near_duplicates_minhash(tiny_docs, threshold=0.5).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    # near-dup (one token differs) should be caught with high jaccard
    if (0, 2) in pairs:
        assert 0.5 <= pairs[(0, 2)] < 1.0
    assert all(a != 3 and b != 3 for a, b in pairs)


def test_minhash_jaccard_exact_value(spark, tiny_docs):
    from bright_spark.text.dedup import jaccard_pairs
    pairs = spark.createDataFrame([(0, 2)], "id_a BIGINT, id_b BIGINT")
    j = jaccard_pairs(tiny_docs, pairs).collect()[0]["jaccard"]
    # 9 tokens -> 7 shingles each; 6 shared ("lazy dog" vs "lazy cat"
    # breaks the last shingle) -> 6 / 8
    assert j == pytest.approx(6 / 8)


def test_simhash_similarity(tiny_docs):
    from bright_spark.text.dedup import simhash
    out = {r["doc_id"]: r["simhash"] for r in simhash(tiny_docs).collect()}
    assert out[0] == out[1]  # identical text -> identical signature
    ham_near = bin(out[0] ^ out[2]).count("1")
    ham_far = bin(out[0] ^ out[3]).count("1")
    assert ham_near < ham_far
    assert 0 <= out[0] < 2**32


def test_token_stats(tiny_docs):
    from bright_spark.text.quality import token_stats
    r = {x["doc_id"]: x for x in token_stats(tiny_docs).collect()}
    assert r[0]["n_tokens"] == 9
    assert r[0]["n_distinct"] == 8  # "the" twice
    assert r[0]["distinct_ratio"] == pytest.approx(8 / 9)


def test_quality_scores(tiny_docs):
    from bright_spark.text.quality import quality_scores
    r = {x["doc_id"]: x for x in quality_scores(tiny_docs).collect()}
    assert r[0]["stopword_ratio"] == pytest.approx(2 / 9)  # the, the
    assert 0.0 <= r[0]["quality_score"] <= 1.0


def test_fingerprints(tiny_docs):
    from bright_spark.text.quality import fingerprints
    out = {r["doc_id"]: r["fingerprint"] for r in fingerprints(tiny_docs).collect()}
    assert out[0] == out[1]
    assert out[0] != out[3]


def test_language_id_on_code(spark, repos_parquet):
    """Marker-keyword language ID over the code corpus: per-lang
    keywords make the prediction meaningful — expect decent accuracy."""
    from bright_spark.text.quality import language_id
    src = spark.read.parquet(repos_parquet).withColumn(
        "doc_id", F.monotonically_increasing_id())
    pred = language_id(src, text_col="content")
    joined = pred.join(src.select("doc_id", "lang"), "doc_id")
    agg = joined.agg(
        F.sum(F.when(F.col("lang_pred") == F.col("lang"), 1).otherwise(0)).alias("hit"),
        F.count("*").alias("n")).collect()[0]
    assert agg["hit"] / agg["n"] > 0.6


def test_lang_profile(tiny_docs):
    from bright_spark.text.quality import lang_profile
    out = {r["lang"]: r for r in lang_profile(tiny_docs).collect()}
    assert out["en"]["n_docs"] == 4
    assert out["de"]["n_docs"] == 1


def test_near_duplicates_simhash_vs_bruteforce(spark, tiny_docs):
    """Band-join pairs == brute-force recompute of the same definition
    (hamming(simhash64) <= 3; 4x16-bit pigeonhole guarantees recall)."""
    from bright_spark.text.dedup import near_duplicates_simhash, simhash64
    sigs = {r["doc_id"]: (int(r["simhash_hi"]) << 32) | int(r["simhash_lo"])
            for r in simhash64(tiny_docs).collect()}
    expect = {}
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin(sigs[a] ^ sigs[b]).count("1")
            if h <= 3:
                expect[(a, b)] = h
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in near_duplicates_simhash(tiny_docs, max_hamming=3).collect()}
    assert got == expect
    assert expect  # tiny_docs has exact dup docs -> hamming 0 pairs


def test_simhash64_halves_and_band_cardinality(spark, tiny_docs):
    """The 64-bit signature's low half matches the 32-bit simhash, and
    each pigeonhole band spans the full 16-bit key space (2^16 keys per
    band is what keeps bucket populations ~N/65536 at web scale — an
    8-bit band's 256 keys would go quadratic within buckets)."""
    from bright_spark.text.dedup import simhash, simhash64
    lo32 = {r["doc_id"]: int(r["simhash"]) for r in simhash(tiny_docs).collect()}
    s64 = {r["doc_id"]: (int(r["simhash_lo"]), int(r["simhash_hi"]))
           for r in simhash64(tiny_docs).collect()}
    for d, (lo, hi) in s64.items():
        assert lo == lo32[d]
        assert 0 <= lo < 2**32 and 0 <= hi < 2**32
        # band keys are exactly the four 16-bit slices of (hi << 32 | lo)
        full = (hi << 32) | lo
        for band in range(4):
            assert ((full >> (16 * band)) & 0xFFFF) < 65536


def test_near_duplicates_simhash_rejects_wide_radius(tiny_docs):
    import pytest as _pytest
    from bright_spark.text.dedup import near_duplicates_simhash
    with _pytest.raises(ValueError):
        near_duplicates_simhash(tiny_docs, max_hamming=4)


def test_duplicate_clusters_vs_bruteforce(spark, tiny_docs):
    """Label-propagation components == brute-force union-find over the
    same pair graph; singletons label themselves."""
    from bright_spark.text.dedup import duplicate_clusters, near_duplicates_simhash
    pairs = near_duplicates_simhash(tiny_docs, max_hamming=3)
    got = {r["doc_id"]: r["cluster_id"]
           for r in duplicate_clusters(tiny_docs, pairs).collect()}
    ids = [r["doc_id"] for r in tiny_docs.select("doc_id").collect()]
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs.collect():
        a, b = find(r["id_a"]), find(r["id_b"])
        if a != b:
            parent[max(a, b)] = min(a, b)
    expect = {}
    roots: dict[int, int] = {}
    for i in sorted(ids):
        roots.setdefault(find(i), i)
        expect[i] = roots[find(i)]
    assert got == expect
    assert len(set(got.values())) < len(ids)  # dup docs actually merged


def test_duplicate_clusters_chain(spark):
    """A long chain (worst-case diameter) still converges: a-b, b-c,
    c-d ... all collapse to the minimum id."""
    import pandas as pd

    from bright_spark.text.dedup import duplicate_clusters
    n = 12
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(n), "text": ["x"] * n}))
    pairs = spark.createDataFrame(
        pd.DataFrame({"id_a": range(n - 1), "id_b": range(1, n)}))
    got = {r["doc_id"]: r["cluster_id"]
           for r in duplicate_clusters(docs, pairs).collect()}
    assert got == {i: 0 for i in range(n)}
    # the distributed fallback (forced via driver_max_edges=0) agrees
    dist = {r["doc_id"]: r["cluster_id"]
            for r in duplicate_clusters(docs, pairs,
                                        driver_max_edges=0).collect()}
    assert dist == got
    # a diameter beyond the distributed round cap must RAISE, never
    # silently return split components (wrong cluster_ids); the driver
    # path has no round cap (vectorized halving always converges)
    from bright_spark.text.dedup import ClusteringNotConverged
    with pytest.raises(ClusteringNotConverged):
        duplicate_clusters(docs, pairs, max_rounds=1, driver_max_edges=0)


def test_deterministic_split_and_sample(spark):
    """Split assignment is reproducible, proportional, stable under
    corpus growth; hash sampling matches its own reapplication."""
    import pandas as pd

    from bright_spark.text.sampling import deterministic_split, sample_by_hash
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(4000), "text": ["x"] * 4000}))
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r["doc_id"]: r["split"]
         for r in deterministic_split(docs, w).collect()}
    b = {r["doc_id"]: r["split"]
         for r in deterministic_split(docs, w).collect()}
    assert a == b
    from collections import Counter
    c = Counter(a.values())
    assert abs(c["train"] / 4000 - 0.8) < 0.03
    assert abs(c["val"] / 4000 - 0.1) < 0.02
    # growth stability: the first 4000 docs keep their assignment
    bigger = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(8000), "text": ["x"] * 8000}))
    big = {r["doc_id"]: r["split"]
           for r in deterministic_split(bigger, w).collect()}
    assert all(big[i] == a[i] for i in range(4000))

    s1 = {r["doc_id"] for r in sample_by_hash(docs, 0.2).collect()}
    s2 = {r["doc_id"] for r in sample_by_hash(docs, 0.2).collect()}
    assert s1 == s2 and abs(len(s1) / 4000 - 0.2) < 0.03
    # monotone: a larger rate strictly contains a smaller one
    s3 = {r["doc_id"] for r in sample_by_hash(docs, 0.5).collect()}
    assert s1 <= s3


def test_bpe_token_stats(spark):
    import pandas as pd

    from bright_spark.text.quality import bpe_token_stats
    docs = spark.createDataFrame(pd.DataFrame([
        {"doc_id": 0, "text": "Hello, world! 42"},
        {"doc_id": 1, "text": ""},
        {"doc_id": 2, "text": "a  b"},
    ]))
    r = {x["doc_id"]: x for x in bpe_token_stats(docs).collect()}
    # "Hello" ",' 'world" "!" " 42" -> pretokens: Hello | , | ' world' | ! | ' 42'
    assert r[0]["n_pretokens"] == 5
    assert r[0]["n_word_pretokens"] == 2
    assert r[1]["n_pretokens"] == 0
    # double space: the word branch needs a letter right after its one
    # optional space, so 'a  b' scans as 'a', ' ' (ws run), ' b'
    assert r[2]["n_pretokens"] == 3


def test_ngram_jaccard_pairs_matches_bruteforce(spark):
    """Rare-shingle blocking must find exactly the brute-force pairs
    when every shared shingle is rare (near-identical docs always
    share one), and never emit a pair below the threshold."""
    from itertools import combinations

    import pandas as pd

    from bright_spark.text.dedup import ngram_jaccard_pairs

    texts = {
        0: "alpha beta gamma delta epsilon zeta",
        1: "alpha beta gamma delta epsilon eta",     # near-dup of 0
        2: "one two three four five six seven",
        3: "one two three four five six eight",      # near-dup of 2
        4: "totally different words here now folks",
    }
    docs = spark.createDataFrame(pd.DataFrame(
        [{"doc_id": i, "text": t} for i, t in texts.items()]))

    def sh(t, k=3):
        w = t.split()
        return {" ".join(w[i:i + k]) for i in range(len(w) - k + 1)}

    expect = set()
    for a, b in combinations(sorted(texts), 2):
        sa, sb = sh(texts[a]), sh(texts[b])
        if sa & sb and len(sa & sb) / len(sa | sb) >= 0.4:
            expect.add((a, b))

    got = {(r["id_a"], r["id_b"])
           for r in ngram_jaccard_pairs(docs, threshold=0.4).collect()}
    assert got == expect == {(0, 1), (2, 3)}


def test_contaminated_docs_exact(spark):
    """Decontamination finds exactly the corpus docs sharing an n-gram
    with the probe set, with correct collision counts."""
    import pandas as pd

    from bright_spark.text.decontaminate import contaminated_docs

    probes = spark.createDataFrame(pd.DataFrame([
        {"doc_id": 100, "text": "the quick brown fox jumps"},
    ]))
    corpus = spark.createDataFrame(pd.DataFrame([
        # shares "the quick brown" AND "quick brown fox"
        {"doc_id": 0, "text": "see the quick brown fox run"},
        # shares nothing (no common 3-gram)
        {"doc_id": 1, "text": "the slow red fox hops away"},
        # shares "brown fox jumps"
        {"doc_id": 2, "text": "a brown fox jumps high"},
    ]))
    got = {r["doc_id"]: (r["n_hits"], r["first_ngram"])
           for r in contaminated_docs(corpus, probes, n=3).collect()}
    assert got == {0: (2, "quick brown fox"), 2: (1, "brown fox jumps")}


def test_probe_containment_fuzzy(spark):
    """Fuzzy decontamination ranks per-(doc, probe) containment: a
    partial leak scores its exact n-gram fraction, an unrelated doc
    scores zero, and a doc covering the whole probe scores 1.0."""
    import pandas as pd

    from bright_spark.text.decontaminate import probe_containment

    # probe: 6 tokens -> 4 distinct 3-grams
    probes = spark.createDataFrame(pd.DataFrame([
        {"doc_id": 100, "text": "the quick brown fox jumps high"},
    ]))
    corpus = spark.createDataFrame(pd.DataFrame([
        # full leak with extra surrounding text: all 4 probe 3-grams
        {"doc_id": 0, "text": "see the quick brown fox jumps high today"},
        # partial (prefix) leak: "the quick brown", "quick brown fox" -> 2/4
        {"doc_id": 1, "text": "the quick brown fox"},
        # single shared 3-gram: 1/4 -> below min_ratio, dropped
        {"doc_id": 2, "text": "a brown fox jumps away"},
        {"doc_id": 3, "text": "nothing in common here at all"},
    ]))
    got = {(r["doc_id"], r["probe_id"]): (r["probe_hits"], r["probe_ngrams"],
                                          round(r["containment"], 6))
           for r in probe_containment(corpus, probes, n=3,
                                      min_ratio=0.5).collect()}
    assert got == {(0, 100): (4, 4, 1.0), (1, 100): (2, 4, 0.5)}
    # lowering the floor admits the single-collision doc at rank 3
    low = {r["doc_id"]: round(r["containment"], 6)
           for r in probe_containment(corpus, probes, n=3,
                                      min_ratio=0.1).collect()}
    assert low == {0: 1.0, 1: 0.5, 2: 0.25}


def test_redact_pii_fixture(spark):
    """Crafted fixtures pin each category, the placeholder text, the
    sequential-count semantics, and the hex-before-num precedence."""
    import pandas as pd

    from bright_spark.text.scrub import redact_pii
    rows = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "mail a.b+c@ex-ample.org now",
            "host 192.168.0.1 and id 123456789012 end",
            # 32 hex chars that are ALSO all digits: hex wins (ordered)
            "secret 0123456789abcdef0123456789abcdef "
            "num 12345678901234567890123456789012",
            "clean text with no pii at all",
        ]})
    got = {r["doc_id"]: r.asDict() for r in
           redact_pii(spark.createDataFrame(rows)).collect()}
    assert got[1]["text_redacted"] == "mail <EMAIL> now"
    assert got[1]["n_email"] == 1 and got[1]["n_ip"] == 0
    assert got[2]["text_redacted"] == "host <IP> and id <NUM> end"
    assert got[2]["n_ip"] == 1 and got[2]["n_num"] == 1
    assert got[3]["text_redacted"] == "secret <HEX> num <HEX>"
    assert got[3]["n_hex"] == 2 and got[3]["n_num"] == 0
    assert got[4]["text_redacted"] == rows["text"][3]
    assert all(got[4][c] == 0 for c in ("n_email", "n_ip", "n_hex", "n_num"))


def test_repetition_profile_exact(spark):
    import pandas as pd

    from bright_spark.text.quality import repetition_profile
    rows = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            "a b c a b c a b c",      # 7 trigrams, 3 distinct
            "all tokens fully distinct here now",  # no repeats
            "ab",                      # < k tokens -> whole-doc gram
        ]})
    got = {r["doc_id"]: r.asDict() for r in
           repetition_profile(spark.createDataFrame(rows), k=3).collect()}
    assert got[1]["n_ngrams"] == 7 and got[1]["n_distinct"] == 3
    assert got[1]["repetition_ratio"] == pytest.approx(1 - 3 / 7)
    assert got[2]["repetition_ratio"] == 0.0
    assert got[3] == {"doc_id": 3, "n_ngrams": 1, "n_distinct": 1,
                      "repetition_ratio": 0.0}


def test_pack_sequences_semantics(spark):
    """Concat-and-chunk packing: per-shard offsets are a gapless
    prefix sum in doc_id order, window indices follow floor division,
    and a budget-crossing doc reports the right chunk count."""
    import pandas as pd

    from bright_spark.text.sampling import pack_sequences
    rows = pd.DataFrame({
        "doc_id": range(20),
        "text": ["tok " * (i % 7 + 1) for i in range(20)],  # 1..7 tokens
    })
    out = pack_sequences(spark.createDataFrame(rows), budget=5, n_shards=3)
    rs = sorted((r["shard"], r["doc_id"], r) for r in out.collect())
    by_shard: dict[int, list] = {}
    for sh, _, r in rs:
        by_shard.setdefault(sh, []).append(r)
    assert len(by_shard) > 1  # corpus actually sharded
    for sh, docs in by_shard.items():
        expect_start = 0
        for r in docs:  # doc_id order within shard
            assert r["start_offset"] == expect_start
            expect_start += r["n_tokens"]
            assert r["bin_first"] == r["start_offset"] // 5
            last = r["start_offset"] + max(r["n_tokens"] - 1, 0)
            assert r["bin_last"] == last // 5
            assert r["n_chunks"] == r["bin_last"] - r["bin_first"] + 1
    # a 7-token doc starting mid-window spans 2 windows of 5
    spans = [r["n_chunks"] for _, _, r in rs if r["n_tokens"] == 7]
    assert any(c == 2 for c in spans)
    # determinism: rerun is identical
    again = sorted((r["shard"], r["doc_id"], r["start_offset"])
                   for r in pack_sequences(spark.createDataFrame(rows),
                                           budget=5, n_shards=3).collect())
    assert again == [(s, d, r["start_offset"]) for s, d, r in rs]


def test_cross_corpus_duplicates(spark):
    """Exact-hash containment against a reference corpus: only docs
    with byte-identical text to a reference doc survive the semi-join,
    regardless of ids."""
    import pandas as pd

    from bright_spark.text.dedup import cross_corpus_duplicates
    corpus = spark.createDataFrame(pd.DataFrame({
        "doc_id": [10, 11, 12],
        "text": ["shared text a", "unique text b", "shared text c"]}))
    ref = spark.createDataFrame(pd.DataFrame({
        "doc_id": [900, 901],
        "text": ["shared text a", "shared text c"]}))
    got = sorted(r["doc_id"] for r in
                 cross_corpus_duplicates(corpus, ref).collect())
    assert got == [10, 12]


def test_stratified_sample(spark):
    """Per-group deterministic rates: exact membership by (salt, key)
    hash, group rates honored, default for unlisted groups, targets=
    derives rates from one count pass."""
    import pandas as pd
    from bright_spark.text.sampling import (BUCKETS, hash_bucket,
                                            stratified_sample)
    from pyspark.sql import functions as F
    rows = [{"doc_id": i, "lang": ["en", "de", "fr"][i % 3],
             "text": f"doc {i}"} for i in range(900)]
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = stratified_sample(df, rates={"en": 0.5, "de": 1.0},
                            default_rate=0.2)
    got = {r["doc_id"] for r in out.collect()}
    # oracle: recompute membership per row driver-side
    import hashlib
    rate_of = {"en": 0.5, "de": 1.0, "fr": 0.2}
    want = set()
    for r in rows:
        b = int(hashlib.md5(
            f"strat|{r['doc_id']}".encode()).hexdigest()[:8], 16) % BUCKETS
        if b < int(rate_of[r["lang"]] * BUCKETS):
            want.add(r["doc_id"])
    assert got == want
    # all de kept; en ~half; fr ~20%
    by_lang = {l: sum(1 for r in rows
                      if r["lang"] == l and r["doc_id"] in got)
               for l in ("en", "de", "fr")}
    assert by_lang["de"] == 300
    assert 100 < by_lang["en"] < 200 and 30 < by_lang["fr"] < 100
    # determinism across invocations
    again = {r["doc_id"] for r in stratified_sample(
        df, rates={"en": 0.5, "de": 1.0}, default_rate=0.2).collect()}
    assert again == got
    # targets= path: realized sizes near the budget, subset semantics
    t = stratified_sample(df, targets={"en": 100, "de": 300},
                          default_rate=0.0)
    rows_t = t.collect()
    n_en = sum(1 for r in rows_t if r["lang"] == "en")
    n_de = sum(1 for r in rows_t if r["lang"] == "de")
    assert n_de == 300 and 70 <= n_en <= 130
    assert all(r["lang"] != "fr" for r in rows_t)  # default 0 drops
    import pytest
    with pytest.raises(ValueError):
        stratified_sample(df)


def test_lm_perplexity_fixture(spark):
    """Hand-computable unigram LM: the common-word doc scores LOWER
    perplexity than the doc of hapaxes; values match the closed form."""
    import math

    import pandas as pd

    from bright_spark.text.quality import lm_perplexity
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["cat cat cat", "cat cat dog", "emu fox gnu"],
    }))
    got = {r["doc_id"]: r for r in lm_perplexity(docs).collect()}
    # corpus: cf(cat)=5 dog=1 emu=1 fox=1 gnu=1, total=9, |V|=5, k=0.5
    denom = 9 + 0.5 * 5
    p = {"cat": 5.5 / denom, "dog": 1.5 / denom,
         "emu": 1.5 / denom, "fox": 1.5 / denom, "gnu": 1.5 / denom}
    h0 = -math.log(p["cat"])
    h1 = -(2 * math.log(p["cat"]) + math.log(p["dog"])) / 3
    h2 = -(math.log(p["emu"]) + math.log(p["fox"]) + math.log(p["gnu"])) / 3
    for d, h in ((0, h0), (1, h1), (2, h2)):
        assert got[d]["n_tokens"] == 3
        assert abs(got[d]["cross_entropy"] - h) < 1e-9
        assert abs(got[d]["perplexity"] - math.exp(h)) < 1e-6
    assert (got[0]["perplexity"] < got[1]["perplexity"]
            < got[2]["perplexity"])


def test_lm_perplexity_bigram_fixture(spark):
    """Hand-computable interpolated bigram LM (lam=0.5, k=0.5): the
    in-order doc scores LOWER perplexity than the same bag of words
    shuffled — the word-order signal the unigram filter cannot see —
    and every value matches the closed form."""
    import math

    import pandas as pd

    from bright_spark.text.quality import lm_perplexity_bigram
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1],
        "text": ["a b a b", "b b a a"],
    }))
    got = {r["doc_id"]: r for r in
           lm_perplexity_bigram(docs).collect()}
    # unigram: cf(a)=4 cf(b)=4, total=8, |V|=2, k=0.5
    pu = {"a": 4.5 / 9.0, "b": 4.5 / 9.0}
    # bigrams: doc0 -> (a,b)(b,a)(a,b); doc1 -> (b,b)(b,a)(a,a)
    bcf = {("a", "b"): 2, ("b", "a"): 2, ("b", "b"): 1, ("a", "a"): 1}
    ccf = {"a": 3, "b": 3}

    def p(term, prev):
        if prev is None:
            return pu[term]
        return (0.5 * bcf.get((prev, term), 0) / ccf[prev]
                + 0.5 * pu[term])

    def h(tokens):
        prevs = [None] + tokens[:-1]
        return -sum(math.log(p(t, pv))
                    for t, pv in zip(tokens, prevs)) / len(tokens)

    for d, txt in ((0, "a b a b"), (1, "b b a a")):
        want = h(txt.split())
        assert got[d]["n_tokens"] == 4
        assert abs(got[d]["cross_entropy"] - want) < 1e-9
        assert abs(got[d]["perplexity"] - math.exp(want)) < 1e-6
    # identical unigram model for both docs; order decides the rank
    assert got[0]["perplexity"] < got[1]["perplexity"]


def test_lm_perplexity_bigram_single_token_doc(spark):
    """A one-token doc has no bigram context: unigram-only score."""
    import math

    import pandas as pd

    from bright_spark.text.quality import lm_perplexity_bigram
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1],
        "text": ["solo", "solo pair"],
    }))
    got = {r["doc_id"]: r for r in
           lm_perplexity_bigram(docs).collect()}
    assert got[0]["n_tokens"] == 1
    # cf(solo)=2 cf(pair)=1, total=3, |V|=2 -> p_uni(solo)=2.5/4
    assert abs(got[0]["cross_entropy"] - (-math.log(2.5 / 4.0))) < 1e-9


def test_components_numpy_vs_union_find():
    """Property: the vectorized min-scatter+halving kernel equals
    classic union-find on random graphs (including multi-edges,
    self-referential chains, and disjoint components)."""
    import numpy as np

    from bright_spark.text.dedup import _components_numpy

    rng = np.random.default_rng(11)
    for trial in range(25):
        n = int(rng.integers(2, 60))
        m = int(rng.integers(1, 120))
        src = rng.integers(0, 1000, size=m).astype(np.int64)
        dst = rng.integers(0, 1000, size=m).astype(np.int64)
        ids, cl = _components_numpy(src, dst)
        parent = {int(i): int(i) for i in ids}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in zip(src.tolist(), dst.tolist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        roots: dict[int, int] = {}
        expect = {}
        for i in sorted(parent):
            roots.setdefault(find(i), i)
            expect[i] = roots[find(i)]
        got = dict(zip(ids.tolist(), cl.tolist()))
        assert got == expect, f"trial {trial}"


def test_vocabulary_fixture(spark):
    """Hand-computable vocab: cf counts repeats, df counts docs, rank
    is cf-desc with lexicographic tie-break."""
    import pandas as pd

    from bright_spark.text.quality import vocabulary
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1],
        "text": ["cat cat dog", "dog emu"],
    }))
    got = {r["term"]: (r["cf"], r["df"], r["rank"])
           for r in vocabulary(docs).collect()}
    assert got == {"cat": (2, 1, 1), "dog": (2, 2, 2), "emu": (1, 1, 3)}
    # min_count prunes the tail
    got2 = {r["term"] for r in vocabulary(docs, min_count=2).collect()}
    assert got2 == {"cat", "dog"}


def test_dedup_paragraphs_keep_first(spark):
    """Repeated paragraphs vanish everywhere but their first
    (doc_id, position) occurrence; unique paragraphs survive; order
    and separators are preserved; a doc can lose everything."""
    import pandas as pd

    from bright_spark.text.dedup import dedup_paragraphs
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "COPYRIGHT HEADER\n\nunique zero\n\nCOPYRIGHT HEADER",
            "COPYRIGHT HEADER\n\nunique one",
            "unique two\n\nCOPYRIGHT HEADER",
            "COPYRIGHT HEADER",
        ],
    }))
    got = {r["doc_id"]: r for r in dedup_paragraphs(docs).collect()}
    # doc 0 keeps the FIRST copy (idx 0) and drops its own repeat
    assert got[0]["text"] == "COPYRIGHT HEADER\n\nunique zero"
    assert got[0]["n_paragraphs"] == 3 and got[0]["n_removed"] == 1
    assert got[1]["text"] == "unique one"
    assert got[2]["text"] == "unique two"
    assert got[3]["text"] == "" and got[3]["n_removed"] == 1
    # idempotence: a second pass removes nothing
    again = dedup_paragraphs(
        dedup_paragraphs(docs).select("doc_id", "text")).collect()
    assert all(r["n_removed"] == 0 for r in again)


def test_dedup_paragraphs_min_copies_and_sep(spark):
    import pandas as pd

    from bright_spark.text.dedup import dedup_paragraphs
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1],
        "text": ["a|b|a", "b|c"],
    }))
    # min_copies=3: nothing reaches 3 copies except... a=2, b=2 -> none
    out = {r["doc_id"]: r for r in
           dedup_paragraphs(docs, sep="|", min_copies=3).collect()}
    assert out[0]["text"] == "a|b|a" and out[0]["n_removed"] == 0
    # default min_copies=2 with custom sep (regex-escaped literal)
    out = {r["doc_id"]: r for r in
           dedup_paragraphs(docs, sep="|").collect()}
    assert out[0]["text"] == "a|b" and out[0]["n_removed"] == 1
    assert out[1]["text"] == "c" and out[1]["n_removed"] == 1


def test_dedup_paragraphs_fuzz_vs_reference(spark):
    """Differential fuzz: random corpora (dup-heavy, empties, varied
    doc lengths) against a direct per-corpus Python reference of the
    keep-first semantics."""
    import numpy as np
    import pandas as pd

    from bright_spark.text.dedup import dedup_paragraphs

    def reference(texts, sep, min_copies, min_len):
        from collections import Counter
        split = [t.split(sep) for t in texts]
        counts = Counter(p for ps in split for p in ps
                         if len(p) >= min_len)
        seen, out = set(), []
        for ps in split:
            kept = []
            removed = 0
            for p in ps:
                if (len(p) >= min_len and counts[p] >= min_copies
                        and p in seen):
                    removed += 1
                elif len(p) >= min_len and counts[p] >= min_copies:
                    seen.add(p)
                    kept.append(p)
                else:
                    kept.append(p)
            out.append((sep.join(kept), len(ps), removed))
        return out

    rng = np.random.default_rng(2026)
    vocab = ["alpha", "beta", "gamma", "", "x", "lorem ipsum",
             "the same header", "z" * 3]
    for trial in range(6):
        n = int(rng.integers(3, 14))
        texts = ["|".join(rng.choice(vocab,
                                     size=int(rng.integers(1, 9))))
                 for _ in range(n)]
        docs = spark.createDataFrame(pd.DataFrame(
            {"doc_id": range(n), "text": texts}))
        got = {r["doc_id"]: r for r in
               dedup_paragraphs(docs, sep="|").collect()}
        want = reference(texts, "|", 2, 1)
        for d in range(n):
            assert got[d]["text"] == want[d][0], (trial, d, texts[d])
            assert got[d]["n_paragraphs"] == want[d][1]
            assert got[d]["n_removed"] == want[d][2]


def test_shingle_arrays_match_exploded_distinct(spark):
    """The per-row array_distinct shingle build must yield exactly the
    set the old corpus-wide explode+distinct produced — including docs
    with repeated shingles and docs shorter than k."""
    import pandas as pd
    from pyspark.sql import functions as F

    from bright_spark.text.dedup import shingles_df, tokens_col
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["a b c a b c a b c",      # repeated shingles
                 "x y",                     # shorter than k -> whole doc
                 "one two three four",
                 "a b c d"]}))
    got = {(r["doc_id"], r["shingle"]) for r in shingles_df(docs).collect()}
    toks = docs.select("doc_id", tokens_col("text").alias("toks"))
    old = toks.select(
        "doc_id",
        F.explode(F.when(
            F.size("toks") >= 3,
            F.transform(F.sequence(F.lit(0), F.size("toks") - 3),
                        lambda i: F.array_join(F.slice("toks", i + 1, 3), " "))
        ).otherwise(F.array(F.array_join("toks", " ")))).alias("shingle")
    ).distinct()
    expect = {(r["doc_id"], r["shingle"]) for r in old.collect()}
    assert got == expect
    # per-doc arrays are duplicate-free (set semantics)
    from bright_spark.text.dedup import shingle_arrays
    for r in shingle_arrays(docs).collect():
        assert len(r["sh"]) == len(set(r["sh"]))


def test_minhash_signature_kernel_matches_jvm_aggregate(spark):
    """The Arrow hashlib signature kernel must be byte-identical to the
    definitional Catalyst min(md5(concat('i|', shingle))) aggregate —
    including non-ASCII shingles (UTF-8 bytes) and a doc whose shingle
    array is empty (no output row, matching explode semantics)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from bright_spark.text.dedup import minhash_signatures, shingle_arrays
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["der schnelle fuchs springt über den grünen Zaun",
                 "a b c a b c a b c",
                 "one two three four five six",
                 ""]}))
    sh = shingle_arrays(docs)
    # force a row with an EMPTY shingle array through the kernel (the
    # natural build never makes one: short docs get a whole-doc
    # shingle) — the kernel must drop it like explode would
    sh_with_empty = sh.withColumn(
        "sh", F.when(F.col("doc_id") == 3,
                     F.array().cast("array<string>")).otherwise(F.col("sh")))
    got = sorted(minhash_signatures(docs, sh=sh_with_empty).collect())
    exploded = sh_with_empty.select("doc_id", F.explode("sh").alias("shingle"))
    expect = sorted(minhash_signatures(docs, sh=exploded).collect())
    assert got == expect
    assert {r["doc_id"] for r in got} == {0, 1, 2}


def test_simhash_kernel_matches_jvm_aggregate(spark):
    """The Arrow SimHash kernel (per-task md5 cache + integer bit
    sums) must equal the definitional 64-sum Catalyst aggregate —
    including repeated terms (tf weighting), unicode terms, and an
    empty-string token (empty text still tokenizes to [''])."""
    import pandas as pd

    from bright_spark.text.dedup import _simhash64_agg, simhash, simhash64
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["der schnelle fuchs springt über den grünen Zaun",
                 "a b c a b c a b c a b c a b c",
                 "one two three four five six seven eight",
                 ""]}))
    got = sorted(simhash64(docs).collect())
    expect = sorted(_simhash64_agg(docs).collect())
    assert got == expect
    lo = {r["doc_id"]: r["simhash_lo"] for r in got}
    got32 = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert got32 == lo


def test_vocabulary_kernel_matches_definitional_aggregate(spark):
    """The per-partition cf/df kernel must equal the definitional
    explode + count/countDistinct aggregate — including repeated terms
    within a doc (cf counts occurrences, df counts docs once),
    unicode, and docs spread across partitions."""
    import pandas as pd
    from pyspark.sql import functions as F

    from bright_spark.text.dedup import fan_out, tokens_col
    from bright_spark.text.quality import vocabulary
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": list(range(8)),
        "text": ["a b a b a", "a über c", "c c c", "d", "a d",
                 "b über b", "e f g", "e e f"]}))
    got = {(r["term"], r["cf"], r["df"], r["rank"])
           for r in vocabulary(docs).collect()}
    toks = fan_out(docs).select("doc_id",
                                F.explode(tokens_col("text")).alias("term"))
    agg = (toks.groupBy("term")
           .agg(F.count("*").alias("cf"),
                F.countDistinct("doc_id").alias("df")))
    from pyspark.sql import Window
    ranked = agg.withColumn(
        "rank", F.row_number().over(
            Window.orderBy(F.col("cf").desc(), F.col("term").asc())))
    expect = {(r["term"], r["cf"], r["df"], r["rank"])
              for r in ranked.collect()}
    assert got == expect
