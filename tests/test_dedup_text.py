"""Dedup / similarity / text-analysis / multimodal operator tests with
independent numpy oracles (these pipeline operators have no DuckDB-
expressible oracle — SURVEY.md §5.2.4 fallback)."""

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pytest

from geomesa_spark.functions import text as text_fns
from geomesa_spark.operators import dedup, multimodal
from geomesa_spark.sources import corpus


@pytest.fixture(scope="module")
def near_dup_df(spark):
    """Synthetic corpus with planted exact + near duplicates."""
    rng = np.random.default_rng(7)
    vocab = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    rows = []
    for i in range(60):
        words = list(rng.choice(vocab, 30))
        rows.append((f"d{i:03d}", " ".join(words)))
    # exact dups
    rows.append(("d900", rows[0][1]))
    rows.append(("d901", rows[0][1]))
    # near dup: one word changed
    w = rows[1][1].split()
    w[5] = "CHANGED"
    rows.append(("d902", " ".join(w)))
    # disjoint doc
    rows.append(("d903", "completely different text about nothing shared"))
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"])).cache()


def test_exact_dedup(spark, near_dup_df):
    out = dedup.exact_dedup(near_dup_df).toPandas()
    dups = out[out["n_dups"] > 1]
    assert len(dups) == 1 and dups.iloc[0]["n_dups"] == 3
    assert dups.iloc[0]["keep_id"] == "d000"
    assert out["n_dups"].sum() == near_dup_df.count()


def test_minhash_lsh_finds_planted_pairs(spark, near_dup_df):
    pairs = dedup.minhash_lsh_pairs(near_dup_df, jaccard_threshold=0.5)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # exact dups must be found with est ≈ 1
    assert ("d000", "d900") in got and ("d000", "d901") in got and ("d900", "d901") in got
    assert ("d001", "d902") in got  # near dup
    assert not any("d903" in p for pair in got for p in pair)


def test_minhash_signature_deterministic(spark, near_dup_df):
    s1 = dedup.minhash_signatures(near_dup_df).orderBy("id").collect()
    s2 = dedup.minhash_signatures(near_dup_df).orderBy("id").collect()
    assert s1 == s2
    by_id = {r["id"]: r["sig"] for r in s1}
    assert by_id["d000"] == by_id["d900"]  # identical text → identical sig


def test_minhash_md5_tier_planted_pairs_and_hash_basis(spark, near_dup_df):
    """Round-5 verdict item 4: the md5-basis shingle tier finds the planted
    dups, and its signatures equal a hashlib/numpy reference built from the
    documented definition (15-hex md5 → xor with md5(i) → min)."""
    import hashlib

    pairs = dedup.minhash_lsh_pairs_md5(near_dup_df, jaccard_threshold=0.5)
    got = {(r["id_a"], r["id_b"]): r["n_match"] for r in pairs.collect()}
    assert got[("d000", "d900")] == 16  # exact dup: every slot matches
    assert ("d001", "d902") in got  # near dup
    assert not any("d903" in p for pair in got for p in pair)

    sigs = {r["id"]: r["sig"] for r in dedup.minhash_signatures_md5(near_dup_df).collect()}
    texts = {r["doc_id"]: r["text"] for r in near_dup_df.collect()}

    def ref_sig(t, num_perm=16, k=5):
        t = t.lower()
        if len(t) < k:
            t = t.ljust(k)
        hs = [
            int(hashlib.md5(t[i : i + k].encode()).hexdigest()[:15], 16)
            for i in range(len(t) - k + 1)
        ]
        hs = sorted(set(hs))
        return [
            min(h ^ int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) for h in hs)
            for i in range(num_perm)
        ]

    for did in ("d000", "d001", "d903"):
        assert sigs[did] == ref_sig(texts[did]), did


def test_simhash_md5_tier_matches_jvm_values_at_64_bits(spark, near_dup_df):
    """The Arrow/numpy md5 SimHash must be bit-identical to
    simhash_values_jvm(n_bits=64) — the property the DuckDB oracle twin
    relies on — and the blocked pair join must find the planted dups."""
    py = {r["id"]: r["simhash"] for r in dedup.simhash_bits_md5(near_dup_df).collect()}
    jvm = {
        r["id"]: r["simhash"]
        for r in dedup.simhash_values_jvm(near_dup_df, "text", "doc_id", 64).collect()
    }
    assert py == jvm and len(py) == near_dup_df.count()

    pairs = dedup.simhash_pairs_md5(near_dup_df, max_hamming=6)
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    assert got[("d000", "d900")] == 0
    assert ("d001", "d902") in got


def test_simhash_pairs(spark, near_dup_df):
    pairs = dedup.simhash_pairs(near_dup_df, max_hamming=6)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert ("d000", "d900") in got  # hamming 0
    hams = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    assert hams[("d000", "d900")] == 0
    assert ("d001", "d902") in got  # near dup within ball


def test_simhash_jvm_64bit_production_setting(spark, near_dup_df):
    """The documented production path (n_bits=64, n_blocks=8) — round-2
    review found the old double-division bit plumbing overflowed/lost
    precision there (only the 16-bit demo worked)."""
    pairs = dedup.simhash_pairs_jvm(
        near_dup_df, text_col="text", id_col="doc_id",
        n_bits=64, n_blocks=8, max_hamming=7,
    )
    rows = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in pairs.collect()}
    assert ("d000", "d900") in rows  # exact dup -> identical 64-bit hash
    assert rows[("d000", "d900")] == 0
    for h in rows.values():
        assert 0 <= h <= 7


def _simhash_py(text: str, n_bits: int) -> int:
    """Independent hashlib oracle for simhash_values_jvm: bit j from hex
    group j // 16 of md5(token), sign of the signed token sum."""
    import hashlib

    toks = sorted({t for t in text.lower().split() if t})
    val = 0
    for j in range(n_bits):
        g, jj = j // 16, j % 16
        s = 0
        for t in toks:
            v = int(hashlib.md5(t.encode()).hexdigest()[4 * g: 4 * g + 4], 16)
            s += 1 if (v >> jj) & 1 else -1
        if s >= 0:
            val |= 1 << j
    return val


def test_simhash_jvm_64bit_matches_hashlib_oracle(spark):
    """ADVICE round 2 (medium): bits ≥ 16 used to derive from the SAME 4
    hex chars as bits 0-15, so the top 48 bits of every 64-bit hash were a
    constant 0 and 6 of 8 pigeonhole blocks matched every pair.  The fix
    takes bit j from hex group j // 16; this pins the per-document hash to
    an independent hashlib/python oracle and asserts the high bits vary.
    Docs here carry DISTINCT token sets (simhash is a set hash — the
    shared near_dup_df fixture draws from a 10-word vocab, so most of its
    docs legitimately collide to one hash)."""
    rng = np.random.default_rng(3)
    rows = [
        (f"s{i:02d}", " ".join(f"tok{v}" for v in rng.choice(500, 12, replace=False)))
        for i in range(40)
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = {
        r["id"]: r["simhash"]
        for r in dedup.simhash_values_jvm(df, "text", "doc_id", 64).collect()
    }
    for doc_id, text in rows:
        expect = _simhash_py(text, 64)
        # Spark BIGINT is signed; compare as unsigned 64-bit
        assert got[doc_id] & 0xFFFFFFFFFFFFFFFF == expect, doc_id
    # high 48 bits must discriminate across distinct token sets
    high = {(h >> 16) & 0xFFFFFFFFFFFF for h in got.values()}
    assert len(high) > len(got) // 2


def test_embedding_near_dup(spark):
    rng = np.random.default_rng(11)
    base = rng.normal(size=(40, 32))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    vecs = list(base)
    # planted near-dup of vec 0 (tiny perturbation)
    v = base[0] + rng.normal(scale=0.01, size=32)
    vecs.append(v / np.linalg.norm(v))
    pdf = pd.DataFrame(
        {"vec_id": list(range(41)), "embedding": [v.astype(float).tolist() for v in vecs]}
    )
    df = spark.createDataFrame(pdf)
    out = dedup.embedding_near_dup(df, cos_threshold=0.98, n_planes=8, n_tables=8)
    got = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert (0, 40) in got
    # oracle: no other pair has cosine ≥ 0.98
    sims = base @ base.T
    np.fill_diagonal(sims, 0)
    assert sims.max() < 0.98
    assert got == {(0, 40)}


def test_embedding_near_dup_exact_planted_and_bruteforce(spark):
    """Oracle-exact tier (round-3 verdict item 6): the integer pipeline
    must (a) recall the planted near-identical pair (identical sketches in
    every table, cos ≈ 1) and (b) report NO false positives vs the integer
    brute-force predicate on the quantized vectors."""
    rng = np.random.default_rng(5)
    base = rng.normal(size=(40, 32))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    vecs = list(base)
    v = base[0] + rng.normal(scale=0.003, size=32)
    vecs.append(v / np.linalg.norm(v))
    pdf = pd.DataFrame(
        {"vec_id": list(range(41)), "embedding": [v.astype(float).tolist() for v in vecs]}
    )
    df = spark.createDataFrame(pdf)
    # tau^2 = 9409/10000 -> tau = 0.97
    out = dedup.embedding_near_dup_exact(
        df, tau2_num=9409, tau2_den=10000, n_planes=6, n_tables=10
    )
    got = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert (0, 40) in got
    # integer brute force over the same quantization: every reported pair
    # must satisfy the exact predicate (LSH may MISS pairs, never invent)
    q = [np.asarray([round(float(np.float32(x)) * 1e6) for x in vv], dtype=object) for vv in vecs]
    for ia, ib in got:
        num = int(sum(a * b for a, b in zip(q[ia], q[ib])))
        na2 = int(sum(a * a for a in q[ia]))
        nb2 = int(sum(b * b for b in q[ib]))
        assert num > 0 and 10000 * num * num >= 9409 * na2 * nb2, (ia, ib)


def test_embedding_near_dup_exact_empty_input(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    out = dedup.embedding_near_dup_exact(df)
    assert out.count() == 0 and out.columns == ["id_a", "id_b"]


def test_min_fingerprints_matches_numpy_construction(spark):
    """min_fingerprints == MIN over the winnow_fingerprints set, and docs
    shorter than k collapse into the NULL class."""
    from geomesa_spark.functions.text import min_fingerprints, winnow_fingerprints

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "the quick brown fox jumps over the lazy dog",
                "the quick brown fox jumps over the lazy dog",  # exact dup
                "a completely different document body with other words",
                "short",  # < k chars -> NULL fp
            ],
        }
    )
    df = spark.createDataFrame(pdf)
    got = {r["doc_id"]: r["fp"] for r in min_fingerprints(df, k=16).collect()}
    full = winnow_fingerprints(df, k=16, w=32).toPandas()
    for d in (1, 2, 3):
        assert got[d] == full[full["doc_id"] == d]["fp"].min()
    assert got[1] == got[2] and got[1] != got[3]
    assert got[4] is None


def test_quality_and_lang(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": ["a", "b", "c", "d"],
            "text": [
                "the cat sat on the mat and looked at the dog for a while",
                "der hund ist nicht mit der katze und das ist gut",
                "!!! ??? ... ;;; :::",
                "",
            ],
        }
    )
    df = spark.createDataFrame(pdf)
    q = text_fns.quality_flag(df).toPandas().set_index("doc_id")
    assert bool(q.loc["a", "keep"]) is True
    assert bool(q.loc["c", "keep"]) is False  # punctuation-heavy
    assert bool(q.loc["d", "keep"]) is False  # empty
    lang = df.withColumn("lang", text_fns.lang_id_udf()(F.col("text"))).toPandas().set_index("doc_id")
    assert lang.loc["a", "lang"] == "en"
    assert lang.loc["b", "lang"] == "de"
    assert lang.loc["d", "lang"] == "und"


def test_token_counts(spark):
    df = spark.createDataFrame(pd.DataFrame({"text": ["hello world, how are you?", "  a  b  "]}))
    out = df.select(
        text_fns.token_count("text").alias("ws"),
        text_fns.bpe_ish_token_count("text").alias("bpe"),
    ).collect()
    assert out[0]["ws"] == 5
    assert out[0]["bpe"] >= 7  # punctuation split out
    assert out[1]["ws"] == 2


def test_fingerprint_whitespace_robust(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": ["x", "y", "z"],
                "text": ["some document text here", "some  document   text here", "other thing"],
            }
        )
    )
    fp = df.withColumn("fp", text_fns.fingerprint_udf()(F.col("text"))).toPandas().set_index("doc_id")
    assert fp.loc["x", "fp"] == fp.loc["y", "fp"]  # whitespace-normalized
    assert fp.loc["x", "fp"] != fp.loc["z", "fp"]


class TestMultimodal:
    def test_media_features_shape_and_determinism(self, spark, sf_dir):
        docs = corpus.load_documents_spans(spark, sf_dir)
        feats = multimodal.media_features(docs.limit(300), feature_dim=8)
        pdf = feats.toPandas()
        assert len(pdf) > 0
        assert set(pdf.columns) == {
            "doc_id", "span_idx", "media_ref", "kind", "width", "height", "n_frames", "feature"
        }
        assert (pdf["width"] >= 16).all() and (pdf["height"] >= 16).all()
        assert pdf["feature"].apply(len).eq(8).all()
        # real pixel statistics: every component scaled to [0, 1]
        feats_mat = np.stack(pdf["feature"].to_numpy())
        assert (feats_mat >= 0.0).all() and (feats_mat <= 1.0).all()
        assert feats_mat.std() > 0  # not a constant vector
        # deterministic: second run identical
        pdf2 = multimodal.media_features(docs.limit(300), feature_dim=8).toPandas()
        a = pdf.sort_values(["doc_id", "span_idx"]).reset_index(drop=True)
        b = pdf2.sort_values(["doc_id", "span_idx"]).reset_index(drop=True)
        assert a["media_ref"].equals(b["media_ref"])
        assert all(np.array_equal(x, y) for x, y in zip(a["feature"], b["feature"]))

    def test_media_span_indices_point_at_images(self, spark, sf_dir):
        docs = corpus.load_documents_spans(spark, sf_dir)
        m = multimodal.extract_media_spans(docs.limit(200))
        rows = m.select("doc_id", "span_idx", "media_ref", "spans").collect()
        assert rows
        for r in rows[:50]:
            s = r["spans"][r["span_idx"]]
            assert s["kind"] == "image" and s["media_ref"] == r["media_ref"]

    def test_resize_and_frame_plan(self, spark, sf_dir):
        docs = corpus.load_documents_spans(spark, sf_dir)
        feats = multimodal.media_features(docs.limit(100))
        plan = multimodal.resize_stub(feats, 224, 224)
        p = plan.limit(5).toPandas()
        assert (p["scale_x_1000"] > 0).all()
        fs = multimodal.frame_sample_plan(feats, every_n=1).limit(5).toPandas()
        assert fs["sample_frames"].apply(len).eq(fs["n_frames"]).all()


def test_embedding_near_dup_empty_input(spark):
    """Regression (round-1 advice): empty input → empty result, not a
    TypeError from inferring the vector dimension off first()=None."""
    from geomesa_spark.operators import dedup

    e = spark.createDataFrame(
        [], schema="vec_id long, embedding array<float>, label string"
    )
    out = dedup.embedding_near_dup(e, cos_threshold=0.9)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["id_a", "id_b", "cosine"]


def test_jaccard_prefix_matches_bruteforce(spark):
    """PPJoin prefix filtering must be LOSSLESS: bit-identical pairs to
    the all-pairs python brute force, including degenerate empty docs."""
    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(40)]
    rows = []
    for i in range(50):
        k = int(rng.integers(5, 20))
        toks = list(dict.fromkeys(rng.choice(vocab, k).tolist()))
        rows.append((f"d{i:03d}", "en" if i % 2 else "fr", toks))
    # planted near-dups (same bucket)
    rows.append(("d900", "en", rows[1][2]))                  # exact dup of d001
    rows.append(("d901", "en", rows[1][2][:-1] + ["zzz"]))   # one-token change
    # cross-bucket twin must NOT pair
    rows.append(("d902", "fr", rows[1][2]))
    # empty docs: brute-force semantics include (0, 0) pairs within bucket
    rows.append(("d910", "en", []))
    rows.append(("d911", "en", []))
    rows.append(("d912", "fr", []))
    df = spark.createDataFrame(rows, "doc_id string, lang string, toks array<string>")

    got = {
        (r["id_a"], r["id_b"], r["i"], r["u"])
        for r in dedup.jaccard_pairs_prefix(
            df, 80, 100, id_col="doc_id", toks_col="toks", bucket_cols=("lang",)
        ).collect()
    }

    want = set()
    data = [(d, lang, set(t)) for d, lang, t in rows]
    for x in range(len(data)):
        for y in range(len(data)):
            da, la, ta = data[x]
            db, lb, tb = data[y]
            if da >= db or la != lb:
                continue
            i = len(ta & tb)
            u = len(ta | tb)
            if i * 100 >= u * 80:
                want.add((da, db, i, u))
    assert got == want
    assert ("d900", "d902", 0, 0) not in got  # cross-bucket twin excluded
    assert any(a == "d910" and b == "d911" for a, b, _, _ in got)


class TestWinnowFingerprints:
    def test_shared_substring_guarantee(self, spark):
        """Winnowing guarantee: a shared substring of length >= w + k - 1
        (here 32 + 16 - 1 = 47) forces at least one shared fingerprint."""
        shared = "the quick brown fox jumps over the lazy dog again"  # 50 chars
        assert len(shared) >= 47
        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": ["a", "b", "c"],
                    "text": [
                        "PREFIX AAAA " + shared + " SUFFIX ZZZZ",
                        "totally different head " + shared + " and tail",
                        "no overlap with the others whatsoever in any window here",
                    ],
                }
            )
        )
        fps = text_fns.winnow_fingerprints(df, k=16, w=32).toPandas()
        by_doc = {d: set(g["fp"]) for d, g in fps.groupby("doc_id")}
        assert by_doc["a"] & by_doc["b"]
        assert not (by_doc["a"] & by_doc["c"])

    def test_whitespace_normalized_and_short_docs(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": ["x", "y", "tiny"],
                    "text": [
                        "some document  text\there with    enough length to gram",
                        "some document text here with enough length to gram",
                        "short",  # < k chars -> zero fingerprints
                    ],
                }
            )
        )
        fps = text_fns.winnow_fingerprints(df, k=16, w=32).toPandas()
        by_doc = {d: set(g["fp"]) for d, g in fps.groupby("doc_id")}
        assert by_doc["x"] == by_doc["y"]
        assert "tiny" not in by_doc

    def test_numpy_tier_agreement_on_exact_dups(self, spark):
        """Both tiers must put byte-identical docs in the same class."""
        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": ["p", "q"],
                    "text": ["identical content for both rows, long enough to window"] * 2,
                }
            )
        )
        jvm = text_fns.winnow_fingerprints(df).toPandas()
        sets = {d: set(g["fp"]) for d, g in jvm.groupby("doc_id")}
        assert sets["p"] == sets["q"]


class TestTfidfTopk:
    def test_rare_term_outranks_common(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": ["d1", "d2", "d3"],
                    "text": [
                        "common common common zebra",
                        "common filler words here",
                        "common more filler text",
                    ],
                }
            )
        )
        out = text_fns.tfidf_topk(df, k=2).toPandas()
        d1 = out[out["doc_id"] == "d1"].sort_values("rank")
        # zebra: df=1 -> high idf; common: df=3 -> idf floor. tf=3 for
        # common vs 1 for zebra: 1*ln(4/2)+1 ~ 1.69 vs 3*(ln(4/4)+1)=3.0
        # -> common still wins on tf; assert exact integer scores instead
        terms = dict(zip(d1["term"], d1["score_micros"]))
        assert terms["common"] == 3 * 1_000_000  # ln(4/4)+1 == 1.0 exactly
        assert terms["zebra"] == round((np.log(4 / 2) + 1) * 1e6)
        assert (d1["rank"].tolist() == [1, 2]) and set(d1["term"]) == {"common", "zebra"}

    def test_topk_bound_and_tie_break(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": ["d"],
                    "text": ["alpha beta gamma delta epsilon zeta eta theta"],
                }
            )
        )
        out = text_fns.tfidf_topk(df, k=3).toPandas().sort_values("rank")
        # all terms tf=1, df=1 -> identical scores; ties break by term asc
        assert out["term"].tolist() == ["alpha", "beta", "delta"]


class TestGopherQuality:
    def test_flags_and_counts(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": ["good", "short", "nostop", "longwords"],
                    "text": [
                        # 33 words incl. stopwords, sane lengths
                        "the quick brown fox jumps over the lazy dog and "
                        "runs far away into deep green woods where many "
                        "small birds sing sweet songs all day long here "
                        "now and then some more",
                        "too few words here",
                        " ".join(["zebra"] * 35),  # no stopwords, 35 words
                        " ".join(["pneumonoultramicroscopic"] * 40),  # mean len 24
                    ],
                }
            )
        )
        out = (
            text_fns.gopher_quality(df, min_words=30, min_stopwords=1)
            .toPandas()
            .set_index("doc_id")
        )
        g = out.loc["good"]
        assert bool(g["keep"]) and g["n_words"] == 33 and g["n_stopwords"] >= 1
        assert not bool(out.loc["short"]["word_count_ok"])
        assert not bool(out.loc["nostop"]["stopword_ok"])
        assert bool(out.loc["nostop"]["word_count_ok"])
        assert not bool(out.loc["longwords"]["mean_word_len_ok"])

    def test_integer_cross_multiplication_boundaries(self, spark):
        # mean word length exactly 3.0 and exactly 10.0 must PASS (inclusive)
        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": ["m3", "m10", "m2"],
                    "text": ["abc " * 30, "abcdefghij " * 30, "ab " * 30],
                }
            )
        )
        out = text_fns.gopher_quality(df, min_words=1, min_stopwords=0).toPandas().set_index("doc_id")
        assert bool(out.loc["m3"]["mean_word_len_ok"])
        assert bool(out.loc["m10"]["mean_word_len_ok"])
        assert not bool(out.loc["m2"]["mean_word_len_ok"])


class TestDocRepetition:
    def test_matches_python_bruteforce(self, spark):
        import re
        from collections import Counter

        texts = {
            "a": "one two one two one three four",
            "b": "all distinct words in this doc",
            "c": "dup dup dup dup dup dup dup dup dup dup",
        }
        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
        )
        out = text_fns.doc_repetition(df, n=2, max_dup_pct=20).toPandas().set_index("doc_id")
        for d, txt in texts.items():
            toks = [t for t in re.split("[^a-z0-9]+", txt.lower()) if t]
            grams = Counter(" ".join(toks[i : i + 2]) for i in range(len(toks) - 1))
            row = out.loc[d]
            assert row["n_grams"] == sum(grams.values())
            assert row["n_distinct"] == len(grams)
            assert row["max_gram_count"] == max(grams.values())
        assert bool(out.loc["c"]["repetitive"]) and not bool(out.loc["b"]["repetitive"])

    def test_short_docs_zeroed_not_dropped(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": ["one", "empty"], "text": ["solo", "   "]})
        )
        out = text_fns.doc_repetition(df, n=2).toPandas().set_index("doc_id")
        assert len(out) == 2
        assert out.loc["one"]["n_grams"] == 0 and not bool(out.loc["one"]["repetitive"])
        assert out.loc["empty"]["max_gram_count"] == 0


class TestDedupClusters:
    def _brute(self, n_nodes, edges):
        parent = list(range(n_nodes))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # fully compress, then min per component
        comp = {}
        for v in range(n_nodes):
            comp.setdefault(find(v), []).append(v)
        out = {}
        for members in comp.values():
            m = min(members)
            for v in members:
                out[v] = m
        return out

    def test_chain_clique_singleton(self, spark):
        from geomesa_spark.operators.dedup import dedup_clusters

        # chain 0-1-2-3-4 (diameter 4 forces multiple propagation rounds),
        # clique {10,11,12}, pair {20,21}, singletons 30, 31
        edges = [(1, 0), (1, 2), (3, 2), (3, 4), (10, 11), (11, 12),
                 (10, 12), (20, 21)]
        nodes = [0, 1, 2, 3, 4, 10, 11, 12, 20, 21, 30, 31]
        pairs = spark.createDataFrame(
            pd.DataFrame({"doc_a": [a for a, _ in edges],
                          "doc_b": [b for _, b in edges]})
        )
        ndf = spark.createDataFrame(pd.DataFrame({"doc_id": nodes}))
        out = dedup_clusters(pairs, ndf).toPandas().set_index("doc_id")
        want = self._brute(32, edges)
        for v in nodes:
            assert out.loc[v]["cluster_rep"] == want[v], v
            assert bool(out.loc[v]["is_canonical"]) == (want[v] == v)
        assert len(out) == len(nodes)

    def test_random_graph_matches_union_find(self, spark):
        from geomesa_spark.operators.dedup import dedup_clusters

        rng = np.random.default_rng(7)
        n = 200
        edges = [(int(a), int(b)) for a, b in rng.integers(0, n, (150, 2))
                 if a != b]
        pairs = spark.createDataFrame(
            pd.DataFrame({"doc_a": [a for a, _ in edges],
                          "doc_b": [b for _, b in edges]})
        )
        ndf = spark.createDataFrame(pd.DataFrame({"doc_id": list(range(n))}))
        out = dedup_clusters(pairs, ndf).toPandas()
        want = self._brute(n, edges)
        got = dict(zip(out["doc_id"], out["cluster_rep"]))
        assert got == want
        n_canon = out["is_canonical"].sum()
        assert n_canon == len(set(want.values()))


def test_dedup_clusters_string_ids(spark):
    """String node ids: the old sum-of-labels convergence test summed
    NULLs and stopped after one round; chains must still fully resolve."""
    from geomesa_spark.operators.dedup import dedup_clusters

    # chain a-b-c-d (diameter 3: needs >1 round), plus singleton z
    pairs = spark.createDataFrame(
        pd.DataFrame({"doc_a": ["doc-b", "doc-c", "doc-d"],
                      "doc_b": ["doc-a", "doc-b", "doc-c"]})
    )
    nodes = spark.createDataFrame(
        pd.DataFrame({"doc_id": ["doc-a", "doc-b", "doc-c", "doc-d", "doc-z"]})
    )
    out = dedup_clusters(pairs, nodes).toPandas().set_index("doc_id")
    for v in ["doc-a", "doc-b", "doc-c", "doc-d"]:
        assert out.loc[v]["cluster_rep"] == "doc-a", v
    assert out.loc["doc-z"]["cluster_rep"] == "doc-z"
    assert out["is_canonical"].sum() == 2


def test_dedup_clusters_warns_when_unconverged(spark):
    import warnings as w

    from geomesa_spark.operators.dedup import dedup_clusters

    # path graph 0-1-2-3-4 with max_iter=2: cannot reach the fixpoint
    pairs = spark.createDataFrame(
        pd.DataFrame({"doc_a": [1, 2, 3, 4], "doc_b": [0, 1, 2, 3]})
    )
    nodes = spark.createDataFrame(pd.DataFrame({"doc_id": list(range(5))}))
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        dedup_clusters(pairs, nodes, max_iter=2).collect()
    assert any("fixpoint" in str(c.message) for c in caught)


def test_line_dedup_stats_planted(spark):
    """Cross-corpus duplicate-line fraction: a boilerplate line shared by
    two docs (and repeated within one) counts everywhere it occurs; a
    unique line doesn't; blank lines are ignored; a doc with no non-empty
    lines is absent (no denominator)."""
    from geomesa_spark.functions.text import line_dedup_stats

    docs = spark.createDataFrame(
        [
            (1, "cookie banner\nunique alpha\n\ncookie banner"),
            (2, "cookie banner\nunique beta"),
            (3, "unique gamma"),
            (4, "\n\n"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in line_dedup_stats(docs).collect()}
    assert set(got) == {1, 2, 3}  # doc 4 has no non-empty lines
    assert (got[1]["n_lines"], got[1]["n_dup_lines"], got[1]["dup_permille"]) == (3, 2, 666)
    assert (got[2]["n_lines"], got[2]["n_dup_lines"], got[2]["dup_permille"]) == (2, 1, 500)
    assert (got[3]["n_lines"], got[3]["n_dup_lines"], got[3]["dup_permille"]) == (1, 0, 0)


def test_ccnet_perplexity_buckets_planted(spark):
    """CCNet bucketing on a hand-computed unigram corpus: per-language
    NLL quantized to micros, tertiles ordered ascending (head = most
    fluent), languages scored independently, short languages fill buckets
    1..n in order, empty docs absent."""
    from geomesa_spark.functions.text import ccnet_perplexity_buckets

    docs = spark.createDataFrame(
        [
            (1, "en", "a a a a"),
            (2, "en", "a a a b"),
            (3, "en", "a b b b"),
            (10, "fr", "x"),
            (11, "fr", "x y"),
            (20, "en", ""),
        ],
        ["doc_id", "lang", "text"],
    )
    got = {r["doc_id"]: r for r in ccnet_perplexity_buckets(docs).collect()}
    assert set(got) == {1, 2, 3, 10, 11}  # empty doc absent
    # en: p(a)=8/12, p(b)=4/12 -> nll micros 405465 / 1098612
    assert got[1]["ppl_micros"] == 405465
    assert got[2]["ppl_micros"] == 578752   # 2315007/4 rounded half-up
    assert got[3]["ppl_micros"] == 925325
    assert [got[i]["bucket"] for i in (1, 2, 3)] == ["head", "middle", "tail"]
    # fr is scored on its OWN distribution: p(x)=2/3, p(y)=1/3
    assert got[10]["ppl_micros"] == 405465
    assert got[11]["ppl_micros"] == 752039  # 1504077/2 = .5 rounds up
    assert [got[i]["bucket"] for i in (10, 11)] == ["head", "middle"]


def test_c4_line_filters_rules(spark):
    """Every C4 rule fires: terminal punctuation, min-words, javascript,
    lorem-ipsum page, brace page, min-kept-lines page."""
    from geomesa_spark.functions.text import c4_line_filters

    good = "this line has enough words here."
    docs = spark.createDataFrame(
        [
            # 3 good lines -> page kept; short/unterminated lines dropped
            (1, f"{good}\nanother line with five good words!\nshe said \"stop right there now.\"\nno punct here at all\ntiny."),
            # only 2 good lines -> page dropped by min_kept_lines
            (2, f"{good}\n{good}"),
            # javascript line dropped even though well-formed
            (3, f"{good}\n{good}\nplease enable JavaScript to view this."),
            # lorem ipsum anywhere kills the page, lines still counted
            (4, f"{good}\n{good}\n{good}\nLorem Ipsum dolor."),
            # brace kills the page
            (5, f"{good}\n{good}\n{good}\nfunction f() {{ return 1; }}"),
            (6, ""),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in c4_line_filters(docs).collect()}
    assert got[1]["n_lines"] == 5 and got[1]["n_kept"] == 3
    assert got[1]["page_kept"] is True
    assert got[1]["clean_text"].split("\n")[2] == 'she said "stop right there now."'
    assert got[2]["n_kept"] == 2 and got[2]["page_kept"] is False
    assert got[3]["n_kept"] == 2 and got[3]["page_kept"] is False
    assert got[4]["n_kept"] == 3 and got[4]["page_kept"] is False
    assert got[5]["page_kept"] is False
    assert got[6]["n_lines"] == 1 and got[6]["n_kept"] == 0
    assert got[6]["clean_text"] == "" and got[6]["page_kept"] is False


def test_c4_line_filters_trims_before_judging(spark):
    from geomesa_spark.functions.text import c4_line_filters

    docs = spark.createDataFrame(
        [(1, "   padded line with enough words here.   \n   \n")],
        ["doc_id", "text"],
    )
    row = c4_line_filters(docs).collect()[0]
    # trailing spaces trimmed before the terminal-punctuation check;
    # whitespace-only middle line dropped; trailing empty split kept in n_lines
    assert row["n_lines"] == 3 and row["n_kept"] == 1
    assert row["clean_text"] == "padded line with enough words here."


def test_pii_redact_rules(spark):
    from geomesa_spark.functions.text import pii_redact

    docs = spark.createDataFrame(
        [
            (1, "mail a.b+c@sub.example.co.uk and d@e.io today"),
            (2, "gateway 192.168.0.1 and 10.0.0.255 up"),
            (3, "call +1 555 0042 or +44 123 4567 now"),
            (4, "no identifiers here at all"),
            (5, "mixed x@y.com near 8.8.8.8 and +1 555 9999"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in pii_redact(docs).collect()}
    assert (got[1]["n_emails"], got[1]["n_ips"], got[1]["n_phones"]) == (2, 0, 0)
    assert got[1]["clean_text"] == "mail |EMAIL| and |EMAIL| today"
    assert got[2]["n_ips"] == 2
    assert got[2]["clean_text"] == "gateway |IP| and |IP| up"
    assert got[3]["n_phones"] == 2
    assert got[3]["clean_text"] == "call |PHONE| or |PHONE| now"
    assert got[4]["clean_text"] == "no identifiers here at all"
    assert (got[4]["n_emails"], got[4]["n_ips"], got[4]["n_phones"]) == (0, 0, 0)
    assert got[5]["clean_text"] == "mixed |EMAIL| near |IP| and |PHONE|"


def test_pii_redact_mask_ordering(spark):
    """user@host with an alphabetic TLD is consumed whole by the e-mail
    rule (host never re-matched as anything else); a dotted-QUAD host is
    not an e-mail under the alphabetic-TLD pattern, so only the quad is
    masked — and the per-rule counts are raw-text independent."""
    from geomesa_spark.functions.text import pii_redact

    docs = spark.createDataFrame(
        [(1, "root@box.example.net logged in"), (2, "root@10.1.2.3 logged in")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in pii_redact(docs).collect()}
    assert got[1]["clean_text"] == "|EMAIL| logged in"
    assert got[1]["n_emails"] == 1 and got[1]["n_ips"] == 0
    assert got[2]["clean_text"] == "root@|IP| logged in"
    assert got[2]["n_emails"] == 0 and got[2]["n_ips"] == 1


def test_substring_dedup_planted(spark):
    """Fixed-window suffix criterion (k=3): a 3-token span shared by two
    docs marks the window duplicated in BOTH; a doc shorter than k has no
    windows and is absent; a within-doc repeat also counts; windows are
    position-sensitive (overlapping windows of the shared span that
    differ by context are NOT duplicated)."""
    from geomesa_spark.functions.text import substring_dedup_stats

    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),          # windows: abc bcd cde
            (2, "x a b c y"),          # windows: xab abc bcy -> shares abc
            (3, "p q r p q r"),        # windows: pqr qrp rpq pqr -> pqr twice
            (4, "t u"),                # < k tokens -> absent
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r for r in substring_dedup_stats(docs, k=3).collect()
    }
    assert set(got) == {1, 2, 3}
    assert (got[1]["n_windows"], got[1]["n_dup_windows"]) == (3, 1)
    assert (got[2]["n_windows"], got[2]["n_dup_windows"]) == (3, 1)
    # doc 3: 4 windows, 'p q r' occurs at pos 1 and 4 -> both duplicated
    assert (got[3]["n_windows"], got[3]["n_dup_windows"]) == (4, 2)
    assert got[3]["dup_permille"] == 500


def test_substring_dedup_whitespace_normalization(spark):
    """Windows are built from whitespace-split tokens, so runs of blanks
    and tabs don't change the window content."""
    from geomesa_spark.functions.text import substring_dedup_stats

    docs = spark.createDataFrame(
        [(1, "a  b\tc d"), (2, "a b c z")], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: r for r in substring_dedup_stats(docs, k=3).collect()
    }
    assert got[1]["n_dup_windows"] == 1 and got[2]["n_dup_windows"] == 1


def test_para_dedup_survivorship(spark):
    """First occurrence in (doc_id, pos) order survives; every later
    occurrence (same doc or other docs) is dropped; empty paragraphs are
    ignored; a doc whose every paragraph occurred earlier keeps nothing
    (NULL fingerprint); the fingerprint is order-sensitive."""
    import hashlib

    from geomesa_spark.functions.text import para_dedup

    docs = spark.createDataFrame(
        [
            (1, "alpha\nboiler\nalpha"),   # keeps alpha(0), boiler(1); drops alpha(2)
            (2, "boiler\nbeta"),            # drops boiler, keeps beta
            (3, "boiler\nalpha"),           # keeps nothing
            (4, "\n\n"),                    # absent
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in para_dedup(docs).collect()}
    assert set(got) == {1, 2, 3}
    assert (got[1]["n_paras"], got[1]["n_kept"]) == (3, 2)
    assert (got[2]["n_paras"], got[2]["n_kept"]) == (2, 1)
    assert (got[3]["n_paras"], got[3]["n_kept"]) == (2, 0)
    assert got[3]["kept_fingerprint"] is None

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert got[1]["kept_fingerprint"] == md5(md5("alpha") + md5("boiler"))
    assert got[2]["kept_fingerprint"] == md5(md5("beta"))


def test_para_dedup_order_sensitive_fingerprint(spark):
    """Two docs keeping the same paragraph SET in different orders get
    different fingerprints (position order is part of the contract)."""
    from geomesa_spark.functions.text import para_dedup

    docs = spark.createDataFrame(
        [(1, "one\ntwo"), (2, "two\none")], ["doc_id", "text"]
    )
    a = spark.createDataFrame([(1, "one\ntwo")], ["doc_id", "text"])
    b = spark.createDataFrame([(1, "two\none")], ["doc_id", "text"])
    fp_a = para_dedup(a).collect()[0]["kept_fingerprint"]
    fp_b = para_dedup(b).collect()[0]["kept_fingerprint"]
    assert fp_a != fp_b


class TestSemDeDup:
    def test_planted_clusters_and_survivorship(self, spark):
        """Two well-separated groups; inside group A a scaled copy
        (cosine 1) of the seed must be removed while the seed (lower id)
        survives; an in-cluster but angularly-distant vector survives;
        group B's lone member survives.  Seeds are ids 0 and 1, so
        cluster 0 is A's region and cluster 1 is B's."""
        from geomesa_spark.operators.dedup import semdedup

        rows = [
            (0, [1.0, 0.0, 0.0, 0.0]),    # seed centroid 0
            (1, [0.0, 0.0, 1.0, 0.0]),    # seed centroid 1
            (2, [0.9, 0.0, 0.0, 0.0]),    # scaled copy of 0 -> removed
            (3, [0.0, 1.0, 0.0, 0.0]),    # assigned A-side, orthogonal -> kept
            (4, [0.0, 0.0, 0.8, 0.0]),    # scaled copy of 1 -> removed
        ]
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        got = {r["vec_id"]: r for r in semdedup(df, n_clusters=2).collect()}
        assert len(got) == 5
        assert got[0]["keep"] and got[1]["keep"] and got[3]["keep"]
        assert not got[2]["keep"] and not got[4]["keep"]
        assert got[2]["cluster"] == got[0]["cluster"]
        assert got[4]["cluster"] == got[1]["cluster"]

    def test_assignment_tie_breaks_low_index(self, spark):
        """A vector equidistant from both seed centroids lands in the
        lower-indexed cluster (deterministic tie rule)."""
        from geomesa_spark.operators.dedup import semdedup

        rows = [
            (0, [1.0, 0.0]),
            (1, [0.0, 1.0]),
            (2, [0.5, 0.5]),   # tie -> cluster 0
        ]
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        got = {r["vec_id"]: r["cluster"] for r in semdedup(df, n_clusters=2).collect()}
        assert got[2] == got[0]

    def test_empty_input(self, spark):
        from pyspark.sql.types import ArrayType, FloatType, LongType, StructField, StructType

        from geomesa_spark.operators.dedup import semdedup

        schema = StructType([
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ])
        df = spark.createDataFrame([], schema)
        assert semdedup(df).count() == 0


class TestUrlCanon:
    def _canon(self, spark, url):
        from geomesa_spark.functions.text import url_canonicalize

        df = spark.createDataFrame([(1, url)], ["doc_id", "url"])
        r = url_canonicalize(df).collect()[0]
        return r["url_canon"], r["domain"]

    def test_rules(self, spark):
        cases = {
            # fragment, host-lowering (path case PRESERVED), default port
            "HTTPS://API.Example.COM:443/A/B#frag": "https://api.example.com/A/B",
            # www + port 80 + trailing slash
            "http://www.Example.com:80/": "http://example.com",
            # utm in first position takes the following param's separator
            "https://a.net/p?utm_source=x&id=7": "https://a.net/p?id=7",
            # utm last takes its leading separator
            "https://a.net/p?id=7&utm_medium=m": "https://a.net/p?id=7",
            # all params utm -> bare path
            "https://a.net/p?utm_a=1&utm_b=2": "https://a.net/p",
            # non-default port survives
            "https://a.net:8443/p": "https://a.net:8443/p",
        }
        for raw, want in cases.items():
            got, _ = self._canon(spark, raw)
            assert got == want, f"{raw!r}: {got!r} != {want!r}"

    def test_domain_is_last_two_labels(self, spark):
        _, d = self._canon(spark, "https://cdn.news.Example.COM/x")
        assert d == "example.com"
        _, d = self._canon(spark, "https://ex3.Net/x")
        assert d == "ex3.net"

    def test_domain_cap_md5_rank(self, spark):
        """Exactly n_max kept per domain, rank dense from 1, membership
        decided by md5(doc_id) rank (engine-portable)."""
        import hashlib

        from geomesa_spark.functions.text import domain_cap

        rows = [(i, f"https://d{i % 2}.com/p/{i}") for i in range(10)]
        df = spark.createDataFrame(rows, ["doc_id", "url"])
        got = domain_cap(df, n_max=2).collect()
        by_dom = {}
        for r in got:
            by_dom.setdefault(r["domain"], []).append(r)
        assert set(by_dom) == {"d0.com", "d1.com"}
        for dom, rs in by_dom.items():
            assert sorted(r["rank"] for r in rs) == list(range(1, 6))
            kept = {r["doc_id"] for r in rs if r["kept"]}
            ids = [r["doc_id"] for r in rs]
            want = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:2]
            assert kept == set(want)


def test_new_pipeline_ops_plan_shapes(spark):
    """Plan guards for the round-5 pipeline additions: no cartesian /
    nested-loop node anywhere (substring windows and paragraphs shuffle
    as (id, md5) pairs; semdedup's pair stage is a cluster-keyed
    equi-join; domain_cap is one window shuffle)."""
    from geomesa_spark.functions.text import (
        domain_cap,
        para_dedup,
        substring_dedup_stats,
    )
    from geomesa_spark.operators.dedup import semdedup

    docs = spark.createDataFrame(
        [(i, f"w{i} a b c d e f g h", f"https://d{i % 2}.com/{i}") for i in range(20)],
        ["doc_id", "text", "url"],
    )
    vecs = spark.createDataFrame(
        [(i, [float(i % 3), 1.0, float(i % 5)]) for i in range(20)],
        ["vec_id", "embedding"],
    )
    plans = {
        "substring": substring_dedup_stats(docs, k=3),
        "para": para_dedup(docs),
        "semdedup": semdedup(vecs, n_clusters=2),
        "domain_cap": domain_cap(docs),
    }
    for name, df in plans.items():
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoop" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_url_canonicalize_idempotent(spark):
    """canon(canon(u)) == canon(u) over an adversarial URL batch — a
    canonicalizer that isn't idempotent splits equal URLs across dedup
    keys depending on how many normalization passes a pipeline ran."""
    from geomesa_spark.functions.text import url_canonicalize

    urls = [
        "HTTPS://WWW.Example.COM:443/A/B#frag",
        "http://www.example.com:80/",
        "https://a.net/p?utm_source=x&id=7",
        "https://a.net/p?id=7&utm_medium=m",
        "https://a.net/p?utm_a=1&utm_b=2",
        "https://a.net:8443/p/",
        "https://WWW.WWW.example.com/www.",
        "http://x.y.z.example.co.uk/p?a=utm_trap&utm_b=1#x#y",
        "ftp://Mixed.Case.Host/Path/",
        "https://a.com/?utm_only=1",
    ]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], ["doc_id", "url"])
    once = url_canonicalize(df).select("doc_id", F.col("url_canon").alias("url"))
    twice = url_canonicalize(once).select("doc_id", "url_canon")
    joined = once.alias("a").join(twice.alias("b"), "doc_id").collect()
    for r in joined:
        assert r["url"] == r["url_canon"], r
