"""Corpus-assembly operator tests: sequence packing + stratified sampling
(operators/packing.py) against hand-computed and brute-force oracles."""

import hashlib

import numpy as np
import pandas as pd
import pytest

from geomesa_spark.operators.packing import pack_sequences, stratified_sample


class TestPackSequences:
    def test_offsets_and_pack_assignment(self, spark):
        # one source; token counts 3, 4, 5 with budget 6:
        # offsets 0, 3, 7 -> packs 0, 0, 1; doc b straddles (overflow ok)
        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": [1, 2, 3],
                    "source": ["s"] * 3,
                    "text": ["one two three", "a b c d", "v w x y z"],
                }
            )
        )
        out = (
            pack_sequences(df, budget=6)
            .toPandas()
            .set_index("doc_id")
            .sort_index()
        )
        assert out["n_tokens"].tolist() == [3, 4, 5]
        assert out["start_offset"].tolist() == [0, 3, 7]
        assert out["pack_id"].tolist() == [0, 0, 1]
        assert out["offset_in_pack"].tolist() == [0, 3, 1]

    def test_groups_pack_independently(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": [1, 2, 10, 11],
                    "source": ["a", "a", "b", "b"],
                    "text": ["x " * 5, "y " * 5, "z " * 5, "w " * 5],
                }
            )
        )
        out = pack_sequences(df, budget=8).toPandas().set_index("doc_id")
        # each source restarts at offset 0
        assert out.loc[1]["start_offset"] == 0 and out.loc[10]["start_offset"] == 0
        assert out.loc[2]["start_offset"] == 5 and out.loc[11]["start_offset"] == 5
        assert out.loc[2]["pack_id"] == 0  # 5 < 8

    def test_pack_sizes_bounded_by_budget_plus_max_doc(self, spark):
        rng = np.random.default_rng(5)
        n = 300
        pdf = pd.DataFrame(
            {
                "doc_id": range(n),
                "source": ["s"] * n,
                "text": [" ".join(f"t{j}" for j in range(rng.integers(1, 40))) for _ in range(n)],
            }
        )
        df = spark.createDataFrame(pdf)
        out = pack_sequences(df, budget=100).toPandas()
        # every pack's START tokens fit: sum of tokens of docs starting in a
        # pack is < budget + the straddling doc's length
        by_pack = out.groupby("pack_id")["n_tokens"].sum()
        assert (by_pack < 100 + 40).all()
        # offsets are a consistent running sum
        o = out.sort_values("doc_id")
        assert (o["start_offset"].to_numpy()[1:]
                == (o["start_offset"] + o["n_tokens"]).to_numpy()[:-1]).all()


class TestStratifiedSample:
    def test_exact_k_per_stratum_and_determinism(self, spark):
        rng = np.random.default_rng(9)
        n = 400
        pdf = pd.DataFrame(
            {
                "doc_id": range(n),
                "lang": rng.choice(["en", "de"], n),
                "source": rng.choice(["web", "book"], n),
            }
        )
        df = spark.createDataFrame(pdf)
        out = stratified_sample(df, k=15).toPandas()
        sizes = out.groupby(["lang", "source"]).size()
        assert (sizes == 15).all() and len(sizes) == 4
        # matches the python oracle: top-15 by md5(str(id)) per stratum
        for (lang, src), g in pdf.groupby(["lang", "source"]):
            want = set(
                sorted(g["doc_id"], key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:15]
            )
            got = set(out[(out["lang"] == lang) & (out["source"] == src)]["doc_id"])
            assert got == want, (lang, src)

    def test_small_strata_keep_everything(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1, 2], "lang": ["en", "en"], "source": ["w", "w"]})
        )
        out = stratified_sample(df, k=10).toPandas()
        assert len(out) == 2 and set(out["rank"]) == {1, 2}


def test_pack_sequences_duplicate_ids_rows_frame(spark):
    """Duplicate (group, id) rows must get DISTINCT running offsets (ROWS
    frame); Spark's RANGE default would hand both the tied-peers sum."""
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 1, 2],
                "source": ["s", "s", "s"],
                "text": ["a b c", "d e f", "g h"],
            }
        )
    )
    out = pack_sequences(df, budget=4).toPandas().sort_values("start_offset")
    assert out["start_offset"].tolist() == [0, 3, 6]
    assert out["pack_id"].tolist() == [0, 0, 1]


class TestTemperatureMixture:
    def test_sqrt_quotas_integer_exact(self, spark):
        """Sources of 100/25/4 docs, alpha=0.5 -> weights 10/5/2 (micros),
        k=34 -> quotas floor(34*w/17) = 20/10/4."""
        from geomesa_spark.operators.packing import temperature_mixture_sample

        sizes = {"big": 100, "mid": 25, "tiny": 4}
        rows = [
            {"doc_id": i * 1000 + j, "source": s}
            for i, (s, n) in enumerate(sizes.items())
            for j in range(n)
        ]
        df = spark.createDataFrame(pd.DataFrame(rows))
        out = temperature_mixture_sample(df, k=34).toPandas()
        got = out.groupby("source")["doc_id"].count().to_dict()
        assert got == {"big": 20, "mid": 10, "tiny": 4}
        assert set(out["quota"].unique()) == {20, 10, 4}

    def test_membership_is_md5_rank(self, spark):
        from geomesa_spark.operators.packing import temperature_mixture_sample

        rows = [{"doc_id": j, "source": "s"} for j in range(50)]
        df = spark.createDataFrame(pd.DataFrame(rows))
        out = temperature_mixture_sample(df, k=10).toPandas()
        # one source: quota = floor(10 * w / w) = 10
        want = sorted(range(50), key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:10]
        assert set(out["doc_id"]) == set(want)

    def test_alpha_one_is_natural_mixture(self, spark):
        from geomesa_spark.operators.packing import temperature_mixture_sample

        rows = [{"doc_id": j, "source": "a" if j < 90 else "b"} for j in range(100)]
        df = spark.createDataFrame(pd.DataFrame(rows))
        out = temperature_mixture_sample(df, k=10, alpha=1.0).toPandas()
        got = out.groupby("source")["doc_id"].count().to_dict()
        assert got == {"a": 9, "b": 1}

    def test_quota_capped_by_source_size(self, spark):
        """quota may exceed a small source's population; rank<=quota then
        keeps the whole source (floor allocation never errors)."""
        from geomesa_spark.operators.packing import temperature_mixture_sample

        rows = [{"doc_id": j, "source": "a" if j < 64 else "b"} for j in range(68)]
        df = spark.createDataFrame(pd.DataFrame(rows))
        # weights 8e6 / 2e6 -> quotas floor(100*8/10)=80 (>64), floor(100*2/10)=20 (>4)
        out = temperature_mixture_sample(df, k=100).toPandas()
        got = out.groupby("source")["doc_id"].count().to_dict()
        assert got == {"a": 64, "b": 4}


class TestDsirSelect:
    @staticmethod
    def _score(texts_by_id, target_ids, n_buckets=1024):
        """Plain-Python DSIR oracle: md5 buckets, Laplace-smoothed
        log-ratio quantized to micros, integer tf-weighted sum."""
        import math
        from collections import Counter

        def buckets(text):
            return [
                int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % n_buckets
                for t in text.split()
                if t
            ]

        p, q = Counter(), Counter()
        for i, txt in texts_by_id.items():
            (p if i in target_ids else q).update(buckets(txt))
        pt, qt = sum(p.values()), sum(q.values())
        all_b = set(p) | set(q)
        ratio = {
            b: round(
                (
                    math.log((p.get(b, 0) + 1) / (pt + n_buckets))
                    - math.log((q.get(b, 0) + 1) / (qt + n_buckets))
                )
                * 1_000_000
            )
            for b in all_b
        }
        out = {}
        for i, txt in texts_by_id.items():
            if i in target_ids:
                continue
            tf = Counter(buckets(txt))
            out[i] = sum(c * ratio[b] for b, c in tf.items())
        return out

    def test_planted_affinity_and_exact_scores(self, spark):
        from geomesa_spark.operators.packing import dsir_select

        texts = {
            1: "alpha beta gamma alpha",      # target
            2: "alpha beta gamma beta",       # target
            3: "alpha beta delta",            # candidate, high affinity
            4: "omicron sigma tau upsilon",   # candidate, no overlap
            5: "beta gamma gamma",            # candidate, highest affinity
        }
        df = spark.createDataFrame(
            [(i, t, "t" if i in (1, 2) else "c") for i, t in texts.items()],
            ["doc_id", "text", "source"],
        )
        got = dsir_select(df, k=3, target_expr="source = 't'").toPandas()
        want = self._score(texts, {1, 2})
        order = sorted(want, key=lambda i: (-want[i], i))
        assert got["doc_id"].tolist() == order
        assert got["rank"].tolist() == [1, 2, 3]
        assert {r.doc_id: r.score_micros for r in got.itertuples()} == {
            i: want[i] for i in order
        }
        # overlap ordering sanity: both overlapping candidates beat the alien
        assert order.index(5) < order.index(4) and order.index(3) < order.index(4)

    def test_target_rows_never_selected(self, spark):
        from geomesa_spark.operators.packing import dsir_select

        rows = [(i, "x y z", "t" if i < 3 else "c") for i in range(6)]
        df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
        got = dsir_select(df, k=10, target_expr="source = 't'").toPandas()
        assert set(got["doc_id"]) == {3, 4, 5}

    def test_empty_token_docs_absent(self, spark):
        from geomesa_spark.operators.packing import dsir_select

        df = spark.createDataFrame(
            [(1, "alpha", "t"), (2, "alpha beta", "c"), (3, "   ", "c")],
            ["doc_id", "text", "source"],
        )
        got = dsir_select(df, k=5, target_expr="source = 't'").toPandas()
        assert got["doc_id"].tolist() == [2]


def test_corpus_mix_dedup_shifts_offsets(spark, monkeypatch):
    """The corpus_mix composition removes later copies of a duplicated
    quality-passing text and pack offsets close over the gap."""
    import geomesa_spark.entry_queries as eq

    dup = " ".join(["the be to of and that have with"] * 4)   # 32 tokens
    uniq = ("the be to of and that have with list " * 4).strip()  # 36 tokens
    rows = [
        (3, dup, "s0"),     # doc_id%17==3 residue irrelevant here
        (20, dup, "s0"),    # duplicate -> removed
        (40, uniq, "s0"),
        (5, "tiny", "s1"),  # fails gopher min_words -> removed
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])

    monkeypatch.setattr(eq, "_t", lambda spark, sf_dir, name: df)
    monkeypatch.setattr(eq, "MIX_TEXT_SQL", "text")  # corpus already planted
    got = {r["doc_id"]: r for r in eq.q_corpus_mix(spark, "ignored").collect()}
    assert set(got) == {3, 40}
    assert got[3]["start_offset"] == 0 and got[3]["n_tokens"] == 32
    # doc 40 starts right after doc 3 -- the removed duplicate left no gap
    assert got[40]["start_offset"] == 32
